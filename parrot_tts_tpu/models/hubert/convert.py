"""Load pretrained HuBERT weights + k-means codebooks into our pytrees.

Two torch state-dict naming schemes are accepted:

* **fairseq** HuBERT (what the reference loads,
  `/root/reference/utils/hubert_extraction/hubert_api.py:18-24`): keys like
  `encoder.layers.0.self_attn.k_proj.weight`, `post_extract_proj.*`,
  `encoder.pos_conv.0.weight_g`. A raw fairseq `.pt` checkpoint stores the
  tensors under `["model"]`; unpickling its config needs fairseq classes, so
  `load_torch_state_dict` falls back to extracting just the tensor payload.
* **HuggingFace** `HubertModel` (`transformers`): keys like
  `encoder.layers.0.attention.k_proj.weight`,
  `feature_projection.projection.*`, including the post-torch-2.1
  `parametrizations.weight.original{0,1}` weight-norm naming.

The positional conv's weight norm (torch `weight_norm(conv, dim=2)`) is
folded at load time — the encoder is inference-only here, exactly like the
reference's use of it.

K-means: the reference `joblib.load`s an sklearn k-means model and calls
`.predict` (`extractor.py:13,17`). `load_kmeans_centers` accepts that joblib
pickle, a raw `.npy` of centers, or anything with `cluster_centers_`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping

import numpy as np
import jax.numpy as jnp

from parrot_tts_tpu.core.config import HubertConfig


def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def load_torch_state_dict(path: str | Path) -> dict:
    """Tensor payload of a torch checkpoint: HF pytorch_model.bin,
    safetensors, or a fairseq checkpoint (tensors under ["model"])."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    import torch

    try:
        obj = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception:
        # fairseq checkpoints pickle omegaconf configs; ask torch to skip
        # everything non-tensor rather than import fairseq.
        obj = torch.load(str(path), map_location="cpu", weights_only=False,
                         pickle_module=_LenientPickle)
    if isinstance(obj, dict):
        for key in ("model", "state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return {k: v for k, v in obj.items() if hasattr(v, "shape")}


class _LenientPickle:
    """pickle shim: unresolvable classes (fairseq/omegaconf) become inert
    stubs so the tensor payload still loads."""

    import pickle as _pickle

    class Unpickler(_pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except Exception:
                return type(name, (), {"__setstate_": None})

    @staticmethod
    def load(*a, **kw):
        return _LenientPickle.Unpickler(*a, **kw).load()


def config_from_state_dict(sd: Mapping) -> HubertConfig:
    """Infer the HubertConfig topology from a converted-naming state dict."""
    sd = _normalize_keys(sd)
    conv_dim, conv_kernel, conv_stride = [], [], []
    default_strides = (5, 2, 2, 2, 2, 2, 2)
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in sd:
        w = _np(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])
        conv_dim.append(int(w.shape[0]))
        conv_kernel.append(int(w.shape[2]))
        conv_stride.append(default_strides[i] if i < len(default_strides) else 2)
        i += 1
    n_layer = 0
    while f"encoder.layers.{n_layer}.attention.k_proj.weight" in sd:
        n_layer += 1
    d_model = int(_np(sd["feature_projection.projection.weight"]).shape[0])
    ffn = int(_np(sd["encoder.layers.0.feed_forward.intermediate_dense.weight"]).shape[0])
    has_l0_norm = "feature_extractor.conv_layers.0.layer_norm.weight" in sd
    has_l1_norm = "feature_extractor.conv_layers.1.layer_norm.weight" in sd
    pos_k = None
    for cand in ("encoder.pos_conv_embed.conv.weight_v",
                 "encoder.pos_conv_embed.conv.parametrizations.weight.original1",
                 "encoder.pos_conv_embed.conv.weight"):
        if cand in sd:
            pos_w = _np(sd[cand])
            pos_k = int(pos_w.shape[2])
            pos_groups = d_model // int(pos_w.shape[1])
            break
    assert pos_k is not None, "positional conv weights not found"
    return HubertConfig(
        conv_dim=tuple(conv_dim), conv_kernel=tuple(conv_kernel),
        conv_stride=tuple(conv_stride),
        conv_bias="feature_extractor.conv_layers.0.conv.bias" in sd,
        feat_extract_norm=("layer" if has_l1_norm
                           else ("group" if has_l0_norm else "none")),
        d_model=d_model, n_layer=n_layer,
        n_head={768: 12, 1024: 16}.get(d_model, max(1, d_model // 64)),
        ffn_dim=ffn, pos_conv_kernel=pos_k, pos_conv_groups=pos_groups,
    )


_FAIRSEQ_MAP = (
    # (fairseq fragment, HF fragment) applied in order
    (".self_attn.", ".attention."),
    (".self_attn_layer_norm.", ".layer_norm."),
    (".fc1.", ".feed_forward.intermediate_dense."),
    (".fc2.", ".feed_forward.output_dense."),
    ("encoder.pos_conv.0.", "encoder.pos_conv_embed.conv."),
)


def _normalize_keys(sd: Mapping) -> dict:
    """fairseq / old-HF naming -> canonical HF HubertModel naming."""
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("hubert.").removeprefix("model.")
        if k.startswith(("label_embs", "final_proj", "mask_emb",
                         "masked_spec_embed", "quantizer", "project_q")):
            continue
        if k.startswith("post_extract_proj."):
            k = k.replace("post_extract_proj.", "feature_projection.projection.")
        if k.startswith("layer_norm."):
            k = k.replace("layer_norm.", "feature_projection.layer_norm.", 1)
        for a, b in _FAIRSEQ_MAP:
            k = k.replace(a, b)
        # fairseq conv frontend: conv_layers.{i}.0 = conv, .2 = group norm
        if k.startswith("feature_extractor.conv_layers."):
            parts = k.split(".")
            if parts[3] == "0":
                parts[3] = "conv"
            elif parts[3] == "2":
                parts[3] = "layer_norm"
            k = ".".join(parts)
        # torch >= 2.1 weight-norm parametrization naming
        k = k.replace("parametrizations.weight.original0", "weight_g")
        k = k.replace("parametrizations.weight.original1", "weight_v")
        out[k] = v
    return out


def _fold_pos_conv(sd: Mapping) -> np.ndarray:
    """Fold weight_norm(dim=2) of the positional conv: torch weight layout
    (Cout, Cin/groups, K), g (1, 1, K), norm over (Cout, Cin) per tap."""
    base = "encoder.pos_conv_embed.conv."
    if base + "weight" in sd:
        return _np(sd[base + "weight"])
    g = _np(sd[base + "weight_g"]).astype(np.float64)
    v = _np(sd[base + "weight_v"]).astype(np.float64)
    norm = np.sqrt(np.sum(v * v, axis=(0, 1), keepdims=True))
    return (g * v / norm).astype(np.float32)


def params_from_state_dict(sd: Mapping, cfg: HubertConfig) -> dict:
    sd = _normalize_keys(sd)

    def lin(name):
        return {"w": jnp.asarray(_np(sd[name + ".weight"]).T),
                "b": jnp.asarray(_np(sd[name + ".bias"]))}

    def ln(name):
        return {"scale": jnp.asarray(_np(sd[name + ".weight"])),
                "bias": jnp.asarray(_np(sd[name + ".bias"]))}

    params: dict = {"conv_layers": []}
    for i in range(len(cfg.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}"
        # torch conv1d weight (Cout, Cin, K) -> ours (K, Cin, Cout)
        layer = {"w": jnp.asarray(
            _np(sd[base + ".conv.weight"]).transpose(2, 1, 0))}
        if base + ".conv.bias" in sd:
            layer["b"] = jnp.asarray(_np(sd[base + ".conv.bias"]))
        if base + ".layer_norm.weight" in sd:
            layer["norm"] = ln(base + ".layer_norm")
        params["conv_layers"].append(layer)

    params["fp_ln"] = ln("feature_projection.layer_norm")
    params["fp_proj"] = lin("feature_projection.projection")
    w = _fold_pos_conv(sd)
    params["pos_conv"] = {
        "w": jnp.asarray(w.transpose(2, 1, 0)),
        "b": jnp.asarray(_np(sd["encoder.pos_conv_embed.conv.bias"])),
    }
    params["enc_ln"] = ln("encoder.layer_norm")
    params["layers"] = []
    for i in range(cfg.n_layer):
        base = f"encoder.layers.{i}"
        params["layers"].append({
            "q": lin(base + ".attention.q_proj"),
            "k": lin(base + ".attention.k_proj"),
            "v": lin(base + ".attention.v_proj"),
            "o": lin(base + ".attention.out_proj"),
            "attn_ln": ln(base + ".layer_norm"),
            "fc1": lin(base + ".feed_forward.intermediate_dense"),
            "fc2": lin(base + ".feed_forward.output_dense"),
            "final_ln": ln(base + ".final_layer_norm"),
        })
    return params


def load_hubert(path: str | Path,
                cfg: HubertConfig | None = None) -> tuple[dict, HubertConfig]:
    sd = load_torch_state_dict(path)
    if cfg is None:
        cfg = config_from_state_dict(sd)
    return params_from_state_dict(sd, cfg), cfg


def load_kmeans_centers(path: str | Path) -> np.ndarray:
    """(K, D) float32 cluster centers from a joblib sklearn k-means pickle
    (the reference's `.bin`, extractor.py:13) or a raw .npy/.npz."""
    path = Path(path)
    if path.suffix in (".npy", ".npz"):
        arr = np.load(str(path))
        if isinstance(arr, np.lib.npyio.NpzFile):
            arr = arr[arr.files[0]]
        return np.asarray(arr, np.float32)
    import joblib

    km = joblib.load(str(path))
    centers = getattr(km, "cluster_centers_", km)
    return np.asarray(centers, np.float32)
