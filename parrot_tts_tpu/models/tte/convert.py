"""Convert a reference PyTorch `Parrot` state_dict into our param pytree.

Enables (a) loading released reference checkpoints for unit-exact decode
parity (BASELINE.md north star) and (b) oracle tests against the reference
implementation. Key names follow `/root/reference/modules/parrot.py` /
`modules/fft.py` / `modules/duration.py`.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np
import jax.numpy as jnp

from parrot_tts_tpu.core.config import TTEModelConfig
from parrot_tts_tpu.ops.conv import from_torch_conv1d, from_torch_linear


def _lin(sd: Mapping, name: str) -> jnp.ndarray:
    return jnp.asarray(from_torch_linear(np.asarray(sd[f"{name}.weight"])))


def _conv(sd: Mapping, name: str) -> dict:
    return {
        "w": jnp.asarray(from_torch_conv1d(np.asarray(sd[f"{name}.weight"]))),
        "b": jnp.asarray(np.asarray(sd[f"{name}.bias"])),
    }


def _ln(sd: Mapping, name: str) -> dict:
    return {
        "scale": jnp.asarray(np.asarray(sd[f"{name}.weight"])),
        "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"])),
    }


def _fft_block(sd: Mapping, prefix: str) -> dict:
    return {
        "attn": {
            "qkv": _lin(sd, f"{prefix}.attention.qkv"),
            "in_proj": jnp.asarray(from_torch_linear(
                np.asarray(sd[f"{prefix}.attention.mha.in_proj_weight"]))),
            "out_proj": _lin(sd, f"{prefix}.attention.mha.out_proj"),
            "wo": _lin(sd, f"{prefix}.attention.wo"),
        },
        "conv1": _conv(sd, f"{prefix}.convlayer.conv1"),
        "conv2": _conv(sd, f"{prefix}.convlayer.conv2"),
        "attn_norm": _ln(sd, f"{prefix}.attn_norm"),
        "conv_norm": _ln(sd, f"{prefix}.conv_norm"),
    }


def params_from_torch(sd: Mapping, cfg: TTEModelConfig) -> dict:
    """Map a reference `Parrot.state_dict()` (tensors or numpy arrays) to the
    functional param tree of `models.tte.parrot`."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}

    n_enc = 1 + max((int(m.group(1)) for k in sd
                     if (m := re.match(r"encoder_layers\.(\d+)\.", k))),
                    default=-1)
    n_dec = 1 + max((int(m.group(1)) for k in sd
                     if (m := re.match(r"decoder_layers\.(\d+)\.", k))),
                    default=-1)
    if n_enc != cfg.encoder.n_layer or n_dec != cfg.decoder.n_layer:
        raise ValueError(
            f"layer count mismatch: ckpt {n_enc}/{n_dec} vs cfg "
            f"{cfg.encoder.n_layer}/{cfg.decoder.n_layer}")

    params = {
        "tok_emb": jnp.asarray(sd["tok_emb.weight"]),
        "duration_predictor": {
            "conv1": _conv(sd, "duration_predictor.layers.0.conv"),
            "ln1": _ln(sd, "duration_predictor.layers.2"),
            "conv2": _conv(sd, "duration_predictor.layers.4.conv"),
            "ln2": _ln(sd, "duration_predictor.layers.6"),
            "proj": {
                "w": _lin(sd, "duration_predictor.proj"),
                "b": jnp.asarray(sd["duration_predictor.proj.bias"]),
            },
        },
        "head": {
            "w": _lin(sd, "head"),
            "b": jnp.asarray(sd["head.bias"]),
        },
        "encoder_layers": [
            _fft_block(sd, f"encoder_layers.{i}") for i in range(n_enc)],
        "decoder_layers": [
            _fft_block(sd, f"decoder_layers.{i}") for i in range(n_dec)],
    }
    if "speaker_emb.weight" in sd:
        params["speaker_emb"] = jnp.asarray(sd["speaker_emb.weight"])
    return params
