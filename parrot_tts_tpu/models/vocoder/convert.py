"""Convert reference PyTorch HiFi-GAN state_dicts into our param pytrees.

Covers the released `g_*` generator checkpoints and the `do_*` discriminator
checkpoints (`/root/reference/utils/vocoder/train.py:182-191`,
`utils/vocoder/utils.py:48-59`), enabling mel-allclose parity against
reference audio. Weight-norm tensors (weight_g/weight_v) map onto our {g, v}
decomposition; spectral-norm tensors (weight_orig/weight_u) onto {w, u}.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import jax.numpy as jnp

from parrot_tts_tpu.core.config import VocoderModelConfig
from parrot_tts_tpu.ops.conv import (
    from_torch_conv1d,
    from_torch_conv2d,
    from_torch_conv_transpose1d,
)


def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _wn_conv1d(sd: Mapping, name: str) -> dict:
    return {
        "g": jnp.asarray(_np(sd[f"{name}.weight_g"]).reshape(1, 1, -1)),
        "v": jnp.asarray(from_torch_conv1d(_np(sd[f"{name}.weight_v"]))),
        "b": jnp.asarray(_np(sd[f"{name}.bias"])),
    }


def _wn_convt1d(sd: Mapping, name: str) -> dict:
    return {
        "g": jnp.asarray(_np(sd[f"{name}.weight_g"]).reshape(1, -1, 1)),
        "v": jnp.asarray(from_torch_conv_transpose1d(_np(sd[f"{name}.weight_v"]))),
        "b": jnp.asarray(_np(sd[f"{name}.bias"])),
    }


def _wn_conv2d(sd: Mapping, name: str) -> dict:
    return {
        "g": jnp.asarray(_np(sd[f"{name}.weight_g"]).reshape(1, 1, 1, -1)),
        "v": jnp.asarray(from_torch_conv2d(_np(sd[f"{name}.weight_v"]))),
        "b": jnp.asarray(_np(sd[f"{name}.bias"])),
    }


def _sn_conv1d(sd: Mapping, name: str) -> dict:
    return {
        "w": jnp.asarray(from_torch_conv1d(_np(sd[f"{name}.weight_orig"]))),
        "u": jnp.asarray(_np(sd[f"{name}.weight_u"])),
        "sn_v": jnp.asarray(_np(sd[f"{name}.weight_v"])),
        "b": jnp.asarray(_np(sd[f"{name}.bias"])),
    }


def generator_params_from_torch(sd: Mapping, cfg: VocoderModelConfig) -> dict:
    """Map a reference (Code)Generator.state_dict() to our param tree."""
    n_ups = len(cfg.upsample_rates)
    nk = len(cfg.resblock_kernel_sizes)
    params: dict = {
        "conv_pre": _wn_conv1d(sd, "conv_pre"),
        "conv_post": _wn_conv1d(sd, "conv_post"),
        "ups": [_wn_convt1d(sd, f"ups.{i}") for i in range(n_ups)],
        "resblocks": [],
    }
    for i in range(n_ups * nk):
        if cfg.resblock == "1":
            nd = len(cfg.resblock_dilation_sizes[i % nk])
            params["resblocks"].append({
                "convs1": [_wn_conv1d(sd, f"resblocks.{i}.convs1.{j}")
                           for j in range(nd)],
                "convs2": [_wn_conv1d(sd, f"resblocks.{i}.convs2.{j}")
                           for j in range(nd)],
            })
        else:
            nd = len(cfg.resblock_dilation_sizes[i % nk])
            params["resblocks"].append({
                "convs": [_wn_conv1d(sd, f"resblocks.{i}.convs.{j}")
                          for j in range(nd)],
            })
    if "dict.weight" in sd:
        params["dict"] = jnp.asarray(_np(sd["dict.weight"]))
    if "spkr.weight" in sd:
        params["spkr"] = jnp.asarray(_np(sd["spkr.weight"]))
    return params


def mpd_params_from_torch(sd: Mapping) -> dict:
    discs = []
    for i in range(5):
        discs.append({
            "convs": [_wn_conv2d(sd, f"discriminators.{i}.convs.{j}")
                      for j in range(5)],
            "conv_post": _wn_conv2d(sd, f"discriminators.{i}.conv_post"),
        })
    return {"discriminators": discs}


def msd_params_from_torch(sd: Mapping) -> dict:
    discs = []
    for i in range(3):
        conv_fn = _sn_conv1d if i == 0 else _wn_conv1d
        discs.append({
            "convs": [conv_fn(sd, f"discriminators.{i}.convs.{j}")
                      for j in range(7)],
            "conv_post": conv_fn(sd, f"discriminators.{i}.conv_post"),
        })
    return {"discriminators": discs}
