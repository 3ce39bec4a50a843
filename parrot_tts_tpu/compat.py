"""Load the reference's released PyTorch checkpoints directly.

Three formats exist in the reference (SURVEY.md §5):
  * TTE: Lightning .ckpt — state_dict keys prefixed "parrot."
    (`/root/reference/train.py:62,144-151`, demo.ipynb downloads
    `epoch=...step=11000.ckpt`)
  * vocoder: raw torch.save dicts `g_<step>` ({'generator': sd}) and
    `do_<step>` ({'mpd','msd','optim_g','optim_d','steps','epoch'})
    (`utils/vocoder/train.py:182-191`, `utils/vocoder/utils.py:48-59`)
  * aligner: {'model','optim','config','symbols'}
    (`utils/aligner/trainer.py:77-88`)

torch (CPU) is only needed for deserialization; the returned trees are
pure-jax params.
"""

from __future__ import annotations

from pathlib import Path


def _torch_load(path):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def load_tte_lightning_ckpt(path: str | Path, cfg):
    """Lightning .ckpt -> (params, hyper_parameters dict)."""
    from parrot_tts_tpu.models.tte.convert import params_from_torch

    ckpt = _torch_load(path)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    stripped = {k[len("parrot."):]: v for k, v in sd.items()
                if k.startswith("parrot.")}
    if not stripped:  # plain Parrot state_dict
        stripped = sd
    return params_from_torch(stripped, cfg), ckpt.get("hyper_parameters")


def load_vocoder_generator_ckpt(path: str | Path, cfg):
    """Reference `g_<step>` file -> CodeGenerator param tree."""
    from parrot_tts_tpu.models.vocoder.convert import (
        generator_params_from_torch)

    ckpt = _torch_load(path)
    sd = ckpt["generator"] if "generator" in ckpt else ckpt
    return generator_params_from_torch(sd, cfg)


def load_vocoder_discriminator_ckpt(path: str | Path):
    """Reference `do_<step>` file -> (mpd_params, msd_params, meta)."""
    from parrot_tts_tpu.models.vocoder.convert import (
        mpd_params_from_torch,
        msd_params_from_torch,
    )

    ckpt = _torch_load(path)
    meta = {k: ckpt[k] for k in ("steps", "epoch") if k in ckpt}
    return (mpd_params_from_torch(ckpt["mpd"]),
            msd_params_from_torch(ckpt["msd"]), meta)


def load_aligner_ckpt(path: str | Path):
    """Reference aligner checkpoint -> (params, bn_state, config, symbols)."""
    from parrot_tts_tpu.models.aligner.model import params_from_torch

    ckpt = _torch_load(path)
    params, state = params_from_torch(ckpt["model"])
    return params, state, ckpt.get("config"), ckpt.get("symbols")
