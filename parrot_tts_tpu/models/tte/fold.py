"""Serving-time parameter folding for the TTE.

The reference's attention applies FOUR projections per block — qkv Linear,
MHA in_proj, MHA out_proj, wo (`/root/reference/modules/fft.py:48-57`).
Consecutive linear maps with no nonlinearity between them compose, so for
inference we fold:

    in_proj_eff[:, q] = qkv[:, q] @ in_proj[:, q]   (per q/k/v third)
    out_proj_eff      = out_proj @ wo

halving the projection matmuls per block. Outputs are identical up to fp
reassociation (tested in tests/test_tte_parity.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def fold_attention_params(attn: dict) -> dict:
    d = attn["out_proj"].shape[0]
    qkv_parts = jnp.split(attn["qkv"], 3, axis=1)
    in_parts = jnp.split(attn["in_proj"], 3, axis=1)
    in_eff = jnp.concatenate(
        [a @ b for a, b in zip(qkv_parts, in_parts)], axis=1)
    out_eff = attn["out_proj"] @ attn["wo"]
    return {"in_proj": in_eff, "out_proj": out_eff}


def fold_tte_params(params: dict) -> dict:
    """Fold every FFT block's attention for serving. The rest of the tree is
    shared by reference."""
    folded = dict(params)
    for name in ("encoder_layers", "decoder_layers"):
        folded[name] = [
            {**blk, "attn": fold_attention_params(blk["attn"])}
            for blk in params[name]
        ]
    return folded
