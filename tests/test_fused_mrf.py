"""Fused MRF Pallas kernel (ops/fused_mrf.py) vs the unfused folded
composition, in interpret mode on CPU. Shapes are small but exercise every
structural element: 3 branches, dilated+plain pairs, halo stitching across
multiple tiles, halo-padded DMA, true-sequence-edge zero padding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tts_tpu.core.config import VocoderModelConfig
from parrot_tts_tpu.models.vocoder import generator as gen
from parrot_tts_tpu.ops import folded as folded_ops
from parrot_tts_tpu.ops import fused_mrf


def _folded_resblocks(key, channels, kernel_sizes, dilations):
    rbs = []
    for i, (k, d) in enumerate(zip(kernel_sizes, dilations)):
        rbs.append(gen.init_resblock1(jax.random.fold_in(key, i),
                                      channels, k, d))
    # weight-norm fold (serving path)
    from parrot_tts_tpu.ops.weight_norm import WN_AXES_CONV1D, wn_resolve
    out = []
    for rb in rbs:
        out.append({
            name: [{"w": wn_resolve(c, WN_AXES_CONV1D), "b": c["b"]}
                   for c in rb[name]]
            for name in ("convs1", "convs2")
        })
    return out


KS = (3, 7, 11)
DS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))


@pytest.mark.parametrize("g,channels,t", [(2, 8, 192), (4, 4, 384)])
def test_fused_matches_unfused(g, channels, t, rng):
    """t folded rows; unfolded length g*t."""
    key = jax.random.key(0)
    rbs = _folded_resblocks(key, channels, KS, DS)
    xf = jnp.asarray(
        rng.standard_normal((2, t, g * channels)).astype(np.float32))

    flat, plan = fused_mrf.pack_mrf(rbs, g, KS, DS, jnp.float32)
    got = fused_mrf.mrf_fused(xf, flat, plan)
    assert got is not None, "no tile size found for test shape"

    acc = None
    for rb, k, d in zip(rbs, KS, DS):
        y = gen.apply_resblock1(rb, xf, k, d, g=g)
        acc = y if acc is None else acc + y
    want = acc / len(rbs)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_generator_fused_flag_parity(rng):
    """Full tiny generator: fused_mrf on vs off, folded serving params."""
    cfg = VocoderModelConfig(
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32, model_in_dim=16,
        num_embeddings=20, embedding_dim=8, num_speakers=3,
        fused_mrf=True)
    params = gen.init_code_generator(jax.random.key(1), cfg)
    params = gen.fold_params(params)
    code = jnp.asarray(rng.integers(0, 20, size=(2, 96)).astype(np.int32))
    spkr = jnp.asarray(np.array([0, 2], np.int32))

    y_fused = gen.apply_code_generator(params, code, spkr, cfg)
    cfg_off = dataclasses.replace(cfg, fused_mrf=False)
    y_ref = gen.apply_code_generator(params, code, spkr, cfg_off)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-5, rtol=2e-5)


def test_pick_tb():
    assert fused_mrf._pick_tb(10000, 16) == 2000
    assert fused_mrf._pick_tb(96, 8) in (32, 96)
    assert fused_mrf._pick_tb(7, 16) is None
