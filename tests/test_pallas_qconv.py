"""Pallas int8 conv/matmul kernels (ops/pallas_qconv.py) vs the XLA int32
conv oracle — interpret mode (CPU). Hardware perf/compile behavior is
covered by scripts/exp_pallas_int8.py + scripts/diag_mosaic_int8.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parrot_tts_tpu.ops import pallas_qconv as pq


@pytest.fixture
def rng():
    return np.random.default_rng(0)


CASES = [
    # (b, t, ci, co, k, d, pads)
    (2, 64, 128, 128, 3, 1, (1, 1)),
    (2, 100, 128, 256, 3, 2, (2, 2)),
    (1, 96, 256, 128, 11, 5, (25, 25)),
    (2, 50, 128, 384, 5, 1, (2, 1)),     # asymmetric pads (polyphase)
    (2, 37, 128, 128, 1, 1, (0, 0)),     # 1x1, odd T
]


@pytest.mark.parametrize("case", CASES)
def test_int8_conv_matches_oracle(rng, case):
    b, t, ci, co, k, d, pads = case
    xq = rng.integers(-127, 128, size=(b, t, ci)).astype(np.int8)
    wq = rng.integers(-127, 128, size=(k, ci, co)).astype(np.int8)
    sx = rng.random((b,)).astype(np.float32) + 0.5
    sw = rng.random((co,)).astype(np.float32) + 0.5
    bias = rng.standard_normal((co,)).astype(np.float32)
    scale = sx[:, None] * sw[None, :]

    acc = jax.lax.conv_general_dilated(
        jnp.asarray(xq), jnp.asarray(wq), window_strides=(1,),
        padding=(pads,), rhs_dilation=(d,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32)
    want = (np.asarray(acc).astype(np.float64) * scale[:, None, :]
            + bias[None, None, :])

    got = np.asarray(pq.int8_conv_nwc_pallas(
        jnp.asarray(xq), jnp.asarray(wq), jnp.asarray(scale),
        jnp.asarray(bias), pads=pads, rhs_dilation=d,
        out_dtype=jnp.float32, block_t=64, block_n=128, interpret=True))
    assert got.shape == want.shape
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 1e-6, rel


def test_int8_conv_leaky_epilogue(rng):
    b, t, ci, co, k, d, pads = CASES[0]
    xq = rng.integers(-127, 128, size=(b, t, ci)).astype(np.int8)
    wq = rng.integers(-127, 128, size=(k, ci, co)).astype(np.int8)
    scale = (rng.random((b, co)) + 0.5).astype(np.float32)

    base = np.asarray(pq.int8_conv_nwc_pallas(
        jnp.asarray(xq), jnp.asarray(wq), jnp.asarray(scale),
        pads=pads, rhs_dilation=d, out_dtype=jnp.float32,
        block_t=64, block_n=128, interpret=True))
    leaky = np.asarray(pq.int8_conv_nwc_pallas(
        jnp.asarray(xq), jnp.asarray(wq), jnp.asarray(scale),
        pads=pads, rhs_dilation=d, out_dtype=jnp.float32, leaky=0.1,
        block_t=64, block_n=128, interpret=True))
    np.testing.assert_allclose(leaky, np.maximum(base, 0.1 * base),
                               rtol=1e-6)


def test_int8_matmul_exact(rng):
    a = rng.integers(-127, 128, size=(256, 512)).astype(np.int8)
    b = rng.integers(-127, 128, size=(512, 256)).astype(np.int8)
    got = np.asarray(pq.matmul_pallas(jnp.asarray(a), jnp.asarray(b),
                                      bm=128, bn=128, bk=256,
                                      interpret=True))
    np.testing.assert_array_equal(got, a.astype(np.int64) @ b.astype(np.int64))


def test_default_blocks_cover_nondivisible_co(rng):
    """co=384 with the DEFAULT block_n=256 must still write every channel
    (the channel grid dim floors; bn must divide co — reviewed bug)."""
    b, t, ci, co, k = 2, 64, 128, 384, 3
    xq = rng.integers(-127, 128, size=(b, t, ci)).astype(np.int8)
    wq = rng.integers(-127, 128, size=(k, ci, co)).astype(np.int8)
    scale = np.ones((b, co), np.float32)
    acc = jax.lax.conv_general_dilated(
        jnp.asarray(xq), jnp.asarray(wq), window_strides=(1,),
        padding=((1, 1),), dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32)
    got = np.asarray(pq.int8_conv_nwc_pallas(
        jnp.asarray(xq), jnp.asarray(wq), jnp.asarray(scale),
        pads=(1, 1), out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, np.asarray(acc).astype(np.float32),
                               rtol=1e-6)


def test_supported_gate():
    assert pq.supported((2, 10, 128), (3, 128, 256))
    assert not pq.supported((2, 10, 64), (3, 64, 128))   # lanes < 128
    assert not pq.supported((2, 10, 128), (3, 128, 96))  # co not 128-mult
