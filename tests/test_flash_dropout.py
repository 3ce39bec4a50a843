"""Flash-attention-with-dropout kernel (ops/flash_dropout.py).

CPU runs the kernel in Pallas interpret mode, which on this JAX version does
not implement the TPU counter PRNG — so the dropout_p > 0 paths (mask
regeneration identical across fwd/dq/dkv) are validated on real hardware by
`scripts/validate_flash_dropout.py`, whose recorded results live in PERF.md.
Here: the flash machinery itself (online softmax, key-padding bias, custom
VJP) against an XLA oracle at dropout_p = 0, and the threshold math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tts_tpu.ops import flash_dropout as fd


def _oracle(q, k, v, kpm, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    s = jnp.where(jnp.asarray(kpm)[:, None, None, :], -jnp.inf, s)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    b, h, t, d = 2, 2, 256, 128
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
               for _ in range(3))
    kpm = np.zeros((b, t), bool)
    kpm[0, 200:] = True
    kpm[1, 100:] = True
    return q, k, v, kpm


def test_forward_matches_xla(qkv):
    q, k, v, kpm = qkv
    scale = 1.0 / np.sqrt(q.shape[-1])
    bias = jnp.where(jnp.asarray(kpm), fd.NEG_BIAS, 0.0).astype(jnp.float32)
    o = fd.flash_attention_dropout(q, k, v, bias, jnp.array([7], jnp.int32),
                                   0.0, scale, 128, 128)
    ref = _oracle(q, k, v, kpm, scale)
    # kernel matmuls run bf16-operand/f32-accumulate (the XLA default
    # precision the rest of the model uses); tolerance sized to bf16
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=6e-3)


def test_grads_match_xla(qkv):
    q, k, v, kpm = qkv
    scale = 1.0 / np.sqrt(q.shape[-1])
    bias = jnp.where(jnp.asarray(kpm), fd.NEG_BIAS, 0.0).astype(jnp.float32)
    seed = jnp.array([7], jnp.int32)

    def loss_kernel(q, k, v):
        o = fd.flash_attention_dropout(q, k, v, bias, seed, 0.0, scale,
                                       128, 128)
        return jnp.sum(jnp.sin(o))

    def loss_oracle(q, k, v):
        return jnp.sum(jnp.sin(_oracle(q, k, v, kpm, scale)))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, go):
        scale_ref = float(jnp.max(jnp.abs(b)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=8e-3 * max(1.0, scale_ref))


def test_bias_and_seed_cotangents_are_none(qkv):
    """bias/seed are non-differentiable operands (stock-kernel convention);
    grad through the primal args must not try to differentiate them."""
    q, k, v, kpm = qkv
    bias = jnp.zeros((q.shape[0], q.shape[2]), jnp.float32)
    seed = jnp.array([3], jnp.int32)
    g = jax.grad(lambda q: jnp.sum(fd.flash_attention_dropout(
        q, k, v, bias, seed, 0.0, 0.1, 128, 128)))(q)
    assert g.shape == q.shape
    assert bool(jnp.all(jnp.isfinite(g)))


def test_threshold():
    assert fd._threshold(0.0) == 0
    assert fd._threshold(1.0) == 2**32 - 1
    assert abs(fd._threshold(0.1) / 2.0**32 - 0.1) < 1e-9


def test_pick_block():
    assert fd.pick_block(3584) == 512
    assert fd.pick_block(512) == 512
    assert fd.pick_block(640) == 128
    assert fd.pick_block(768) == 256
    with pytest.raises(ValueError):
        fd.pick_block(200)
