"""Length regulator vs a numpy repeat_interleave oracle (the reference's
semantics, modules/duration.py:6-24) and inference rounding parity."""

import numpy as np
import torch

import jax.numpy as jnp

from parrot_tts_tpu.ops import length_regulator as lr


def numpy_oracle(x, durs, out_len):
    b, s, d = x.shape
    out = np.zeros((b, out_len, d), x.dtype)
    mask = np.zeros((b, out_len), bool)
    for i in range(b):
        expanded = np.repeat(x[i], durs[i], axis=0)
        n = expanded.shape[0]
        out[i, :n] = expanded[:out_len]
        mask[i, :n] = True
    return out, mask


def test_length_regulator_matches_oracle(rng):
    b, s, d, out_len = 3, 7, 5, 30
    x = rng.standard_normal((b, s, d)).astype(np.float32)
    durs = rng.integers(0, 5, size=(b, s)).astype(np.int32)

    got, mask = lr.length_regulator(jnp.asarray(x), jnp.asarray(durs), out_len)
    want, want_mask = numpy_oracle(x, durs, out_len)
    np.testing.assert_allclose(np.asarray(got), want, atol=0)
    np.testing.assert_array_equal(np.asarray(mask), want_mask)


def test_zero_durations_everywhere():
    x = jnp.ones((1, 4, 2))
    durs = jnp.zeros((1, 4), jnp.int32)
    got, mask = lr.length_regulator(x, durs, 8)
    assert not bool(mask.any())
    assert float(jnp.abs(got).sum()) == 0.0


def test_inclusive_mask_quirk():
    # reference get_mask_from_lengths uses `ids <= lengths` (data.py:18)
    x = jnp.ones((1, 2, 3))
    durs = jnp.asarray([[2, 1]], jnp.int32)
    _, mask = lr.length_regulator(x, durs, 6, inclusive_mask=True)
    assert np.asarray(mask).sum() == 4  # 3 real frames + 1 (off-by-one)


def test_duration_rounding_matches_torch(rng):
    p = rng.standard_normal((100,)).astype(np.float32)
    ours = np.asarray(lr.durations_from_log_pred(jnp.asarray(p)))
    theirs = torch.clamp(torch.round(torch.exp(torch.from_numpy(p)) - 1), min=0)
    np.testing.assert_array_equal(ours, theirs.numpy().astype(np.int32))
