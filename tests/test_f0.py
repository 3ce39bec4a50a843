"""f0 estimation (ops/f0.py) + generic upsample-concat conditioning — the
TPU-native counterpart of the reference's dormant f0 path
(`/root/reference/utils/vocoder/dataset.py:25-41`, `models.py:126,131-166`).

pYAAPT (amfm_decompy) is not a dependency here, so the extractor is validated
against ground-truth synthetic pitch instead of the reference function; the
upsample-concat mechanism IS validated against the live reference
`CodeGenerator._upsample`.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parrot_tts_tpu.core.config import VocoderModelConfig
from parrot_tts_tpu.models.vocoder import generator as gen
from parrot_tts_tpu.ops.f0 import estimate_f0, f0_to_code_rate

from tests import reference_oracle

RATE = 16000


def sine(freq, n=RATE, amp=0.5):
    t = np.arange(n) / RATE
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_estimate_f0_sine_accuracy():
    freqs = [120.0, 220.0, 330.0]
    audio = np.stack([sine(f) for f in freqs])
    f0 = np.asarray(estimate_f0(jnp.asarray(audio)))
    assert f0.shape[0] == len(freqs) and f0.shape[1] == 1
    for b, f in enumerate(freqs):
        track = f0[b, 0]
        voiced = track[track > 0]
        # interior of a pure tone must be voiced and within 3%
        assert voiced.size > 0.8 * track.size
        assert abs(np.median(voiced) - f) / f < 0.03


def test_estimate_f0_silence_and_noise_unvoiced():
    rng = np.random.default_rng(0)
    silence = np.zeros((1, RATE), np.float32)
    assert np.all(np.asarray(estimate_f0(jnp.asarray(silence))) == 0.0)
    noise = rng.normal(0, 0.1, (1, RATE)).astype(np.float32)
    track = np.asarray(estimate_f0(jnp.asarray(noise)))[0, 0]
    # white noise has no stable periodicity: mostly unvoiced
    assert np.mean(track > 0) < 0.35


def test_estimate_f0_interp_bridges_gaps():
    # voiced tone, silent gap, voiced tone — interp fills the gap between
    # the surrounding voiced values (reference samp_interp branch)
    a = np.concatenate([sine(150, RATE // 2), np.zeros(RATE // 4, np.float32),
                        sine(200, RATE // 2)])[None]
    raw = np.asarray(estimate_f0(jnp.asarray(a)))[0, 0]
    assert np.any(raw == 0.0)
    filled = np.asarray(estimate_f0(jnp.asarray(a), interp=True))[0, 0]
    assert np.all(filled > 0.0)
    lo, hi = 150 * 0.95, 200 * 1.05
    gap = filled[(raw == 0.0)]
    assert np.all((gap >= lo) & (gap <= hi))


def test_f0_to_code_rate_voiced_mean():
    # 8 frames -> 2 code frames (pool 4); zeros excluded from the mean
    f0 = jnp.asarray([[[100.0, 0.0, 110.0, 0.0, 0.0, 0.0, 0.0, 0.0]]])
    pooled = np.asarray(f0_to_code_rate(f0, 2))
    assert pooled.shape == (1, 1, 2)
    assert pooled[0, 0, 0] == pytest.approx(105.0)
    assert pooled[0, 0, 1] == 0.0


@pytest.mark.skipif(not reference_oracle.available(),
                    reason="reference mount not present")
@pytest.mark.parametrize("shape", [(2, 3, 5), (2, 3), (2,)])
def test_upsample_cond_matches_reference(shape):
    import torch
    reference_oracle.add_reference_paths()
    from models import CodeGenerator  # reference utils/vocoder/models.py

    rng = np.random.default_rng(1)
    sig = rng.normal(size=shape).astype(np.float32)
    ref = CodeGenerator._upsample(torch.from_numpy(sig), 20).numpy()
    ours = np.asarray(gen.upsample_cond(jnp.asarray(sig), 20))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


def test_upsample_cond_misalignment_raises():
    with pytest.raises(NotImplementedError):
        gen.upsample_cond(jnp.zeros((1, 2, 7)), 20)


def _tiny_cfg(**kw):
    base = dict(
        resblock="1", upsample_rates=(5, 4), upsample_kernel_sizes=(11, 8),
        upsample_initial_channel=32, resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)), num_embeddings=30,
        embedding_dim=8, model_in_dim=16, multispkr="_", num_speakers=4)
    base.update(kw)
    return VocoderModelConfig(**base)


def test_code_generator_f0_conditioning():
    # cfg.f0 on: the f0 channel joins the concat, so model_in_dim = 2E + 1
    cfg = _tiny_cfg(model_in_dim=17, f0=True)
    params = gen.init_code_generator(jax.random.PRNGKey(0), cfg)
    code = jnp.zeros((2, 10), jnp.int32)
    spkr = jnp.zeros((2,), jnp.int32)
    f0 = jnp.full((2, 1, 10), 180.0)
    wav = gen.apply_code_generator(params, code, spkr, cfg,
                                   extra_feats={"f0": f0})
    assert wav.shape == (2, 200, 1)
    assert bool(jnp.all(jnp.isfinite(wav)))
    # conditioning is live: a different f0 changes the waveform
    wav2 = gen.apply_code_generator(params, code, spkr, cfg,
                                    extra_feats={"f0": f0 * 0.5})
    assert not np.allclose(np.asarray(wav), np.asarray(wav2))


def test_code_generator_f0_key_skipped_when_gate_off():
    # reference behavior (models.py:163): an f0 kwarg is DROPPED when the
    # config has no f0 gate — output identical with and without it
    cfg = _tiny_cfg()
    params = gen.init_code_generator(jax.random.PRNGKey(0), cfg)
    code = jnp.zeros((2, 10), jnp.int32)
    spkr = jnp.zeros((2,), jnp.int32)
    base = gen.apply_code_generator(params, code, spkr, cfg)
    with_f0 = gen.apply_code_generator(
        params, code, spkr, cfg, extra_feats={"f0": jnp.ones((2, 1, 10))})
    np.testing.assert_array_equal(np.asarray(base), np.asarray(with_f0))


def test_code_generator_generic_extra_feature():
    # any non-reserved key is upsample-concatenated (models.py:160-166)
    cfg = _tiny_cfg(model_in_dim=18)
    params = gen.init_code_generator(jax.random.PRNGKey(0), cfg)
    code = jnp.zeros((2, 10), jnp.int32)
    spkr = jnp.zeros((2,), jnp.int32)
    emb = jnp.ones((2, 2, 5))   # Tc=5 divides T=10 -> repeat 2
    wav = gen.apply_code_generator(params, code, spkr, cfg,
                                   extra_feats={"emb": emb})
    assert wav.shape == (2, 200, 1)
    assert bool(jnp.all(jnp.isfinite(wav)))


def test_f0_to_code_rate_chirp_alignment():
    """Pooling must use the HOP ratio (4), not floor(F/code_len): the
    extractor's window+lag lookahead trims tail frames, and deriving the
    factor from the frame count drifts the pooling window ~5 ms per code
    frame (16% end-of-segment f0 error on a chirp — review finding)."""
    n = 8960                      # the production GAN segment
    t = np.arange(n) / RATE
    dur = n / RATE
    f_inst = 100.0 + 200.0 * t / dur          # 100 -> 300 Hz linear chirp
    phase = 2 * np.pi * np.cumsum(f_inst) / RATE
    audio = (0.5 * np.sin(phase)).astype(np.float32)[None]

    track = estimate_f0(jnp.asarray(audio))
    code_len = n // 320
    pooled = np.asarray(f0_to_code_rate(track, code_len))[0, 0]
    # each code frame covers 20 ms; compare against the chirp's true
    # frequency at that frame's center (tail frame may pool fewer samples)
    centers = (np.arange(code_len) + 0.5) * 320 / RATE
    f_true = 100.0 + 200.0 * centers / dur
    voiced = pooled > 0
    assert voiced[:-1].all()
    err = np.abs(pooled[voiced] - f_true[voiced]) / f_true[voiced]
    assert float(err.max()) < 0.08, (pooled, f_true)
