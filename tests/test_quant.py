"""int8 serving-path tests (ops/quant.py).

Semantic anchor: the int8 conv must EXACTLY equal the float conv computed
on the dequantized operands (the quantization error is then fully
characterized by the scales). Model-level: the quantized generator must
stay within a loose fidelity envelope of the f32 forward on CPU; the tight
hardware bounds (SNR / mel-L1, like the bf16 path's) are measured on the
real chip by scripts/tpu_parity_check.py.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parrot_tts_tpu.core.config import VocoderModelConfig
from parrot_tts_tpu.ops import conv as conv_ops
from parrot_tts_tpu.ops import folded as folded_ops
from parrot_tts_tpu.ops import quant


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quantize_symmetric(rng):
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    q, s = quant.quantize_per_tensor(x)
    qn, sn = quant.quantize_per_tensor(-x)
    assert q.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(qn), -np.asarray(q))
    assert float(s) == float(sn)
    assert int(np.abs(np.asarray(q)).max()) == 127


def test_quantize_zero_guard():
    q, s = quant.quantize_per_tensor(jnp.zeros((3, 3), jnp.float32))
    assert float(s) > 0 and int(np.abs(np.asarray(q)).max()) == 0
    wq, sw = quant.quantize_per_out_channel(jnp.zeros((3, 4, 5), jnp.float32))
    assert np.all(np.asarray(sw) > 0)


def test_int8_conv_matches_dequant_oracle(rng):
    x = jnp.asarray(rng.standard_normal((2, 48, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((5, 16, 8)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal(8), jnp.float32)
    y = quant.int8_conv_nwc(x, w, b, pads=(4, 4), rhs_dilation=2)

    xq, sx = quant.quantize_per_row(x)
    wq, sw = quant.quantize_per_out_channel(w)
    ref = conv_ops.conv1d(
        xq.astype(jnp.float32) * sx,
        wq.astype(jnp.float32) * sw[None, None, :], b,
        padding=4, dilation=2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_int8_conv_batch_invariance(rng):
    """Per-row scales: one utterance's quantized output is independent of
    its batchmates (a loud batchmate must not degrade a quiet one)."""
    quiet = jnp.asarray(rng.standard_normal((1, 32, 16)) * 0.01, jnp.float32)
    loud = jnp.asarray(rng.standard_normal((1, 32, 16)) * 10.0, jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 16, 16)) * 0.2, jnp.float32)
    solo = quant.int8_conv_nwc(quiet, w, None, pads=(1, 1))
    pair = quant.int8_conv_nwc(jnp.concatenate([quiet, loud]), w, None,
                               pads=(1, 1))
    np.testing.assert_allclose(np.asarray(solo[0]), np.asarray(pair[0]),
                               rtol=1e-6, atol=1e-7)


def test_int8_conv_error_bound(rng):
    """|quant - float| is bounded by the first-order scale budget."""
    k, ci, co = 3, 32, 32
    x = jnp.asarray(rng.standard_normal((1, 64, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, ci, co)) * 0.1, jnp.float32)
    y_q = quant.int8_conv_nwc(x, w, None, pads=(1, 1))
    y_f = conv_ops.conv1d(x, w, None, padding=1)
    sx = float(jnp.abs(x).max()) / 127
    sw = np.asarray(jnp.max(jnp.abs(w), axis=(0, 1))) / 127
    # per-output worst case: sum over k*ci taps of (|x| sw/2 + |w| sx/2 + ...)
    budget = k * ci * (sx * np.abs(np.asarray(w)).max()
                       + sw.max() * float(jnp.abs(x).max()))
    assert float(jnp.abs(y_q - y_f).max()) < 0.5 * budget


def test_folded_quant_conv_close_to_float(rng):
    g, ci, k, d = 4, 32, 3, 3
    xf = jnp.asarray(rng.standard_normal((2, 24, g * ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, ci, ci)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal(ci) * 0.1, jnp.float32)
    pad = conv_ops.get_padding(k, d)
    y_f = folded_ops.folded_conv1d(xf, w, b, g=g, padding=pad, dilation=d)
    y_q = folded_ops.folded_conv1d(xf, w, b, g=g, padding=pad, dilation=d,
                                   quant=True)
    err = float(jnp.abs(y_q - y_f).max()) / float(jnp.abs(y_f).max())
    assert err < 0.05, f"relative int8 error {err}"


def test_polyphase_transpose_quant_close_to_float(rng):
    u, k, cin, cout = 4, 8, 32, 16
    x = jnp.asarray(rng.standard_normal((2, 20, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)
    y_f = conv_ops.conv_transpose1d(x, w, b, stride=u, padding=(k - u) // 2)
    y_q = conv_ops.conv_transpose1d(x, w, b, stride=u, padding=(k - u) // 2,
                                    quant=True)
    assert y_q.shape == y_f.shape
    err = float(jnp.abs(y_q - y_f).max()) / float(jnp.abs(y_f).max())
    assert err < 0.05, f"relative int8 error {err}"


def test_folded_transpose_quant_close_to_float(rng):
    g, u, k, cin, cout = 2, 2, 4, 32, 16
    xf = jnp.asarray(rng.standard_normal((2, 16, g * cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)
    y_f = folded_ops.folded_conv_transpose1d(
        xf, w, b, g_in=g, stride=u, padding=(k - u) // 2)
    y_q = folded_ops.folded_conv_transpose1d(
        xf, w, b, g_in=g, stride=u, padding=(k - u) // 2, quant=True)
    assert y_q.shape == y_f.shape
    err = float(jnp.abs(y_q - y_f).max()) / float(jnp.abs(y_f).max())
    assert err < 0.05, f"relative int8 error {err}"


TINY = dict(
    resblock="1", upsample_rates=(4, 4, 2), upsample_kernel_sizes=(8, 8, 4),
    upsample_initial_channel=128, resblock_kernel_sizes=(3, 7),
    resblock_dilation_sizes=((1, 3), (1, 3)), num_embeddings=40,
    embedding_dim=16, model_in_dim=32, multispkr="_", num_speakers=4)


@pytest.mark.parametrize("mode", ["int8-tail", "int8"])
def test_generator_int8_modes(rng, mode):
    from parrot_tts_tpu.models.vocoder import generator as gen

    cfg_f = VocoderModelConfig(**TINY)
    cfg_q = dataclasses.replace(cfg_f, quant=mode)
    params = gen.fold_params(
        gen.init_code_generator(jax.random.key(0), cfg_f))
    code = jnp.asarray(rng.integers(0, 40, size=(2, 24)).astype(np.int32))
    spkr = jnp.asarray(rng.integers(0, 4, size=(2,)).astype(np.int32))

    y_f = np.asarray(gen.apply_code_generator(params, code, spkr, cfg_f))
    y_q = np.asarray(gen.apply_code_generator(params, code, spkr, cfg_q))
    assert y_q.shape == y_f.shape
    assert np.all(np.isfinite(y_q))
    # loose CPU envelope on a random-init net; tight bounds are measured on
    # hardware at reference scale (scripts/tpu_parity_check.py)
    snr = 10 * np.log10(float((y_f ** 2).mean())
                        / max(float(((y_f - y_q) ** 2).mean()), 1e-12))
    assert snr > 15.0, f"int8 CPU SNR {snr:.1f} dB"


def test_generator_int8_static(rng):
    """Static-activation int8 serving (generator_staticq): calibrate on a
    batch, serve the same checkpoint; output stays inside the fidelity
    envelope of the float forward and the site count is consistent."""
    from parrot_tts_tpu.models.vocoder import generator as gen
    from parrot_tts_tpu.models.vocoder import generator_staticq as sq

    cfg = VocoderModelConfig(**TINY)
    params = gen.fold_params(
        gen.init_code_generator(jax.random.key(0), cfg))
    code = jnp.asarray(rng.integers(0, 40, size=(2, 24)).astype(np.int32))
    spkr = jnp.asarray(rng.integers(0, 4, size=(2,)).astype(np.int32))

    qscales = sq.calibrate_qscales(params, code, spkr, cfg)
    assert isinstance(qscales, tuple) and len(qscales) > 0
    for s in qscales:   # per-channel vectors, all positive
        assert s.ndim == 1 and bool((np.asarray(s) > 0).all())

    y_f = np.asarray(gen.apply_code_generator(params, code, spkr, cfg))
    y_q = np.asarray(sq.apply_code_generator_staticq(
        params, code, spkr, qscales, cfg))
    assert y_q.shape == y_f.shape and np.isfinite(y_q).all()
    snr = 10 * np.log10(float((y_f ** 2).mean())
                        / max(float(((y_f - y_q) ** 2).mean()), 1e-12))
    assert snr > 15.0, f"int8-static CPU SNR {snr:.1f} dB"

    # serving is deterministic given the calibration
    y_q2 = np.asarray(sq.apply_code_generator_staticq(
        params, code, spkr, qscales, cfg))
    np.testing.assert_array_equal(y_q, y_q2)

    # site-count mismatch raises (stale calibration guard)
    with pytest.raises(Exception):
        sq.apply_code_generator_staticq(
            params, code, spkr, qscales[:-2], cfg)


def test_synthesizer_int8_static_lazy_calibration(rng):
    """VocoderSynthesizer(quant='int8-static') auto-calibrates on the first
    batch and then serves; output within the envelope of the float
    synthesizer."""
    from parrot_tts_tpu.infer.synthesize import VocoderSynthesizer
    from parrot_tts_tpu.models.vocoder import generator as gen

    cfg_f = VocoderModelConfig(**TINY)
    cfg_q = dataclasses.replace(cfg_f, quant="int8-static")
    params = gen.init_code_generator(jax.random.key(0), cfg_f)
    codes = [rng.integers(0, 40, size=n).astype(np.int32)
             for n in (24, 24, 60)]
    spk = [0, 1, 2]
    base = VocoderSynthesizer(params, cfg_f).synthesize(codes, spk)
    synth = VocoderSynthesizer(params, cfg_q)
    got = synth.synthesize(codes, spk)
    assert synth._qscales is not None
    for a, b in zip(got, base):
        assert a.shape == b.shape
        num = float((np.asarray(b) ** 2).mean())
        den = max(float(((np.asarray(a) - np.asarray(b)) ** 2).mean()), 1e-12)
        assert 10 * np.log10(num / den) > 15.0


def test_qscales_save_load_roundtrip(tmp_path, rng):
    """Calibrated static scales persist beside the ckpt and reload into an
    identical serving output (serving restarts skip calibration)."""
    from parrot_tts_tpu.models.vocoder import generator as gen
    from parrot_tts_tpu.models.vocoder import generator_staticq as sq

    cfg = VocoderModelConfig(**TINY)
    params = gen.fold_params(gen.init_code_generator(jax.random.key(0), cfg))
    code = jnp.asarray(rng.integers(0, 40, size=(2, 24)).astype(np.int32))
    spkr = jnp.asarray(rng.integers(0, 4, size=(2,)).astype(np.int32))
    qs = sq.calibrate_qscales(params, code, spkr, cfg)
    p = tmp_path / "qscales.npz"
    sq.save_qscales(p, qs)
    qs2 = sq.load_qscales(p)
    assert len(qs2) == len(qs)
    y1 = np.asarray(sq.apply_code_generator_staticq(params, code, spkr,
                                                    qs, cfg))
    y2 = np.asarray(sq.apply_code_generator_staticq(params, code, spkr,
                                                    qs2, cfg))
    np.testing.assert_array_equal(y1, y2)
