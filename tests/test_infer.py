"""Inference-layer tests: synthesis bucketing/trimming, alignment debug
text, metrics writers."""

import numpy as np

import jax

from parrot_tts_tpu.core.config import VocoderModelConfig
from parrot_tts_tpu.core.metrics import MetricsWriter, Throughput
from parrot_tts_tpu.infer.synthesize import VocoderSynthesizer
from parrot_tts_tpu.models.vocoder import generator as gen


def tiny_cfg():
    return VocoderModelConfig(
        resblock="1", upsample_rates=(4,), upsample_kernel_sizes=(8,),
        upsample_initial_channel=8, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1,),), num_embeddings=20, embedding_dim=4,
        model_in_dim=8, multispkr="_", num_speakers=3)


def test_synthesizer_buckets_and_trims(rng):
    cfg = tiny_cfg()
    params = gen.init_code_generator(jax.random.key(0), cfg)
    synth = VocoderSynthesizer(params, cfg)
    assert "w" in synth.params["conv_pre"]  # weight norm folded

    lens = [37, 100, 400, 37]
    codes = [rng.integers(0, 20, size=n).astype(np.int32) for n in lens]
    wavs = synth.synthesize(codes, [0, 1, 2, 0])
    hop = cfg.total_upsample
    for n, w in zip(lens, wavs):
        assert w.shape == (n * hop,)
        assert np.isfinite(w).all()
    assert synth.last_rtf is not None and synth.last_rtf > 0

    # batching must not change per-utterance output: same code alone
    solo = synth.synthesize([codes[0]], [0])[0]
    np.testing.assert_allclose(solo, wavs[0], atol=1e-5)


def test_tte_decode_rebuckets_on_overflow(rng):
    """Slow-speech safety: a sample whose predicted duration overflows its
    heuristic out_len bucket is re-decoded in a larger bucket instead of
    being silently truncated (the reference's dynamic shapes never truncate,
    modules/duration.py:6-24)."""
    import jax.numpy as jnp

    from parrot_tts_tpu.core.config import (TTEModelConfig,
                                            TransformerStackConfig)
    from parrot_tts_tpu.infer.tte_infer import decode_buckets, max_decode_len
    from parrot_tts_tpu.models.tte import parrot

    cfg = TTEModelConfig(
        d_model=16, conv_n_filter=32, conv_kernel_sizes=(9, 1), max_len=512,
        encoder=TransformerStackConfig(n_layer=1, n_head=2),
        decoder=TransformerStackConfig(n_layer=1, n_head=2),
        dur_n_filter=8, dur_kernel_size=3, hubert_codes=24, n_speaker=2,
        vocab_size=12, pad_idx=0)
    params = parrot.init_parrot(jax.random.key(0), cfg)
    # force "slow speech": ~30 predicted frames per token, so an 8-token
    # sample (~240 frames) overflows the 8*16=128-frame heuristic bucket
    params["duration_predictor"]["proj"]["b"] = jnp.asarray([np.log(30.0)])

    phones = rng.integers(2, cfg.vocab_size, size=8).astype(np.int32)
    infer = jax.jit(parrot.infer_codes,
                    static_argnames=("cfg", "out_len", "exact"))
    units = decode_buckets(infer, params, cfg, [(phones, 1)],
                           [(8, 128, [0])], batch_size=4)

    # ground truth: one decode at the cap (what dynamic shapes would give)
    cap = max_decode_len(cfg)
    batch = {"phones": jnp.asarray(phones[None]),
             "src_mask": jnp.ones((1, 8), bool),
             "speaker": jnp.asarray([1], np.int32)}
    codes, mask, total = infer(params, batch, cfg=cfg, out_len=cap)
    assert int(total[0]) > 128          # the 128 bucket would have truncated
    want = np.asarray(codes)[0][np.asarray(mask)[0]]
    np.testing.assert_array_equal(units[0], want)
    assert len(units[0]) == int(total[0])


def test_alignment_debug_text():
    import jax.numpy as jnp

    from parrot_tts_tpu.text.tokenizer import CharTokenizer
    from parrot_tts_tpu.train.aligner import alignment_debug_text

    tok = CharTokenizer(["a", "b", "c"])
    # logits argmax: [a a blank b b c] -> collapsed "abc"
    t, v = 6, 4
    logits = np.full((t, v), -10.0, np.float32)
    for i, sym in enumerate([1, 1, 0, 2, 2, 3]):
        logits[i, sym] = 10.0
    out = alignment_debug_text(jnp.asarray(logits),
                               np.asarray([1, 2, 3]), 3, tok)
    assert out["decoded"] == "abc"
    assert out["target"] == "abc"


def test_metrics_writer(tmp_path, rng):
    w = MetricsWriter(tmp_path)
    w.scalar("loss", 1.5, step=1)
    w.scalars(2, loss=1.2, acc=0.8)
    w.audio("val/sample", (rng.standard_normal(160) * 0.1), 3, 16000)
    w.text("debug/align", "decoded | target", 4)
    w.figure_spectrogram("val/spec", rng.standard_normal((20, 8)), 5)
    w.close()
    assert (tmp_path / "metrics.jsonl").exists()
    assert list((tmp_path / "audio").glob("*.wav"))
    assert list((tmp_path / "text").glob("*.txt"))


def test_throughput():
    t = Throughput()
    t.tick(2.0)
    t.tick(2.0)
    rep = t.report()
    assert rep["seconds_per_batch"] > 0
    assert rep["audio_seconds_per_second"] > 0
    assert rep["rtf"] == 1.0 / rep["audio_seconds_per_second"]


def test_synthesizer_mesh_matches_single_device(rng):
    """Mesh-sharded synthesis (the TPU-native replacement for the
    reference's 8-GPU inference pool, utils/vocoder/inference.py:201-261)
    is BIT-identical to a single device running the same per-device batch
    shape — each mesh device computes its shard with the identical
    program, so sharding itself changes nothing. (Comparing against a
    DIFFERENT batch shape differs at f32-ULP level because XLA schedules
    convs per shape — the same pre-existing property as the solo
    batch-vs-batch-1 check above, which is allclose, not equal.)"""
    from parrot_tts_tpu.core.mesh import create_mesh

    cfg = tiny_cfg()
    params = gen.init_code_generator(jax.random.key(0), cfg)
    solo = VocoderSynthesizer(params, cfg)
    mesh = create_mesh()   # 8 virtual CPU devices (conftest)
    sharded = VocoderSynthesizer(params, cfg, mesh=mesh)

    lens = [37, 100, 400, 37, 256]     # 5 rows: pads to 8 under the mesh
    codes = [rng.integers(0, 20, size=n).astype(np.int32) for n in lens]
    spk = [0, 1, 2, 0, 1]
    got = sharded.synthesize(codes, spk)
    # bit-for-bit vs one-row-per-device (the mesh shards are 1 row each)
    base_rows = [solo.synthesize([c], [s])[0] for c, s in zip(codes, spk)]
    assert len(got) == len(base_rows)
    for a, b in zip(got, base_rows):
        np.testing.assert_array_equal(a, b)
    # and ULP-close vs the solo batched path
    base_batch = solo.synthesize(codes, spk)
    for a, b in zip(got, base_batch):
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-6)

    # 2-row shards (4-device mesh) == solo 2-row batches, bit-for-bit
    # (same-bucket codes so the 8 rows stay one batch)
    mesh4 = create_mesh(devices=jax.devices()[:4])
    sharded4 = VocoderSynthesizer(params, cfg, mesh=mesh4)
    codes8 = [rng.integers(0, 20, size=100).astype(np.int32)
              for _ in range(8)]
    spk8 = [0, 1, 2, 0, 1, 2, 0, 1]
    got4 = sharded4.synthesize(codes8, spk8)
    base2 = []
    for i in range(0, 8, 2):
        base2 += solo.synthesize(codes8[i:i + 2], spk8[i:i + 2])
    for a, b in zip(got4, base2):
        np.testing.assert_array_equal(a, b)


def test_hybrid_decode_margin_paths(rng):
    """exact='hybrid': fast decode + margin readback, exact re-decode of
    flagged samples. With threshold=inf every sample is flagged (all take
    the exact path); with threshold=0 none are. On CPU all precision modes
    agree, so both must equal the exact decode — the test exercises the
    flag bookkeeping and the re-decode plan."""
    import jax.numpy as jnp

    from parrot_tts_tpu.core.config import (TTEModelConfig,
                                            TransformerStackConfig)
    from parrot_tts_tpu.infer.tte_infer import decode_buckets
    from parrot_tts_tpu.models.tte import parrot

    cfg = TTEModelConfig(
        d_model=16, conv_n_filter=32, conv_kernel_sizes=(9, 1), max_len=512,
        encoder=TransformerStackConfig(n_layer=1, n_head=2),
        decoder=TransformerStackConfig(n_layer=1, n_head=2),
        dur_n_filter=8, dur_kernel_size=3, hubert_codes=24, n_speaker=2,
        vocab_size=12, pad_idx=0)
    params = parrot.init_parrot(jax.random.key(0), cfg)
    seqs = [rng.integers(2, cfg.vocab_size, size=n).astype(np.int32)
            for n in (6, 8, 5)]
    samples = [(s, i % 2) for i, s in enumerate(seqs)]
    plan = [(8, 128, [0, 1, 2])]
    infer = jax.jit(parrot.infer_codes,
                    static_argnames=("cfg", "out_len", "exact",
                                     "with_margin"))
    base = decode_buckets(infer, params, cfg, samples, plan,
                          batch_size=4, exact="selective-high")
    for thr in (float("inf"), 0.0):
        got = decode_buckets(infer, params, cfg, samples, plan,
                             batch_size=4, exact="hybrid",
                             margin_threshold=thr)
        for a, b in zip(got, base):
            np.testing.assert_array_equal(a, b)


def test_synthesize_empty_code_sequence(rng):
    """Empty unit sequences (empty/unknown text upstream) yield zero-length
    waveforms instead of crashing on the repeat-pad division."""
    cfg = tiny_cfg()
    params = gen.init_code_generator(jax.random.key(0), cfg)
    synth = VocoderSynthesizer(params, cfg)
    codes = [np.zeros((0,), np.int32),
             rng.integers(0, 20, size=50).astype(np.int32)]
    wavs = synth.synthesize(codes, [0, 1])
    assert wavs[0].shape == (0,)
    assert wavs[1].shape == (50 * cfg.total_upsample,)


def test_synthesizer_f0_conditioned(rng):
    """f0-conditioned serving: tracks ride the bucketed/padded batch and a
    missing track is a hard error (reference inference feeds f0 from the
    source audio — CodeDataset semantics)."""
    import dataclasses

    import pytest

    cfg = dataclasses.replace(tiny_cfg(), model_in_dim=9, f0=True)
    params = gen.init_code_generator(jax.random.key(0), cfg)
    synth = VocoderSynthesizer(params, cfg)

    lens = [37, 100]
    codes = [rng.integers(0, 20, size=n).astype(np.int32) for n in lens]
    tracks = [np.full(n, 150.0, np.float32) for n in lens]
    wavs = synth.synthesize(codes, [0, 1], f0=tracks)
    hop = cfg.total_upsample
    for n, w in zip(lens, wavs):
        assert w.shape == (n * hop,)
        assert np.isfinite(w).all()
    # conditioning is live and per-utterance exact under batching
    solo = synth.synthesize([codes[0]], [0], f0=[tracks[0]])[0]
    np.testing.assert_allclose(solo, wavs[0], atol=1e-5)
    other = synth.synthesize([codes[0]], [0], f0=[tracks[0] * 0.5])[0]
    assert not np.allclose(solo, other)

    with pytest.raises(ValueError, match="f0-conditioned"):
        synth.synthesize(codes, [0, 1])

    # int8-static cannot serve f0 checkpoints (scales calibrated on the
    # unconditioned graph) — constructor refuses
    qcfg = dataclasses.replace(cfg, quant="int8-static")
    with pytest.raises(ValueError, match="int8-static"):
        VocoderSynthesizer(params, qcfg)
