"""Joint TTE+vocoder serving: batched text->wav with compiled-graph reuse."""

import numpy as np

import jax

from parrot_tts_tpu.core.config import (
    TTEModelConfig,
    TransformerStackConfig,
    VocoderModelConfig,
)
from parrot_tts_tpu.infer.serving import ParrotTTS
from parrot_tts_tpu.models.tte import parrot
from parrot_tts_tpu.models.vocoder import generator as gen
from parrot_tts_tpu.text.cleaners import english_cleaners
from parrot_tts_tpu.text.tokenizer import DFATokenizer


def test_tts_end_to_end_batched():
    tok = DFATokenizer([" "] + list("abcdefghilmnorstwy,."))
    tte_cfg = TTEModelConfig(
        d_model=16, conv_n_filter=32, conv_kernel_sizes=(9, 1), max_len=512,
        encoder=TransformerStackConfig(n_layer=1, n_head=2),
        decoder=TransformerStackConfig(n_layer=1, n_head=2),
        dur_n_filter=8, dur_kernel_size=3, hubert_codes=30,
        vocab_size=len(tok), n_speaker=3)
    voc_cfg = VocoderModelConfig(
        resblock="1", upsample_rates=(4,), upsample_kernel_sizes=(8,),
        upsample_initial_channel=8, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1,),), num_embeddings=30, embedding_dim=4,
        model_in_dim=8, multispkr="_", num_speakers=3)

    tts = ParrotTTS(
        parrot.init_parrot(jax.random.key(0), tte_cfg), tte_cfg,
        gen.init_code_generator(jax.random.key(1), voc_cfg), voc_cfg,
        tok, english_cleaners, src_buckets=(64,))

    texts = ["hello world", "the cats sat down", "yes"]
    wavs = tts.tts(texts, speakers=[0, 1, 2])
    assert len(wavs) == 3
    hop = voc_cfg.total_upsample
    for w in wavs:
        assert w.ndim == 1 and len(w) % hop == 0
        assert np.isfinite(w).all()
    assert tts.last_stats["audio_seconds_per_second"] > 0

    # serving again reuses compiled graphs and is deterministic
    wavs2 = tts.tts(texts, speakers=[0, 1, 2])
    for a, b in zip(wavs, wavs2):
        np.testing.assert_array_equal(a, b)


def test_tts_mesh_matches_single_device():
    """End-to-end serving under a data mesh (TTE decode + vocoder both
    sharded) returns wavs bit-identical to the single-device path."""
    from parrot_tts_tpu.core.mesh import create_mesh

    tok = DFATokenizer([" "] + list("abcdefghilmnorstwy,."))
    tte_cfg = TTEModelConfig(
        d_model=16, conv_n_filter=32, conv_kernel_sizes=(9, 1), max_len=512,
        encoder=TransformerStackConfig(n_layer=1, n_head=2),
        decoder=TransformerStackConfig(n_layer=1, n_head=2),
        dur_n_filter=8, dur_kernel_size=3, hubert_codes=30,
        vocab_size=len(tok), n_speaker=3)
    voc_cfg = VocoderModelConfig(
        resblock="1", upsample_rates=(4,), upsample_kernel_sizes=(8,),
        upsample_initial_channel=8, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1,),), num_embeddings=30, embedding_dim=4,
        model_in_dim=8, multispkr="_", num_speakers=3)
    tte_params = parrot.init_parrot(jax.random.key(0), tte_cfg)
    voc_params = gen.init_code_generator(jax.random.key(1), voc_cfg)

    texts = ["hello world", "the cats sat down", "yes", "more words here"]
    spk = [0, 1, 2, 0]
    solo = ParrotTTS(tte_params, tte_cfg, voc_params, voc_cfg,
                     tok, english_cleaners, src_buckets=(64,))
    base = solo.tts(texts, speakers=spk)

    mesh = create_mesh()   # 8 virtual CPU devices (conftest)
    tts = ParrotTTS(tte_params, tte_cfg, voc_params, voc_cfg,
                    tok, english_cleaners, src_buckets=(64,), mesh=mesh)
    got = tts.tts(texts, speakers=spk)
    assert len(got) == len(base)
    # unit sequences must be IDENTICAL (ints; greedy decode), wavs agree
    # to f32 ULP (XLA schedules convs per per-device batch shape — see
    # test_infer.py::test_synthesizer_mesh_matches_single_device for the
    # bit-for-bit equal-shape assertion)
    tok_seqs = [tts.tokenize(t) for t in texts]
    units_solo = solo.predict_units(tok_seqs, spk)
    units_mesh = tts.predict_units(tok_seqs, spk)
    for a, b in zip(units_mesh, units_solo):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(got, base):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-6)
