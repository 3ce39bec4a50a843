"""End-to-end pipeline smoke test on a tiny synthetic corpus: text cleaning
-> symbols -> aligner preprocess -> CTC train (briefly) -> duration
extraction -> TTE manifests -> TTE training -> batched inference -> vocoder
split -> GAN training -> batched synthesis. This is the 'minimum end-to-end
slice' (SURVEY.md §7 build order step 2)."""

import dataclasses
import json
from pathlib import Path

import numpy as np
import pytest

import jax

from parrot_tts_tpu.core.config import (
    AlignerModelConfig,
    AlignerTrainConfig,
    MelConfig,
    PipelineConfig,
    TTEModelConfig,
    TTETrainConfig,
    TransformerStackConfig,
    VocoderModelConfig,
    VocoderTrainConfig,
)
from parrot_tts_tpu.data.audio_io import write_wav


SR = 16_000
SPEAKERS = ["en_f", "en_m"]
TEXTS = ["hello world", "the cat sat", "a dog ran by", "we sing songs",
         "tea and rice", "go home now"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic corpus: <root>/<speaker>/{wavs,txt}/utt_*.{wav,txt}."""
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    for spk in SPEAKERS:
        (root / spk / "wavs").mkdir(parents=True)
        (root / spk / "txt").mkdir(parents=True)
        for i, text in enumerate(TEXTS):
            n = SR // 4 + 320 * i               # 0.25-0.35 s
            t = np.arange(n) / SR
            f0 = 120 + 40 * rng.random()
            wav = 0.3 * np.sin(2 * np.pi * f0 * t) * (0.5 + 0.5 * rng.random(n))
            name = f"{spk}_utt_{i:03d}"
            write_wav(root / spk / "wavs" / f"{name}.wav", wav, SR)
            (root / spk / "txt" / f"{name}.txt").write_text(text)
    return root


def test_full_pipeline(corpus, tmp_path):
    from parrot_tts_tpu.pipeline.aligner_preprocess import (
        clean_corpus, compute_mels_and_tokens)

    runs = tmp_path / "runs"
    aligner_dir = runs / "aligner"

    # 1-2: clean text + symbols
    symbols = clean_corpus(corpus, aligner_dir)
    assert " " in symbols
    assert (aligner_dir / "symbols.pkl").exists()

    # 3: per-speaker mels + tokens (on-device batched mel). clean_txt was
    # written to aligner_dir/<spk>/clean_txt by clean_corpus;
    # compute_mels_and_tokens reads it from there.
    for spk in SPEAKERS:
        stats = compute_mels_and_tokens(
            corpus / spk, aligner_dir / spk, symbols,
            audio_cfg=None, batch_size=4)
        assert stats["items"] == len(TEXTS)

    # 4: brief aligner CTC training via the observability-wired driver
    from parrot_tts_tpu.core.checkpoint import CheckpointManager
    from parrot_tts_tpu.data.aligner_data import AlignerDataset
    from parrot_tts_tpu.pipeline.train_aligner import train_aligner
    from parrot_tts_tpu.train import aligner as atrain

    mcfg = AlignerModelConfig(n_mels=80, conv_dim=16, lstm_dim=16,
                              num_symbols=len(symbols) + 1)
    tcfg = AlignerTrainConfig(batch_size=4, epochs=1, plot_steps=2,
                              mel_bucket_sizes=(32,),
                              token_bucket_sizes=(16,))
    for spk in SPEAKERS:
        ds = AlignerDataset(aligner_dir / spk)
        out = train_aligner(aligner_dir / spk, symbols, tcfg,
                            model_cfg=mcfg)
        assert np.isfinite(out["ctc_loss"])
        # observability parity (reference trainer.py:73-75, 112-115):
        # ctc_loss scalars + decoded/target/duration-repeated text artifacts
        logs = aligner_dir / spk / "logs"
        tags = [json.loads(l)["tag"]
                for l in (logs / "metrics.jsonl").read_text().splitlines()]
        assert "CTC_Loss" in tags and "Params/learning_rate" in tags
        for tag in ("Text_Prediction", "Text_Target",
                    "Text_Target_Duration_Repeated"):
            assert list((logs / "text").glob(f"{tag}_*.txt")), tag

        # 5: duration extraction (from the ckpt the driver saved)
        from parrot_tts_tpu.pipeline.extract_durations import (
            extract_all_durations)

        state = CheckpointManager(aligner_dir / spk / "ckpt").restore(
            template=atrain.init_state(jax.random.key(0), mcfg, tcfg))
        stats = extract_all_durations(aligner_dir / spk, state.params,
                                      state.bn_state, batch_size=4)
        assert stats["items"] == len(TEXTS)
        # durations must sum to the mel frame count
        for stem, n_frames, _ in ds.index:
            durs = np.load(aligner_dir / spk / "outputs" / "durations"
                           / f"{stem}.npy")
            assert durs.sum() == n_frames

    # 6: synthetic hubert units, 1 per aligner mel frame (hop 320 == unit hop)
    rng = np.random.default_rng(1)
    hubert_lines = []
    for spk in SPEAKERS:
        ds = AlignerDataset(aligner_dir / spk)
        for stem, n_frames, _ in ds.index:
            units = rng.integers(0, 50, size=n_frames)
            hubert_lines.append({
                "audio": str(corpus / spk / "wavs" / f"{stem}.wav"),
                "hubert": " ".join(map(str, units)),
                "duration": n_frames * 320 / SR,
            })
    hubert_txt = runs / "hubert_extraction" / "hubert.txt"
    hubert_txt.parent.mkdir(parents=True)
    from parrot_tts_tpu.data.manifest import write_manifest

    write_manifest(hubert_txt, hubert_lines)

    # 7: prepare-tte — note aligner mels have 1 + T//hop frames, units have
    # T//hop; adjust_duration's ±2 tolerance reconciles this off-by-one
    from parrot_tts_tpu.pipeline.prepare_tte import build_tte_manifests

    tte_dir = runs / "TTE"
    stats = build_tte_manifests(hubert_txt, aligner_dir, tte_dir,
                                val_size=2, seed=0)
    assert stats["train"] + stats["val"] == len(TEXTS) * len(SPEAKERS)
    assert stats["skipped"] == 0

    # 8: TTE training (few steps) via the driver
    from parrot_tts_tpu.pipeline import train_tte

    cfg = PipelineConfig(
        root_path=str(tte_dir), alignment_path=str(aligner_dir),
        tte_model=TTEModelConfig(
            d_model=16, conv_n_filter=32, conv_kernel_sizes=(9, 1),
            max_len=128,
            encoder=TransformerStackConfig(n_layer=1, n_head=2),
            decoder=TransformerStackConfig(n_layer=1, n_head=2),
            dur_n_filter=8, dur_kernel_size=3, hubert_codes=50),
        tte_train=TTETrainConfig(
            batch_size=2, grad_acc_steps=1, warmup_steps=2, total_steps=4,
            log_every=2, val_every=100, save_every=100,
            src_buckets=(32,), tgt_buckets=(64,)),
    )
    out = train_tte.run(cfg, run_dir=tte_dir)
    assert out["steps"] >= 4

    # 9: batched TTE inference -> predictions.txt
    from parrot_tts_tpu.core.checkpoint import CheckpointManager
    from parrot_tts_tpu.data.tte_data import TTEDataset
    from parrot_tts_tpu.infer.tte_infer import write_predictions

    ds = TTEDataset(tte_dir, aligner_dir, "val", 50)
    model_cfg = dataclasses.replace(
        cfg.tte_model, vocab_size=ds.vocab_size,
        n_speaker=len(ds.speaker_map), pad_idx=ds.src_pad_idx)
    mgr = CheckpointManager(tte_dir / "ckpt")
    state = mgr.restore()
    preds = write_predictions(state["params"], ds, model_cfg,
                              tte_dir / "predictions.txt",
                              src_buckets=(32,))
    lines = [l for l in preds.read_text().splitlines() if l]
    assert len(lines) == len(ds)

    # 10: vocoder split + GAN training (few steps) + synthesis
    from parrot_tts_tpu.pipeline.prepare_tte import prepare_vocoder_split
    from parrot_tts_tpu.pipeline import train_vocoder

    voc_dir = runs / "vocoder"
    split = prepare_vocoder_split(hubert_txt, voc_dir, val_fraction=0.2,
                                  seed=0)
    assert split["train"] > 0 and split["val"] > 0

    voc_cfg = PipelineConfig(
        vocoder_model=VocoderModelConfig(
            resblock="1", upsample_rates=(4, 4),
            upsample_kernel_sizes=(8, 8), upsample_initial_channel=16,
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
            num_embeddings=50, embedding_dim=8, model_in_dim=16,
            multispkr="_", num_speakers=len(SPEAKERS)),
        vocoder_train=VocoderTrainConfig(
            batch_size=2, segment_size=512, code_hop_size=16,
            summary_interval=2, validation_interval=1000,
            checkpoint_interval=1000),
        mel=MelConfig(n_fft=64, num_mels=8, hop_size=16, win_size=64,
                      fmax=None),
    )
    # code_hop 16 != data's 320 — regenerate codes at hop 16 for the tiny
    # vocoder topology (total_upsample = 16)
    lines2 = []
    rng2 = np.random.default_rng(2)
    for e in hubert_lines:
        from parrot_tts_tpu.data.audio_io import read_wav

        wav, _ = read_wav(e["audio"])
        n_codes = len(wav) // 16
        lines2.append({**e, "hubert": " ".join(
            map(str, rng2.integers(0, 50, size=n_codes)))})
    write_manifest(voc_dir / "train.txt", lines2[2:])
    write_manifest(voc_dir / "val.txt", lines2[:2])

    out = train_vocoder.run(voc_cfg, data_dir=voc_dir,
                            run_dir=voc_dir, max_steps=3)
    assert out["steps"] >= 3

    # batched synthesis from the trained generator
    from parrot_tts_tpu.infer.synthesize import VocoderSynthesizer

    vmgr = CheckpointManager(voc_dir / "ckpt")
    vstate = vmgr.restore()
    synth = VocoderSynthesizer(vstate["gen_params"],
                               voc_cfg.vocoder_model)
    codes = [np.asarray([int(c) for c in e["hubert"].split()], np.int32)[:64]
             for e in lines2[:3]]
    wavs = synth.synthesize(codes, [0, 1, 0])
    assert len(wavs) == 3
    for c, w in zip(codes, wavs):
        assert w.shape[0] == len(c) * 16
        assert np.isfinite(w).all()
