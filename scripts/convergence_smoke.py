"""On-chip convergence smoke: real training loops must LEARN on TPU numerics.

Round 2's training-loop evidence was CPU tests; the chip had only ever
timed steps. This script runs short REAL training sessions on the attached
backend — the actual engines (train/tte.py, train/vocoder.py), the actual
loaders (BucketedLoader / VocoderLoader) over a synthetic learnable corpus
— asserts the losses decrease, and records the curves.

  * TTE: characters -> unit-code mapping where each character
    deterministically maps to one code repeated `dur` frames — a learnable
    task the CE loss must crush. (Reference loop: /root/reference/train.py:
    72-85.)
  * Vocoder GAN: sine-wave corpus, tiny V1-shaped topology; the generator
    mel-L1 against ground truth must drop. (Reference loop:
    /root/reference/utils/vocoder/train.py:114-168.)

Appends results to VALIDATION.md and convergence_results.json.

Usage: python scripts/convergence_smoke.py [--tte-steps N] [--gan-steps N]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(m):
    print(m, flush=True)


def tte_smoke(n_steps: int) -> dict:
    from parrot_tts_tpu.core.config import (TTEModelConfig, TTETrainConfig,
                                            TransformerStackConfig)
    from parrot_tts_tpu.data.manifest import write_manifest
    from parrot_tts_tpu.data.tte_data import BucketedLoader, TTEDataset
    from parrot_tts_tpu.text.tokenizer import save_symbols
    from parrot_tts_tpu.train import tte as tte_train

    rng = np.random.default_rng(0)
    letters = ["a", "b", "c", "d", "e"]
    n_codes = 32
    code_of = {ch: (7 * i + 3) % n_codes for i, ch in enumerate(letters)}

    with tempfile.TemporaryDirectory() as td:
        align = Path(td) / "aligner"
        align.mkdir()
        save_symbols(align / "symbols.json", [" "] + letters)
        root = Path(td) / "tte"
        root.mkdir()
        (root / "speakers.json").write_text(json.dumps({"s0": 0, "s1": 1}))
        entries = []
        for i in range(64):
            n = int(rng.integers(6, 13))
            chars = rng.choice(letters, size=n)
            durs = rng.integers(2, 5, size=n)
            codes = np.concatenate([
                np.full(d, code_of[c]) for c, d in zip(chars, durs)])
            entries.append({
                "audio": f"/x/utt_{i}.wav",
                "characters": " ".join(chars),
                "hubert": " ".join(map(str, codes)),
                "duration": " ".join(map(str, durs)),
                "speaker": f"s{i % 2}",
            })
        write_manifest(root / "train.txt", entries)
        ds = TTEDataset(root, align, "train", hubert_codes=n_codes)

        cfg = TTEModelConfig(
            d_model=64, conv_n_filter=128, conv_kernel_sizes=(9, 1),
            max_len=128,
            encoder=TransformerStackConfig(n_layer=2, n_head=2,
                                           dropout_p=0.1),
            decoder=TransformerStackConfig(n_layer=2, n_head=2,
                                           dropout_p=0.1),
            dur_n_filter=32, dur_kernel_size=3, dur_dropout_p=0.5,
            hubert_codes=n_codes, n_speaker=len(ds.speaker_map),
            vocab_size=ds.vocab_size, pad_idx=ds.src_pad_idx)
        tcfg = TTETrainConfig(batch_size=16, grad_acc_steps=1,
                              init_lr=3e-4, warmup_steps=50,
                              total_steps=max(n_steps, 200))
        loader = BucketedLoader(ds, 16, (16,), (64,), seed=3)
        state = tte_train.init_state(jax.random.key(0), cfg, tcfg)
        key = jax.random.key(1)

        curve = []
        step = 0
        t0 = time.perf_counter()
        while step < n_steps:
            for batch in loader.batches(epoch=step):
                batch.pop("ids", None)
                tgt_len = batch["codes"].shape[1]
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                state, metrics = tte_train.train_step(
                    state, jb, jax.random.fold_in(key, step), cfg, tcfg,
                    tgt_len)
                step += 1
                if step % 25 == 0 or step == 1:
                    curve.append((step, float(metrics["total_loss"]),
                                  float(metrics["code_loss"])))
                    log(f"  tte step {step}: total "
                        f"{curve[-1][1]:.4f} code {curve[-1][2]:.4f}")
                if step >= n_steps:
                    break
        dt = time.perf_counter() - t0

    first, last = curve[0], curve[-1]
    assert np.isfinite(last[1])
    assert last[2] < 0.5 * first[2], \
        f"TTE code loss did not converge: {first[2]} -> {last[2]}"
    return {"steps": n_steps, "seconds": round(dt, 1),
            "code_loss_first": round(first[2], 4),
            "code_loss_last": round(last[2], 4),
            "curve": [[s, round(t, 4), round(c, 4)] for s, t, c in curve]}


def gan_smoke(n_steps: int) -> dict:
    from parrot_tts_tpu.core.config import (MelConfig, VocoderModelConfig,
                                            VocoderTrainConfig)
    from parrot_tts_tpu.data import audio_io
    from parrot_tts_tpu.data.manifest import write_manifest
    from parrot_tts_tpu.data.vocoder_data import VocoderDataset, VocoderLoader
    from parrot_tts_tpu.train import vocoder as voc_train

    rng = np.random.default_rng(0)
    sr, hop, seg = 16_000, 64, 4096
    mcfg = VocoderModelConfig(
        resblock="1", upsample_rates=(4, 4, 2, 2),
        upsample_kernel_sizes=(8, 8, 4, 4), upsample_initial_channel=128,
        resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3), (1, 3)),
        num_embeddings=32, embedding_dim=32, model_in_dim=64,
        multispkr="_", num_speakers=2)
    tcfg = VocoderTrainConfig(batch_size=8, learning_rate=2e-4,
                              segment_size=seg, code_hop_size=hop)
    mel_cfg = MelConfig(n_fft=256, num_mels=40, hop_size=64, win_size=256,
                        fmax=None)

    with tempfile.TemporaryDirectory() as td:
        entries = []
        for i in range(16):
            n = seg + int(rng.integers(0, 8)) * hop
            t = np.arange(n) / sr
            f0 = 110 * (1 + (i % 4))
            wav = (0.4 * np.sin(2 * np.pi * f0 * t)
                   + 0.05 * rng.standard_normal(n)).astype(np.float32)
            p = Path(td) / f"s{i % 2}_utt_{i:03d}.wav"
            audio_io.write_wav(p, wav, sr)
            # codes follow the f0 class so the mapping is learnable
            codes = np.full(n // hop, (i % 4) * 8 + 1)
            entries.append({"audio": str(p),
                            "hubert": " ".join(map(str, codes))})
        write_manifest(Path(td) / "train.txt", entries)
        ds = VocoderDataset(Path(td) / "train.txt", segment_size=seg,
                            code_hop_size=hop, multispkr="_")
        loader = VocoderLoader(ds, tcfg.batch_size, seed=5)

        state = voc_train.init_state(jax.random.key(0), mcfg, tcfg,
                                     steps_per_epoch=10)
        curve = []
        step = 0
        t0 = time.perf_counter()
        while step < n_steps:
            for batch in loader.batches(epoch=step):
                batch.pop("filenames", None)
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                state, metrics = voc_train.train_step(
                    state, jb, mcfg, tcfg, mel_cfg, 10)
                step += 1
                if step % 25 == 0 or step == 1:
                    curve.append((step, float(metrics["mel_error"]),
                                  float(metrics["loss_disc_all"])))
                    log(f"  gan step {step}: mel_err {curve[-1][1]:.4f} "
                        f"d_loss {curve[-1][2]:.4f}")
                if step >= n_steps:
                    break
        dt = time.perf_counter() - t0

    first, last = curve[0], curve[-1]
    assert np.isfinite(last[1]) and np.isfinite(last[2])
    assert last[1] < 0.75 * first[1], \
        f"GAN mel error did not improve: {first[1]} -> {last[1]}"
    return {"steps": n_steps, "seconds": round(dt, 1),
            "mel_error_first": round(first[1], 4),
            "mel_error_last": round(last[1], 4),
            "curve": [[s, round(m, 4), round(d, 4)] for s, m, d in curve]}


def aligner_smoke(n_steps: int) -> dict:
    """CTC aligner (the third trainable): mels whose frames carry a
    per-token signature pattern — CTC must learn to transcribe it.
    Reference loop: /root/reference/utils/aligner/trainer.py:56-71."""
    import pickle

    from parrot_tts_tpu.core.config import (AlignerModelConfig,
                                            AlignerTrainConfig)
    from parrot_tts_tpu.data.aligner_data import AlignerDataset, AlignerLoader
    from parrot_tts_tpu.train import aligner as atrain

    rng = np.random.default_rng(0)
    n_mels, n_sym = 20, 6          # symbols 1..5 (0 = CTC blank)
    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        (root / "mels").mkdir()
        (root / "tokens").mkdir()
        index = []
        for i in range(48):
            n_tok = int(rng.integers(4, 9))
            toks = rng.integers(1, n_sym, size=n_tok).astype(np.int32)
            frames = []
            for tk in toks:
                rep = int(rng.integers(3, 6))
                sig = np.zeros(n_mels, np.float32)
                sig[tk * 3:(tk + 1) * 3] = 1.0
                frames.append(np.tile(sig, (rep, 1)))
            mel = (np.concatenate(frames)
                   + 0.1 * rng.standard_normal(
                       (sum(f.shape[0] for f in frames), n_mels)))
            np.save(root / "mels" / f"u{i}.npy", mel.astype(np.float32))
            np.save(root / "tokens" / f"u{i}.npy", toks)
            index.append((f"u{i}", mel.shape[0], n_tok))
        with open(root / "dataset.pkl", "wb") as f:
            pickle.dump(index, f)

        ds = AlignerDataset(root)
        mcfg = AlignerModelConfig(n_mels=n_mels, conv_dim=32, lstm_dim=32,
                                  num_symbols=n_sym)
        tcfg = AlignerTrainConfig(batch_size=8, learning_rate=3e-4,
                                  mel_bucket_sizes=(48,),
                                  token_bucket_sizes=(8,))
        loader = AlignerLoader(ds, tcfg.batch_size, tcfg.mel_bucket_sizes,
                               tcfg.token_bucket_sizes)
        state = atrain.init_state(jax.random.key(0), mcfg, tcfg)

        curve = []
        step = 0
        t0 = time.perf_counter()
        while step < n_steps:
            for batch in loader.batches(epoch=step):
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                state, metrics = atrain.train_step(state, jb, tcfg)
                step += 1
                if step % 25 == 0 or step == 1:
                    curve.append((step, float(metrics["ctc_loss"])))
                    log(f"  aligner step {step}: ctc {curve[-1][1]:.4f}")
                if step >= n_steps:
                    break
        dt = time.perf_counter() - t0

    first, last = curve[0], curve[-1]
    assert np.isfinite(last[1])
    assert last[1] < 0.5 * first[1], \
        f"aligner CTC loss did not converge: {first[1]} -> {last[1]}"
    return {"steps": n_steps, "seconds": round(dt, 1),
            "ctc_loss_first": round(first[1], 4),
            "ctc_loss_last": round(last[1], 4),
            "curve": [[s, round(c, 4)] for s, c in curve]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tte-steps", type=int, default=300)
    ap.add_argument("--gan-steps", type=int, default=200)
    ap.add_argument("--aligner-steps", type=int, default=200)
    args = ap.parse_args()

    log(f"backend: {jax.default_backend()}")
    results = {"backend": jax.default_backend()}
    log(f"[TTE] {args.tte_steps} steps on the synthetic learnable corpus")
    results["tte"] = tte_smoke(args.tte_steps)
    log(f"[GAN] {args.gan_steps} steps on the sine corpus")
    results["gan"] = gan_smoke(args.gan_steps)
    log(f"[ALIGNER] {args.aligner_steps} CTC steps on the signature corpus")
    results["aligner"] = aligner_smoke(args.aligner_steps)

    (REPO / "convergence_results.json").write_text(json.dumps(results,
                                                              indent=2))
    md = REPO / "VALIDATION.md"
    block = ("\n## Convergence smoke (scripts/convergence_smoke.py)\n\n"
             f"- backend `{results['backend']}`\n"
             f"- TTE: code loss {results['tte']['code_loss_first']} -> "
             f"{results['tte']['code_loss_last']} over "
             f"{results['tte']['steps']} steps "
             f"({results['tte']['seconds']} s)\n"
             f"- GAN: mel error {results['gan']['mel_error_first']} -> "
             f"{results['gan']['mel_error_last']} over "
             f"{results['gan']['steps']} steps "
             f"({results['gan']['seconds']} s)\n"
             f"- Aligner: CTC loss {results['aligner']['ctc_loss_first']} "
             f"-> {results['aligner']['ctc_loss_last']} over "
             f"{results['aligner']['steps']} steps "
             f"({results['aligner']['seconds']} s)\n")
    if md.exists():
        text = md.read_text()
        marker = "\n## Convergence smoke"
        tail = ""
        if marker in text:                 # replace ONLY the previous block
            start = text.index(marker)
            nxt = text.find("\n## ", start + 1)
            tail = text[nxt:] if nxt != -1 else ""
            text = text[:start]
        md.write_text(text + block + tail)
    else:
        md.write_text("# VALIDATION\n" + block)
    log("convergence smoke: OK")


if __name__ == "__main__":
    main()
