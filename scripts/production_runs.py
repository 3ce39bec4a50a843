"""Production-LENGTH training runs on the chip (VERDICT r4 #3).

Round 4 proved the trainables learn for 200-300 steps; this script runs the
REAL pipeline drivers at the reference's production step counts:

  (a) TTE: the full 50k-optimizer-step reference config
      (`/root/reference/utils/TTE/TTE_config.yaml`: batch 6 x grad-acc 4,
      warmup 2000, val/save every 1000) over a synthetic learnable corpus
      at reference-scale shapes (src bucket 128 / tgt bucket 512) — the
      full cosine horizon, checkpoint cadence under load, val loop.
  (b) Vocoder GAN: a >=10k-step segment of the reference config (full V1
      generator + MPD + MSD, segment 8960, global batch 16, bf16 discs)
      with the mel-L1 trajectory recorded.
  (c) Recovery drill for BOTH: the run aborts mid-flight via the
      trainers' crash_at_step hook (no final save — exactly what a crash
      leaves behind; SIGKILL is not used because killing a TPU-attached
      process wedges this image's relay ~13 min), then a second run()
      resumes from the last PERIODIC checkpoint and trains to completion.
      Loss continuity across the resume is asserted from the append-mode
      metrics.jsonl.

Writes production_runs.json + a VALIDATION.md section.

Usage: python scripts/production_runs.py [--tte-steps 50000]
           [--gan-steps 10000] [--out DIR]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os  # noqa: E402

import jax  # noqa: E402

# The image's sitecustomize force-registers the TPU backend regardless of
# the JAX_PLATFORMS env var; only this in-process config update wins
# (tests/conftest.py does the same). Lets --smoke run CPU-side while the
# chip is busy.
if os.environ.get("PARROT_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")


def log(m):
    print(m, flush=True)


def _read_jsonl(run_dir: Path, tag: str) -> list[tuple[int, float]]:
    rows = []
    with open(run_dir / "logs" / "metrics.jsonl") as f:
        for line in f:
            d = json.loads(line)
            if d["tag"] == tag:
                rows.append((int(d["step"]), float(d["value"]),
                             float(d["time"])))
    return rows


def _continuity(rows, t_crash: float) -> dict:
    """Loss just before the crash vs first loss after resume. The resume
    replays from the last periodic ckpt, so post-resume steps overlap the
    pre-crash tail; disambiguate by the crash wall time recorded between
    the two run() calls."""
    before = [(s, v) for s, v, t in rows if t <= t_crash]
    after = [(s, v) for s, v, t in rows if t > t_crash]
    pre = before[-1]
    post = after[0]
    return {"pre_crash": {"step": pre[0], "loss": round(pre[1], 4)},
            "post_resume": {"step": post[0], "loss": round(post[1], 4)}}


def _curve(rows, n=20):
    idx = np.linspace(0, len(rows) - 1, min(n, len(rows))).astype(int)
    return [[rows[i][0], round(rows[i][1], 4)] for i in idx]


def tte_production(total_steps: int, out_dir: Path,
                   smoke: bool = False) -> dict:
    from parrot_tts_tpu.core.config import (PipelineConfig, TTEModelConfig,
                                            TTETrainConfig,
                                            TransformerStackConfig)
    from parrot_tts_tpu.data.manifest import write_manifest
    from parrot_tts_tpu.pipeline import train_tte
    from parrot_tts_tpu.text.tokenizer import save_symbols

    rng = np.random.default_rng(0)
    letters = list("abcdefghijkl")
    n_codes = 1000                     # reference head size
    code_of = {ch: (83 * i + 7) % n_codes for i, ch in enumerate(letters)}

    root = out_dir / "tte"
    align = out_dir / "aligner"
    align.mkdir(parents=True, exist_ok=True)
    root.mkdir(parents=True, exist_ok=True)
    save_symbols(align / "symbols.json", [" "] + letters)
    (root / "speakers.json").write_text(json.dumps({"s0": 0, "s1": 1}))
    for split, n_utt in (("train", 256), ("val", 24)):
        entries = []
        for i in range(n_utt):
            n = int(rng.integers(40, 100))
            chars = rng.choice(letters, size=n)
            durs = rng.integers(2, 6, size=n)        # <= 99*5 < 512 codes
            codes = np.concatenate([
                np.full(d, code_of[c]) for c, d in zip(chars, durs)])
            entries.append({
                "audio": f"/x/{split}_{i}.wav",
                "characters": " ".join(chars),
                "hubert": " ".join(map(str, codes)),
                "duration": " ".join(map(str, durs)),
                "speaker": f"s{i % 2}",
            })
        write_manifest(root / f"{split}.txt", entries)

    # reference-scale model + EXACT reference train config; single bucket
    # pair (128/512) — every utterance fits, one compiled program
    model = TTEModelConfig(
        d_model=256, conv_n_filter=1024, conv_kernel_sizes=(9, 1),
        max_len=3500,
        encoder=TransformerStackConfig(n_layer=4, n_head=2, dropout_p=0.1),
        decoder=TransformerStackConfig(n_layer=4, n_head=2, dropout_p=0.1),
        dur_n_filter=256, dur_kernel_size=3, dur_dropout_p=0.5,
        hubert_codes=n_codes, n_speaker=2, vocab_size=16, pad_idx=0)
    if smoke:   # mechanics only — tiny model so the CPU compile is fast
        model = dataclasses.replace(
            model, d_model=32, conv_n_filter=64,
            encoder=TransformerStackConfig(n_layer=1, n_head=2,
                                           dropout_p=0.1),
            decoder=TransformerStackConfig(n_layer=1, n_head=2,
                                           dropout_p=0.1),
            dur_n_filter=16)
    tcfg = TTETrainConfig(total_steps=total_steps,
                          src_buckets=(128,), tgt_buckets=(512,))
    if smoke:   # mechanics shakeout (CPU): tight cadences, no convergence bar
        tcfg = dataclasses.replace(tcfg, save_every=10, val_every=20,
                                   warmup_steps=10, log_every=2)
    cfg = PipelineConfig(root_path=str(root), alignment_path=str(align),
                         tte_model=model, tte_train=tcfg)
    run_dir = out_dir / "tte_run"

    crash_step = max(tcfg.save_every + tcfg.save_every // 2 + 1,
                     int(total_steps * 0.3) + 7)     # NOT a save multiple
    log(f"[TTE] phase A: train to simulated crash at step {crash_step}")
    t0 = time.perf_counter()
    try:
        train_tte.run(cfg, run_dir=run_dir, crash_at_step=crash_step)
        raise AssertionError("crash hook did not fire")
    except RuntimeError as e:
        log(f"  crashed as planned: {e}")
    t_crash = time.time()
    log(f"[TTE] phase B: resume from the last periodic ckpt -> "
        f"{total_steps} steps")
    stats = train_tte.run(cfg, run_dir=run_dir)      # resume=True default
    dt = time.perf_counter() - t0

    rows = _read_jsonl(run_dir, "train_total_loss")
    cont = _continuity(rows, t_crash)
    val_rows = _read_jsonl(run_dir, "val_total_loss")
    first, last = rows[0], rows[-1]
    assert stats["steps"] >= total_steps
    assert np.isfinite(last[1])
    if not smoke:
        assert last[1] < 0.5 * first[1], \
            f"TTE loss did not converge over the full horizon: " \
            f"{first[1]} -> {last[1]}"
        # resume continuity: the first post-resume loss must sit near the
        # pre-crash loss (same run), nowhere near the init loss
        assert cont["post_resume"]["loss"] < max(
            2.0 * cont["pre_crash"]["loss"], 0.25 * first[1]), cont
    return {
        "total_steps": stats["steps"], "wall_s": round(dt, 1),
        "opt_steps_per_s": round(total_steps / dt, 2),
        "crash_step": crash_step, "continuity": cont,
        "train_loss_first": round(first[1], 4),
        "train_loss_last": round(last[1], 4),
        "val_points": len(val_rows),
        "val_loss_last": round(val_rows[-1][1], 4) if val_rows else None,
        "train_curve": _curve(rows),
        "val_curve": _curve(val_rows, 12),
    }


def gan_production(total_steps: int, out_dir: Path,
                   smoke: bool = False) -> dict:
    from parrot_tts_tpu.core.config import (PipelineConfig,
                                            VocoderTrainConfig)
    from parrot_tts_tpu.data import audio_io
    from parrot_tts_tpu.data.manifest import write_manifest
    from parrot_tts_tpu.pipeline import train_vocoder

    rng = np.random.default_rng(0)
    sr, hop = 16_000, 320
    data_dir = out_dir / "voc_data"
    data_dir.mkdir(parents=True, exist_ok=True)
    for split, n_utt in (("train", 64), ("val", 8)):
        entries = []
        for i in range(n_utt):
            n = 8960 + int(rng.integers(2, 14)) * hop
            t = np.arange(n) / sr
            f0 = 110 * (1 + (i % 8) * 0.5)
            wav = (0.4 * np.sin(2 * np.pi * f0 * t)
                   + 0.03 * rng.standard_normal(n)).astype(np.float32)
            # speaker = first two '_' fields (parse_speaker): keep them
            # identical across splits so val speakers exist in train
            p = data_dir / f"spk_{i % 4}_{split}{i:03d}.wav"
            audio_io.write_wav(p, wav, sr)
            codes = np.full(n // hop, (i % 8) * 4 + 1)
            entries.append({"audio": str(p),
                            "hubert": " ".join(map(str, codes))})
        write_manifest(data_dir / f"{split}.txt", entries)

    # reference config (full V1 + MPD + MSD, segment 8960, batch 16) with
    # the shipping bf16-disc lever; ckpt cadence tightened to 2000 so the
    # 10k segment exercises several saves + a real resume point
    tcfg = VocoderTrainConfig(disc_dtype="bfloat16",
                              checkpoint_interval=2000,
                              validation_interval=1000)
    vmcfg = None
    if smoke:   # tiny V1-shaped model for the CPU mechanics pass
        from parrot_tts_tpu.core.config import VocoderModelConfig

        vmcfg = VocoderModelConfig(
            resblock="1", upsample_rates=(4, 4, 4, 4),
            upsample_kernel_sizes=(8, 8, 8, 8),
            upsample_initial_channel=32, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),), num_embeddings=1000,
            embedding_dim=16, model_in_dim=32, multispkr="_",
            num_speakers=4)
        # x256 total upsample -> hop 256; short segment (8 codes) so the
        # CPU mechanics pass compiles/steps fast
        tcfg = dataclasses.replace(tcfg, code_hop_size=256,
                                   segment_size=2048)
    if smoke:
        tcfg = dataclasses.replace(tcfg, checkpoint_interval=10,
                                   validation_interval=20,
                                   summary_interval=2)
    cfg = (PipelineConfig(vocoder_train=tcfg) if vmcfg is None
           else PipelineConfig(vocoder_train=tcfg, vocoder_model=vmcfg))
    run_dir = out_dir / "voc_run"

    crash_step = int(total_steps * 0.5) + 3          # NOT a save multiple
    log(f"[GAN] phase A: train to simulated crash at step {crash_step}")
    t0 = time.perf_counter()
    try:
        train_vocoder.run(cfg, data_dir=data_dir, run_dir=run_dir,
                          max_steps=total_steps, crash_at_step=crash_step)
        raise AssertionError("crash hook did not fire")
    except RuntimeError as e:
        log(f"  crashed as planned: {e}")
    t_crash = time.time()
    log(f"[GAN] phase B: resume -> {total_steps} steps")
    stats = train_vocoder.run(cfg, data_dir=data_dir, run_dir=run_dir,
                              max_steps=total_steps)
    dt = time.perf_counter() - t0

    rows = _read_jsonl(run_dir, "mel_error")
    cont = _continuity(rows, t_crash)
    first, last = rows[0], rows[-1]
    assert stats["steps"] >= total_steps
    assert np.isfinite(last[1])
    if not smoke:
        assert last[1] < 0.75 * first[1], \
            f"GAN mel error did not improve over the segment: " \
            f"{first[1]} -> {last[1]}"
        assert cont["post_resume"]["loss"] < max(
            1.5 * cont["pre_crash"]["loss"], 0.5 * first[1]), cont
    val_rows = _read_jsonl(run_dir, "validation/mel_spec_error")
    return {
        "total_steps": stats["steps"], "wall_s": round(dt, 1),
        "steps_per_s": round(total_steps / dt, 2),
        "crash_step": crash_step, "continuity": cont,
        "mel_error_first": round(first[1], 4),
        "mel_error_last": round(last[1], 4),
        "val_points": len(val_rows),
        "val_mel_last": round(val_rows[-1][1], 4) if val_rows else None,
        "mel_curve": _curve(rows),
    }


def aligner_production(total_steps: int, out_dir: Path,
                       smoke: bool = False) -> dict:
    """CTC aligner (the third trainable) at reference dims (lstm 512 /
    conv 512 / 80 mels / batch 16, `/root/reference/utils/aligner/
    aligner_train_config.yaml`) through the REAL driver
    (`pipeline/train_aligner.py`), with the same mid-run crash + resume
    drill as the TTE/GAN runs. Corpus: signature-band mels (each token id
    lights a distinct 4-bin band, 3-5 frames per token, +noise) so the CTC
    loss has a known-learnable optimum."""
    import pickle

    from parrot_tts_tpu.core.config import (AlignerModelConfig,
                                            AlignerTrainConfig)
    from parrot_tts_tpu.pipeline.train_aligner import train_aligner

    rng = np.random.default_rng(0)
    n_mels = 20 if smoke else 80
    symbols = list("abcdefghijklmnopqrs"[: n_mels // 4 - 1])  # ids 1..19
    data_dir = out_dir / "aligner_data"
    (data_dir / "mels").mkdir(parents=True, exist_ok=True)
    (data_dir / "tokens").mkdir(exist_ok=True)
    index = []
    for i in range(16 if smoke else 96):
        n_tok = int(rng.integers(8, 17 if smoke else 41))
        toks = rng.integers(1, len(symbols) + 1, size=n_tok).astype(np.int32)
        frames = []
        for tk in toks:
            rep = int(rng.integers(3, 6))
            sig = np.zeros(n_mels, np.float32)
            sig[tk * 4 : tk * 4 + 4] = 1.0
            frames.append(np.tile(sig, (rep, 1)))
        mel = (np.concatenate(frames)
               + 0.1 * rng.standard_normal(
                   (sum(f.shape[0] for f in frames), n_mels)))
        np.save(data_dir / "mels" / f"u{i}.npy", mel.astype(np.float32))
        np.save(data_dir / "tokens" / f"u{i}.npy", toks)
        index.append((f"u{i}", mel.shape[0], n_tok))
    with open(data_dir / "dataset.pkl", "wb") as f:
        pickle.dump(index, f)

    mcfg = AlignerModelConfig(
        n_mels=n_mels, num_symbols=len(symbols) + 1,
        conv_dim=32 if smoke else 512, lstm_dim=32 if smoke else 512)
    tcfg = AlignerTrainConfig(
        batch_size=8 if smoke else 16, epochs=10 ** 9,
        checkpoint_steps=5 if smoke else 1000,
        plot_steps=10 if smoke else 1000,
        mel_bucket_sizes=(128, 256), token_bucket_sizes=(32, 64))

    crash_step = int(total_steps * 0.5) + 3          # NOT a save multiple
    log(f"[ALIGNER] phase A: train to simulated crash at step {crash_step}")
    t0 = time.perf_counter()
    try:
        train_aligner(data_dir, symbols, tcfg, model_cfg=mcfg,
                      log_dir=data_dir / "logs", max_steps=total_steps,
                      crash_at_step=crash_step, epoch_saves=False)
        raise AssertionError("crash hook did not fire")
    except RuntimeError as e:
        log(f"  crashed as planned: {e}")
    t_crash = time.time()
    log(f"[ALIGNER] phase B: resume -> {total_steps} steps")
    stats = train_aligner(data_dir, symbols, tcfg, model_cfg=mcfg,
                          log_dir=data_dir / "logs", max_steps=total_steps,
                          epoch_saves=False)
    dt = time.perf_counter() - t0

    rows = _read_jsonl(data_dir, "CTC_Loss")
    cont = _continuity(rows, t_crash)
    first, last = rows[0], rows[-1]
    assert stats["steps"] >= total_steps
    assert np.isfinite(last[1])
    if not smoke:
        assert last[1] < 0.25 * first[1], \
            f"aligner CTC did not converge: {first[1]} -> {last[1]}"
        assert cont["post_resume"]["loss"] < max(
            1.5 * cont["pre_crash"]["loss"], 0.5 * first[1]), cont
    return {
        "total_steps": stats["steps"], "wall_s": round(dt, 1),
        "steps_per_s": round(total_steps / dt, 2),
        "crash_step": crash_step, "continuity": cont,
        "ctc_first": round(first[1], 4), "ctc_last": round(last[1], 4),
        "ctc_curve": _curve(rows),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tte-steps", type=int, default=50_000)
    ap.add_argument("--gan-steps", type=int, default=10_000)
    ap.add_argument("--aligner-steps", type=int, default=10_000)
    ap.add_argument("--skip-tte", action="store_true")
    ap.add_argument("--skip-gan", action="store_true")
    ap.add_argument("--skip-aligner", action="store_true")
    ap.add_argument("--out", default="/tmp/parrot_production_runs")
    ap.add_argument("--smoke", action="store_true",
                    help="mechanics shakeout: tight cadences, no "
                         "convergence gates, skip VALIDATION.md write")
    args = ap.parse_args()

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    log(f"backend: {jax.default_backend()}")
    results = {"backend": jax.default_backend()}
    path = REPO / "production_runs.json"
    if path.exists():
        try:
            results = {**json.loads(path.read_text()), **results}
        except Exception:
            pass
    if not args.skip_tte:
        results["tte"] = tte_production(args.tte_steps, out_dir,
                                        smoke=args.smoke)
        if not args.smoke:
            path.write_text(json.dumps(results, indent=2))
    if not args.skip_gan:
        results["gan"] = gan_production(args.gan_steps, out_dir,
                                        smoke=args.smoke)
        if not args.smoke:
            path.write_text(json.dumps(results, indent=2))
    if not args.skip_aligner:
        results["aligner"] = aligner_production(args.aligner_steps, out_dir,
                                                smoke=args.smoke)
        if not args.smoke:
            path.write_text(json.dumps(results, indent=2))
    if args.smoke:
        log("smoke OK (no VALIDATION.md / production_runs.json write)")
        return

    md = REPO / "VALIDATION.md"
    marker = "\n## Production-length runs"
    block = [marker[1:], "",
             "(scripts/production_runs.py — full pipeline drivers, "
             "reference configs, crash+resume drill; curves in "
             "production_runs.json)", ""]
    if "tte" in results:
        t = results["tte"]
        block += [
            f"- TTE 50k-step reference config: train loss "
            f"{t['train_loss_first']} -> {t['train_loss_last']} over "
            f"{t['total_steps']} optimizer steps in {t['wall_s']} s "
            f"({t['opt_steps_per_s']} opt steps/s sustained, incl. val + "
            f"ckpt cadence); crash at step {t['crash_step']}, resume "
            f"continuity {t['continuity']}"]
    if "gan" in results:
        g = results["gan"]
        block += [
            f"- GAN {g['total_steps']}-step reference-config segment: "
            f"mel error {g['mel_error_first']} -> {g['mel_error_last']} "
            f"in {g['wall_s']} s ({g['steps_per_s']} steps/s sustained); "
            f"crash at step {g['crash_step']}, resume continuity "
            f"{g['continuity']}"]
    if "aligner" in results:
        a = results["aligner"]
        block += [
            f"- Aligner {a['total_steps']}-step reference-dims segment "
            f"(lstm/conv 512, 80 mels): CTC {a['ctc_first']} -> "
            f"{a['ctc_last']} in {a['wall_s']} s ({a['steps_per_s']} "
            f"steps/s sustained); crash at step {a['crash_step']}, resume "
            f"continuity {a['continuity']}"]
    text = md.read_text() if md.exists() else "# VALIDATION\n"
    if marker in text:
        start = text.index(marker)
        nxt = text.find("\n## ", start + 1)
        text = text[:start] + (text[nxt:] if nxt != -1 else "")
    md.write_text(text.rstrip() + "\n" + "\n".join(block) + "\n")
    log("production runs: OK")


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
