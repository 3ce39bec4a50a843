"""Vocoder GAN training driver.

The runnable equivalent of `torch.distributed.run utils/vocoder/train.py`
(reference `/root/reference/utils/vocoder/train.py:244-291`) on a jax mesh.
Unlike the reference, startup does NOT wipe the checkpoint dir (the
reference's main() deletes it, defeating its own resume — SURVEY.md §5);
resume is the default.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np

from parrot_tts_tpu.core import checkpoint as ckptlib
from parrot_tts_tpu.core import mesh as meshlib
from parrot_tts_tpu.core.config import PipelineConfig, to_json
from parrot_tts_tpu.core.metrics import MetricsWriter, Throughput
from parrot_tts_tpu.data.prefetch import device_prefetch, threaded_loader
from parrot_tts_tpu.data.vocoder_data import VocoderDataset, VocoderLoader
from parrot_tts_tpu.ops import stft
from parrot_tts_tpu.train import vocoder as voc_train


def run(cfg: PipelineConfig, *, data_dir: str | Path,
        run_dir: str | Path = "runs/vocoder",
        max_steps: int | None = None, resume: bool = True,
        crash_at_step: int | None = None) -> dict:
    """crash_at_step: recovery-drill hook (scripts/production_runs.py) —
    abort mid-run WITHOUT the final checkpoint save (see
    pipeline/train_tte.py for why a raise, not SIGKILL)."""
    run_dir = Path(run_dir)
    mcfg, tcfg, mel_cfg = cfg.vocoder_model, cfg.vocoder_train, cfg.mel

    train_ds = VocoderDataset(
        Path(data_dir) / "train.txt", segment_size=tcfg.segment_size,
        code_hop_size=tcfg.code_hop_size, multispkr=mcfg.multispkr)
    val_ds = VocoderDataset(
        Path(data_dir) / "val.txt", segment_size=tcfg.segment_size,
        code_hop_size=tcfg.code_hop_size, multispkr=mcfg.multispkr,
        speaker_ids=train_ds.spkr_to_id)

    mesh = meshlib.create_mesh()
    n_data = mesh.shape[cfg.mesh.data_axis]
    # GLOBAL batch, rounded to the data-axis size so shard_batch tiles it;
    # the reference divides its global batch across workers (train.py:279) —
    # here VocoderLoader does that via process_index/process_count
    global_batch = max(1, tcfg.batch_size // n_data) * n_data
    loader = VocoderLoader(train_ds, global_batch, seed=tcfg.seed,
                           process_index=jax.process_index(),
                           process_count=jax.process_count(),
                           with_f0=mcfg.f0)
    steps_per_epoch = max(1, len(train_ds) // global_batch)

    state = voc_train.init_state(jax.random.key(tcfg.seed), mcfg, tcfg,
                                 steps_per_epoch)
    state = jax.device_put(state, meshlib.replicated(mesh))

    mgr = ckptlib.CheckpointManager(run_dir / "ckpt")
    ckptlib.save_config_json(run_dir / "ckpt", to_json(mcfg))
    if resume and mgr.latest_step() is not None:
        state = mgr.restore(template=state)
        state = jax.device_put(state, meshlib.replicated(mesh))

    writer = MetricsWriter(run_dir / "logs")
    thr = Throughput()
    audio_s_per_batch = (global_batch * tcfg.segment_size
                         / mel_cfg.sampling_rate)

    steps = int(state.step)
    total = max_steps if max_steps is not None else (
        tcfg.training_epochs * steps_per_epoch)
    epoch = steps // steps_per_epoch
    done = False
    while not done:
        made_progress = False
        it = threaded_loader(lambda e=epoch: loader.batches(e))
        for batch in device_prefetch(it, mesh, skip_keys=("filenames",)):
            batch.pop("filenames", None)
            state, metrics = voc_train.train_step(
                state, batch, mcfg, tcfg, mel_cfg, steps_per_epoch)
            made_progress = True
            steps += 1
            thr.tick(audio_s_per_batch)

            if steps % tcfg.summary_interval == 0:
                writer.scalars(steps, **{k: float(v)
                                         for k, v in metrics.items()})
                rep = thr.report()
                writer.scalar("train_audio_seconds_per_second",
                              rep["audio_seconds_per_second"], steps)
                thr.reset()
            if steps % tcfg.validation_interval == 0:
                val_err = validate(state.gen_params, val_ds, mcfg, mel_cfg,
                                   tcfg, writer, steps)
                writer.scalar("validation/mel_spec_error", val_err, steps)
            if steps % tcfg.checkpoint_interval == 0:
                mgr.save(steps, jax.device_get(state))
            if crash_at_step is not None and steps >= crash_at_step:
                raise RuntimeError(
                    f"simulated crash at step {steps} (recovery drill)")
            if steps >= total:
                done = True
                break
        if not made_progress:
            raise RuntimeError("loader yielded no batches this epoch")
        epoch += 1

    mgr.save(steps, jax.device_get(state), wait=True)
    writer.close()
    return {"steps": steps, "epochs": epoch}


def validate(gen_params, val_ds: VocoderDataset, mcfg, mel_cfg, tcfg,
             writer: MetricsWriter, step: int, max_items: int = 16) -> float:
    """Mel-L1 validation + audio/spectrogram logging
    (reference train.py:199-228)."""
    rng = np.random.default_rng(0)
    errs = []
    for i in range(min(max_items, len(val_ds))):
        item = val_ds.load_item(i, rng, split=True)
        batch = {
            "audio": item["audio"][None, :],
            "code": item["code"][None, :],
            "spkr": np.asarray([item["spkr"]], np.int32),
        }
        import jax.numpy as jnp

        if mcfg.f0:
            from parrot_tts_tpu.ops.f0 import estimate_f0, f0_to_code_rate
            batch["f0"] = np.asarray(f0_to_code_rate(
                estimate_f0(jnp.asarray(batch["audio"])),
                batch["code"].shape[1]), np.float32)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        batch["mel"] = stft.mel_spectrogram(
            batch["audio"], n_fft=mel_cfg.n_fft, num_mels=mel_cfg.num_mels,
            sampling_rate=mel_cfg.sampling_rate, hop_size=mel_cfg.hop_size,
            win_size=mel_cfg.win_size, fmin=mel_cfg.fmin, fmax=None)
        errs.append(float(voc_train.val_step(gen_params, batch, mcfg,
                                             mel_cfg)))
        if i < 2:
            from parrot_tts_tpu.models.vocoder import generator as gen

            y_hat = gen.apply_code_generator(
                gen_params, batch["code"], batch["spkr"], mcfg,
                extra_feats={"f0": batch["f0"]} if mcfg.f0 else None)
            writer.audio(f"generated/y_hat_{i}",
                         np.asarray(y_hat)[0, :, 0], step,
                         mel_cfg.sampling_rate)
            # spectrogram of the GENERATED audio (reference
            # train.py:221-226), not of the ground-truth mel; plotted with
            # h.fmax (the banded mel), not fmax_for_loss=None
            y_hat_mel = stft.mel_spectrogram(
                y_hat[:, :, 0], n_fft=mel_cfg.n_fft,
                num_mels=mel_cfg.num_mels,
                sampling_rate=mel_cfg.sampling_rate,
                hop_size=mel_cfg.hop_size, win_size=mel_cfg.win_size,
                fmin=mel_cfg.fmin, fmax=mel_cfg.fmax)
            writer.figure_spectrogram(
                f"generated/y_hat_spec_{i}",
                np.asarray(y_hat_mel)[0], step)
    return float(np.mean(errs)) if errs else float("nan")
