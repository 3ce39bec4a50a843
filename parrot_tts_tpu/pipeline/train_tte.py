"""TTE training driver: data -> compiled DP steps -> eval/ckpt/logging.

The runnable equivalent of `python train.py --config ... --num_gpus N`
(reference `/root/reference/train.py:117-191`), on a jax mesh instead of
Lightning DDP.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np

from parrot_tts_tpu.core import checkpoint as ckptlib
from parrot_tts_tpu.core import mesh as meshlib
from parrot_tts_tpu.core.config import (
    PipelineConfig,
    TTEModelConfig,
    TTETrainConfig,
    to_json,
)
from parrot_tts_tpu.core.metrics import CsvLogger, MetricsWriter, Throughput
from parrot_tts_tpu.data.prefetch import device_prefetch
from parrot_tts_tpu.data.tte_data import BucketedLoader, TTEDataset
from parrot_tts_tpu.train import tte as tte_train


def run(cfg: PipelineConfig, *, run_dir: str | Path | None = None,
        max_steps: int | None = None, resume: bool = True,
        crash_at_step: int | None = None) -> dict:
    """crash_at_step: recovery-drill hook (scripts/production_runs.py) —
    abort mid-run WITHOUT the final checkpoint save, so resume must come
    from the last periodic ckpt. A real SIGKILL would exercise the same
    trainer path but wedges this image's TPU relay for ~13 min (the grant
    is only reclaimed by timeout), so the drill raises instead."""
    run_dir = Path(run_dir or cfg.root_path)
    tcfg = cfg.tte_train

    train_ds = TTEDataset(cfg.root_path, cfg.alignment_path, "train",
                          cfg.tte_model.hubert_codes)
    val_ds = TTEDataset(cfg.root_path, cfg.alignment_path, "val",
                        cfg.tte_model.hubert_codes)
    import dataclasses

    model_cfg = dataclasses.replace(
        cfg.tte_model, vocab_size=train_ds.vocab_size,
        n_speaker=len(train_ds.speaker_map), pad_idx=train_ds.src_pad_idx)

    mesh = meshlib.create_mesh()
    n_data = mesh.shape[cfg.mesh.data_axis]
    global_batch = tcfg.batch_size * n_data

    # drop_last=False: partial batches are padded to static shape by sample
    # repetition (keeps tiny datasets trainable on wide meshes)
    loader = BucketedLoader(train_ds, global_batch, tcfg.src_buckets,
                            tcfg.tgt_buckets, seed=tcfg.seed, drop_last=False)
    val_loader = BucketedLoader(val_ds, global_batch, tcfg.src_buckets,
                                tcfg.tgt_buckets, seed=0, shuffle=False)

    state = tte_train.init_state(jax.random.key(tcfg.seed), model_cfg, tcfg)
    state = jax.device_put(state, meshlib.replicated(mesh))

    mgr = ckptlib.CheckpointManager(run_dir / "ckpt")
    ckptlib.save_config_json(run_dir / "ckpt", to_json(model_cfg))
    if resume and mgr.latest_step() is not None:
        state = mgr.restore(template=state)
        state = jax.device_put(state, meshlib.replicated(mesh))

    writer = MetricsWriter(run_dir / "logs")
    csv = CsvLogger(run_dir / "logs")
    thr = Throughput()
    rng = jax.random.key(tcfg.seed + 1)

    total = max_steps if max_steps is not None else tcfg.total_steps
    micro_steps = int(state.step)
    epoch = 0
    done = False
    last_val: dict = {}
    acc = tcfg.grad_acc_steps
    marks = {"log": micro_steps // (tcfg.log_every * acc),
             "val": micro_steps // (tcfg.val_every * acc),
             "save": micro_steps // (tcfg.save_every * acc)}

    def crossed(kind: str, every: int) -> bool:
        mark = micro_steps // (every * acc)
        if mark > marks[kind]:
            marks[kind] = mark
            return True
        return False

    pending: dict = {}   # partial accumulation groups, carried across epochs
    idle_epochs = 0
    while not done:
        made_progress = False
        # micro-batches are stacked host-side into (K, B, ...) groups and
        # run through ONE compiled call each (train_step_k): the relay
        # charges ~1.3 ms of fixed dispatch cost per call (PERF.md 4a),
        # so K dispatches per optimizer step wastes ~20% of the step
        stacked = _stack_microbatches(loader.batches(epoch), acc, pending)
        for batch in device_prefetch(stacked, mesh, batch_axis=1):
            k_here = batch["codes"].shape[0]
            tgt_len = batch["codes"].shape[2]
            state, metrics = tte_train.train_step_k(
                state, batch, rng, model_cfg, tcfg, tgt_len)
            made_progress = True
            micro_steps += k_here
            opt_steps = micro_steps // acc
            for _ in range(k_here):   # sec_per_batch stays per MICRO-batch
                thr.tick()

            if crossed("log", tcfg.log_every):
                vals = {k: float(v) for k, v in metrics.items()}
                writer.scalars(opt_steps, **{f"train_{k}": v
                                             for k, v in vals.items()})
                csv.log(opt_steps, **vals, **{"sec_per_batch":
                        thr.report()["seconds_per_batch"]})
                thr.reset()
            if crossed("val", tcfg.val_every):
                last_val = evaluate(state.params, val_loader, model_cfg)
                writer.scalars(opt_steps, **{f"val_{k}": v
                                             for k, v in last_val.items()})
            if crossed("save", tcfg.save_every):
                # step + latest val losses ride along as ckpt metadata
                # (reference embeds them in the ckpt name, train.py:144-151)
                mgr.save(opt_steps, jax.device_get(state),
                         metadata={"step": opt_steps,
                                   **{f"val_{k}": v
                                      for k, v in last_val.items()}})
            if crash_at_step is not None and opt_steps >= crash_at_step:
                raise RuntimeError(
                    f"simulated crash at optimizer step {opt_steps} "
                    "(recovery drill)")
            if opt_steps >= total:
                done = True
                break
        if made_progress:
            idle_epochs = 0
        else:
            # a tiny corpus can yield fewer than grad_acc_steps micro-
            # batches per epoch; the carried `pending` fills over epochs
            idle_epochs += 1
            if idle_epochs > acc:
                raise RuntimeError(
                    "loader yielded no full accumulation group in "
                    f"{idle_epochs} consecutive epochs")
        epoch += 1

    mgr.save(micro_steps // tcfg.grad_acc_steps, jax.device_get(state),
             metadata={"step": micro_steps // tcfg.grad_acc_steps,
                       **{f"val_{k}": v for k, v in last_val.items()}},
             wait=True)
    writer.close()
    return {"steps": micro_steps // tcfg.grad_acc_steps, "epochs": epoch}


def _stack_microbatches(batches, k: int, pending: dict):
    """Group same-bucket micro-batches into stacked (K, B, ...) pytrees for
    train_step_k. `pending` PERSISTS across epochs (the caller owns it):
    emitting K=1 leftovers per epoch would leave MultiSteps' mini_step
    mid-cycle and permanently disable train_step_k's single-apply fast
    path (full-K generic calls advance mini_step by K = 0 mod k, never
    restoring the residue). Carried-over micro-batches complete their
    group next epoch; at most k-1 micro-batches per bucket pair remain
    unconsumed when training stops."""

    def stack(group):
        return {key: np.stack([g[key] for g in group])
                for key in group[0] if key != "ids"}

    for b in batches:
        key = (b["phones"].shape[1], b["codes"].shape[1])
        pending.setdefault(key, []).append(b)
        if len(pending[key]) == k:
            yield stack(pending.pop(key))


def evaluate(params, val_loader: BucketedLoader,
             model_cfg: TTEModelConfig) -> dict:
    sums: dict[str, float] = {}
    n = 0
    for batch in val_loader.batches(0):
        tgt_len = batch["codes"].shape[1]
        batch.pop("ids", None)
        m = tte_train.eval_step(params, batch, model_cfg, tgt_len)
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += 1
    return {k: v / max(n, 1) for k, v in sums.items()}
