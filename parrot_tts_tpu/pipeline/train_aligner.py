"""Aligner training driver: CTC loop + observability artifacts.

Reference: `/root/reference/utils/aligner/trainer.py` — per-step TB scalars
(CTC_Loss, Params/batch_size, Params/learning_rate, trainer.py:73-75),
checkpoints every `checkpoint_steps`, and every `plot_steps` a debug pass on
the LONGEST mel in the dataset (trainer.py:24-26, 90-116): the greedy CTC
decode vs the target transcript, plus the target with each symbol repeated
by its extracted duration.

The compute engine (jitted CTC step, NaN-skip) lives in `train/aligner.py`;
this module owns the host loop, logging and checkpoint cadence.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from parrot_tts_tpu.core.checkpoint import CheckpointManager
from parrot_tts_tpu.core.config import AlignerModelConfig, AlignerTrainConfig
from parrot_tts_tpu.core.metrics import MetricsWriter
from parrot_tts_tpu.data.aligner_data import AlignerDataset, AlignerLoader
from parrot_tts_tpu.ops.monotonic_align import extract_durations
from parrot_tts_tpu.text.tokenizer import CharTokenizer
from parrot_tts_tpu.train import aligner as atrain


def _longest_sample(ds: AlignerDataset) -> tuple[np.ndarray, np.ndarray]:
    """The dataset's longest mel + its tokens, the reference's fixed plot
    subject (trainer.py:24-26, dataset.py::get_longest_mel_id)."""
    i = max(range(len(ds.index)), key=lambda j: ds.index[j][1])
    return ds.load(i)


def log_alignment_artifacts(writer: MetricsWriter, state, tokenizer,
                            mel: np.ndarray, tokens: np.ndarray,
                            step: int) -> dict:
    """Debug pass matching reference trainer.py:90-116: eval-mode posteriors
    on one sample -> greedy decode text, target text, and the target with
    each symbol repeated by its Dijkstra-extracted duration."""
    post = np.asarray(
        atrain.posteriors(state.params, state.bn_state, mel[None]))[0]
    post = post[: len(mel)]
    debug = atrain.alignment_debug_text(
        np.log(np.maximum(post, 1e-10)), tokens, len(tokens), tokenizer)
    durations = extract_durations(tokens.astype(np.int64), post)
    # per-token decode (the reference reconstructs this by splitting the
    # joined string, trainer.py:106-110 — fragile when a symbol IS a space)
    symbols = [tokenizer.idx_to_token.get(int(t), "") for t in tokens]
    repeated = "".join(s * int(d) for s, d in zip(symbols, durations))
    writer.text("Text/Prediction", "    " + debug["decoded"], step)
    writer.text("Text/Target", "    " + debug["target"], step)
    writer.text("Text/Target_Duration_Repeated", "    " + repeated, step)
    return debug


def train_aligner(
    data_dir: str | Path,
    symbols: list[str],
    train_cfg: AlignerTrainConfig,
    model_cfg: AlignerModelConfig | None = None,
    log_dir: str | Path | None = None,
    seed: int = 0,
    max_steps: int | None = None,
    crash_at_step: int | None = None,
    epoch_saves: bool = True,
) -> dict:
    """Train the CTC aligner on one speaker's mels/tokens directory.

    Resumes from `data_dir/ckpt` when a checkpoint exists (the reference
    resumes from `latest_model.pt`, trainer.py:43-53). `max_steps` caps the
    step count across epochs; `crash_at_step` is the recovery-drill hook
    (scripts/production_runs.py) — it aborts WITHOUT the end-of-epoch save,
    as a real crash would. `epoch_saves=False` drops the reference's
    per-epoch latest-model save and relies on the `checkpoint_steps`
    cadence alone — use it when epochs are only a few steps (a small
    corpus would otherwise serialize the full state every handful of
    steps)."""
    data_dir = Path(data_dir)
    ds = AlignerDataset(data_dir)
    if model_cfg is None:
        n_mels = ds.load(0)[0].shape[1]
        model_cfg = AlignerModelConfig(n_mels=n_mels,
                                       num_symbols=len(symbols) + 1)
    loader = AlignerLoader(ds, train_cfg.batch_size,
                           train_cfg.mel_bucket_sizes,
                           train_cfg.token_bucket_sizes)
    tokenizer = CharTokenizer(symbols, for_phonemes=True)
    plot_mel, plot_tokens = _longest_sample(ds)

    state = atrain.init_state(jax.random.key(seed), model_cfg, train_cfg)
    mgr = CheckpointManager(data_dir / "ckpt")
    # config next to the ckpts so extract-durations can rebuild the restore
    # template (reference embeds config in the ckpt, trainer.py:77-88)
    from parrot_tts_tpu.core import checkpoint as ckptlib
    from parrot_tts_tpu.core.config import aligner_configs_to_json
    ckptlib.save_config_json(data_dir / "ckpt",
                             aligner_configs_to_json(model_cfg, train_cfg))
    if mgr.latest_step() is not None:
        state = mgr.restore(template=state)
    writer = MetricsWriter(Path(log_dir) if log_dir is not None
                           else data_dir / "logs")

    step = int(state.step)
    last_loss = float("nan")
    done = False
    try:
        for epoch in range(train_cfg.epochs):
            for batch in loader.batches(epoch):
                state, metrics = atrain.train_step(state, batch, train_cfg)
                step += 1
                last_loss = float(metrics["ctc_loss"])
                writer.scalar("CTC_Loss", last_loss, step)
                writer.scalar("Params/batch_size", train_cfg.batch_size, step)
                writer.scalar("Params/learning_rate",
                              train_cfg.learning_rate, step)
                if step % train_cfg.checkpoint_steps == 0:
                    mgr.save(step, jax.device_get(state))
                if step % train_cfg.plot_steps == 0:
                    log_alignment_artifacts(writer, state, tokenizer,
                                            plot_mel, plot_tokens, step)
                if crash_at_step is not None and step >= crash_at_step:
                    raise RuntimeError(
                        f"simulated crash at step {step} (recovery drill)")
                if max_steps is not None and step >= max_steps:
                    done = True
                    break
            if done:
                mgr.save(step, jax.device_get(state), wait=True)
                break
            if epoch_saves:
                mgr.save(step, jax.device_get(state),
                         wait=epoch == train_cfg.epochs - 1)
        # final artifacts so short runs still produce inspectables
        log_alignment_artifacts(writer, state, tokenizer, plot_mel,
                                plot_tokens, step)
    finally:
        writer.close()
    return {"steps": step, "ctc_loss": last_loss}
