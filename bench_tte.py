"""TTE training benchmark: reference-scale train steps/s on one chip.

Topology and hot loop mirror the reference's production run
(`/root/reference/utils/TTE/TTE_config.yaml`: d_model=256, conv_n_filter=1024,
4+4 FFT blocks, 1000-way head; `/root/reference/train.py:72-85`: batch 6 with
grad-accumulation 4, AdamW + warmup-cosine). Shapes are the static buckets a
typical corpus lands in (~128 source tokens -> ~512 unit frames at ~4
frames/token).

Reports MICRO-steps/s (one fwd+bwd on a batch-6 micro-batch, the unit
Lightning iterates); optimizer steps/s = value / 4. Prints ONE JSON line.
`run()` is importable — bench.py calls it so the driver-recorded BENCH
captures training perf too, not just synthesis.
"""

import argparse
import json
import sys
import time

SRC_LEN = 128
TGT_LEN = 512
BATCH = 6          # reference TTE_config.yaml train.batch_size
GRAD_ACC = 4       # reference TTE_config.yaml train.grad_acc_steps


def run(src_len: int = SRC_LEN, tgt_len: int = TGT_LEN, batch: int = BATCH,
        no_remat: bool = False, force_xla_attn: bool = False,
        iters: int = 40) -> dict:
    import numpy as np

    import jax

    from parrot_tts_tpu.core.config import (TTEModelConfig, TTETrainConfig,
                                            TransformerStackConfig)
    from parrot_tts_tpu.train import tte as tte_train

    cfg = TTEModelConfig(
        d_model=256, conv_n_filter=1024, conv_kernel_sizes=(9, 1),
        max_len=3500,
        encoder=TransformerStackConfig(n_layer=4, n_head=2, dropout_p=0.1),
        decoder=TransformerStackConfig(n_layer=4, n_head=2, dropout_p=0.1),
        dur_n_filter=256, dur_kernel_size=3, dur_dropout_p=0.5,
        hubert_codes=1000, n_speaker=10, vocab_size=100, pad_idx=0,
        remat=not no_remat)
    _saved_gates = None
    if force_xla_attn:
        from parrot_tts_tpu.ops import attention as attn_ops
        # patch BOTH gates: _use_flash picks the attention path, and
        # flash_available gates FFT-block remat in parrot._run_stack —
        # forcing only the former would measure a no-remat XLA config that
        # is not any production path (and can OOM at the 3584 bucket).
        # Saved + restored in the finally below so later run() calls in the
        # same process don't silently measure the forced-XLA config.
        _saved_gates = (attn_ops._use_flash, attn_ops.flash_available)
        attn_ops._use_flash = lambda *a, **k: False
        attn_ops.flash_available = lambda *a, **k: False
    try:
        return _run_inner(cfg, batch, src_len, tgt_len, iters)
    finally:
        if _saved_gates is not None:
            from parrot_tts_tpu.ops import attention as attn_ops
            attn_ops._use_flash, attn_ops.flash_available = _saved_gates


def _run_inner(cfg, batch: int, src_len: int, tgt_len: int,
               iters: int) -> dict:
    import numpy as np

    import jax

    from parrot_tts_tpu.core.config import TTETrainConfig
    from parrot_tts_tpu.train import tte as tte_train

    tcfg = TTETrainConfig(batch_size=batch, grad_acc_steps=GRAD_ACC,
                          warmup_steps=2000, total_steps=50_000)

    rng = np.random.default_rng(0)
    src_lens = rng.integers(src_len - 16, src_len + 1, size=batch)
    durs = np.zeros((batch, src_len), np.int32)
    for i, n in enumerate(src_lens):
        d = rng.integers(2, 7, size=n)
        scale = min(1.0, tgt_len / max(1, d.sum()))
        durs[i, :n] = np.maximum(1, (d * scale).astype(np.int32))
    tgt_lens = durs.sum(axis=1)
    import jax.numpy as jnp

    batch_d = {
        "phones": jnp.asarray(rng.integers(
            2, cfg.vocab_size, size=(batch, src_len)).astype(np.int32)),
        "duration": jnp.asarray(durs),
        "codes": jnp.asarray(rng.integers(
            0, cfg.hubert_codes, size=(batch, tgt_len)).astype(np.int32)),
        "src_mask": jnp.asarray(
            np.arange(src_len)[None, :] < src_lens[:, None]),
        "tgt_mask": jnp.asarray(
            np.arange(tgt_len)[None, :] < tgt_lens[:, None]),
        "speaker": jnp.asarray(rng.integers(
            0, cfg.n_speaker, size=(batch,)).astype(np.int32)),
    }

    state = tte_train.init_state(jax.random.key(0), cfg, tcfg)
    key = jax.random.key(1)

    # production path (pipeline/train_tte.py): GRAD_ACC micro-batches
    # stacked into one compiled train_step_k call — one relay dispatch
    # (~1.3 ms fixed, PERF.md 4a) per optimizer step instead of 4
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (GRAD_ACC,) + x.shape), batch_d)

    # compile + warmup; the float() readback is the completion barrier
    # (block_until_ready returns early through the axon relay)
    for _ in range(3):
        state, metrics = tte_train.train_step_k(state, stacked, key, cfg,
                                                tcfg, tgt_len)
        _ = float(metrics["total_loss"])

    # steady-state: steps chain on-device through the donated state; the
    # production loop (pipeline/train_tte.py) fetches metrics only at
    # log_every cadence, so only the final readback syncs the host. A
    # per-step float() would bill one ~26 ms relay round trip per step
    # (PERF.md methodology).
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        state, metrics = tte_train.train_step_k(state, stacked, key, cfg,
                                                tcfg, tgt_len)
        last = metrics["total_loss"]
    _ = float(last)
    dt = time.perf_counter() - t0

    steps_per_s = iters * GRAD_ACC / dt

    def fft_block_flops(b, length, d, nf, k1):
        attn = (2 * b * length * d * 3 * d      # qkv packed projection
                + 3 * 2 * b * length * d * d    # MHA in_proj (q,k,v)
                + 2 * 2 * b * length * length * d  # scores + attn@V
                + 2 * 2 * b * length * d * d)   # out_proj + wo
        conv = 2 * b * length * d * nf * k1 + 2 * b * length * nf * d
        return attn + conv

    fwd = (cfg.encoder.n_layer * fft_block_flops(
               batch, src_len, cfg.d_model, cfg.conv_n_filter, 9)
           + cfg.decoder.n_layer * fft_block_flops(
               batch, tgt_len, cfg.d_model, cfg.conv_n_filter, 9)
           + 2 * batch * tgt_len * cfg.d_model * cfg.hubert_codes)
    train_flops = 3 * fwd  # fwd + ~2x bwd
    return {
        "metric": "tte_train_micro_steps_per_second_per_chip",
        "value": round(steps_per_s, 3),
        "unit": "steps/s/chip",
        "vs_baseline": round(steps_per_s, 3),
        "detail": {"batch": batch, "grad_acc": GRAD_ACC,
                   "src_len": src_len, "tgt_len": tgt_len,
                   "optimizer_steps_per_s": round(steps_per_s / GRAD_ACC, 3),
                   "achieved_tflops": round(
                       train_flops * steps_per_s / 1e12, 2)},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", type=int, default=SRC_LEN)
    ap.add_argument("--tgt", type=int, default=TGT_LEN)
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--no-remat", action="store_true",
                    help="A/B: disable FFT-block rematerialization")
    ap.add_argument("--force-xla-attn", action="store_true",
                    help="A/B: force the XLA attention path (no Pallas)")
    args = ap.parse_args()
    print(json.dumps(run(args.src, args.tgt, args.batch,
                         no_remat=args.no_remat,
                         force_xla_attn=args.force_xla_attn)))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    try:
        main()
    except Exception as e:
        print(json.dumps({
            "metric": "tte_train_micro_steps_per_second_per_chip",
            "value": 0.0, "unit": "steps/s/chip", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:200],
        }))
        sys.exit(0)
