"""Parrot TTE model: character tokens -> HuBERT-unit logits.

Reference: `/root/reference/modules/parrot.py`. Encoder FFT stack ->
(+speaker embedding) -> duration predict / length regulate -> decoder FFT
stack -> 1000-way linear head. Functional: explicit param pytree, pure
apply functions, static bucket shapes under jit.

Mask conventions (reference modules/data.py:8-23, parrot.py:97): `src_mask`
and `tgt_mask` here are True=VALID (as produced by the data layer); they are
inverted into torch-style True=IGNORE key-padding masks internally.
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import jax.numpy as jnp

from parrot_tts_tpu.core.config import TTEModelConfig
from parrot_tts_tpu.models.tte import fft
from parrot_tts_tpu.ops import attention as attn_ops
from parrot_tts_tpu.ops import conv as conv_ops
from parrot_tts_tpu.ops import init as init_ops
from parrot_tts_tpu.ops import length_regulator as lr_ops


# ---------------------------------------------------------------------------
# Duration predictor (reference modules/duration.py:26-48)
# ---------------------------------------------------------------------------


def init_duration_predictor(key, d_model: int, n_filter: int,
                            kernel_size: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": {
            "w": init_ops.kaiming_uniform(
                k1, (kernel_size, d_model, n_filter), d_model * kernel_size),
            "b": init_ops.uniform_fan_in(
                jax.random.fold_in(k1, 1), (n_filter,), d_model * kernel_size),
        },
        "ln1": {"scale": jnp.ones((n_filter,)), "bias": jnp.zeros((n_filter,))},
        "conv2": {
            "w": init_ops.kaiming_uniform(
                k2, (kernel_size, n_filter, n_filter), n_filter * kernel_size),
            "b": init_ops.uniform_fan_in(
                jax.random.fold_in(k2, 1), (n_filter,), n_filter * kernel_size),
        },
        "ln2": {"scale": jnp.ones((n_filter,)), "bias": jnp.zeros((n_filter,))},
        "proj": {
            "w": init_ops.kaiming_uniform(k3, (n_filter, 1), n_filter),
            "b": init_ops.uniform_fan_in(
                jax.random.fold_in(k3, 1), (1,), n_filter),
        },
    }


def apply_duration_predictor(
    params: dict,
    x: jnp.ndarray,
    pad_mask: jnp.ndarray,
    cfg: TTEModelConfig,
    *,
    dropout_rng: jax.Array | None = None,
    deterministic: bool = True,
    precision=None,
) -> jnp.ndarray:
    """Log-duration prediction. pad_mask: True = PAD (reference passes
    `~src_mask`, parrot.py:78); padded outputs are masked_fill'd to 0.

    Reference quirk (duration.py:34): the second conv hardcodes padding=1
    regardless of kernel_size — reproduced under cfg.reference_compat.
    """
    ks = cfg.dur_kernel_size
    valid = (~pad_mask)[:, :, None].astype(x.dtype)

    h = conv_ops.conv1d(x * valid, params["conv1"]["w"], params["conv1"]["b"],
                        padding=(ks - 1) // 2, precision=precision)
    h = jax.nn.relu(h)
    h = fft.layer_norm(h, params["ln1"]["scale"], params["ln1"]["bias"])
    if not deterministic and cfg.dur_dropout_p > 0:
        r1 = jax.random.fold_in(dropout_rng, 1)
        keep = jax.random.bernoulli(r1, 1 - cfg.dur_dropout_p, h.shape)
        h = jnp.where(keep, h / (1 - cfg.dur_dropout_p), 0.0)

    pad2 = 1 if cfg.reference_compat else (ks - 1) // 2
    h = conv_ops.conv1d(h * valid, params["conv2"]["w"], params["conv2"]["b"],
                        padding=pad2, precision=precision)
    h = jax.nn.relu(h)
    h = fft.layer_norm(h, params["ln2"]["scale"], params["ln2"]["bias"])
    if not deterministic and cfg.dur_dropout_p > 0:
        r2 = jax.random.fold_in(dropout_rng, 2)
        keep = jax.random.bernoulli(r2, 1 - cfg.dur_dropout_p, h.shape)
        h = jnp.where(keep, h / (1 - cfg.dur_dropout_p), 0.0)

    out = jnp.einsum("btf,fo->bto", h, params["proj"]["w"],
                     precision=precision)[..., 0] + params["proj"]["b"]
    return jnp.where(pad_mask, 0.0, out)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def init_parrot(key, cfg: TTEModelConfig) -> dict:
    keys = jax.random.split(key, 6 + cfg.encoder.n_layer + cfg.decoder.n_layer)
    params: dict[str, Any] = {
        "tok_emb": init_ops.embedding(
            keys[0], (cfg.vocab_size, cfg.d_model), padding_idx=cfg.pad_idx),
        "duration_predictor": init_duration_predictor(
            keys[1], cfg.d_model, cfg.dur_n_filter, cfg.dur_kernel_size),
        "head": {
            "w": init_ops.kaiming_uniform(
                keys[2], (cfg.d_model, cfg.hubert_codes), cfg.d_model),
            "b": init_ops.uniform_fan_in(
                jax.random.fold_in(keys[2], 1), (cfg.hubert_codes,), cfg.d_model),
        },
        "encoder_layers": [
            fft.init_fft_block(keys[6 + i], cfg.d_model, cfg.conv_n_filter,
                               cfg.conv_kernel_sizes)
            for i in range(cfg.encoder.n_layer)
        ],
        "decoder_layers": [
            fft.init_fft_block(keys[6 + cfg.encoder.n_layer + i], cfg.d_model,
                               cfg.conv_n_filter, cfg.conv_kernel_sizes)
            for i in range(cfg.decoder.n_layer)
        ],
    }
    # speaker embedding only when multi-speaker (reference parrot.py:24-32)
    if cfg.n_speaker > 1:
        params["speaker_emb"] = init_ops.embedding(
            keys[3], (cfg.n_speaker, cfg.d_model))
    return params


def pos_table(cfg: TTEModelConfig) -> jnp.ndarray:
    """PE table padded to a multiple of 128 rows so flash-attention-aligned
    buckets (e.g. 3584 > max_len 3500) still index valid rows; rows beyond
    max_len only ever position padded frames."""
    rows = -(-cfg.max_len // 128) * 128
    return jnp.asarray(fft.sinusoidal_pos_table(rows, cfg.d_model))


def _run_stack(layers, x, cfg: TTEModelConfig, stack_cfg, pad_mask,
               dropout_rng, deterministic, precision):
    def block(lp, x, pad_mask, rng_i):
        return fft.apply_fft_block(
            lp, x, kernel_sizes=cfg.conv_kernel_sizes,
            n_head=stack_cfg.n_head, key_padding_mask=pad_mask,
            dropout_p=stack_cfg.dropout_p, dropout_rng=rng_i,
            deterministic=deterministic, precision=precision)

    d_head = cfg.d_model // stack_cfg.n_head
    if (cfg.remat and not deterministic
            and x.shape[1] >= cfg.remat_min_len
            and not attn_ops.flash_available(x.shape[1], d_head)):
        # rematerialize per block: the XLA attention path otherwise saves
        # (B, H, T, T) weights for backward — at T=3584 that dominates HBM.
        # When the Pallas flash path engages, those saves never exist and
        # recompute only costs time (measured: no-remat flash 24.5 vs
        # rematerialized XLA 7.7 micro-steps/s at T=3584, PERF.md)
        block = jax.checkpoint(block)
    for i, lp in enumerate(layers):
        rng_i = (jax.random.fold_in(dropout_rng, i)
                 if dropout_rng is not None else None)
        x = block(lp, x, pad_mask, rng_i)
    return x


def apply_parrot(
    params: dict,
    batch: dict,
    cfg: TTEModelConfig,
    *,
    out_len: int,
    inference: bool = False,
    dropout_rng: jax.Array | None = None,
    deterministic: bool = True,
    precision=None,
    selective_exact: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Forward pass (reference parrot.py:90-110).

    batch: phones (B,S) int32, src_mask (B,S) bool True=valid,
      speaker (B,) int32, and (training) duration (B,S) int32 +
      tgt_mask (B,T) True=valid.
    out_len: static decoder length (bucket >= max total duration).

    selective_exact: run ONLY the decision-sensitive sections with
    full-f32 matmuls — the encoder + duration predictor (their output
    passes through `round(exp(p)-1)`, where a bf16-pass near-tie flips a
    LENGTH and derails the whole decode) and the 1000-way head (argmax
    near-ties) — while the decoder FFT stack, the dominant cost at
    T up to 3584, runs cheaper. Values: False; True (decoder at default
    1-pass-bf16 precision — measured on-chip: lengths exact, 99.95% code
    agreement, NOT unit-exact); "high" (decoder at 3-pass bf16).
    Exactness gated on hardware by scripts/tpu_parity_check.py.

    Returns (logits (B,out_len,n_codes), tgt_mask True=valid, log_dur_pred).
    """
    enc_ctx = (jax.default_matmul_precision("highest") if selective_exact
               else contextlib.nullcontext())
    if selective_exact == "high":
        # decoder at 3-pass bf16; the flash kernel cannot lower HIGH, so
        # attention explicitly upgrades to highest (exactness-critical op)
        @contextlib.contextmanager
        def _dec_high():
            with jax.default_matmul_precision("high"), \
                    attn_ops.flash_precision("highest"):
                yield

        dec_ctx = _dec_high()
    else:
        dec_ctx = contextlib.nullcontext()
    pe = pos_table(cfg)
    src_mask = batch["src_mask"]
    src_pad = ~src_mask
    src_lengths = jnp.sum(src_mask.astype(jnp.int32), axis=1)

    x = jnp.take(params["tok_emb"], batch["phones"], axis=0)
    x = fft.add_pos_emb(x, pe, src_lengths,
                        reference_compat=cfg.reference_compat)
    # keep pads batch-invariant (they'd otherwise carry the PE row)
    x = x * src_mask[:, :, None].astype(x.dtype)

    with enc_ctx:
        enc_rng = (jax.random.fold_in(dropout_rng, 100)
                   if dropout_rng is not None else None)
        x = _run_stack(params["encoder_layers"], x, cfg, cfg.encoder,
                       src_pad, enc_rng, deterministic, precision)

        if "speaker_emb" in params:
            spk = jnp.take(params["speaker_emb"], batch["speaker"], axis=0)
            x = x + spk[:, None, :]
            x = x * src_mask[:, :, None].astype(x.dtype)

        dp_rng = (jax.random.fold_in(dropout_rng, 200)
                  if dropout_rng is not None else None)
        log_dur_pred = apply_duration_predictor(
            params["duration_predictor"], x, src_pad, cfg,
            dropout_rng=dp_rng, deterministic=deterministic,
            precision=precision)

    if inference:
        durations = lr_ops.durations_from_log_pred(log_dur_pred)
        durations = jnp.where(src_mask, durations, 0)
        # Exclusive mask: the reference's inclusive `ids <= len` quirk
        # (modules/data.py:18) only shows up in BATCHED inference, which the
        # reference never runs — its canonical decode is batch-1
        # (inference.py:31-37) where the mask covers exactly sum(dur) frames.
        x, tgt_mask = lr_ops.length_regulator(x, durations, out_len)
        # reference batch-1 decode length is the true total (sum of durations)
        tgt_lengths = jnp.sum(durations, axis=1)
    else:
        durations = batch["duration"]
        x, _ = lr_ops.length_regulator(x, durations, out_len)
        tgt_mask = batch["tgt_mask"]
        tgt_lengths = jnp.sum(tgt_mask.astype(jnp.int32), axis=1)

    x = fft.add_pos_emb(x, pe, jnp.clip(tgt_lengths, 0, cfg.max_len - 1),
                        reference_compat=cfg.reference_compat)
    valid_t = (jnp.arange(out_len)[None, :]
               < jnp.sum(durations, axis=1)[:, None]) if inference else tgt_mask
    x = x * valid_t[:, :, None].astype(x.dtype)

    dec_rng = (jax.random.fold_in(dropout_rng, 300)
               if dropout_rng is not None else None)
    with dec_ctx:
        x = _run_stack(params["decoder_layers"], x, cfg, cfg.decoder,
                       ~valid_t, dec_rng, deterministic, precision)

    with enc_ctx:  # head argmax near-ties need f32 under selective_exact
        logits = jnp.einsum("btd,dc->btc", x, params["head"]["w"],
                            precision=precision) + params["head"]["b"]
    return logits, tgt_mask, log_dur_pred


def _code_margin(logits: jnp.ndarray, tgt_mask: jnp.ndarray) -> jnp.ndarray:
    """(B,) min over valid frames of (top1 - top2) logit gap — how close
    the greedy decode came to an argmax tie. A frame whose gap exceeds
    twice the fast path's worst logit perturbation cannot flip under that
    path; the hybrid decode re-runs only samples below the threshold
    (PERF.md r5; threshold measured on hardware)."""
    top2 = jax.lax.top_k(logits, 2)[0]                   # (B, T, 2)
    gap = (top2[..., 0] - top2[..., 1]).astype(jnp.float32)
    gap = jnp.where(tgt_mask, gap, jnp.inf)
    return jnp.min(gap, axis=1)


def infer_codes(
    params: dict,
    batch: dict,
    cfg: TTEModelConfig,
    *,
    out_len: int,
    precision=None,
    exact: bool = True,
    with_margin: bool = False,
):
    """Greedy decode (reference parrot.py:112-120): argmax over codes,
    validity mask for host-side unpadding. Returns (codes (B,out_len),
    mask True=valid, total (B,) = sum of predicted durations), plus a
    (B,) min top-2 logit margin when with_margin=True (hybrid decode).

    `total` lets callers detect bucket overflow: the reference's dynamic
    shapes never truncate (modules/duration.py:6-24), so when
    total > out_len the caller must re-decode that sample in a larger
    bucket (infer/tte_infer.py, infer/serving.py do).

    exact=True (default, the serving mode) runs the forward with full-f32
    matmuls: the TPU's default bf16-pass matmuls perturb logits enough to
    flip argmax on near-ties, breaking unit-exact decode vs the reference —
    measured on hardware by scripts/tpu_parity_check.py round 3 (the same
    effect round 2 found for HuBERT k-means argmin). exact="selective"
    keeps f32 only on the decision-sensitive sections (encoder + duration
    predictor + head; see apply_parrot) and runs the dominant decoder
    stack at default precision — gated unit-exact on hardware by
    scripts/tpu_parity_check.py. exact=False is the all-default fast path
    for throughput-only use (measured NOT unit-exact)."""
    if exact in ("selective", "selective-high"):
        logits, tgt_mask, log_dur = apply_parrot(
            params, batch, cfg, out_len=out_len, inference=True,
            deterministic=True, precision=precision,
            selective_exact="high" if exact == "selective-high" else True)
        with jax.default_matmul_precision("highest"):
            durations = jnp.where(batch["src_mask"],
                                  lr_ops.durations_from_log_pred(log_dur), 0)
        out = (jnp.argmax(logits, axis=-1), tgt_mask,
               jnp.sum(durations, axis=1))
        return out + (_code_margin(logits, tgt_mask),) if with_margin else out
    ctx = (jax.default_matmul_precision("highest") if exact
           else contextlib.nullcontext())
    with ctx:
        logits, tgt_mask, log_dur = apply_parrot(
            params, batch, cfg, out_len=out_len, inference=True,
            deterministic=True, precision=precision)
        durations = jnp.where(batch["src_mask"],
                              lr_ops.durations_from_log_pred(log_dur), 0)
    out = (jnp.argmax(logits, axis=-1), tgt_mask,
           jnp.sum(durations, axis=1))
    return out + (_code_margin(logits, tgt_mask),) if with_margin else out
