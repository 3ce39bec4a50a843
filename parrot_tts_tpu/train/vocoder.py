"""Vocoder GAN training engine: D-step + G-step in ONE compiled pjit step.

Replaces the reference's hand-rolled NCCL DDP loop
(`/root/reference/utils/vocoder/train.py:33-241`): AdamW (b1=0.8, b2=0.99,
torch-default weight_decay 0.01), per-epoch ExponentialLR, LSGAN
discriminator step on stop_gradient(y_hat), then generator step with
adversarial + feature-matching + mel-L1 x45 losses. The generator forward
runs once; spectral-norm power-iteration state (MSD scale 0) threads through
the step explicitly.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from parrot_tts_tpu.core.config import (
    MelConfig,
    VocoderModelConfig,
    VocoderTrainConfig,
)
from parrot_tts_tpu.models.vocoder import discriminator as disc
from parrot_tts_tpu.models.vocoder import generator as gen
from parrot_tts_tpu.models.vocoder import losses
from parrot_tts_tpu.ops import stft
from parrot_tts_tpu.train.schedules import exponential_epoch_schedule


class VocoderTrainState(NamedTuple):
    gen_params: Any
    mpd_params: Any
    msd_params: Any
    opt_g_state: Any
    opt_d_state: Any
    step: jnp.ndarray


def make_optimizers(cfg: VocoderTrainConfig, steps_per_epoch: int):
    sched = exponential_epoch_schedule(cfg.learning_rate, cfg.lr_decay,
                                       steps_per_epoch)
    mk = lambda: optax.adamw(sched, b1=cfg.adam_b1, b2=cfg.adam_b2,
                             eps=1e-8, weight_decay=0.01)
    return mk(), mk()


def init_state(key, model_cfg: VocoderModelConfig,
               train_cfg: VocoderTrainConfig,
               steps_per_epoch: int) -> VocoderTrainState:
    _check_trainable(model_cfg)
    kg, kp, ks = jax.random.split(key, 3)
    gen_params = gen.init_code_generator(kg, model_cfg)
    mpd_params = disc.init_mpd(kp)
    msd_params = disc.init_msd(ks)
    opt_g, opt_d = make_optimizers(train_cfg, steps_per_epoch)
    return VocoderTrainState(
        gen_params=gen_params,
        mpd_params=mpd_params,
        msd_params=msd_params,
        opt_g_state=opt_g.init(gen_params),
        opt_d_state=opt_d.init((mpd_params, msd_params)),
        step=jnp.zeros((), jnp.int32),
    )


def _mel(y: jnp.ndarray, mel_cfg: MelConfig) -> jnp.ndarray:
    """Loss mel on (B, T) waveforms; fmax_for_loss is null in the reference
    config (config.json:36), i.e. full-band mel."""
    return stft.mel_spectrogram(
        y, n_fft=mel_cfg.n_fft, num_mels=mel_cfg.num_mels,
        sampling_rate=mel_cfg.sampling_rate, hop_size=mel_cfg.hop_size,
        win_size=mel_cfg.win_size, fmin=mel_cfg.fmin, fmax=None)


def _check_trainable(model_cfg: VocoderModelConfig) -> None:
    """The int8 path is serving-only: jnp.round has a zero VJP, so a
    quantized generator would silently train with zero gradients through
    every quantized conv. Fail fast instead."""
    if model_cfg.quant != "none":
        raise ValueError(
            f"VocoderModelConfig.quant={model_cfg.quant!r} is a SERVING "
            "config (ops/quant.py defines no custom VJP — generator "
            "gradients through quantized convs are zero). Train with "
            "quant='none' and enable quant at synthesis time "
            "(synthesize --quant / bench.py).")


@partial(jax.jit,
         static_argnames=("model_cfg", "train_cfg", "mel_cfg",
                          "steps_per_epoch"),
         donate_argnums=(0,))
def train_step(state: VocoderTrainState, batch: dict,
               model_cfg: VocoderModelConfig, train_cfg: VocoderTrainConfig,
               mel_cfg: MelConfig, steps_per_epoch: int):
    """batch: code (B, Tc) int32, spkr (B,) int32, audio (B, Ts) float32,
    mel (B, F, M) float32 ground-truth loss mel (precomputed or on-device).
    Returns (new_state, metrics)."""
    _check_trainable(model_cfg)
    opt_g, opt_d = make_optimizers(train_cfg, steps_per_epoch)

    ddt = jnp.dtype(train_cfg.disc_dtype)
    ddt = None if ddt == jnp.float32 else ddt
    y = batch["audio"][:, :, None]                          # (B, T, 1)
    # ONE generator forward for the whole step (the reference reuses its
    # single forward for both D and G losses via retain_graph,
    # train.py:131-168). jax.vjp gives us the same structure: the D step
    # consumes y_g_hat as a constant, the G step backprops the loss-side
    # cotangent through the saved generator linearization — no second
    # generator forward (measured ~19% of the step, PERF.md 3d).
    # optional conditioning tracks (e.g. f0 from VocoderLoader(with_f0=True))
    # ride the generic upsample-concat path; presence is static per-compile
    extra = {k: batch[k] for k in ("f0",) if k in batch} or None
    y_g_hat, gen_vjp = jax.vjp(
        lambda p: gen.apply_code_generator(
            p, batch["code"], batch.get("spkr"), model_cfg,
            extra_feats=extra),
        state.gen_params)
    y_hat_sg = jax.lax.stop_gradient(y_g_hat)

    # ---------------- discriminator step (reference train.py:138-151)
    def d_loss_fn(d_params):
        mpd_p, msd_p = d_params
        # MPD stays NHWC: the folded variant measured 9.71 vs 9.89
        # steps/s end-to-end (bench_gan r4) — kept as tested
        # infrastructure, not enabled
        f_rs, f_gs, _, _ = disc.apply_mpd(mpd_p, y, y_hat_sg, dtype=ddt,
                                          stacked=True)
        loss_f, _, _ = losses.discriminator_loss(f_rs, f_gs)
        s_rs, s_gs, _, _, new_msd = disc.apply_msd(
            msd_p, y, y_hat_sg, update_sn=True, dtype=ddt, stacked=True,
            folded=True)
        loss_s, _, _ = losses.discriminator_loss(s_rs, s_gs)
        return loss_f + loss_s, new_msd

    (loss_disc_all, msd_after_d), d_grads = jax.value_and_grad(
        d_loss_fn, has_aux=True)((state.mpd_params, state.msd_params))
    d_updates, new_opt_d = opt_d.update(
        d_grads, state.opt_d_state, (state.mpd_params, state.msd_params))
    new_mpd, new_msd = optax.apply_updates(
        (state.mpd_params, msd_after_d), d_updates)

    # ---------------- generator step (reference train.py:153-168)
    # GT loss mel computed on device (the reference does this per-item on the
    # CPU dataloader with num_workers=0 — a known bottleneck, SURVEY.md §3.3)
    mel_real = batch["mel"] if "mel" in batch else _mel(batch["audio"], mel_cfg)

    def g_loss_fn(y_hat):
        mel_hat = _mel(y_hat[:, :, 0], mel_cfg)
        loss_mel = losses.mel_l1_loss(mel_real, mel_hat)

        f_rs, f_gs, fmap_f_r, fmap_f_g = disc.apply_mpd(
            new_mpd, y, y_hat, dtype=ddt, stacked=True)
        s_rs, s_gs, fmap_s_r, fmap_s_g, msd_after_g = disc.apply_msd(
            new_msd, y, y_hat, update_sn=True, dtype=ddt, stacked=True,
            folded=True)
        loss_fm_f = losses.feature_loss(
            [list(map(jax.lax.stop_gradient, f)) for f in fmap_f_r], fmap_f_g)
        loss_fm_s = losses.feature_loss(
            [list(map(jax.lax.stop_gradient, f)) for f in fmap_s_r], fmap_s_g)
        loss_gen_f, _ = losses.generator_loss(f_gs)
        loss_gen_s, _ = losses.generator_loss(s_gs)
        total = loss_gen_s + loss_gen_f + loss_fm_s + loss_fm_f + loss_mel
        return total, (loss_mel, msd_after_g)

    # loss-side cotangent wrt y_hat, then through the generator via the
    # saved vjp — chain-rule-identical to grad of the composition
    # (equality test: tests/test_train_steps.py::test_gan_single_forward)
    (loss_gen_all, (loss_mel, msd_final)), dy = jax.value_and_grad(
        g_loss_fn, has_aux=True)(y_g_hat)
    (g_grads,) = gen_vjp(dy)
    g_updates, new_opt_g = opt_g.update(
        g_grads, state.opt_g_state, state.gen_params)
    new_gen = optax.apply_updates(state.gen_params, g_updates)

    # carry the post-G-step spectral norm u/v into the updated msd params
    new_msd = _merge_sn_state(new_msd, msd_final)

    new_state = VocoderTrainState(
        gen_params=new_gen, mpd_params=new_mpd, msd_params=new_msd,
        opt_g_state=new_opt_g, opt_d_state=new_opt_d, step=state.step + 1)
    metrics = {
        "loss_disc_all": loss_disc_all,
        "loss_gen_all": loss_gen_all,
        "mel_error": loss_mel / 45.0,
    }
    return new_state, metrics


def _merge_sn_state(params: Any, source: Any) -> Any:
    """Copy spectral-norm buffers (u, sn_v) from `source` into `params`."""

    def merge(p, s):
        if isinstance(p, dict):
            out = {k: merge(p[k], s[k]) for k in p}
            if "u" in p:
                out["u"] = s["u"]
                out["sn_v"] = s["sn_v"]
            return out
        if isinstance(p, list):
            return [merge(a, b) for a, b in zip(p, s)]
        return p

    return merge(params, source)


@partial(jax.jit, static_argnames=("model_cfg", "mel_cfg"))
def val_step(gen_params, batch: dict, model_cfg: VocoderModelConfig,
             mel_cfg: MelConfig):
    """Validation mel-L1 (reference train.py:199-228)."""
    y_hat = gen.apply_code_generator(
        gen_params, batch["code"], batch.get("spkr"), model_cfg,
        extra_feats={k: batch[k] for k in ("f0",) if k in batch} or None)
    mel_hat = _mel(y_hat[:, :, 0], mel_cfg)
    return jnp.mean(jnp.abs(batch["mel"] - mel_hat))
