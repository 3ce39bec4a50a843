"""TTE data-parallel training engine: one compiled pjit step.

Replaces the reference's Lightning DDP stack (`/root/reference/train.py:
55-180`): AdamW + cosine-warmup schedule stepped per optimizer step, grad
accumulation 4, global-norm clip 1.0, periodic validation. All of it is one
jitted function over a (data, model) mesh; gradient all-reduce is emitted by
XLA from the replicated-params/sharded-batch shardings — the TPU analog of
DDP's NCCL all-reduce (SURVEY.md §2d).

Note: the reference's configure_optimizers IGNORES its own `betas` config
(train.py:98-109 passes only lr/weight_decay) — torch AdamW defaults
(0.9, 0.999) apply, and we match that.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from parrot_tts_tpu.core.config import TTEModelConfig, TTETrainConfig
from parrot_tts_tpu.models.tte import parrot
from parrot_tts_tpu.models.tte.loss import tte_loss
from parrot_tts_tpu.train.schedules import cosine_warmup_schedule


class TTETrainState(NamedTuple):
    params: Any
    opt_state: Any
    # MICRO-batch steps: +1 per train_step call. The optimizer applies every
    # grad_acc_steps calls (optax.MultiSteps); optimizer-step count is
    # step // grad_acc_steps. Dropout folds in the micro-step so every
    # micro-batch draws a distinct mask (Lightning/torch behave the same).
    step: jnp.ndarray


def make_inner_optimizer(cfg: TTETrainConfig) -> optax.GradientTransformation:
    schedule = cosine_warmup_schedule(
        cfg.init_lr, cfg.warmup_steps, cfg.total_steps)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=cfg.weight_decay),
    )


def make_optimizer(cfg: TTETrainConfig) -> optax.GradientTransformation:
    opt = make_inner_optimizer(cfg)
    if cfg.grad_acc_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.grad_acc_steps)
    return opt


def init_state(key, model_cfg: TTEModelConfig,
               train_cfg: TTETrainConfig) -> TTETrainState:
    params = parrot.init_parrot(key, model_cfg)
    opt = make_optimizer(train_cfg)
    return TTETrainState(params=params, opt_state=opt.init(params),
                         step=jnp.zeros((), jnp.int32))


def loss_fn(params, batch, model_cfg: TTEModelConfig, out_len: int,
            dropout_rng, deterministic: bool):
    logits, _, log_dur = parrot.apply_parrot(
        params, batch, model_cfg, out_len=out_len, inference=False,
        dropout_rng=dropout_rng, deterministic=deterministic)
    total, code, dur = tte_loss(
        logits, log_dur, batch["codes"], batch["duration"],
        batch["src_mask"], num_codes=model_cfg.hubert_codes,
        sample_weight=batch.get("sample_weight"))
    return total, {"total_loss": total, "code_loss": code, "dur_loss": dur}


@partial(jax.jit, static_argnames=("model_cfg", "train_cfg", "out_len"),
         donate_argnums=(0,))
def train_step(state: TTETrainState, batch: dict, rng: jax.Array,
               model_cfg: TTEModelConfig, train_cfg: TTETrainConfig,
               out_len: int):
    """One micro-batch step (optimizer applies every grad_acc_steps calls via
    optax.MultiSteps, mirroring Lightning accumulate_grad_batches)."""
    dropout_rng = jax.random.fold_in(rng, state.step)
    grads, metrics = jax.grad(loss_fn, has_aux=True)(
        state.params, batch, model_cfg, out_len, dropout_rng, False)
    opt = make_optimizer(train_cfg)
    updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TTETrainState(new_params, new_opt_state, state.step + 1), metrics


@partial(jax.jit, static_argnames=("model_cfg", "train_cfg", "out_len"),
         donate_argnums=(0,))
def train_step_k(state: TTETrainState, batches: dict, rng: jax.Array,
                 model_cfg: TTEModelConfig, train_cfg: TTETrainConfig,
                 out_len: int):
    """K micro-steps in ONE compiled call: `batches` is a batch pytree with
    a leading micro-step axis (K, B, ...), scanned inside the jit.

    Math-identical to K sequential train_step calls (same MultiSteps
    running-mean accumulation, same per-micro-step dropout folding), but
    pays ONE dispatch instead of K — the axon relay charges ~1.3 ms of
    fixed cost per call (PERF.md 4a) — and, when the call carries a full
    grad_acc_steps group at mini_step 0, runs the inner optimizer ONCE
    instead of K times: optax.MultiSteps executes the whole clip+adamw
    chain on EVERY micro-step and where-selects the result (inspect
    optax.MultiSteps.update), which the roofline measured at ~2 ms of the
    6.9 ms micro-step (scripts/exp_tte_roofline.py)."""

    opt = make_optimizer(train_cfg)
    k_here = jax.tree_util.tree_leaves(batches)[0].shape[0]

    def micro_generic(carry, batch):
        params, opt_state, step = carry
        dropout_rng = jax.random.fold_in(rng, step)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            params, batch, model_cfg, out_len, dropout_rng, False)
        updates, new_opt = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, new_opt, step + 1), metrics

    def generic(operand):
        params, opt_state, step = operand
        (p, o, s), ms = jax.lax.scan(micro_generic, (params, opt_state, step),
                                     batches)
        return p, o, s, jax.tree_util.tree_map(lambda x: x[-1], ms)

    if not (train_cfg.grad_acc_steps > 1
            and k_here == train_cfg.grad_acc_steps):
        p, o, s, last = generic((state.params, state.opt_state, state.step))
        return TTETrainState(p, o, s), last

    def fast(operand):
        params, opt_state, step0 = operand

        def micro(carry, batch):
            acc, step = carry
            dropout_rng = jax.random.fold_in(rng, step)
            grads, metrics = jax.grad(loss_fn, has_aux=True)(
                params, batch, model_cfg, out_len, dropout_rng, False)
            n = (step - step0).astype(jnp.float32)
            # MultiSteps' exact running mean: acc + (g - acc) / (n + 1)
            acc = jax.tree_util.tree_map(
                lambda a, g: a + (g - a) / (n + 1.0), acc, grads)
            return (acc, step + 1), metrics

        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        (acc, s), ms = jax.lax.scan(micro, (zeros, step0), batches)
        inner = make_inner_optimizer(train_cfg)
        updates, new_inner = inner.update(acc, opt_state.inner_opt_state,
                                          params)
        p = optax.apply_updates(params, updates)
        new_opt = optax.MultiStepsState(
            mini_step=jnp.zeros_like(opt_state.mini_step),
            gradient_step=opt_state.gradient_step + 1,
            inner_opt_state=new_inner,
            acc_grads=jax.tree_util.tree_map(jnp.zeros_like,
                                             opt_state.acc_grads),
            skip_state=opt_state.skip_state)
        return p, new_opt, s, jax.tree_util.tree_map(lambda x: x[-1], ms)

    # the fast path assumes a fresh accumulation cycle; K=1 leftover
    # groups (pipeline/train_tte.py::_stack_microbatches) can leave
    # mini_step mid-cycle, so branch on it at runtime
    p, o, s, last = jax.lax.cond(
        state.opt_state.mini_step == 0, fast, generic,
        (state.params, state.opt_state, state.step))
    return TTETrainState(p, o, s), last


@partial(jax.jit, static_argnames=("model_cfg", "out_len"))
def eval_step(params, batch: dict, model_cfg: TTEModelConfig, out_len: int):
    _, metrics = loss_fn(params, batch, model_cfg, out_len, None, True)
    return metrics
