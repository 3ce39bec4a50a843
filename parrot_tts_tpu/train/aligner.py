"""Aligner CTC training engine.

Reference: `/root/reference/utils/aligner/trainer.py` — Adam, CTC loss over
mel->symbol posteriors, NaN/Inf-loss step skipping, grad-clip 1.0. One jitted
step over bucket-padded batches; BatchNorm state threads through.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from parrot_tts_tpu.core.config import AlignerModelConfig, AlignerTrainConfig
from parrot_tts_tpu.models.aligner import model as amodel
from parrot_tts_tpu.ops.ctc import ctc_loss_torch_mean


class AlignerTrainState(NamedTuple):
    params: Any
    bn_state: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: AlignerTrainConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adam(cfg.learning_rate),
    )


def init_state(key, model_cfg: AlignerModelConfig,
               train_cfg: AlignerTrainConfig) -> AlignerTrainState:
    params, bn_state = amodel.init_aligner(key, model_cfg)
    opt = make_optimizer(train_cfg)
    return AlignerTrainState(params, bn_state, opt.init(params),
                             jnp.zeros((), jnp.int32))


@partial(jax.jit, static_argnames=("train_cfg",), donate_argnums=(0,))
def train_step(state: AlignerTrainState, batch: dict,
               train_cfg: AlignerTrainConfig):
    """batch: mel (B,T,M), mel_lengths (B,), tokens (B,L), token_lengths (B,).
    Skips the update on non-finite loss (reference trainer.py:67)."""

    def loss_fn(params):
        logits, new_bn = amodel.apply_aligner(
            params, state.bn_state, batch["mel"], train=True)
        loss = ctc_loss_torch_mean(
            logits, batch["mel_lengths"], batch["tokens"],
            batch["token_lengths"])
        return loss, new_bn

    (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    opt = make_optimizer(train_cfg)
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    ok = jnp.isfinite(loss)
    keep = lambda new, old: jax.tree_util.tree_map(
        lambda n, o: jnp.where(ok, n, o), new, old)
    return AlignerTrainState(
        params=keep(new_params, state.params),
        bn_state=keep(new_bn, state.bn_state),
        opt_state=keep(new_opt, state.opt_state),
        step=state.step + 1,
    ), {"ctc_loss": loss}


@jax.jit
def posteriors(params, bn_state, mel: jnp.ndarray) -> jnp.ndarray:
    """Eval-mode softmax posteriors for duration extraction
    (reference extract_durations.py:86-95)."""
    logits, _ = amodel.apply_aligner(params, bn_state, mel, train=False)
    return jax.nn.softmax(logits, axis=-1)


def alignment_debug_text(logits, tokens, token_length, tokenizer) -> dict:
    """Human-inspection artifact matching the reference's TB text logs
    (utils/aligner/trainer.py:90-116): the greedy CTC decode (collapsed
    repeats, blanks dropped) next to the target transcript."""
    import numpy as np

    ids = np.asarray(jnp.argmax(logits, axis=-1))
    collapsed = []
    prev = -1
    for i in ids:
        if i != prev and i != 0:
            collapsed.append(int(i))
        prev = i
    target = [int(t) for t in np.asarray(tokens)[:int(token_length)]]
    return {
        "decoded": tokenizer.decode(collapsed),
        "target": tokenizer.decode(target),
    }
