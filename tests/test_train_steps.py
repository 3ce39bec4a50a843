"""Compiled train-step tests: TTE and vocoder GAN engines on tiny configs,
single-device and over an 8-device CPU mesh (DP sharding)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parrot_tts_tpu.core import mesh as meshlib
from parrot_tts_tpu.core.config import (
    MelConfig,
    TTEModelConfig,
    TTETrainConfig,
    TransformerStackConfig,
    VocoderModelConfig,
    VocoderTrainConfig,
)
from parrot_tts_tpu.train import tte as tte_train
from parrot_tts_tpu.train import vocoder as voc_train


def tiny_tte_cfg():
    return TTEModelConfig(
        d_model=16, conv_n_filter=32, conv_kernel_sizes=(9, 1), max_len=64,
        encoder=TransformerStackConfig(n_layer=1, n_head=2, dropout_p=0.1),
        decoder=TransformerStackConfig(n_layer=1, n_head=2, dropout_p=0.1),
        dur_n_filter=8, dur_kernel_size=3, dur_dropout_p=0.5,
        hubert_codes=20, n_speaker=2, vocab_size=10, pad_idx=0)


def tiny_tte_batch(rng, b=4, s=8, t=24, cfg=None):
    durs = rng.integers(1, 4, size=(b, s)).astype(np.int32)
    totals = durs.sum(axis=1)
    codes = np.full((b, t), cfg.hubert_codes, np.int32)
    tgt_mask = np.zeros((b, t), bool)
    for i in range(b):
        n = min(int(totals[i]), t)
        codes[i, :n] = rng.integers(0, cfg.hubert_codes, size=n)
        tgt_mask[i, :n] = True
    return {
        "phones": rng.integers(2, cfg.vocab_size, size=(b, s)).astype(np.int32),
        "duration": durs,
        "codes": codes,
        "src_mask": np.ones((b, s), bool),
        "tgt_mask": tgt_mask,
        "speaker": rng.integers(0, cfg.n_speaker, size=(b,)).astype(np.int32),
    }


def test_tte_train_step_loss_decreases(rng):
    cfg = tiny_tte_cfg()
    tcfg = TTETrainConfig(init_lr=1e-2, warmup_steps=2, total_steps=100,
                          grad_acc_steps=1, grad_clip=1.0)
    state = tte_train.init_state(jax.random.key(0), cfg, tcfg)
    batch = {k: jnp.asarray(v) for k, v in tiny_tte_batch(rng, cfg=cfg).items()}
    rng_key = jax.random.key(1)

    losses = []
    for _ in range(8):
        state, metrics = tte_train.train_step(
            state, batch, rng_key, cfg, tcfg, 24)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_tte_grad_accumulation_applies_every_k(rng):
    cfg = tiny_tte_cfg()
    tcfg = TTETrainConfig(init_lr=1e-2, warmup_steps=2, total_steps=100,
                          grad_acc_steps=2, grad_clip=1.0)
    state = tte_train.init_state(jax.random.key(0), cfg, tcfg)
    batch = {k: jnp.asarray(v) for k, v in tiny_tte_batch(rng, cfg=cfg).items()}
    p0 = np.asarray(state.params["head"]["w"]).copy()  # donated below
    state, _ = tte_train.train_step(state, batch, jax.random.key(1), cfg, tcfg, 24)
    # first micro-step accumulates, params unchanged
    np.testing.assert_array_equal(np.asarray(state.params["head"]["w"]),
                                  np.asarray(p0))
    # note: the first APPLY uses lr=0 (cosine warmup at optimizer step 0,
    # same as the reference's LambdaLR) — run through the second apply
    for _ in range(3):
        state, _ = tte_train.train_step(state, batch, jax.random.key(1),
                                        cfg, tcfg, 24)
    assert not np.allclose(np.asarray(state.params["head"]["w"]),
                           np.asarray(p0))


def test_tte_train_step_k_matches_sequential(rng):
    """One fused train_step_k call over K stacked micro-batches must equal
    K sequential train_step calls bit-for-bit (same MultiSteps
    accumulation, same per-micro-step dropout folding)."""
    cfg = tiny_tte_cfg()
    k = 3
    tcfg = TTETrainConfig(init_lr=1e-2, warmup_steps=1, total_steps=100,
                          grad_acc_steps=k, grad_clip=1.0)
    batches = [tiny_tte_batch(rng, cfg=cfg) for _ in range(2 * k)]
    rng_key = jax.random.key(1)

    seq = tte_train.init_state(jax.random.key(0), cfg, tcfg)
    for b in batches:
        seq, seq_m = tte_train.train_step(
            seq, {kk: jnp.asarray(v) for kk, v in b.items()}, rng_key,
            cfg, tcfg, 24)

    fused = tte_train.init_state(jax.random.key(0), cfg, tcfg)
    for grp in (batches[:k], batches[k:]):
        stacked = {kk: jnp.asarray(np.stack([b[kk] for b in grp]))
                   for kk in grp[0]}
        fused, fused_m = tte_train.train_step_k(
            fused, stacked, rng_key, cfg, tcfg, 24)

    assert int(seq.step) == int(fused.step) == 2 * k
    np.testing.assert_allclose(float(fused_m["total_loss"]),
                               float(seq_m["total_loss"]), rtol=1e-6)
    # not bit-exact: the scan body compiles with different fusion orders
    # than the standalone step (float reassociation ~1e-5 rel)
    for a, b in zip(jax.tree_util.tree_leaves(seq.params),
                    jax.tree_util.tree_leaves(fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def tiny_voc_cfg():
    return VocoderModelConfig(
        resblock="1", upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), num_embeddings=12,
        embedding_dim=4, model_in_dim=8, multispkr="_", num_speakers=2)


def tiny_voc_batch(rng, b=2, tc=64, hop=16):
    return {
        "audio": (rng.standard_normal((b, tc * hop)) * 0.2).astype(np.float32),
        "code": rng.integers(0, 12, size=(b, tc)).astype(np.int32),
        "spkr": rng.integers(0, 2, size=(b,)).astype(np.int32),
    }


def test_vocoder_gan_train_step(rng):
    mcfg = tiny_voc_cfg()
    tcfg = VocoderTrainConfig(learning_rate=1e-3)
    mel_cfg = MelConfig(n_fft=64, num_mels=8, hop_size=16, win_size=64,
                        sampling_rate=16000, fmax=None)
    state = voc_train.init_state(jax.random.key(0), mcfg, tcfg,
                                 steps_per_epoch=10)
    batch = {k: jnp.asarray(v) for k, v in tiny_voc_batch(rng).items()}

    g0 = np.asarray(state.gen_params["conv_pre"]["v"])
    d0 = np.asarray(
        state.mpd_params["discriminators"][0]["convs"][0]["v"])
    u0 = np.asarray(
        state.msd_params["discriminators"][0]["convs"][0]["u"])

    for _ in range(2):
        state, metrics = voc_train.train_step(
            state, batch, mcfg, tcfg, mel_cfg, 10)

    for v in metrics.values():
        assert np.isfinite(float(v)), metrics
    # all three networks actually updated
    assert not np.allclose(np.asarray(state.gen_params["conv_pre"]["v"]), g0)
    assert not np.allclose(np.asarray(
        state.mpd_params["discriminators"][0]["convs"][0]["v"]), d0)
    # spectral norm power iteration advanced
    assert not np.allclose(np.asarray(
        state.msd_params["discriminators"][0]["convs"][0]["u"]), u0)


def test_gan_single_forward_vjp_identity(rng):
    """The round-3 GAN step restructure (one generator forward shared by
    the D and G losses via jax.vjp) must produce EXACTLY the gradients of
    the direct composition grad(p -> L(G(p))) — chain-rule identity on the
    real tiny models, including SN state threading."""
    from parrot_tts_tpu.models.vocoder import discriminator as disc
    from parrot_tts_tpu.models.vocoder import generator as gen
    from parrot_tts_tpu.models.vocoder import losses

    mcfg = tiny_voc_cfg()
    mel_cfg = MelConfig(n_fft=64, num_mels=8, hop_size=16, win_size=64,
                        sampling_rate=16000, fmax=None)
    kg, kp, ks = jax.random.split(jax.random.key(0), 3)
    g_params = gen.init_code_generator(kg, mcfg)
    mpd_p = disc.init_mpd(kp)
    msd_p = disc.init_msd(ks)
    b = tiny_voc_batch(rng)
    code, spkr = jnp.asarray(b["code"]), jnp.asarray(b["spkr"])
    y = jnp.asarray(b["audio"])[:, :, None]
    mel_real = voc_train._mel(jnp.asarray(b["audio"]), mel_cfg)

    def g_loss(y_hat):
        mel_hat = voc_train._mel(y_hat[:, :, 0], mel_cfg)
        loss_mel = losses.mel_l1_loss(mel_real, mel_hat)
        f_rs, f_gs, fmap_f_r, fmap_f_g = disc.apply_mpd(mpd_p, y, y_hat)
        s_rs, s_gs, fmap_s_r, fmap_s_g, _ = disc.apply_msd(
            msd_p, y, y_hat, update_sn=True)
        loss_fm_f = losses.feature_loss(
            [list(map(jax.lax.stop_gradient, f)) for f in fmap_f_r], fmap_f_g)
        loss_fm_s = losses.feature_loss(
            [list(map(jax.lax.stop_gradient, f)) for f in fmap_s_r], fmap_s_g)
        lf, _ = losses.generator_loss(f_gs)
        ls, _ = losses.generator_loss(s_gs)
        return lf + ls + loss_fm_f + loss_fm_s + loss_mel

    direct = jax.grad(
        lambda p: g_loss(gen.apply_code_generator(p, code, spkr, mcfg)))(
            g_params)
    y_hat, gen_vjp = jax.vjp(
        lambda p: gen.apply_code_generator(p, code, spkr, mcfg), g_params)
    dy = jax.grad(g_loss)(y_hat)
    (via_vjp,) = gen_vjp(dy)

    for a, c in zip(jax.tree_util.tree_leaves(direct),
                    jax.tree_util.tree_leaves(via_vjp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-6, atol=1e-6)


def test_vocoder_gan_train_step_bf16_disc(rng):
    """disc_dtype=bfloat16 (the GAN-throughput lever): the step must run,
    stay finite, and update all three networks; loss reductions stay f32."""
    mcfg = tiny_voc_cfg()
    tcfg = VocoderTrainConfig(learning_rate=1e-3, disc_dtype="bfloat16")
    mel_cfg = MelConfig(n_fft=64, num_mels=8, hop_size=16, win_size=64,
                        sampling_rate=16000, fmax=None)
    state = voc_train.init_state(jax.random.key(0), mcfg, tcfg,
                                 steps_per_epoch=10)
    batch = {k: jnp.asarray(v) for k, v in tiny_voc_batch(rng).items()}
    g0 = np.asarray(state.gen_params["conv_pre"]["v"])
    d0 = np.asarray(state.mpd_params["discriminators"][0]["convs"][0]["v"])
    state, metrics = voc_train.train_step(state, batch, mcfg, tcfg,
                                          mel_cfg, 10)
    for v in metrics.values():
        assert np.isfinite(float(v)), metrics
    assert not np.allclose(np.asarray(state.gen_params["conv_pre"]["v"]), g0)
    assert not np.allclose(np.asarray(
        state.mpd_params["discriminators"][0]["convs"][0]["v"]), d0)
    # grads/params stayed f32 pytree-wide
    for leaf in jax.tree_util.tree_leaves(state.gen_params):
        assert leaf.dtype == jnp.float32


def test_tte_train_step_on_mesh(rng):
    """DP over the 8-device CPU mesh: replicated params, sharded batch."""
    assert jax.device_count() == 8
    mesh = meshlib.create_mesh()
    cfg = tiny_tte_cfg()
    tcfg = TTETrainConfig(init_lr=1e-3, warmup_steps=2, total_steps=100,
                          grad_acc_steps=1)
    state = tte_train.init_state(jax.random.key(0), cfg, tcfg)
    state = jax.device_put(state, meshlib.replicated(mesh))
    batch = meshlib.shard_batch(mesh, tiny_tte_batch(rng, b=8, cfg=cfg))

    state, metrics = tte_train.train_step(
        state, batch, jax.random.key(1), cfg, tcfg, 24)
    assert np.isfinite(float(metrics["total_loss"]))
    # params stay replicated after the step
    sh = state.params["head"]["w"].sharding
    assert sh.is_fully_replicated


def test_vocoder_val_step(rng):
    mcfg = tiny_voc_cfg()
    mel_cfg = MelConfig(n_fft=64, num_mels=8, hop_size=16, win_size=64,
                        fmax=None)
    state = voc_train.init_state(jax.random.key(0), mcfg,
                                 VocoderTrainConfig(), steps_per_epoch=10)
    batch = {k: jnp.asarray(v) for k, v in tiny_voc_batch(rng).items()}
    from parrot_tts_tpu.ops import stft
    batch["mel"] = stft.mel_spectrogram(
        batch["audio"], n_fft=64, num_mels=8, hop_size=16, win_size=64,
        fmax=None)
    err = voc_train.val_step(state.gen_params, batch, mcfg, mel_cfg)
    assert np.isfinite(float(err))


def test_vocoder_gan_train_step_f0_conditioned(rng):
    """f0-conditioned variant (reference's dormant gate, models.py:126 —
    functional here): an `f0` batch key rides the generic upsample-concat
    conditioning through the full GAN step; gradients reach conv_pre."""
    mcfg = dataclasses.replace(tiny_voc_cfg(), model_in_dim=9, f0=True)
    tcfg = VocoderTrainConfig(learning_rate=1e-3)
    mel_cfg = MelConfig(n_fft=64, num_mels=8, hop_size=16, win_size=64,
                        sampling_rate=16000, fmax=None)
    state = voc_train.init_state(jax.random.key(0), mcfg, tcfg,
                                 steps_per_epoch=10)
    b = tiny_voc_batch(rng)
    b["f0"] = (120.0 + 50.0 * rng.random((2, 1, 64))).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    g0 = np.asarray(state.gen_params["conv_pre"]["v"])
    state, metrics = voc_train.train_step(state, batch, mcfg, tcfg,
                                          mel_cfg, 10)
    for v in metrics.values():
        assert np.isfinite(float(v)), metrics
    assert not np.allclose(np.asarray(state.gen_params["conv_pre"]["v"]), g0)
    # val path consumes the same key
    vb = dict(batch)
    vb["mel"] = jnp.zeros((2, 64, 8))
    l = voc_train.val_step(state.gen_params, vb, mcfg, mel_cfg)
    assert np.isfinite(float(l))
