"""GAN train-step backward attribution (VERDICT r3 #2).

bench_gan's split stops at "the remaining ~57 ms is the three backwards +
both optimizer updates". This experiment times each region as its own jit
at the production shapes (batch 16, segment 8960, bf16 discriminators):

  G fwd | G bwd (vjp apply) | MPD fwd/grad | MSD fwd/grad |
  per-period MPD fwd+grad (lane-starvation suspect: C=1->32 2D convs) |
  G-side cotangent (grad wrt y_hat of the full G loss) |
  loss-mel STFT fwd/grad | optimizer updates

Run on TPU: python scripts/exp_gan_backward.py [--disc-f32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from parrot_tts_tpu.core.config import (MelConfig,  # noqa: E402
                                        VocoderModelConfig,
                                        VocoderTrainConfig)
from parrot_tts_tpu.models.vocoder import discriminator as disc  # noqa: E402
from parrot_tts_tpu.models.vocoder import generator as gen  # noqa: E402
from parrot_tts_tpu.models.vocoder import losses  # noqa: E402
from parrot_tts_tpu.train import vocoder as voc_train  # noqa: E402


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, iters=15):
    for _ in range(3):
        _sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _sync(outs[-1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--disc-f32", action="store_true")
    ap.add_argument("--sections", default="all",
                    help="comma list from {full,gen,disc,periods,cot,mel,"
                         "opt} (each compile is slow through the relay; "
                         "run in chunks)")
    args = ap.parse_args()
    sections = set(args.sections.split(","))

    def on(name):
        return "all" in sections or name in sections

    print(f"backend: {jax.default_backend()}", flush=True)
    mcfg = VocoderModelConfig()           # reference V1
    tcfg = VocoderTrainConfig(
        batch_size=args.batch,
        disc_dtype="float32" if args.disc_f32 else "bfloat16")
    mel_cfg = MelConfig()
    b, seg, hop = args.batch, tcfg.segment_size, tcfg.code_hop_size
    rng = np.random.default_rng(0)
    batch = {
        "code": jnp.asarray(rng.integers(0, mcfg.num_embeddings,
                                         size=(b, seg // hop)), jnp.int32),
        "spkr": jnp.asarray(rng.integers(0, mcfg.num_speakers, size=(b,)),
                            jnp.int32),
        "audio": jnp.asarray(rng.standard_normal((b, seg)) * 0.2,
                             jnp.float32),
    }
    state = voc_train.init_state(jax.random.key(0), mcfg, tcfg, 1000)
    ddt = None if args.disc_f32 else jnp.bfloat16
    report = {}

    def rec(name, ms):
        print(f"{name:<42} {ms:8.2f} ms", flush=True)
        report[name] = round(ms, 2)

    # 0. full step (on a COPY: train_step donates its input state and the
    # component sections below still need this one's buffers)
    if on("full"):
        st = jax.tree_util.tree_map(jnp.copy, state)
        def full(s):
            s2, _ = voc_train.train_step(s, batch, mcfg, tcfg, mel_cfg, 1000)
            return s2
        for _ in range(3):
            st = full(st)
        _sync(st.gen_params)
        t0 = time.perf_counter()
        for _ in range(10):
            st = full(st)
        _sync(st.gen_params)
        rec("full train_step", (time.perf_counter() - t0) / 10 * 1e3)
        del st

    y = batch["audio"][:, :, None]
    gp, mpd_p, msd_p = state.gen_params, state.mpd_params, state.msd_params

    # 1. generator forward / backward
    gfwd = jax.jit(lambda p: gen.apply_code_generator(
        p, batch["code"], batch["spkr"], mcfg))
    y_hat = gfwd(gp)
    if on("gen"):
        rec("G fwd", timeit(gfwd, gp))
        cot = jnp.ones_like(y_hat)
        gbwd = jax.jit(lambda p, c: jax.vjp(
            lambda q: gen.apply_code_generator(
                q, batch["code"], batch["spkr"], mcfg), p)[1](c))
        rec("G fwd+bwd (vjp construct+apply)", timeit(gbwd, gp, cot))

    if on("disc"):
        # 2. discriminator forwards
        mpd_fwd = jax.jit(lambda p: disc.apply_mpd(p, y, y_hat,
                                                   dtype=ddt)[1])
        rec("MPD fwd (5 periods, real+fake)", timeit(mpd_fwd, mpd_p))
        msd_fwd = jax.jit(lambda p: disc.apply_msd(
            p, y, y_hat, update_sn=True, dtype=ddt)[1])
        rec("MSD fwd (3 scales, real+fake)", timeit(msd_fwd, msd_p))

        # 3. discriminator grads (param-side, as in the D step)
        def mpd_loss(p):
            f_rs, f_gs, _, _ = disc.apply_mpd(p, y, y_hat, dtype=ddt)
            return losses.discriminator_loss(f_rs, f_gs)[0]
        rec("MPD grad (params)", timeit(jax.jit(jax.grad(mpd_loss)), mpd_p))

        def msd_loss(p):
            s_rs, s_gs, _, _, _ = disc.apply_msd(p, y, y_hat, update_sn=True,
                                                 dtype=ddt)
            return losses.discriminator_loss(s_rs, s_gs)[0]
        rec("MSD grad (params)", timeit(jax.jit(jax.grad(msd_loss)), msd_p))

    if on("periods"):
        # 4. per-period MPD fwd+grad (the C=1->32 lane-starvation suspect)
        for idx, period in enumerate(disc.MPD_PERIODS):
            pp = mpd_p["discriminators"][idx]

            def one_p(p):
                s_r, _ = disc.apply_discriminator_p(p, y, period, dtype=ddt)
                s_g, _ = disc.apply_discriminator_p(p, y_hat, period,
                                                    dtype=ddt)
                return (jnp.mean((1.0 - s_r) ** 2) + jnp.mean(s_g ** 2))
            rec(f"  MPD period {period} fwd+grad",
                timeit(jax.jit(jax.grad(one_p)), pp))

    if on("cot"):
        # 5. G-side cotangent: grad wrt y_hat of the full G loss
        mel_real = voc_train._mel(batch["audio"], mel_cfg)

        def g_loss(yh):
            mel_hat = voc_train._mel(yh[:, :, 0], mel_cfg)
            loss_mel = losses.mel_l1_loss(mel_real, mel_hat)
            f_rs, f_gs, fr, fg = disc.apply_mpd(mpd_p, y, yh, dtype=ddt)
            s_rs, s_gs, sr, sg, _ = disc.apply_msd(msd_p, y, yh,
                                                   update_sn=True, dtype=ddt)
            fm = (losses.feature_loss(
                [list(map(jax.lax.stop_gradient, f)) for f in fr], fg)
                + losses.feature_loss(
                [list(map(jax.lax.stop_gradient, f)) for f in sr], sg))
            adv = (losses.generator_loss(f_gs)[0]
                   + losses.generator_loss(s_gs)[0])
            return loss_mel + fm + adv
        rec("G-side cotangent (grad wrt y_hat)",
            timeit(jax.jit(jax.grad(g_loss)), y_hat))

    if on("cotsplit"):
        # 5b. split the G-side cotangent (r4: 24.6 ms) by loss component
        mel_real = voc_train._mel(batch["audio"], mel_cfg)

        def mel_only(yh):
            return losses.mel_l1_loss(mel_real,
                                      voc_train._mel(yh[:, :, 0], mel_cfg))

        # stacked+folded to match the trainer's configuration
        # (train/vocoder.py:151-154) — the unfolded MSD cotangent measured
        # 77 ms vs ~25 for the whole folded region, a wrong-config reading
        def mpd_only(yh):
            f_rs, f_gs, fr, fg = disc.apply_mpd(mpd_p, y, yh, dtype=ddt,
                                                stacked=True)
            fm = losses.feature_loss(
                [list(map(jax.lax.stop_gradient, f)) for f in fr], fg)
            return fm + losses.generator_loss(f_gs)[0]

        def msd_only(yh):
            s_rs, s_gs, sr, sg, _ = disc.apply_msd(
                msd_p, y, yh, update_sn=True, dtype=ddt, stacked=True,
                folded=True)
            fm = losses.feature_loss(
                [list(map(jax.lax.stop_gradient, f)) for f in sr], sg)
            return fm + losses.generator_loss(s_gs)[0]

        rec("cotangent: mel loss only",
            timeit(jax.jit(jax.grad(mel_only)), y_hat))
        rec("cotangent: MPD fm+adv only",
            timeit(jax.jit(jax.grad(mpd_only)), y_hat))
        rec("cotangent: MSD fm+adv only",
            timeit(jax.jit(jax.grad(msd_only)), y_hat))

    if on("msdscales"):
        # 3b. per-scale MSD param grads (r4 whole-MSD grad: 30.7 ms).
        # scale 0 runs folded grouped convs (ops/folded.py); 1-2 pooled.
        from parrot_tts_tpu.ops import conv as conv_ops

        for si in range(3):
            sp = msd_p["discriminators"][si]
            y_s, yh_s = y, y_hat
            for _ in range(si):
                y_s = conv_ops.avg_pool1d(y_s, 4, 2, 2)
                yh_s = conv_ops.avg_pool1d(yh_s, 4, 2, 2)

            def one_s(p, ys=y_s, yhs=yh_s):
                s_r, _, _ = disc.apply_discriminator_s(
                    p, ys, update_sn=True, dtype=ddt, folded=True)
                s_g, _, _ = disc.apply_discriminator_s(
                    p, yhs, update_sn=True, dtype=ddt, folded=True)
                return jnp.mean((1.0 - s_r) ** 2) + jnp.mean(s_g ** 2)

            rec(f"  MSD scale {si} fwd+grad",
                timeit(jax.jit(jax.grad(one_s)), sp))

    if on("mel"):
        # 6. loss-mel STFT fwd / grad
        rec("loss-mel fwd", timeit(jax.jit(
            lambda a: voc_train._mel(a, mel_cfg)), batch["audio"]))
        rec("loss-mel grad", timeit(jax.jit(jax.grad(
            lambda a: jnp.sum(voc_train._mel(a, mel_cfg)))),
            batch["audio"]))

    if on("opt"):
        # 7. optimizer updates alone (on real-shaped grads)
        opt_g, opt_d = voc_train.make_optimizers(tcfg, 1000)
        g_grads = jax.tree_util.tree_map(jnp.ones_like, gp)
        d_grads = jax.tree_util.tree_map(jnp.ones_like, (mpd_p, msd_p))

        # params passed as ARGS (closing over them bakes them into the
        # HLO as literals — the compile request exceeded the relay's
        # body-size limit, HTTP 413)
        @jax.jit
        def opt_both(gp_, dp_, gg, dg, og, od):
            import optax
            gu, og2 = opt_g.update(gg, og, gp_)
            du, od2 = opt_d.update(dg, od, dp_)
            return (optax.apply_updates(gp_, gu),
                    optax.apply_updates(dp_, du))
        rec("optimizer updates (G + D)",
            timeit(opt_both, gp, (mpd_p, msd_p), g_grads, d_grads,
                   state.opt_g_state, state.opt_d_state))

    print(json.dumps(report))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
