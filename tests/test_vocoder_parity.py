"""Vocoder parity vs the reference PyTorch implementation (imported read-only
as oracle). Covers the CodeGenerator waveform path (mel-allclose north star),
MPD/MSD discriminators and all GAN losses."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from parrot_tts_tpu.core.config import VocoderModelConfig
from parrot_tts_tpu.models.vocoder import convert as vconvert
from parrot_tts_tpu.models.vocoder import discriminator as disc
from parrot_tts_tpu.models.vocoder import generator as gen
from parrot_tts_tpu.models.vocoder import losses

from tests import reference_oracle

pytestmark = pytest.mark.skipif(
    not reference_oracle.available(), reason="reference mount not present")

reference_oracle.add_reference_paths()


def tiny_cfg():
    # small channel counts, same topology shape (2 upsample stages, x20)
    return VocoderModelConfig(
        resblock="1",
        upsample_rates=(5, 4),
        upsample_kernel_sizes=(11, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        num_embeddings=30,
        embedding_dim=8,
        model_in_dim=16,
        multispkr="_",
        num_speakers=4,
    )


def build_reference_codegen(cfg: VocoderModelConfig, seed=0):
    from models import CodeGenerator
    from utils import AttrDict

    h = AttrDict({
        "resblock": cfg.resblock,
        "upsample_rates": list(cfg.upsample_rates),
        "upsample_kernel_sizes": list(cfg.upsample_kernel_sizes),
        "upsample_initial_channel": cfg.upsample_initial_channel,
        "resblock_kernel_sizes": list(cfg.resblock_kernel_sizes),
        "resblock_dilation_sizes": [list(d) for d in cfg.resblock_dilation_sizes],
        "num_embeddings": cfg.num_embeddings,
        "embedding_dim": cfg.embedding_dim,
        "model_in_dim": cfg.model_in_dim,
        "multispkr": cfg.multispkr,
    })
    torch.manual_seed(seed)
    m = CodeGenerator(h)
    m.eval()
    return m


def test_code_generator_waveform_matches_reference(rng):
    cfg = tiny_cfg()
    ref = build_reference_codegen(cfg)
    params = vconvert.generator_params_from_torch(ref.state_dict(), cfg)

    code = rng.integers(0, cfg.num_embeddings, size=(2, 17))
    spkr = rng.integers(0, cfg.num_speakers, size=(2, 1))

    with torch.no_grad():
        want = ref(code=torch.from_numpy(code).long(),
                   spkr=torch.from_numpy(spkr).long()).numpy()  # (B,1,T)

    got = gen.apply_code_generator(
        params, jnp.asarray(code), jnp.asarray(spkr), cfg)      # (B,T,1)
    got = np.transpose(np.asarray(got), (0, 2, 1))

    assert got.shape == want.shape == (2, 1, 17 * 20)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_folded_params_same_output(rng):
    cfg = tiny_cfg()
    ref = build_reference_codegen(cfg)
    params = vconvert.generator_params_from_torch(ref.state_dict(), cfg)
    code = rng.integers(0, cfg.num_embeddings, size=(1, 9))
    spkr = rng.integers(0, cfg.num_speakers, size=(1, 1))

    a = gen.apply_code_generator(params, jnp.asarray(code), jnp.asarray(spkr), cfg)
    b = gen.apply_code_generator(gen.fold_params(params), jnp.asarray(code),
                                 jnp.asarray(spkr), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_mpd_matches_reference(rng):
    from models import MultiPeriodDiscriminator

    torch.manual_seed(3)
    ref = MultiPeriodDiscriminator().eval()
    params = vconvert.mpd_params_from_torch(ref.state_dict())

    y = rng.standard_normal((2, 1, 800)).astype(np.float32) * 0.3
    yh = rng.standard_normal((2, 1, 800)).astype(np.float32) * 0.3
    with torch.no_grad():
        w_rs, w_gs, w_fr, w_fg = ref(torch.from_numpy(y), torch.from_numpy(yh))

    g_rs, g_gs, g_fr, g_fg = disc.apply_mpd(
        params, jnp.asarray(np.transpose(y, (0, 2, 1))),
        jnp.asarray(np.transpose(yh, (0, 2, 1))))

    for ours, theirs in zip(g_rs, w_rs):
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   atol=2e-4, rtol=1e-3)
    # feature maps: ours NHWC, theirs NCHW
    for fo, ft in zip(g_fr, w_fr):
        for o, t in zip(fo, ft):
            np.testing.assert_allclose(
                np.asarray(o), t.permute(0, 2, 3, 1).numpy(),
                atol=2e-4, rtol=1e-3)

    # loss-level parity
    ld_ours, _, _ = losses.discriminator_loss(g_rs, g_gs)
    from models import discriminator_loss as ref_dloss
    ld_ref, _, _ = ref_dloss(w_rs, w_gs)
    np.testing.assert_allclose(float(ld_ours), float(ld_ref), rtol=1e-4)

    fm_ours = losses.feature_loss(
        [[jnp.transpose(t, (0, 3, 1, 2)) for t in f] for f in g_fr],
        [[jnp.transpose(t, (0, 3, 1, 2)) for t in f] for f in g_fg])
    from models import feature_loss as ref_floss
    fm_ref = ref_floss(w_fr, w_fg)
    np.testing.assert_allclose(float(fm_ours), float(fm_ref), rtol=1e-3)


def test_msd_matches_reference(rng):
    from models import MultiScaleDiscriminator

    torch.manual_seed(4)
    ref = MultiScaleDiscriminator().eval()
    params = vconvert.msd_params_from_torch(ref.state_dict())

    y = rng.standard_normal((1, 1, 600)).astype(np.float32) * 0.3
    yh = rng.standard_normal((1, 1, 600)).astype(np.float32) * 0.3
    with torch.no_grad():
        w_rs, w_gs, _, _ = ref(torch.from_numpy(y), torch.from_numpy(yh))

    g_rs, g_gs, _, _, _ = disc.apply_msd(
        params, jnp.asarray(np.transpose(y, (0, 2, 1))),
        jnp.asarray(np.transpose(yh, (0, 2, 1))), update_sn=False)

    for ours, theirs in zip(g_rs, w_rs):
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   atol=5e-4, rtol=2e-3)


def test_generator_loss_matches_reference(rng):
    from models import generator_loss as ref_gloss

    scores = [rng.standard_normal((2, 30)).astype(np.float32) for _ in range(3)]
    ours, _ = losses.generator_loss([jnp.asarray(s) for s in scores])
    ref, _ = ref_gloss([torch.from_numpy(s) for s in scores])
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_stacked_discriminators_match_sequential(rng):
    """stacked=True (one batch-2B pass per discriminator, the trainer's
    configuration) equals the sequential path exactly for the MPD and the
    MSD's weight-norm scales; the SN scale agrees within the documented
    one-power-iteration sigma difference."""
    import jax

    from parrot_tts_tpu.models.vocoder import discriminator as disc

    b, t = 2, 512
    y = jnp.asarray(rng.standard_normal((b, t, 1)) * 0.3, jnp.float32)
    y_hat = jnp.asarray(rng.standard_normal((b, t, 1)) * 0.3, jnp.float32)

    mpd_p = disc.init_mpd(jax.random.key(0))
    seq = disc.apply_mpd(mpd_p, y, y_hat)
    stk = disc.apply_mpd(mpd_p, y, y_hat, stacked=True)
    for a, c in zip(seq[0] + seq[1], stk[0] + stk[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-6)

    msd_p = disc.init_msd(jax.random.key(1))
    seq = disc.apply_msd(msd_p, y, y_hat, update_sn=True)
    stk = disc.apply_msd(msd_p, y, y_hat, update_sn=True, stacked=True)
    # weight-norm scales (1, 2) are exactly equivalent
    for i in (1, 2):
        np.testing.assert_allclose(np.asarray(seq[0][i]),
                                   np.asarray(stk[0][i]), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(seq[1][i]),
                                   np.asarray(stk[1][i]), rtol=1e-5,
                                   atol=1e-6)
    # SN scale 0: close (one-power-iteration sigma difference), and the
    # u-advance count is preserved (both paths end at the same u)
    np.testing.assert_allclose(np.asarray(seq[0][0]), np.asarray(stk[0][0]),
                               rtol=0.05, atol=0.05)
    u_seq = seq[4]["discriminators"][0]["convs"][0]["u"]
    u_stk = stk[4]["discriminators"][0]["convs"][0]["u"]
    np.testing.assert_allclose(np.asarray(u_seq), np.asarray(u_stk),
                               rtol=1e-4, atol=1e-5)


def test_mpd_folded_matches_nhwc(rng):
    """The trainer's folded MPD path (p moved into batch + time-folded
    early layers) equals the NHWC path up to the documented element
    reordering: folded fmaps are (B, p, H, C) vs NHWC (B, H, p, C)."""
    import jax

    from parrot_tts_tpu.models.vocoder import discriminator as disc

    x = jnp.asarray(rng.standard_normal((2, 1260, 1)) * 0.3, jnp.float32)
    p = disc.init_discriminator_p(jax.random.key(0))
    for period in (2, 3, 5):
        s_ref, f_ref = disc.apply_discriminator_p(p, x, period)
        s_fld, f_fld = disc.apply_discriminator_p(p, x, period, folded=True)
        assert len(f_ref) == len(f_fld)
        for a, c in zip(f_ref, f_fld):
            np.testing.assert_allclose(
                np.asarray(c), np.asarray(a).transpose(0, 2, 1, 3),
                rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.sort(np.asarray(s_fld), axis=None),
                                   np.sort(np.asarray(s_ref), axis=None),
                                   rtol=2e-4, atol=2e-5)
