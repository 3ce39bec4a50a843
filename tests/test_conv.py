"""Conv op parity vs torch.nn.functional — the exact primitives the reference
delegates to cuDNN (SURVEY.md §2b)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from parrot_tts_tpu.ops import conv as convlib
from parrot_tts_tpu.ops import weight_norm as wnlib


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize("k,stride,pad,dil,groups", [
    (9, 1, 4, 1, 1),     # TTE FFN conv1 (modules/fft.py:65-70)
    (1, 1, 0, 1, 1),     # TTE FFN conv2
    (3, 1, 2, 3, 1),     # MRF dilated conv (models.py:17-22)
    (41, 2, 20, 1, 4),   # MSD grouped conv (models.py:232)
    (5, 1, 2, 1, 1),     # aligner conv
])
def test_conv1d_matches_torch(rng, k, stride, pad, dil, groups):
    b, t, ci, co = 2, 64, 8, 12
    x = rng.standard_normal((b, t, ci)).astype(np.float32)
    w_t = rng.standard_normal((co, ci // groups, k)).astype(np.float32) * 0.1
    bias = rng.standard_normal((co,)).astype(np.float32)

    ours = convlib.conv1d(
        jnp.asarray(x), jnp.asarray(convlib.from_torch_conv1d(w_t)),
        jnp.asarray(bias), stride=stride, padding=pad, dilation=dil,
        groups=groups)
    theirs = F.conv1d(torch.from_numpy(x).transpose(1, 2),
                      torch.from_numpy(w_t), torch.from_numpy(bias),
                      stride=stride, padding=pad, dilation=dil, groups=groups)
    np.testing.assert_allclose(_np(ours), theirs.transpose(1, 2).numpy(),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("k,u", [(11, 5), (8, 4), (4, 2), (16, 8)])
def test_conv_transpose1d_matches_torch(rng, k, u):
    # the vocoder upsample stages use padding=(k-u)//2 (models.py:85-91)
    b, t, ci, co = 2, 20, 6, 4
    pad = (k - u) // 2
    x = rng.standard_normal((b, t, ci)).astype(np.float32)
    w_t = rng.standard_normal((ci, co, k)).astype(np.float32) * 0.1
    bias = rng.standard_normal((co,)).astype(np.float32)

    ours = convlib.conv_transpose1d(
        jnp.asarray(x), jnp.asarray(convlib.from_torch_conv_transpose1d(w_t)),
        jnp.asarray(bias), stride=u, padding=pad)
    theirs = F.conv_transpose1d(torch.from_numpy(x).transpose(1, 2),
                                torch.from_numpy(w_t), torch.from_numpy(bias),
                                stride=u, padding=pad)
    assert ours.shape[1] == t * u  # exact 320x chain requirement
    np.testing.assert_allclose(_np(ours), theirs.transpose(1, 2).numpy(),
                               atol=1e-4, rtol=1e-4)


def test_conv2d_matches_torch(rng):
    # MPD topology: (5,1) kernel, (3,1) stride (models.py:177-182)
    b, h, w_, ci, co = 2, 30, 7, 1, 8
    x = rng.standard_normal((b, h, w_, ci)).astype(np.float32)
    w_t = rng.standard_normal((co, ci, 5, 1)).astype(np.float32) * 0.1
    bias = rng.standard_normal((co,)).astype(np.float32)

    ours = convlib.conv2d(jnp.asarray(x),
                          jnp.asarray(convlib.from_torch_conv2d(w_t)),
                          jnp.asarray(bias), stride=(3, 1), padding=(2, 0))
    theirs = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                      torch.from_numpy(w_t), torch.from_numpy(bias),
                      stride=(3, 1), padding=(2, 0))
    np.testing.assert_allclose(_np(ours),
                               theirs.permute(0, 2, 3, 1).numpy(),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("k,d,g,cin,cout,t", [
    (3, 1, 8, 16, 16, 64),     # MRF plain conv, C=16 tail
    (7, 3, 8, 16, 16, 64),     # dilated within 3-block window
    (11, 1, 8, 16, 16, 128),
    (3, 1, 4, 32, 32, 64),
    (7, 1, 128, 16, 1, 1280),  # conv_post: Cout=1
    (11, 5, 8, 16, 16, 640),   # window > 3 blocks -> internal fallback
])
def test_retiled_conv1d_matches_torch(rng, k, d, g, cin, cout, t):
    pad = (k * d - d) // 2
    x = rng.standard_normal((2, t, cin)).astype(np.float32)
    w_t = rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.1
    bias = rng.standard_normal((cout,)).astype(np.float32)
    want = F.conv1d(torch.from_numpy(x).transpose(1, 2),
                    torch.from_numpy(w_t), torch.from_numpy(bias),
                    padding=pad, dilation=d).transpose(1, 2).numpy()
    got = convlib.retiled_conv1d(
        jnp.asarray(x), jnp.asarray(convlib.from_torch_conv1d(w_t)),
        jnp.asarray(bias), dilation=d, padding=pad, group_size=g)
    np.testing.assert_allclose(_np(got), want, atol=1e-4, rtol=1e-4)


def test_smart_conv1d_dispatch(rng):
    x = rng.standard_normal((1, 64, 16)).astype(np.float32)
    w = rng.standard_normal((3, 16, 16)).astype(np.float32) * 0.1
    a = convlib.smart_conv1d(jnp.asarray(x), jnp.asarray(w), padding=1)
    b = convlib.conv1d(jnp.asarray(x), jnp.asarray(w), padding=1)
    np.testing.assert_allclose(_np(a), _np(b), atol=1e-5)


def test_avg_pool1d_matches_torch(rng):
    # MSD pyramid AvgPool1d(4, 2, padding=2) (models.py:258)
    x = rng.standard_normal((2, 50, 3)).astype(np.float32)
    ours = convlib.avg_pool1d(jnp.asarray(x), 4, 2, 2)
    theirs = F.avg_pool1d(torch.from_numpy(x).transpose(1, 2), 4, 2, 2)
    np.testing.assert_allclose(_np(ours), theirs.transpose(1, 2).numpy(),
                               atol=1e-5)


def test_weight_norm_matches_torch(rng):
    w_t = torch.from_numpy(rng.standard_normal((8, 4, 5)).astype(np.float32))
    conv = torch.nn.Conv1d(4, 8, 5, bias=False)
    with torch.no_grad():
        conv.weight.copy_(w_t)
    conv = torch.nn.utils.weight_norm(conv)
    # perturb g to make the test nontrivial
    with torch.no_grad():
        conv.weight_g.mul_(1.7)
    # conv.weight is refreshed by the pre-forward hook; trigger it
    conv(torch.zeros(1, 4, 10))
    w_resolved_torch = torch._weight_norm(
        conv.weight_v, conv.weight_g, 0).detach().numpy()  # (Cout, Cin, K)

    v_nat = jnp.asarray(convlib.from_torch_conv1d(conv.weight_v.detach().numpy()))
    g_nat = jnp.asarray(conv.weight_g.detach().numpy().reshape(1, 1, -1))
    ours = wnlib.wn_resolve({"g": g_nat, "v": v_nat}, wnlib.WN_AXES_CONV1D)
    np.testing.assert_allclose(_np(ours),
                               convlib.from_torch_conv1d(w_resolved_torch),
                               atol=1e-5, rtol=1e-5)


def test_weight_norm_transposed_axes(rng):
    # ConvTranspose1d weight (Cin, Cout, K): torch norms over dim0=Cin slices
    conv = torch.nn.ConvTranspose1d(6, 4, 8, stride=4, bias=False)
    conv = torch.nn.utils.weight_norm(conv)
    with torch.no_grad():
        conv.weight_g.mul_(0.3)
    w_resolved = torch._weight_norm(
        conv.weight_v, conv.weight_g, 0).detach().numpy()  # (Cin, Cout, K)

    v_nat = jnp.asarray(
        convlib.from_torch_conv_transpose1d(conv.weight_v.detach().numpy()))
    g_nat = jnp.asarray(conv.weight_g.detach().numpy().reshape(1, -1, 1))
    ours = wnlib.wn_resolve({"g": g_nat, "v": v_nat}, wnlib.WN_AXES_CONV_T1D)
    np.testing.assert_allclose(
        _np(ours), convlib.from_torch_conv_transpose1d(w_resolved),
        atol=1e-5, rtol=1e-5)


def test_wn_init_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((5, 4, 8)).astype(np.float32))
    p = wnlib.wn_init(w, wnlib.WN_AXES_CONV1D)
    np.testing.assert_allclose(_np(wnlib.wn_resolve(p, wnlib.WN_AXES_CONV1D)),
                               _np(w), atol=1e-6)


def test_spectral_norm_matches_torch(rng):
    import jax
    conv = torch.nn.Conv1d(4, 8, 15, bias=False)
    w0 = conv.weight.detach().numpy().copy()
    conv_sn = torch.nn.utils.spectral_norm(conv)
    u0 = conv_sn.weight_u.detach().numpy().copy()
    v0 = conv_sn.weight_v.detach().numpy().copy()

    p = {"w": jnp.asarray(convlib.from_torch_conv1d(w0)),
         "u": jnp.asarray(u0), "sn_v": jnp.asarray(v0)}
    ours, _ = wnlib.sn_resolve(p, n_power_iterations=1, update=True)

    x = torch.zeros(1, 4, 20)
    conv_sn.train()
    conv_sn(x)  # triggers one power iteration + weight update
    theirs = conv_sn.weight.detach().numpy()
    np.testing.assert_allclose(_np(ours), convlib.from_torch_conv1d(theirs),
                               atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Folded (space-to-depth) tail algebra — ops/folded.py
# ---------------------------------------------------------------------------

from parrot_tts_tpu.ops import folded as foldedlib  # noqa: E402


def test_fold_unfold_roundtrip(rng):
    x = rng.standard_normal((2, 24, 5)).astype(np.float32)
    xf = foldedlib.fold(jnp.asarray(x), 4)
    assert xf.shape == (2, 6, 20)
    # fold is the row-major identity: memory layout unchanged
    np.testing.assert_array_equal(_np(xf).reshape(-1), x.reshape(-1))
    np.testing.assert_array_equal(_np(foldedlib.unfold(xf, 4)), x)


@pytest.mark.parametrize("k,d,g", [
    # every MRF (kernel, dilation) of the reference V1 topology
    # (models.py resblock_kernel_sizes 3/7/11 x dilations 1/3/5) at the
    # tail fold factors g=4 (C=32) and g=8 (C=16), plus conv_post k=7
    (3, 1, 4), (3, 3, 4), (3, 5, 4),
    (7, 1, 4), (7, 3, 4), (7, 5, 4),
    (11, 1, 4), (11, 3, 4), (11, 5, 4),
    (3, 1, 8), (3, 5, 8), (7, 3, 8), (11, 5, 8),
    (7, 1, 2), (5, 2, 4),
])
def test_folded_conv1d_matches_plain(rng, k, d, g):
    b, t, ci, co = 2, 160, 16, 16
    pad = convlib.get_padding(k, d)
    x = rng.standard_normal((b, t, ci)).astype(np.float32)
    w = rng.standard_normal((k, ci, co)).astype(np.float32) * 0.1
    bias = rng.standard_normal((co,)).astype(np.float32)

    plain = convlib.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
                           padding=pad, dilation=d)
    xf = foldedlib.fold(jnp.asarray(x), g)
    yf = foldedlib.folded_conv1d(xf, jnp.asarray(w), jnp.asarray(bias),
                                 g=g, padding=pad, dilation=d)
    np.testing.assert_allclose(_np(foldedlib.unfold(yf, g)), _np(plain),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("k,u,g_in", [(4, 2, 2), (4, 2, 4), (8, 4, 2),
                                      (16, 8, 2)])
def test_folded_conv_transpose1d_matches_plain(rng, k, u, g_in):
    b, t, ci, co = 2, 48, 8, 8
    pad = (k - u) // 2
    x = rng.standard_normal((b, t, ci)).astype(np.float32)
    w = rng.standard_normal((k, ci, co)).astype(np.float32) * 0.1
    bias = rng.standard_normal((co,)).astype(np.float32)

    plain = convlib.conv_transpose1d(jnp.asarray(x), jnp.asarray(w),
                                     jnp.asarray(bias), stride=u, padding=pad)
    xf = foldedlib.fold(jnp.asarray(x), g_in)
    yf = foldedlib.folded_conv_transpose1d(xf, jnp.asarray(w),
                                           jnp.asarray(bias), g_in=g_in,
                                           stride=u, padding=pad)
    assert yf.shape == (b, t // g_in, g_in * u * co)
    np.testing.assert_allclose(_np(foldedlib.unfold(yf, g_in * u)),
                               _np(plain), atol=1e-4, rtol=1e-4)


def test_generator_folded_tail_matches_unfolded(rng):
    """Full-topology generator: fold_tail on vs off must agree to fp
    tolerance (the folded path computes the same convs on full MXU lanes)."""
    import dataclasses

    import jax

    from parrot_tts_tpu.core.config import VocoderModelConfig
    from parrot_tts_tpu.models.vocoder import generator as gen

    cfg_on = dataclasses.replace(VocoderModelConfig(), fold_tail=True)
    cfg_off = dataclasses.replace(VocoderModelConfig(), fold_tail=False)
    params = gen.init_code_generator(jax.random.key(0), cfg_on)
    code = jnp.asarray(rng.integers(0, cfg_on.num_embeddings,
                                    size=(2, 6)).astype(np.int32))
    spkr = jnp.asarray(np.array([1, 3], np.int32))

    y_on = gen.apply_code_generator(params, code, spkr, cfg_on)
    y_off = gen.apply_code_generator(params, code, spkr, cfg_off)
    assert y_on.shape == y_off.shape == (2, 6 * 320, 1)
    np.testing.assert_allclose(_np(y_on), _np(y_off), atol=2e-5, rtol=1e-4)


def test_folded_grouped_conv_matches_grouped(rng):
    """ops/folded.py::folded_grouped_conv1d == grouped conv1d at the MSD
    layer configurations, including ragged (odd) T."""
    from parrot_tts_tpu.ops import folded as folded_ops

    cases = [
        # (ci, co, k, s, g, pad, f, t)
        (1, 16, 15, 1, 1, 7, 128, 1280),
        (16, 16, 41, 2, 4, 20, 8, 1024),
        (16, 32, 41, 2, 8, 20, 16, 1001),   # ragged T
        (32, 64, 41, 4, 8, 20, 8, 560),
    ]
    for ci, co, k, s, g, pad, f, t in cases:
        x = jnp.asarray(rng.standard_normal((2, t, ci)) * 0.3, jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, ci // g, co)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
        want = np.asarray(convlib.conv1d(x, w, b, stride=s, padding=pad,
                                         groups=g))
        got = np.asarray(folded_ops.folded_grouped_conv1d(
            x, w, b, stride=s, padding=pad, groups=g, f=f))
        assert got.shape == want.shape, (got.shape, want.shape,
                                         (ci, co, k, s, g))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_msd_folded_matches_unfolded(rng):
    """The trainer's folded MSD path equals the parity (unfolded) path."""
    import jax

    from parrot_tts_tpu.models.vocoder import discriminator as disc

    y = jnp.asarray(rng.standard_normal((2, 1280, 1)) * 0.3, jnp.float32)
    y_hat = jnp.asarray(rng.standard_normal((2, 1280, 1)) * 0.3, jnp.float32)
    p = disc.init_msd(jax.random.key(0))
    a = disc.apply_msd(p, y, y_hat, update_sn=True, stacked=True)
    b = disc.apply_msd(p, y, y_hat, update_sn=True, stacked=True,
                       folded=True)
    for sa, sb in zip(a[0] + a[1], b[0] + b[1]):
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                                   rtol=2e-4, atol=2e-4)
    for fa, fb in zip(a[2] + a[3], b[2] + b[3]):
        for ta, tb_ in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(ta), np.asarray(tb_),
                                       rtol=2e-4, atol=2e-4)
