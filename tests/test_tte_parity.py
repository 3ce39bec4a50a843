"""TTE model parity vs the reference PyTorch implementation (imported
read-only from /root/reference as the oracle — nothing copied).

North-star requirement (BASELINE.md): unit-exact greedy decode. The
reference's canonical inference is batch-1 (inference.py:31-37); our batched
bucket-padded decode must reproduce it per sample exactly.
"""

import json

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from parrot_tts_tpu.core.config import TTEModelConfig, TransformerStackConfig
from parrot_tts_tpu.models.tte import convert, fft, parrot

from tests import reference_oracle

pytestmark = pytest.mark.skipif(
    not reference_oracle.available(), reason="reference mount not present")

reference_oracle.add_reference_paths()


D_MODEL, N_HEAD, N_FILTER = 32, 2, 64
KS = (9, 1)


def small_cfg(n_speaker=4, vocab=20, max_len=128):
    return TTEModelConfig(
        d_model=D_MODEL, conv_n_filter=N_FILTER, conv_kernel_sizes=KS,
        max_len=max_len,
        encoder=TransformerStackConfig(n_layer=2, n_head=N_HEAD, dropout_p=0.1),
        decoder=TransformerStackConfig(n_layer=2, n_head=N_HEAD, dropout_p=0.1),
        dur_n_filter=16, dur_kernel_size=3, dur_dropout_p=0.5,
        hubert_codes=50, n_speaker=n_speaker, vocab_size=vocab, pad_idx=0,
    )


def build_reference_parrot(tmp_path, cfg: TTEModelConfig, seed=0):
    from modules.parrot import Parrot

    spk = {f"s{i}": i for i in range(cfg.n_speaker)}
    (tmp_path / "speakers.json").write_text(json.dumps(spk))
    data_config = {
        "path": {"root_path": str(tmp_path)},
        "preprocess": {"hubert_codes": cfg.hubert_codes},
        "transformer": {
            "d_model": cfg.d_model,
            "conv_n_filter": cfg.conv_n_filter,
            "conv_kernel_sizes": list(cfg.conv_kernel_sizes),
            "max_len": cfg.max_len,
            "encoder": {"n_layer": cfg.encoder.n_layer,
                        "n_head": cfg.encoder.n_head,
                        "dropout_p": cfg.encoder.dropout_p},
            "decoder": {"n_layer": cfg.decoder.n_layer,
                        "n_head": cfg.decoder.n_head,
                        "dropout_p": cfg.decoder.dropout_p},
        },
        "duration_predictor": {"n_filter": cfg.dur_n_filter,
                               "kernel_size": cfg.dur_kernel_size,
                               "dropout_p": cfg.dur_dropout_p},
    }
    torch.manual_seed(seed)
    model = Parrot(data_config, cfg.vocab_size, cfg.pad_idx)
    model.eval()
    return model


def make_sample(rng, cfg, s_len, min_dur=1, max_dur=4):
    phones = rng.integers(2, cfg.vocab_size, size=(s_len,))
    durs = rng.integers(min_dur, max_dur + 1, size=(s_len,))
    speaker = int(rng.integers(0, cfg.n_speaker))
    return phones, durs, speaker


def torch_batch1(phones, durs, speaker, cfg):
    t = len(phones)
    total = int(durs.sum())
    return {
        "phones": torch.from_numpy(phones).long().unsqueeze(0),
        "duration": torch.from_numpy(durs).long().unsqueeze(0),
        "speaker": torch.tensor([speaker]).long(),
        "src_mask": torch.ones(1, t, dtype=torch.bool),
        "tgt_mask": torch.ones(1, total, dtype=torch.bool),
        "codes": torch.zeros(1, total, dtype=torch.long),
    }


def test_fft_block_matches_reference(rng):
    from modules.fft import FFTBlock

    torch.manual_seed(1)
    blk = FFTBlock(D_MODEL, N_HEAD, N_FILTER, list(KS), 0.1).eval()
    x = rng.standard_normal((2, 17, D_MODEL)).astype(np.float32)

    with torch.no_grad():
        ref = blk(torch.from_numpy(x)).numpy()

    params = convert._fft_block(
        {f"blk.{k}": v.numpy() for k, v in blk.state_dict().items()}, "blk")
    ours = parrot.fft.apply_fft_block(
        params, jnp.asarray(x), kernel_sizes=KS, n_head=N_HEAD,
        deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_pos_table_matches_reference():
    from modules.fft import SinusoidalPosEmb

    ref = SinusoidalPosEmb.positionalencoding1d(64, 100).numpy()
    ours = fft.sinusoidal_pos_table(100, 64)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_parrot_training_forward_matches_reference(tmp_path, rng):
    cfg = small_cfg()
    model = build_reference_parrot(tmp_path, cfg)
    params = convert.params_from_torch(model.state_dict(), cfg)

    phones, durs, speaker = make_sample(rng, cfg, s_len=11)
    batch_t = torch_batch1(phones, durs, speaker, cfg)
    with torch.no_grad():
        ref_logits, _, ref_tgt_mask, ref_logdur = model(batch_t)

    total = int(durs.sum())
    batch_j = {
        "phones": jnp.asarray(phones)[None],
        "duration": jnp.asarray(durs)[None],
        "speaker": jnp.asarray([speaker]),
        "src_mask": jnp.ones((1, len(phones)), bool),
        "tgt_mask": jnp.ones((1, total), bool),
    }
    logits, tgt_mask, logdur = parrot.apply_parrot(
        params, batch_j, cfg, out_len=total, deterministic=True)

    np.testing.assert_allclose(np.asarray(logdur), ref_logdur.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_parrot_infer_unit_exact_bucketed_batch(tmp_path, rng):
    """Batched bucket-padded decode == reference batch-1 decode, per sample."""
    cfg = small_cfg()
    model = build_reference_parrot(tmp_path, cfg)
    params = convert.params_from_torch(model.state_dict(), cfg)

    samples = [make_sample(rng, cfg, s_len=n) for n in (7, 12, 9)]

    # reference: one at a time (its canonical path)
    ref_codes = []
    for phones, durs, speaker in samples:
        batch_t = torch_batch1(phones, durs, speaker, cfg)
        with torch.no_grad():
            ref_codes.append(model.infer(batch_t)[0])

    # ours: a single bucketed batch
    s_bucket, t_bucket = 16, 120
    b = len(samples)
    phones_pad = np.zeros((b, s_bucket), np.int32)
    src_mask = np.zeros((b, s_bucket), bool)
    speakers = np.zeros((b,), np.int32)
    for i, (phones, durs, speaker) in enumerate(samples):
        phones_pad[i, : len(phones)] = phones
        src_mask[i, : len(phones)] = True
        speakers[i] = speaker
    batch_j = {
        "phones": jnp.asarray(phones_pad),
        "speaker": jnp.asarray(speakers),
        "src_mask": jnp.asarray(src_mask),
    }
    codes, mask, _ = parrot.infer_codes(params, batch_j, cfg, out_len=t_bucket)
    codes, mask = np.asarray(codes), np.asarray(mask)

    for i, ref in enumerate(ref_codes):
        got = codes[i][mask[i]].tolist()
        assert got == list(ref), f"sample {i}: unit mismatch"


def test_folded_params_same_decode(tmp_path, rng):
    """Serving fold (qkv@in_proj, out_proj@wo) preserves greedy decode."""
    from parrot_tts_tpu.models.tte.fold import fold_tte_params

    cfg = small_cfg()
    model = build_reference_parrot(tmp_path, cfg)
    params = convert.params_from_torch(model.state_dict(), cfg)
    folded = fold_tte_params(params)

    phones, durs, speaker = make_sample(rng, cfg, s_len=10)
    batch = {
        "phones": jnp.asarray(phones)[None],
        "src_mask": jnp.ones((1, len(phones)), bool),
        "speaker": jnp.asarray([speaker]),
    }
    c1, m1, _ = parrot.infer_codes(params, batch, cfg, out_len=64)
    c2, m2, _ = parrot.infer_codes(folded, batch, cfg, out_len=64)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(c1)[np.asarray(m1)],
                                  np.asarray(c2)[np.asarray(m2)])


def test_selective_precision_same_decode(tmp_path, rng):
    """exact='selective' (f32 only on encoder/duration/head) decodes
    identically to exact=True on CPU; the bf16-pass hardware gate lives in
    scripts/tpu_parity_check.py."""
    cfg = small_cfg()
    model = build_reference_parrot(tmp_path, cfg)
    params = convert.params_from_torch(model.state_dict(), cfg)

    phones, durs, speaker = make_sample(rng, cfg, s_len=10)
    batch = {
        "phones": jnp.asarray(phones)[None],
        "src_mask": jnp.ones((1, len(phones)), bool),
        "speaker": jnp.asarray([speaker]),
    }
    c1, m1, t1 = parrot.infer_codes(params, batch, cfg, out_len=64,
                                    exact=True)
    c2, m2, t2 = parrot.infer_codes(params, batch, cfg, out_len=64,
                                    exact="selective")
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(c1)[np.asarray(m1)],
                                  np.asarray(c2)[np.asarray(m2)])


def test_parrot_loss_matches_reference(tmp_path, rng):
    from modules.loss import ModelLoss

    cfg = small_cfg()
    model = build_reference_parrot(tmp_path, cfg)
    params = convert.params_from_torch(model.state_dict(), cfg)

    phones, durs, speaker = make_sample(rng, cfg, s_len=10)
    total = int(durs.sum())
    codes = rng.integers(0, cfg.hubert_codes, size=(1, total))

    batch_t = torch_batch1(phones, durs, speaker, cfg)
    batch_t["codes"] = torch.from_numpy(codes).long()
    loss_mod = ModelLoss({"preprocess": {"hubert_codes": cfg.hubert_codes}})
    with torch.no_grad():
        out, _, _, logdur = model(batch_t)
        ref_total, ref_code, ref_dur = loss_mod(out, logdur, batch_t)

    batch_j = {
        "phones": jnp.asarray(phones)[None],
        "duration": jnp.asarray(durs)[None],
        "speaker": jnp.asarray([speaker]),
        "src_mask": jnp.ones((1, len(phones)), bool),
        "tgt_mask": jnp.ones((1, total), bool),
    }
    logits, _, logdur_j = parrot.apply_parrot(
        params, batch_j, cfg, out_len=total, deterministic=True)
    from parrot_tts_tpu.models.tte.loss import tte_loss
    total_j, code_j, dur_j = tte_loss(
        logits, logdur_j, jnp.asarray(codes), jnp.asarray(durs)[None],
        jnp.ones((1, len(phones)), bool), num_codes=cfg.hubert_codes)

    np.testing.assert_allclose(float(code_j), float(ref_code), rtol=1e-4)
    np.testing.assert_allclose(float(dur_j), float(ref_dur), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(total_j), float(ref_total), rtol=1e-4)
