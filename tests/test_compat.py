"""Reference checkpoint-format loaders: write checkpoints in the reference's
exact torch formats, reload through compat, verify output parity."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from parrot_tts_tpu import compat
from parrot_tts_tpu.models.vocoder import generator as gen

from tests import reference_oracle
from tests.test_tte_parity import build_reference_parrot, small_cfg
from tests.test_vocoder_parity import build_reference_codegen, tiny_cfg

pytestmark = pytest.mark.skipif(
    not reference_oracle.available(), reason="reference mount not present")

reference_oracle.add_reference_paths()


def test_lightning_ckpt_loader(tmp_path, rng):
    from parrot_tts_tpu.models.tte import parrot

    cfg = small_cfg()
    model = build_reference_parrot(tmp_path, cfg)
    ckpt = {"state_dict": {f"parrot.{k}": v
                           for k, v in model.state_dict().items()},
            "hyper_parameters": {"note": "test"}}
    torch.save(ckpt, tmp_path / "epoch=0-step=11000.ckpt")

    params, hp = compat.load_tte_lightning_ckpt(
        tmp_path / "epoch=0-step=11000.ckpt", cfg)
    assert hp["note"] == "test"

    phones = rng.integers(2, cfg.vocab_size, size=(1, 9)).astype(np.int32)
    batch = {"phones": jnp.asarray(phones),
             "src_mask": jnp.ones((1, 9), bool),
             "speaker": jnp.asarray([1], np.int32)}
    codes, mask, _ = parrot.infer_codes(params, batch, cfg, out_len=64)
    assert np.asarray(mask).sum() >= 0  # decode runs


def test_vocoder_g_ckpt_loader(tmp_path, rng):
    cfg = tiny_cfg()
    ref = build_reference_codegen(cfg, seed=7)
    torch.save({"generator": ref.state_dict()}, tmp_path / "g_00750000")

    params = compat.load_vocoder_generator_ckpt(tmp_path / "g_00750000", cfg)
    code = rng.integers(0, cfg.num_embeddings, size=(1, 11))
    spkr = rng.integers(0, cfg.num_speakers, size=(1, 1))
    with torch.no_grad():
        want = ref(code=torch.from_numpy(code).long(),
                   spkr=torch.from_numpy(spkr).long()).numpy()
    got = np.transpose(np.asarray(gen.apply_code_generator(
        params, jnp.asarray(code), jnp.asarray(spkr), cfg)), (0, 2, 1))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_vocoder_do_ckpt_loader(tmp_path):
    from models import MultiPeriodDiscriminator, MultiScaleDiscriminator

    torch.manual_seed(0)
    mpd, msd = MultiPeriodDiscriminator(), MultiScaleDiscriminator()
    torch.save({"mpd": mpd.state_dict(), "msd": msd.state_dict(),
                "steps": 1234, "epoch": 5}, tmp_path / "do_00001234")
    mpd_p, msd_p, meta = compat.load_vocoder_discriminator_ckpt(
        tmp_path / "do_00001234")
    assert meta == {"steps": 1234, "epoch": 5}
    assert len(mpd_p["discriminators"]) == 5
    assert "u" in msd_p["discriminators"][0]["convs"][0]


def test_aligner_ckpt_loader(tmp_path, rng):
    from model import Aligner

    torch.manual_seed(0)
    ref = Aligner(n_mels=8, num_symbols=6, lstm_dim=10, conv_dim=12).eval()
    torch.save({"model": ref.state_dict(),
                "config": {"audio": {"n_mels": 8}},
                "symbols": ["a", "b"]}, tmp_path / "latest_model.pt")
    params, state, config, symbols = compat.load_aligner_ckpt(
        tmp_path / "latest_model.pt")
    assert symbols == ["a", "b"]

    from parrot_tts_tpu.models.aligner.model import apply_aligner

    x = rng.standard_normal((1, 12, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got, _ = apply_aligner(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)
