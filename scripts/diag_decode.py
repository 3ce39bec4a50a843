"""Diagnose the remaining TPU decode non-exactness (round 3).

Compares, for the failing reference-scale sample set:
  * torch CPU logits (the oracle),
  * TPU flash-path logits under exact (highest) precision,
  * TPU forced-XLA logits under exact precision,
and reports max deltas + the argmax margin at every flipped frame. Tells us
whether the flash kernel honors default_matmul_precision or the flips are
genuine near-ties.
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from parrot_tts_tpu.core.config import (TTEModelConfig,  # noqa: E402
                                        TransformerStackConfig)
from parrot_tts_tpu.models.tte import convert as tconvert  # noqa: E402
from parrot_tts_tpu.models.tte import parrot  # noqa: E402
from parrot_tts_tpu.ops import attention as attn_ops  # noqa: E402

sys.path.insert(0, str(REPO / "tests"))
import reference_oracle  # noqa: E402

reference_oracle.add_reference_paths()
from modules.parrot import Parrot  # noqa: E402


def main():
    cfg = TTEModelConfig(
        d_model=256, conv_n_filter=1024, conv_kernel_sizes=(9, 1),
        max_len=3500,
        encoder=TransformerStackConfig(n_layer=4, n_head=2, dropout_p=0.1),
        decoder=TransformerStackConfig(n_layer=4, n_head=2, dropout_p=0.1),
        dur_n_filter=256, dur_kernel_size=3, dur_dropout_p=0.5,
        hubert_codes=1000, n_speaker=4, vocab_size=64, pad_idx=0)
    rng = np.random.default_rng(1)
    with tempfile.TemporaryDirectory() as td:
        (Path(td) / "speakers.json").write_text(
            json.dumps({f"s{i}": i for i in range(cfg.n_speaker)}))
        data_config = {
            "path": {"root_path": td},
            "preprocess": {"hubert_codes": cfg.hubert_codes},
            "transformer": {
                "d_model": cfg.d_model, "conv_n_filter": cfg.conv_n_filter,
                "conv_kernel_sizes": list(cfg.conv_kernel_sizes),
                "max_len": cfg.max_len,
                "encoder": {"n_layer": 4, "n_head": 2, "dropout_p": 0.1},
                "decoder": {"n_layer": 4, "n_head": 2, "dropout_p": 0.1},
            },
            "duration_predictor": {"n_filter": 256, "kernel_size": 3,
                                   "dropout_p": 0.5},
        }
        torch.manual_seed(0)
        model = Parrot(data_config, cfg.vocab_size, cfg.pad_idx)
        model.eval()
    model.duration_predictor.proj.bias.data.fill_(float(np.log(12.0)))
    params = tconvert.params_from_torch(model.state_dict(), cfg)

    samples = []
    for n in (41, 48, 53):
        samples.append((rng.integers(2, cfg.vocab_size, size=(n,)),
                        int(rng.integers(0, cfg.n_speaker))))

    # torch logits via forward(inference=True)
    ref_logits = []
    for phones, speaker in samples:
        batch_t = {
            "phones": torch.from_numpy(phones).long().unsqueeze(0),
            "speaker": torch.tensor([speaker]).long(),
            "src_mask": torch.ones(1, len(phones), dtype=torch.bool),
        }
        with torch.no_grad():
            out = model(batch_t, inference=True)
        ref_logits.append(out[0][0].numpy())   # (T_i, 1000)

    s_bucket, t_bucket = 64, 768
    b = len(samples)
    phones_pad = np.zeros((b, s_bucket), np.int32)
    src_mask = np.zeros((b, s_bucket), bool)
    speakers = np.zeros((b,), np.int32)
    for i, (phones, speaker) in enumerate(samples):
        phones_pad[i, : len(phones)] = phones
        src_mask[i, : len(phones)] = True
        speakers[i] = speaker
    batch_j = {"phones": jnp.asarray(phones_pad),
               "speaker": jnp.asarray(speakers),
               "src_mask": jnp.asarray(src_mask)}

    def tpu_logits(force_xla):
        orig = attn_ops._use_flash
        try:
            if force_xla:
                attn_ops._use_flash = lambda *a, **k: False
            with jax.default_matmul_precision("highest"):
                logits, tgt_mask, _ = parrot.apply_parrot(
                    params, batch_j, cfg, out_len=t_bucket, inference=True,
                    deterministic=True)
            return np.asarray(logits), np.asarray(tgt_mask)
        finally:
            attn_ops._use_flash = orig

    lf, mf = tpu_logits(False)
    lx, mx = tpu_logits(True)
    print(f"flash vs XLA (both exact): max|d| = "
          f"{np.abs(lf - lx).max():.3e}")

    for i, ref in enumerate(ref_logits):
        n = ref.shape[0]
        f = lf[i, :n]
        x = lx[i, :n]
        d_f = np.abs(f - ref).max()
        d_x = np.abs(x - ref).max()
        am_ref = ref.argmax(-1)
        am_f = f.argmax(-1)
        am_x = x.argmax(-1)
        flips_f = np.nonzero(am_ref != am_f)[0]
        flips_x = np.nonzero(am_ref != am_x)[0]
        print(f"sample {i}: T={n}  max|flash-ref|={d_f:.3e} "
              f"max|xla-ref|={d_x:.3e} flips(flash)={len(flips_f)} "
              f"flips(xla)={len(flips_x)}")
        for t in flips_f[:5]:
            srt = np.sort(ref[t])[::-1]
            print(f"    flash flip at frame {t}: ref margin "
                  f"{srt[0]-srt[1]:.3e}  ref top={am_ref[t]} "
                  f"got={am_f[t]}")
        for t in flips_x[:5]:
            srt = np.sort(ref[t])[::-1]
            print(f"    xla flip at frame {t}: ref margin "
                  f"{srt[0]-srt[1]:.3e}  ref top={am_ref[t]} "
                  f"got={am_x[t]}")


if __name__ == "__main__":
    main()
