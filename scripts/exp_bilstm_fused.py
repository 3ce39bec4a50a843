"""A/B: fused one-scan BiLSTM vs two sequential scans in the aligner step.

The aligner train step is latency-bound on the LSTM scan chain (PERF.md 5h:
17.7 steps/s steady-state at reference dims while the MXU idles). The fused
`bilstm` (models/aligner/model.py) runs both directions in one scan of
direction-batched einsum cells — T sequential cells instead of 2T. This
script times the FULL jitted train step both ways at the reference shape
(batch 16, 256 mel frames, lstm/conv 512, 80 mels).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from parrot_tts_tpu.core.config import AlignerModelConfig, AlignerTrainConfig
from parrot_tts_tpu.models.aligner import model as amodel
from parrot_tts_tpu.train import aligner as atrain


def two_scan_bilstm(x, p_fw, p_bw):
    fw = amodel.lstm(x, p_fw)
    bw = amodel.lstm(x, p_bw, reverse=True)
    return jnp.concatenate([fw, bw], axis=-1)


def run(tag, steps=200):
    mcfg = AlignerModelConfig(n_mels=80, conv_dim=512, lstm_dim=512,
                              num_symbols=20)
    tcfg = AlignerTrainConfig(batch_size=16)
    rng = np.random.default_rng(0)
    state = atrain.init_state(jax.random.key(0), mcfg, tcfg)
    batch = {
        "mel": jnp.asarray(rng.standard_normal((16, 256, 80)), jnp.float32),
        "mel_lengths": jnp.full((16,), 256, jnp.int32),
        "tokens": jnp.asarray(rng.integers(1, 20, (16, 48)), jnp.int32),
        "token_lengths": jnp.full((16,), 48, jnp.int32),
    }
    # warmup + compile
    for _ in range(3):
        state, m = atrain.train_step(state, batch, tcfg)
    float(m["ctc_loss"])
    # async chain fenced by a VALUE READBACK of the final step's loss.
    # Through this image's relay, block_until_ready on a donated output
    # leaf returns early (0.2 ms/step readings = >500 TF/s f32, an
    # impossibility); float() forces the real dependency chain.
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = atrain.train_step(state, batch, tcfg)
    loss = float(m["ctc_loss"])
    dt = time.perf_counter() - t0
    print(f"{tag}: {steps/dt:.2f} steps/s ({1e3*dt/steps:.2f} ms/step) "
          f"loss={loss:.4f}")
    return steps / dt


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    run("fused warmup pass")          # session warmup; discard
    fused = run("fused one-scan bilstm")
    orig = amodel.bilstm
    amodel.bilstm = two_scan_bilstm
    atrain.train_step.clear_cache()
    try:
        twoscan = run("two sequential scans")
    finally:
        amodel.bilstm = orig
        atrain.train_step.clear_cache()
    print(f"speedup: {fused/twoscan:.2f}x")
