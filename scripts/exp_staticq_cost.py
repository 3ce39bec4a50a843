"""Where do the int8-static serving path's 43 ms/batch go?

XLA cost analysis (flops + bytes accessed) of the compiled serving
executables vs measured wall time -> implied HBM bandwidth utilization.
If the static path already runs at ~the chip's ~819 GB/s effective
bandwidth, serving is traffic-bound and closed; if not, the gap names the
next lever.

Run on TPU: python scripts/exp_staticq_cost.py
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from parrot_tts_tpu.core.config import VocoderModelConfig  # noqa: E402
from parrot_tts_tpu.models.vocoder import generator as gen  # noqa: E402
from parrot_tts_tpu.models.vocoder import generator_staticq as sq  # noqa: E402


def timed(fn, *args, iters=10):
    for _ in range(3):
        float(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        float(o)
    return (time.perf_counter() - t0) / iters


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    batch, code_len = 64, 250
    base = dataclasses.replace(VocoderModelConfig(), dtype="bfloat16")
    params = gen.fold_params(gen.init_code_generator(jax.random.key(0), base))
    code = jnp.asarray(rng.integers(0, base.num_embeddings,
                                    size=(batch, code_len)).astype(np.int32))
    spkr = jnp.asarray(rng.integers(0, base.num_speakers,
                                    size=(batch,)).astype(np.int32))
    out = {}
    first = True
    for name in ("bf16", "int8", "int8-static"):
        cfg = dataclasses.replace(base, quant="none" if name == "bf16"
                                  else name)
        if name == "int8-static":
            qs = sq.calibrate_qscales(params, code, spkr, cfg)
            f = jax.jit(lambda p, c, s: jnp.sum(
                sq.apply_code_generator_staticq(p, c, s, qs, cfg)))
        else:
            f = jax.jit(lambda p, c, s, cfg=cfg: jnp.sum(
                gen.apply_code_generator(p, c, s, cfg)))
        lowered = f.lower(params, code, spkr).compile()
        ca = lowered.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else (ca or {})
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        dt = timed(f, params, code, spkr)
        if first:        # relay warm-up burn
            first = False
            dt = timed(f, params, code, spkr)
        rec = {
            "ms_per_batch": round(dt * 1e3, 2),
            "cost_flops_g": round(flops / 1e9, 1),
            "cost_bytes_gb": round(byts / 1e9, 3),
            "implied_tflops_s": round(flops / dt / 1e12, 1),
            "implied_gb_s": round(byts / dt / 1e9, 1),
        }
        out[name] = rec
        print(f"  {name:<12} {rec['ms_per_batch']:7.2f} ms  "
              f"{rec['cost_flops_g']:8.1f} GFLOP  "
              f"{rec['cost_bytes_gb']:7.3f} GB  ->  "
              f"{rec['implied_tflops_s']:6.1f} TF/s  "
              f"{rec['implied_gb_s']:6.1f} GB/s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
