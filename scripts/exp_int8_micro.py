"""Microbenchmark: does XLA actually run int8 at 2x bf16 on this chip?

RETRACTED (PERF.md 4a): this script times ONE op per dispatch, and every
dispatch through the axon relay carries ~0.6-1.6 ms of fixed overhead, so
its ratios measured overhead, not the chip. Use
scripts/exp_marginal_cost.py (N op copies in one jit, fitted slope): the
true marginal rates are bf16 196 TF/s, int8 332 TOP/s (1.70x). Kept for
the methodology record.

Times, at the folded-tail conv shapes (rows x 128 lanes):
  1. bf16 conv (the current path)
  2. pure int8 conv -> int32 (operands pre-quantized: isolates MXU rate)
  3. dynamic-quant int8 conv (ops/quant.py int8_conv_nwc: absmax + round
     + conv + dequant — the shipped path)
  4. pure int8 dot_general vs bf16 dot_general (matmul control)

This separates "int8 MXU rate" from "dynamic quantization overhead" to
pick the right fix for the serving headline.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from parrot_tts_tpu.ops import quant as quant_ops  # noqa: E402


def timeit(jfn, *args, iters=20):
    for _ in range(3):
        float(jnp.sum(jfn(*args))) if jfn(*args).ndim else float(jfn(*args))
    t0 = time.perf_counter()
    outs = [jfn(*args) for _ in range(iters)]
    float(jnp.sum(outs[-1]))
    return (time.perf_counter() - t0) / iters * 1e3


def conv(x, w, pe):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=pe)


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}")

    # stage-5 folded shape: B=64, Tb=80000/8=10000 rows, 128 lanes, Kb=3
    b, tb, c, kb = 64, 10_000, 128, 3
    flops = 2 * b * tb * kb * c * c

    x32 = rng.standard_normal((b, tb, c)).astype(np.float32)
    w32 = (rng.standard_normal((kb, c, c)) * 0.1).astype(np.float32)
    x16 = jnp.asarray(x32, jnp.bfloat16)
    w16 = jnp.asarray(w32, jnp.bfloat16)
    xq = jnp.asarray(np.clip(np.round(x32 * 20), -127, 127), jnp.int8)
    wq = jnp.asarray(np.clip(np.round(w32 * 300), -127, 127), jnp.int8)

    burn = timeit(jax.jit(lambda a, w: jnp.sum(conv(a, w, None))), x16, w16)

    ms = timeit(jax.jit(lambda a, w: jnp.sum(conv(a, w, None))), x16, w16)
    print(f"bf16 conv:        {ms:6.2f} ms  {flops/ms/1e9:7.1f} TFLOP/s")

    ms = timeit(jax.jit(lambda a, w: jnp.sum(conv(a, w, jnp.int32))), xq, wq)
    print(f"int8 conv (pure): {ms:6.2f} ms  {flops/ms/1e9:7.1f} TOP/s")

    x16j = jnp.asarray(x16)
    w32j = jnp.asarray(w32)
    ms = timeit(jax.jit(lambda a, w: jnp.sum(
        quant_ops.int8_conv_nwc(a, w, None, pads=(1, 1)))), x16j, w32j)
    print(f"int8 conv (dyn):  {ms:6.2f} ms  {flops/ms/1e9:7.1f} TOP/s")

    # matmul control at MXU-friendly shape
    m, k, n = 8192, 4096, 4096
    mm_flops = 2 * m * k * n
    a16 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b16 = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    aq = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    bq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)

    ms = timeit(jax.jit(lambda a, b: jnp.sum(
        jax.lax.dot_general(a, b, (((1,), (0,)), ((), ()))))), a16, b16)
    print(f"bf16 matmul:      {ms:6.2f} ms  {mm_flops/ms/1e9:7.1f} TFLOP/s")

    ms = timeit(jax.jit(lambda a, b: jnp.sum(
        jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32))), aq, bq)
    print(f"int8 matmul:      {ms:6.2f} ms  {mm_flops/ms/1e9:7.1f} TOP/s")


if __name__ == "__main__":
    main()
