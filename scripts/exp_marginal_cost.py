"""Separate fixed per-call overhead from marginal op cost.

The v3 Pallas/XLA conv microbenches cluster at ~1.4-2.6 ms across shapes
whose FLOPs differ by 10x — consistent with a large fixed per-dispatch
cost through the axon relay poisoning every single-op microbench (and
possibly round 3's int8 refutation). Method: time a jit containing N
independent copies of the op (summed outputs); the slope over N is the
true marginal op cost, the intercept is the overhead.

Run on TPU: python scripts/exp_marginal_cost.py
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

from parrot_tts_tpu.ops import pallas_qconv as pq  # noqa: E402
from parrot_tts_tpu.ops import quant as quant_ops  # noqa: E402


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=20):
    for _ in range(3):
        _sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _sync(outs[-1])
    return (time.perf_counter() - t0) / iters * 1e3


def fit(label, times_by_n, unit_flops):
    ns = sorted(times_by_n)
    ts = [times_by_n[n] for n in ns]
    slope = (ts[-1] - ts[0]) / (ns[-1] - ns[0])
    intercept = ts[0] - slope * ns[0]
    print(f"{label}: times={[f'{t:.2f}' for t in ts]} ms at N={ns} -> "
          f"marginal {slope:.3f} ms/op ({unit_flops/slope/1e9:7.1f} T/s), "
          f"overhead {intercept:.2f} ms", flush=True)
    return slope


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}", flush=True)

    # ---- matmul marginals (XLA), bf16 vs int8
    m, k, n = 4096, 4096, 4096
    fl = 2 * m * k * n
    a32 = rng.standard_normal((m, k)).astype(np.float32)
    b32 = rng.standard_normal((k, n)).astype(np.float32)
    a16, b16 = jnp.asarray(a32, jnp.bfloat16), jnp.asarray(b32, jnp.bfloat16)
    aq = jnp.asarray(np.clip(np.round(a32 * 30), -127, 127), jnp.int8)
    bq = jnp.asarray(np.clip(np.round(b32 * 30), -127, 127), jnp.int8)

    def mm_n(nrep, dtype_int):
        def f(a, b):
            outs = []
            for i in range(nrep):
                # rotate rows per copy so XLA cannot CSE the copies;
                # jnp.max consumption cannot be sliced or algebraically
                # pushed through the dot (o[0,0] was DCE'd to a tiny dot —
                # the first run of this script measured NEGATIVE marginals)
                ai = jnp.roll(a, i, axis=0)
                o = jax.lax.dot_general(
                    ai, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32 if dtype_int
                    else jnp.bfloat16)
                outs.append(jnp.max(o).astype(jnp.float32))
            return jnp.stack(outs).sum()
        return jax.jit(f)

    for name, args, isint in (("xla mm bf16", (a16, b16), False),
                              ("xla mm int8", (aq, bq), True)):
        times = {nr: timeit(mm_n(nr, isint), *args) for nr in (1, 4, 8)}
        fit(name, times, fl)

    # ---- conv marginals at two serving shapes, three impls
    for label, b, t, ci, co, kk, d in (
            ("mrf C=256 k3 T=1250", 64, 1250, 256, 256, 3, 1),
            ("folded tail k3 T=10000", 64, 10000, 128, 128, 3, 1)):
        pads = (d * (kk - 1) // 2, d * (kk - 1) - d * (kk - 1) // 2)
        cfl = 2 * b * t * kk * ci * co
        x32 = rng.standard_normal((b, t, ci)).astype(np.float32) * 0.3
        w32 = rng.standard_normal((kk, ci, co)).astype(np.float32) * 0.05
        x16 = jnp.asarray(x32, jnp.bfloat16)
        w16 = jnp.asarray(w32, jnp.bfloat16)
        xq, sx = quant_ops.quantize_per_row(jnp.asarray(x32))
        wq, sw = quant_ops.quantize_per_out_channel(jnp.asarray(w32))
        scale = (sx[:, 0, 0:1] * sw[None, :]).astype(jnp.float32)

        def xla_n(nrep):
            def f(x, w):
                outs = []
                for i in range(nrep):
                    xi = jnp.roll(x, i, axis=1)
                    o = jax.lax.conv_general_dilated(
                        xi, w, window_strides=(1,), padding=(pads,),
                        rhs_dilation=(d,),
                        dimension_numbers=("NWC", "WIO", "NWC"))
                    outs.append(jnp.max(o).astype(jnp.float32))
                return jnp.stack(outs).sum()
            return jax.jit(f)

        def dyn_n(nrep):
            def f(x, w):
                outs = []
                for i in range(nrep):
                    xi = jnp.roll(x, i, axis=1)
                    o = quant_ops.int8_conv_nwc(xi, w, None, pads=pads,
                                                rhs_dilation=d)
                    outs.append(jnp.max(o).astype(jnp.float32))
                return jnp.stack(outs).sum()
            return jax.jit(f)

        def pallas_n(nrep, bt_):
            def f(x, w, s):
                outs = []
                for i in range(nrep):
                    xi = jnp.roll(x, i, axis=1)
                    o = pq.int8_conv_nwc_pallas(
                        xi, w, s, pads=pads, rhs_dilation=d,
                        block_t=bt_)
                    outs.append(jnp.max(o).astype(jnp.float32))
                return jnp.stack(outs).sum()
            return jax.jit(f)

        times = {nr: timeit(xla_n(nr), x16, w16) for nr in (1, 4, 8)}
        fit(f"{label} xla-bf16", times, cfl)
        times = {nr: timeit(dyn_n(nr), x16, jnp.asarray(w32))
                 for nr in (1, 4, 8)}
        fit(f"{label} xla-dyn8", times, cfl)
        for bt_ in (256, 512, 1024):
            try:
                times = {nr: timeit(pallas_n(nr, bt_), xq, wq, scale)
                         for nr in (1, 4, 8)}
                fit(f"{label} pallas-int8 bt{bt_}", times, cfl)
            except Exception as e:
                print(f"{label} pallas bt{bt_}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
