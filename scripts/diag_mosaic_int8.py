"""Isolate which Mosaic construct crashes the int8 conv kernel
(tpu_compile_helper exit 1 is opaque — binary-search the kernel features).

Variants, all (B=2, T, 128)->(128) k=3 d=1 shapes:
  A. aligned dynamic slice (t0 = i*bt, bt%32==0), single tap, int8 dot
  B. unaligned dynamic slice (t0 + 1)
  C. aligned slab read + static unaligned in-register slices (the
     restructured conv kernel's shape)
  D. 3-tap accumulate via C's scheme + f32 epilogue with (1,1,bn) scale
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402


def run(name, kernel, grid, in_specs, out_specs, out_shape, *args):
    try:
        out = pl.pallas_call(kernel, grid=grid, in_specs=in_specs,
                             out_specs=out_specs, out_shape=out_shape)(*args)
        s = float(jnp.sum(out.astype(jnp.float32)))
        print(f"{name}: OK (sum={s:.1f})", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}",
              flush=True)
        return False


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    b, t, c = 2, 512, 128
    bt = 128
    xq = jnp.asarray(rng.integers(-100, 100, (b, t + 64, c)), jnp.int8)
    wq = jnp.asarray(rng.integers(-100, 100, (c, c)), jnp.int8)
    w3 = jnp.asarray(rng.integers(-100, 100, (3, c, c)), jnp.int8)
    sc = jnp.asarray(rng.random((b, 1, c)), jnp.float32)

    def ka(x_ref, w_ref, o_ref):
        t0 = pl.program_id(1) * bt
        o_ref[0] = jax.lax.dot_general(
            x_ref[0, pl.ds(t0, bt), :], w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    run("A aligned dyn slice",
        ka, (b, t // bt),
        [pl.BlockSpec((1, t + 64, c), lambda i, j: (i, 0, 0)),
         pl.BlockSpec((c, c), lambda i, j: (0, 0))],
        pl.BlockSpec((1, bt, c), lambda i, j: (i, j, 0)),
        jax.ShapeDtypeStruct((b, t, c), jnp.int32), xq, wq)

    def kb(x_ref, w_ref, o_ref):
        t0 = pl.program_id(1) * bt + 1
        o_ref[0] = jax.lax.dot_general(
            x_ref[0, pl.ds(t0, bt), :], w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    run("B unaligned dyn slice",
        kb, (b, t // bt),
        [pl.BlockSpec((1, t + 64, c), lambda i, j: (i, 0, 0)),
         pl.BlockSpec((c, c), lambda i, j: (0, 0))],
        pl.BlockSpec((1, bt, c), lambda i, j: (i, j, 0)),
        jax.ShapeDtypeStruct((b, t, c), jnp.int32), xq, wq)

    def kc(x_ref, w_ref, o_ref):
        t0 = pl.program_id(1) * bt
        slab = x_ref[0, pl.ds(t0, bt + 32), :]
        acc = None
        for j in range(3):
            xs = jax.lax.slice(slab, (j, 0), (j + bt, c))
            dj = jax.lax.dot_general(
                xs, w_ref[j],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = dj if acc is None else acc + dj
        o_ref[0] = acc

    run("C slab + static unaligned slices",
        kc, (b, t // bt),
        [pl.BlockSpec((1, t + 64, c), lambda i, j: (i, 0, 0)),
         pl.BlockSpec((3, c, c), lambda i, j: (0, 0, 0))],
        pl.BlockSpec((1, bt, c), lambda i, j: (i, j, 0)),
        jax.ShapeDtypeStruct((b, t, c), jnp.int32), xq, w3)

    def kd(x_ref, w_ref, s_ref, o_ref):
        t0 = pl.program_id(1) * bt
        slab = x_ref[0, pl.ds(t0, bt + 32), :]
        acc = None
        for j in range(3):
            xs = jax.lax.slice(slab, (j, 0), (j + bt, c))
            dj = jax.lax.dot_general(
                xs, w_ref[j],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = dj if acc is None else acc + dj
        y = acc.astype(jnp.float32) * s_ref[0, 0, :][None, :]
        o_ref[0] = jnp.maximum(y, 0.1 * y).astype(o_ref.dtype)

    run("D full epilogue",
        kd, (b, t // bt),
        [pl.BlockSpec((1, t + 64, c), lambda i, j: (i, 0, 0)),
         pl.BlockSpec((3, c, c), lambda i, j: (0, 0, 0)),
         pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0))],
        pl.BlockSpec((1, bt, c), lambda i, j: (i, j, 0)),
        jax.ShapeDtypeStruct((b, t, c), jnp.bfloat16), xq, w3, sc)


if __name__ == "__main__":
    main()
