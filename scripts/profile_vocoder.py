"""Stage-level timing of the vocoder serving path at the bench config.

Times cumulative partial forwards (conv_pre, +stage0, +stage1, ...) and
prints deltas. Each timed value ends in a scalar checksum fetch (the only
reliable completion barrier through the axon relay — see PERF.md).
"""

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from parrot_tts_tpu.core.config import VocoderModelConfig
from parrot_tts_tpu.models.vocoder import generator as gen
from parrot_tts_tpu.ops import conv as conv_ops
from parrot_tts_tpu.ops import folded as folded_ops
from parrot_tts_tpu.ops.weight_norm import WN_AXES_CONV1D, WN_AXES_CONV_T1D


def partial_forward(params, x, cfg, n_stages, lane_target=128,
                    precision=None):
    """First n_stages upsample stages of apply_generator (0 = conv_pre only),
    mirroring generator.apply_generator."""
    nk = len(cfg.resblock_kernel_sizes)
    apply_rb = (gen.apply_resblock1 if cfg.resblock == "1"
                else gen.apply_resblock2)
    dtype = jnp.dtype(cfg.dtype)
    x = x.astype(dtype)
    x = conv_ops.conv1d(x, gen._kernel(params["conv_pre"], WN_AXES_CONV1D,
                                       dtype),
                        params["conv_pre"]["b"].astype(dtype), padding=3,
                        precision=precision)
    g = 1
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        if i >= n_stages:
            break
        cout = cfg.upsample_initial_channel // (2 ** (i + 1))
        x = jax.nn.leaky_relu(x, gen.LRELU_SLOPE)
        up = params["ups"][i]
        if g > 1:
            x = folded_ops.folded_conv_transpose1d(
                x, gen._kernel(up, WN_AXES_CONV_T1D, dtype),
                up["b"].astype(dtype), g_in=g, stride=u,
                padding=(k - u) // 2, precision=precision)
            g *= u
        else:
            x = conv_ops.conv_transpose1d(
                x, gen._kernel(up, WN_AXES_CONV_T1D, dtype),
                up["b"].astype(dtype), stride=u, padding=(k - u) // 2,
                precision=precision)
            want = max(1, lane_target // cout) if cfg.fold_tail else 1
            if want > 1 and x.shape[1] % want == 0:
                x = folded_ops.fold(x, want)
                g = want
        acc = None
        for j in range(nk):
            rb = params["resblocks"][i * nk + j]
            y = apply_rb(rb, x, cfg.resblock_kernel_sizes[j],
                         cfg.resblock_dilation_sizes[j], precision=precision,
                         dtype=dtype, g=g)
            acc = y if acc is None else acc + y
        x = acc / nk
    return x


def timed(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = dataclasses.replace(VocoderModelConfig(), dtype="bfloat16")
    batch, code_len = 64, 250
    key = jax.random.key(0)
    params = gen.fold_params(gen.init_code_generator(key, cfg))

    rng = np.random.default_rng(0)
    code = jnp.asarray(rng.integers(0, cfg.num_embeddings,
                                    size=(batch, code_len)).astype(np.int32))
    spkr = jnp.asarray(rng.integers(0, cfg.num_speakers,
                                    size=(batch,)).astype(np.int32))

    def embed(params, code, spkr):
        x = jnp.take(params["dict"], code, axis=0)
        s = jnp.take(params["spkr"], spkr.reshape(-1), axis=0)
        s = jnp.broadcast_to(s[:, None, :], x.shape)
        return jnp.concatenate([x, s], axis=-1)

    x = jax.jit(embed)(params, code, spkr)

    # a floor measurement: trivial kernel, pure dispatch+fetch latency
    floor = jax.jit(lambda x: jnp.sum(x) * 2.0)
    t_floor = timed(floor, x)
    print(f"fetch floor (sum only):        {t_floor:8.2f} ms")

    prev = t_floor
    cuts = []
    for n in range(0, 6):
        f = jax.jit(lambda p, x, n=n: jnp.sum(
            partial_forward(p, x, cfg, n)))
        t = timed(f, params, x)
        cuts.append(t)
        label = "conv_pre" if n == 0 else f"+stage{n - 1}"
        print(f"{label:<22s} cum {t:8.2f} ms   delta {t - prev:7.2f} ms")
        prev = t

    full = jax.jit(lambda p, c, s: jnp.sum(
        gen.apply_code_generator(p, c, s, cfg)))
    t = timed(full, params, code, spkr)
    print(f"{'full (post+tanh)':<22s} cum {t:8.2f} ms   delta {t - prev:7.2f} ms")


if __name__ == "__main__":
    main()
