"""Detect whether the axon relay dedupes repeated identical executions:
time the full serving forward with (a) the same inputs every iteration,
(b) a fresh input each iteration (pre-staged on device)."""

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from parrot_tts_tpu.core.config import VocoderModelConfig
from parrot_tts_tpu.models.vocoder import generator as gen


def main():
    cfg = dataclasses.replace(VocoderModelConfig(), dtype="bfloat16")
    batch, code_len = 64, 250
    params = gen.fold_params(gen.init_code_generator(jax.random.key(0), cfg))
    rng = np.random.default_rng(0)
    spkr = jnp.asarray(rng.integers(0, cfg.num_speakers,
                                    size=(batch,)).astype(np.int32))

    @jax.jit
    def synth(params, code, spkr):
        return jnp.sum(gen.apply_code_generator(params, code, spkr, cfg))

    iters = 10
    codes = [jnp.asarray(rng.integers(0, cfg.num_embeddings,
                                      size=(batch, code_len)).astype(np.int32))
             for _ in range(iters)]
    codes = [jax.device_put(c) for c in codes]

    # warmup
    for _ in range(3):
        float(synth(params, codes[0], spkr))

    t0 = time.perf_counter()
    for _ in range(iters):
        float(synth(params, codes[0], spkr))
    same = (time.perf_counter() - t0) / iters * 1e3

    for c in codes:
        c.block_until_ready()
    t0 = time.perf_counter()
    for i in range(iters):
        float(synth(params, codes[i], spkr))
    vary = (time.perf_counter() - t0) / iters * 1e3

    # and a serialized variant: result of iter i feeds iter i+1's speaker
    @jax.jit
    def synth_chain(params, code, spkr, bias):
        y = gen.apply_code_generator(params, code, spkr, cfg)
        return jnp.sum(y) + bias

    bias = jnp.float32(0.0)
    for _ in range(3):
        bias = synth_chain(params, codes[0], spkr, bias)
        float(bias)
    t0 = time.perf_counter()
    for i in range(iters):
        bias = synth_chain(params, codes[i], spkr, bias)
        float(bias)
    chain = (time.perf_counter() - t0) / iters * 1e3

    print(f"same input every iter:  {same:7.2f} ms/iter")
    print(f"fresh input every iter: {vary:7.2f} ms/iter")
    print(f"chained (serialized):   {chain:7.2f} ms/iter")


if __name__ == "__main__":
    main()
