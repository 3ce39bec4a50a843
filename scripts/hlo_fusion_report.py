"""Evidence for PERF.md's fusion claim: dump the compiled HLO of the serving
generator and report how the MRF elementwise ops (leaky-relu maximum/multiply,
residual add) are scheduled — standalone loop fusions vs fused into the
convolution fusions' prologues/epilogues.

Usage: python scripts/hlo_fusion_report.py [--batch 64] [--codes 250]
"""

import argparse
import dataclasses
import json
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--codes", type=int, default=250)
    ap.add_argument("--dump", type=str, default=None,
                    help="also write the full HLO text here")
    ap.add_argument("--quant", type=str, default="none",
                    choices=["none", "int8-tail", "int8"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from parrot_tts_tpu.core.config import VocoderModelConfig
    from parrot_tts_tpu.models.vocoder import generator as gen

    cfg = dataclasses.replace(VocoderModelConfig(), dtype="bfloat16",
                              quant=args.quant)
    params = gen.fold_params(gen.init_code_generator(jax.random.key(0), cfg))
    rng = np.random.default_rng(0)
    code = jnp.asarray(rng.integers(0, cfg.num_embeddings,
                                    size=(args.batch, args.codes)
                                    ).astype(np.int32))
    spkr = jnp.asarray(rng.integers(0, cfg.num_speakers,
                                    size=(args.batch,)).astype(np.int32))

    def synth(params, code, spkr):
        return gen.apply_code_generator(params, code, spkr, cfg)

    compiled = jax.jit(synth).lower(params, code, spkr).compile()
    hlo = compiled.as_text()
    if args.dump:
        Path(args.dump).write_text(hlo)

    # fusion bodies are emitted as named computations; attribute each op to
    # the fusion computation it lives in
    fusion_bodies: dict[str, list[str]] = {}
    current = None
    for line in hlo.splitlines():
        m = re.match(r"^%?([\w\.\-]+fusion[\w\.\-]*) .*{", line.strip())
        if m:
            current = m.group(1)
            fusion_bodies[current] = []
        elif current is not None:
            if line.strip() == "}":
                current = None
            else:
                fusion_bodies[current].append(line.strip())

    conv_fusions = {k: v for k, v in fusion_bodies.items()
                    if any("convolution" in l for l in v)}
    elemwise_only = {
        k: v for k, v in fusion_bodies.items()
        if k not in conv_fusions
        and any(re.search(r"\b(maximum|add|multiply|tanh)\(", l)
                for l in v)}
    convs_with_elemwise = {
        k for k, v in conv_fusions.items()
        if any(re.search(r"\b(maximum|multiply|add)\(", l) for l in v)}

    # int8 path: where do quantize (round/clamp) and reductions land?
    quant_in_conv = sum(
        1 for v in conv_fusions.values()
        if any("round-nearest" in l or "clamp(" in l for l in v))
    standalone_quant = sum(
        1 for k, v in fusion_bodies.items() if k not in conv_fusions
        and any("round-nearest" in l or "clamp(" in l for l in v))
    reduce_fusions = sum(
        1 for v in fusion_bodies.values()
        if any(re.search(r"\breduce\(", l) for l in v))

    report = {
        "quant": args.quant,
        "total_fusions": len(fusion_bodies),
        "conv_fusions": len(conv_fusions),
        "conv_fusions_with_fused_elementwise": len(convs_with_elemwise),
        "standalone_elementwise_fusions": len(elemwise_only),
        "standalone_examples": list(elemwise_only)[:5],
        "fusions_with_quantize_in_conv": quant_in_conv,
        "standalone_quantize_fusions": standalone_quant,
        "fusions_with_reduce": reduce_fusions,
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
