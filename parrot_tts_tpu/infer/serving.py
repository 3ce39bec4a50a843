"""Joint TTE + vocoder serving from the compiled graphs.

BASELINE config 5: batched text -> waveform synthesis where the TTE greedy
decode and the vocoder generator run as bucketed jit graphs compiled once
and reused across requests — the TPU replacement for the reference's demo
notebook loop + 8-process vocoder pool. Folded (inference) parameters for
both stages.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import numpy as np

from parrot_tts_tpu.core.config import TTEModelConfig, VocoderModelConfig
from parrot_tts_tpu.data.tte_data import pick_bucket
from parrot_tts_tpu.infer.synthesize import VocoderSynthesizer
from parrot_tts_tpu.models.tte import parrot
from parrot_tts_tpu.models.tte.fold import fold_tte_params
from parrot_tts_tpu.text.tokenizer import DFATokenizer

SRC_BUCKETS = (64, 128, 256, 512)


class ParrotTTS:
    """End-to-end synthesizer. Construct once; `tts()` serves batches."""

    def __init__(
        self,
        tte_params,
        tte_cfg: TTEModelConfig,
        vocoder_params,
        vocoder_cfg: VocoderModelConfig,
        tokenizer: DFATokenizer,
        cleaner: Callable[[str], str],
        *,
        fold: bool = True,
        src_buckets: tuple[int, ...] = SRC_BUCKETS,
        out_len_per_token: int = 16,
        batch_size: int = 64,
        exact: bool | str = "selective-high",
        mesh=None,
    ):
        """exact: decode precision mode (models/tte/parrot.py::infer_codes).
        The default "selective-high" (f32 on encoder/duration/head, 3-pass
        bf16 decoder, flash attention at highest) is UNIT-EXACT on the
        hardware gate (scripts/tpu_parity_check.py: 2024 codes, agreement
        1.0) at +23% throughput over full-f32 (True). "selective"
        (default-precision decoder) is +67% at 99.95% code agreement;
        "hybrid" decodes fast with per-sample top-2 logit margins and
        re-decodes near-tie samples exactly — unit-exact by gate but
        MEASURED SLOWER than "selective-high" (every production-length
        sample carries a near-tie so ~100% re-decode; PERF.md 5b — kept
        as infrastructure, not recommended); False is all-default
        precision (not exact).

        mesh: optional `jax.sharding.Mesh` — both the TTE decode and the
        vocoder shard each batch over the mesh's `data` axis (the
        TPU-native replacement for the reference's 8-GPU inference pool,
        utils/vocoder/inference.py:201-261). Outputs are identical to the
        single-device path (asserted in tests and dryrun_multichip)."""
        import jax

        self.tte_cfg = tte_cfg
        self.tokenizer = tokenizer
        self.cleaner = cleaner
        self.src_buckets = src_buckets
        self.out_len_per_token = out_len_per_token
        self.batch_size = batch_size
        self.exact = exact
        self.mesh = mesh
        self.tte_params = fold_tte_params(tte_params) if fold else tte_params
        if mesh is not None:
            from parrot_tts_tpu.core import mesh as meshlib

            self.tte_params = jax.device_put(self.tte_params,
                                             meshlib.replicated(mesh))
        self.vocoder = VocoderSynthesizer(vocoder_params, vocoder_cfg,
                                          fold=fold, mesh=mesh)
        self._infer = jax.jit(parrot.infer_codes,
                              static_argnames=("cfg", "out_len", "exact", "with_margin"))
        self.last_stats: dict = {}

    def tokenize(self, text: str) -> np.ndarray:
        cleaned = self.cleaner(text)
        symbols = ["sil" if ch == " " else ch for ch in cleaned]
        ids = [self.tokenizer.stoi[s] for s in symbols
               if s in self.tokenizer.stoi]
        return np.asarray(ids, np.int32)

    def predict_units(self, token_seqs: Sequence[np.ndarray],
                      speakers: Sequence[int]) -> list[np.ndarray]:
        from parrot_tts_tpu.infer.tte_infer import (decode_buckets,
                                                    max_decode_len)

        by_bucket: dict[int, list[int]] = {}
        for i, seq in enumerate(token_seqs):
            by_bucket.setdefault(
                pick_bucket(self.src_buckets, len(seq)), []).append(i)

        cap = max_decode_len(self.tte_cfg)
        plan = [(s_len,
                 min(-(-s_len * self.out_len_per_token // 128) * 128, cap),
                 idxs)
                for s_len, idxs in sorted(by_bucket.items())]
        samples = [(seq, speakers[i]) for i, seq in enumerate(token_seqs)]
        # overflow samples (predicted duration > bucket) re-decode in a larger
        # bucket inside decode_buckets — no silent truncation
        return decode_buckets(self._infer, self.tte_params, self.tte_cfg,
                              samples, plan, batch_size=self.batch_size,
                              exact=self.exact, mesh=self.mesh)

    def tts(self, texts: Sequence[str],
            speakers: Sequence[int] | None = None,
            vocoder_speakers: Sequence[int] | None = None) -> list[np.ndarray]:
        """Batched text -> float32 waveforms. Records throughput stats
        (audio-seconds/s, RTF) in `last_stats`."""
        n = len(texts)
        speakers = list(speakers) if speakers is not None else [0] * n
        vocoder_speakers = (list(vocoder_speakers)
                            if vocoder_speakers is not None else speakers)
        t0 = time.perf_counter()
        tokens = [self.tokenize(t) for t in texts]
        units = self.predict_units(tokens, speakers)
        wavs = self.vocoder.synthesize(units, vocoder_speakers)
        dt = time.perf_counter() - t0
        audio_s = sum(len(w) for w in wavs) / self.vocoder.sample_rate
        self.last_stats = {
            "wall_s": dt,
            "audio_seconds": audio_s,
            "audio_seconds_per_second": audio_s / dt if dt else 0.0,
            "rtf": dt / audio_s if audio_s else None,
        }
        return wavs
