"""Vocoder batch synthesis + end-to-end text -> waveform serving.

Reference: `/root/reference/utils/vocoder/inference.py` (an 8-process pool of
GPU workers, one utterance per call, RTF printed) and the demo notebook's
clean text -> TTE infer -> CodeGenerator chain (demo.ipynb cells 9-13). Here
synthesis is BATCHED through one compiled graph per length bucket on a single
chip — the process pool disappears; `--vc` style all-speaker sweeps batch the
speaker axis too.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from parrot_tts_tpu.core.config import TTEModelConfig, VocoderModelConfig
from parrot_tts_tpu.data.audio_io import write_wav
from parrot_tts_tpu.data.tte_data import pick_bucket
from parrot_tts_tpu.models.vocoder import generator as gen
from parrot_tts_tpu.text.tokenizer import DFATokenizer

CODE_BUCKETS = (128, 256, 512, 1024, 2048)


def peak_normalize(wav: np.ndarray) -> np.ndarray:
    """librosa.util.normalize default (peak |x| -> 1), used by the reference
    on every written wav (utils/vocoder/inference.py:169,174)."""
    peak = float(np.abs(wav).max())
    return wav / peak if peak > 0 else wav


class VocoderSynthesizer:
    """Batched unit -> waveform synthesis from folded (inference) params.

    mesh: optional `jax.sharding.Mesh` — batches shard over the mesh's
    `data` axis and XLA runs the same compiled generator SPMD across
    devices (computation follows data; params are replicated once at
    construction). This is the TPU-native replacement for the reference's
    8-GPU process pool (`/root/reference/utils/vocoder/inference.py:
    201-261`: one worker pinned per device, utterances farmed over a
    Pool(8)) — here the batch axis IS the pool. Sharded output is asserted
    bit-identical to the single-device path in tests/test_infer.py and
    dryrun_multichip.
    """

    def __init__(self, params, cfg: VocoderModelConfig, *, fold: bool = True,
                 sample_rate: int = 16_000, mesh=None,
                 calib_margin: float = 1.0):
        import jax

        self.cfg = cfg
        self.sample_rate = sample_rate
        needs_fold = fold and "v" in params["conv_pre"]
        self.params = gen.fold_params(params) if needs_fold else params
        self.mesh = mesh
        if mesh is not None:
            from parrot_tts_tpu.core import mesh as meshlib

            self.params = jax.device_put(self.params,
                                         meshlib.replicated(mesh))
        self._synth = jax.jit(
            lambda p, c, s: gen.apply_code_generator(p, c, s, cfg))
        if cfg.f0 and cfg.quant == "int8-static":
            raise ValueError(
                "int8-static serving does not support f0 conditioning: the "
                "static activation scales are calibrated on the unconditioned "
                "graph (models/vocoder/generator_staticq.py). Serve "
                "f0-conditioned checkpoints with quant='none'/'int8'.")
        self._synth_f0 = (jax.jit(
            lambda p, c, s, f: gen.apply_code_generator(
                p, c, s, cfg, extra_feats={"f0": f}))
            if cfg.f0 else None)
        # static-activation int8 serving (cfg.quant == "int8-static"):
        # scales calibrate lazily on the first served batch (or explicitly
        # via calibrate()); see models/vocoder/generator_staticq.py
        self.calib_margin = calib_margin
        self._qscales = None
        if cfg.quant == "int8-static":
            from parrot_tts_tpu.models.vocoder import generator_staticq as sq

            self._synth_q = jax.jit(
                lambda p, qs, c, s: sq.apply_code_generator_staticq(
                    p, c, s, qs, cfg))
        self.last_rtf: float | None = None

    def calibrate(self, codes, speakers) -> None:
        """Derive static int8 activation scales from a representative batch
        (quant == "int8-static" only). Called lazily from synthesize() if
        not done explicitly."""
        import jax
        import jax.numpy as jnp

        from parrot_tts_tpu.models.vocoder import generator_staticq as sq

        code = jnp.asarray(np.stack([np.asarray(c, np.int32) for c in codes]))
        spk = jnp.asarray(np.asarray(speakers, np.int32))
        self._qscales = sq.calibrate_qscales(
            self.params, code, spk, self.cfg, margin=self.calib_margin)
        if self.mesh is not None:
            from parrot_tts_tpu.core import mesh as meshlib

            self._qscales = jax.device_put(self._qscales,
                                           meshlib.replicated(self.mesh))

    def _launch(self, code_dev, spk_dev, f0_dev=None):
        if f0_dev is not None:
            return self._synth_f0(self.params, code_dev, spk_dev, f0_dev)
        if self.cfg.quant == "int8-static":
            if self._qscales is None:
                self.calibrate(np.asarray(code_dev), np.asarray(spk_dev))
            return self._synth_q(self.params, self._qscales,
                                 code_dev, spk_dev)
        return self._synth(self.params, code_dev, spk_dev)

    def _n_data(self) -> int:
        return (1 if self.mesh is None
                else self.mesh.shape[self.mesh.axis_names[0]])

    def synthesize(self, codes: list[np.ndarray],
                   speakers: list[int],
                   f0: list[np.ndarray] | None = None) -> list[np.ndarray]:
        """Batch per length bucket; returns trimmed float32 waveforms.

        ``f0``: per-utterance CODE-RATE pitch tracks ((Tc,) or (1, Tc)),
        required iff the model was trained with ``cfg.f0`` — extract from
        source audio with `ops/f0.estimate_f0` + `f0_to_code_rate` (the
        resynthesis semantics of the reference's CodeDataset)."""
        import jax.numpy as jnp

        from parrot_tts_tpu.core import mesh as meshlib

        if self.cfg.f0 and f0 is None:
            raise ValueError(
                "this checkpoint is f0-conditioned (cfg.f0): pass per-"
                "utterance code-rate f0 tracks (ops/f0.estimate_f0 + "
                "f0_to_code_rate on the source audio)")
        if not self.cfg.f0:
            f0 = None                       # reference drops the key too

        hop = self.cfg.total_upsample
        results: list[np.ndarray | None] = [None] * len(codes)
        by_bucket: dict[int, list[int]] = {}
        for i, c in enumerate(codes):
            by_bucket.setdefault(pick_bucket(CODE_BUCKETS, len(c)), []).append(i)

        t0 = time.perf_counter()
        total_audio_s = 0.0
        for t_len, idxs in sorted(by_bucket.items()):
            b = len(idxs)
            # under a mesh the leading dim must shard evenly: pad with
            # repeat rows (trimmed after) so every device gets equal work
            b_pad = meshlib.pad_rows_to_multiple(b, self._n_data())
            code_pad = np.zeros((b_pad, t_len), np.int32)
            spk = np.zeros((b_pad,), np.int32)
            f0_pad = (np.zeros((b_pad, 1, t_len), np.float32)
                      if f0 is not None else None)
            for j, gi in enumerate(idxs):
                c = codes[gi][:t_len]
                code_pad[j, : len(c)] = c
                # repeat-pad with the code sequence itself (padding with code
                # 0 would synthesize phantom audio; we trim to true length).
                # empty sequences (empty/unknown text upstream) keep a zero
                # row and trim to a zero-length waveform below
                if 0 < len(c) < t_len:
                    reps = int(np.ceil(t_len / len(c)))
                    code_pad[j] = np.tile(c, reps)[:t_len]
                spk[j] = speakers[gi]
                if f0_pad is not None:
                    tr = np.asarray(f0[gi], np.float32).reshape(-1)[:t_len]
                    f0_pad[j, 0, : len(tr)] = tr
                    if 0 < len(tr) < t_len:  # mirror the code repeat-pad
                        reps = int(np.ceil(t_len / len(tr)))
                        f0_pad[j, 0] = np.tile(tr, reps)[:t_len]
            for j in range(b, b_pad):      # filler rows: repeat row 0
                code_pad[j] = code_pad[0]
                spk[j] = spk[0]
                if f0_pad is not None:
                    f0_pad[j] = f0_pad[0]
            if self.mesh is not None:
                import jax

                # multi-process: shard_batch expects each host's LOCAL slice
                # of the global batch (same contiguous-block convention as
                # BucketedLoader.batches); fetch() reassembles the global
                # output on every host
                if jax.process_count() > 1:
                    sl = meshlib.local_rows(b_pad)
                    local = {"code": code_pad[sl], "spk": spk[sl]}
                    if f0_pad is not None:
                        local["f0"] = f0_pad[sl]
                else:
                    local = {"code": code_pad, "spk": spk}
                    if f0_pad is not None:
                        local["f0"] = f0_pad
                # int8-static: calibrate from HOST data before sharding
                # (np.asarray on a multi-host sharded array would raise)
                if self.cfg.quant == "int8-static" and self._qscales is None:
                    self.calibrate(code_pad, spk)
                sharded = meshlib.shard_batch(self.mesh, local)
                y = meshlib.fetch(self._launch(sharded["code"],
                                               sharded["spk"],
                                               sharded.get("f0")))
            else:
                y = np.asarray(self._launch(
                    jnp.asarray(code_pad), jnp.asarray(spk),
                    jnp.asarray(f0_pad) if f0_pad is not None else None))
            for j, gi in enumerate(idxs):
                n = len(codes[gi][:t_len]) * hop
                results[gi] = y[j, :n, 0]
                total_audio_s += n / self.sample_rate
        dt = time.perf_counter() - t0
        self.last_rtf = dt / total_audio_s if total_audio_s else None
        return results  # type: ignore[return-value]

    def to_wavs(self, codes, speakers, out_dir: str | Path,
                names: list[str] | None = None,
                f0: list[np.ndarray] | None = None) -> list[Path]:
        out_dir = Path(out_dir)
        wavs = self.synthesize(codes, speakers, f0=f0)
        paths = []
        for i, w in enumerate(wavs):
            name = names[i] if names else f"utt_{i:05d}"
            p = out_dir / f"{name}_gen.wav"
            write_wav(p, w, self.sample_rate)
            paths.append(p)
        return paths


def synthesize_text(
    text: str,
    *,
    tte_params,
    tte_cfg: TTEModelConfig,
    tokenizer: DFATokenizer,
    synthesizer: VocoderSynthesizer,
    cleaner,
    speaker_id: int = 0,
    vocoder_speaker_id: int | None = None,
) -> np.ndarray:
    """End-to-end: clean text -> char tokens -> TTE units -> waveform
    (the demo notebook path, demo.ipynb cells 9-13)."""
    import jax.numpy as jnp

    from parrot_tts_tpu.models.tte import parrot

    cleaned = cleaner(text)
    symbols = ["sil" if ch == " " else ch for ch in cleaned]
    phones = [tokenizer.stoi[s] for s in symbols if s in tokenizer.stoi]
    s_len = len(phones)
    batch = {
        "phones": jnp.asarray(np.asarray(phones, np.int32)[None]),
        "src_mask": jnp.ones((1, s_len), bool),
        "speaker": jnp.asarray([speaker_id], np.int32),
    }
    from parrot_tts_tpu.infer.tte_infer import max_decode_len

    cap = max_decode_len(tte_cfg)
    out_len = min(s_len * 16, cap)
    codes, mask, total = parrot.infer_codes(tte_params, batch, tte_cfg,
                                            out_len=out_len)
    if int(total[0]) > out_len and out_len < cap:
        # predicted speech overflows the heuristic bucket: re-decode at the
        # needed length (the reference's dynamic shapes never truncate)
        out_len = min(-(-int(total[0]) // 128) * 128, cap)
        codes, mask, total = parrot.infer_codes(tte_params, batch, tte_cfg,
                                                out_len=out_len)
    units = np.asarray(codes)[0][np.asarray(mask)[0]]
    spk = vocoder_speaker_id if vocoder_speaker_id is not None else speaker_id
    return synthesizer.synthesize([units], [spk])[0]
