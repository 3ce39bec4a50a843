"""Batched f0 (pitch) estimation — the TPU-native counterpart of the
reference's ``get_yaapt_f0`` (``/root/reference/utils/vocoder/dataset.py:
25-41``), which calls amfm_decompy's pYAAPT per utterance on the host
(frame_length 20 ms, frame_space 5 ms, nccf_thresh1 0.25).

pYAAPT is a sequential, per-utterance CPU tracker (and amfm_decompy is not a
dependency of this framework), so this module re-implements the measurement
it provides — a framed normalized cross-correlation (NCCF) pitch track with
0 marking unvoiced frames (pYAAPT's ``samp_values`` convention) and an
interpolated variant (``samp_interp``) — as one batched, statically-shaped
jit graph:

* frames are gathered with a static strided gather (hop 5 ms, window 20 ms,
  plus ``lag_max`` lookahead samples per frame),
* the NCCF numerator for ALL lags of ALL frames is one batched rFFT
  cross-correlation (O(W log W) per frame, no per-lag loop),
* the denominator energies come from a cumulative sum,
* voicing is ``peak NCCF > nccf_thresh`` with a frame-energy floor, and a
  3-tap median filter removes isolated octave glitches.

Like the reference function, the signal is zero-padded by half a frame at
both ends (dataset.py:26-31) and the result has shape ``(B, 1, n_frames)``
(dataset.py:36-41).  The f0 path is dormant in the reference's own config
(no ``f0`` key — SURVEY.md §2); this implementation makes the capability
real on TPU rather than translating pYAAPT's dynamic-programming tracker,
whose sequential per-frame control flow has no efficient XLA lowering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["estimate_f0", "f0_to_code_rate", "f0_for_codes"]


def _frame_starts(n_padded: int, win: int, lag_max: int, hop: int) -> int:
    """Number of full frames (each needs win + lag_max samples)."""
    need = win + lag_max
    if n_padded < need:
        return 1
    return 1 + (n_padded - need) // hop


@functools.partial(
    jax.jit,
    static_argnames=("rate", "frame_length_ms", "frame_space_ms", "f0_min",
                     "f0_max", "nccf_thresh", "interp"))
def estimate_f0(audio: jnp.ndarray, *, rate: int = 16000,
                frame_length_ms: float = 20.0, frame_space_ms: float = 5.0,
                f0_min: float = 60.0, f0_max: float = 400.0,
                nccf_thresh: float = 0.25,
                interp: bool = False) -> jnp.ndarray:
    """audio: (B, N) float waveform in [-1, 1]. Returns (B, 1, F) float32
    pitch in Hz; 0 where unvoiced (``interp=False``) or linearly
    interpolated across unvoiced gaps (``interp=True`` — the reference's
    ``samp_interp`` branch, dataset.py:34-38).

    Defaults mirror the reference call site: 20 ms frames every 5 ms,
    voicing threshold 0.25 (dataset.py:31-33); pYAAPT's default search band
    60-400 Hz.
    """
    if audio.ndim != 2:
        raise ValueError(f"audio must be (B, N), got {audio.shape}")
    x = audio.astype(jnp.float32)
    b, n = x.shape
    win = int(rate * frame_length_ms / 1000.0)          # 320 @ 16 kHz
    hop = int(rate * frame_space_ms / 1000.0)           # 80
    lag_min = max(2, int(rate / f0_max))                # 40
    lag_max = int(np.ceil(rate / f0_min))               # 267
    pad = win // 2                                      # dataset.py:26-27

    x = jnp.pad(x, ((0, 0), (pad, pad)))
    n_frames = _frame_starts(n + 2 * pad, win, lag_max, hop)
    # tail zero-pad so the last frame's lag window is full
    total = (n_frames - 1) * hop + win + lag_max
    x = jnp.pad(x, ((0, 0), (0, max(0, total - (n + 2 * pad)))))

    # (B, F, win + lag_max) strided frame gather — static indices
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(win + lag_max)[None, :])        # (F, W+L)
    frames = x[:, idx]                                  # (B, F, W+L)

    # NCCF numerator for every lag at once via rFFT cross-correlation:
    # num[l] = sum_{t<win} f[t] * f[t+l]
    head = frames[..., :win]                            # (B, F, W)
    nfft = int(2 ** np.ceil(np.log2(win + lag_max)))
    fa = jnp.fft.rfft(head, n=nfft)
    fb = jnp.fft.rfft(frames, n=nfft)
    num = jnp.fft.irfft(jnp.conj(fa) * fb, n=nfft)[..., : lag_max + 1]

    # denominator energies: e0 = |f[0:W]|^2, e[l] = |f[l:l+W]|^2 via cumsum
    sq = frames * frames
    csum = jnp.cumsum(sq, axis=-1)
    csum = jnp.pad(csum, ((0, 0), (0, 0), (1, 0)))      # prefix sums
    lags = jnp.arange(lag_max + 1)
    e_l = csum[..., lags + win] - csum[..., lags]       # (B, F, L+1)
    e0 = e_l[..., :1]
    nccf = num / jnp.sqrt(e0 * e_l + 1e-9)

    band = nccf[..., lag_min : lag_max + 1]             # candidate lags
    # subharmonic guard: a periodic frame correlates at every multiple of
    # its period, so a bare argmax can land an octave low. Take the
    # SHORTEST lag whose NCCF is within 10% of the frame's max (argmax of
    # the boolean returns the first hit) — the scan-free form of the
    # shortest-consistent-lag rule pYAAPT enforces with its DP tracker.
    best = jnp.max(band, axis=-1, keepdims=True)
    pad_b = jnp.pad(band, ((0, 0), (0, 0), (1, 1)),
                    constant_values=-jnp.inf)
    is_peak = (band >= pad_b[..., :-2]) & (band >= pad_b[..., 2:])
    cand = is_peak & (band >= 0.9 * best)
    peak_rel = jnp.argmax(cand, axis=-1)                # (B, F) first hit
    peak_lag = peak_rel + lag_min
    peak_val = jnp.take_along_axis(band, peak_rel[..., None],
                                   axis=-1)[..., 0]

    # parabolic refinement around the integer-lag peak (sub-sample f0)
    lm1 = jnp.take_along_axis(nccf, jnp.maximum(peak_lag - 1, 0)[..., None],
                              axis=-1)[..., 0]
    lp1 = jnp.take_along_axis(nccf,
                              jnp.minimum(peak_lag + 1, lag_max)[..., None],
                              axis=-1)[..., 0]
    denom = lm1 - 2.0 * peak_val + lp1
    shift = jnp.where(jnp.abs(denom) > 1e-9,
                      0.5 * (lm1 - lp1) / denom, 0.0)
    shift = jnp.clip(shift, -0.5, 0.5)
    lag_f = peak_lag.astype(jnp.float32) + shift

    f0 = rate / lag_f
    # voicing: NCCF peak above threshold AND the frame carries energy
    # (silence normalizes to noise; pYAAPT likewise zeroes silent frames)
    energy = e0[..., 0] / win
    voiced = (peak_val > nccf_thresh) & (energy > 1e-6)
    f0 = jnp.where(voiced, f0, 0.0)

    # 3-tap median removes isolated octave errors without smearing onsets
    f0_pad = jnp.pad(f0, ((0, 0), (1, 1)), mode="edge")
    stacked = jnp.stack([f0_pad[:, :-2], f0_pad[:, 1:-1], f0_pad[:, 2:]],
                        axis=-1)
    f0 = jnp.median(stacked, axis=-1)

    if interp:
        f0 = _interp_unvoiced(f0)
    return f0[:, None, :]                               # (B, 1, F)


def _interp_unvoiced(f0: jnp.ndarray) -> jnp.ndarray:
    """Linearly bridge unvoiced (0) gaps between voiced frames, holding the
    edge values outside the first/last voiced frame — the shape of pYAAPT's
    ``samp_interp`` output (dataset.py:34-36), computed with two prefix
    scans instead of a spline."""
    b, f = f0.shape
    pos = jnp.arange(f, dtype=jnp.float32)
    voiced = f0 > 0.0

    def directional(fill_from_left: bool):
        vals = f0 if fill_from_left else f0[:, ::-1]
        v = voiced if fill_from_left else voiced[:, ::-1]

        def step(carry, xs):
            last_val, last_pos = carry
            val, isv, p = xs
            last_val = jnp.where(isv, val, last_val)
            last_pos = jnp.where(isv, p, last_pos)
            return (last_val, last_pos), (last_val, last_pos)

        init = (jnp.zeros((b,)), jnp.full((b,), -1.0))
        (_, _), (lv, lp) = jax.lax.scan(
            step, init, (vals.T, v.T, jnp.broadcast_to(pos[:, None], (f, b))))
        lv, lp = lv.T, lp.T
        if not fill_from_left:
            lv = lv[:, ::-1]
            lp = (f - 1.0) - lp[:, ::-1]
        return lv, lp

    left_val, left_pos = directional(True)
    right_val, right_pos = directional(False)

    have_l = left_pos >= 0.0
    have_r = right_pos <= f - 1.0
    span = jnp.maximum(right_pos - left_pos, 1.0)
    w = (pos[None, :] - left_pos) / span
    mid = left_val * (1.0 - w) + right_val * w
    filled = jnp.where(have_l & have_r, mid,
                       jnp.where(have_l, left_val, right_val))
    return jnp.where(voiced, f0, filled)


def f0_to_code_rate(f0: jnp.ndarray, code_len: int,
                    frames_per_code: int = 4) -> jnp.ndarray:
    """Pool a (B, 1, F) 5 ms-hop pitch track to the 20 ms HuBERT code rate:
    mean over the VOICED samples in each code frame (0 if none), giving a
    (B, 1, code_len) track that upsample-concat conditioning can align with
    the code embedding (generator ``_upsample`` needs the condition length
    to divide the frame count — models.py:131-150).

    ``frames_per_code`` is the HOP ratio (code hop 320 / f0 hop 80 = 4 at
    the defaults) — it must NOT be derived from floor(F/code_len): the
    extractor's window+lag lookahead trims tail frames, so that quotient
    can come out low and drift the pooling window ~5 ms per code frame.
    The tail is zero-padded (unvoiced) to ``code_len * frames_per_code``."""
    b = f0.shape[0]
    f = f0.shape[-1]
    per = frames_per_code
    need = code_len * per
    track = f0[..., :need] if f >= need else jnp.pad(
        f0, ((0, 0), (0, 0), (0, need - f)))
    track = track.reshape(b, 1, code_len, per)
    voiced = (track > 0.0).astype(track.dtype)
    cnt = jnp.sum(voiced, axis=-1)
    s = jnp.sum(track, axis=-1)
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0)


def f0_for_codes(wavs, code_lens, *, rate: int = 16000,
                 code_hop: int = 320, **kwargs):
    """Per-utterance code-rate f0 tracks from raw waveforms — the serving-
    side extraction for f0-conditioned checkpoints (the reference computes
    f0 from the SOURCE audio of each utterance, CodeDataset semantics).

    Lengths are padded up to power-of-two buckets (>= 4096) so the jitted
    extractor compiles once per bucket, not once per utterance; the zero
    tail is unvoiced and the pooling trims to ``code_len`` frames. Returns
    a list of (code_len,) float32 arrays.
    """
    f0_hop = int(rate * kwargs.get("frame_space_ms", 5.0) / 1000.0)
    per = max(1, code_hop // f0_hop)
    out = []
    for w, cl in zip(wavs, code_lens):
        w = np.asarray(w, np.float32).reshape(-1)
        n = max(1, len(w))
        bucket = 1 << max(12, int(np.ceil(np.log2(n))))
        padded = np.zeros(bucket, np.float32)
        padded[: len(w)] = w
        track = estimate_f0(jnp.asarray(padded[None]), rate=rate, **kwargs)
        out.append(np.asarray(
            f0_to_code_rate(track, int(cl), frames_per_code=per),
            np.float32)[0, 0])
    return out
