"""Differentiable STFT / mel-spectrogram ops, TPU-first.

The reference computes its loss mel with `torch.stft` + a librosa filterbank
(`/root/reference/utils/vocoder/dataset.py:43-69`) and the aligner's feature
mel with `librosa.feature.melspectrogram` (`/root/reference/utils/aligner/
audio.py:30-42`). On TPU the windowed real DFT is expressed as ONE strided
convolution with a (n_fft, 2*n_bins) windowed-DFT kernel — the MXU's native
shape — instead of a cuFFT call. XLA folds the subsequent magnitude, mel
matmul and log-compression into the same fusion; the op is differentiable
end-to-end (the mel-L1 GAN loss backprops through it, reference
utils/vocoder/train.py:135-157).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tts_tpu.ops import mel as mellib


@functools.lru_cache(maxsize=8)
def _stft_kernel(n_fft: int, win_size: int) -> np.ndarray:
    """Windowed real-DFT conv kernel, shape (n_fft, 1, 2*n_bins).

    Output channels = [re_0..re_{n_bins-1}, im_0..im_{n_bins-1}].
    A window shorter than n_fft is zero-padded centered, matching torch.stft.
    """
    win = mellib.hann_window(win_size)
    if win_size < n_fft:
        pad_l = (n_fft - win_size) // 2
        win = np.pad(win, (pad_l, n_fft - win_size - pad_l))
    cos, msin = mellib.dft_matrices(n_fft)          # (n_fft, n_bins) each
    k = np.concatenate([cos * win[:, None], msin * win[:, None]], axis=1)
    return k[:, None, :].astype(np.float32)          # (W, I=1, O=2*n_bins)


def _reflect_pad(y: jnp.ndarray, pad: int) -> jnp.ndarray:
    if pad == 0:
        return y
    return jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")


def stft_magnitude(
    y: jnp.ndarray,
    n_fft: int,
    hop_size: int,
    win_size: int,
    *,
    center: bool = False,
    pad: int = 0,
    magnitude_eps: float = 1e-9,
) -> jnp.ndarray:
    """|STFT(y)| for a batch of waveforms.

    Args:
      y: (B, T) float waveform in [-1, 1].
      center: librosa-style centering (reflect-pad n_fft//2 each side).
      pad: extra symmetric reflect padding applied first — the reference's
        manual `(n_fft - hop)/2` pad with center=False
        (utils/vocoder/dataset.py:55-60).
      magnitude_eps: added under the sqrt exactly like the reference's
        `sqrt(re^2 + im^2 + 1e-9)` (utils/vocoder/dataset.py:63).

    Returns:
      (B, n_frames, n_bins) magnitudes, n_bins = n_fft//2 + 1.
    """
    if y.ndim != 2:
        raise ValueError(f"expected (B, T) waveform, got shape {y.shape}")
    y = _reflect_pad(y, pad)
    if center:
        y = _reflect_pad(y, n_fft // 2)

    # Explicit framing + ONE (B*F, n_fft) x (n_fft, 2*n_bins) matmul.
    # The earlier single-conv form (Cin=1, K=n_fft, stride=hop) could not
    # be tiled onto the MXU by XLA — it executed on the VPU and cost
    # ~20 ms fwd AND ~20 ms in the GAN step's mel cotangent for ~1 GFLOP
    # of math (PERF.md 5e). Framed-matmul runs the same numbers on the
    # MXU; the framing itself is strided slicing (n_fft % hop == 0, the
    # loss-mel case) or a static gather (general hop).
    y = y.astype(jnp.float32)
    b, t = y.shape
    f = 1 + (t - n_fft) // hop_size
    if n_fft % hop_size == 0:
        r = n_fft // hop_size
        s = t // hop_size
        blocks = y[:, : s * hop_size].reshape(b, s, hop_size)
        frames = jnp.concatenate([blocks[:, i : i + f] for i in range(r)],
                                 axis=-1)             # (B, F, n_fft)
    else:
        idx = (np.arange(f)[:, None] * hop_size
               + np.arange(n_fft)[None, :])           # static (F, n_fft)
        frames = y[:, idx]
    kernel = jnp.asarray(_stft_kernel(n_fft, win_size))[:, 0, :]
    spec = jnp.einsum(
        "bfw,wo->bfo", frames, kernel,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                 # (B, n_frames, 2*n_bins)
    n_bins = n_fft // 2 + 1
    re, im = spec[..., :n_bins], spec[..., n_bins:]
    return jnp.sqrt(re * re + im * im + magnitude_eps)


def log_compress(x: jnp.ndarray, clip_val: float = 1e-5, C: float = 1.0) -> jnp.ndarray:
    """Dynamic-range compression `log(clamp(x, min=clip_val) * C)`
    (reference utils/vocoder/dataset.py:88-89 and utils/aligner/audio.py:46)."""
    return jnp.log(jnp.maximum(x, clip_val) * C)


def mel_spectrogram(
    y: jnp.ndarray,
    *,
    n_fft: int = 1024,
    num_mels: int = 80,
    sampling_rate: int = 16_000,
    hop_size: int = 256,
    win_size: int = 1024,
    fmin: float = 0.0,
    fmax: float | None = None,
    center: bool = False,
) -> jnp.ndarray:
    """Loss mel-spectrogram matching the reference `mel_spectrogram`
    (utils/vocoder/dataset.py:43-69): manual (n_fft-hop)/2 reflect pad,
    center=False, |.|+1e-9, mel matmul, log-compress at 1e-5.

    Returns (B, n_frames, num_mels) — frame-major (TPU-friendly; the
    reference returns (B, num_mels, n_frames), transpose if comparing).
    """
    mag = stft_magnitude(
        y, n_fft, hop_size, win_size,
        center=center, pad=0 if center else (n_fft - hop_size) // 2,
    )
    fb = jnp.asarray(
        mellib.mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax)
    )                                                 # (n_mels, n_bins)
    mel = jnp.einsum(
        "bfk,mk->bfm", mag, fb, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return log_compress(mel)


def librosa_mel_spectrogram(
    y: jnp.ndarray,
    *,
    sample_rate: int = 16_000,
    n_fft: int = 1024,
    n_mels: int = 80,
    hop_length: int = 320,
    win_length: int = 1024,
    fmin: float = 0.0,
    fmax: float = 8000.0,
    power: float = 1.0,
    log: bool = True,
) -> jnp.ndarray:
    """Aligner feature mel matching `librosa.feature.melspectrogram` +
    log-clip normalize (reference utils/aligner/audio.py:30-47): centered
    STFT, |.|^power, slaney mel, log(clip(., 1e-5)).

    Returns (B, n_frames, n_mels); n_frames = 1 + T//hop_length.
    """
    mag = stft_magnitude(
        y, n_fft, hop_length, win_length, center=True, magnitude_eps=0.0
    )
    if power != 1.0:
        mag = mag ** power
    fb = jnp.asarray(mellib.mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("bfk,mk->bfm", mag, fb, preferred_element_type=jnp.float32)
    return log_compress(mel) if log else mel


def num_frames(t: int, n_fft: int, hop_size: int, *, center: bool = False,
               pad: int = 0) -> int:
    """Static frame count for a given waveform length (shape planning)."""
    t = t + 2 * pad + (n_fft if center else 0)
    return 1 + (t - n_fft) // hop_size
