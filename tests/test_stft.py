"""STFT/mel parity vs torch.stft (the exact primitive the reference uses in
utils/vocoder/dataset.py:43-69) and filterbank property checks."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from parrot_tts_tpu.ops import mel as mellib
from parrot_tts_tpu.ops import stft as stftlib


def torch_reference_mel(y_np, n_fft=1024, num_mels=80, sr=16000, hop=256,
                        win=1024, fmin=0.0, fmax=None):
    """The reference mel pipeline rebuilt on torch primitives + our numpy
    filterbank (librosa itself is unavailable in this image)."""
    y = torch.from_numpy(y_np).float()
    window = torch.hann_window(win)
    y = torch.nn.functional.pad(
        y.unsqueeze(1), (int((n_fft - hop) / 2), int((n_fft - hop) / 2)),
        mode="reflect",
    ).squeeze(1)
    spec = torch.stft(y, n_fft, hop_length=hop, win_length=win, window=window,
                      center=False, normalized=False, onesided=True,
                      return_complex=True)
    spec = torch.sqrt(spec.real.pow(2) + spec.imag.pow(2) + 1e-9)
    fb = torch.from_numpy(mellib.mel_filterbank(sr, n_fft, num_mels, fmin, fmax))
    mel = torch.matmul(fb, spec)
    return torch.log(torch.clamp(mel, min=1e-5)).numpy()  # (B, M, F)


def test_hann_window_matches_torch():
    ours = mellib.hann_window(1024)
    theirs = torch.hann_window(1024).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_stft_magnitude_matches_torch(rng):
    y = rng.standard_normal((2, 8960)).astype(np.float32) * 0.3
    ours = np.asarray(stftlib.stft_magnitude(jnp.asarray(y), 1024, 256, 1024,
                                             pad=(1024 - 256) // 2))
    yt = torch.nn.functional.pad(
        torch.from_numpy(y).unsqueeze(1), (384, 384), mode="reflect"
    ).squeeze(1)
    spec = torch.stft(yt, 1024, hop_length=256, win_length=1024,
                      window=torch.hann_window(1024), center=False,
                      onesided=True, return_complex=True)
    theirs = torch.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9).numpy()
    assert ours.shape == (2, theirs.shape[2], 513)
    np.testing.assert_allclose(ours, np.transpose(theirs, (0, 2, 1)),
                               atol=2e-3, rtol=1e-4)


def test_mel_spectrogram_matches_reference_pipeline(rng):
    y = (rng.standard_normal((3, 8960)) * 0.2).astype(np.float32)
    ours = np.asarray(stftlib.mel_spectrogram(jnp.asarray(y)))  # (B,F,M)
    theirs = torch_reference_mel(y)                              # (B,M,F)
    assert ours.shape == (3, 35, 80)
    np.testing.assert_allclose(ours, np.transpose(theirs, (0, 2, 1)),
                               atol=5e-4, rtol=1e-4)


def test_librosa_mel_frame_count(rng):
    # librosa center=True: n_frames = 1 + T//hop
    y = (rng.standard_normal((1, 16000)) * 0.2).astype(np.float32)
    m = stftlib.librosa_mel_spectrogram(jnp.asarray(y), hop_length=320)
    assert m.shape == (1, 1 + 16000 // 320, 80)


def test_mel_filterbank_properties():
    fb = mellib.mel_filterbank(16000, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has support, and supports move monotonically upward
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    assert fb.sum(axis=1).min() > 0
    # Slaney normalization: each triangle integrates to ~1 over Hz
    bin_hz = 16000 / 2 / 512
    areas = fb.sum(axis=1) * bin_hz
    np.testing.assert_allclose(areas[5:-5], 1.0, rtol=0.2)


def test_mel_scale_roundtrip():
    f = np.array([0.0, 500.0, 1000.0, 4000.0, 8000.0])
    np.testing.assert_allclose(mellib.mel_to_hz(mellib.hz_to_mel(f)), f,
                               rtol=1e-10)


def test_num_frames_helper():
    assert stftlib.num_frames(8960, 1024, 256, pad=384) == 35
    assert stftlib.num_frames(16000, 1024, 320, center=True) == 51
