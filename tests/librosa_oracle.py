"""Test-only numeric oracle of librosa's published STFT/mel algorithms.

librosa is absent from this image, but the reference's entire DSP contract
is "whatever librosa computes" (ref: synthesizer/audio.py:117-124 librosa.stft;
synthesizer/audio.py:169-172 librosa.filters.mel; encoder/audio.py:63-75
librosa.feature.melspectrogram). This module is a deliberate, independent
float64 transcription of those algorithms as published — scalar loops, no
reuse of rtvc_tpu code — so tests/test_librosa_oracle.py can close the
BASELINE.md "mel bitwise-comparable" gate against the thing it names.

Sources (algorithms, not code): librosa 0.9/0.10 documentation for
``stft(center=True, pad_mode='reflect', window='hann')``,
``filters.mel(htk=False, norm='slaney')`` (the Slaney Auditory-Toolbox mel
scale: linear below 1 kHz at 200/3 Hz per mel, logarithmic above with
log(6.4)/27 per mel, triangular filters area-normalized by 2/bandwidth),
and ``feature.melspectrogram(power=2.0)``. The Hann window comes from
``scipy.signal.get_window('hann', n, fftbins=True)`` — the same call
librosa itself makes.
"""
from __future__ import annotations

import math

import numpy as np
import scipy.signal


def oracle_stft(y: np.ndarray, n_fft: int, hop_length: int,
                win_length: int) -> np.ndarray:
    """Complex STFT, shape (1 + n_fft//2, n_frames): centered frames,
    reflect padding, periodic Hann of win_length zero-padded to n_fft."""
    y = np.asarray(y, dtype=np.float64)
    window = scipy.signal.get_window("hann", win_length, fftbins=True)
    # pad_center: window centered in an n_fft buffer
    lpad = (n_fft - win_length) // 2
    w = np.zeros(n_fft, dtype=np.float64)
    w[lpad : lpad + win_length] = window

    pad = n_fft // 2
    y = np.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop_length
    out = np.empty((1 + n_fft // 2, n_frames), dtype=np.complex128)
    for t in range(n_frames):
        frame = y[t * hop_length : t * hop_length + n_fft]
        out[:, t] = np.fft.rfft(frame * w)
    return out


def _hz_to_mel_slaney(f: float) -> float:
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    if f < min_log_hz:
        return f / f_sp
    return (min_log_hz / f_sp) + math.log(f / min_log_hz) / (math.log(6.4) / 27.0)


def _mel_to_hz_slaney(m: float) -> float:
    f_sp = 200.0 / 3.0
    min_log_mel = 1000.0 / f_sp
    if m < min_log_mel:
        return m * f_sp
    return 1000.0 * math.exp((math.log(6.4) / 27.0) * (m - min_log_mel))


def oracle_mel_filters(sr: int, n_fft: int, n_mels: int, fmin: float,
                       fmax: float) -> np.ndarray:
    """librosa.filters.mel(htk=False, norm='slaney'), loop transcription."""
    n_bins = 1 + n_fft // 2
    fftfreqs = np.array([i * sr / n_fft for i in range(n_bins)])

    mel_lo, mel_hi = _hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax)
    mel_pts = [
        _mel_to_hz_slaney(mel_lo + (mel_hi - mel_lo) * i / (n_mels + 1))
        for i in range(n_mels + 2)
    ]

    weights = np.zeros((n_mels, n_bins), dtype=np.float64)
    for m in range(n_mels):
        f_left, f_center, f_right = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        for k in range(n_bins):
            f = fftfreqs[k]
            lower = (f - f_left) / (f_center - f_left)
            upper = (f_right - f) / (f_right - f_center)
            weights[m, k] = max(0.0, min(lower, upper))
        # Slaney area normalization: 2 / (f_right - f_left)
        weights[m] *= 2.0 / (f_right - f_left)
    return weights


def oracle_synth_mel(wav: np.ndarray, sr: int, n_fft: int, hop_length: int,
                     win_length: int, n_mels: int, fmin: float, fmax: float,
                     preemphasis_k: float, ref_level_db: float,
                     min_level_db: float, max_abs_value: float,
                     symmetric: bool = True, clip: bool = True) -> np.ndarray:
    """The reference's full synthesizer mel ladder on top of the librosa
    oracle: preemphasis → |STFT| → mel → amp_to_db → -ref → normalize
    (ref: synthesizer/audio.py:60-66, 174-194)."""
    wav = np.asarray(wav, dtype=np.float64)
    emph = scipy.signal.lfilter([1.0, -preemphasis_k], [1.0], wav)
    mag = np.abs(oracle_stft(emph, n_fft, hop_length, win_length))
    mel = oracle_mel_filters(sr, n_fft, n_mels, fmin, fmax) @ mag
    min_level = math.exp(min_level_db / 20.0 * math.log(10.0))
    S = 20.0 * np.log10(np.maximum(min_level, mel)) - ref_level_db
    scaled = (S - min_level_db) / (-min_level_db)
    if symmetric:
        out = (2.0 * max_abs_value) * scaled - max_abs_value
        lo, hi = -max_abs_value, max_abs_value
    else:
        out = max_abs_value * scaled
        lo, hi = 0.0, max_abs_value
    if clip:
        out = np.clip(out, lo, hi)
    return out


def oracle_encoder_mel(wav: np.ndarray, sr: int, n_fft: int,
                       hop_length: int, n_mels: int) -> np.ndarray:
    """librosa.feature.melspectrogram defaults as the encoder frontend uses
    them (power=2, win_length=n_fft, fmin=0, fmax=sr/2), transposed to
    (T, n_mels) like encoder/audio.py:63-75."""
    mag = np.abs(oracle_stft(np.asarray(wav, np.float64), n_fft, hop_length,
                             n_fft))
    mel = oracle_mel_filters(sr, n_fft, n_mels, 0.0, sr / 2.0) @ (mag ** 2)
    return mel.T
