"""F0 (pitch) estimation for alignment features.

The reference uses pyworld's DIO (ref: synthesizer/preprocess.py:372-374),
which is not available here. This is an independent normalized-autocorrelation
tracker (NCCF, the RAPT/YIN family): per hop-aligned frame, the lag of the
autocorrelation peak in the 60–600 Hz band gives F0; frames with weak
periodicity or low energy are marked unvoiced (0.0), matching DIO's contract
of one F0 value per mel frame with 0 for unvoiced.
"""
from __future__ import annotations

import numpy as np


def estimate_f0(
    wav: np.ndarray,
    sample_rate: int,
    hop: int,
    fmin: float = 60.0,
    fmax: float = 600.0,
    frame_ms: float = 40.0,
    voicing_threshold: float = 0.3,
) -> np.ndarray:
    """Waveform → per-frame F0 in Hz (0 where unvoiced), one value per hop.

    Matches pyworld.dio's framing convention (frame_period = hop/sr·1000 →
    ~len(wav)//hop + 1 frames).
    """
    wav = np.asarray(wav, dtype=np.float64)
    frame_len = int(sample_rate * frame_ms / 1000)
    lag_min = max(int(sample_rate / fmax), 2)
    lag_max = min(int(sample_rate / fmin), frame_len - 1)
    n_frames = len(wav) // hop + 1
    f0 = np.zeros(n_frames, dtype=np.float32)

    # global energy floor: quiet frames are unvoiced
    rms_floor = 0.01 * np.sqrt(np.mean(wav**2) + 1e-12)

    padded = np.pad(wav, (frame_len // 2, frame_len))
    for t in range(n_frames):
        frame = padded[t * hop : t * hop + frame_len]
        frame = frame - frame.mean()
        rms = np.sqrt(np.mean(frame**2))
        if rms < rms_floor:
            continue
        # normalized autocorrelation via FFT
        n_fft = 1 << int(np.ceil(np.log2(2 * frame_len)))
        spec = np.fft.rfft(frame, n_fft)
        ac = np.fft.irfft(spec * np.conj(spec))[: lag_max + 1]
        if ac[0] <= 0:
            continue
        ac = ac / ac[0]
        seg = ac[lag_min : lag_max + 1]
        peak = int(np.argmax(seg))
        if seg[peak] < voicing_threshold:
            continue
        lag = peak + lag_min
        # parabolic interpolation around the peak for sub-sample precision
        if 0 < peak < len(seg) - 1:
            y0, y1, y2 = seg[peak - 1], seg[peak], seg[peak + 1]
            denom = y0 - 2 * y1 + y2
            if abs(denom) > 1e-12:
                lag = lag + 0.5 * (y0 - y2) / denom
        f0[t] = sample_rate / lag
    return f0
