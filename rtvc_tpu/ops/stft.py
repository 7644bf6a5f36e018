"""STFT / ISTFT as jitted XLA graphs, numerically matching librosa semantics.

The reference computes all spectrograms with ``librosa.stft`` (ref:
synthesizer/audio.py:117-124, vocoder/audio.py:86-87, encoder/audio.py:63-75):
centered frames, reflect padding, periodic Hann window of ``win_length``
zero-padded symmetrically to ``n_fft``. Those exact semantics are reproduced
here in pure JAX so spectrograms are bitwise-comparable (up to float32
accumulation order).

TPU notes: framing is a single gather (static shapes), the windowed frames go
through one batched ``rfft``; everything fuses under jit. The mel projection
downstream is a plain matmul that XLA places on the MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def hann_window(win_size: int, n_fft: int) -> np.ndarray:
    """Periodic Hann window of ``win_size``, centered in an ``n_fft`` buffer.

    Matches ``librosa.filters.get_window('hann', win, fftbins=True)`` +
    ``util.pad_center``.
    """
    n = np.arange(win_size, dtype=np.float64)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)
    lpad = (n_fft - win_size) // 2
    padded = np.zeros(n_fft, dtype=np.float64)
    padded[lpad : lpad + win_size] = win
    return padded.astype(np.float32)


def num_frames(n_samples: int, n_fft: int, hop_size: int) -> int:
    """Frame count for a centered STFT (librosa: 1 + n_samples // hop)."""
    return 1 + n_samples // hop_size


def frame_signal(y: jax.Array, n_fft: int, hop_size: int) -> jax.Array:
    """Centered, reflect-padded framing → (n_frames, n_fft)."""
    pad = n_fft // 2
    y = jnp.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + (y.shape[0] - n_fft) // hop_size
    idx = (
        jnp.arange(n_frames)[:, None] * hop_size + jnp.arange(n_fft)[None, :]
    )
    return y[idx]


def stft(
    y: jax.Array,
    n_fft: int,
    hop_size: int,
    win_size: int,
) -> jax.Array:
    """Complex STFT, shape ``(1 + n_fft // 2, n_frames)`` (librosa orientation)."""
    frames = frame_signal(y, n_fft, hop_size)
    window = jnp.asarray(hann_window(win_size, n_fft))
    spec = jnp.fft.rfft(frames * window[None, :], n=n_fft, axis=-1)
    return spec.T


def stft_magnitude(y: jax.Array, n_fft: int, hop_size: int, win_size: int) -> jax.Array:
    return jnp.abs(stft(y, n_fft, hop_size, win_size))


def istft(
    spec: jax.Array,
    n_fft: int,
    hop_size: int,
    win_size: int,
    length: int | None = None,
) -> jax.Array:
    """Inverse STFT with windowed overlap-add + squared-window normalization.

    Matches ``librosa.istft`` (centered): output trimmed by ``n_fft // 2`` on
    both ends, samples divided by the overlap-added squared window.
    """
    spec = spec.T  # (n_frames, bins)
    n_frames = spec.shape[0]
    window = jnp.asarray(hann_window(win_size, n_fft))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window[None, :]

    total = n_fft + hop_size * (n_frames - 1)
    idx = jnp.arange(n_frames)[:, None] * hop_size + jnp.arange(n_fft)[None, :]
    y = jnp.zeros(total, dtype=frames.dtype).at[idx.reshape(-1)].add(frames.reshape(-1))

    # Squared-window envelope for COLA normalization (host-computed constant).
    wsq = jnp.zeros(total, dtype=frames.dtype).at[idx.reshape(-1)].add(
        jnp.broadcast_to(window**2, (n_frames, n_fft)).reshape(-1)
    )
    y = y / jnp.maximum(wsq, 1e-10)

    pad = n_fft // 2
    y = y[pad : total - pad]
    if length is not None:
        y = y[:length]
    return y
