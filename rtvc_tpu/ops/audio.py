"""Audio DSP ops: preemphasis, dB scaling, mel spectrograms, Griffin-Lim, mu-law.

Jitted-XLA equivalents of the reference's numpy/scipy DSP:
  * synthesizer path — preemphasis → STFT → mel → dB → [-4, 4] normalize and
    its Griffin-Lim inverse (ref: synthesizer/audio.py:22-116, 154-207);
  * vocoder path — mu-law / bit-label codecs, pre/de-emphasis
    (ref: vocoder/audio.py:9-16, 88-107);
  * encoder path — 40-mel power spectrogram (ref: encoder/audio.py:63-75).

All functions are shape-polymorphic pure JAX (jit-compatible; static config
arguments) and operate on float32. First-order IIR recurrences (inverse
preemphasis / de-emphasis) use ``jax.lax.associative_scan`` so they run as
log-depth parallel scans on the VPU instead of length-N sequential loops.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from rtvc_tpu.config.signal import PreprocessingParams, SignalParams
from rtvc_tpu.ops import mel as mel_ops
from rtvc_tpu.ops import stft as stft_ops

# ---------------------------------------------------------------------------
# Pre-emphasis filters
# ---------------------------------------------------------------------------


def preemphasis(wav: jax.Array, k: float) -> jax.Array:
    """FIR y[n] = x[n] - k·x[n-1] (ref: synthesizer/audio.py:22-26)."""
    return jnp.concatenate([wav[:1], wav[1:] - k * wav[:-1]])


def _linear_recurrence(coeffs: jax.Array, inputs: jax.Array) -> jax.Array:
    """Solve y[n] = coeffs[n]·y[n-1] + inputs[n] with an associative scan."""

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    _, ys = jax.lax.associative_scan(combine, (coeffs, inputs))
    return ys


def inv_preemphasis(wav: jax.Array, k: float) -> jax.Array:
    """IIR y[n] = x[n] + k·y[n-1] (ref: synthesizer/audio.py:28-31)."""
    coeffs = jnp.full_like(wav, k)
    return _linear_recurrence(coeffs, wav)


# Vocoder-side aliases (ref: vocoder/audio.py:88-93)
def pre_emphasis(x: jax.Array, k: float) -> jax.Array:
    return preemphasis(x, k)


def de_emphasis(x: jax.Array, k: float) -> jax.Array:
    return inv_preemphasis(x, k)


# ---------------------------------------------------------------------------
# dB scaling and normalization
# ---------------------------------------------------------------------------


def amp_to_db(x: jax.Array, min_level_db: float) -> jax.Array:
    """20·log10(max(min_level, x)) (ref: synthesizer/audio.py:174-176)."""
    min_level = jnp.exp(min_level_db / 20.0 * jnp.log(10.0))
    return 20.0 * jnp.log10(jnp.maximum(min_level, x))


def db_to_amp(x: jax.Array) -> jax.Array:
    return jnp.power(10.0, x * 0.05)


def normalize_spectrogram(
    S: jax.Array, sp: SignalParams, pp: PreprocessingParams
) -> jax.Array:
    """dB → [-max_abs, max_abs] (symmetric) or [0, max_abs]
    (ref: synthesizer/audio.py:181-194)."""
    scaled = (S - sp.min_level_db) / (-sp.min_level_db)
    if pp.symmetric_mels:
        out = (2.0 * sp.max_abs_value) * scaled - sp.max_abs_value
        lo, hi = -sp.max_abs_value, sp.max_abs_value
    else:
        out = sp.max_abs_value * scaled
        lo, hi = 0.0, sp.max_abs_value
    if pp.allow_clipping_in_normalization:
        out = jnp.clip(out, lo, hi)
    return out


def denormalize_spectrogram(
    D: jax.Array, sp: SignalParams, pp: PreprocessingParams
) -> jax.Array:
    """Inverse of :func:`normalize_spectrogram` (ref: synthesizer/audio.py:196-207)."""
    if pp.symmetric_mels:
        if pp.allow_clipping_in_normalization:
            D = jnp.clip(D, -sp.max_abs_value, sp.max_abs_value)
        return (D + sp.max_abs_value) * (-sp.min_level_db) / (
            2.0 * sp.max_abs_value
        ) + sp.min_level_db
    if pp.allow_clipping_in_normalization:
        D = jnp.clip(D, 0.0, sp.max_abs_value)
    return D * (-sp.min_level_db) / sp.max_abs_value + sp.min_level_db


# ---------------------------------------------------------------------------
# Spectrograms (synthesizer path)
# ---------------------------------------------------------------------------


def _stft_mag(wav: jax.Array, sp: SignalParams) -> jax.Array:
    if sp.preemphasize:
        wav = preemphasis(wav, sp.preemphasis)
    return stft_ops.stft_magnitude(wav, sp.n_fft, sp.hop_size, sp.win_size)


@functools.partial(jax.jit, static_argnames=("sp", "pp"))
def melspectrogram(
    wav: jax.Array, sp: SignalParams, pp: PreprocessingParams
) -> jax.Array:
    """Waveform → normalized 80-mel spectrogram, shape (num_mels, T)
    (ref: synthesizer/audio.py:60-66)."""
    mag = _stft_mag(wav, sp)
    basis = jnp.asarray(
        mel_ops.mel_filterbank(sp.sample_rate, sp.n_fft, sp.num_mels, sp.fmin, sp.fmax)
    )
    S = amp_to_db(basis @ mag, sp.min_level_db) - sp.ref_level_db
    if pp.signal_normalization:
        return normalize_spectrogram(S, sp, pp)
    return S


@functools.partial(jax.jit, static_argnames=("sp", "pp"))
def linearspectrogram(
    wav: jax.Array, sp: SignalParams, pp: PreprocessingParams
) -> jax.Array:
    """Waveform → normalized linear spectrogram (ref: synthesizer/audio.py:52-58)."""
    mag = _stft_mag(wav, sp)
    S = amp_to_db(mag, sp.min_level_db) - sp.ref_level_db
    if pp.signal_normalization:
        return normalize_spectrogram(S, sp, pp)
    return S


# ---------------------------------------------------------------------------
# Griffin-Lim inversion
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("sp", "n_iters", "length"))
def griffin_lim(
    S: jax.Array,
    sp: SignalParams,
    n_iters: int,
    key: jax.Array,
    length: int | None = None,
) -> jax.Array:
    """Phase recovery by iterative STFT projection (ref: synthesizer/audio.py:106-116).

    The reference seeds angles from ``np.random.rand``; here the caller passes
    an explicit PRNG key (JAX RNG contract).
    """
    S = jnp.abs(S).astype(jnp.complex64)
    angles = jnp.exp(
        2j * jnp.pi * jax.random.uniform(key, S.shape, dtype=jnp.float32)
    ).astype(jnp.complex64)

    # Internal istft never trims to `length`: that keeps the istft→stft round
    # trip at exactly S.shape[1] frames, so every loop iteration is one static
    # shape. The caller-requested trim happens once at the end.
    def _istft(spec):
        return stft_ops.istft(spec, sp.n_fft, sp.hop_size, sp.win_size)

    def _stft(y):
        return stft_ops.stft(y, sp.n_fft, sp.hop_size, sp.win_size)

    y = _istft(S * angles)

    def body(_, y):
        spec = _stft(y)
        ang = spec / jnp.maximum(jnp.abs(spec), 1e-16)
        return _istft(S * ang)

    y = jax.lax.fori_loop(0, n_iters, body, y)
    if length is not None:
        y = y[:length]
    return y


def fast_griffin_lim(
    S: jax.Array,
    sp: SignalParams,
    n_iters: int,
    key: jax.Array,
    length: int | None = None,
    momentum: float = 0.99,
) -> jax.Array:
    """Momentum-accelerated Griffin-Lim (FGLA, Perraudin et al. 2013).

    Fills the role of the reference's optional ``lws`` phase-reconstruction
    path (ref: synthesizer/audio.py:77-95 — the lws package is a fast
    phase-aware alternative to plain Griffin-Lim; it does not ship in this
    image, and FGLA reaches comparable spectral convergence in a fraction
    of plain GL's iterations while staying one jittable fori_loop).
    """
    S = jnp.abs(S).astype(jnp.complex64)
    angles = jnp.exp(
        2j * jnp.pi * jax.random.uniform(key, S.shape, dtype=jnp.float32)
    ).astype(jnp.complex64)

    def _istft(spec):
        return stft_ops.istft(spec, sp.n_fft, sp.hop_size, sp.win_size)

    def _stft(y):
        return stft_ops.stft(y, sp.n_fft, sp.hop_size, sp.win_size)

    c0 = S * angles
    t0 = c0

    def body(_, carry):
        c, t_prev = carry
        spec = _stft(_istft(c))
        ang = spec / jnp.maximum(jnp.abs(spec), 1e-16)
        t = S * ang
        c = t + momentum * (t - t_prev)
        return (c, t)

    _, t = jax.lax.fori_loop(0, n_iters, body, (c0, t0))
    y = _istft(t)
    if length is not None:
        y = y[:length]
    return y


@functools.partial(jax.jit, static_argnames=("sp", "pp", "length"))
def inv_mel_spectrogram(
    mel: jax.Array,
    sp: SignalParams,
    pp: PreprocessingParams,
    key: jax.Array,
    length: int | None = None,
) -> jax.Array:
    """Normalized mel → waveform via pinv(mel basis) + Griffin-Lim
    (ref: synthesizer/audio.py:85-100)."""
    D = denormalize_spectrogram(mel, sp, pp) if pp.signal_normalization else mel
    amp = db_to_amp(D + sp.ref_level_db)
    inv_basis = jnp.asarray(
        mel_ops.inv_mel_filterbank(
            sp.sample_rate, sp.n_fft, sp.num_mels, sp.fmin, sp.fmax
        )
    )
    S = jnp.maximum(1e-10, inv_basis @ amp)
    recon = fast_griffin_lim if pp.use_lws else griffin_lim
    wav = recon(S**pp.power, sp, pp.griffin_lim_iters, key, length=length)
    if sp.preemphasize:
        wav = inv_preemphasis(wav, sp.preemphasis)
    return wav


@functools.partial(jax.jit, static_argnames=("sp", "pp", "length"))
def inv_linear_spectrogram(
    linear: jax.Array,
    sp: SignalParams,
    pp: PreprocessingParams,
    key: jax.Array,
    length: int | None = None,
) -> jax.Array:
    """Normalized linear spectrogram → waveform (ref: synthesizer/audio.py:68-83)."""
    D = denormalize_spectrogram(linear, sp, pp) if pp.signal_normalization else linear
    S = db_to_amp(D + sp.ref_level_db)
    recon = fast_griffin_lim if pp.use_lws else griffin_lim
    wav = recon(S**pp.power, sp, pp.griffin_lim_iters, key, length=length)
    if sp.preemphasize:
        wav = inv_preemphasis(wav, sp.preemphasis)
    return wav


# ---------------------------------------------------------------------------
# Encoder-path mel (40-channel power spectrogram)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("sample_rate", "n_fft", "hop_size", "n_mels")
)
def encoder_mel_spectrogram(
    wav: jax.Array,
    sample_rate: int,
    n_fft: int,
    hop_size: int,
    n_mels: int,
) -> jax.Array:
    """Power (|S|²) mel spectrogram, shape (T, n_mels): the speaker-encoder
    frontend (ref: encoder/audio.py:63-75 — librosa.feature.melspectrogram
    defaults: power=2, win_length=n_fft, fmin=0, fmax=sr/2)."""
    mag = stft_ops.stft_magnitude(wav, n_fft, hop_size, n_fft)
    basis = jnp.asarray(
        mel_ops.mel_filterbank(sample_rate, n_fft, n_mels, 0.0, sample_rate / 2.0)
    )
    return (basis @ (mag**2)).T


# ---------------------------------------------------------------------------
# Mu-law / bit-label codecs (vocoder path)
# ---------------------------------------------------------------------------


def label_2_float(x: jax.Array, bits: int) -> jax.Array:
    """Integer label [0, 2^bits) → float [-1, 1] (ref: vocoder/audio.py:9-10)."""
    return 2.0 * x / (2.0**bits - 1.0) - 1.0


def float_2_label(x: jax.Array, bits: int) -> jax.Array:
    """Float [-1, 1] → label [0, 2^bits - 1] (ref: vocoder/audio.py:13-16)."""
    x = (x + 1.0) * (2.0**bits - 1.0) / 2.0
    return jnp.clip(x, 0.0, 2.0**bits - 1.0)


def encode_mu_law(x: jax.Array, mu: int) -> jax.Array:
    """Mu-law companding → integer labels (ref: vocoder/audio.py:96-99)."""
    m = mu - 1
    fx = jnp.sign(x) * jnp.log1p(m * jnp.abs(x)) / jnp.log1p(jnp.float32(m))
    return jnp.floor((fx + 1.0) / 2.0 * m + 0.5)


def decode_mu_law(y: jax.Array, mu: int, from_labels: bool = True) -> jax.Array:
    """Inverse mu-law (ref: vocoder/audio.py:102-107)."""
    if from_labels:
        import math

        y = label_2_float(y, int(math.log2(mu)))
    m = mu - 1
    return jnp.sign(y) / m * ((1.0 + m) ** jnp.abs(y) - 1.0)


def split_signal(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """16-bit int → (coarse, fine) bytes (ref: vocoder/audio.py:27-31)."""
    unsigned = x + 2**15
    return unsigned // 256, unsigned % 256


def combine_signal(coarse: jax.Array, fine: jax.Array) -> jax.Array:
    return coarse * 256 + fine - 2**15


def encode_16bits(x: jax.Array) -> jax.Array:
    return jnp.clip(x * 2**15, -(2**15), 2**15 - 1).astype(jnp.int16)


# ---------------------------------------------------------------------------
# Volume normalization (encoder path, host-friendly but jittable)
# ---------------------------------------------------------------------------


def normalize_volume(
    wav: jax.Array,
    target_dBFS: float,
    increase_only: bool = False,
    decrease_only: bool = False,
) -> jax.Array:
    """Scale to a target dBFS (ref: encoder/audio.py:123-129)."""
    if increase_only and decrease_only:
        raise ValueError("Both increase only and decrease only are set")
    dBFS_change = target_dBFS - 10.0 * jnp.log10(jnp.mean(wav**2))
    gain = 10.0 ** (dBFS_change / 20.0)
    if increase_only:
        gain = jnp.maximum(gain, 1.0)
    if decrease_only:
        gain = jnp.minimum(gain, 1.0)
    return wav * gain
