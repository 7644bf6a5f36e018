"""Pallas TPU kernel: fused mel-filterbank projection + dB + normalization.

The synthesizer mel pipeline ends with ``basis @ |STFT|`` followed by three
elementwise stages (amp→dB, ref-level shift, symmetric normalization — ref:
synthesizer/audio.py:60-66, 174-194). XLA fuses most of this already; this
kernel makes the fusion explicit and keeps the (80, 513) filterbank resident
in VMEM across all frame tiles, so each magnitude tile is read from HBM
exactly once and the mel output is written exactly once (one HBM round trip
for the whole stage).

Tiles: frames in blocks of 256 (8×128-friendly), bins padded to a lane
multiple; matmul runs on the MXU with fp32 accumulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rtvc_tpu.config.signal import PreprocessingParams, SignalParams
from rtvc_tpu.ops import mel as mel_ops

_FRAME_TILE = 256


def _kernel(mag_ref, basis_ref, out_ref, *, min_level_db, ref_level_db,
            max_abs_value, symmetric, clip):
    # mag tile: (TILE, n_bins_padded); basis: (n_bins_padded, n_mels_padded)
    mel = jnp.dot(mag_ref[:], basis_ref[:], preferred_element_type=jnp.float32)
    min_level = np.exp(min_level_db / 20.0 * np.log(10.0))
    db = 20.0 * jnp.log10(jnp.maximum(mel, min_level)) - ref_level_db
    scaled = (db - min_level_db) / (-min_level_db)
    if symmetric:
        out = 2.0 * max_abs_value * scaled - max_abs_value
        lo, hi = -max_abs_value, max_abs_value
    else:
        out = max_abs_value * scaled
        lo, hi = 0.0, max_abs_value
    if clip:
        out = jnp.clip(out, lo, hi)
    out_ref[:] = out


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("sp", "pp", "interpret"))
def mel_project_normalize(
    mag: jax.Array, sp: SignalParams, pp: PreprocessingParams,
    interpret: bool = False,
) -> jax.Array:
    """|STFT| magnitudes (n_bins, T) → normalized mel (num_mels, T), fused.

    Numerically identical to the reference chain
    ``_normalize(_amp_to_db(_linear_to_mel(mag)) - ref_level_db)``.
    """
    from jax.experimental import pallas as pl

    n_bins, T = mag.shape
    basis = mel_ops.mel_filterbank(
        sp.sample_rate, sp.n_fft, sp.num_mels, sp.fmin, sp.fmax
    )  # (n_mels, n_bins)

    bins_p = _round_up(n_bins, 128)
    mels_p = _round_up(sp.num_mels, 128)
    T_p = _round_up(T, _FRAME_TILE)

    mag_p = jnp.zeros((T_p, bins_p), jnp.float32)
    mag_p = mag_p.at[:T, :n_bins].set(mag.T)
    basis_p = jnp.zeros((bins_p, mels_p), jnp.float32)
    basis_p = basis_p.at[:n_bins, : sp.num_mels].set(jnp.asarray(basis).T)

    kernel = functools.partial(
        _kernel,
        min_level_db=sp.min_level_db,
        ref_level_db=sp.ref_level_db,
        max_abs_value=sp.max_abs_value,
        symmetric=pp.symmetric_mels,
        clip=pp.allow_clipping_in_normalization,
    )

    try:
        from jax.experimental.pallas import tpu as pltpu

        memory_space = pltpu.VMEM
    except ImportError:  # pragma: no cover
        memory_space = None

    out = pl.pallas_call(
        kernel,
        grid=(T_p // _FRAME_TILE,),
        in_specs=[
            pl.BlockSpec((_FRAME_TILE, bins_p), lambda i: (i, 0),
                         memory_space=memory_space),
            pl.BlockSpec((bins_p, mels_p), lambda i: (0, 0),
                         memory_space=memory_space),
        ],
        out_specs=pl.BlockSpec((_FRAME_TILE, mels_p), lambda i: (i, 0),
                               memory_space=memory_space),
        out_shape=jax.ShapeDtypeStruct((T_p, mels_p), jnp.float32),
        interpret=interpret,
    )(mag_p, basis_p)

    return out[:T, : sp.num_mels].T


def melspectrogram_pallas(
    wav: jax.Array, sp: SignalParams, pp: PreprocessingParams,
    interpret: bool = False,
) -> jax.Array:
    """Full waveform → mel using the fused kernel for the projection stage."""
    from rtvc_tpu.ops.audio import preemphasis
    from rtvc_tpu.ops.stft import stft_magnitude

    if sp.preemphasize:
        wav = preemphasis(wav, sp.preemphasis)
    mag = stft_magnitude(wav, sp.n_fft, sp.hop_size, sp.win_size)
    return mel_project_normalize(mag, sp, pp, interpret=interpret)
