"""Fold-with-overlap audio-quality instrumentation.

The batched WaveRNN generation splits a long utterance into overlapping fold
windows, decodes them as a batch, and equal-power-crossfades them back (ref:
fatchord_version.py:290-404). Smaller windows are faster on TPU (time ∝
window length, folds are free batch parallelism) but add more joins per
second of audio. This module MEASURES the cost of those joins: greedy
(argmax) decoding is deterministic, so the difference between a batched
decode and the single-fold decode of the same conditioning isolates exactly
the fold warmup + crossfade error.

Used by tests/test_generation_quality.py (small overfitted model) and
bench_quality.py (production dims, BENCHMARKS.md quality column).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _argmax_decode_unbatched(variables, d, mels_up, aux) -> np.ndarray:
    from rtvc_tpu.models.wavernn import generate_core

    return np.asarray(
        generate_core(variables, d, mels_up, aux, jax.random.PRNGKey(0),
                      argmax=True)
    )[0]


def _argmax_decode_batched(variables, d, mels_up, aux, target, overlap):
    from rtvc_tpu.models.wavernn import (
        fold_with_overlap,
        generate_core,
        xfade_and_unfold,
    )

    mf, num_folds = fold_with_overlap(mels_up, target, overlap)
    af, _ = fold_with_overlap(aux, target, overlap)
    samples = generate_core(variables, d, mf, af, jax.random.PRNGKey(0),
                            argmax=True)
    wav = np.asarray(xfade_and_unfold(samples, target, overlap))
    return wav, num_folds


def fold_fidelity(
    variables,
    d,
    mel: np.ndarray,
    configs: Sequence[Tuple[int, int]],
) -> List[Dict]:
    """Measure join artifacts of batched generation for each
    (target, overlap) config.

    mel: (feat_dims, n_frames) normalized conditioning. Returns one dict per
    config: rel_rms (total deviation vs the unbatched decode), join_rms /
    interior_rms (deviation concentrated at the crossfade joins vs between
    them) and num_folds.
    """
    from rtvc_tpu.models.wavernn import upsample_forward

    mels = jnp.asarray(mel[None], jnp.float32)
    mels = jnp.pad(mels, ((0, 0), (0, 0), (d.pad, d.pad)))
    mels_up, aux, _ = upsample_forward(
        variables["params"]["upsample"], variables["batch_stats"]["upsample"],
        d, mels, train=False,
    )
    ref = _argmax_decode_unbatched(variables, d, mels_up, aux)
    ref_rms = float(np.sqrt(np.mean(ref**2))) + 1e-12

    results = []
    for target, overlap in configs:
        wav, num_folds = _argmax_decode_batched(
            variables, d, mels_up, aux, target, overlap
        )
        n = min(len(wav), len(ref))
        results.append({
            "target": target,
            "overlap": overlap,
            "num_folds": int(num_folds),
            "aligned_rms": _aligned_rms(wav[:n], ref[:n], num_folds, target,
                                        overlap, ref_rms),
            "join_click_ratio": _join_click_ratio(wav[:n], num_folds, target,
                                                  overlap),
        })
    return results


def _aligned_rms(wav, ref, num_folds, target, overlap, ref_rms,
                 max_lag: int = 8) -> float:
    """Waveform fidelity modulo per-fold phase: an AR fold warming up from a
    zero state can lock onto the conditioned signal a couple of samples out
    of phase — inaudible after the crossfade, but fatal to a raw sample-wise
    comparison. Per inter-join segment, find the best alignment within
    ±max_lag samples and report the mean residual RMS relative to the
    reference signal RMS."""
    seg_rms = []
    for i in range(num_folds):
        s = i * (target + overlap) + overlap
        e = min(s + target - overlap, len(wav), len(ref))
        if e - s < 4 * max_lag:
            continue
        w = wav[s:e]
        best = np.inf
        for lag in range(-max_lag, max_lag + 1):
            rs, re = s + lag, e + lag
            if rs < 0 or re > len(ref):
                continue
            best = min(best, float(np.sqrt(np.mean((w - ref[rs:re]) ** 2))))
        if np.isfinite(best):
            seg_rms.append(best)
    return float(np.mean(seg_rms)) / ref_rms if seg_rms else 0.0


def _join_click_ratio(wav, num_folds, target, overlap) -> float:
    """Click detector on the batched output alone: mean absolute first
    difference inside the crossfade windows vs in the fold interiors. A
    clean join ≈ 1.0; a discontinuity (click) pushes it up."""
    n = len(wav)
    join_mask = np.zeros(n, bool)
    for i in range(1, num_folds):
        start = i * (target + overlap)
        join_mask[max(0, start - overlap): min(n, start + overlap)] = True
    d1 = np.abs(np.diff(wav))
    jm = join_mask[:-1]
    if not jm.any() or jm.all():
        return 1.0
    join = float(np.mean(d1[jm]))
    interior = float(np.mean(d1[~jm])) + 1e-12
    return join / interior


def mel_cepstral_distortion(
    wav_ref: np.ndarray,
    wav_gen: np.ndarray,
    sp,
    pp,
    n_coeffs: int = 13,
) -> float:
    """Mel-cepstral distortion in dB between two waveforms (frame-aligned,
    no DTW — callers compare a vocoded reconstruction against the exact
    audio whose mel conditioned it, so the frames line up by construction).

    Standard MCD: cepstra = DCT-II(ortho) of the NATURAL-LOG mel spectrum
    (our mels are dB = (20/ln 10)·ln amp, so divide by 8.686 first —
    computing the cepstra from dB and still applying the (10/ln 10)
    prefactor would inflate every number 8.686×), c1..c13 (c0 = loudness
    excluded), MCD = (10/ln 10)·√2·mean‖Δc‖ over frames whose REFERENCE
    frame carries speech energy. Two floors keep the number on the
    interpretable single-digit scale real MCDs live on: silent FRAMES are
    excluded (they sit on the min_level_db floor where cepstral distance
    measures only floor noise), and within active frames both spectra are
    clipped to a 40 dB dynamic range below the reference peak (bins
    between harmonics otherwise swing the full −100 dB floor and dominate
    the distance). Measured calibration on samples/p240 (BENCHMARKS.md
    round 4): Griffin-Lim reconstruction 9.0 dB (published GL MCDs are
    ~7–9), the 8-bit mu-law roundtrip (the RAW vocoder's quantization
    ceiling) 0.6 dB, white noise 65 dB. The tracked audio-quality number
    for BENCHMARKS.md (VERDICT r2 weak #6)."""
    from scipy.fft import dct

    from rtvc_tpu.ops.audio import melspectrogram

    n = min(len(wav_ref), len(wav_gen))
    raw_pp = pp.replace(signal_normalization=False)  # dB mels, unnormalized
    m_ref = np.asarray(melspectrogram(np.asarray(wav_ref[:n], np.float32),
                                      sp, raw_pp))
    m_gen = np.asarray(melspectrogram(np.asarray(wav_gen[:n], np.float32),
                                      sp, raw_pp))
    # voiced/active-frame gate: mean dB within 35 dB of the utterance peak
    frame_db = m_ref.mean(axis=0)
    active = frame_db > frame_db.max() - 35.0
    if not active.any():
        active = np.ones_like(active, dtype=bool)
    floor = float(m_ref.max()) - 40.0
    m_ref = np.maximum(m_ref, floor)
    m_gen = np.maximum(m_gen, floor)
    db_to_ln = np.log(10.0) / 20.0  # dB mel → ln-amplitude mel
    c_ref = dct(m_ref.T[active] * db_to_ln, type=2, norm="ortho",
                axis=1)[:, 1 : n_coeffs + 1]
    c_gen = dct(m_gen.T[active] * db_to_ln, type=2, norm="ortho",
                axis=1)[:, 1 : n_coeffs + 1]
    dist = np.sqrt(np.sum((c_ref - c_gen) ** 2, axis=1))
    return float((10.0 / np.log(10.0)) * np.sqrt(2.0) * np.mean(dist))


def mel_l2_distance(wav_a: np.ndarray, wav_b: np.ndarray, sp, pp) -> float:
    """Mean per-frame L2 distance between normalized mels of two waveforms
    (the sampled-decode divergence metric — raw AR waveforms decorrelate
    after a single label flip, mels capture perceptual closeness)."""
    from rtvc_tpu.ops.audio import melspectrogram

    n = min(len(wav_a), len(wav_b))
    m_a = np.asarray(melspectrogram(np.asarray(wav_a[:n], np.float32), sp, pp))
    m_b = np.asarray(melspectrogram(np.asarray(wav_b[:n], np.float32), sp, pp))
    return float(np.mean(np.linalg.norm(m_a - m_b, axis=0)))
