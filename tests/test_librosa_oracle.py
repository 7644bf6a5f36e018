"""Close the "mel bitwise-comparable vs librosa" gate: rtvc_tpu's STFT/mel
pipeline vs an independent float64 transcription of librosa's published
algorithms (tests/librosa_oracle.py).

The reference computes every spectrogram through librosa
(synthesizer/audio.py:60-75, encoder/audio.py:63-75); librosa itself cannot
run in this image, so this is the strongest honest check available — and a
stronger one numerically, since the oracle runs in float64."""
import numpy as np
import pytest

import jax.numpy as jnp

from librosa_oracle import (
    oracle_encoder_mel,
    oracle_mel_filters,
    oracle_stft,
    oracle_synth_mel,
)
from rtvc_tpu.config.signal import PreprocessingParams, SignalParams
from rtvc_tpu.ops import mel as mel_ops
from rtvc_tpu.ops import stft as stft_ops
from rtvc_tpu.ops.audio import encoder_mel_spectrogram, melspectrogram

sp = SignalParams()   # production point: 16 kHz, n_fft 1024, hop 200, win 800
pp = PreprocessingParams()


def speech_like(n: int, seed: int = 0, sr: int = 16000) -> np.ndarray:
    """Deterministic speech-band test signal: gliding harmonics + shaped
    noise, amplitude-modulated (exercises every mel band and the dB floor)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    f0 = 120 + 60 * np.sin(2 * np.pi * 1.3 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    sig = sum((0.5 ** k) * np.sin((k + 1) * phase) for k in range(5))
    noise = rng.standard_normal(n)
    # crude high-shelf shaping for fricative-ish energy
    noise = np.convolve(noise, [0.6, -0.4, 0.2], mode="same")
    env = 0.4 + 0.6 * (np.sin(2 * np.pi * 2.7 * t) > 0)
    wav = (0.6 * sig + 0.15 * noise) * env
    return (0.8 * wav / np.max(np.abs(wav))).astype(np.float32)


class TestSTFTMatchesLibrosaOracle:
    def test_production_point(self):
        wav = speech_like(16000)
        ours = np.asarray(
            stft_ops.stft(jnp.asarray(wav), sp.n_fft, sp.hop_size, sp.win_size)
        )
        ref = oracle_stft(wav, sp.n_fft, sp.hop_size, sp.win_size)
        assert ours.shape == ref.shape == (513, 1 + 16000 // 200)
        # f32 vs f64: relative to the spectral frame scale
        scale = np.abs(ref).max()
        np.testing.assert_allclose(np.abs(ours), np.abs(ref),
                                   atol=1e-5 * scale, rtol=0)

    @pytest.mark.parametrize("n_fft,hop,win", [(400, 160, 400), (2048, 300, 1200)])
    def test_other_geometries(self, n_fft, hop, win):
        wav = speech_like(8000, seed=3)
        ours = np.asarray(stft_ops.stft(jnp.asarray(wav), n_fft, hop, win))
        ref = oracle_stft(wav, n_fft, hop, win)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(np.abs(ours), np.abs(ref),
                                   atol=1e-5 * scale, rtol=0)


class TestMelFilterbankMatchesLibrosaOracle:
    def test_production_filterbank(self):
        ours = mel_ops.mel_filterbank(sp.sample_rate, sp.n_fft, sp.num_mels,
                                      sp.fmin, sp.fmax)
        ref = oracle_mel_filters(sp.sample_rate, sp.n_fft, sp.num_mels,
                                 sp.fmin, sp.fmax)
        assert ours.shape == ref.shape == (80, 513)
        np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=0)
        # every filter must have support (a classic off-by-one failure mode)
        assert (ref.sum(axis=1) > 0).all()

    def test_encoder_filterbank(self):
        ours = mel_ops.mel_filterbank(16000, 400, 40, 0.0, 8000.0)
        ref = oracle_mel_filters(16000, 400, 40, 0.0, 8000.0)
        np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=0)


class TestFullMelLadderMatchesLibrosaOracle:
    def test_synthesizer_mel_production_point(self):
        """wav → normalized 80-mel at the exact production settings; the
        BASELINE.md gate (≤1e-5 on the [-4, 4] normalized scale)."""
        wav = speech_like(2 * 16000)
        ours = np.asarray(melspectrogram(jnp.asarray(wav), sp, pp))
        ref = oracle_synth_mel(
            wav, sp.sample_rate, sp.n_fft, sp.hop_size, sp.win_size,
            sp.num_mels, sp.fmin, sp.fmax, sp.preemphasis, sp.ref_level_db,
            sp.min_level_db, sp.max_abs_value,
            symmetric=pp.symmetric_mels,
            clip=pp.allow_clipping_in_normalization,
        )
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=0)

    def test_encoder_mel_production_point(self):
        """40-mel power spectrogram, the speaker-encoder frontend
        (25 ms / 10 ms fbanks)."""
        wav = speech_like(16000, seed=7)
        ours = np.asarray(encoder_mel_spectrogram(
            jnp.asarray(wav), 16000, 400, 160, 40
        ))
        ref = oracle_encoder_mel(wav, 16000, 400, 160, 40)
        assert ours.shape == ref.shape
        scale = ref.max()
        np.testing.assert_allclose(ours, ref, atol=1e-5 * scale, rtol=0)
