"""DSP golden tests.

Strategy (SURVEY.md §4): the reference has no test suite; its de-facto parity
method is deterministic inputs through single ops compared against independent
implementations (ref: vocoder/libwavernn/convert.py:179-300). Here the oracles
are (a) torch.stft — which shares librosa's center/reflect/Hann semantics —
and (b) straight numpy re-derivations of the reference's formulas.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rtvc_tpu.config import preprocessing, sp
from rtvc_tpu.ops import audio as A
from rtvc_tpu.ops import mel as M
from rtvc_tpu.ops import stft as S
from rtvc_tpu.ops import vad as V


def _test_wave(n=16000, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    wav = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.3 * np.sin(2 * np.pi * 1760 * t)
        + 0.05 * rng.standard_normal(n)
    )
    return wav.astype(np.float32)


class TestSTFT:
    def test_matches_torch_stft(self):
        wav = _test_wave()
        ours = np.asarray(S.stft(jnp.asarray(wav), sp.n_fft, sp.hop_size, sp.win_size))
        theirs = torch.stft(
            torch.from_numpy(wav),
            n_fft=sp.n_fft,
            hop_length=sp.hop_size,
            win_length=sp.win_size,
            window=torch.hann_window(sp.win_size, periodic=True),
            center=True,
            pad_mode="reflect",
            return_complex=True,
        ).numpy()
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(np.abs(ours), np.abs(theirs), atol=2e-3, rtol=1e-4)

    def test_istft_roundtrip(self):
        wav = _test_wave(n=8000)
        spec = S.stft(jnp.asarray(wav), sp.n_fft, sp.hop_size, sp.win_size)
        recon = np.asarray(
            S.istft(spec, sp.n_fft, sp.hop_size, sp.win_size, length=len(wav))
        )
        # Perfect reconstruction away from the very edges (COLA).
        np.testing.assert_allclose(recon[400:-400], wav[400:-400], atol=1e-4)

    def test_frame_count(self):
        wav = _test_wave(n=4321)
        spec = S.stft(jnp.asarray(wav), sp.n_fft, sp.hop_size, sp.win_size)
        assert spec.shape == (1 + sp.n_fft // 2, 1 + 4321 // sp.hop_size)


class TestMelFilterbank:
    def test_slaney_scale_roundtrip(self):
        hz = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 8000.0])
        np.testing.assert_allclose(M.mel_to_hz(M.hz_to_mel(hz)), hz, rtol=1e-10)

    def test_linear_below_1khz(self):
        np.testing.assert_allclose(M.hz_to_mel(600.0), 600.0 / (200.0 / 3.0))

    def test_filterbank_shape_and_norm(self):
        fb = M.mel_filterbank(16000, 1024, 80, 40.0, 8000.0)
        assert fb.shape == (80, 513)
        # Every filter is nonnegative with nonzero mass.
        assert (fb >= 0).all()
        assert (fb.sum(axis=1) > 0).all()
        # Slaney normalization: peak of filter m ≈ 2/(width in Hz).
        mel_f = M.mel_frequencies(82, 40.0, 8000.0)
        enorm = 2.0 / (mel_f[2:] - mel_f[:-2])
        ratio = fb.max(axis=1) / enorm
        assert (ratio <= 1.0 + 1e-6).all()
        assert (ratio > 0.5).all()

    def test_filterbank_matches_naive_construction(self):
        """Independent per-bin triangular construction as oracle."""
        sr, n_fft, n_mels, fmin, fmax = 16000, 512, 20, 40.0, 7600.0
        fb = M.mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
        freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
        mel_f = M.mel_frequencies(n_mels + 2, fmin, fmax)
        naive = np.zeros_like(fb, dtype=np.float64)
        for m in range(n_mels):
            left, center, right = mel_f[m], mel_f[m + 1], mel_f[m + 2]
            for k, f in enumerate(freqs):
                if left < f < center:
                    naive[m, k] = (f - left) / (center - left)
                elif center <= f < right:
                    naive[m, k] = (right - f) / (right - center)
            naive[m] *= 2.0 / (right - left)
        np.testing.assert_allclose(fb, naive, atol=1e-6)


class TestSpectrograms:
    def test_melspectrogram_range_and_shape(self):
        wav = _test_wave()
        mel = np.asarray(A.melspectrogram(jnp.asarray(wav), sp, preprocessing))
        assert mel.shape == (sp.num_mels, 1 + len(wav) // sp.hop_size)
        assert mel.min() >= -sp.max_abs_value - 1e-5
        assert mel.max() <= sp.max_abs_value + 1e-5
        # Loud harmonic content must push some bins near the top of the range.
        assert mel.max() > 2.0

    def test_melspectrogram_matches_numpy_pipeline(self):
        """Re-derive the reference pipeline in numpy with torch.stft as the
        spectral oracle (ref: synthesizer/audio.py:60-66)."""
        wav = _test_wave()
        pre = np.concatenate([wav[:1], wav[1:] - sp.preemphasis * wav[:-1]])
        mag = np.abs(
            torch.stft(
                torch.from_numpy(pre),
                n_fft=sp.n_fft,
                hop_length=sp.hop_size,
                win_length=sp.win_size,
                window=torch.hann_window(sp.win_size, periodic=True),
                center=True,
                pad_mode="reflect",
                return_complex=True,
            ).numpy()
        )
        fb = M.mel_filterbank(sp.sample_rate, sp.n_fft, sp.num_mels, sp.fmin, sp.fmax)
        melspec = fb @ mag
        min_level = np.exp(sp.min_level_db / 20 * np.log(10))
        db = 20 * np.log10(np.maximum(min_level, melspec)) - sp.ref_level_db
        expected = np.clip(
            (2 * sp.max_abs_value) * ((db - sp.min_level_db) / (-sp.min_level_db))
            - sp.max_abs_value,
            -sp.max_abs_value,
            sp.max_abs_value,
        )
        ours = np.asarray(A.melspectrogram(jnp.asarray(wav), sp, preprocessing))
        np.testing.assert_allclose(ours, expected, atol=2e-3)

    def test_encoder_mel_shape(self):
        wav = _test_wave()
        frames = np.asarray(
            A.encoder_mel_spectrogram(jnp.asarray(wav), 16000, 400, 160, 40)
        )
        assert frames.shape == (1 + len(wav) // 160, 40)
        assert frames.min() >= 0.0  # power spectrogram

    def test_griffin_lim_reconstructs_tone(self):
        """GL from a mel of a pure tone must yield a waveform whose spectrum
        peaks at the same frequency."""
        sr = sp.sample_rate
        t = np.arange(sr) / sr
        wav = (0.8 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        mel = A.melspectrogram(jnp.asarray(wav), sp, preprocessing)
        out = np.asarray(
            A.inv_mel_spectrogram(
                mel, sp, preprocessing.replace(griffin_lim_iters=16),
                jax.random.PRNGKey(0),
            )
        )
        spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
        peak_hz = np.argmax(spec) * sr / len(out)
        assert abs(peak_hz - 440) < 15, peak_hz


class TestPreemphasis:
    def test_inverse_is_exact(self):
        wav = _test_wave(n=4000)
        pre = A.preemphasis(jnp.asarray(wav), 0.97)
        back = np.asarray(A.inv_preemphasis(pre, 0.97))
        np.testing.assert_allclose(back, wav, atol=1e-4)

    def test_matches_scipy_lfilter(self):
        from scipy.signal import lfilter

        wav = _test_wave(n=2000)
        ours = np.asarray(A.preemphasis(jnp.asarray(wav), 0.97))
        ref = lfilter([1, -0.97], [1], wav)
        np.testing.assert_allclose(ours, ref, atol=1e-6)
        ours_inv = np.asarray(A.inv_preemphasis(jnp.asarray(wav), 0.97))
        ref_inv = lfilter([1], [1, -0.97], wav)
        np.testing.assert_allclose(ours_inv, ref_inv, atol=1e-4)


class TestMuLaw:
    def test_roundtrip(self):
        x = jnp.asarray(np.linspace(-0.99, 0.99, 1001, dtype=np.float32))
        labels = A.encode_mu_law(x, 2**10)
        assert float(labels.min()) >= 0 and float(labels.max()) <= 2**10 - 1
        decoded = np.asarray(A.decode_mu_law(labels, 2**10, from_labels=True))
        # Bins are widest near ±1 with 10-bit mu-law: ~7e-3 quantization error.
        np.testing.assert_allclose(decoded, np.asarray(x), atol=1e-2)

    def test_matches_reference_formula(self):
        """Numpy re-derivation of ref vocoder/audio.py:96-107."""
        x = np.linspace(-1, 1, 501).astype(np.float32)
        mu = 2**10 - 1
        fx = np.sign(x) * np.log(1 + mu * np.abs(x)) / np.log(1 + mu)
        expected = np.floor((fx + 1) / 2 * mu + 0.5)
        ours = np.asarray(A.encode_mu_law(jnp.asarray(x), 2**10))
        np.testing.assert_allclose(ours, expected)

    def test_label_float_roundtrip(self):
        labels = jnp.arange(2**9, dtype=jnp.float32)
        floats = A.label_2_float(labels, 9)
        back = np.asarray(A.float_2_label(floats, 9))
        np.testing.assert_allclose(back, np.asarray(labels), atol=1e-3)

    def test_split_combine_signal(self):
        x = jnp.asarray(np.array([-32768, -1, 0, 1, 32767]))
        c, f = A.split_signal(x)
        np.testing.assert_array_equal(np.asarray(A.combine_signal(c, f)), np.asarray(x))


class TestNormalization:
    def test_normalize_denormalize_roundtrip(self):
        db = jnp.asarray(
            np.linspace(sp.min_level_db, 0.0, 200, dtype=np.float32)
        ).reshape(20, 10)
        norm = A.normalize_spectrogram(db, sp, preprocessing)
        back = np.asarray(A.denormalize_spectrogram(norm, sp, preprocessing))
        np.testing.assert_allclose(back, np.asarray(db), atol=1e-3)

    def test_volume_normalization(self):
        wav = jnp.asarray(_test_wave()) * 0.01
        out = np.asarray(A.normalize_volume(wav, -30.0, increase_only=True))
        dbfs = 10 * np.log10(np.mean(out**2))
        assert abs(dbfs - (-30.0)) < 0.1
        # increase_only must not attenuate a loud signal
        loud = jnp.asarray(_test_wave())
        out2 = np.asarray(A.normalize_volume(loud, -60.0, increase_only=True))
        np.testing.assert_allclose(out2, np.asarray(loud))


class TestVAD:
    def test_trims_long_silence(self):
        sr = 16000
        rng = np.random.default_rng(0)
        speech = 0.5 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr) + 0.01 * (
            rng.standard_normal(sr)
        )
        silence = 0.0005 * rng.standard_normal(sr)  # 1 s of near-silence
        wav = np.concatenate([speech, silence, speech]).astype(np.float32)
        trimmed = V.trim_long_silences(wav, sr)
        assert len(trimmed) < len(wav) - sr // 2  # most of the silence removed
        assert len(trimmed) > 1.5 * sr  # speech kept

    def test_trim_silence_edges(self):
        sr = 16000
        tone = 0.5 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
        wav = np.concatenate(
            [np.zeros(sr // 2), tone, np.zeros(sr // 2)]
        ).astype(np.float32)
        trimmed = V.trim_silence(wav, top_db=60)
        assert len(trimmed) < len(wav) - int(0.8 * sr)
        assert len(trimmed) >= int(0.9 * sr)


class TestResample:
    def test_preserves_tone(self):
        from rtvc_tpu.ops.resample import resample

        sr_in, sr_out = 22050, 16000
        t = np.arange(sr_in) / sr_in
        wav = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        out = resample(wav, sr_in, sr_out)
        assert abs(len(out) - sr_out) <= 2
        spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
        peak_hz = np.argmax(spec) * sr_out / len(out)
        assert abs(peak_hz - 440) < 5


class TestFastGriffinLim:
    def test_converges_faster_than_plain_gl(self):
        """FGLA (the use_lws fast-phase path) must beat plain GL in spectral
        convergence at equal iterations and roughly match it with 3× fewer."""
        import jax

        from rtvc_tpu.config import preprocessing, sp
        from rtvc_tpu.ops import stft as stft_ops
        from rtvc_tpu.ops.audio import fast_griffin_lim, griffin_lim

        rng = np.random.default_rng(0)
        t = np.arange(16000) / 16000
        wav = (0.5 * np.sin(2 * np.pi * 220 * t)
               + 0.2 * np.sin(2 * np.pi * 440 * t + 0.7)
               + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
        S = jnp.abs(stft_ops.stft(jnp.asarray(wav), sp.n_fft, sp.hop_size,
                                  sp.win_size))

        def conv_err(y):
            R = jnp.abs(stft_ops.stft(y, sp.n_fft, sp.hop_size, sp.win_size))
            return float(jnp.linalg.norm(R - S) / jnp.linalg.norm(S))

        key = jax.random.PRNGKey(0)
        e_gl20 = conv_err(griffin_lim(S, sp, 20, key))
        e_gl60 = conv_err(griffin_lim(S, sp, 60, key))
        e_fgla20 = conv_err(fast_griffin_lim(S, sp, 20, key))
        assert e_fgla20 < e_gl20, (e_fgla20, e_gl20)
        assert e_fgla20 < 1.25 * e_gl60, (e_fgla20, e_gl60)

    def test_use_lws_toggle_routes_inverse_mel(self):
        import jax

        from rtvc_tpu.config import preprocessing, sp
        from rtvc_tpu.ops.audio import inv_mel_spectrogram, melspectrogram

        t = np.arange(8000) / 16000
        wav = (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
        mel = melspectrogram(jnp.asarray(wav), sp, preprocessing)
        pp_fast = preprocessing.replace(use_lws=True, griffin_lim_iters=12)
        y = np.asarray(inv_mel_spectrogram(mel, sp, pp_fast,
                                           jax.random.PRNGKey(0),
                                           length=len(wav)))
        assert y.shape == wav.shape and np.isfinite(y).all()
        # reconstruction carries the dominant tone
        spec = np.abs(np.fft.rfft(y))
        freq = np.fft.rfftfreq(len(y), 1 / 16000)
        assert abs(freq[np.argmax(spec)] - 330.0) < 10.0
