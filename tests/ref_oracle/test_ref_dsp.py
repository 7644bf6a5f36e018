"""Parity vs the GENUINE reference DSP helpers: vocoder/audio.py codecs
(mu-law, bit labels — librosa stubbed, numpy math untouched),
utils/logmmse.py (scipy-only, imports as-is), and synthesizer/audio.py's
normalize/denormalize ladder."""
import numpy as np
import torch  # noqa: F401  (keeps import ordering consistent with the pkg)

import jax.numpy as jnp

from tests.ref_oracle import ref_module


class TestVocoderAudioCodecs:
    def test_label_float_roundtrip_matches(self):
        ref = ref_module("vocoder.audio")
        from rtvc_tpu.ops.audio import float_2_label, label_2_float

        rng = np.random.default_rng(0)
        bits = 9
        x = rng.uniform(-1, 1, 512).astype(np.float32)
        e_lab = ref.float_2_label(x, bits)
        o_lab = np.asarray(float_2_label(jnp.asarray(x), bits))
        np.testing.assert_allclose(o_lab, e_lab, atol=1e-4)

        labels = rng.integers(0, 2**bits, 512).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(label_2_float(jnp.asarray(labels), bits)),
            ref.label_2_float(torch.from_numpy(labels), bits).numpy(),
            atol=1e-6,
        )

    def test_mu_law_matches(self):
        ref = ref_module("vocoder.audio")
        from rtvc_tpu.ops.audio import decode_mu_law, encode_mu_law

        rng = np.random.default_rng(1)
        mu = 2**9
        x = rng.uniform(-1, 1, 512)
        e_enc = ref.encode_mu_law(x, mu)
        o_enc = np.asarray(encode_mu_law(jnp.asarray(x), mu))
        np.testing.assert_allclose(o_enc, e_enc, atol=1e-3)

        y = rng.integers(0, mu, 512).astype(np.float64)
        e_dec = ref.decode_mu_law(y, mu, from_labels=True)
        o_dec = np.asarray(decode_mu_law(jnp.asarray(y), mu, from_labels=True))
        np.testing.assert_allclose(o_dec, e_dec, atol=1e-6)


class TestLogMMSE:
    def test_denoise_matches_reference(self):
        """Same noise profile + same noisy input → same denoised output
        (the reference vendors braindead/logmmse; ours is an independent
        Ephraim-Malah implementation with the same surface)."""
        ref = ref_module("utils.logmmse")
        from rtvc_tpu.ops import logmmse as ours

        rng = np.random.default_rng(2)
        sr = 16000
        t = np.arange(2 * sr) / sr
        clean = 0.5 * np.sin(2 * np.pi * 220 * t)
        noise = 0.05 * rng.standard_normal(len(t))
        noisy = (clean + noise).astype(np.float32)
        noise_clip = (0.05 * rng.standard_normal(sr // 2)).astype(np.float32)

        e_prof = ref.profile_noise(noise_clip, sr)
        e_out = ref.denoise(noisy.copy(), e_prof, eta=0)

        o_prof = ours.profile_noise(noise_clip, sr)
        o_out = ours.denoise(noisy.copy(), o_prof, eta=0)

        assert o_out.shape[0] >= 0.95 * e_out.shape[0]
        n = min(len(e_out), len(o_out))
        # Independent implementations of the same estimator: demand the same
        # *effect* — strong noise suppression with the tone intact — and
        # closely correlated outputs.
        corr = np.corrcoef(e_out[:n], o_out[:n])[0, 1]
        assert corr > 0.98, corr

        def band_power(x, lo, hi):
            spec = np.abs(np.fft.rfft(x)) ** 2
            freqs = np.fft.rfftfreq(len(x), 1 / sr)
            return spec[(freqs >= lo) & (freqs < hi)].sum()

        # noise (broadband, away from 220 Hz) suppressed similarly
        for out in (e_out[:n], o_out[:n]):
            tone = band_power(out, 180, 260)
            noise_band = band_power(out, 2000, 8000)
            assert tone / max(noise_band, 1e-12) > \
                band_power(noisy[:n], 180, 260) / band_power(noisy[:n], 2000, 8000)


class TestSynthesizerNormalize:
    def test_normalize_denormalize_match_reference(self):
        """The ±4 symmetric mel normalization ladder
        (ref synthesizer/audio.py:181-207) — compared on the genuine
        functions (librosa stubbed; these are pure numpy)."""
        ref = ref_module("synthesizer.audio")
        from rtvc_tpu.config import preprocessing, sp
        from rtvc_tpu.ops.audio import (
            denormalize_spectrogram,
            normalize_spectrogram,
        )

        rng = np.random.default_rng(3)
        S_db = rng.uniform(-120.0, 10.0, (80, 50)).astype(np.float32)
        e_norm = ref._normalize(S_db)
        o_norm = np.asarray(normalize_spectrogram(jnp.asarray(S_db), sp,
                                                  preprocessing))
        np.testing.assert_allclose(o_norm, e_norm, atol=2e-4)

        D = rng.uniform(-4.0, 4.0, (80, 50)).astype(np.float32)
        e_out = ref._denormalize(D)
        o_out = np.asarray(denormalize_spectrogram(jnp.asarray(D), sp,
                                                   preprocessing))
        np.testing.assert_allclose(o_out, e_out, atol=2e-3)
