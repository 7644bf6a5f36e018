"""Pallas kernel tests (interpret mode on the CPU platform; the same code
compiles with Mosaic on real TPU)."""
import numpy as np

import jax
import jax.numpy as jnp

from rtvc_tpu.config import preprocessing, sp
from rtvc_tpu.ops.audio import melspectrogram
from rtvc_tpu.ops.pallas.mel_kernel import melspectrogram_pallas


class TestMelKernel:
    def test_matches_reference_path(self):
        rng = np.random.default_rng(0)
        t = np.arange(16000) / 16000
        wav = jnp.asarray(
            (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
        )
        expected = np.asarray(melspectrogram(wav, sp, preprocessing))
        got = np.asarray(melspectrogram_pallas(wav, sp, preprocessing,
                                               interpret=True))
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, atol=2e-4)

    def test_odd_frame_count(self):
        wav = jnp.asarray(np.random.default_rng(1).standard_normal(4321),
                          jnp.float32)
        got = np.asarray(melspectrogram_pallas(wav, sp, preprocessing,
                                               interpret=True))
        expected = np.asarray(melspectrogram(wav, sp, preprocessing))
        np.testing.assert_allclose(got, expected, atol=2e-4)
