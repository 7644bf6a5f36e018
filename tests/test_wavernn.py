"""WaveRNN behavior tests: fold/unfold math + generation semantics.

Full-model forward parity for all 3 variants × modes against the GENUINE
reference implementations lives in tests/ref_oracle/test_ref_wavernn.py —
no torch replicas here.
"""
import numpy as np

import jax
import jax.numpy as jnp

from rtvc_tpu.config.vocoder import MODE_BITS, MODE_MOL, MODE_RAW
from rtvc_tpu.models.wavernn import (
    VOC_FATCHORD,
    VOC_GENEING,
    VOC_RUNTIMERACER,
    WaveRNNDims,
    fold_with_overlap,
    init_wavernn,
    upsample_forward,
    wavernn_generate,
    xfade_and_unfold,
)


def _dims(variant, mode):
    return WaveRNNDims(
        variant=variant, mode=mode, rnn_dims=16, fc_dims=16, bits=4, pad=2,
        upsample_factors=(2, 2, 5), feat_dims=10, compute_dims=8,
        res_out_dims=16, res_blocks=2, hop_length=20, sample_rate=1000,
    )


class TestUpsample:
    def test_shapes(self):
        d = _dims(VOC_FATCHORD, MODE_RAW)
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        mels = jnp.asarray(np.random.default_rng(0).standard_normal((1, 10, 12)),
                           jnp.float32)
        m, aux, _ = upsample_forward(
            variables["params"]["upsample"], variables["batch_stats"]["upsample"],
            d, mels,
        )
        T = (12 - 2 * d.pad) * d.total_scale
        assert m.shape == (1, T, 10)
        assert aux.shape == (1, T, d.res_out_dims)


class TestFoldUnfold:
    def test_fold_shapes_and_content(self):
        T, C, target, overlap = 100, 3, 20, 10
        x = jnp.asarray(
            np.arange(T * C, dtype=np.float32).reshape(1, T, C)
        )
        folded, n = fold_with_overlap(x, target, overlap)
        assert folded.shape == (n, target + 2 * overlap, C)
        # fold i starts at i*(target+overlap) (ref: fatchord_version.py:334-338)
        np.testing.assert_array_equal(
            np.asarray(folded[1]), np.asarray(x[0, 30 : 30 + 40])
        )

    def test_unfold_matches_reference_math(self):
        """Oracle: literal numpy re-derivation of ref
        fatchord_version.py:342-404 (silence + equal-power fades + staggered
        overlap-add)."""
        target, overlap = 40, 16
        rng = np.random.default_rng(0)
        num_folds = 4
        y = rng.standard_normal((num_folds, target + 2 * overlap))

        # oracle
        total_len = num_folds * (target + overlap) + overlap
        silence_len = overlap // 2
        fade_len = overlap - silence_len
        t = np.linspace(-1, 1, fade_len)
        fade_in = np.concatenate([np.zeros(silence_len), np.sqrt(0.5 * (1 + t))])
        fade_out = np.concatenate([np.sqrt(0.5 * (1 - t)), np.zeros(silence_len)])
        yy = y.copy()
        yy[:, :overlap] *= fade_in
        yy[:, -overlap:] *= fade_out
        expected = np.zeros(total_len)
        for i in range(num_folds):
            start = i * (target + overlap)
            expected[start : start + target + 2 * overlap] += yy[i]

        ours = np.asarray(
            xfade_and_unfold(jnp.asarray(y, jnp.float32), target, overlap)
        )
        np.testing.assert_allclose(ours, expected, atol=1e-5)


class TestGenerate:
    def test_batched_generation_shapes_and_range(self):
        d = _dims(VOC_FATCHORD, MODE_RAW)
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        frames = 30
        mels = np.random.default_rng(0).standard_normal((10, frames)).astype(np.float32)
        wav = wavernn_generate(
            variables, d, mels, jax.random.PRNGKey(1), batched=True,
            target=100, overlap=40, mu_law=True, apply_preemphasis=False,
        )
        assert wav.shape == ((frames - 1) * d.hop_length,)
        assert np.isfinite(wav).all()

    def test_same_key_same_audio(self):
        d = _dims(VOC_GENEING, MODE_BITS)
        variables = init_wavernn(jax.random.PRNGKey(0), d)
        mels = np.random.default_rng(0).standard_normal((10, 20)).astype(np.float32)
        w1 = wavernn_generate(variables, d, mels, jax.random.PRNGKey(7),
                              batched=False, mu_law=False, apply_preemphasis=False)
        w2 = wavernn_generate(variables, d, mels, jax.random.PRNGKey(7),
                              batched=False, mu_law=False, apply_preemphasis=False)
        np.testing.assert_array_equal(w1, w2)
        w3 = wavernn_generate(variables, d, mels, jax.random.PRNGKey(8),
                              batched=False, mu_law=False, apply_preemphasis=False)
        assert not np.array_equal(w1, w3)

    def test_all_variants_and_modes_run(self):
        cases = [
            (VOC_FATCHORD, MODE_RAW),
            (VOC_FATCHORD, MODE_MOL),
            (VOC_GENEING, MODE_BITS),
            (VOC_GENEING, MODE_RAW),  # beta head
            (VOC_RUNTIMERACER, MODE_RAW),
        ]
        mels = np.random.default_rng(0).standard_normal((10, 16)).astype(np.float32)
        for variant, mode in cases:
            d = _dims(variant, mode)
            variables = init_wavernn(jax.random.PRNGKey(0), d)
            wav = wavernn_generate(
                variables, d, mels, jax.random.PRNGKey(1), batched=False,
                apply_preemphasis=False,
            )
            assert wav.shape == (15 * d.hop_length,), (variant, mode)
            assert np.isfinite(wav).all(), (variant, mode)
