"""Parity vs the GENUINE reference fold-with-overlap / crossfade-unfold
(/root/reference/vocoder/models/fatchord_version.py:275-404) — the repo's
signature batched-AR-generation transform."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rtvc_tpu.models.wavernn import fold_with_overlap, xfade_and_unfold
from tests.ref_oracle import ref_module


@pytest.fixture(scope="module")
def ref_model():
    mod = ref_module("vocoder.models.fatchord_version")
    torch.manual_seed(0)
    return mod.WaveRNN(
        rnn_dims=8, fc_dims=8, bits=4, pad=2, upsample_factors=(2, 2, 5),
        feat_dims=10, compute_dims=8, res_out_dims=16, res_blocks=1,
        hop_length=20, sample_rate=1000,
    ).eval()


@pytest.mark.parametrize(
    "total_len,target,overlap",
    [
        (1000, 200, 50),   # divides evenly
        (1037, 200, 50),   # remainder → pad path
        (260, 200, 50),    # single fold + remainder
        (140, 200, 50),    # shorter than one target
    ],
)
def test_fold_matches_reference(ref_model, total_len, target, overlap):
    g = torch.Generator().manual_seed(1)
    x = torch.randn(1, total_len, 3, generator=g)
    with torch.no_grad():
        expected = ref_model.fold_with_overlap(x, target, overlap).numpy()
    ours, num_folds = fold_with_overlap(jnp.asarray(x.numpy()), target, overlap)
    assert num_folds == expected.shape[0]
    np.testing.assert_allclose(np.asarray(ours), expected, atol=0.0)


@pytest.mark.parametrize("num_folds", [1, 3, 5])
def test_xfade_and_unfold_matches_reference(ref_model, num_folds):
    target, overlap = 200, 50
    rng = np.random.default_rng(2)
    y = rng.uniform(-1, 1, (num_folds, target + 2 * overlap))
    expected = ref_model.xfade_and_unfold(y.copy(), target, overlap)
    ours = np.asarray(
        xfade_and_unfold(jnp.asarray(y.astype(np.float32)), target, overlap)
    )
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=1e-5)
