"""Parity vs the GENUINE reference WaveRNN variants
(/root/reference/vocoder/models/{fatchord,geneing,runtimeracer}_version.py).

Identical weights through ``import_torch_state``; the teacher-forced forward
(which exercises every layer: upsample ResNet, I, all GRUs, all FCs, head)
must match per variant × mode.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rtvc_tpu.config.vocoder import MODE_BITS, MODE_MOL, MODE_RAW
from rtvc_tpu.models.wavernn import (
    VOC_FATCHORD,
    VOC_GENEING,
    VOC_RUNTIMERACER,
    WaveRNNDims,
    import_torch_state,
    upsample_forward,
    wavernn_forward,
)
from tests.ref_oracle import ref_module, state_numpy

_REF_MODULE = {
    VOC_FATCHORD: "vocoder.models.fatchord_version",
    VOC_GENEING: "vocoder.models.geneing_version",
    VOC_RUNTIMERACER: "vocoder.models.runtimeracer_version",
}


def _dims(variant, mode):
    return WaveRNNDims(
        variant=variant, mode=mode, rnn_dims=16, fc_dims=16, bits=4, pad=2,
        upsample_factors=(2, 2, 5), feat_dims=10, compute_dims=8,
        res_out_dims=16, res_blocks=2, hop_length=20, sample_rate=1000,
    )


def _make_ref(variant, mode, seed=0):
    mod = ref_module(_REF_MODULE[variant])
    d = _dims(variant, mode)
    torch.manual_seed(seed)
    ref = mod.WaveRNN(
        rnn_dims=d.rnn_dims, fc_dims=d.fc_dims, bits=d.bits, pad=d.pad,
        upsample_factors=d.upsample_factors, feat_dims=d.feat_dims,
        compute_dims=d.compute_dims, res_out_dims=d.res_out_dims,
        res_blocks=d.res_blocks, hop_length=d.hop_length,
        sample_rate=d.sample_rate, mode=mode,
    ).eval()
    return ref, d


def _parity(variant, mode, atol=1e-4):
    ref, d = _make_ref(variant, mode)
    B, frames = 2, 12
    seq = (frames - 2 * d.pad) * d.total_scale
    g = torch.Generator().manual_seed(1)
    x = torch.rand(B, seq, generator=g) * 2 - 1
    mels = torch.randn(B, d.feat_dims, frames, generator=g)
    with torch.no_grad():
        expected = ref(x, mels).numpy()
    variables = import_torch_state(state_numpy(ref), d)
    ours, _ = wavernn_forward(
        variables, d, jnp.asarray(x.numpy()), jnp.asarray(mels.numpy()),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=atol)


@pytest.mark.parametrize(
    "variant,mode",
    [
        (VOC_FATCHORD, MODE_RAW),
        (VOC_FATCHORD, MODE_MOL),
        (VOC_GENEING, MODE_BITS),
        (VOC_GENEING, MODE_RAW),  # 2-param beta head
        (VOC_GENEING, MODE_MOL),
        (VOC_RUNTIMERACER, MODE_RAW),
        (VOC_RUNTIMERACER, MODE_MOL),
    ],
)
def test_forward_matches_reference(variant, mode):
    _parity(variant, mode)


def test_upsample_matches_reference():
    """The upsample/aux path alone (conditioning for the generate kernels)
    must match the reference UpsampleNetwork (ref fatchord_version.py:61-85)."""
    ref, d = _make_ref(VOC_FATCHORD, MODE_RAW, seed=3)
    g = torch.Generator().manual_seed(4)
    mels = torch.randn(2, d.feat_dims, 12, generator=g)
    with torch.no_grad():
        e_mels, e_aux = ref.upsample(mels)
    variables = import_torch_state(state_numpy(ref), d)
    mels_up, aux, _ = upsample_forward(
        variables["params"]["upsample"], variables["batch_stats"]["upsample"], d,
        jnp.asarray(mels.numpy()), train=False,
    )
    np.testing.assert_allclose(np.asarray(mels_up), e_mels.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(aux), e_aux.numpy(), atol=1e-4)
