"""Streaming pipelined vocoding (sustained-throughput serving API)."""
import numpy as np
import pytest

import jax

from rtvc_tpu.inference.pipelined import vocode_pipelined
from rtvc_tpu.models.wavernn import (
    VOC_FATCHORD,
    WaveRNNDims,
    init_wavernn,
    wavernn_generate,
)


@pytest.fixture(scope="module")
def model():
    d = WaveRNNDims(
        variant=VOC_FATCHORD, mode="RAW", rnn_dims=16, fc_dims=16, bits=6,
        pad=2, upsample_factors=(2, 2, 5), feat_dims=10, compute_dims=8,
        res_out_dims=16, res_blocks=1, hop_length=20, sample_rate=1000,
    )
    return init_wavernn(jax.random.PRNGKey(0), d), d


def _mels(n, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return [
        rng.uniform(-1, 1, (10, frames)).astype(np.float32)
        for frames in rng.integers(20, 60, n)
    ]


def test_streams_in_order_and_matches_single_calls(model):
    variables, d = model
    mels = _mels(5)
    key = jax.random.PRNGKey(7)
    outs = list(vocode_pipelined(
        variables, d, mels, key, depth=2, target=200, overlap=80,
        use_pallas=False,
    ))
    assert len(outs) == len(mels)
    for mel, wav in zip(mels, outs):
        assert wav.shape == ((mel.shape[-1] - 1) * d.hop_length,)
        assert np.isfinite(wav).all()
    # order + determinism: matches the one-shot API called with the same
    # per-utterance key derivation
    for i, (mel, wav) in enumerate(zip(mels, outs)):
        ref = wavernn_generate(
            variables, d, mel, jax.random.fold_in(key, i), batched=True,
            target=200, overlap=80, mu_law=True, apply_preemphasis=True,
            use_pallas=False,
        )
        np.testing.assert_allclose(wav, ref, atol=1e-6)


def test_accepts_generator_input(model):
    variables, d = model
    dispatched = []

    def gen():
        for m in _mels(4, rng_seed=1):
            dispatched.append(len(dispatched))
            yield m

    it = vocode_pipelined(variables, d, gen(), jax.random.PRNGKey(0),
                          depth=2, target=200, overlap=80, use_pallas=False)
    first = next(it)
    # laziness: with depth=2 only ~3 inputs consumed before the first yield
    assert len(dispatched) <= 3
    rest = list(it)
    assert len(rest) == 3 and np.isfinite(first).all()


def test_rejects_bad_mel(model):
    variables, d = model
    with pytest.raises(ValueError, match="expected"):
        list(vocode_pipelined(
            variables, d, [np.zeros((3, 30), np.float32)],
            jax.random.PRNGKey(0), use_pallas=False,
        ))


def test_vocoder_warmup_precompiles(model):
    from rtvc_tpu.inference import vocoder
    from rtvc_tpu.models import factories

    variables, d = model
    bundle = factories.VocModel(
        model_type="fatchord-wavernn", dims=d, variables=variables,
        config=None,
    )
    # minimal config shim for infer_waveform's cfg lookups
    class _Cfg:
        mu_law = True
        gen_target = 200
        gen_overlap = 80
    bundle = bundle._replace(config=_Cfg())
    vocoder.load_bundle(bundle)
    vocoder.set_generation_options(use_pallas=False, target=100, overlap=40)
    try:
        n = vocoder.warmup(frame_buckets=(16, 32))
        assert n == 2
    finally:
        vocoder.set_generation_options(use_pallas=None, target=400, overlap=160)
