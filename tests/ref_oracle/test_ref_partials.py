"""Partial-utterance slicing parity vs the GENUINE reference
(encoder/inference.py:64-113): the 160-frame/50%-overlap window schedule
with the ≥75% last-window coverage rule determines exactly which windows an
utterance embeds — any drift shifts every downstream embedding."""
import numpy as np
import pytest

from rtvc_tpu.inference.encoder import compute_partial_slices
from tests.ref_oracle import ref_module


@pytest.mark.parametrize(
    "n_samples",
    [16000, 24000, 32000, 47999, 48000, 48001, 160000, 16000 * 10 + 123],
)
def test_slices_match_reference(n_samples):
    ref = ref_module("encoder.inference")
    e_wave, e_mel = ref.compute_partial_slices(n_samples)
    o_wave, o_mel = compute_partial_slices(n_samples)
    assert len(o_wave) == len(e_wave), (len(o_wave), len(e_wave))
    for a, b in zip(o_wave, e_wave):
        assert (a.start, a.stop) == (b.start, b.stop)
    for a, b in zip(o_mel, e_mel):
        assert (a.start, a.stop) == (b.start, b.stop)


def test_short_utterance_single_slice():
    ref = ref_module("encoder.inference")
    e_wave, e_mel = ref.compute_partial_slices(4000)
    o_wave, o_mel = compute_partial_slices(4000)
    assert len(e_wave) == len(o_wave) == 1
    assert o_mel[0].stop == e_mel[0].stop == 160


@pytest.mark.parametrize("coverage", [0.5, 0.75, 0.9])
@pytest.mark.parametrize("overlap", [0.25, 0.5, 0.75])
def test_knobs_match_reference(coverage, overlap):
    ref = ref_module("encoder.inference")
    n = 16000 * 7 + 321
    e_wave, _ = ref.compute_partial_slices(
        n, min_pad_coverage=coverage, overlap=overlap
    )
    o_wave, _ = compute_partial_slices(
        n, min_pad_coverage=coverage, overlap=overlap
    )
    assert [(s.start, s.stop) for s in o_wave] == \
        [(s.start, s.stop) for s in e_wave]
