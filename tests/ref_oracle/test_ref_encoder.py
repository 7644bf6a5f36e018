"""Parity vs the GENUINE reference speaker encoder
(/root/reference/encoder/model.py) — forward embeddings, GE2E similarity
matrix, GE2E loss, and EER, at the real production dims (40 mels → 3×768
LSTM → 768-d embedding)."""
import numpy as np
import torch

import jax.numpy as jnp

from rtvc_tpu.config.encoder import EncoderDataParams, EncoderModelParams
from rtvc_tpu.models.speaker_encoder import (
    SpeakerEncoder,
    compute_eer,
    ge2e_loss,
    import_torch_state,
    similarity_matrix,
)
from tests.ref_oracle import ref_module, state_numpy


def _make_ref(seed=0):
    mod = ref_module("encoder.model")
    torch.manual_seed(seed)
    return mod.SpeakerEncoder(torch.device("cpu")).eval()


def _our_model():
    return SpeakerEncoder(
        model=EncoderModelParams(),  # production 768/3-layer defaults
        data=EncoderDataParams(),    # 40 mel channels
    )


class TestReferenceEncoderParity:
    def test_forward_embeddings_match(self):
        ref = _make_ref()
        g = torch.Generator().manual_seed(1)
        x = torch.randn(4, 24, 40, generator=g)
        with torch.no_grad():
            expected = ref(x).numpy()

        state = import_torch_state(state_numpy(ref))
        ours = np.asarray(
            _our_model().apply({"params": state["params"]}, jnp.asarray(x.numpy()))
        )
        np.testing.assert_allclose(ours, expected, atol=2e-5)
        # gate from BASELINE.md: cosine similarity ≥ 0.999 per utterance
        cos = (ours * expected).sum(axis=1)
        assert (cos >= 0.999).all(), cos

    def test_similarity_matrix_and_loss_match(self):
        ref = _make_ref(seed=2)
        S, U, E = 4, 3, 768
        g = torch.Generator().manual_seed(3)
        e = torch.randn(S, U, E, generator=g)
        e = e / e.norm(dim=2, keepdim=True)
        with torch.no_grad():
            e_sim = ref.similarity_matrix(e).numpy()
            e_loss, e_eer = ref.loss(e)

        state = import_torch_state(state_numpy(ref))
        w = state["similarity"]["similarity_weight"]
        b = state["similarity"]["similarity_bias"]
        sim = similarity_matrix(jnp.asarray(e.numpy()), w, b)
        np.testing.assert_allclose(np.asarray(sim), e_sim, atol=2e-5)

        loss, sim_flat = ge2e_loss(jnp.asarray(e.numpy()), w, b)
        np.testing.assert_allclose(float(loss), float(e_loss), atol=1e-5)
        eer = compute_eer(np.asarray(sim_flat), S)
        np.testing.assert_allclose(eer, float(e_eer), atol=1e-6)
