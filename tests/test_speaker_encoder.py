"""Speaker encoder tests: GE2E loss math + shapes (parity vs the genuine
reference is in tests/ref_oracle/test_ref_encoder.py)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rtvc_tpu.config.encoder import EncoderDataParams, EncoderModelParams
from rtvc_tpu.models.speaker_encoder import (
    SpeakerEncoder,
    compute_eer,
    ge2e_loss,
    import_torch_state,
    init_similarity_params,
    similarity_matrix,
)


def _small_params(hidden=32, layers=3, mels=8):
    return EncoderModelParams(
        model_hidden_size=hidden, model_embedding_size=hidden
    ).replace(model_num_layers=layers), EncoderDataParams(mel_n_channels=mels)


class TestForward:
    # Parity against the GENUINE reference encoder (production dims, incl.
    # similarity/loss/EER) lives in tests/ref_oracle/test_ref_encoder.py.
    def test_init_and_forward_shapes(self):
        model_p, data_p = _small_params()
        model = SpeakerEncoder(model=model_p, data=data_p)
        x = jnp.zeros((6, 160, 8))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (6, 32)


class TestGE2E:
    def _embeds(self, S=4, U=5, E=16, seed=0):
        rng = np.random.default_rng(seed)
        # speaker-clustered embeddings: centroid + noise, normalized
        cents = rng.standard_normal((S, 1, E))
        e = cents + 0.3 * rng.standard_normal((S, U, E))
        e = e / np.linalg.norm(e, axis=2, keepdims=True)
        return jnp.asarray(e.astype(np.float32))

    def test_similarity_matrix_matches_loop_reference(self):
        """Oracle: literal per-speaker loop re-deriving ref encoder/model.py:64-106."""
        e = np.asarray(self._embeds())
        S, U, E = e.shape
        cents_incl = e.mean(axis=1)
        cents_incl = cents_incl / (np.linalg.norm(cents_incl, axis=1, keepdims=True) + 1e-5)
        cents_excl = (e.sum(axis=1, keepdims=True) - e) / (U - 1)
        cents_excl = cents_excl / (np.linalg.norm(cents_excl, axis=2, keepdims=True) + 1e-5)
        expected = np.zeros((S, U, S), dtype=np.float32)
        for j in range(S):
            for u in range(U):
                for k in range(S):
                    if j == k:
                        expected[j, u, k] = e[j, u] @ cents_excl[j, u]
                    else:
                        expected[j, u, k] = e[j, u] @ cents_incl[k]
        expected = expected * 10.0 - 5.0

        sim = init_similarity_params()
        ours = np.asarray(
            similarity_matrix(
                jnp.asarray(e), sim["similarity_weight"], sim["similarity_bias"]
            )
        )
        np.testing.assert_allclose(ours, expected, atol=1e-5)

    def test_loss_matches_torch_cross_entropy(self):
        e = self._embeds()
        sim = init_similarity_params()
        loss, sim_flat = ge2e_loss(e, sim["similarity_weight"], sim["similarity_bias"])
        S, U, _ = e.shape
        target = torch.from_numpy(np.repeat(np.arange(S), U)).long()
        expected = torch.nn.functional.cross_entropy(
            torch.from_numpy(np.array(sim_flat)), target
        ).item()
        assert abs(float(loss) - expected) < 1e-5

    def test_clustered_embeddings_have_low_loss_and_eer(self):
        """Well-separated speakers → small loss, small EER; shuffled → larger."""
        e = self._embeds(S=6, U=8, E=32)
        sim = init_similarity_params()
        loss_good, sim_good = ge2e_loss(e, sim["similarity_weight"], sim["similarity_bias"])

        rng = np.random.default_rng(1)
        flat = np.asarray(e).reshape(-1, e.shape[-1]).copy()
        rng.shuffle(flat, axis=0)
        e_bad = jnp.asarray(flat.reshape(e.shape))
        loss_bad, sim_bad = ge2e_loss(e_bad, sim["similarity_weight"], sim["similarity_bias"])

        assert float(loss_good) < float(loss_bad)
        eer_good = compute_eer(np.asarray(sim_good), 6)
        eer_bad = compute_eer(np.asarray(sim_bad), 6)
        assert eer_good < 0.05
        assert eer_bad > 0.2

    def test_loss_is_differentiable(self):
        e = self._embeds()
        sim = init_similarity_params()

        def f(emb, w, b):
            return ge2e_loss(emb, w, b)[0]

        g_e, g_w = jax.grad(f, argnums=(0, 1))(
            e, sim["similarity_weight"], sim["similarity_bias"]
        )
        assert np.isfinite(np.asarray(g_e)).all()
        assert np.isfinite(np.asarray(g_w)).all()
