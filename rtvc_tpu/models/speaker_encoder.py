"""GE2E speaker encoder: 3-layer LSTM → Linear → ReLU → L2-normalize.

TPU-native rebuild of the reference encoder (ref: encoder/model.py:12-135):
the LSTM runs as ``lax.scan`` recurrences with the input projections hoisted
onto the MXU, and the GE2E similarity matrix replaces the per-speaker Python
loop (ref: encoder/model.py:87-93) with one einsum + a diagonal mask — a
single fused XLA graph.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rtvc_tpu.config.encoder import EncoderDataParams, EncoderModelParams
from rtvc_tpu.models.layers import LSTM, Linear


class SpeakerEncoder(nn.Module):
    """Maps utterance mel frames (B, T, n_mels) → L2-normalized embeddings
    (B, embedding_size)."""

    model: EncoderModelParams = EncoderModelParams()
    data: EncoderDataParams = EncoderDataParams()

    @nn.compact
    def __call__(self, utterances: jax.Array) -> jax.Array:
        _, (hidden, _) = LSTM(
            hidden_size=self.model.model_hidden_size,
            num_layers=self.model.model_num_layers,
            name="lstm",
        )(utterances)
        # Only the last layer's final hidden state feeds the projection
        # (ref: encoder/model.py:57). L2-normalize in f32 under any compute
        # policy — the GE2E similarity math downstream is f32.
        embeds_raw = jax.nn.relu(
            Linear(self.model.model_embedding_size, name="linear")(hidden[-1])
        ).astype(jnp.float32)
        return embeds_raw / jnp.linalg.norm(embeds_raw, axis=1, keepdims=True)


def init_similarity_params() -> dict:
    """Learned scale for the GE2E cosine similarities (w=10, b=-5)
    (ref: encoder/model.py:28-29)."""
    return {
        "similarity_weight": jnp.asarray([10.0], dtype=jnp.float32),
        "similarity_bias": jnp.asarray([-5.0], dtype=jnp.float32),
    }


def similarity_matrix(
    embeds: jax.Array, sim_weight: jax.Array, sim_bias: jax.Array
) -> jax.Array:
    """GE2E §2.1 similarity matrix, shape (S, U, S).

    ``sim[j, u, k]`` = cos(e_ju, inclusive centroid of speaker k) for j ≠ k,
    and cos(e_ju, exclusive centroid of speaker j without utterance u) on the
    diagonal (ref: encoder/model.py:64-106) — vectorized as one einsum plus a
    masked diagonal replacement instead of the reference's per-speaker loop.
    """
    S, U, _ = embeds.shape

    centroids_incl = jnp.mean(embeds, axis=1)  # (S, E)
    centroids_incl = centroids_incl / (
        jnp.linalg.norm(centroids_incl, axis=1, keepdims=True) + 1e-5
    )

    centroids_excl = (jnp.sum(embeds, axis=1, keepdims=True) - embeds) / (U - 1)
    centroids_excl = centroids_excl / (
        jnp.linalg.norm(centroids_excl, axis=2, keepdims=True) + 1e-5
    )

    sim_incl = jnp.einsum("jue,ke->juk", embeds, centroids_incl)
    sim_excl = jnp.einsum("jue,jue->ju", embeds, centroids_excl)

    diag = jnp.eye(S, dtype=bool)[:, None, :]  # (S, 1, S)
    sim = jnp.where(diag, sim_excl[:, :, None], sim_incl)
    return sim * sim_weight + sim_bias


def ge2e_loss(
    embeds: jax.Array, sim_weight: jax.Array, sim_bias: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """GE2E softmax loss (ref: encoder/model.py:108-126).

    Returns (scalar loss, flattened (S·U, S) similarity matrix for metrics).
    """
    S, U, _ = embeds.shape
    sim = similarity_matrix(embeds, sim_weight, sim_bias).reshape(S * U, S)
    targets = jnp.repeat(jnp.arange(S), U)
    log_probs = jax.nn.log_softmax(sim, axis=1)
    loss = -jnp.mean(jnp.take_along_axis(log_probs, targets[:, None], axis=1))
    return loss, sim


def compute_eer(sim_matrix: np.ndarray, speakers_per_batch: int) -> float:
    """Equal error rate on the flattened similarity matrix — host-side metric,
    not backpropagated (ref: encoder/model.py:128-135)."""
    from scipy.interpolate import interp1d
    from scipy.optimize import brentq
    from sklearn.metrics import roc_curve

    n = sim_matrix.shape[0]
    utterances_per_speaker = n // speakers_per_batch
    ground_truth = np.repeat(np.arange(speakers_per_batch), utterances_per_speaker)
    labels = np.eye(speakers_per_batch, dtype=int)[ground_truth]
    fpr, tpr, _ = roc_curve(labels.flatten(), sim_matrix.flatten())
    return float(brentq(lambda x: 1.0 - x - interp1d(fpr, tpr)(x), 0.0, 1.0))


# ---------------------------------------------------------------------------
# Torch checkpoint import (migration path from the reference framework)
# ---------------------------------------------------------------------------


def import_torch_state(state_dict: dict) -> dict:
    """Convert a reference encoder ``model_state`` dict (torch tensor or numpy
    values, names per ref encoder/model.py:18-29) into flax params for
    :class:`SpeakerEncoder` plus the similarity params."""

    def arr(v):
        return jnp.asarray(np.asarray(v), dtype=jnp.float32)

    lstm = {}
    for k in range(3):
        for name in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            key = f"lstm.{name}_l{k}"
            if key in state_dict:
                lstm[f"{name}_l{k}"] = arr(state_dict[key])
    params = {
        "lstm": lstm,
        "linear": {
            "weight": arr(state_dict["linear.weight"]),
            "bias": arr(state_dict["linear.bias"]),
        },
    }
    sim = {
        "similarity_weight": arr(state_dict.get("similarity_weight", [10.0])),
        "similarity_bias": arr(state_dict.get("similarity_bias", [-5.0])),
    }
    return {"params": params, "similarity": sim}
