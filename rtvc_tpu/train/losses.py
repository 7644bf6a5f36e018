"""Training losses for the three stages (ref: synthesizer/train.py:385-442,
vocoder/train.py:188-205, encoder/model.py:108-126)."""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def tacotron_loss(
    m1_hat: jax.Array,
    m2_hat: jax.Array,
    stop_pred: jax.Array,
    mels: jax.Array,
    stop_target: jax.Array,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """MSE+L1 on decoder mel, MSE on postnet mel, BCE on stop tokens
    (ref: synthesizer/train.py:385-402)."""
    m1_loss = jnp.mean((m1_hat - mels) ** 2) + jnp.mean(jnp.abs(m1_hat - mels))
    m2_loss = jnp.mean((m2_hat - mels) ** 2)
    eps = 1e-7
    p = jnp.clip(stop_pred, eps, 1.0 - eps)
    stop_loss = -jnp.mean(
        stop_target * jnp.log(p) + (1.0 - stop_target) * jnp.log1p(-p)
    )
    total = m1_loss + m2_loss + stop_loss
    return total, {"m1": m1_loss, "m2": m2_loss, "stop": stop_loss}


def masked_l1(pred: jax.Array, target: jax.Array, lens: jax.Array) -> jax.Array:
    """L1 averaged over valid positions only (torch MaskedL1 equivalent,
    used by the ForwardTacotron losses, ref: synthesizer/train.py:405-442).

    pred/target: (B, T, ...) ; lens: (B,) valid lengths along axis 1.
    """
    mask = (jnp.arange(pred.shape[1])[None, :] < lens[:, None]).astype(pred.dtype)
    while mask.ndim < pred.ndim:
        mask = mask[..., None]
    mask = jnp.broadcast_to(mask, pred.shape)
    diff = jnp.abs(pred - target) * mask
    return jnp.sum(diff) / jnp.maximum(jnp.sum(mask), 1.0)


def cross_entropy_bits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """CE over quantized-sample classes (RAW/BITS vocoder modes,
    ref: vocoder/train.py:197-199)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)
    return -jnp.mean(picked)


def nll_from_log_probs(log_probs: jax.Array, labels: jax.Array) -> jax.Array:
    """NLL when the model already outputs log-probs (geneing BITS forward)."""
    picked = jnp.take_along_axis(log_probs, labels[..., None], axis=-1)
    return -jnp.mean(picked)
