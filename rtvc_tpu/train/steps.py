"""Jittable training steps for the three stages.

Each step is a pure function (variables, opt_state, batch, rng) → (variables,
opt_state, metrics), designed to be jitted over a data-parallel mesh: the
caller shards the batch's leading axis with ``NamedSharding(mesh, P('data'))``
and replicates params; XLA inserts the gradient all-reduce over ICI
(the TPU-native equivalent of Accelerate's DDP ``backward``,
ref: encoder/train.py:100-111, synthesizer/train.py:259-265,
vocoder/train.py:207-209).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from rtvc_tpu.models import tacotron as taco
from rtvc_tpu.models import wavernn as wr
from rtvc_tpu.models.distribution import discretized_mix_logistic_loss
from rtvc_tpu.models.speaker_encoder import SpeakerEncoder, ge2e_loss
from rtvc_tpu.train.losses import cross_entropy_bits, tacotron_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    extra: Dict[str, Any]  # batch_stats, similarity params, etc.


# ---------------------------------------------------------------------------
# Speaker encoder (GE2E)
# ---------------------------------------------------------------------------


def make_encoder_train_step(model: SpeakerEncoder, optimizer: optax.GradientTransformation,
                            speakers_per_batch: int, utterances_per_speaker: int):
    """GE2E step: forward → ge2e loss → grad ops (sim-param grads ×0.01,
    clip norm 3 — ref: encoder/model.py:34-40) → Adam."""

    def loss_fn(all_params, inputs):
        embeds = model.apply({"params": all_params["model"]}, inputs)
        embeds = embeds.reshape(
            speakers_per_batch, utterances_per_speaker, -1
        )
        loss, sim = ge2e_loss(
            embeds,
            all_params["similarity"]["similarity_weight"],
            all_params["similarity"]["similarity_bias"],
        )
        return loss, sim

    @jax.jit
    def step(params, opt_state, inputs):
        (loss, sim), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, inputs)
        # Gradient scale on similarity params (ref: encoder/model.py:36-37)
        grads["similarity"] = jax.tree_util.tree_map(
            lambda g: g * 0.01, grads["similarity"]
        )
        # Global norm clip to 3 (ref: encoder/model.py:40)
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, 3.0 / (gnorm + 1e-6))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}, sim

    return step


# ---------------------------------------------------------------------------
# Tacotron
# ---------------------------------------------------------------------------


def make_tacotron_train_step(
    d: taco.TacotronDims,
    optimizer: optax.GradientTransformation,
    r: int,
    clip_grad_norm: float = 1.0,
):
    """Teacher-forced Tacotron step (ref: synthesizer/train.py:226-265)."""

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        m1, m2, attn, stop_pred, new_stats = taco.tacotron_forward(
            variables, d, batch["chars"], batch["mels"], batch["embeds"],
            r, rng, train=True,
        )
        loss, parts = tacotron_loss(
            m1, m2, stop_pred, batch["mels"], batch["stop"]
        )
        return loss, (parts, new_stats, attn)

    @jax.jit
    def step(params, batch_stats, opt_state, batch, rng):
        (loss, (parts, new_stats, attn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, batch, rng)
        gnorm = optax.global_norm(grads)
        if clip_grad_norm is not None:
            scale = jnp.minimum(1.0, clip_grad_norm / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        stats = {**{"loss": loss, "grad_norm": gnorm}, **parts}
        return params, new_stats, opt_state, stats, attn

    return step


# ---------------------------------------------------------------------------
# WaveRNN
# ---------------------------------------------------------------------------


def make_wavernn_train_step(
    d: wr.WaveRNNDims, optimizer: optax.GradientTransformation
):
    """WaveRNN step: CE (RAW/BITS) or discretized-MoL loss
    (ref: vocoder/train.py:173-219)."""

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        out, new_stats = wr.wavernn_forward(
            variables, d, batch["x"], batch["mels"], train=True
        )
        if d.mode == "MOL":
            y = batch["y_float"][:, :, None]
            loss = discretized_mix_logistic_loss(
                jnp.transpose(out, (0, 2, 1)), y
            )
        elif d.mode == "BITS" and d.variant == wr.VOC_GENEING:
            # geneing forward already returns log-probs
            from rtvc_tpu.train.losses import nll_from_log_probs

            loss = nll_from_log_probs(out, batch["y"])
        else:
            loss = cross_entropy_bits(out, batch["y"])
        return loss, new_stats

    @jax.jit
    def step(params, batch_stats, opt_state, batch):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, batch
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, {"loss": loss}

    return step
