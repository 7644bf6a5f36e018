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

from typing import Any, Dict, NamedTuple, Tuple

import functools

import jax
import jax.numpy as jnp
import optax

from rtvc_tpu.models import tacotron as taco
from rtvc_tpu.models import wavernn as wr
from rtvc_tpu.models.distribution import discretized_mix_logistic_loss
from rtvc_tpu.models.speaker_encoder import SpeakerEncoder, ge2e_loss
from rtvc_tpu.ops import precision
from rtvc_tpu.train.losses import cross_entropy_bits, tacotron_loss


def _policy(params, batch, compute_dtype):
    """Apply the mixed-precision policy: cast params + float batch leaves to
    the compute dtype (master params outside stay f32; casting inside the
    loss makes the cast's transpose deliver f32 grads). Returns
    (params_for_forward, batch_for_forward, context_manager)."""
    cdt = precision.resolve(compute_dtype)
    if cdt == jnp.float32:
        import contextlib

        return params, batch, contextlib.nullcontext()
    return (
        precision.cast_floats(params, cdt),
        precision.cast_floats(batch, cdt),
        precision.compute_dtype(cdt),
    )


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    extra: Dict[str, Any]  # batch_stats, similarity params, etc.


# ---------------------------------------------------------------------------
# Speaker encoder (GE2E)
# ---------------------------------------------------------------------------


def make_encoder_train_step(model: SpeakerEncoder, optimizer: optax.GradientTransformation,
                            speakers_per_batch: int, utterances_per_speaker: int,
                            compute_dtype=jnp.float32):
    """GE2E step: forward → ge2e loss → grad ops (sim-param grads ×0.01,
    clip norm 3 — ref: encoder/model.py:34-40) → Adam. ``compute_dtype``
    activates the bf16 policy for the LSTM scans (embeds/similarity/loss
    stay f32)."""

    def loss_fn(all_params, inputs):
        p, x, ctx = _policy(all_params, inputs, compute_dtype)
        with ctx:
            embeds = model.apply({"params": p["model"]}, x)
        embeds = embeds.astype(jnp.float32).reshape(
            speakers_per_batch, utterances_per_speaker, -1
        )
        loss, sim = ge2e_loss(
            embeds,
            all_params["similarity"]["similarity_weight"],
            all_params["similarity"]["similarity_bias"],
        )
        return loss, (sim, embeds)

    # donate params/opt_state: XLA updates them in place (halves the peak
    # footprint of the weight+optimizer arrays per step)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, inputs):
        (loss, (sim, embeds)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, inputs)
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
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}, sim, embeds

    return step


# ---------------------------------------------------------------------------
# Tacotron
# ---------------------------------------------------------------------------


def make_tacotron_train_step(
    d: taco.TacotronDims,
    optimizer: optax.GradientTransformation,
    r: int,
    clip_grad_norm: float = 1.0,
    compute_dtype=jnp.float32,
):
    """Teacher-forced Tacotron step (ref: synthesizer/train.py:226-265).
    ``compute_dtype`` activates the bf16 policy for the decoder scan /
    CBHGs (attention softmax, BN stats and losses stay f32)."""

    def loss_fn(params, batch_stats, batch, rng):
        p, b, ctx = _policy(params, batch, compute_dtype)
        with ctx:
            variables = {"params": p, "batch_stats": batch_stats}
            m1, m2, attn, stop_pred, new_stats = taco.tacotron_forward(
                variables, d, b["chars"], b["mels"], b["embeds"],
                r, rng, train=True,
            )
        loss, parts = tacotron_loss(
            m1.astype(jnp.float32), m2.astype(jnp.float32),
            stop_pred.astype(jnp.float32), batch["mels"], batch["stop"]
        )
        return loss, (parts, new_stats, attn)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
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
# NAR synthesizers (ForwardTacotron / FastPitch)
# ---------------------------------------------------------------------------


def _masked_l1_lastdim(pred: jax.Array, target: jax.Array, lens: jax.Array) -> jax.Array:
    """L1 masked over the LAST (time) axis (torch MaskedL1 semantics used by
    the ForwardTacotron losses, ref: synthesizer/train.py:429-436)."""
    T = pred.shape[-1]
    mask = (jnp.arange(T)[None, :] < lens[:, None]).astype(pred.dtype)
    while mask.ndim < pred.ndim:
        mask = mask[:, None, :]
    mask = jnp.broadcast_to(mask, pred.shape)
    return jnp.sum(jnp.abs(pred - target) * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_nar_synth_train_step(model_type: str, dims, optimizer, cfg,
                              compute_dtype=jnp.float32):
    """ForwardTacotron/FastPitch step: masked L1 on mel/post + weighted
    duration/pitch/energy losses with zoneout masks on the conditioning
    (ref: synthesizer/train.py:405-442). ``compute_dtype`` activates the
    bf16 policy for the forward (losses in f32)."""
    from rtvc_tpu.models import factories

    if model_type == factories.MODEL_TYPE_FORWARD_TACOTRON:
        from rtvc_tpu.models.forward_tacotron import forward_tacotron_forward as fwd
    else:
        from rtvc_tpu.models.fast_pitch import fastpitch_forward as fwd

    pitch_zoneout = getattr(cfg, "pitch_zoneout", 0.0)
    energy_zoneout = getattr(cfg, "energy_zoneout", 0.0)

    def loss_fn(params, batch_stats, batch, rng):
        k_zo1, k_zo2, k_fwd = jax.random.split(rng, 3)
        pitch_target = batch["pitch"]
        energy_target = batch["energy"]
        pitch_in = pitch_target * (
            jax.random.uniform(k_zo1, pitch_target.shape) > pitch_zoneout
        )
        energy_in = energy_target * (
            jax.random.uniform(k_zo2, energy_target.shape) > energy_zoneout
        )
        p, b, ctx = _policy(
            params,
            {**batch, "pitch_in": pitch_in, "energy_in": energy_in},
            compute_dtype,
        )
        with ctx:
            variables = {"params": p, "batch_stats": batch_stats}
            mel_hat, mel_post, dur_hat, pitch_hat, energy_hat, new_stats = fwd(
                variables, dims, b["chars"], b["mels"], b["durations"],
                b["embeds"], b["spec_lens"], b["pitch_in"], b["energy_in"],
                k_fwd, train=True,
            )
        mel_hat = mel_hat.astype(jnp.float32)
        mel_post = mel_post.astype(jnp.float32)
        dur_hat = dur_hat.astype(jnp.float32)
        pitch_hat = pitch_hat.astype(jnp.float32)
        energy_hat = energy_hat.astype(jnp.float32)
        m1 = _masked_l1_lastdim(mel_hat, batch["mels"], batch["spec_lens"])
        m2 = _masked_l1_lastdim(mel_post, batch["mels"], batch["spec_lens"])
        dur_l = _masked_l1_lastdim(
            dur_hat[:, None, :], batch["durations"][:, None, :], batch["x_lens"]
        )
        pitch_l = _masked_l1_lastdim(
            pitch_hat, pitch_target[:, None, :], batch["x_lens"]
        )
        energy_l = _masked_l1_lastdim(
            energy_hat, energy_target[:, None, :], batch["x_lens"]
        )
        loss = (
            m1
            + m2
            + cfg.duration_loss_factor * dur_l
            + cfg.pitch_loss_factor * pitch_l
            + cfg.energy_loss_factor * energy_l
        )
        return loss, (new_stats, {"m1": m1, "m2": m2, "dur": dur_l,
                                  "pitch": pitch_l, "energy": energy_l})

    clip = getattr(cfg, "clip_grad_norm", 1.0)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, batch_stats, opt_state, batch, rng):
        (loss, (new_stats, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, batch, rng)
        gnorm = optax.global_norm(grads)
        if clip is not None:
            scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        merged_stats = {**batch_stats, **new_stats}
        return params, merged_stats, opt_state, {
            "loss": loss, "grad_norm": gnorm, **parts,
        }

    return step


# ---------------------------------------------------------------------------
# WaveRNN
# ---------------------------------------------------------------------------


def make_wavernn_train_step(
    d: wr.WaveRNNDims, optimizer: optax.GradientTransformation,
    compute_dtype=jnp.float32,
):
    """WaveRNN step: CE (RAW/BITS) or discretized-MoL loss
    (ref: vocoder/train.py:173-219). ``compute_dtype`` activates the bf16
    policy for the GRU scans / upsampler (loss in f32)."""

    def loss_fn(params, batch_stats, batch):
        p, b, ctx = _policy(params, batch, compute_dtype)
        with ctx:
            variables = {"params": p, "batch_stats": batch_stats}
            out, new_stats = wr.wavernn_forward(
                variables, d, b["x"], b["mels"], train=True
            )
        out = out.astype(jnp.float32)
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

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, batch_stats, opt_state, batch):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, batch
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, {"loss": loss}

    return step
