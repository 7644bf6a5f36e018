"""Data-parallel dry-run stages for every trainable model family.

One DP train step per stage — encoder GE2E (global similarity-matrix
semantics), Tacotron, ForwardTacotron, FastPitch, WaveRNN with an in-loop
pruning-mask update — plus a sharded checkpoint save→restore→step
roundtrip. Used by

  * ``__graft_entry__.dryrun_multichip`` (the driver's multi-chip
    compile+execute validation on N virtual devices), and
  * ``tests/test_parallel.py`` (each stage asserted DP == single-device).

Every stage takes ``mesh=None`` for the single-device oracle and a
``jax.sharding.Mesh`` for the sharded run; batches are deterministic so the
two runs are comparable. Reference DP surface this covers:
encoder/train.py:79-110, synthesizer/train.py:226-265,
vocoder/train.py:129-219 (Accelerate DDP wraps all four stages equally).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _maybe_shard(mesh, params_and_state, batch):
    """Replicate params-and-state trees, shard the batch's leading axis."""
    import jax
    import jax.numpy as jnp

    if mesh is None:
        dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
        return [dev(t) for t in params_and_state], dev(batch)
    from rtvc_tpu.parallel import mesh as pmesh

    reps = [pmesh.replicate_tree(t, mesh) for t in params_and_state]
    return reps, pmesh.shard_batch(batch, mesh)


# ---------------------------------------------------------------------------
# Stage 1: speaker encoder (GE2E)
# ---------------------------------------------------------------------------


def encoder_stage(mesh=None, steps: int = 1) -> Tuple[float, dict]:
    """GE2E DP step. The loss needs the GLOBAL similarity matrix — under
    jit-sharded semantics every device contributes to one global matrix
    (collectives inserted by XLA), unlike per-rank DDP."""
    import jax
    import jax.numpy as jnp
    import optax

    from rtvc_tpu.config.encoder import EncoderDataParams, EncoderModelParams
    from rtvc_tpu.models.speaker_encoder import (
        SpeakerEncoder,
        init_similarity_params,
    )
    from rtvc_tpu.train.steps import make_encoder_train_step

    S, U, T, n_mels = 8, 3, 12, 10
    model = SpeakerEncoder(
        model=EncoderModelParams(
            model_hidden_size=16, model_embedding_size=16, model_num_layers=2
        ),
        data=EncoderDataParams(),
    )
    rng = np.random.default_rng(11)
    batch = rng.standard_normal((S * U, T, n_mels)).astype(np.float32)
    params = {
        "model": model.init(jax.random.PRNGKey(0), jnp.asarray(batch))["params"],
        "similarity": init_similarity_params(),
    }
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step_fn = make_encoder_train_step(model, optimizer, S, U)

    (params, opt_state), inputs = _maybe_shard(
        mesh, [params, opt_state], jnp.asarray(batch)
    )
    loss = np.nan
    for _ in range(steps):
        params, opt_state, stats, _, _ = step_fn(params, opt_state, inputs)
        loss = float(stats["loss"])
    return loss, params


# ---------------------------------------------------------------------------
# Stage 2: Tacotron
# ---------------------------------------------------------------------------


def tacotron_stage(mesh=None, steps: int = 1,
                   n_devices_batch: int = 8) -> Tuple[float, dict]:
    import jax
    import optax

    from rtvc_tpu.config.synthesizer import TacotronParams
    from rtvc_tpu.models import factories
    from rtvc_tpu.train.steps import make_tacotron_train_step

    cfg = TacotronParams(
        embed_dims=32, encoder_dims=16, decoder_dims=32, postnet_dims=16,
        encoder_K=2, lstm_dims=32, postnet_K=2, num_highways=2,
    )
    bundle = factories.init_syn_model(
        factories.MODEL_TYPE_TACOTRON, seed=0, override_hp=cfg
    )
    d = bundle.dims
    r = 2
    optimizer = optax.adam(1e-4)
    step_fn = make_tacotron_train_step(d, optimizer, r=r, clip_grad_norm=1.0)

    B, T_text, frames = n_devices_batch, 16, 4 * r
    rng = np.random.default_rng(0)
    batch = {
        "chars": rng.integers(1, d.num_chars, (B, T_text)).astype(np.int32),
        "mels": rng.standard_normal((B, d.n_mels, frames)).astype(np.float32),
        "embeds": rng.standard_normal((B, d.speaker_embedding_size)).astype(
            np.float32
        ),
        "stop": np.ones((B, frames), np.float32),
    }
    params = bundle.variables["params"]
    stats = bundle.variables["batch_stats"]
    opt_state = optimizer.init(params)
    (params, stats, opt_state), batch = _maybe_shard(
        mesh, [params, stats, opt_state], batch
    )
    loss = np.nan
    for i in range(steps):
        params, stats, opt_state, metrics, _ = step_fn(
            params, stats, opt_state, batch, jax.random.PRNGKey(3 + i)
        )
        loss = float(metrics["loss"])
    return loss, params


# ---------------------------------------------------------------------------
# Stage 3: ForwardTacotron (NAR)
# ---------------------------------------------------------------------------


def forward_tacotron_stage(mesh=None, steps: int = 1,
                           n_devices_batch: int = 8) -> Tuple[float, dict]:
    import jax
    import optax

    from rtvc_tpu.config.synthesizer import ForwardTacotronParams
    from rtvc_tpu.models import factories
    from rtvc_tpu.train.steps import make_nar_synth_train_step

    cfg = ForwardTacotronParams(
        embed_dims=16, series_embed_dims=8,
        duration_conv_dims=12, duration_rnn_dims=8,
        pitch_conv_dims=12, pitch_rnn_dims=8,
        energy_conv_dims=12, energy_rnn_dims=8,
        prenet_dims=16, prenet_k=2, prenet_num_highways=1,
        rnn_dims=16, postnet_dims=12, postnet_k=2, postnet_num_highways=1,
    )
    bundle = factories.init_syn_model(
        factories.MODEL_TYPE_FORWARD_TACOTRON, seed=0, override_hp=cfg
    )
    optimizer = optax.adam(1e-3)
    step_fn = make_nar_synth_train_step(
        factories.MODEL_TYPE_FORWARD_TACOTRON, bundle.dims, optimizer, cfg
    )
    B, T = n_devices_batch, 6
    rng = np.random.default_rng(2)
    dur = np.full((B, T), 2.0, np.float32)
    L = int(dur[0].sum())
    batch = {
        "chars": rng.integers(1, 20, (B, T)).astype(np.int32),
        "mels": rng.uniform(-4, 4, (B, 80, L)).astype(np.float32),
        "embeds": rng.standard_normal((B, 768)).astype(np.float32),
        "durations": dur,
        "spec_lens": np.full((B,), L, np.int32),
        "x_lens": np.full((B,), T, np.int32),
        "pitch": rng.standard_normal((B, T)).astype(np.float32),
        "energy": rng.standard_normal((B, T)).astype(np.float32),
    }
    params = bundle.variables["params"]
    stats = bundle.variables["batch_stats"]
    opt_state = optimizer.init(params)
    (params, stats, opt_state), batch = _maybe_shard(
        mesh, [params, stats, opt_state], batch
    )
    loss = np.nan
    for i in range(steps):
        params, stats, opt_state, metrics = step_fn(
            params, stats, opt_state, batch, jax.random.PRNGKey(7 + i)
        )
        loss = float(metrics["loss"])
    return loss, params


# ---------------------------------------------------------------------------
# Stage 4: FastPitch (transformer NAR)
# ---------------------------------------------------------------------------


def fastpitch_stage(mesh=None, steps: int = 1,
                    n_devices_batch: int = 8) -> Tuple[float, dict]:
    """FastPitch DP step — the repo's beyond-reference trainable (the
    reference ships the model unwired, ref: synthesizer/models/base.py:9-10,
    config/hparams.py:215-217) held to the same DP-evidence bar as the
    other four stages."""
    import jax
    import optax

    from rtvc_tpu.config.synthesizer import FastPitchParams
    from rtvc_tpu.models import factories
    from rtvc_tpu.train.steps import make_nar_synth_train_step

    cfg = FastPitchParams(
        embed_dims=16, n_heads=2, conv_kernel=3, conv_dims=32,
        n_layers_enc=2, n_layers_dec=2,
        series_d_model=8, series_n_heads=1, series_layers=1, series_d_fft=16,
    )
    bundle = factories.init_syn_model(
        factories.MODEL_TYPE_FASTPITCH, seed=0, override_hp=cfg
    )
    optimizer = optax.adam(1e-3)
    step_fn = make_nar_synth_train_step(
        factories.MODEL_TYPE_FASTPITCH, bundle.dims, optimizer, cfg
    )
    B, T = n_devices_batch, 6
    rng = np.random.default_rng(5)
    dur = np.full((B, T), 2.0, np.float32)
    L = int(dur[0].sum())
    batch = {
        "chars": rng.integers(1, 20, (B, T)).astype(np.int32),
        "mels": rng.uniform(-4, 4, (B, 80, L)).astype(np.float32),
        "embeds": rng.standard_normal((B, 768)).astype(np.float32),
        "durations": dur,
        "spec_lens": np.full((B,), L, np.int32),
        "x_lens": np.full((B,), T, np.int32),
        "pitch": rng.standard_normal((B, T)).astype(np.float32),
        "energy": rng.standard_normal((B, T)).astype(np.float32),
    }
    params = bundle.variables["params"]
    stats = bundle.variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    (params, stats, opt_state), batch = _maybe_shard(
        mesh, [params, stats, opt_state], batch
    )
    loss = np.nan
    for i in range(steps):
        params, stats, opt_state, metrics = step_fn(
            params, stats, opt_state, batch, jax.random.PRNGKey(13 + i)
        )
        loss = float(metrics["loss"])
    return loss, params


# ---------------------------------------------------------------------------
# Stage 5: WaveRNN with in-loop pruning-mask update
# ---------------------------------------------------------------------------


def wavernn_stage(mesh=None, steps: int = 2,
                  n_devices_batch: int = 8) -> Tuple[float, float, dict]:
    """DP WaveRNN step + the in-loop structured-pruning mask update under
    sharding (ref: vocoder/train.py:212-219). Masks are computed from the
    replicated params, so all devices/processes apply identical masks.
    Returns (loss, pruned_fraction, params)."""
    import jax
    import jax.numpy as jnp
    import optax

    from rtvc_tpu.config.vocoder import WaveRNNParams
    from rtvc_tpu.models import factories
    from rtvc_tpu.train.pruning import (
        apply_prune_masks,
        compute_prune_masks,
        count_pruned,
    )
    from rtvc_tpu.train.steps import make_wavernn_train_step

    cfg = WaveRNNParams(
        rnn_dims=16, fc_dims=16, compute_dims=8, res_out_dims=16,
        res_blocks=1, bits=6, seq_len=200 * 2,
        use_sparsification=True, start_prune=0, prune_steps=4,
        sparsity_target=0.5, sparsity_target_rnn=0.5,
    )
    bundle = factories.init_voc_model(
        factories.MODEL_TYPE_FATCHORD, seed=0, override_hp=cfg
    )
    d = bundle.dims
    optimizer = optax.adam(1e-3)
    step_fn = make_wavernn_train_step(d, optimizer)

    B, seq = n_devices_batch, cfg.seq_len
    mel_win = seq // 200 + 2 * cfg.pad
    rng = np.random.default_rng(4)
    batch = {
        "x": rng.uniform(-1, 1, (B, seq)).astype(np.float32),
        "y": rng.integers(0, 2 ** cfg.bits, (B, seq)).astype(np.int32),
        "y_float": rng.uniform(-1, 1, (B, seq)).astype(np.float32),
        "mels": rng.uniform(-1, 1, (B, 80, mel_win)).astype(np.float32),
    }
    params = bundle.variables["params"]
    stats = bundle.variables["batch_stats"]
    opt_state = optimizer.init(params)
    (params, stats, opt_state), batch = _maybe_shard(
        mesh, [params, stats, opt_state], batch
    )
    loss, frac = np.nan, 0.0
    for i in range(steps):
        params, stats, opt_state, out = step_fn(params, stats, opt_state, batch)
        loss = float(out["loss"])
        masks = compute_prune_masks(
            params, d, jnp.asarray(i + 1), cfg.start_prune, cfg.prune_steps,
            cfg.sparsity_target, cfg.sparsity_target_rnn, cfg.sparse_group,
        )
        params = apply_prune_masks(params, masks)
        pruned, total = count_pruned(masks)
        frac = pruned / max(total, 1)
    return loss, frac, params


# ---------------------------------------------------------------------------
# Sharded checkpoint save → restore → step roundtrip
# ---------------------------------------------------------------------------


def ckpt_roundtrip(mesh, workdir) -> float:
    """Save params living on the mesh, restore them, run one more sharded
    step; asserts restored params are bitwise-identical to the saved ones
    (the {step, model_type} checkpoint contract under sharding,
    ref: SURVEY.md §5.4). Returns the post-restore step loss."""
    import jax
    import jax.numpy as jnp
    from pathlib import Path

    from rtvc_tpu.train import checkpoints as ckpt

    loss0, params = tacotron_stage(mesh, steps=1)
    path = Path(workdir) / "dryrun_taco.ckpt"
    ckpt.save_checkpoint(path, params, step=1, model_type="tacotron")
    state = ckpt.load_checkpoint(path)
    assert state["step"] == 1 and state["model_type"] == "tacotron"

    restored = state["params"]
    same = jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        params, restored,
    )
    assert all(jax.tree_util.tree_leaves(same)), "ckpt roundtrip mismatch"

    # Re-place restored host arrays on the mesh and take one more step — the
    # resume path a real multi-chip run takes.
    import optax

    from rtvc_tpu.config.synthesizer import TacotronParams
    from rtvc_tpu.models import factories
    from rtvc_tpu.parallel import mesh as pmesh
    from rtvc_tpu.train.steps import make_tacotron_train_step

    cfg = TacotronParams(
        embed_dims=32, encoder_dims=16, decoder_dims=32, postnet_dims=16,
        encoder_K=2, lstm_dims=32, postnet_K=2, num_highways=2,
    )
    bundle = factories.init_syn_model(
        factories.MODEL_TYPE_TACOTRON, seed=0, override_hp=cfg
    )
    d = bundle.dims
    optimizer = optax.adam(1e-4)
    step_fn = make_tacotron_train_step(d, optimizer, r=2, clip_grad_norm=1.0)
    B = 8
    rng = np.random.default_rng(9)
    batch = {
        "chars": rng.integers(1, d.num_chars, (B, 16)).astype(np.int32),
        "mels": rng.standard_normal((B, d.n_mels, 8)).astype(np.float32),
        "embeds": rng.standard_normal((B, d.speaker_embedding_size)).astype(
            np.float32
        ),
        "stop": np.ones((B, 8), np.float32),
    }
    restored = jax.tree_util.tree_map(jnp.asarray, restored)
    stats = bundle.variables["batch_stats"]
    opt_state = optimizer.init(restored)
    (restored, stats, opt_state), batch = _maybe_shard(
        mesh, [restored, stats, opt_state], batch
    )
    _, _, _, metrics, _ = step_fn(
        restored, stats, opt_state, batch, jax.random.PRNGKey(1)
    )
    return float(metrics["loss"])
