"""Training loops for the three pipeline stages.

Capability parity with the reference trainers:
  * encoder — infinite GE2E loop, periodic save/backup, profiler ticks
    (ref: encoder/train.py:11-192);
  * synthesizer — session loop over the progressive schedule (r/batch/LR per
    session for Tacotron), per-step linear SGDR-style LR decay, eval sample
    hooks (ref: synthesizer/train.py:56-331);
  * vocoder — session loop, CE/MoL loss, in-loop structured pruning,
    loss-anomaly detection, test-set generation at checkpoints
    (ref: vocoder/train.py:23-305).

TPU-native: each stage drives one jitted, data-parallel-shardable train step
(rtvc_tpu/train/steps.py); the LR is injected through
``optax.inject_hyperparams`` so the schedule changes without recompiling;
checkpoints carry {step, model_type, params, opt_state} with resumable
mid-session step counts (ref contract: SURVEY.md §5.4).
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rtvc_tpu.train import checkpoints as ckpt
from rtvc_tpu.utils.metrics import MetricsLogger, ValueWindow, simple_table, stream
from rtvc_tpu.utils.profiler import Profiler


def linear_session_lr(init_lr: float, end_lr: float, step_in_session: int,
                      session_steps: int) -> float:
    """Linear decay within a session (SGDR-style restarts across sessions,
    ref: synthesizer/train.py:190-191, 237-239)."""
    if session_steps <= 1:
        return end_lr
    frac = min(max(step_in_session / (session_steps - 1), 0.0), 1.0)
    return init_lr + (end_lr - init_lr) * frac


class AnomalyDetector:
    """Loss-anomaly detection: rolling average of |Δloss|; trips when the
    current delta exceeds ``multiplier×avg``; hard-fails on NaN
    (ref: vocoder/train.py:222-241)."""

    def __init__(self, multiplier: float = 6.0, window: int = 100,
                 warmup: int = 20):
        self.multiplier = multiplier
        self.window = ValueWindow(window)
        self.prev_loss: Optional[float] = None
        self.warmup = warmup
        self.seen = 0

    def check(self, loss: float) -> bool:
        """Returns True if this step's loss is anomalous."""
        if not np.isfinite(loss):
            raise FloatingPointError(
                "Loss is NaN/Inf — training diverged (anomaly detection)"
            )
        anomalous = False
        if self.prev_loss is not None:
            delta = abs(loss - self.prev_loss)
            self.seen += 1
            if (
                self.seen > self.warmup
                and self.window.count > 0
                and delta > self.multiplier * max(self.window.average, 1e-12)
            ):
                anomalous = True
            self.window.append(delta)
        self.prev_loss = loss
        return anomalous


def make_optimizer(lr: float = 1e-4) -> optax.GradientTransformation:
    """Adam with an injectable learning rate (per-step schedule without
    recompilation)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


def set_lr(opt_state, lr: float):
    # host scalar, not jnp.asarray: the leaf is re-set every step and a
    # device constant would cost a relay dispatch per step; jit transfers
    # the numpy scalar with the step's arguments instead
    opt_state.hyperparams["learning_rate"] = np.float32(lr)
    return opt_state


class CheckpointCadence:
    """save_every rolling overwrite + backup_every immutable snapshots
    (ref: encoder/train.py:133-150)."""

    def __init__(self, model_dir: Path, run_id: str, model_type: Optional[str],
                 save_every: int = 1000, backup_every: int = 10000):
        self.model_dir = Path(model_dir)
        self.model_dir.mkdir(parents=True, exist_ok=True)
        self.run_id = run_id
        self.model_type = model_type
        self.save_every = save_every
        self.backup_every = backup_every
        self.path = self.model_dir / f"{run_id}.ckpt"

    def maybe_save(self, step: int, params, opt_state=None, extras=None,
                   force: bool = False) -> None:
        do_save = force or (self.save_every > 0 and step % self.save_every == 0)
        do_backup = (self.backup_every > 0 and step % self.backup_every == 0
                     and step > 0)
        if not (do_save or do_backup):
            return
        # Multi-process: barrier, then ONLY the main process writes (the
        # Accelerate wait_for_everyone + main-process torch.save contract,
        # ref: encoder/train.py:133-150). The cadence predicate above is
        # deterministic in `step`, so every process reaches the barrier.
        from rtvc_tpu.parallel.mesh import is_main_process, wait_for_everyone

        wait_for_everyone()
        if not is_main_process():
            return
        if do_save or do_backup:
            ckpt.save_checkpoint(
                self.path, params, step, self.model_type, opt_state, extras
            )
        if do_backup:
            ckpt.backup_checkpoint(self.path, self.model_dir / "backups", step)


# ---------------------------------------------------------------------------
# Speaker encoder
# ---------------------------------------------------------------------------


def train_encoder(
    run_id: str,
    data_iterator: Iterable[np.ndarray],
    models_dir: Path,
    speakers_per_batch: int = 64,
    utterances_per_speaker: int = 10,
    learning_rate: float = 1e-6,
    total_steps: Optional[int] = None,
    end_after: Optional[int] = None,
    save_every: int = 500,
    backup_every: int = 7500,
    eer_every: int = 10,
    resume: bool = True,
    profile: bool = False,
    model=None,
    projection_hook=None,
    projection_every: int = 0,
    dp_mesh=None,
    compute_dtype: str = "f32",
) -> Dict[str, Any]:
    """GE2E training loop (ref: encoder/train.py:11-163).

    ``compute_dtype='bf16'`` activates the mixed-precision policy for the
    LSTM scans (master params/optimizer/loss stay f32 —
    rtvc_tpu/ops/precision.py; measured speedups in BENCHMARKS.md).

    ``dp_mesh``: a (possibly multi-process) mesh for data-parallel training.
    ``data_iterator`` then yields each process's LOCAL shard of the batch
    (local speakers = speakers_per_batch / process_count); the global GE2E
    similarity matrix is computed over the full global batch — the collective
    falls out of jit, unlike per-rank DDP where each rank sees only its own
    sub-batch's matrix."""
    from rtvc_tpu.models.speaker_encoder import (
        SpeakerEncoder,
        compute_eer,
        init_similarity_params,
    )
    from rtvc_tpu.train.steps import make_encoder_train_step

    model = model or SpeakerEncoder()
    optimizer = make_optimizer(learning_rate)
    cadence = CheckpointCadence(
        Path(models_dir) / run_id, run_id, "speaker_encoder",
        save_every, backup_every,
    )
    metrics = MetricsLogger(Path(models_dir) / run_id / "metrics.tsv")

    step = 0
    if resume and cadence.path.exists():
        state = ckpt.load_checkpoint(cadence.path)
        params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        step = state["step"]
        print(f"Resuming encoder run {run_id} at step {step}")
    else:
        it = iter(data_iterator)
        first = next(it)
        params = {
            "model": model.init(jax.random.PRNGKey(0), jnp.asarray(first))["params"],
            "similarity": init_similarity_params(),
        }
        data_iterator = _chain_first(first, it)
    if dp_mesh is not None:
        from rtvc_tpu.parallel import distributed as dist

        params = dist.replicate_global(params, dp_mesh)
    opt_state = optimizer.init(params)

    if end_after is not None:
        # relative stop (ref encoder_train.py --end_after): N more steps
        # from wherever the run resumed
        total_steps = min(total_steps or np.inf, step + end_after)
    from rtvc_tpu.ops import precision

    step_fn = make_encoder_train_step(
        model, optimizer, speakers_per_batch, utterances_per_speaker,
        compute_dtype=precision.resolve(compute_dtype),
    )
    # Architecture config rides in the checkpoint so inference reloads the
    # exact model (same contract as the synthesizer/vocoder trainers).
    enc_extras = {
        "config": {"model": model.model.asdict(), "data": model.data.asdict()}
    }
    profiler = Profiler(summarize_every=10, disabled=not profile)
    loss_window = ValueWindow(100)
    time_window = ValueWindow(100)
    last_metrics: Dict[str, Any] = {}

    t_last = time.perf_counter()
    for batch in data_iterator:
        if total_steps is not None and step >= total_steps:
            break
        profiler.tick("data fetch")
        if dp_mesh is not None:
            from rtvc_tpu.parallel import distributed as dist

            inputs = dist.global_batch(np.asarray(batch), dp_mesh)
        else:
            inputs = jnp.asarray(batch)
        params, opt_state, stats, sim, embeds = step_fn(params, opt_state, inputs)
        # ONE packed transfer for every logged scalar (each float() is a
        # separate ~30 ms round-trip through the TPU relay)
        sv = np.asarray(jnp.stack([stats["loss"], stats["grad_norm"]]))
        loss = float(sv[0])
        profiler.tick("forward+backward+step")
        step += 1
        loss_window.append(loss)
        # wall time per step (data + step + logging), not just the step —
        # the printed steps/s must match observed wall progress
        now = time.perf_counter()
        time_window.append(now - t_last)
        t_last = now

        logged = {"loss": loss, "grad_norm": float(sv[1])}
        if dp_mesh is not None:
            from rtvc_tpu.parallel.distributed import fetch
        else:
            fetch = np.asarray
        if eer_every > 0 and step % eer_every == 0:
            logged["eer"] = compute_eer(fetch(sim), speakers_per_batch)
        metrics.log(step, logged)
        last_metrics = logged
        if projection_hook is not None and projection_every > 0 \
                and step % projection_every == 0:
            projection_hook(step, fetch(embeds).reshape(-1, embeds.shape[-1]))
        stream(
            "Step %d | loss %.4f (avg %.4f) | %.2f steps/s "
            % (step, loss, loss_window.average, 1.0 / max(time_window.average, 1e-9))
        )
        profiler.tick("metrics")

        cadence.maybe_save(step, params, opt_state, extras=enc_extras)

    cadence.maybe_save(step, params, opt_state, extras=enc_extras, force=True)
    print()
    return {"step": step, "params": params, **last_metrics}


def _chain_first(first, rest):
    yield first
    yield from rest


# ---------------------------------------------------------------------------
# Synthesizer (Tacotron / ForwardTacotron / FastPitch)
# ---------------------------------------------------------------------------


def train_synthesizer(
    run_id: str,
    model_type: str,
    syn_dir: Path,
    models_dir: Path,
    epoch_batches: Callable[[int, int], Iterable[Dict[str, np.ndarray]]],
    epochs_per_session: Optional[int] = None,
    save_every: int = 1000,
    backup_every: int = 25000,
    eval_hook: Optional[Callable] = None,
    eval_interval: int = 500,
    seed: int = 0,
    max_steps: Optional[int] = None,
    override_hp=None,
    resume: bool = True,
    dp_mesh=None,
    compute_dtype: str = "f32",
) -> Dict[str, Any]:
    """Session-scheduled synthesizer training (ref: synthesizer/train.py:56-331).

    ``epoch_batches(session_index, r)`` yields collated batches for one epoch
    (r is the Tacotron reduction factor; ignored by NAR models). With
    ``dp_mesh`` (multi-process DP) each process yields its LOCAL shard of
    every batch; schedule batch sizes are global.
    """
    from rtvc_tpu.models import factories

    bundle = factories.init_syn_model(model_type, seed=seed, override_hp=override_hp)
    cfg = bundle.config
    optimizer = make_optimizer()
    cadence = CheckpointCadence(
        Path(models_dir) / run_id, run_id, model_type, save_every, backup_every
    )
    metrics = MetricsLogger(Path(models_dir) / run_id / "metrics.tsv")

    variables = bundle.variables
    step = 0
    if resume and cadence.path.exists():
        state = ckpt.load_checkpoint(cadence.path)
        variables = {
            "params": jax.tree_util.tree_map(jnp.asarray, state["params"]),
            "batch_stats": jax.tree_util.tree_map(
                jnp.asarray, state["extras"].get("batch_stats", variables["batch_stats"])
            ),
        }
        step = state["step"]
        print(f"Resuming {model_type} run {run_id} at step {step}")
    if dp_mesh is not None:
        from rtvc_tpu.parallel import distributed as dist

        variables = dist.replicate_global(variables, dp_mesh)
    opt_state = optimizer.init(variables["params"])

    is_tacotron = model_type == factories.MODEL_TYPE_TACOTRON
    schedule = cfg.tts_schedule
    rng = jax.random.PRNGKey(seed)
    loss_window = ValueWindow(100)
    time_window = ValueWindow(100)
    session_start_step = 0
    last_stats: Dict[str, Any] = {}

    for session_idx, session in enumerate(schedule):
        if is_tacotron:
            r, loops, batch_size, init_lr, end_lr = session
        else:
            loops, batch_size, init_lr, end_lr = session
            r = 1

        # Skip sessions already completed when resuming (the reference keeps
        # the step inside the model for exactly this, SURVEY.md §5.4).
        # Constructed ONCE per session and re-iterated per epoch: each
        # __iter__ of a batch_iterator draws a fresh shuffle + fresh crops
        # from its persistent rng — reconstructing it per epoch (same seed)
        # would feed identical batches every epoch.
        session_batches = epoch_batches(session_idx, r)
        if not hasattr(session_batches, "__len__"):
            session_batches = list(session_batches)
        steps_per_epoch = len(session_batches)
        n_epochs = int(loops) if epochs_per_session is None else epochs_per_session
        session_steps = max(steps_per_epoch * n_epochs, 1)
        if step - session_start_step >= session_steps:
            session_start_step += session_steps
            continue

        simple_table(
            [
                ("Session", session_idx + 1),
                ("r", r if is_tacotron else "-"),
                ("Batch", batch_size),
                ("LR", f"{init_lr:g}→{end_lr:g}"),
                ("Steps", session_steps),
            ]
        )

        step_fn = _make_syn_step(model_type, bundle, optimizer, r,
                                 dp_mesh, compute_dtype=compute_dtype)

        # All step keys for the session in ONE device call + transfer
        # (a per-step jax.random.split costs a relay round-trip per step)
        rng, session_rng = jax.random.split(rng)
        step_keys = np.asarray(jax.random.split(session_rng, session_steps))

        done = False
        t_last = time.perf_counter()
        for epoch in range(n_epochs):
            for batch in session_batches:
                lr = linear_session_lr(
                    init_lr, end_lr, step - session_start_step, session_steps
                )
                opt_state = set_lr(opt_state, lr)
                sub = step_keys[step - session_start_step]
                variables, opt_state, stats = step_fn(
                    variables, opt_state, batch, sub
                )
                # ONE packed transfer for all logged scalars (per-scalar
                # float() is a separate relay round-trip each)
                names = list(stats)
                vals = np.asarray(jnp.stack([stats[k] for k in names]))
                floats = dict(zip(names, (float(v) for v in vals)))
                loss = floats["loss"]
                step += 1
                loss_window.append(loss)
                # wall time (data + step + logging) so printed steps/s
                # matches observed progress
                now = time.perf_counter()
                time_window.append(now - t_last)
                t_last = now
                metrics.log(step, floats)
                last_stats = stats
                stream(
                    "Session %d | Step %d | lr %.2e | loss %.4f (avg %.4f) | %.2f steps/s "
                    % (session_idx + 1, step, lr, loss, loss_window.average,
                       1.0 / max(time_window.average, 1e-9))
                )
                cadence.maybe_save(
                    step, variables["params"], opt_state,
                    extras={"batch_stats": variables["batch_stats"], "r": r,
                            "config": cfg.asdict()},
                )
                if eval_hook is not None and eval_interval > 0 and step % eval_interval == 0:
                    eval_hook(step, variables, r)
                if max_steps is not None and step >= max_steps:
                    done = True
                    break
            if done:
                break
        session_start_step += session_steps
        if done:
            break

    cadence.maybe_save(
        step, variables["params"], opt_state,
        extras={"batch_stats": variables["batch_stats"], "r": r,
                "config": cfg.asdict()}, force=True,
    )
    print()
    return {"step": step, "variables": variables,
            **{k: float(v) for k, v in last_stats.items()}}


def _make_syn_step(model_type, bundle, optimizer, r, dp_mesh=None,
                   compute_dtype="f32"):
    from rtvc_tpu.ops import precision as _prec

    compute_dtype = _prec.resolve(compute_dtype)
    from rtvc_tpu.models import factories

    if dp_mesh is not None:
        from rtvc_tpu.parallel import distributed as dist

        def as_dev(x):
            return dist.global_batch(np.asarray(x), dp_mesh)
    else:
        as_dev = jnp.asarray

    if model_type == factories.MODEL_TYPE_TACOTRON:
        from rtvc_tpu.train.steps import make_tacotron_train_step

        raw = make_tacotron_train_step(
            bundle.dims, optimizer, r, bundle.config.tts_clip_grad_norm,
            compute_dtype=compute_dtype,
        )

        def step_fn(variables, opt_state, batch, rng):
            params, stats, opt_state, out, _ = raw(
                variables["params"], variables["batch_stats"], opt_state,
                {
                    "chars": as_dev(batch["chars"]),
                    "mels": as_dev(batch["mels"]),
                    "embeds": as_dev(batch["embeds"]),
                    "stop": as_dev(batch["stop"]),
                },
                rng,
            )
            return {"params": params, "batch_stats": stats}, opt_state, out

        return step_fn

    # NAR branches (forward-tacotron / fast-pitch)
    from rtvc_tpu.train.steps import make_nar_synth_train_step

    raw = make_nar_synth_train_step(model_type, bundle.dims, optimizer,
                                    bundle.config,
                                    compute_dtype=compute_dtype)

    def step_fn(variables, opt_state, batch, rng):
        params, stats, opt_state, out = raw(
            variables["params"], variables["batch_stats"], opt_state,
            {
                "chars": as_dev(batch["chars"]),
                "mels": as_dev(batch["mels"]),
                "embeds": as_dev(batch["embeds"]),
                "durations": as_dev(batch["durations"]),
                "spec_lens": as_dev(batch["spec_lens"]),
                "x_lens": as_dev(batch["x_lens"]),
                "pitch": as_dev(batch["phoneme_pitchs"]),
                "energy": as_dev(batch["phoneme_energys"]),
            },
            rng,
        )
        return {"params": params, "batch_stats": stats}, opt_state, out

    return step_fn


# ---------------------------------------------------------------------------
# Vocoder (WaveRNN)
# ---------------------------------------------------------------------------


def train_vocoder(
    run_id: str,
    model_type: str,
    models_dir: Path,
    epoch_batches: Callable[[int], Iterable[Dict[str, np.ndarray]]],
    save_every: int = 1000,
    backup_every: int = 25000,
    gen_hook: Optional[Callable] = None,
    gen_every: int = 0,
    seed: int = 0,
    max_steps: Optional[int] = None,
    override_hp=None,
    resume: bool = True,
    dp_mesh=None,
    compute_dtype: str = "f32",
) -> Dict[str, Any]:
    """WaveRNN training with pruning + anomaly detection
    (ref: vocoder/train.py:23-305). With ``dp_mesh`` (multi-process DP)
    each process's ``epoch_batches`` yields its LOCAL shard of every batch;
    the pruning masks are computed on replicated params, so every process
    applies identical masks."""
    from rtvc_tpu.models import factories
    from rtvc_tpu.train.pruning import apply_prune_masks, compute_prune_masks
    from rtvc_tpu.train.steps import make_wavernn_train_step

    bundle = factories.init_voc_model(model_type, seed=seed, override_hp=override_hp)
    cfg = bundle.config
    optimizer = make_optimizer()
    cadence = CheckpointCadence(
        Path(models_dir) / run_id, run_id, model_type, save_every, backup_every
    )
    metrics = MetricsLogger(Path(models_dir) / run_id / "metrics.tsv")

    variables = bundle.variables
    step = 0
    if resume and cadence.path.exists():
        state = ckpt.load_checkpoint(cadence.path)
        variables = {
            "params": jax.tree_util.tree_map(jnp.asarray, state["params"]),
            "batch_stats": jax.tree_util.tree_map(
                jnp.asarray,
                state["extras"].get("batch_stats", variables["batch_stats"]),
            ),
        }
        step = state["step"]
        print(f"Resuming {model_type} run {run_id} at step {step}")
    if dp_mesh is not None:
        from rtvc_tpu.parallel import distributed as dist

        variables = dist.replicate_global(variables, dp_mesh)

        def as_dev(x):
            return dist.global_batch(np.asarray(x), dp_mesh)
    else:
        as_dev = jnp.asarray
    opt_state = optimizer.init(variables["params"])

    from rtvc_tpu.ops import precision as _prec

    raw_step = make_wavernn_train_step(
        bundle.dims, optimizer,
        compute_dtype=_prec.resolve(compute_dtype),
    )
    detector = AnomalyDetector(cfg.anomaly_trigger_multiplier) if cfg.anomaly_detection else None
    loss_window = ValueWindow(100)
    time_window = ValueWindow(100)
    session_start_step = 0
    last_stats: Dict[str, Any] = {}
    prune_info = (0, 0)

    for session_idx, (loops, init_lr, end_lr, batch_size) in enumerate(
        cfg.voc_tts_schedule
    ):
        # Constructed ONCE per session, re-iterated per epoch: each
        # __iter__ of a batch_iterator draws a fresh shuffle + fresh crops
        # from its persistent rng. Reconstructing it per epoch (same seed)
        # feeds IDENTICAL crops every epoch — the model memorizes a handful
        # of fixed windows (CE→1 on them, chance elsewhere) and free-runs
        # at ~34 dB MCD.
        session_batches = epoch_batches(session_idx)
        if not hasattr(session_batches, "__len__"):
            session_batches = list(session_batches)
        steps_per_epoch = len(session_batches)
        n_epochs = max(int(np.ceil(loops)), 1)
        session_steps = max(int(steps_per_epoch * loops), 1)
        if step - session_start_step >= session_steps:
            session_start_step += session_steps
            continue

        simple_table(
            [
                ("Session", session_idx + 1),
                ("Batch", batch_size),
                ("LR", f"{init_lr:g}→{end_lr:g}"),
                ("Steps", session_steps),
                ("Mode", cfg.mode),
            ]
        )

        done = False
        t_last = time.perf_counter()
        for epoch in range(n_epochs):
            for batch in session_batches:
                if step - session_start_step >= session_steps:
                    break
                lr = linear_session_lr(
                    init_lr, end_lr, step - session_start_step, session_steps
                )
                opt_state = set_lr(opt_state, lr)
                params, stats_tree, opt_state, out = raw_step(
                    variables["params"], variables["batch_stats"], opt_state,
                    {
                        "x": as_dev(batch["x"]),
                        "y": as_dev(batch["y"]),
                        "y_float": as_dev(batch["y_float"]),
                        "mels": as_dev(batch["mels"]),
                    },
                )
                variables = {"params": params, "batch_stats": stats_tree}
                loss = float(out["loss"])
                step += 1

                # Structured pruning (ref: vocoder/train.py:212-219)
                if cfg.use_sparsification and step >= cfg.start_prune:
                    masks = compute_prune_masks(
                        variables["params"], bundle.dims, jnp.asarray(step),
                        cfg.start_prune, cfg.prune_steps,
                        cfg.sparsity_target, cfg.sparsity_target_rnn,
                        cfg.sparse_group,
                    )
                    variables["params"] = apply_prune_masks(
                        variables["params"], masks
                    )
                    from rtvc_tpu.train.pruning import count_pruned

                    if step % 100 == 0:
                        prune_info = count_pruned(masks)

                if detector is not None and detector.check(loss):
                    print(
                        "\n[anomaly] |Δloss| exceeded %.1f× rolling average at "
                        "step %d (loss %.4f)" % (cfg.anomaly_trigger_multiplier,
                                                 step, loss)
                    )

                loss_window.append(loss)
                # wall time (data + step + logging), matching observed rate
                now = time.perf_counter()
                time_window.append(now - t_last)
                t_last = now
                metrics.log(step, {"loss": loss, "lr": lr,
                                   "pruned": prune_info[0]})
                last_stats = {"loss": loss}
                stream(
                    "Session %d | Step %d | loss %.4f (avg %.4f) | %.2f steps/s "
                    % (session_idx + 1, step, loss, loss_window.average,
                       1.0 / max(time_window.average, 1e-9))
                )
                cadence.maybe_save(
                    step, variables["params"], opt_state,
                    extras={"batch_stats": variables["batch_stats"],
                            "config": cfg.asdict()},
                )
                if gen_hook is not None and gen_every > 0 and step % gen_every == 0:
                    gen_hook(step, variables)
                if max_steps is not None and step >= max_steps:
                    done = True
                    break
            if done or step - session_start_step >= session_steps:
                break
        session_start_step += session_steps
        if done:
            break

    cadence.maybe_save(
        step, variables["params"], opt_state,
        extras={"batch_stats": variables["batch_stats"],
                "config": cfg.asdict()}, force=True,
    )
    print()
    return {"step": step, "variables": variables,
            **{k: float(v) for k, v in last_stats.items()}}
