"""Training-throughput benchmark: steps/s for the three stages
(the reference's instrument, ref: synthesizer/train.py:267-275,
vocoder/train.py:274-287 — streamed from a 100-step ValueWindow).

Prints one JSON line per stage with production batch shapes (first-session
schedule entries) on a single chip. Each line carries the roofline columns
(round 3): FLOPs/step from XLA's own cost model, achieved TFLOP/s, MFU vs
the chip's bf16 peak, and bytes/s vs HBM bandwidth
(rtvc_tpu/utils/roofline.py states the assumed peaks).

Round 4 adds the mixed-precision ablation (``--dtype both`` benches each
stage under the f32 AND bf16 compute policies — rtvc_tpu/ops/precision.py)
and ``--sweep`` batch-size scaling curves (does HBM%% climb toward peak or
plateau — the round-3 verdict's "prove the bound" instrument).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dtype", choices=["f32", "bf16", "both"],
                        default="both")
    parser.add_argument("--sweep", action="store_true",
                        help="batch-size scaling curves per stage")
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--stages", default="encoder,tacotron,fwd,fastpitch,wavernn",
                        help="comma list: encoder,tacotron,fwd,fastpitch,wavernn")
    parser.add_argument("--taco_fused", choices=["auto", "0", "1", "both"],
                        default="auto",
                        help="RTVC_FUSED_TACO_TRAIN for the tacotron stage; "
                             "'both' benches the hoisted scan vs the fused "
                             "Pallas decoder in one chain (keep-or-kill)")
    args = parser.parse_args()
    stages = set(args.stages.split(","))

    import jax
    import jax.numpy as jnp
    import optax

    from rtvc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from rtvc_tpu.models import factories
    from rtvc_tpu.models.speaker_encoder import (
        SpeakerEncoder,
        init_similarity_params,
    )
    from rtvc_tpu.train.steps import (
        make_encoder_train_step,
        make_tacotron_train_step,
        make_wavernn_train_step,
    )
    from rtvc_tpu.utils.roofline import summarize, xla_cost

    rng = np.random.default_rng(0)
    optimizer = optax.adam(1e-4)
    N = args.reps
    dtypes = {"f32": [jnp.float32], "bf16": [jnp.bfloat16],
              "both": [jnp.float32, jnp.bfloat16]}[args.dtype]

    def dt_name(dt):
        return "bf16" if dt == jnp.bfloat16 else "f32"

    def bench(metric, make_step_fn, run_step, batch_label, cost_args):
        """make_step_fn(dtype) → step; run_step(step) → carried loop fn."""
        for dt in dtypes:
            try:
                step = make_step_fn(dt)
                flops, bts = xla_cost(step, *cost_args)
                carry = run_step(step)     # warm (compile + 1 step)
                t0 = time.perf_counter()
                for _ in range(N):
                    carry = run_step(step, carry)
                dtm = (time.perf_counter() - t0) / N
                print(json.dumps({
                    "metric": metric, "value": round(1.0 / dtm, 3),
                    "unit": "steps/s", "batch": batch_label,
                    "dtype": dt_name(dt),
                    **summarize(flops, dtm, bts),
                }), flush=True)
            except Exception as e:  # keep sweeping: an OOM point IS a datum
                msg = str(e)
                oom = "memory" in msg.lower() or "hbm" in msg.lower()
                print(json.dumps({
                    "metric": metric, "batch": batch_label,
                    "dtype": dt_name(dt),
                    "error": "oom" if oom else msg[:200],
                }), flush=True)

    # ---- encoder: 64 spk × 10 utt × 160 frames ------------------------------
    if "encoder" in stages:
        model = SpeakerEncoder()
        S, U = 64, 10
        ebatch = jnp.asarray(
            rng.standard_normal((S * U, 160, 40)).astype(np.float32)
        )
        eparams = {
            "model": model.init(jax.random.PRNGKey(0), ebatch)["params"],
            "similarity": init_similarity_params(),
        }

        def enc_run(step, carry=None):
            if carry is None:
                carry = (jax.tree_util.tree_map(jnp.copy, eparams),
                         optimizer.init(eparams))
            p, o = carry
            p, o, st, _, _ = step(p, o, ebatch)
            float(st["loss"])
            return (p, o)

        bench(
            "encoder_train",
            lambda dt: make_encoder_train_step(model, optimizer, S, U,
                                               compute_dtype=dt),
            enc_run, f"{S}x{U}x160",
            (eparams, optimizer.init(eparams), ebatch),
        )

    # ---- tacotron: first-session schedule (r=7, batch 112) ------------------
    key = jax.random.PRNGKey(0)
    if "tacotron" in stages:
        bundle = factories.init_syn_model(factories.MODEL_TYPE_TACOTRON,
                                          seed=0)
        d = bundle.dims

    def taco_batch(B, frames=896, T_text=160):
        return {
            "chars": jnp.asarray(
                rng.integers(1, d.num_chars, (B, T_text)), jnp.int32),
            "mels": jnp.asarray(
                rng.uniform(-4, 4, (B, d.n_mels, frames)), jnp.float32),
            "embeds": jnp.asarray(
                rng.standard_normal((B, 768)), jnp.float32),
            "stop": jnp.ones((B, frames), jnp.float32),
        }

    def taco_bench(B, r=7, suffix=""):
        tb = taco_batch(B)
        tv = bundle.variables

        def run(step, carry=None):
            if carry is None:
                carry = (jax.tree_util.tree_map(jnp.copy, tv["params"]),
                         jax.tree_util.tree_map(jnp.copy, tv["batch_stats"]),
                         optimizer.init(tv["params"]))
            tp, ts_, to = carry
            tp, ts_, to, st, _ = step(tp, ts_, to, tb, key)
            float(st["loss"])
            return (tp, ts_, to)

        bench(
            "tacotron_train" + suffix,
            lambda dt: make_tacotron_train_step(d, optimizer, r=r,
                                                compute_dtype=dt),
            run, f"{B}x896f r={r}",
            (tv["params"], tv["batch_stats"], optimizer.init(tv["params"]),
             tb, key),
        )

    if "tacotron" in stages:
        # RTVC_FUSED_TACO_TRAIN is read at trace time (fused_ok), and every
        # make_tacotron_train_step call builds a fresh jit closure, so
        # toggling the env between benches is a valid same-chain ablation.
        fused_modes = (["0", "1"] if args.taco_fused == "both"
                       else [args.taco_fused])
        for fm in fused_modes:
            if fm != "auto":
                os.environ["RTVC_FUSED_TACO_TRAIN"] = fm
            sfx = ({"0": "_scan", "1": "_fused"}[fm]
                   if args.taco_fused == "both" else "")
            taco_bench(112, suffix=sfx)
            if args.sweep:
                for B in (28, 56, 224):
                    taco_bench(B, suffix=sfx)

    # ---- NAR synthesizers: ForwardTacotron / FastPitch (batch 48) ----------
    def nar_bench(model_type, metric, B=48, T_text=160, dur=5):
        from rtvc_tpu.train.steps import make_nar_synth_train_step

        nb = factories.init_syn_model(model_type, seed=0)
        nd, ncfg = nb.dims, nb.config
        L = T_text * dur
        durations = np.full((B, T_text), float(dur), np.float32)
        nbatch = {
            "chars": jnp.asarray(
                rng.integers(1, nd.num_chars, (B, T_text)), jnp.int32),
            "mels": jnp.asarray(
                rng.uniform(-4, 4, (B, nd.n_mels, L)), jnp.float32),
            "embeds": jnp.asarray(
                rng.standard_normal((B, 768)), jnp.float32),
            "durations": jnp.asarray(durations),
            "spec_lens": jnp.full((B,), L, jnp.int32),
            "x_lens": jnp.full((B,), T_text, jnp.int32),
            "pitch": jnp.asarray(
                rng.standard_normal((B, T_text)), jnp.float32),
            "energy": jnp.asarray(
                rng.standard_normal((B, T_text)), jnp.float32),
        }
        nv = nb.variables

        def run(step, carry=None):
            if carry is None:
                carry = (jax.tree_util.tree_map(jnp.copy, nv["params"]),
                         jax.tree_util.tree_map(jnp.copy, nv["batch_stats"]),
                         optimizer.init(nv["params"]))
            p, s, o = carry
            p, s, o, st = step(p, s, o, nbatch, key)
            float(st["loss"])
            return (p, s, o)

        bench(
            metric,
            lambda dt: make_nar_synth_train_step(model_type, nd, optimizer,
                                                 ncfg, compute_dtype=dt),
            run, f"{B}x{L}f",
            (nv["params"], nv["batch_stats"], optimizer.init(nv["params"]),
             nbatch, key),
        )

    if "fwd" in stages:
        nar_bench(factories.MODEL_TYPE_FORWARD_TACOTRON,
                  "forward_tacotron_train")
    if "fastpitch" in stages:
        nar_bench(factories.MODEL_TYPE_FASTPITCH, "fastpitch_train")

    # ---- wavernn: first-session schedule (batch 40, seq 1000) ---------------
    if "wavernn" not in stages:
        return
    vb = factories.init_voc_model(factories.MODEL_TYPE_FATCHORD, seed=0)
    vd = vb.dims
    seq = vd.hop_length * 5
    mel_win = seq // vd.hop_length + 2 * vd.pad

    def voc_bench(B):
        vbatch = {
            "x": jnp.asarray(rng.uniform(-1, 1, (B, seq)), jnp.float32),
            "y": jnp.asarray(rng.integers(0, 1024, (B, seq)), jnp.int32),
            "y_float": jnp.asarray(rng.uniform(-1, 1, (B, seq)), jnp.float32),
            "mels": jnp.asarray(
                rng.uniform(-1, 1, (B, vd.feat_dims, mel_win)), jnp.float32),
        }
        vv = vb.variables

        def run(step, carry=None):
            if carry is None:
                carry = (jax.tree_util.tree_map(jnp.copy, vv["params"]),
                         jax.tree_util.tree_map(jnp.copy, vv["batch_stats"]),
                         optimizer.init(vv["params"]))
            vp, vs, vo = carry
            vp, vs, vo, st = step(vp, vs, vo, vbatch)
            float(st["loss"])
            return (vp, vs, vo)

        bench(
            "wavernn_train",
            lambda dt: make_wavernn_train_step(vd, optimizer,
                                               compute_dtype=dt),
            run, f"{B}x{seq}",
            (vv["params"], vv["batch_stats"], optimizer.init(vv["params"]),
             vbatch),
        )

    voc_bench(40)
    if args.sweep:
        for B in (80, 160, 320):
            voc_bench(B)


if __name__ == "__main__":
    main()
    # The axon PJRT client can hang in teardown after remote compiles; the
    # output is already flushed, so exit hard to keep CI/driver runs snappy.
    import os
    import sys

    sys.stdout.flush()
    os._exit(0)
