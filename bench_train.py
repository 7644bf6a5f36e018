"""Training-throughput benchmark: steps/s for the three stages
(the reference's instrument, ref: synthesizer/train.py:267-275,
vocoder/train.py:274-287 — streamed from a 100-step ValueWindow).

Prints one JSON line per stage with production batch shapes (first-session
schedule entries) on a single chip. Each line carries the roofline columns
(round 3): FLOPs/step from XLA's own cost model, achieved TFLOP/s, MFU vs
the chip's bf16 peak, and bytes/s vs HBM bandwidth
(rtvc_tpu/utils/roofline.py states the assumed peaks).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from rtvc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from rtvc_tpu.config import sp
    from rtvc_tpu.config.encoder import EncoderModelParams
    from rtvc_tpu.models import factories
    from rtvc_tpu.models.speaker_encoder import SpeakerEncoder, init_similarity_params
    from rtvc_tpu.train.steps import (
        make_encoder_train_step,
        make_tacotron_train_step,
        make_wavernn_train_step,
    )

    from rtvc_tpu.utils.roofline import summarize, xla_cost

    rng = np.random.default_rng(0)
    optimizer = optax.adam(1e-4)

    # ---- encoder: 64 spk × 10 utt × 160 frames ------------------------------
    model = SpeakerEncoder()
    S, U = 64, 10
    batch = jnp.asarray(
        rng.standard_normal((S * U, 160, 40)).astype(np.float32)
    )
    params = {
        "model": model.init(jax.random.PRNGKey(0), batch)["params"],
        "similarity": init_similarity_params(),
    }
    opt_state = optimizer.init(params)
    step = make_encoder_train_step(model, optimizer, S, U)

    def enc_step(p, o):
        p, o, stats, _, _ = step(p, o, batch)
        return p, o, stats

    # cost BEFORE the first run (the step donates its buffers)
    enc_flops, enc_bytes = xla_cost(step, params, opt_state, batch)

    # timing loop: carry params through and read the loss each step so the
    # device work can't be elided
    p, o = params, opt_state
    p, o, st = enc_step(p, o)
    float(st["loss"])
    t0 = time.perf_counter()
    N = 5
    for _ in range(N):
        p, o, st = enc_step(p, o)
    float(st["loss"])
    dt = (time.perf_counter() - t0) / N
    print(json.dumps({"metric": "encoder_train", "value": round(1.0 / dt, 3), "unit": "steps/s", "batch": f"{S}x{U}x160", **summarize(enc_flops, dt, enc_bytes)}), flush=True)

    # ---- tacotron: first-session schedule (r=7, batch 112) ------------------
    bundle = factories.init_syn_model(factories.MODEL_TYPE_TACOTRON, seed=0)
    d = bundle.dims
    r, B, T_text, frames = 7, 112, 160, 896  # 896 = 128·7 mel frames
    tstep = make_tacotron_train_step(d, optimizer, r=r)
    tbatch = {
        "chars": jnp.asarray(rng.integers(1, d.num_chars, (B, T_text)), jnp.int32),
        "mels": jnp.asarray(rng.uniform(-4, 4, (B, d.n_mels, frames)), jnp.float32),
        "embeds": jnp.asarray(rng.standard_normal((B, 768)), jnp.float32),
        "stop": jnp.ones((B, frames), jnp.float32),
    }
    tp, ts_ = bundle.variables["params"], bundle.variables["batch_stats"]
    to = optimizer.init(tp)
    key = jax.random.PRNGKey(0)
    t_flops, t_bytes = xla_cost(tstep, tp, ts_, to, tbatch, key)
    tp, ts_, to, stats, _ = tstep(tp, ts_, to, tbatch, key)
    float(stats["loss"])
    t0 = time.perf_counter()
    for _ in range(N):
        tp, ts_, to, stats, _ = tstep(tp, ts_, to, tbatch, key)
    float(stats["loss"])
    dt = (time.perf_counter() - t0) / N
    print(json.dumps({"metric": "tacotron_train", "value": round(1.0 / dt, 3), "unit": "steps/s", "batch": f"{B}x{frames}f r={r}", **summarize(t_flops, dt, t_bytes)}), flush=True)

    # ---- wavernn: first-session schedule (batch 40, seq 1000) ---------------
    vb = factories.init_voc_model(factories.MODEL_TYPE_FATCHORD, seed=0)
    vd = vb.dims
    B = 40
    seq = vd.hop_length * 5
    mel_win = seq // vd.hop_length + 2 * vd.pad
    vstep = make_wavernn_train_step(vd, optimizer)
    vbatch = {
        "x": jnp.asarray(rng.uniform(-1, 1, (B, seq)), jnp.float32),
        "y": jnp.asarray(rng.integers(0, 1024, (B, seq)), jnp.int32),
        "y_float": jnp.asarray(rng.uniform(-1, 1, (B, seq)), jnp.float32),
        "mels": jnp.asarray(rng.uniform(-1, 1, (B, vd.feat_dims, mel_win)), jnp.float32),
    }
    vp, vs = vb.variables["params"], vb.variables["batch_stats"]
    vo = optimizer.init(vp)
    v_flops, v_bytes = xla_cost(vstep, vp, vs, vo, vbatch)
    vp, vs, vo, stats = vstep(vp, vs, vo, vbatch)
    float(stats["loss"])
    t0 = time.perf_counter()
    for _ in range(N):
        vp, vs, vo, stats = vstep(vp, vs, vo, vbatch)
    float(stats["loss"])
    dt = (time.perf_counter() - t0) / N
    print(json.dumps({"metric": "wavernn_train", "value": round(1.0 / dt, 3), "unit": "steps/s", "batch": f"{B}x{seq}", **summarize(v_flops, dt, v_bytes)}), flush=True)


if __name__ == "__main__":
    main()
    # The axon PJRT client can hang in teardown after remote compiles; the
    # output is already flushed, so exit hard to keep CI/driver runs snappy.
    import os
    import sys

    sys.stdout.flush()
    os._exit(0)
