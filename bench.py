"""Benchmark: WaveRNN batched generation rate (the reference's headline
metric — kHz generated per wall-second / real-time factor,
ref instruments: vocoder/models/fatchord_version.py:234-236,262-265;
toolbox/toolbox.py:293-298).

Measures the full user-facing path (upsample → fold → AR scan → unfold →
mu-law decode → de-emphasis) on a ~5 s utterance with the production
runtimeracer configuration, after a compile warmup.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value
is kHz of output audio per wall-second and vs_baseline is the real-time
factor against 22.05 kHz (north star: ≥10× RT on one TPU core;
BASELINE.json publishes no reference numbers).

NB: timings force a device→host transfer (np.asarray) because
block_until_ready does not reliably block on the axon TPU platform.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from rtvc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from rtvc_tpu.config.vocoder import wavernn_runtimeracer as cfg
    from rtvc_tpu.models import factories
    from rtvc_tpu.models.wavernn import wavernn_generate

    bundle = factories.init_voc_model(factories.MODEL_TYPE_RUNTIMERACER, seed=0)
    d = bundle.dims

    # ~5 s of speech at 16 kHz: 400 mel frames → 79.8k samples out.
    n_frames = 400
    rng = np.random.default_rng(0)
    mel = rng.uniform(-1.0, 1.0, (d.feat_dims, n_frames)).astype(np.float32)

    # TPU-tuned operating point (swept on v5e): small fold windows keep the
    # sequential scan short (time ∝ window length; folds are free batch
    # parallelism). The Pallas fused kernel pins all weights in VMEM across
    # the whole waveform: 1000/400 f32 → 1438 kHz (65× RT) in the core loop
    # vs 1057 kHz for the XLA scan.
    import jax.numpy as jnp

    # TPU serving default (quality-validated; see BENCHMARKS.md sweep)
    target, overlap = 400, 160

    def run(i, use_pallas=True):
        return wavernn_generate(
            bundle.variables, d, mel, jax.random.PRNGKey(i),
            batched=True, target=target, overlap=overlap,
            mu_law=cfg.mu_law, apply_preemphasis=True,
            use_pallas=use_pallas,
        )

    use_pallas = True
    try:
        wav = run(0)  # warmup / compile
    except Exception:
        # Pallas unavailable on this backend — fall back to the XLA scan
        use_pallas = False
        run = lambda i, _orig=run: _orig(i, use_pallas=False)  # noqa: E731
        wav = run(0)
    wave_len = len(wav)

    # e2e wall-clock (tunnel-inclusive): one synchronous call per timing.
    times = []
    for i in range(1, 4):
        t0 = time.perf_counter()
        wav = run(i)  # wavernn_generate returns numpy → implies full sync
        times.append(time.perf_counter() - t0)
    dt_e2e = float(np.median(times))
    e2e_khz = wave_len / dt_e2e / 1000.0

    # Device-time metric: the axon relay costs ~27 ms per synchronous
    # dispatch, which swings the e2e number with tunnel load
    # (BENCHMARKS.md caveat). Pipeline N async dispatches of the single
    # fused _generate_pipeline graph and transfer once — per-run time then
    # reflects device execution, which is the stable cross-round signal.
    from rtvc_tpu.models.wavernn import _FRAME_BUCKET, _generate_pipeline

    bucket = -(-n_frames // _FRAME_BUCKET) * _FRAME_BUCKET
    mels_dev = jnp.asarray(
        np.pad(mel[None], ((0, 0), (0, 0), (0, bucket - n_frames)),
               constant_values=-1.0),
        jnp.float32,
    )

    def dispatch(i):
        return _generate_pipeline(
            bundle.variables, d, mels_dev, jax.random.PRNGKey(100 + i),
            True, target, overlap, cfg.mu_law, True, jnp.float32, use_pallas,
        )

    np.asarray(dispatch(0))  # warmup this exact call signature
    N = 16
    # Spread-gated chains (round-4 verdict item 4): run pipelined chains
    # until the best-3 agree within TARGET_SPREAD (so a real ~5 % regression
    # can't hide inside session noise), up to MAX_CHAINS; the headline is
    # the MEDIAN of the best 3 (not the min), making it a reproducible
    # statistic rather than a lucky tail draw.
    TARGET_SPREAD, MAX_CHAINS = 2.0, 10
    reps = []
    spread_pct = float("inf")
    for rep in range(MAX_CHAINS):
        t0 = time.perf_counter()
        outs = [dispatch(100 * rep + i) for i in range(1, N + 1)]
        np.asarray(outs[-1])  # one transfer drains the whole pipeline
        reps.append((time.perf_counter() - t0) / N)
        if len(reps) >= 3:
            best3 = sorted(reps)[:3]
            spread_pct = 100.0 * (best3[-1] - best3[0]) / max(best3[1], 1e-12)
            if spread_pct <= TARGET_SPREAD:
                break
    best3 = sorted(reps)[:3]
    dt_dev = float(best3[1])  # median of the best 3 chains
    dev_khz = wave_len / dt_dev / 1000.0
    rtf_2205 = dev_khz * 1000.0 / 22050.0

    # Roofline (round 3): workload FLOPs from XLA's cost model on the
    # XLA-scan backend — both backends run the identical per-step math, so
    # this is the Pallas kernel's FLOP count too. Streamed-conditioning
    # bytes are computed analytically from the kernel's stream widths.
    from rtvc_tpu.models.wavernn import VOC_GENEING, fold_with_overlap
    from rtvc_tpu.utils.roofline import summarize, xla_cost

    flops, _ = xla_cost(
        _generate_pipeline, bundle.variables, d, mels_dev,
        jax.random.PRNGKey(0), True, target, overlap, cfg.mu_law, True,
        jnp.float32, False,
    )
    roof = summarize(flops, dt_dev)
    # stream traffic: i_cond (R) + per-variant hoisted projections
    R, F = d.rnn_dims, d.fc_dims
    if d.variant == VOC_GENEING:
        width = R + F              # i_cond + fc1_aux
    else:
        width = R + 3 * R + 2 * F  # i_cond + gru aux proj + 2 fc aux projs
    T_up = bucket * d.hop_length
    _, n_folds = fold_with_overlap(
        jnp.zeros((1, T_up, 1), jnp.float32), target, overlap
    )
    stream_bytes = n_folds * (target + 2 * overlap) * width * 2  # bf16 streams
    roof["stream_gbps"] = round(stream_bytes / dt_dev / 1e9, 1)

    print(
        json.dumps(
            {
                "metric": "wavernn_gen_rate_device",
                "value": round(dev_khz, 2),
                "unit": "kHz",
                "vs_baseline": round(rtf_2205, 2),
                "e2e_khz": round(e2e_khz, 2),
                "e2e_rtf_2205": round(e2e_khz * 1000.0 / 22050.0, 2),
                "rep_spread_pct": round(spread_pct, 1),
                "n_chains": len(reps),
                **roof,
            }
        )
    )


if __name__ == "__main__":
    main()
    # The axon PJRT client can hang in teardown after remote compiles; the
    # output is already flushed, so exit hard to keep CI/driver runs snappy.
    import os
    import sys

    sys.stdout.flush()
    os._exit(0)
