"""Native-engine sparse-vs-dense throughput benchmark.

The reference's structured pruning exists to make its C++ engine fast —
group-4 sparse GEMV is its entire CPU speed story (ref: vocoder/libwavernn/
runtimeracer_version/src/wavernn.h:23-92, wavernn.cpp:162-184;
sparsity_target 0.90+ in config/hparams.py:271,339,407). This measures that
payoff on our engine: the production runtimeracer graph pruned to the
reference's design sparsity (0.90 dense / 0.90 GRU, group 4), run through
the SAME engine with the weights stored (a) group-sparse and (b) forced
dense — identical math, isolating the sparse-GEMV kernel — plus the
unpruned dense model as the no-pruning baseline.

Prints one JSON line per configuration: single-thread kHz + the sparse
speedup, and the .bin size shrink.
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from rtvc_tpu.models import factories
    from rtvc_tpu.native import libwavernn
    from rtvc_tpu.native.convert import export_wavernn
    from rtvc_tpu.train.pruning import apply_prune_masks, compute_prune_masks

    import tempfile

    bundle = factories.init_voc_model(factories.MODEL_TYPE_RUNTIMERACER, seed=0)
    d = bundle.dims
    cfg = bundle.config
    variables = bundle.variables

    masks = compute_prune_masks(
        variables["params"], d, jnp.asarray(10**9), 0, 100,
        cfg.sparsity_target, cfg.sparsity_target_rnn, cfg.sparse_group,
    )
    pruned = {
        "params": apply_prune_masks(variables["params"], masks),
        "batch_stats": variables["batch_stats"],
    }

    tmp = Path(tempfile.mkdtemp())
    paths = {
        "dense_unpruned": (variables, 1.1, "f32"),
        "dense_pruned": (pruned, 1.1, "f32"),   # same zeros, dense storage
        "sparse_pruned": (pruned, 0.5, "f32"),  # group-sparse storage
        # f16 weights (round 4): the sample loop is DRAM-bandwidth-bound,
        # so halving the streamed bytes ~halves wall time (decode parity
        # gated in tests/test_native.py::TestF16Weights)
        "sparse_pruned_f16": (pruned, 0.5, "f16"),
        "dense_unpruned_f16": (variables, 1.1, "f16"),
    }
    lib = libwavernn._load_lib()

    n_frames = 120  # ~1.5 s of audio at hop 200
    rng = np.random.default_rng(0)
    mel = rng.uniform(-1, 1, (d.feat_dims, n_frames)).astype(np.float32)

    results = {}
    for name, (v, thresh, wdt) in paths.items():
        path = tmp / f"{name}.bin"
        export_wavernn(v, d, path, sparse_threshold=thresh, weight_dtype=wdt)
        inst = libwavernn._Instance(lib, path)
        inst.set_seed(0)
        wav = inst.mel_to_wav(mel)            # warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            wav = inst.mel_to_wav(mel)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        khz = len(wav) / dt / 1000.0
        results[name] = {"khz": khz, "bin_mb": path.stat().st_size / 2**20}
        del inst

    # lockstep ILP batching (round 4): B fold chunks per instance call
    from rtvc_tpu.native.libwavernn import _Instance

    inst = _Instance(lib, tmp / "sparse_pruned.bin")
    inst.set_seed(0)
    n_chunk = 34  # ~ one fold chunk (gen_target/hop + 2*overlap/hop)
    for B in (4, 8):
        mels = rng.uniform(-1, 1, (B, d.feat_dims, n_chunk)).astype(np.float32)
        inst.mel_to_wav_batch(mels)  # warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            w = inst.mel_to_wav_batch(mels)
            times.append(time.perf_counter() - t0)
        khz = w.size / float(np.median(times)) / 1000.0
        print(json.dumps({
            "metric": f"native_sparse_lockstep_b{B}",
            "value": round(khz, 1), "unit": "kHz",
            "realtime_x": round(khz / 16.0, 2),
        }), flush=True)
    del inst

    # composed mode (round 4): M per-core instances × B lockstep chains
    # through the public wrapper — the full deployment story, fold/unfold
    # host work included. This box has 1 core, so the M axis shows ~the
    # lockstep number; on an M-core deploy it multiplies.
    voc = libwavernn.Vocoder(tmp / "sparse_pruned.bin",
                             "runtimeracer-wavernn", verbose=False, batch=8)
    voc.cfg = cfg
    voc.load()  # per-core instance pool
    voc.setRandomSeed(0)
    long_mel = rng.uniform(-1, 1, (d.feat_dims, 400)).astype(np.float32)
    voc.vocode_mel(long_mel, normalize=False)  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        w = voc.vocode_mel(long_mel, normalize=False)
        times.append(time.perf_counter() - t0)
    khz = len(w) / float(np.median(times)) / 1000.0
    print(json.dumps({
        "metric": "native_composed_b8",
        "value": round(khz, 1), "unit": "kHz",
        "instances": len(voc._instances),
        "realtime_x": round(khz / 16.0, 2),
    }), flush=True)
    del voc

    speedup = results["sparse_pruned"]["khz"] / results["dense_pruned"]["khz"]
    shrink = (results["dense_pruned"]["bin_mb"]
              / results["sparse_pruned"]["bin_mb"])
    for name, r in results.items():
        print(json.dumps({
            "metric": f"native_{name}",
            "value": round(r["khz"], 1),
            "unit": "kHz",
            "bin_mb": round(r["bin_mb"], 2),
        }), flush=True)
    f16_speedup = (results["sparse_pruned_f16"]["khz"]
                   / results["sparse_pruned"]["khz"])
    print(json.dumps({
        "metric": "native_f16_speedup",
        "value": round(f16_speedup, 2),
        "unit": "x (f16/f32 weights, sparse, 1 thread)",
        "khz": round(results["sparse_pruned_f16"]["khz"], 1),
        "realtime_x": round(results["sparse_pruned_f16"]["khz"] / 16.0, 2),
    }), flush=True)
    print(json.dumps({
        "metric": "native_sparse_speedup",
        "value": round(speedup, 2),
        "unit": "x (sparse/dense, same pruned weights, 1 thread)",
        "size_shrink": round(shrink, 2),
        "sparsity": f"{cfg.sparsity_target}/{cfg.sparsity_target_rnn} group "
                    f"{cfg.sparse_group}",
    }), flush=True)


if __name__ == "__main__":
    main()
