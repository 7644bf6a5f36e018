"""Operating-point sweep for batched WaveRNN generation on TPU: fold window
(target/overlap) × compute dtype, measured as sustained pipelined device
rate (8 async dispatches, one transfer — see bench.py). Pair with the
fold-fidelity quality metrics (rtvc_tpu/utils/genquality.py, scaled sweep in
tests/test_generation_quality.py) when changing the default.

Prints one JSON line per configuration.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rtvc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from rtvc_tpu.models import factories
    from rtvc_tpu.models.wavernn import _FRAME_BUCKET, _generate_pipeline

    bundle = factories.init_voc_model(factories.MODEL_TYPE_RUNTIMERACER, seed=0)
    d = bundle.dims
    n_frames = 400  # ~5 s at 16 kHz
    rng = np.random.default_rng(0)
    mel = rng.uniform(-1.0, 1.0, (d.feat_dims, n_frames)).astype(np.float32)
    bucket = -(-n_frames // _FRAME_BUCKET) * _FRAME_BUCKET
    mels = jnp.asarray(
        np.pad(mel[None], ((0, 0), (0, 0), (0, bucket - n_frames)),
               constant_values=-1.0)
    )
    wave_len = (n_frames - 1) * d.hop_length

    windows = [(2000, 800), (1000, 400), (600, 240), (400, 160), (300, 120)]
    dtypes = [("f32", jnp.float32), ("bf16", jnp.bfloat16)]

    for target, overlap in windows:
        for dt_name, dt in dtypes:
            try:
                def dispatch(i):
                    return _generate_pipeline(
                        bundle.variables, d, mels, jax.random.PRNGKey(i),
                        True, target, overlap, True, True, dt, True,
                    )

                np.asarray(dispatch(0))  # compile
                N = 8
                t0 = time.perf_counter()
                outs = [dispatch(i) for i in range(1, N + 1)]
                np.asarray(outs[-1])
                dt_s = (time.perf_counter() - t0) / N
                khz = wave_len / dt_s / 1000.0
                print(json.dumps({
                    "target": target, "overlap": overlap, "dtype": dt_name,
                    "khz": round(khz, 1),
                    "rtf_22k": round(khz * 1000 / 22050, 1),
                    "folds": int(np.ceil(wave_len / (target + overlap))),
                }), flush=True)
            except Exception as e:
                print(json.dumps({
                    "target": target, "overlap": overlap, "dtype": dt_name,
                    "error": str(e)[:100],
                }), flush=True)


if __name__ == "__main__":
    main()
    import os
    import sys

    sys.stdout.flush()
    os._exit(0)
