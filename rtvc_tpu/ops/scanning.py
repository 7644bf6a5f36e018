"""Scan policy for the recurrent training paths.

``lax.scan`` emits one XLA While iteration per timestep; ``unroll=k``
replicates the body k times per iteration, amortizing loop overhead and
letting XLA fuse/pipeline across consecutive steps — worthwhile for the
small per-step matmuls of teacher-forced RNN training (the reference has
no equivalent knob; cuDNN RNNs hide this inside the kernel).

The default is chosen by the round-4 ablation in BENCHMARKS.md
(``bench_train.py`` with ``RTVC_SCAN_UNROLL`` swept); override via the
environment variable. Semantics are unchanged for any value — unroll only
changes code layout, not the math.
"""
from __future__ import annotations

import os

# round-4 sweep (BENCHMARKS.md): unroll=4 beat 2 on every recurrent stage
# (Tacotron +26 %, WaveRNN scan +14 %, encoder +2.5 %, bf16 same-chain).
# Off-TPU the sweep has no basis and a 4x scan body only slows CPU
# compiles (tests, the driver's virtual-device dryrun), so non-TPU
# backends keep unroll=1 unless the env var overrides.
_DEFAULT_UNROLL = 4


def scan_unroll() -> int:
    """Unroll factor for training-path recurrent scans (trace-time)."""
    env = os.environ.get("RTVC_SCAN_UNROLL")
    if env is not None:
        return int(env)
    try:
        import jax

        if jax.default_backend() != "tpu":
            return 1
    except Exception:  # pragma: no cover
        return 1
    return _DEFAULT_UNROLL
