"""Roofline / MFU accounting for benchmark scripts.

The round-2 review's gap: kHz/RTF numbers said nothing about how close any
kernel sits to the hardware ceiling. This module turns measured step times
into model-FLOPs-utilization (MFU) and HBM-bandwidth fractions so
BENCHMARKS.md can state "x% of peak" per workload, computed by the bench
scripts rather than by hand.

FLOP counts come from XLA itself: ``jit(f).lower(*args).compile()
.cost_analysis()`` reports the optimized HLO's flops and bytes. For the
Pallas WaveRNN kernel (a custom call XLA cannot cost), the SAME generation
workload compiled on the XLA-scan backend supplies the FLOP count — both
backends execute the identical per-step math (hoisted projections + GRU
stack + head), so workload FLOPs are backend-independent; only achieved
time differs.

Peaks assumed (single TPU v5e / "v5 lite" chip, public spec):
  * 197 TFLOP/s bf16 (MXU); f32 matmuls run well below this — MFU here is
    always reported against the bf16 peak, the conventional denominator;
  * 819 GB/s HBM bandwidth, 16 GiB capacity.
On non-TPU backends (CPU CI) the helpers still run; the MFU column is then
meaningless and callers should gate on the platform.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def xla_cost(jitted_fn, *args, **kwargs) -> Tuple[float, float]:
    """(flops, bytes_accessed) of the compiled graph for these arguments.

    Works on any jitted callable; compilation is cached by jax so calling
    this next to a timing loop costs one lowering.
    """
    compiled = jitted_fn.lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jaxlib returned [dict]
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    return flops, bytes_accessed


def summarize(
    flops: float,
    seconds: float,
    bytes_accessed: Optional[float] = None,
    peak_flops: float = V5E_PEAK_BF16_FLOPS,
    peak_bw: float = V5E_HBM_BYTES_PER_S,
) -> Dict[str, Any]:
    """Measured time + workload size → achieved rates and peak fractions."""
    out: Dict[str, Any] = {
        "gflops": round(flops / 1e9, 2),
        "achieved_tflops": round(flops / seconds / 1e12, 3),
        "mfu_pct": round(100.0 * flops / seconds / peak_flops, 2),
    }
    if bytes_accessed is not None:
        out["gbytes"] = round(bytes_accessed / 1e9, 3)
        out["achieved_gbps"] = round(bytes_accessed / seconds / 1e9, 1)
        out["hbm_pct"] = round(
            100.0 * bytes_accessed / seconds / peak_bw, 1
        )
    return out


def on_tpu() -> bool:
    import jax

    return jax.devices()[0].platform == "tpu"
