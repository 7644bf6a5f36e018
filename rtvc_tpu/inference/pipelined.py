"""Sustained-throughput vocoding: keep several device dispatches in flight.

Every synchronous dispatch through a remote TPU runtime pays a round-trip
(27 ms on this axon relay); serving one utterance at a time caps throughput
far below what the chip sustains. This module turns the pipelined-dispatch
pattern the benchmarks use (bench.py device-time metric: 16 async
dispatches, one transfer → 6610 kHz vs ~1100 kHz synchronous) into a public
streaming API: dispatch up to ``depth`` fused generate graphs ahead of the
consumer and transfer results as they are drained, preserving order.

JAX's async dispatch does the scheduling — we only avoid forcing a transfer
after every call. Frame-count bucketing (same as ``wavernn_generate``)
keeps the set of compiled graphs small across varying utterance lengths.
"""
from __future__ import annotations

from collections import deque
from typing import Any, Iterable, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp


def vocode_pipelined(
    variables,
    dims,
    mels: Iterable[np.ndarray],
    key: jax.Array,
    depth: int = 8,
    target: int = 400,
    overlap: int = 160,
    mu_law: bool = True,
    apply_preemphasis: bool = True,
    compute_dtype: Any = jnp.float32,
    use_pallas: Optional[bool] = None,
) -> Iterator[np.ndarray]:
    """Vocode a stream of mels; yields float64 waveforms in input order.

    ``mels``: iterable of (n_mels, T_i) normalized mels (generator-friendly —
    utterances are dispatched lazily as the window advances). ``depth``
    bounds device-queue memory: at most ``depth`` utterances are in flight.
    """
    from rtvc_tpu.models.wavernn import (
        _FRAME_BUCKET,
        MODE_RAW,
        VOC_GENEING,
        _generate_pipeline,
    )
    from rtvc_tpu.ops.audio import decode_mu_law  # noqa: F401 (doc pointer)

    d = dims
    mu_law = mu_law if d.mode == MODE_RAW else False
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"

    def dispatch(i, mel):
        mel = np.asarray(mel, np.float32)
        if mel.ndim != 2 or mel.shape[0] != d.feat_dims:
            raise ValueError(
                f"mel {i}: expected ({d.feat_dims}, T), got {mel.shape}"
            )
        n_frames = mel.shape[-1]
        if n_frames < 2:
            raise ValueError(f"mel {i}: need at least 2 frames")
        bucket = -(-n_frames // _FRAME_BUCKET) * _FRAME_BUCKET
        padded = np.pad(mel[None], ((0, 0), (0, 0), (0, bucket - n_frames)),
                        constant_values=-1.0)
        out = _generate_pipeline(
            variables, d, jnp.asarray(padded), jax.random.fold_in(key, i),
            True, target, overlap, mu_law, apply_preemphasis, compute_dtype,
            use_pallas,
        )
        # NB: no copy_to_host_async() here — on the axon remote runtime it
        # stalls the stream instead of overlapping it (measured); the
        # per-yield synchronous transfer is the documented cost.
        return out, (n_frames - 1) * d.hop_length

    def finish(out, wave_len):
        wav = np.array(out[:wave_len], dtype=np.float64)  # the only sync
        fade_len = min(20 * d.hop_length, len(wav))
        if fade_len:
            wav[-fade_len:] *= np.linspace(1.0, 0.0, fade_len)
        return wav

    window: deque = deque()
    for i, mel in enumerate(mels):
        window.append(dispatch(i, mel))
        if len(window) >= depth:
            yield finish(*window.popleft())
    while window:
        yield finish(*window.popleft())
