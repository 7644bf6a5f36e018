"""Structured group-sparsity pruning for WaveRNN (ref: vocoder/pruner.py).

Group-of-4 magnitude pruning with the cubic sparsity ramp
``z = Z·(1 − (1 − (t − t₀)/S)³)`` (ref: vocoder/pruner.py:110-113), per-gate
thresholds for GRU matrices (ref: PruneMask.mask_from_matrix :60-88).

TPU-native: instead of mutating layer weights in place, pruning is a pure
function params → masked params (+ masks), jittable and applied inside the
training step. The same masks drive the sparse export for the native C++
engine (group-compressed format, see rtvc_tpu/native/convert.py).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from rtvc_tpu.models.wavernn import (
    VOC_FATCHORD,
    VOC_GENEING,
    VOC_RUNTIMERACER,
    WaveRNNDims,
)


def cubic_sparsity(step: jax.Array, start_prune: int, prune_steps: int,
                   target: float) -> jax.Array:
    """Sparsity level at ``step`` (ref: vocoder/pruner.py:110-113)."""
    z = target * (1.0 - (1.0 - (step - start_prune) / prune_steps) ** 3)
    return jnp.clip(z, 0.0, target)


def group_prune_mask(
    W: jax.Array, z: jax.Array, sparse_group: int, splits: int
) -> jax.Array:
    """Binary keep-mask for a (rows, cols) matrix.

    Columns are grouped in blocks of ``sparse_group``; each block is kept or
    zeroed whole (CPU-SIMD-friendly structure the reference's C++ engine
    exploits, ref: wavernn.h:23-92). Rows are split into ``splits`` gate
    sections with independent thresholds (ref: PruneMask.mask_from_matrix).
    """
    rows, cols = W.shape
    G = cols // sparse_group
    sec = rows // splits
    # (splits, sec, G, group)
    L = jnp.abs(W).reshape(splits, sec, G, sparse_group)
    S = L.sum(axis=3)  # (splits, sec, G)
    flat = S.reshape(splits, sec * G)
    k = (sec * G * z).astype(jnp.int32)  # number of groups to zero per split
    k = jnp.clip(k, 0, sec * G - 1)
    sorted_S = jnp.sort(flat, axis=1)
    # threshold = k-th smallest (ref picks sorted_abs[k]; groups < thr pruned)
    idx = jnp.broadcast_to(jnp.reshape(k, (-1,) if jnp.ndim(k) else (1,)),
                           (splits,))[:, None]
    thresh = jnp.take_along_axis(sorted_S, idx, axis=1)
    mask = (S >= thresh[:, :, None]).astype(W.dtype)
    mask = jnp.repeat(mask, sparse_group, axis=2).reshape(splits, sec, cols)
    return mask.reshape(rows, cols)


def prunable_weights(d: WaveRNNDims) -> List[Tuple[str, str, int]]:
    """(param-path name, weight key, gate splits) for every pruned matrix
    (ref prune_layers: fatchord_version.py:116, runtimeracer_version.py:134,
    geneing_version.py:116; rnn input+hidden matrices both pruned —
    prune_rnn_input=True at vocoder/models/base.py wiring)."""
    rnns = {
        VOC_FATCHORD: ["rnn1", "rnn2"],
        VOC_GENEING: ["rnn1"],
        VOC_RUNTIMERACER: ["rnn1", "rnn2", "rnn3", "rnn4"],
    }[d.variant]
    fcs = {
        VOC_FATCHORD: ["I", "fc1", "fc2", "fc3"],
        VOC_GENEING: ["I", "fc1", "fc3"],
        VOC_RUNTIMERACER: ["I", "fc1", "fc2", "fc3", "fc4", "fc5"],
    }[d.variant]
    out: List[Tuple[str, str, int]] = []
    for nm in fcs:
        out.append((nm, "weight", 1))
    for nm in rnns:
        out.append((nm, "weight_ih_l0", 3))
        out.append((nm, "weight_hh_l0", 3))
    return out


def compute_prune_masks(
    params: Dict[str, Any],
    d: WaveRNNDims,
    step: jax.Array,
    start_prune: int,
    prune_steps: int,
    sparsity_target: float,
    sparsity_target_rnn: float,
    sparse_group: int,
) -> Dict[str, Dict[str, jax.Array]]:
    """Masks for every prunable matrix at training step ``step``."""
    masks: Dict[str, Dict[str, jax.Array]] = {}
    for name, key, splits in prunable_weights(d):
        target = sparsity_target_rnn if splits > 1 else sparsity_target
        z = cubic_sparsity(step, start_prune, prune_steps, target)
        W = params[name][key]
        if W.shape[1] % sparse_group != 0:
            # Conditioning input of I is not group-aligned; prune whole matrix
            # by single columns instead (group=1 keeps behavior sane).
            masks.setdefault(name, {})[key] = group_prune_mask(W, z, 1, splits)
        else:
            masks.setdefault(name, {})[key] = group_prune_mask(
                W, z, sparse_group, splits
            )
    return masks


def apply_prune_masks(
    params: Dict[str, Any], masks: Dict[str, Dict[str, jax.Array]]
) -> Dict[str, Any]:
    """params → masked params (pure; ref applies in place each step,
    vocoder/train.py:212-219)."""
    out = dict(params)
    for name, entry in masks.items():
        sub = dict(out[name])
        for key, m in entry.items():
            sub[key] = sub[key] * m
        out[name] = sub
    return out


def count_pruned(masks: Dict[str, Dict[str, jax.Array]]) -> Tuple[int, int]:
    """(num zeroed weights, total prunable weights)."""
    pruned = 0
    total = 0
    for entry in masks.values():
        for m in entry.values():
            pruned += int(jnp.sum(1.0 - m))
            total += m.size
    return pruned, total
