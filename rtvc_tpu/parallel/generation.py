"""Multi-chip vocoder generation: fold-with-overlap windows sharded over the
device mesh.

The reference parallelizes long-utterance AR generation with one CPU thread
per core, each running a chunk (ref: vocoder/libwavernn/inference.py:37-114).
The TPU-native equivalent: fold windows form a batch axis, and that axis is
sharded over the mesh's ``fold`` axis with ``NamedSharding`` — every chip
runs the same fused AR scan on its shard of windows, with zero cross-chip
communication until the final gather (SURVEY.md §5.7's mapping).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rtvc_tpu.models.wavernn import (
    WaveRNNDims,
    fold_with_overlap,
    generate_core,
    upsample_forward,
    xfade_and_unfold,
)


@functools.lru_cache(maxsize=16)
def _sharded_run(d: WaveRNNDims, mesh: Mesh, axis: str, compute_dtype):
    """Jitted sharded AR core, cached per (dims, mesh, dtype) — a fresh jit
    inside generate_sharded re-traced on every utterance."""
    fold_sharding = NamedSharding(mesh, P(axis))

    @functools.partial(jax.jit, out_shardings=fold_sharding)
    def _run(variables, mels_up, aux, key):
        return generate_core(
            variables, d, mels_up, aux, key, compute_dtype=compute_dtype
        )

    return _run


def generate_sharded(
    variables: Dict,
    d: WaveRNNDims,
    mels: np.ndarray,
    key: jax.Array,
    mesh: Mesh,
    target: int = 6000,
    overlap: int = 1000,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Batched generation with folds sharded over ``mesh`` (1-D, axis named
    'fold' or whatever the mesh's only axis is). Returns the raw sample
    stream (pre mu-law/de-emphasis), unfolded, on the host."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    mels = jnp.asarray(mels, jnp.float32)
    if mels.ndim == 2:
        mels = mels[None]
    mels = jnp.pad(mels, ((0, 0), (0, 0), (d.pad, d.pad)))
    mels_up, aux, _ = upsample_forward(
        variables["params"]["upsample"], variables["batch_stats"]["upsample"],
        d, mels, train=False,
    )
    mels_up, n_folds = fold_with_overlap(mels_up, target, overlap)
    aux, _ = fold_with_overlap(aux, target, overlap)

    # Pad folds to a mesh multiple so the shard is even.
    padded_folds = -(-n_folds // n_dev) * n_dev
    if padded_folds != n_folds:
        extra = padded_folds - n_folds
        mels_up = jnp.pad(mels_up, ((0, extra), (0, 0), (0, 0)))
        aux = jnp.pad(aux, ((0, extra), (0, 0), (0, 0)))

    fold_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    mels_up = jax.device_put(mels_up, fold_sharding)
    aux = jax.device_put(aux, fold_sharding)
    variables = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated), variables
    )

    _run = _sharded_run(d, mesh, axis, compute_dtype)
    with mesh:
        samples = _run(variables, mels_up, aux, key)
    samples = samples[:n_folds]
    return xfade_and_unfold(samples, target, overlap)
