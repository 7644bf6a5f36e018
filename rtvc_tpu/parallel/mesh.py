"""Device mesh + sharding helpers.

The reference's only parallelism is data-parallel DDP via HuggingFace
Accelerate (ref: encoder/train.py:16,79; SURVEY.md §2.10). TPU-native
equivalent: a ``jax.sharding.Mesh`` with a ``data`` axis; batches are sharded
over it with ``NamedSharding`` and gradient all-reduce falls out of jit'ing
the loss over sharded inputs (XLA inserts the psum over ICI).

``fold`` is a second axis used by vocoder generation to spread
fold-with-overlap windows across chips (sequence parallelism for AR
generation — the reference fakes this with CPU threads,
ref: libwavernn/inference.py:87-114).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FOLD_AXIS = "fold"


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = DATA_AXIS
) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place every array in a pytree with its batch axis sharded over the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate_tree(tree, mesh: Mesh):
    """Replicate params/optimizer state across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def process_index() -> int:
    """Rank predicate (Accelerate ``is_local_main_process`` equivalent,
    ref: synthesizer/preprocess.py:459-465)."""
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def wait_for_everyone() -> None:
    """Barrier across hosts (Accelerate ``wait_for_everyone`` equivalent)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("rtvc_tpu_barrier")
