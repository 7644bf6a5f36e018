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
    """1-D mesh over the first ``n_devices`` devices (all by default).

    Fails loudly when fewer devices exist than requested (silent truncation
    would hand callers a smaller mesh than they asked for). To simulate a
    multi-chip mesh on a single-host CPU, use ``force_virtual_devices(n)``
    before any backend query.
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"make_mesh({n_devices}) but only {len(devices)} JAX device(s) "
                f"present ({devices[0].platform}). For a simulated multi-chip "
                f"mesh call rtvc_tpu.parallel.mesh.force_virtual_devices"
                f"({n_devices}) first."
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def force_virtual_devices(n_devices: int) -> None:
    """Ensure ≥ ``n_devices`` JAX devices exist, forcing a virtual CPU
    platform if the real one is too small.

    Multi-chip TPU hardware is unavailable in this environment; sharding
    structure is validated on XLA's host platform with ``n`` virtual devices
    (``--xla_force_host_platform_device_count``). Safe to call when enough
    devices already exist (no-op) or before/after ``import jax`` — the
    container's sitecustomize pre-imports jax with ``JAX_PLATFORMS=axon``,
    so the env var alone is not enough and the live config is updated too.
    If a too-small backend was already initialised it is discarded and
    re-created against the updated flags.
    """
    import os

    from jax._src import xla_bridge

    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        )
    if xla_bridge._backends:
        # A backend exists already (real TPU, or CPU with a smaller virtual
        # count). If it is big enough, keep it; otherwise drop it — both the
        # backend registry and get_backend's memo cache — so the next device
        # query re-creates the CPU client against the updated device count.
        if jax.devices()[0].platform == "cpu" and len(jax.devices()) >= n_devices:
            return
        xla_bridge._clear_backends()
        xla_bridge.get_backend.cache_clear()
    if jax.config.jax_num_cpu_devices < n_devices:
        # Read by make_cpu_client at client creation (unlike XLA_FLAGS, which
        # jax only consults at first init); the validator allows the update
        # now that no backend is live.
        jax.config.update("jax_num_cpu_devices", n_devices)
    n = len(jax.devices())
    if n < n_devices:
        raise RuntimeError(
            f"force_virtual_devices({n_devices}): still only {n} device(s) "
            "after re-initialising the CPU backend"
        )


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
