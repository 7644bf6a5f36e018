"""Multi-process / multi-host data-parallel runtime.

The reference gets multi-GPU *and* multi-node DP for free from HuggingFace
Accelerate: ``Accelerator()`` + ``accelerate launch`` wrap torch DDP/NCCL
(ref: encoder/train.py:16,79; synthesizer/train.py:78; vocoder/train.py:32;
requirements.txt:22). The TPU-native equivalent built here:

  * ``jax.distributed.initialize`` connects every process to a coordinator
    (DCN between hosts on a pod slice; gloo between CPU processes, which is
    how the 2-process equivalence test runs in CI);
  * one global ``Mesh`` spans every process's devices; per-process local
    batches are assembled into global arrays with
    ``jax.make_array_from_process_local_data`` (the Accelerate
    per-rank-loader equivalent);
  * gradient all-reduce falls out of jit over the sharded batch — XLA
    inserts the psum over ICI/DCN; no NCCL-style calls anywhere;
  * ``is_main_process``/``wait_for_everyone`` (rtvc_tpu/parallel/mesh.py)
    keep checkpointing main-process-only, same contract as the reference's
    ``accelerator.wait_for_everyone`` + main-process ``torch.save``
    (ref: encoder/train.py:133-150).

Launch (per process)::

    RTVC_COORDINATOR=host0:8476 RTVC_NUM_PROCESSES=4 RTVC_PROCESS_ID=k \
        python encoder_train.py my_run datasets/SV2TTS/encoder

or pass ``--coordinator/--num_processes/--process_id`` to the entry scripts
(docs/TRAINING.md "Multi-host training").
"""
from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np

COORD_ENV = "RTVC_COORDINATOR"
NPROC_ENV = "RTVC_NUM_PROCESSES"
PID_ENV = "RTVC_PROCESS_ID"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Connect this process to the distributed runtime.

    Arguments fall back to the ``RTVC_COORDINATOR`` / ``RTVC_NUM_PROCESSES``
    / ``RTVC_PROCESS_ID`` environment variables (the ``accelerate launch``
    equivalent is env-driven too). On TPU pods all three may be omitted
    entirely — jax autodetects the slice topology. Must run before any
    device query; on the CPU platform the gloo cross-process collective
    implementation is selected first (required for multi-process CPU).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(COORD_ENV)
    if num_processes is None and os.environ.get(NPROC_ENV):
        num_processes = int(os.environ[NPROC_ENV])
    if process_id is None and os.environ.get(PID_ENV):
        process_id = int(os.environ[PID_ENV])

    platforms = (os.environ.get("JAX_PLATFORMS")
                 or getattr(jax.config, "jax_platforms", None) or "")
    if not platforms or "cpu" in platforms:
        # cross-process collectives on the CPU client need gloo (the
        # default intra-process implementation cannot reach peer hosts).
        # Selected whenever the CPU client may serve collectives: platforms
        # unset (stock CPU-only install resolves to cpu) or explicitly
        # listing cpu. The setting is lazy — on a real TPU slice the TPU
        # client carries the collectives and this is inert.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def maybe_initialize_from_env() -> bool:
    """Initialize iff the RTVC_* launch env vars are present. Returns whether
    the distributed runtime was started (entry scripts call this once)."""
    if os.environ.get(COORD_ENV) is None:
        return False
    initialize()
    return True


def is_distributed() -> bool:
    import jax

    return jax.process_count() > 1


def add_launch_args(parser) -> None:
    """Attach the multi-process launch flags to an entry-script parser
    (the ``accelerate launch`` equivalent; env vars work too)."""
    g = parser.add_argument_group(
        "distributed", "Multi-process/multi-host data-parallel launch "
        f"(or env: {COORD_ENV}/{NPROC_ENV}/{PID_ENV})"
    )
    g.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="Coordinator address of process 0.")
    g.add_argument("--num_processes", type=int, default=None)
    g.add_argument("--process_id", type=int, default=None)


def setup_from_args(args):
    """Initialize the distributed runtime when launch flags/env are present;
    returns the data-parallel mesh to pass to the trainers (None when
    single-process single-device — the trainers then skip DP entirely)."""
    import jax

    if getattr(args, "coordinator", None) or os.environ.get(COORD_ENV):
        initialize(getattr(args, "coordinator", None),
                   getattr(args, "num_processes", None),
                   getattr(args, "process_id", None))
    if jax.process_count() > 1 or len(jax.devices()) > 1:
        from rtvc_tpu.parallel.mesh import make_mesh

        return make_mesh()
    return None


# ---------------------------------------------------------------------------
# Global-array assembly (the per-rank DataLoader → global batch bridge)
# ---------------------------------------------------------------------------


def global_batch(batch: Any, mesh, axis_name: str = "data") -> Any:
    """Per-process local batch (leading axis = this process's shard) → global
    jax.Arrays sharded over ``axis_name``. Global batch size = local × the
    number of processes; every process must contribute the same local shape."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))
    nproc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(put, batch)


def replicate_global(tree: Any, mesh) -> Any:
    """Replicate params/opt state over every device of a (possibly
    multi-process) mesh. Every process must hold the same values — true for
    same-seed init and for checkpoints read from a shared filesystem."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x, x.shape)

    return jax.tree_util.tree_map(put, tree)


def fetch(x) -> np.ndarray:
    """Materialize a jit output on the host regardless of its sharding:
    replicated/addressable arrays are read directly; cross-process-sharded
    arrays are allgathered (metrics like the GE2E similarity matrix)."""
    import jax

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.is_fully_replicated:
            return np.asarray(x.addressable_data(0))
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)
