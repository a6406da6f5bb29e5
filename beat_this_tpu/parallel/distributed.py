"""Multi-host (multi-process) data parallelism.

The reference is strictly single-GPU; SURVEY §2.3's TPU-native mapping says
"DP scales across chips/hosts (DCN)". The pieces:

  * `maybe_initialize_distributed()` — env-gated `jax.distributed.initialize`
    at driver startup. On TPU pods the runtime autodetects the topology; on
    CPU/GPU clusters (and in tests) the three standard knobs are passed via
    BEAT_THIS_COORDINATOR / BEAT_THIS_NUM_PROCESSES / BEAT_THIS_PROCESS_ID.
  * `make_mesh` (parallel/mesh.py) already builds over `jax.devices()`,
    which after initialize() is the GLOBAL device list — the mesh and every
    jitted step function work unchanged.
  * per-host feeding: every process derives the same global batch order from
    the shared seed, materializes only its slice of each global batch
    (`BeatDataModule.train_batches(host_shard=...)`), and assembles the
    global sharded array with `jax.make_array_from_process_local_data`
    (`shard_host_batch` below). No host ever holds the full global batch.
  * rank-0-only checkpointing/logging in the Trainer.

Launch recipe (2 hosts):

    # host 0
    BEAT_THIS_COORDINATOR=host0:9876 BEAT_THIS_NUM_PROCESSES=2 \
    BEAT_THIS_PROCESS_ID=0 python launch_scripts/train.py ...
    # host 1 (same command, PROCESS_ID=1)

On a TPU pod slice, just run the same command on every host with only
BEAT_THIS_DISTRIBUTED=1 set — jax.distributed.initialize() autodetects.

Tested end-to-end (2 processes x 4 CPU devices, loss equivalence vs the
single-process 8-device mesh) in tests/test_multihost.py.
"""

from __future__ import annotations

import os

import jax


def maybe_initialize_distributed() -> bool:
    """Initialize JAX's multi-process runtime if the environment asks for it.

    Returns True when running multi-process. Safe to call more than once and
    in single-process runs (no env set -> no-op).
    """
    if os.environ.get("BEAT_THIS_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=os.environ["BEAT_THIS_COORDINATOR"],
            num_processes=int(os.environ["BEAT_THIS_NUM_PROCESSES"]),
            process_id=int(os.environ["BEAT_THIS_PROCESS_ID"]),
        )
        return True
    if os.environ.get("BEAT_THIS_DISTRIBUTED"):
        jax.distributed.initialize()  # TPU pod autodetection
        return True
    return False


def host_shard() -> tuple[int, int]:
    """(process_index, process_count) — the slice of each global batch this
    host is responsible for assembling."""
    return jax.process_index(), jax.process_count()


def shard_host_batch(local_arrays: dict, mesh, spec) -> dict:
    """Assemble global sharded arrays from this process's local slices.

    `spec` is the PartitionSpec of the GLOBAL batch (e.g. P(None, "data") for
    (accum, micro, ...) training batches). Each process passes only the rows
    of the sharded axis that live on its addressable devices; JAX stitches
    the global jax.Array without any cross-host data movement.
    """
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in local_arrays.items()
    }
