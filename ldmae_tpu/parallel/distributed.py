"""Multi-host initialisation.

TPU-native replacement for the reference's process-group bootstrap
(VMAE/util/misc.py:367-402 init_distributed_mode: env:// rendezvous via
RANK/WORLD_SIZE, OMPI vars, or SLURM_PROCID, NCCL backend, 30-min timeout):
on TPU pods ``jax.distributed.initialize()`` auto-discovers from the TPU
metadata; for CPU/GPU clusters the same env conventions are honoured.

Also provides the rank-gating helpers the reference scatters around
(is_main_process/get_rank/get_world_size, misc.py:338-360) in jax terms.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed_mode(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise multi-host jax. No-op when single-process with no
    distributed env present (the reference's local fallback,
    extract_features.py:28-41).

    Must run before anything touches the XLA backend — so the
    already-initialised check goes through ``jax.distributed.is_initialized``
    (``jax.process_count()`` would itself initialise the backend and make a
    later ``jax.distributed.initialize`` raise)."""
    if jax.distributed.is_initialized():
        return

    # explicit args win
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return

    env = os.environ

    def _local_ids(local_rank_var: str):
        # torchrun-style one-process-per-accelerator launches set LOCAL_RANK;
        # without pinning local_device_ids every process would claim ALL
        # local devices (the reference pins via torch.cuda.set_device(gpu),
        # misc.py:367-402). TPU pods manage visibility themselves — only pin
        # when a local rank is present.
        lr = env.get(local_rank_var)
        return [int(lr)] if lr is not None else None

    if "RANK" in env and "WORLD_SIZE" in env and int(env["WORLD_SIZE"]) > 1:
        addr = env.get("MASTER_ADDR", "127.0.0.1")
        port = env.get("MASTER_PORT", "29500")
        jax.distributed.initialize(
            coordinator_address=f"{addr}:{port}",
            num_processes=int(env["WORLD_SIZE"]),
            process_id=int(env["RANK"]),
            local_device_ids=_local_ids("LOCAL_RANK"),
        )
    elif "SLURM_PROCID" in env and int(env.get("SLURM_NTASKS", "1")) > 1:
        jax.distributed.initialize()  # jax reads SLURM vars itself
    elif "OMPI_COMM_WORLD_SIZE" in env and int(env["OMPI_COMM_WORLD_SIZE"]) > 1:
        addr = env.get("MASTER_ADDR", "127.0.0.1")
        port = env.get("MASTER_PORT", "29500")
        jax.distributed.initialize(
            coordinator_address=f"{addr}:{port}",
            num_processes=int(env["OMPI_COMM_WORLD_SIZE"]),
            process_id=int(env["OMPI_COMM_WORLD_RANK"]),
            local_device_ids=_local_ids("OMPI_COMM_WORLD_LOCAL_RANK"),
        )
    elif env.get("LDMAE_MULTIHOST", "0") == "1":
        # TPU pod: everything auto-discovered
        jax.distributed.initialize()
    # else: single process — nothing to do

    if jax.distributed.is_initialized():
        # Establish the cross-process collective context NOW, while rank
        # skew is seconds (the reference's init_process_group does the
        # same for NCCL/gloo, misc.py:396-402). Deferring it to the first
        # real collective — which can sit behind minutes of per-rank
        # param-prep compiles — let the backend's 30 s context-init
        # key-value exchange time out on a loaded host (observed as
        # "Gloo context initialization failed: DEADLINE_EXCEEDED" in the
        # 2-process driver tests).
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ldmae:init_distributed_mode")


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


_barrier_seq: dict = {}


def barrier(name: str = "barrier", timeout_s: int = 1800) -> None:
    """Cross-process sync (the reference's dist.barrier).

    Goes through the coordination-service KV barrier, NOT a device
    collective: `multihost_utils.sync_global_devices` lowers to a gloo
    allreduce on the CPU backend whose context/op timeout (~30 s) cannot
    absorb real rank skew — e.g. rank 0 scanning latent shards for stats
    or running a trailing FID pass while the other ranks wait (observed
    as "Gloo ... DEADLINE_EXCEEDED" → cascade into "Shutdown barrier has
    failed" in the 2-process driver tests). The KV barrier takes an
    explicit timeout and holds no collective context. Barrier ids are
    made unique per call site+sequence so the service never sees a
    reused id; all processes call barriers in program order, so the
    per-name counters agree across ranks.
    """
    if jax.process_count() == 1:
        return
    from jax._src import distributed as _dist

    client = getattr(_dist.global_state, "client", None)
    if client is not None:
        seq = _barrier_seq.get(name, 0)
        _barrier_seq[name] = seq + 1
        client.wait_at_barrier(f"ldmae:{name}:{seq}", timeout_in_ms=timeout_s * 1000)
    else:  # non-coordination-service backends: best effort
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
