"""Subprocess worker for test_multiprocess.py.

Run with env RANK/WORLD_SIZE/MASTER_ADDR/MASTER_PORT set (the reference's
env:// rendezvous convention, VMAE/util/misc.py:367-402). Each process gets
2 virtual CPU devices → a 4-device global mesh over 2 processes. Exercises:
  * ldmae_tpu.parallel.distributed.init_distributed_mode (env path)
  * a psum across the process boundary (DDP all-reduce equivalent)
  * ImgLatentDataset.iter_batches per-process index sharding
    (DistributedSampler equivalent)
  * barrier()
Prints a single RESULT line that the parent test asserts on.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # undo axon sitecustomize

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from ldmae_tpu.data.latent_dataset import ImgLatentDataset  # noqa: E402
from ldmae_tpu.parallel.distributed import (  # noqa: E402
    barrier,
    get_rank,
    get_world_size,
    init_distributed_mode,
    is_main_process,
)


def main() -> None:
    data_dir = sys.argv[1]
    init_distributed_mode()
    assert get_world_size() == 2, get_world_size()
    rank = get_rank()
    assert rank == int(os.environ["RANK"]), (rank, os.environ["RANK"])
    assert jax.local_device_count() == 2, jax.local_device_count()
    assert jax.device_count() == 4, jax.device_count()

    # --- cross-process reduction (the DDP all-reduce path) -----------------
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    local = (np.arange(2, dtype=np.float32) + 1.0) * (10.0 ** rank)
    # proc0 holds [1,2], proc1 holds [10,20] → global sum 33
    garr = multihost_utils.host_local_array_to_global_array(local, mesh, P("data"))
    total = jax.jit(
        jnp.sum, out_shardings=NamedSharding(mesh, P())
    )(garr)
    # replicated output: every process reads its local shard
    total = float(np.asarray(total.addressable_data(0)))
    assert total == 33.0, total

    # --- per-process dataset sharding (DistributedSampler equivalent) ------
    ds = ImgLatentDataset(data_dir, latent_norm=False, sample=False)
    labels = []
    for batch in ds.iter_batches(
        4, shuffle=False, drop_last=False, epochs=1,
        process_index=rank, process_count=2,
    ):
        labels.extend(int(y) for y in batch["y"])
    mine = np.zeros(len(ds), dtype=np.int32)
    mine[np.asarray(labels, dtype=np.int64)] = 1
    everyone = multihost_utils.process_allgather(jnp.asarray(mine))
    everyone = np.asarray(everyone).reshape(2, -1)
    disjoint = bool((everyone.sum(0) <= 1).all())
    complete = bool((everyone.sum(0) >= 1).all())

    barrier("end-of-test")
    print(
        f"RESULT rank={rank} main={is_main_process()} sum={total} "
        f"n_local={len(labels)} disjoint={disjoint} complete={complete}",
        flush=True,
    )


if __name__ == "__main__":
    main()
