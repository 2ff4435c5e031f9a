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

    # --- shard_batch + DiT train step across the process boundary ----------
    # Pins the make_array_from_process_local_data fix (parallel/mesh.py:62-72):
    # each process passes ONLY ITS ROWS; a plain device_put under the global
    # sharding would silently drop half of every batch, which shows up here
    # as a loss different from the single-process run on the same global
    # batch (the parent test computes that reference value).
    from ldmae_tpu.models.lightningdit import DiTConsts, DiTSpec, init_dit_params
    from ldmae_tpu.parallel import create_mesh, shard_batch
    from ldmae_tpu.train.state import init_train_state
    from ldmae_tpu.train.train_dit import make_optimizer, make_train_step
    from ldmae_tpu.transport import create_transport

    spec = DiTSpec(
        input_size=4, patch_size=1, in_channels=4, hidden_size=32, depth=2,
        num_heads=4, num_classes=8, use_swiglu=True, use_rmsnorm=True,
    )
    consts = DiTConsts(spec)
    dmesh = create_mesh(dp=4)  # 4 global devices over 2 processes
    tx = make_optimizer(1e-3, 0.95, max_grad_norm=1.0)
    rep = NamedSharding(dmesh, P())
    state = jax.jit(
        lambda: init_train_state(init_dit_params(jax.random.key(0), spec), tx),
        out_shardings=rep,
    )()
    transport = create_transport("Linear", "velocity", use_lognorm=False)
    step = make_train_step(
        spec, consts, transport, tx, grad_accum=1, compute_dtype=jnp.float32
    )
    grng = np.random.default_rng(123)  # same global batch as the parent
    gx = grng.standard_normal((1, 8, 4, 4, 4)).astype(np.float32)
    gy = grng.integers(0, 8, (1, 8)).astype(np.int32)
    lo, hi = rank * 4, (rank + 1) * 4  # this process's rows
    batch = shard_batch(dmesh, {"x": gx[:, lo:hi], "y": gy[:, lo:hi]}, axis=1)
    state, metrics = jax.jit(step)(state, batch, jax.random.key(5))
    loss = float(np.asarray(metrics["loss"].addressable_data(0)))

    # --- PROCESS-SPANNING dp x tp mesh (VERDICT r4 next #4) ----------------
    # The topology a real multi-host pod uses: dp ACROSS the 2 processes x
    # tp WITHIN each process's 2 devices (create_mesh reshapes jax.devices()
    # process-major, so the tp axis lands on intra-process pairs — the ICI
    # analogue; reference: one-process-per-GPU DDP, misc.py:367-402).
    # Same global batch, params sharded by the tp rules, per-process data:
    # the loss must equal the unsharded single-process run (parent checks).
    from ldmae_tpu.parallel.mesh import dit_param_spec

    tmesh = create_mesh(dp=2, tp=2)
    assert tmesh.devices.shape == (2, 1, 2)
    # every (dp, tp) coordinate must pair one device from each process on
    # dp and two same-process devices on tp
    for dpi in range(2):
        procs = {d.process_index for d in tmesh.devices[dpi, 0, :]}
        assert len(procs) == 1, f"tp axis crosses processes: {procs}"
    assert {d.process_index for d in tmesh.devices[:, 0, 0]} == {0, 1}

    def _state_shardings(tree):
        return jax.tree_util.tree_map_with_path(
            lambda p, l: NamedSharding(
                tmesh, dit_param_spec(p, l, False, True, tmesh)
            ),
            tree,
        )

    state_shapes = jax.eval_shape(
        lambda: init_train_state(init_dit_params(jax.random.key(0), spec), tx)
    )
    state_sh = _state_shardings(state_shapes)
    state_tp = jax.jit(
        lambda: init_train_state(init_dit_params(jax.random.key(0), spec), tx),
        out_shardings=state_sh,
    )()
    batch_tp = shard_batch(tmesh, {"x": gx[:, lo:hi], "y": gy[:, lo:hi]}, axis=1)
    _, metrics_tp = jax.jit(step)(state_tp, batch_tp, jax.random.key(5))
    loss_tp = float(np.asarray(metrics_tp["loss"].addressable_data(0)))

    # --- inference local-mesh rule alongside the global backend ------------
    # do_sample builds a mesh over THIS PROCESS's devices only (ranks sample
    # disjoint batches independently, cli/inference.py:246-256): that local
    # program must run while jax.distributed is live, and with identical
    # (key, labels) both ranks must decode identical latents.
    from ldmae_tpu.eval.sampling import make_sample_fn
    from ldmae_tpu.parallel import shard_params

    lmesh = create_mesh(dp=-1, tp=2, devices=jax.local_devices())
    assert lmesh.shape["tp"] == 2 and lmesh.shape["dp"] == 1
    sfn = make_sample_fn(
        spec, consts, transport, num_steps=2, sampling_method="euler",
        cfg_scale=4.0, cfg_interval=False, cfg_channels=3,
        compute_dtype=jnp.float32,
    )
    sparams = shard_params(lmesh, init_dit_params(jax.random.key(7), spec), use_tp=True)
    bundle = {"dit": sparams, "vae": None, "latent_mean": None, "latent_std": None}
    ys = jax.device_put(
        jnp.arange(4, dtype=jnp.int32) % 8, NamedSharding(lmesh, P(("dp", "fsdp")))
    )
    lat = np.asarray(jax.jit(sfn)(bundle, jax.random.key(11), ys))
    assert lat.shape == (4, 4, 4, 4), lat.shape
    sample_sum = float(np.abs(lat).sum())
    sums = np.asarray(
        multihost_utils.process_allgather(jnp.float32(sample_sum))
    ).ravel()
    local_mesh_agree = bool(np.allclose(sums, sums[0], rtol=1e-5))

    barrier("end-of-test")
    print(
        f"RESULT rank={rank} main={is_main_process()} sum={total} "
        f"n_local={len(labels)} disjoint={disjoint} complete={complete} "
        f"dit_loss={loss:.6f} dit_loss_tp={loss_tp:.6f} "
        f"local_mesh_agree={local_mesh_agree}",
        flush=True,
    )


if __name__ == "__main__":
    main()
