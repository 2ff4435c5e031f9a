"""One-shot pytree device placement for slow-transfer links.

Motivation (measured on the tunneled single-chip rig, round 4): a
`jax.device_put` of a 565 MB / 68-leaf sampling bundle costs ~195 s —
each leaf pays a fixed per-transfer RPC overhead (~1 s) on top of the
~46 MB/s link rate — while leaving the bundle host-committed silently
re-uploads the params on EVERY jitted call (the transfer partially hides
behind device compute, but still cost ~8 s/call = -19% sampling
throughput, and corrupts benchmark timing).

`place_pytree` flattens the tree, concatenates the raveled leaves into
ONE host buffer per dtype, ships each with a single `device_put`, and
rebuilds the leaves on-device with one jitted slice/reshape program per
dtype group: ~14 s for the same bundle, after which every leaf is
device-committed and jitted calls never transfer again.

The drivers use this after their CPU-backend param prep (see
cli/inference.py) whenever they run unsharded — and on a mesh, for every
replicated part of the bundle, via a fully-replicated
``NamedSharding(mesh, P())`` destination (including the DiT itself when
tp == 1). Only genuinely tensor-parallel weights (tp > 1) go through
`parallel.shard_params`, whose per-leaf `device_put` is unavoidable for
split layouts.
"""

from __future__ import annotations

from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Sharding

__all__ = ["cpu_prep_context", "place_pytree"]


def cpu_prep_context():
    """Context manager pinning eager ops to the local CPU backend.

    Driver param init/loading is hundreds of small eager ops; on the
    remote axon backend each is its own remote compile (PERF.md "Driver
    startup" — on a degraded compile service this alone exceeded a 25-min
    job timeout). Every driver builds its params under this context and
    then commits the finished tree once via `place_pytree`. Falls back to
    a no-op when no CPU backend is available (e.g. JAX_PLATFORMS=cpu
    already, or a CPU-less build where default_device would fail).
    """
    import contextlib

    try:
        return jax.default_device(jax.local_devices(backend="cpu")[0])
    except RuntimeError:
        return contextlib.nullcontext()


def place_pytree(
    tree: Any, device: Optional[Union[jax.Device, Sharding]] = None
) -> Any:
    """Return `tree` with every array leaf committed to `device`.

    device defaults to jax.local_devices()[0] — the first device THIS
    PROCESS can address. (`jax.devices()[0]` would be wrong under
    multi-process: on every rank but 0 it names another process's device,
    and jit refuses to close over arrays spanning non-addressable devices
    — each rank owns its replica, the reference's DDP model.) It may also
    be a (fully-replicated) `jax.sharding.Sharding` —
    e.g. ``NamedSharding(mesh, P())`` — to commit every leaf replicated
    over a mesh's devices in the same one-buffer-per-dtype transfer (the
    multi-device analogue: an un-committed bundle re-uploads per call there
    too). Shardings that would split a leaf make no sense for the single
    concatenated buffer and are not supported. Non-array leaves (python
    scalars) are placed as 0-d arrays of their numpy-inferred dtype,
    matching what jit would do.
    """
    if device is None:
        device = jax.local_devices()[0]
    is_sharding = isinstance(device, Sharding)
    if is_sharding and not device.is_fully_replicated:
        raise ValueError(
            "place_pytree only supports fully-replicated shardings "
            f"(got {device})"
        )
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree

    host = [np.asarray(leaf) for leaf in leaves]
    groups: dict[str, list[int]] = {}
    for i, arr in enumerate(host):
        groups.setdefault(arr.dtype.str, []).append(i)

    out: list[Any] = [None] * len(leaves)
    for idxs in groups.values():
        arrs = [host[i] for i in idxs]
        flat = np.concatenate([a.ravel() for a in arrs]) if len(arrs) > 1 else arrs[0].ravel()
        flat_dev = jax.device_put(flat, device)
        shapes = [a.shape for a in arrs]
        sizes = [a.size for a in arrs]

        def unflatten(f, sizes=sizes, shapes=shapes):
            pieces = []
            off = 0
            for sz, shp in zip(sizes, shapes):
                pieces.append(lax.slice(f, (off,), (off + sz,)).reshape(shp))
                off += sz
            return pieces

        # flat_dev is committed to `device`, so jit executes there; with a
        # sharding destination, pin the outputs replicated explicitly.
        if is_sharding:
            pieces = jax.jit(unflatten, out_shardings=device)(flat_dev)
        else:
            pieces = jax.jit(unflatten)(flat_dev)
        for i, piece in zip(idxs, pieces):
            out[i] = piece

    return jax.tree_util.tree_unflatten(treedef, out)
