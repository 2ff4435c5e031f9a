"""place_pytree: one-shot flatten-concat device placement.

Round-4 regression guard: a CPU-prepped sampling bundle left
host-committed makes every jitted call re-upload the params (measured
-19% sampling throughput through the tunneled rig, PERF.md round 4).
bench.py / cli.inference / perf_quant commit the bundle once via
utils.placement.place_pytree; these tests pin its round-trip semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ldmae_tpu.utils.placement import place_pytree


def _tree():
    return {
        "w": np.linspace(-1.0, 1.0, 24, dtype=np.float32).reshape(2, 3, 4),
        "nested": {
            "idx": np.arange(6, dtype=np.int32).reshape(3, 2),
            "scale": 0.25,
        },
        "bf16": jnp.full((5, 2), 1.5, jnp.bfloat16),
        "u8": np.arange(10, dtype=np.uint8),
    }


def test_round_trip_values_shapes_dtypes():
    tree = _tree()
    out = place_pytree(tree)
    np.testing.assert_array_equal(np.asarray(out["w"]), tree["w"])
    np.testing.assert_array_equal(np.asarray(out["nested"]["idx"]), tree["nested"]["idx"])
    assert float(out["nested"]["scale"]) == 0.25
    assert out["bf16"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out["bf16"], np.float32), np.full((5, 2), 1.5, np.float32)
    )
    np.testing.assert_array_equal(np.asarray(out["u8"]), tree["u8"])


def test_leaves_committed_to_device():
    out = place_pytree(_tree())
    dev = jax.devices()[0]
    for leaf in jax.tree_util.tree_leaves(out):
        assert isinstance(leaf, jax.Array)
        assert list(leaf.devices()) == [dev]
    # committed: jit must execute without a transfer error under
    # explicit-device checks
    with jax.transfer_guard("disallow"):
        val = jax.jit(lambda t: t["w"].sum() + t["nested"]["idx"].sum())(out)
    assert np.isfinite(float(val))


def test_explicit_device_target():
    dev = jax.devices()[-1]  # 8-device CPU mesh in tests: a non-default device
    out = place_pytree(_tree(), device=dev)
    for leaf in jax.tree_util.tree_leaves(out):
        assert list(leaf.devices()) == [dev]


def test_replicated_sharding_target():
    """The multi-device analogue (cli.inference mesh path): every leaf
    lands fully replicated and committed over the mesh devices."""
    import pytest
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devices, ("dp", "tp"))
    repl = NamedSharding(mesh, P())
    tree = _tree()
    out = place_pytree(tree, device=repl)
    for leaf in jax.tree_util.tree_leaves(out):
        assert isinstance(leaf, jax.Array)
        assert leaf.sharding.is_fully_replicated
        assert leaf.devices() == set(devices.ravel())
    np.testing.assert_array_equal(np.asarray(out["w"]), tree["w"])
    np.testing.assert_array_equal(np.asarray(out["u8"]), tree["u8"])
    assert out["bf16"].dtype == jnp.bfloat16
    with jax.transfer_guard("disallow"):
        val = jax.jit(lambda t: t["w"].sum())(out)
    assert np.isfinite(float(val))
    # splitting shardings are rejected, not silently mis-placed
    with pytest.raises(ValueError, match="fully-replicated"):
        place_pytree(tree, device=NamedSharding(mesh, P("dp")))


def test_empty_and_single_leaf():
    assert place_pytree({}) == {}
    out = place_pytree([np.ones((3,), np.float32)])
    np.testing.assert_array_equal(np.asarray(out[0]), np.ones((3,), np.float32))
