"""Sampling pipeline sharded across the virtual 8-device mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ldmae_tpu.eval.sampling import make_sample_fn
from ldmae_tpu.models.lightningdit import DiTConsts, DiTSpec, init_dit_params
from ldmae_tpu.parallel import create_mesh, shard_params
from ldmae_tpu.transport import create_transport

pytestmark = pytest.mark.slow


class TestShardedSampling:
    def test_dp_sharded_cfg_sampling(self):
        assert len(jax.devices()) == 8
        mesh = create_mesh(dp=8)
        spec = DiTSpec(
            input_size=8, patch_size=2, in_channels=4, hidden_size=32, depth=2,
            num_heads=4, num_classes=8, use_qknorm=True, use_swiglu=True,
            use_rope=True, use_rmsnorm=True,
        )
        consts = DiTConsts(spec)
        params = shard_params(mesh, init_dit_params(jax.random.key(0), spec))
        transport = create_transport("Linear", "velocity")
        fn = make_sample_fn(
            spec, consts, transport, num_steps=4, cfg_scale=4.0,
            cfg_interval=True, cfg_interval_start=0.1, compute_dtype=jnp.float32,
        )
        y = jax.device_put(
            jnp.arange(16, dtype=jnp.int32) % 8,
            NamedSharding(mesh, P(("dp", "fsdp"))),
        )
        out = jax.jit(fn)({"dit": params}, jax.random.key(1), y)
        assert out.shape == (16, 4, 8, 8)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_sharded_matches_unsharded(self):
        mesh = create_mesh(dp=8)
        spec = DiTSpec(
            input_size=8, patch_size=2, in_channels=4, hidden_size=32, depth=2,
            num_heads=4, num_classes=8, use_swiglu=True, use_rmsnorm=True,
        )
        consts = DiTConsts(spec)
        params = init_dit_params(jax.random.key(0), spec)
        params = jax.tree_util.tree_map(
            lambda p: p + 0.05 * jax.random.normal(jax.random.key(9), p.shape), params
        )
        transport = create_transport("Linear", "velocity")
        fn = make_sample_fn(
            spec, consts, transport, num_steps=4, cfg_scale=0.0,
            compute_dtype=jnp.float32,
        )
        y = jnp.zeros((16,), jnp.int32)
        ref = jax.jit(fn)({"dit": params}, jax.random.key(1), y)
        y_sh = jax.device_put(y, NamedSharding(mesh, P(("dp", "fsdp"))))
        out = jax.jit(fn)({"dit": shard_params(mesh, params)}, jax.random.key(1), y_sh)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestShardedQuantSampling:
    def test_quantized_params_shard_and_sample(self):
        """int8-quantized sampling params (ops/quant.py layouts: w_q/w_scale,
        flat qkv/adaln) must pass the sharding rules (explicit tp rule for
        qkv/w_q, defensive replication elsewhere) and sample correctly on a
        dp x tp mesh."""
        from ldmae_tpu.models.lightningdit import (
            merge_swiglu, permute_qk_for_half_rope, quantize_dit_params,
        )

        mesh = create_mesh(dp=4, tp=2)
        spec = DiTSpec(
            input_size=8, patch_size=2, in_channels=4, hidden_size=32, depth=2,
            num_heads=4, num_classes=8, use_qknorm=True, use_swiglu=True,
            use_rope=True, use_rmsnorm=True,
        )
        consts = DiTConsts(spec)
        params = init_dit_params(jax.random.key(0), spec)
        params = jax.tree_util.tree_map(
            lambda p: p + 0.05 * jax.random.normal(jax.random.key(9), p.shape), params
        )
        params = merge_swiglu(permute_qk_for_half_rope(params, spec), spec)
        qparams = quantize_dit_params(params, spec)

        fn = make_sample_fn(
            spec, consts, transport=create_transport("Linear", "velocity"),
            num_steps=4, cfg_scale=4.0, cfg_interval=True,
            cfg_interval_start=0.1, compute_dtype=jnp.float32,
            rope_layout="half", quant_mode="w8a8",
        )
        ref = jax.jit(fn)({"dit": qparams}, jax.random.key(1),
                          jnp.arange(16, dtype=jnp.int32) % 8)

        qsh = shard_params(mesh, qparams, use_tp=True)
        y = jax.device_put(
            jnp.arange(16, dtype=jnp.int32) % 8,
            NamedSharding(mesh, P(("dp", "fsdp"))),
        )
        out = jax.jit(fn)({"dit": qsh}, jax.random.key(1), y)
        assert out.shape == (16, 4, 8, 8)
        # w12 is sharded on its CONTRACTING dim under tp (mesh.py) — the
        # partitioned psum changes f32 accumulation order, worth ~1e-4 over
        # 4 ODE steps (measured 1.2e-4 max); int8 partials themselves are
        # exact (int32 accumulation)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=5e-4)


class TestPhasedCFG:
    def _build(self, phased):
        spec = DiTSpec(
            input_size=8, patch_size=2, in_channels=4, hidden_size=32, depth=2,
            num_heads=4, num_classes=8, use_qknorm=True, use_swiglu=True,
            use_rope=True, use_rmsnorm=True,
        )
        consts = DiTConsts(spec)
        params = init_dit_params(jax.random.key(0), spec)
        params = jax.tree_util.tree_map(
            lambda p: p + 0.05 * jax.random.normal(jax.random.key(9), p.shape), params
        )
        fn = make_sample_fn(
            spec, consts, create_transport("Linear", "velocity"),
            num_steps=16, sampling_method="euler", timestep_shift=0.3,
            cfg_scale=4.0, cfg_interval=True, cfg_interval_start=0.10,
            cfg_channels=3, compute_dtype=jnp.float32,
            cfg_phase_split=phased,
        )
        return fn, params

    def test_phase_split_numerically_identical(self):
        """The two-phase CFG scan (single batch below cfg_interval_start,
        doubled above — the uncond half is discarded there anyway, see
        forward_with_cfg) must reproduce the single-scan result exactly."""
        y = jnp.arange(6, dtype=jnp.int32) % 8
        fn_ref, params = self._build(phased=False)
        fn_ph, _ = self._build(phased=True)
        ref = jax.jit(fn_ref)({"dit": params}, jax.random.key(1), y)
        out = jax.jit(fn_ph)({"dit": params}, jax.random.key(1), y)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_grid_split_point(self):
        """With shift 0.3 and start 0.10, t' < 0.1 ⇔ t < 10/37 — about 27%
        of the eval nodes run unguided."""
        import numpy as np

        from ldmae_tpu.transport.samplers import make_time_grid

        grid = make_time_grid(0.0, 1.0, 250, 0.3)
        n1 = int(np.searchsorted(grid[:-1], 0.10))
        assert 60 <= n1 <= 72, n1
