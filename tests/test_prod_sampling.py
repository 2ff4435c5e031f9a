"""Production-shape proof for the SAMPLING program (VERDICT r4 next #3).

test_prod_sharding proved the 1p0B/1p6B TRAIN step at real shape; these
tests do the same for the program `cli.inference --tp` actually runs — the
full `make_sample_fn` pipeline (CFG batch doubling per reference
lightningdit.py:420-442, 250-step Euler scan, merged-w12 and int8 layouts,
VMAE f8d16 decode to uint8) — on the 8-device CPU mesh in the CLI's own
dp x tp topology, all on ShapeDtypeStructs:

  * the inference-layout DiT (permute + merge_swiglu [+ quantize]) keeps
    every big leaf sharded under the tp rules cli.inference applies
  * the REAL-shape sampling program lowers under jit with those shardings
  * per-device HBM accounting (sharded param bytes + scan carry + the
    conservative live-activation bound in utils/profiling.py) fits v5e's
    15.75 GB at the reference's production per_proc_batch_size=256
    (configs/imagenet yaml) under dp4 x tp2 — and the SINGLE-chip program
    at the same batch does NOT fit, which is --tp's stated reason to
    exist (cli/inference.py:242-249). If either side flips, this fails.

Registry shapes: reference lightningdit.py:525-531.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ldmae_tpu.eval.sampling import make_sample_fn
from ldmae_tpu.models.lightningdit import (
    DiTConsts,
    dit_spec,
    init_dit_params,
    merge_swiglu,
    permute_qk_for_half_rope,
    quantize_dit_params,
)
from ldmae_tpu.models.vmae import VMAEConsts, init_vmae_params, vmae_spec
from ldmae_tpu.parallel.mesh import create_mesh, dit_param_spec
from ldmae_tpu.transport import create_transport
from ldmae_tpu.utils.profiling import dit_sampling_activation_bytes

pytestmark = pytest.mark.slow

BIG_LEAF = 50 * 1024 * 1024  # bytes
V5E_HBM = 15.75e9
PROD_BATCH = 256  # sample.per_proc_batch_size, configs/imagenet yaml


def _prod_spec(model):
    return dit_spec(
        model,
        input_size=32,
        in_channels=16,
        num_classes=1000,
        use_qknorm=True,
        use_swiglu=True,
        use_rope=True,
        use_rmsnorm=True,
    )


def _vspec():
    return vmae_spec(
        "mae_for_ldmae_f8d16_prev",
        img_size=256,
        ldmae_mode=True,
        no_cls=True,
        kl_loss_weight=True,
        smooth_output=True,
    )


def _inference_params_shapes(spec, quant):
    def build(key):
        params = init_dit_params(key, spec)
        params = merge_swiglu(permute_qk_for_half_rope(params, spec), spec)
        if quant:
            params = quantize_dit_params(params, spec)
        return params

    return jax.eval_shape(build, jax.random.key(0))


def _name(path):
    keys = [getattr(k, "key", getattr(k, "idx", getattr(k, "name", None))) for k in path]
    return "/".join(str(k) for k in keys if k is not None)


def _tp_shardings(mesh, tree):
    """The exact rule cli.inference applies: shard_params(..., use_tp=True)
    i.e. dit_param_spec(fsdp=False, tp=True). Returns (shardings,
    per-device bytes, replicated big leaves)."""
    per_device = 0
    replicated_big = []

    def _spec(path, leaf):
        nonlocal per_device
        s = NamedSharding(mesh, dit_param_spec(path, leaf, False, True, mesh))
        shard_shape = s.shard_shape(leaf.shape)
        nbytes = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        shard_bytes = int(np.prod(shard_shape)) * leaf.dtype.itemsize
        per_device += shard_bytes
        if nbytes > BIG_LEAF and shard_shape == tuple(leaf.shape):
            replicated_big.append((_name(path), nbytes))
        return s

    tree_sh = jax.tree_util.tree_map_with_path(_spec, tree)
    return tree_sh, per_device, replicated_big


def _replicated_bytes(tree):
    return sum(
        int(np.prod(l.shape)) * l.dtype.itemsize for l in jax.tree_util.tree_leaves(tree)
    )


def _build_sample_fn(spec, vspec, quant, num_steps=250):
    consts = DiTConsts(spec)
    vconsts = VMAEConsts(vspec)
    transport = create_transport("Linear", "velocity", use_lognorm=True)
    return make_sample_fn(
        spec, consts, transport,
        num_steps=num_steps,
        sampling_method="euler",
        timestep_shift=0.3,
        cfg_scale=10.0,
        cfg_interval=True,
        cfg_interval_start=0.10,
        cfg_channels=3,
        vae_spec=vspec,
        vae_consts=vconsts,
        compute_dtype=jnp.bfloat16,
        attn_impl="xla",  # sharding rules under test, not the Pallas kernel
        rope_layout="half",
        adaln_impl="xla",
        quant_mode="w8a8" if quant else None,
        mlp_impl="xla",
    )


@pytest.mark.parametrize(
    "model,quant",
    [
        ("LightningDiT-1p0B/1", False),
        ("LightningDiT-1p6B/1", False),
        ("LightningDiT-1p6B/1", True),
    ],
)
def test_sampling_program_lowers_at_prod_shape(model, quant):
    """jit(sample_fn).lower() the CLI's dp4 x tp2 topology at real weight
    shape: proves the CFG-doubled 250-step scan + VMAE decode traces with
    the tp shardings cli.inference installs, and that no big leaf
    replicates."""
    mesh = create_mesh(dp=-1, tp=2)  # 8 devices -> dp4 x fsdp1 x tp2
    assert mesh.shape["dp"] == 4 and mesh.shape["tp"] == 2
    spec = _prod_spec(model)
    vspec = _vspec()

    dit_shapes = _inference_params_shapes(spec, quant)
    dit_sh, per_device, replicated_big = _tp_shardings(mesh, dit_shapes)
    assert not replicated_big, (
        f"{model}: big leaves replicated under sampling tp rules: "
        + ", ".join(f"{n} ({b / 1e6:.0f} MB)" for n, b in replicated_big)
    )

    rep = NamedSharding(mesh, P())

    def _sds(tree, sh_tree=None):
        def one(leaf, sh):
            return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=sh)

        if sh_tree is None:
            return jax.tree_util.tree_map(lambda l: one(l, rep), tree)
        return jax.tree_util.tree_map(one, tree, sh_tree)

    vae_shapes = jax.eval_shape(lambda k: init_vmae_params(k, vspec), jax.random.key(1))
    bundle = {
        "dit": _sds(dit_shapes, dit_sh),
        "vae": _sds(vae_shapes),
        "latent_mean": jax.ShapeDtypeStruct((1, 16, 1, 1), jnp.float32, sharding=rep),
        "latent_std": jax.ShapeDtypeStruct((1, 16, 1, 1), jnp.float32, sharding=rep),
    }
    y = jax.ShapeDtypeStruct(
        (PROD_BATCH,), jnp.int32, sharding=NamedSharding(mesh, P(("dp", "fsdp")))
    )
    sample_fn = _build_sample_fn(spec, vspec, quant)
    lowered = jax.jit(sample_fn).lower(bundle, jax.random.key(0), y)
    hlo = lowered.as_text()
    assert "sharding" in hlo  # GSPMD annotations made it into the program
    del sample_fn, lowered, hlo


@pytest.mark.parametrize("model", ["LightningDiT-1p0B/1", "LightningDiT-1p6B/1"])
@pytest.mark.parametrize("quant", [False, True])
def test_sampling_hbm_budget(model, quant):
    """HBM accounting at the production per-proc batch (256): under
    dp4 x tp2 the per-device program fits 15.75 GB; on a single chip the
    same batch does NOT — the measured reason --tp exists. The activation
    side uses the conservative live-set bound in utils/profiling.py
    (doubled-CFG batch, full-size w12 intermediate per the contracting-dim
    tp rule)."""
    spec = _prod_spec(model)
    vspec = _vspec()
    mesh = create_mesh(dp=-1, tp=2)
    dit_shapes = _inference_params_shapes(spec, quant)
    _, dit_per_device, _ = _tp_shardings(mesh, dit_shapes)
    vae_bytes = _replicated_bytes(
        jax.eval_shape(lambda k: init_vmae_params(k, vspec), jax.random.key(1))
    )

    per_dev_batch = PROD_BATCH // mesh.shape["dp"]  # y sharded over (dp, fsdp)
    act = dit_sampling_activation_bytes(spec, per_dev_batch, tp=2, vae_spec=vspec)
    total = dit_per_device + vae_bytes + act
    assert total < V5E_HBM, (
        f"{model} quant={quant}: dp4xtp2 sampling program "
        f"{total / 1e9:.2f} GB/device > v5e HBM (params {dit_per_device / 1e9:.2f} "
        f"+ vae {vae_bytes / 1e9:.2f} + act {act / 1e9:.2f})"
    )

    # single chip, same production batch: must NOT fit (else --tp's stated
    # motivation, cli/inference.py:242-249, is false and this test should
    # make someone rewrite that comment)
    dit_full = _replicated_bytes(dit_shapes)
    act1 = dit_sampling_activation_bytes(spec, PROD_BATCH, tp=1, vae_spec=vspec)
    total1 = dit_full + vae_bytes + act1
    assert total1 > V5E_HBM, (
        f"{model} quant={quant}: single-chip program {total1 / 1e9:.2f} GB "
        f"fits HBM — --tp not needed at production batch?"
    )
