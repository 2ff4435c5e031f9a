"""Numerical anchors for the FID InceptionV3 port (VERDICT r1 item 7).

The real pt_inception-2015-12-05 weights aren't available in this image, so
every component with FID-specific semantics is anchored against torch (the
trusted implementation pytorch-fid itself is built on):

  * avg_pool2d(count_include_pad=False) — the patch pytorch-fid applies to
    Inception A/C/E_1 branch pools (calculate_fid.py:244+)
  * the max-pool branch of FIDInceptionE_2 (calculate_fid.py:361-392)
  * conv + BatchNorm(eval, eps=1e-3) folding (BasicConv2d)
  * full FIDInceptionA and FIDInceptionE_2 blocks end-to-end with random
    weights routed through the torchvision state_dict naming
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax.numpy as jnp

from ldmae_tpu.models.inception import (
    _avg_pool_no_pad_count,
    _fold_bn,
    _inception_a,
    _inception_c,
    _inception_e,
    _max_pool,
)

torch.manual_seed(0)


class TestPoolingPatches:
    @pytest.mark.parametrize("shape", [(2, 3, 8, 8), (1, 5, 17, 17), (2, 4, 7, 9)])
    def test_avg_pool_count_include_pad_false(self, shape):
        x = torch.randn(*shape)
        ref = F.avg_pool2d(x, kernel_size=3, stride=1, padding=1, count_include_pad=False)
        out = _avg_pool_no_pad_count(jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-5, atol=1e-6)

    def test_avg_pool_differs_from_unpatched(self):
        # the patch matters: corners divide by 4 not 9
        x = torch.ones(1, 1, 4, 4)
        patched = _avg_pool_no_pad_count(jnp.asarray(x.numpy()))
        unpatched = F.avg_pool2d(x, 3, 1, 1, count_include_pad=True).numpy()
        assert np.allclose(np.asarray(patched), 1.0)
        assert not np.allclose(unpatched, 1.0)

    @pytest.mark.parametrize("stride,pad", [(2, 0), (1, 1)])
    def test_max_pool(self, stride, pad):
        x = torch.randn(2, 3, 9, 9)
        ref = F.max_pool2d(x, kernel_size=3, stride=stride, padding=pad)
        out = _max_pool(jnp.asarray(x.numpy()), window=3, stride=stride, padding=pad)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-6)


class _BasicConv2d(nn.Module):
    """torchvision BasicConv2d: conv(bias=False) + BN(eps=1e-3) + relu."""

    def __init__(self, in_c, out_c, **kw):
        super().__init__()
        self.conv = nn.Conv2d(in_c, out_c, bias=False, **kw)
        self.bn = nn.BatchNorm2d(out_c, eps=0.001)
        # random eval-mode stats so folding is actually exercised
        with torch.no_grad():
            self.bn.weight.copy_(torch.rand(out_c) + 0.5)
            self.bn.bias.copy_(torch.randn(out_c) * 0.1)
            self.bn.running_mean.copy_(torch.randn(out_c) * 0.2)
            self.bn.running_var.copy_(torch.rand(out_c) + 0.5)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TestBNFolding:
    def test_conv_bn_relu_eval(self):
        import jax

        from ldmae_tpu.models.inception import _conv

        m = _BasicConv2d(4, 6, kernel_size=3, padding=1).eval()
        x = torch.randn(2, 4, 8, 8)
        with torch.no_grad():
            ref = m(x).numpy()
        # _fold_bn expects "<prefix>.conv.weight" naming
        sd = {f"b.{k}": v.numpy() for k, v in m.state_dict().items()}
        p = _fold_bn(sd, "b")
        out = jax.nn.relu(_conv(jnp.asarray(x.numpy()), p, padding=1))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


class _FIDInceptionA(nn.Module):
    """torchvision InceptionA with pytorch-fid's patched branch pool."""

    def __init__(self, in_c, pool_features):
        super().__init__()
        self.branch1x1 = _BasicConv2d(in_c, 64, kernel_size=1)
        self.branch5x5_1 = _BasicConv2d(in_c, 48, kernel_size=1)
        self.branch5x5_2 = _BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _BasicConv2d(in_c, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _BasicConv2d(in_c, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b5, bd, bp], 1)


class _FIDInceptionE2(nn.Module):
    """torchvision InceptionE with the MAX branch pool (calculate_fid.py:361-392)."""

    def __init__(self, in_c):
        super().__init__()
        self.branch1x1 = _BasicConv2d(in_c, 320, kernel_size=1)
        self.branch3x3_1 = _BasicConv2d(in_c, 384, kernel_size=1)
        self.branch3x3_2a = _BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = _BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _BasicConv2d(in_c, 448, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = _BasicConv2d(in_c, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = F.max_pool2d(x, kernel_size=3, stride=1, padding=1)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class _FIDInceptionC(nn.Module):
    """torchvision InceptionC with pytorch-fid's patched branch pool
    (calculate_fid.py:270+). c7=160 ⇒ this is Mixed_6d, the TF graph's
    mixed_6 block whose `conv` branch the ADM evaluator taps for sFID."""

    def __init__(self, in_c, c7):
        super().__init__()
        self.branch1x1 = _BasicConv2d(in_c, 192, kernel_size=1)
        self.branch7x7_1 = _BasicConv2d(in_c, c7, kernel_size=1)
        self.branch7x7_2 = _BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _BasicConv2d(in_c, c7, kernel_size=1)
        self.branch7x7dbl_2 = _BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = _BasicConv2d(in_c, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(
            self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))
            )
        )
        bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b7, bd, bp], 1)


def _block_params(module: nn.Module):
    sd = {k: v.numpy() for k, v in module.state_dict().items()}
    branches = sorted({k.split(".")[0] for k in sd})
    return {b: _fold_bn(sd, b) for b in branches}


class TestBlockGolden:
    def test_fid_inception_a(self):
        m = _FIDInceptionA(192, pool_features=32).eval()
        x = torch.randn(2, 192, 9, 9) * 0.5
        with torch.no_grad():
            ref = m(x).numpy()
        out = _inception_a(jnp.asarray(x.numpy()), _block_params(m))
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)

    def test_fid_inception_e2_max_pool_branch(self):
        m = _FIDInceptionE2(1280).eval()
        x = torch.randn(1, 1280, 5, 5) * 0.5
        with torch.no_grad():
            ref = m(x).numpy()
        out = _inception_e(jnp.asarray(x.numpy()), _block_params(m), pool="max")
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


class TestMixed6ConvTap:
    """The ADM sFID tap: TF `mixed_6/conv:0` (evaluator.py:24,610-614) =
    post-relu Mixed_6d.branch1x1 = first 192 channels of the Mixed_6d block
    output (the `conv` branch is concatenated first in both graphs)."""

    def test_inception_c_block_and_conv_branch_golden(self):
        m = _FIDInceptionC(768, c7=160).eval()  # Mixed_6d dims
        x = torch.randn(2, 768, 9, 9) * 0.5
        with torch.no_grad():
            ref_block = m(x).numpy()
            ref_tap = m.branch1x1(x).numpy()  # post-relu 1x1 branch
        out = np.asarray(_inception_c(jnp.asarray(x.numpy()), _block_params(m)))
        assert out.shape == ref_block.shape
        np.testing.assert_allclose(out, ref_block, rtol=1e-3, atol=1e-4)
        # the tap recipe: first 192 output channels == the conv branch
        np.testing.assert_allclose(out[:, :192], ref_tap, rtol=1e-3, atol=1e-4)
        assert np.allclose(ref_block[:, :192], ref_tap)

    def test_forward_tap_equals_block_slice_and_shape(self):
        import jax

        from ldmae_tpu.models.inception import (
            inception_forward,
            init_random_inception_params,
        )

        params = init_random_inception_params(jax.random.key(0))
        x = jnp.asarray(np.random.default_rng(1).random((2, 64, 64, 3)), jnp.float32)
        _, sp = inception_forward(params, x, return_spatial=True,
                                  spatial_tap="mixed_6_conv")
        _, sp_block = inception_forward(params, x, return_spatial=True,
                                        spatial_tap="Mixed_6d")
        assert sp.shape == (2, 192, 17, 17)  # ADM: (N,17,17,192) NHWC
        np.testing.assert_allclose(np.asarray(sp), np.asarray(sp_block[:, :192]))

    def test_unknown_tap_raises(self):
        import jax

        from ldmae_tpu.models.inception import (
            inception_forward,
            init_random_inception_params,
        )

        params = init_random_inception_params(jax.random.key(0))
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        with pytest.raises(ValueError, match="spatial_tap"):
            inception_forward(params, x, return_spatial=True,
                              spatial_tap="mixed_nope")


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
