"""LPIPS golden anchors vs a hand-built torch reference (VERDICT r2 item 8).

The reference LPIPS (/root/reference/LDMAE/models/lpips.py:45-184) is
torchvision-vgg16 feature slices relu{1_2,2_2,3_3,4_3,5_3} behind a
ScalingLayer, channel-unit normalisation, squared diffs, 1×1 NetLin
projections, spatial average, summed. torchvision is absent from this image,
so the test hand-builds the exact ``features`` Sequential (same layer
indices: convs at 0,2,5,7,10,12,14,17,19,21,24,26,28) with shared random
weights routed through the torchvision/taming state_dict naming our importer
consumes, then checks layer-by-layer feature parity and the end-to-end
value against ``ldmae_tpu.models.lpips`` — the same treatment the Inception
port got in test_inception_golden.py.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import jax.numpy as jnp

from ldmae_tpu.models.lpips import (
    _CHNS,
    _SCALE,
    _SHIFT,
    import_lpips_weights,
    lpips,
    vgg_slices,
)

torch.manual_seed(0)

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512, "M"]
# slice boundaries in features indices (lpips.py:146-155):
# slice1=[0,4) slice2=[4,9) slice3=[9,16) slice4=[16,23) slice5=[23,30)
_SLICE_ENDS = [4, 9, 16, 23, 30]


def _build_torch_features() -> nn.Sequential:
    """torchvision ``vgg16().features`` layer-for-layer."""
    layers, cin = [], 3
    for v in _VGG_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, v, 3, padding=1))
            layers.append(nn.ReLU())
            cin = v
    return nn.Sequential(*layers)


def _torch_slices(features: nn.Sequential, x: torch.Tensor):
    """The vgg16 wrapper's five relu taps (lpips.py:135-175)."""
    outs, h, start = [], x, 0
    for end in _SLICE_ENDS:
        for i in range(start, end):
            h = features[i](h)
        outs.append(h)
        start = end
    return outs


def _normalize_tensor(x, eps=1e-10):
    return x / (torch.sqrt(torch.sum(x**2, dim=1, keepdim=True)) + eps)


@pytest.fixture(scope="module")
def stacks():
    """(torch features, torch lin weights, our params) with shared weights."""
    feats = _build_torch_features()
    feats.eval()
    # route through the state_dict namings the importer consumes:
    # torchvision 'features.N.weight' + taming 'lin{k}.model.1.weight'
    vgg_sd = {f"features.{k}": v.numpy() for k, v in feats.state_dict().items()}
    g = torch.Generator().manual_seed(7)
    lin_ws = [
        torch.rand((1, c, 1, 1), generator=g) * 0.1 for c in _CHNS
    ]
    lin_sd = {f"lin{k}.model.1.weight": w.numpy() for k, w in enumerate(lin_ws)}
    params = import_lpips_weights(vgg_sd, lin_sd)
    return feats, lin_ws, params


def _scale(x: torch.Tensor) -> torch.Tensor:
    shift = torch.tensor(_SHIFT)[None, :, None, None]
    scale = torch.tensor(_SCALE)[None, :, None, None]
    return (x - shift) / scale


class TestLPIPSGolden:
    def test_layerwise_feature_parity(self, stacks):
        feats, _, params = stacks
        x = torch.randn(2, 3, 64, 64) * 0.5
        with torch.no_grad():
            ref = _torch_slices(feats, _scale(x))
        ours = vgg_slices(params, jnp.asarray(_scale(x).numpy()))
        assert len(ref) == len(ours) == 5
        for k, (r, o) in enumerate(zip(ref, ours)):
            np.testing.assert_allclose(
                np.asarray(o), r.numpy(), rtol=1e-4, atol=1e-4,
                err_msg=f"slice {k}",
            )

    def test_end_to_end_parity(self, stacks):
        feats, lin_ws, params = stacks
        x0 = torch.randn(3, 3, 64, 64) * 0.5
        x1 = x0 + 0.2 * torch.randn(3, 3, 64, 64)
        with torch.no_grad():
            o0 = _torch_slices(feats, _scale(x0))
            o1 = _torch_slices(feats, _scale(x1))
            val = 0.0
            for k in range(5):
                d = (_normalize_tensor(o0[k]) - _normalize_tensor(o1[k])) ** 2
                proj = torch.nn.functional.conv2d(d, lin_ws[k])
                val = val + proj.mean(dim=[2, 3], keepdim=True)
        ours = lpips(params, jnp.asarray(x0.numpy()), jnp.asarray(x1.numpy()))
        np.testing.assert_allclose(
            np.asarray(ours), val.numpy(), rtol=1e-4, atol=1e-6
        )

    def test_identical_inputs_zero(self, stacks):
        _, _, params = stacks
        x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 64, 64)), jnp.float32)
        np.testing.assert_allclose(np.asarray(lpips(params, x, x)), 0.0, atol=1e-7)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
