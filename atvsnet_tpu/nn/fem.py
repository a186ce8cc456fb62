"""Feature extraction modules (FEM).

ResNetDS2SPP (reference cnn_wrapper/atvsnet.py:254-292): 3 stem conv_bn (stride 2),
resnet trunk (stride 2 inside conv1_x -> overall 1/4 res), dilated blocks, 4-branch
spatial pyramid pooling with align-corners bilinear upsampling, fused to a 32-channel
feature map at H/4 x W/4.

ResNetDS2SPP_shallow_f16 (atvsnet.py:245-251): 3 bottlenecks at stride 4 -> 16-channel
feature for the refinement stage.
"""

from __future__ import annotations

import jax.numpy as jnp

from atvsnet_tpu.nn import layers as L
from atvsnet_tpu.nn.blocks import init_res_block, res_block
from atvsnet_tpu.geometry.depth_regression import resize_bilinear_align_corners

_SPP_POOLS = (64, 32, 16, 8)


def init_fem(key, base_filter: int = 32) -> dict:
    f = base_filter
    p = {
        "conv0_0": L.init_conv(key, "conv0_0", 3, 3, f),
        "conv0_1": L.init_conv(key, "conv0_1", 3, f, f),
        "conv0_2": L.init_conv(key, "conv0_2", 3, f, f),
    }
    p.update(init_res_block(key, "conv0_x", f, f, 3))
    p.update(init_res_block(key, "conv1_x", f, f * 2, 8))
    p.update(init_res_block(key, "conv2_x", f * 2, f * 4, 3))
    p.update(init_res_block(key, "conv3_x", f * 4, f * 4, 3))
    for i in range(4):
        p[f"branch_{i}_conv"] = L.init_conv(key, f"branch_{i}_conv", 3, f * 4, f)
    concat_ch = f * 2 + f * 4 + 4 * f  # conv1_x + conv3_x + 4 SPP branches
    p["fusion0"] = L.init_conv(key, "fusion0", 3, concat_ch, f * 4)
    p["fusion1"] = L.init_conv(key, "fusion1", 1, f * 4, f)
    return p


def fem(params: dict, image: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/4, W/4, base_filter)."""
    x = L.conv_bn(params["conv0_0"], image, stride=2, eps=eps)
    x = L.conv_bn(params["conv0_1"], x, eps=eps)
    x = L.conv_bn(params["conv0_2"], x, eps=eps)
    x = res_block(params, x, "conv0_x", 3, stride=1, rate=1, eps=eps)
    c1 = res_block(params, x, "conv1_x", 8, stride=2, rate=1, eps=eps)
    x = res_block(params, c1, "conv2_x", 3, stride=1, rate=2, eps=eps)
    c3 = res_block(params, x, "conv3_x", 3, stride=1, rate=4, eps=eps)

    h, w = c3.shape[1], c3.shape[2]
    branches = []
    for i, pool in enumerate(_SPP_POOLS):
        b = L.avg_pool_same(c3, pool, pool)
        b = L.conv_bn(params[f"branch_{i}_conv"], b, eps=eps)
        branches.append(resize_bilinear_align_corners(b, h, w))

    x = jnp.concatenate([c1, c3] + branches, axis=-1)
    x = L.conv_bn(params["fusion0"], x, eps=eps)
    return L.conv(x, params["fusion1"]["w"])  # 1x1, no relu, no bias


def init_fem_shallow(key, base_filter: int = 16) -> dict:
    p = {}
    p.update(init_res_block(key, "global_refine_conv0_x", 3, base_filter, 3))
    p["global_refine_shallow_feature"] = L.init_conv(
        key, "global_refine_shallow_feature", 1, base_filter, base_filter
    )
    return p


def fem_shallow(params: dict, image: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/4, W/4, 16)."""
    x = res_block(params, image, "global_refine_conv0_x", 3, stride=4, rate=1, eps=eps)
    return L.conv(x, params["global_refine_shallow_feature"]["w"])
