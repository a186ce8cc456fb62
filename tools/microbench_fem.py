"""FEM stage breakdown (in-jit loops): stem vs res trunk vs SPP vs fusion."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from atvsnet_tpu.utils.runtime import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from atvsnet_tpu.nn import layers as L  # noqa: E402
from atvsnet_tpu.nn.blocks import res_block  # noqa: E402
from atvsnet_tpu.nn.fem import _SPP_POOLS, init_fem  # noqa: E402
from atvsnet_tpu.geometry.depth_regression import resize_bilinear_align_corners  # noqa: E402


from tools._bench import loop_time  # noqa: E402

def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    p = init_fem(jax.random.PRNGKey(0), 32)
    eps = 1e-3
    N, H, W = 5, 480, 896
    img = jnp.asarray(rng.rand(N, H, W, 3).astype(np.float32)).astype(dt)

    def stem(x):
        x = L.conv_bn(p["conv0_0"], x, stride=2, eps=eps)
        x = L.conv_bn(p["conv0_1"], x, eps=eps)
        return L.conv_bn(p["conv0_2"], x, eps=eps)

    loop_time("stem (3 convs, 480x896 -> 240x448x32)", stem, img)

    x1 = jnp.asarray(rng.rand(N, 240, 448, 32).astype(np.float32)).astype(dt)
    loop_time("conv0_x (3 blocks @240x448x32)", lambda v: res_block(p, v, "conv0_x", 3, 1, 1, eps), x1)
    loop_time("conv1_x (8 blocks, s2 -> 120x224x64)", lambda v: res_block(p, v, "conv1_x", 8, 2, 1, eps), x1)

    c1 = jnp.asarray(rng.rand(N, 120, 224, 64).astype(np.float32)).astype(dt)
    loop_time("conv2_x (3 blocks, rate2, 128ch)", lambda v: res_block(p, v, "conv2_x", 3, 1, 2, eps), c1)
    c3 = jnp.asarray(rng.rand(N, 120, 224, 128).astype(np.float32)).astype(dt)
    loop_time("conv3_x (3 blocks, rate4)", lambda v: res_block(p, v, "conv3_x", 3, 1, 4, eps), c3)

    def spp(v):
        outs = []
        for i, pool in enumerate(_SPP_POOLS):
            b = L.avg_pool_same(v, pool, pool)
            b = L.conv_bn(p[f"branch_{i}_conv"], b, eps=eps)
            outs.append(resize_bilinear_align_corners(b, 120, 224))
        return outs

    loop_time("SPP (4 branches pool+conv+resize)", spp, c3)

    cat = jnp.asarray(rng.rand(N, 120, 224, 64 + 128 + 128).astype(np.float32)).astype(dt)

    def fuse(v):
        y = L.conv_bn(p["fusion0"], v, eps=eps)
        return L.conv(y, p["fusion1"]["w"])

    loop_time("fusion (3x3 320->128 + 1x1 ->32)", fuse, cat)


if __name__ == "__main__":
    main()
