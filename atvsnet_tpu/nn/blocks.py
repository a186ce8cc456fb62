"""Pre-activation bottleneck residual units (reference cnn_wrapper/network.py:552-616).

slim-default semantics: preact = relu(BN_center(x)); conv1 = relu(1x1 + bias);
conv2 = relu(kxk dilated + bias) with fixed padding when strided; conv3 = 1x1 + bias
(no activation); shortcut = identity / 1x1-maxpool / 1x1 conv of preact with bias.
Note depth_bottleneck == depth (no channel reduction, network.py:582).
"""

from __future__ import annotations

import jax.numpy as jnp

from atvsnet_tpu.nn import layers as L


def init_bottleneck(key, name: str, cin: int, depth: int, k: int = 3) -> dict:
    p = {
        "preact": {"beta": jnp.zeros((cin,), jnp.float32)},
        "conv1": L.init_conv(key, f"{name}/conv1", 1, cin, depth, biased=True),
        "conv2": L.init_conv(key, f"{name}/conv2", k, depth, depth, biased=True),
        "conv3": L.init_conv(key, f"{name}/conv3", 1, depth, depth, biased=True),
    }
    if depth != cin:
        p["shortcut"] = L.init_conv(key, f"{name}/shortcut", 1, cin, depth, biased=True)
    return p


def bottleneck(params: dict, x: jnp.ndarray, stride: int = 1, rate: int = 1, eps: float = 1e-3) -> jnp.ndarray:
    cin = x.shape[-1]
    preact = jnp.maximum(L.batch_stat_norm(x, eps=eps, beta=params["preact"]["beta"]), 0)

    if "shortcut" in params:
        sc = params["shortcut"]
        shortcut = L.conv(preact, sc["w"], sc["b"], stride=stride)
    elif stride == 1:
        shortcut = x
    else:
        shortcut = L.max_pool_same(x, 1, stride)

    c1 = params["conv1"]
    residual = L.conv(preact, c1["w"], c1["b"], relu=True)
    c2 = params["conv2"]
    if stride == 1:
        residual = L.conv(residual, c2["w"], c2["b"], rate=rate, relu=True)
    else:
        residual = L.fixed_pad_conv(residual, c2["w"], c2["b"], stride=stride, rate=rate, relu=True)
    c3 = params["conv3"]
    residual = L.conv(residual, c3["w"], c3["b"])
    del cin
    return shortcut + residual


def res_block_names(name: str, num_block: int) -> list[str]:
    """Scope names used by the reference (network.py:604-616): name_0, ..., name."""
    if num_block == 1:
        return [name]
    return [f"{name}_{i}" for i in range(num_block - 1)] + [name]


def init_res_block(key, name: str, cin: int, depth: int, num_block: int, k: int = 3) -> dict:
    p = {}
    c = cin
    for sub in res_block_names(name, num_block):
        p[sub] = init_bottleneck(key, sub, c, depth, k)
        c = depth
    return p


def res_block(
    params: dict,
    x: jnp.ndarray,
    name: str,
    num_block: int,
    stride: int = 1,
    rate: int = 1,
    eps: float = 1e-3,
) -> jnp.ndarray:
    names = res_block_names(name, num_block)
    y = bottleneck(params[names[0]], x, stride=stride, rate=rate, eps=eps)
    for sub in names[1:]:
        y = bottleneck(params[sub], y, stride=1, rate=rate, eps=eps)
    return y
