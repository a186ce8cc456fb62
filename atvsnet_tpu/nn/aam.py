"""Attention aggregation module (AAM) over view pairs.

Reference cnn_wrapper/network.py:282-408: for each view slice x_i of the
(B, D, h, w, C, N) stack, with a per-view-applied UNIQUE kernel and a SHARED kernel,

    a_i = relu(conv3d(x_i, W_unique)) - relu(conv3d(x_i, W_shared))
          + sum_j relu(conv3d(x_j, W_shared))

then score = softmax_N(a) and output = sum_i score_i * x_i. The cross-view shared sum
is the information-exchange term — under view-sharded execution it is exactly a psum
over the view mesh axis (SURVEY.md §5).

The reference serializes the N convs with tf.scan (network.py:323-349); here the view
axis folds into the conv batch: two conv3d calls total, no scan.
"""

from __future__ import annotations

import jax.numpy as jnp

from atvsnet_tpu.nn import layers as L


def init_attention(key, scope: str, channels: int, kernel_size: int = 3) -> dict:
    base = f"{scope}/attention_activation"
    return {
        "weight_unique": L.glorot_normal(
            L.key_for(key, base + "/weight_unique"),
            (kernel_size,) * 3 + (channels, channels),
        ),
        "weight_shared": L.glorot_normal(
            L.key_for(key, base + "/weight_shared"),
            (kernel_size,) * 3 + (channels, channels),
        ),
    }


def attention_activation(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, h, w, C, N) -> per-view activations (B, D, h, w, C, N)."""
    B, D, h, w, C, N = x.shape
    xv = jnp.moveaxis(x, -1, 0).reshape(N * B, D, h, w, C)

    # one conv with [unique | shared] stacked on the output axis: same math, wider
    # (more MXU-efficient) kernel, half the dispatches. qin: AAM inputs are the
    # CRM/refine output volumes (sums of two stored lattice links), int8mxu-safe.
    w_cat = jnp.concatenate([params["weight_unique"], params["weight_shared"]], axis=-1)
    both = L.conv(xv, w_cat, relu=True, qin=True).reshape(N, B, D, h, w, 2 * C)
    unique, shared = both[..., :C], both[..., C:]
    shared_sum = jnp.sum(shared, axis=0)  # (B, D, h, w, C) — psum over views if sharded

    out = unique - shared + shared_sum[None]
    return jnp.moveaxis(out, 0, -1)  # (B, D, h, w, C, N)


def _softmax_views(act: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(act, axis=-1, keepdims=True)
    e = jnp.exp(act - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def attention_aggregate(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, h, w, C, N) -> (B, D, h, w, C): softmax-over-views weighted sum."""
    act = attention_activation(params, x).astype(jnp.float32)
    score = _softmax_views(act)
    return jnp.sum(score.astype(x.dtype) * x, axis=-1)


def attention_aggregate_stacked(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Same math as attention_aggregate but takes the view-LEADING stack
    (N, B, D, h, w, C) — the natural layout of the pipeline's lax.scan outputs.

    Avoids two full-volume transposes per AAM call (the (...,C,N) layout forces a
    materialized moveaxis in and another back out; at eval size the stack is ~880MB).
    """
    N, B = x.shape[:2]
    xv = x.reshape((N * B,) + x.shape[2:])              # free reshape: already contiguous

    # qin: see attention_activation — inputs are sums of stored lattice links
    w_cat = jnp.concatenate([params["weight_unique"], params["weight_shared"]], axis=-1)
    C = x.shape[-1]
    both = L.conv(xv, w_cat, relu=True, qin=True).reshape(x.shape[:-1] + (2 * C,))
    unique, shared = both[..., :C], both[..., C:]
    # fp32 softmax over views (a bf16 softmax variant measured NO faster end-to-end
    # — XLA fuses this chain without materializing the fp32 stack)
    act = (unique - shared + jnp.sum(shared, axis=0)[None]).astype(jnp.float32)

    m = jnp.max(act, axis=0, keepdims=True)
    e = jnp.exp(act - m)
    score = e / jnp.sum(e, axis=0, keepdims=True)
    return jnp.sum(score.astype(x.dtype) * x, axis=0)   # (B, D, h, w, C)


def attention_activation_2d(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """2D variant over (B, H, W, C, N) stacks (reference network.py:411-478)."""
    B, H, W, C, N = x.shape
    xv = jnp.moveaxis(x, -1, 0).reshape(N * B, H, W, C)
    unique = L.conv(xv, params["weight_unique"], relu=True).reshape(N, B, H, W, C)
    shared = L.conv(xv, params["weight_shared"], relu=True).reshape(N, B, H, W, C)
    out = unique - shared + jnp.sum(shared, axis=0)[None]
    return jnp.moveaxis(out, 0, -1)


def init_attention_2d(key, scope: str, channels: int, kernel_size: int = 3) -> dict:
    base = f"{scope}/attention_activation_2d"
    return {
        "weight_unique": L.glorot_normal(
            L.key_for(key, base + "/weight_unique"), (kernel_size,) * 2 + (channels, channels)
        ),
        "weight_shared": L.glorot_normal(
            L.key_for(key, base + "/weight_shared"), (kernel_size,) * 2 + (channels, channels)
        ),
    }


def init_output_conv(key, name: str, channels: int) -> dict:
    """3x3x3 conv to 1 channel, no relu/bias (OutputConv, atvsnet.py:216-226)."""
    return {name: L.init_conv(key, name, 3, channels, 1, nd=3)}


def output_conv(params: dict, name: str, cost_volume: jnp.ndarray) -> jnp.ndarray:
    """(B, D, h, w, C) -> (B, D, h, w).

    qin: the aggregated cost volume is a softmax-convex combination of the
    stacked lattice-link volumes (range-bounded by them), int8mxu-safe."""
    return L.conv(cost_volume, params[name]["w"], qin=True)[..., 0]
