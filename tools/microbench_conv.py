"""Microbenchmark: conv3d vs decomposed conv2d vs matmul at CRM shapes on the device.

Timing methodology for the tunneled axon TPU (see .claude/skills/verify/SKILL.md):
block_until_ready returns before execution and full-output np.asarray pays ~300MB/s
tunnel transfer, so every benchmarked function reduces to a SCALAR which is then
materialized; per-call round-trip overhead is ~3.5ms (measured) — report both raw and
overhead-corrected rates.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from atvsnet_tpu.utils.runtime import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

OVERHEAD_S = 0.0035


def timeit(name, fn, *args, iters=5, flops=None):
    """fn must return a scalar."""
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    eff = ""
    if flops:
        eff = f"  {flops / dt / 1e12:7.2f} TF/s raw, {flops / max(dt - OVERHEAD_S, 1e-9) / 1e12:7.2f} corrected"
    print(f"{name:42s} {dt * 1e3:9.2f} ms{eff}")
    return dt


def scalarize(f):
    return jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))


def main():
    dt = jnp.bfloat16
    B, D, h, w, Ci, Co = 1, 128, 120, 224, 32, 16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, D, h, w, Ci).astype(np.float32)).astype(dt)
    w3 = jnp.asarray(rng.rand(3, 3, 3, Ci, Co).astype(np.float32)).astype(dt)
    flops_s2 = 2 * 27 * Ci * Co * B * (D // 2) * (h // 2) * (w // 2)
    flops_s1 = flops_s2 * 8

    dn3 = ("NDHWC", "DHWIO", "NDHWC")
    dn2 = ("NHWC", "HWIO", "NHWC")

    timeit(
        "conv3d 3x3x3 s2",
        scalarize(lambda x, k: lax.conv_general_dilated(x, k, (2, 2, 2), "SAME", dimension_numbers=dn3)),
        x, w3, flops=flops_s2,
    )
    timeit(
        "conv3d 3x3x3 s1",
        scalarize(lambda x, k: lax.conv_general_dilated(x, k, (1, 1, 1), "SAME", dimension_numbers=dn3)),
        x, w3, flops=flops_s1,
    )

    def conv3d_via_2d_s1(x, k):
        Bx, Dx, hx, wx, C = x.shape
        x2 = x.reshape(Bx * Dx, hx, wx, C)
        ys = [
            lax.conv_general_dilated(x2, k[kd], (1, 1), "SAME", dimension_numbers=dn2)
            .reshape(Bx, Dx, hx, wx, -1)
            for kd in range(3)
        ]
        out = ys[1]
        out = out + jnp.concatenate([jnp.zeros_like(ys[0][:, :1]), ys[0][:, :-1]], 1)
        out = out + jnp.concatenate([ys[2][:, 1:], jnp.zeros_like(ys[2][:, :1])], 1)
        return out

    timeit("conv3d via 3x conv2d s1", scalarize(conv3d_via_2d_s1), x, w3, flops=flops_s1)

    # single conv2d with D folded into batch (lower bound for the decomposition)
    x2 = x.reshape(B * D, h, w, Ci)
    timeit(
        "conv2d 3x3 (D in batch) s1",
        scalarize(lambda x, k: lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn2)),
        x2, w3[1], flops=flops_s1 // 3,
    )

    # wide-channel conv2d for comparison (128 -> 128)
    xw = jnp.asarray(rng.rand(B * D // 4, h, w, 128).astype(np.float32)).astype(dt)
    ww = jnp.asarray(rng.rand(3, 3, 128, 128).astype(np.float32)).astype(dt)
    timeit(
        "conv2d 3x3 128->128ch",
        scalarize(lambda x, k: lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn2)),
        xw, ww, flops=2 * 9 * 128 * 128 * (B * D // 4) * h * w,
    )

    M, K, N = B * D * h * w, 27 * Ci, Co
    a = jnp.asarray(rng.rand(M, K).astype(np.float32)).astype(dt)
    b = jnp.asarray(rng.rand(K, N).astype(np.float32)).astype(dt)
    timeit("matmul (M=3.4M, K=864, N=16)", scalarize(lambda a, b: a @ b), a, b, flops=2 * M * K * N)

    from atvsnet_tpu.nn.layers import batch_stat_norm

    xb = jnp.asarray(rng.rand(B, D, h, w, 16).astype(np.float32)).astype(dt)
    timeit("batch_stat_norm (B,128,120,224,16)", scalarize(batch_stat_norm), xb)

    from atvsnet_tpu.geometry.warp import plane_sweep_warp
    from atvsnet_tpu.geometry.homography import get_homographies
    from atvsnet_tpu.data.synthetic import synthetic_scene

    _, cams = synthetic_scene(view_num=2, H=480, W=896, D=D)
    cams = jnp.asarray(cams)
    H8 = get_homographies(cams[:, 0], cams[:, 1], D, cams[:, 0, 1, 3, 0], cams[:, 0, 1, 3, 1])
    feat = jnp.asarray(rng.rand(1, 120, 224, 32).astype(np.float32)).astype(dt)
    timeit("plane_sweep_warp 32ch bf16", scalarize(plane_sweep_warp), feat, H8)
    timeit("plane_sweep_warp 1ch", scalarize(plane_sweep_warp), feat[..., :1], H8)

    # softmax over D
    pv = jnp.asarray(rng.rand(1, D, 120, 224).astype(np.float32))
    timeit("softmax over D (fp32)", scalarize(lambda p: jax.nn.softmax(-p, axis=1)), pv)


if __name__ == "__main__":
    main()
