"""Microbenchmark the pipeline's hot ops with in-jit loops (effective GB/s).

Each op runs `iters` times inside ONE jitted lax.scan whose carry is the op input,
re-linked each iteration through a 1-element dynamic_update_slice (O(1) cost, defeats
CSE/DCE without polluting the bandwidth measurement). The tunneled axon platform has
~3.5ms per-call overhead and block_until_ready returns early, so the scalar-forced
single-call pattern of microbench_conv.py is too coarse for sub-millisecond ops.

Usage: python tools/microbench_hotops.py [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from atvsnet_tpu.utils.runtime import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from atvsnet_tpu.nn import layers as L  # noqa: E402

B, D, h, w = 1, 128, 120, 224
HW = h * w
P = D * HW  # samples per plane sweep


from tools._bench import loop_time  # noqa: E402

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    it = args.iters
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    # ---- raw row gathers at varying row width (the plane-sweep primitive) ----
    idx = jnp.asarray(rng.randint(0, HW, size=(P,)).astype(np.int32))
    for C in (32, 64, 128, 256):
        table = jnp.asarray(rng.rand(HW, C).astype(np.float32)).astype(dt)
        gb = P * C * 2 / 1e9  # row-read traffic

        def g(t, idx=idx):
            return jnp.take(t, idx, axis=0, mode="clip")

        loop_time(f"gather {C}ch rows ({C*2}B) x{P/1e6:.1f}M", g, table, it, gb,
                  extra=f"(row-read {gb*1e3:.0f} MB)")

    # ---- full plane-sweep warp, feature width ----
    from atvsnet_tpu.geometry.homography import get_homographies
    from atvsnet_tpu.geometry.warp import plane_sweep_warp
    from atvsnet_tpu.data.synthetic import synthetic_scene

    _, cams = synthetic_scene(view_num=2, H=h * 4, W=w * 4, D=D, seed=0)
    cams = jnp.asarray(cams)
    ds, di = cams[:, 0, 1, 3, 0], cams[:, 0, 1, 3, 1]
    homos = jax.jit(lambda: get_homographies(cams[:, 0], cams[:, 1], D, ds, di, True))()
    feat = jnp.asarray(rng.rand(B, h, w, 32).astype(np.float32)).astype(dt)
    # traffic: packed-row reads 4C + output write C over D*HW samples
    gb_warp = P * (4 * 32 + 32) * 2 / 1e9
    loop_time("plane_sweep_warp feat32 D128", lambda f: plane_sweep_warp(f, homos), feat, it, gb_warp)

    # ---- CRM one pass (structured input) ----
    from atvsnet_tpu.nn.crm import crm, init_crm

    crm_p = init_crm(jax.random.PRNGKey(0), 64, 8, prob_output=True)
    warped = jnp.asarray(rng.rand(B, D, h, w, 32).astype(np.float32)).astype(dt)
    loop_time("CRM pass (structured, 32ch warped)", lambda x: crm(crm_p, (x, feat))[0], warped, max(2, it // 4))

    # ---- individual CRM convs at full res ----
    w_b0_0_1 = jnp.asarray(rng.rand(3, 3, 3, 32, 8).astype(np.float32))
    gb = (P * 32 + 3 * P * 8 * 2 + P * 8) * 2 / 1e9  # read x, write+read 3Co, write Co
    loop_time("conv3d s1 32->8 full res (decomposed)", lambda x: L.conv(x, w_b0_0_1), warped, it, gb)

    x8 = jnp.asarray(rng.rand(B, D, h, w, 8).astype(np.float32)).astype(dt)
    w_8_8 = jnp.asarray(rng.rand(3, 3, 3, 8, 8).astype(np.float32))
    gb = (P * 8 + P * 24 * 2 + P * 8) * 2 / 1e9
    loop_time("conv3d s1 8->8 full res (input-stacked)", lambda x: L.conv(x, w_8_8), x8, it, gb)

    w_s2 = jnp.asarray(rng.rand(3, 3, 3, 32, 16).astype(np.float32))
    gb = (P * 32 + P / 2 * 96 + P / 8 * 16) * 2 / 1e9
    loop_time("conv3d s2 32->16 (pair-fold)", lambda x: L._conv3d_s2_pairfold(x, w_s2.astype(dt)), warped, it, gb)

    # ---- deconv to full res (b*_6_0) ----
    x16 = jnp.asarray(rng.rand(B, D // 2, h // 2, w // 2, 16).astype(np.float32)).astype(dt)
    w_dc = jnp.asarray(rng.rand(3, 3, 3, 8, 16).astype(np.float32))
    gb = (P / 8 * 16 + P * 8) * 2 / 1e9
    loop_time("deconv3d s2 16->8 to full res", lambda x: L.deconv(x, w_dc), x16, it, gb)

    # ---- batch_stat_norm at full res 8ch ----
    gb = (2 * P * 8 + P * 8) * 2 / 1e9  # 2 reads + 1 write (bf16 path)
    loop_time("batch_stat_norm (D,h,w,8) bf16", lambda x: L.batch_stat_norm(x), x8, it, gb)
    gb = (2 * P * 16 + P * 16) * 2 / 1e9
    xw = jnp.asarray(rng.rand(B, D, h, w, 16).astype(np.float32)).astype(dt)
    loop_time("batch_stat_norm (D,h,w,16) bf16", lambda x: L.batch_stat_norm(x), xw, it, gb)

    # ---- attention conv (AAM1): batch P=4 pairs ----
    att = jnp.asarray(rng.rand(4, D, h, w, 8).astype(np.float32)).astype(dt)
    w_att = jnp.asarray(rng.rand(3, 3, 3, 8, 16).astype(np.float32))
    gb = 4 * (P * 8 + 3 * P * 16 * 2 + P * 16) * 2 / 1e9
    loop_time("AAM conv 8->16 batch4 (decomposed)", lambda x: L.conv(x, w_att), att, max(2, it // 4), gb)

    # ---- elementwise roofline anchor: full-res copy-scale ----
    gb = 2 * P * 8 * 2 / 1e9
    loop_time("elementwise x*1.0001 (D,h,w,8)", lambda x: x * jnp.asarray(1.0001, x.dtype), x8, it, gb)
    gb = 2 * P * 32 * 2 / 1e9
    loop_time("elementwise x*1.0001 (D,h,w,32)", lambda x: x * jnp.asarray(1.0001, x.dtype), warped, it, gb)


if __name__ == "__main__":
    main()
