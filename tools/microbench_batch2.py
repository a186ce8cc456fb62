"""Does batching the siamese pair's two sweep directions into one CRM pass win?

Measures CRM / conv_bn / batch_stat_norm at conv batch 1 vs 2 (in-jit loops, see
microbench_hotops.py for methodology). If t(B=2) << 2*t(B=1) the pipeline should run
both directions of each pair through ONE set of ops.

Usage: python tools/microbench_batch2.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from atvsnet_tpu.utils.runtime import setup_jax  # noqa: E402

setup_jax()

import jax.numpy as jnp  # noqa: E402

from atvsnet_tpu.nn import layers as L  # noqa: E402

D, h, w = 128, 120, 224


from tools._bench import loop_time  # noqa: E402

def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    w88 = jnp.asarray(rng.rand(3, 3, 3, 8, 8).astype(np.float32))
    for B in (8,):
        x8 = jnp.asarray(rng.rand(B, D, h, w, 8).astype(np.float32)).astype(dt)
        loop_time(f"conv_bn 8->8 full res B={B}", lambda x: L.conv_bn({"w": w88}, x), x8, 8)
        loop_time(f"batch_stat_norm 8ch B={B} grouped", lambda x: L.batch_stat_norm(x, groups=B), x8, 8)
        loop_time(f"conv3d s1 8->8 input-stacked B={B}", lambda x: L._conv3d_input_stacked(x, w88.astype(dt)), x8, 8)
        loop_time(f"conv3d s1 8->8 decomposed B={B}", lambda x: L._conv3d_decomposed(x, w88.astype(dt), 1), x8, 8)

    w_s2 = jnp.asarray(rng.rand(3, 3, 3, 32, 16).astype(np.float32)).astype(dt)
    for B in (1, 2, 8):
        x32 = jnp.asarray(rng.rand(B, D, h, w, 32).astype(np.float32)).astype(dt)
        loop_time(f"strided s2 32->16 B={B}", lambda x: L._conv3d_s2_strided(x, w_s2), x32, 8)
        if B == 8:
            loop_time(f"pair-fold s2 32->16 B={B}", lambda x: L._conv3d_s2_pairfold(x, w_s2), x32, 8)

    w_dc = jnp.asarray(rng.rand(3, 3, 3, 8, 16).astype(np.float32))
    for B in (8,):
        x16 = jnp.asarray(rng.rand(B, D // 2, h // 2, w // 2, 16).astype(np.float32)).astype(dt)
        loop_time(f"deconv3d s2 16->8 B={B}", lambda x: L.deconv(x, w_dc), x16, 8)


if __name__ == "__main__":
    main()
