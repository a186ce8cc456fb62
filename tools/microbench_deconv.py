"""Deconv lowering shootout at CRM/refine shapes: VJP (current) vs parity-shuffle.

In-jit loop timing (see microbench_hotops.py for methodology).
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


from tools._bench import loop_time  # noqa: E402

def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    # (label, input shape, Ci, Co) at eval size 480x896 -> cost volume 128x120x224
    cases = [
        ("6_0: 16->8  out full res", (1, 64, 60, 112, 16), 8),
        ("5_0: 32->16 out 1/2 res", (1, 32, 30, 56, 32), 16),
        ("4_0: 64->32 out 1/4 res", (1, 16, 15, 28, 64), 32),
    ]
    for label, shp, Co in cases:
        Ci = shp[-1]
        x = jnp.asarray(rng.rand(*shp).astype(np.float32)).astype(dt)
        wk = jnp.asarray(rng.rand(3, 3, 3, Co, Ci).astype(np.float32))
        loop_time(f"deconv VJP     {label}", lambda v, wk=wk: L.deconv(v, wk), x)
        loop_time(f"deconv shuffle {label}", lambda v, wk=wk: L._deconv3d_s2_shuffle(v, wk.astype(dt)), x)


if __name__ == "__main__":
    main()
