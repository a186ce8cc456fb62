"""Stride-1 conv routing at HALF-res CRM shapes + updated in-loop CRM number."""

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
from atvsnet_tpu.nn.crm import crm, init_crm  # noqa: E402


from tools._bench import loop_time  # noqa: E402

def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    for (D, h, w_, Ci, Co) in [(64, 60, 112, 16, 16), (32, 30, 56, 32, 32)]:
        x = jnp.asarray(rng.rand(1, D, h, w_, Ci).astype(np.float32)).astype(dt)
        wk = jnp.asarray(rng.rand(3, 3, 3, Ci, Co).astype(np.float32)).astype(dt)
        loop_time(f"s1 {Ci}->{Co} ({D},{h},{w_}) decomposed", lambda v, wk=wk: L._conv3d_decomposed(v, wk, 1), x)
        loop_time(f"s1 {Ci}->{Co} ({D},{h},{w_}) input-stacked", lambda v, wk=wk: L._conv3d_input_stacked(v, wk), x)

    crm_p = init_crm(jax.random.PRNGKey(0), 64, 8, prob_output=True)
    warped = jnp.asarray(rng.rand(1, 128, 120, 224, 32).astype(np.float32)).astype(dt)
    feat = jnp.asarray(rng.rand(1, 120, 224, 32).astype(np.float32)).astype(dt)
    loop_time("CRM pass (tap-stacked s2, one-pass BN)", lambda v: crm(crm_p, (v, feat))[0], warped, 6)


if __name__ == "__main__":
    main()
