"""Isolate the pair_batch regression: time batched (B=8/4) vs sequential stage calls.

Scalar-forced single-call timing (3.5ms overhead per call is negligible at these op
sizes — see microbench_conv.py).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from atvsnet_tpu.utils.runtime import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from atvsnet_tpu.nn.crm import crm, init_crm  # noqa: E402
from atvsnet_tpu.geometry.homography import get_homographies  # noqa: E402
from atvsnet_tpu.geometry.warp import plane_sweep_warp  # noqa: E402
from atvsnet_tpu.data.synthetic import synthetic_scene  # noqa: E402

D, h, w = 128, 120, 224


def timeit(name, fn, *args, iters=4):
    g = jax.jit(
        lambda *a: jax.tree_util.tree_reduce(
            lambda acc, leaf: acc + jnp.sum(leaf.astype(jnp.float32)), fn(*a), jnp.float32(0)
        )
    )
    np.asarray(g(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    crm_p = init_crm(jax.random.PRNGKey(0), 64, 8, prob_output=True)

    feat1 = jnp.asarray(rng.rand(1, h, w, 32).astype(np.float32)).astype(dt)
    warped1 = jnp.asarray(rng.rand(1, D, h, w, 32).astype(np.float32)).astype(dt)
    timeit("CRM B=1", lambda x, r: crm(crm_p, (x, r))[0], warped1, feat1)

    for G in (2, 4, 8):
        warpedG = jnp.asarray(rng.rand(G, D, h, w, 32).astype(np.float32)).astype(dt)
        featG = jnp.asarray(rng.rand(G, h, w, 32).astype(np.float32)).astype(dt)
        timeit(f"CRM B={G} grouped", lambda x, r, G=G: crm(crm_p, (x, r), bn_groups=G)[0], warpedG, featG)

    # warp: 1 sweep vs 8 batched sweeps
    _, cams = synthetic_scene(view_num=2, H=h * 4, W=w * 4, D=D, seed=0)
    cams = jnp.asarray(cams)
    ds, di = cams[:, 0, 1, 3, 0], cams[:, 0, 1, 3, 1]
    homos1 = jax.jit(lambda: get_homographies(cams[:, 0], cams[:, 1], D, ds, di, True))()
    timeit("warp B=1", plane_sweep_warp, feat1, homos1)
    for G in (8,):
        featG = jnp.asarray(rng.rand(G, h, w, 32).astype(np.float32)).astype(dt)
        camsA = jnp.concatenate([cams[:, 0]] * G, axis=0)
        camsB = jnp.concatenate([cams[:, 1]] * G, axis=0)
        dsG, diG = jnp.tile(ds, G), jnp.tile(di, G)
        homosG = jax.jit(lambda: get_homographies(camsA, camsB, D, dsG, diG, True))()
        timeit(f"warp B={G}", plane_sweep_warp, featG, homosG)


if __name__ == "__main__":
    main()
