"""Split the plane-sweep warp cost: coords/weights chain vs gather+lerp.

Runs plane_sweep_warp in an in-jit loop twice: once with homographies as a loop
CONSTANT (XLA hoists the whole coords/index/weight chain out of the loop — measures
gather+lerp only) and once loop-VARIED (measures the full warp).
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
from jax import lax  # noqa: E402

from atvsnet_tpu.geometry.homography import get_homographies  # noqa: E402
from atvsnet_tpu.geometry.warp import plane_sweep_warp  # noqa: E402
from atvsnet_tpu.data.synthetic import synthetic_scene  # noqa: E402

D, h, w = 128, 120, 224


def run(name, fn, args, iters=12):
    f = jax.jit(fn)
    np.asarray(f(*args))
    t0 = time.perf_counter()
    out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0 - 0.0035) / iters
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.rand(1, h, w, 32).astype(np.float32)).astype(jnp.bfloat16)
    _, cams = synthetic_scene(view_num=2, H=h * 4, W=w * 4, D=D, seed=0)
    cams = jnp.asarray(cams)
    ds, di = cams[:, 0, 1, 3, 0], cams[:, 0, 1, 3, 1]
    homos = jax.jit(lambda: get_homographies(cams[:, 0], cams[:, 1], D, ds, di, True))()
    homos = jax.block_until_ready(homos)
    iters = 12

    def hoisted(f0, hm):
        def body(c, _):
            y = plane_sweep_warp(c, hm)
            s = jnp.sum(y.ravel()[:1].astype(jnp.float32))
            upd = (c.ravel()[:1] + (s * 1e-30).astype(c.dtype)).reshape((1,) * c.ndim)
            return lax.dynamic_update_slice(c, upd.astype(c.dtype), (0,) * c.ndim), ()

        return jnp.sum(lax.scan(body, f0, None, length=iters)[0].ravel()[:1])

    def varied(f0, hm):
        def body(carry, _):
            c, hmc = carry
            y = plane_sweep_warp(c, hmc)
            s = (jnp.sum(y.ravel()[:1].astype(jnp.float32)) * 1e-30)
            upd = (c.ravel()[:1] + s.astype(c.dtype)).reshape((1,) * c.ndim)
            c2 = lax.dynamic_update_slice(c, upd.astype(c.dtype), (0,) * c.ndim)
            hm2 = hmc + (s).astype(hmc.dtype)  # O(small) update, defeats hoisting
            return (c2, hm2), ()

        (c, _), _ = lax.scan(body, (f0, hm), None, length=iters)
        return jnp.sum(c.ravel()[:1])

    run("warp, coords chain HOISTED (gather+lerp)", hoisted, (feat, homos), iters)
    run("warp, full chain in loop", varied, (feat, homos), iters)


if __name__ == "__main__":
    main()
