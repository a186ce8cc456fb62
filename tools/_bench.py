"""Shared in-jit loop timer for the microbench tools.

The tunneled axon platform has ~3.5ms per-call overhead and block_until_ready can
return before execution, so sub-millisecond ops are timed by running `iters`
repetitions inside ONE jitted lax.scan. The carry is the op input, re-linked each
iteration through a 1-element dynamic_update_slice (O(1) cost, defeats CSE/DCE
without polluting the bandwidth measurement). NOTE: closure constants are hoisted
out of the loop — anything computed only from non-carry inputs is NOT timed.
"""

from __future__ import annotations

import time

import numpy as np

OVERHEAD_S = 0.0035  # measured per-call round-trip overhead on the axon platform


def loop_time(name, op, x, iters=12, gbytes=None, extra=""):
    """Time `op(x)` over `iters` in-jit repetitions; prints and returns s/iter."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    nd = x.ndim

    def body(c, _):
        y = op(c)
        s = jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.sum(jax.tree_util.tree_leaves(l)[0].ravel()[:1].astype(jnp.float32)),
            y,
            jnp.float32(0),
        )
        upd = (c.ravel()[:1] + (s * 1e-30).astype(c.dtype)).reshape((1,) * nd)
        c2 = lax.dynamic_update_slice(c, upd.astype(c.dtype), (0,) * nd)
        return c2, ()

    f = jax.jit(lambda x0: jnp.sum(lax.scan(body, x0, None, length=iters)[0].ravel()[:1]))
    np.asarray(f(x))  # compile + warm
    t0 = time.perf_counter()
    out = f(x)
    np.asarray(out)
    dt = (time.perf_counter() - t0 - OVERHEAD_S) / iters
    bw = f"  {gbytes / dt:7.1f} GB/s" if gbytes else ""
    print(f"{name:50s} {dt * 1e3:8.2f} ms{bw}  {extra}", flush=True)
    return dt
