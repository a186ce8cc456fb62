"""Pallas TPU kernel: fused soft-argmin over the depth axis.

Computes depth(p) = sum_d sweep[d] * softmax_d(-cost[d, p]) in ONE pass over the cost
volume: XLA's lowering of softmax + expectation walks the (B, D, h, w) volume several
times (max-reduce, exp/sum, normalize, weighted sum); here each grid step holds a
(D, bh, W) block in VMEM and emits the (bh, W) depth tile directly.

Note on the warp kernels: the plane-sweep bilinear warp is the other hot op, but
Mosaic currently rejects in-kernel gathers (jnp.take / take_along_axis / dynamic row
indexing all fail to lower — verified on this toolchain), so the warp stays on XLA's
gather with the 4-corner row packing optimization (geometry/warp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atvsnet_tpu import numerics


def _kernel(cost_ref, sweep_ref, out_ref):
    cost = cost_ref[...][0].astype(jnp.float32)        # (D, bh, W)
    sweep = sweep_ref[...][0].astype(jnp.float32)      # (D, 1)
    neg = -cost
    m = jnp.max(neg, axis=0)                           # (bh, W)
    e = jnp.exp(neg - m[None])
    s = jnp.sum(e, axis=0)
    num = jnp.sum(sweep[:, :, None] * e, axis=0)
    out_ref[...] = (num / s)[None]


def _vmem_budget() -> float:
    """Scoped-vmem envelope for block sizing (bytes).

    Defaults to the TPU compiler's default 16MB scoped-vmem limit minus headroom.
    If the limit is changed (e.g. jit compiler_options
    xla_tpu_scoped_vmem_limit_kib, exposed by bench.py --xla-option), set
    PipelineConfig.scoped_vmem_kib to the same value so the kernel's block
    sizing tracks the real limit (trace-scoped via atvsnet_tpu/numerics.py).
    """
    kib = numerics.current().scoped_vmem_kib
    limit = kib * 1024 if kib else 16 * 1024 * 1024
    return limit - 512 * 1024  # headroom for Mosaic bookkeeping


def _block_rows(h: int, D: int, w: int, target: int = 16):
    """Largest multiple-of-8 row block dividing h whose VMEM working set fits.

    Mosaic requires the sublane block dim to be a multiple of 8 (or the full dim);
    the kernel's scoped-vmem use is ~2.05x the fp32 block bytes (measured: the
    (1,128,16,896) block runs at 15.05M of the 16M limit; (1,128,16,960) exceeded
    it by 128K — lanes pad to multiples of 128, so 960 pads to 1024). Returns None
    when even the smallest legal block exceeds the budget (caller falls back to XLA).

    Calibration scope: the 2.05x factor was measured at D=128 fp32 input on a v5e
    with the default 16MB scoped-vmem limit. A different D/dtype or compiler
    version can shift the true footprint; the failure mode of an over-budget block
    is a COMPILE-TIME Mosaic error (never silent wrong results), and the 512K
    headroom in _vmem_budget absorbs small drift. If the limit is raised via
    xla_tpu_scoped_vmem_limit_kib, set PipelineConfig.scoped_vmem_kib to match
    (delivered to this sizing pass via the trace-scoped numerics policy).
    """
    w_pad = -(-w // 128) * 128
    candidates = [t for t in range(min(target, h), 0, -1) if h % t == 0 and t % 8 == 0]
    if not candidates:
        candidates = [h]  # small test shapes: full-h block
    budget = _vmem_budget()
    for t in candidates:
        if 2.05 * D * t * w_pad * 4 <= budget:
            return t
    return None


def softargmin_pallas(
    cost_volume: jnp.ndarray,
    sweep: jnp.ndarray,
    bh: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """cost_volume (B, D, h, w), sweep (B, D) -> depth (B, h, w, 1) fp32.

    Equivalent to geometry.depth_regression.prob2depth(..., out_prob_map=False).
    `bh` is the VMEM row-block size. bh=None resolves it against the ACTIVE
    numerics policy here, OUTSIDE the jit below, so scoped_vmem_kib always
    enters the cache as the resolved static `bh` — a policy flip can never
    reuse a stale program, whether callers pass bh (softargmin() does) or not
    (direct/test calls)."""
    if bh is None:
        B, D, h, w = cost_volume.shape
        bh = _block_rows(h, D, w)
    assert bh is not None, "caller must route to the XLA formula when no block fits"
    return _softargmin_pallas_jit(cost_volume, sweep, bh, interpret)


@functools.partial(jax.jit, static_argnames=("bh", "interpret"))
def _softargmin_pallas_jit(
    cost_volume: jnp.ndarray,
    sweep: jnp.ndarray,
    bh: int,
    interpret: bool = False,
) -> jnp.ndarray:
    B, D, h, w = cost_volume.shape
    grid = (B, h // bh)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, D, bh, w), lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, h, w), jnp.float32),
        interpret=interpret,
    )(cost_volume, sweep[..., None])
    return out[..., None]


def _softargmin_xla(cost_volume: jnp.ndarray, sweep: jnp.ndarray) -> jnp.ndarray:
    """Reference XLA formula (= geometry.depth_regression.prob2depth core)."""
    p = jax.nn.softmax(-cost_volume.astype(jnp.float32), axis=1)
    return jnp.sum(sweep[:, :, None, None] * p, axis=1)[..., None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def softargmin_fused(cost_volume: jnp.ndarray, sweep: jnp.ndarray, bh: int) -> jnp.ndarray:
    """Pallas forward with an XLA-derived exact backward (pallas_call itself is not
    differentiable); the vjp recomputes the softmax, which only training pays."""
    return softargmin_pallas(cost_volume, sweep, bh=bh)


def _fused_fwd(cost_volume, sweep, bh):
    return softargmin_pallas(cost_volume, sweep, bh=bh), (cost_volume, sweep)


def _fused_bwd(bh, res, g):
    cost_volume, sweep = res
    _, vjp = jax.vjp(_softargmin_xla, cost_volume, sweep)
    return vjp(g)


softargmin_fused.defvjp(_fused_fwd, _fused_bwd)


def softargmin(
    cost_volume: jnp.ndarray,
    depth_num: int,
    depth_start: jnp.ndarray,
    depth_interval: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in fused replacement for prob2depth(out_prob_map=False).

    Measured on the v5e (B=1, D=128, 120x224 bf16): 1.89ms vs 2.48ms XLA, max rel
    err 1e-6. Wired into prob2depth via PipelineConfig.softargmin_impl.
    """
    steps = jnp.arange(depth_num, dtype=jnp.float32)
    sweep = depth_start.astype(jnp.float32)[:, None] + steps[None] * depth_interval.astype(jnp.float32)[:, None]
    B, D, h, w = cost_volume.shape
    bh = _block_rows(h, D, w)  # sized against the ACTIVE numerics policy, pre-jit
    if bh is None:
        # shape too wide for the kernel's VMEM envelope (e.g. 4x-upsampled rows of
        # very wide inputs) — the XLA formula handles it
        return _softargmin_xla(cost_volume, sweep)
    if interpret:
        return softargmin_pallas(cost_volume, sweep, bh=bh, interpret=True)
    return softargmin_fused(cost_volume, sweep, bh)
