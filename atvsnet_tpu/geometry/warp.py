"""Differentiable image warping — the plane-sweep hot path.

Reproduces the sampling semantics of reference atvsnet/homography_warping.py:31-104
(`interpolate`): half-pixel-center texture coordinates, validity window
[0, W-1) x [0, H-1) after the -0.5 shift, bilinear output forced to exactly 0 for
invalid samples (all four corner weights vanish), nearest-neighbor output NOT zeroed
(invalid samples read pixel (0,0) — relied on by the visual hull), NaN coordinates
treated as invalid.

TPU-native design: instead of the reference's 128-iteration python loop of single-plane
warps (reference atvsnet/model.py:179-195 — graph bloat), `plane_sweep_warp` transforms
the pixel grid by ALL D homographies in one einsum and performs ONE batched gather for
the whole (B, D, H, W, C) volume. XLA lowers the 4-corner gathers + lerp onto the VPU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from atvsnet_tpu import numerics
from atvsnet_tpu.geometry.cameras import split_cam
from atvsnet_tpu.geometry.homography import pixel_grid

_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    # Small projective matmuls: keep full fp32 precision on TPU (sub-pixel accuracy).
    return jnp.matmul(a, b, precision=_HI)


def _gather_pixels(flat_image: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray, width: int) -> jnp.ndarray:
    """flat_image (B, H*W, C); iy/ix (B, P) int32 -> (B, P, C).

    Lowered as one flat jnp.take with mode='clip' — measured ~8% faster than
    take_along_axis on this hardware; indices are pre-clipped by the callers so the
    clip never fires.
    """
    B, HW, C = flat_image.shape
    P = iy.shape[1]
    idx = iy * width + ix
    if B > 1:
        idx = idx + (jnp.arange(B, dtype=idx.dtype) * HW)[:, None]
    out = jnp.take(flat_image.reshape(B * HW, C), idx.reshape(-1), axis=0, mode="clip")
    return out.reshape(B, P, C)


def _pack_corners(image: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, 4C) with [f(y,x), f(y,x+1), f(y+1,x), f(y+1,x+1)].

    Lets bilinear sampling issue ONE gather row per output pixel instead of four —
    TPU gathers are descriptor-bound, so this is ~4x on the plane-sweep hot path.
    Edge rows/columns are clamp-padded; they are only read by invalid samples whose
    bilinear weights are exactly zero.
    """
    right = jnp.concatenate([image[:, :, 1:], image[:, :, -1:]], axis=2)
    down = jnp.concatenate([image[:, 1:], image[:, -1:]], axis=1)
    down_right = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    return jnp.concatenate([image, right, down, down_right], axis=-1)


def interpolate(
    image: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    method: str = "bilinear",
    output_mask: bool = False,
    packed: bool = True,
    out_spatial: Tuple[int, ...] | None = None,
):
    """Sample `image` (B, H, W, C) at texture coords x, y (B, P) -> (B, P, C).

    Coordinates use the half-pixel-center convention (0.5 = center of pixel 0).

    out_spatial: when the caller will reshape the (B, P, C) result to
    (B, *out_spatial, C), passing the shape here reshapes the RAW GATHER output
    instead, so the corner-weighted sum runs (and picks its layout) on the final
    5D shape. Profiling showed XLA otherwise materializes two full-volume layout
    copies between the gather's channel-minor layout and the conv consumers'
    width-minor layout (~12ms each per plane sweep at eval scale).
    """
    B, H, W, C = image.shape
    x = x.astype(jnp.float32) - 0.5
    y = y.astype(jnp.float32) - 0.5

    finite = jnp.isfinite(x) & jnp.isfinite(y)
    valid = finite & (x >= 0) & (y >= 0) & (x < W - 1) & (y < H - 1)

    # Zero out invalid/non-finite coordinates before any floor/round so integer
    # casts stay well-defined.
    x = jnp.where(valid, x, 0.0)
    y = jnp.where(valid, y, 0.0)

    flat = image.reshape(B, H * W, C)

    if method == "nearest":
        # Half-to-even rounding matches tf.round (reference homography_warping.py:46-47).
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        out = _gather_pixels(flat, iy, ix, W)
        return (out, valid) if output_mask else out

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    # Invalid samples have x = x0 = 0 and (crucially, matching the reference's
    # mask-multiply at homography_warping.py:64-69) x1 = y1 = 0 as well, so all four
    # bilinear weights vanish and the output is exactly 0.
    x1 = jnp.where(valid, x0 + 1, 0)
    y1 = jnp.where(valid, y0 + 1, 0)
    x0 = jnp.clip(x0, 0, W - 1)
    y0 = jnp.clip(y0, 0, H - 1)

    x0f = x0.astype(jnp.float32)
    x1f = x1.astype(jnp.float32)
    y0f = y0.astype(jnp.float32)
    y1f = y1.astype(jnp.float32)
    wa = ((y1f - y) * (x1f - x))[..., None].astype(image.dtype)
    wb = ((y1f - y) * (x - x0f))[..., None].astype(image.dtype)
    wc = ((y - y0f) * (x1f - x))[..., None].astype(image.dtype)
    wd = ((y - y0f) * (x - x0f))[..., None].astype(image.dtype)

    if packed:
        # one gather of the 4-corner-packed row per sample (valid samples have
        # x0 <= W-2, y0 <= H-2, exactly where the packed table is exact)
        table = _pack_corners(image).reshape(B, H * W, 4 * C)
        g = _gather_pixels(table, y0, x0, W)
        if out_spatial is not None:
            full = (B,) + tuple(out_spatial)
            g = g.reshape(full + (4 * C,))
            wa, wb, wc, wd = (w.reshape(full + (1,)) for w in (wa, wb, wc, wd))
            valid = valid.reshape(full)
        out = (
            wa * g[..., :C] + wb * g[..., C : 2 * C]
            + wc * g[..., 2 * C : 3 * C] + wd * g[..., 3 * C :]
        )
        return (out, valid) if output_mask else out

    x1c = jnp.clip(x1, 0, W - 1)
    y1c = jnp.clip(y1, 0, H - 1)
    va = _gather_pixels(flat, y0, x0, W)
    vb = _gather_pixels(flat, y0, x1c, W)
    vc = _gather_pixels(flat, y1c, x0, W)
    vd = _gather_pixels(flat, y1c, x1c, W)
    out = wa * va + wb * vb + wc * vc + wd * vd
    return (out, valid) if output_mask else out


def _homography_coords(homography: jnp.ndarray, height: int, width: int):
    """homography (..., 3, 3) -> x, y sample coords (..., H*W)."""
    grid = pixel_grid(height, width)                      # (3, HW)
    warped = _mm(homography.astype(jnp.float32), grid)    # (..., 3, HW)
    denom = warped[..., 2, :]
    # Division-by-zero guard, reference homography_warping.py:251-252.
    denom = denom + jnp.where(denom == 0.0, 1e-7, 0.0)
    return warped[..., 0, :] / denom, warped[..., 1, :] / denom


def homography_warp(
    image: jnp.ndarray,
    homography: jnp.ndarray,
    method: str = "bilinear",
    output_mask: bool = False,
):
    """Warp (B, H, W, C) by a single homography (B, 3, 3) per sample.

    For each output (reference-frame) pixel, samples `image` at H @ p.
    Reference: atvsnet/homography_warping.py:230-271.
    """
    B, H, W, C = image.shape
    x, y = _homography_coords(homography, H, W)           # (B, HW)
    if output_mask:
        out, mask = interpolate(image, x, y, method=method, output_mask=True)
        return out.reshape(B, H, W, C), mask.reshape(B, H, W, 1)
    out = interpolate(image, x, y, method=method)
    return out.reshape(B, H, W, C)


def _maybe_quant_warp(out: jnp.ndarray, image: jnp.ndarray) -> jnp.ndarray:
    """Optional int8 storage for plane-sweep warped feature volumes.

    PipelineConfig.warp_quant=int8 (trace-scoped via atvsnet_tpu/numerics.py;
    independent of act_quant so the two byte cuts can be A/B'd separately) stores the
    (B, D, H, W, C) warped volume on a per-(sample, channel) int8 lattice. The
    scale comes from the SMALL 2D source map, not the volume: bilinear corner
    weights are convex (>= 0, sum <= 1; invalid samples are exactly 0), so
    |warped[b, ..., c]| <= max|image[b, ..., c]| — an exact no-clip bound with
    no data pass over the volume. Quantize fuses into the gather's corner-sum
    write, so the volume lands in HBM at 1 byte/elem; the dequantize duplicates
    into the consumer convs' operand reads. Zeros stay exactly zero (invalid
    samples keep the reference's mask-multiply semantics). INFERENCE-ONLY
    (round() has zero gradient), like the ACT_QUANT modes.

    Applied only to BILINEAR sweeps (the feature cost-volume path): the nearest
    sweeps carry depth values into the visual hull / geometric comparisons,
    where a 1/127-of-range lattice is not an acceptable error model."""
    if numerics.current().warp_quant == "none":
        return out
    s = (
        jnp.max(jnp.abs(image.astype(jnp.float32)), axis=(1, 2), keepdims=True)
        / 127.0
        + 1e-12
    )[:, None]  # (B, 1, 1, 1, C)
    q = jnp.clip(jnp.round(out.astype(jnp.float32) / s), -127.0, 127.0).astype(jnp.int8)
    return (q.astype(jnp.float32) * s).astype(out.dtype)


def plane_sweep_warp(
    image: jnp.ndarray,
    homographies: jnp.ndarray,
    method: str = "bilinear",
    output_mask: bool = False,
):
    """Warp (B, H, W, C) by ALL D plane homographies (B, D, 3, 3) at once.

    Returns (B, D, H, W, C) [+ mask (B, D, H, W, 1)]. This is the TPU-native
    replacement for the reference's unrolled per-depth loop (model.py:189-195): one
    einsum for the projective transform and one batched 4-corner gather for the volume.
    """
    B, H, W, C = image.shape
    D = homographies.shape[1]
    x, y = _homography_coords(homographies, H, W)         # (B, D, HW)
    if method == "bilinear":
        # Gather with indices ordered (h, w, d) — D minor — instead of (d, h, w):
        # the corner-lerp (+ optional int8 quant) then runs entirely in the
        # gather's natural row order and ONE explicit logical transpose restores
        # (B, D, H, W, C) for the conv consumers. Bit-exact (same per-element
        # arithmetic, different iteration order); the point is to decouple the
        # wide pre-lerp packed table's layout from the conv3d consumers' layout
        # so XLA's layout assignment can place the physical relayout on the
        # post-lerp (4x smaller; 16x under warp_quant=int8) buffer instead of
        # the 880 MB x4-trip pre-lerp copies ROOFLINE_r05.json's audit found in
        # the stage scan bodies.
        xs = jnp.swapaxes(x, 1, 2).reshape(B, H * W * D)
        ys = jnp.swapaxes(y, 1, 2).reshape(B, H * W * D)
        if output_mask:
            out, mask = interpolate(
                image, xs, ys, method=method, output_mask=True, out_spatial=(H, W, D)
            )
            out = _maybe_quant_warp(out, image)           # (B, H, W, D, C)
            return (
                jnp.moveaxis(out, 3, 1),
                jnp.moveaxis(mask, 3, 1)[..., None],
            )
        out = interpolate(image, xs, ys, method=method, out_spatial=(H, W, D))
        return jnp.moveaxis(_maybe_quant_warp(out, image), 3, 1)
    x = x.reshape(B, D * H * W)
    y = y.reshape(B, D * H * W)
    if output_mask:
        out, mask = interpolate(image, x, y, method=method, output_mask=True)
        return out.reshape(B, D, H, W, C), mask.reshape(B, D, H, W, 1)
    return interpolate(image, x, y, method=method).reshape(B, D, H, W, C)


def plane_sweep_warp_with_nearest(
    image: jnp.ndarray, homographies: jnp.ndarray, nearest_slice: slice | None = None
):
    """One packed gather yielding BOTH bilinear and nearest plane-sweep warps.

    Returns (bilinear (B,D,H,W,C), nearest (B,D,H,W,Cn), mask (B,D,H,W,1)). The
    nearest sample is one of the four gathered corners (round-to-nearest with the
    reference's invalid-reads-pixel-(0,0) behavior, homography_warping.py:45-56), so
    callers needing both filtrations of the SAME source (e.g. the refinement's
    geometric volume + visual hull) pay for a single gather.

    nearest_slice: restrict the nearest output to these source channels (the
    refinement only needs the depth channel — avoids materializing a full-width
    nearest volume).

    KEEP IN SYNC with interpolate(): the validity window, invalid-sample corner
    zeroing, clip bounds and corner-weight formulas below deliberately restate
    interpolate's packed bilinear body — the two bodies differ only in where the
    5D reshape lands (here the weights apply on the (h, w, d)-ordered volume so
    the whole elementwise chain keeps the gather's row order and the final
    moveaxis is the single logical layout change; a shared helper would pin one
    layout and reintroduce the standalone full-volume copies, see
    tools/hlo_copy_audit.py). Any sampling-semantics fix must be applied in
    BOTH places; tests/test_structured.py pins them against each other.
    """
    B, H, W, C = image.shape
    D = homographies.shape[1]
    x, y = _homography_coords(homographies, H, W)
    # (h, w, d)-ordered indices + one explicit logical transpose at the end, for
    # the same layout-decoupling reason as plane_sweep_warp's bilinear branch.
    x = jnp.swapaxes(x, 1, 2).reshape(B, H * W * D).astype(jnp.float32) - 0.5
    y = jnp.swapaxes(y, 1, 2).reshape(B, H * W * D).astype(jnp.float32) - 0.5

    finite = jnp.isfinite(x) & jnp.isfinite(y)
    valid = finite & (x >= 0) & (y >= 0) & (x < W - 1) & (y < H - 1)
    x = jnp.where(valid, x, 0.0)
    y = jnp.where(valid, y, 0.0)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.where(valid, x0 + 1, 0)
    y1 = jnp.where(valid, y0 + 1, 0)
    x0 = jnp.clip(x0, 0, W - 1)
    y0 = jnp.clip(y0, 0, H - 1)

    table = _pack_corners(image).reshape(B, H * W, 4 * C)
    g = _gather_pixels(table, y0, x0, W)
    # corner-weight on the 5D (h, w, d)-ordered shape so the whole elementwise
    # chain keeps the gather's natural row order; the final moveaxis is the only
    # logical layout change (see interpolate / plane_sweep_warp)
    shape = (B, H, W, D)
    g = g.reshape(shape + (4 * C,))
    ga, gb, gc, gd = g[..., :C], g[..., C : 2 * C], g[..., 2 * C : 3 * C], g[..., 3 * C :]

    x0f = x0.astype(jnp.float32)
    x1f = x1.astype(jnp.float32)
    y0f = y0.astype(jnp.float32)
    y1f = y1.astype(jnp.float32)

    def _w(v):
        return v.reshape(shape + (1,)).astype(image.dtype)

    wa = _w((y1f - y) * (x1f - x))
    wb = _w((y1f - y) * (x - x0f))
    wc = _w((y - y0f) * (x1f - x))
    wd = _w((y - y0f) * (x - x0f))
    bilinear = wa * ga + wb * gb + wc * gc + wd * gd

    # nearest = the rounded corner; jnp.round is half-to-even like tf.round. For
    # invalid samples x=y=0 -> corner a = pixel (0,0), matching the reference.
    right = (jnp.round(x).astype(jnp.int32) > x0).reshape(shape + (1,))
    down = (jnp.round(y).astype(jnp.int32) > y0).reshape(shape + (1,))
    if nearest_slice is not None:
        ga, gb, gc, gd = (t[..., nearest_slice] for t in (ga, gb, gc, gd))
    nearest = jnp.where(down, jnp.where(right, gd, gc), jnp.where(right, gb, ga))

    return (
        jnp.moveaxis(bilinear, 3, 1),
        jnp.moveaxis(nearest, 3, 1),
        jnp.moveaxis(valid.reshape(shape), 3, 1)[..., None],
    )


def _relative_projection(left_cam: jnp.ndarray, right_cam: jnp.ndarray):
    """M = K_r R_r R_l^T K_l^{-1} (B,3,3) and v = K_r (R_r c_l + t_r) (B,3,1).

    A left-frame pixel p at depth z projects into the right frame as
    z' * p' = M (z p) + v. Reference homography_warping.py:145-146, 312-313.
    """
    f32 = jnp.float32
    K_l, R_l, t_l = split_cam(left_cam.astype(f32))
    K_r, R_r, t_r = split_cam(right_cam.astype(f32))
    K_l_inv = jnp.linalg.inv(K_l)
    R_l_T = jnp.swapaxes(R_l, -1, -2)
    c_l = -_mm(R_l_T, t_l)
    M = _mm(_mm(K_r, R_r), _mm(R_l_T, K_l_inv))
    v = _mm(K_r, _mm(R_r, c_l)) + _mm(K_r, t_r)
    return M, v


def warp_by_depth(
    input_image: jnp.ndarray,
    left_cam: jnp.ndarray,
    right_cam: jnp.ndarray,
    depth_image: jnp.ndarray,
    inverse_depth: bool = True,
    method: str = "bilinear",
    output_mask: bool = False,
):
    """Warp the right-camera image to the left camera given a left depth map.

    input_image: (B, H, W, C) right-camera image; depth_image: (B, H, W, 1) left depth
    (inverse depth when inverse_depth=True). Reference homography_warping.py:108-176:
    coords = M p + v * s(d) with s(d)=d for inverse depth, 1/d otherwise.
    """
    B, H, W, C = input_image.shape
    M, v = _relative_projection(left_cam, right_cam)

    grid = pixel_grid(H, W)                                # (3, HW)
    d = depth_image.reshape(B, 1, H * W).astype(jnp.float32)
    scale = d if inverse_depth else 1.0 / d
    warped = _mm(M, grid) + v * scale                      # (B, 3, HW)
    denom = warped[:, 2, :]
    x = warped[:, 0, :] / denom
    y = warped[:, 1, :] / denom

    if output_mask:
        out, mask = interpolate(input_image, x, y, method=method, output_mask=True)
        return out.reshape(B, H, W, C), mask.reshape(B, H, W, 1)
    out = interpolate(input_image, x, y, method=method)
    return out.reshape(B, H, W, C)


def transform_depth(
    left_depth: jnp.ndarray,
    left_cam: jnp.ndarray,
    right_cam: jnp.ndarray,
    inverse_depth: bool = True,
) -> jnp.ndarray:
    """Re-express per-pixel left-camera depth values in the right camera frame.

    Keeps pixels in place (no resampling): returns, at each left pixel, the z-depth the
    corresponding 3D point has in the right camera. Invalid (non-positive) inverse
    depths map to 0. Reference homography_warping.py:275-326.
    """
    shape = left_depth.shape
    B = shape[0]
    H, W = shape[1], shape[2]
    f32 = jnp.float32
    d = left_depth.reshape(B, 1, H * W).astype(f32)

    if inverse_depth:
        pos = d > 1e-10
        z = 1.0 / jnp.clip(d, 1e-10, None)
        z = jnp.where(pos, z, 0.0)
    else:
        z = d

    M, v = _relative_projection(left_cam, right_cam)
    grid = pixel_grid(H, W)                                # (3, HW)
    warped = _mm(M, grid * z) + v                          # (B, 3, HW)
    z_out = warped[:, 2:3, :]

    if inverse_depth:
        z_out = 1.0 / jnp.clip(z_out, 1e-10, None)
        z_out = jnp.where(pos, z_out, 0.0)

    return z_out.reshape(shape).astype(left_depth.dtype)
