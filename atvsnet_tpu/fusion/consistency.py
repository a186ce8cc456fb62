"""Multi-view depth consistency fusion — TPU replacement for the fusibile CUDA kernel.

Semantics of reference fusibile/fusibile.cu:138-277 with the pipeline's settings
(depth_fusion.py:205-226: depth_min=0.01, depth_max=1e5, normal_thresh=360deg,
disp_thresh=0.01, num_consistent=2):

For every reference camera r and pixel p with depth d = D_r[p] (0 = filtered out):
  X = M_r^{-1} (d*u - p4_r)                      back-projection, fusibile.cu:56-65
  for every other camera i:
    (pt, z) = project(X, P_i)                    fusibile.cu:127-133
    if pt in bounds:                             fusibile.cu:195-198
      z_i = bilinear(D_i, pt + 0.5)              tex2D linear fetch, fusibile.cu:203
      disp(x) = f_r * |C_r - C_i| / x            fusibile.cu:51-54
      consistent if |disp(z) - disp(z_i)| / disp(z) < disp_thresh   fusibile.cu:211
      (normal-angle test always passes at 360 deg; pipeline uses fake unit normals,
       depth_fusion.py:92-111)
  average texture over {r} + consistent views; emit a point iff
  #consistent >= num_consistent.                 fusibile.cu:244-263

The CUDA kernel's per-pixel loop over views becomes a vmap over reference cameras of a
dense (V, h, w) reprojection + gather; the variable-length point list becomes a fixed
mask compacted on the host (fusion/ply.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


# Measured crossover on the v5e (tools/bench_fusion.py, 480x896, pipeline path
# C=4 -> 16 packed f32 channels): folding ALL views into one flat gather wins
# while the corner-packed table stays small (V=8: 2.76->2.24s, V=24:
# 12.56->11.74s scene time), but LOSES once the table outgrows gather locality
# (V=40, 1.1 GB table: 31.4->40.0s) — there the per-view batched gather over V
# small (27 MB) tables is faster. The switch is on table BYTES so the wider
# normals path (C=7 -> 28 packed channels) crosses over proportionally earlier.
_FLAT_GATHER_MAX_TABLE_BYTES = 24 * 480 * 896 * 16 * 4


def _bilinear_sample_all_views(src: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                               flat: bool):
    """Sample src (V, H, W, C) at float pixel coords x/y (V, ...pixel axes) —
    view v's coordinate grid samples view v's map — with CUDA tex2D border behavior
    (coordinates clamped at the image border; in-bounds projection is enforced
    by the caller's bounds mask).

    ONE corner-packed gather row per sample (geometry/warp._pack_corners —
    TPU gathers are descriptor-bound, so one packed row beats the 4-gather
    bilinear form ~2x at scene scale; edge clamp-padding is only read where
    the corresponding bilinear weight is exactly zero since coords are
    pre-clipped to [0, W-1]). `flat` additionally folds the view index into
    the row index of a single (V*H*W, 4C) table (_gather_pixels' batch trick)
    — see _FLAT_GATHER_MAX_TABLE_BYTES for when that wins over V per-view
    gathers.
    """
    from atvsnet_tpu.geometry.warp import _pack_corners

    V, H, W, C = src.shape
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = x - x0
    wy = y - y0

    table = _pack_corners(src)                              # (V, H, W, 4C)
    if flat:
        flat_table = table.reshape(V * H * W, 4 * C)
        # view offset broadcast over whatever pixel-axis rank the caller uses:
        # (V, H, W) for the dense grid, (V, N) for the compacted pixel lists
        view_off = (jnp.arange(V, dtype=jnp.int32) * (H * W)).reshape(
            (V,) + (1,) * (x.ndim - 1)
        )
        idx = view_off + y0 * W + x0
        g = jnp.take(flat_table, idx.reshape(-1), axis=0, mode="clip")
        g = g.reshape(x.shape + (4 * C,))
    else:
        g = jax.vmap(
            lambda t, i: jnp.take(t.reshape(H * W, 4 * C), i.reshape(-1), axis=0,
                                  mode="clip")
        )(table, y0 * W + x0).reshape(x.shape + (4 * C,))
    wa = ((1 - wy) * (1 - wx))[..., None]
    wb = ((1 - wy) * wx)[..., None]
    wc = (wy * (1 - wx))[..., None]
    wd = (wy * wx)[..., None]
    return (
        wa * g[..., :C] + wb * g[..., C:2 * C]
        + wc * g[..., 2 * C:3 * C] + wd * g[..., 3 * C:]
    )


def select_views(
    cams: np.ndarray,
    ref_idx: int,
    width: int,
    height: int,
    min_angle_deg: float = 10.0,
    max_angle_deg: float = 30.0,
) -> np.ndarray:
    """Central-ray-angle view selection (reference fusibile/main.cpp:363-401).

    NOTE: the reference pipeline DISABLES this (viewSel=false at main.cpp:721 keeps
    all views); provided for gipuma-compatible workflows. Returns selected indices.
    """
    _, M_inv, _, _ = camera_geometry(cams)
    center_px = np.array([width / 2.0, height / 2.0, 1.0])

    def view_vector(i):
        # direction of the ray through the principal pixel: M_inv @ p (not translated)
        v = M_inv[i] @ center_px
        return v / (np.linalg.norm(v) + 1e-12)

    v_ref = view_vector(ref_idx)
    selected = []
    lo, hi = np.deg2rad(min_angle_deg), np.deg2rad(max_angle_deg)
    for i in range(cams.shape[0]):
        if i == ref_idx:
            continue
        ang = np.arccos(np.clip(v_ref @ view_vector(i), -1.0, 1.0))
        if lo < ang < hi:
            selected.append(i)
    return np.asarray(selected, dtype=np.int32)


def _geometry_from_P64(P64: np.ndarray):
    """(V, 3, 4) float64 P stack -> (P f32, M_inv f32, centers f32, f f32,
    M_inv float64 — reused by the host back-projection so the inverse is
    computed once)."""
    from atvsnet_tpu.data.gipuma_io import decompose_projection

    M_inv64 = np.linalg.inv(P64[:, :, :3])
    centers = -(M_inv64 @ P64[:, :, 3:4])[..., 0]
    f = np.array([decompose_projection(p)[0][0, 0] for p in P64])
    return (
        P64.astype(np.float32),
        M_inv64.astype(np.float32),
        centers.astype(np.float32),
        f.astype(np.float32),
        M_inv64,
    )


def camera_geometry_from_P(P: np.ndarray):
    """Raw projection matrices P (V, 3, 4) -> (P f32, M_inv, centers, f).

    The generic-gipuma entry: KITTI/Strecha/Middlebury readers
    (data/gipuma_io.py, cf. fusibile/fileIoUtils.h:44-153) produce bare P
    stacks; focal length comes from the RQ decomposition exactly like the
    reference's per-camera decomposeProjectionMatrix pass
    (cameraGeometryUtils.h:318-331)."""
    return _geometry_from_P64(np.asarray(P, np.float64))[:4]


def camera_geometry(cams: np.ndarray):
    """cams (V, 2, 4, 4) -> P (V,3,4), M_inv (V,3,3), centers (V,3), f (V,)."""
    cams = np.asarray(cams, np.float64)
    K = cams[:, 1, :3, :3]
    E = cams[:, 0, :3, :4]
    P = K @ E
    M = P[:, :, :3]
    M_inv = np.linalg.inv(M)
    centers = -(M_inv @ P[:, :, 3:4])[..., 0]
    f = K[:, 0, 0]
    return (
        P.astype(np.float32),
        M_inv.astype(np.float32),
        centers.astype(np.float32),
        f.astype(np.float32),
    )


def _fuse_one_ref_impl(
    ref_idx: jnp.ndarray,
    depths: jnp.ndarray,    # (V, H, W) metric depth, 0 = invalid
    images: jnp.ndarray,    # (V, H, W, 3) float RGB/BGR
    P: jnp.ndarray,         # (V, 3, 4)
    M_inv: jnp.ndarray,     # (V, 3, 3)
    centers: jnp.ndarray,   # (V, 3)
    f: jnp.ndarray,         # (V,)
    disp_thresh: float,
    num_consistent: int,
    normals: jnp.ndarray | None = None,   # (V, H, W, 3) or None
    normal_thresh_rad: float = float(np.pi * 2),
    flat_sample: bool = True,
):
    V, H, W = depths.shape
    # images may arrive in their storage dtype (uint8 from the decoded jpgs) —
    # casting HERE keeps the H2D transfer at 1 byte/channel (the attached-TPU
    # tunnel makes transfer bytes first-order; ~4x on the upload)
    images = images.astype(jnp.float32)
    depth_r = jnp.take(depths, ref_idx, axis=0)            # (H, W)
    Minv_r = jnp.take(M_inv, ref_idx, axis=0)
    P4_r = jnp.take(P, ref_idx, axis=0)[:, 3]              # (3,)
    C_r = jnp.take(centers, ref_idx, axis=0)
    f_r = jnp.take(f, ref_idx, axis=0)
    n_ref = None if normals is None else jnp.take(normals, ref_idx, axis=0)  # (H, W, 3)

    # back-project at INTEGER pixel coords (fusibile.cu:56-65 uses p directly)
    xs = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
    pt_h = jnp.stack([depth_r * xs - P4_r[0], depth_r * ys - P4_r[1], depth_r - P4_r[2]], -1)
    X = jnp.einsum("ij,hwj->hwi", Minv_r, pt_h, precision=_HI)  # (H, W, 3)

    # ---- all V views checked at once (no per-view vmap: the sampling below is
    # ONE flat gather over a view-folded table; see _bilinear_sample_all_views)
    proj = (
        jnp.einsum("vij,hwj->vhwi", P[:, :, :3], X, precision=_HI)
        + P[:, None, None, :, 3]
    )                                                       # (V, H, W, 3)
    z = proj[..., 2]
    px = proj[..., 0] / z
    py = proj[..., 1] / z
    not_ref = jnp.arange(V, dtype=ref_idx.dtype)[:, None, None] != ref_idx
    in_bounds = (px >= 0) & (px < W) & (py >= 0) & (py < H) & not_ref

    src = [depths[..., None], images]
    if normals is not None:
        src.append(normals)
    sampled = _bilinear_sample_all_views(
        jnp.concatenate(src, axis=-1), px, py, flat=flat_sample
    )
    z_i = sampled[..., 0]
    rgb_i = sampled[..., 1:4]

    baseline = jnp.linalg.norm(C_r[None] - centers, axis=-1)  # (V,)
    disp = f_r * baseline[:, None, None] / z
    disp_i = f_r * baseline[:, None, None] / z_i
    # relative disparity check — SIGNED division exactly like fusibile.cu:211:
    # a point projecting BEHIND view i (z < 0) gives disp < 0, so rel <= 0 <
    # thresh and the view auto-passes; that reference quirk is reproduced. The
    # zero-depth reference-pixel case is closed by the emit gate below instead
    # (in the reference disp_r = inf makes every view's check nan -> False).
    rel = jnp.abs(disp - disp_i) / disp
    ok_all = in_bounds & (rel < disp_thresh)

    if normals is None:
        # pipeline path: fake unit normals + 360 deg threshold always pass
        # (depth_fusion.py:92-111, fusibile.cu:213-214 trivially true)
        rgb_all = jnp.where(ok_all[..., None], rgb_i, 0.0)
        nrm_all = None
    else:
        # normal-angle consistency (fusibile.cu:213-214 via getAngle_cu:118-126):
        # acos of the RAW dot product (no normalization, like the CUDA code); NaN
        # (dot product drifted past 1 on identical vectors) counts as angle 0.
        n_i = sampled[..., 4:7]
        ang = jnp.arccos(jnp.sum(n_i * n_ref[None], axis=-1))
        ang = jnp.where(jnp.isnan(ang), 0.0, ang)
        ok_all = ok_all & (ang < normal_thresh_rad)
        keep = ok_all[..., None]
        rgb_all = jnp.where(keep, rgb_i, 0.0)
        nrm_all = jnp.where(keep, n_i, 0.0)
    count = jnp.sum(ok_all.astype(jnp.int32), axis=0)       # (H, W)
    ref_rgb = jnp.take(images, ref_idx, axis=0)
    avg_rgb = (ref_rgb + jnp.sum(rgb_all, axis=0)) / (count[..., None] + 1.0)

    # zero-depth (prob-filtered) reference pixels back-project to the camera
    # center; without this gate a view the center projects into with NEGATIVE z
    # would auto-pass the signed disparity check above and mass-emit junk points
    # at C_r. The reference never emits them (disp_r = inf -> nan checks).
    emit = (count >= num_consistent) & (depth_r > 0)        # (H, W)
    if normals is None:
        return emit, X, avg_rgb, None
    # consistent_normal accumulation (fusibile.cu:228,243): ref normal + passing
    # view normals, averaged over count+1 (points themselves are NOT averaged —
    # the reference's consistent_X accumulation is commented out, fusibile.cu:226)
    avg_nrm = (n_ref + jnp.sum(nrm_all, axis=0)) / (count[..., None] + 1.0)
    return emit, X, avg_rgb, avg_nrm


@partial(jax.jit, static_argnames=("disp_thresh", "num_consistent",
                                   "normal_thresh_rad", "flat_sample"))
def _fuse_ref_chunk(ref_idxs, depths, images, P, M_inv, centers, f,
                    disp_thresh, num_consistent, normals=None,
                    normal_thresh_rad=float(np.pi * 2), flat_sample=True):
    """Batched fusion pass: a CHUNK of reference cameras in one device program.

    Replaces the per-ref Python dispatch loop (VERDICT r3 item 3): vmap over the
    ref axis amortizes dispatch/host-sync overhead. The pipeline path (no
    normals) returns ONE packed (R, H, W, 4) uint8 array [emit, r, g, b] — a
    single 4 B/px D2H pull per chunk; world coordinates are NOT transferred,
    the host compaction recomputes them from its own copy of the depth map
    (native.compact_backproject). The attached-TPU link is latency- and
    bytes-bound, so one small pull beats three (16 B/px) by ~4x at scene scale.
    The normals path returns (emit, X f32, rgb u8, nrm f32) as before.
    """
    def one(r):
        emit, X, rgb, nrm = _fuse_one_ref_impl(
            r, depths, images, P, M_inv, centers, f,
            disp_thresh, num_consistent, normals, normal_thresh_rad,
            flat_sample=flat_sample,
        )
        # truncating cast matches the host compaction's astype(uint8)
        rgb8 = jnp.clip(rgb, 0.0, 255.0).astype(jnp.uint8)
        if nrm is None:
            return jnp.concatenate([emit[..., None].astype(jnp.uint8), rgb8], axis=-1)
        return emit, X, rgb8, nrm

    return jax.vmap(one)(ref_idxs)


def _fuse_one_ref_sparse_impl(
    ref_idx: jnp.ndarray,
    idx: jnp.ndarray,       # (N,) int32 flat pixel indices into the ref depth map
    n_valid: jnp.ndarray,   # () int32: rows >= n_valid are padding
    depths: jnp.ndarray,    # (V, H, W) metric depth, 0 = invalid
    images: jnp.ndarray,    # (V, H, W, 3)
    P: jnp.ndarray,
    M_inv: jnp.ndarray,
    centers: jnp.ndarray,
    f: jnp.ndarray,
    disp_thresh: float,
    num_consistent: int,
    normals: jnp.ndarray | None = None,
    normal_thresh_rad: float = float(np.pi * 2),
    flat_sample: bool = True,
):
    """Occupancy-compacted variant of _fuse_one_ref_impl: the pixel axis is a
    padded list of VALID (depth > 0) reference pixels instead of the dense H x W
    grid, so the gather-descriptor-bound check loop pays per valid pixel, not per
    pixel. The SAMPLED tables stay dense (other refs still read every pixel of
    this view's maps), so filtered pixels never affect anyone's checks and the
    emitted point set is identical to the dense path by construction — the check
    math below is the same f32 ops on the same values, just gathered instead of
    laid out on the grid.
    """
    V, H, W = depths.shape
    N = idx.shape[0]
    images = images.astype(jnp.float32)
    depth_r = jnp.take(jnp.take(depths, ref_idx, axis=0).reshape(-1), idx)  # (N,)
    Minv_r = jnp.take(M_inv, ref_idx, axis=0)
    P4_r = jnp.take(P, ref_idx, axis=0)[:, 3]
    C_r = jnp.take(centers, ref_idx, axis=0)
    f_r = jnp.take(f, ref_idx, axis=0)
    n_ref = (
        None
        if normals is None
        else jnp.take(jnp.take(normals, ref_idx, axis=0).reshape(-1, 3), idx, axis=0)
    )  # (N, 3)

    # back-project at INTEGER pixel coords recovered from the flat index
    xs = (idx % W).astype(jnp.float32)
    ys = (idx // W).astype(jnp.float32)
    pt_h = jnp.stack(
        [depth_r * xs - P4_r[0], depth_r * ys - P4_r[1], depth_r - P4_r[2]], -1
    )
    X = jnp.einsum("ij,nj->ni", Minv_r, pt_h, precision=_HI)  # (N, 3)

    proj = (
        jnp.einsum("vij,nj->vni", P[:, :, :3], X, precision=_HI)
        + P[:, None, :, 3]
    )                                                       # (V, N, 3)
    z = proj[..., 2]
    px = proj[..., 0] / z
    py = proj[..., 1] / z
    not_ref = jnp.arange(V, dtype=ref_idx.dtype)[:, None] != ref_idx
    in_bounds = (px >= 0) & (px < W) & (py >= 0) & (py < H) & not_ref

    src = [depths[..., None], images]
    if normals is not None:
        src.append(normals)
    sampled = _bilinear_sample_all_views(
        jnp.concatenate(src, axis=-1), px, py, flat=flat_sample
    )
    z_i = sampled[..., 0]
    rgb_i = sampled[..., 1:4]

    baseline = jnp.linalg.norm(C_r[None] - centers, axis=-1)  # (V,)
    disp = f_r * baseline[:, None] / z
    disp_i = f_r * baseline[:, None] / z_i
    rel = jnp.abs(disp - disp_i) / disp
    ok_all = in_bounds & (rel < disp_thresh)

    if normals is None:
        rgb_all = jnp.where(ok_all[..., None], rgb_i, 0.0)
        nrm_all = None
    else:
        n_i = sampled[..., 4:7]
        ang = jnp.arccos(jnp.sum(n_i * n_ref[None], axis=-1))
        ang = jnp.where(jnp.isnan(ang), 0.0, ang)
        ok_all = ok_all & (ang < normal_thresh_rad)
        keep = ok_all[..., None]
        rgb_all = jnp.where(keep, rgb_i, 0.0)
        nrm_all = jnp.where(keep, n_i, 0.0)
    count = jnp.sum(ok_all.astype(jnp.int32), axis=0)       # (N,)
    ref_rgb = jnp.take(
        jnp.take(images, ref_idx, axis=0).reshape(-1, 3), idx, axis=0
    )                                                       # (N, 3)
    avg_rgb = (ref_rgb + jnp.sum(rgb_all, axis=0)) / (count[..., None] + 1.0)

    # padding rows (idx repeats of the last valid pixel) are masked out here;
    # depth_r > 0 is true by construction of the compacted list but kept so the
    # gate reads identically to the dense path
    pad_mask = jnp.arange(N, dtype=jnp.int32) < n_valid
    emit = (count >= num_consistent) & (depth_r > 0) & pad_mask  # (N,)
    if normals is None:
        return emit, X, avg_rgb, None
    avg_nrm = (n_ref + jnp.sum(nrm_all, axis=0)) / (count[..., None] + 1.0)
    return emit, X, avg_rgb, avg_nrm


@partial(jax.jit, static_argnames=("disp_thresh", "num_consistent",
                                   "normal_thresh_rad", "flat_sample"))
def _fuse_ref_chunk_sparse(ref_idxs, idx, n_valid, depths, images, P, M_inv,
                           centers, f, disp_thresh, num_consistent, normals=None,
                           normal_thresh_rad=float(np.pi * 2), flat_sample=True):
    """Chunked sparse fusion pass: ref_idxs (R,), idx (R, N) padded valid-pixel
    lists, n_valid (R,). The pipeline path returns one packed (R, N, 4) uint8
    array [emit, r, g, b]; the normals path returns (emit, X, rgb8, nrm) with a
    leading (R, N) pixel-list axis instead of (R, H, W)."""
    def one(r, i, nv):
        emit, X, rgb, nrm = _fuse_one_ref_sparse_impl(
            r, i, nv, depths, images, P, M_inv, centers, f,
            disp_thresh, num_consistent, normals, normal_thresh_rad,
            flat_sample=flat_sample,
        )
        rgb8 = jnp.clip(rgb, 0.0, 255.0).astype(jnp.uint8)
        if nrm is None:
            return jnp.concatenate([emit[..., None].astype(jnp.uint8), rgb8], axis=-1)
        return emit, X, rgb8, nrm

    return jax.vmap(one)(ref_idxs, idx, n_valid)


def _sparse_bucket(max_valid: int, hw: int) -> int:
    """Padded pixel-list length for a chunk: max valid count rounded UP to a
    multiple of hw/8 (floor 2^15), clamped to hw — at most 8 distinct program
    shapes per scene resolution, so occupancy changes between chunks do not
    recompile per chunk."""
    g = max(hw // 8, 1 << 15)
    return int(min(hw, -(-max_valid // g) * g)) if max_valid > 0 else min(hw, g)


def fuse_depth_maps(
    depths: np.ndarray,
    images: np.ndarray,
    cams: np.ndarray | None = None,
    disp_thresh: float = 0.01,
    num_consistent: int = 2,
    normals: np.ndarray | None = None,
    normal_thresh_deg: float = 360.0,
    depth_min: float | None = None,
    depth_max: float | None = None,
    ref_chunk: int = 4,
    P_matrices: np.ndarray | None = None,
    compact: str = "auto",
):
    """Fuse all views' depth maps into one point set.

    depths (V, H, W) metric depth (0 = filtered), images (V, H, W, 3) uint8/float,
    cams (V, 2, 4, 4). Returns (points (M, 3) float32, colors (M, 3) uint8) — every
    camera acts as reference in turn, like the host loop at fusibile.cu:425-430,
    but batched `ref_chunk` references per device program (vmap over the ref axis)
    with the host compaction of chunk k overlapped with the device execution of
    chunk k+1 (XLA dispatch is async; the transfer fence is the np.asarray pull).
    Chunks are padded to a fixed size so the whole scene compiles ONE program.

    General (non-pipeline) surface:
    - normals (V, H, W, 3) + normal_thresh_deg < 360 enables the normal-angle
      consistency test (fusibile.cu:213-214); the return gains a third element,
      the averaged consistent normals (M, 3) float32.
    - depth_min/depth_max zero out-of-range depths before fusion. NOTE: the
      reference parses --depth_min/--depth_max (main.cpp:303-309) and converts them
      to disparity bounds (main.cpp:717-718), but the kernel consumers are commented
      out (fusibile.cu:364-365) — there they are inert; here they filter.
    - compact: 'auto' | 'always' | 'never'. Occupancy compaction: process only the
      VALID (depth > 0) reference pixels per ref (padded lists, bucketed to <= 8
      program shapes per resolution) instead of the dense grid, cutting the
      gather-descriptor-bound check loop by ~1/valid-fraction. Exactness-preserving
      (filtered pixels never emit and the sampled tables stay dense, so they never
      affect other refs' checks); 'auto' compacts a chunk whenever its padded
      bucket is smaller than the dense grid. The CUDA kernel pays ~nothing for
      dead per-pixel threads (early returns like used_pixels at fusibile.cu:156
      just idle the lane); this is the TPU equivalent of that early exit.
    """
    V = depths.shape[0]
    if (cams is None) == (P_matrices is None):
        raise ValueError("pass exactly one of cams (V,2,4,4) or P_matrices (V,3,4)")
    if P_matrices is not None:
        # generic-gipuma path: raw projection matrices from the KITTI/Strecha/
        # Middlebury readers (data/gipuma_io.py)
        P64 = np.asarray(P_matrices, np.float64)
        P, M_inv, centers, f, Minv64 = _geometry_from_P64(P64)
    else:
        P, M_inv, centers, f = camera_geometry(cams)
        cams64 = np.asarray(cams, np.float64)
        P64 = cams64[:, 1, :3, :3] @ cams64[:, 0, :3, :4]
        Minv64 = np.linalg.inv(P64[:, :, :3])
    depths = np.asarray(depths, np.float32)
    if depth_min is not None or depth_max is not None:
        lo = 0.0 if depth_min is None else float(depth_min)
        hi = np.inf if depth_max is None else float(depth_max)
        depths = np.where((depths >= lo) & (depths <= hi), depths, 0.0)
    depths_j = jnp.asarray(depths, jnp.float32)
    # native-dtype upload (uint8 images cross the host->device link at 1/4 the
    # bytes of float32); the cast to f32 happens on device in _fuse_one_ref_impl
    images_j = jnp.asarray(images)
    P_j, Mi_j, C_j, f_j = map(jnp.asarray, (P, M_inv, centers, f))
    normals_j = None if normals is None else jnp.asarray(normals, jnp.float32)

    from atvsnet_tpu.native import compact_backproject, compact_points

    R = max(1, min(int(ref_chunk), V))
    n_chunks = -(-V // R)
    H, W = depths.shape[1], depths.shape[2]
    hw = H * W

    # double-precision camera geometry for the host back-projection (the device
    # keeps its own f32 copy for the consistency checks; points are emitted from
    # THIS side now, at higher precision than the old device-transferred X)
    P4_64 = P64[:, :, 3]

    if compact not in ("auto", "always", "never"):
        raise ValueError(f"compact must be auto/always/never, got {compact!r}")
    # per-ref valid-pixel lists (row-major order, so emitted points keep the
    # dense path's ordering); computed once, chunk padding decided per chunk
    valid_idx = None
    if compact != "never":
        valid_idx = [np.flatnonzero(depths[r].reshape(-1) > 0).astype(np.int32)
                     for r in range(V)]

    flat_sample = (
        V * hw * 4 * (4 if normals is None else 7) * 4
        <= _FLAT_GATHER_MAX_TABLE_BYTES
    )

    def dispatch(ci):
        # pad the tail chunk by repeating the last ref; extras dropped on pull
        idxs = np.minimum(np.arange(ci * R, ci * R + R), V - 1).astype(np.int32)
        if valid_idx is not None:
            counts = np.array([valid_idx[r].shape[0] for r in idxs], np.int64)
            bucket = _sparse_bucket(int(counts.max()), hw)
        use_sparse = valid_idx is not None and (compact == "always" or bucket < hw)
        if use_sparse:
            # padding repeats index 0; the device masks rows >= n_valid
            idx_pad = np.zeros((R, bucket), np.int32)
            for j, r in enumerate(idxs):
                idx_pad[j, : counts[j]] = valid_idx[r]
            out = _fuse_ref_chunk_sparse(
                jnp.asarray(idxs), jnp.asarray(idx_pad),
                jnp.asarray(counts.astype(np.int32)),
                depths_j, images_j, P_j, Mi_j, C_j, f_j,
                disp_thresh=float(disp_thresh),
                num_consistent=int(num_consistent),
                normals=normals_j,
                normal_thresh_rad=float(np.deg2rad(normal_thresh_deg)),
                flat_sample=flat_sample,
            )
            return out, idxs, min(V - ci * R, R), idx_pad
        out = _fuse_ref_chunk(
            jnp.asarray(idxs), depths_j, images_j, P_j, Mi_j, C_j, f_j,
            disp_thresh=float(disp_thresh), num_consistent=int(num_consistent),
            normals=normals_j, normal_thresh_rad=float(np.deg2rad(normal_thresh_deg)),
            flat_sample=flat_sample,
        )
        return out, idxs, min(V - ci * R, R), None

    pts_out, rgb_out, nrm_out = [], [], []

    def _backproject_rows(r: int, pix: np.ndarray) -> np.ndarray:
        """Host float64 back-projection of flat pixel indices pix of ref r —
        the same X = Minv @ (d*[x,y,1] - P4) as native.compact_backproject."""
        d = depths[r].reshape(-1)[pix].astype(np.float64)
        pt = np.stack(
            [d * (pix % W) - P4_64[r][0], d * (pix // W) - P4_64[r][1], d - P4_64[r][2]],
            -1,
        )
        pts = (pt @ Minv64[r].T).astype(np.float32)
        pts[~np.isfinite(pts)] = 0.0
        return pts

    def pull(out, idxs, n_valid, idx_pad):
        if normals is None:
            # ONE (R, hw-or-bucket, 4) uint8 D2H pull; compaction back-projects
            # world coordinates from the host-resident (filtered) depth maps
            packed = np.asarray(out)
            for j in range(n_valid):
                r = int(idxs[j])
                if idx_pad is not None:
                    rows = packed[j].reshape(-1, 4)
                    sel = np.flatnonzero(rows[:, 0])
                    if sel.shape[0]:
                        pts_out.append(_backproject_rows(r, idx_pad[j][sel]))
                        rgb_out.append(rows[sel, 1:4].copy())
                    continue
                pts, cols = compact_backproject(packed[j], depths[r], Minv64[r], P4_64[r])
                if pts.shape[0]:
                    pts_out.append(pts)
                    rgb_out.append(cols)
            return
        # generic gipuma surface (normals requested): transfer emit/X/rgb/nrm and
        # compact on host (C++/OpenMP when built; non-finite coordinates zeroed
        # per displayUtils.h:113-118) — shape-agnostic over dense (R, H, W) vs
        # sparse (R, bucket) pixel axes
        emit_np = np.asarray(out[0])[:n_valid]
        X_np = np.asarray(out[1])[:n_valid]
        rgb_np = np.asarray(out[2])[:n_valid]
        pts, cols = compact_points(emit_np, X_np, rgb_np)
        if pts.shape[0]:
            pts_out.append(pts)
            rgb_out.append(cols)
            # same row-major order as the compaction
            nrm_out.append(
                np.asarray(out[3])[:n_valid].reshape(-1, 3)[
                    emit_np.reshape(-1).astype(bool)
                ]
            )

    pending = dispatch(0)
    for ci in range(1, n_chunks):
        nxt = dispatch(ci)      # device starts chunk ci while the host compacts
        pull(*pending)
        pending = nxt
    pull(*pending)
    if not pts_out:
        z3 = np.zeros((0, 3), np.float32)
        if normals is not None:
            return z3, np.zeros((0, 3), np.uint8), z3.copy()
        return z3, np.zeros((0, 3), np.uint8)
    if normals is not None:
        return np.concatenate(pts_out), np.concatenate(rgb_out), np.concatenate(nrm_out)
    return np.concatenate(pts_out), np.concatenate(rgb_out)
