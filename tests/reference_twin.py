"""NON-PRODUCTION executable spec: a naive numpy twin of the reference pipeline.

This file is a deliberate, line-by-line transcription of the REFERENCE call graph
(/root/reference: atvsnet/model.py, atvsnet/example.py run_test_multiview,
atvsnet/homography_warping.py, cnn_wrapper/{network,atvsnet}.py) into plain numpy —
unbatched loops, no vmap/scan, no fused gathers, no decomposed convs, no perf tricks.
It consumes the SAME parameter tree as atvsnet_tpu (models.tvsnet.init_params) so that
tests/test_reference_twin.py can assert the production pipeline (reference_compat=True)
against an INDEPENDENTLY-derived composition of the graph: which activation feeds which
input, concat orders, mask/NaN semantics, the visual-hull camera-indexing bug — checks
that per-op oracles cannot give (round-2 VERDICT item 4).

Everything runs in float64 so the twin is also a higher-precision oracle; the
production fp32 pipeline is compared against it with tolerances sized to fp32 noise.

DO NOT import from production code paths. numpy only.
"""

from __future__ import annotations

import itertools

import numpy as np

F64 = np.float64


# =========================== primitive ops (TF semantics) ===========================

def _same_pads(in_size: int, k: int, stride: int, rate: int = 1):
    """TF 'SAME' padding amounts (beg, end) for one axis."""
    k_eff = k + (k - 1) * (rate - 1)
    out = -(-in_size // stride)
    total = max((out - 1) * stride + k_eff - in_size, 0)
    return total // 2, total - total // 2


def conv_nd(x, w, b=None, stride=1, rate=1, relu=False, padding="SAME"):
    """N-d conv, channel-last; x (B, *sp, Ci), w (*k, Ci, Co). Direct tap loops."""
    x = np.asarray(x, F64)
    w = np.asarray(w, F64)
    nd = x.ndim - 2
    ks = w.shape[:nd]
    Co = w.shape[-1]
    sp = x.shape[1:-1]
    if padding == "SAME":
        pads = [_same_pads(s, k, stride, rate) for s, k in zip(sp, ks)]
    elif padding == "VALID":
        pads = [(0, 0)] * nd
    else:  # explicit [(beg, end), ...]
        pads = padding
    xp = np.pad(x, ((0, 0), *pads, (0, 0)))
    out_sp = tuple(
        (xp.shape[1 + a] - (ks[a] + (ks[a] - 1) * (rate - 1))) // stride + 1
        for a in range(nd)
    )
    y = np.zeros((x.shape[0], *out_sp, Co), F64)
    for taps in itertools.product(*(range(k) for k in ks)):
        sl = tuple(
            slice(t * rate, t * rate + stride * (o - 1) + 1, stride)
            for t, o in zip(taps, out_sp)
        )
        y += np.einsum("b...i,io->b...o", xp[(slice(None), *sl, slice(None))], w[taps])
    if b is not None:
        y = y + np.asarray(b, F64)
    return np.maximum(y, 0) if relu else y


def deconv_nd(g, w, stride=2):
    """TF conv{2,3}d_transpose SAME: exact adjoint of the SAME strided conv.

    w uses the TF transpose-kernel layout (*k, Co, Ci); g (B, *sp, Ci);
    output (B, *sp*stride, Co). Reference network.py:481-550.
    """
    g = np.asarray(g, F64)
    w = np.asarray(w, F64)
    nd = g.ndim - 2
    ks = w.shape[:nd]
    Co = w.shape[-2]
    in_sp = g.shape[1:-1]
    out_sp = tuple(s * stride for s in in_sp)
    # forward conv (out_sp -> in_sp, SAME): pad_beg per axis
    begs = [_same_pads(o, k, stride)[0] for o, k in zip(out_sp, ks)]
    y = np.zeros((g.shape[0], *out_sp, Co), F64)
    for taps in itertools.product(*(range(k) for k in ks)):
        g_sl, y_sl, ok = [], [], True
        for a in range(nd):
            off = taps[a] - begs[a]
            i_lo = max(0, -(-(-off) // stride))  # ceil(-off / stride)
            i_hi = min(in_sp[a], (out_sp[a] - 1 - off) // stride + 1)
            if i_lo >= i_hi:
                ok = False
                break
            g_sl.append(slice(i_lo, i_hi))
            y_sl.append(slice(i_lo * stride + off, (i_hi - 1) * stride + off + 1, stride))
        if not ok:
            continue
        y[(slice(None), *y_sl, slice(None))] += np.einsum(
            "b...i,oi->b...o", g[(slice(None), *g_sl, slice(None))], w[taps]
        )
    return y


def batch_norm(x, eps=1e-3, beta=None):
    """tf.layers.batch_normalization(training=True, center=False/True, scale=False):
    biased moments over (batch, spatial) per channel (network.py:206-212).
    The twin runs B=1 throughout, as every reference driver does."""
    x = np.asarray(x, F64)
    axes = tuple(range(x.ndim - 1))
    mean = x.mean(axis=axes, keepdims=True)
    var = x.var(axis=axes, keepdims=True)
    y = (x - mean) / np.sqrt(var + eps)
    if beta is not None:
        y = y + np.asarray(beta, F64)
    return y


def conv_bn(p, x, stride=1, rate=1, relu=True):
    y = batch_norm(conv_nd(x, p["w"], stride=stride, rate=rate))
    return np.maximum(y, 0) if relu else y


def deconv_bn(p, x, stride=2, relu=True):
    y = batch_norm(deconv_nd(x, p["w"], stride=stride))
    return np.maximum(y, 0) if relu else y


def avg_pool_same(x, pool):
    """tf avg_pool SAME stride=pool: mean over VALID (un-padded) cells only."""
    x = np.asarray(x, F64)
    B, H, W, C = x.shape
    Ho, Wo = -(-H // pool), -(-W // pool)
    bh, _ = _same_pads(H, pool, pool)
    bw, _ = _same_pads(W, pool, pool)
    y = np.zeros((B, Ho, Wo, C), F64)
    for i in range(Ho):
        for j in range(Wo):
            h0, h1 = max(0, i * pool - bh), min(H, i * pool - bh + pool)
            w0, w1 = max(0, j * pool - bw), min(W, j * pool - bw + pool)
            y[:, i, j] = x[:, h0:h1, w0:w1].mean(axis=(1, 2))
    return y


def resize_align_corners(x, out_h, out_w):
    """tf.image.resize_images(BILINEAR, align_corners=True) (model.py:72-74)."""
    x = np.asarray(x, F64)
    B, H, W, C = x.shape
    y = np.zeros((B, out_h, out_w, C), F64)

    def src_coords(out, in_sz):
        if out == 1 or in_sz == 1:
            return np.zeros(out), np.zeros(out, np.int64)
        s = (np.arange(out) * (in_sz - 1) / (out - 1))
        i0 = np.minimum(np.floor(s).astype(np.int64), in_sz - 2)
        return s - i0, i0

    fh, ih = src_coords(out_h, H)
    fw, iw = src_coords(out_w, W)
    for i in range(out_h):
        row0 = x[:, ih[i]]
        row1 = x[:, min(ih[i] + 1, H - 1)]
        row = row0 * (1 - fh[i]) + row1 * fh[i]
        for j in range(out_w):
            c0 = row[:, iw[j]]
            c1 = row[:, min(iw[j] + 1, W - 1)]
            y[:, i, j] = c0 * (1 - fw[j]) + c1 * fw[j]
    return y


# ======================= geometry (homography_warping.py) =======================

def get_pixel_grids(height, width):
    """(3, H*W) homogeneous half-pixel-center grid (homography_warping.py:8-17)."""
    x = np.linspace(0.5, width - 0.5, width)
    y = np.linspace(0.5, height - 0.5, height)
    xc, yc = np.meshgrid(x, y)
    return np.stack([xc.reshape(-1), yc.reshape(-1), np.ones(height * width)], axis=0)


def interpolate(image, x, y, output_mask=False, method="bilinear"):
    """Transcription of homography_warping.py:31-104 (B flattened coords)."""
    image = np.asarray(image, F64)
    B, H, W = image.shape[:3]
    x = np.asarray(x, F64) - 0.5
    y = np.asarray(y, F64) - 0.5
    with np.errstate(invalid="ignore"):
        valid = (x >= 0) & (y >= 0) & (x < W - 1) & (y < H - 1)
        valid &= ~np.isnan(x) & ~np.isnan(y)
    xs = np.nan_to_num(x)
    ys = np.nan_to_num(y)
    b = np.repeat(np.arange(B), H * W)

    if method == "nearest":
        x0 = (np.round(xs).astype(np.int64)) * valid
        y0 = (np.round(ys).astype(np.int64)) * valid
        out = image[b, y0, x0]
        if output_mask:
            return out, valid
        return out

    x0 = np.floor(xs).astype(np.int64)
    x1 = x0 + 1
    y0 = np.floor(ys).astype(np.int64)
    y1 = y0 + 1
    xs = xs * valid
    ys = ys * valid
    x0 = np.clip(x0 * valid, 0, W - 1)
    x1 = np.clip(x1 * valid, 0, W - 1)
    y0 = np.clip(y0 * valid, 0, H - 1)
    y1 = np.clip(y1 * valid, 0, H - 1)
    va = image[b, y0, x0]
    vb = image[b, y0, x1]
    vc = image[b, y1, x0]
    vd = image[b, y1, x1]
    x0f, x1f, y0f, y1f = (v.astype(F64) for v in (x0, x1, y0, y1))
    area_a = ((y1f - ys) * (x1f - xs))[:, None]
    area_b = ((y1f - ys) * (xs - x0f))[:, None]
    area_c = ((ys - y0f) * (x1f - xs))[:, None]
    area_d = ((ys - y0f) * (xs - x0f))[:, None]
    out = area_a * va + area_b * vb + area_c * vc + area_d * vd
    if output_mask:
        return out, valid
    return out


def get_homographies(left_cam, right_cam, depth_num, depth_start, depth_interval, inverse_depth):
    """(B, D, 3, 3) plane-sweep homographies (homography_warping.py:179-227)."""
    left_cam = np.asarray(left_cam, F64)
    right_cam = np.asarray(right_cam, F64)
    R_l, R_r = left_cam[:, 0, :3, :3], right_cam[:, 0, :3, :3]
    t_l, t_r = left_cam[:, 0, :3, 3:4], right_cam[:, 0, :3, 3:4]
    K_l, K_r = left_cam[:, 1, :3, :3], right_cam[:, 1, :3, :3]
    B = R_l.shape[0]
    depth = np.asarray(depth_start, F64)[:, None] + np.arange(depth_num)[None, :] * np.asarray(depth_interval, F64)[:, None]

    K_l_inv = np.linalg.inv(K_l)
    R_l_T = np.transpose(R_l, (0, 2, 1))
    R_r_T = np.transpose(R_r, (0, 2, 1))
    fronto = R_l[:, 2:3, :]                        # third row of R_left
    c_l = -R_l_T @ t_l
    c_r = -R_r_T @ t_r
    c_rel = c_r - c_l
    temp = c_rel @ fronto                          # (B, 3, 3)

    H = np.zeros((B, depth_num, 3, 3), F64)
    eye = np.eye(3)
    for d in range(depth_num):
        for bb in range(B):
            if inverse_depth:
                mid0 = eye - temp[bb] * depth[bb, d]
            else:
                mid0 = eye - temp[bb] / depth[bb, d]
            H[bb, d] = K_r[bb] @ R_r[bb] @ mid0 @ R_l_T[bb] @ K_l_inv[bb]
    return H


def homography_warping(image, homography, method="bilinear", output_mask=False):
    """Warp (B, H, W, C) by one (B, 3, 3) homography (homography_warping.py:230-271)."""
    image = np.asarray(image, F64)
    B, H, W, C = image.shape
    grids = np.broadcast_to(get_pixel_grids(H, W)[None], (B, 3, H * W))
    affine = homography[:, :2, :]
    div = homography[:, 2:3, :]
    ga = affine @ grids
    gd = div @ grids
    gd = gd + (gd == 0.0) * 1e-7
    warped = ga / gd
    xw = warped[:, 0].reshape(-1)
    yw = warped[:, 1].reshape(-1)
    if output_mask:
        out, mask = interpolate(image, xw, yw, output_mask=True, method=method)
        return out.reshape(B, H, W, C), mask.reshape(B, H, W, 1)
    return interpolate(image, xw, yw, method=method).reshape(B, H, W, C)


def transform_depth(left_depth, left_cam, right_cam, inverse_depth):
    """Transfer depth values into another camera frame (homography_warping.py:275-326)."""
    left_depth = np.asarray(left_depth, F64)
    left_cam = np.asarray(left_cam, F64)
    right_cam = np.asarray(right_cam, F64)
    B, H, W = left_depth.shape[:3]
    R_l, R_r = left_cam[:, 0, :3, :3], right_cam[:, 0, :3, :3]
    t_l, t_r = left_cam[:, 0, :3, 3:4], right_cam[:, 0, :3, 3:4]
    K_l, K_r = left_cam[:, 1, :3, :3], right_cam[:, 1, :3, :3]
    K_l_inv = np.linalg.inv(K_l)
    R_l_T = np.transpose(R_l, (0, 2, 1))
    c_l = -R_l_T @ t_l

    grids = np.broadcast_to(get_pixel_grids(H, W)[None], (B, 3, H * W)).copy()
    d = left_depth.reshape(B, 1, H * W).copy()
    if inverse_depth:
        valid = d > 1e-10
        d = np.clip(d, 1e-10, d.max())
        d = 1.0 / d
        d = d * valid
    grids = grids * d                                            # (u,v,1) * depth
    mat = K_r @ R_r @ R_l_T @ K_l_inv
    vec = K_r @ R_r @ c_l + K_r @ t_r
    xyw = mat @ grids + vec
    dw = xyw[:, 2].reshape(left_depth.shape)
    if inverse_depth:
        dw = np.clip(dw, 1e-10, dw.max())
        dw = 1.0 / dw
        dw = dw * valid.reshape(left_depth.shape)
    return dw


def homography_warping_by_depth(image, left_cam, right_cam, depth_image,
                                inverse_depth, output_mask=False, method="bilinear"):
    """Warp by a per-pixel depth map (homography_warping.py:108-176)."""
    image = np.asarray(image, F64)
    B, H, W, C = image.shape
    left_cam = np.asarray(left_cam, F64)
    right_cam = np.asarray(right_cam, F64)
    R_l, R_r = left_cam[:, 0, :3, :3], right_cam[:, 0, :3, :3]
    t_l, t_r = left_cam[:, 0, :3, 3:4], right_cam[:, 0, :3, 3:4]
    K_l, K_r = left_cam[:, 1, :3, :3], right_cam[:, 1, :3, :3]
    K_l_inv = np.linalg.inv(K_l)
    R_l_T = np.transpose(R_l, (0, 2, 1))
    c_l = -R_l_T @ t_l

    grids = np.broadcast_to(get_pixel_grids(H, W)[None], (B, 3, H * W))
    d = np.asarray(depth_image, F64).reshape(B, 1, H * W)
    mat = K_r @ R_r @ R_l_T @ K_l_inv
    vec = K_r @ R_r @ c_l + K_r @ t_r                            # (B, 3, 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        if inverse_depth:
            vec_t = vec * d                                      # (B, 3, HW)
        else:
            vec_t = vec / d
        xyw = mat @ grids + vec_t
        dw = xyw[:, 2:3]
        xyw = xyw / dw
    xw = xyw[:, 0].reshape(-1)
    yw = xyw[:, 1].reshape(-1)
    if output_mask:
        out, mask = interpolate(image, xw, yw, output_mask=True, method=method)
        return out.reshape(B, H, W, C), mask.reshape(B, H, W, 1)
    return interpolate(image, xw, yw, method=method).reshape(B, H, W, C)


def get_visual_hull(depth_images, cams, depth_num, depth_start, depth_interval,
                    inverse_depth, ref_id=0, view_num=2):
    """(B, N, H, W) init depths + FULL cams stack -> (B, D, H, W, 1) hull
    (homography_warping.py:329-387). NOTE: passing the full cams with view_num=2
    reproduces the reference's camera-indexing bug — the view term always reads
    camera index 1 (model.py:321-324)."""
    depth_images = np.asarray(depth_images, F64)
    B, _, H, W = depth_images.shape
    id_reorder = list(range(view_num))
    id_reorder[0], id_reorder[ref_id] = ref_id, 0

    ref_cam = cams[:, ref_id]
    ref_depth = depth_images[:, ref_id]
    homos, trans = [], []
    for view_i in id_reorder[1:]:
        view_cam = cams[:, view_i]
        homos.append(get_homographies(ref_cam, view_cam, depth_num, depth_start,
                                      depth_interval, inverse_depth))
        trans.append(transform_depth(depth_images[:, view_i], view_cam, ref_cam,
                                     inverse_depth))

    hull = np.zeros((B, depth_num, H, W), F64)
    for di in range(depth_num):
        cur = np.asarray(depth_start, F64) + np.asarray(depth_interval, F64) * di
        ref_slice = cur[:, None, None] * np.ones((B, H, W))
        valid = (ref_depth > 0).astype(F64)
        if inverse_depth:
            sl = valid * (ref_depth > ref_slice)
        else:
            sl = valid * (ref_slice > ref_depth)
        for v in range(view_num - 1):
            wd = homography_warping(trans[v][..., None], homos[v][:, di],
                                    method="nearest")[..., 0]
            valid_v = (wd > 0).astype(F64)
            if inverse_depth:
                sl = sl + valid_v * (wd > ref_slice)
            else:
                sl = sl + valid_v * (ref_slice > wd)
        hull[:, di] = sl
    return (hull / view_num)[..., None]


# =========================== output modules (model.py) ===========================

def prob2depth(prob_volume, depth_num, depth_start, depth_interval, out_prob_map=False):
    """Soft-argmin (model.py:80-109) [+ 4-bin probability map (model.py:13-65)]."""
    pv = np.asarray(prob_volume, F64)
    B, D, H, W = pv.shape
    e = np.exp(-pv - np.max(-pv, axis=1, keepdims=True))
    prob = e / e.sum(axis=1, keepdims=True)
    depth_end = np.asarray(depth_start, F64) + (depth_num - 1) * np.asarray(depth_interval, F64)
    depth = np.zeros((B, H, W, 1), F64)
    for bb in range(B):
        sweep = np.linspace(depth_start[bb], depth_end[bb], depth_num)
        depth[bb, ..., 0] = np.sum(sweep[:, None, None] * prob[bb], axis=0)
    if not out_prob_map:
        return depth
    # get_propability_map (model.py:13-65): 4 clipped bins around the estimate
    pm = np.zeros((B, H, W, 1), F64)
    for bb in range(B):
        d_idx = (depth[bb, ..., 0] - depth_start[bb]) / depth_interval[bb]
        l0 = np.clip(np.floor(d_idx).astype(np.int64), 0, D - 1)
        l1 = np.clip(l0 - 1, 0, D - 1)
        r0 = np.clip(np.ceil(d_idx).astype(np.int64), 0, D - 1)
        r1 = np.clip(r0 + 1, 0, D - 1)
        yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        pm[bb, ..., 0] = (prob[bb, l0, yy, xx] + prob[bb, l1, yy, xx]
                          + prob[bb, r0, yy, xx] + prob[bb, r1, yy, xx])
    return depth, pm


def upsample_prob_vol(prob_vol, up_scale=4):
    """(B, D, H, W) -> (B, D, sH, sW) align-corners bilinear (model.py:68-76)."""
    pv = np.transpose(np.asarray(prob_vol, F64), (0, 2, 3, 1))
    up = resize_align_corners(pv, pv.shape[1] * up_scale, pv.shape[2] * up_scale)
    return np.transpose(up, (0, 3, 1, 2))


def prob2depth_upsample(prob_volume, depth_num, depth_start, depth_interval,
                        out_prob_map=False):
    """model.py:113-129."""
    up = upsample_prob_vol(prob_volume)
    if out_prob_map:
        d_up, p_up = prob2depth(up, depth_num, depth_start, depth_interval, True)
        d, p = prob2depth(prob_volume, depth_num, depth_start, depth_interval, True)
        return d, d_up, p, p_up
    d_up = prob2depth(up, depth_num, depth_start, depth_interval)
    d = prob2depth(prob_volume, depth_num, depth_start, depth_interval)
    return d, d_up


# ============================ networks (cnn_wrapper) ============================

def bottleneck(p, x, stride=1, rate=1):
    """slim pre-activation bottleneck (network.py:552-602)."""
    depth_in = x.shape[-1]
    depth = p["conv3"]["w"].shape[-1]
    preact = np.maximum(batch_norm(x, beta=p["preact"]["beta"]), 0)
    if depth == depth_in:
        shortcut = x if stride == 1 else x[:, ::stride, ::stride]
    else:
        shortcut = conv_nd(preact, p["shortcut"]["w"], p["shortcut"]["b"], stride=stride)
    residual = conv_nd(preact, p["conv1"]["w"], p["conv1"]["b"], relu=True)
    if stride == 1:
        residual = conv_nd(residual, p["conv2"]["w"], p["conv2"]["b"], rate=rate, relu=True)
    else:
        k = p["conv2"]["w"].shape[0]
        k_eff = k + (k - 1) * (rate - 1)
        beg = (k_eff - 1) // 2
        end = k_eff - 1 - beg
        residual = conv_nd(residual, p["conv2"]["w"], p["conv2"]["b"], stride=stride,
                           rate=rate, relu=True, padding=[(beg, end), (beg, end)])
    residual = conv_nd(residual, p["conv3"]["w"], p["conv3"]["b"])
    return shortcut + residual


def res_block(params, x, name, num_block, stride=1, rate=1):
    """network.py:604-616 naming: name_0 ... name_{n-2}, name (last)."""
    if num_block == 1:
        return bottleneck(params[name], x, stride=stride, rate=rate)
    names = [f"{name}_{i}" for i in range(num_block - 1)] + [name]
    y = bottleneck(params[names[0]], x, stride=stride, rate=rate)
    for sub in names[1:]:
        y = bottleneck(params[sub], y, stride=1, rate=rate)
    return y


def fem(p, image):
    """ResNetDS2SPP (cnn_wrapper/atvsnet.py:254-292): (B, H, W, 3) -> (B, H/4, W/4, 32)."""
    x = conv_bn(p["conv0_0"], image, stride=2)
    x = conv_bn(p["conv0_1"], x)
    x = conv_bn(p["conv0_2"], x)
    x = res_block(p, x, "conv0_x", 3, stride=1, rate=1)
    c1 = res_block(p, x, "conv1_x", 8, stride=2, rate=1)
    x = res_block(p, c1, "conv2_x", 3, stride=1, rate=2)
    c3 = res_block(p, x, "conv3_x", 3, stride=1, rate=4)
    h, w = c3.shape[1], c3.shape[2]
    branches = []
    for i, pool in enumerate((64, 32, 16, 8)):
        b = avg_pool_same(c3, pool)
        b = conv_bn(p[f"branch_{i}_conv"], b)
        branches.append(resize_align_corners(b, h, w))
    x = np.concatenate([c1, c3] + branches, axis=-1)
    x = conv_bn(p["fusion0"], x)
    return conv_nd(x, p["fusion1"]["w"])


def fem_shallow(p, image):
    """ResNetDS2SPP_shallow_f16 (atvsnet.py:245-251)."""
    x = res_block(p, image, "global_refine_conv0_x", 3, stride=4, rate=1)
    return conv_nd(x, p["global_refine_shallow_feature"]["w"])


def crm_prob(p, cost_volume):
    """StackedUNet_prob dense-skip graph (atvsnet.py:100-192).

    Returns (conv_b2_6_1 filtered cost (B,D,h,w,f), conv_b2_6_2 squeezed prob)."""
    acts = {"data": np.asarray(cost_volume, F64)}

    def c(src, name, stride=1):
        acts[name] = conv_bn(p[name], acts[src], stride=stride)

    def dc(src, name):
        acts[name] = deconv_bn(p[name], acts[src])

    def add(srcs, name):
        acts[name] = sum(acts[s] for s in srcs)

    for b in range(3):
        if b == 0:
            inp = "data"
        else:
            add([f"conv_b{b-1}_6_0", f"conv_b{b-1}_0_1"], f"conv_b{b}_0_0")
            inp = f"conv_b{b}_0_0"
        c(inp, f"conv_b{b}_1_0", 2)
        c(f"conv_b{b}_1_0", f"conv_b{b}_2_0", 2)
        c(f"conv_b{b}_2_0", f"conv_b{b}_3_0", 2)
        c(inp, f"conv_b{b}_0_1")
        if b == 0:
            c(f"conv_b{b}_1_0", f"conv_b{b}_1_1")
            c(f"conv_b{b}_2_0", f"conv_b{b}_2_1")
        else:
            add([f"conv_b{b}_1_0", f"conv_b{b-1}_5_0"], f"conv_b{b}_1_1_concat")
            c(f"conv_b{b}_1_1_concat", f"conv_b{b}_1_1")
            add([f"conv_b{b}_2_0", f"conv_b{b-1}_4_0"], f"conv_b{b}_2_1_concat")
            c(f"conv_b{b}_2_1_concat", f"conv_b{b}_2_1")
        c(f"conv_b{b}_3_0", f"conv_b{b}_3_1")
        dc(f"conv_b{b}_3_1", f"conv_b{b}_4_0")
        if b == 0:
            add([f"conv_b{b}_4_0", f"conv_b{b}_2_1"], f"conv_b{b}_4_1")
            dc(f"conv_b{b}_4_1", f"conv_b{b}_5_0")
            add([f"conv_b{b}_5_0", f"conv_b{b}_1_1"], f"conv_b{b}_5_1")
        else:
            add([f"conv_b{b}_4_0", f"conv_b{b}_2_1", "conv_b0_2_1"], f"conv_b{b}_4_1")
            dc(f"conv_b{b}_4_1", f"conv_b{b}_5_0")
            add([f"conv_b{b}_5_0", f"conv_b{b}_1_1", "conv_b0_1_1"], f"conv_b{b}_5_1")
        dc(f"conv_b{b}_5_1", f"conv_b{b}_6_0")
    add(["conv_b2_6_0", "conv_b2_0_1"], "conv_b2_6_1")
    prob = conv_nd(acts["conv_b2_6_1"], p["conv_b2_6_2"]["w"])
    return acts["conv_b2_6_1"], prob[..., 0]


def attention_aggregation(att, x):
    """network.py:282-408: per-view unique/shared convs, softmax over views,
    weighted sum. x (B, D, h, w, C, N) -> (B, D, h, w, C)."""
    x = np.asarray(x, F64)
    N = x.shape[-1]
    shared = [np.maximum(conv_nd(x[..., i], att["weight_shared"]), 0) for i in range(N)]
    shared_sum = sum(shared)
    outs = []
    for i in range(N):
        unique = np.maximum(conv_nd(x[..., i], att["weight_unique"]), 0)
        outs.append(unique - shared[i] + shared_sum)
    act = np.stack(outs, axis=-1)
    e = np.exp(act - act.max(axis=-1, keepdims=True))
    score = e / e.sum(axis=-1, keepdims=True)
    return np.sum(score * x, axis=-1)


def cost_vol_refine_net(p, photo_group, geo_group, prob_vol, vis_hull):
    """CostVolRefineNet (atvsnet.py:295-336) -> (3dconv6_1, squeezed output)."""
    P = "global_refine"
    photo = conv_bn(p[f"{P}_photo_3dconv"], photo_group)
    geo = conv_bn(p[f"{P}_geo_3dconv"], geo_group)
    pr = conv_bn(p[f"{P}_prob_3dconv"], prob_vol)
    vh = conv_bn(p[f"{P}_vishull_3dconv"], vis_hull)
    x = np.concatenate([photo, geo, pr, vh], axis=-1)
    c1_0 = conv_bn(p[f"{P}_3dconv1_0"], x, stride=2)
    c2_0 = conv_bn(p[f"{P}_3dconv2_0"], c1_0, stride=2)
    c3_0 = conv_bn(p[f"{P}_3dconv3_0"], c2_0, stride=2)
    c0_1 = conv_bn(p[f"{P}_3dconv0_1"], x)
    c1_1 = conv_bn(p[f"{P}_3dconv1_1"], c1_0)
    c2_1 = conv_bn(p[f"{P}_3dconv2_1"], c2_0)
    c3_1 = conv_bn(p[f"{P}_3dconv3_1"], c3_0)
    c4_0 = deconv_bn(p[f"{P}_3dconv4_0"], c3_1)
    c5_0 = deconv_bn(p[f"{P}_3dconv5_0"], c4_0 + c2_1)
    c6_0 = deconv_bn(p[f"{P}_3dconv6_0"], c5_0 + c1_1)
    c6_1 = c6_0 + c0_1
    out = conv_nd(c6_1, p[f"{P}d_cost_vol"]["w"])
    return c6_1, out[..., 0]


# ============================ model composition (model.py) ============================

def build_cost_volume(ref_feature, view_feature, ref_cam, view_cam,
                      depth_num, depth_start, depth_interval, inverse_depth):
    """model.py:157-200 (warp_ref=False path): concat [tiled ref | warped view]."""
    homos = get_homographies(ref_cam, view_cam, depth_num, depth_start,
                             depth_interval, inverse_depth)
    ref_vol = np.broadcast_to(ref_feature[:, None],
                              (ref_feature.shape[0], depth_num) + ref_feature.shape[1:])
    warped = np.stack(
        [homography_warping(view_feature, homos[:, d]) for d in range(depth_num)], axis=1
    )
    return np.concatenate([ref_vol, warped], axis=-1), homos


def refinement(params, init_depth_images, cams, depth_num, depth_start, depth_interval,
               images, prob_vol, ref_id, view_id, inverse_depth, num_depths=2):
    """model.py:227-339 with depth_ref_id=0, depth_view_id=1 (as all drivers call it).

    init_depth_images (B, 2, h, w, 1): [aggregated/ref depth, pair view depth];
    cams is the FULL (B, N, 2, 4, 4) stack — get_visual_hull slices it with
    view_num=num_depths=2, reproducing the reference bug.
    """
    prob_vol5 = np.asarray(prob_vol, F64)[..., None]
    init_depth = np.asarray(init_depth_images[:, 0], F64)       # depth_ref_id=0
    init_depth_view = np.asarray(init_depth_images[:, 1], F64)  # depth_view_id=1
    ref_cam = cams[:, ref_id]
    view_cam = cams[:, view_id]
    dvt = transform_depth(init_depth_view[..., 0], view_cam, ref_cam, inverse_depth)[..., None]
    homos = get_homographies(ref_cam, view_cam, depth_num, depth_start,
                             depth_interval, inverse_depth)

    ref_shallow = fem_shallow(params["fem_shallow"], images[:, ref_id])
    view_shallow = fem_shallow(params["fem_shallow"], images[:, view_id])
    F = ref_shallow.shape[-1]

    # photometric L1 cost volume (model.py:270-280)
    photo = []
    for d in range(depth_num):
        w, m = homography_warping(view_shallow, homos[:, d], output_mask=True)
        photo.append(np.abs(w - ref_shallow) * np.tile(m, (1, 1, 1, F)))
    cost_vol_photo = np.stack(photo, axis=1)

    # geometric L1 volume (model.py:285-300): ref term 1ch, view term broadcast to F
    geo_ref, geo_view = [], []
    denom = (np.asarray(depth_interval, F64) * depth_num)[:, None, None, None]
    for d in range(depth_num):
        dv = (np.asarray(depth_start, F64) + d * np.asarray(depth_interval, F64))[:, None, None, None]
        geo_ref.append(np.abs(init_depth - dv) / denom)
        w, m = homography_warping(dvt, homos[:, d], output_mask=True)
        geo_view.append(np.abs(w - dv) / denom * np.tile(m, (1, 1, 1, F)))
    cost_volume_geo = np.concatenate(
        [np.stack(geo_ref, axis=1), np.stack(geo_view, axis=1)], axis=-1
    )

    # per-pixel photo/geo errors at the initial depth (model.py:306-316)
    wf, mp = homography_warping_by_depth(view_shallow, ref_cam, view_cam, init_depth,
                                         inverse_depth, output_mask=True)
    photo_err = np.abs(wf - ref_shallow) * np.tile(mp, (1, 1, 1, F))
    photo_err = np.broadcast_to(photo_err[:, None],
                                (photo_err.shape[0], depth_num) + photo_err.shape[1:])
    wd, mg = homography_warping_by_depth(dvt, ref_cam, view_cam, init_depth,
                                         inverse_depth, output_mask=True, method="nearest")
    geo_err = np.abs(wd - init_depth) * mg
    geo_err = np.broadcast_to(geo_err[:, None],
                              (geo_err.shape[0], depth_num) + geo_err.shape[1:])

    # visual hull (model.py:321-324): FULL cams + view_num=2 (the reference bug)
    vis_hull = get_visual_hull(init_depth_images[..., 0], cams, depth_num,
                               depth_start, depth_interval, inverse_depth,
                               ref_id=ref_id, view_num=num_depths)

    # refinement net inputs (model.py:329-337)
    ref_cost_volume = np.broadcast_to(ref_shallow[:, None],
                                      (ref_shallow.shape[0], depth_num) + ref_shallow.shape[1:])
    ref_geo_volume = np.broadcast_to(init_depth[:, None],
                                     (init_depth.shape[0], depth_num) + init_depth.shape[1:])
    photo_group = np.concatenate([cost_vol_photo, photo_err, ref_cost_volume], axis=-1)
    geo_group = np.concatenate([cost_volume_geo, geo_err, ref_geo_volume], axis=-1)
    prob_vol_tiled = np.broadcast_to(prob_vol5[:, :, :, :],
                                     prob_vol5.shape)  # already (B, D, h, w, 1)
    return cost_vol_refine_net(params["refine"], photo_group, geo_group,
                               prob_vol_tiled, vis_hull)


def twin_multi_view_forward(params, images, cams, depth_num, inverse_depth=True):
    """The 4-stage multi-view pipeline exactly as run_test_multiview stages it
    (example.py:51-216) with the N-1 per-pair graphs of TVSNet_base_siamese /
    TVSNet_refine (model.py:398-441). Returns intermediates for localization."""
    params = _to_f64(params)
    images = np.asarray(images, F64)
    cams = np.asarray(cams, F64)
    B, N = images.shape[:2]
    depth_start = cams[:, 0, 1, 3, 0]
    depth_interval = cams[:, 0, 1, 3, 1]

    # ---- stage 1: per-pair TVSNet_base_siamese (example.py:144-151) ----
    fcv, depth_views = [], []
    for view_i in range(1, N):
        ref_f = fem(params["fem"], images[:, 0])
        view_f = fem(params["fem"], images[:, view_i])
        cost_vol, _ = build_cost_volume(ref_f, view_f, cams[:, 0], cams[:, view_i],
                                        depth_num, depth_start, depth_interval, inverse_depth)
        b2_6_1, prob_b2 = crm_prob(params["crm"], cost_vol)
        cost_vol_v, _ = build_cost_volume(view_f, ref_f, cams[:, view_i], cams[:, 0],
                                          depth_num, depth_start, depth_interval, inverse_depth)
        _, prob_view = crm_prob(params["crm"], cost_vol_v)
        depth_view = prob2depth(prob_view, depth_num, depth_start, depth_interval)
        fcv.append(b2_6_1)
        depth_views.append(depth_view)
        del prob_b2  # computed by the reference graph; unused by the multi-view driver

    # ---- stage 2: AAM1 (example.py:153-158) ----
    stacked = np.stack(fcv, axis=-1)
    cost_agg = attention_aggregation(params["aam1_att"], stacked)
    prob_agg = conv_nd(cost_agg, params["aam1_out"]["attention_prob_vol"]["w"])[..., 0]
    depth_agg = prob2depth(prob_agg, depth_num, depth_start, depth_interval)

    # ---- stage 3: per-pair TVSNet_refine (example.py:160-174, model.py:428-441) ----
    refined_costs = []
    for idx, view_i in enumerate(range(1, N)):
        init_depths = np.stack([depth_agg, depth_views[idx]], axis=1)  # (B, 2, h, w, 1)
        cost_res, _prob_res = refinement(
            params, init_depths, cams, depth_num, depth_start, depth_interval,
            images, prob_agg, ref_id=0, view_id=view_i, inverse_depth=inverse_depth,
            num_depths=2,
        )
        refined_costs.append(cost_agg + cost_res)  # model.py:439

    # ---- stage 4: AAM2 + upsampled soft-argmin (example.py:176-181, 109) ----
    stacked2 = np.stack(refined_costs, axis=-1)
    cost_agg2 = attention_aggregation(params["aam2_att"], stacked2)
    prob_agg2 = conv_nd(cost_agg2, params["aam2_out"]["attention_prob_vol_refine"]["w"])[..., 0]
    depth, depth_up = prob2depth_upsample(prob_agg2, depth_num, depth_start, depth_interval)

    return {
        "depth_views": np.stack(depth_views, axis=0),   # (P, B, h, w, 1)
        "cost_agg": cost_agg,
        "prob_volume_agg": prob_agg,
        "depth_agg_initial": depth_agg,
        "prob_agg2": prob_agg2,
        "depth": depth,
        "depth_up": depth_up,
    }


def _to_f64(tree):
    if isinstance(tree, dict):
        return {k: _to_f64(v) for k, v in tree.items()}
    return np.asarray(tree, F64)
