"""TVSNet — two-view plane-sweep stereo with geometry-aware refinement.

Composition mirrors reference atvsnet/model.py:346-441 but runs as a single jitted
program: plane-sweep cost volumes are built with one batched warp over all D planes,
both sweep directions share CRM weights (siamese, reference model.py:349,414), and the
refinement stage consumes HBM-resident volumes (no host staging).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from atvsnet_tpu import numerics
from atvsnet_tpu.config import PipelineConfig
from atvsnet_tpu.geometry.homography import get_homographies, sweep_depths
from atvsnet_tpu.geometry.warp import (
    plane_sweep_warp,
    plane_sweep_warp_with_nearest,
    transform_depth,
    warp_by_depth,
)
from atvsnet_tpu.geometry.visual_hull import get_visual_hull
from atvsnet_tpu.geometry.depth_regression import prob2depth, prob2depth_upsample
from atvsnet_tpu.nn import layers as L
from atvsnet_tpu.nn.aam import (
    attention_aggregate,
    attention_aggregate_stacked,
    init_attention,
    init_output_conv,
    output_conv,
)
from atvsnet_tpu.nn.crm import crm, init_crm
from atvsnet_tpu.nn.fem import fem, fem_shallow, init_fem, init_fem_shallow
from atvsnet_tpu.nn.refine import init_refine_net, refine_net


def init_params(key, cfg: PipelineConfig) -> dict:
    """Full A-TVSNet parameter tree (names mirror the reference variable scopes)."""
    f = cfg.fem_base_filter
    shallow_f = cfg.shallow_base_filter
    crm_f = cfg.crm_base_filter
    photo_ch = 3 * shallow_f                 # photo cost + photo err + ref feature
    geo_ch = (shallow_f + 1) + 1 + 1         # geo volume (1+16) + geo err + ref depth
    return {
        "fem": init_fem(L.key_for(key, "fem"), f),
        "fem_shallow": init_fem_shallow(L.key_for(key, "fem_shallow"), shallow_f),
        "crm": init_crm(L.key_for(key, "crm"), 2 * f, crm_f, prob_output=True),
        "refine": init_refine_net(L.key_for(key, "refine"), photo_ch, geo_ch, cfg.refine_base_filter),
        "aam1_att": init_attention(L.key_for(key, "aam1"), "attention_aggregate", crm_f),
        "aam1_out": init_output_conv(L.key_for(key, "aam1_out"), "attention_prob_vol", crm_f),
        "aam2_att": init_attention(L.key_for(key, "aam2"), "attention_aggregate_refine", crm_f),
        "aam2_out": init_output_conv(L.key_for(key, "aam2_out"), "attention_prob_vol_refine", crm_f),
    }


def extract_features(params: dict, images: jnp.ndarray, cfg: PipelineConfig, shallow: bool = False) -> jnp.ndarray:
    """(B, N, H, W, 3) -> (B, N, H/4, W/4, F), FEM weights shared across views.

    vmap over the view axis keeps batch-norm statistics per-view, matching the
    reference's one-tower-per-image graphs (model.py:348-354).
    """
    net = fem_shallow if shallow else fem
    p = params["fem_shallow"] if shallow else params["fem"]
    x = images.astype(cfg.dtype)
    return jax.vmap(lambda img: net(p, img, eps=cfg.bn_eps), in_axes=1, out_axes=1)(x)


def build_cost_volume(
    ref_feature: jnp.ndarray,
    view_feature: jnp.ndarray,
    ref_cam: jnp.ndarray,
    view_cam: jnp.ndarray,
    cfg: PipelineConfig,
    depth_start: jnp.ndarray,
    depth_interval: jnp.ndarray,
    warp_ref: bool = False,
):
    """Concat(ref tiled-over-D, view warped per plane) -> (B, D, h, w, 2F).

    Reference model.py:157-200. Also returns the view homographies for reuse.
    """
    D = cfg.max_d
    homographies = get_homographies(
        ref_cam, view_cam, D, depth_start, depth_interval, cfg.inverse_depth
    )
    if warp_ref:
        ref_h = get_homographies(ref_cam, ref_cam, D, depth_start, depth_interval, cfg.inverse_depth)
        ref_vol = plane_sweep_warp(ref_feature, ref_h)
    else:
        ref_vol = jnp.broadcast_to(
            ref_feature[:, None], (ref_feature.shape[0], D) + ref_feature.shape[1:]
        )
    view_vol = plane_sweep_warp(view_feature, homographies)
    return jnp.concatenate([ref_vol, view_vol], axis=-1), homographies


class PairOutputs(NamedTuple):
    depth: jnp.ndarray            # (B, h, w, 1) soft-argmin depth of the ref->view sweep
    prob_volume: jnp.ndarray      # (B, D, h, w) regularized cost
    filtered_cost: jnp.ndarray    # (B, D, h, w, crm_f) filtered cost volume for AAM
    depth_view: Optional[jnp.ndarray]  # (B, h, w, 1) swapped-pair depth (siamese)


def tvsnet_base(
    params: dict,
    ref_feature: jnp.ndarray,
    view_feature: jnp.ndarray,
    ref_cam: jnp.ndarray,
    view_cam: jnp.ndarray,
    cfg: PipelineConfig,
    depth_start: jnp.ndarray,
    depth_interval: jnp.ndarray,
    siamese: bool = True,
) -> PairOutputs:
    """One view pair through cost volume + CRM (+ swapped direction when siamese).

    Reference TVSNet_base / TVSNet_base_siamese (model.py:380-417); CRM weights are
    shared between directions via reuse=tf.AUTO_REUSE there, literally here.
    """
    D = cfg.max_d

    def sweep(ref_f, view_f, ref_c, view_c):
        homographies = get_homographies(
            ref_c, view_c, D, depth_start, depth_interval, cfg.inverse_depth
        )
        return plane_sweep_warp(view_f, homographies)

    if siamese and cfg.pair_batch:
        # both directions through ONE set of CRM convs (weights are shared anyway);
        # BN statistics stay per-direction via bn_groups — exact same math as two
        # sequential passes, half the op count (the f=8 ops are latency-bound on TPU)
        B = ref_feature.shape[0]
        src = jnp.concatenate([view_feature, ref_feature], axis=0)
        dst = jnp.concatenate([ref_feature, view_feature], axis=0)
        cam_a = jnp.concatenate([ref_cam, view_cam], axis=0)
        cam_b = jnp.concatenate([view_cam, ref_cam], axis=0)
        ds2 = jnp.tile(depth_start, 2)
        di2 = jnp.tile(depth_interval, 2)
        homos = get_homographies(cam_a, cam_b, D, ds2, di2, cfg.inverse_depth)
        warped2 = plane_sweep_warp(src, homos)
        filtered2, prob2 = crm(params["crm"], (warped2, dst), eps=cfg.bn_eps, bn_groups=2)
        depth2 = prob2depth(prob2, D, ds2, di2, impl=cfg.softargmin_impl)
        return PairOutputs(depth2[:B], prob2[:B], filtered2[:B], depth2[B:])

    # structured cost volume: only the warped half is materialized; the D-constant
    # tiled-reference half enters the CRM input convs as 2D convs (layers.conv3d_mixed)
    warped = sweep(ref_feature, view_feature, ref_cam, view_cam)
    filtered_cost, prob = crm(params["crm"], (warped, ref_feature), eps=cfg.bn_eps)
    depth = prob2depth(prob, D, depth_start, depth_interval, impl=cfg.softargmin_impl)

    depth_view = None
    if siamese:
        warped_v = sweep(view_feature, ref_feature, view_cam, ref_cam)
        _, prob_view = crm(params["crm"], (warped_v, view_feature), eps=cfg.bn_eps)
        depth_view = prob2depth(prob_view, D, depth_start, depth_interval, impl=cfg.softargmin_impl)

    return PairOutputs(depth, prob, filtered_cost, depth_view)


def refinement(
    params: dict,
    depth_ref: jnp.ndarray,
    depth_view: jnp.ndarray,
    ref_cam: jnp.ndarray,
    view_cam: jnp.ndarray,
    shallow_ref: jnp.ndarray,
    shallow_view: jnp.ndarray,
    prob_vol: jnp.ndarray,
    cfg: PipelineConfig,
    depth_start: jnp.ndarray,
    depth_interval: jnp.ndarray,
    hull_view_cam: Optional[jnp.ndarray] = None,
    bn_groups: int = 1,
):
    """Geometry-aware refinement of one pair (reference model.py:227-339).

    depth_ref/depth_view: (B, h, w, 1) initial depths at cost-volume resolution;
    shallow_*: (B, h, w, 16) low-level features; prob_vol: (B, D, h, w).
    Returns (cost_residual (B, D, h, w, crm_f), prob_residual (B, D, h, w)).

    hull_view_cam: when set (cfg.reference_compat), the visual hull's view term uses
    THIS camera instead of the pair's own view_cam, reproducing the reference bug
    where get_visual_hull receives the FULL cams stack with view_num=2 and therefore
    always reads camera index 1 regardless of the pair's actual view index
    (model.py:321-324 + homography_warping.py:344-358). When None (default) the hull
    uses the pair's own cameras — geometrically correct — and its nearest warp is
    fused into the shared plane-sweep gather.
    """
    D = cfg.max_d
    inv = cfg.inverse_depth
    B, h, w, F = shallow_ref.shape

    depth_view_trans = transform_depth(depth_view, view_cam, ref_cam, inv)
    homographies = get_homographies(ref_cam, view_cam, D, depth_start, depth_interval, inv)

    # --- photometric + geometric + visual-hull sweeps fused into ONE gather: all
    # three warp the same sources by the same homographies (reference warps them
    # separately at model.py:276,294 and homography_warping.py:376) ---
    stacked_src = jnp.concatenate(
        [shallow_view, depth_view_trans.astype(shallow_view.dtype)], axis=-1
    )
    warped_all, warped_near, mask = plane_sweep_warp_with_nearest(
        stacked_src, homographies, nearest_slice=slice(F, F + 1)
    )
    warped_feat = warped_all[..., :F]
    warped_depth = warped_all[..., F:].astype(jnp.float32)
    mask_geo = mask
    if hull_view_cam is None:
        hull_depth = warped_near.astype(jnp.float32)  # nearest depth, for the hull
    else:
        # reference_compat: the hull's view depth is transformed + swept with the
        # (possibly wrong) hull camera, exactly as the reference graph builds it.
        dvt_hull = transform_depth(depth_view, hull_view_cam, ref_cam, inv)
        h_hull = get_homographies(ref_cam, hull_view_cam, D, depth_start, depth_interval, inv)
        hull_depth = plane_sweep_warp(
            dvt_hull.astype(jnp.float32), h_hull, method="nearest"
        )

    # photometric L1 cost volume over shallow features (model.py:270-280)
    cost_vol_photo = jnp.abs(warped_feat - shallow_ref[:, None]) * mask.astype(shallow_ref.dtype)

    # geometric L1 depth-consistency volume (model.py:285-300)
    sweep = sweep_depths(depth_start.astype(jnp.float32), depth_interval.astype(jnp.float32), D)
    sweep = sweep[:, :, None, None, None]                      # (B, D, 1, 1, 1)
    denom = (depth_interval.astype(jnp.float32) * D)[:, None, None, None, None]
    geo_ref = jnp.abs(depth_ref[:, None] - sweep) / denom      # (B, D, h, w, 1)
    # the reference broadcasts this 1-channel error into F masked channels
    # (model.py:295-296); structurally those F channels are identical, so it stays
    # 1-channel here and the refine net collapses its kernel over them (refine_net)
    geo_view = jnp.abs(warped_depth - sweep) / denom * mask_geo.astype(jnp.float32)

    # --- per-pixel photo/geo error at the initial depth (model.py:306-316) ---
    # D-constant terms stay 2D; the refine net consumes them via conv3d_mixed
    warped_f, mask_p = warp_by_depth(shallow_view, ref_cam, view_cam, depth_ref, inv, output_mask=True)
    photo_err = jnp.abs(warped_f - shallow_ref) * mask_p.astype(shallow_ref.dtype)  # (B, h, w, F)

    warped_d, mask_g = warp_by_depth(
        depth_view_trans, ref_cam, view_cam, depth_ref, inv, method="nearest", output_mask=True
    )
    geo_err = jnp.abs(warped_d - depth_ref) * mask_g.astype(jnp.float32)  # (B, h, w, 1)

    # --- visual hull over the pair's initial depths (model.py:321-324), computed
    # inline from the fused nearest warp (same math as geometry.get_visual_hull for
    # the 2-view case; the view term reuses hull_depth from the shared gather) ---
    ref_d = depth_ref[..., 0][:, None].astype(jnp.float32)   # (B, 1, h, w)
    sweep_hw = sweep[..., 0]                                 # (B, D, 1, 1)

    def free_space(d_bdhw):
        valid_d = d_bdhw > 0
        cmp = d_bdhw > sweep_hw if inv else sweep_hw > d_bdhw
        return jnp.where(valid_d & cmp, 1.0, 0.0)

    vis_hull = (free_space(jnp.broadcast_to(ref_d, (B, D, h, w)))
                + free_space(hull_depth[..., 0])) / 2.0
    vis_hull = vis_hull[..., None]

    # --- refinement net (model.py:329-339), structured groups ---
    dt = cfg.dtype
    photo_group = (
        cost_vol_photo.astype(dt),
        jnp.concatenate([photo_err.astype(dt), shallow_ref.astype(dt)], axis=-1),
    )
    geo_group = (
        jnp.concatenate([geo_ref.astype(dt), geo_view.astype(dt)], axis=-1),
        jnp.concatenate([geo_err.astype(dt), depth_ref.astype(dt)], axis=-1),
        F,
    )
    return refine_net(
        params["refine"],
        photo_group,
        geo_group,
        prob_vol[..., None].astype(dt),
        vis_hull.astype(dt),
        eps=cfg.bn_eps,
        bn_groups=bn_groups,
    )


def tvsnet_refine(
    params: dict,
    depth_ref: jnp.ndarray,
    depth_view: jnp.ndarray,
    prob_vol: jnp.ndarray,
    filtered_cost: jnp.ndarray,
    ref_cam: jnp.ndarray,
    view_cam: jnp.ndarray,
    shallow_ref: jnp.ndarray,
    shallow_view: jnp.ndarray,
    cfg: PipelineConfig,
    depth_start: jnp.ndarray,
    depth_interval: jnp.ndarray,
    hull_view_cam: Optional[jnp.ndarray] = None,
):
    """Residual refinement of (prob, cost) volumes — reference model.py:428-441."""
    cost_residual, prob_residual = refinement(
        params, depth_ref, depth_view, ref_cam, view_cam,
        shallow_ref, shallow_view, prob_vol, cfg, depth_start, depth_interval,
        hull_view_cam=hull_view_cam,
    )
    refined_prob = prob_vol + prob_residual.astype(prob_vol.dtype)
    refined_cost = filtered_cost + cost_residual.astype(filtered_cost.dtype)
    return refined_prob, refined_cost


@numerics.install_scope
def two_view_forward(params: dict, images: jnp.ndarray, cams: jnp.ndarray, cfg: PipelineConfig):
    """Monolithic two-view TVSNet (reference model.py:346-377 + example.py:239-240).

    images: (B, 2, H, W, 3); cams: (B, 2, 2, 4, 4).
    Returns dict with refined prob volume and native/4x-upsampled depth maps.
    """
    depth_start = cams[:, 0, 1, 3, 0]
    depth_interval = cams[:, 0, 1, 3, 1]
    D = cfg.max_d

    features = extract_features(params, images, cfg)
    base = tvsnet_base(
        params, features[:, 0], features[:, 1], cams[:, 0], cams[:, 1],
        cfg, depth_start, depth_interval, siamese=True,
    )

    shallow = extract_features(params, images, cfg, shallow=True)
    _, prob_residual = refinement(
        params, base.depth, base.depth_view, cams[:, 0], cams[:, 1],
        shallow[:, 0], shallow[:, 1], base.prob_volume, cfg, depth_start, depth_interval,
    )
    refined_prob_vol = base.prob_volume + prob_residual.astype(base.prob_volume.dtype)
    depth, depth_up = prob2depth_upsample(
        refined_prob_vol, D, depth_start, depth_interval, impl=cfg.softargmin_impl
    )
    return {
        "refined_prob_vol": refined_prob_vol,
        "depth": depth,
        "depth_up": depth_up,
        "depth_initial": base.depth,
    }


def aam_aggregate(params: dict, cost_volumes: jnp.ndarray, stage: int) -> jnp.ndarray:
    """AAM over per-pair cost volumes: (B, D, h, w, C, P) -> (B, D, h, w, C).

    stage 1 = initial (AAM1), stage 2 = refine (AAM2); separate weight banks
    (reference model.py:445-468).
    """
    att = params["aam1_att" if stage == 1 else "aam2_att"]
    return attention_aggregate(att, cost_volumes)


def aam_aggregate_stacked(params: dict, cost_volumes: jnp.ndarray, stage: int) -> jnp.ndarray:
    """AAM over the view-leading (P, B, D, h, w, C) stack — transpose-free variant
    used by the scan pipeline (nn.aam.attention_aggregate_stacked)."""
    att = params["aam1_att" if stage == 1 else "aam2_att"]
    return attention_aggregate_stacked(att, cost_volumes)


def aam_output_conv(params: dict, agg_cost: jnp.ndarray, stage: int) -> jnp.ndarray:
    if stage == 1:
        return output_conv(params["aam1_out"], "attention_prob_vol", agg_cost)
    return output_conv(params["aam2_out"], "attention_prob_vol_refine", agg_cost)


def cost_volume_aggregation(
    params: dict, cost_volumes: jnp.ndarray, stage: int = 1, keepchannel: bool = False
):
    """Reference model.py:445-468 wrapper: keepchannel returns the aggregated
    (B, D, h, w, C) volume; otherwise appends the 1-channel output conv and squeezes."""
    agg = aam_aggregate(params, cost_volumes, stage)
    if keepchannel:
        return agg
    return aam_output_conv(params, agg, stage)
