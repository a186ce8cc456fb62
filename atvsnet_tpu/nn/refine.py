"""CostVolRefineNet — geometry-aware cost volume refinement 3D U-Net.

Reference cnn_wrapper/atvsnet.py:295-336: four input groups (photometric, geometric,
probability volume, visual hull) each 3x3x3-conv_bn'd to 8 channels, concatenated, one
U-Net block with skip additions; outputs the 8-channel cost residual
('global_refine_3dconv6_1') and the 1-channel prob residual ('global_refined_cost_vol').
"""

from __future__ import annotations

import jax.numpy as jnp

from atvsnet_tpu.nn import layers as L

_P = "global_refine"


def init_refine_net(
    key,
    photo_ch: int,
    geo_ch: int,
    base_filter: int = 8,
) -> dict:
    f = base_filter
    p = {
        f"{_P}_photo_3dconv": L.init_conv(key, f"{_P}_photo_3dconv", 3, photo_ch, f, nd=3),
        f"{_P}_geo_3dconv": L.init_conv(key, f"{_P}_geo_3dconv", 3, geo_ch, f, nd=3),
        f"{_P}_prob_3dconv": L.init_conv(key, f"{_P}_prob_3dconv", 3, 1, f, nd=3),
        f"{_P}_vishull_3dconv": L.init_conv(key, f"{_P}_vishull_3dconv", 3, 1, f, nd=3),
        f"{_P}_3dconv1_0": L.init_conv(key, f"{_P}_3dconv1_0", 3, 4 * f, 2 * f, nd=3),
        f"{_P}_3dconv2_0": L.init_conv(key, f"{_P}_3dconv2_0", 3, 2 * f, 4 * f, nd=3),
        f"{_P}_3dconv3_0": L.init_conv(key, f"{_P}_3dconv3_0", 3, 4 * f, 8 * f, nd=3),
        f"{_P}_3dconv0_1": L.init_conv(key, f"{_P}_3dconv0_1", 3, 4 * f, f, nd=3),
        f"{_P}_3dconv1_1": L.init_conv(key, f"{_P}_3dconv1_1", 3, 2 * f, 2 * f, nd=3),
        f"{_P}_3dconv2_1": L.init_conv(key, f"{_P}_3dconv2_1", 3, 4 * f, 4 * f, nd=3),
        f"{_P}_3dconv3_1": L.init_conv(key, f"{_P}_3dconv3_1", 3, 8 * f, 8 * f, nd=3),
        f"{_P}_3dconv4_0": L.init_deconv(key, f"{_P}_3dconv4_0", 3, 8 * f, 4 * f, nd=3),
        f"{_P}_3dconv5_0": L.init_deconv(key, f"{_P}_3dconv5_0", 3, 4 * f, 2 * f, nd=3),
        f"{_P}_3dconv6_0": L.init_deconv(key, f"{_P}_3dconv6_0", 3, 2 * f, f, nd=3),
        f"{_P}d_cost_vol": L.init_conv(key, f"{_P}d_cost_vol", 3, f, 1, nd=3),
    }
    return p


def refine_net(
    params: dict,
    photo_group,
    geo_group,
    prob_vol: jnp.ndarray,
    vis_hull: jnp.ndarray,
    eps: float = 1e-3,
    bn_groups: int = 1,
):
    """All inputs (B, D, h, w, *) -> (cost_residual (B,D,h,w,f), prob_residual (B,D,h,w)).

    Structured (broadcast-free) inputs, exact equivalents of the reference concats at
    model.py:329-337:
      photo_group as (varying (B,D,h,w,F), const2d (B,h,w,2F)) — the per-pixel photo
        error and the tiled reference feature are D-constant (model.py:311,329);
      geo_group as (varying (B,D,h,w,2), const2d (B,h,w,2), F) — the geometric view
        term is one channel broadcast to F (model.py:295-296), so the kernel collapses
        over those F in-channels; geo error and the reference depth are D-constant.
    """

    # qin: the U-Net trunk consumes the concat/sums of the four entry links (all
    # stored activation-lattice relu BN outputs) — int8mxu may run those convs on
    # int8 operands; the four ENTRY convs see raw groups (photo error, geometry,
    # probability, hull — unknown/non-unit ranges) and stay on the float path.
    def cbn(name, x, stride=1, qin=True):
        return L.conv_bn(
            params[f"{_P}{name}"], x, stride=stride, eps=eps, groups=bn_groups, qin=qin
        )

    def dbn(name, x):
        return L.deconv_bn(params[f"{_P}{name}"], x, stride=2, eps=eps, groups=bn_groups)

    if isinstance(photo_group, tuple):
        vary, const2d = photo_group
        photo = L.conv3d_mixed_bn(
            params[f"{_P}_photo_3dconv"], vary, const2d, stride=1, eps=eps, groups=bn_groups
        )
    else:
        photo = cbn("_photo_3dconv", photo_group, qin=False)

    if isinstance(geo_group, tuple):
        vary, const2d, F = geo_group
        w = params[f"{_P}_geo_3dconv"]["w"]  # in-channels [geo_ref(1), geo_view(F), geo_err(1), ref_depth(1)]
        w_eff = jnp.concatenate(
            [
                w[..., 0:1, :],
                jnp.sum(w[..., 1 : 1 + F, :], axis=-2, keepdims=True),
                w[..., 1 + F :, :],
            ],
            axis=-2,
        )
        y = L.conv3d_mixed(w_eff, vary, const2d, stride=1)
        # same BN+relu volume-link class as the other entries: honor PipelineConfig.act_quant
        geo = L._maybe_quant_act(
            jnp.maximum(L.batch_stat_norm(y, eps=eps, groups=bn_groups), 0), nonneg=True
        )
    else:
        geo = cbn("_geo_3dconv", geo_group, qin=False)

    x = jnp.concatenate(
        [
            photo,
            geo,
            cbn("_prob_3dconv", prob_vol, qin=False),
            cbn("_vishull_3dconv", vis_hull, qin=False),
        ],
        axis=-1,
    )
    c1_0 = cbn("_3dconv1_0", x, 2)
    c2_0 = cbn("_3dconv2_0", c1_0, 2)
    c3_0 = cbn("_3dconv3_0", c2_0, 2)
    c0_1 = cbn("_3dconv0_1", x)
    c1_1 = cbn("_3dconv1_1", c1_0)
    c2_1 = cbn("_3dconv2_1", c2_0)
    c3_1 = cbn("_3dconv3_1", c3_0)
    c4_0 = dbn("_3dconv4_0", c3_1)
    c5_0 = dbn("_3dconv5_0", c4_0 + c2_1)
    c6_0 = dbn("_3dconv6_0", c5_0 + c1_1)
    c6_1 = c6_0 + c0_1  # cost residual (B, D, h, w, f)
    prob_residual = L.conv(c6_1, params[f"{_P}d_cost_vol"]["w"], qin=True)[..., 0]
    return c6_1, prob_residual
