"""Cost regularization module (CRM): stacked 3D U-Net over the plane-sweep volume.

StackedUNet / StackedUNet_prob (reference cnn_wrapper/atvsnet.py:5-192): three 3D U-Net
blocks over (B, D, h, w, C) with dense inter-block skip additions; the _prob variant
appends a 3x3x3 conv to 1 channel. This is the FLOPs hot spot of the whole model
(SURVEY.md §3.5) — all convs are rank-5 NDHWC and compile straight onto the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp

from atvsnet_tpu.nn import layers as L


def _unet_block_names(b: int) -> list[tuple[str, str, int, int]]:
    """(name, kind, out_ch_multiple, stride) in execution order for block index b."""
    return [
        (f"conv_b{b}_1_0", "conv", 2, 2),
        (f"conv_b{b}_2_0", "conv", 4, 2),
        (f"conv_b{b}_3_0", "conv", 8, 2),
        (f"conv_b{b}_0_1", "conv", 1, 1),
        (f"conv_b{b}_1_1", "conv", 2, 1),
        (f"conv_b{b}_2_1", "conv", 4, 1),
        (f"conv_b{b}_3_1", "conv", 8, 1),
        (f"conv_b{b}_4_0", "deconv", 4, 2),
        (f"conv_b{b}_5_0", "deconv", 2, 2),
        (f"conv_b{b}_6_0", "deconv", 1, 2),
    ]


def init_crm(key, in_channels: int, base_filter: int = 8, prob_output: bool = True) -> dict:
    f = base_filter
    p = {}
    for b in range(3):
        cin0 = in_channels if b == 0 else f  # block input channels
        for name, kind, mult, _stride in _unet_block_names(b):
            cout = f * mult
            if kind == "conv":
                # input channels: encoder convs chain; X_1 refinement convs keep width
                if name.endswith("_1_0"):
                    cin = cin0
                elif name.endswith("_2_0"):
                    cin = f * 2
                elif name.endswith("_3_0"):
                    cin = f * 4
                elif name.endswith("_0_1"):
                    cin = cin0
                else:  # _1_1 / _2_1 / _3_1 keep channel count
                    cin = cout
                p[name] = L.init_conv(key, name, 3, cin, cout, nd=3)
            else:
                cin = f * 8 if name.endswith("_4_0") else cout * 2
                p[name] = L.init_deconv(key, name, 3, cin, cout, nd=3)
    if prob_output:
        p["conv_b2_6_2"] = L.init_conv(key, "conv_b2_6_2", 3, f, 1, nd=3)
    return p


def crm(params: dict, cost_volume, eps: float = 1e-3, bn_groups: int = 1):
    """(B, D, h, w, C) -> (filtered_cost (B,D,h,w,f)[, prob (B,D,h,w)]).

    Returns the 'conv_b2_6_1' activation (the 8-channel filtered cost volume fed to
    attention aggregation, reference model.py:218) and, when the net has the prob head,
    the squeezed 1-channel regularized cost ('conv_b2_6_2', atvsnet.py:192).

    `cost_volume` may be a `(warped_volume, ref_feature_2d)` tuple: the reference
    builds cost volumes as concat(tile_D(ref_feature), warped) (model.py:186,195); the
    tiled half is D-constant, so its contribution to the two input convs is computed as
    2D convs (layers.conv3d_mixed) instead of materializing a (B, D, h, w, 2F) volume.

    bn_groups > 1: the batch axis carries that many independent weight-shared sweeps
    (pair/direction batching); BN statistics stay per-sweep (layers.batch_stat_norm).
    """

    # qin: every trunk conv input is a stored activation-lattice link or a sum of
    # 2-3 such links (the dense skips are adds of relu BN outputs), so the int8mxu
    # mode may run them with int8 operands; only the block-0 ENTRY convs see the
    # raw cost volume (unknown range) and stay on the float path.
    def cbn(name, x, stride=1, relu=True, qin=True):
        return L.conv_bn(
            params[name], x, stride=stride, eps=eps, relu=relu, groups=bn_groups, qin=qin
        )

    def dbn(name, x):
        return L.deconv_bn(params[name], x, stride=2, eps=eps, groups=bn_groups)

    # --- block 0 ---
    if isinstance(cost_volume, tuple):
        warped, ref2d = cost_volume
        # kernel in-channel order is [ref_tile, warped] (reference concat order)
        Cc = ref2d.shape[-1]

        def mixed(name, stride):
            w = params[name]["w"]
            reordered = jnp.concatenate([w[..., Cc:, :], w[..., :Cc, :]], axis=-2)
            y = L.conv3d_mixed(reordered, warped, ref2d, stride=stride)
            y = L.batch_stat_norm(y, eps=eps, groups=bn_groups)
            # same BN+relu volume link as cbn(): honor PipelineConfig.act_quant
            return L._maybe_quant_act(jnp.maximum(y, 0), nonneg=True)

        b0_1_0 = mixed("conv_b0_1_0", 2)
        b0_0_1 = mixed("conv_b0_0_1", 1)
    else:
        b0_1_0 = cbn("conv_b0_1_0", cost_volume, 2, qin=False)
        b0_0_1 = cbn("conv_b0_0_1", cost_volume, qin=False)
    b0_2_0 = cbn("conv_b0_2_0", b0_1_0, 2)
    b0_3_0 = cbn("conv_b0_3_0", b0_2_0, 2)
    b0_1_1 = cbn("conv_b0_1_1", b0_1_0)
    b0_2_1 = cbn("conv_b0_2_1", b0_2_0)
    b0_3_1 = cbn("conv_b0_3_1", b0_3_0)
    b0_4_0 = dbn("conv_b0_4_0", b0_3_1)
    b0_5_0 = dbn("conv_b0_5_0", b0_4_0 + b0_2_1)
    b0_6_0 = dbn("conv_b0_6_0", b0_5_0 + b0_1_1)

    # --- block 1 (dense skips from block 0) ---
    b1_0_0 = b0_6_0 + b0_0_1
    b1_1_0 = cbn("conv_b1_1_0", b1_0_0, 2)
    b1_2_0 = cbn("conv_b1_2_0", b1_1_0, 2)
    b1_3_0 = cbn("conv_b1_3_0", b1_2_0, 2)
    b1_0_1 = cbn("conv_b1_0_1", b1_0_0)
    b1_1_1 = cbn("conv_b1_1_1", b1_1_0 + b0_5_0)
    b1_2_1 = cbn("conv_b1_2_1", b1_2_0 + b0_4_0)
    b1_3_1 = cbn("conv_b1_3_1", b1_3_0)
    b1_4_0 = dbn("conv_b1_4_0", b1_3_1)
    b1_5_0 = dbn("conv_b1_5_0", b1_4_0 + b1_2_1 + b0_2_1)
    b1_6_0 = dbn("conv_b1_6_0", b1_5_0 + b1_1_1 + b0_1_1)

    # --- block 2 ---
    b2_0_0 = b1_6_0 + b1_0_1
    b2_1_0 = cbn("conv_b2_1_0", b2_0_0, 2)
    b2_2_0 = cbn("conv_b2_2_0", b2_1_0, 2)
    b2_3_0 = cbn("conv_b2_3_0", b2_2_0, 2)
    b2_0_1 = cbn("conv_b2_0_1", b2_0_0)
    b2_1_1 = cbn("conv_b2_1_1", b2_1_0 + b1_5_0)
    b2_2_1 = cbn("conv_b2_2_1", b2_2_0 + b1_4_0)
    b2_3_1 = cbn("conv_b2_3_1", b2_3_0)
    b2_4_0 = dbn("conv_b2_4_0", b2_3_1)
    b2_5_0 = dbn("conv_b2_5_0", b2_4_0 + b2_2_1 + b0_2_1)
    b2_6_0 = dbn("conv_b2_6_0", b2_5_0 + b2_1_1 + b0_1_1)
    b2_6_1 = b2_6_0 + b2_0_1  # filtered cost volume, (B, D, h, w, f)

    if "conv_b2_6_2" not in params:
        return b2_6_1, None
    prob = L.conv(b2_6_1, params["conv_b2_6_2"]["w"], qin=True)  # no relu, no bias
    return b2_6_1, prob[..., 0]
