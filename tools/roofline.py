"""Publish the e2e forward's HBM-traffic/FLOP budget and the implied roofline.

Compiles the bench workload and reads XLA's own cost model for the optimized
program (`compiled.cost_analysis()`): total FLOPs and total HBM bytes accessed.
From those and the v5e's peak numbers it prints the compute-bound and
bandwidth-bound time floors and compares them with the measured steady-state
forward, i.e. how far the pipeline sits from speed-of-light and which wall it
leans on. VERDICT round-2 item 6 asked for exactly this next to the bench number
(the 226GB/forward figure previously cited in nn/layers.py predated the round-2
conv rerouting).

Usage: python tools/roofline.py [--batch 2] [--dtype bfloat16] [--measured 0.796]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU v5e per-chip peaks (public: 197 bf16 TFLOP/s, 819 GB/s HBM)
PEAK_BF16_FLOPS = 197e12
PEAK_FP32_FLOPS = PEAK_BF16_FLOPS / 4  # fp32 HIGHEST = 6 bf16 passes; /4 is the 1-pass fp32 rate
PEAK_HBM_BPS = 819e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--view-num", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument(
        "--measured", type=float, default=None,
        help="measured steady-state seconds/forward (e.g. batch/maps_per_s from bench.py); "
        "when omitted only the floors are printed",
    )
    ap.add_argument(
        "--act-quant", default=None, choices=["none", "int8", "int8s", "int8mxu"],
        help="compare HBM bytes with int8 volume-link storage "
        "(nn/layers._maybe_quant_act) — the decisive check that the byte cut "
        "survives XLA fusion rather than materializing dequantized copies",
    )
    ap.add_argument(
        "--warp-quant", default=None, choices=["none", "int8"],
        help="compare HBM bytes with int8 warped-volume storage "
        "(geometry/warp._maybe_quant_warp), independent of --act-quant",
    )
    args = ap.parse_args()

    from atvsnet_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from atvsnet_tpu.config import PipelineConfig
    from atvsnet_tpu.models.atvsnet import multi_view_forward
    from atvsnet_tpu.models.tvsnet import init_params

    cfg = PipelineConfig(
        view_num=args.view_num, max_d=bench.D, max_h=bench.H, max_w=bench.W,
        compute_dtype=args.dtype,
        act_quant=args.act_quant or "none", warp_quant=args.warp_quant or "none",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    images, cams = bench._inputs(args.view_num)
    if args.batch > 1:
        images = np.concatenate([images] * args.batch, axis=0)
        cams = np.concatenate([cams] * args.batch, axis=0)

    def cost(fn, *a):
        ca = jax.jit(fn).lower(*a).compile().cost_analysis()
        if isinstance(ca, list):  # older jax returns one dict per device program
            ca = ca[0]
        return ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)

    def scalarize(fn):
        return lambda *a: jax.tree_util.tree_reduce(
            lambda acc, leaf: acc + jnp.sum(leaf.astype(jnp.float32)),
            [o for o in jax.tree_util.tree_leaves(fn(*a)) if o is not None],
            jnp.float32(0),
        )

    flops, byt = cost(
        lambda p, i, c: jnp.sum(
            multi_view_forward(p, jnp.asarray(i), jnp.asarray(c), cfg)["depth_up"].astype(jnp.float32)
        ),
        params, images, cams,
    )

    # XLA's cost analysis counts while-body ops ONCE; the stage-1 and stage-3 pair
    # scans run their bodies P = view_num - 1 times. Compile each scan body
    # standalone and charge the remaining P-1 trips (fusion in the standalone
    # program differs slightly from the inlined body — good to a few %).
    from atvsnet_tpu.models.tvsnet import refinement, tvsnet_base

    imgs_j, cams_j = jnp.asarray(images), jnp.asarray(cams)
    from atvsnet_tpu.models.tvsnet import extract_features

    feats = jax.jit(lambda p, i: extract_features(p, i, cfg))(params, imgs_j)
    shallow = jax.jit(lambda p, i: extract_features(p, i, cfg, shallow=True))(params, imgs_j)
    ds, di = cams_j[:, 0, 1, 3, 0], cams_j[:, 0, 1, 3, 1]
    f0, f1, c0, c1 = feats[:, 0], feats[:, 1], cams_j[:, 0], cams_j[:, 1]

    base_flops, base_bytes = cost(
        scalarize(lambda p: tvsnet_base(p, f0, f1, c0, c1, cfg, ds, di, True)), params
    )
    base = jax.jit(lambda p: tvsnet_base(p, f0, f1, c0, c1, cfg, ds, di, True))(params)
    ref_flops, ref_bytes = cost(
        scalarize(
            lambda p: refinement(
                p, base.depth, base.depth_view, c0, c1,
                shallow[:, 0], shallow[:, 1], base.prob_volume, cfg, ds, di,
            )
        ),
        params,
    )

    P = args.view_num - 1
    tot_flops = flops + (P - 1) * (base_flops + ref_flops)
    tot_bytes = byt + (P - 1) * (base_bytes + ref_bytes)

    print(f"workload: {args.view_num}-view {bench.H}x{bench.W} D={bench.D} "
          f"batch={args.batch} {args.dtype}")
    print("XLA cost analysis:")
    print(f"  whole program, scan bodies counted once : {flops / 1e12:.2f} TF, {byt / 1e9:.1f} GB")
    print(f"  stage-1 pair body (tvsnet_base)         : {base_flops / 1e12:.2f} TF, {base_bytes / 1e9:.1f} GB")
    print(f"  stage-3 pair body (refinement)          : {ref_flops / 1e12:.2f} TF, {ref_bytes / 1e9:.1f} GB")
    print(f"  trip-corrected total (P={P})             : {tot_flops / 1e12:.2f} TF, {tot_bytes / 1e9:.1f} GB")
    peak_flops = PEAK_BF16_FLOPS if args.dtype == "bfloat16" else PEAK_FP32_FLOPS
    t_flops = tot_flops / peak_flops
    t_hbm = tot_bytes / PEAK_HBM_BPS
    print(f"  time floors    : compute {t_flops * 1e3:.0f} ms | HBM {t_hbm * 1e3:.0f} ms "
          f"(v5e {peak_flops / 1e12:.0f} TF/s, {PEAK_HBM_BPS / 1e9:.0f} GB/s)")
    if args.measured:
        bound = "HBM" if t_hbm > t_flops else "compute"
        print(f"  measured       : {args.measured * 1e3:.0f} ms/forward -> "
              f"{max(t_flops, t_hbm) / args.measured * 100:.0f}% of the {bound}-bound floor; "
              f"achieved {tot_bytes / args.measured / 1e9:.0f} GB/s effective HBM bandwidth")


if __name__ == "__main__":
    main()
