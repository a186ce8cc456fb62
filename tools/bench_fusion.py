"""Fusion-stage benchmark at ETH3D scene scale (VERDICT r3 item 3).

The reference instruments its fusion kernel with CUDA events
(fusibile/fusibile.cu:421-438) but commits no numbers; this measures our
replacement (fusion/consistency.fuse_depth_maps) end to end — device consistency
passes + host compaction — on a fabricated geometrically-consistent scene at the
ETH3D eval shape (480x896, reference eval_pointcloud.py:38-58), sweeping the view
count. Total work scales O(V^2 * H * W) (every camera acts as reference against
every other view, like the host loop at fusibile.cu:425-430).

Scene: fronto-parallel plane at depth Z0 seen by a V-camera translation grid with
identity rotations — every pixel's back-projection lands exactly on the plane in
every other view, so the relative-disparity test passes wherever the projection is
in bounds (points genuinely emit, exercising compaction at realistic densities).
A fraction of pixels is zeroed to mimic the probability filter.

Usage: python tools/bench_fusion.py [--views 8 16 24 40] [--height 480] [--width 896]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_consistent_scene(V: int, H: int, W: int, z0: float = 10.0, drop: float = 0.2):
    """V cameras on a translation grid, all seeing the plane z = z0."""
    rng = np.random.RandomState(0)
    f = 0.8 * W
    K = np.array([[f, 0.0, W / 2.0], [0.0, f, H / 2.0], [0.0, 0.0, 1.0]], np.float64)
    cams = np.zeros((V, 2, 4, 4), np.float32)
    side = int(np.ceil(np.sqrt(V)))
    for v in range(V):
        # camera centers on a grid, looking down +z; extrinsic t = -R C = -C
        cx = 0.08 * (v % side - side / 2.0)
        cy = 0.08 * (v // side - side / 2.0)
        cams[v, 0] = np.eye(4)
        cams[v, 0, 0, 3] = -cx
        cams[v, 0, 1, 3] = -cy
        cams[v, 1, :3, :3] = K
    depths = np.full((V, H, W), z0, np.float32)
    # simulated probability filter: a random fraction carries no depth
    mask = rng.rand(V, H, W) < drop
    depths[mask] = 0.0
    images = rng.randint(0, 255, size=(V, H, W, 3))
    return depths, images, cams


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, nargs="+", default=[8, 16, 24, 40])
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=896)
    ap.add_argument("--drop", type=float, default=0.2)
    ap.add_argument("--repeats", type=int, default=2,
                    help="timed full-scene fusions after the compile warm-up run")
    ap.add_argument("--ref-chunk", type=int, default=4,
                    help="reference cameras fused per device program "
                         "(fusion/consistency.fuse_depth_maps ref_chunk)")
    ap.add_argument("--image-dtype", default="uint8", choices=["uint8", "float32"],
                    help="image array dtype handed to fuse_depth_maps. uint8 is "
                         "the real driver path (decoded jpgs, 1/4 the H2D bytes); "
                         "the round-4 committed table used float32 — pass it for "
                         "apples-to-apples against FUSION_BENCH_r04.json")
    ap.add_argument("--compact", default="auto", choices=["auto", "always", "never"],
                    help="occupancy compaction mode (fuse_depth_maps compact=)")
    ap.add_argument("--occupancy-sweep", type=float, nargs="*", default=None,
                    metavar="DROP",
                    help="run the VERDICT-r5 occupancy sweep instead of the V "
                         "sweep: at V=--views[0], for each DROP fraction measure "
                         "the dense (compact=never) and compacted (compact=auto) "
                         "paths and assert identical point clouds. E.g. "
                         "--occupancy-sweep 0.2 0.5 0.8")
    ap.add_argument("--dense-folder", default=None,
                    help="measure a REAL eval output tree (the eval_pointcloud "
                         "driver's --savepath scene dir) instead of the synthetic "
                         "scene: runs the probability filter at --prob-threshold, "
                         "then times dense vs compacted fusion on the actual "
                         "depth/confidence statistics (VERDICT r4 item 7)")
    ap.add_argument("--prob-threshold", type=float, default=0.8,
                    help="with --dense-folder: probability-filter tau "
                         "(reference reproduce_pc.sh default 0.8)")
    ap.add_argument("--depth-subdir", default="depths_atvsnet",
                    help="with --dense-folder: subdir holding the per-ref outputs")
    args = ap.parse_args()

    from atvsnet_tpu.fusion.consistency import fuse_depth_maps

    if args.dense_folder is not None:
        from atvsnet_tpu.fusion.fuse import load_scene, probability_filter

        depth_folder = os.path.join(args.dense_folder, args.depth_subdir)
        probability_filter(depth_folder, args.prob_threshold)
        depths, images, cams, names = load_scene(depth_folder, filtered=True)
        if args.image_dtype == "uint8":
            images = images.astype(np.uint8)  # cv2 already uint8; explicit for clarity
        else:
            images = images.astype(np.float32)
        valid_frac = float((depths > 0).mean())
        V, H, W = depths.shape

        def timed(mode):
            pts, cols = fuse_depth_maps(
                depths, images, cams, ref_chunk=args.ref_chunk, compact=mode)
            t0 = time.perf_counter()
            for _ in range(args.repeats):
                pts, cols = fuse_depth_maps(
                    depths, images, cams, ref_chunk=args.ref_chunk, compact=mode)
            return (time.perf_counter() - t0) / args.repeats, pts, cols

        t_dense, p_dense, c_dense = timed("never")
        t_sparse, p_sparse, c_sparse = timed("auto")
        np.testing.assert_allclose(p_sparse, p_dense, atol=1e-4)
        np.testing.assert_array_equal(c_sparse, c_dense)
        print(json.dumps({
            "workload": f"real eval tree {args.dense_folder} "
                        f"({V} views {H}x{W}, tau={args.prob_threshold})",
            "views": V, "height": H, "width": W,
            "valid_frac": round(valid_frac, 4),
            "dense_s": round(t_dense, 3), "compact_s": round(t_sparse, 3),
            "speedup": round(t_dense / t_sparse, 2),
            "points": int(p_dense.shape[0]),
            "identical_clouds": True,
        }))
        return

    if args.occupancy_sweep is not None:
        V = args.views[0]
        rows = []
        for drop in args.occupancy_sweep:
            depths, images, cams = make_consistent_scene(
                V, args.height, args.width, drop=drop)
            images = images.astype(args.image_dtype)
            valid_frac = float((depths > 0).mean())

            def timed(mode):
                pts, cols = fuse_depth_maps(
                    depths, images, cams, ref_chunk=args.ref_chunk, compact=mode)
                t0 = time.perf_counter()
                for _ in range(args.repeats):
                    pts, cols = fuse_depth_maps(
                        depths, images, cams, ref_chunk=args.ref_chunk, compact=mode)
                return (time.perf_counter() - t0) / args.repeats, pts, cols

            t_dense, p_dense, c_dense = timed("never")
            t_sparse, p_sparse, c_sparse = timed("auto")
            assert p_dense.shape == p_sparse.shape, (p_dense.shape, p_sparse.shape)
            np.testing.assert_allclose(p_sparse, p_dense, atol=1e-4)
            np.testing.assert_array_equal(c_sparse, c_dense)
            row = {
                "views": V, "drop": drop, "valid_frac": round(valid_frac, 4),
                "dense_s": round(t_dense, 3), "compact_s": round(t_sparse, 3),
                "speedup": round(t_dense / t_sparse, 2),
                "points": int(p_dense.shape[0]),
                "identical_clouds": True,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
        print(json.dumps({
            "workload": f"occupancy sweep V={V} {args.height}x{args.width}",
            "results": rows,
        }))
        return

    results = []
    for V in args.views:
        depths, images, cams = make_consistent_scene(V, args.height, args.width, drop=args.drop)
        images = images.astype(args.image_dtype)
        # warm-up: compiles the chunk program (one compile — shapes are constant)
        pts, _ = fuse_depth_maps(depths, images, cams, ref_chunk=args.ref_chunk,
                                 compact=args.compact)
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            pts, cols = fuse_depth_maps(depths, images, cams, ref_chunk=args.ref_chunk,
                                        compact=args.compact)
        dt = (time.perf_counter() - t0) / args.repeats
        mpix_checks = V * (V - 1) * args.height * args.width / 1e6
        row = {
            "views": V,
            "ref_chunk": args.ref_chunk,
            "compact": args.compact,
            "scene_fusion_s": round(dt, 3),
            "s_per_ref": round(dt / V, 4),
            "points": int(pts.shape[0]),
            "Mpix_view_checks": round(mpix_checks, 1),
            "Mchecks_per_s": round(mpix_checks / dt, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"workload": f"{args.height}x{args.width}", "results": results}))


if __name__ == "__main__":
    main()
