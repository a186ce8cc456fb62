"""Phase-split profiler for the consistency-fusion stage.

Breaks one fuse_depth_maps-equivalent scene pass into its serialized phases —
H2D upload, device dispatch, D2H pull wait (device compute overlaps in here),
host compaction — so regressions can be attributed. This is the probe that
found round 4's D2H latency sink (72 small pulls ≈ 7.5 s at V=24 before the
packed single-pull path) and the float32-image upload waste.

Usage: python tools/profile_fusion.py [--views 24] [--height 480] [--width 896]
       [--ref-chunk 4] [--image-dtype uint8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=896)
    ap.add_argument("--ref-chunk", type=int, default=4)
    ap.add_argument("--image-dtype", default="uint8", choices=["uint8", "float32"])
    args = ap.parse_args()

    from bench_fusion import make_consistent_scene

    import jax
    import jax.numpy as jnp

    from atvsnet_tpu.fusion.consistency import (
        _FLAT_GATHER_MAX_TABLE_BYTES,
        _fuse_ref_chunk,
        camera_geometry,
    )
    from atvsnet_tpu.native import compact_backproject

    V, H, W, R = args.views, args.height, args.width, args.ref_chunk
    depths, images, cams = make_consistent_scene(V, H, W)
    images = images.astype(args.image_dtype)
    flat = V * H * W * 4 * 4 * 4 <= _FLAT_GATHER_MAX_TABLE_BYTES  # pipeline C=4

    cams64 = np.asarray(cams, np.float64)
    P64 = cams64[:, 1, :3, :3] @ cams64[:, 0, :3, :4]
    Minv64 = np.linalg.inv(P64[:, :, :3])
    P4_64 = P64[:, :, 3]

    def timed_pass():
        ts = {}
        t0 = time.perf_counter()
        P, M_inv, centers, f = camera_geometry(cams)
        dj = jnp.asarray(np.asarray(depths, np.float32))
        ij = jnp.asarray(images)
        Pj, Mj, Cj, fj = map(jnp.asarray, (P, M_inv, centers, f))
        jax.block_until_ready(ij)
        float(jnp.sum(dj))  # H2D fence (block_until_ready returns early on axon)
        ts["h2d_s"] = time.perf_counter() - t0

        def dispatch(ci):
            idxs = np.minimum(np.arange(ci * R, ci * R + R), V - 1).astype(np.int32)
            return _fuse_ref_chunk(
                jnp.asarray(idxs), dj, ij, Pj, Mj, Cj, fj,
                disp_thresh=0.01, num_consistent=2, flat_sample=flat,
            ), idxs[: min(V - ci * R, R)]  # tail chunk is pad-by-repeat; drop pads

        t_disp = t_pull = t_comp = 0.0
        n_pts = 0
        pend = None
        n_chunks = -(-V // R)
        for ci in range(n_chunks + 1):
            if ci < n_chunks:
                t1 = time.perf_counter()
                nxt = dispatch(ci)
                t_disp += time.perf_counter() - t1
            if pend is not None:
                out, idxs = pend
                t1 = time.perf_counter()
                packed = np.asarray(out)          # the ONE D2H pull per chunk
                t_pull += time.perf_counter() - t1
                t1 = time.perf_counter()
                for j, r in enumerate(idxs):
                    pts, _ = compact_backproject(packed[j], depths[r], Minv64[r], P4_64[r])
                    n_pts += pts.shape[0]
                t_comp += time.perf_counter() - t1
            pend = nxt if ci < n_chunks else None
        ts["dispatch_s"] = t_disp
        ts["pull_d2h_wait_s"] = t_pull  # includes overlapped device compute
        ts["compact_s"] = t_comp
        ts["total_s"] = time.perf_counter() - t0
        ts["points"] = n_pts
        return ts

    timed_pass()  # compile warm-up
    ts = {k: (round(v, 3) if isinstance(v, float) else v) for k, v in timed_pass().items()}
    ts.update(views=V, ref_chunk=R, flat_gather=flat, image_dtype=args.image_dtype)
    print(json.dumps(ts))


if __name__ == "__main__":
    main()
