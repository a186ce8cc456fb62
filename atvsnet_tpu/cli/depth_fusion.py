"""Depth-map fusion CLI — equivalent of reference atvsnet/depth_fusion.py (which shells
out to the fusibile CUDA binary; here the consistency check runs on-device in JAX).

    python -m atvsnet_tpu.cli.depth_fusion --dense_folder ./eval_out/lakeside \
        [--prob_threshold 0.8] [--disp_threshold 0.01] [--num_consistent 2]
"""

from __future__ import annotations

import argparse

from atvsnet_tpu.fusion.fuse import fuse_scene


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dense_folder", required=True)
    ap.add_argument("--prob_threshold", type=float, default=0.8)
    ap.add_argument("--disp_threshold", type=float, default=0.01)
    ap.add_argument("--num_consistent", type=int, default=2)
    ap.add_argument("--out_ply", default=None)
    args = ap.parse_args()
    fuse_scene(
        args.dense_folder,
        prob_threshold=args.prob_threshold,
        disp_threshold=args.disp_threshold,
        num_consistent=args.num_consistent,
        out_ply=args.out_ply,
    )


if __name__ == "__main__":
    main()
