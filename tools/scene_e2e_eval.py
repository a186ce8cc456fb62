"""End-to-end scene accuracy: eval-driver PFM depths vs fabricated-scene gt.

Closes the loop for the trained-weights demo (ROUND4.md §4): after
`tools/make_planes_eth3d.py` fabricated a photo-consistent ETH3D-format scene
and `cli/eval_pointcloud.py --params ...` wrote per-reference-view depth PFMs,
this scores every written depth map against the renderer's metric gt
(gt_depths/%08d.pfm) with the reference's own 14-metric oracle
(eval/errors.calc_error, reference atvsnet/eval_errors.py:25-93) and writes the
mean over reference views as JSON — the committed
artifacts/trained_demo/scene_e2e_metrics*.json provenance.

gt is full input resolution; predictions are native (quarter) resolution, so gt
is nearest-neighbor-downsampled to the prediction grid (no interpolation across
the renderer's plane boundaries — interpolated gt there would be a depth that
exists in no view).

Usage:
    python tools/scene_e2e_eval.py --scene_dir /tmp/planes_eth3d/eth3d/planes \
        --eval_out /tmp/planes_eval_out/planes [--json_out metrics.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", required=True,
                    help="fabricated scene root (contains gt_depths/)")
    ap.add_argument("--eval_out", required=True,
                    help="eval driver scene savepath (contains depths_atvsnet/)")
    ap.add_argument("--json_out", default=None)
    ap.add_argument("--scene_label", default=None, help="free-text label for the JSON")
    args = ap.parse_args()

    import cv2

    from atvsnet_tpu.data.pfm import load_pfm
    from atvsnet_tpu.eval.errors import ACC_METRICS, ERR_METRICS, calc_error

    preds = sorted(
        p for p in glob.glob(os.path.join(args.eval_out, "depths_atvsnet", "*.pfm"))
        if not p.endswith("_prob.pfm")
    )
    if not preds:
        raise SystemExit(f"no depth PFMs under {args.eval_out}/depths_atvsnet")
    errs, pred_shape = [], None
    for p in preds:
        idx = int(os.path.basename(p).split(".")[0].split("_")[0])
        d = np.asarray(load_pfm(p), np.float32)
        pred_shape = d.shape
        gt = np.asarray(
            load_pfm(os.path.join(args.scene_dir, "gt_depths", f"{idx:08d}.pfm")),
            np.float32,
        )
        gtq = cv2.resize(gt, (d.shape[1], d.shape[0]), interpolation=cv2.INTER_NEAREST)
        e, _ = calc_error(d, gtq)
        errs.append(e)
    mean = np.mean(np.stack(errs), axis=0)
    names = ERR_METRICS + ACC_METRICS
    for n, v in zip(names, mean):
        print(f"{n:<22} {v:.6f}")
    out = {
        "scene": args.scene_label
        or f"{os.path.basename(args.scene_dir)} ({len(preds)} ref views, "
           f"native depth {pred_shape[0]}x{pred_shape[1]})",
        "metrics": {n: float(v) for n, v in zip(names, mean)},
    }
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({"mae": round(float(mean[0]), 5),
                      "inlier3": round(float(mean[11]), 4),
                      "views": len(preds)}))


if __name__ == "__main__":
    main()
