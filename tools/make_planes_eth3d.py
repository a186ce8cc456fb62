"""Fabricate a PHOTO-CONSISTENT ETH3D-format scene for the trained-weights demo.

Unlike make_synthetic_eth3d.py (rolled textures — realistic decode shapes, fake
geometry; built for driver THROUGHPUT measurement), every image here is a render
of the same piecewise-planar world (data/synthetic.render_multiplane_views), so
trained weights produce genuinely consistent depth maps across reference views
and the fusion stage emits a real point cloud. Completes the
train -> eval_pointcloud -> depth_fusion -> PLY accuracy loop (VERDICT r3 item 4).

Layout matches the reference eval driver's expectations
(reference eval_pointcloud.py:61-93): images/%08d.jpg, cams/%08d_cam.txt with
FULL-resolution intrinsics + METRIC depth range (the driver converts to the
inverse sweep itself, eval_pointcloud.py:153-169), pair.txt with
nearest-neighbor view lists; plus gt_depths/%08d.pfm (metric) for error checks.

Run: python tools/make_planes_eth3d.py --out /tmp/planes_eth3d \
        [--refs 12] [--height 512] [--width 640] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def make_scene(scene_dir: str, n_images: int, H: int, W: int, seed: int,
               depth_min: float = 1.0, depth_max: float = 2.0, num_d: int = 128,
               num_spheres: int = 0):
    import cv2

    from atvsnet_tpu.data.cams import write_cam
    from atvsnet_tpu.data.pfm import save_pfm
    from atvsnet_tpu.data.synthetic import make_cam, render_multiplane_views

    r = render_multiplane_views(
        n_images, H, W, seed=seed, depth_min=depth_min, depth_max=depth_max,
        spacing=0.05, rot_step=0.02, num_spheres=num_spheres,
    )
    os.makedirs(os.path.join(scene_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(scene_dir, "cams"), exist_ok=True)
    os.makedirs(os.path.join(scene_dir, "gt_depths"), exist_ok=True)
    interval = (depth_max - depth_min) / num_d
    entries = []
    for v in range(n_images):
        img = (r["images"][v] * 255.0).astype(np.uint8)
        cv2.imwrite(
            os.path.join(scene_dir, "images", f"{v:08d}.jpg"),
            img[..., ::-1],  # imwrite expects BGR
            [int(cv2.IMWRITE_JPEG_QUALITY), 98],
        )
        cam = make_cam(r["K_full"], r["Rs"][v], r["ts"][v], depth_min, interval, num_d)
        write_cam(os.path.join(scene_dir, "cams", f"{v:08d}_cam.txt"), cam)
        save_pfm(os.path.join(scene_dir, "gt_depths", f"{v:08d}.pfm"), r["depths"][v])
        others = sorted((o for o in range(n_images) if o != v), key=lambda o: abs(o - v))
        entries.append(
            f"{v}\n{len(others)} " + " ".join(f"{o} 10.0" for o in others) + "\n"
        )
    with open(os.path.join(scene_dir, "pair.txt"), "w") as f:
        f.write(f"{n_images}\n" + "".join(entries))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/planes_eth3d")
    ap.add_argument("--name", default="planes")
    ap.add_argument("--refs", type=int, default=12)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--num_spheres", type=int, default=0,
                    help="textured spheres in the scene (curved surfaces + "
                         "occlusion boundaries; VERDICT r4 item 2)")
    args = ap.parse_args()
    scene = os.path.join(args.out, "eth3d", args.name)
    make_scene(scene, args.refs, args.height, args.width, args.seed,
               num_spheres=args.num_spheres)
    print("wrote", scene)


if __name__ == "__main__":
    main()
