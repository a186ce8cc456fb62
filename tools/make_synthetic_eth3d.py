"""Fabricate an ETH3D-format scene tree for driver throughput measurement.

The real ETH3D scenes are not bundled; this generates a scene with full-resolution
JPEG views + MVSNet cam.txt files + pair.txt so cli/eval_pointcloud.py exercises its
complete host pipeline (decode -> adaptive scale -> crop -> normalize) at realistic
image sizes. Two copies of the scene are emitted (<name>_a, <name>_b) so a single
driver invocation measures scene _b fully warm (scene _a pays the jit compile).

Run: python tools/make_synthetic_eth3d.py --out /tmp/eth3d_synth \
        [--refs 16] [--views 5] [--width 1920] [--height 1280]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def make_scene(scene_dir: str, n_images: int, view_num: int, W: int, H: int, seed: int = 0):
    import cv2

    from atvsnet_tpu.data.cams import write_cam
    from atvsnet_tpu.data.synthetic import make_cam, rotation

    os.makedirs(os.path.join(scene_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(scene_dir, "cams"), exist_ok=True)
    rng = np.random.RandomState(seed)
    K = np.array([[W * 0.9, 0, W / 2.0], [0, W * 0.9, H / 2.0], [0, 0, 1.0]])
    # smooth random texture (JPEG-decodable structure, not pure noise)
    base = cv2.GaussianBlur(rng.randint(0, 255, (H, W, 3)).astype(np.uint8), (31, 31), 9)
    entries = []
    for v in range(n_images):
        img = np.roll(base, shift=7 * v, axis=1)
        cv2.imwrite(os.path.join(scene_dir, "images", f"{v:08d}.jpg"), img)
        R = rotation([0.1, 1, 0.05], 0.02 * v)
        t = np.array([0.08 * v, 0.01 * v, 0.0])
        cam = make_cam(K, R, t, depth_start=2.0, depth_interval=0.05, num_d=128)
        write_cam(os.path.join(scene_dir, "cams", f"{v:08d}_cam.txt"), cam)
        others = [str(o) for o in range(n_images) if o != v][: view_num - 1 + 4]
        entries.append(f"{v}\n{len(others)} " + " ".join(f"{o} 10.0" for o in others) + "\n")
    with open(os.path.join(scene_dir, "pair.txt"), "w") as f:
        f.write(f"{n_images}\n" + "".join(entries))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/eth3d_synth")
    ap.add_argument("--name", default="synth")
    ap.add_argument("--refs", type=int, default=16)
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1280)
    args = ap.parse_args()
    for suffix in ("a", "b"):
        scene = os.path.join(args.out, "eth3d", f"{args.name}_{suffix}")
        make_scene(scene, args.refs, args.views, args.width, args.height)
        print("wrote", scene)


if __name__ == "__main__":
    main()
