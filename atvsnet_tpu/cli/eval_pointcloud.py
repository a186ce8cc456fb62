"""ETH3D point-cloud eval driver — equivalent of reference atvsnet/eval_pointcloud.py.

    python -m atvsnet_tpu.cli.eval_pointcloud --data_root ../data --savepath ./eval_out \
        [--scenes lakeside sand_box ...] [--params model.npz] [--view_num 8]

Per scene: parse pair.txt, per reference image run the N-view pipeline (ONE jitted call;
the reference stages 2N+1 sess.runs through the host per image), write %08d.pfm depth,
%08d_prob.pfm confidence, ref jpg + cam txt, a viridis png, and zz_runtime.txt.
All inputs are padded/cropped to a single static (max_h, max_w) bucket so every ref
image reuses one compiled program (XLA static shapes; reference crops per-image).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from atvsnet_tpu.config import PipelineConfig
from atvsnet_tpu.data.mvs_list import gen_pipeline_mvs_list
from atvsnet_tpu.data.preprocess import load_mvs_sample
from atvsnet_tpu.data.cams import write_cam
from atvsnet_tpu.data.pfm import save_pfm
from atvsnet_tpu.utils import log

ETH3D_SCENES = ["lakeside", "sand_box", "storage_room", "storage_room_2", "tunnel"]


def run_eval_pc(
    data_root: str,
    savepath: str,
    scenes,
    view_num: int = 8,
    max_d: int = 128,
    max_w: int = 896,
    max_h: int = 480,
    params_path: str | None = None,
    compute_dtype: str = "float32",
    seed: int = 0,
) -> None:
    import cv2
    import jax
    import jax.numpy as jnp

    from atvsnet_tpu.utils.runtime import setup_jax

    setup_jax()

    from atvsnet_tpu.models.atvsnet import multi_view_forward, sweep_to_depth
    from atvsnet_tpu.models.tvsnet import init_params
    from atvsnet_tpu.utils.ckpt import load_params

    max_h = (max_h // 32) * 32
    max_w = (max_w // 32) * 32
    cfg = PipelineConfig(
        view_num=view_num, max_d=max_d, max_h=max_h, max_w=max_w, compute_dtype=compute_dtype
    )

    if params_path:
        if not os.path.exists(params_path):
            raise SystemExit(f"error: --params checkpoint not found: {params_path}")
        params = load_params(params_path)
        log.info(f"params restored from {params_path}")
    else:
        log.warn("no --params given: using seeded random weights")
        params = init_params(jax.random.PRNGKey(seed), cfg)

    def _fwd(p, i, c):
        out = multi_view_forward(p, i, c, cfg, out_prob_map=True)
        # return ONLY what the driver consumes: the full dict would force the
        # (P, B, D, h, w) pair-volume stacks to materialize as jit outputs (XLA
        # cannot DCE them) and, on tunneled-device setups, to transfer — measured
        # ~20s/image vs ~1s at eval scale
        return {"depth": out["depth"], "confidence": out["confidence"]}

    fwd = jax.jit(_fwd)

    os.makedirs(savepath, exist_ok=True)
    for scene in scenes:
        dense_path = os.path.join(data_root, "eth3d", scene)
        if not os.path.isdir(dense_path):
            log.warn(f"scene folder missing, skipping: {dense_path}")
            continue
        mvs_list = gen_pipeline_mvs_list(dense_path, view_num)
        out_folder = os.path.join(savepath, scene, "depths_atvsnet")
        os.makedirs(out_folder, exist_ok=True)

        # prefetch: decode/scale/crop the next sample on a host thread while the
        # device runs the current one (the reference is fully synchronous)
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=1)

        def _load(paths):
            return load_mvs_sample(
                paths, view_num, max_d=max_d, max_h=max_h, max_w=max_w,
                inverse_depth=cfg.inverse_depth,
            )

        futures = [pool.submit(_load, mvs_list[0])] if mvs_list else []
        scene_runtime = 0.0
        for i, paths in enumerate(mvs_list):
            sample = futures[i].result()
            if i + 1 < len(mvs_list):
                futures.append(pool.submit(_load, mvs_list[i + 1]))
            t0 = time.time()
            out = fwd(params, jnp.asarray(sample["images"]), jnp.asarray(sample["cams"]))
            depth_sweep = np.asarray(out["depth"])
            conf = np.asarray(out["confidence"])
            scene_runtime += time.time() - t0

            depth = np.asarray(
                sweep_to_depth(jnp.asarray(depth_sweep), cfg.inverse_depth)
            ).squeeze()
            # crop away the pad-and-mask region of small inputs (preprocess.py)
            vh, vw = sample["valid_hw"]
            vh4, vw4 = int(vh * cfg.sample_scale), int(vw * cfg.sample_scale)
            if (vh4, vw4) != depth.shape[:2]:
                depth = depth[:vh4, :vw4]
                conf = conf[:, :vh4, :vw4]
                depth_sweep = depth_sweep[:, :vh4, :vw4]
            idx = sample["index"]
            save_pfm(os.path.join(out_folder, f"{idx:08d}.pfm"), depth.astype(np.float32))
            save_pfm(os.path.join(out_folder, f"{idx:08d}_prob.pfm"), conf.squeeze().astype(np.float32))
            # ref image at cost-volume resolution + matching cams (the fusion inputs,
            # reference eval_pointcloud.py:380-388)
            ref_img = sample["images_raw"][0, 0]
            h, w = depth.shape[:2]
            cv2.imwrite(os.path.join(out_folder, f"{idx:08d}.jpg"), cv2.resize(ref_img, (w, h)))
            write_cam(os.path.join(out_folder, f"{idx:08d}.txt"), sample["cams"][0, 0])

            from atvsnet_tpu.cli.example import save_colormap

            save_colormap(os.path.join(out_folder, f"{idx:08d}.png"), np.squeeze(depth_sweep))
            if (i + 1) % 10 == 0:
                log.info(f"{scene}: {i + 1}/{len(mvs_list)} ({scene_runtime:.1f}s)")

        pool.shutdown(wait=False)
        with open(os.path.join(savepath, scene, "zz_runtime.txt"), "w") as f:
            f.write("runtime " + str(scene_runtime))
        log.info(f"{scene}: {len(mvs_list)} ref images in {scene_runtime:.1f}s")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_root", default="../data/")
    ap.add_argument("--savepath", default="./eval_out/")
    ap.add_argument("--scenes", nargs="*", default=ETH3D_SCENES)
    ap.add_argument("--view_num", type=int, default=8)
    ap.add_argument("--max_d", type=int, default=128)
    ap.add_argument("--max_w", type=int, default=896)
    ap.add_argument("--max_h", type=int, default=480)
    ap.add_argument("--params", default=None)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()
    run_eval_pc(
        args.data_root, args.savepath, args.scenes,
        view_num=args.view_num, max_d=args.max_d, max_w=args.max_w, max_h=args.max_h,
        params_path=args.params, compute_dtype=args.dtype,
    )


if __name__ == "__main__":
    main()
