"""ETH3D point-cloud eval driver — equivalent of reference atvsnet/eval_pointcloud.py.

    python -m atvsnet_tpu.cli.eval_pointcloud --data_root ../data --savepath ./eval_out \
        [--scenes lakeside sand_box ...] [--params model.npz] [--view_num 8] \
        [--batch 2] [--mesh data=2,view=4] [--gt_range]

Per scene: parse pair.txt, per reference image run the N-view pipeline (ONE jitted call;
the reference stages 2N+1 sess.runs through the host per image), write %08d.pfm depth,
%08d_prob.pfm confidence, ref jpg + cam txt, a viridis png, and zz_runtime.txt.
All inputs are padded/cropped to a single static (max_h, max_w) bucket so every ref
image reuses one compiled program (XLA static shapes; reference crops per-image).

Throughput design (the device forward is ~0.4s/image at 5-view eval scale; everything
else must hide behind it):
  - decode/scale/crop runs on a multi-worker thread pool, several samples in flight
    (cv2 releases the GIL during imread/resize);
  - sweep->metric depth conversion happens INSIDE the jitted program (no extra
    dispatch + full-map round trip per image);
  - the driver dispatches batch i+1 to the device BEFORE materializing batch i's
    outputs (JAX async dispatch overlaps device compute with host transfers);
  - all file writes (PFM/jpg/cam/png) go to a writer pool; the loop never blocks on
    disk. The reference is fully synchronous at every one of these steps
    (eval_pointcloud.py:212-397).

--batch B stacks B distinct ref images into one (B, N, H, W, 3) forward (pure data
batching; the reference loops B=1 always). --mesh data=N[,view=M] runs the SPMD
pipeline over a device mesh, sharding the batch over 'data' and the view pairs over
'view' (SURVEY.md §2.3; the reference's num_gpus scaffolding never did this).
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


from atvsnet_tpu.parallel.mesh import parse_mesh_spec  # noqa: E402  (re-export)


def _write_sample_outputs(out_folder, sample, depth, conf, depth_sweep, sample_scale):
    """Write one ref image's artifacts (runs on a writer thread).

    depth/conf/depth_sweep: (h, w) float32 host arrays at cost-volume resolution.
    """
    import cv2

    from atvsnet_tpu.cli.example import save_colormap

    vh, vw = sample["valid_hw"]
    vh4, vw4 = int(vh * sample_scale), int(vw * sample_scale)
    if (vh4, vw4) != depth.shape[:2]:
        depth = depth[:vh4, :vw4]
        conf = conf[:vh4, :vw4]
        depth_sweep = depth_sweep[:vh4, :vw4]
    idx = sample["index"]
    save_pfm(os.path.join(out_folder, f"{idx:08d}.pfm"), depth.astype(np.float32))
    save_pfm(os.path.join(out_folder, f"{idx:08d}_prob.pfm"), conf.astype(np.float32))
    # ref image at cost-volume resolution + matching cams (the fusion inputs,
    # reference eval_pointcloud.py:380-388)
    ref_img = sample["images_raw"][0, 0]
    h, w = depth.shape[:2]
    cv2.imwrite(os.path.join(out_folder, f"{idx:08d}.jpg"), cv2.resize(ref_img, (w, h)))
    write_cam(os.path.join(out_folder, f"{idx:08d}.txt"), sample["cams"][0, 0])
    save_colormap(os.path.join(out_folder, f"{idx:08d}.png"), depth_sweep)


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
    batch: int = 1,
    mesh: str | None = None,
    load_workers: int = 6,
    write_workers: int = 2,
    gt_range: bool = False,
) -> None:
    from concurrent.futures import ThreadPoolExecutor

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

    def _prune(out):
        # return ONLY what the driver consumes: the full dict would force the
        # (P, B, D, h, w) pair-volume stacks to materialize as jit outputs (XLA
        # cannot DCE them) and, on tunneled-device setups, to transfer — measured
        # ~20s/image vs ~1s at eval scale. Metric conversion happens here, in-jit.
        return {
            "depth": sweep_to_depth(out["depth"], cfg.inverse_depth),
            "depth_sweep": out["depth"],
            "confidence": out["confidence"],
        }

    if mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from atvsnet_tpu.parallel.mesh import make_mesh
        from atvsnet_tpu.parallel.pipeline import multi_view_forward_spmd

        n_data, n_view = parse_mesh_spec(mesh)
        dev_mesh = make_mesh(n_data, n_view)
        if batch % n_data != 0:
            batch = n_data * max(1, batch // n_data)
        log.info(f"mesh (data={n_data}, view={n_view}), batch={batch}")

        def _fwd(p, i, c):
            return _prune(multi_view_forward_spmd(p, i, c, cfg, mesh=dev_mesh, out_prob_map=True))

        fwd = jax.jit(
            _fwd,
            in_shardings=(
                NamedSharding(dev_mesh, P()),
                NamedSharding(dev_mesh, P("data")),
                NamedSharding(dev_mesh, P("data")),
            ),
        )
    else:

        def _fwd(p, i, c):
            return _prune(multi_view_forward(p, i, c, cfg, out_prob_map=True))

        fwd = jax.jit(_fwd)

    os.makedirs(savepath, exist_ok=True)
    load_pool = ThreadPoolExecutor(max_workers=max(1, load_workers))
    write_pool = ThreadPoolExecutor(max_workers=max(1, write_workers))
    try:
        for scene in scenes:
            dense_path = os.path.join(data_root, "eth3d", scene)
            if not os.path.isdir(dense_path):
                log.warn(f"scene folder missing, skipping: {dense_path}")
                continue
            mvs_list = gen_pipeline_mvs_list(dense_path, view_num)
            out_folder = os.path.join(savepath, scene, "depths_atvsnet")
            os.makedirs(out_folder, exist_ok=True)

            def _load(paths):
                return load_mvs_sample(
                    paths, view_num, max_d=max_d, max_h=max_h, max_w=max_w,
                    inverse_depth=cfg.inverse_depth, gt_range=gt_range,
                )

            t_scene = time.time()
            # bound in-flight decoded samples (each is ~50MB at 8-view eval scale)
            from collections import deque

            window = max(load_workers, 1) + 2 * batch
            queue = deque()
            next_i = 0

            def _top_up():
                nonlocal next_i
                while next_i < len(mvs_list) and len(queue) < window:
                    queue.append(load_pool.submit(_load, mvs_list[next_i]))
                    next_i += 1

            _top_up()
            n_chunks = (len(mvs_list) + batch - 1) // batch

            t_load = t_device = t_write_wait = 0.0
            write_futures = []
            pending = None  # (device outputs, samples, n_real) awaiting materialization

            def _drain(p):
                """Materialize a dispatched batch and hand its writes to the pool."""
                nonlocal t_device
                t0 = time.time()
                out_dev, samples, n_real = p
                depth = np.asarray(out_dev["depth"], np.float32)
                conf = np.asarray(out_dev["confidence"], np.float32)
                sweep = np.asarray(out_dev["depth_sweep"], np.float32)
                t_device += time.time() - t0
                for b in range(n_real):
                    write_futures.append(
                        write_pool.submit(
                            _write_sample_outputs, out_folder, samples[b],
                            depth[b, ..., 0], conf[b, ..., 0], sweep[b, ..., 0],
                            cfg.sample_scale,
                        )
                    )

            done = 0
            for _ in range(n_chunks):
                t0 = time.time()
                samples = []
                for _ in range(min(batch, len(queue))):
                    samples.append(queue.popleft().result())
                    _top_up()
                t_load += time.time() - t0
                n_real = len(samples)
                while len(samples) < batch:  # tail: pad with the last sample
                    samples.append(samples[-1])
                images = np.concatenate([s["images"] for s in samples], axis=0)
                cams = np.concatenate([s["cams"] for s in samples], axis=0)
                out_dev = fwd(params, jnp.asarray(images), jnp.asarray(cams))
                if pending is not None:
                    _drain(pending)
                pending = (out_dev, samples, n_real)
                done += n_real
                if done % 10 < n_real:
                    log.info(f"{scene}: {done}/{len(mvs_list)} dispatched")
            if pending is not None:
                _drain(pending)
            t0 = time.time()
            for f in write_futures:
                f.result()  # surface writer exceptions
            t_write_wait += time.time() - t0
            scene_runtime = time.time() - t_scene

            with open(os.path.join(savepath, scene, "zz_runtime.txt"), "w") as f:
                f.write("runtime " + str(scene_runtime))
            n = len(mvs_list)
            log.info(
                f"{scene}: {n} ref images in {scene_runtime:.1f}s wall "
                f"({n / max(scene_runtime, 1e-9):.2f} maps/s; blocked: "
                f"load {t_load:.1f}s, device+D2H {t_device:.1f}s, "
                f"write-flush {t_write_wait:.1f}s)"
            )
    finally:
        load_pool.shutdown(wait=False)
        write_pool.shutdown(wait=True)


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
    ap.add_argument("--batch", type=int, default=1,
                    help="ref images per forward (pure data batching)")
    ap.add_argument("--mesh", default=None,
                    help="SPMD mesh spec, e.g. data=2,view=4 (shards the batch over "
                         "'data' and view pairs over 'view')")
    ap.add_argument("--load_workers", type=int, default=6)
    ap.add_argument("--write_workers", type=int, default=2)
    ap.add_argument("--gt_range", action="store_true",
                    help="override sweep ranges from GT depth maps when present "
                         "(reference eval_pointcloud.py:171-193)")
    args = ap.parse_args()
    run_eval_pc(
        args.data_root, args.savepath, args.scenes,
        view_num=args.view_num, max_d=args.max_d, max_w=args.max_w, max_h=args.max_h,
        params_path=args.params, compute_dtype=args.dtype,
        batch=args.batch, mesh=args.mesh,
        load_workers=args.load_workers, write_workers=args.write_workers,
        gt_range=args.gt_range,
    )


if __name__ == "__main__":
    main()
