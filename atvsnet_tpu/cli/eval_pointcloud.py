"""ETH3D point-cloud eval driver — equivalent of reference atvsnet/eval_pointcloud.py.

    python -m atvsnet_tpu.cli.eval_pointcloud --data_root ../data --savepath ./eval_out \
        [--scenes lakeside sand_box ...] [--params model.npz] [--view_num 8] \
        [--batch 1] [--mesh data=2,view=4] [--gt_range]

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
batching; the reference loops B=1 always). B=1 is the measured optimum since the
round-3 warp corner-lerp fusion (0.39s/image warm vs 0.50s at B=2 on the synthetic
full-res scene; see README). --mesh data=N[,view=M] runs the SPMD
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


def _write_sample_outputs(out_folder, sample, depth, conf, depth_sweep, sample_scale,
                          depth_sweep_up=None):
    """Write one ref image's artifacts (runs on a writer thread).

    depth/conf/depth_sweep: (h, w) float32 host arrays at cost-volume resolution;
    depth_sweep_up: optional 4x-upsampled sweep map for the reference-style viz PNG
    (the PNG falls back to the native map when the upsample was skipped).
    """
    import cv2

    from atvsnet_tpu.cli.example import save_colormap

    vh, vw = sample["valid_hw"]
    vh4, vw4 = int(vh * sample_scale), int(vw * sample_scale)
    if (vh4, vw4) != depth.shape[:2]:
        depth = depth[:vh4, :vw4]
        conf = conf[:vh4, :vw4]
        depth_sweep = depth_sweep[:vh4, :vw4]
        if depth_sweep_up is not None:
            depth_sweep_up = depth_sweep_up[:vh, :vw]
    idx = sample["index"]
    save_pfm(os.path.join(out_folder, f"{idx:08d}.pfm"), depth.astype(np.float32))
    save_pfm(os.path.join(out_folder, f"{idx:08d}_prob.pfm"), conf.astype(np.float32))
    # ref image at cost-volume resolution + matching cams (the fusion inputs,
    # reference eval_pointcloud.py:380-388)
    ref_img = sample["images_raw"][0, 0]
    h, w = depth.shape[:2]
    cv2.imwrite(os.path.join(out_folder, f"{idx:08d}.jpg"), cv2.resize(ref_img, (w, h)))
    write_cam(os.path.join(out_folder, f"{idx:08d}.txt"), sample["cams"][0, 0])
    save_colormap(
        os.path.join(out_folder, f"{idx:08d}.png"),
        depth_sweep if depth_sweep_up is None else depth_sweep_up,
    )


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
    full_viz: bool = False,
    act_quant: str = "none",
    warp_quant: str = "none",
) -> None:
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    from atvsnet_tpu.utils.runtime import setup_jax

    setup_jax()

    from atvsnet_tpu.models.atvsnet import (
        center_images,
        multi_view_forward,
        sweep_to_depth,
    )
    from atvsnet_tpu.models.tvsnet import init_params
    from atvsnet_tpu.utils.ckpt import load_params

    max_h = (max_h // 32) * 32
    max_w = (max_w // 32) * 32
    cfg = PipelineConfig(
        view_num=view_num, max_d=max_d, max_h=max_h, max_w=max_w, compute_dtype=compute_dtype,
        act_quant=act_quant, warp_quant=warp_quant,
    )
    log.info(
        f"numerics: compute_dtype={compute_dtype} act_quant={act_quant} "
        f"warp_quant={warp_quant}"
        + ("" if act_quant == "none" and warp_quant == "none"
           else " (quantized mode; pass --act-quant none --warp-quant none for the exact path)")
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
        # The three consumed maps are PACKED into one (B, h, w, 3) array: on
        # tunneled devices each first host fetch of an output costs ~270ms fixed
        # (RPC setup) regardless of size, so one packed fetch per batch beats
        # three small ones by ~0.5s/batch.
        keep = {
            "packed": jnp.concatenate(
                [
                    sweep_to_depth(out["depth"], cfg.inverse_depth),
                    out["confidence"],
                    out["depth"],
                ],
                axis=-1,
            )
        }
        if "depth_up" in out:
            keep["depth_sweep_up"] = out["depth_up"]
        return keep

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
            return _prune(
                multi_view_forward_spmd(
                    p, center_images(i), c, cfg, mesh=dev_mesh,
                    out_prob_map=True, upsample=full_viz,
                )
            )

        fwd = jax.jit(
            _fwd,
            in_shardings=(
                NamedSharding(dev_mesh, P()),
                NamedSharding(dev_mesh, P("data")),
                NamedSharding(dev_mesh, P("data")),
            ),
        )
        # loader threads put batches directly into the mesh's 'data' sharding
        in_sharding = NamedSharding(dev_mesh, P("data"))
    else:
        # upsample only when the reference-style full-resolution viz PNG is
        # requested: the driver writes native-resolution PFMs either way (so does
        # the reference — its *_up writes are commented out) and the upsampled
        # soft-argmin chain costs ~3x the whole rest of stage 4
        def _fwd(p, i, c):
            return _prune(
                multi_view_forward(
                    p, center_images(i), c, cfg, out_prob_map=True, upsample=full_viz
                )
            )

        fwd = jax.jit(_fwd)
        in_sharding = jax.devices()[0]

    os.makedirs(savepath, exist_ok=True)
    # bound in-flight decoded chunks (each is ~50MB at 8-view eval scale)
    window = max(2, (load_workers + batch - 1) // batch + 1)
    if batch > 1:
        # chunk workers only gather + concatenate; per-sample decode fans out to
        # its own pool so all load_workers decode even when a chunk holds many
        # samples (one worker decoding a whole chunk serially stalls scene starts)
        sample_pool = ThreadPoolExecutor(max_workers=max(1, load_workers))
        load_pool = ThreadPoolExecutor(max_workers=window)
    else:
        sample_pool = None
        load_pool = ThreadPoolExecutor(max_workers=max(1, load_workers))
    write_pool = ThreadPoolExecutor(max_workers=max(1, write_workers))

    def _load(paths):
        # center=False: raw uint8 ships to the device; center_images runs in-jit
        return load_mvs_sample(
            paths, view_num, max_d=max_d, max_h=max_h, max_w=max_w,
            inverse_depth=cfg.inverse_depth, gt_range=gt_range, center=False,
        )

    def _load_chunk(paths_chunk):
        """Decode+preprocess a whole batch off the main thread. On one-vCPU eval
        hosts every numpy byte the main loop touches serializes with the decode
        workers; shipping ready batches keeps the loop's only blocking work the
        drain (which releases the GIL)."""
        if sample_pool is not None:
            samples = list(sample_pool.map(_load, paths_chunk))
        else:
            samples = [_load(p) for p in paths_chunk]
        n_real = len(samples)
        while len(samples) < batch:  # tail: pad with the last sample
            samples.append(samples[-1])
        images = np.concatenate([s["images"] for s in samples], axis=0)
        cams = np.concatenate([s["cams"] for s in samples], axis=0)
        return (images, cams), samples, n_real

    # ---- one chunk stream across ALL scenes. Per-scene queues stall the loop at
    # every scene boundary (the first chunk of a scene has no decode lead time —
    # measured 4-8s of cold start per scene on a one-vCPU host); a flat stream keeps
    # the loaders primed through boundaries. All scenes share one compiled program
    # (one static bucket), so only the output folder differs per chunk. ----
    scene_meta = []
    work = []  # (scene_index, [sample paths] of one batch)
    for scene in scenes:
        dense_path = os.path.join(data_root, "eth3d", scene)
        if not os.path.isdir(dense_path):
            log.warn(f"scene folder missing, skipping: {dense_path}")
            continue
        mvs_list = gen_pipeline_mvs_list(dense_path, view_num)
        out_folder = os.path.join(savepath, scene, "depths_atvsnet")
        os.makedirs(out_folder, exist_ok=True)
        si = len(scene_meta)
        scene_meta.append({
            "name": scene, "out_folder": out_folder, "n": len(mvs_list),
            "start": None, "end": 0.0, "done": 0, "write_futures": [],
        })
        for i in range(0, len(mvs_list), batch):
            work.append((si, mvs_list[i : i + batch]))

    from collections import deque

    queue = deque()
    next_i = 0

    def _top_up():
        nonlocal next_i
        while next_i < len(work) and len(queue) < window:
            si, chunk = work[next_i]
            queue.append((si, load_pool.submit(_load_chunk, chunk)))
            next_i += 1

    t_load = t_device = t_write_wait = t_dispatch = 0.0
    t_first_drain = None
    pending = None  # (scene idx, device outputs, samples, n_real) awaiting fetch
    trace = bool(os.environ.get("ATVSNET_DRIVER_TRACE"))

    def _write_one(si, sample, depth, conf, sweep, sweep_up):
        _write_sample_outputs(
            scene_meta[si]["out_folder"], sample, depth, conf, sweep,
            cfg.sample_scale, sweep_up,
        )
        scene_meta[si]["end"] = max(scene_meta[si]["end"], time.time())

    def _drain(p):
        """Materialize a dispatched batch and hand its writes to the pool."""
        nonlocal t_device, t_first_drain
        t0 = time.time()
        si, out_dev, samples, n_real = p
        packed = np.asarray(out_dev["packed"], np.float32)
        depth, conf, sweep = packed[..., 0], packed[..., 1], packed[..., 2]
        sweep_up = (
            np.asarray(out_dev["depth_sweep_up"], np.float32)
            if "depth_sweep_up" in out_dev else None
        )
        dt_drain = time.time() - t0
        t_device += dt_drain
        if t_first_drain is None:
            t_first_drain = dt_drain
        if trace:
            log.info(f"  drain: {dt_drain:.2f}s")
        meta = scene_meta[si]
        for b in range(n_real):
            meta["write_futures"].append(
                write_pool.submit(
                    _write_one, si, samples[b], depth[b], conf[b], sweep[b],
                    None if sweep_up is None else sweep_up[b, ..., 0],
                )
            )
        meta["done"] += n_real
        if meta["done"] % 10 < n_real or meta["done"] == meta["n"]:
            log.info(f"{meta['name']}: {meta['done']}/{meta['n']} drained")

    try:
        _top_up()
        for _ci in range(len(work)):
            if pending is not None and not os.environ.get("ATVSNET_NO_ASYNC_D2H"):
                # start the previous batch's D2H now; it overlaps the load wait
                # and dispatch below (each first fetch otherwise pays ~270ms of
                # synchronous RPC setup on tunneled devices)
                for a in pending[1].values():
                    if hasattr(a, "copy_to_host_async"):
                        a.copy_to_host_async()
            t0 = time.time()
            si, fut = queue.popleft()
            (host_images, host_cams), samples, n_real = fut.result()
            _top_up()
            dt_load = time.time() - t0
            t_load += dt_load
            if trace:
                log.info(f"  chunk {_ci}: load-wait {dt_load:.2f}s")
            if scene_meta[si]["start"] is None:
                scene_meta[si]["start"] = t0
            t0 = time.time()
            out_dev = fwd(
                params,
                jax.device_put(host_images, in_sharding),
                jax.device_put(host_cams, in_sharding),
            )
            t_dispatch += time.time() - t0
            if pending is not None:
                _drain(pending)
            pending = (si, out_dev, samples, n_real)
        if pending is not None:
            _drain(pending)
        t0 = time.time()
        for meta in scene_meta:
            for f in meta["write_futures"]:
                f.result()  # surface writer exceptions
        t_write_wait += time.time() - t0

        for meta in scene_meta:
            if meta["start"] is None:
                continue
            scene_runtime = max(meta["end"], meta["start"]) - meta["start"]
            with open(
                os.path.join(savepath, meta["name"], "zz_runtime.txt"), "w"
            ) as f:
                f.write("runtime " + str(scene_runtime))
            n = meta["n"]
            log.info(
                f"{meta['name']}: {n} ref images in {scene_runtime:.1f}s wall "
                f"({n / max(scene_runtime, 1e-9):.2f} maps/s)"
            )
        log.info(
            f"run blocked: load {t_load:.1f}s, dispatch {t_dispatch:.1f}s, "
            f"device+D2H {t_device:.1f}s, write-flush {t_write_wait:.1f}s"
        )
        if t_first_drain is not None and t_device > t_first_drain:
            # On lazily-compiling platforms (axon) a fresh-bucket XLA compile
            # lands in the FIRST drain, not in dispatch — a 512x640 5-view D=128
            # bucket compiles in ~6-10 min but then drains at ~0.2s/map
            # (measured 2026-08-19; warm rerun 15.6s wall for 12 maps). Split it
            # out so a slow cold run isn't misread as slow steady-state.
            log.info(
                f"  of which first drain {t_first_drain:.1f}s (includes any "
                f"fresh-bucket compile), steady-state "
                f"{t_device - t_first_drain:.1f}s"
            )
    finally:
        load_pool.shutdown(wait=False)
        if sample_pool is not None:
            sample_pool.shutdown(wait=False)
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
    ap.add_argument("--full_viz", action="store_true",
                    help="render the viz PNG from the 4x-upsampled map like the "
                         "reference (costs the full upsampled soft-argmin chain; "
                         "the PFM outputs are identical either way)")
    ap.add_argument("--act-quant", default="none",
                    choices=["none", "int8", "int8s", "int8mxu"],
                    help="int8 activation storage/compute for the volume links "
                         "(PipelineConfig.act_quant; accuracy-gated "
                         "in tools/int8_accuracy_probe.py, inference-only). "
                         "Default none = the exact reference-parity path; "
                         "int8s + --warp-quant int8 is the fastest "
                         "accuracy-cleared mode on the v5e (combined probe mean "
                         "|d-depth| 0.0018 sweep units, under bf16's own 0.0037 "
                         "vs fp32 — ROUND4.md) and is what bench.py measures")
    ap.add_argument("--warp-quant", default="none", choices=["none", "int8"],
                    help="int8 storage for the warped feature volumes "
                         "(PipelineConfig.warp_quant; independent of --act-quant)")
    args = ap.parse_args()
    run_eval_pc(
        args.data_root, args.savepath, args.scenes,
        view_num=args.view_num, max_d=args.max_d, max_w=args.max_w, max_h=args.max_h,
        params_path=args.params, compute_dtype=args.dtype,
        batch=args.batch, mesh=args.mesh,
        load_workers=args.load_workers, write_workers=args.write_workers,
        gt_range=args.gt_range, full_viz=args.full_viz,
        act_quant=args.act_quant, warp_quant=args.warp_quant,
    )


if __name__ == "__main__":
    main()
