"""In-process serving API: load weights once, serve depth maps from compiled programs.

The reference has no serving story — its drivers rebuild the TF graph and restore the
checkpoint per process (reference atvsnet/example.py:51-302). Here a `DepthEstimator`
holds device-resident parameters and one jit-compiled N-view program per shape bucket
and input contract ("raw" frames normalized in-jit / "pre" already-normalized); every
request routes to the best-fitting bucket and reuses its program (first call per
bucket compiles — amortized by the persistent XLA cache — subsequent calls are pure
device execution). Built for deployment loops: feed scenes as in-memory arrays or
file paths, get metric depth + confidence back, already un-padded. Transfers are
tuned for tunneled/attached devices: raw uint8 frames up (1/4 the bytes, variance
normalization in-jit), ONE packed f32 row per sample down (a fetch pays ~270ms fixed
RPC setup on tunneled devices regardless of size — 4 fetches cost more than the whole
480x896 forward).

    est = DepthEstimator(PipelineConfig(view_num=5), params_path="model.npz")
    est.add_bucket(max_h=256, max_w=320)  # optional second resolution bucket
    out = est.predict(images, cams)       # lists of np arrays / (2,4,4) cams
    out["depth"]                          # (H/4, W/4) metric depth
    out["depth_up"], out["confidence"]    # 4x-upsampled depth, confidence map

Multi-chip: pass mesh="data=2,view=4" (or a prebuilt jax Mesh) and every bucket's
program runs the SPMD pipeline over it — view pairs shard over 'view', the batch over
'data' (SURVEY.md §2.3; parallel/pipeline.py). predict() serves one sample per call,
so with data=N the request is replicated N ways to satisfy the batch sharding and
sample 0 is returned; predict_many() batches several requests through one forward
and is where data>1 does real work (BN statistics are per-sample, so batched
outputs are exactly the single-request outputs). Two-view buckets have no pair
axis; they shard the batch over 'data' only.

The parameter tree is fully convolutional (no shape-dependent weights), so ALL buckets
share the same device-resident params.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence, Union

import numpy as np

from atvsnet_tpu.config import PipelineConfig
from atvsnet_tpu.data.preprocess import prepare_mvs_sample


def _bucket_key(cfg: PipelineConfig) -> PipelineConfig:
    # the frozen config itself: EVERY field participates in the jit cache key
    # (config.py docstring), so two configs differing in any field are distinct
    # buckets — keying on a shape subset silently dropped e.g. inverse_depth
    # overrides and served them from the wrong compiled program
    return cfg


class DepthEstimator:
    """Persistent multi-view depth inference session.

    Equivalent pipeline to cli/eval_pointcloud.py per-image inference
    (reference eval_pointcloud.py:212-397), packaged for reuse: parameters live on
    the device, one compiled program per registered shape bucket, requests routed
    to the smallest bucket that fits (padding up when possible).
    """

    def __init__(
        self,
        cfg: Optional[PipelineConfig] = None,
        params: Optional[dict] = None,
        params_path: Optional[str] = None,
        seed: int = 0,
        with_confidence: bool = True,
        mesh: Union[str, "object", None] = None,
    ):
        from atvsnet_tpu.utils.runtime import setup_jax

        setup_jax()
        import jax
        import jax.numpy as jnp

        from atvsnet_tpu.models.tvsnet import init_params
        from atvsnet_tpu.utils.ckpt import load_params

        self.cfg = cfg or PipelineConfig()
        self.with_confidence = with_confidence and self.cfg.view_num > 2
        self._jax = jax
        self._jnp = jnp

        if isinstance(mesh, str):
            from atvsnet_tpu.parallel.mesh import make_mesh, parse_mesh_spec

            n_data, n_view = parse_mesh_spec(mesh)
            mesh = make_mesh(n_data, n_view)
        self.mesh = mesh

        if params is None:
            if params_path:
                params = load_params(params_path)
            else:
                params = init_params(jax.random.PRNGKey(seed), self.cfg)
        self.params = jax.device_put(params)

        self._programs: dict[tuple, tuple[PipelineConfig, dict]] = {}
        self.add_bucket()  # base bucket from self.cfg

    # ---- bucket registry -------------------------------------------------

    def add_bucket(self, **overrides) -> PipelineConfig:
        """Register (and lazily compile) a shape bucket: cfg.replace(**overrides).

        Returns the bucket's config. Re-registering an existing bucket is a no-op
        (the compiled programs are kept). Each bucket carries two jit wrappers
        (compiled lazily on first use): "raw" for deployment requests whose frames
        are normalized in-jit, "pre" for preprocessed=True requests whose images
        are already normalized.
        """
        c = self.cfg.replace(**overrides) if overrides else self.cfg
        key = _bucket_key(c)
        if key not in self._programs:
            self._programs[key] = (
                c,
                {
                    "raw": self._build_fwd(c, centered=False),
                    "pre": self._build_fwd(c, centered=True),
                },
            )
        return self._programs[key][0]

    @property
    def buckets(self) -> list[PipelineConfig]:
        return [c for c, _ in self._programs.values()]

    def _build_fwd(self, c: PipelineConfig, centered: bool):
        """One jitted program: normalize-on-device (unless `centered`), forward,
        metric conversion, and ONE flat f32 output row per sample.

        Tunneled-device D2H pays a fixed ~270ms RPC setup PER FETCHED ARRAY
        regardless of size (same measurement as cli/eval_pointcloud._prune), so
        the 2-4 output maps ship as a single (B, N) fetch and are sliced back on
        the host by _unpack — measured p50 1.53s -> sub-second per request at the
        480x896 flagship bucket. centered=False additionally ships the frames RAW
        (typically uint8, 1/4 the H2D bytes) and variance-normalizes in-jit
        (models.atvsnet.center_images), like the eval driver."""
        import jax
        import jax.numpy as jnp

        from atvsnet_tpu.models.atvsnet import (
            center_images,
            multi_view_forward,
            sweep_to_depth,
        )
        from atvsnet_tpu.models.tvsnet import two_view_forward

        with_conf = self.with_confidence and c.view_num > 2

        def _pack(out):
            parts = [
                sweep_to_depth(out["depth"], c.inverse_depth),
                sweep_to_depth(out["depth_up"], c.inverse_depth),
            ]
            if with_conf and "confidence" in out:
                parts += [out["confidence"], out["confidence_up"]]
            b = parts[0].shape[0]
            return jnp.concatenate(
                [p.astype(jnp.float32).reshape(b, -1) for p in parts], axis=1
            )

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = self.mesh
            shardings = (
                NamedSharding(mesh, P()),
                NamedSharding(mesh, P("data")),
                NamedSharding(mesh, P("data")),
            )
            if c.view_num == 2:
                # no pair axis to shard — the two-view program still shards the
                # batch over 'data' so a meshed estimator never silently runs
                # unsharded (predict() tiles the sample to the data extent)

                def fwd2(p, images, cams):
                    if not centered:
                        images = center_images(images)
                    return _pack(two_view_forward(p, images, cams, c))

                return jax.jit(fwd2, in_shardings=shardings)

            from atvsnet_tpu.parallel.pipeline import multi_view_forward_spmd

            def fwd(p, images, cams):
                if not centered:
                    images = center_images(images)
                return _pack(
                    multi_view_forward_spmd(p, images, cams, c, mesh=mesh, out_prob_map=with_conf)
                )

            return jax.jit(fwd, in_shardings=shardings)

        if c.view_num == 2:

            def fwd(p, images, cams):
                if not centered:
                    images = center_images(images)
                return _pack(two_view_forward(p, images, cams, c))

            return jax.jit(fwd)

        def fwd(p, images, cams):
            if not centered:
                images = center_images(images)
            return _pack(multi_view_forward(p, images, cams, c, out_prob_map=with_conf))

        return jax.jit(fwd)

    def _unpack(self, c: PipelineConfig, packed) -> list[dict]:
        """Host side of _build_fwd's _pack: slice the (B, N) row back into maps."""
        packed = np.asarray(packed, np.float32)
        H, W = c.max_h, c.max_w
        h, w = int(H * c.sample_scale), int(W * c.sample_scale)
        with_conf = self.with_confidence and c.view_num > 2
        names = ["depth", "depth_up"] + (
            ["confidence", "confidence_up"] if with_conf else []
        )
        shapes = [(h, w), (H, W)] * (2 if with_conf else 1)
        results = []
        for b in range(packed.shape[0]):
            row, off, maps = packed[b], 0, {}
            for name, shape in zip(names, shapes):
                size = shape[0] * shape[1]
                maps[name] = row[off : off + size].reshape(shape)
                off += size
            results.append(maps)
        return results

    def _data_extent(self) -> int:
        """Size of the mesh's 'data' axis (1 without a mesh): single-sample requests
        are tiled to this extent so the sharded program's batch axis is divisible."""
        return self.mesh.shape["data"] if self.mesh is not None else 1

    def _route(self, h: int, w: int) -> tuple[PipelineConfig, object]:
        """Smallest registered bucket that fits (pad up); else the largest bucket
        (prepare_mvs_sample downscales into it)."""
        fitting = [
            (c.max_h * c.max_w, c, f)
            for c, f in self._programs.values()
            if c.max_h >= h and c.max_w >= w
        ]
        if fitting:
            return min(fitting, key=lambda t: t[0])[1:]
        return max(
            ((c.max_h * c.max_w, c, f) for c, f in self._programs.values()),
            key=lambda t: t[0],
        )[1:]

    # ---- inference -------------------------------------------------------

    def warmup(self, all_buckets: bool = False, include_pre: bool = False) -> float:
        """Compile (and once-execute) the deployment ("raw" uint8-input) program(s)
        on synthetic inputs; returns seconds.

        include_pre=True also compiles the "pre" (preprocessed=True) wrapper for
        each warmed bucket; without it, preprocessed requests pay their compile
        lazily on first use (the two wrappers share the core program, so the
        incremental cost is the thin normalization-free entry, not a full
        recompile)."""
        t0 = time.perf_counter()
        for c, fwds in list(self._programs.values()):
            rng = np.random.RandomState(0)
            images = rng.randint(
                0, 255, size=(1, c.view_num, c.max_h, c.max_w, 3)
            ).astype(np.uint8)
            cam = np.zeros((2, 4, 4), np.float32)
            cam[0] = np.eye(4)
            cam[1, :3, :3] = np.array(
                [[c.max_w, 0, c.max_w / 2], [0, c.max_w, c.max_h / 2], [0, 0, 1]]
            )
            cam[1, 3] = (0.4, 0.6 / c.max_d, c.max_d, 1.0)
            cams = np.broadcast_to(cam, (1, c.view_num, 2, 4, 4)).copy()
            nd = self._data_extent()
            if nd > 1:
                images = np.concatenate([images] * nd, axis=0)
                cams = np.concatenate([cams] * nd, axis=0)
            out = fwds["raw"](self.params, self._jnp.asarray(images), self._jnp.asarray(cams))
            np.asarray(out)
            if include_pre:
                out = fwds["pre"](
                    self.params,
                    self._jnp.asarray(images.astype(np.float32)),
                    self._jnp.asarray(cams),
                )
                np.asarray(out)
            if not all_buckets:
                break
        return time.perf_counter() - t0

    def predict(
        self,
        images: Sequence[np.ndarray],
        cams: Sequence[np.ndarray],
        preprocessed: bool = False,
    ) -> dict:
        """[ref, view...] images (H, W, 3) + MVSNet-convention cams (2, 4, 4) -> depths.

        Fewer than the bucket's view_num views are padded with the reference (the
        reference driver's fallback, eval_pointcloud.py:115-121); extra views are
        truncated. The request is routed to the smallest registered bucket that fits
        the input resolution. Returns numpy arrays cropped to the valid (un-padded)
        region:
          depth          (h, w)   metric depth at cost-volume resolution
          depth_up       (H, W)   metric depth at input resolution (4x)
          confidence(_up)         probability maps (multi-view only)
          runtime_s               device execution time for this call
          bucket         (max_h, max_w) of the program that served the request
        """
        h, w = images[0].shape[:2]
        c, fwds = self._route(h, w)
        if preprocessed:
            # preprocessed inputs must match a compiled bucket exactly: off-bucket
            # shapes would silently compile a new program per shape, and
            # non-32-multiple shapes fail with a deep U-Net shape error
            if not any(b.max_h == h and b.max_w == w for b in self.buckets):
                raise ValueError(
                    f"preprocessed input is {h}x{w}, but the registered buckets are "
                    f"{[(b.max_h, b.max_w) for b in self.buckets]}; add_bucket"
                    f"(max_h={h}, max_w={w}) first, or use preprocessed=False"
                )
            images = list(images)[: c.view_num]
            cams = [np.copy(cm) for cm in cams[: c.view_num]]
            for v, im in enumerate(images):
                if im.shape[:2] != (c.max_h, c.max_w):
                    raise ValueError(
                        f"preprocessed view {v} has shape {im.shape[:2]}, expected "
                        f"({c.max_h}, {c.max_w}) — all views must match the bucket"
                    )
            # view-padding applies to this path too (preprocessed inputs skip only
            # the scaling/cropping/normalization, not the view-count contract)
            while len(images) < c.view_num:
                images.append(images[0])
                cams.append(np.copy(cams[0]))
            batch = {
                "images": np.stack(images)[None].astype(np.float32),
                "cams": np.stack(cams)[None].astype(np.float32),
                "valid_hw": (images[0].shape[0], images[0].shape[1]),
            }
            fwd = fwds["pre"]
        else:
            # center=False: the raw (typically uint8) stack ships as-is and the
            # "raw" program variance-normalizes in-jit — 1/4 the H2D bytes
            batch = prepare_mvs_sample(
                list(images), list(cams), c.view_num, max_d=c.max_d,
                max_h=c.max_h, max_w=c.max_w, sample_scale=c.sample_scale,
                inverse_depth=c.inverse_depth, center=False,
            )
            fwd = fwds["raw"]
        jnp = self._jnp
        nd = self._data_extent()
        if nd > 1:
            # the sharded program needs a batch divisible by the 'data' axis;
            # replicate the single request and read back sample 0
            batch["images"] = np.concatenate([batch["images"]] * nd, axis=0)
            batch["cams"] = np.concatenate([batch["cams"]] * nd, axis=0)
        t0 = time.perf_counter()
        packed = fwd(self.params, jnp.asarray(batch["images"]), jnp.asarray(batch["cams"]))
        maps = self._unpack(c, packed)[0]  # one fetch; sample 0 of any replicas
        runtime = time.perf_counter() - t0

        vh, vw = batch["valid_hw"]
        s = c.sample_scale
        res = {
            "depth": maps["depth"][: int(vh * s), : int(vw * s)],
            "depth_up": maps["depth_up"][:vh, :vw],
            "runtime_s": runtime,
            "bucket": (c.max_h, c.max_w),
        }
        if "confidence" in maps:
            res["confidence"] = maps["confidence"][: int(vh * s), : int(vw * s)]
            res["confidence_up"] = maps["confidence_up"][:vh, :vw]
        return res

    def predict_many(
        self,
        requests: Sequence[tuple[Sequence[np.ndarray], Sequence[np.ndarray]]],
    ) -> list[dict]:
        """Serve several (images, cams) requests through ONE batched forward.

        All requests route to a single bucket (the smallest fitting the largest
        request); the batch pads up to a multiple of the mesh's 'data' extent
        (padding replicates the last request). This is where the 'data' axis does
        real work — predict() can only replicate a single sample over it. Each
        request may have its own resolution/view count (per-sample prep pads
        exactly like predict). Returns one predict()-shaped dict per request;
        runtime_s on each is the whole batch's device time.

        jax.jit specializes per batch size, so the first call at a new request
        count compiles a program for that batch (subsequent calls at any
        previously-seen count reuse theirs; keep request counts bucketed upstream
        for a bounded program set).
        """
        if not requests:
            return []
        h = max(imgs[0].shape[0] for imgs, _ in requests)
        w = max(imgs[0].shape[1] for imgs, _ in requests)
        c, fwds = self._route(h, w)
        prepared = [
            prepare_mvs_sample(
                list(imgs), list(cms), c.view_num, max_d=c.max_d,
                max_h=c.max_h, max_w=c.max_w, sample_scale=c.sample_scale,
                inverse_depth=c.inverse_depth, center=False,
            )
            for imgs, cms in requests
        ]
        n_real = len(prepared)
        nd = self._data_extent()
        while len(prepared) % nd:
            prepared.append(prepared[-1])
        images = np.concatenate([b["images"] for b in prepared], axis=0)
        cams = np.concatenate([b["cams"] for b in prepared], axis=0)

        jnp = self._jnp
        t0 = time.perf_counter()
        packed = fwds["raw"](self.params, jnp.asarray(images), jnp.asarray(cams))
        all_maps = self._unpack(c, packed)  # one fetch for the whole batch
        runtime = time.perf_counter() - t0

        s = c.sample_scale
        results = []
        for b in range(n_real):
            vh, vw = prepared[b]["valid_hw"]
            maps = all_maps[b]
            res = {
                "depth": maps["depth"][: int(vh * s), : int(vw * s)],
                "depth_up": maps["depth_up"][:vh, :vw],
                "runtime_s": runtime,
                "bucket": (c.max_h, c.max_w),
            }
            if "confidence" in maps:
                res["confidence"] = maps["confidence"][: int(vh * s), : int(vw * s)]
                res["confidence_up"] = maps["confidence_up"][:vh, :vw]
            results.append(res)
        return results

    def predict_paths(self, paths: Sequence[str]) -> dict:
        """Alternating [img, cam.txt, img, cam.txt, ...] file paths -> predict()."""
        import cv2

        from atvsnet_tpu.data.cams import load_cam

        images = []
        for v in range(len(paths) // 2):
            im = cv2.imread(paths[2 * v])
            if im is None:  # cv2.imread returns None instead of raising
                raise FileNotFoundError(f"could not read image: {paths[2 * v]}")
            images.append(im)
        cams = [load_cam(paths[2 * v + 1], max_d=self.cfg.max_d) for v in range(len(paths) // 2)]
        return self.predict(images, cams)
