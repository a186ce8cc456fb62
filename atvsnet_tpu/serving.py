"""In-process serving API: load weights once, serve depth maps from one compiled program.

The reference has no serving story — its drivers rebuild the TF graph and restore the
checkpoint per process (reference atvsnet/example.py:51-302). Here a `DepthEstimator`
holds device-resident parameters and ONE jit-compiled N-view program per shape bucket;
every request in the bucket reuses it (first call compiles, subsequent calls are pure
device execution). Built for deployment loops: feed scenes as in-memory arrays or
file paths, get metric depth + confidence back, already un-padded.

    est = DepthEstimator(PipelineConfig(view_num=5), params_path="model.npz")
    out = est.predict(images, cams)       # lists of np arrays / (2,4,4) cams
    out["depth"]                          # (H/4, W/4) metric depth
    out["depth_up"], out["confidence"]    # 4x-upsampled depth, confidence map
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np

from atvsnet_tpu.config import PipelineConfig
from atvsnet_tpu.data.preprocess import prepare_mvs_sample


class DepthEstimator:
    """Persistent multi-view depth inference session.

    Equivalent pipeline to cli/eval_pointcloud.py per-image inference
    (reference eval_pointcloud.py:212-397), packaged for reuse: parameters live on
    the device, the forward is compiled once per PipelineConfig bucket.
    """

    def __init__(
        self,
        cfg: Optional[PipelineConfig] = None,
        params: Optional[dict] = None,
        params_path: Optional[str] = None,
        seed: int = 0,
        with_confidence: bool = True,
    ):
        from atvsnet_tpu.utils.runtime import setup_jax

        setup_jax()
        import jax
        import jax.numpy as jnp

        from atvsnet_tpu.models.atvsnet import multi_view_forward, sweep_to_depth
        from atvsnet_tpu.models.tvsnet import init_params, two_view_forward
        from atvsnet_tpu.utils.ckpt import load_params

        self.cfg = cfg or PipelineConfig()
        self.with_confidence = with_confidence and self.cfg.view_num > 2
        self._jax = jax
        self._jnp = jnp

        if params is None:
            if params_path:
                params = load_params(params_path)
            else:
                params = init_params(jax.random.PRNGKey(seed), self.cfg)
        self.params = jax.device_put(params)

        c = self.cfg
        if c.view_num == 2:

            def fwd(p, images, cams):
                out = two_view_forward(p, images, cams, c)
                return {
                    "depth": sweep_to_depth(out["depth"], c.inverse_depth),
                    "depth_up": sweep_to_depth(out["depth_up"], c.inverse_depth),
                }

        else:

            def fwd(p, images, cams):
                out = multi_view_forward(p, images, cams, c, out_prob_map=self.with_confidence)
                # metric conversion inside the jitted program: no extra host/device
                # round trip of the full-resolution maps per request
                keep = {
                    "depth": sweep_to_depth(out["depth"], c.inverse_depth),
                    "depth_up": sweep_to_depth(out["depth_up"], c.inverse_depth),
                }
                if self.with_confidence:
                    keep["confidence"] = out["confidence"]
                    keep["confidence_up"] = out["confidence_up"]
                return keep

        self._fwd = jax.jit(fwd)

    def warmup(self) -> float:
        """Compile (and once-execute) the program on synthetic inputs; returns seconds."""
        c = self.cfg
        rng = np.random.RandomState(0)
        images = rng.rand(1, c.view_num, c.max_h, c.max_w, 3).astype(np.float32)
        cam = np.zeros((2, 4, 4), np.float32)
        cam[0] = np.eye(4)
        cam[1, :3, :3] = np.array([[c.max_w, 0, c.max_w / 2], [0, c.max_w, c.max_h / 2], [0, 0, 1]])
        cam[1, 3] = (0.4, 0.6 / c.max_d, c.max_d, 1.0)
        cams = np.broadcast_to(cam, (1, c.view_num, 2, 4, 4)).copy()
        t0 = time.perf_counter()
        out = self._fwd(self.params, self._jnp.asarray(images), self._jnp.asarray(cams))
        np.asarray(out["depth"])
        return time.perf_counter() - t0

    def predict(
        self,
        images: Sequence[np.ndarray],
        cams: Sequence[np.ndarray],
        preprocessed: bool = False,
    ) -> dict:
        """[ref, view...] images (H, W, 3) + MVSNet-convention cams (2, 4, 4) -> depths.

        Fewer than cfg.view_num views are padded with the reference (the reference
        driver's fallback, eval_pointcloud.py:115-121). Returns numpy arrays cropped
        to the valid (un-padded) region:
          depth          (h, w)   metric depth at cost-volume resolution
          depth_up       (H, W)   metric depth at input resolution (4x)
          confidence(_up)         probability maps (multi-view only)
          runtime_s               device execution time for this call
        """
        c = self.cfg
        if preprocessed:
            images = list(images)
            cams = [np.copy(cm) for cm in cams]
            # preprocessed inputs must match the compiled bucket exactly: off-bucket
            # shapes would trigger a silent per-shape recompile, and non-32-multiple
            # shapes fail with a deep U-Net shape error instead of this message
            for v, im in enumerate(images):
                if im.shape[:2] != (c.max_h, c.max_w):
                    raise ValueError(
                        f"preprocessed view {v} has shape {im.shape[:2]}, but this "
                        f"estimator is compiled for ({c.max_h}, {c.max_w}); resize/pad "
                        "the inputs or use preprocessed=False for host preparation"
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
        else:
            batch = prepare_mvs_sample(
                list(images), list(cams), c.view_num, max_d=c.max_d,
                max_h=c.max_h, max_w=c.max_w, sample_scale=c.sample_scale,
                inverse_depth=c.inverse_depth,
            )
        jnp = self._jnp
        t0 = time.perf_counter()
        out = self._fwd(self.params, jnp.asarray(batch["images"]), jnp.asarray(batch["cams"]))
        depth = np.asarray(out["depth"], np.float32)  # already metric (fwd converts)
        runtime = time.perf_counter() - t0

        vh, vw = batch["valid_hw"]
        s = c.sample_scale
        res = {
            "depth": depth[0, : int(vh * s), : int(vw * s), 0],
            "depth_up": np.asarray(out["depth_up"], np.float32)[0, :vh, :vw, 0],
            "runtime_s": runtime,
        }
        if "confidence" in out:
            res["confidence"] = np.asarray(out["confidence"], np.float32)[
                0, : int(vh * s), : int(vw * s), 0
            ]
            res["confidence_up"] = np.asarray(out["confidence_up"], np.float32)[0, :vh, :vw, 0]
        return res

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
