"""Coverage for less-traveled branches: warp_ref cost volumes, cam txt variants,
view padding in the sample loader."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from atvsnet_tpu.config import PipelineConfig
from atvsnet_tpu.data.cams import load_cam_text
from atvsnet_tpu.models.tvsnet import build_cost_volume, init_params

from tests._utils import synthetic_scene

CFG = PipelineConfig(view_num=2, max_d=8, max_h=32, max_w=32)


class TestWarpRefCostVolume:
    def test_warp_ref_branch(self):
        """warp_ref=True warps the reference feature by ref->ref homographies
        (reference model.py:175-184); with identical cams these are identity, so the
        interior must match the tiled branch."""
        rng = np.random.RandomState(0)
        feat = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
        images, cams = synthetic_scene(view_num=2, H=32, W=32, D=8)
        cams = jnp.asarray(cams)
        ds, di = jnp.array([0.5]), jnp.array([0.05])

        tiled, _ = build_cost_volume(feat, feat, cams[:, 0], cams[:, 0], CFG, ds, di, warp_ref=False)
        warped, _ = build_cost_volume(feat, feat, cams[:, 0], cams[:, 0], CFG, ds, di, warp_ref=True)
        assert warped.shape == tiled.shape == (1, 8, 8, 8, 8)
        np.testing.assert_allclose(
            np.asarray(warped)[:, :, :7, :7], np.asarray(tiled)[:, :, :7, :7], atol=1e-4
        )


class TestCamTxt30Words:
    def test_30_word_variant(self):
        txt = (
            "extrinsic\n1 0 0 0\n0 1 0 0\n0 0 1 0\n0 0 0 1\n\n"
            "intrinsic\n100 0 32\n0 100 24\n0 0 1\n\n"
            "0.5 0.05 64\n"
        )
        cam = load_cam_text(txt)
        np.testing.assert_allclose(cam[1][3], [0.5, 0.05, 64, 0.5 + 0.05 * 64])


class TestSamplePadding:
    def test_fewer_neighbors_padded_with_ref(self, tmp_path):
        """load_mvs_sample pads missing views with the reference view
        (reference eval_pointcloud.py:115-121)."""
        cv2 = pytest.importorskip("cv2")
        from atvsnet_tpu.data.cams import write_cam
        from atvsnet_tpu.data.preprocess import load_mvs_sample
        from tests._utils import make_cam

        rng = np.random.RandomState(0)
        H, W = 64, 96
        K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1.0]])
        paths = []
        for v in range(2):  # only ref + 1 neighbor available
            img_p = str(tmp_path / f"{v:08d}.jpg")
            cam_p = str(tmp_path / f"{v:08d}_cam.txt")
            cv2.imwrite(img_p, rng.randint(0, 255, (H, W, 3)).astype(np.uint8))
            write_cam(cam_p, make_cam(K, np.eye(3), np.array([0.1 * v, 0, 0]), 2.0, 0.5, 8))
            paths += [img_p, cam_p]

        sample = load_mvs_sample(paths, view_num=4, max_d=8, max_h=H, max_w=W)
        assert sample["images"].shape == (1, 4, H, W, 3)
        # views 2,3 are copies of the reference view
        np.testing.assert_array_equal(sample["images"][0, 2], sample["images"][0, 0])
        np.testing.assert_array_equal(sample["cams"][0, 3], sample["cams"][0, 0])
