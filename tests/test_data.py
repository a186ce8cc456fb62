"""Data layer + metrics tests, including oracles from the reference's committed data."""

import os

import numpy as np
import pytest

from atvsnet_tpu.data.pfm import load_pfm, save_pfm
from atvsnet_tpu.data.cams import load_cam_text, write_cam, load_cam, projection_matrix
from atvsnet_tpu.data.preprocess import (
    center_image,
    crop_mvs_input,
    load_example_dir,
    to_inverse_depth_range,
)
from atvsnet_tpu.eval.errors import calc_error, error_dict

REF = "/root/reference"


class TestPFM:
    def test_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        img = rng.rand(7, 9).astype(np.float32)
        p = str(tmp_path / "x.pfm")
        save_pfm(p, img)
        out = load_pfm(p)
        np.testing.assert_array_equal(out, img)

    def test_roundtrip_color(self, tmp_path):
        rng = np.random.RandomState(1)
        img = rng.rand(5, 4, 3).astype(np.float32)
        p = str(tmp_path / "c.pfm")
        save_pfm(p, img)
        np.testing.assert_array_equal(load_pfm(p), img)


class TestCams:
    CAM_TXT = (
        "extrinsic\n"
        "1 0 0 0.5\n0 1 0 -0.25\n0 0 1 2.0\n0 0 0 1\n\n"
        "intrinsic\n"
        "100 0 32\n0 100 24\n0 0 1\n\n"
        "0.5 0.05 64 3.7\n"
    )

    def test_load_31_words(self):
        cam = load_cam_text(self.CAM_TXT)
        assert cam[0][0][3] == 0.5
        assert cam[1][0][0] == 100
        np.testing.assert_allclose(cam[1][3], [0.5, 0.05, 64, 3.7])

    def test_load_29_words_fills_depth_row(self):
        txt = self.CAM_TXT.rsplit("\n", 2)[0] + "\n0.5 0.05\n"
        cam = load_cam_text(txt, max_d=128)
        np.testing.assert_allclose(cam[1][3], [0.5, 0.05, 128, 0.5 + 0.05 * 128])

    def test_write_read_roundtrip(self, tmp_path):
        cam = load_cam_text(self.CAM_TXT)
        p = str(tmp_path / "cam.txt")
        write_cam(p, cam)
        cam2 = load_cam(p)
        np.testing.assert_allclose(cam2, cam)

    def test_projection_matrix(self):
        cam = load_cam_text(self.CAM_TXT)
        P = projection_matrix(cam)
        assert P.shape == (3, 4)
        K = np.array(cam[1][:3, :3])
        E = np.array(cam[0][:3, :])
        np.testing.assert_allclose(P, K @ E)


class TestPreprocess:
    def test_center_image(self):
        rng = np.random.RandomState(0)
        img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        out = center_image(img)
        np.testing.assert_allclose(out.mean(axis=(0, 1)), 0.0, atol=1e-4)
        np.testing.assert_allclose(out.std(axis=(0, 1)), 1.0, atol=1e-3)

    def test_crop_to_32_multiple_shifts_principal_point(self):
        img = np.zeros((70, 100, 3), np.uint8)
        cam = np.zeros((2, 4, 4))
        cam[1][0][2] = 50.0
        cam[1][1][2] = 35.0
        images, cams = crop_mvs_input([img], [cam], max_h=64, max_w=96)
        assert images[0].shape[:2] == (64, 96)
        assert cams[0][1][0][2] == 50.0 - 2  # start_w = (100-96)//2
        assert cams[0][1][1][2] == 35.0 - 3  # start_h = (70-64)//2

    def test_inverse_depth_conversion(self):
        cam = np.zeros((2, 4, 4))
        cam[1][3] = [2.0, 0.1, 128, 2.0 + 0.1 * 128]  # metric range [2, 14.8]
        out = to_inverse_depth_range(cam, 128)
        assert out[1][3][0] == pytest.approx(1.0 / 14.8)
        assert out[1][3][3] == pytest.approx(0.5)
        assert out[1][3][1] == pytest.approx((0.5 - 1.0 / 14.8) / 128)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data not mounted")
class TestAgainstReferenceData:
    def test_load_example_dir(self):
        images, cams, gt = load_example_dir(os.path.join(REF, "example", "0"), 5)
        assert images.shape == (1, 5, 640, 960, 3)
        assert cams.shape == (1, 5, 2, 4, 4)
        assert gt.shape == (640, 960, 1)
        # bundled cams carry an inverse-depth sweep at 1/4-scale intrinsics
        assert cams[0, 0, 1, 0, 2] < 960 / 2

    def test_calc_error_reproduces_committed_metrics(self):
        """Committed pred.npy vs 0_gt.npy must reproduce error.xlsx values
        (BASELINE.md table, written by reference example.py:196-213)."""
        pred = np.load(os.path.join(REF, "example", "0", "result", "pred.npy"))
        gt = np.load(os.path.join(REF, "example", "0", "0_gt.npy"))
        errors, _ = calc_error(np.squeeze(pred), np.squeeze(gt))
        d = error_dict(errors)
        assert d["mae"] == pytest.approx(0.196658, rel=1e-3)
        assert d["rmse"] == pytest.approx(0.559172, rel=1e-3)
        assert d["inverse_mae"] == pytest.approx(0.003636, rel=1e-2)
        assert d["scale_invariant_log"] == pytest.approx(0.051532, rel=1e-3)
        assert d["inlier_ratios_1"] == pytest.approx(0.742847, rel=1e-3)
        assert d["inlier_ratios_10"] == pytest.approx(0.988123, rel=1e-3)
