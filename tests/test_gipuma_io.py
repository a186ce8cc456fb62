"""Generic gipuma readers + from-P camera path (fusibile/fileIoUtils.h parity)."""

import numpy as np
import pytest

from atvsnet_tpu.data.gipuma_io import (
    decompose_projection,
    read_kitti_calib,
    read_middlebury_krt,
    read_pmvs_p_file,
    read_strecha_camera,
)
from atvsnet_tpu.fusion.consistency import camera_geometry, fuse_depth_maps

from tests._utils import rotation
from tests.test_fusion import plane_scene


def _random_camera(seed=0):
    rng = np.random.RandomState(seed)
    K = np.array([
        [500.0 + rng.rand() * 100, 2.0 * rng.rand(), 320.0 + rng.randn()],
        [0.0, 480.0 + rng.rand() * 100, 240.0 + rng.randn()],
        [0.0, 0.0, 1.0],
    ])
    R = rotation(rng.randn(3), 0.3 * rng.rand())
    t = rng.randn(3)
    return K, R, t


class TestDecomposeProjection:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_roundtrip(self, seed):
        K, R, t = _random_camera(seed)
        P = K @ np.concatenate([R, t[:, None]], axis=1)
        K2, R2, t2 = decompose_projection(P)
        np.testing.assert_allclose(K2, K, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(R2, R, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(t2, t, rtol=1e-9, atol=1e-8)

    def test_scale_invariant(self):
        K, R, t = _random_camera(7)
        P = K @ np.concatenate([R, t[:, None]], axis=1)
        K2, R2, t2 = decompose_projection(-3.5 * P)
        np.testing.assert_allclose(K2, K, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(R2, R, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(t2, t, rtol=1e-9, atol=1e-8)

    def test_bad_shape(self):
        with pytest.raises(ValueError):
            decompose_projection(np.eye(3))


class TestReaders:
    def test_kitti_calib(self, tmp_path):
        K, R, t = _random_camera(1)
        P0 = K @ np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
        P1 = K @ np.concatenate([R, t[:, None]], axis=1)
        path = tmp_path / "calib.txt"
        lines = []
        for label, P in (("P0:", P0), ("P1:", P1)):
            lines.append(label + " " + " ".join(f"{v:.12e}" for v in P.reshape(-1)))
        path.write_text("\n".join(lines) + "\n")
        r0, r1 = read_kitti_calib(str(path))
        np.testing.assert_allclose(r0, P0, rtol=1e-10)
        np.testing.assert_allclose(r1, P1, rtol=1e-10)

    def test_pmvs_p_file_skips_contour(self, tmp_path):
        K, R, t = _random_camera(2)
        P = K @ np.concatenate([R, t[:, None]], axis=1)
        path = tmp_path / "0000.txt"
        rows = "\n".join(" ".join(f"{v:.12e}" for v in row) for row in P)
        path.write_text("CONTOUR\n" + rows + "\n")
        np.testing.assert_allclose(read_pmvs_p_file(str(path)), P, rtol=1e-10)

    def test_strecha_camera_focal(self, tmp_path):
        path = tmp_path / "img.camera"
        path.write_text("2759.48 0 1520.69\n0 2764.16 1006.81\n0 0 1\n")
        assert read_strecha_camera(str(path)) == pytest.approx(2759.48)

    def test_middlebury_krt(self, tmp_path):
        names = ["a.png", "b.png"]
        lines = ["2"]
        Ps = {}
        for i, n in enumerate(names):
            K, R, t = _random_camera(10 + i)
            K[0, 1] = 0.0  # middlebury tables carry zero skew
            Ps[n] = K @ np.concatenate([R, t[:, None]], axis=1)
            vals = np.concatenate([K.reshape(-1), R.reshape(-1), t])
            lines.append(n + " " + " ".join(f"{v:.12e}" for v in vals))
        path = tmp_path / "krt.txt"
        path.write_text("\n".join(lines) + "\n")
        # reversed order: matched by NAME, not file position (fileIoUtils.h:137-143)
        out = read_middlebury_krt(str(path), names[::-1])
        np.testing.assert_allclose(out[0], Ps[names[1]], rtol=1e-10)
        np.testing.assert_allclose(out[1], Ps[names[0]], rtol=1e-10)
        with pytest.raises(KeyError):
            read_middlebury_krt(str(path), ["missing.png"])


class TestFromPFusion:
    def test_matches_cams_path(self):
        depths, images, cams = plane_scene(V=3)
        cams64 = np.asarray(cams, np.float64)
        P = cams64[:, 1, :3, :3] @ cams64[:, 0, :3, :4]
        p1, c1 = fuse_depth_maps(depths, images, cams)
        p2, c2 = fuse_depth_maps(depths, images, P_matrices=P)
        assert p1.shape == p2.shape
        np.testing.assert_allclose(p2, p1, atol=1e-5)
        np.testing.assert_array_equal(c2, c1)

    def test_exactly_one_camera_input(self):
        depths, images, cams = plane_scene(V=3)
        with pytest.raises(ValueError):
            fuse_depth_maps(depths, images)
        with pytest.raises(ValueError):
            fuse_depth_maps(depths, images, cams, P_matrices=np.zeros((3, 3, 4)))
