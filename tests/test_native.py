"""Native C++ host runtime vs numpy fallback equivalence."""

import numpy as np
import pytest

import atvsnet_tpu.native as native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestCompact:
    def test_matches_numpy(self, lib):
        rng = np.random.RandomState(0)
        n = 10007
        mask = rng.rand(n) > 0.5
        pts = rng.randn(n, 3).astype(np.float32)
        pts[17] = np.inf  # non-finite zeroing path
        cols = (rng.rand(n, 3) * 300 - 20).astype(np.float32)  # tests clipping

        out_p, out_c = native.compact_points(mask, pts, cols)
        assert out_p.shape[0] == mask.sum()

        ref_p = pts[mask].copy()
        ref_p[~np.isfinite(ref_p)] = 0.0
        ref_c = np.clip(cols[mask], 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(out_p, ref_p)
        # uint8 conversion truncates in C (cast) and in numpy astype — equal
        np.testing.assert_array_equal(out_c, ref_c)

    def test_empty_mask(self, lib):
        out_p, out_c = native.compact_points(
            np.zeros(100, bool), np.zeros((100, 3), np.float32), np.zeros((100, 3), np.float32)
        )
        assert out_p.shape == (0, 3)


class TestCompactBackproject:
    def _scene(self, seed=0, H=37, W=53):
        rng = np.random.RandomState(seed)
        packed = np.zeros((H, W, 4), np.uint8)
        packed[..., 0] = rng.rand(H, W) > 0.5
        packed[..., 1:] = rng.randint(0, 256, (H, W, 3))
        depth = (1.0 + rng.rand(H, W)).astype(np.float32)
        K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1.0]])
        R = np.eye(3)
        t = np.array([0.1, -0.2, 0.3])
        P = K @ np.hstack([R, t[:, None]])
        Minv = np.linalg.inv(P[:, :3])
        P4 = P[:, 3]
        return packed, depth, Minv, P4

    def test_matches_numpy_fallback(self, lib, monkeypatch):
        packed, depth, Minv, P4 = self._scene()
        out_p, out_c = native.compact_backproject(packed, depth, Minv, P4)
        monkeypatch.setattr(native, "get_lib", lambda: None)
        ref_p, ref_c = native.compact_backproject(packed, depth, Minv, P4)
        assert out_p.shape == ref_p.shape
        np.testing.assert_allclose(out_p, ref_p, rtol=0, atol=0)  # both double->f32
        np.testing.assert_array_equal(out_c, ref_c)

    def test_backprojection_geometry(self, lib):
        # every emitted point must reproject to its own pixel: P @ [X,1] = d*(x,y,1)
        packed, depth, Minv, P4 = self._scene(seed=3)
        H, W = depth.shape
        pts, _ = native.compact_backproject(packed, depth, Minv, P4)
        idx = np.flatnonzero(packed[..., 0].reshape(-1))
        M = np.linalg.inv(Minv)
        proj = pts @ M.T + P4
        d = depth.reshape(-1)[idx]
        np.testing.assert_allclose(proj[:, 2], d, rtol=1e-5)
        np.testing.assert_allclose(proj[:, 0] / proj[:, 2], idx % W, atol=1e-3)
        np.testing.assert_allclose(proj[:, 1] / proj[:, 2], idx // W, atol=1e-3)

    def test_empty(self, lib):
        packed = np.zeros((8, 9, 4), np.uint8)
        pts, cols = native.compact_backproject(
            packed, np.ones((8, 9), np.float32), np.eye(3), np.zeros(3)
        )
        assert pts.shape == (0, 3) and cols.shape == (0, 3)


class TestNativePly:
    def test_roundtrip_via_reader(self, lib, tmp_path):
        from atvsnet_tpu.fusion.ply import read_ply

        rng = np.random.RandomState(1)
        pts = rng.randn(1000, 3).astype(np.float32)
        cols = rng.randint(0, 256, (1000, 3)).astype(np.uint8)
        p = str(tmp_path / "n.ply")
        assert native.write_ply_native(p, pts, cols)
        pts2, cols2 = read_ply(p)
        np.testing.assert_array_equal(pts2, pts)
        np.testing.assert_array_equal(cols2, cols)
