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
