"""End-to-end integration: fabricated ETH3D-format scene -> eval driver -> fusion -> PLY.

Exercises the whole reproduce_pc.sh-equivalent chain (reference atvsnet/reproduce_pc.sh)
on CPU at tiny shapes: pair.txt parsing, adaptive scale/crop, N-view inference, PFM/cam
artifact emission, probability filtering and consistency fusion.
"""

import os

import numpy as np
import pytest

from atvsnet_tpu.data.cams import write_cam
from atvsnet_tpu.fusion.fuse import fuse_scene
from atvsnet_tpu.fusion.ply import read_ply

from tests._utils import make_cam, rotation

cv2 = pytest.importorskip("cv2")

VIEW_NUM = 3
H, W = 96, 128  # input images; cost volume at 24x32
D = 8


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    scene = root / "eth3d" / "mini"
    (scene / "images").mkdir(parents=True)
    (scene / "cams").mkdir()

    rng = np.random.RandomState(0)
    # full-res intrinsics (load_mvs_sample scales by sample_scale itself)
    K = np.array([[W / 2.0, 0, W / 2.0], [0, W / 2.0, H / 2.0], [0, 0, 1.0]])
    pair_entries = []
    for v in range(VIEW_NUM):
        img = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
        cv2.imwrite(str(scene / "images" / f"{v:08d}.jpg"), img)
        R = rotation([0, 1, 0.05], 0.03 * v)
        t = np.array([0.1 * v, 0.0, 0.0])
        cam = make_cam(K, R, t, depth_start=2.0, depth_interval=0.5, num_d=D)
        write_cam(str(scene / "cams" / f"{v:08d}_cam.txt"), cam)
        others = [str(o) for o in range(VIEW_NUM) if o != v]
        pair_entries.append(
            f"{v}\n{len(others)} " + " ".join(f"{o} 10.0" for o in others) + "\n"
        )
    with open(scene / "pair.txt", "w") as f:
        f.write(f"{VIEW_NUM}\n" + "".join(pair_entries))
    return str(root)


def test_eval_and_fusion_end_to_end(scene_dir, tmp_path):
    from atvsnet_tpu.cli.eval_pointcloud import run_eval_pc

    savepath = str(tmp_path / "eval_out")
    run_eval_pc(
        scene_dir,
        savepath,
        scenes=["mini"],
        view_num=VIEW_NUM,
        max_d=D,
        max_w=W,
        max_h=H,
    )

    out_folder = os.path.join(savepath, "mini", "depths_atvsnet")
    files = sorted(os.listdir(out_folder))
    for v in range(VIEW_NUM):
        assert f"{v:08d}.pfm" in files
        assert f"{v:08d}_prob.pfm" in files
        assert f"{v:08d}.jpg" in files
        assert f"{v:08d}.txt" in files
    assert os.path.exists(os.path.join(savepath, "mini", "zz_runtime.txt"))

    # fusion: random-weight depths are mostly inconsistent; force prob_threshold=0 and
    # a loose disparity threshold so some points survive and the chain completes
    ply = fuse_scene(
        os.path.join(savepath, "mini"),
        prob_threshold=0.0,
        disp_threshold=10.0,
        num_consistent=1,
    )
    points, colors = read_ply(ply)
    assert points.shape[0] > 0
    assert colors.shape == points.shape


def test_export_gipuma_layout(scene_dir, tmp_path):
    """gipuma export after eval: .P files, image copies, disp/normals dmb per view."""
    from atvsnet_tpu.cli.eval_pointcloud import run_eval_pc
    from atvsnet_tpu.fusion.dmb import read_dmb, read_p_matrix
    from atvsnet_tpu.fusion.fuse import export_gipuma, probability_filter

    savepath = str(tmp_path / "eval_out2")
    run_eval_pc(scene_dir, savepath, scenes=["mini"], view_num=VIEW_NUM,
                max_d=D, max_w=W, max_h=H)
    dense = os.path.join(savepath, "mini")
    probability_filter(os.path.join(dense, "depths_atvsnet"), 0.0)
    point_folder = str(tmp_path / "points")
    export_gipuma(dense, point_folder)

    for v in range(VIEW_NUM):
        name = f"{v:08d}"
        P = read_p_matrix(os.path.join(point_folder, "cams", name + ".jpg.P"))
        assert P.shape == (3, 4)
        assert os.path.exists(os.path.join(point_folder, "images", name + ".jpg"))
        disp = read_dmb(os.path.join(point_folder, f"2333__{name}", "disp.dmb"))
        normals = read_dmb(os.path.join(point_folder, f"2333__{name}", "normals.dmb"))
        assert disp.shape == (H // 4, W // 4)
        assert normals.shape == (H // 4, W // 4, 3)

def test_small_scene_pad_and_mask(scene_dir, tmp_path):
    """Inputs smaller than the (max_h, max_w) bucket: pad-and-mask instead of the
    reference's hard exit (eval_pointcloud.py:136-139); outputs cropped to the valid
    region."""
    from atvsnet_tpu.cli.eval_pointcloud import run_eval_pc
    from atvsnet_tpu.data.pfm import load_pfm

    savepath = str(tmp_path / "eval_small")
    # bucket LARGER than the 96x128 scene in both dims
    run_eval_pc(scene_dir, savepath, scenes=["mini"], view_num=VIEW_NUM,
                max_d=D, max_w=W + 64, max_h=H + 32)
    out_folder = os.path.join(savepath, "mini", "depths_atvsnet")
    depth = load_pfm(os.path.join(out_folder, "00000000.pfm"))
    prob = load_pfm(os.path.join(out_folder, "00000000_prob.pfm"))
    # cropped back to the scene's own 1/4-res size, not the padded bucket
    assert depth.shape == (H // 4, W // 4)
    assert prob.shape == (H // 4, W // 4)
    assert np.isfinite(depth).all()


def _load_depths(savepath):
    from atvsnet_tpu.data.pfm import load_pfm

    out_folder = os.path.join(savepath, "mini", "depths_atvsnet")
    return {
        v: (
            load_pfm(os.path.join(out_folder, f"{v:08d}.pfm")),
            load_pfm(os.path.join(out_folder, f"{v:08d}_prob.pfm")),
        )
        for v in range(VIEW_NUM)
    }


def test_batched_driver_matches_single(scene_dir, tmp_path):
    """--batch 2 (distinct ref images stacked on the batch axis, tail padded) produces
    the same depth/prob maps as the B=1 loop."""
    from atvsnet_tpu.cli.eval_pointcloud import run_eval_pc

    single = str(tmp_path / "b1")
    batched = str(tmp_path / "b2")
    kw = dict(scenes=["mini"], view_num=VIEW_NUM, max_d=D, max_w=W, max_h=H)
    run_eval_pc(scene_dir, single, **kw)
    run_eval_pc(scene_dir, batched, batch=2, **kw)  # 3 images -> chunk(2) + padded tail
    ref, got = _load_depths(single), _load_depths(batched)
    for v in range(VIEW_NUM):
        np.testing.assert_allclose(got[v][0], ref[v][0], rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(got[v][1], ref[v][1], rtol=2e-4, atol=1e-4)


def test_mesh_driver_matches_single(scene_dir, tmp_path):
    """--mesh data=2,view=2 (SPMD pipeline over 4 of the 8 virtual devices) matches
    the single-device scan-pipeline driver (VERDICT r2 item 2)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    from atvsnet_tpu.cli.eval_pointcloud import run_eval_pc

    single = str(tmp_path / "sd")
    meshed = str(tmp_path / "mesh")
    kw = dict(scenes=["mini"], view_num=VIEW_NUM, max_d=D, max_w=W, max_h=H)
    run_eval_pc(scene_dir, single, **kw)
    run_eval_pc(scene_dir, meshed, mesh="data=2,view=2", **kw)
    ref, got = _load_depths(single), _load_depths(meshed)
    for v in range(VIEW_NUM):
        np.testing.assert_allclose(got[v][0], ref[v][0], rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(got[v][1], ref[v][1], rtol=2e-4, atol=1e-4)


def test_read_gt_depth_undecodable_raises(tmp_path):
    """An undecodable GT map raises a descriptive IOError instead of the
    AttributeError from cv2.imread's None return (review finding)."""
    import pytest

    from atvsnet_tpu.data.preprocess import read_gt_depth

    bad = str(tmp_path / "garbage.exr")
    with open(bad, "wb") as f:
        f.write(b"not an exr at all")
    with pytest.raises((IOError, ValueError), match="garbage.exr|could not"):
        read_gt_depth(bad)


def test_gt_range_override(scene_dir, tmp_path):
    """--gt_range: a GT depth map next to the ref image overrides the sweep range
    (reference eval_pointcloud.py:171-193); depths land inside the GT range."""
    from atvsnet_tpu.cli.eval_pointcloud import run_eval_pc
    from atvsnet_tpu.data.pfm import load_pfm, save_pfm
    from atvsnet_tpu.data.preprocess import find_gt_depth_path

    scene = os.path.join(scene_dir, "eth3d", "mini")
    depths_dir = os.path.join(scene, "depths")
    os.makedirs(depths_dir, exist_ok=True)
    try:
        # sidecar chain for ref image 0: 00000000.txt names the image, whose stem
        # resolved under depths/ with .pfm is the GT (find_gt_depth_path)
        with open(os.path.join(scene, "images", "00000000.txt"), "w") as f:
            f.write("00000000.jpg\n")
        rng = np.random.RandomState(3)
        gt = (3.0 + rng.rand(H, W) * 2.0).astype(np.float32)  # depth in [3, 5]
        save_pfm(os.path.join(depths_dir, "00000000.pfm"), gt)

        assert find_gt_depth_path(
            os.path.join(scene, "images", "00000000.jpg")
        ) == os.path.join(depths_dir, "00000000.pfm")

        savepath = str(tmp_path / "gtr")
        run_eval_pc(scene_dir, savepath, scenes=["mini"], view_num=VIEW_NUM,
                    max_d=D, max_w=W, max_h=H, gt_range=True)
        out_folder = os.path.join(savepath, "mini", "depths_atvsnet")
        depth0 = load_pfm(os.path.join(out_folder, "00000000.pfm"))
        # sweep restricted to the GT's inverse-depth range -> metric depths within
        # [min_gt, max_gt] (soft-argmin is a convex combination of sweep values)
        assert depth0.min() >= 3.0 - 1e-3 and depth0.max() <= 5.0 + 1e-3
        # image 1 has no GT sidecar: unchanged wide range still runs
        assert np.isfinite(load_pfm(os.path.join(out_folder, "00000001.pfm"))).all()
    finally:
        os.remove(os.path.join(scene, "images", "00000000.txt"))
        import shutil

        shutil.rmtree(depths_dir)


def test_mixed_dims_pad_and_crop(scene_dir, tmp_path):
    """Bucket smaller in one dim (crop) and larger in the other (pad)."""
    from atvsnet_tpu.cli.eval_pointcloud import run_eval_pc
    from atvsnet_tpu.data.pfm import load_pfm

    savepath = str(tmp_path / "eval_mixed")
    run_eval_pc(scene_dir, savepath, scenes=["mini"], view_num=VIEW_NUM,
                max_d=D, max_w=W - 32, max_h=H + 32)
    out_folder = os.path.join(savepath, "mini", "depths_atvsnet")
    depth = load_pfm(os.path.join(out_folder, "00000000.pfm"))
    assert depth.shape == (H // 4, (W - 32) // 4)
    assert np.isfinite(depth).all()
