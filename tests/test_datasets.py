"""COLMAP and MVS-Synth data-path tests on fabricated miniature datasets."""

import json
import os

import numpy as np
import pytest

from atvsnet_tpu.data.colmap import (
    ColmapSparse,
    colmap_cam_to_mvsnet,
    colmap_sample_paths,
    quaternion_to_rotation,
    set_depth_range_from_depthmap,
)
from atvsnet_tpu.data.mvs_syn import MvsSynDataset

from tests._utils import rotation


class TestQuaternion:
    def test_identity(self):
        np.testing.assert_allclose(quaternion_to_rotation(1, 0, 0, 0), np.eye(3), atol=1e-12)

    def test_matches_rodrigues(self):
        angle = 0.4
        # quaternion for rotation of `angle` about z
        q = (np.cos(angle / 2), 0.0, 0.0, np.sin(angle / 2))
        R = quaternion_to_rotation(*q)
        expected = np.array(
            [
                [np.cos(angle), -np.sin(angle), 0],
                [np.sin(angle), np.cos(angle), 0],
                [0, 0, 1],
            ]
        )
        np.testing.assert_allclose(R, expected, atol=1e-12)


@pytest.fixture(scope="module")
def colmap_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("colmap")
    sparse = root / "sparse"
    sparse.mkdir()
    images_dir = root / "images"
    images_dir.mkdir()

    # 4 cameras on a small arc, looking at points around z=5
    n_img, n_pts = 4, 60
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.uniform(-1, 1, (n_pts, 2)), rng.uniform(4, 6, (n_pts, 1))], axis=1
    )

    with open(sparse / "cameras.txt", "w") as f:
        f.write("# Camera list\n#\n# Number of cameras: 1\n")
        f.write("1 PINHOLE 64 48 50 50 32 24\n")

    img_lines = [
        "# Image list\n#\n#\n",
        f"# Number of images: {n_img}, mean observations per image: 10\n",
    ]
    for i in range(n_img):
        angle = 0.05 * i
        R = rotation([0, 1, 0], angle)
        t = np.array([0.2 * i, 0, 0])
        # quaternion of R (w,x,y,z) for rotation about y
        qw, qy = np.cos(angle / 2), -np.sin(angle / 2)
        img_lines.append(
            f"{i + 1} {qw} 0.0 {qy} 0.0 {t[0]} {t[1]} {t[2]} 1 img{i}.png\n"
        )
        # 2D observations: every image sees points i..i+40 (overlapping subsets)
        vis = range(i * 5, i * 5 + 40)
        obs = " ".join(f"{10.0 + j} {12.0 + j} {j + 1}" for j in vis)
        img_lines.append(obs + "\n")
    with open(sparse / "images.txt", "w") as f:
        f.writelines(img_lines)

    with open(sparse / "points3D.txt", "w") as f:
        f.write("# 3D point list\n#\n")
        f.write(f"# Number of points: {n_pts}, mean track length: 3\n")
        for j in range(n_pts):
            f.write(f"{j + 1} {pts[j, 0]} {pts[j, 1]} {pts[j, 2]} 128 128 128 0.5\n")

    return str(sparse), str(images_dir)


class TestColmap:
    def test_parse_and_neighbors(self, colmap_dir):
        sparse_path, image_path = colmap_dir
        sp = ColmapSparse(sparse_path, image_path, num_neighbors=2)
        assert len(sp.images) == 4
        assert len(sp.cameras) == 1
        assert len(sp.points) == 60
        # neighbors ranked by shared points: image 2's best neighbors are 1 and 3
        n = sp.images[2].neighbor_list
        assert len(n) == 2
        assert set(n) <= {1, 3, 4}

    def test_disparity_range_plausible(self, colmap_dir):
        sparse_path, image_path = colmap_dir
        sp = ColmapSparse(sparse_path, image_path, num_neighbors=2)
        img = sp.images[1]
        # points live at z in [4, 6] -> disparity in [1/6, 1/4] before stretch
        assert img.estimated_max_disparity == pytest.approx(0.25, rel=0.5)
        assert img.estimated_min_disparity == pytest.approx(1 / 6, rel=0.5)
        assert img.estimated_min_disparity < img.estimated_max_disparity

    def test_cam_assembly(self, colmap_dir):
        sparse_path, image_path = colmap_dir
        sp = ColmapSparse(sparse_path, image_path, num_neighbors=2)
        cam = colmap_cam_to_mvsnet(sp, 1, max_d=32)
        assert cam.shape == (2, 4, 4)
        assert cam[1][0][0] == 50
        assert cam[1][3][1] > 0  # positive sweep interval
        ids = colmap_sample_paths(sp, 1, view_num=3)
        assert ids[0] == 1 and len(ids) == 3

    def test_depth_range_from_depthmap(self):
        cams = np.zeros((2, 2, 4, 4))
        depth = np.linspace(1.0, 9.0, 100).reshape(10, 10)
        out = set_depth_range_from_depthmap(cams, depth, max_d=32)
        # 5th percentile of [1, 9] is ~1.40, divided by stretch 1.3 -> ~1.08
        assert out[0][1, 3, 0] == pytest.approx(1.08, rel=0.05)
        assert out[0][1, 3, 1] > 0
        np.testing.assert_allclose(out[0][1, 3], out[1][1, 3])


@pytest.fixture(scope="module")
def mvs_syn_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("mvs_syn")
    n_seq, n_img = 2, 5
    with open(root / "num_images.json", "w") as f:
        json.dump([n_img] * n_seq, f)
    for s in range(n_seq):
        seq = root / f"{s:04d}"
        (seq / "poses").mkdir(parents=True)
        (seq / "images").mkdir()
        (seq / "neighbors").mkdir()
        for i in range(n_img):
            R = rotation([0, 1, 0], 0.02 * i)
            E = np.eye(4)
            E[:3, :3] = R
            E[:3, 3] = [0.1 * i, 0, 0]
            with open(seq / "poses" / f"{i:04d}.json", "w") as f:
                json.dump(
                    {
                        "extrinsic": E.tolist(),
                        "f_x": 50.0, "f_y": 50.0, "c_x": 32.0, "c_y": 24.0,
                    },
                    f,
                )
        # seq 0: precomputed neighbors with scores; seq 1: no files (angle fallback)
        if s == 0:
            for i in range(n_img):
                others = [j for j in range(n_img) if j != i]
                with open(seq / "neighbors" / f"{i:04d}.json", "w") as f:
                    json.dump(others, f)
                with open(seq / "neighbors" / f"{i:04d}_score.json", "w") as f:
                    json.dump([[0.9, 0.7, 0.5, 0.3], 0.8], f)
    return str(root)


class TestMvsSyn:
    def test_index_and_neighbors(self, mvs_syn_dir):
        ds = MvsSynDataset(mvs_syn_dir, num_neighbors=2, max_neighbor_range=4, seed=0)
        assert len(ds.images) == 10
        samples = list(ds.samples(view_num=3))
        assert samples, "no valid samples generated"
        for s in samples:
            assert len(s) == 3
            ref = ds.images[s[0]]
            for nid in s[1:]:
                assert ds.images[nid].seq_id == ref.seq_id
                assert nid != s[0]

    def test_score_threshold_decay_filters(self, mvs_syn_dir):
        ds = MvsSynDataset(mvs_syn_dir, num_neighbors=2, max_neighbor_range=4, seed=0)
        # seq 0 image 0: scores [0.9 .7 .5 .3] with thres 0.6 keeps >= 2 -> {0.9, 0.7}
        ref = ds.images[ds.by_seq[(0, 0)]]
        assert ref.is_valid
        flat = {i for perm in ref.neighbor_permutations for i in perm}
        # neighbors list for img 0 is [1,2,3,4]; scores>0.6 keeps img ids 1,2
        allowed = {ds.by_seq[(0, 1)], ds.by_seq[(0, 2)]}
        assert flat <= allowed

    def test_angle_fallback_windows_around_ref(self, tmp_path):
        """The angle-fallback neighbor list must window around the REF's position
        (reference mvs_syn_helpers.py:262-274), not take the sequence's first
        frames (review finding). 12 near-identical views, max_range=4: a late
        ref's candidates must all be near it."""
        root = tmp_path / "syn"
        root.mkdir()
        n_img = 12
        with open(root / "num_images.json", "w") as f:
            json.dump([n_img], f)
        seq = root / "0000"
        (seq / "poses").mkdir(parents=True)
        (seq / "images").mkdir()
        for i in range(n_img):
            E = np.eye(4)
            E[:3, :3] = rotation([0, 1, 0], 0.01 * i)  # tiny angles: all in-cone
            E[:3, 3] = [0.05 * i, 0, 0]
            with open(seq / "poses" / f"{i:04d}.json", "w") as f:
                json.dump({"extrinsic": E.tolist(), "f_x": 50.0, "f_y": 50.0,
                           "c_x": 32.0, "c_y": 24.0}, f)
        ds = MvsSynDataset(str(root), num_neighbors=2, max_neighbor_range=4, seed=0)
        ref = ds.images[ds.by_seq[(0, 10)]]
        assert ref.is_valid
        picked = {ds.images[i].img_id for perm in ref.neighbor_permutations for i in perm}
        # window of 4 around img 10 in [0..9, 11] -> {7, 8, 9, 11}
        assert picked <= {7, 8, 9, 11}, picked

    def test_cam_conversion(self, mvs_syn_dir):
        ds = MvsSynDataset(mvs_syn_dir, num_neighbors=2, seed=0)
        cam = ds.images[0].to_mvsnet_cam(max_d=16)
        assert cam.shape == (2, 4, 4)
        assert cam[1][0][0] == 50.0
        assert cam[1][3][2] == 16


class TestAugment:
    def test_identity_when_no_rng(self):
        from atvsnet_tpu.data.augment import augment_image_group
        from atvsnet_tpu.data.preprocess import center_image

        rng = np.random.RandomState(0)
        imgs = [(rng.rand(8, 8, 3) * 255).astype(np.uint8) for _ in range(2)]
        out = augment_image_group(imgs, rng=None)
        for o, i in zip(out, imgs):
            np.testing.assert_allclose(o, center_image(i / 255.0), atol=1e-5)

    def test_group_shares_jitter(self):
        from atvsnet_tpu.data.augment import augment_image_group

        rng = np.random.RandomState(1)
        img = (np.full((8, 8, 3), 128)).astype(np.uint8)
        out = augment_image_group([img, img], rng=rng, normalize_image=False)
        np.testing.assert_array_equal(out[0], out[1])

    def test_saturation_mode(self):
        from atvsnet_tpu.data.augment import augment_image_color

        img = np.full((4, 4, 3), 255, np.uint8)
        out = augment_image_color(img, random_brightness=3.0, normalize_image=False)
        assert out.max() <= 0.5 and out.min() >= -0.5


class TestMvsSynTraining:
    def test_training_validation_split(self, mvs_syn_dir):
        import json as _json

        with open(os.path.join(mvs_syn_dir, "val.json"), "w") as f:
            _json.dump([1], f)
        ds = MvsSynDataset(mvs_syn_dir, num_neighbors=2, max_neighbor_range=4, seed=0)
        train = list(ds.training_samples(3, mode="training"))
        val = list(ds.training_samples(3, mode="validation"))
        assert train and val
        for ids, _ in train:
            assert ds.images[ids[0]].seq_id != 1
        for ids, _ in val:
            assert ds.images[ids[0]].seq_id == 1
        os.remove(os.path.join(mvs_syn_dir, "val.json"))

    def test_load_training_sample(self, mvs_syn_dir, monkeypatch):
        import atvsnet_tpu.data.mvs_syn as ms

        rng = np.random.RandomState(0)
        H, W = 48, 64

        monkeypatch.setattr(
            ms, "_read_exr_depth", lambda path: (2.0 + rng.rand(H, W)).astype(np.float32)
        )
        import cv2

        ds = MvsSynDataset(mvs_syn_dir, num_neighbors=2, max_neighbor_range=4, seed=0)
        # fabricate image files
        for im in ds.images:
            os.makedirs(os.path.dirname(im.filepath), exist_ok=True)
            cv2.imwrite(im.filepath, rng.randint(0, 255, (H, W, 3)).astype(np.uint8))
        ids, _ = next(ds.training_samples(3))
        batch = ms.load_training_sample(ds, ids, max_d=8)
        assert batch["images"].shape == (1, 3, H, W, 3)
        assert batch["cams"].shape == (1, 3, 2, 4, 4)
        assert batch["depth_gt"].shape == (1, H // 4, W // 4, 1)
        assert batch["cams"][0, 0, 1, 3, 1] > 0  # positive sweep interval
        assert (batch["depth_gt"] > 0).all()

@pytest.fixture(scope="module")
def eth3d_dir(tmp_path_factory):
    """Fabricated ETH3D training layout: one scene with a COLMAP text model,
    images, and raw-float32 gt depths (the ETH3D gt format)."""
    import cv2

    data_root = tmp_path_factory.mktemp("eth3d_data")
    gt_root = tmp_path_factory.mktemp("eth3d_gt")
    scene = "delivery_area"
    sparse = data_root / scene / "rig_calibration"
    images_dir = data_root / scene / "images_undistorted"
    depth_dir = gt_root / f"{scene}_rig_depth" / scene / "ground_truth_depth_undistorted"
    for d in (sparse, images_dir, depth_dir):
        d.mkdir(parents=True)

    n_img, n_pts = 4, 60
    H, W = 48, 64
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.uniform(-1, 1, (n_pts, 2)), rng.uniform(4, 6, (n_pts, 1))], axis=1
    )
    with open(sparse / "cameras.txt", "w") as f:
        f.write("# Camera list\n1 PINHOLE 64 48 50 50 32 24\n")
    img_lines = ["# Image list\n"]
    for i in range(n_img):
        angle = 0.05 * i
        qw, qy = np.cos(angle / 2), -np.sin(angle / 2)
        img_lines.append(f"{i + 1} {qw} 0.0 {qy} 0.0 {0.2 * i} 0.0 0.0 1 img{i}.png\n")
        obs = " ".join(f"{10.0 + j} {12.0 + j} {j + 1}" for j in range(i * 5, i * 5 + 40))
        img_lines.append(obs + "\n")
    with open(sparse / "images.txt", "w") as f:
        f.writelines(img_lines)
    with open(sparse / "points3D.txt", "w") as f:
        for j in range(n_pts):
            f.write(f"{j + 1} {pts[j, 0]} {pts[j, 1]} {pts[j, 2]} 128 128 128 0.5\n")
    for i in range(n_img):
        cv2.imwrite(str(images_dir / f"img{i}.png"), rng.randint(0, 255, (H, W, 3)).astype(np.uint8))
        depth = (4.0 + rng.rand(H, W)).astype(np.float32)
        depth[:4] = np.nan  # missing pixels like real ETH3D gt
        depth.tofile(str(depth_dir / f"img{i}.png"))
    return str(data_root), str(gt_root)


class TestColmapTraining:
    def test_sample_assembly(self, eth3d_dir):
        from atvsnet_tpu.data.colmap_train import eth3d_training_samples

        data_root, gt_root = eth3d_dir
        samples, sparses = eth3d_training_samples(
            data_root, gt_root, view_num=3, augment_number=2,
            scenes=["delivery_area"],
        )
        assert len(samples) == 4 * 2  # 4 refs x 2 augmentations
        assert len(sparses) == 1
        s = samples[0]
        assert len(s.view_ids) == 2 and s.ref_id not in s.view_ids
        assert os.path.exists(s.gt_depth_path)

    def test_neighbor_fallback_pads_with_ref(self, eth3d_dir):
        from atvsnet_tpu.data.colmap_train import eth3d_neighbor_ids

        data_root, gt_root = eth3d_dir
        from atvsnet_tpu.data.colmap import ColmapSparse

        sp = ColmapSparse(
            os.path.join(data_root, "delivery_area", "rig_calibration"),
            os.path.join(data_root, "delivery_area", "images_undistorted"),
            num_neighbors=2,
        )
        sp.images[1].neighbor_list = []
        ids = eth3d_neighbor_ids(sp, 1, view_num=6)
        assert len(ids) == 5
        assert ids[0] == 2  # index-adjacency fallback (ref+1 exists)
        assert 1 in ids     # padded with the ref id once candidates run out

    def test_load_sample_and_train_step(self, eth3d_dir):
        import jax
        import jax.numpy as jnp

        from atvsnet_tpu.config import PipelineConfig, TrainConfig
        from atvsnet_tpu.data.colmap_train import (
            eth3d_training_samples,
            load_colmap_training_sample,
        )
        from atvsnet_tpu.models.train import TrainState, make_optimizer, train_step
        from atvsnet_tpu.models.tvsnet import init_params

        data_root, gt_root = eth3d_dir
        samples, sparses = eth3d_training_samples(
            data_root, gt_root, view_num=3, scenes=["delivery_area"]
        )
        s = samples[0]
        batch = load_colmap_training_sample(
            sparses[s.scene_idx], s.ref_id, s.view_ids, s.gt_depth_path,
            max_d=8, max_h=32, max_w=32, augment_rng=np.random.RandomState(0),
        )
        assert batch["images"].shape == (1, 3, 32, 32, 3)
        assert batch["cams"].shape == (1, 3, 2, 4, 4)
        assert batch["depth_gt"].shape == (1, 8, 8, 1)
        assert batch["cams"][0, 0, 1, 3, 1] > 0
        assert np.isfinite(batch["depth_gt"]).all()

        cfg = PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32)
        tcfg = TrainConfig()
        tx = make_optimizer(tcfg)
        params = init_params(jax.random.PRNGKey(0), cfg)
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        state2, metrics = jax.jit(lambda st, b: train_step(st, b, cfg, tcfg, tx))(
            state, {k: jnp.asarray(v) for k, v in batch.items()}
        )
        assert np.isfinite(float(metrics["loss"]))
        assert int(state2.step) == 1

    def test_emit_training_samples(self, eth3d_dir, tmp_path):
        from atvsnet_tpu.data.colmap_train import (
            emit_training_samples,
            eth3d_training_samples,
        )
        from atvsnet_tpu.data.cams import load_cam
        from atvsnet_tpu.data.pfm import load_pfm

        data_root, gt_root = eth3d_dir
        samples, sparses = eth3d_training_samples(
            data_root, gt_root, view_num=3, scenes=["delivery_area"]
        )
        n = emit_training_samples(
            samples, sparses, str(tmp_path), max_d=8, max_h=32, max_w=32
        )
        assert n == len(samples)
        sdir = os.path.join(str(tmp_path), "00000000")
        assert load_pfm(os.path.join(sdir, "depth.pfm")).shape == (32, 32)
        cam = load_cam(os.path.join(sdir, "cam_0.txt"))
        assert cam[1, 3, 1] > 0


class TestMultiDepth:
    def test_load_training_sample_multi_depth(self, mvs_syn_dir, monkeypatch):
        import atvsnet_tpu.data.mvs_syn as ms
        import cv2

        rng = np.random.RandomState(0)
        H, W = 48, 64
        monkeypatch.setattr(
            ms, "_read_exr_depth", lambda path: (2.0 + rng.rand(H, W)).astype(np.float32)
        )
        ds = MvsSynDataset(mvs_syn_dir, num_neighbors=2, max_neighbor_range=4, seed=0)
        for im in ds.images:
            os.makedirs(os.path.dirname(im.filepath), exist_ok=True)
            cv2.imwrite(im.filepath, rng.randint(0, 255, (H, W, 3)).astype(np.uint8))
        ids, _ = next(ds.training_samples(3))
        batch = ms.load_training_sample(ds, ids, max_d=8, multi_depth=True)
        assert batch["depth_views_gt"].shape == (1, 2, H // 4, W // 4, 1)
        assert (batch["depth_views_gt"] > 0).all()

    def test_train_step_with_view_gt(self):
        import jax
        import jax.numpy as jnp

        from atvsnet_tpu.config import PipelineConfig, TrainConfig
        from atvsnet_tpu.models.train import TrainState, make_optimizer, train_step
        from atvsnet_tpu.models.tvsnet import init_params
        from tests._utils import synthetic_scene

        cfg = PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32)
        tcfg = TrainConfig()
        tx = make_optimizer(tcfg)
        params = init_params(jax.random.PRNGKey(0), cfg)
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        images, cams = synthetic_scene(view_num=3, H=32, W=32, D=8)
        rng = np.random.RandomState(0)
        batch = {
            "images": jnp.asarray(images),
            "cams": jnp.asarray(cams),
            "depth_gt": jnp.asarray((0.5 + 0.3 * rng.rand(1, 8, 8, 1)).astype(np.float32)),
            "depth_views_gt": jnp.asarray(
                (0.5 + 0.3 * rng.rand(1, 2, 8, 8, 1)).astype(np.float32)
            ),
        }
        state2, metrics = jax.jit(lambda st, b: train_step(st, b, cfg, tcfg, tx))(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["loss_aux"]) > 0
