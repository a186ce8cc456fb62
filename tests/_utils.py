"""Shared fixtures: synthetic cameras and scenes for model-level tests."""

import numpy as np


def rotation(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.cos(angle / 2.0)
    b, c, d = -axis * np.sin(angle / 2.0)
    return np.array(
        [
            [a * a + b * b - c * c - d * d, 2 * (b * c + a * d), 2 * (b * d - a * c)],
            [2 * (b * c - a * d), a * a + c * c - b * b - d * d, 2 * (c * d + a * b)],
            [2 * (b * d + a * c), 2 * (c * d - a * b), a * a + d * d - b * b - c * c],
        ]
    )


def make_cam(K, R, t, depth_start=0.5, depth_interval=0.05, num_d=8):
    cam = np.zeros((2, 4, 4), dtype=np.float32)
    cam[0, :3, :3] = R
    cam[0, :3, 3] = t
    cam[0, 3, 3] = 1.0
    cam[1, :3, :3] = K
    cam[1, 3, 0] = depth_start
    cam[1, 3, 1] = depth_interval
    cam[1, 3, 2] = num_d
    cam[1, 3, 3] = depth_start + depth_interval * num_d
    return cam


def synthetic_scene(view_num=3, H=32, W=32, D=8, seed=0):
    """Random images + a small camera rig; intrinsics at 1/4 scale (MVSNet convention)."""
    rng = np.random.RandomState(seed)
    K = np.array([[W / 4.0, 0.0, W / 8.0], [0.0, W / 4.0, H / 8.0], [0.0, 0.0, 1.0]])
    images = rng.rand(1, view_num, H, W, 3).astype(np.float32)
    cams = []
    for v in range(view_num):
        R = rotation([0.0, 1.0, 0.1], 0.04 * v)
        t = np.array([0.1 * v, 0.02 * v, 0.0])
        cams.append(make_cam(K, R, t, depth_start=0.5, depth_interval=0.05, num_d=D))
    cams = np.stack(cams)[None].astype(np.float32)
    return images, cams
