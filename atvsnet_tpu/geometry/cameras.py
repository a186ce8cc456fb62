"""Camera parameter handling.

Camera layout follows the MVSNet convention used throughout the reference
(verified on reference example/0/0_cam.npy; parsed at reference atvsnet/preprocess.py:102):

  cam: (..., 2, 4, 4) float32
    cam[..., 0, :, :]  — 4x4 extrinsic [R|t; 0 0 0 1], world -> camera
    cam[..., 1, :3, :3] — 3x3 intrinsic K (at the COST-VOLUME resolution, i.e. already
                          scaled by sample_scale=0.25 relative to the input image)
    cam[..., 1, 3, :]   — depth sweep row [depth_start, depth_interval, num_d, depth_end]
                          (inverse-depth values when the pipeline runs inverse_depth=True)
"""

from __future__ import annotations

import jax.numpy as jnp


def split_cam(cam: jnp.ndarray):
    """(..., 2, 4, 4) -> K (...,3,3), R (...,3,3), t (...,3,1)."""
    R = cam[..., 0, :3, :3]
    t = cam[..., 0, :3, 3:4]
    K = cam[..., 1, :3, :3]
    return K, R, t


def camera_center(cam: jnp.ndarray) -> jnp.ndarray:
    """World-space camera center c = -R^T t, shape (..., 3, 1)."""
    _, R, t = split_cam(cam)
    return -jnp.swapaxes(R, -1, -2) @ t


def depth_range_from_cams(cams: jnp.ndarray):
    """depth_start, depth_interval of the *reference* (index-0) camera.

    Mirrors the driver slices at reference atvsnet/example.py:66-69:
    depth_start = cams[:, 0, 1, 3, 0], depth_interval = cams[:, 0, 1, 3, 1].

    cams: (B, N, 2, 4, 4) -> two (B,) vectors.
    """
    return cams[:, 0, 1, 3, 0], cams[:, 0, 1, 3, 1]


def scale_camera_np(cam, scale: float):
    """Scale intrinsics for a resized image (numpy, host side).

    Reference: atvsnet/preprocess.py:27-36 (scales fx, fy, cx, cy).
    """
    import numpy as np

    new_cam = np.copy(cam)
    new_cam[1][0][0] = cam[1][0][0] * scale
    new_cam[1][1][1] = cam[1][1][1] * scale
    new_cam[1][0][2] = cam[1][0][2] * scale
    new_cam[1][1][2] = cam[1][1][2] * scale
    return new_cam
