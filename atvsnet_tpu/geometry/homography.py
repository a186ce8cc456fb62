"""Plane-sweep homographies, computed for all depth hypotheses in one batched matmul.

Math follows reference atvsnet/homography_warping.py:179-227 (including the
inverse-depth branch at :215-218):

    H_d = K_r R_r (I - c_rel n_f^T * s(d)) R_l^T K_l^{-1}

where s(d) = d for inverse-depth sweeps and 1/d otherwise, c_rel = c_r - c_l is the
relative camera center and n_f is the fronto-parallel plane normal (third row of R_l).
The TF reference loops 128 python iterations to slice these; here the whole (B, D, 3, 3)
stack is one einsum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from atvsnet_tpu.geometry.cameras import split_cam

# Camera math is a handful of 3x3 matmuls — negligible FLOPs, but sub-pixel warping
# accuracy matters, so keep them out of the TPU's default bf16 matmul path.
_HI = jax.lax.Precision.HIGHEST


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=_HI)


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel grid at half-pixel centers, shape (3, H*W).

    Row order [x; y; 1] with x in [0.5, W-0.5], matching reference
    homography_warping.py:8-17 (texture-coordinate convention).
    """
    x = jnp.arange(width, dtype=dtype) + 0.5
    y = jnp.arange(height, dtype=dtype) + 0.5
    xg, yg = jnp.meshgrid(x, y)  # (H, W) each, 'xy' indexing
    ones = jnp.ones_like(xg)
    return jnp.stack([xg.reshape(-1), yg.reshape(-1), ones.reshape(-1)], axis=0)


def sweep_depths(depth_start: jnp.ndarray, depth_interval: jnp.ndarray, depth_num: int) -> jnp.ndarray:
    """Per-sample sweep values, shape (B, D): start + i * interval."""
    steps = jnp.arange(depth_num, dtype=depth_start.dtype)
    return depth_start[:, None] + steps[None, :] * depth_interval[:, None]


def get_homographies(
    left_cam: jnp.ndarray,
    right_cam: jnp.ndarray,
    depth_num: int,
    depth_start: jnp.ndarray,
    depth_interval: jnp.ndarray,
    inverse_depth: bool = True,
) -> jnp.ndarray:
    """All D homographies mapping left(reference) pixels -> right(view) pixels.

    Args:
      left_cam, right_cam: (B, 2, 4, 4)
      depth_start, depth_interval: (B,)
    Returns:
      (B, D, 3, 3) float32.
    """
    f32 = jnp.float32
    K_l, R_l, t_l = split_cam(left_cam.astype(f32))
    K_r, R_r, t_r = split_cam(right_cam.astype(f32))

    depths = sweep_depths(depth_start.astype(f32), depth_interval.astype(f32), depth_num)  # (B, D)

    K_l_inv = jnp.linalg.inv(K_l)
    R_l_T = jnp.swapaxes(R_l, -1, -2)
    R_r_T = jnp.swapaxes(R_r, -1, -2)

    fronto = R_l[:, 2:3, :]                      # (B, 1, 3) plane normal in world frame
    c_l = -_mm(R_l_T, t_l)                       # (B, 3, 1)
    c_r = -_mm(R_r_T, t_r)
    c_rel = c_r - c_l                            # (B, 3, 1)

    temp = _mm(c_rel, fronto)                    # (B, 3, 3) rank-1 c_rel n_f^T
    scale = depths if inverse_depth else 1.0 / depths  # (B, D)
    eye = jnp.eye(3, dtype=f32)
    middle = eye[None, None] - temp[:, None] * scale[:, :, None, None]  # (B, D, 3, 3)

    back = _mm(R_l_T, K_l_inv)[:, None]          # (B, 1, 3, 3)
    front = _mm(K_r, R_r)[:, None]               # (B, 1, 3, 3)
    return _mm(front, _mm(middle, back))         # (B, D, 3, 3)
