"""SE(3) / SO(3) utilities in pure jnp.

Equivalent surface to the reference ``plib/rigid_motion.py`` (Rodrigues
minimal rotation, Gram-Schmidt coordinate frames, look-at camera poses,
batched homogeneous inverse, geodesic pose interpolation). All functions are
batched, differentiable, and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_product_matrix(v):
    """(*, 3) -> (*, 3, 3) skew matrix [v]_x (ref rigid_motion.py:313)."""
    zero = jnp.zeros_like(v[..., 0])
    rows = [
        jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def get_min_R(v1, v2):
    """Rotation matrix rotating unit vector v1 onto v2, R @ v1 = v2.

    Rodrigues construction (ref rigid_motion.py:268-310). Falls back to -I
    for antipodal vectors.
    """
    v1 = jnp.asarray(v1, jnp.float32)
    v2 = jnp.asarray(v2, jnp.float32)
    k = jnp.cross(v1, v2)
    cos_theta = jnp.sum(v1 * v2, axis=-1)
    eye3 = jnp.broadcast_to(jnp.eye(3), (*v1.shape[:-1], 3, 3))
    Kx = cross_product_matrix(k)
    denom = jnp.maximum(1.0 + cos_theta, 1e-12)
    R = eye3 + Kx + (Kx @ Kx) / denom[..., None, None]
    return jnp.where(cos_theta[..., None, None] > -1.0 + 1e-9, R, -eye3)


def construct_coord_frame(z, y):
    """Build (*, 3, 3) rotation with columns [x, y, z] from z-axis and an
    approximate y-axis (Gram-Schmidt; ref rigid_motion.py:410-466)."""
    z = jnp.asarray(z, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    x = jnp.cross(y, z)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    y = y - jnp.sum(y * z, axis=-1, keepdims=True) * z
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.stack([x, y, z], axis=-1)


def get_H_c2w_lookat(pinhole_location_w, look_at_w, up_w, invert_y: bool = True):
    """Camera pose from eye / look-at / up (ref rigid_motion.py:469-525).

    Returns (*, 4, 4) H_c2w. ``invert_y`` flips the y axis to match image
    coordinates (x right, y down).
    """
    eye = jnp.asarray(pinhole_location_w, jnp.float32)
    look = jnp.asarray(look_at_w, jnp.float32)
    up = jnp.asarray(up_w, jnp.float32)
    R = construct_coord_frame(z=look - eye, y=(-up if invert_y else up))
    batch = R.shape[:-2]
    H = jnp.zeros((*batch, 4, 4), jnp.float32)
    H = H.at[..., :3, :3].set(R)
    H = H.at[..., :3, 3].set(eye)
    H = H.at[..., 3, 3].set(1.0)
    return H


def inv_homogeneous(Hs):
    """Closed-form inverse of rigid homogeneous matrices (*, 4, 4)
    (ref rigid_motion.py:687-702)."""
    Rt = jnp.swapaxes(Hs[..., :3, :3], -2, -1)
    t = -(Rt @ Hs[..., :3, 3:4])
    inv = jnp.zeros_like(Hs)
    inv = inv.at[..., :3, :3].set(Rt)
    inv = inv.at[..., :3, 3:4].set(t)
    inv = inv.at[..., 3, 3].set(1.0)
    return inv


def log_rotation(R, eps: float = 1e-7):
    """SO(3) log map: (*, 3, 3) -> (*, 3) axis*angle
    (ref rigid_motion.py:49-120)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    scale = jnp.where(
        jnp.abs(sin_theta) < eps, 0.5, theta / (2.0 * jnp.maximum(sin_theta, eps))
    )
    return w * scale[..., None]


def exp_skew_symmetric(w, eps: float = 1e-7):
    """SO(3) exp map: (*, 3) axis*angle -> (*, 3, 3) rotation."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    safe = jnp.maximum(theta, eps)
    K = cross_product_matrix(w / safe)
    s = jnp.sin(theta)[..., None]
    c = (1.0 - jnp.cos(theta))[..., None]
    eye3 = jnp.broadcast_to(jnp.eye(3), K.shape)
    R = eye3 + s * K + c * (K @ K)
    return jnp.where(theta[..., None] < eps, eye3, R)


def interp_homogeneous(H0, H1, t):
    """Geodesic interpolation between two rigid poses
    (ref interp_homegeneous_matrices, rigid_motion.py:199-229).

    Args:
        H0, H1: (*, 4, 4)
        t: scalar or (*,) in [0, 1]

    Returns: (*, 4, 4)
    """
    t = jnp.asarray(t, jnp.float32)
    R0, R1 = H0[..., :3, :3], H1[..., :3, :3]
    dR = jnp.swapaxes(R0, -2, -1) @ R1  # R0^T R1
    w = log_rotation(dR)
    Rt = R0 @ exp_skew_symmetric(w * t[..., None])
    pt = (1.0 - t[..., None]) * H0[..., :3, 3] + t[..., None] * H1[..., :3, 3]
    H = jnp.zeros_like(H0)
    H = H.at[..., :3, :3].set(Rt)
    H = H.at[..., :3, 3].set(pt)
    H = H.at[..., 3, 3].set(1.0)
    return H


def generate_random_camera_poses(
    key,
    n: int,
    min_r: float,
    max_r: float,
    max_angle: float = 180.0,
    local_max_angle: float = 3.0,
    max_translate_ratio: float = 1.0,
):
    """Random look-at-ish camera poses on a spherical shell around the origin
    (functional analogue of ref rigid_motion.py:571-685, used by training
    dataloaders with output_cam_mode='random').

    Returns (n, 4, 4) H_c2w.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    r = jax.random.uniform(k1, (n,), minval=min_r, maxval=max_r)
    theta = jax.random.uniform(k2, (n,), minval=0.0, maxval=2 * jnp.pi)
    max_phi = jnp.deg2rad(jnp.clip(max_angle, 0.0, 180.0)) / 2.0
    phi = jax.random.uniform(k3, (n,), minval=-max_phi, maxval=max_phi)
    eye = jnp.stack(
        [
            r * jnp.cos(phi) * jnp.cos(theta),
            r * jnp.cos(phi) * jnp.sin(theta),
            r * jnp.sin(phi),
        ],
        axis=-1,
    )
    jitter = jnp.deg2rad(local_max_angle)
    look = jax.random.uniform(
        k4, (n, 3), minval=-jitter, maxval=jitter
    ) * max_translate_ratio
    return get_H_c2w_lookat(eye, look, jnp.array([0.0, 1.0, 0.0]), invert_y=True)
