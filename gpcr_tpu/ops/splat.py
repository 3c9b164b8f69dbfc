"""Analytic 3D-Gaussian splat math — pure jnp, differentiable.

Re-derives the per-Gaussian preprocessing of the reference CUDA rasterizer
(``cuda_rasterizer/forward.cu:20-259`` + ``auxiliary.h``) as vectorized jnp.
The backward pass the reference hand-writes in ``backward.cu:144-396`` falls
out of JAX autodiff. Numerics preserved exactly (float32):

- quaternions are NOT normalized before building the rotation
  (deliberate reference edit, forward.cu:130);
- cov2D gets +0.3 added to its diagonal (reference modified the stock
  ``max(·, 0.3)`` low-pass, forward.cu:111-112);
- view-space means are clamped to ±1.3·tanfov before the EWA Jacobian
  (forward.cu:82-87);
- near-plane cull at z <= 0.2 (auxiliary.h:154);
- radius = ceil(3·sqrt(max eigenvalue)) with the max(0.1, ·) guard
  (forward.cu:232-235);
- ndc2Pix(v, S) = ((v+1)·S − 1)/2 (auxiliary.h:41-44).

Matrix convention: ``viewmatrix``/``projmatrix`` follow the reference's torch
layout — the TRANSPOSED world-to-camera / full projection matrices, so points
transform as ``[p, 1] @ M`` (see transformPoint4x4, auxiliary.h:68-77).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small 3x3/4x4 matmuls must run at full f32 precision: TPU default matmul
# precision (bf16 passes) costs ~1e-2 px of projected-mean accuracy, blowing
# the 0.05 dB parity budget. These ops are tiny; HIGHEST is free here.
_HI = jax.lax.Precision.HIGHEST


def quat_to_rotmat(q):
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation, WITHOUT normalizing
    (forward.cu:121-141). For unit quaternions this is the standard R(q)."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def compute_cov3d(scales, scale_modifier, quats):
    """Σ = R · diag(s²) · Rᵀ, packed upper-triangular (..., 6) as
    (xx, xy, xz, yy, yz, zz) (forward.cu:121-155)."""
    R = quat_to_rotmat(quats)
    s = scales * scale_modifier
    M = R * s[..., None, :]  # R @ diag(s)
    sigma = jnp.matmul(M, jnp.swapaxes(M, -1, -2), precision=_HI)
    return jnp.stack(
        [
            sigma[..., 0, 0], sigma[..., 0, 1], sigma[..., 0, 2],
            sigma[..., 1, 1], sigma[..., 1, 2], sigma[..., 2, 2],
        ],
        axis=-1,
    )


def transform_point_4x3(p, matrix_t):
    """[p, 1] @ M[:, :3] (auxiliary.h:58-66)."""
    return jnp.matmul(p, matrix_t[:3, :3], precision=_HI) + matrix_t[3, :3]


def transform_point_4x4(p, matrix_t):
    """[p, 1] @ M (auxiliary.h:68-77)."""
    return jnp.matmul(p, matrix_t[:3, :], precision=_HI) + matrix_t[3, :]


def compute_cov2d(mean3d, focal_x, focal_y, tan_fovx, tan_fovy, cov3d, viewmatrix):
    """EWA 3D→2D covariance projection (forward.cu:74-116).

    Args:
        mean3d: (N, 3) world means.
        cov3d: (N, 6) packed Σ.
        viewmatrix: (4, 4) transposed w2c (torch layout).

    Returns:
        (N, 3): (cov_xx, cov_xy, cov_yy) with the +0.3 diagonal low-pass.
    """
    t = transform_point_4x3(mean3d, viewmatrix)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tz = t[..., 2]
    txtz = t[..., 0] / tz
    tytz = t[..., 1] / tz
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz

    # EWA Jacobian (2x3 rows of forward.cu:89-92's J, transposed glm layout)
    zero = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            jnp.stack([focal_x / tz, zero, -(focal_x * tx) / (tz * tz)], -1),
            jnp.stack([zero, focal_y / tz, -(focal_y * ty) / (tz * tz)], -1),
        ],
        axis=-2,
    )  # (N, 2, 3)

    R_w2c = viewmatrix[:3, :3].T  # (3, 3)
    Vrk = unpack_sym6(cov3d)  # (N, 3, 3)
    # cov = J · (R Σ Rᵀ) · Jᵀ  == top-left 2x2 of forward.cu:106's Tᵀ·Vrkᵀ·T
    M = jnp.matmul(J, R_w2c, precision=_HI)  # (N, 2, 3)
    cov = jnp.matmul(jnp.matmul(M, Vrk, precision=_HI),
                     jnp.swapaxes(M, -1, -2), precision=_HI)  # (N, 2, 2)
    return jnp.stack(
        [cov[..., 0, 0] + 0.3, cov[..., 0, 1], cov[..., 1, 1] + 0.3], axis=-1
    )


def unpack_sym6(c6):
    """(…, 6) packed -> (…, 3, 3) symmetric."""
    xx, xy, xz, yy, yz, zz = (c6[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], -1),
            jnp.stack([xy, yy, yz], -1),
            jnp.stack([xz, yz, zz], -1),
        ],
        axis=-2,
    )


def ndc2pix(v, S):
    """((v + 1)·S − 1)/2 (auxiliary.h:41-44)."""
    return ((v + 1.0) * S - 1.0) * 0.5


def project_points(mean3d, projmatrix):
    """Full projective transform with the reference's 1e-7-guarded divide
    (forward.cu:200-203). Returns (N, 3) NDC."""
    p_hom = transform_point_4x4(mean3d, projmatrix)
    p_w = 1.0 / (p_hom[..., 3] + 1e-7)
    return p_hom[..., :3] * p_w[..., None]


def conic_and_radius(cov2d):
    """Invert the 2D covariance and bound the splat extent
    (forward.cu:222-235).

    Returns (conic (N,3), radius (N,), det_valid (N,) bool).
    """
    det = cov2d[..., 0] * cov2d[..., 2] - cov2d[..., 1] * cov2d[..., 1]
    det_valid = det != 0.0
    det_inv = 1.0 / jnp.where(det_valid, det, 1.0)
    conic = jnp.stack(
        [cov2d[..., 2] * det_inv, -cov2d[..., 1] * det_inv, cov2d[..., 0] * det_inv],
        axis=-1,
    )
    mid = 0.5 * (cov2d[..., 0] + cov2d[..., 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    lambda2 = mid - disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, lambda2)))
    return conic, radius, det_valid


def get_rect(point_image, radius, grid_x, grid_y, tile_x, tile_y):
    """Tile bounding rectangle (auxiliary.h:46-56). C's float->int cast
    truncates toward zero; reproduced with trunc before the clamp."""
    px, py = point_image[..., 0], point_image[..., 1]
    rmin_x = jnp.clip(jnp.trunc((px - radius) / tile_x), 0, grid_x).astype(jnp.int32)
    rmin_y = jnp.clip(jnp.trunc((py - radius) / tile_y), 0, grid_y).astype(jnp.int32)
    rmax_x = jnp.clip(
        jnp.trunc((px + radius + tile_x - 1) / tile_x), 0, grid_x
    ).astype(jnp.int32)
    rmax_y = jnp.clip(
        jnp.trunc((py + radius + tile_y - 1) / tile_y), 0, grid_y
    ).astype(jnp.int32)
    return rmin_x, rmin_y, rmax_x, rmax_y


def in_frustum(mean3d, viewmatrix):
    """Near cull: view-space z > 0.2 (auxiliary.h:139-164).
    Returns (p_view (N,3), mask (N,))."""
    p_view = transform_point_4x3(mean3d, viewmatrix)
    return p_view, p_view[..., 2] > 0.2
