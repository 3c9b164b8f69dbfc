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
    (xx, xy, xz, yy, yz, zz) (forward.cu:121-155).

    Written as explicit elementwise ops: batched (N, 3, 3) matmuls lower to
    catastrophically under-utilized MXU calls on TPU (~100x slower than VPU
    elementwise for this shape)."""
    r, x, y, z = quats[..., 0], quats[..., 1], quats[..., 2], quats[..., 3]
    m = (
        jnp.stack(
            [
                1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
                2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
                2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
            ],
            axis=-1,
        )
        * jnp.tile(scales * scale_modifier, (1,) * (scales.ndim - 1) + (3,))
    )
    # rows of M = R * diag(s); sigma_ij = sum_k M_ik M_jk
    m00, m01, m02 = m[..., 0], m[..., 1], m[..., 2]
    m10, m11, m12 = m[..., 3], m[..., 4], m[..., 5]
    m20, m21, m22 = m[..., 6], m[..., 7], m[..., 8]
    return jnp.stack(
        [
            m00 * m00 + m01 * m01 + m02 * m02,
            m00 * m10 + m01 * m11 + m02 * m12,
            m00 * m20 + m01 * m21 + m02 * m22,
            m10 * m10 + m11 * m11 + m12 * m12,
            m10 * m20 + m11 * m21 + m12 * m22,
            m20 * m20 + m21 * m21 + m22 * m22,
        ],
        axis=-1,
    )


def transform_point_4x3(p, matrix_t):
    """[p, 1] @ M[:, :3] (auxiliary.h:58-66). Elementwise (VPU) on TPU."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    cols = [
        x * matrix_t[0, j] + y * matrix_t[1, j] + z * matrix_t[2, j]
        + matrix_t[3, j]
        for j in range(3)
    ]
    return jnp.stack(cols, axis=-1)


def transform_point_4x4(p, matrix_t):
    """[p, 1] @ M (auxiliary.h:68-77). Elementwise (VPU) on TPU."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    cols = [
        x * matrix_t[0, j] + y * matrix_t[1, j] + z * matrix_t[2, j]
        + matrix_t[3, j]
        for j in range(4)
    ]
    return jnp.stack(cols, axis=-1)


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

    # Fully elementwise EWA chain (see compute_cov3d note on batched tiny
    # matmuls). J rows (2x3): [fx/tz, 0, -fx·tx/tz²], [0, fy/tz, -fy·ty/tz²].
    j00 = focal_x / tz
    j02 = -(focal_x * tx) / (tz * tz)
    j11 = focal_y / tz
    j12 = -(focal_y * ty) / (tz * tz)

    # rows of M = J @ R_w2c, with R_w2c = viewmatrix[:3,:3].T (scalar consts)
    w = viewmatrix  # w[j][i] = R_w2c[i, j]
    a0 = j00 * w[0, 0] + j02 * w[0, 2]
    a1 = j00 * w[1, 0] + j02 * w[1, 2]
    a2 = j00 * w[2, 0] + j02 * w[2, 2]
    b0 = j11 * w[0, 1] + j12 * w[0, 2]
    b1 = j11 * w[1, 1] + j12 * w[1, 2]
    b2 = j11 * w[2, 1] + j12 * w[2, 2]

    # cov = M · Vrk · Mᵀ with Vrk packed (xx, xy, xz, yy, yz, zz)
    xx, xy, xz = cov3d[..., 0], cov3d[..., 1], cov3d[..., 2]
    yy, yz, zz = cov3d[..., 3], cov3d[..., 4], cov3d[..., 5]
    # v_a = Vrk @ a, v_b = Vrk @ b
    va0 = xx * a0 + xy * a1 + xz * a2
    va1 = xy * a0 + yy * a1 + yz * a2
    va2 = xz * a0 + yz * a1 + zz * a2
    vb0 = xx * b0 + xy * b1 + xz * b2
    vb1 = xy * b0 + yy * b1 + yz * b2
    vb2 = xz * b0 + yz * b1 + zz * b2
    c00 = a0 * va0 + a1 * va1 + a2 * va2
    c01 = a0 * vb0 + a1 * vb1 + a2 * vb2
    c11 = b0 * vb0 + b1 * vb1 + b2 * vb2
    return jnp.stack([c00 + 0.3, c01, c11 + 0.3], axis=-1)


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


def conic_and_radius(cov2d, opacity=None):
    """Invert the 2D covariance and bound the splat extent
    (forward.cu:222-235).

    Returns (conic (N,3), radius (N,), det_valid (N,) bool), plus a
    TIGHT radius (N,) appended when ``opacity`` is given.

    The reference uses a blanket 3-sigma radius. With ``opacity`` the
    tight radius exploits the blend's own 1/255 alpha skip
    (forward.cu:318-320): alpha = op*exp(-q/2) >= 1/255 requires
    q <= thr = 2*ln(255*op), and q = d^T Sigma^{-1} d >= |d|^2/lambda_max,
    so every pixel farther than sqrt(thr*lambda_max) is skipped by the
    blend anyway. getRect's far edges only guarantee |dx| > r - 1 for
    excluded tiles (the trunc((p + r + tile - 1)/tile) convention,
    auxiliary.h:46-56), so the tight radius carries a +1 slack:
    r_tight = ceil(sqrt(min(9, thr)*lambda_max)) + 1, clamped at the
    reference radius so opaque splats (thr >= 9) keep rects (and thus
    the reference's own 3-sigma alpha cut) BIT-EXACT. op <= 1/255
    splats are culled outright (r_tight = 0): alpha <= op < 1/255 at
    every pixel.
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
    lmax = jnp.maximum(lambda1, lambda2)
    radius = jnp.ceil(3.0 * jnp.sqrt(lmax))
    if opacity is None:
        return conic, radius, det_valid
    thr = 2.0 * jnp.log(255.0 * jnp.maximum(opacity, 1e-12))
    r_tight = jnp.where(
        thr > 0.0,
        jnp.minimum(
            radius,
            jnp.ceil(jnp.sqrt(jnp.minimum(9.0, thr) * lmax)) + 1.0,
        ),
        0.0,
    )
    return conic, radius, det_valid, r_tight


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
