"""Camera trajectory factories.

Equivalent surface to the reference ``CameraTrajectory``
(structures.py:4056-4491) and ``generate_camera_circle_path``
(structures.py:3950-4053): circle orbits, the fixed 6-view ``udlrfb`` cube,
manual eye/up/look-at lists, 'assign' pose arrays, camera-file loading, and
spiral perturbation of an existing path. Numpy/jnp only.
"""

from __future__ import annotations

import typing as T

import jax.numpy as jnp
import numpy as np

from ..utils import rigid_motion
from .camera import Camera, derive_camera_intrinsics


def generate_camera_circle_path(
    num_poses: int,
    d_to_origin: float,
    r_circle: float,
    center_angles,
    invert_yz: bool = True,
    alt_yaxis: bool = False,
):
    """Look-at-origin camera circle (ref structures.py:3950-4053).

    Cameras sit on a circle of radius ``r_circle`` on the plane
    z = ``d_to_origin`` (pre-rotation), the plane normal rotated to the
    direction given by ``center_angles`` = (theta_deg, phi_deg). Returns
    (num_poses, 4, 4) H_c2w with the image-coordinate yz inversion applied.
    """
    center_angles = jnp.asarray(center_angles, jnp.float32)
    if invert_yz:
        center_angles = -1.0 * center_angles

    thetas = jnp.linspace(0.0, 2.0 * jnp.pi, num_poses) + jnp.pi
    cam_positions_c = jnp.stack(
        [
            jnp.cos(thetas) * float(r_circle),
            jnp.sin(thetas) * float(r_circle),
            jnp.ones((num_poses,)) * float(d_to_origin),
        ],
        axis=1,
    )

    v1 = jnp.array([0.0, 0.0, 1.0])
    a0 = center_angles[0] * jnp.pi / 180.0
    a1 = center_angles[1] * jnp.pi / 180.0
    v2 = jnp.stack([jnp.cos(a1) * jnp.cos(a0), jnp.cos(a1) * jnp.sin(a0), jnp.sin(a1)])
    R = rigid_motion.get_min_R(v1, v2)
    cam_positions_w = (R[None] @ cam_positions_c[..., None])[..., 0]

    if not alt_yaxis:
        ys = jnp.zeros_like(cam_positions_w).at[..., 1].set(1.0)
    else:
        ys = jnp.zeros_like(cam_positions_w).at[..., 2].set(1.0)
        ys = (R[None] @ ys[..., None])[..., 0]

    Rs_c2w = rigid_motion.construct_coord_frame(z=-1.0 * cam_positions_w, y=ys)
    H = jnp.zeros((num_poses, 4, 4), jnp.float32)
    H = H.at[:, :3, :3].set(Rs_c2w)
    H = H.at[:, :3, 3].set(cam_positions_w)
    H = H.at[:, 3, 3].set(1.0)
    if invert_yz:
        flip = jnp.diag(jnp.array([1.0, -1.0, -1.0, 1.0]))
        H = flip[None] @ H
    return H


class CameraTrajectory:
    """Pattern of camera poses (ref structures.py:4056-4491).

    Modes: 'assign', 'circle', 'udlrfb', 'manual', or a camera file
    (.npz/.json/.pt) whose path is passed as ``mode``. Removed-for-simplicity
    modes of the reference ('random', 'spiral', 'rect', 'grid', 'polar_grid',
    'basic', ...) raise NotImplementedError, matching the reference.
    """

    def __init__(
        self,
        mode: str,
        n_imgs: T.Optional[int],
        total: T.Optional[int],
        rng_seed: T.Union[int, np.random.RandomState] = 0,
        params: T.Optional[dict] = None,
    ):
        self.mode = mode
        self.n_imgs = n_imgs
        self.total = total
        self.rng = (
            rng_seed
            if isinstance(rng_seed, np.random.RandomState)
            else np.random.RandomState(seed=rng_seed or 0)
        )
        self.params = params or {}

        if mode == "assign":
            H = jnp.asarray(np.array(self.params["H_c2w"]), jnp.float32)
            if H.ndim == 3:
                self.n_imgs, self.cam_poses = H.shape[0], H[None]
            elif H.ndim == 4:
                self.total, self.n_imgs, self.cam_poses = H.shape[0], H.shape[1], H
            else:
                raise NotImplementedError
        elif mode == "circle":
            self.cam_poses = self._set_circle()
        elif mode == "udlrfb":
            self.cam_poses = self._set_udlrfb()
        elif mode == "manual":
            self.cam_poses = self._set_manual()
        elif mode in (
            "random", "spiral", "sketchfab_poisson", "rex_in", "rect",
            "basic", "grid", "polar_grid",
        ):
            raise NotImplementedError(
                f"'{mode}' camera removed for simplicity (matches reference)."
            )
        elif mode.lower().endswith((".pt", ".pth", ".npz", ".json")):
            camera = Camera.load(mode)
            if self.n_imgs is not None:
                camera = camera.uniformly_sample(num_samples=self.n_imgs)
            self.n_imgs = camera.H_c2w.shape[1]
            self.cam_poses = camera.H_c2w
        else:
            raise NotImplementedError(mode)

        if self.total is None:
            self.total = self.cam_poses.shape[0]
        assert self.n_imgs is not None

    # ---- modes ------------------------------------------------------------

    def _set_circle(self):
        """(ref structures.py:4171-4207)"""
        out = []
        for _ in range(self.total or 1):
            center_angles = self.params.get("center_angles")
            if center_angles is None:
                center_angles = self.rng.rand(2) * 360.0
            d = self.params.get("d")
            if d is None:
                max_r, min_r = self.params["max_r"], self.params["min_r"]
                d = self.rng.rand(1) * (max_r - min_r) + min_r
            r = self.params.get("r")
            if r is None:
                max_angle = self.params["max_angle"]
                r = self.rng.rand(1) * np.tan(max_angle * np.pi / 180.0) * d
            out.append(
                generate_camera_circle_path(
                    num_poses=self.n_imgs,
                    d_to_origin=float(np.asarray(d).reshape(-1)[0]),
                    r_circle=float(np.asarray(r).reshape(-1)[0]),
                    center_angles=np.asarray(center_angles, np.float32),
                    alt_yaxis=False,
                )
            )
        return jnp.stack(out, axis=0)

    def _set_udlrfb(self):
        """Fixed 6 views: up, left, front, right, back, down
        (ref structures.py:4209-4240)."""
        assert self.n_imgs == 6
        max_r, min_r = self.params["max_r"], self.params["min_r"]
        out = []
        for _ in range(self.total or 1):
            r = float(self.rng.rand(1) * (max_r - min_r) + min_r)
            ud = generate_camera_circle_path(3, 0.0, r, [0, 0], alt_yaxis=True)
            lrfb = generate_camera_circle_path(5, 0.0, r, [0, 90], alt_yaxis=True)
            poses = [ud[0], *[lrfb[j] for j in range(4)], ud[1]]
            out.append(jnp.stack(poses, axis=0))
        return jnp.stack(out, axis=0)

    def _set_manual(self):
        """Eye/up/look-at string lists + global frame
        (ref structures.py:4300-4371)."""
        p = self.params
        eyes = np.array(
            [[float(i) for i in e.split(" ")] for e in p["eye"]], np.float32
        ).reshape(-1, 3)
        assert self.n_imgs == eyes.shape[0]

        def _vec_list(key, default):
            v = p.get(key)
            if v is None:
                return np.broadcast_to(np.array(default, np.float32), eyes.shape)
            v = np.array([[float(i) for i in x.split(" ")] for x in v], np.float32)
            return np.broadcast_to(v, eyes.shape) if v.shape[0] == 1 else v

        ups = _vec_list("up", [0, 1.0, 0])
        look_ats = _vec_list("look_at", [0, 0.0, 0])

        def _vec(key, default):
            v = p.get(key)
            if v is None:
                return np.array(default, np.float32)
            return np.array([float(i) for i in v.split(" ")], np.float32)

        t_c2w = _vec("t_c2w", [0, 0, 0])
        y_c2w = _vec("y_c2w", [0, 1, 0])
        z_c2w = _vec("z_c2w", [0, 0, 1])
        R_g = rigid_motion.construct_coord_frame(z=z_c2w, y=y_c2w)
        H_g = jnp.zeros((4, 4), jnp.float32)
        H_g = H_g.at[:3, :3].set(R_g).at[:3, 3].set(t_c2w).at[3, 3].set(1.0)
        H = rigid_motion.get_H_c2w_lookat(eyes, look_ats, ups, invert_y=True)
        H = H_g[None] @ H
        return jnp.broadcast_to(H[None], (self.total or 1, *H.shape))

    # ---- spiral perturbation (ref structures.py:4373-4436) ----------------

    @staticmethod
    def get_spiral_trajectory(H_c2w, period: int, radius: float) -> "CameraTrajectory":
        """Spiral the camera centers around an existing (b, q, 4, 4) path."""
        b, q = H_c2w.shape[:2]
        assert q >= 2
        cs, cs_next = H_c2w[:, :-1, :3, 3], H_c2w[:, 1:, :3, 3]
        dz = jnp.concatenate([cs_next - cs, (cs_next - cs)[:, -1:]], axis=1)
        dz = dz / jnp.maximum(jnp.linalg.norm(dz, axis=-1, keepdims=True), 1e-9)
        dy = jnp.zeros_like(dz).at[..., 1].set(1.0)
        frames = rigid_motion.construct_coord_frame(z=dz, y=dy)
        dxs, dys = frames[..., 0], frames[..., 1]
        thetas = jnp.linspace(0.0, 2 * jnp.pi, period)
        xs = jnp.tile(jnp.cos(thetas) * radius, (q + period - 1) // period)[:q]
        ys = jnp.tile(jnp.sin(thetas) * radius, (q + period - 1) // period)[:q]
        shift = dxs * xs.reshape(1, q, 1) + dys * ys.reshape(1, q, 1)
        newH = H_c2w.at[:, :, :3, 3].add(shift)
        return CameraTrajectory(
            mode="assign", n_imgs=None, total=None, params=dict(H_c2w=np.asarray(newH))
        )

    # ---- materialize (ref structures.py:4438-4491) -------------------------

    def get_camera(self, fov: float, width_px: int, height_px: int) -> Camera:
        K = derive_camera_intrinsics(width_px, height_px, fov)
        H = self.cam_poses
        if H.ndim == 3:
            H = H[None]
        b, q = H.shape[:2]
        return Camera(
            H_c2w=H,
            intrinsic=jnp.broadcast_to(K, (b, q, 3, 3)),
            width_px=width_px,
            height_px=height_px,
        )
