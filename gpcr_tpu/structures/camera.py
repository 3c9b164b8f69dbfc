"""Batched pinhole cameras as JAX pytrees.

Equivalent surface to the reference ``Camera`` (structures.py:1696-2229) and
the module-level ray generators (structures.py:30-167), redesigned as an
immutable flax.struct pytree so cameras flow through jit/vmap/pjit.
Conventions preserved exactly:

- ``H_c2w``: (b, q, 4, 4) camera-to-world pose; image y points down (poses
  already carry the y/z inversion).
- ``intrinsic``: (b, q, 3, 3); f = 0.5 * width / tan(fov/2)
  (ref plib/render.py:446-471).
- Rays leave pixel centers: uv + 0.5, direction = H_c2w[:3,:3] @ inv(K) @
  [u, v, 1], normalized (ref structures.py:93-167).
"""

from __future__ import annotations

import json
import typing as T

import flax.struct
import jax.numpy as jnp
import numpy as np


def derive_camera_intrinsics(width_px: int, height_px: int, fov: float,
                             dtype=jnp.float32):
    """3x3 intrinsics from fov in degrees (ref plib/render.py:446-471)."""
    f = 0.5 * float(width_px) / np.tan(0.5 * fov / 180.0 * np.pi)
    return jnp.array(
        [[f, 0.0, width_px * 0.5], [0.0, f, height_px * 0.5], [0.0, 0.0, 1.0]],
        dtype=dtype,
    )


def generate_camera_rays_from_uv(cam_poses, intrinsics, uv):
    """Rays in world coordinates through given sensor uv points.

    Args:
        cam_poses: (m, 4, 4) H_c2w.
        intrinsics: (m, 3, 3).
        uv: (m, *p, 2); u in [0, w], v in [0, h], origin top-left.

    Returns:
        (origins (m, *p, 3), directions (m, *p, 3) unit-norm)
    (ref structures.py:30-90)
    """
    m = cam_poses.shape[0]
    p_shape = uv.shape[1:-1]
    uv1 = jnp.concatenate([uv, jnp.ones((*uv.shape[:-1], 1), uv.dtype)], axis=-1)
    inv_K = jnp.linalg.inv(intrinsics).reshape(m, *([1] * len(p_shape)), 3, 3)
    dirs_c = (inv_K @ uv1[..., None])[..., 0]
    R = cam_poses[:, :3, :3].reshape(m, *([1] * len(p_shape)), 3, 3)
    dirs_w = (R @ dirs_c[..., None])[..., 0]
    dirs_w = dirs_w / jnp.linalg.norm(dirs_w, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(
        cam_poses[:, :3, 3].reshape(m, *([1] * len(p_shape)), 3), dirs_w.shape
    )
    return origins, dirs_w


@flax.struct.dataclass
class Camera:
    """(b, q) batch of pinhole cameras (ref structures.py:1696)."""

    H_c2w: jnp.ndarray  # (b, q, 4, 4)
    intrinsic: jnp.ndarray  # (b, q, 3, 3)
    width_px: int = flax.struct.field(pytree_node=False)
    height_px: int = flax.struct.field(pytree_node=False)

    # ---- basic accessors -------------------------------------------------

    @property
    def batch_shape(self):
        return self.H_c2w.shape[:-2]

    def get_camera_origin_w(self):
        """(b, q, 3) camera origins in world (ref structures.py:1792)."""
        return self.H_c2w[..., :3, 3]

    def get_H_w2c(self):
        """Closed-form rigid inverse (ref structures.py:1857-1861)."""
        from ..utils.rigid_motion import inv_homogeneous

        return inv_homogeneous(self.H_c2w)

    # ---- reshaping / slicing (ref structures.py:1711-1790) ---------------

    def __getitem__(self, ib) -> "Camera":
        if isinstance(ib, int):
            ib = slice(ib, ib + 1)
        return self.replace(H_c2w=self.H_c2w[ib], intrinsic=self.intrinsic[ib])

    def index_select(self, dim: int, index) -> "Camera":
        return self.replace(
            H_c2w=jnp.take(self.H_c2w, index, axis=dim),
            intrinsic=jnp.take(self.intrinsic, index, axis=dim),
        )

    def chunk(self, chunks: int, dim: int = 0) -> T.List["Camera"]:
        hs = jnp.array_split(self.H_c2w, chunks, axis=dim)
        ks = jnp.array_split(self.intrinsic, chunks, axis=dim)
        return [self.replace(H_c2w=h, intrinsic=k) for h, k in zip(hs, ks)]

    @staticmethod
    def cat(cameras: T.Sequence["Camera"], dim: int) -> "Camera":
        assert len({c.width_px for c in cameras}) == 1
        assert len({c.height_px for c in cameras}) == 1
        return cameras[0].replace(
            H_c2w=jnp.concatenate([c.H_c2w for c in cameras], axis=dim),
            intrinsic=jnp.concatenate([c.intrinsic for c in cameras], axis=dim),
        )

    # ---- rays (ref structures.py:1863-1900) ------------------------------

    def generate_camera_rays(self, subsample: int = 1, offsets="center"):
        """Per-pixel rays. Returns (origins, dirs): (b, q, h', w', 3).

        ``offsets='center'`` reproduces pixel-center rays (+0.5); a float or
        (…, 2) array adds a custom sensor offset.
        """
        b, q = self.H_c2w.shape[:2]
        u = jnp.arange(0, self.width_px, subsample, dtype=jnp.float32) + 0.5
        v = jnp.arange(0, self.height_px, subsample, dtype=jnp.float32) + 0.5
        uu, vv = jnp.meshgrid(u, v, indexing="xy")
        uv = jnp.stack([uu, vv], axis=-1)  # (h', w', 2)
        if isinstance(offsets, str):
            if offsets != "center":
                raise NotImplementedError(offsets)
        else:
            uv = uv + jnp.asarray(offsets, jnp.float32)
        uv = jnp.broadcast_to(uv, (b * q, *uv.shape))
        o, d = generate_camera_rays_from_uv(
            self.H_c2w.reshape(b * q, 4, 4), self.intrinsic.reshape(b * q, 3, 3), uv
        )
        hw = uv.shape[1:3]
        return o.reshape(b, q, *hw, 3), d.reshape(b, q, *hw, 3)

    # ---- pixel-budget chunking (ref structures.py:1970-2026) -------------

    def split(self, max_pixels: int) -> T.List["Camera"]:
        """Split the view axis so each chunk renders at most ``max_pixels``
        (q_chunk * h * w) pixels — the reference's OOM-control chunking."""
        q = self.H_c2w.shape[1]
        per_view = self.width_px * self.height_px
        views_per_chunk = max(1, max_pixels // max(per_view, 1))
        out = []
        for s0 in range(0, q, views_per_chunk):
            s1 = min(s0 + views_per_chunk, q)
            out.append(
                self.replace(
                    H_c2w=self.H_c2w[:, s0:s1],
                    intrinsic=self.intrinsic[:, s0:s1],
                )
            )
        return out

    # ---- interpolation (ref structures.py:2028-2081) ---------------------

    def uniformly_sample(self, num_samples: int) -> "Camera":
        """Geodesically resample the (b, q) trajectory to q=num_samples."""
        from ..utils.rigid_motion import interp_homogeneous

        b, q = self.H_c2w.shape[:2]
        if q == 1:
            H = jnp.repeat(self.H_c2w, num_samples, axis=1)
            K = jnp.repeat(self.intrinsic[:, :1], num_samples, axis=1)
            return self.replace(H_c2w=H, intrinsic=K)
        t = jnp.linspace(0.0, q - 1.0, num_samples)
        i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, q - 2)
        frac = t - i0
        H0 = jnp.take(self.H_c2w, i0, axis=1)
        H1 = jnp.take(self.H_c2w, i0 + 1, axis=1)
        H = interp_homogeneous(H0, H1, frac[None, :])
        K = jnp.take(self.intrinsic, i0, axis=1)
        return self.replace(H_c2w=H, intrinsic=K)

    # ---- persistence (ref structures.py:1800-1855) -----------------------

    def state_dict(self):
        return {
            "H_c2w": np.asarray(self.H_c2w),
            "intrinsic": np.asarray(self.intrinsic),
            "width_px": self.width_px,
            "height_px": self.height_px,
        }

    @staticmethod
    def from_state_dict(d: dict) -> "Camera":
        return Camera(
            H_c2w=jnp.asarray(d["H_c2w"], jnp.float32),
            intrinsic=jnp.asarray(d["intrinsic"], jnp.float32),
            width_px=int(d["width_px"]),
            height_px=int(d["height_px"]),
        )

    def get_camera_frames(
        self, camera_frame_size: float = 0.1
    ) -> T.List[T.List[dict]]:
        """Per-camera coordinate-frame meshes for debug visualization —
        the reference's Camera.get_camera_frames
        (structures.py:2083-2099, via plib utils.get_o3d_camera_frame /
        o3d create_coordinate_frame): +X red / +Y green / +Z blue axis
        shafts plus a gray origin block, posed in world by H_c2w.

        Returns a [b][q] nested list of mesh dicts with keys
        ``vertices (V, 3) f32``, ``triangles (F, 3) i32``,
        ``colors (V, 3) f32``.
        """
        H = np.asarray(self.H_c2w, np.float64)
        b, q = H.shape[:2]
        return [
            [
                coordinate_frame_mesh(H[ib, iq], frame_size=camera_frame_size)
                for iq in range(q)
            ]
            for ib in range(b)
        ]

    def save_camera_frames(
        self,
        filename: str,
        camera_frame_size: float = 0.1,
        world_frame_size: T.Optional[float] = None,
    ) -> None:
        """Write all camera frames (+ optional world frame at the origin)
        into one OBJ with per-vertex colors (``v x y z r g b`` — the common
        extension; any extra floats on v-lines are ignored by plain
        loaders, including structures.mesh.load_obj). Replaces the
        reference's o3d draw_geometries debug window
        (structures.py:2160-2205) with a file artifact."""
        meshes = [m for row in self.get_camera_frames(camera_frame_size)
                  for m in row]
        if world_frame_size is not None:
            meshes.append(
                coordinate_frame_mesh(np.eye(4), frame_size=world_frame_size)
            )
        with open(filename, "w") as f:
            f.write("# gpcr_tpu camera frames\n")
            base = 0
            for m in meshes:
                for v, c in zip(m["vertices"], m["colors"]):
                    f.write(
                        f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f} "
                        f"{c[0]:.3f} {c[1]:.3f} {c[2]:.3f}\n"
                    )
                for t in m["triangles"]:
                    f.write(
                        f"f {t[0] + 1 + base} {t[1] + 1 + base} "
                        f"{t[2] + 1 + base}\n"
                    )
                base += len(m["vertices"])

    def save(self, filename: str):
        """Save as .npz (the framework's .pt analogue) or .json."""
        if filename.endswith(".json"):
            with open(filename, "w") as f:
                json.dump(
                    {
                        "H_c2w": np.asarray(self.H_c2w).tolist(),
                        "intrinsic": np.asarray(self.intrinsic).tolist(),
                        "width_px": self.width_px,
                        "height_px": self.height_px,
                    },
                    f,
                )
        else:
            np.savez(filename, **self.state_dict())

    @staticmethod
    def load(filename: str) -> "Camera":
        """Load from .npz / .json; also reads reference-style torch .pt
        state dicts if torch is importable (conversion path)."""
        if filename.endswith(".json"):
            with open(filename) as f:
                return Camera.from_state_dict(json.load(f))
        if filename.endswith((".pt", ".pth")):
            import torch  # torch-cpu is available in the env; used for interop only

            d = torch.load(filename, map_location="cpu")
            return Camera.from_state_dict(
                {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in d.items()}
            )
        with np.load(filename) as z:
            return Camera.from_state_dict({k: z[k] for k in z.files})

    load_json = load


def _box_mesh(lo, hi, color):
    """Axis-aligned box as (8 verts, 12 tris, per-vertex color)."""
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    corners = np.array(
        [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
         for z in (lo[2], hi[2])]
    )  # index bits: x<<2 | y<<1 | z
    tris = np.array(
        [
            [0, 1, 3], [0, 3, 2],  # -x
            [4, 6, 7], [4, 7, 5],  # +x
            [0, 4, 5], [0, 5, 1],  # -y
            [2, 3, 7], [2, 7, 6],  # +y
            [0, 2, 6], [0, 6, 4],  # -z
            [1, 5, 7], [1, 7, 3],  # +z
        ],
        np.int32,
    )
    colors = np.tile(np.asarray(color, np.float64), (8, 1))
    return corners, tris, colors


def coordinate_frame_mesh(H: np.ndarray, frame_size: float = 1.0) -> dict:
    """Triangle-mesh coordinate frame — the o3d
    ``create_coordinate_frame`` analogue behind the reference's
    get_o3d_camera_frame (plib utils:2551-2562): +X red, +Y green,
    +Z blue shafts of length ``frame_size`` plus a gray origin block,
    transformed into world coordinates by the (4, 4) pose ``H``."""
    s = float(frame_size)
    w = s / 20.0
    parts = [
        _box_mesh([-1.5 * w] * 3, [1.5 * w] * 3, [0.5, 0.5, 0.5]),
        _box_mesh([0, -w, -w], [s, w, w], [1.0, 0.0, 0.0]),
        _box_mesh([-w, 0, -w], [w, s, w], [0.0, 1.0, 0.0]),
        _box_mesh([-w, -w, 0], [w, w, s], [0.0, 0.0, 1.0]),
    ]
    verts = []
    tris = []
    colors = []
    base = 0
    for v, t, c in parts:
        verts.append(v)
        tris.append(t + base)
        colors.append(c)
        base += len(v)
    v = np.concatenate(verts)
    H = np.asarray(H, np.float64)
    v = v @ H[:3, :3].T + H[:3, 3]
    return {
        "vertices": v.astype(np.float32),
        "triangles": np.concatenate(tris),
        "colors": np.concatenate(colors).astype(np.float32),
    }
