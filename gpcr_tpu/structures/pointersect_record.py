"""PointersectRecord — ray-intersection record container.

Equivalent surface to the reference ``PointersectRecord``
(structures.py:1336-1694), the legacy record type from the pointersect
baseline that the repo's data tooling still flows through: per-ray
intersection xyz/normal/rgb, blending weights, neighbor indices, ray
t/hit/logit, plus aggregation, chunk/cat, confidence computation, and RGBD
conversion.
"""

from __future__ import annotations

import typing as T

import flax.struct
import jax.numpy as jnp

from .camera import Camera


@flax.struct.dataclass
class PointersectRecord:
    intersection_xyz_w: T.Optional[jnp.ndarray] = None  # (b, m, 3)
    intersection_surface_normal_w: T.Optional[jnp.ndarray] = None  # (b, m, 3)
    intersection_rgb: T.Optional[jnp.ndarray] = None  # (b, m, 3)
    blending_weights: T.Optional[jnp.ndarray] = None  # (b, m, k)
    neighbor_point_idxs: T.Optional[jnp.ndarray] = None  # (b, m, k)
    ray_t: T.Optional[jnp.ndarray] = None  # (b, m)
    ray_hit: T.Optional[jnp.ndarray] = None  # (b, m) bool/float
    ray_hit_logit: T.Optional[jnp.ndarray] = None  # (b, m)
    model_attn_weights: T.Optional[jnp.ndarray] = None  # (b, m, k)

    _ATTRS = (
        "intersection_xyz_w", "intersection_surface_normal_w",
        "intersection_rgb", "blending_weights", "neighbor_point_idxs",
        "ray_t", "ray_hit", "ray_hit_logit", "model_attn_weights",
    )

    # ---- reshaping (ref :1410-1545) ---------------------------------------

    def _map(self, fn) -> "PointersectRecord":
        return self.replace(
            **{
                k: (fn(getattr(self, k)) if getattr(self, k) is not None else None)
                for k in self._ATTRS
            }
        )

    def reshape(self, *m_shape) -> "PointersectRecord":
        ray_ndim = self.ray_t.ndim  # (b, *m)

        def fn(a):
            return a.reshape(a.shape[0], *m_shape, *a.shape[ray_ndim:])

        return self._map(fn)

    def chunk(self, chunks: int, dim: int = 1) -> T.List["PointersectRecord"]:
        outs = None
        for k in self._ATTRS:
            arr = getattr(self, k)
            if arr is None:
                continue
            parts = jnp.array_split(arr, chunks, axis=dim)
            if outs is None:
                outs = [dict() for _ in parts]
            for i, p in enumerate(parts):
                outs[i][k] = p
        return [PointersectRecord(**d) for d in (outs or [])]

    @staticmethod
    def cat(records: T.Sequence["PointersectRecord"], dim: int = 1):
        out = {}
        for k in PointersectRecord._ATTRS:
            arrs = [getattr(r, k) for r in records]
            out[k] = (
                None if any(a is None for a in arrs)
                else jnp.concatenate(arrs, axis=dim)
            )
        return PointersectRecord(**out)

    @staticmethod
    def aggregate(records: T.Sequence["PointersectRecord"]):
        """Average records (renormalizing normals) — ref :1489-1545."""
        out = {}
        for k in PointersectRecord._ATTRS:
            arrs = [getattr(r, k) for r in records]
            if any(a is None for a in arrs):
                out[k] = None
                continue
            m = sum(arrs) / len(arrs)
            if k == "intersection_surface_normal_w":
                m = m / jnp.maximum(
                    jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-12
                )
            out[k] = m
        return PointersectRecord(**out)

    # ---- conversion (ref :1602-1659) --------------------------------------

    def get_rgbd_image(self, camera: Camera):
        """Convert per-pixel records into an RGBDImage via w2c z-depth."""
        from ..utils.rigid_motion import inv_homogeneous
        from .rgbd_image import RGBDImage

        b, q = camera.H_c2w.shape[:2]
        h, w = camera.height_px, camera.width_px
        xyz = self.intersection_xyz_w.reshape(b, q, h, w, 3)
        H_w2c = inv_homogeneous(camera.H_c2w)
        xyz_c = (
            jnp.einsum("bqij,bqhwj->bqhwi", H_w2c[..., :3, :3], xyz)
            + H_w2c[..., :3, 3][:, :, None, None, :]
        )
        z = xyz_c[..., 2]
        hit = (
            self.ray_hit.reshape(b, q, h, w)
            if self.ray_hit is not None
            else jnp.isfinite(z).astype(jnp.float32)
        )
        z = jnp.where(hit > 0.5, z, jnp.inf)
        return RGBDImage(
            rgb=self.intersection_rgb.reshape(b, q, h, w, 3),
            depth=z,
            camera=camera,
            normal_w=(
                self.intersection_surface_normal_w.reshape(b, q, h, w, 3)
                if self.intersection_surface_normal_w is not None
                else None
            ),
            hit_map=hit,
        )

    # ---- confidence (ref :1661-1694) --------------------------------------

    def compute_confidence(
        self, zdir_w: T.Optional[jnp.ndarray] = None,
        hit_threshold: float = 0.5, max_angle_deg: float = 85.0,
    ):
        """Hit-probability gate x normal-grazing-angle gate."""
        conf = jnp.ones_like(self.ray_t)
        if self.ray_hit_logit is not None:
            conf = conf * (1.0 / (1.0 + jnp.exp(-self.ray_hit_logit)))
        elif self.ray_hit is not None:
            conf = conf * (self.ray_hit > hit_threshold)
        if zdir_w is not None and self.intersection_surface_normal_w is not None:
            cos = jnp.abs(
                jnp.sum(self.intersection_surface_normal_w * zdir_w, axis=-1)
            )
            conf = conf * (cos > jnp.cos(jnp.deg2rad(max_angle_deg)))
        return conf

    def state_dict(self):
        import numpy as np

        return {
            k: np.asarray(getattr(self, k))
            for k in self._ATTRS
            if getattr(self, k) is not None
        }
