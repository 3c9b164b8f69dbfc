"""Ray bundles (ref ``Ray``, structures.py:1123-1334)."""

from __future__ import annotations

import typing as T

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class Ray:
    origins_w: jnp.ndarray  # (b, *m, 3)
    directions_w: jnp.ndarray  # (b, *m, 3)

    @property
    def shape(self):
        return self.origins_w.shape[:-1]

    def reshape(self, *shape) -> "Ray":
        return Ray(
            origins_w=self.origins_w.reshape(*shape, 3),
            directions_w=self.directions_w.reshape(*shape, 3),
        )

    def chunk(self, chunks: int, dim: int = 1) -> T.List["Ray"]:
        os = jnp.array_split(self.origins_w, chunks, axis=dim)
        ds = jnp.array_split(self.directions_w, chunks, axis=dim)
        return [Ray(o, d) for o, d in zip(os, ds)]

    @staticmethod
    def cat(rays: T.Sequence["Ray"], dim: int = 1) -> "Ray":
        return Ray(
            origins_w=jnp.concatenate([r.origins_w for r in rays], axis=dim),
            directions_w=jnp.concatenate([r.directions_w for r in rays], axis=dim),
        )

    def random_perturb_direction(self, key, max_angle_deg: float) -> "Ray":
        """Perturb each direction inside a fixed-angle cone
        (ref structures.py:1157-1188, fixed-angle branch)."""
        d = self.directions_w
        k1, k2 = jax.random.split(key)
        ang = jax.random.uniform(k1, d.shape[:-1]) * jnp.deg2rad(max_angle_deg)
        phi = jax.random.uniform(k2, d.shape[:-1]) * 2 * jnp.pi
        # build orthonormal basis around d
        helper = jnp.where(
            jnp.abs(d[..., 0:1]) < 0.9,
            jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), d.shape),
            jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), d.shape),
        )
        u = jnp.cross(d, helper)
        u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
        v = jnp.cross(d, u)
        sa, ca = jnp.sin(ang)[..., None], jnp.cos(ang)[..., None]
        new_d = ca * d + sa * (jnp.cos(phi)[..., None] * u + jnp.sin(phi)[..., None] * v)
        new_d = new_d / jnp.linalg.norm(new_d, axis=-1, keepdims=True)
        return self.replace(directions_w=new_d)

    def state_dict(self):
        import numpy as np

        return {
            "origins_w": np.asarray(self.origins_w),
            "directions_w": np.asarray(self.directions_w),
        }
