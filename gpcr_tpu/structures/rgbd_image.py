"""RGBD image batches + unprojection + dataset exporters.

Equivalent surface to the reference ``RGBDImage`` (structures.py:2231-3479):
(b, q, h, w, ·) rgb/depth/normal/hit containers with a Camera, depth
unprojection into PointCloud (``get_pcd`` — compute_3d_xyz semantics:
pixel-center +0.5 rays through inv(K), plib/utils.py:1036-1127), random
patch sampling, and the dataset-tree exporter (save_as_dataset,
structures.py:2578-2689). The npbgpp/rtmv/llff exporters of the reference
are reduced to the generic dataset tree + camera json (those formats exist
for external baseline tools not reproduced here).
"""

from __future__ import annotations

import json
import os
import typing as T

import flax.struct
import jax.numpy as jnp
import numpy as np

from .camera import Camera
from .pointcloud import PointCloud


@flax.struct.dataclass
class RGBDImage:
    rgb: jnp.ndarray  # (b, q, h, w, 3)
    depth: jnp.ndarray  # (b, q, h, w) z-depth in camera coords; inf = miss
    camera: Camera
    normal_w: T.Optional[jnp.ndarray] = None  # (b, q, h, w, 3)
    hit_map: T.Optional[jnp.ndarray] = None  # (b, q, h, w)
    feature: T.Optional[jnp.ndarray] = None  # (b, q, h, w, f)

    @property
    def batch_shape(self):
        return self.rgb.shape[:2]

    # ---- unprojection (structures.py:2331-2454 + plib/utils.py:1036) ------

    def get_pcd(self, subsample: int = 1, max_depth: float = 1e11) -> PointCloud:
        """Unproject every valid pixel into a world-space point cloud.

        Points per batch item are flattened over (q, h', w'); invalid pixels
        (inf/nan depth or beyond max_depth) are masked out via valid_mask.
        Also carries the capture-geometry attributes the reference computes
        (captured_z_direction_w; view directions).
        """
        b, q, h, w = self.depth.shape
        u = jnp.arange(0, w, subsample, dtype=jnp.float32)
        v = jnp.arange(0, h, subsample, dtype=jnp.float32)
        uu, vv = jnp.meshgrid(u, v, indexing="xy")
        z = self.depth[..., ::subsample, ::subsample]  # (b, q, h', w')
        hh, ww = z.shape[-2:]

        uvw = jnp.stack(
            [(uu + 0.5) * z, (vv + 0.5) * z, z], axis=-1
        )[..., None]  # (b, q, h', w', 3, 1)
        inv_K = jnp.linalg.inv(self.camera.intrinsic)[:, :, None, None]
        xyz_c = (inv_K @ uvw)[..., 0]
        ones = jnp.ones((*xyz_c.shape[:-1], 1), xyz_c.dtype)
        xyz1 = jnp.concatenate([xyz_c, ones], axis=-1)[..., None]
        H = self.camera.H_c2w[:, :, None, None]
        xyz_w = (H @ xyz1)[..., :3, 0]  # (b, q, h', w', 3)

        valid = jnp.isfinite(z) & (z > 0) & (z < max_depth)

        zdir = jnp.broadcast_to(
            self.camera.H_c2w[..., :3, 2][:, :, None, None], xyz_w.shape
        )
        cam_o = jnp.broadcast_to(
            self.camera.H_c2w[..., :3, 3][:, :, None, None], xyz_w.shape
        )
        view_dir = xyz_w - cam_o
        view_dir = view_dir / jnp.maximum(
            jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-12
        )

        def flat(x, d):
            return x.reshape(b, q * hh * ww, d)

        rgb = self.rgb[..., ::subsample, ::subsample, :]
        pcd = PointCloud(
            xyz_w=flat(jnp.where(valid[..., None], xyz_w, 0.0), 3),
            rgb=flat(rgb, 3),
            normal_w=(
                flat(self.normal_w[..., ::subsample, ::subsample, :], 3)
                if self.normal_w is not None
                else None
            ),
            valid_mask=flat(valid[..., None], 1),
            captured_z_direction_w=flat(zdir, 3),
            captured_view_direction_w=flat(view_dir, 3),
            img_idxs=flat(
                jnp.broadcast_to(
                    jnp.arange(q * hh * ww).reshape(1, q, hh, ww, 1),
                    (b, q, hh, ww, 1),
                ),
                1,
            ),
        )
        return pcd

    # ---- patches (structures.py:2456-2559) --------------------------------

    def sample_random_patches(self, patch_h: int, patch_w: int, num: int, key):
        """Random aligned patches: returns dict of (b, q, num, ph, pw, ·)."""
        import jax

        b, q, h, w = self.depth.shape
        ky, kx = jax.random.split(key)
        ys = jax.random.randint(ky, (num,), 0, max(h - patch_h, 1))
        xs = jax.random.randint(kx, (num,), 0, max(w - patch_w, 1))

        def gather(img):
            if img is None:
                return None

            def one(y, x):
                return jax.lax.dynamic_slice(
                    img,
                    (0, 0, y, x) + (0,) * (img.ndim - 4),
                    (b, q, patch_h, patch_w) + img.shape[4:],
                )

            return jax.vmap(one, out_axes=2)(ys, xs)

        return {
            "rgb": gather(self.rgb),
            "depth": gather(self.depth),
            "normal_w": gather(self.normal_w),
            "hit_map": gather(self.hit_map),
        }

    # ---- persistence (structures.py:2561-2689) ----------------------------

    def state_dict(self):
        out = {
            "rgb": np.asarray(self.rgb),
            "depth": np.asarray(self.depth),
            "camera": self.camera.state_dict(),
        }
        if self.normal_w is not None:
            out["normal_w"] = np.asarray(self.normal_w)
        if self.hit_map is not None:
            out["hit_map"] = np.asarray(self.hit_map)
        return out

    def save_as_dataset(self, out_dir: str, overwrite: bool = True):
        """Dataset tree: rgb pngs + abs_depth.npy + normal pngs + hitmap pngs
        + camera.json (structures.py:2578-2689 conventions)."""
        from ..io.image import save_pic, write_png, to_uint8

        if not overwrite and os.path.exists(out_dir):
            raise FileExistsError(out_dir)
        os.makedirs(out_dir, exist_ok=True)
        save_pic(np.asarray(self.rgb), os.path.join(out_dir, "rgb"), "rgb")
        np.save(os.path.join(out_dir, "abs_depth.npy"), np.asarray(self.depth))
        if self.normal_w is not None:
            save_pic(
                np.asarray(self.normal_w), os.path.join(out_dir, "normal"),
                "normal_w",
                hit_map=(
                    np.asarray(self.hit_map)[..., None]
                    if self.hit_map is not None
                    else None
                ),
            )
        if self.hit_map is not None:
            hm = np.asarray(self.hit_map)
            os.makedirs(os.path.join(out_dir, "hitmap"), exist_ok=True)
            b, q = hm.shape[:2]
            for ib in range(b):
                for iq in range(q):
                    write_png(
                        os.path.join(out_dir, "hitmap", f"hit_{iq}.png"),
                        to_uint8(hm[ib, iq]),
                    )
        self.camera.save(os.path.join(out_dir, "camera.json"))
