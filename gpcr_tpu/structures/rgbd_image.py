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

    def save(self, out_dir: str, overwrite: bool = True, gif_fps: float = 10.0,
             video: bool = False):
        """PNG tree + optional gif/mp4 of the rgb sequence
        (structures.py:2691-2949)."""
        self.save_as_dataset(out_dir, overwrite=overwrite)
        from ..utils.media import create_gif, create_video

        frames = [np.asarray(self.rgb[0, iq]) for iq in range(self.rgb.shape[1])]
        if len(frames) > 1:
            create_gif(frames, os.path.join(out_dir, "rgb.gif"), fps=gif_fps)
            if video:
                create_video(frames, os.path.join(out_dir, "rgb.mp4"))

    def save_as_npbgpp(self, out_dir: str):
        """npbg++-style tree: images/ + per-view camera matrices as npz
        (structures.py:2950-3057 — reduced to the geometric essentials; the
        reference format exists to feed the external npbg++ baseline)."""
        from ..io.image import save_pic

        os.makedirs(out_dir, exist_ok=True)
        save_pic(np.asarray(self.rgb), os.path.join(out_dir, "images"), "rgb")
        np.savez(
            os.path.join(out_dir, "cameras.npz"),
            H_c2w=np.asarray(self.camera.H_c2w),
            intrinsic=np.asarray(self.camera.intrinsic),
            width_px=self.camera.width_px,
            height_px=self.camera.height_px,
        )

    def save_as_rtmv(self, out_dir: str):
        """RTMV-style tree: per-view json (camera_data) + rgb/depth
        (structures.py:3059-3307 — reduced: exr depth becomes .npy)."""
        from ..io.image import save_pic

        os.makedirs(out_dir, exist_ok=True)
        save_pic(np.asarray(self.rgb), out_dir, "rgb")
        np.save(os.path.join(out_dir, "depth.npy"), np.asarray(self.depth))
        b, q = self.rgb.shape[:2]
        K = np.asarray(self.camera.intrinsic)
        H = np.asarray(self.camera.H_c2w)
        for iq in range(q):
            cam = {
                "camera_data": {
                    "width": self.camera.width_px,
                    "height": self.camera.height_px,
                    "intrinsics": {
                        "fx": float(K[0, iq, 0, 0]),
                        "fy": float(K[0, iq, 1, 1]),
                        "cx": float(K[0, iq, 0, 2]),
                        "cy": float(K[0, iq, 1, 2]),
                    },
                    "cam2world": H[0, iq].tolist(),
                }
            }
            with open(os.path.join(out_dir, f"{iq:05d}.json"), "w") as f:
                json.dump(cam, f)

    def save_as_llff(self, out_dir: str):
        """LLFF-style tree: images/ + poses_bounds.npy (N, 17)
        (structures.py:3308-3479). Row = [3x5 pose matrix (R|t|hwf), near,
        far]; LLFF camera axes are (down, right, backwards) relative to our
        (right, down, forward) image convention."""
        from ..io.image import save_pic

        os.makedirs(out_dir, exist_ok=True)
        save_pic(np.asarray(self.rgb), os.path.join(out_dir, "images"), "rgb")
        b, q = self.rgb.shape[:2]
        H = np.asarray(self.camera.H_c2w)
        K = np.asarray(self.camera.intrinsic)
        depth = np.asarray(self.depth)
        rows = []
        for iq in range(q):
            R = H[0, iq, :3, :3]
            t = H[0, iq, :3, 3]
            # ours: x right, y down, z forward -> llff: x down, y right, z back
            R_llff = np.stack([R[:, 1], R[:, 0], -R[:, 2]], axis=1)
            hwf = np.array(
                [self.camera.height_px, self.camera.width_px, K[0, iq, 0, 0]]
            )
            pose = np.concatenate([R_llff, t[:, None], hwf[:, None]], axis=1)
            d = depth[0, iq]
            finite = d[np.isfinite(d) & (d > 0)]
            near = float(finite.min()) * 0.9 if finite.size else 0.1
            far = float(finite.max()) * 1.1 if finite.size else 10.0
            rows.append(np.concatenate([pose.reshape(-1), [near, far]]))
        np.save(os.path.join(out_dir, "poses_bounds.npy"),
                np.stack(rows).astype(np.float64))

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
