"""ctypes bindings for the native (C++) components.

Native pieces (built on demand with g++, cached under native/build/):
- libgpcr_rt.so   — BVH triangle ray caster (native/raytracer.cpp), the
                    replacement for the reference's Open3D/Embree
                    RaycastingScene.

Every binding has a pure-python/numpy fallback at its call site, so the
framework works without a C++ toolchain (slower).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import typing as T

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE = os.path.join(_ROOT, "native")
_BUILD = os.path.join(_NATIVE, "build")
_LOCK = threading.Lock()
_CACHE: dict = {}


def _build_lib(name: str, sources: T.List[str], extra: T.List[str] = ()) -> str:
    os.makedirs(_BUILD, exist_ok=True)
    out = os.path.join(_BUILD, f"lib{name}.so")
    srcs = [os.path.join(_NATIVE, s) for s in sources]
    if os.path.exists(out) and all(
        os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs
    ):
        return out
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
        *extra, *srcs, "-o", out,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def get_raytracer():
    """Returns the loaded raytracer library or None if building fails."""
    with _LOCK:
        if "rt" in _CACHE:
            return _CACHE["rt"]
        try:
            lib = ctypes.CDLL(_build_lib("gpcr_rt", ["raytracer.cpp"]))
            lib.rt_build.restype = ctypes.c_void_p
            lib.rt_build.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ]
            lib.rt_cast.restype = None
            lib.rt_cast.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ]
            lib.rt_free.restype = None
            lib.rt_free.argtypes = [ctypes.c_void_p]
            _CACHE["rt"] = lib
        except Exception:
            _CACHE["rt"] = None
        return _CACHE["rt"]


class NativeRaycaster:
    """Owns a built BVH; mirrors o3d RaycastingScene.cast_rays output fields."""

    def __init__(self, vertices: np.ndarray, triangles: np.ndarray):
        self.lib = get_raytracer()
        if self.lib is None:
            raise RuntimeError("native raytracer unavailable")
        self._verts = np.ascontiguousarray(vertices, np.float32)
        self._tris = np.ascontiguousarray(triangles, np.int32)
        self.handle = self.lib.rt_build(
            self._verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(self._verts),
            self._tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(self._tris),
        )

    def cast(self, origins: np.ndarray, dirs: np.ndarray):
        """origins/dirs: (R, 3). Returns (t (R,), prim (R,), u (R,), v (R,))
        with t=inf / prim=-1 on miss; (u, v) Moller-Trumbore barycentrics of
        vertices 1 and 2."""
        o = np.ascontiguousarray(origins, np.float32)
        d = np.ascontiguousarray(dirs, np.float32)
        n = len(o)
        t = np.empty(n, np.float32)
        prim = np.empty(n, np.int32)
        u = np.empty(n, np.float32)
        v = np.empty(n, np.float32)
        self.lib.rt_cast(
            ctypes.c_void_p(self.handle),
            o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            prim.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            u.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return t, prim, u, v

    def __del__(self):
        try:
            if getattr(self, "handle", None) and self.lib is not None:
                self.lib.rt_free(ctypes.c_void_p(self.handle))
                self.handle = None
        except Exception:
            pass


def numpy_cast(vertices, triangles, origins, dirs, chunk=4096):
    """Brute-force Moller-Trumbore fallback (small meshes / no toolchain)."""
    v0 = vertices[triangles[:, 0]]
    e1 = vertices[triangles[:, 1]] - v0
    e2 = vertices[triangles[:, 2]] - v0
    n = len(origins)
    out_t = np.full(n, np.inf, np.float32)
    out_p = np.full(n, -1, np.int32)
    out_u = np.zeros(n, np.float32)
    out_v = np.zeros(n, np.float32)
    for s in range(0, n, chunk):
        o = origins[s : s + chunk, None, :]
        d = dirs[s : s + chunk, None, :]
        p = np.cross(d, e2[None])
        det = np.sum(e1[None] * p, -1)
        safe = np.abs(det) > 1e-12
        inv = np.where(safe, 1.0 / np.where(safe, det, 1.0), 0.0)
        tv = o - v0[None]
        u = np.sum(tv * p, -1) * inv
        q = np.cross(tv, e1[None])
        v = np.sum(d * q, -1) * inv
        t = np.sum(e2[None] * q, -1) * inv
        ok = safe & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 1e-6)
        t = np.where(ok, t, np.inf)
        best = np.argmin(t, axis=1)
        rows = np.arange(t.shape[0])
        bt = t[rows, best]
        hit = np.isfinite(bt)
        sl = slice(s, s + t.shape[0])
        out_t[sl] = bt
        out_p[sl] = np.where(hit, best, -1)
        out_u[sl] = np.where(hit, u[rows, best], 0)
        out_v[sl] = np.where(hit, v[rows, best], 0)
    return out_t, out_p, out_u, out_v


class GridRayQuery:
    """Grid-accelerated k-nearest-points-to-ray query (native/pr_query.cpp)
    — the pointersect `pr_utils` equivalent (plib/utils.py:520-576)."""

    def __init__(self, points: np.ndarray, cell_size: float):
        with _LOCK:
            lib = ctypes.CDLL(_build_lib("gpcr_pr", ["pr_query.cpp"]))
        lib.pr_build.restype = ctypes.c_void_p
        lib.pr_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_float,
        ]
        lib.pr_query.restype = None
        lib.pr_query.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_long, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.pr_free.restype = None
        lib.pr_free.argtypes = [ctypes.c_void_p]
        self.lib = lib
        self._pts = np.ascontiguousarray(points, np.float32)
        self.handle = lib.pr_build(
            self._pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(self._pts), ctypes.c_float(cell_size),
        )

    def query(self, origins, dirs, k: int, t_min=0.0, t_max=1e10,
              radius=None):
        """Returns (idx (R,k) int32 -1=miss, dist (R,k), t (R,k)) sorted by
        perpendicular distance, restricted to dist <= radius (defaults to
        the grid cell size) and t in [t_min, t_max]."""
        o = np.ascontiguousarray(origins, np.float32).reshape(-1, 3)
        d = np.ascontiguousarray(dirs, np.float32).reshape(-1, 3)
        r = len(o)
        idx = np.empty((r, k), np.int32)
        dist = np.empty((r, k), np.float32)
        ts = np.empty((r, k), np.float32)
        self.lib.pr_query(
            ctypes.c_void_p(self.handle),
            o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            r, k, ctypes.c_float(t_min), ctypes.c_float(t_max),
            ctypes.c_float(radius if radius is not None else 1e30),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return idx, dist, ts

    def __del__(self):
        try:
            if getattr(self, "handle", None):
                self.lib.pr_free(ctypes.c_void_p(self.handle))
                self.handle = None
        except Exception:
            pass


def sample_elimination(points: np.ndarray, n: int, r_max: float,
                       alpha: float = 8.0) -> np.ndarray:
    """Weighted sample elimination (Yuksel 2015) — reduce an M-point
    candidate set to an n-point Poisson-disk set. Returns survivor indices
    (n,) int32. Native (native/sample_elim.cpp) with a numpy/heapq fallback.

    This is the algorithm behind Open3D's ``sample_points_poisson_disk``,
    which the reference uses for mesh sampling (structures.py:3828-3853).
    """
    pts = np.ascontiguousarray(points, np.float32)
    m = len(pts)
    if n >= m:
        return np.arange(m, dtype=np.int32)
    with _LOCK:
        if "se" not in _CACHE:
            try:
                lib = ctypes.CDLL(_build_lib("gpcr_se", ["sample_elim.cpp"]))
                lib.se_eliminate.restype = None
                lib.se_eliminate.argtypes = [
                    ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                    ctypes.c_long, ctypes.c_float, ctypes.c_float,
                    ctypes.POINTER(ctypes.c_int),
                ]
                _CACHE["se"] = lib
            except Exception:
                _CACHE["se"] = None
        lib = _CACHE["se"]
    if lib is not None:
        out = np.empty(n, np.int32)
        lib.se_eliminate(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            m, n, ctypes.c_float(r_max), ctypes.c_float(alpha),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return out
    return _sample_elimination_numpy(pts, n, r_max, alpha)


def _sample_elimination_numpy(pts: np.ndarray, n: int, r_max: float,
                              alpha: float) -> np.ndarray:
    """Pure-python fallback: same algorithm, grid + heapq with lazy deletion."""
    import heapq

    m = len(pts)
    r_e = 2.0 * r_max
    lo = pts.min(0)
    cell = np.maximum(r_e, 1e-12)
    key = np.floor((pts - lo) / cell).astype(np.int64)
    grid: dict = {}
    for i, k in enumerate(map(tuple, key)):
        grid.setdefault(k, []).append(i)

    nbrs: T.List[T.List[int]] = [[] for _ in range(m)]
    w = np.zeros(m)
    for i in range(m):
        kx, ky, kz = key[i]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    for j in grid.get((kx + dx, ky + dy, kz + dz), ()):
                        if j <= i:
                            continue
                        d = float(np.linalg.norm(pts[i] - pts[j]))
                        if d < r_e:
                            nbrs[i].append(j)
                            nbrs[j].append(i)
                            wij = (1.0 - d / r_e) ** alpha
                            w[i] += wij
                            w[j] += wij

    heap = [(-w[i], i) for i in range(m)]
    heapq.heapify(heap)
    alive = np.ones(m, bool)
    remaining = m
    while remaining > n:
        nw, i = heapq.heappop(heap)
        if not alive[i] or -nw != w[i]:
            if alive[i]:
                heapq.heappush(heap, (-w[i], i))
            continue
        alive[i] = False
        remaining -= 1
        for j in nbrs[i]:
            if alive[j]:
                d = float(np.linalg.norm(pts[i] - pts[j]))
                w[j] -= (1.0 - d / r_e) ** alpha
                heapq.heappush(heap, (-w[j], j))
    return np.nonzero(alive)[0][:n].astype(np.int32)
