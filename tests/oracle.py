"""Sequential numpy oracle for the Gaussian rasterizer.

Implements the reference CUDA forward semantics (forward.cu /
rasterizer_impl.cu) as slow, obviously-correct numpy loops: per-Gaussian
preprocessing, per-(tile, depth) sorted duplication, and strictly sequential
front-to-back per-pixel compositing with the exact clamp/skip/termination
rules. Used to validate the vectorized TPU implementation on tiny scenes.
"""

import numpy as np

TILE = 16


def quat_rotmat(q):
    r, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
            [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
            [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float32,
    )


def cov3d(scale, mod, q):
    R = quat_rotmat(q)
    S = np.diag(scale * mod).astype(np.float32)
    M = R @ S  # == (S @ R_glm)^T convention; Sigma identical
    return (M @ M.T).astype(np.float32)


def cov2d(mean, fx, fy, tanx, tany, Vrk, viewmat_t):
    t = np.concatenate([mean, [1.0]]).astype(np.float32) @ viewmat_t[:, :3]
    limx, limy = 1.3 * tanx, 1.3 * tany
    txtz, tytz = t[0] / t[2], t[1] / t[2]
    tx = min(limx, max(-limx, txtz)) * t[2]
    ty = min(limy, max(-limy, tytz)) * t[2]
    tz = t[2]
    J = np.array(
        [
            [fx / tz, 0, -(fx * tx) / (tz * tz)],
            [0, fy / tz, -(fy * ty) / (tz * tz)],
        ],
        dtype=np.float32,
    )
    W = viewmat_t[:3, :3].T
    M = J @ W
    cov = M @ Vrk @ M.T
    return np.array([cov[0, 0] + 0.3, cov[0, 1], cov[1, 1] + 0.3], np.float32)


def ndc2pix(v, S):
    return ((v + 1.0) * S - 1.0) * 0.5


def rasterize_oracle(
    means3d,
    scales,
    rots,
    opacities,
    features,
    viewmat_t,
    projmat_t,
    W,
    H,
    tanx,
    tany,
    bg,
    scale_mod=1.0,
):
    """Returns (out (C, H, W), radii (N,), final_T (H, W))."""
    n = means3d.shape[0]
    C = features.shape[1]
    fx = W / (2.0 * tanx)
    fy = H / (2.0 * tany)
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE

    entries = []  # (tile, depth, gidx)
    g = {}
    radii = np.zeros(n, np.int32)
    for i in range(n):
        p = means3d[i]
        ph = np.concatenate([p, [1.0]]).astype(np.float32)
        pview = ph @ viewmat_t[:, :3]
        if pview[2] <= 0.2:
            continue
        hom = ph @ projmat_t
        pw = 1.0 / (hom[3] + 1e-7)
        proj = hom[:3] * pw
        V = cov3d(scales[i], scale_mod, rots[i])
        c2 = cov2d(p, fx, fy, tanx, tany, V, viewmat_t)
        det = c2[0] * c2[2] - c2[1] * c2[1]
        if det == 0.0:
            continue
        conic = np.array([c2[2], -c2[1], c2[0]], np.float32) / det
        mid = 0.5 * (c2[0] + c2[2])
        l1 = mid + np.sqrt(max(0.1, mid * mid - det))
        l2 = mid - np.sqrt(max(0.1, mid * mid - det))
        radius = np.ceil(3.0 * np.sqrt(max(l1, l2)))
        px, py = ndc2pix(proj[0], W), ndc2pix(proj[1], H)
        rminx = min(grid_x, max(0, int((px - radius) / TILE)))
        rminy = min(grid_y, max(0, int((py - radius) / TILE)))
        rmaxx = min(grid_x, max(0, int((px + radius + TILE - 1) / TILE)))
        rmaxy = min(grid_y, max(0, int((py + radius + TILE - 1) / TILE)))
        if (rmaxx - rminx) * (rmaxy - rminy) == 0:
            continue
        radii[i] = radius
        g[i] = (np.float32(px), np.float32(py), conic.astype(np.float32),
                np.float32(opacities[i]))
        for tyy in range(rminy, rmaxy):
            for txx in range(rminx, rmaxx):
                entries.append((tyy * grid_x + txx, pview[2], i))

    entries.sort(key=lambda e: (e[0], e[1]))

    out = np.zeros((C, H, W), np.float32)
    final_T = np.ones((H, W), np.float32)
    from collections import defaultdict

    per_tile = defaultdict(list)
    for t, d, i in entries:
        per_tile[t].append(i)

    for t, ids in per_tile.items():
        tyy, txx = t // grid_x, t % grid_x
        for yy in range(tyy * TILE, min((tyy + 1) * TILE, H)):
            for xx in range(txx * TILE, min((txx + 1) * TILE, W)):
                T = np.float32(1.0)
                Cacc = np.zeros(C, np.float32)
                for i in ids:
                    px, py, conic, op = g[i]
                    dx = px - np.float32(xx)
                    dy = py - np.float32(yy)
                    power = (
                        -0.5 * (conic[0] * dx * dx + conic[2] * dy * dy)
                        - conic[1] * dx * dy
                    )
                    if power > 0.0:
                        continue
                    alpha = min(np.float32(0.99), op * np.exp(power))
                    if alpha < 1.0 / 255.0:
                        continue
                    test_T = T * (1 - alpha)
                    if test_T < 1e-4:
                        break
                    Cacc += features[i] * alpha * T
                    T = test_T
                out[:, yy, xx] = Cacc + T * bg
                final_T[yy, xx] = T
    # background for untouched tiles
    for yy in range(H):
        for xx in range(W):
            t = (yy // TILE) * grid_x + (xx // TILE)
            if t not in per_tile:
                out[:, yy, xx] = bg
    return out, radii, final_T


def rasterize_oracle_fast(
    means3d, scales, rots, opacities, features,
    viewmat_t, projmat_t, W, H, tanx, tany, bg, scale_mod=1.0,
):
    """Pixel-vectorized oracle: identical math and ENTRY ORDER as
    rasterize_oracle (entries stay strictly sequential; the per-pixel break
    becomes a crossing mask), but all 256 pixels of a tile advance together
    as numpy vectors — fast enough for full-resolution golden frames.
    Bit-identical to the scalar oracle (same f32 ops in the same order per
    pixel; validated by test_oracle_fast_matches_scalar)."""
    n = means3d.shape[0]
    C = features.shape[1]
    fx = W / (2.0 * tanx)
    fy = H / (2.0 * tany)
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE

    entries = []
    g = {}
    radii = np.zeros(n, np.int32)
    for i in range(n):
        p = means3d[i]
        ph = np.concatenate([p, [1.0]]).astype(np.float32)
        pview = ph @ viewmat_t[:, :3]
        if pview[2] <= 0.2:
            continue
        hom = ph @ projmat_t
        pw = 1.0 / (hom[3] + 1e-7)
        proj = hom[:3] * pw
        V = cov3d(scales[i], scale_mod, rots[i])
        c2 = cov2d(p, fx, fy, tanx, tany, V, viewmat_t)
        det = c2[0] * c2[2] - c2[1] * c2[1]
        if det == 0.0:
            continue
        conic = np.array([c2[2], -c2[1], c2[0]], np.float32) / det
        mid = 0.5 * (c2[0] + c2[2])
        l1 = mid + np.sqrt(max(0.1, mid * mid - det))
        radius = np.ceil(3.0 * np.sqrt(l1))
        px, py = ndc2pix(proj[0], W), ndc2pix(proj[1], H)
        rminx = min(grid_x, max(0, int((px - radius) / TILE)))
        rminy = min(grid_y, max(0, int((py - radius) / TILE)))
        rmaxx = min(grid_x, max(0, int((px + radius + TILE - 1) / TILE)))
        rmaxy = min(grid_y, max(0, int((py + radius + TILE - 1) / TILE)))
        if (rmaxx - rminx) * (rmaxy - rminy) == 0:
            continue
        radii[i] = radius
        g[i] = (np.float32(px), np.float32(py), conic.astype(np.float32),
                np.float32(opacities[i]))
        for tyy in range(rminy, rmaxy):
            for txx in range(rminx, rmaxx):
                entries.append((tyy * grid_x + txx, pview[2], i))

    entries.sort(key=lambda e: (e[0], e[1]))
    from collections import defaultdict

    per_tile = defaultdict(list)
    for t, d, i in entries:
        per_tile[t].append(i)

    out = np.zeros((C, H, W), np.float32)
    out[:] = bg[:, None, None]
    final_T = np.ones((H, W), np.float32)

    for t, ids in per_tile.items():
        tyy, txx = t // grid_x, t % grid_x
        y0, y1 = tyy * TILE, min((tyy + 1) * TILE, H)
        x0, x1 = txx * TILE, min((txx + 1) * TILE, W)
        yy, xx = np.meshgrid(
            np.arange(y0, y1, dtype=np.float32),
            np.arange(x0, x1, dtype=np.float32), indexing="ij",
        )
        P = yy.size
        T = np.ones(P, np.float32)
        dead = np.zeros(P, bool)
        Cacc = np.zeros((C, P), np.float32)
        xf = xx.reshape(-1)
        yf = yy.reshape(-1)
        idarr = np.array(ids, np.int64)
        pxs = np.array([g[i][0] for i in ids], np.float32)
        pys = np.array([g[i][1] for i in ids], np.float32)
        cons = np.stack([g[i][2] for i in ids])  # (E, 3)
        opsv = np.array([g[i][3] for i in ids], np.float32)
        fts = features[idarr].astype(np.float32)  # (E, C)
        for e in range(len(ids)):
            dx = pxs[e] - xf
            dy = pys[e] - yf
            power = (
                -0.5 * (cons[e, 0] * dx * dx + cons[e, 2] * dy * dy)
                - cons[e, 1] * dx * dy
            )
            alpha = np.minimum(np.float32(0.99), opsv[e] * np.exp(power))
            skip = (power > 0.0) | (alpha < 1.0 / 255.0) | dead
            test_T = T * (1 - alpha)
            crossed = (test_T < 1e-4) & ~skip
            apply = ~skip & ~crossed
            Cacc += fts[e][:, None] * (alpha * T * apply)[None, :]
            T = np.where(apply, test_T, T)
            dead |= crossed
            if dead.all():
                break
        sh = (y1 - y0, x1 - x0)
        out[:, y0:y1, x0:x1] = (
            Cacc + T[None, :] * bg[:, None]
        ).reshape(C, *sh)
        final_T[y0:y1, x0:x1] = T.reshape(sh)
    return out, radii, final_T
