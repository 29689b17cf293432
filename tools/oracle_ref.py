"""Independent reference oracle: a literal float32 NumPy transcription of the
Vulkan reference's GLSL shader stages, used as a third-party ground truth for
the parity/RMSE claim.

Transcribed statement-for-statement from (study sources, cited per function):
  - /root/reference/shaders/common.glsl:13-37   (pcg, pcg2d, rand)
  - /root/reference/shaders/raygen.rgen:14-91   (camera, sampling, path loop)
  - /root/reference/shaders/closesthit.rchit:24-65 (hit shading)
  - /root/reference/shaders/miss.rmiss:8-12     (sky, done flag)
  - /root/reference/main.cpp:28-58              (OBJ ingest semantics)

INDEPENDENCE CONTRACT: this file imports nothing from sfvp_tpu and shares no
code with it — its own OBJ/MTL parser, its own PCG, its own intersector, its
own sampling — so a bug common to the framework's jnp oracle and Pallas
kernels cannot hide here. Computation is vectorized over pixels for speed,
but every operation is float32/uint32 elementwise, exactly the per-pixel
scalar program the GLSL defines.

The only semantic stand-in is the intersector: ``traceRayEXT`` hardware
traversal is modeled as closest-hit Moller-Trumbore over all triangles with
the same window (t in (0.001, 10000), no culling — ref main.cpp:525
TriangleFacingCullDisable, opaque flags raygen.rgen:65).
"""

from __future__ import annotations

import numpy as np

F = np.float32
U = np.uint32


# ---------------------------------------------------------------------------
# common.glsl
# ---------------------------------------------------------------------------


def pcg(state):
    """uint pcg(inout uint state) — common.glsl:13-19. Returns (val, state')."""
    with np.errstate(over="ignore"):
        prev = (state * U(747796405) + U(2891336453)).astype(U)
        word = (((prev >> ((prev >> U(28)) + U(4))) ^ prev) * U(277803737)).astype(U)
        return ((word >> U(22)) ^ word).astype(U), prev


def pcg2d(vx, vy):
    """uvec2 pcg2d(uvec2 v) — common.glsl:21-31 (sequenced: v.y uses new v.x)."""
    with np.errstate(over="ignore"):
        vx = (vx * U(1664525) + U(1013904223)).astype(U)
        vy = (vy * U(1664525) + U(1013904223)).astype(U)
        vx = (vx + vy * U(1664525)).astype(U)
        vy = (vy + vx * U(1664525)).astype(U)
        vx = vx ^ (vx >> U(16))
        vy = vy ^ (vy >> U(16))
        vx = (vx + vy * U(1664525)).astype(U)
        vy = (vy + vx * U(1664525)).astype(U)
        vx = vx ^ (vx >> U(16))
        vy = vy ^ (vy >> U(16))
        return vx, vy


# float(0xffffffffu) rounds to 2^32 in fp32 — common.glsl:33-37 quirk
_SCALE = F(1.0) / F(np.float32(U(0xFFFFFFFF)))


def rand(seed):
    """float rand(inout uint seed) — common.glsl:33-37. Returns (f32, seed')."""
    val, seed = pcg(seed)
    return (val.astype(F) * _SCALE).astype(F), seed


# ---------------------------------------------------------------------------
# OBJ/MTL ingest — main.cpp:28-58 semantics (tinyobjloader fan triangulation,
# Y negation, non-indexed expansion, one material per triangle)
# ---------------------------------------------------------------------------


def load_scene(obj_path):
    """Returns (tris (T,3,3) f32, diffuse (T,3) f32, emission (T,3) f32)."""
    import os

    verts = []
    mtl = {}
    cur = None
    tri_v = []
    tri_m = []

    def parse_mtl(path):
        name = None
        with open(path) as f:
            for line in f:
                tok = line.split()
                if not tok:
                    continue
                if tok[0] == "newmtl":
                    name = tok[1]
                    mtl[name] = {"Kd": (0.0, 0.0, 0.0), "Ke": (0.0, 0.0, 0.0)}
                elif tok[0] in ("Kd", "Ke") and name is not None:
                    mtl[name][tok[0]] = tuple(float(x) for x in tok[1:4])

    with open(obj_path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "mtllib":
                parse_mtl(os.path.join(os.path.dirname(obj_path), tok[1]))
            elif tok[0] == "v":
                x, y, z = (float(t) for t in tok[1:4])
                verts.append((x, -y, z))  # Y negated at load, main.cpp:42
            elif tok[0] == "usemtl":
                cur = tok[1]
            elif tok[0] == "f":
                idx = [int(t.split("/")[0]) - 1 for t in tok[1:]]
                for k in range(1, len(idx) - 1):  # fan triangulation
                    tri_v.append((idx[0], idx[k], idx[k + 1]))
                    tri_m.append(cur)

    v = np.asarray(verts, F)
    tris = v[np.asarray(tri_v, np.int64)]  # (T, 3, 3)
    kd = np.asarray([mtl[m]["Kd"] for m in tri_m], F)
    ke = np.asarray([mtl[m]["Ke"] for m in tri_m], F)
    return tris, kd, ke


# ---------------------------------------------------------------------------
# traceRayEXT stand-in: closest-hit Moller-Trumbore over all triangles
# ---------------------------------------------------------------------------


def closest_hit(ox, oy, oz, dx, dy, dz, tris, t_min=F(0.001), t_max=F(10000.0)):
    """Returns (prim i32 (-1 miss), t, u, v) per ray, all f32/i32 arrays."""
    n = ox.shape[0]
    best_t = np.full(n, np.inf, F)
    best_p = np.full(n, -1, np.int32)
    best_u = np.zeros(n, F)
    best_v = np.zeros(n, F)
    with np.errstate(all="ignore"):
        for p in range(tris.shape[0]):
            a, b, c = tris[p, 0], tris[p, 1], tris[p, 2]
            e1 = b - a
            e2 = c - a
            px = dy * e2[2] - dz * e2[1]
            py = dz * e2[0] - dx * e2[2]
            pz = dx * e2[1] - dy * e2[0]
            det = e1[0] * px + e1[1] * py + e1[2] * pz
            inv = F(1.0) / det
            tx, ty, tz = ox - a[0], oy - a[1], oz - a[2]
            u = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1[2] - tz * e1[1]
            qy = tz * e1[0] - tx * e1[2]
            qz = tx * e1[1] - ty * e1[0]
            v = (dx * qx + dy * qy + dz * qz) * inv
            t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv
            ok = (
                (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > t_min) & (t < t_max) & (t < best_t)
            )
            best_t = np.where(ok, t, best_t)
            best_p = np.where(ok, p, best_p)
            best_u = np.where(ok, u, best_u)
            best_v = np.where(ok, v, best_v)
    return best_p, best_t.astype(F), best_u.astype(F), best_v.astype(F)


# ---------------------------------------------------------------------------
# raygen.rgen sampling helpers (lines 14-39)
# ---------------------------------------------------------------------------


def sample_direction(r1, r2, nx, ny, nz):
    """sampleDirection(rand1, rand2, normal) — raygen.rgen:33-39, with
    createCoordinateSystem (:14-21) and sampleHemisphere (:23-31)."""
    with np.errstate(all="ignore"):
        cond = np.abs(nx) > np.abs(ny)
        inv_a = F(1.0) / np.sqrt((nx * nx + nz * nz).astype(F))
        inv_b = F(1.0) / np.sqrt((ny * ny + nz * nz).astype(F))
        tx = np.where(cond, nz * inv_a, F(0.0)).astype(F)
        ty = np.where(cond, F(0.0), -nz * inv_b).astype(F)
        tz = np.where(cond, -nx * inv_a, ny * inv_b).astype(F)
    # B = cross(N, T)
    bx = (ny * tz - nz * ty).astype(F)
    by = (nz * tx - nx * tz).astype(F)
    bz = (nx * ty - ny * tx).astype(F)
    two_pi = F(2.0) * F(np.pi)
    s = np.sqrt((F(1.0) - r1 * r1).astype(F))
    hx = (np.cos((two_pi * r2).astype(F)).astype(F) * s).astype(F)
    hy = (np.sin((two_pi * r2).astype(F)).astype(F) * s).astype(F)
    hz = r1
    return (
        (hx * tx + hy * bx + hz * nx).astype(F),
        (hx * ty + hy * by + hz * ny).astype(F),
        (hx * tz + hy * bz + hz * nz).astype(F),
    )


# ---------------------------------------------------------------------------
# raygen main() — the full progressive render (raygen.rgen:41-91)
# ---------------------------------------------------------------------------


def render(obj_path, width, height, frames, spp=32, max_depth=8, sky=(0.7, 0.6, 0.5)):
    """Progressive render, returns (H, W, 3) float32 accumulated image —
    bit-level model of raygen.rgen:41-91 + the main.cpp frame loop, except
    accumulation stays f32 (the reference round-trips rgba8 each frame;
    the framework documents the same intentional deviation)."""
    tris, kd, ke = load_scene(obj_path)
    brdf_tab = (kd / F(np.pi)).astype(F)  # rchit:61
    # geometric normal = -normalize(cross(e01, e02)) — rchit:43-48
    e01 = tris[:, 1] - tris[:, 0]
    e02 = tris[:, 2] - tris[:, 0]
    nrm = -np.cross(e01, e02).astype(F)
    nrm = (nrm / np.linalg.norm(nrm, axis=1, keepdims=True).astype(F)).astype(F)

    n = width * height
    pix_x = (np.arange(n, dtype=U) % U(width)).astype(U)
    pix_y = (np.arange(n, dtype=U) // U(width)).astype(U)
    accum = np.zeros((n, 3), F)
    sky = np.asarray(sky, F)
    two_pi = F(2.0) * F(np.pi)

    for frame in range(frames):
        color = np.zeros((n, 3), F)
        for s_num in range(spp):
            # seed = pcg2d(pixel * (sample + spp*frame + 1)); s.x + s.y (:47-48)
            with np.errstate(over="ignore"):
                m = U(s_num + spp * frame + 1)
                sx, sy = pcg2d(pix_x * m, pix_y * m)
                seed = (sx + sy).astype(U)

            r1, seed = rand(seed)
            r2, seed = rand(seed)
            # screenPos/inUV/d — raygen.rgen:51-53
            sx_f = (pix_x.astype(F) + r1) / F(width)
            sy_f = (pix_y.astype(F) + r2) / F(height)
            d_x = (sx_f * F(2.0) - F(1.0)).astype(F)
            d_y = (sy_f * F(2.0) - F(1.0)).astype(F)
            # origin (0,-1,5); target (d.x, d.y-1, 2) — raygen.rgen:55-57
            ox = np.zeros(n, F)
            oy = np.full(n, F(-1.0))
            oz = np.full(n, F(5.0))
            tx = d_x
            ty = (d_y - F(1.0)).astype(F)
            tz = np.full(n, F(2.0))
            dx, dy, dz = tx - ox, ty - oy, tz - oz
            inv_len = (F(1.0) / np.sqrt(dx * dx + dy * dy + dz * dz)).astype(F)
            dx, dy, dz = (dx * inv_len).astype(F), (dy * inv_len).astype(F), (dz * inv_len).astype(F)

            weight = np.ones((n, 3), F)
            done = np.zeros(n, bool)

            for _depth in range(max_depth):
                live = ~done
                prim, t, u, v = closest_hit(ox, oy, oz, dx, dy, dz, tris)
                miss = prim < 0
                pidx = np.maximum(prim, 0)
                # closesthit.rchit:50-65 (hit) / miss.rmiss:8-12 (miss)
                w0 = (F(1.0) - u - v).astype(F)
                hpos = (
                    tris[pidx, 0] * w0[:, None]
                    + tris[pidx, 1] * u[:, None]
                    + tris[pidx, 2] * v[:, None]
                ).astype(F)
                hnrm = nrm[pidx]
                emission = np.where(miss[:, None], sky[None, :], ke[pidx]).astype(F)
                brdf = brdf_tab[pidx]
                # color += weight * emission (:76) — only for live lanes
                color += np.where(live[:, None], weight * emission, F(0.0)).astype(F)
                # origin = position; direction = sampleDirection (:77-78)
                nx, ny, nz_ = hnrm[:, 0], hnrm[:, 1], hnrm[:, 2]
                ra, seed = rand(seed)
                rb, seed = rand(seed)
                sdx, sdy, sdz = sample_direction(ra, rb, nx, ny, nz_)
                cont = live & ~miss
                ox = np.where(cont, hpos[:, 0], ox)
                oy = np.where(cont, hpos[:, 1], oy)
                oz = np.where(cont, hpos[:, 2], oz)
                dx = np.where(cont, sdx, dx).astype(F)
                dy = np.where(cont, sdy, dy).astype(F)
                dz = np.where(cont, sdz, dz).astype(F)
                # weight *= brdf * dot(dir, normal) / (1/2pi) (:79-80)
                cos_t = (sdx * nx + sdy * ny + sdz * nz_).astype(F)
                scale = (brdf * (cos_t * two_pi).astype(F)[:, None]).astype(F)
                weight = np.where(cont[:, None], weight * scale, weight).astype(F)
                done = done | (live & miss)
                if done.all():
                    break
        color = (color / F(spp)).astype(F)
        # new = (color + old*frame)/(frame+1) — raygen.rgen:88-90
        accum = ((color + accum * F(frame)) / F(frame + 1)).astype(F)

    return accum.reshape(height, width, 3)


if __name__ == "__main__":
    import argparse
    import sys

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--obj", required=True)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--out", required=True, help=".npz output path")
    args = ap.parse_args()
    img = render(args.obj, args.size, args.size, args.frames, spp=args.spp)
    np.savez_compressed(args.out, image=img, frames=args.frames, spp=args.spp)
    print(f"wrote {args.out}: {img.shape} mean={img.mean():.6f}", file=sys.stderr)
