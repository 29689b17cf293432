"""Sample-regeneration megakernel — the occupancy-optimized variant of
kernels/megakernel.py.

The plain megakernel runs spp sequential waves of max_depth masked bounces,
so lanes whose path died early (average path length ~3.4 of 8 on Cornell)
idle for the rest of the wave. Here each lane owns ONE pixel and runs all
its samples back-to-back inside a single dynamic while-loop: the moment a
sample terminates (miss or depth cap), the lane immediately seeds and
launches the pixel's next sample. Lane utilization is then bounded by the
slowest lane's total segment count (~ spp * E[len] + straggler tail)
instead of spp * max_depth.

Per-sample semantics (seeding, rand stream, bounce math) are identical to
the reference and to the chunked megakernel; only the f32 summation order
of per-sample contributions differs (direct accumulation instead of
per-sample subtotals), so images match to ~1e-6 rather than bitwise.

Extensions that run in-kernel (all config-gated off in parity mode): NEE
with a <=16384-light table (unrolled select below LIGHT_UNROLL_MAX, one
one-hot MXU matmul per block row above, the two-level bucketed select
past LIGHT_FLAT_MAX; or importance-sampled env NEE on
env-only scenes, kernels/imgfetch.py CDF inversion), balance-heuristic
MIS (pdf carry, same math as the wavefront integrator), Russian roulette,
thin-lens DOF
(two extra draws in the regen block, camera.apply_thin_lens_soa
semantics), GGX glossy (VNDF sample + Smith height-correlated eval) and
smooth dielectric (Snell + exact Fresnel) — the same material set as the
BVH regen megakernel (megakernel_bvh.py), sourced from the brute scene
table's Ks/mtype/rough rows instead of the wide-BVH lane encoding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..sampling import (
    dielectric_reflect_refract_soa,
    ggx_d,
    ggx_lambda,
    ggx_sample_vndf_local,
    ggx_vndf_pdf,
)
from ..utils import vec
from .megakernel import (
    INV_PI, TWO_PI, _pcg2d_vec, _rand_vec, _U, scene_table,
)


def make_regen_render_step(
    cfg: RenderConfig,
    scene_buffers,
    global_shape: Optional[tuple] = None,
    block_rows: int = 32,
    interpret: Optional[bool] = None,
):
    """render_step(state, row0) -> state; whole spp traced per kernel call
    with in-lane sample regeneration."""
    gh, gw = global_shape if global_shape is not None else (cfg.height, cfg.width)
    spp = cfg.spp_per_step
    max_depth = cfg.max_depth
    t_min = np.float32(cfg.t_min)
    t_max = np.float32(cfg.t_max)
    sky = tuple(np.float32(s) for s in cfg.sky_emission)
    cam = cfg.camera
    uniform = cfg.sampling == "uniform"
    use_rr = cfg.use_rr
    rr_start = cfg.rr_start_depth

    import numpy as _np

    table = scene_table(scene_buffers)
    num_tris = scene_buffers.num_tris
    mtypes = _np.asarray(scene_buffers.mtype)[:num_tris]
    # any non-diffuse material widens the per-tri slot to include Ks+mtype
    # (and roughness when GGX/dielectric faces exist)
    has_mirrors = bool(_np.any(mtypes > 0))
    has_glossy = bool(_np.any(mtypes == 2))
    has_diel = bool(_np.any(mtypes == 3))
    n_mat = 11 if (has_glossy or has_diel) else (10 if has_mirrors else 6)

    # ---- in-kernel NEE light table: (16, L) rows = v0(3) v1(3) v2(3)
    # normal(3) Le(3) cdf(1); area pdf folded into a static total_area ----
    use_nee = cfg.use_nee
    num_lights = 0
    total_area = 1.0
    light_table = None
    light_cdfb = None
    mxu_lights = False
    bucketed_lights = False
    if use_nee:
        from ..integrate.lights import build_light_table_from_buffers

        lt = build_light_table_from_buffers(scene_buffers)
        if lt is None:
            use_nee = False
        else:
            from .imgfetch import (
                LIGHT_FLAT_MAX, LIGHT_UNROLL_MAX, MAX_KERNEL_LIGHTS,
                pack_light_table_bucketed, pack_light_table_mxu,
            )

            num_lights = lt.num
            if num_lights > MAX_KERNEL_LIGHTS:
                # the packed table stops being a sane VMEM-resident
                # object — dispatch routes to the wavefront searchsorted
                raise ValueError(
                    f"in-kernel NEE supports <= {MAX_KERNEL_LIGHTS} "
                    "lights; use the wavefront integrator for more"
                )
            total_area = lt.total_area
            # small tables unroll 15 scalar selects per light; mid-size
            # ones select all 15 fields with ONE one-hot MXU matmul per
            # block row (imgfetch.light_select_rows); past LIGHT_FLAT_MAX
            # the two-level bucketed select keeps the operands O(L/128)
            # planes (light_select_rows_bucketed). All three are bitwise
            # identical picks.
            mxu_lights = num_lights > LIGHT_UNROLL_MAX
            bucketed_lights = num_lights > LIGHT_FLAT_MAX
            if bucketed_lights:
                tab_np, cdfb_np = pack_light_table_bucketed(lt)
                light_table = jnp.asarray(tab_np)
                light_cdfb = jnp.asarray(cdfb_np)
            elif mxu_lights:
                tab_np, cdfb_np, _ = pack_light_table_mxu(lt)
                light_table = jnp.asarray(tab_np)
                light_cdfb = jnp.asarray(cdfb_np)
            else:
                rows = []
                for t3 in (lt.v0, lt.v1, lt.v2, lt.n, lt.le):
                    rows.extend(np.asarray(c) for c in t3)
                rows.append(np.asarray(lt.cdf))
                light_table = jnp.asarray(np.stack(rows, axis=0))
    # ---- in-kernel environment sky (extension over the constant sky,
    # ref miss.rmiss:10): equirect image packed (3W, H) in VMEM, fetched
    # per miss lane via the separable one-hot MXU gather
    # (kernels/imgfetch.py).
    env = getattr(scene_buffers, "env", None)
    use_env = env is not None
    env_table = None
    env_h = env_w = 0
    defer_env = False
    if use_env:
        from .imgfetch import ENV_VMEM_MAX_BYTES, pack_env_transposed

        et_np, env_h, env_w = pack_env_transposed(env)
        if et_np.nbytes > ENV_VMEM_MAX_BYTES:
            # Oversized map: DEFER miss shading (same mechanism as
            # megakernel_bvh defer_env — a miss terminates its sample, so
            # the kernel records one (dir, weight) per (pixel, sample)
            # and the step shades them with ONE post-kernel XLA
            # sample_environment gather). Under NEE the same linearity
            # defers the env-NEE radiance too: per-BOUNCE records
            # (defer_env_nee below, megakernel_bvh layout).
            defer_env = True
        else:
            env_table = jnp.asarray(et_np)
    env_in_kernel = use_env and not defer_env

    # ---- in-kernel env NEE (importance-sampled environment; wavefront
    # integrate/wavefront.py:168-183 semantics): engages when NEE is
    # requested and the scene has an env map. When area lights exist too
    # BOTH strategies run per bounce (one light sample + one env sample;
    # disjoint sources, each with its own 2-way MIS pairing). The flat
    # texel-CDF inversion runs as the separable exact-searchsorted of
    # kernels/imgfetch.py (row-end compare + one-hot MXU row select).
    use_env_nee = cfg.use_nee and use_env
    defer_env_nee = use_env_nee and defer_env
    env_nee_cdfpdf = env_nee_rowend = None
    dist_h = dist_w = 0
    if use_env_nee:
        # shared proposal rule: exact texel CDF for resident maps, the
        # pooled coarse proposal for oversized ones (its contribution is
        # linear in the radiance, which defers — megakernel_bvh)
        from ..integrate.lights import env_distribution_for
        from .imgfetch import pack_env_dist_transposed

        env_dist = env_distribution_for(env)
        dist_h, dist_w = env_dist.height, env_dist.width
        cp_np, re_np = pack_env_dist_transposed(env_dist)
        env_nee_cdfpdf = jnp.asarray(cp_np)
        env_nee_rowend = jnp.asarray(re_np)
    # AFTER the empty-table fallback: a lightless scene must not compile
    # dead MIS pdf math into the kernel
    use_mis = cfg.use_mis and (use_nee or use_env_nee)

    # ---- in-kernel map_Kd textures (extension; same atlas machinery as
    # megakernel_bvh.py): scene_table rows 20-26 carry per-corner vt +
    # texid+1, the winning hit's interpolated (u, v, texid) are selected
    # in the unrolled intersection loop, and one separable one-hot atlas
    # fetch per bounce modulates Kd (integrate/wavefront.py:105-114
    # semantics).
    use_tex = bool(getattr(scene_buffers, "has_textures", False))
    atlas_table = None
    tex_offs = tex_ws = tex_hs = None
    atlas_htot = atlas_wmax = 0
    if use_tex:
        from .imgfetch import (
            MAX_KERNEL_TEXTURES, TEX_VMEM_MAX_BYTES, pack_atlas_transposed,
        )

        at_np, tex_offs, tex_ws, tex_hs = pack_atlas_transposed(
            scene_buffers.textures)
        if (at_np.nbytes > TEX_VMEM_MAX_BYTES
                or len(tex_ws) > MAX_KERNEL_TEXTURES):
            raise ValueError(
                f"in-kernel textures support up to {MAX_KERNEL_TEXTURES} "
                f"maps / {TEX_VMEM_MAX_BYTES} atlas bytes (got "
                f"{len(tex_ws)} maps, {at_np.nbytes} bytes); use the "
                "wavefront integrator"
            )
        atlas_table = jnp.asarray(at_np)
        atlas_wmax = max(tex_ws)
        atlas_htot = sum(tex_hs)

    lanes = 128
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    inv2w = np.float32(2.0 / gw)
    inv2h = np.float32(2.0 / gh)
    cx, cy, cz = (np.float32(v) for v in cam.center)
    rx, ry, rz = (np.float32(v) for v in cam.right)
    ux, uy, uz = (np.float32(v) for v in cam.up)
    ox0, oy0, oz0 = (np.float32(v) for v in cam.origin)
    # thin-lens DOF (extension; camera.apply_thin_lens_soa semantics):
    # static lens frame, two extra draws taken only when the lens is open
    use_dof = cam.lens_radius > 0.0
    if use_dof:
        if cam.focus_dist <= 0.0:
            raise ValueError(
                "thin-lens camera needs focus_dist > 0 "
                f"(got {cam.focus_dist})"
            )
        lens_r = np.float32(cam.lens_radius)
        focus_d = np.float32(cam.focus_dist)
        _n = lambda v: tuple(  # noqa: E731
            np.float32(c) for c in np.asarray(v, np.float64)
            / np.linalg.norm(np.asarray(v, np.float64))
        )
        lrn = _n(cam.right)
        lun = _n(cam.up)
        lfwd = _n(np.asarray(cam.center, np.float64)
                  - np.asarray(cam.origin, np.float64))

    def build_kernel(r, local_npix):
        def kernel(scal_ref, tri_ref, *refs):
            if use_nee:
                light_ref = refs[0]
                refs = refs[1:]
                if mxu_lights:
                    lcdf_ref = refs[0]
                    refs = refs[1:]
            if env_in_kernel:
                env_ref = refs[0]
                refs = refs[1:]
            if use_env_nee:
                encdf_ref = refs[0]
                enrow_ref = refs[1]
                refs = refs[2:]
            if use_tex:
                atlas_ref = refs[0]
                refs = refs[1:]
            colr_ref, colg_ref, colb_ref, segs_ref = refs[:4]
            if defer_env:
                # deferred env-miss record planes: (dir xyz, weight rgb)
                # x (spp, r) rows (megakernel_bvh defer_env layout)
                (edx_ref, edy_ref, edz_ref,
                 ewr_ref, ewg_ref, ewb_ref) = refs[4:10]
                ez = jnp.zeros((spp * r, lanes), jnp.float32)
                for _eref in (edx_ref, edy_ref, edz_ref,
                              ewr_ref, ewg_ref, ewb_ref):
                    _eref[...] = ez
                if defer_env_nee:
                    # per-(sample, bounce) env-NEE record planes: slab
                    # s*max_depth+bounce (megakernel_bvh layout)
                    (ndx_ref, ndy_ref, ndz_ref,
                     nwr_ref, nwg_ref, nwb_ref) = refs[10:16]
                    nz = jnp.zeros((spp * max_depth * r, lanes),
                                   jnp.float32)
                    for _nref in (ndx_ref, ndy_ref, ndz_ref,
                                  nwr_ref, nwg_ref, nwb_ref):
                        _nref[...] = nz
            pid = pl.program_id(0)
            frame = scal_ref[0]
            row0 = scal_ref[1]

            # hoisted light scalars: [v0(3) v1(3) v2(3) n(3) Le(3) cdf]
            # (unrolled small-table path only; the MXU path loads the
            # whole (16, Lp) operand at select time)
            lights = []
            if use_nee and not mxu_lights:
                for i in range(num_lights):
                    lights.append(
                        tuple(light_ref[k, i] for k in range(16))
                    )

            tris = []
            for i in range(num_tris):
                p0 = (tri_ref[0, i], tri_ref[1, i], tri_ref[2, i])
                p1 = (tri_ref[3, i], tri_ref[4, i], tri_ref[5, i])
                p2 = (tri_ref[6, i], tri_ref[7, i], tri_ref[8, i])
                e1 = tuple(b - a for a, b in zip(p0, p1))
                e2 = tuple(b - a for a, b in zip(p0, p2))
                mat = tuple(tri_ref[9 + k, i] for k in range(n_mat))
                auxv = (tuple(tri_ref[20 + k, i] for k in range(7))
                        if use_tex else None)
                tris.append((p0, p1, p2, e1, e2, mat, auxv))

            row_ids = jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 0)
            lane_ids = jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 1)
            idx = (pid * r + row_ids) * lanes + lane_ids      # lane = pixel
            p = jnp.minimum(idx, local_npix - 1)
            px = p % gw
            py = p // gw + row0

            zero = jnp.zeros((r, lanes), jnp.float32)
            one = jnp.ones((r, lanes), jnp.float32)
            izero = jnp.zeros((r, lanes), jnp.int32)
            inf = jnp.float32(np.inf)

            # padded lanes start with all samples "done"
            s0 = jnp.where(idx < local_npix, 0, spp).astype(jnp.int32)

            init = (
                s0, izero,                      # sample idx, bounce
                zero, zero, zero,               # o
                zero, zero, one,                # d (unit placeholder)
                one, one, one,                  # weight
                jnp.zeros((r, lanes), _U),      # seed
                zero, zero, zero,               # color total
                zero,                           # segs
                jnp.ones((r, lanes), jnp.int32),  # count_emit (NEE gating)
                zero,                             # pdf_prev (MIS)
            )

            def cond(c):
                return jnp.any(c[0] < spp)

            def body(c):
                (s, bounce, ox, oy, oz, dx, dy, dz, wr, wg, wb, seed,
                 tr, tg, tb, segs, count_emit, pdf_prev) = c
                active = s < spp
                need = active & (bounce == 0)

                # ---- regenerate: seed + camera ray (ref raygen.rgen:45-57)
                m = s.astype(_U) + _U(spp) * frame.astype(_U) + _U(1)
                sx, sy = _pcg2d_vec(px.astype(_U) * m, py.astype(_U) * m)
                sd = sx + sy
                r1n, sd = _rand_vec(sd)
                r2n, sd = _rand_vec(sd)
                ndx = (px.astype(jnp.float32) + r1n) * inv2w - 1.0
                ndy = (py.astype(jnp.float32) + r2n) * inv2h - 1.0
                nd = (
                    cx + ndx * rx + ndy * ux - ox0,
                    cy + ndx * ry + ndy * uy - oy0,
                    cz + ndx * rz + ndy * uz - oz0,
                )
                nd = vec.normalize(nd)
                no = (ox0 + zero, oy0 + zero, oz0 + zero)
                if use_dof:
                    # same math + draw order as apply_thin_lens_soa
                    rl1, sd = _rand_vec(sd)
                    rl2, sd = _rand_vec(sd)
                    rad = lens_r * jnp.sqrt(jnp.maximum(rl1, 0.0))
                    lphi = np.float32(2.0 * np.pi) * rl2
                    lx = rad * jnp.cos(lphi)
                    ly = rad * jnp.sin(lphi)
                    t_focal = focus_d / jnp.maximum(
                        nd[0] * lfwd[0] + nd[1] * lfwd[1] + nd[2] * lfwd[2],
                        np.float32(1e-4),
                    )
                    focal = vec.add(no, vec.scale(nd, t_focal))
                    no = (
                        no[0] + lx * lrn[0] + ly * lun[0],
                        no[1] + lx * lrn[1] + ly * lun[1],
                        no[2] + lx * lrn[2] + ly * lun[2],
                    )
                    nd = vec.normalize(vec.sub(focal, no))
                ox = jnp.where(need, no[0], ox)
                oy = jnp.where(need, no[1], oy)
                oz = jnp.where(need, no[2], oz)
                dx = jnp.where(need, nd[0], dx)
                dy = jnp.where(need, nd[1], dy)
                dz = jnp.where(need, nd[2], dz)
                wr = jnp.where(need, 1.0, wr)
                wg = jnp.where(need, 1.0, wg)
                wb = jnp.where(need, 1.0, wb)
                seed = jnp.where(need, sd, seed)
                count_emit = jnp.where(need, 1, count_emit)
                pdf_prev = jnp.where(need, 0.0, pdf_prev)
                o = (ox, oy, oz)
                d = (dx, dy, dz)

                # ---- trace all triangles ----
                bt = jnp.full((r, lanes), inf)
                bu = zero
                bv = zero
                b0 = (zero, zero, zero)
                b1 = (zero, zero, zero)
                b2 = (zero, zero, zero)
                bmat = (zero,) * n_mat
                if use_tex:
                    btex = (zero, zero, zero)    # tu, tw, texid+1
                for (p0t, p1t, p2t, e1, e2, mat, auxv) in tris:
                    pvx = d[1] * e2[2] - d[2] * e2[1]
                    pvy = d[2] * e2[0] - d[0] * e2[2]
                    pvz = d[0] * e2[1] - d[1] * e2[0]
                    det = e1[0] * pvx + e1[1] * pvy + e1[2] * pvz
                    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                    tvx = o[0] - p0t[0]
                    tvy = o[1] - p0t[1]
                    tvz = o[2] - p0t[2]
                    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    qvx = tvy * e1[2] - tvz * e1[1]
                    qvy = tvz * e1[0] - tvx * e1[2]
                    qvz = tvx * e1[1] - tvy * e1[0]
                    v = (d[0] * qvx + d[1] * qvy + d[2] * qvz) * inv_det
                    t = (e2[0] * qvx + e2[1] * qvy + e2[2] * qvz) * inv_det
                    ok = (
                        (jnp.abs(det) > 1e-12)
                        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                        & (t > t_min) & (t < t_max) & (t < bt)
                    )
                    bt = jnp.where(ok, t, bt)
                    bu = jnp.where(ok, u, bu)
                    bv = jnp.where(ok, v, bv)
                    b0 = vec.where(ok, (p0t[0] + zero, p0t[1] + zero,
                                        p0t[2] + zero), b0)
                    b1 = vec.where(ok, (p1t[0] + zero, p1t[1] + zero,
                                        p1t[2] + zero), b1)
                    b2 = vec.where(ok, (p2t[0] + zero, p2t[1] + zero,
                                        p2t[2] + zero), b2)
                    bmat = tuple(
                        jnp.where(ok, mv + zero, bmv)
                        for mv, bmv in zip(mat, bmat)
                    )
                    if use_tex:
                        # interpolate per-corner vt with this tri's own
                        # barycentrics (wavefront shade_inputs semantics)
                        wb_s = 1.0 - u - v
                        tu = auxv[0] * wb_s + auxv[2] * u + auxv[4] * v
                        tw = auxv[1] * wb_s + auxv[3] * u + auxv[5] * v
                        btex = vec.where(
                            ok, (tu, tw, auxv[6] + zero), btex)

                miss = jnp.isinf(bt)
                bw = 1.0 - bu - bv
                position = (
                    b0[0] * bw + b1[0] * bu + b2[0] * bv,
                    b0[1] * bw + b1[1] * bu + b2[1] * bv,
                    b0[2] * bw + b1[2] * bu + b2[2] * bv,
                )
                e01 = vec.sub(b1, b0)
                e02 = vec.sub(b2, b0)
                nrm = vec.cross(e01, e02)
                inv_len = jax.lax.rsqrt(jnp.maximum(vec.dot(nrm, nrm), 1e-30))
                normal = vec.scale(nrm, -inv_len)
                diffuse = (bmat[0], bmat[1], bmat[2])
                if use_tex:
                    from .imgfetch import atlas_fetch_rows

                    texc = atlas_fetch_rows(
                        atlas_ref[...], btex[0], btex[1], btex[2],
                        tex_offs, tex_ws, tex_hs, atlas_htot, atlas_wmax,
                    )
                    diffuse = vec.mul(diffuse, texc)
                if env_in_kernel:
                    from .imgfetch import env_fetch_rows

                    sky3 = env_fetch_rows(
                        env_ref[...], (dx, dy, dz), env_h, env_w)
                elif defer_env:
                    # miss radiance added OUTSIDE the kernel from the
                    # recorded (dir, weight); in-kernel contribution 0
                    sky3 = (zero, zero, zero)
                else:
                    sky3 = (sky[0] + zero, sky[1] + zero, sky[2] + zero)
                emission = vec.where(
                    miss, sky3, (bmat[3], bmat[4], bmat[5]),
                )

                if has_mirrors:
                    mt = bmat[9]
                    is_mirror = (
                        (mt > 0.5) & (mt < 1.5) & jnp.logical_not(miss)
                    )
                else:
                    is_mirror = jnp.zeros((r, lanes), bool)
                if has_diel:
                    is_diel = (mt > 2.5) & jnp.logical_not(miss)
                    is_spec = is_mirror | is_diel
                else:
                    is_diel = jnp.zeros((r, lanes), bool)
                    is_spec = is_mirror

                if has_glossy:
                    # GGX shading frame (same math as megakernel_bvh.py /
                    # the wavefront integrator: view-oriented normal,
                    # branch-exact tangent basis); used by the NEE eval
                    # and the VNDF bounce below
                    is_glossy = (mt > 1.5) & (mt < 2.5) & jnp.logical_not(miss)
                    rough_g = jnp.where(is_glossy, bmat[10], 0.0)
                    alpha_g = jnp.maximum(rough_g * rough_g, 1e-4)
                    ks3 = (bmat[6], bmat[7], bmat[8])
                    n_g = vec.where(
                        vec.dot(d, normal) > 0,
                        vec.scale(normal, -1.0), normal,
                    )
                    ngx, ngy, ngz = n_g
                    g_use_x = jnp.abs(ngx) > jnp.abs(ngy)
                    g_inv_a = jax.lax.rsqrt(
                        jnp.maximum(ngx * ngx + ngz * ngz, 1e-30))
                    g_inv_b = jax.lax.rsqrt(
                        jnp.maximum(ngy * ngy + ngz * ngz, 1e-30))
                    tng = (
                        jnp.where(g_use_x, ngz * g_inv_a, 0.0),
                        jnp.where(g_use_x, 0.0, -ngz * g_inv_b),
                        jnp.where(g_use_x, -ngx * g_inv_a, ngy * g_inv_b),
                    )
                    btg = vec.cross(n_g, tng)
                    wo = vec.scale(d, -1.0)
                    woz = jnp.maximum(vec.dot(wo, n_g), 1e-6)
                    wo_l = (vec.dot(wo, tng), vec.dot(wo, btg), woz)

                    def ggx_f_k(coh):
                        m1 = 1.0 - coh
                        f5 = m1 * m1
                        f5 = f5 * f5 * m1
                        return tuple(s_ + (1.0 - s_) * f5 for s_ in ks3)

                    lam_o = ggx_lambda(woz, alpha_g)

                # NEE gating (non-MIS): BSDF-path emission only on camera
                # rays, post-specular bounces, and sky misses. Under MIS,
                # everywhere else with the balance-heuristic weight
                # p_bsdf / (p_bsdf + p_nee) — same math as the wavefront
                # integrator and megakernel_bvh.py.
                if use_env_nee and use_nee:
                    # both strategies light-sample every bounce: sky
                    # misses MIS against the env pdf, emissive hits
                    # against the area-light pdf (wavefront combined
                    # branch semantics)
                    if not use_mis:
                        emit_w = (
                            active & (count_emit > 0)
                        ).astype(jnp.float32)
                    else:
                        from .imgfetch import env_pdf_sa_rows

                        p_env_d = env_pdf_sa_rows(
                            encdf_ref[...], (dx, dy, dz), dist_h, dist_w)
                        w_env = pdf_prev / jnp.maximum(
                            pdf_prev + p_env_d, 1e-30)
                        cos_l_hit = jnp.abs(
                            dx * normal[0] + dy * normal[1] + dz * normal[2]
                        )
                        t_safe = jnp.where(miss, 0.0, bt)
                        p_nee_hit = (
                            (t_safe * t_safe) * np.float32(1.0 / total_area)
                            / jnp.maximum(cos_l_hit, np.float32(1e-6))
                        )
                        w_bsdf = pdf_prev / jnp.maximum(
                            pdf_prev + p_nee_hit, 1e-30
                        )
                        is_emissive = (
                            jnp.maximum(
                                jnp.maximum(emission[0], emission[1]),
                                emission[2]) > 0
                        ) & jnp.logical_not(miss)
                        emit_w = jnp.where(
                            count_emit > 0, 1.0,
                            jnp.where(miss, w_env,
                                      jnp.where(is_emissive, w_bsdf, 0.0)),
                        ) * active.astype(jnp.float32)
                elif use_env_nee:
                    # the sky itself is light-sampled: gate (or MIS-weight)
                    # BSDF-path SKY emission; surface hits keep full weight
                    # (an env-only scene has no emissive triangles) —
                    # integrate/wavefront.py:408-423
                    if not use_mis:
                        emit_w = (
                            active
                            & ((count_emit > 0) | jnp.logical_not(miss))
                        ).astype(jnp.float32)
                    else:
                        from .imgfetch import env_pdf_sa_rows

                        p_env_d = env_pdf_sa_rows(
                            encdf_ref[...], (dx, dy, dz), dist_h, dist_w)
                        w_env = pdf_prev / jnp.maximum(
                            pdf_prev + p_env_d, 1e-30)
                        emit_w = jnp.where(
                            (count_emit > 0) | jnp.logical_not(miss),
                            1.0, w_env,
                        ) * active.astype(jnp.float32)
                elif not use_nee:
                    emit_w = active.astype(jnp.float32)
                elif not use_mis:
                    emit_w = (
                        active & ((count_emit > 0) | miss)
                    ).astype(jnp.float32)
                else:
                    cos_l_hit = jnp.abs(
                        dx * normal[0] + dy * normal[1] + dz * normal[2]
                    )
                    t_safe = jnp.where(miss, 0.0, bt)
                    p_nee_hit = (
                        (t_safe * t_safe) * np.float32(1.0 / total_area)
                        / jnp.maximum(cos_l_hit, np.float32(1e-6))
                    )
                    w_bsdf = pdf_prev / jnp.maximum(
                        pdf_prev + p_nee_hit, 1e-30
                    )
                    is_emissive = (
                        jnp.maximum(jnp.maximum(emission[0], emission[1]),
                                    emission[2]) > 0
                    ) & jnp.logical_not(miss)
                    emit_w = jnp.where(
                        (count_emit > 0) | miss, 1.0,
                        jnp.where(is_emissive, w_bsdf, 0.0),
                    ) * active.astype(jnp.float32)
                tr = tr + wr * emission[0] * emit_w
                tg = tg + wg * emission[1] * emit_w
                tb = tb + wb * emission[2] * emit_w
                if defer_env:
                    # one record per (pixel, sample): a miss ends the
                    # sample, so a masked row write per sample slot is
                    # exact (megakernel_bvh defer_env). The recorded
                    # weight carries emit_w: under NEE, non-camera sky
                    # misses are gated (or MIS-weighted) exactly like
                    # resident-map miss shading — without NEE emit_w is
                    # 1.0 on every recorded lane (bitwise the old record)
                    rec = miss & active
                    mwr, mwg, mwb = wr * emit_w, wg * emit_w, wb * emit_w
                    for si in range(spp):
                        m = rec & (s == si)
                        sl = pl.ds(si * r, r)
                        for _eref, _val in (
                                (edx_ref, dx), (edy_ref, dy), (edz_ref, dz),
                                (ewr_ref, mwr), (ewg_ref, mwg),
                                (ewb_ref, mwb)):
                            _eref[sl, :] = jnp.where(m, _val, _eref[sl, :])

                if use_nee:
                    r_sel, seed = _rand_vec(seed)
                    rl1, seed = _rand_vec(seed)
                    rl2, seed = _rand_vec(seed)
                    if bucketed_lights:
                        # two-level bucketed select for big tables
                        # (imgfetch.light_select_rows_bucketed; bitwise
                        # the unrolled chain's pick)
                        from .imgfetch import light_select_rows_bucketed

                        fld = light_select_rows_bucketed(
                            light_ref[...], lcdf_ref[...], r_sel,
                            num_lights,
                        )
                    elif mxu_lights:
                        # one one-hot MXU matmul per block row lands all
                        # 15 fields (imgfetch.light_select_rows; bitwise
                        # the unrolled chain's pick)
                        from .imgfetch import light_select_rows

                        fld = light_select_rows(
                            light_ref[...], lcdf_ref[...], r_sel,
                            num_lights,
                        )
                    else:
                        # CDF select (unrolled; L is small and static)
                        li = jnp.zeros((r, lanes), jnp.int32)
                        for i in range(num_lights - 1):
                            li = li + (
                                r_sel > lights[i][15]).astype(jnp.int32)
                        fld = list(lights[0][:15])
                        fld = [f + zero for f in fld]
                        for i in range(1, num_lights):
                            pick = li == i
                            fld = [
                                jnp.where(pick, lights[i][k], f)
                                for k, f in enumerate(fld)
                            ]
                    lv0 = fld[0:3]
                    lv1 = fld[3:6]
                    lv2 = fld[6:9]
                    ln = fld[9:12]
                    le = fld[12:15]
                    su = jnp.sqrt(jnp.maximum(rl1, 0.0))
                    b0w = 1.0 - su
                    b1w = su * (1.0 - rl2)
                    b2w = su * rl2
                    q = [
                        lv0[a] * b0w + lv1[a] * b1w + lv2[a] * b2w
                        for a in range(3)
                    ]
                    tlx = q[0] - position[0]
                    tly = q[1] - position[1]
                    tlz = q[2] - position[2]
                    dist2 = jnp.maximum(
                        tlx * tlx + tly * tly + tlz * tlz, 1e-12
                    )
                    inv_dist = jax.lax.rsqrt(dist2)
                    wlx = tlx * inv_dist
                    wly = tly * inv_dist
                    wlz = tlz * inv_dist
                    cos_s = wlx * normal[0] + wly * normal[1] + wlz * normal[2]
                    brdf_l = tuple(a * INV_PI for a in diffuse)
                    if has_glossy:
                        wl3 = (wlx, wly, wlz)
                        wl_l = (vec.dot(wl3, tng), vec.dot(wl3, btg),
                                vec.dot(wl3, n_g))
                        cos_i_g = wl_l[2]
                        hh = vec.add(wo_l, wl_l)
                        inv_hh = jax.lax.rsqrt(
                            jnp.maximum(vec.dot(hh, hh), 1e-20))
                        hh = vec.scale(hh, inv_hh)
                        dgg = ggx_d(hh[2], alpha_g)
                        g2_l = 1.0 / (
                            1.0 + lam_o + ggx_lambda(cos_i_g, alpha_g))
                        coh_l = jnp.maximum(vec.dot(wo_l, hh), 1e-6)
                        fr_l = ggx_f_k(coh_l)
                        den_l = jnp.maximum(
                            4.0 * woz * jnp.maximum(cos_i_g, 1e-6), 1e-6)
                        f_g = tuple(fc * dgg * g2_l / den_l for fc in fr_l)
                        cos_s = jnp.where(is_glossy, cos_i_g, cos_s)
                        brdf_l = tuple(
                            jnp.where(is_glossy, fg, bl)
                            for fg, bl in zip(f_g, brdf_l)
                        )
                    cos_l = jnp.abs(wlx * ln[0] + wly * ln[1] + wlz * ln[2])
                    shadow_q = (
                        active & jnp.logical_not(miss | is_spec)
                        & (cos_s > 0)
                    )
                    smax = (1.0 / inv_dist) * np.float32(1.0 - 1e-3)
                    occ = jnp.zeros((r, lanes), bool)
                    for (p0t, p1t, p2t, e1, e2, _mat, _aux) in tris:
                        pvx = wly * e2[2] - wlz * e2[1]
                        pvy = wlz * e2[0] - wlx * e2[2]
                        pvz = wlx * e2[1] - wly * e2[0]
                        det = e1[0] * pvx + e1[1] * pvy + e1[2] * pvz
                        inv_det = jnp.where(
                            jnp.abs(det) > 1e-12, 1.0 / det, 0.0
                        )
                        tvx = position[0] - p0t[0]
                        tvy = position[1] - p0t[1]
                        tvz = position[2] - p0t[2]
                        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                        qvx = tvy * e1[2] - tvz * e1[1]
                        qvy = tvz * e1[0] - tvx * e1[2]
                        qvz = tvx * e1[1] - tvy * e1[0]
                        v = (wlx * qvx + wly * qvy + wlz * qvz) * inv_det
                        t = (e2[0] * qvx + e2[1] * qvy + e2[2] * qvz) * inv_det
                        occ = occ | (
                            (jnp.abs(det) > 1e-12)
                            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                            & (t > t_min) & (t < smax)
                        )
                    g_pdf = cos_s * cos_l / dist2 * np.float32(total_area)
                    if use_mis:
                        # balance heuristic in solid-angle measure (same
                        # math as megakernel_bvh.py / the wavefront
                        # integrator, incl. the glossy VNDF pdf branch)
                        p_nee_sa = dist2 / (
                            np.float32(total_area)
                            * jnp.maximum(cos_l, np.float32(1e-6))
                        )
                        if uniform:
                            p_bsdf_l = jnp.full_like(cos_s, 1.0 / TWO_PI)
                        else:
                            p_bsdf_l = jnp.maximum(cos_s, 0.0) * INV_PI
                        if has_glossy:
                            p_bsdf_l = jnp.where(
                                is_glossy,
                                ggx_vndf_pdf(woz, hh[2], alpha_g),
                                p_bsdf_l,
                            )
                        g_pdf = g_pdf * (
                            p_nee_sa / jnp.maximum(p_nee_sa + p_bsdf_l,
                                                   1e-30)
                        )
                    vis = shadow_q & jnp.logical_not(occ)
                    tr = tr + jnp.where(
                        vis, wr * brdf_l[0] * le[0] * g_pdf, 0.0
                    )
                    tg = tg + jnp.where(
                        vis, wg * brdf_l[1] * le[1] * g_pdf, 0.0
                    )
                    tb = tb + jnp.where(
                        vis, wb * brdf_l[2] * le[2] * g_pdf, 0.0
                    )

                if use_env_nee:
                    # importance-sample the environment (wavefront
                    # integrate/wavefront.py:484-520 semantics, same draw
                    # order): exact flat-CDF inversion, texel-jittered
                    # direction, shadow ray to t_max, radiance via the
                    # same separable fetch as miss shading
                    from .imgfetch import env_cdf_sample_rows

                    r_sel, seed = _rand_vec(seed)
                    rl1, seed = _rand_vec(seed)
                    rl2, seed = _rand_vec(seed)
                    rowp, colp, pdfflat = env_cdf_sample_rows(
                        encdf_ref[...], enrow_ref[...], r_sel,
                        dist_h, dist_w,
                    )
                    theta_l = (rowp + rl1) * np.float32(np.pi / dist_h)
                    phi_l = (
                        (colp + rl2) * np.float32(2.0 * np.pi / dist_w)
                        - np.float32(np.pi)
                    )
                    st_l = jnp.sin(theta_l)
                    wlx = st_l * jnp.cos(phi_l)
                    wly = jnp.cos(theta_l)
                    wlz = st_l * jnp.sin(phi_l)
                    inv_patch = np.float32(
                        dist_w * dist_h / (2.0 * np.pi * np.pi))
                    pdf_sa = (pdfflat * inv_patch
                              / jnp.maximum(st_l, np.float32(1e-6)))
                    cos_s = (wlx * normal[0] + wly * normal[1]
                             + wlz * normal[2])
                    brdf_l = tuple(a * INV_PI for a in diffuse)
                    if has_glossy:
                        wl3 = (wlx, wly, wlz)
                        wl_l = (vec.dot(wl3, tng), vec.dot(wl3, btg),
                                vec.dot(wl3, n_g))
                        cos_i_g = wl_l[2]
                        hh = vec.add(wo_l, wl_l)
                        inv_hh = jax.lax.rsqrt(
                            jnp.maximum(vec.dot(hh, hh), 1e-20))
                        hh = vec.scale(hh, inv_hh)
                        dgg = ggx_d(hh[2], alpha_g)
                        g2_l = 1.0 / (
                            1.0 + lam_o + ggx_lambda(cos_i_g, alpha_g))
                        coh_l = jnp.maximum(vec.dot(wo_l, hh), 1e-6)
                        fr_l = ggx_f_k(coh_l)
                        den_l = jnp.maximum(
                            4.0 * woz * jnp.maximum(cos_i_g, 1e-6), 1e-6)
                        f_g = tuple(fc * dgg * g2_l / den_l for fc in fr_l)
                        cos_s = jnp.where(is_glossy, cos_i_g, cos_s)
                        brdf_l = tuple(
                            jnp.where(is_glossy, fg, bl)
                            for fg, bl in zip(f_g, brdf_l)
                        )
                    shadow_q = (
                        active & jnp.logical_not(miss | is_spec)
                        & (cos_s > 0)
                    )
                    smax = t_max * np.float32(1.0 - 1e-3)
                    occ = jnp.zeros((r, lanes), bool)
                    for (p0t, p1t, p2t, e1, e2, _mat, _aux) in tris:
                        pvx = wly * e2[2] - wlz * e2[1]
                        pvy = wlz * e2[0] - wlx * e2[2]
                        pvz = wlx * e2[1] - wly * e2[0]
                        det = e1[0] * pvx + e1[1] * pvy + e1[2] * pvz
                        inv_det = jnp.where(
                            jnp.abs(det) > 1e-12, 1.0 / det, 0.0
                        )
                        tvx = position[0] - p0t[0]
                        tvy = position[1] - p0t[1]
                        tvz = position[2] - p0t[2]
                        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                        qvx = tvy * e1[2] - tvz * e1[1]
                        qvy = tvz * e1[0] - tvx * e1[2]
                        qvz = tvx * e1[1] - tvy * e1[0]
                        v = (wlx * qvx + wly * qvy + wlz * qvz) * inv_det
                        t = (e2[0] * qvx + e2[1] * qvy + e2[2] * qvz) * inv_det
                        occ = occ | (
                            (jnp.abs(det) > 1e-12)
                            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                            & (t > t_min) & (t < smax)
                        )
                    g_w = cos_s / jnp.maximum(pdf_sa, np.float32(1e-12))
                    if use_mis:
                        if uniform:
                            p_bsdf_l = jnp.full_like(cos_s, 1.0 / TWO_PI)
                        else:
                            p_bsdf_l = jnp.maximum(cos_s, 0.0) * INV_PI
                        if has_glossy:
                            p_bsdf_l = jnp.where(
                                is_glossy,
                                ggx_vndf_pdf(woz, hh[2], alpha_g),
                                p_bsdf_l,
                            )
                        g_w = g_w * (
                            pdf_sa / jnp.maximum(pdf_sa + p_bsdf_l, 1e-30)
                        )
                    vis = shadow_q & jnp.logical_not(occ)
                    if not defer_env_nee:
                        from .imgfetch import env_fetch_rows as _env_fetch

                        env_le = _env_fetch(
                            env_ref[...], (wlx, wly, wlz), env_h, env_w)
                        tr = tr + jnp.where(
                            vis, wr * brdf_l[0] * env_le[0] * g_w, 0.0
                        )
                        tg = tg + jnp.where(
                            vis, wg * brdf_l[1] * env_le[1] * g_w, 0.0
                        )
                        tb = tb + jnp.where(
                            vis, wb * brdf_l[2] * env_le[2] * g_w, 0.0
                        )
                    else:
                        # OVERSIZED map: record (dir, w*vis*brdf*cos*mis/
                        # pdf) into slab s*max_depth+bounce; the step
                        # gathers L(dir) post-kernel (megakernel_bvh
                        # defer_env_nee). Writes sweep only the dynamic
                        # [rc_min, rc_max] slab range present in the
                        # block (dynamic SUBLANE starts are legal).
                        nw_r = jnp.where(vis, wr * brdf_l[0] * g_w, 0.0)
                        nw_g = jnp.where(vis, wg * brdf_l[1] * g_w, 0.0)
                        nw_b = jnp.where(vis, wb * brdf_l[2] * g_w, 0.0)
                        rc = s * max_depth + bounce
                        n_slab = spp * max_depth
                        rc_min = jnp.min(
                            jnp.where(vis, rc, jnp.int32(n_slab)))
                        rc_max = jnp.max(jnp.where(vis, rc, jnp.int32(-1)))

                        def _rec_write(k, carry):
                            m = vis & (rc == k)
                            sl = pl.ds(k * r, r)
                            for _nref, _val in (
                                    (ndx_ref, wlx), (ndy_ref, wly),
                                    (ndz_ref, wlz), (nwr_ref, nw_r),
                                    (nwg_ref, nw_g), (nwb_ref, nw_b)):
                                _nref[sl, :] = jnp.where(
                                    m, _val, _nref[sl, :])
                            return carry

                        jax.lax.fori_loop(
                            rc_min, rc_max + 1, _rec_write, 0)

                # ---- next direction ----
                r1, seed = _rand_vec(seed)
                r2, seed = _rand_vec(seed)
                nx, ny, nz = normal
                use_x = jnp.abs(nx) > jnp.abs(ny)
                inv_a = jax.lax.rsqrt(jnp.maximum(nx * nx + nz * nz, 1e-30))
                inv_b = jax.lax.rsqrt(jnp.maximum(ny * ny + nz * nz, 1e-30))
                tang = (
                    jnp.where(use_x, nz * inv_a, 0.0),
                    jnp.where(use_x, 0.0, -nz * inv_b),
                    jnp.where(use_x, -nx * inv_a, ny * inv_b),
                )
                bit = vec.cross(normal, tang)
                if uniform:
                    sq = jnp.sqrt(jnp.maximum(0.0, 1.0 - r1 * r1))
                    lz = r1
                else:
                    sq = jnp.sqrt(jnp.maximum(0.0, r1))
                    lz = jnp.sqrt(jnp.maximum(0.0, 1.0 - r1))
                phi = TWO_PI * r2
                new_dir = vec.add(
                    vec.add(vec.scale(tang, jnp.cos(phi) * sq),
                            vec.scale(bit, jnp.sin(phi) * sq)),
                    vec.scale(normal, lz),
                )
                if uniform:
                    cos_t = vec.dot(new_dir, normal)
                    scale3 = vec.scale(diffuse, (INV_PI * TWO_PI) * cos_t)
                else:
                    scale3 = diffuse

                glossy_kill = None
                if has_glossy:
                    # VNDF half-vector sample (Heitz 2018) via the shared
                    # sampling.py implementation (pure jnp, runs in-kernel);
                    # same r1/r2 draws as the hemisphere sample
                    h_l = ggx_sample_vndf_local(r1, r2, wo_l, alpha_g)
                    coh = jnp.maximum(vec.dot(wo_l, h_l), 1e-6)
                    wi_l = vec.sub(vec.scale(h_l, 2.0 * coh), wo_l)
                    g_valid = wi_l[2] > 1e-5
                    wi_g = vec.add(
                        vec.add(vec.scale(tng, wi_l[0]),
                                vec.scale(btg, wi_l[1])),
                        vec.scale(n_g, wi_l[2]),
                    )
                    g2_over_g1 = (1.0 + lam_o) / (
                        1.0 + lam_o + ggx_lambda(wi_l[2], alpha_g)
                    )
                    scale_g = vec.scale(ggx_f_k(coh), g2_over_g1)
                    new_dir = vec.where(is_glossy, wi_g, new_dir)
                    scale3 = vec.where(is_glossy, scale_g, scale3)
                    glossy_kill = is_glossy & jnp.logical_not(g_valid)

                if use_mis:
                    # pdf of the direction just sampled (solid angle),
                    # recorded BEFORE the mirror override exactly like the
                    # wavefront integrator (mirror lanes never read it:
                    # their count_emit gate forces weight 1)
                    if uniform:
                        new_pdf = jnp.full_like(pdf_prev, 1.0 / TWO_PI)
                    else:
                        new_pdf = jnp.maximum(
                            vec.dot(new_dir, normal), 0.0) * INV_PI
                    if has_glossy:
                        new_pdf = jnp.where(
                            is_glossy,
                            ggx_vndf_pdf(woz, h_l[2], alpha_g),
                            new_pdf,
                        )

                if has_mirrors:
                    n_dot_d = vec.dot(d, normal)
                    n_f = vec.where(n_dot_d > 0, vec.scale(normal, -1.0),
                                    normal)
                    refl = vec.sub(d, vec.scale(n_f, 2.0 * vec.dot(d, n_f)))
                    new_dir = vec.where(is_mirror, refl, new_dir)
                    scale3 = vec.where(is_mirror,
                                       (bmat[6], bmat[7], bmat[8]), scale3)

                if has_diel:
                    # smooth dielectric (mtype 3): shared Snell + exact
                    # Fresnel helper (pure elementwise jnp/vec ops,
                    # Mosaic-safe). IOR travels in the table's roughness
                    # slot encoded (Ni-1)/4; the reflect/refract choice
                    # reuses the r1 draw exactly like the wavefront
                    # integrator.
                    ior = 1.0 + 4.0 * jnp.where(is_diel, bmat[10], 0.0)
                    refl_dd, refr_dd, fres, tir = (
                        dielectric_reflect_refract_soa(d, normal, ior)
                    )
                    choose_refl = tir | (r1 < fres)
                    diel_dir = vec.where(choose_refl, refl_dd, refr_dd)
                    new_dir = vec.where(is_diel, diel_dir, new_dir)
                    scale3 = vec.where(is_diel,
                                       (bmat[6], bmat[7], bmat[8]), scale3)

                cont = active & jnp.logical_not(miss) & (bounce + 1 < max_depth)
                if glossy_kill is not None:
                    cont = cont & jnp.logical_not(glossy_kill)
                if use_rr:
                    pmax = jnp.clip(
                        vec.maxc(vec.mul((wr, wg, wb), scale3)), 0.05, 0.95
                    )
                    r_rr, seed = _rand_vec(seed)
                    rr_on = bounce >= rr_start
                    survive = jnp.logical_not(rr_on) | (r_rr < pmax)
                    scale3 = vec.where(rr_on, vec.scale(scale3, 1.0 / pmax),
                                       scale3)
                    cont = cont & survive

                ox = jnp.where(cont, position[0], ox)
                oy = jnp.where(cont, position[1], oy)
                oz = jnp.where(cont, position[2], oz)
                dx = jnp.where(cont, new_dir[0], dx)
                dy = jnp.where(cont, new_dir[1], dy)
                dz = jnp.where(cont, new_dir[2], dz)
                wr = jnp.where(cont, wr * scale3[0], wr)
                wg = jnp.where(cont, wg * scale3[1], wg)
                wb = jnp.where(cont, wb * scale3[2], wb)

                finished = active & jnp.logical_not(cont)
                s = s + finished.astype(jnp.int32)
                bounce = jnp.where(cont, bounce + 1, 0)
                if use_nee or use_env_nee:
                    count_emit = is_spec.astype(jnp.int32)
                if use_mis:
                    pdf_prev = jnp.where(cont, new_pdf, pdf_prev)
                segs = segs + jnp.where(active, 1.0, 0.0)
                return (s, bounce, ox, oy, oz, dx, dy, dz, wr, wg, wb, seed,
                        tr, tg, tb, segs, count_emit, pdf_prev)

            final = jax.lax.while_loop(cond, body, init)
            tr, tg, tb, segs = final[12], final[13], final[14], final[15]
            colr_ref[:] = tr
            colg_ref[:] = tg
            colb_ref[:] = tb
            segs_ref[:] = segs

        return kernel

    from ..integrate.wavefront import RenderState

    def render_step(state: RenderState, row0=0) -> RenderState:
        h, w = state.accum.shape[0], state.accum.shape[1]
        npix = h * w
        rows_total = -(-npix // lanes)
        r = max(8, min(block_rows, rows_total))
        rows_padded = -(-rows_total // r) * r
        grid = rows_padded // r
        kernel = build_kernel(r, npix)

        scal = jnp.stack([
            jnp.asarray(state.frame, jnp.int32),
            jnp.asarray(row0, jnp.int32),
        ])
        blk = pl.BlockSpec((r, lanes), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        args = [scal, table]
        if use_nee:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            args.append(light_table)
            if mxu_lights:
                in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
                args.append(light_cdfb)
        if env_in_kernel:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            args.append(env_table)
        if use_env_nee:
            in_specs.extend([pl.BlockSpec(memory_space=pltpu.VMEM)] * 2)
            args.extend([env_nee_cdfpdf, env_nee_rowend])
        if use_tex:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            args.append(atlas_table)
        out_specs = [blk] * 4
        out_shapes = [
            jax.ShapeDtypeStruct((rows_padded, lanes), jnp.float32)
        ] * 4
        if defer_env:
            eblk = pl.BlockSpec((spp * r, lanes), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
            out_specs += [eblk] * 6
            out_shapes += [
                jax.ShapeDtypeStruct((grid * spp * r, lanes), jnp.float32)
            ] * 6
            if defer_env_nee:
                nblk = pl.BlockSpec((spp * max_depth * r, lanes),
                                    lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
                out_specs += [nblk] * 6
                out_shapes += [
                    jax.ShapeDtypeStruct(
                        (grid * spp * max_depth * r, lanes), jnp.float32)
                ] * 6
        colr, colg, colb, segs, *edefer = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(*args)

        flat = lambda a: a.reshape(-1)[:npix]  # noqa: E731
        colr, colg, colb = flat(colr), flat(colg), flat(colb)
        if defer_env:
            # deferred env-miss shading: one coherent XLA gather over the
            # per-sample records (the wavefront loop's exact fetch)
            from ..scene.textures import sample_environment

            def per_slab(o, n):
                o = o.reshape(grid, n, r, lanes).transpose(1, 0, 2, 3)
                return o.reshape(n, rows_padded * lanes)[:, :npix]

            sdx, sdy, sdz, swr, swg, swb = (
                per_slab(o, spp) for o in edefer[:6])
            er_, eg_, eb_ = sample_environment(env, (sdx, sdy, sdz))
            colr = colr + jnp.sum(swr * er_, axis=0)
            colg = colg + jnp.sum(swg * eg_, axis=0)
            colb = colb + jnp.sum(swb * eb_, axis=0)
            if defer_env_nee:
                # deferred env-NEE shading over the per-(sample, bounce)
                # records; zero-weight slabs contribute exact zeros
                ndx, ndy, ndz, nwr, nwg, nwb = (
                    per_slab(o, spp * max_depth) for o in edefer[6:12])
                nr_, ng_, nb_ = sample_environment(env, (ndx, ndy, ndz))
                colr = colr + jnp.sum(nwr * nr_, axis=0)
                colg = colg + jnp.sum(nwg * ng_, axis=0)
                colb = colb + jnp.sum(nwb * nb_, axis=0)
        color = jnp.stack(
            [colr.reshape(h, w), colg.reshape(h, w),
             colb.reshape(h, w)], axis=-1
        ) / np.float32(spp)
        f = state.frame.astype(jnp.float32)
        accum = (color + state.accum * f) / (f + 1.0)
        return RenderState(
            accum=accum,
            frame=state.frame + 1,
            mrays=state.mrays + jnp.sum(flat(segs)) / np.float32(1e6),
        )

    return render_step
