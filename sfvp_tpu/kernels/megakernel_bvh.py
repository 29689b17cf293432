"""BVH regen megakernel — sample-regeneration path tracing with in-kernel
packet BVH traversal (the large-scene counterpart of megakernel_regen.py).

Why: the wavefront GI path on big scenes relaunches the packet-trace kernel
once per bounce; by bounce 2-3 two thirds of its lanes are dead, every
relaunch pays block IO, and each bounce pays a 17-array lax.sort. Profiling
(benchmarks/probe_packets.py, sim_packets.py) shows the packet kernel's
per-program fixed cost and the dead-lane waste dominate the step. This
kernel keeps EVERY lane busy until the whole sample budget drains: each
lane owns one pixel and runs its spp samples back-to-back (regeneration, as
in megakernel_regen.py), while each bounce traces the full (block_rows x
128) packet through the 8-wide BVH with the shared-SMEM-stack traversal of
kernels/bvh_packet.py. No sort, no relaunch, no dead lanes; packets mix
bounce depths, which costs ~15% traversal quality vs sorted wavefronts
(sim_packets.py) and buys back far more in occupancy.

Per-sample semantics identical to the reference and to the other
integrators (ref shaders/raygen.rgen:41-91): same PCG seeding, same bounce
math, miss = sky + terminate, emissive hits never terminate. NEE (<= 1024
lights, or importance-sampled env NEE on env-only scenes) runs in-kernel
with an any-hit shadow packet traversal per bounce, with optional
balance-heuristic MIS (use_mis) carrying the bounce pdf.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.wide import WideBVH
from ..config import RenderConfig
from ..utils import vec
from ..sampling import (
    dielectric_reflect_refract_soa,
    ggx_d,
    ggx_lambda,
    ggx_sample_vndf_local,
    ggx_vndf_pdf,
)
from .megakernel import INV_PI, TWO_PI, _pcg2d_vec, _rand_vec, _U
from .bvh_tlas import _IB  # instance-code base for two-level traversal

_BIG = np.float32(1e30)
INF = np.float32(np.inf)


def make_bvh_regen_render_step(
    cfg: RenderConfig,
    scene_buffers,
    wide: Optional[WideBVH] = None,
    global_shape: Optional[tuple] = None,
    block_rows: int = 8,
    interpret: Optional[bool] = None,
    stream_tris: bool = False,
    smem_codes: Optional[bool] = None,
    smem_boxes: Optional[bool] = None,
    smem_leaf: bool = False,
    fast_node: bool = False,
    shadow_sort: int = 0,
    shadow_slab: int = 0,
    shadow_mt: int = 0,
    shadow_push: int = 0,
    shadow_code: int = 0,
    shadow_iters: int = 0,
    scratch_pay: bool = False,
    pop_unroll: int = 1,
    push_pf: bool = False,
    vmem_limit_bytes: Optional[int] = None,
    tl=None,
    defer_inst_xform: Optional[bool] = None,
):
    """render_step(state, row0) -> state. Whole spp per kernel call, BVH
    traversal per bounce, in-lane sample regeneration.

    stream_tris: keep the triangle rows in HBM and DMA each popped leaf
    row into a 2-slot VMEM ring. A leaf pop starts the NEXT leaf's DMA
    before its own 8 intersection tests whenever the stack top is
    another leaf (~70% of leaf pops on the 500k bounce wave,
    sim_packets.py w1024_leaf_leaf_adj_frac), so most waits are already
    satisfied — the round-2 blocking fetch measured 35% of the streamed
    step (benchmarks/probe_stream_overlap.py). Node rows stay
    VMEM-resident either way.

    smem_boxes: move the ENTIRE node table to SMEM (the 48 box scalars
    per node, flat) so a node pop does zero VMEM traffic — no dynamic
    row load on the pop chain, 48 scalar loads instead of 48 lane
    extracts. Requires smem_codes (no tag/ref decode without it);
    None = auto (on when codes+boxes fit the SMEM budget).

    smem_leaf: route the popped leaf's 128-lane tri row (+ aux row when
    textured) through a 2-slot SMEM ring so the 16 per-tri scalars come
    from SMEM scalar loads — measured FREE on v5e (they dual-issue with
    the consuming scalar math) — instead of the dynamic VMEM row load +
    128 lane extracts (~191 ns per leaf pop; both sides measured in
    benchmarks/micro_leaf_cost.py, PROBE_LEAF_SMEM_r04.json). The ring
    reuses the stream_tris prefetch discipline (next-leaf DMA issued
    behind the current pop's 8 intersection tests, 70-78% leaf->leaf
    adjacency) with SMEM as the copy destination; works for resident
    (VMEM->SMEM) and streamed (HBM->SMEM) tri rows alike. Measured
    (PROBE_SMEM_LEAF_AB_r04.json): Cornell 1.22x, 100k GI 1.14x,
    streamed 500k 1.28x, textured streamed 1.51x — dispatch enables it
    for the single-level kernel; the two-level (tl=) kernel measured
    14% SLOWER (instance-context work dominates its pops) so instanced
    dispatch keeps the extract path.

    tl: an accel.tlas.TwoLevelBVH makes this the FUSED INSTANCED kernel:
    the per-bounce traversal is the two-level (TLAS over shared BLASes)
    packet traversal of kernels/bvh_tlas.py — instance-context stack,
    per-pop object-space ray re-derivation, world-space leaf payloads —
    while the whole regen/shade/NEE machinery is unchanged. Kills the
    per-bounce relaunch + dead lanes + 17-array sorts that instanced
    scenes paid in the wavefront loop (ref main.cpp:514-538 TLAS;
    raygen.rgen:41-91 is one hardware megakernel over it).
    scene_buffers must then be the FLATTENED world-space buffers (for
    lights/materials/env/textures), exactly what
    dispatch.instanced_wavefront_kwargs uses."""
    two_level = tl is not None
    from .bvh_packet import SMEM_BOXES_MAX_BYTES, SMEM_CODES_MAX_BYTES

    inst = None
    defer_xform = False
    fwt = None
    if two_level:
        if stream_tris:
            raise ValueError("two-level fused kernel keeps tri rows "
                             "resident (shared BLASes are small)")
        if fast_node:
            raise ValueError("fast_node is single-level only")
        from .bvh_tlas import _smem_fits, _smem_tables

        # WORLD context is an appended IDENTITY instance row (index
        # num_instances): TLAS-level pops read it like any other context,
        # so the per-pop ray re-derivation needs NO in_world vector
        # selects (identity transform reproduces the world ray exactly;
        # its texture base is 0). bvh_tlas.py keeps the where() form.
        world_row = int(tl.num_instances)
        ident = np.zeros((1, 128), np.float32)
        ident[0, 0] = ident[0, 4] = ident[0, 8] = 1.0     # inverse R = I
        ident[0, 12] = ident[0, 16] = ident[0, 20] = 1.0  # forward R = I
        tl = tl._replace(
            inst=np.concatenate([np.asarray(tl.inst), ident]))
        # smem_boxes doubles as the smem_nodes override in two-level mode
        smem_nodes = (_smem_fits(tl) if smem_boxes is None
                      else bool(smem_boxes))
        if smem_nodes:
            boxes_np, codes_np, inst_np = _smem_tables(tl)
            nodes = jnp.asarray(boxes_np)
            codes = jnp.asarray(codes_np)
            inst = jnp.asarray(inst_np)
        else:
            nodes = jnp.asarray(tl.nodes)
            codes = None
            inst = jnp.asarray(tl.inst)
        tris = jnp.asarray(tl.tris)
        # reuse the single-level operand plumbing: smem_codes gates the
        # codes operand, smem_boxes the SMEM-vs-VMEM node spec
        smem_codes = smem_boxes = smem_nodes
        stack_n = int(tl.max_stack)
        wide_aux = tl.tris_aux
        # defer_inst_xform (default ON): leaf pops store OBJECT-space
        # vertices + the instance id as one extra payload plane; the
        # world transform runs ONCE per bounce after the traversal loop
        # (per-lane coefficients via an exact one-hot MXU gather,
        # imgfetch.inst_xform_select_rows) instead of 12 SMEM loads +
        # 27 vector FMAs x 8 slots on EVERY leaf pop — and leaf pops are
        # 59% of this scene class's pops (benchmarks/probe_tlas_pops.py:
        # bounce wave 13341 leaf / 9026 node / 272 inst). Bitwise
        # identical: same coefficients, same FMA order, on the winning
        # slot's object vertices.
        defer_xform = (True if defer_inst_xform is None
                       else bool(defer_inst_xform))
        if defer_xform:
            inst_full = np.asarray(tl.inst)
            n_i = inst_full.shape[0]
            n_pad = -(-n_i // 128) * 128
            fw_np = np.zeros((12, n_pad), np.float32)
            fw_np[:, :n_i] = inst_full[:, 12:24].T
            fwt = jnp.asarray(fw_np)
    else:
        if wide is None:
            from ..accel.wide import build_wide_from_buffers

            wide = build_wide_from_buffers(scene_buffers)
        nodes = jnp.asarray(wide.nodes)
        tris = jnp.asarray(wide.tris)

        if smem_codes is None:
            smem_codes = wide.codes_nbytes <= SMEM_CODES_MAX_BYTES
        boxes_nbytes = int(wide.nodes.shape[0]) * 48 * 4
        if smem_boxes is None:
            smem_boxes = bool(smem_codes) and (
                wide.codes_nbytes + boxes_nbytes <= SMEM_BOXES_MAX_BYTES)
        smem_boxes = bool(smem_boxes) and bool(smem_codes)
        codes = (jnp.asarray(wide.codes.reshape(-1))
                 if smem_codes else None)  # 1-D: SMEM pads rows to 128 lanes
        if smem_boxes:
            # nodes[:, :48] ARE the per-child box scalars in lane order
            # [mnx*8 mny*8 mnz*8 mxx*8 mxy*8 mxz*8]; flat so boxes[n*48+c]
            # == nodes[n, c]. Replaces the VMEM node operand entirely.
            nodes = jnp.asarray(np.ascontiguousarray(
                np.asarray(wide.nodes)[:, :48]).reshape(-1))
        stack_n = int(wide.max_stack)
        wide_aux = wide.tris_aux

    # the 2-slot leaf DMA ring exists for streamed rows (HBM source) and
    # for smem_leaf (SMEM destination); same prefetch state machine.
    use_ring = stream_tris or smem_leaf
    # push_pf (round-5 VERDICT item 7): a node pop that pushes a LEAF as
    # its new stack top (nearest child = last real entry of the
    # descending sort; last push in index order on the any-hit side)
    # starts that leaf's ring DMA at PUSH time — the copy then overlaps
    # the 8 stack writes, the loop backedge + branch dispatch (the
    # measured 18.7% fixed iteration cost) and the leaf pop's own
    # front-end, covering the leaf-after-node pops the pop-time peek
    # cannot reach (leaf->leaf adjacency is 70-78%, so ~1 in 4 leaf pops
    # still blocked). No spill handling is needed: the predicted code IS
    # the new top, so it is consumed by the very next pop, preserving
    # the ring's one-outstanding invariant.
    push_pf = bool(push_pf) and use_ring

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

    num_tris = scene_buffers.num_tris
    has_mirrors = bool(
        _np.any(_np.asarray(scene_buffers.mtype)[:num_tris] == 1)
    )
    has_glossy = bool(
        _np.any(_np.asarray(scene_buffers.mtype)[:num_tris] == 2)
    )
    has_diel = bool(
        _np.any(_np.asarray(scene_buffers.mtype)[:num_tris] == 3)
    )

    # in-kernel NEE light table, identical layout to megakernel_regen.py:
    # (16, L) rows = v0(3) v1(3) v2(3) normal(3) Le(3) cdf(1); shadow
    # occlusion runs as a second (any-hit) packet traversal per bounce
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
            # Oversized map (e.g. a 2048x1024 HDR sky): DEFER miss
            # shading instead of leaving the fused kernel. A miss
            # terminates its sample, so each (pixel, sample) has at most
            # ONE env record — the kernel writes (miss dir, weight) into
            # 6 per-sample output planes and the step adds
            # weight * sample_environment(env, dir) at the XLA level
            # after the kernel (the wavefront loop's exact fetch,
            # scene/textures.py). Under NEE the same linearity defers
            # the env-NEE radiance too: per-BOUNCE (dir, weight) records
            # (see defer_env_nee below).
            defer_env = True
        else:
            env_table = jnp.asarray(et_np)
    env_in_kernel = use_env and not defer_env

    # ---- in-kernel env NEE (importance-sampled environment; wavefront
    # integrate/wavefront.py:168-183 semantics): engages when NEE is
    # requested and the scene has an env map. When area lights exist too
    # BOTH strategies run per bounce (disjoint sources, each with its own
    # 2-way MIS pairing). The flat texel-CDF inversion runs as the
    # separable exact-searchsorted of kernels/imgfetch.py; the shadow ray
    # is the same any-hit packet traversal as area-light NEE with t_max
    # as the limit. For OVERSIZED maps the proposal is the shared pooled
    # coarse distribution (integrate/lights.py env_distribution_for) —
    # its CDF operands stay resident while the NEE contribution
    # w*vis*brdf*cos*mis/pdf, LINEAR in the fetched radiance L(dir), is
    # recorded per (sample, bounce) and shaded after the kernel with the
    # same sample_environment gather as deferred miss shading.
    use_env_nee = cfg.use_nee and use_env
    defer_env_nee = use_env_nee and defer_env
    env_nee_cdfpdf = env_nee_rowend = None
    dist_h = dist_w = 0
    if use_env_nee:
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

    # ---- in-kernel map_Kd textures (extension — the reference shades
    # flat Kd, ref closesthit.rchit:60-62): the wide-BVH aux leaf rows
    # carry per-corner vt + texid+1; the winning hit's interpolated
    # (u, v, texid) ride 3 extra payload planes and one separable
    # one-hot atlas fetch per bounce modulates Kd, same estimator as
    # integrate/wavefront.py:105-114.
    use_tex = (getattr(scene_buffers, "has_textures", False)
               and wide_aux is not None)
    atlas_table = None
    aux = None
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
        aux = jnp.asarray(wide_aux)

    lanes = 128
    r = block_rows
    # scratch_pay: hit-payload planes (verts/mat/uv [+ictx], bu, bv) live
    # in persistent VMEM scratch instead of the traversal while_loop carry,
    # shrinking the per-pop lax.cond joins to (sp, bt). Written only at
    # leaf pops, read once post-loop; bitwise-identical values.
    n_scr_pay = ((19 if use_tex else 16)
                 + (1 if defer_xform else 0) + 2)  # +bu +bv
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
    ts = cfg.packet_tile_size

    def build_kernel(local_npix, r, swz):
        def kernel(scal_ref, nodes_ref, tris_ref, *refs):
            if smem_codes:
                codes_ref = refs[0]
                refs = refs[1:]
                if shadow_code:
                    # sensitivity knob: a SECOND copy of the code table
                    # (separate ref, so the loads cannot CSE; values are
                    # equal, so the max-merge is the identity)
                    codes2_ref = refs[0]
                    refs = refs[1:]
            if two_level:
                inst_ref = refs[0]
                refs = refs[1:]
            if defer_xform:
                fwt_ref = refs[0]
                refs = refs[1:]
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
                aux_ref = refs[0]
                atlas_ref = refs[1]
                refs = refs[2:]
            if defer_env:
                # deferred env-miss record planes sit after the 4 color/
                # segs outputs: (dir xyz, weight rgb) x (spp, r) rows
                (edx_ref, edy_ref, edz_ref,
                 ewr_ref, ewg_ref, ewb_ref) = refs[4:10]
                n_eref = 10
                if defer_env_nee:
                    # deferred env-NEE record planes: (dir xyz, weight
                    # rgb) x (spp * max_depth, r) rows — slab
                    # s*max_depth+bounce holds sample s's bounce-b record
                    (ndx_ref, ndy_ref, ndz_ref,
                     nwr_ref, nwg_ref, nwb_ref) = refs[10:16]
                    n_eref = 16
                refs = tuple(refs[:4]) + tuple(refs[n_eref:])
            if two_level:
                (colr_ref, colg_ref, colb_ref, segs_ref, stack_ref,
                 istack_ref, ctx_ref, prevctx_ref) = refs[:8]
                refs = refs[8:]
            else:
                (colr_ref, colg_ref, colb_ref, segs_ref,
                 stack_ref) = refs[:5]
                refs = refs[5:]
            if use_ring:
                tbuf_ref, tsem, pf_ref = refs[:3]
                if use_tex:
                    abuf_ref, asem = refs[3:5]
                refs = refs[5 if use_tex else 3:]
            if scratch_pay:
                pay_ref = refs[0]
                refs = refs[1:]

            def inst_scalars(i, lo, hi):
                """Instance-row fields [lo:hi) for instance i (SMEM flat
                table or a dynamic VMEM row, kernels/bvh_tlas.py)."""
                if smem_boxes:  # == smem_nodes in two-level mode
                    ib = i * 128
                    return [inst_ref[ib + cc] for cc in range(lo, hi)]
                irow = inst_ref[pl.ds(i, 1), :]
                return [irow[0, cc] for cc in range(lo, hi)]

            def _leaf_dma(lrow, slot):
                """Start the HBM->VMEM copy of leaf row lrow (+ its
                parallel uv/texid row) into ring slot `slot`."""
                pltpu.make_async_copy(
                    tris_ref.at[pl.ds(lrow, 1), :],
                    tbuf_ref.at[pl.ds(slot, 1), :], tsem.at[slot],
                ).start()
                if use_tex:
                    pltpu.make_async_copy(
                        aux_ref.at[pl.ds(lrow, 1), :],
                        abuf_ref.at[pl.ds(slot, 1), :], asem.at[slot],
                    ).start()

            def load_leaf_rows(code, sp):
                """The popped leaf's 16 x 8 triangle scalars (+ parallel
                uv/texid scalars when textured), as two 128-long lists.
                Resident + no smem_leaf: direct VMEM row read + lane
                extracts. With the ring (stream_tris and/or smem_leaf):
                a 2-slot DMA ring — HBM or VMEM source, VMEM (stream) or
                SMEM (smem_leaf) destination; under smem_leaf the
                scalars come from SMEM scalar loads, which are FREE on
                v5e (dual-issue with the consuming scalar math,
                PROBE_LEAF_SMEM_r04.json), vs ~191 ns for the row load +
                extract chain. The row was usually prefetched by the
                PREVIOUS leaf pop (issued before its 8 intersection
                tests, which hide the DMA), and this pop starts the
                ring's next prefetch when the stack top is another
                leaf — guaranteed to be the next pop, since leaf pops
                push nothing (70-78% of leaf pops on the 500k wave,
                sim_packets.py w1024_leaf_leaf_adj_frac; the round-2
                blocking fetch measured 35% of the streamed step,
                benchmarks/probe_stream_overlap.py). pf_ref holds
                (prefetched stack code | 0, its slot); an outstanding
                prefetch is always consumed by the very next pop, so no
                drain is needed at loop exit."""
                lrow = jnp.maximum(-code - 1, 0)
                if not use_ring:
                    trow = tris_ref[pl.ds(lrow, 1), :]
                    tsc = [trow[0, cc] for cc in range(128)]
                    asc = None
                    if use_tex:
                        arow = aux_ref[pl.ds(lrow, 1), :]
                        asc = [arow[0, cc] for cc in range(128)]
                    return tsc, asc
                have = pf_ref[0] == code
                cur = jnp.where(have, pf_ref[1], 1 - pf_ref[1])

                @pl.when(jnp.logical_not(have))
                def _():
                    _leaf_dma(lrow, cur)

                top = stack_ref[jnp.maximum(sp - 1, 0)]
                can_pf = (sp > 0) & (top < 0)
                if two_level:
                    # a negative stack entry may be an INSTANCE record
                    # (-top-1 >= _IB), whose decode is NOT a tri row —
                    # prefetching it would DMA out of tris bounds (device
                    # abort) and never be consumed (inst_fn pops bypass
                    # load_leaf_rows, leaking the ring semaphore)
                    can_pf = can_pf & (-top - 1 < _IB)

                @pl.when(can_pf)
                def _():
                    _leaf_dma(jnp.maximum(-top - 1, 0), 1 - cur)

                pf_ref[0] = jnp.where(can_pf, top, jnp.int32(0))
                pf_ref[1] = jnp.where(can_pf, 1 - cur, cur)
                pltpu.make_async_copy(
                    tris_ref.at[pl.ds(lrow, 1), :],
                    tbuf_ref.at[pl.ds(cur, 1), :], tsem.at[cur],
                ).wait()
                if smem_leaf:
                    tsc = [tbuf_ref[cur, cc] for cc in range(128)]
                else:
                    trow = tbuf_ref[pl.ds(cur, 1), :]
                    tsc = [trow[0, cc] for cc in range(128)]
                asc = None
                if use_tex:
                    pltpu.make_async_copy(
                        aux_ref.at[pl.ds(lrow, 1), :],
                        abuf_ref.at[pl.ds(cur, 1), :], asem.at[cur],
                    ).wait()
                    if smem_leaf:
                        asc = [abuf_ref[cur, cc] for cc in range(128)]
                    else:
                        arow = abuf_ref[pl.ds(cur, 1), :]
                        asc = [arow[0, cc] for cc in range(128)]
                return tsc, asc
            pid = pl.program_id(0)
            frame = scal_ref[0]
            row0 = scal_ref[1]
            if use_ring:
                # DMA ring starts empty (pf code 0 never matches a leaf)
                pf_ref[0] = jnp.int32(0)
                pf_ref[1] = jnp.int32(0)
            if defer_env:
                ez = jnp.zeros((spp * r, lanes), jnp.float32)
                for _eref in (edx_ref, edy_ref, edz_ref,
                              ewr_ref, ewg_ref, ewb_ref):
                    _eref[...] = ez
                if defer_env_nee:
                    nz = jnp.zeros((spp * max_depth * r, lanes), jnp.float32)
                    for _nref in (ndx_ref, ndy_ref, ndz_ref,
                                  nwr_ref, nwg_ref, nwb_ref):
                        _nref[...] = nz

            # hoisted light scalars: [v0(3) v1(3) v2(3) n(3) Le(3) cdf]
            # (unrolled small-table path only; the MXU path loads the
            # whole (16, Lp) operand at select time)
            lights = []
            if use_nee and not mxu_lights:
                for i in range(num_lights):
                    lights.append(tuple(light_ref[k, i] for k in range(16)))

            row_ids = jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 0)
            lane_ids = jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 1)
            idx = (pid * r + row_ids) * lanes + lane_ids      # lane = pixel
            # pixel-tile swizzle (same mapping as the wavefront payload
            # path): consecutive lanes cover a compact ts x ts screen tile
            # so primary packets are tight; gated on exact divisibility of
            # the LOCAL shard shape (rows-only sharding keeps w == gw).
            if swz:
                tpw = gw // ts
                tile = idx // (ts * ts)
                within = idx % (ts * ts)
                px_full = (tile % tpw) * ts + within % ts
                py_full = (tile // tpw) * ts + within // ts
                p_lin = jnp.minimum(idx, local_npix - 1)
                px = jnp.where(idx < local_npix, px_full, p_lin % gw)
                py = jnp.where(idx < local_npix, py_full, p_lin // gw) + row0
            else:
                p_lin = jnp.minimum(idx, local_npix - 1)
                px = p_lin % gw
                py = p_lin // gw + row0

            zero = jnp.zeros((r, lanes), jnp.float32)
            one = jnp.ones((r, lanes), jnp.float32)
            izero = jnp.zeros((r, lanes), jnp.int32)

            s0 = jnp.where(idx < local_npix, 0, spp).astype(jnp.int32)

            init = (
                s0, izero,                      # sample idx, bounce
                zero, zero, zero,               # o
                zero, zero, one,                # d
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

                # ---- packet BVH traversal (kernels/bvh_packet.py body) ----
                def safe_inv(cc):
                    return jnp.where(
                        jnp.abs(cc) > 1e-30, 1.0 / cc,
                        jnp.where(cc >= 0, _BIG, -_BIG),
                    )

                if not two_level:
                    ivx = safe_inv(dx)
                    ivy = safe_inv(dy)
                    ivz = safe_inv(dz)
                tmax_l = jnp.where(active, t_max, np.float32(-np.inf))
                if fast_node:
                    # center-ray scalars for ordered pushes (v2 recipe,
                    # kernels/bvh_packet2.py): ordering keys from ONE
                    # representative ray's scalar slab test — no
                    # cross-lane min reduction per child. Re-extracted
                    # every bounce (the regen loop changes the rays).
                    cr = r // 2
                    cox_s = ox[cr, 64]
                    coy_s = oy[cr, 64]
                    coz_s = oz[cr, 64]
                    civx = safe_inv(dx[cr, 64])
                    civy = safe_inv(dy[cr, 64])
                    civz = safe_inv(dz[cr, 64])

                stack_ref[0] = jnp.int32(1)
                if two_level:
                    istack_ref[0] = jnp.int32(world_row)  # world = identity
                    prevctx_ref[0] = jnp.int32(-2)  # impossible: force fill
                n_pay = (19 if use_tex else 16) + (1 if defer_xform else 0)
                if scratch_pay:
                    # payload planes + bu/bv in persistent VMEM scratch:
                    # zeroed per bounce (same init values as the carry
                    # version), carry shrinks to (sp, bt)
                    for j in range(n_pay + 2):
                        pay_ref[pl.ds(j * r, r), :] = zero
                    t_init = (
                        jnp.int32(1),
                        jnp.full((r, lanes), INF),   # bt
                    )
                else:
                    t_init = (
                        jnp.int32(1),
                        jnp.full((r, lanes), INF),   # bt
                        zero, zero,                  # bu, bv
                    ) + (zero,) * n_pay              # payload planes

                def t_cond(tc):
                    return tc[0] > 0

                def ctx_fill(ictx, o3, d3, needed=None):
                    """Instance-space ray cache refresh: consecutive pops
                    share their context ~98% of the time (ordered pushes
                    keep BLAS subtrees contiguous on the stack —
                    benchmarks/probe_tlas_pops.py), so the 12 scalar loads
                    + 18 FMAs + 3 inverses run only when the popped
                    context differs from the cache (VMEM scratch planes;
                    scratch persists across loop iterations, unlike a
                    while carry which would be threaded every pop).
                    needed: pops that consume no context planes (instance
                    records) pass False so they neither refill nor evict —
                    BLAS subtrees separated by an instance pop keep their
                    cache instead of thrashing through the TLAS context."""
                    prev = prevctx_ref[0]
                    want = ictx != prev
                    if needed is not None:
                        want = want & needed

                    @pl.when(want)
                    def _():
                        tf = inst_scalars(ictx, 0, 12)
                        c_ox = (tf[0] * o3[0] + tf[1] * o3[1]
                                + tf[2] * o3[2] + tf[9])
                        c_oy = (tf[3] * o3[0] + tf[4] * o3[1]
                                + tf[5] * o3[2] + tf[10])
                        c_oz = (tf[6] * o3[0] + tf[7] * o3[1]
                                + tf[8] * o3[2] + tf[11])
                        c_dx = (tf[0] * d3[0] + tf[1] * d3[1]
                                + tf[2] * d3[2])
                        c_dy = (tf[3] * d3[0] + tf[4] * d3[1]
                                + tf[5] * d3[2])
                        c_dz = (tf[6] * d3[0] + tf[7] * d3[1]
                                + tf[8] * d3[2])
                        for j, plane in enumerate((
                                c_ox, c_oy, c_oz, c_dx, c_dy, c_dz,
                                safe_inv(c_dx), safe_inv(c_dy),
                                safe_inv(c_dz))):
                            ctx_ref[pl.ds(j * r, r), :] = plane
                        prevctx_ref[0] = ictx

                def ctx_plane(j):
                    return ctx_ref[pl.ds(j * r, r), :]

                def t_body(tc):
                    sp = tc[0]
                    bt = tc[1]
                    if scratch_pay:
                        bu = bv = pay = None  # live in pay_ref scratch
                    else:
                        bu, bv = tc[2], tc[3]
                        pay = tuple(tc[4:])
                    code = stack_ref[sp - 1]
                    if two_level:
                        ictx = istack_ref[sp - 1]
                    sp = sp - 1
                    if two_level:
                        # two-level context (kernels/bvh_tlas.py body):
                        # rays in the popped entry's instance object space
                        # (directions NOT renormalized so t stays
                        # world-measure and best-t pruning works across
                        # instances), from the scratch cache
                        neg = -code - 1
                        is_inst = (code < 0) & (neg >= _IB)
                        is_leaf = (code < 0) & jnp.logical_not(is_inst)
                        ctx_fill(ictx, (ox, oy, oz), (dx, dy, dz),
                                 needed=jnp.logical_not(is_inst))
                        # context planes are loaded INSIDE node_fn/leaf_fn
                        # (each reads only the 6 it needs; instance pops
                        # read none) — lax.cond lowers to real branches,
                        # so the loads off this pop's taken path vanish
                        ray_plane = ctx_plane
                    else:
                        is_leaf = code < 0
                        _rp = (ox, oy, oz, dx, dy, dz, ivx, ivy, ivz)
                        ray_plane = _rp.__getitem__

                    def inst_fn(args):
                        """Instance leaf: push its BLAS root under its
                        context (two-level only). iid/blas_root load HERE,
                        inside the branch, so node/leaf pops stop paying
                        the per-pop instance-row SMEM load."""
                        if scratch_pay:
                            (bt,) = args
                        else:
                            bt, bu, bv, pay = args
                        iid = neg - _IB
                        blas_root = inst_scalars(iid, 24, 25)[0].astype(
                            jnp.int32)
                        stack_ref[sp] = blas_root + 1
                        istack_ref[sp] = iid
                        if scratch_pay:
                            return (sp + 1, bt)
                        return (sp + 1, bt, bu, bv) + pay

                    def node_fn(args):
                        if scratch_pay:
                            (bt,) = args
                        else:
                            bt, bu, bv, pay = args
                        l_ox, l_oy, l_oz = (ray_plane(j) for j in (0, 1, 2))
                        l_ivx, l_ivy, l_ivz = (
                            ray_plane(j) for j in (6, 7, 8))
                        node_i = jnp.maximum(code - 1, 0)
                        limit = jnp.minimum(bt, tmax_l)
                        keys = []
                        codes = []
                        pk_counts = []
                        hit_pair = None
                        if smem_boxes:
                            # nodes_ref IS the flat SMEM box table: a node
                            # pop touches no VMEM at all
                            sc = [nodes_ref[node_i * 48 + cc]
                                  for cc in range(48)]
                            ccodes = [codes_ref[node_i * 8 + ci] for ci in range(8)]
                            for _ in range(shadow_code):
                                # CSE-proof duplicate code loads (probe):
                                # equal values, so max is the identity
                                ccodes = [
                                    jnp.maximum(
                                        ccodes[ci],
                                        codes2_ref[node_i * 8 + ci])
                                    for ci in range(8)
                                ]
                        elif smem_codes:
                            nrow = nodes_ref[pl.ds(node_i, 1), :]
                            sc = [nrow[0, cc] for cc in range(48)]
                            ccodes = [codes_ref[node_i * 8 + ci] for ci in range(8)]
                            for _ in range(shadow_code):
                                # CSE-proof duplicate code loads (probe):
                                # equal values, so max is the identity
                                ccodes = [
                                    jnp.maximum(
                                        ccodes[ci],
                                        codes2_ref[node_i * 8 + ci])
                                    for ci in range(8)
                                ]
                        else:
                            nrow = nodes_ref[pl.ds(node_i, 1), :]
                            sc = [nrow[0, cc] for cc in range(64)]
                        for ci in range(8):
                            bmnx = sc[0 + ci]
                            bmny = sc[8 + ci]
                            bmnz = sc[16 + ci]
                            bmxx = sc[24 + ci]
                            bmxy = sc[32 + ci]
                            bmxz = sc[40 + ci]
                            tx0 = (bmnx - l_ox) * l_ivx
                            tx1 = (bmxx - l_ox) * l_ivx
                            ty0 = (bmny - l_oy) * l_ivy
                            ty1 = (bmxy - l_oy) * l_ivy
                            tz0 = (bmnz - l_oz) * l_ivz
                            tz1 = (bmxz - l_oz) * l_ivz
                            tnear = jnp.maximum(
                                jnp.maximum(jnp.minimum(tx0, tx1),
                                            jnp.minimum(ty0, ty1)),
                                jnp.maximum(jnp.minimum(tz0, tz1), t_min),
                            )
                            tfar = jnp.minimum(
                                jnp.minimum(jnp.maximum(tx0, tx1),
                                            jnp.maximum(ty0, ty1)),
                                jnp.minimum(jnp.maximum(tz0, tz1), limit),
                            )
                            # shadow_slab: sensitivity knob (probe only).
                            # -( (o-b) * iv ) == (b-o) * iv exactly, so
                            # the duplicate is CSE-proof and the merged
                            # min/max keeps traversal bitwise-identical
                            # while slab vector ops multiply.
                            for _ in range(shadow_slab):
                                sx0 = -((l_ox - bmnx) * l_ivx)
                                sx1 = -((l_ox - bmxx) * l_ivx)
                                sy0 = -((l_oy - bmny) * l_ivy)
                                sy1 = -((l_oy - bmxy) * l_ivy)
                                sz0 = -((l_oz - bmnz) * l_ivz)
                                sz1 = -((l_oz - bmxz) * l_ivz)
                                tnear = jnp.maximum(tnear, jnp.maximum(
                                    jnp.maximum(jnp.minimum(sx0, sx1),
                                                jnp.minimum(sy0, sy1)),
                                    jnp.maximum(jnp.minimum(sz0, sz1),
                                                t_min)))
                                tfar = jnp.minimum(tfar, jnp.minimum(
                                    jnp.minimum(jnp.maximum(sx0, sx1),
                                                jnp.maximum(sy0, sy1)),
                                    jnp.minimum(jnp.maximum(sz0, sz1),
                                                limit)))
                            hit = tnear <= tfar
                            if smem_codes:
                                code_c0 = ccodes[ci]
                            elif two_level:
                                tag = sc[56 + ci]
                                ref = sc[48 + ci].astype(jnp.int32)
                                code_c0 = jnp.where(
                                    tag > 0.5,
                                    jnp.where(
                                        tag > 2.5, -(_IB + ref + 1),
                                        jnp.where(tag > 1.5, -(ref + 1),
                                                  ref + 1)),
                                    jnp.int32(0),
                                )
                            else:
                                tag = sc[56 + ci]
                                ref = sc[48 + ci].astype(jnp.int32)
                                code_c0 = jnp.where(
                                    tag > 0.5,
                                    jnp.where(tag > 1.5, -(ref + 1),
                                              ref + 1),
                                    jnp.int32(0),
                                )
                            if fast_node:
                                # pack two children's hit counts per i32
                                # sum: 4 reductions/pop instead of 8 any()
                                # + 8 min()
                                hi32 = hit.astype(jnp.int32)
                                if ci % 2 == 0:
                                    hit_pair = hi32
                                else:
                                    pk_counts.append(
                                        jnp.sum(hit_pair + hi32 * 65536)
                                    )
                                ctx0 = (bmnx - cox_s) * civx
                                ctx1 = (bmxx - cox_s) * civx
                                cty0 = (bmny - coy_s) * civy
                                cty1 = (bmxy - coy_s) * civy
                                ctz0 = (bmnz - coz_s) * civz
                                ctz1 = (bmxz - coz_s) * civz
                                ckey = jnp.maximum(
                                    jnp.maximum(jnp.minimum(ctx0, ctx1),
                                                jnp.minimum(cty0, cty1)),
                                    jnp.maximum(jnp.minimum(ctz0, ctz1),
                                                t_min),
                                )
                                keys.append(ckey)
                                codes.append(code_c0)
                            else:
                                key = jnp.min(
                                    jnp.where(hit, tnear,
                                              jnp.float32(np.inf))
                                )
                                # any-lane-hit derived from the key (hit
                                # lanes give finite tnear: slopes capped
                                # at 1e30 by safe_inv, tfar <= limit) —
                                # saves a second full cross-lane
                                # reduction per child, bitwise-identical
                                push = (code_c0 != 0) & (key < INF)
                                keys.append(
                                    jnp.where(push, key,
                                              jnp.float32(-np.inf))
                                )
                                codes.append(
                                    jnp.where(push, code_c0, jnp.int32(0))
                                )
                        if fast_node:
                            # decode packed counts -> push flags
                            for ci in range(8):
                                cnt = pk_counts[ci // 2]
                                c_ci = ((cnt & 0xFFFF) if ci % 2 == 0
                                        else (cnt >> 16))
                                push = (codes[ci] != 0) & (c_ci > 0)
                                codes[ci] = jnp.where(push, codes[ci],
                                                      jnp.int32(0))
                                keys[ci] = jnp.where(
                                    push, keys[ci], jnp.float32(-np.inf))
                        net = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3),
                               (4, 6), (5, 7), (1, 2), (5, 6), (0, 4), (3, 7),
                               (1, 5), (2, 6), (1, 4), (3, 6), (2, 4), (3, 5),
                               (3, 4)]
                        for a, b in net:
                            swap = keys[a] < keys[b]
                            ka = jnp.where(swap, keys[b], keys[a])
                            kb = jnp.where(swap, keys[a], keys[b])
                            ca = jnp.where(swap, codes[b], codes[a])
                            cb = jnp.where(swap, codes[a], codes[b])
                            keys[a], keys[b] = ka, kb
                            codes[a], codes[b] = ca, cb
                        # shadow_sort: sensitivity probe knob
                        # (benchmarks/probe_sort_shadow.py). Each extra
                        # pass re-sorts the already-descending lists —
                        # every comparator's strict `<` is False, so the
                        # pass is the identity and the traversal stays
                        # bitwise-identical while the network's scalar op
                        # count multiplies by (1 + shadow_sort).
                        for _ in range(shadow_sort):
                            for a, b in net:
                                swap = keys[a] < keys[b]
                                ka = jnp.where(swap, keys[b], keys[a])
                                kb = jnp.where(swap, keys[a], keys[b])
                                ca = jnp.where(swap, codes[b], codes[a])
                                cb = jnp.where(swap, codes[a], codes[b])
                                keys[a], keys[b] = ka, kb
                                codes[a], codes[b] = ca, cb
                        # pushes are a PREFIX of the descending-sorted
                        # list (non-push keys are exactly -inf — real
                        # keys are >= t_min — so they sort last): the 8
                        # conditional pushes + the 8-deep serial sp add
                        # chain become 8 UNCONDITIONAL independent SMEM
                        # writes at sp+ci plus one popcount. Dead writes
                        # above the new top are never read (pops read
                        # below sp; stack_n carries +8 headroom).
                        # Bitwise-identical: live stack contents and pop
                        # order are unchanged.
                        if push_pf:
                            # push-time ring prefetch: the new stack top
                            # is the LAST real entry of the descending
                            # sort (non-push codes are 0 and sort last,
                            # so the last non-zero code is it; cnt==0
                            # leaves tc==0 which fails tc<0). Issued
                            # BEFORE the stack writes so the DMA also
                            # hides them.
                            tc = codes[0]
                            for ci in range(1, 8):
                                tc = jnp.where(codes[ci] != 0,
                                               codes[ci], tc)
                            pf_ok = tc < 0
                            if two_level:
                                # instance records are not tri rows
                                pf_ok = pf_ok & (-tc - 1 < _IB)
                            s_new = 1 - pf_ref[1]

                            @pl.when(pf_ok)
                            def _():
                                _leaf_dma(jnp.maximum(-tc - 1, 0), s_new)

                            pf_ref[0] = jnp.where(pf_ok, tc, jnp.int32(0))
                            pf_ref[1] = jnp.where(pf_ok, s_new, pf_ref[1])
                        cnt = jnp.int32(0)
                        for ci in range(8):
                            stack_ref[sp + ci] = codes[ci]
                            if two_level:
                                istack_ref[sp + ci] = ictx
                            cnt = cnt + (codes[ci] != 0).astype(jnp.int32)
                        # shadow_push: sensitivity knob (probe only) —
                        # repeat the 8 stack writes + the popcount chain
                        # into a dead SHADOW region of the (enlarged)
                        # stack scratch (never popped; a same-address
                        # duplicate would invite dead-store elimination)
                        for sh in range(shadow_push):
                            off = (stack_n + 8) * (sh + 1)
                            cnt2 = jnp.int32(0)
                            for ci in range(8):
                                stack_ref[off + sp + ci] = codes[ci]
                                if two_level:
                                    istack_ref[off + sp + ci] = ictx
                                cnt2 = cnt2 + (
                                    codes[ci] != 0).astype(jnp.int32)
                            # keep the duplicate count chain live
                            stack_ref[off] = cnt2
                        if scratch_pay:
                            return (sp + cnt, bt)
                        return (sp + cnt, bt, bu, bv) + pay

                    def leaf_fn(args):
                        if scratch_pay:
                            (bt,) = args
                            bu = pay_ref[pl.ds(n_pay * r, r), :]
                            bv = pay_ref[pl.ds((n_pay + 1) * r, r), :]
                            pay = [pay_ref[pl.ds(j * r, r), :]
                                   for j in range(n_pay)]
                        else:
                            bt, bu, bv, pay = args
                            pay = list(pay)
                        l_ox, l_oy, l_oz = (ray_plane(j) for j in (0, 1, 2))
                        l_dx, l_dy, l_dz = (ray_plane(j) for j in (3, 4, 5))
                        tsc, asc = load_leaf_rows(code, sp)
                        if use_tex:
                            if two_level:
                                # instance base into the flattened merged
                                # texture pool (bvh_tlas.py leaf_fn; the
                                # identity world row's base is 0)
                                texb = inst_scalars(ictx, 25, 26)[0]
                        if two_level and not defer_xform:
                            # forward transform of the CURRENT instance
                            # (the identity world row reproduces object ==
                            # world) so payload vertices land in WORLD
                            # space and shading stays space-agnostic
                            fw = inst_scalars(ictx, 12, 24)
                        for k in range(8):
                            base = 16 * k
                            t0x = tsc[base + 0]
                            t0y = tsc[base + 1]
                            t0z = tsc[base + 2]
                            t1x = tsc[base + 3]
                            t1y = tsc[base + 4]
                            t1z = tsc[base + 5]
                            t2x = tsc[base + 6]
                            t2y = tsc[base + 7]
                            t2z = tsc[base + 8]
                            e1x, e1y, e1z = t1x - t0x, t1y - t0y, t1z - t0z
                            e2x, e2y, e2z = t2x - t0x, t2y - t0y, t2z - t0z
                            pvx = l_dy * e2z - l_dz * e2y
                            pvy = l_dz * e2x - l_dx * e2z
                            pvz = l_dx * e2y - l_dy * e2x
                            det = e1x * pvx + e1y * pvy + e1z * pvz
                            inv_det = jnp.where(
                                jnp.abs(det) > 1e-12, 1.0 / det, 0.0
                            )
                            tvx = l_ox - t0x
                            tvy = l_oy - t0y
                            tvz = l_oz - t0z
                            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                            qvx = tvy * e1z - tvz * e1y
                            qvy = tvz * e1x - tvx * e1z
                            qvz = tvx * e1y - tvy * e1x
                            v = (l_dx * qvx + l_dy * qvy
                                 + l_dz * qvz) * inv_det
                            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                            # shadow_mt: sensitivity knob (probe only);
                            # same CSE-proof sign trick as shadow_slab —
                            # bitwise-identical, MT vector ops multiply
                            for _ in range(shadow_mt):
                                pvx_s = -(l_dz * e2y - l_dy * e2z)
                                pvy_s = -(l_dx * e2z - l_dz * e2x)
                                pvz_s = -(l_dy * e2x - l_dx * e2y)
                                det_s = (e1x * pvx_s + e1y * pvy_s
                                         + e1z * pvz_s)
                                inv_det_s = jnp.where(
                                    jnp.abs(det_s) > 1e-12,
                                    1.0 / det_s, 0.0)
                                u = jnp.maximum(u, (
                                    tvx * pvx_s + tvy * pvy_s
                                    + tvz * pvz_s) * inv_det_s)
                                qvx_s = -(tvz * e1y - tvy * e1z)
                                qvy_s = -(tvx * e1z - tvz * e1x)
                                qvz_s = -(tvy * e1x - tvx * e1y)
                                v = jnp.maximum(v, (
                                    l_dx * qvx_s + l_dy * qvy_s
                                    + l_dz * qvz_s) * inv_det_s)
                                t = jnp.maximum(t, (
                                    e2x * qvx_s + e2y * qvy_s
                                    + e2z * qvz_s) * inv_det_s)
                            ok = (
                                (jnp.abs(det) > 1e-12)
                                & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                                & (t > t_min) & (t < tmax_l) & (t < bt)
                            )
                            bt = jnp.where(ok, t, bt)
                            bu = jnp.where(ok, u, bu)
                            bv = jnp.where(ok, v, bv)
                            if two_level and not defer_xform:
                                wv = []
                                for vx, vy, vz in (
                                        (t0x, t0y, t0z), (t1x, t1y, t1z),
                                        (t2x, t2y, t2z)):
                                    wv.extend((
                                        fw[0] * vx + fw[1] * vy
                                        + fw[2] * vz + fw[9],
                                        fw[3] * vx + fw[4] * vy
                                        + fw[5] * vz + fw[10],
                                        fw[6] * vx + fw[7] * vy
                                        + fw[8] * vz + fw[11],
                                    ))
                                vert_vals = tuple(wv)
                            else:
                                # defer_xform: OBJECT-space vertices ride
                                # the payload; the winning slot's world
                                # transform runs once post-loop
                                vert_vals = (t0x, t0y, t0z, t1x, t1y, t1z,
                                             t2x, t2y, t2z)
                            vals = vert_vals + (
                                tsc[base + 9], tsc[base + 10],
                                tsc[base + 11], tsc[base + 12],
                                tsc[base + 13], tsc[base + 14],
                                tsc[base + 15],
                            )
                            if use_tex:
                                # interpolate per-corner vt with the
                                # slot's own barycentrics (same as
                                # bvh_packet.py / wavefront shade_inputs)
                                wb_s = 1.0 - u - v
                                tu = (asc[base + 0] * wb_s
                                      + asc[base + 2] * u
                                      + asc[base + 4] * v)
                                tw = (asc[base + 1] * wb_s
                                      + asc[base + 3] * u
                                      + asc[base + 5] * v)
                                a6 = asc[base + 6]
                                if two_level:
                                    # texid+1 shifted by the instance's
                                    # texture base (0 stays untextured)
                                    a6 = jnp.where(a6 > 0, a6 + texb,
                                                   jnp.float32(0.0))
                                vals = vals + (tu, tw, a6)
                            if defer_xform:
                                vals = vals + (
                                    ictx.astype(jnp.float32),)
                            pay = [
                                jnp.where(ok, sv + zero, pv)
                                for sv, pv in zip(vals, pay)
                            ]
                        if scratch_pay:
                            for j in range(n_pay):
                                pay_ref[pl.ds(j * r, r), :] = pay[j]
                            pay_ref[pl.ds(n_pay * r, r), :] = bu
                            pay_ref[pl.ds((n_pay + 1) * r, r), :] = bv
                            return (sp, bt)
                        return (sp, bt, bu, bv) + tuple(pay)

                    br_args = (bt,) if scratch_pay else (bt, bu, bv, pay)
                    if two_level:
                        def not_inst(args):
                            return jax.lax.cond(is_leaf, leaf_fn, node_fn,
                                                args)

                        return jax.lax.cond(is_inst, inst_fn, not_inst,
                                            br_args)
                    return jax.lax.cond(is_leaf, leaf_fn, node_fn,
                                        br_args)

                if shadow_iters:
                    # sensitivity knob (probe only): multiply the
                    # traversal while_loop's ITERATION count by
                    # (1 + shadow_iters) with no-op filler iterations —
                    # prices the loop's fixed per-iteration overhead
                    # (cond eval, carry threading, branch setup).
                    # Bitwise-identical: filler iterations return the
                    # carry untouched.
                    def t_cond_sh(tc):
                        return t_cond(tc[:-1])

                    def t_body_sh(tc):
                        dm = tc[-1]

                        def _filler(args):
                            return args[:-1] + (args[-1] - 1,)

                        def _real(args):
                            return t_body(args[:-1]) + (
                                jnp.int32(shadow_iters),)

                        return jax.lax.cond(dm == 0, _real, _filler, tc)

                    t_final = jax.lax.while_loop(
                        t_cond_sh, t_body_sh,
                        t_init + (jnp.int32(0),))[:-1]
                elif pop_unroll > 1:
                    # process up to pop_unroll stack pops per while_loop
                    # iteration: amortizes the loop's fixed per-iteration
                    # bookkeeping (18.7% of the GI step,
                    # PROBE_POP_BUDGET_r05) over several pops.
                    # Bitwise-identical: extra pops run iff sp > 0,
                    # exactly as their own iterations would.
                    def t_body_u(tc):
                        out = t_body(tc)
                        for _ in range(pop_unroll - 1):
                            out = jax.lax.cond(
                                out[0] > 0, t_body, lambda a: a, out)
                        return out

                    t_final = jax.lax.while_loop(t_cond, t_body_u, t_init)
                else:
                    t_final = jax.lax.while_loop(t_cond, t_body, t_init)
                bt = t_final[1]
                if scratch_pay:
                    bu = pay_ref[pl.ds(n_pay * r, r), :]
                    bv = pay_ref[pl.ds((n_pay + 1) * r, r), :]
                    pay = tuple(pay_ref[pl.ds(j * r, r), :]
                                for j in range(n_pay))
                else:
                    bu, bv = t_final[2], t_final[3]
                    pay = t_final[4:]
                b0 = (pay[0], pay[1], pay[2])
                b1 = (pay[3], pay[4], pay[5])
                b2 = (pay[6], pay[7], pay[8])
                if defer_xform:
                    # world transform of the winning OBJECT-space
                    # vertices, once per bounce: the per-lane 12
                    # coefficients are exact one-hot MXU copies of the
                    # same instance rows the in-loop transform read, and
                    # the FMA order matches — bitwise-identical verts
                    from .imgfetch import inst_xform_select_rows

                    fwp = inst_xform_select_rows(fwt_ref[...], pay[-1])

                    def _fw_point(v3):
                        vx, vy, vz = v3
                        return (
                            fwp[0] * vx + fwp[1] * vy + fwp[2] * vz
                            + fwp[9],
                            fwp[3] * vx + fwp[4] * vy + fwp[5] * vz
                            + fwp[10],
                            fwp[6] * vx + fwp[7] * vy + fwp[8] * vz
                            + fwp[11],
                        )

                    b0 = _fw_point(b0)
                    b1 = _fw_point(b1)
                    b2 = _fw_point(b2)
                albedo = (pay[9], pay[10], pay[11])
                ke = (pay[12], pay[13], pay[14])
                mt = pay[15]

                # ---- shade (ref closesthit.rchit:50-65 / miss.rmiss) ----
                miss = jnp.isinf(bt)
                bw = 1.0 - bu - bv
                position = (
                    b0[0] * bw + b1[0] * bu + b2[0] * bv,
                    b0[1] * bw + b1[1] * bu + b2[1] * bv,
                    b0[2] * bw + b1[2] * bu + b2[2] * bv,
                )
                nrm = vec.cross(vec.sub(b1, b0), vec.sub(b2, b0))
                inv_len = jax.lax.rsqrt(jnp.maximum(vec.dot(nrm, nrm), 1e-30))
                normal = vec.scale(nrm, -inv_len)
                diffuse = albedo
                if use_tex:
                    from .imgfetch import atlas_fetch_rows

                    texc = atlas_fetch_rows(
                        atlas_ref[...], pay[16], pay[17], pay[18],
                        tex_offs, tex_ws, tex_hs, atlas_htot, atlas_wmax,
                    )
                    diffuse = vec.mul(diffuse, texc)
                if env_in_kernel:
                    from .imgfetch import env_fetch_rows

                    sky3 = env_fetch_rows(
                        env_ref[...], (dx, dy, dz), env_h, env_w)
                elif defer_env:
                    # miss radiance is added OUTSIDE the kernel from the
                    # recorded (dir, weight); in-kernel contribution 0
                    sky3 = (zero, zero, zero)
                else:
                    sky3 = (sky[0] + zero, sky[1] + zero, sky[2] + zero)
                emission = vec.where(miss, sky3, ke)
                if has_mirrors:
                    # packed material lane: 1.0 = mirror, 2.0+rough =
                    # glossy, 3.0+encoded-IOR = dielectric
                    is_mirror = (
                        (mt > 0.5) & (mt < 1.5) & jnp.logical_not(miss)
                    )
                else:
                    is_mirror = jnp.zeros((r, lanes), bool)
                # class boundaries in the packed lane: glossy occupies
                # [2.0, 2.96] (rough clipped to 0.96, accel/wide.py) and
                # dielectric [3.0, 3.96] (encoded IOR) — split at 2.98,
                # NOT 2.5 (a rough>0.5 glossy face is still glossy)
                if has_diel:
                    is_diel = (mt > 2.98) & jnp.logical_not(miss)
                    is_spec = is_mirror | is_diel
                else:
                    is_diel = jnp.zeros((r, lanes), bool)
                    is_spec = is_mirror

                if has_glossy:
                    # GGX shading frame (same math as the wavefront
                    # integrator: view-oriented normal, branch-exact
                    # tangent basis); used by both NEE eval and the
                    # VNDF bounce below
                    is_glossy = (
                        (mt > 1.5) & (mt < 2.98) & jnp.logical_not(miss)
                    )
                    rough_g = jnp.where(is_glossy, mt - 2.0, 0.0)
                    alpha_g = jnp.maximum(rough_g * rough_g, 1e-4)
                    d3v = (dx, dy, dz)
                    n_g = vec.where(
                        vec.dot(d3v, normal) > 0,
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
                    wo = vec.scale(d3v, -1.0)
                    woz = jnp.maximum(vec.dot(wo, n_g), 1e-6)
                    wo_l = (vec.dot(wo, tng), vec.dot(wo, btg), woz)

                    def ggx_f_k(coh):
                        m1 = 1.0 - coh
                        f5 = m1 * m1
                        f5 = f5 * f5 * m1
                        return tuple(
                            s_ + (1.0 - s_) * f5 for s_ in albedo
                        )

                    lam_o = ggx_lambda(woz, alpha_g)

                def shadow_occluded(so3, wl3, smax, shadow_q):
                    """Any-hit shadow packet traversal (the in-kernel
                    analog of kernels/bvh_packet.make_packet_occlusion),
                    shared by area-light and env NEE; the SMEM stack is
                    empty again after the main pass."""
                    sox, soy, soz = so3
                    wlx, wly, wlz = wl3
                    if not two_level:
                        sivx = safe_inv(wlx)
                        sivy = safe_inv(wly)
                        sivz = safe_inv(wlz)
                    stack_ref[0] = jnp.int32(1)
                    if two_level:
                        istack_ref[0] = jnp.int32(world_row)
                        # the scratch cache holds the MAIN rays: invalidate
                        prevctx_ref[0] = jnp.int32(-2)
                    s_init = (jnp.int32(1), jnp.zeros((r, lanes), jnp.float32))

                    def s_cond(sc_):
                        return sc_[0] > 0

                    def s_body(sc_):
                        sp, occ = sc_
                        code = stack_ref[sp - 1]
                        if two_level:
                            ictx = istack_ref[sp - 1]
                        sp = sp - 1
                        if two_level:
                            # instance-space shadow-ray re-derivation
                            # (kernels/bvh_tlas.py occlusion body), cached
                            # in the same scratch planes as the main loop
                            neg = -code - 1
                            is_inst = (code < 0) & (neg >= _IB)
                            is_leaf = (code < 0) & jnp.logical_not(is_inst)
                            ctx_fill(ictx, so3, wl3,
                                     needed=jnp.logical_not(is_inst))
                            s_ray_plane = ctx_plane
                        else:
                            is_leaf = code < 0
                            _srp = (sox, soy, soz, wlx, wly, wlz,
                                    sivx, sivy, sivz)
                            s_ray_plane = _srp.__getitem__
                        slimit = jnp.where(
                            shadow_q & (occ < 0.5), smax,
                            jnp.float32(-np.inf),
                        )

                        def inst_fn(occ):
                            s_iid = neg - _IB
                            s_blas_root = inst_scalars(
                                s_iid, 24, 25)[0].astype(jnp.int32)
                            stack_ref[sp] = s_blas_root + 1
                            istack_ref[sp] = s_iid
                            return (sp + 1, occ)

                        def node_fn(occ):
                            sl_ox, sl_oy, sl_oz = (
                                s_ray_plane(j) for j in (0, 1, 2))
                            sl_ivx, sl_ivy, sl_ivz = (
                                s_ray_plane(j) for j in (6, 7, 8))
                            node_i = jnp.maximum(code - 1, 0)
                            spn = sp
                            s_counts = []
                            s_code_list = []
                            s_pair = None
                            s_codes = None
                            if smem_boxes:
                                nsc = [nodes_ref[node_i * 48 + cc]
                                       for cc in range(48)]
                                nccodes = [
                                    codes_ref[node_i * 8 + ci]
                                    for ci in range(8)
                                ]
                            elif smem_codes:
                                nrow = nodes_ref[pl.ds(node_i, 1), :]
                                nsc = [nrow[0, cc] for cc in range(48)]
                                nccodes = [
                                    codes_ref[node_i * 8 + ci]
                                    for ci in range(8)
                                ]
                            else:
                                nrow = nodes_ref[pl.ds(node_i, 1), :]
                                nsc = [nrow[0, cc] for cc in range(64)]
                            for ci in range(8):
                                tx0 = (nsc[0 + ci] - sl_ox) * sl_ivx
                                tx1 = (nsc[24 + ci] - sl_ox) * sl_ivx
                                ty0 = (nsc[8 + ci] - sl_oy) * sl_ivy
                                ty1 = (nsc[32 + ci] - sl_oy) * sl_ivy
                                tz0 = (nsc[16 + ci] - sl_oz) * sl_ivz
                                tz1 = (nsc[40 + ci] - sl_oz) * sl_ivz
                                tnear = jnp.maximum(
                                    jnp.maximum(jnp.minimum(tx0, tx1),
                                                jnp.minimum(ty0, ty1)),
                                    jnp.maximum(jnp.minimum(tz0, tz1),
                                                t_min),
                                )
                                tfar = jnp.minimum(
                                    jnp.minimum(jnp.maximum(tx0, tx1),
                                                jnp.maximum(ty0, ty1)),
                                    jnp.minimum(jnp.maximum(tz0, tz1),
                                                slimit),
                                )
                                if smem_codes:
                                    code_c = nccodes[ci]
                                elif two_level:
                                    tag = nsc[56 + ci]
                                    ref = nsc[48 + ci].astype(jnp.int32)
                                    code_c = jnp.where(
                                        tag > 0.5,
                                        jnp.where(
                                            tag > 2.5, -(_IB + ref + 1),
                                            jnp.where(tag > 1.5,
                                                      -(ref + 1), ref + 1)),
                                        jnp.int32(0),
                                    )
                                else:
                                    tag = nsc[56 + ci]
                                    ref = nsc[48 + ci].astype(jnp.int32)
                                    code_c = jnp.where(
                                        tag > 0.5,
                                        jnp.where(tag > 1.5, -(ref + 1),
                                                  ref + 1),
                                        jnp.int32(0),
                                    )
                                if fast_node:
                                    # packed-pair hit counts (4 reductions
                                    # per pop; any-hit needs no ordering)
                                    shi = (tnear <= tfar).astype(jnp.int32)
                                    if ci % 2 == 0:
                                        s_pair = shi
                                        s_codes = code_c
                                    else:
                                        s_counts.append(
                                            jnp.sum(s_pair + shi * 65536))
                                        s_code_list.append(
                                            (s_codes, code_c))
                                    continue
                                push = (code_c != 0) & jnp.any(
                                    tnear <= tfar)
                                # unconditional write: dead unless pushed
                                # (overwritten by the next push or left
                                # above the final top, never read)
                                stack_ref[spn] = code_c
                                if two_level:
                                    istack_ref[spn] = ictx
                                spn = spn + push.astype(jnp.int32)
                                if push_pf:
                                    # any-hit pushes are unsorted: the
                                    # new top is the LAST pushed child
                                    s_tc = (jnp.where(push, code_c, s_tc)
                                            if ci else
                                            jnp.where(push, code_c,
                                                      jnp.int32(0)))
                            if fast_node:
                                for ci in range(8):
                                    cnt = s_counts[ci // 2]
                                    c_ci = ((cnt & 0xFFFF) if ci % 2 == 0
                                            else (cnt >> 16))
                                    code_c = s_code_list[ci // 2][ci % 2]
                                    push = (code_c != 0) & (c_ci > 0)
                                    stack_ref[spn] = code_c
                                    spn = spn + push.astype(jnp.int32)
                                    if push_pf:
                                        s_tc = (jnp.where(push, code_c,
                                                          s_tc)
                                                if ci else
                                                jnp.where(push, code_c,
                                                          jnp.int32(0)))
                            if push_pf:
                                # push-time ring prefetch (same contract
                                # as the ordered-push side)
                                s_ok = s_tc < 0
                                if two_level:
                                    s_ok = s_ok & (-s_tc - 1 < _IB)
                                s_sl = 1 - pf_ref[1]

                                @pl.when(s_ok)
                                def _():
                                    _leaf_dma(
                                        jnp.maximum(-s_tc - 1, 0), s_sl)

                                pf_ref[0] = jnp.where(s_ok, s_tc,
                                                      jnp.int32(0))
                                pf_ref[1] = jnp.where(s_ok, s_sl,
                                                      pf_ref[1])
                            return (spn, occ)

                        def leaf_fn(occ):
                            sl_ox, sl_oy, sl_oz = (
                                s_ray_plane(j) for j in (0, 1, 2))
                            sl_dx, sl_dy, sl_dz = (
                                s_ray_plane(j) for j in (3, 4, 5))
                            tsc, _ = load_leaf_rows(code, sp)
                            for k in range(8):
                                base = 16 * k
                                t0x = tsc[base + 0]
                                t0y = tsc[base + 1]
                                t0z = tsc[base + 2]
                                e1x = tsc[base + 3] - t0x
                                e1y = tsc[base + 4] - t0y
                                e1z = tsc[base + 5] - t0z
                                e2x = tsc[base + 6] - t0x
                                e2y = tsc[base + 7] - t0y
                                e2z = tsc[base + 8] - t0z
                                pvx = sl_dy * e2z - sl_dz * e2y
                                pvy = sl_dz * e2x - sl_dx * e2z
                                pvz = sl_dx * e2y - sl_dy * e2x
                                det = e1x * pvx + e1y * pvy + e1z * pvz
                                inv_det = jnp.where(
                                    jnp.abs(det) > 1e-12, 1.0 / det, 0.0
                                )
                                tvx = sl_ox - t0x
                                tvy = sl_oy - t0y
                                tvz = sl_oz - t0z
                                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                                qvx = tvy * e1z - tvz * e1y
                                qvy = tvz * e1x - tvx * e1z
                                qvz = tvx * e1y - tvy * e1x
                                v = (sl_dx * qvx + sl_dy * qvy
                                     + sl_dz * qvz) * inv_det
                                t_ = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                                slimit_k = jnp.where(
                                    shadow_q & (occ < 0.5), smax,
                                    jnp.float32(-np.inf),
                                )
                                hit_k = (
                                    (jnp.abs(det) > 1e-12)
                                    & (u >= 0.0) & (v >= 0.0)
                                    & (u + v <= 1.0)
                                    & (t_ > t_min) & (t_ < slimit_k)
                                )
                                occ = jnp.maximum(
                                    occ, hit_k.astype(jnp.float32)
                                )
                            return (sp, occ)

                        if two_level:
                            def not_inst(occ):
                                return jax.lax.cond(is_leaf, leaf_fn,
                                                    node_fn, occ)

                            return jax.lax.cond(is_inst, inst_fn, not_inst,
                                                occ)
                        return jax.lax.cond(is_leaf, leaf_fn, node_fn, occ)

                    if pop_unroll > 1:
                        # same unroll as the main traversal loop: up to
                        # pop_unroll pops per iteration, bitwise-identical
                        def s_body_u(sc_):
                            out = s_body(sc_)
                            for _ in range(pop_unroll - 1):
                                out = jax.lax.cond(
                                    out[0] > 0, s_body, lambda a: a, out)
                            return out

                        s_final = jax.lax.while_loop(
                            s_cond, s_body_u, s_init)
                    else:
                        s_final = jax.lax.while_loop(
                            s_cond, s_body, s_init)
                    if two_level:
                        # next traversal (shadow or bounce) uses new rays
                        prevctx_ref[0] = jnp.int32(-2)
                    return s_final[1]

                # NEE gating (non-MIS): BSDF-path emission only on camera
                # rays, post-specular bounces, and sky misses. Under MIS,
                # everywhere else with the balance-heuristic weight
                # p_bsdf / (p_bsdf + p_nee) — same math as the wavefront
                # integrator.
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
                    # a miss ends its sample, so each (pixel, sample) pair
                    # records at most once: row block si*r..si*r+r of each
                    # plane holds sample si's (miss dir, weight). The
                    # recorded weight carries emit_w: under NEE,
                    # non-camera sky misses are gated (or MIS-weighted)
                    # exactly like resident-map miss shading — without
                    # NEE emit_w is 1.0 on every recorded lane, so this
                    # is bitwise the old record
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
                        fld = [f + zero for f in lights[0][:15]]
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
                        g2_l = 1.0 / (1.0 + lam_o + ggx_lambda(cos_i_g, alpha_g))
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
                    occ_f = shadow_occluded(
                        position, (wlx, wly, wlz), smax, shadow_q)
                    g_pdf = cos_s * cos_l / dist2 * np.float32(total_area)
                    if use_mis:
                        # balance heuristic in solid-angle measure
                        p_nee_sa = dist2 / (
                            np.float32(total_area)
                            * jnp.maximum(cos_l, np.float32(1e-6))
                        )
                        if uniform:
                            p_bsdf_l = jnp.full_like(
                                cos_s, 1.0 / TWO_PI)
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
                    vis = shadow_q & (occ_f < 0.5)
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
                    # direction, any-hit shadow packet to t_max, radiance
                    # via the same separable fetch as miss shading
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
                    smax_env = t_max * np.float32(1.0 - 1e-3)
                    occ_f = shadow_occluded(
                        position, (wlx, wly, wlz), smax_env, shadow_q)
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
                    vis = shadow_q & (occ_f < 0.5)
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
                        # OVERSIZED map: the contribution is LINEAR in the
                        # fetched radiance, so record (dir, w*vis*brdf*
                        # cos*mis/pdf) into slab s*max_depth+bounce of the
                        # per-bounce record planes; the step gathers
                        # L(dir) once, post-kernel. The slab index is
                        # per-lane (regeneration de-syncs samples), so
                        # writes sweep only the dynamic [rc_min, rc_max]
                        # slab range actually present in the block —
                        # dynamic SUBLANE starts are Mosaic-legal.
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

                # ---- next direction (ref raygen.rgen:77-80) ----
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
                    n_dot_d = dx * normal[0] + dy * normal[1] + dz * normal[2]
                    n_f = vec.where(n_dot_d > 0, vec.scale(normal, -1.0),
                                    normal)
                    d3 = (dx, dy, dz)
                    refl = vec.sub(d3, vec.scale(n_f, 2.0 * vec.dot(d3, n_f)))
                    new_dir = vec.where(is_mirror, refl, new_dir)
                    # the wide layout stores Ks in the albedo lanes for
                    # mirrors (accel/wide.py), so the tint is just albedo
                    scale3 = vec.where(is_mirror, albedo, scale3)

                if has_diel:
                    # smooth dielectric (mtype 3): shared Snell + exact
                    # Fresnel helper (pure elementwise jnp/vec ops,
                    # Mosaic-safe — no gathers). The packed lane fraction
                    # is the encoded IOR (Ni-1)/4; the reflect/refract
                    # choice reuses the r1 draw exactly like the
                    # wavefront integrator.
                    ior = 1.0 + 4.0 * jnp.where(is_diel, mt - 3.0, 0.0)
                    refl_dd, refr_dd, fres, tir = (
                        dielectric_reflect_refract_soa(
                            (dx, dy, dz), normal, ior)
                    )
                    choose_refl = tir | (r1 < fres)
                    diel_dir = vec.where(choose_refl, refl_dd, refr_dd)
                    new_dir = vec.where(is_diel, diel_dir, new_dir)
                    # Ks tint lives in the albedo lanes (accel/wide.py)
                    scale3 = vec.where(is_diel, albedo, scale3)

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
        rr = max(8, min(r, rows_total))
        rows_padded = -(-rows_total // rr) * rr
        grid = rows_padded // rr
        swz = bool(ts) and w % ts == 0 and h % ts == 0
        kernel = build_kernel(npix, rr, swz)

        scal = jnp.stack([
            jnp.asarray(state.frame, jnp.int32),
            jnp.asarray(row0, jnp.int32),
        ])
        blk = pl.BlockSpec((rr, lanes), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                memory_space=pltpu.SMEM if smem_boxes else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if stream_tris else pltpu.VMEM),
        ]
        args = [scal, nodes, tris]
        if smem_codes:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            args.append(codes)
            if shadow_code:
                # second copy of the code table (probe; see shadow_code)
                in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
                args.append(jnp.asarray(np.asarray(codes).copy()))
        if two_level:
            in_specs.append(pl.BlockSpec(
                memory_space=pltpu.SMEM if smem_boxes else pltpu.VMEM))
            args.append(inst)
        if defer_xform:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            args.append(fwt)
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
            in_specs.append(pl.BlockSpec(
                memory_space=pl.ANY if stream_tris else pltpu.VMEM))
            args.append(aux)
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            args.append(atlas_table)
        # +8: the prefix-push writes all 8 sorted children unconditionally
        # at sp+ci before advancing sp by the push count. shadow_push
        # (probe) appends dead duplicate regions of the same size.
        stack_words = (stack_n + 8) * (1 + shadow_push)
        scratch = [pltpu.SMEM((stack_words,), jnp.int32)]
        if two_level:
            scratch.append(pltpu.SMEM((stack_words,), jnp.int32))  # istack
            # instance-space ray cache: 9 (r, 128) planes + prev context
            scratch.append(pltpu.VMEM((9 * rr, lanes), jnp.float32))
            scratch.append(pltpu.SMEM((1,), jnp.int32))
        if use_ring:
            ring_space = pltpu.SMEM if smem_leaf else pltpu.VMEM
            scratch += [
                ring_space((2, lanes), jnp.float32),   # 2-slot DMA ring
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((2,), jnp.int32),           # (pf code|0, slot)
            ]
            if use_tex:
                scratch += [
                    ring_space((2, lanes), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ]
        if scratch_pay:
            # hit-payload planes + bu/bv (see n_scr_pay above)
            scratch.append(pltpu.VMEM((n_scr_pay * rr, lanes), jnp.float32))
        out_specs = [blk] * 4
        out_shapes = [
            jax.ShapeDtypeStruct((rows_padded, lanes), jnp.float32)
        ] * 4
        if defer_env:
            eblk = pl.BlockSpec((spp * rr, lanes), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
            out_specs += [eblk] * 6
            out_shapes += [
                jax.ShapeDtypeStruct((grid * spp * rr, lanes), jnp.float32)
            ] * 6
            if defer_env_nee:
                nblk = pl.BlockSpec((spp * max_depth * rr, lanes),
                                    lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
                out_specs += [nblk] * 6
                out_shapes += [
                    jax.ShapeDtypeStruct(
                        (grid * spp * max_depth * rr, lanes), jnp.float32)
                ] * 6
        extra_call_kw = {}
        if vmem_limit_bytes is not None and not interpret:
            # raise Mosaic's scoped-VMEM cap (default ~16MB) for configs
            # whose RESIDENT footprint is accounted and known to fit the
            # chip's physical VMEM with margin — dispatch sets this for
            # deferred-env-NEE scenes whose record planes would otherwise
            # force triangle streaming (0.65 vs ~4 Mrays/s class,
            # benchmarks/probe_envnee_rows.py)
            extra_call_kw["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=int(vmem_limit_bytes))
        colr, colg, colb, segs, *edefer = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=scratch,
            interpret=interpret,
            **extra_call_kw,
        )(*args)

        # undo the tile swizzle: lane i held pixel (px, py) computed in the
        # kernel; build the static inverse permutation
        flat = lambda a: a.reshape(-1)[:npix]  # noqa: E731
        if swz:
            from ..integrate.wavefront import tile_swizzle_inverse

            inv = tile_swizzle_inverse(h, w, ts)
            colr, colg, colb = (flat(a)[inv] for a in (colr, colg, colb))
        else:
            colr, colg, colb = (flat(a) for a in (colr, colg, colb))
        if defer_env:
            # deferred env-miss shading: gather the recorded (dir, weight)
            # per (pixel, sample) and add weight * env(dir) with the
            # wavefront loop's exact fetch (scene/textures.py). Lanes with
            # no record carry weight 0 and a zero direction (atan2/acos of
            # 0 are finite, so the dead records contribute exact zeros).
            from ..scene.textures import sample_environment

            def per_slab(o, n):
                # block i rows [q*rr, (q+1)*rr) hold slab q -> (n, npix)
                o = o.reshape(grid, n, rr, lanes).transpose(1, 0, 2, 3)
                o = o.reshape(n, rows_padded * lanes)[:, :npix]
                return o[:, inv] if swz else o

            sdx, sdy, sdz, swr, swg, swb = (
                per_slab(o, spp) for o in edefer[:6])
            er, eg, eb = sample_environment(env, (sdx, sdy, sdz))
            colr = colr + jnp.sum(swr * er, axis=0)
            colg = colg + jnp.sum(swg * eg, axis=0)
            colb = colb + jnp.sum(swb * eb, axis=0)
            if defer_env_nee:
                # deferred env-NEE shading: same gather over the
                # per-(sample, bounce) record planes; zero-weight slabs
                # (dead bounces, occluded shadow rays) contribute exact
                # zeros just like dead miss records
                ndx, ndy, ndz, nwr, nwg, nwb = (
                    per_slab(o, spp * max_depth) for o in edefer[6:12])
                nr, ng, nb = sample_environment(env, (ndx, ndy, ndz))
                colr = colr + jnp.sum(nwr * nr, axis=0)
                colg = colg + jnp.sum(nwg * ng, axis=0)
                colb = colb + jnp.sum(nwb * nb, axis=0)
        color = jnp.stack(
            [colr.reshape(h, w), colg.reshape(h, w), colb.reshape(h, w)],
            axis=-1,
        ) / np.float32(spp)
        f = state.frame.astype(jnp.float32)
        accum = (color + state.accum * f) / (f + 1.0)
        return RenderState(
            accum=accum,
            frame=state.frame + 1,
            mrays=state.mrays + jnp.sum(flat(segs)) / np.float32(1e6),
        )

    return render_step
