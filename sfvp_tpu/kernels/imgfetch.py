"""In-kernel (Mosaic) per-lane image fetch via a separable one-hot MXU
gather.

Per-lane dynamic addressing does not exist on TPU, so a direct texel
gather inside a Pallas kernel is impossible, and the naive alternative
(a full lanes x texels one-hot contraction) is O(H*W) VMEM per wave.
This module implements the separable form, which is O(H + W):

1. vertical bilinear lerp as a matmul on the MXU: for each sublane row
   of the (r, 128) wave block, build a (H, 128) two-tap one-hot column
   weight matrix (rows y0/y1 weighted (1-fy)/fy) and contract the
   transposed image ``E_T (3W, H) @ O (H, 128) -> (3W, 128)`` — every
   lane now holds its vertically-interpolated scanline;
2. horizontal bilinear lerp as a masked sublane reduction: weight the
   (W, 128) channel slab with the two-tap x0/x1 mask and sum over
   sublanes -> (1, 128) per channel.

Exact bilinear filtering (same weights as scene/textures.py
sample_bilinear, reassociated as wy*wx), any per-lane (u, v), cost
3W*H*128 MACs + O(W+H) vector ops per block row. The environment-map
use (equirect miss shading, extension over the reference's constant sky,
ref miss.rmiss:10) keys u from atan2 and v from arccos in-kernel.

Layout helper ``pack_env_transposed`` turns a TextureTable single image
into the (3W, H) f32 operand.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# VMEM budget for the packed (3W, H) env operand inside the fused
# megakernels: 512x256 packs to ~1.6MB; the per-row (3W, 128) scan
# transient adds 3W*128*4. Bigger skies route to the wavefront path.
ENV_VMEM_MAX_BYTES = 2 * 1024 * 1024


def env_fits_in_kernel(table) -> bool:
    """Dispatch-side predicate: can the fused megakernels hold this
    environment map in VMEM? (Same bound the kernels enforce.)"""
    if table is None:
        return False
    H = int(np.asarray(table.height)[0])
    W = int(np.asarray(table.width)[0])
    return 3 * W * H * 4 <= ENV_VMEM_MAX_BYTES


def pack_env_transposed(table) -> tuple[np.ndarray, int, int]:
    """TextureTable (single equirect image, id 0) -> ((3W, H) f32 numpy
    operand, H, W). Channel c occupies sublane rows [c*W, (c+1)*W); the
    lane/contraction dim is the image row (latitude)."""
    H = int(np.asarray(table.height)[0])
    W = int(np.asarray(table.width)[0])
    img = np.stack(
        [np.asarray(table.tr), np.asarray(table.tg), np.asarray(table.tb)],
        axis=-1,
    )[: H * W].reshape(H, W, 3)
    # E_T[c*W + w, h] = img[h, w, c]
    et = np.transpose(img, (2, 1, 0)).reshape(3 * W, H)
    return np.ascontiguousarray(et.astype(np.float32)), H, W


# Mosaic has no atan2/arccos lowering: polynomial implementations, max
# error ~1.0e-7 over the full range (measured; minimax-grade lstsq fit of
# atan(t)/t in t^2 on [0,1], degree 11, Horner in f32).
_ATAN_C = (
    1.0, -0.3333333, 0.1999991, -0.14283949, 0.11092985, -0.08979051,
    0.07242284, -0.05421531, 0.034133423, -0.016055161, 0.004827228,
    -0.00068049727,
)
_PI = np.float32(np.pi)
_PI_2 = np.float32(np.pi / 2)


def _atan_poly01(t):
    """atan(t) for t in [0, 1]."""
    u = t * t
    p = jnp.full_like(t, np.float32(_ATAN_C[-1]))
    for c in _ATAN_C[-2::-1]:
        p = p * u + np.float32(c)
    return t * p


def atan2(z, x):
    """Branch-free atan2 for Mosaic kernels (vector planes)."""
    az = jnp.abs(z)
    ax = jnp.abs(x)
    hi = jnp.maximum(az, ax)
    lo = jnp.minimum(az, ax)
    q = lo / jnp.maximum(hi, np.float32(1e-30))
    r = _atan_poly01(q)
    r = jnp.where(az > ax, _PI_2 - r, r)
    r = jnp.where(x < 0, _PI - r, r)
    return jnp.where(z < 0, -r, r)


def arccos(y):
    """arccos via atan2(sqrt(1-y^2), y); y pre-clipped to [-1, 1]."""
    s = jnp.sqrt(jnp.maximum(1.0 - y * y, 0.0))
    return atan2(s, y)


def equirect_uv(d, H):
    """Miss-direction -> (u, v) texture coords, same math as
    scene/textures.py sample_environment (incl. the polar clamp band);
    the trig is the in-kernel polynomial (~1e-7 abs vs libm)."""
    dx, dy, dz = d
    u = atan2(dz, dx) * np.float32(0.5 / np.pi) + np.float32(0.5)
    v = 1.0 - arccos(jnp.clip(dy, -1.0, 1.0)) * np.float32(1.0 / np.pi)
    hf = np.float32(H)
    v = jnp.clip(v, np.float32(0.5) / hf, 1.0 - np.float32(0.5) / hf)
    return u, v


def bilinear_fetch_rows(et, u, v, H, W):
    """Separable one-hot bilinear fetch inside a Pallas kernel (single
    image: scalar dimensions).

    et: (3W, H) f32 image operand (pack_env_transposed layout), loaded.
    u, v: (r, 128) f32 per-lane coords (wrap addressing, OBJ bottom-left
    v origin — same convention as sample_bilinear).
    Returns ((r,128),)*3 rgb planes. r is static; the row loop unrolls.
    """
    wf = jnp.full_like(u, np.float32(W))
    hf = jnp.full_like(u, np.float32(H))
    off = jnp.zeros_like(u)
    return bilinear_fetch_rows_var(et, u, v, wf, hf, off, H, W)


def bilinear_fetch_rows_var(et, u, v, wf, hf, off, Htot, Wmax):
    """Per-lane-dimension variant for texture atlases: every lane may
    address a different texture. wf/hf are the lane's texture dimensions
    as (r,128) f32 planes; off is the lane's vertical start inside the
    (3*Wmax, Htot) atlas (pack_atlas_transposed layout). Wrap (repeat)
    addressing happens inside the lane's own w x h window."""
    r = u.shape[0]
    uu = u - jnp.floor(u)
    vv = v - jnp.floor(v)
    x = uu * wf - np.float32(0.5)
    y = (1.0 - vv) * hf - np.float32(0.5)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    # wrap (repeat) in float: mod keeps everything compare-ready without
    # int casts; exact for the small integer lattice involved
    x0w = x0 - jnp.floor(x0 / wf) * wf
    x1w = (x0 + 1.0) - jnp.floor((x0 + 1.0) / wf) * wf
    y0w = off + y0 - jnp.floor(y0 / hf) * hf
    y1w = off + (y0 + 1.0) - jnp.floor((y0 + 1.0) / hf) * hf

    # Mosaic iota must be integer-typed; i32->f32 cast is supported
    H, W = Htot, Wmax
    iota_h = jax.lax.broadcasted_iota(
        jnp.int32, (H, 128), 0).astype(jnp.float32)
    iota_w = jax.lax.broadcasted_iota(
        jnp.int32, (W, 128), 0).astype(jnp.float32)

    rows = ([], [], [])
    for j in range(r):
        y0r = y0w[j:j + 1, :]   # (1,128) static slice
        y1r = y1w[j:j + 1, :]
        fyr = fy[j:j + 1, :]
        o = (
            jnp.where(iota_h == y0r, 1.0 - fyr, 0.0)
            + jnp.where(iota_h == y1r, fyr, 0.0)
        )                                                   # (H,128)
        # HIGHEST: the MXU's default bf16 passes cost ~1% color error;
        # full-f32 passes measured FREE at these sizes (probe_envfetch_
        # ablate.py: 16-19us/block for every variant incl. no-dot — the
        # fetch rides inside kernel overhead)
        scan = jax.lax.dot_general(
            et, o, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )                                                   # (3W,128)
        x0r = x0w[j:j + 1, :]
        x1r = x1w[j:j + 1, :]
        fxr = fx[j:j + 1, :]
        hmask = (
            jnp.where(iota_w == x0r, 1.0 - fxr, 0.0)
            + jnp.where(iota_w == x1r, fxr, 0.0)
        )                                                   # (W,128)
        for c in range(3):
            slab = scan[c * W:(c + 1) * W, :]
            rows[c].append(
                jnp.sum(slab * hmask, axis=0, keepdims=True))
    return tuple(jnp.concatenate(rows[c], axis=0) for c in range(3))


def env_fetch_rows(et, d, H, W):
    """Equirect environment fetch for a (r,128) SoA direction block."""
    u, v = equirect_uv(d, H)
    return bilinear_fetch_rows(et, u, v, H, W)


# ---- environment importance sampling (env NEE in the fused kernels) ----
#
# The wavefront estimator (integrate/lights.py sample_env / env_pdf) does
# a per-lane searchsorted over the H*W texel CDF — a gather TPU lanes
# can't do. The separable form below reproduces it EXACTLY (the same f32
# comparisons against the same f32 values): the flat CDF is row-major, so
#   ti = #{j: cdf[j] <= r}  =  W * #{h: rowend[h] <= r}  +  #{w in that
#   row: cdf[row, w] <= r}
# (rows whose END is <= r contribute all W entries by monotonicity; rows
# after the selected one contribute none). The row count is a sublane
# reduction over an (H, 128) compare; the selected row's CDF/PDF values
# land in lanes via the same exact one-hot MXU select the bilinear fetch
# uses (0/1 weights at HIGHEST precision: a copy, not a sum).


def pack_env_dist_transposed(dist):
    """EnvDistribution -> ((2W, H) cdf/pdf operand, (H, 128) row-end cdf).

    cdfpdf[w, h]     = flat_cdf[h*W + w]   (rows 0..W-1)
    cdfpdf[W + w, h] = pdf_flat[h*W + w]   (rows W..2W-1)
    rowend[h, :]     = flat_cdf[(h+1)*W - 1], lane-broadcast.
    """
    H, W = dist.height, dist.width
    cdf = np.asarray(dist.cdf, np.float32).reshape(H, W)
    pdf = np.asarray(dist.pdf_flat, np.float32).reshape(H, W)
    cdfpdf = np.concatenate([cdf.T, pdf.T], axis=0)
    rowend = np.broadcast_to(cdf[:, -1:], (H, 128))
    return (np.ascontiguousarray(cdfpdf),
            np.ascontiguousarray(rowend.astype(np.float32)))


def _cdf_count(keys, rs, n, strict):
    """Clamped sublane count #{i: keys[i] (<|<=) rs} for a (1, 128) rs —
    the in-kernel searchsorted: strict=True reproduces ``sum(rs > k)``
    (area-light select), strict=False ``searchsorted(side="right")``
    (env texel CDF). The min(cnt, n-1) clamp equals truncating the count
    at n-1 entries, by CDF monotonicity."""
    cmp = keys < rs if strict else keys <= rs
    cnt = jnp.sum(jnp.where(cmp, 1.0, 0.0), axis=0, keepdims=True)
    return jnp.minimum(cnt, np.float32(n - 1))


def inst_xform_select_rows(fwt, iidp):
    """Per-lane instance forward-transform gather for a (r, 128)
    instance-id plane (megakernel_bvh defer_inst_xform): returns the 12
    (r, 128) coefficient planes, each an exact one-hot MXU copy of
    column ``iid`` of the (12, Np) operand — the same floats the
    in-loop ``inst_scalars(ictx, 12, 24)`` SMEM loads produced, so the
    post-traversal world transform is bitwise what the per-leaf-pop
    transform computed."""
    r = iidp.shape[0]
    np_ = fwt.shape[1]
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (np_, 128), 0).astype(jnp.float32)
    outs = [[] for _ in range(12)]
    for j in range(r):
        slab = _onehot_row_dot(fwt, iota, iidp[j:j + 1, :])     # (12,128)
        for k in range(12):
            outs[k].append(slab[k:k + 1, :])
    return [jnp.concatenate(planes, axis=0) for planes in outs]


def _onehot_row_dot(operand, iota, idx):
    """operand (K, N) @ onehot(idx) (N, 128) -> (K, 128): copy column
    ``idx`` of the operand into lanes. 0/1 weights at HIGHEST precision
    make the MXU matmul an exact copy."""
    o = jnp.where(iota == idx, 1.0, 0.0)
    return jax.lax.dot_general(
        operand, o, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def env_cdf_sample_rows(cdfpdf, rowend, r_sel, H, W):
    """Invert the flat texel CDF for a (r, 128) selection-random block.

    Returns (row, col, pdf_flat) as (r, 128) f32 planes; (row, col) is
    bitwise the texel jnp.searchsorted(cdf, r, side="right") picks (incl.
    the final min(ti, H*W-1) clamp)."""
    r = r_sel.shape[0]
    iota_h = jax.lax.broadcasted_iota(
        jnp.int32, (H, 128), 0).astype(jnp.float32)
    iota_w = jax.lax.broadcasted_iota(
        jnp.int32, (W, 128), 0).astype(jnp.float32)
    rows_o, cols_o, pdfs_o = [], [], []
    for j in range(r):
        rs = r_sel[j:j + 1, :]                                  # (1,128)
        rowj = _cdf_count(rowend, rs, H, strict=False)
        slab = _onehot_row_dot(cdfpdf, iota_h, rowj)            # (2W,128)
        cdf_slab = slab[:W, :]
        pdf_slab = slab[W:, :]
        colj = _cdf_count(cdf_slab, rs, W, strict=False)
        pdfj = jnp.sum(
            jnp.where(iota_w == colj, pdf_slab, 0.0),
            axis=0, keepdims=True,
        )
        rows_o.append(rowj)
        cols_o.append(colj)
        pdfs_o.append(pdfj)
    cat = lambda xs: jnp.concatenate(xs, axis=0)  # noqa: E731
    return cat(rows_o), cat(cols_o), cat(pdfs_o)


def env_pdf_sa_rows(cdfpdf, d, H, W):
    """Solid-angle pdf the env sampler assigns to direction d (the MIS
    weight of BSDF-path sky hits) — integrate/lights.py env_pdf semantics
    with the in-kernel polynomial trig."""
    dx, dy, dz = d
    u = atan2(dz, dx) * np.float32(0.5 / np.pi) + np.float32(0.5)
    dyc = jnp.clip(dy, -1.0, 1.0)
    theta = arccos(dyc)
    rowp = jnp.clip(
        jnp.floor(theta * np.float32(H / np.pi)), 0.0, np.float32(H - 1)
    )
    cw = jnp.floor(jnp.maximum(u, 0.0) * np.float32(W))
    colp = jnp.clip(
        cw - jnp.floor(cw / np.float32(W)) * np.float32(W),
        0.0, np.float32(W - 1),
    )
    iota_h = jax.lax.broadcasted_iota(
        jnp.int32, (H, 128), 0).astype(jnp.float32)
    iota_w = jax.lax.broadcasted_iota(
        jnp.int32, (W, 128), 0).astype(jnp.float32)
    pdf_part = cdfpdf[W:, :]                                    # (W,H)
    r = rowp.shape[0]
    pdfs_o = []
    for j in range(r):
        pdf_slab = _onehot_row_dot(
            pdf_part, iota_h, rowp[j:j + 1, :])                 # (W,128)
        pdfs_o.append(jnp.sum(
            jnp.where(iota_w == colp[j:j + 1, :], pdf_slab, 0.0),
            axis=0, keepdims=True,
        ))
    pdfflat = jnp.concatenate(pdfs_o, axis=0)
    inv_patch = np.float32(W * H / (2.0 * np.pi * np.pi))
    return (pdfflat * inv_patch
            / jnp.maximum(jnp.sin(theta), np.float32(1e-6)))


# ---- area-light CDF select (many-light NEE in the fused kernels) ----
#
# The small-table path unrolls 15 jnp.where selects per light per bounce
# — linear in L and painful past a few dozen lights (the old 256 cap).
# The MXU form below is the light-table analog of env_cdf_sample_rows:
#   li = #{i: cdf[i] < r}            (sublane count over an (Lp, 128)
#                                     lane-broadcast cdf compare)
#   fields = LT (16, Lp) @ onehot(li) (Lp, 128) -> (16, 128)
# One matmul lands ALL 15 light fields for a whole lane row at once; 0/1
# weights at HIGHEST precision make it an exact copy, so the result is
# bitwise what the unrolled select chain produces.

# flat-select ceiling: the (Lp, 128) cdf broadcast + one-hot transient
# are 512KB each at 1024 lights. Bigger tables switch to the BUCKETED
# two-level select below (same decomposition as the env texel CDF),
# whose operands/transients stay O(L/128 + 128) planes.
LIGHT_FLAT_MAX = 1024

# bucketed-select ceiling: 16384 lights = 128 buckets -> a (2048, 128)
# packed table (1MB) + a (128, 128) bucket-end cdf + a (2048, 128) slab
# transient per select row. Beyond this the light table stops being a
# VMEM-resident object and the wavefront integrator's searchsorted
# sampling takes over.
MAX_KERNEL_LIGHTS = 16384

# below this the unrolled scalar-select chain stays cheaper than the
# fixed (Lp>=128)-wide compare + matmul
LIGHT_UNROLL_MAX = 32


def pack_light_table_mxu(lt):
    """LightTable -> ((16, Lp) field/cdf operand, (Lp, 128) lane-broadcast
    cdf, Lp). Lane-pads L to a multiple of 128; pad cdf entries are 2.0 so
    the strict compare never counts them."""
    L = lt.num
    rows = []
    for t3 in (lt.v0, lt.v1, lt.v2, lt.n, lt.le):
        rows.extend(np.asarray(c, np.float32) for c in t3)
    Lp = max(128, -(-L // 128) * 128)
    tab = np.zeros((16, Lp), np.float32)
    tab[:15, :L] = np.stack(rows)
    tab[15, :L] = np.asarray(lt.cdf, np.float32)
    tab[15, L:] = 2.0
    cdfb = np.broadcast_to(tab[15][:, None], (Lp, 128))
    return (np.ascontiguousarray(tab),
            np.ascontiguousarray(cdfb.astype(np.float32)), Lp)


def _env_nee_select_bytes(H, W) -> int:
    """Scoped VMEM of the in-kernel env-NEE CDF machinery for an (H, W)
    distribution grid: the (2W, H) cdf/pdf operand + (H, 128) row-end
    cdf, plus the per-row select transients ((2W, 128) one-hot slab,
    row/col iotas, compare mask) that live during env_cdf_sample_rows /
    env_pdf_sa_rows."""
    return (2 * W * H + H * 128) * 4 + (2 * W + W + 2 * H) * 128 * 4


def fused_extra_vmem_bytes(n_lights, env, textures, use_nee,
                           env_deferred=False, spp=0, max_depth=0,
                           block_rows=8) -> int:
    """Resident VMEM the fused megakernels add BEYOND the scene/BVH rows,
    for dispatch's combined-budget check: the packed env map (+ its CDF
    operands and select transients when env NEE runs), the packed
    texture atlas, and the light-select operands. Each capability fits
    its own cap, but a scene near vmem_scene_budget stacked with all of
    them must not compile the fused kernel over VMEM — dispatch compares
    nodes+tris+this against the budget and routes to the wavefront loop
    (or streams the triangle rows) when it doesn't fit.

    env_deferred: the map itself is NOT resident (oversized — the kernel
    emits miss/NEE records, megakernel_bvh defer_env): only the pooled
    coarse proposal's CDF operands count, PLUS the double-buffered
    record output blocks — 6 (spp, rows) miss planes and, under NEE,
    6 (spp*max_depth, rows) per-bounce planes (spp/max_depth/block_rows
    size them; a 100k-tri resident scene + spp8*depth8 records measured
    112KB past the 16MB scoped limit, so this accounting is what flips
    such configs to streamed triangle rows)."""
    total = 0
    if n_lights > LIGHT_FLAT_MAX:
        # bucketed two-level select: (2048, Bp) packed table (lane dim
        # tile-padded to >=128) + (Bp, 128) bucket-end cdf + a
        # (2048, 128) slab transient + ~2 (128, 128) masks per select
        Bp = max(8, -(-n_lights // 128))
        total += (2048 * max(Bp, 128) + Bp * 128
                  + 2048 * 128 + 2 * 128 * 128) * 4
    elif n_lights > LIGHT_UNROLL_MAX:
        Lp = max(128, -(-n_lights // 128) * 128)
        # (16,Lp) table + (Lp,128) cdf broadcast + ~2 (Lp,128) transients
        # (compare mask + one-hot) live per select
        total += (16 * Lp + 3 * Lp * 128) * 4
    if env is not None:
        H = int(np.asarray(env.height)[0])
        W = int(np.asarray(env.width)[0])
        if env_deferred:
            # double-buffered miss-record output blocks
            total += 2 * 6 * spp * block_rows * 128 * 4
            if use_nee:
                # the coarse proposal grid the dist builder will use
                # (integrate/lights.py env_distribution_for)
                from ..integrate.lights import ENV_DIST_MAX_H

                H = min(H, ENV_DIST_MAX_H)
                W = min(W, 2 * ENV_DIST_MAX_H)
                total += _env_nee_select_bytes(H, W)
                # double-buffered per-(sample, bounce) NEE record blocks
                total += 2 * 6 * spp * max_depth * block_rows * 128 * 4
        else:
            total += 3 * W * H * 4                  # packed (3W, H) image
            if use_nee:
                total += _env_nee_select_bytes(H, W)
    if textures is not None:
        ws = np.asarray(textures.width)
        hs = np.asarray(textures.height)
        total += 3 * int(ws.max()) * int(hs.sum()) * 4  # packed atlas
    return total


def pack_light_table_bucketed(lt):
    """LightTable -> ((2048, Bp) packed operand, (Bp, 128) lane-broadcast
    bucket-end cdf) for the two-level select (light_select_rows_bucketed).

    Lights live on a (bucket b, slot s) grid of 128-light buckets:
      mtab[k*128 + s, b] = field k of light b*128+s   (k in 0..14)
      mtab[15*128 + s, b] = cdf[b*128+s]              (pads 2.0)
      bend[b, :] = cdf of bucket b's LAST real light  (pad buckets 2.0)
    Pad cdf entries are 2.0 so a strict compare against r in [0, 1)
    never counts them. Bp pads the bucket count to >= 8 sublanes."""
    L = lt.num
    B = -(-L // 128)
    Bp = max(8, B)
    fields = []
    for t3 in (lt.v0, lt.v1, lt.v2, lt.n, lt.le):
        fields.extend(np.asarray(c, np.float32) for c in t3)
    cdf = np.asarray(lt.cdf, np.float32)
    mtab = np.zeros((16 * 128, Bp), np.float32)
    mtab[15 * 128:, :] = 2.0
    for b in range(B):
        lo, hi = b * 128, min((b + 1) * 128, L)
        n = hi - lo
        for k in range(15):
            mtab[k * 128:k * 128 + n, b] = fields[k][lo:hi]
        mtab[15 * 128:15 * 128 + n, b] = cdf[lo:hi]
    bend = np.full((Bp, 128), 2.0, np.float32)
    for b in range(B):
        bend[b, :] = cdf[min((b + 1) * 128, L) - 1]
    return np.ascontiguousarray(mtab), np.ascontiguousarray(bend)


def light_select_rows_bucketed(mtab, bend, r_sel, L):
    """Two-level area-light select for a (r, 128) selection-random block —
    the light-table analog of env_cdf_sample_rows, for tables past
    LIGHT_FLAT_MAX (up to MAX_KERNEL_LIGHTS).

    The unrolled chain's strict count decomposes over 128-light buckets
    exactly (cdf monotonicity: a bucket whose END is < r contributes all
    128 entries; buckets past the selected one contribute none):
      li = 128 * #{b: bend[b] < r}  +  #{s in that bucket: cdf[b,s] < r}
    The bucket count is a sublane reduction over the (Bp, 128) bend
    compare; ONE one-hot MXU matmul (exact copy: 0/1 weights at HIGHEST)
    lands the whole bucket — 15 field slots AND its cdf column — as a
    (2048, 128) slab; the within-bucket count and the 15 field picks are
    (128, 128) sublane reductions on that slab. Bitwise the pick of the
    unrolled ``li = min(sum(r > cdf[i]), L-1)`` chain (the final clamp
    maps to clamping the within-count at the last real slot of the
    terminal bucket)."""
    r = r_sel.shape[0]
    Bp = bend.shape[0]
    B = -(-L // 128)
    n_last = L - (B - 1) * 128   # real slots in the terminal bucket
    iota_b = jax.lax.broadcasted_iota(
        jnp.int32, (Bp, 128), 0).astype(jnp.float32)
    iota_s = jax.lax.broadcasted_iota(
        jnp.int32, (128, 128), 0).astype(jnp.float32)
    outs = [[] for _ in range(15)]
    for j in range(r):
        rs = r_sel[j:j + 1, :]                                  # (1,128)
        bj = _cdf_count(bend, rs, B, strict=True)
        slab = _onehot_row_dot(mtab, iota_b, bj)                # (2048,128)
        cdf_slab = slab[15 * 128:, :]                           # (128,128)
        wj = jnp.sum(
            jnp.where(cdf_slab < rs, 1.0, 0.0), axis=0, keepdims=True
        )
        # r beyond the last cdf entry lands in the terminal bucket with
        # wj == its real-slot count: clamp to the last real slot (pads
        # are 2.0 so only this one overflow case exists)
        wj = jnp.where(
            bj >= np.float32(B - 1),
            jnp.minimum(wj, np.float32(n_last - 1)), wj,
        )
        mask = iota_s == wj                                     # (128,128)
        for k in range(15):
            outs[k].append(jnp.sum(
                jnp.where(mask, slab[k * 128:(k + 1) * 128, :], 0.0),
                axis=0, keepdims=True,
            ))
    return [jnp.concatenate(planes, axis=0) for planes in outs]


def light_select_rows(ltab, cdfb, r_sel, L):
    """Area-proportional light select for a (r, 128) selection-random
    block inside a Pallas kernel.

    ltab: (16, Lp) pack_light_table_mxu operand, loaded.
    cdfb: (Lp, 128) lane-broadcast cdf, loaded.
    Returns 15 (r, 128) field planes [v0 v1 v2 n Le] — bitwise the light
    the unrolled ``li = sum(r_sel > cdf[i])`` select chain picks (the
    min(li, L-1) clamp equals truncating the count at L-1 entries, by
    cdf monotonicity)."""
    r = r_sel.shape[0]
    Lp = cdfb.shape[0]
    iota_l = jax.lax.broadcasted_iota(
        jnp.int32, (Lp, 128), 0).astype(jnp.float32)
    outs = [[] for _ in range(15)]
    for j in range(r):
        rs = r_sel[j:j + 1, :]                                  # (1,128)
        li = _cdf_count(cdfb, rs, L, strict=True)
        slab = _onehot_row_dot(ltab, iota_l, li)                # (16,128)
        for k in range(15):
            outs[k].append(slab[k:k + 1, :])
    return [jnp.concatenate(planes, axis=0) for planes in outs]


# ---- texture atlases (map_Kd in the fused megakernels) ----

# the packed (3*Wmax, Htot) atlas must fit VMEM next to the scene/BVH
# tables; per-texture dims resolve via unrolled selects, so cap the count
TEX_VMEM_MAX_BYTES = 2 * 1024 * 1024
MAX_KERNEL_TEXTURES = 16


def atlas_fits_in_kernel(table) -> bool:
    """Dispatch-side predicate: can the fused megakernels hold this
    TextureTable as a packed atlas? (Same bounds the kernels enforce.)"""
    if table is None:
        return False
    ws = np.asarray(table.width)
    hs = np.asarray(table.height)
    if len(ws) > MAX_KERNEL_TEXTURES:
        return False
    return 3 * int(ws.max()) * int(hs.sum()) * 4 <= TEX_VMEM_MAX_BYTES


def pack_atlas_transposed(table):
    """TextureTable -> ((3*Wmax, Htot) f32 atlas, offs, ws, hs).

    Texture k occupies contraction columns [offs[k], offs[k]+hs[k]) and,
    per channel c, sublane rows [c*Wmax, c*Wmax+ws[k]). Lanes resolve
    their texture's (off, w, h) by unrolled selects over texid."""
    K = int(np.asarray(table.off).shape[0])
    ws = [int(w) for w in np.asarray(table.width)]
    hs = [int(h) for h in np.asarray(table.height)]
    base = [int(o) for o in np.asarray(table.off)]
    wmax = max(ws)
    htot = sum(hs)
    chans = [np.asarray(table.tr), np.asarray(table.tg),
             np.asarray(table.tb)]
    at = np.zeros((3 * wmax, htot), np.float32)
    offs = []
    off_h = 0
    for k in range(K):
        h, w = hs[k], ws[k]
        for c in range(3):
            img = chans[c][base[k]:base[k] + h * w].reshape(h, w)
            at[c * wmax:c * wmax + w, off_h:off_h + h] = img.T
        offs.append(off_h)
        off_h += h
    return np.ascontiguousarray(at), offs, ws, hs


def atlas_fetch_rows(at, texu, texv, tid1, offs, ws, hs, Htot, Wmax):
    """map_Kd fetch for a (r,128) hit wave inside a Pallas kernel.

    tid1: (r,128) f32 texid+1 plane (0 = untextured -> white, matching
    sample_bilinear's tex_id < 0 semantics). Per-lane texture dims come
    from unrolled selects over the static (offs, ws, hs) lists."""
    offp = jnp.zeros_like(texu)
    wfp = jnp.ones_like(texu)
    hfp = jnp.ones_like(texu)
    for k in range(len(ws)):
        sel = tid1 == np.float32(k + 1)
        offp = jnp.where(sel, np.float32(offs[k]), offp)
        wfp = jnp.where(sel, np.float32(ws[k]), wfp)
        hfp = jnp.where(sel, np.float32(hs[k]), hfp)
    rgb = bilinear_fetch_rows_var(at, texu, texv, wfp, hfp, offp,
                                  Htot, Wmax)
    white = tid1 < np.float32(0.5)
    return tuple(jnp.where(white, 1.0, c) for c in rgb)
