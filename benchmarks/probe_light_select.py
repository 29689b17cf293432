"""Probe: many-light NEE in the fused BVH regen kernel — one-hot MXU
light select (imgfetch.light_select_rows) vs the old unrolled chain vs
the sorted wavefront loop, on city-class scenes.

Two scenes (same 78k-tri geometry, different emissive rooftop count):
  L=648 (emissive_frac=0.03): past the OLD 256 cap — the headline
         comparison is fused_mxu vs the wavefront loop (what dispatch
         had to pick before the MXU select existed).
  L=162 (emissive_frac=0.02): inside the old cap — fused_mxu vs the
         forced unrolled chain places LIGHT_UNROLL_MAX, plus wavefront
         for context. (648-light unroll is not probed: 15 selects x
         648 lights per bounce is compile-prohibitive, which is why
         the old cap sat at 256.)

All legs 512^2 x 4spp, NEE+RR+cosine, spp_chunk=1.

The 648-light scene also runs the TWO-LEVEL bucketed select
(fused_bucket leg, LIGHT_FLAT_MAX forced down) next to the flat MXU
select, to decide which form should own the 33..1024 tier; --big adds
an emissive_frac=0.10 scene (past LIGHT_FLAT_MAX=1024) where the fused
kernel's only option IS the bucketed select, vs the wavefront loop
dispatch used to take there.

python -u benchmarks/probe_light_select.py [--skip-unroll] [--skip-162]
                                           [--big]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

from sfvp_tpu import RenderConfig, init_state, upload  # noqa: E402
from sfvp_tpu.config import CameraConfig  # noqa: E402
from sfvp_tpu.scene.procedural import city_mesh  # noqa: E402
from sfvp_tpu.utils.cache import enable_compilation_cache  # noqa: E402


def time_step(make, cfg, steps=3, warmup=1):
    step = jax.jit(make())
    st = init_state(cfg.height, cfg.width)
    for _ in range(warmup):
        st = step(st)
        jax.block_until_ready(st.accum)
    m0 = float(st.mrays)
    t0 = time.perf_counter()
    for _ in range(steps):
        st = step(st)
    jax.block_until_ready(st.accum)
    dt = (time.perf_counter() - t0) / steps
    rate = (float(st.mrays) - m0) / (dt * steps)
    return dt, rate


def run_scene(emissive_frac, legs):
    from sfvp_tpu.kernels import imgfetch as IF
    from sfvp_tpu.kernels.megakernel_bvh import make_bvh_regen_render_step
    from sfvp_tpu.dispatch import select_wavefront_kwargs
    from sfvp_tpu.integrate.wavefront import make_render_step

    scene = city_mesh(n_buildings=96, subdiv=9, glossy_ground=True,
                      emissive_frac=emissive_frac)
    buffers = upload(scene)
    n_lights = int(((np.asarray(buffers.er)[: buffers.num_tris] > 0)
                    | (np.asarray(buffers.eg)[: buffers.num_tris] > 0)
                    | (np.asarray(buffers.eb)[: buffers.num_tris] > 0)
                    ).sum())
    print(f"--- tris={buffers.num_tris} lights={n_lights}", flush=True)

    cam = CameraConfig.look_at(origin=(13.0, 9.0, 13.0),
                               target=(0.0, 0.8, 0.0), fov_y_deg=55.0)
    cfg = RenderConfig(width=512, height=512, spp_per_step=4, max_depth=8,
                       sampling="cosine", camera=cam,
                       sky_emission=(0.8, 0.85, 1.0), backend="pallas",
                       use_nee=True, use_rr=True)

    if "mxu" in legs:
        dt, rate = time_step(
            lambda: make_bvh_regen_render_step(cfg, buffers), cfg)
        print(f"fused_mxu    {dt * 1e3:8.1f} ms/step  {rate:6.2f} Mrays/s",
              flush=True)
    if "bucketed" in legs:
        # force the two-level bucketed select at a light count the flat
        # select also handles, to compare the two forms directly
        saved = IF.LIGHT_FLAT_MAX
        IF.LIGHT_FLAT_MAX = IF.LIGHT_UNROLL_MAX
        try:
            dt, rate = time_step(
                lambda: make_bvh_regen_render_step(cfg, buffers), cfg)
        finally:
            IF.LIGHT_FLAT_MAX = saved
        print(f"fused_bucket {dt * 1e3:8.1f} ms/step  {rate:6.2f} Mrays/s",
              flush=True)
    if "unroll" in legs:
        saved = IF.LIGHT_UNROLL_MAX
        IF.LIGHT_UNROLL_MAX = 10_000
        try:
            dt, rate = time_step(
                lambda: make_bvh_regen_render_step(cfg, buffers), cfg)
        finally:
            IF.LIGHT_UNROLL_MAX = saved
        print(f"fused_unroll {dt * 1e3:8.1f} ms/step  {rate:6.2f} Mrays/s",
              flush=True)
    if "wavefront" in legs:
        dt, rate = time_step(
            lambda: make_render_step(
                cfg, buffers, global_shape=(512, 512),
                **select_wavefront_kwargs(cfg, buffers)), cfg)
        print(f"wavefront    {dt * 1e3:8.1f} ms/step  {rate:6.2f} Mrays/s",
              flush=True)


def main():
    enable_compilation_cache()
    run_scene(0.03, ("mxu", "bucketed", "wavefront"))
    if "--big" in sys.argv:
        # past LIGHT_FLAT_MAX: dispatch's only fused option is the
        # bucketed select (vs the wavefront loop it used to take)
        run_scene(0.10, ("mxu", "wavefront"))
    if "--skip-162" not in sys.argv:
        legs = ("mxu", "wavefront") if "--skip-unroll" in sys.argv else (
            "mxu", "unroll", "wavefront")
        run_scene(0.02, legs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
