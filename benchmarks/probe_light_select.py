"""Probe: many-light NEE in the fused BVH regen kernel — one-hot MXU
light select (imgfetch.light_select_rows) vs the old unrolled chain vs
the sorted wavefront loop, on a city-class scene (~190 emissive roofs).

Three timings at 512^2 x 4spp, NEE+RR+cosine, spp_chunk=1:
  fused_mxu    : megakernel_bvh with the MXU select (the new default
                 past LIGHT_UNROLL_MAX lights)
  fused_unroll : megakernel_bvh with LIGHT_UNROLL_MAX forced above L
                 (the old unrolled scalar-select chain)
  wavefront    : the sorted wavefront loop + packet kernels (what
                 dispatch used to pick for the city bench at chunk>1)

python -u benchmarks/probe_light_select.py [--skip-unroll]
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


def time_step(make, cfg, buffers, steps=3, warmup=1):
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


def main():
    enable_compilation_cache()
    scene = city_mesh(n_buildings=96, subdiv=9, glossy_ground=True)
    buffers = upload(scene)
    n_lights = int(((np.asarray(buffers.er)[: buffers.num_tris] > 0)
                    | (np.asarray(buffers.eg)[: buffers.num_tris] > 0)
                    | (np.asarray(buffers.eb)[: buffers.num_tris] > 0)
                    ).sum())
    print(f"tris={buffers.num_tris} lights={n_lights}", flush=True)

    cam = CameraConfig.look_at(origin=(13.0, 9.0, 13.0),
                               target=(0.0, 0.8, 0.0), fov_y_deg=55.0)
    cfg = RenderConfig(width=512, height=512, spp_per_step=4, max_depth=8,
                       sampling="cosine", camera=cam,
                       sky_emission=(0.8, 0.85, 1.0), backend="pallas",
                       use_nee=True, use_rr=True)

    from sfvp_tpu.kernels import imgfetch as IF
    from sfvp_tpu.kernels.megakernel_bvh import make_bvh_regen_render_step
    from sfvp_tpu.dispatch import select_wavefront_kwargs
    from sfvp_tpu.integrate.wavefront import make_render_step

    dt, rate = time_step(
        lambda: make_bvh_regen_render_step(cfg, buffers), cfg, buffers)
    print(f"fused_mxu    {dt * 1e3:8.1f} ms/step  {rate:6.2f} Mrays/s",
          flush=True)

    if "--skip-unroll" not in sys.argv:
        saved = IF.LIGHT_UNROLL_MAX
        IF.LIGHT_UNROLL_MAX = 10_000
        try:
            dt, rate = time_step(
                lambda: make_bvh_regen_render_step(cfg, buffers),
                cfg, buffers)
        finally:
            IF.LIGHT_UNROLL_MAX = saved
        print(f"fused_unroll {dt * 1e3:8.1f} ms/step  {rate:6.2f} Mrays/s",
              flush=True)

    dt, rate = time_step(
        lambda: make_render_step(cfg, buffers, global_shape=(512, 512),
                                 **select_wavefront_kwargs(cfg, buffers)),
        cfg, buffers)
    print(f"wavefront    {dt * 1e3:8.1f} ms/step  {rate:6.2f} Mrays/s",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
