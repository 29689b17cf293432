"""Counter-based PCG random numbers, bit-exact with the reference's GLSL.

Reference recipes (ref shaders/common.glsl:13-37):
  - ``pcg``:   state' = state*747796405 + 2891336453;
               word = ((state' >> ((state' >> 28)+4)) ^ state') * 277803737;
               out  = (word >> 22) ^ word
  - ``pcg2d``: 2D hash used only for seeding
  - ``rand``:  float(pcg(seed)) * (1/float(0xffffffff))
               note: float(0xffffffffu) rounds to 2^32 in fp32, so the scale
               is exactly 2^-32 — rand can return values in [0, 1].

Seeding (ref shaders/raygen.rgen:47-48):
  s = pcg2d(uvec2(pixel.xy) * (sample + spp*frame + 1)); seed = s.x + s.y

All arithmetic is mod-2^32 (uint32); everything here is shape-polymorphic
and jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_U = jnp.uint32


def pcg(state):
    """One PCG step. Returns ``(value, new_state)``; both uint32 arrays.

    Matches GLSL ``uint pcg(inout uint state)`` exactly, including the
    quirk that the *pre*-permutation LCG output becomes the new state.
    """
    state = state.astype(_U)
    prev = state * _U(747796405) + _U(2891336453)
    shift = (prev >> _U(28)) + _U(4)
    word = ((prev >> shift) ^ prev) * _U(277803737)
    return (word >> _U(22)) ^ word, prev


def pcg2d(vx, vy):
    """GLSL ``uvec2 pcg2d(uvec2 v)``, statement-for-statement.

    Note the sequencing: ``v.y += v.x*k`` uses the *already updated* v.x.
    """
    k = _U(1664525)
    c = _U(1013904223)
    vx = vx.astype(_U) * k + c
    vy = vy.astype(_U) * k + c
    vx = vx + vy * k
    vy = vy + vx * k
    vx = vx ^ (vx >> _U(16))
    vy = vy ^ (vy >> _U(16))
    vx = vx + vy * k
    vy = vy + vx * k
    vx = vx ^ (vx >> _U(16))
    vy = vy ^ (vy >> _U(16))
    return vx, vy


# float(0xffffffffu) rounds to 4294967296.0 in fp32 => scale is exactly 2^-32
_RAND_SCALE = np.float32(1.0) / np.float32(np.float32(0xFFFFFFFF))


def rand(seed):
    """GLSL ``float rand(inout uint seed)``: returns ``(u, new_seed)`` with
    u = float32 in [0, 1] (inclusive upper due to the fp32 rounding quirk)."""
    val, seed = pcg(seed)
    return val.astype(jnp.float32) * _RAND_SCALE, seed


def sample_seed(px, py, sample_index, frame, spp):
    """Per-(pixel, sample, frame) seed, ref shaders/raygen.rgen:47-48.

    px, py: integer arrays (pixel x = column, y = row).
    sample_index: scalar or array sample number within the step.
    frame: scalar progressive-step counter.
    spp: static samples-per-step (the reference's hardcoded ``maxSamples``).
    """
    m = (
        jnp.asarray(sample_index).astype(_U)
        + _U(spp) * jnp.asarray(frame).astype(_U)
        + _U(1)
    )
    sx, sy = pcg2d(jnp.asarray(px).astype(_U) * m, jnp.asarray(py).astype(_U) * m)
    return sx + sy


# ---------------------------------------------------------------------------
# Pure NumPy mirrors, used as an independent oracle in tests.
# ---------------------------------------------------------------------------


def pcg_np(state):
    state = np.uint32(state)
    with np.errstate(over="ignore"):
        prev = np.uint32(state * np.uint32(747796405) + np.uint32(2891336453))
        shift = np.uint32((prev >> np.uint32(28)) + np.uint32(4))
        word = np.uint32(((prev >> shift) ^ prev) * np.uint32(277803737))
    return np.uint32((word >> np.uint32(22)) ^ word), prev


def pcg2d_np(vx, vy):
    k = np.uint32(1664525)
    c = np.uint32(1013904223)
    with np.errstate(over="ignore"):
        vx = np.uint32(np.uint32(vx) * k + c)
        vy = np.uint32(np.uint32(vy) * k + c)
        vx = np.uint32(vx + vy * k)
        vy = np.uint32(vy + vx * k)
        vx = np.uint32(vx ^ (vx >> np.uint32(16)))
        vy = np.uint32(vy ^ (vy >> np.uint32(16)))
        vx = np.uint32(vx + vy * k)
        vy = np.uint32(vy + vx * k)
        vx = np.uint32(vx ^ (vx >> np.uint32(16)))
        vy = np.uint32(vy ^ (vy >> np.uint32(16)))
    return vx, vy


def rand_np(seed):
    val, seed = pcg_np(seed)
    return np.float32(np.float32(val) * _RAND_SCALE), seed
