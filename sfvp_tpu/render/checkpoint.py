"""Checkpoint / resume.

The reference's only persistent state is the in-GPU accumulation image plus
the frame counter (ref shaders/raygen.rgen:88-90, main.cpp:644-645,684),
lost on exit. Here the full progressive state (accumulator, step counter,
ray counter) is serialized with the config hash; resume continues the
running mean exactly.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..integrate.wavefront import RenderState

_FORMAT_VERSION = 1


def save_checkpoint(path: str, state: RenderState, config_hash: str) -> None:
    tmp = path + ".tmp"
    np.savez(
        tmp,
        version=np.int32(_FORMAT_VERSION),
        accum=np.asarray(state.accum),
        frame=np.asarray(state.frame),
        mrays=np.asarray(state.mrays),
        config_hash=np.bytes_(config_hash.encode()),
    )
    # numpy appends .npz to the tmp name
    os.replace(tmp + ".npz", path)


def load_checkpoint(
    path: str, expected_config_hash: Optional[str] = None
) -> Tuple[RenderState, str]:
    import jax.numpy as jnp

    with np.load(path) as z:
        if int(z["version"]) != _FORMAT_VERSION:
            raise ValueError(f"unknown checkpoint version {z['version']}")
        got_hash = bytes(z["config_hash"]).decode()
        if expected_config_hash is not None and got_hash != expected_config_hash:
            raise ValueError(
                f"checkpoint config hash {got_hash} != expected "
                f"{expected_config_hash}; refusing to resume into a "
                "different render configuration"
            )
        state = RenderState(
            accum=jnp.asarray(z["accum"]),
            frame=jnp.asarray(z["frame"]),
            mrays=jnp.asarray(z["mrays"]),
        )
    return state, got_hash
