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


def save_checkpoint_sharded(path: str, state: RenderState,
                            config_hash: str) -> None:
    """Per-shard checkpoint of a row-sharded accumulator: each device's
    shard is pulled and stored individually (device->host of its OWN shard
    only — no cross-device gather), keyed by global row offset so resume
    re-places shards on any same-size mesh."""
    arrs = {
        "version": np.int32(_FORMAT_VERSION),
        "frame": np.asarray(state.frame),
        "mrays": np.asarray(state.mrays),
        "config_hash": np.bytes_(config_hash.encode()),
        "sharded": np.int32(1),
    }
    rows = []
    for sh in state.accum.addressable_shards:
        row0 = sh.index[0].start or 0
        arrs[f"shard_{row0}"] = np.asarray(sh.data)
        rows.append(row0)
    arrs["shard_rows"] = np.asarray(sorted(rows), np.int32)
    tmp = path + ".tmp"
    np.savez(tmp, **arrs)
    os.replace(tmp + ".npz", path)


def load_checkpoint_sharded(
    path: str, mesh, expected_config_hash: Optional[str] = None
) -> Tuple[RenderState, str]:
    """Rebuild the sharded RenderState on ``mesh`` from a per-shard file
    (jax.make_array_from_single_device_arrays — each shard goes host->its
    device directly)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

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
        rows = [int(r) for r in z["shard_rows"]]
        shards = [np.asarray(z[f"shard_{r}"]) for r in rows]
        frame = jnp.asarray(z["frame"])
        mrays = jnp.asarray(z["mrays"])

    n = mesh.devices.size
    if len(shards) != n:
        raise ValueError(
            f"checkpoint has {len(shards)} shards but the mesh has {n} "
            "devices; refusing to resume onto a different topology"
        )
    h_local = shards[0].shape[0]
    gshape = (h_local * n,) + shards[0].shape[1:]
    sharding = NamedSharding(mesh, P(mesh.axis_names[0], None, None))
    devs = list(mesh.devices.flat)
    parts = [
        jax.device_put(s, d) for s, d in zip(shards, devs)
    ]
    accum = jax.make_array_from_single_device_arrays(gshape, sharding, parts)
    return RenderState(accum=accum, frame=frame, mrays=mrays), got_hash
