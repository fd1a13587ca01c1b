"""Vmapped hyperparameter sweeps sharded across a TPU mesh.

The DP analog for this workload: each mesh lane replays the same bag under a
different ``SlamParams`` (thresholds, noise models, gates are all traced
scalars, so one compiled program serves every lane). Structural parameters
(capacities, CFAR window sizes) are static — sweeps over those group into
separate compilations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..slam.core import KeyframeInput, SlamDims, SlamParams, slam_scan


def make_config_mesh(num_devices: int | None = None, axis: str = "config") -> Mesh:
    devs = jax.devices()
    n = num_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def stack_params(params_list: list[SlamParams]) -> SlamParams:
    """Stack per-lane params along a leading axis (lane count = len(list))."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def sweep_scan(
    frames: KeyframeInput,
    stacked_params: SlamParams,
    dims: SlamDims,
    mesh: Mesh | None = None,
    axis: str = "config",
):
    """Replay the same keyframe stream under B parameter lanes.

    frames: un-batched KeyframeInput (shared across lanes).
    stacked_params: SlamParams with leading lane axis B.
    With a mesh, lanes are sharded over it (`jax.sharding` + jit — XLA
    partitions the whole scan; no per-lane dispatch).
    Returns (carry, outputs) with leading lane axis.
    """
    fn = jax.vmap(lambda p: slam_scan(frames, p, dims))
    if mesh is None:
        return jax.jit(fn)(stacked_params)
    lane = NamedSharding(mesh, P(axis))
    sharded_params = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(*((axis,) + (None,) * (x.ndim - 1))))
        ),
        stacked_params,
    )
    return jax.jit(fn)(sharded_params)


def vary(params: SlamParams, **field_values) -> list[SlamParams]:
    """Cartesian-free helper: one lane per (field, value) override set.

    ``vary(p, point_noise=[0.3, 0.5], ssm_max_translation=[2.0, 3.0])``
    produces lanes for zipped overrides (lists must be equal length).
    """
    lengths = {len(v) for v in field_values.values()}
    if len(lengths) != 1:
        raise ValueError("all override lists must have the same length")
    (n,) = lengths
    lanes = []
    for i in range(n):
        over = {
            k: jnp.asarray(v[i], getattr(params, k).dtype)
            for k, v in field_values.items()
        }
        lanes.append(params._replace(**over))
    return lanes
