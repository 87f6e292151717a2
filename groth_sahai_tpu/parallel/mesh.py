"""Device mesh helpers.

The reference's only parallelism is single-process rayon fork-join
(data_structures.rs:658-675). The TPU framework's first-class analogue
(SURVEY.md section 2c) is one `jax.sharding.Mesh` spanning the slice;
points/equations shard over it, XLA collectives do the reductions.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding


def make_mesh(n_devices: int | None = None, axis: str = "chips") -> Mesh:
    """A 1-D mesh over the first n_devices (default: all).

    If the default backend has too few devices but the CPU backend (with
    ``--xla_force_host_platform_device_count=N``) has enough, fall back to
    the CPU devices -- this is how the driver's multichip dryrun gets an
    8-device mesh even when the container pins JAX_PLATFORMS to the single
    tunneled TPU.
    """
    devs = jax.devices()
    if n_devices is not None and len(devs) < n_devices:
        try:
            cpu = jax.devices("cpu")
            if len(cpu) >= n_devices:
                import warnings
                warnings.warn(
                    f"make_mesh: default backend "
                    f"'{jax.default_backend()}' has {len(devs)} device(s) "
                    f"< {n_devices}; falling back to the {len(cpu)}-device "
                    f"CPU backend (virtual mesh, NOT accelerator hardware)",
                    stacklevel=2)
                devs = cpu
        except RuntimeError:
            pass
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices, have {len(devs)} "
                f"(default backend) -- set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, arr, batch_axis_in_array: int, axis: str = "chips"):
    """NamedSharding placing `batch_axis_in_array` on the mesh axis."""
    spec = [None] * arr.ndim
    spec[batch_axis_in_array] = axis
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))
