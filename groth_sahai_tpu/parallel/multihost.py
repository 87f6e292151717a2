"""Multi-host execution: jax.distributed init + ("host", "chip") mesh.

SURVEY.md section 7 step 8. On real pods: every process calls
`init_distributed` (coordinator address via env or args), then
`make_global_mesh` lays the global device list out as a ("host", "chip")
mesh; the sharded kernels in parallel/sharded.py accept any mesh axis name
so Pippenger shards ride ICI within a host and DCN across hosts.

Single-process dryrun: `make_global_mesh` also works on the 8-virtual-CPU
configuration (hosts=1), and `scripts/scaling_harness.py` measures 1-chip
vs N-chip efficiency on the virtual mesh.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed (no-op in single-process runs).

    Args default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID). Returns True when a multi-process
    runtime was initialized.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    if not coordinator_address or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return True


def make_global_mesh(axes=("host", "chip")) -> Mesh:
    """All addressable+remote devices as a ("host", "chip") mesh.

    The host axis spans processes (DCN), the chip axis the devices within a
    process (ICI). Single-process: host axis has size 1 (or, for dryrun
    convenience, a 1 x N mesh over the virtual devices).
    """
    devs = np.array(jax.devices())
    n_proc = jax.process_count()
    if len(axes) == 1:
        return Mesh(devs, axes)
    per_host = len(devs) // n_proc
    grid = devs.reshape(n_proc, per_host)
    return Mesh(grid, axes)


def flatten_mesh(mesh: Mesh, name: str = "chips") -> Mesh:
    """Collapse a multi-axis mesh to one axis (for the sharded kernels:
    the point/pair axis shards over every device; XLA routes the merge
    collective over ICI first, DCN last)."""
    return Mesh(mesh.devices.reshape(-1), (name,))
