"""Multi-host initialization helpers (the >=2-hosts configurations in
BASELINE.md; no reference counterpart — SURVEY.md §2.9).

On a multi-host TPU pod slice, call `initialize()` once per process
before any JAX computation; then `global_mesh()` builds a mesh over
ALL global devices.  Batch axes ride DCN across hosts; within-slice
Schur assembly (parallel/schur.py) stays on ICI.

In CI this is exercised with the virtual-device CPU mesh
(--xla_force_host_platform_device_count); real multi-host runs need no
code changes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None, **kwargs):
    """jax.distributed.initialize with pass-through arguments; no-op
    when the runtime is already initialized or single-process."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
            **kwargs)
    except RuntimeError:
        pass   # already initialized


def global_mesh(axis: str = "batch") -> Mesh:
    """1-D mesh over all global devices (all hosts)."""
    return Mesh(np.array(jax.devices()), (axis,))


def local_batch_slice(total: int, axis_size: Optional[int] = None,
                      index: Optional[int] = None) -> slice:
    """The slice of a globally-sharded batch owned by this process
    (for per-host data loading)."""
    nproc = jax.process_count() if axis_size is None else axis_size
    pid = jax.process_index() if index is None else index
    per = total // nproc
    return slice(pid * per, (pid + 1) * per)
