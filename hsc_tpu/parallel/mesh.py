"""Device-mesh helpers — the TPU-native replacement for a comm backend.

The reference has no communication layer at all (SURVEY.md §5 "distributed
communication backend: none"); everything here is net-new design: XLA
collectives over ICI/DCN, selected by mesh-axis placement.  Axis convention
(SURVEY.md §2.3):

  'data'  — block/stream data parallelism (P1; may cross DCN)
  'model' — dictionary-atom sharding for very large K (P2; keep on ICI)
  'seq'   — time-axis context parallelism for single huge blocks (P4; ICI)
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a Mesh; default = all local devices on the 'data' axis.

    Axis order follows dict order; put DCN-crossing axes ('data') first so
    slower links carry the least-frequent collectives (bitstream gather,
    learning psum) and ICI carries 'model'/'seq'.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"data": devices.size}
    shape = tuple(axes.values())
    if int(np.prod(shape)) != devices.size:
        raise ValueError(f"mesh {axes} needs {np.prod(shape)} devices, have {devices.size}")
    return Mesh(devices.reshape(shape), tuple(axes.keys()))


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host SPMD bring-up (SURVEY.md §2.3 P9).

    Wraps `jax.distributed.initialize`; on single-process runs it is a no-op
    so the same driver script works from one chip to a pod slice.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
