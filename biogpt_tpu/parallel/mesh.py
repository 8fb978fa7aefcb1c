"""Device mesh construction.

The reference is single-process CPU-only (SURVEY §2.1 — no parallelism of
any kind); this module is the net-new scaling layer. Axes:

  "data"  — batch/request parallelism (continuous batching across hosts)
  "model" — tensor parallelism (heads / d_ff / vocab shards over ICI)

All collectives are XLA-inserted via GSPMD from NamedSharding annotations;
no hand-written NCCL/MPI analogue exists or is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = 1,
    model: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices.

    ``model`` defaults to (n_devices // data). A (1, 1) mesh on one device
    is valid and makes the sharded path degenerate to single-chip.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model is None:
        if n % data != 0:
            raise ValueError(f"{n} devices not divisible by data={data}")
        model = n // data
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs more than {n} devices")
    # Auto axis types: let GSPMD propagate shardings through the whole
    # program from the input annotations (classic pjit behavior) instead of
    # the explicit sharding-in-types mode.
    auto = (jax.sharding.AxisType.Auto, jax.sharding.AxisType.Auto)
    return jax.make_mesh((data, model), (DATA_AXIS, MODEL_AXIS),
                         devices=devices[: data * model], axis_types=auto)
