"""Multi-host runtime bring-up.

The reference is strictly single-process (SURVEY §2.1). Multi-host TPU
execution in this framework follows JAX's multi-controller model: every
host runs the same program, ``jax.distributed.initialize`` wires the hosts
into one runtime, and the ("data", "model") mesh spans all chips — GSPMD
then emits ICI/DCN collectives from the same NamedShardings the single-host
path uses. Failure handling is fail-fast coordinated abort (any host error
kills the job), which is the correct baseline for synchronous SPMD serving.

Typical launch (one process per host):

    python -m biogpt_tpu.parallel.distributed --coordinator host0:1234 \
        --num-processes N --process-id $ID -- your_script.py args...

or call :func:`initialize` at the top of your own entry point.
"""

from __future__ import annotations

import argparse
import os
import runpy
import sys
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the multi-host runtime (no-op for single-process runs).

    Arguments default to the standard JAX env vars / TPU metadata when
    omitted, so on Cloud TPU pods a bare ``initialize()`` suffices.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    """True on the process that should do logging / IO."""
    return jax.process_index() == 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("script", nargs=argparse.REMAINDER,
                        help="-- script.py [args...] to run after init")
    args = parser.parse_args(argv)

    initialize(args.coordinator, args.num_processes, args.process_id)

    script = [s for s in args.script if s != "--"]
    if script:
        sys.argv = script
        runpy.run_path(script[0], run_name="__main__")
    else:
        print(f"initialized: process {jax.process_index()} of "
              f"{jax.process_count()}, local devices: {jax.local_devices()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
