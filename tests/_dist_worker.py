"""Worker process for the 2-process jax.distributed CPU test.

Usage: python tests/_dist_worker.py <port> <process_id> <api|launcher>

In "api" mode the worker calls ``biogpt_tpu.parallel.distributed.
initialize`` itself; in "launcher" mode it is run under
``python -m biogpt_tpu.parallel.distributed`` which already initialized
the runtime. Either way it then checks the global runtime and runs a real
cross-process collective.
"""

import os
import sys


def main() -> int:
    port, pid, mode = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    # The axon sitecustomize pins a TPU platform; this must be re-pinned
    # before any backend init (see tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

    from biogpt_tpu.parallel.distributed import initialize, is_primary

    if mode == "api":
        initialize(f"localhost:{port}", num_processes=2, process_id=pid)

    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid, (jax.process_index(), pid)
    assert is_primary() == (pid == 0)
    # 2 local virtual CPU devices per process -> 4 global
    assert len(jax.local_devices()) == 2, jax.local_devices()
    assert len(jax.devices()) == 4, jax.devices()

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    # a real cross-process collective: all-gather each process's id
    gathered = multihost_utils.process_allgather(
        jnp.asarray([jax.process_index()], jnp.int32))
    assert sorted(np.ravel(np.asarray(gathered)).tolist()) == [0, 1], gathered

    # a sharded computation over the GLOBAL ("data", "model") mesh: psum of
    # per-device values must see all 4 devices across both processes
    from jax.sharding import NamedSharding, PartitionSpec as P

    from biogpt_tpu.parallel import make_mesh

    mesh = make_mesh(data=2, model=2)
    x = multihost_utils.host_local_array_to_global_array(
        np.ones((1, 2), np.float32), mesh, P("data", "model"))

    @jax.jit
    def total(v):
        return jnp.sum(v)

    out = total(x)
    # the jitted reduction replicates its scalar result on every device, so
    # each process can read it directly
    val = float(out)
    assert val == 4.0, val

    print(f"DIST_OK {pid}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
