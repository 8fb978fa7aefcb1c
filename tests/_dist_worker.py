"""Worker process for the 2-process jax.distributed CPU tests.

Usage: python tests/_dist_worker.py <port> <process_id> <api|launcher|model>

In "api" mode the worker calls ``biogpt_tpu.parallel.distributed.
initialize`` itself; in "launcher" mode it is run under
``python -m biogpt_tpu.parallel.distributed`` which already initialized
the runtime. Either way it then checks the global runtime and runs a real
cross-process collective.

"model" mode is the real thing (SURVEY §2.1(d) multi-controller scope):
the full engine and the continuous-batching server execute over a GLOBAL
2x2 ("data", "model") mesh spanning both processes — every decode step's
o-proj/fc2 psums and the lm_head all_gather cross the process boundary —
and the tokens must be identical to a process-local single-device run.
"""

import os
import sys


def _model_checks(pid: int) -> None:
    """Cross-process model execution: greedy generate + batched serving
    over a global mesh are token-identical to single-process; sampled
    generation is identical ACROSS processes (vs single-process only ulp
    differences are expected: TP psums reduce in a different order and
    top-k/top-p sampling amplifies last-ulp logit ties)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from biogpt_tpu.config import BioGptConfig, GenerationParams
    from biogpt_tpu.modelio.checkpoint import params_from_state_dict
    from biogpt_tpu.modelio.synthetic import make_state_dict
    from biogpt_tpu.parallel import make_mesh
    from biogpt_tpu.quant import codecs
    from biogpt_tpu.runtime.engine import Engine
    from biogpt_tpu.runtime.serving import BatchedEngine, Request

    cfg = BioGptConfig.tiny(d_model=128, d_ff=256, n_head=4, n_layer=2,
                            n_vocab=256, n_positions=64)
    sd = make_state_dict(cfg, seed=11)
    params = params_from_state_dict(sd, cfg, qtype=codecs.GGML_TYPE_Q4_0)
    gen = GenerationParams(temp=0.0, n_predict=6, stop_at_eos=False)
    mesh = make_mesh(data=2, model=2)   # spans both processes

    # --- greedy single-stream: global mesh == process-local single device
    ref_ids = Engine(cfg, params, compute_dtype=jnp.float32,
                     pack_q4=False).generate([2, 5, 9, 14], gen).ids
    eng = Engine(cfg, params, compute_dtype=jnp.float32, mesh=mesh)
    dist_ids = eng.generate([2, 5, 9, 14], gen).ids
    assert dist_ids == ref_ids, (dist_ids, ref_ids)

    # --- continuous batching across the process boundary
    def reqs():
        return [Request(prompt_ids=[2, 5, 9], n_predict=6, request_id=0),
                Request(prompt_ids=[2, 14, 7, 3], n_predict=5, request_id=1),
                Request(prompt_ids=[2, 8], n_predict=6, request_id=2)]

    ref_srv = {k: r.new_ids for k, r in BatchedEngine(
        cfg, params, max_batch=2, compute_dtype=jnp.float32, chunk=4,
        pack_q4=False).serve(reqs(), gen).items()}
    be = BatchedEngine(cfg, params, max_batch=2, compute_dtype=jnp.float32,
                       chunk=4, mesh=mesh)
    dist_srv = {k: r.new_ids for k, r in be.serve(reqs(), gen).items()}
    assert dist_srv == ref_srv, (dist_srv, ref_srv)

    # --- sampled generation: both processes must draw the same tokens
    gen_s = GenerationParams(temp=0.8, seed=7, n_predict=6,
                             stop_at_eos=False)
    ids_s = eng.generate([2, 5, 9], gen_s).ids
    gathered = multihost_utils.process_allgather(
        jnp.asarray(ids_s, jnp.int32))
    assert np.all(np.asarray(gathered)[0] == np.asarray(gathered)[1]), \
        gathered
    print(f"DIST_MODEL_OK {pid}", flush=True)


def _dserve_checks(pid: int) -> None:
    """Multi-host continuous batching with ONE front door: process 0
    submits live (futures + token streaming), the request stream
    replicates via the DistributedScheduler's tick broadcast, and both
    processes run the identical SPMD serve loop. Results on process 0
    must match a process-local single-device engine token-for-token."""
    import time

    import jax
    import jax.numpy as jnp

    from biogpt_tpu.config import BioGptConfig, GenerationParams
    from biogpt_tpu.modelio.checkpoint import params_from_state_dict
    from biogpt_tpu.modelio.synthetic import make_state_dict
    from biogpt_tpu.parallel import make_mesh
    from biogpt_tpu.quant import codecs
    from biogpt_tpu.runtime.dist_serving import DistributedScheduler
    from biogpt_tpu.runtime.engine import Engine
    from biogpt_tpu.runtime.serving import BatchedEngine

    cfg = BioGptConfig.tiny(d_model=128, d_ff=256, n_head=4, n_layer=2,
                            n_vocab=256, n_positions=64)
    sd = make_state_dict(cfg, seed=11)
    params = params_from_state_dict(sd, cfg, qtype=codecs.GGML_TYPE_Q4_0)
    mesh = make_mesh(data=2, model=2)
    be = BatchedEngine(cfg, params, max_batch=2, compute_dtype=jnp.float32,
                       chunk=4, mesh=mesh)
    # stop_at_eos=True (the production default) exercises the synced
    # slot-freeing decision: EOS-based freeing reads process-local drain
    # state, replicated via serve()'s decision_sync hook
    sched = DistributedScheduler(
        be, GenerationParams(temp=0.0, seed=5, stop_at_eos=True),
        max_reqs_per_tick=4, poll_s=0.02)

    if pid != 0:
        sched.run()   # blocks until process 0 closes the scheduler
        print(f"DIST_SERVE_OK {pid}", flush=True)
        return

    # --- process 0: the front door
    ref = Engine(cfg, params, compute_dtype=jnp.float32, pack_q4=False)
    prompts = [[2, 5, 9], [2, 14, 7, 3], [2, 8], [2, 3, 4, 5, 6]]
    toks0 = []
    futs = [sched.submit(prompts[0], n_predict=5, on_token=toks0.append)]
    time.sleep(0.15)   # later arrivals join the running batch (live intake)
    futs += [sched.submit(p, n_predict=5) for p in prompts[1:3]]
    time.sleep(0.1)
    futs.append(sched.submit(prompts[3], n_predict=4))

    results = [f.result(timeout=120) for f in futs]
    for i, (p, res) in enumerate(zip(prompts, results)):
        n = 4 if i == 3 else 5
        expect = ref.generate(p, GenerationParams(
            n_predict=n, temp=0.0, stop_at_eos=True)).ids
        assert res.ids == expect, (i, res.ids, expect)
    assert toks0 == results[0].new_ids, (toks0, results[0].new_ids)

    # --- abort replicates through the tick broadcast: a long request
    # aborted mid-generation resolves partially on BOTH processes' loops
    toks_a = []
    fa = sched.submit([2, 9, 4], n_predict=50, on_token=toks_a.append)
    deadline = time.time() + 60
    while not toks_a and time.time() < deadline:
        time.sleep(0.005)
    assert toks_a, "no streamed tokens within 60s"
    sched.abort(fa.request_id)
    ra = fa.result(timeout=120)
    assert 0 < len(ra.new_ids) < 50, len(ra.new_ids)

    sched.close()
    print(f"DIST_SERVE_OK {pid}", flush=True)


def main() -> int:
    port, pid, mode = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    # optional process count (default 2): the 4-process dserve variant runs
    # 1 device/process over the same global 2x2 mesh — collective ordering
    # bugs that 2 processes can't expose (a tick participant per device)
    nproc = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    # The axon sitecustomize pins a TPU platform; this must be re-pinned
    # before any backend init (see tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

    from biogpt_tpu.parallel.distributed import initialize, is_primary

    if mode in ("api", "model", "dserve"):
        initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)

    if mode == "model":
        assert jax.process_count() == nproc and len(jax.devices()) == 4
        _model_checks(pid)
        return 0

    if mode == "dserve":
        assert jax.process_count() == nproc and len(jax.devices()) == 4
        _dserve_checks(pid)
        return 0

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
