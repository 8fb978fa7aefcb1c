"""Multi-process runtime bring-up (parallel/distributed.py), on CPU.

Spawns two real processes that form a jax.distributed cluster over
localhost, run a cross-process collective, and execute a jitted reduction
over a global 2x2 ("data", "model") mesh — the CPU stand-in for the
multi-host pod bring-up the reference lacks entirely (SURVEY §2.1-2.2).

Process 0 goes through the module launcher CLI
(``python -m biogpt_tpu.parallel.distributed``) so ``main()`` is covered;
process 1 calls ``initialize()`` directly.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_dist_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(devices_per_proc: int = 2) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # virtual CPU devices per process (fresh value: the parent's 8-device
    # flag must not leak through)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={devices_per_proc}"])
    return env


def test_two_process_cluster_runs_collectives():
    port = _free_port()
    env = _env()
    p0 = subprocess.Popen(
        [sys.executable, "-m", "biogpt_tpu.parallel.distributed",
         "--coordinator", f"localhost:{port}", "--num-processes", "2",
         "--process-id", "0", "--", WORKER, str(port), "0", "launcher"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    p1 = subprocess.Popen(
        [sys.executable, WORKER, str(port), "1", "api"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    try:
        out0, _ = p0.communicate(timeout=240)
        out1, _ = p1.communicate(timeout=240)
    except subprocess.TimeoutExpired:
        p0.kill()
        p1.kill()
        raise
    assert p0.returncode == 0, out0
    assert p1.returncode == 0, out1
    assert "DIST_OK 0" in out0, out0
    assert "DIST_OK 1" in out1, out1


def test_two_process_model_generation():
    """THE multi-host check (SURVEY §2.1(d)): the full engine and the
    continuous-batching server run over a global 2x2 mesh spanning two
    real processes — every decode step's TP collectives cross the process
    boundary — and produce tokens identical to a single-device run."""
    port = _free_port()
    env = _env()
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), str(i), "model"],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, out
        assert f"DIST_MODEL_OK {i}" in out, out


def test_two_process_distributed_scheduler():
    """Multi-host serving with ONE front door: process 0 submits live
    requests (futures, streaming), DistributedScheduler replicates the
    stream via its tick broadcast, both processes run the SPMD serve loop
    in lockstep, and process 0's results match single-device generation."""
    port = _free_port()
    env = _env()
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), str(i), "dserve"],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, out
        assert f"DIST_SERVE_OK {i}" in out, out


def test_four_process_distributed_scheduler():
    """The dserve lockstep at pod-like process count: FOUR processes with
    one device each over the same global 2x2 mesh. Every tick broadcast
    and decision_sync now has four participants — collective-ordering
    bugs (a worker joining a tick one iteration late, a decision_sync
    racing a tick) that two processes cannot expose show up here."""
    port = _free_port()
    env = _env(devices_per_proc=1)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), str(i), "dserve", "4"],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(4)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, out
        assert f"DIST_SERVE_OK {i}" in out, out


def test_initialize_noop_single_process():
    """num_processes <= 1 must not touch the distributed runtime (the
    single-host path calls this unconditionally)."""
    from biogpt_tpu.parallel.distributed import initialize

    initialize(num_processes=1)   # no-op; would raise if it tried to init
