"""Mechanism probe: in-kernel KV row commit vs XLA per-slot DUS.

The B=32 step pays 0.58 ms/step for 2*B dynamic_update_slice cache-row
writes (bench_step32.py). The candidate replacement: the kernel takes
the cache as an ANY-space input ALIASED to an output, reads its KV
blocks with manual double-buffered whole-batch DMAs (the lockstep
pattern, NOT the per-slot paged pattern that lost at B=32), accumulates
every layer's new row in VMEM scratch, and at the last grid step issues
ONE strided DMA per (tensor, slot) writing all L rows at that slot's
position.

This probe isolates the mechanism with a fake compute body (block reads
+ a dot per block, then row writes), comparing:
  a) BlockSpec-pipelined reads + XLA DUS writes     (current structure)
  b) manual-DMA reads + in-kernel final row commit  (candidate)
run under a 16-step scan at L=24, B=32, W=128, D=1024 — the shape whose
write cost we measured. Values are checked equal first (interpret-mode
equivalence is covered by construction; here we compare on-device).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import functools
import time

import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/biogpt_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

L, B, W, D = 24, 32, 128, 1024
SEQ = 512
KVB = 128
nW = W // KVB
STEPS = 16


# ---------------------------------------------------------- (a) current
def kernel_a(past_ref, x_ref, kc_ref, out_ref, krow_ref, acc):
    lyr = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        @pl.when(lyr == 0)
        def _():
            acc[:] = x_ref[:]

    blk = kc_ref[0, 0]                       # (B*KVB?, ...) see spec below
    # fake compute: one dot against the block per grid step
    acc[:] = acc[:] + jnp.dot(
        acc[:].astype(jnp.bfloat16),
        jnp.sum(kc_ref[0], axis=1).astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32)[:, :1] * 1e-9

    @pl.when(j == nW - 1)
    def _():
        krow_ref[0] = acc[:].astype(krow_ref.dtype)

        @pl.when(lyr == L - 1)
        def _():
            out_ref[:] = acc[:]


def step_a(x, k, past):
    kv_spec = pl.BlockSpec((1, B, KVB, D), lambda l, j: (l, 0, j, 0),
                           memory_space=pltpu.VMEM)
    out, krows = pl.pallas_call(
        kernel_a,
        grid=(L, nW),
        in_specs=[pl.BlockSpec((1, B), lambda l, j: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((B, D), lambda l, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  kv_spec],
        out_specs=[pl.BlockSpec((B, D), lambda l, j: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, B, D), lambda l, j: (l, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, D), jnp.float32),
                   jax.ShapeDtypeStruct((L, B, D), k.dtype)],
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(past.reshape(1, B), x, k)
    zero = jnp.zeros((), jnp.int32)
    for b in range(B):
        k = jax.lax.dynamic_update_slice(
            k, krows[:, b:b + 1].reshape(L, 1, 1, D).astype(k.dtype),
            (zero, jnp.int32(b), past[b], zero))
    return out, k


# -------------------------------------------------- (b) in-kernel commit
def kernel_b(past_ref, x_ref, kc_ref, out_ref, kc_out_ref, acc, rows,
             rows_t, kbuf, sem):
    # kc_ref (input) and kc_out_ref (output) alias the same HBM buffer
    # (input_output_aliases): blocks read through the input ref, row
    # commits write through the output ref.
    lyr = pl.program_id(0)

    @pl.when(lyr == 0)
    def _():
        acc[:] = x_ref[:]

    def cp(j, slot):
        return pltpu.make_async_copy(
            kc_ref.at[lyr, :, pl.ds(j * KVB, KVB), :],
            kbuf.at[slot], sem.at[slot])

    cp(0, 0).start()

    def body(j, carry):
        a = carry
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nW)
        def _():
            cp(j + 1, jax.lax.rem(j + 1, 2)).start()

        cp(j, slot).wait()
        a = a + jnp.dot(
            a.astype(jnp.bfloat16),
            jnp.sum(kbuf[slot], axis=1).astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32)[:, :1] * 1e-9
        return a

    acc[:] = jax.lax.fori_loop(0, nW, body, acc[:])
    # per-layer row lands via a dim-0 (major) write — aligned; per-slot
    # extraction from (L, B, D) would slice the tiled B dim (misaligned,
    # Mosaic rejects), hence the transpose staging below
    rows[lyr] = acc[:].astype(rows.dtype)

    @pl.when(lyr == L - 1)
    def _():
        out_ref[:] = acc[:]
        # one full-ref transpose so the slot dim becomes MAJOR (dim-0
        # collapses are the only aligned per-slot slices), then one
        # strided DMA per slot writes all L rows at that slot's position
        rows_t[:] = jnp.transpose(rows[:], (1, 0, 2))
        for b in range(B):
            cp = pltpu.make_async_copy(
                rows_t.at[b],
                kc_out_ref.at[:, b, past_ref[0, b], :],
                sem.at[0])
            cp.start()
            cp.wait()


def step_b(x, k, past):
    out, k = pl.pallas_call(
        kernel_b,
        grid=(L,),
        in_specs=[pl.BlockSpec((1, B), lambda l: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((B, D), lambda l: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec((B, D), lambda l: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.ANY)],
        out_shape=[jax.ShapeDtypeStruct((B, D), jnp.float32),
                   jax.ShapeDtypeStruct(k.shape, k.dtype)],
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32),
                        pltpu.VMEM((L, B, D), k.dtype),
                        pltpu.VMEM((B, L, D), k.dtype),
                        pltpu.VMEM((2, B, KVB, D), k.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        input_output_aliases={2: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(past.reshape(1, B), x, k)
    return out, k


def bench(name, step):
    def scan(x, k, past):
        def body(carry, _):
            x, k, past = carry
            x, k = step(x, k, past)
            return (x, k, past + 1), None
        (x, k, past), _ = jax.lax.scan(body, (x, k, past), None,
                                       length=STEPS)
        return x, k

    jfn = jax.jit(scan)
    x = jnp.ones((B, D), jnp.float32)
    k = jnp.zeros((L, B, SEQ, D), jnp.bfloat16)
    past = jnp.full((B,), 64, jnp.int32)
    jax.block_until_ready(jfn(x, k, past))

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = jfn(x, k, past)
        jax.block_until_ready(o)
        return time.perf_counter() - t0

    run(4)
    samples = []
    for _ in range(3):
        t_s, t_l = run(4), run(12)
        samples.append((t_l - t_s) / 8 / STEPS)
    per = sorted(samples)[1]
    print(f"{name:32s}: {per*1e3:7.3f} ms/step "
          f"[{min(samples)*1e3:.3f}-{max(samples)*1e3:.3f}]", flush=True)
    return per


if __name__ == "__main__":
    # value check: both paths write identical rows
    x = jnp.ones((B, D), jnp.float32)
    k0 = jnp.zeros((L, B, SEQ, D), jnp.bfloat16)
    past = jnp.arange(B, dtype=jnp.int32) + 32
    oa, ka = jax.jit(step_a)(x, k0, past)
    ob, kb = jax.jit(step_b)(x, k0, past)
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(ka, np.float32), np.asarray(kb, np.float32))
    print("values equal", flush=True)
    bench("(a) BlockSpec reads + XLA DUS", step_a)
    bench("(b) manual DMA + in-kernel commit", step_b)
