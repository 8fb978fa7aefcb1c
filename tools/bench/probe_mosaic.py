"""Probe Mosaic/TPU capabilities that the decode megakernel design relies on.

Throwaway diagnostic (not part of the package): run on the real chip.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices())


def probe(name, fn):
    try:
        out = fn()
        print(f"PASS {name}: {out}")
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:300]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")


# P1: scratch persistence across grid steps (accumulator carry)
def p1():
    def kern(x_ref, o_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        acc[:] += x_ref[:]

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc[:]

    x = jnp.arange(4 * 8 * 128, dtype=jnp.float32).reshape(4, 8, 128)
    out = pl.pallas_call(
        kern,
        grid=(4,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 8, 128), jnp.float32)],
    )(x)
    expect = x.sum(axis=0, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect))
    return "scratch carries across grid steps"


# P2: NT matmul (A @ B^T) via dot_general contracting (1,1)
def p2():
    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    a = jnp.asarray(np.random.randn(16, 64), jnp.bfloat16)
    b = jnp.asarray(np.random.randn(128, 64), jnp.bfloat16)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
    )(a, b)
    expect = a.astype(jnp.float32) @ b.astype(jnp.float32).T
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=2e-2, atol=2e-2)
    return "NT dot_general OK"


# P3: erf (exact gelu) in-kernel
def p3():
    def kern(x_ref, o_ref):
        o_ref[:] = jax.nn.gelu(x_ref[:], approximate=False)

    x = jnp.asarray(np.random.randn(8, 128), jnp.float32)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)
    expect = jax.nn.gelu(x, approximate=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)
    return "erf/gelu exact OK"


# P4: VMEM ceiling — allocate increasing scratch with a high limit
def p4():
    results = []
    for mb in (16, 24, 32, 48, 64, 96, 110, 120):
        try:
            n = mb * 1024 * 1024 // 4 // 512
            def kern(x_ref, o_ref, big):
                big[0, :] = x_ref[0, :].astype(jnp.float32)
                o_ref[:] = big[0:8, 0:128].astype(jnp.float32)

            out = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((n, 512), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=128 * 1024 * 1024),
            )(jnp.ones((8, 512), jnp.float32))
            jax.block_until_ready(out)
            results.append(f"{mb}MB:OK")
        except Exception as e:
            results.append(f"{mb}MB:FAIL({str(e)[:60]})")
            break
    return " ".join(results)


# P5: reduction across sublanes (16, 1024) -> (1, 1024)
def p5():
    def kern(x_ref, o_ref):
        o_ref[:] = jnp.sum(x_ref[:], axis=0, keepdims=True)

    x = jnp.asarray(np.random.randn(16, 1024), jnp.float32)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.float32),
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x.sum(0)[None]),
                               rtol=1e-5, atol=1e-4)
    return "sublane reduction OK"


# P6: full LN on (1, D) rows in-kernel (lane reduction to scalar)
def p6():
    def kern(x_ref, o_ref):
        x = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        o_ref[:] = (x - mean) * jax.lax.rsqrt(var + 1e-5)

    x = jnp.asarray(np.random.randn(1, 1024), jnp.float32)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.float32),
    )(x)
    x32 = np.asarray(x, np.float32)
    expect = (x32 - x32.mean()) / np.sqrt(x32.var() + 1e-5)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)
    return "(1,D) layernorm OK"


probe("P1 scratch-carry", p1)
probe("P2 NT-matmul", p2)
probe("P3 erf-gelu", p3)
probe("P5 sublane-reduce", p5)
probe("P6 row-layernorm", p6)
probe("P4 vmem-ceiling", p4)
