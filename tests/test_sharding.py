"""Tensor/data-parallel sharding tests on the 8-virtual-device CPU mesh.

Checks that (a) sharded execution produces the same numbers as single-device
execution (mesh-degeneracy and TP-correctness), (b) weights actually land
sharded, (c) quantized plane shardings line up with their scale planes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding

from biogpt_tpu.config import BioGptConfig
from biogpt_tpu.modelio.checkpoint import params_from_state_dict
from biogpt_tpu.modelio.synthetic import make_state_dict
from biogpt_tpu.parallel import make_mesh, shard_params, param_pspecs
from biogpt_tpu.quant import codecs
from biogpt_tpu.runtime.engine import Engine

TINY = BioGptConfig.tiny()   # n_head=4, d_ff=128, d_model=64, vocab 256


@pytest.fixture(scope="module")
def tiny_params():
    sd = make_state_dict(TINY, seed=11)
    return params_from_state_dict(sd, TINY)


@pytest.fixture(scope="module")
def tiny_params_q4():
    sd = make_state_dict(TINY, seed=11)
    return params_from_state_dict(sd, TINY, qtype=codecs.GGML_TYPE_Q4_0)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("data,model", [(1, 1), (1, 4), (2, 4), (8, 1)])
def test_sharded_logits_match_single_device(tiny_params, data, model):
    ids = np.array([[2, 10, 25, 48, 7, 31, 5, 99]], dtype=np.int32)
    base = Engine(TINY, tiny_params, compute_dtype=jnp.float32).score(ids)
    mesh = make_mesh(data=data, model=model)
    sharded = Engine(TINY, tiny_params, compute_dtype=jnp.float32,
                     mesh=mesh).score(ids)
    np.testing.assert_allclose(sharded, base, rtol=2e-5, atol=2e-5)


def test_sharded_quantized_logits_match(tiny_params_q4):
    ids = np.array([[2, 10, 25, 48, 7, 31]], dtype=np.int32)
    # pack_q4=False: the mesh path never packs, so compare like-for-like
    base = Engine(TINY, tiny_params_q4, compute_dtype=jnp.float32,
                  pack_q4=False).score(ids)
    mesh = make_mesh(data=1, model=4)
    sharded = Engine(TINY, tiny_params_q4, compute_dtype=jnp.float32,
                     mesh=mesh).score(ids)
    np.testing.assert_allclose(sharded, base, rtol=2e-5, atol=2e-5)


def test_sharded_generation_matches(tiny_params):
    from biogpt_tpu.config import GenerationParams

    gen = GenerationParams(n_predict=8, temp=0.0, stop_at_eos=False)
    prompt = [2, 10, 25, 48]
    base = Engine(TINY, tiny_params, compute_dtype=jnp.float32)
    mesh = make_mesh(data=1, model=4)
    par = Engine(TINY, tiny_params, compute_dtype=jnp.float32, mesh=mesh)
    assert base.generate(prompt, gen).ids == par.generate(prompt, gen).ids


def test_weights_actually_sharded(tiny_params):
    mesh = make_mesh(data=1, model=4)
    sharded = shard_params(tiny_params, mesh)
    L = TINY.n_layer
    w = sharded["layers"]["fc1"]["w"]   # column-parallel (L, d_model, d_ff)
    assert isinstance(w.sharding, NamedSharding)
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(L, TINY.d_model, TINY.d_ff // 4)}
    w2 = sharded["layers"]["o"]["w"]    # row-parallel
    assert {s.data.shape for s in w2.addressable_shards} == \
        {(L, TINY.d_model // 4, TINY.d_model)}


def test_quantized_planes_shard_consistently(tiny_params_q4):
    mesh = make_mesh(data=1, model=4)
    sharded = shard_params(tiny_params_q4, mesh)
    L = TINY.n_layer
    qt = sharded["layers"]["fc2"]["w"]   # row-parallel: d_ff sharded
    lv_shapes = {s.data.shape for s in qt.levels.addressable_shards}
    sc_shapes = {s.data.shape for s in qt.scales.addressable_shards}
    assert lv_shapes == {(L, TINY.d_ff // 4, TINY.d_model)}
    assert sc_shapes == {(L, TINY.d_ff // 32 // 4, TINY.d_model)}


def test_spec_tree_matches_param_structure(tiny_params):
    specs = param_pspecs(tiny_params)
    assert set(specs) == set(tiny_params)
    assert set(specs["layers"]) == set(tiny_params["layers"])
