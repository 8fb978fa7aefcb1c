"""Model file format + converter + quantizer tests."""

import json
import os

import numpy as np
import pytest

from biogpt_tpu.config import BioGptConfig, FTYPE_BY_NAME
from biogpt_tpu.modelio import ggml_format
from biogpt_tpu.modelio.checkpoint import (
    load_params,
    params_from_state_dict,
    should_quantize,
)
from biogpt_tpu.modelio.synthetic import (
    make_char_vocab,
    make_state_dict,
    write_synthetic_model,
)
from biogpt_tpu.quant import codecs
from biogpt_tpu.quant.layouts import QuantizedTensor, from_planes
from biogpt_tpu.tools.quantize_cli import quantize_file


def test_file_roundtrip(tmp_path):
    path = tmp_path / "model.bin"
    config = write_synthetic_model(path, seed=1)
    rconfig, vocab, merges, tensors = ggml_format.read_model_file(path)
    assert rconfig.n_vocab == config.n_vocab
    assert rconfig.d_model == config.d_model
    assert rconfig.n_layer == config.n_layer
    assert len(vocab) == config.n_vocab
    sd = make_state_dict(config, seed=1)
    assert set(tensors) == set(sd)
    for name, arr in sd.items():
        np.testing.assert_array_equal(tensors[name].to_float32(), arr)


def test_f16_roundtrip(tmp_path):
    path = tmp_path / "model_f16.bin"
    config = write_synthetic_model(path, seed=2, use_f16=True)
    _, _, _, tensors = ggml_format.read_model_file(path)
    sd = make_state_dict(config, seed=2)
    for name, arr in sd.items():
        got = tensors[name].to_float32()
        if name.endswith(".weight") and arr.ndim == 2:
            assert tensors[name].ttype == codecs.GGML_TYPE_F16
            np.testing.assert_array_equal(got, arr.astype(np.float16).astype(np.float32))
        else:
            assert tensors[name].ttype == codecs.GGML_TYPE_F32
            np.testing.assert_array_equal(got, arr)


def test_bad_magic_rejected(tmp_path):
    path = tmp_path / "junk.bin"
    path.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        ggml_format.read_model_file(path)


def test_truncated_file_rejected(tmp_path):
    path = tmp_path / "model.bin"
    write_synthetic_model(path, seed=1)
    data = path.read_bytes()
    path.write_bytes(data[: len(data) - 100])
    with pytest.raises(EOFError):
        ggml_format.read_model_file(path)


def test_selection_rule():
    assert should_quantize("biogpt.embed_tokens.weight", (256, 64))
    assert should_quantize("output_projection.weight", (256, 64))
    assert not should_quantize("biogpt.layers.0.fc1.bias", (128,))
    assert not should_quantize("biogpt.layer_norm.weight", (64,))


@pytest.mark.parametrize("type_name", ["q4_0", "q5_1", "q8_0"])
def test_quantize_file_roundtrip(tmp_path, type_name):
    src = tmp_path / "f32.bin"
    dst = tmp_path / f"{type_name}.bin"
    config = write_synthetic_model(src, seed=3)
    stats = quantize_file(str(src), str(dst), type_name, verbose=False)
    assert stats["bytes_out"] < stats["bytes_in"]

    rconfig, _, _, tensors = ggml_format.read_model_file(dst)
    assert rconfig.ftype == FTYPE_BY_NAME[type_name]
    qtype = codecs.ggml_type_for_ftype(rconfig.ftype)
    sd = make_state_dict(config, seed=3)
    for name, arr in sd.items():
        arr = np.squeeze(arr)
        rec = tensors[name]
        if should_quantize(name, arr.shape):
            assert rec.ttype == qtype
            # bit-exact vs direct codec invocation
            expect = codecs.quantize_rows(arr, qtype)
            assert rec.data == expect
        else:
            assert rec.ttype == codecs.GGML_TYPE_F32
            np.testing.assert_array_equal(rec.to_float32(), arr)


def test_quantize_rejects_quantized_input(tmp_path):
    src = tmp_path / "f32.bin"
    mid = tmp_path / "q.bin"
    write_synthetic_model(src, seed=0)
    quantize_file(str(src), str(mid), "q4_0", verbose=False)
    with pytest.raises(ValueError, match="only f32/f16"):
        quantize_file(str(mid), str(tmp_path / "qq.bin"), "q8_0", verbose=False)


def test_quantize_rejects_kquants(tmp_path):
    src = tmp_path / "f32.bin"
    write_synthetic_model(src, seed=0)
    with pytest.raises(ValueError, match="unsupported quant type"):
        quantize_file(str(src), str(tmp_path / "x.bin"), "q4_k", verbose=False)


def test_load_params_dense(tmp_path):
    path = tmp_path / "model.bin"
    config = write_synthetic_model(path, seed=4)
    rconfig, vocab, merges, params = load_params(path)
    sd = make_state_dict(config, seed=4)
    assert params["embed_tokens"].shape == (config.n_vocab, config.d_model)
    np.testing.assert_array_equal(params["embed_tokens"], sd["biogpt.embed_tokens.weight"])
    # matmul weights are kernel-oriented (transposed)
    np.testing.assert_array_equal(
        params["layers"]["fc1"]["w"][0],
        sd["biogpt.layers.0.fc1.weight"].T,
    )
    np.testing.assert_array_equal(
        params["lm_head"], sd["output_projection.weight"].T
    )
    assert params["layers"]["fc1"]["w"].shape[0] == config.n_layer


def test_load_params_quantized(tmp_path):
    src = tmp_path / "f32.bin"
    dst = tmp_path / "q4_0.bin"
    config = write_synthetic_model(src, seed=5)
    quantize_file(str(src), str(dst), "q4_0", verbose=False)
    _, _, _, params = load_params(dst)

    qt = params["layers"]["q"]["w"]
    assert isinstance(qt, QuantizedTensor)
    assert qt.levels.shape == (config.n_layer, config.d_model, config.d_model)

    # plane dequant == codec dequant of the file bytes
    sd = make_state_dict(config, seed=5)
    w = sd["biogpt.layers.0.self_attn.q_proj.weight"]
    raw = codecs.quantize_rows(w, codecs.GGML_TYPE_Q4_0)
    expect = codecs.dequantize_rows(raw, w.shape, codecs.GGML_TYPE_Q4_0)
    from biogpt_tpu.modelio.checkpoint import layer_slice
    qt0 = layer_slice(qt, 0)
    np.testing.assert_array_equal(from_planes(qt0).T, expect)

    # embeddings stay row-major lookup planes
    emb = params["embed_tokens"]
    assert isinstance(emb, QuantizedTensor)
    assert emb.levels.shape == (config.n_vocab, config.d_model)
    # positions are always densified
    assert isinstance(params["embed_positions"], np.ndarray)


def test_params_from_state_dict_matches_file_path(tmp_path):
    config = BioGptConfig.tiny()
    sd = make_state_dict(config, seed=6)
    params_mem = params_from_state_dict(sd, config, qtype=codecs.GGML_TYPE_Q4_0)

    src = tmp_path / "f32.bin"
    dst = tmp_path / "q.bin"
    write_synthetic_model(src, config=config, seed=6)
    quantize_file(str(src), str(dst), "q4_0", verbose=False)
    _, _, _, params_file = load_params(dst)

    np.testing.assert_array_equal(
        np.asarray(params_mem["layers"]["fc2"]["w"].levels[1]),
        np.asarray(params_file["layers"]["fc2"]["w"].levels[1]),
    )
    np.testing.assert_array_equal(
        np.asarray(params_mem["embed_tokens"].scales),
        np.asarray(params_file["embed_tokens"].scales),
    )


def test_vocab_shortfall_padding(tmp_path):
    """A file whose vocab section is smaller than hparams.n_vocab gets
    padded with [_extra_token_N] entries (biogpt.cpp:105-112)."""
    config = BioGptConfig.tiny()
    vocab, merges = make_char_vocab(config.n_vocab - 10)
    path = tmp_path / "model.bin"
    ggml_format.write_model_file(path, config, vocab, merges, [])
    rconfig, rvocab, _, tensors = ggml_format.read_model_file(path)
    assert len(rvocab) == config.n_vocab
    assert f"[_extra_token_{config.n_vocab - 1}]" in rvocab
    assert tensors == {}  # vocab-only file loads fine


def test_state_dict_disk_cache_roundtrip(tmp_path, monkeypatch):
    """The full-size synthetic state dict memoizes to disk bit-exactly
    (the goldens test depends on cached == regenerated)."""
    from biogpt_tpu.modelio import synthetic

    monkeypatch.setattr(synthetic, "_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(synthetic, "_CACHE_MIN_PARAMS", 0)
    config = BioGptConfig.tiny()
    fresh = make_state_dict(config, seed=9, scale=0.05)
    cache_file = synthetic._sd_cache_path(config, 9, 0.05)
    assert cache_file.startswith(str(tmp_path))
    import os
    assert os.path.exists(cache_file)
    reloaded = make_state_dict(config, seed=9, scale=0.05)
    assert fresh.keys() == reloaded.keys()
    for k in fresh:
        np.testing.assert_array_equal(fresh[k], reloaded[k])
    # distinct seeds/scales get distinct keys
    assert synthetic._sd_cache_path(config, 9, 0.05) != \
        synthetic._sd_cache_path(config, 10, 0.05)
    assert synthetic._sd_cache_path(config, 9, 0.05) != \
        synthetic._sd_cache_path(config, 9, 0.1)


def test_synthetic_hf_dir_converts(tmp_path):
    """write_synthetic_hf_dir produces exactly what convert_hf consumes:
    the runbook's offline entry point (tools/fetch_weights.sh --synthetic)."""
    from biogpt_tpu.modelio.synthetic import write_synthetic_hf_dir
    from biogpt_tpu.tools.convert_hf import convert

    hf_dir = tmp_path / "hf"
    config = write_synthetic_hf_dir(hf_dir, seed=3)
    out = convert(hf_dir, tmp_path / "out", verbose=False)
    loaded_cfg, _, _, params = load_params(out)
    assert loaded_cfg.n_vocab == config.n_vocab
    assert loaded_cfg.n_layer == config.n_layer
    # values survive the torch.save -> convert -> ggml -> load round trip
    sd = make_state_dict(config, seed=3)
    np.testing.assert_allclose(
        np.asarray(params["layers"]["fc1"]["b"][0]),
        sd["biogpt.layers.0.fc1.bias"], rtol=0, atol=0)


def test_fetch_weights_script_offline(tmp_path):
    """The real-weights runbook's offline portion (steps 2-5) must stay
    executable: run tools/fetch_weights.sh --synthetic end to end (VERDICT
    r3 #7 — the recipe must not rot while the fetch stays blocked)."""
    import pathlib
    import subprocess

    repo = pathlib.Path(__file__).resolve().parent.parent
    env = dict(os.environ, FETCH_OUT=str(tmp_path / "w"),
               FETCH_PLATFORM="cpu", FETCH_FAMILIES="q4_0",
               FETCH_NPREDICT="4")
    proc = subprocess.run(
        ["bash", str(repo / "tools" / "fetch_weights.sh"), "--synthetic"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = tmp_path / "w"
    assert (out / "ggml-model.bin").exists()
    assert (out / "ggml-model-q4_0.bin").exists()
    assert (out / "ppl-f32.json").exists()
    assert (out / "ppl-q4_0.json").exists()
    assert "COVID-19 is" in (out / "demo-q4_0.txt").read_text()
