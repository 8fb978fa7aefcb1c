"""Generation CLI tests: flags, end-to-end generation, error paths."""

import numpy as np
import pytest

from biogpt_tpu.cli import build_argparser, main
from biogpt_tpu.modelio.synthetic import write_synthetic_model


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "model.bin"
    write_synthetic_model(path, seed=3)
    return str(path)


def test_argparser_reference_flags():
    p = build_argparser()
    args = p.parse_args(["-m", "x.bin", "-p", "hello", "-s", "7", "-n", "12",
                         "--top_k", "10", "--top_p", "0.5", "--temp", "0.7",
                         "-b", "4", "-t", "2", "-l", "fr", "-v", "1"])
    assert args.model == "x.bin" and args.prompt == "hello"
    assert args.seed == 7 and args.n_predict == 12
    assert args.lang == "fr"          # reference bug Q3 fixed: -l sets lang
    assert args.top_k == 10 and args.top_p == 0.5 and args.temp == 0.7


def test_cli_greedy_end_to_end(model_path, capsys):
    rc = main(["-m", model_path, "-p", "the internet and", "-n", "4",
               "--temp", "0", "--dtype", "f32"])
    assert rc == 0
    out = capsys.readouterr()
    assert "the internet and" in out.out       # detokenized output printed
    assert "predict time" in out.err           # reference-style report


def test_cli_sampled_deterministic_seed(model_path, capsys):
    main(["-m", model_path, "-p", "hello", "-n", "4", "--temp", "0.8",
          "-s", "11", "--dtype", "f32"])
    first = capsys.readouterr().out
    main(["-m", model_path, "-p", "hello", "-n", "4", "--temp", "0.8",
          "-s", "11", "--dtype", "f32"])
    second = capsys.readouterr().out
    assert first == second


def test_cli_stream_mode(model_path, capsys):
    rc = main(["-m", model_path, "-p", "hello", "-n", "3", "--temp", "0",
               "--dtype", "f32", "--stream"])
    assert rc == 0


def test_cli_missing_model(capsys):
    # clean error + nonzero exit, not a traceback (reference biogpt.cpp:35-48
    # prints "failed to open" and returns)
    rc = main(["-m", "/nonexistent/model.bin", "-p", "x"])
    assert rc == 1
    assert "failed to open" in capsys.readouterr().err


def test_cli_poisoned_checkpoint_fails_fast(tmp_path, capsys):
    """NaN weights exit 1 with a clean error naming the tensor BEFORE any
    token is generated (the reference streams garbage; SURVEY §5 has no
    failure detection)."""
    from biogpt_tpu.config import BioGptConfig
    from biogpt_tpu.modelio import ggml_format
    from biogpt_tpu.modelio.synthetic import make_char_vocab, make_state_dict

    cfg = BioGptConfig.tiny()
    vocab, merges = make_char_vocab(cfg.n_vocab)
    sd = make_state_dict(cfg, seed=5)
    name = "biogpt.layers.0.fc1.weight"
    sd[name] = np.asarray(sd[name]).copy()
    sd[name][0, 0] = np.nan
    path = tmp_path / "poisoned.bin"
    ggml_format.write_model_file(
        path, cfg, vocab, merges,
        (ggml_format.tensor_record_from_array(n, a) for n, a in sd.items()))

    rc = main(["-m", str(path), "-p", "hello", "-n", "4", "--temp", "0",
               "--dtype", "f32"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "non-finite" in err and "fc1" in err


def test_prompt_fills_context_clean_error(model_path, capsys):
    """A prompt with no room to generate exits 1 with a clean message
    (reference crashes ungracefully past n_positions)."""
    from biogpt_tpu.cli import main

    long_prompt = "the meaning of life " * 40
    rc = main(["-m", model_path, "-p", long_prompt, "-n", "4",
               "--temp", "0", "--warmup", "0"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "no room to generate" in err
