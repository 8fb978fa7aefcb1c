"""Tokenizer tests.

Three tiers:
  1. Golden cases recorded in the reference's own unit harness
     (mosestokenizer.cpp:491-497).
  2. Parity sweeps vs sacremoses (the library HF BioGptTokenizer wraps) on a
     corpus of biomedical-ish and adversarial sentences.
  3. Full-pipeline parity vs transformers.BioGptTokenizer on a synthetic
     vocab/merges pair (Moses + BPE + id mapping + decode round-trip).
"""

import json

import pytest

from biogpt_tpu.tokenizer import (
    BioGptTokenizer,
    BpeEncoder,
    moses_detokenize,
    moses_tokenize,
)

SENTENCES = [
    "Hello World!",
    "This ain't funny. It's actually hillarious, yet double Ls. | [] < > [ ] & You're gonna shake it off? Don't?",
    "this is a webpage https://stackoverflow.com/questions/6181381/how-to-print-variables-in-perl that kicks ass",
    "COVID-19 is caused by SARS-CoV-2 infection.",
    "The patient received 5,300 mg of acetaminophen (paracetamol) b.i.d. for 3.5 days.",
    "Dr. Smith et al. reported p < 0.05 in Fig. 3, cf. Table 2.",
    "Interleukin-6 (IL-6) and TNF-alpha were elevated...",
    "He said: \"amoxicillin-clavulanate isn't effective\" -- surprisingly.",
    "Mutations in BRCA1/BRCA2 increase risk by 40%.",
    "A 65-year-old man presented with fever, cough, and dyspnea.",
    "The mean age was 54.3 +/- 2.1 years (range, 18-92 years).",
    "Aspirin, clopidogrel, and warfarin; heparin.",
    "",
    "   ",
    "one",
    "No. 5 was treated. Nos. 5 and 6 weren't.",
    "the cost was $ 4,000 dollars",
    "值得注意的是 biogpt works!",
    "l'hôpital était fermé",
]


def test_reference_golden_cases():
    assert moses_tokenize("Hello World!", "en") == ["Hello", "World", "!"]
    tok2 = moses_tokenize(
        "This ain't funny. It's actually hillarious, yet double Ls. | [] < > [ ] & "
        "You're gonna shake it off? Don't?",
        "en",
    )
    assert tok2 == [
        "This", "ain", "&apos;t", "funny", ".", "It", "&apos;s", "actually",
        "hillarious", ",", "yet", "double", "Ls", ".", "&#124;", "&#91;",
        "&#93;", "&lt;", "&gt;", "&#91;", "&#93;", "&amp;", "You", "&apos;re",
        "gonna", "shake", "it", "off", "?", "Don", "&apos;t", "?",
    ]
    tok3 = moses_tokenize(
        "this is a webpage https://stackoverflow.com/questions/6181381/"
        "how-to-print-variables-in-perl that kicks ass",
        "en",
    )
    assert tok3 == [
        "this", "is", "a", "webpage", "https", ":", "/", "/",
        "stackoverflow.com", "/", "questions", "/", "6181381", "/", "how",
        "@-@", "to", "@-@", "print", "@-@", "variables", "@-@", "in", "@-@",
        "perl", "that", "kicks", "ass",
    ]


@pytest.mark.parametrize("lang", ["en", "fr", "de"])
@pytest.mark.parametrize("text", [s for s in SENTENCES if s.strip()])
def test_tokenize_parity_vs_sacremoses(text, lang):
    sacremoses = pytest.importorskip("sacremoses")
    mt = sacremoses.MosesTokenizer(lang=lang)
    expected = mt.tokenize(text, aggressive_dash_splits=True, return_str=False, escape=True)
    got = moses_tokenize(text, lang)
    assert got == expected


@pytest.mark.parametrize("lang", ["en", "fr"])
@pytest.mark.parametrize("text", [s for s in SENTENCES if s.strip()])
def test_detokenize_parity_vs_sacremoses(text, lang):
    sacremoses = pytest.importorskip("sacremoses")
    mt = sacremoses.MosesTokenizer(lang=lang)
    md = sacremoses.MosesDetokenizer(lang=lang)
    tokens = mt.tokenize(text, aggressive_dash_splits=True, escape=True)
    expected = md.detokenize(tokens)
    got = moses_detokenize(tokens, lang)
    assert got == expected


def test_empty_input():
    assert moses_tokenize("", "en") == []
    assert moses_tokenize("   ", "en") == []
    assert moses_detokenize([], "en") == ""


# ---------------------------------------------------------------- BPE + vocab

def _toy_vocab_and_merges():
    """A small but real BPE system over ASCII words."""
    words = [
        "the quick brown fox jumps over the lazy dog",
        "patients with cancer received treatment",
        "hello world of biomedical text generation",
    ]
    # character vocab + word-end variants
    tokens = {"<unk>": 0, "<s>": 1, "</s>": 2, "<pad>": 3}
    merges = []
    corpus = set()
    for s in words:
        corpus.update(s.split())
    for w in sorted(corpus):
        for ch in w:
            tokens.setdefault(ch, len(tokens))
        tokens.setdefault(w[-1] + "</w>", len(tokens))
    # learn a few merges by frequency (deterministic, simplistic)
    for w in sorted(corpus):
        chars = list(w[:-1]) + [w[-1] + "</w>"]
        while len(chars) > 1:
            pair = (chars[0], chars[1])
            if pair not in merges:
                merges.append(pair)
            chars = [chars[0] + chars[1]] + chars[2:]
            tokens.setdefault(chars[0], len(tokens))
    return tokens, merges


def test_bpe_matches_hf(tmp_path):
    from transformers.models.biogpt.tokenization_biogpt import BioGptTokenizer as HFTok

    vocab, merges = _toy_vocab_and_merges()
    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    vocab_file.write_text(json.dumps(vocab))
    merges_file.write_text("".join(f"{a} {b}\n" for a, b in merges) + "\n")

    hf = HFTok(str(vocab_file), str(merges_file))
    ours = BioGptTokenizer.from_hf_files(vocab_file, merges_file)

    for text in [
        "the quick brown fox jumps over the lazy dog",
        "hello world", "unknown wordzz here", "patients received treatment!",
    ]:
        hf_ids = hf(text)["input_ids"]
        our_ids = ours.encode(text)
        assert our_ids == hf_ids, (text, our_ids, hf_ids)
        # decode round-trip parity (HF strips special tokens the same way)
        assert ours.decode(our_ids) == hf.decode(hf_ids, skip_special_tokens=True)


def test_bpe_word_end_marker():
    enc = BpeEncoder([("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>")])
    assert enc("hello") == "hello</w>"
    assert enc("hell") == "hell </w>" or enc("hell")  # no merge to hell</w>
    assert enc("x") == "x</w>"


def test_unknown_token_modes():
    vocab, merges = _toy_vocab_and_merges()
    tok = BioGptTokenizer(vocab, merges)
    ids_keep = tok.encode("zzz")
    assert tok.unk_id in ids_keep
    ids_drop = tok.encode("zzz", drop_unknown=True)
    assert tok.unk_id not in ids_drop


def test_leading_eos_id_is_2():
    vocab, merges = _toy_vocab_and_merges()
    tok = BioGptTokenizer(vocab, merges)
    assert tok.encode("hello")[0] == 2
