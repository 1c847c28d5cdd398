"""CLIP BPE tokenizer algorithm tests over a tiny synthetic merges file.

The real `bpe_simple_vocab_16e6.txt.gz` is not shipped (user provides it, like the
reference's `clip` pip dependency does); these tests pin the algorithm: byte->unicode
table, word splitting, greedy rank merging, specials, padding contract.
"""

import gzip

import numpy as np
import pytest

from construction_clip_tpu.data.clip_tokenizer import (
    ClipTokenizer, byte_to_unicode, word_split, clean_text)


def test_byte_to_unicode_bijective():
    m = byte_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256
    assert m[ord("a")] == "a"  # printable ascii maps to itself


def test_word_split():
    assert word_split("hello world") == ["hello", "world"]
    assert word_split("it's 42!") == ["it", "'s", "4", "2", "!"]
    assert word_split("安全帽 missing") == ["安全帽", "missing"]
    assert word_split("a,b") == ["a", ",", "b"]


def test_clean_text():
    assert clean_text("  Hello   WORLD ") == "hello world"
    assert clean_text("a&amp;b") == "a&b"


@pytest.fixture()
def tok(tmp_path):
    merges = "version 0.1\nh e\nl l\nhe ll\nhell o</w>\no w</w>\n"
    p = tmp_path / "merges.txt.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write(merges)
    return ClipTokenizer(str(p), n_merges=None)


def test_vocab_layout(tok):
    # 256 bytes + 256 byte</w> + 5 merges + 2 specials
    assert tok.vocab_size == 256 + 256 + 5 + 2
    assert tok.eot == tok.vocab_size - 1
    assert tok.sot == tok.vocab_size - 2


def test_bpe_merging(tok):
    ids = tok.encode("hello")
    # h+e -> he, l+l -> ll, he+ll -> hell, hell+o</w> -> hello</w>
    assert len(ids) == 1
    assert tok.decoder[ids[0]] == "hello</w>"


def test_roundtrip(tok):
    ids = tok.encode("hello hello")
    assert tok.decode(ids) == "hello hello"


def test_tokenize_contract(tok):
    arr = tok.tokenize(["hello", "hello hello hello"], context_length=5)
    assert arr.shape == (2, 5)
    assert arr.dtype == np.int32
    assert arr[0, 0] == tok.sot
    assert arr[0, 2] == tok.eot
    assert arr[0, 3] == 0  # zero padding
    # truncation keeps EOT as the final token
    assert arr[1, -1] == tok.eot


def test_unicode_text(tok):
    # Chinese goes through the byte fallback — must roundtrip
    ids = tok.encode("墜落")
    assert tok.decode(ids) == "墜落"


def test_tokenize_accepts_generator(tok):
    # a one-shot iterable must not be consumed twice (regression: generators
    # used to yield an all-zero [0, L] array)
    gen_arr = tok.tokenize(t for t in ["hello", "ow"])
    list_arr = tok.tokenize(["hello", "ow"])
    np.testing.assert_array_equal(gen_arr, list_arr)
    assert gen_arr.shape[0] == 2


def test_openai_default_merge_count(tmp_path):
    """With a standard-size merges file (1 header + >=48894 merge lines) the default
    slice keeps exactly 49152-256-2 = 48894 merges, so vocab is 49408 and
    sot/eot land on 49406/49407 — the ids the pretrained OpenAI/HF text towers
    were trained with (embedding table rows must line up)."""
    lines = ["bpe version header"]
    # synthetic but well-formed merge lines, more than the slice keeps
    b2u = byte_to_unicode()
    syms = list(b2u.values())
    n_lines = 48894 + 50
    for i in range(n_lines):
        a, b = syms[i % len(syms)], syms[(i * 7 + 1) % len(syms)]
        lines.append(f"{a}{i} {b}</w>")
    p = tmp_path / "merges.txt"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    tok = ClipTokenizer(str(p))
    assert tok.vocab_size == 49408
    assert tok.sot == 49406
    assert tok.eot == 49407
