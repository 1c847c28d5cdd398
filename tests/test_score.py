"""Scoring: our BLEU must match nltk's sentence_bleu(method1) — the reference's
metric (reference CLIP_prefix_caption/score.py:8-25) — plus ROUGE sanity."""

import pytest

from construction_clip_tpu.infer.score import (
    sentence_bleu, char_bleu, rouge_n, rouge_l, score_pairs)


CASES = [
    ("工人未戴安全帽", "工人未戴安全帽"),
    ("工人未戴安全帽", "工人未配戴安全帽作業"),
    ("開口未設護欄", "安全網未設置"),
    ("施工架組配作業勞工未使用安全帶", "勞工未使用安全帶"),
    ("a cat on a mat", "a cat sat on the mat"),
]


def test_bleu_matches_nltk():
    nltk_bleu = pytest.importorskip("nltk.translate.bleu_score")
    sm = nltk_bleu.SmoothingFunction().method1
    for ref, hyp in CASES:
        expect = nltk_bleu.sentence_bleu([list(ref)], list(hyp), smoothing_function=sm)
        got = char_bleu(ref, hyp)
        assert abs(expect - got) < 1e-9, (ref, hyp, expect, got)


def test_bleu_identity_is_one():
    assert abs(char_bleu("工人未戴安全帽", "工人未戴安全帽") - 1.0) < 1e-9


def test_bleu_empty_hyp():
    assert char_bleu("abc", "") == 0.0


def test_rouge():
    assert rouge_l(list("abcdef"), list("abcdef")) == 1.0
    assert rouge_n(list("abcd"), list("dcba"), 1) == 1.0  # unigram bag equal
    assert rouge_n(list("abcd"), list("dcba"), 2) == 0.0
    assert 0 < rouge_l(list("工人未戴安全帽"), list("工人未配戴安全帽")) < 1


def test_score_pairs():
    out = score_pairs(CASES)
    assert out["n"] == 5
    assert 0 < out["bleu"] <= 1
    assert 0 < out["rougeL"] <= 1
