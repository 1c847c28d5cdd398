"""Tokenizer-training text corpus builder — port of reference corpus.py.

Reference pipeline (reference corpus.py:143-175): zh-wikipedia crawl (:24-48) +
safety-report PDFs (:50-120, 4 layout formats) + regulation PDFs (:122-141), all
tokenized with spaCy zh and filtered (:16-22: drop punctuation / latin / digits),
concatenated into output.txt.

This image has no network (crawler gated), no PyMuPDF (PDF extractors gated), no
spaCy (CJK char-run tokenization instead). The usable core — the token filter and
corpus assembly from text sources — is implemented; the gated collectors raise with
clear guidance.
"""

from __future__ import annotations

import unicodedata
from typing import Iterable, List


def filter_tokens(tokens: Iterable[str]) -> List[str]:
    """Keep CJK-content words: drop punctuation, pure-latin, digit tokens
    (reference corpus.py:16-22)."""
    out = []
    for t in tokens:
        t = t.strip()
        if not t:
            continue
        if all(unicodedata.category(c).startswith("P") for c in t):
            continue  # punctuation
        if all(("a" <= c.lower() <= "z") for c in t):
            continue  # latin
        if t.isdigit():
            continue
        out.append(t)
    return out


def tokenize_zh(text: str) -> List[str]:
    """CJK-run segmentation (spaCy zh unavailable): consecutive CJK chars group into
    word candidates; other scripts split on whitespace."""
    runs: List[str] = []
    cur = ""
    cur_cjk = None
    for ch in text:
        is_cjk = "一" <= ch <= "鿿"
        if ch.isspace():
            if cur:
                runs.append(cur)
            cur, cur_cjk = "", None
        elif cur_cjk is None or is_cjk == cur_cjk:
            cur += ch
            cur_cjk = is_cjk
        else:
            runs.append(cur)
            cur, cur_cjk = ch, is_cjk
    if cur:
        runs.append(cur)
    return filter_tokens(runs)


def corpus_from_texts(texts: Iterable[str]) -> List[str]:
    """Text blocks -> filtered token lines (one source line per output line)."""
    lines = []
    for t in texts:
        toks = tokenize_zh(t)
        if toks:
            lines.append(" ".join(toks))
    return lines


def corpus_from_annotations(json_path: str) -> List[str]:
    """Captions + violation lists from an annotation JSON -> corpus lines."""
    from construction_clip_tpu.data.schema import load_annotations

    texts = []
    for a in load_annotations(json_path):
        for t in (a.caption, a.violation_list):
            if t:
                texts.append(t)
    return corpus_from_texts(texts)


def write_corpus(lines: Iterable[str], out_path: str) -> int:
    n = 0
    with open(out_path, "w", encoding="utf-8") as f:
        for line in lines:
            f.write(line + "\n")
            n += 1
    return n


def crawl_wikipedia(*args, **kwargs):
    """zh-wikipedia BFS crawl (reference corpus.py:24-48). Gated: no network egress."""
    raise RuntimeError("wikipedia crawling requires network egress (none here); "
                       "feed pre-downloaded text via corpus_from_texts")


def safety_report_pdf(*args, **kwargs):
    """Safety-report PDF text (reference corpus.py:50-120). Gated on PyMuPDF."""
    try:
        import fitz  # noqa: F401
    except ImportError as e:
        raise ImportError("requires PyMuPDF (fitz), not in this image") from e
    raise NotImplementedError("report PDFs are proprietary; use corpus_from_texts")
