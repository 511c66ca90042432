"""C4-style line/document cleaning (Raffel et al. 2020 §2.2 — public
spec). The reference engine has no counterpart; this is the web-corpus
"heuristic cleaning" step of the training-data toolkit (SURVEY §2
"beyond the reference" operators).

Exact rules (the golden oracle mirrors them line-for-line):

- *lines* are maximal runs of non-``\\n`` bytes (empty lines vanish).
- A line is KEPT iff (a) its last byte is terminal punctuation
  (``.``, ``!``, ``?``, ``"``), (b) it has >= ``min_words``
  whitespace-separated words (whitespace = space/tab/CR), and (c) it
  does not contain the case-insensitive substring ``javascript``.
- ``text_clean`` = kept lines joined by ``\\n`` (bytes preserved —
  no case folding of the output).
- ``n_sentences`` = count of ``.``/``!``/``?`` bytes in text_clean.
- ``doc_kept`` = n_sentences >= ``min_sentences`` AND the ORIGINAL
  text contains no ``{`` and no case-insensitive ``lorem ipsum``.

Everything is computed on ONE flat byte buffer per batch: line/word
runs via diff, per-line word counts via bincount, punctuation counts
via one cumsum, substring rules via a single C-speed ``re.finditer``
over the whole buffer, and the rewrite itself is one fused
repeat-shift gather (the ml/tokens.py _chunk_batch trick) feeding a
zero-copy ``pa.StringArray.from_buffers`` — no per-row Python
anywhere, no shuffle (stateless map-only stage).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from vector_ray.expr import F
from vector_ray.stages.base import BatchStep

_TERMINAL = (0x2E, 0x21, 0x3F, 0x22)        # . ! ? "
_SENTENCE = (0x2E, 0x21, 0x3F)              # . ! ?
_WS = (0x20, 0x09, 0x0D, 0x0A)              # space tab CR (LF = line sep)
_JS_RE = re.compile(b"javascript")
_LOREM_RE = re.compile(b"lorem ipsum")


def c4_clean_batch(texts: list, *, min_words: int = 5,
                   min_sentences: int = 3) -> dict:
    """Vectorized per-doc C4 cleaning; returns dict of columns
    (text_clean: pa.StringArray, counters: np.int64, doc_kept: bool)."""
    n = len(texts)
    empty = {
        "text_clean": pa.array([""] * n, pa.string()),
        "n_lines": np.zeros(n, np.int64),
        "n_lines_kept": np.zeros(n, np.int64),
        "n_sentences": np.zeros(n, np.int64),
        "doc_kept": np.zeros(n, bool),
    }
    if n == 0:
        return empty
    bufs = [(t or "").encode("utf-8", "ignore") for t in texts]
    flat = np.frombuffer(b"\n".join(bufs) + b"\n", dtype=np.uint8)
    doc_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(np.fromiter((len(b) + 1 for b in bufs[:-1]), np.int64,
                          count=n - 1), out=doc_starts[1:])
    doc_ends = np.append(doc_starts[1:], len(flat)) - 1  # excl. sep \n

    def _runs(mask):
        # boundaries via shifted boolean views (no int8 temp + diff)
        starts = np.nonzero(mask & ~np.concatenate(([False], mask[:-1])))[0]
        ends = np.nonzero(mask & ~np.concatenate((mask[1:], [False])))[0]
        return starts, ends - starts + 1

    l_starts, l_lens = _runs(flat != 0x0A)
    if len(l_starts) == 0:
        return empty
    doc_of_line = np.searchsorted(doc_starts, l_starts, side="right") - 1
    n_lines = np.bincount(doc_of_line, minlength=n).astype(np.int64)

    # (a) terminal-punctuation last byte
    term_lut = np.zeros(256, bool)
    for b in _TERMINAL:
        term_lut[b] = True
    keep = term_lut[flat[l_starts + l_lens - 1]]

    # (b) per-line word count (non-whitespace byte runs; a word can
    # never cross a line because \n is whitespace)
    ws_lut = np.zeros(256, bool)
    for b in _WS:
        ws_lut[b] = True
    w_starts, _ = _runs(~ws_lut[flat])
    line_of_word = np.searchsorted(l_starts, w_starts, side="right") - 1
    wpl = np.bincount(line_of_word, minlength=len(l_starts))
    keep &= wpl >= min_words

    # (c) case-insensitive substring rules: ONE finditer over the
    # lowered buffer (patterns contain no \n, so a match never spans
    # lines or docs)
    lflat = flat.copy()
    up = (flat >= 0x41) & (flat <= 0x5A)
    lflat[up] += 32
    lbytes = lflat.tobytes()
    js_pos = np.fromiter((m.start() for m in _JS_RE.finditer(lbytes)),
                         np.int64)
    if len(js_pos):
        keep[np.unique(np.searchsorted(l_starts, js_pos, side="right") - 1)] \
            &= False

    # sentence-punct prefix sums (shared by per-line counts below)
    sent_lut = np.zeros(256, np.uint8)
    for b in _SENTENCE:
        sent_lut[b] = 1
    cs = np.empty(len(flat) + 1, np.int64)
    cs[0] = 0
    np.cumsum(sent_lut[flat], dtype=np.int64, out=cs[1:])

    k_starts, k_lens = l_starts[keep], l_lens[keep]
    k_doc = doc_of_line[keep]
    n_kept = np.bincount(k_doc, minlength=n).astype(np.int64)
    n_sent = np.bincount(
        k_doc, weights=(cs[k_starts + k_lens] - cs[k_starts]),
        minlength=n).astype(np.int64)

    # rewrite: gather kept line bytes + their following \n, trimming
    # the trailing \n of each doc's LAST kept line
    out_lens = k_lens + 1
    if len(k_doc):
        last_of_doc = np.ones(len(k_doc), bool)
        last_of_doc[:-1] = k_doc[1:] != k_doc[:-1]
        out_lens = out_lens - last_of_doc
    out_offs_line = np.zeros(len(k_starts) + 1, np.int64)
    np.cumsum(out_lens, out=out_offs_line[1:])
    total = int(out_offs_line[-1])
    shift = (k_starts - out_offs_line[:-1]).astype(np.int64)
    gather = np.repeat(shift, out_lens)
    gather += np.arange(total, dtype=np.int64)
    values = flat[gather] if total else np.empty(0, np.uint8)
    doc_out_lens = np.bincount(k_doc, weights=out_lens, minlength=n)
    doc_offs = np.zeros(n + 1, np.int64)
    np.cumsum(doc_out_lens.astype(np.int64), out=doc_offs[1:])
    text_clean = pa.StringArray.from_buffers(
        n, pa.py_buffer(doc_offs.astype(np.int32).tobytes()),
        pa.py_buffer(values.tobytes()))

    # doc-level rules on the ORIGINAL text
    brace_cs = np.empty(len(flat) + 1, np.int64)
    brace_cs[0] = 0
    np.cumsum(flat == 0x7B, dtype=np.int64, out=brace_cs[1:])
    has_brace = (brace_cs[doc_ends] - brace_cs[doc_starts]) > 0
    lorem_pos = np.fromiter(
        (m.start() for m in _LOREM_RE.finditer(lbytes)), np.int64)
    has_lorem = np.zeros(n, bool)
    if len(lorem_pos):
        has_lorem[np.unique(
            np.searchsorted(doc_starts, lorem_pos, side="right") - 1)] = True
    doc_kept = (n_sent >= min_sentences) & ~has_brace & ~has_lorem

    return {"text_clean": text_clean, "n_lines": n_lines,
            "n_lines_kept": n_kept, "n_sentences": n_sent,
            "doc_kept": doc_kept}


class C4Clean(BatchStep):
    """Append C4 cleaning outputs (``text_clean``, counters,
    ``doc_kept``); set ``drop=True`` to also filter to kept docs.
    Stateless map-only — compose before dedup/quality stages."""

    def __init__(self, field: str = "text", *, min_words: int = 5,
                 min_sentences: int = 3, drop: bool = False):
        self.field = field
        self.min_words = min_words
        self.min_sentences = min_sentences
        self.drop = drop

    def transform(self, tbl: pa.Table) -> pa.Table:
        cols = c4_clean_batch(tbl[self.field].to_pylist(),
                              min_words=self.min_words,
                              min_sentences=self.min_sentences)
        tbl = F.set_(tbl, "text_clean", cols["text_clean"])
        for k in ("n_lines", "n_lines_kept", "n_sentences"):
            tbl = F.set_(tbl, k, pa.array(cols[k], pa.int64()))
        tbl = F.set_(tbl, "doc_kept", pa.array(cols["doc_kept"]))
        if self.drop:
            tbl = tbl.filter(tbl["doc_kept"])
        return tbl
