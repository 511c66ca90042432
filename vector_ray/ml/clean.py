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
    if n == 0:
        return _c4_core(np.empty(0, np.uint8), np.empty(0, np.int64), 0,
                        min_words=min_words, min_sentences=min_sentences)
    bufs = [(t or "").encode("utf-8", "ignore") for t in texts]
    flat = np.frombuffer(b"\n".join(bufs) + b"\n", dtype=np.uint8)
    doc_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(np.fromiter((len(b) + 1 for b in bufs[:-1]), np.int64,
                          count=n - 1), out=doc_starts[1:])
    return _c4_core(flat, doc_starts, n, min_words=min_words,
                    min_sentences=min_sentences)


def c4_clean_col(col, *, min_words: int = 5, min_sentences: int = 3) -> dict:
    """``c4_clean_batch`` off an Arrow string column — the
    ``\\n``-joined flat buffer comes from ``_flat_joined`` (no
    ``to_pylist``/encode), results bit-identical to the list path."""
    flat, doc_starts, n = _flat_joined(col, 0x0A)
    return _c4_core(flat, doc_starts, n, min_words=min_words,
                    min_sentences=min_sentences)


def _c4_core(flat: np.ndarray, doc_starts: np.ndarray, n: int, *,
             min_words: int, min_sentences: int) -> dict:
    empty = {
        "text_clean": pa.array([""] * n, pa.string()),
        "n_lines": np.zeros(n, np.int64),
        "n_lines_kept": np.zeros(n, np.int64),
        "n_sentences": np.zeros(n, np.int64),
        "doc_kept": np.zeros(n, bool),
    }
    if n == 0:
        return empty
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
        cols = c4_clean_col(tbl[self.field],
                            min_words=self.min_words,
                            min_sentences=self.min_sentences)
        tbl = F.set_(tbl, "text_clean", cols["text_clean"])
        for k in ("n_lines", "n_lines_kept", "n_sentences"):
            tbl = F.set_(tbl, k, pa.array(cols[k], pa.int64()))
        tbl = F.set_(tbl, "doc_kept", pa.array(cols["doc_kept"]))
        if self.drop:
            tbl = tbl.filter(tbl["doc_kept"])
        return tbl


# ---------------------------------------------------------------------------
# line_dedup — corpus-wide duplicated-line removal (the RefinedWeb /
# MassiveText "line dedup" curation step: boilerplate lines — cookie
# banners, nav bars, footers — repeat across millions of pages and are
# removed from EVERY document; Penedo et al. 2023 §4.2, public spec).
# The reference engine has no counterpart (SURVEY §2 "beyond the
# reference"); its `dedupe` transform is whole-event, not intra-text.


def _line_index(texts: list):
    """Vectorized line index over a batch: ONE flat byte buffer, lines
    as maximal non-``\\n`` runs (empty lines vanish, as in
    ``c4_clean_batch``). Returns ``(flat, l_starts, l_lens,
    doc_of_line, line_no, doc_starts, n)`` where ``line_no`` is the
    1-based ordinal of the line among the doc's ``split('\\n')`` parts
    *including* empty parts — i.e. SQL ``string_split`` ordinality, so
    oracle comparisons line up exactly."""
    n = len(texts)
    bufs = [(t or "").encode("utf-8", "ignore") for t in texts]
    flat = np.frombuffer(b"\n".join(bufs) + b"\n", dtype=np.uint8)
    doc_starts = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(np.fromiter((len(b) + 1 for b in bufs[:-1]), np.int64,
                              count=n - 1), out=doc_starts[1:])
    mask = flat != 0x0A
    l_starts = np.nonzero(mask & ~np.concatenate(([False], mask[:-1])))[0]
    l_ends = np.nonzero(mask & ~np.concatenate((mask[1:], [False])))[0]
    l_lens = l_ends - l_starts + 1
    doc_of_line = np.searchsorted(doc_starts, l_starts, side="right") - 1
    nl_cs = np.empty(len(flat) + 1, np.int64)
    nl_cs[0] = 0
    np.cumsum(flat == 0x0A, dtype=np.int64, out=nl_cs[1:])
    line_no = nl_cs[l_starts] - nl_cs[doc_starts[doc_of_line]] + 1
    return flat, l_starts, l_lens, doc_of_line, line_no, doc_starts, n


def _flat_joined(col, sep: int):
    """The ``sep.join(encoded_docs) + sep`` flat buffer (one ``sep``
    byte after EVERY doc) built straight off the Arrow string values
    buffer — no ``to_pylist``, no per-doc encode: one fused
    repeat-shift gather + a separator scatter. Null docs behave as
    empty. Returns ``(flat, doc_starts, n)`` — the exact construction
    ``_line_index`` / ``_para_index`` / ``c4_clean_batch`` perform on
    Python strings, at buffer speed."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    from vector_ray.expr.kernels import _flat_utf8

    arr, data, offs = _flat_utf8(arr)
    n = len(arr)
    lo = int(offs[0])
    data = data[lo:int(offs[-1])]
    offs = offs - lo
    lens = np.diff(offs)
    if arr.null_count:
        import pyarrow.compute as pc

        valid = np.asarray(pc.is_valid(arr).to_numpy(zero_copy_only=False))
        lens = np.where(valid, lens, 0)
    out_lens = lens + 1
    out_offs = np.zeros(n + 1, np.int64)
    np.cumsum(out_lens, out=out_offs[1:])
    total = int(out_offs[-1])
    gather = np.repeat(offs[:-1] - out_offs[:-1], out_lens)
    gather += np.arange(total, dtype=np.int64)
    # each doc's separator slot reads one-past-end garbage — clip the
    # index for memory safety, then overwrite every separator slot
    if len(data):
        flat = data[np.minimum(gather, len(data) - 1)]
    else:
        flat = np.empty(total, np.uint8)
    flat[out_offs[1:] - 1] = sep
    return flat, out_offs[:-1], n


def _line_index_arrow(col):
    """Zero-copy variant of ``_line_index`` for the hot count/probe
    passes (unit="line"): line runs are computed directly on the Arrow
    string values buffer — no ``to_pylist``, no per-doc encode, no
    re-join (measured ~3x on the 200k-doc bench corpus). Doc
    boundaries come from the Arrow offsets; a byte is a line start iff
    it is non-``\\n`` and (preceded by ``\\n`` or at a doc start), a
    line end iff non-``\\n`` and (followed by ``\\n`` or at a doc
    end), so runs can never cross documents even with no separator
    byte between them. Null docs behave as empty (same as
    ``_line_index``'s ``(t or "")``). The "+1 trailing byte" rebuild
    gather stays valid: a kept line followed by another kept line of
    the SAME doc is never that doc's final line, so the following
    byte in-buffer is that doc's own ``\\n``."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    from vector_ray.expr.kernels import _flat_utf8

    arr, data, offs = _flat_utf8(arr)
    n = len(arr)
    lo = int(offs[0])
    flat = data[lo:int(offs[-1])]
    offs = offs - lo
    L = len(flat)
    doc_starts = offs[:-1]
    if L == 0:
        z = np.empty(0, np.int64)
        return flat, z, z, z, z, doc_starts, n
    m = flat != 0x0A
    prev_nl = np.empty(L, bool)
    prev_nl[0] = True
    np.logical_not(m[:-1], out=prev_nl[1:])
    at_start = np.zeros(L + 1, bool)
    at_start[offs[:-1]] = True
    next_nl = np.empty(L, bool)
    next_nl[-1] = True
    np.logical_not(m[1:], out=next_nl[:-1])
    at_end = np.zeros(L + 2, bool)
    at_end[offs[1:]] = True
    l_starts = np.nonzero(m & (prev_nl | at_start[:L]))[0]
    l_ends = np.nonzero(m & (next_nl | at_end[1:L + 1]))[0]
    l_lens = l_ends - l_starts + 1
    doc_of_line = np.searchsorted(doc_starts, l_starts, side="right") - 1
    nl_cs = np.empty(L + 1, np.int64)
    nl_cs[0] = 0
    np.cumsum(flat == 0x0A, dtype=np.int64, out=nl_cs[1:])
    line_no = nl_cs[l_starts] - nl_cs[doc_starts[doc_of_line]] + 1
    if arr.null_count:
        import pyarrow.compute as pc

        valid = np.asarray(pc.is_valid(arr).to_numpy(zero_copy_only=False))
        keep = valid[doc_of_line]
        l_starts, l_lens = l_starts[keep], l_lens[keep]
        doc_of_line, line_no = doc_of_line[keep], line_no[keep]
    return flat, l_starts, l_lens, doc_of_line, line_no, doc_starts, n


def _para_index_col(col):
    """Paragraph index from an Arrow column: NUL-joined flat buffer
    built by ``_flat_joined`` (no Python strings), then the shared
    ``_para_core`` scan."""
    if isinstance(col, list):
        return _para_index(col)
    flat, doc_starts, n = _flat_joined(col, 0x00)
    return _para_core(flat, doc_starts, n)


_PARA_RE = re.compile(b"\n\n")


def _para_index(texts: list):
    """Paragraph variant of ``_line_index`` (Dolma-style paragraph
    dedup granularity): parts are the doc's NON-OVERLAPPING
    ``split('\\n\\n')`` segments — exactly SQL
    ``string_split(text, chr(10)||chr(10))`` semantics, ordinals
    included — and empty parts vanish. Docs are joined with NUL so a
    ``\\n\\n`` match can never span two documents; one C-speed
    ``finditer`` over the flat buffer finds every cut, and the
    cut/doc-boundary merge is a sort + pairwise pairing (the i-th
    smallest start pairs with the i-th smallest end — valid because
    matches are non-overlapping and strictly inside doc ranges)."""
    n = len(texts)
    bufs = [(t or "").encode("utf-8", "ignore") for t in texts]
    flat = np.frombuffer(b"\x00".join(bufs) + b"\x00", dtype=np.uint8)
    doc_starts = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(np.fromiter((len(b) + 1 for b in bufs[:-1]), np.int64,
                              count=n - 1), out=doc_starts[1:])
    return _para_core(flat, doc_starts, n)


def _para_core(flat: np.ndarray, doc_starts: np.ndarray, n: int):
    """Shared paragraph-split core over a NUL-joined flat buffer
    (every doc followed by exactly one NUL)."""
    if n == 0:
        z = np.empty(0, np.int64)
        return flat, z, z, z, z, doc_starts, 0
    doc_ends = np.append(doc_starts[1:], len(flat)) - 1
    m = np.fromiter((mm.start() for mm in _PARA_RE.finditer(flat.tobytes())),
                    np.int64)
    if len(m):
        starts_all = np.sort(np.concatenate([doc_starts, m + 2]))
        ends_all = np.sort(np.concatenate([doc_ends, m]))
    else:
        starts_all, ends_all = doc_starts, doc_ends
    lens_all = ends_all - starts_all
    doc_of = np.searchsorted(doc_starts, starts_all, side="right") - 1
    first = np.zeros(len(doc_of), np.int64)
    if len(doc_of):
        new = np.ones(len(doc_of), bool)
        new[1:] = doc_of[1:] != doc_of[:-1]
        idx = np.nonzero(new)[0]
        first = np.repeat(idx, np.diff(np.append(idx, len(doc_of))))
    part_no = np.arange(len(doc_of), dtype=np.int64) - first + 1
    keep = lens_all > 0
    return (flat, starts_all[keep], lens_all[keep], doc_of[keep],
            part_no[keep], doc_starts, n)


_UNIT_INDEX = {"line": _line_index_arrow, "paragraph": _para_index_col}
_UNIT_SEP = {"line": "\n", "paragraph": "\n\n"}


def _gather_strings(flat: np.ndarray, starts: np.ndarray,
                    lens: np.ndarray) -> pa.StringArray:
    """Zero-copy-ish per-run string array: one fused repeat-shift
    gather into a contiguous values buffer + int32 offsets (runs are
    batch-local, far under 2 GiB)."""
    offs = np.zeros(len(starts) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    total = int(offs[-1])
    gather = np.repeat(starts - offs[:-1], lens)
    gather += np.arange(total, dtype=np.int64)
    values = flat[gather] if total else np.empty(0, np.uint8)
    return pa.StringArray.from_buffers(
        len(starts), pa.py_buffer(offs.astype(np.int32).tobytes()),
        pa.py_buffer(values.tobytes()))


def _line_hashes(lines: pa.StringArray) -> np.ndarray:
    """Deterministic 64-bit content hash per line (pandas' keyed
    siphash — fixed key, C-speed, process-independent). The corpus
    count groups by this hash, not the line bytes, so the count
    shuffle moves 16-byte rows; a 64-bit collision mis-merges two
    lines' counts (negligible below ~2^32 distinct lines — at larger
    corpora swap in a second independent key for a 128-bit pair)."""
    import pandas as pd

    if len(lines) == 0:
        return np.empty(0, np.uint64)
    return pd.util.hash_array(lines.to_numpy(zero_copy_only=False),
                              categorize=False)


_OCC_BITS = 21  # occurrence code = doc_id << 21 | line_no


def _occurrence_codes(t: pa.Table, id_col: str, dol: np.ndarray,
                      lno: np.ndarray) -> np.ndarray:
    """Global occurrence order key: ``doc_id * 2^21 + line_no`` —
    lexicographic (doc_id, line_no) as one int64 min-reducible value.
    Requires an integer id column with doc_id < 2^42 and per-doc unit
    ordinal < 2^21 (loud failure otherwise)."""
    ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False))
    if not np.issubdtype(ids.dtype, np.integer):
        raise ValueError(
            "line_dedup keep_first needs an integer id column "
            f"({id_col} is {ids.dtype})")
    ids = ids.astype(np.int64)[dol]
    if len(ids) and (int(ids.max()) >= 1 << (63 - _OCC_BITS)
                     or int(ids.min()) < 0):
        raise ValueError("line_dedup keep_first: doc_id out of [0, 2^42)")
    if len(lno) and int(lno.max()) >= 1 << _OCC_BITS:
        raise ValueError("line_dedup keep_first: >2^21 units in one doc")
    return (ids << _OCC_BITS) | lno.astype(np.int64)


def _dup_line_broadcast(ds, field: str, *, min_count: int,
                        max_dup_lines: int, unit: str = "line",
                        keep_first: bool = False, id_col: str = "doc_id"):
    """COUNT pass + threshold + ``ray.put``, same plan as
    ml/tokens.py ``_dup_hash_broadcast``: per-batch pre-aggregated
    (lhash, cnt) partials (one row per distinct line per block — a
    line shared by 10^8 docs is a handful of partial rows), a small
    groupby-sum, and the duplicated-hash set pulled and broadcast
    ONCE (bounded by the volume of actually-duplicated boilerplate,
    guarded by ``max_dup_lines``). Text payloads never shuffle.

    With ``keep_first`` the partials also carry the per-hash MIN
    occurrence code (global first-copy election as a mergeable min —
    no extra pass, no extra shuffle rows) and the broadcast becomes
    ``(dup_hashes_sorted, winner_codes)``."""
    import pyarrow.compute as pc
    import ray

    index_fn = _UNIT_INDEX[unit]

    def count_partial(t: pa.Table) -> pa.Table:
        flat, ls, ll, dol, lno, _, _ = index_fn(t[field])
        h = _line_hashes(_gather_strings(flat, ls, ll))
        # int64 REINTERPRETATION of the u64 hash: Ray Data's groupby
        # key path round-trips Python ints (overflows > 2^63); the
        # bit-pattern view keeps equality and a consistent order on
        # both sides of the probe searchsorted.
        if not keep_first:
            uh, cnt = np.unique(h, return_counts=True)
            return pa.table({"lhash": pa.array(uh.view(np.int64)),
                             "cnt": pa.array(cnt.astype(np.int64))})
        code = _occurrence_codes(t, id_col, dol, lno)
        order = np.lexsort((code, h))
        h_s, code_s = h[order], code[order]
        uh, first, cnt = np.unique(h_s, return_index=True,
                                   return_counts=True)
        return pa.table({"lhash": pa.array(uh.view(np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64)),
                         "win": pa.array(code_s[first])})

    counts = ds.map_batches(count_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
    # two-phase grouped_aggregate, NOT ds.groupby().sum(): the native
    # sort-based aggregate is ~20x slower at millions of distinct keys
    # (measured 15.2s vs 0.7s on 1.8M distinct lines, 32 CPUs)
    from vector_ray.stages.aggregate import grouped_aggregate

    aggs = {"c": ("sum", "cnt")}
    if keep_first:
        aggs["w"] = ("min", "win")
    summed = grouped_aggregate(counts, ["lhash"], aggs)

    cols = ["lhash"] + (["w"] if keep_first else [])

    def threshold(t: pa.Table) -> pa.Table:
        mask = pc.greater_equal(t["c"], pa.scalar(min_count))
        return t.filter(mask).select(cols)

    dup_ds = summed.map_batches(threshold, batch_format="pyarrow",
                                zero_copy_batch=True)
    parts, wparts, total = [], [], 0
    for b in dup_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        parts.append(np.asarray(b["lhash"].to_numpy(zero_copy_only=False),
                                np.int64))
        if keep_first:
            wparts.append(np.asarray(b["w"].to_numpy(zero_copy_only=False),
                                     np.int64))
        total += len(parts[-1])
        if total > max_dup_lines:
            raise ValueError(
                f"line_dedup: >{max_dup_lines} duplicated lines; raise "
                "min_count, or max_dup_lines if the driver has memory "
                "for the broadcast")
    dup = np.concatenate(parts) if parts else np.empty(0, np.int64)
    order = np.argsort(dup, kind="stable")
    dup_sorted = dup[order]
    if not keep_first:
        return ray.put(dup_sorted)
    win = (np.concatenate(wparts) if wparts
           else np.empty(0, np.int64))[order]
    return ray.put((dup_sorted, win))


def line_dedup(ds, field: str = "text", *, min_count: int = 2,
               id_col: str = "doc_id", output: str = "rebuild",
               max_dup_lines: int = 50_000_000, unit: str = "line",
               mode: str = "drop_all"):
    """Corpus-wide line-level dedup: a (non-empty) line is *duplicated*
    iff its exact byte content occurs ≥ ``min_count`` times across the
    whole corpus (every occurrence counts, including repeats inside one
    document); duplicated lines are removed from EVERY document
    (RefinedWeb removes all copies — no global first-copy election, so
    the rewrite is deterministic and partition-independent).

    Two passes, token/text payloads never shuffle:
      1. COUNT — pre-aggregated (line-hash, count) partials →
         groupby-sum → the duplicated-hash set broadcast via
         ``ray.put`` (``max_dup_lines`` guards the broadcast bound).
      2. PROBE — map-only second scan recomputes line hashes and
         either rebuilds ``text_line_dedup`` (``output="rebuild"``:
         kept lines joined by ``\\n``, plus ``n_lines`` /
         ``n_lines_kept`` counters) or emits one row per KEPT line
         (``output="explode"``: ``(id_col, line_no, line)``,
         ``line_no`` = 1-based ``split('\\n')`` ordinality — the
         SQL-comparable form).

    ``unit="paragraph"`` switches the granularity to the doc's
    non-overlapping ``split('\\n\\n')`` segments (Dolma-style paragraph
    dedup; Soldaini et al. 2024, public spec) — same two-pass plan,
    same SQL-comparable ordinals via
    ``string_split(text, chr(10)||chr(10))``; the rebuild joins kept
    paragraphs with ``'\\n\\n'``.

    ``mode="keep_first"`` (Dolma keep-first semantics) keeps the
    globally FIRST occurrence of each duplicated unit — ordered by
    ``(doc_id, unit ordinal)`` — and drops the later copies; the
    first-copy election rides the count pass as a mergeable per-hash
    ``min`` of the ``doc_id*2^21 + ordinal`` occurrence code (no extra
    pass or shuffle; integer id column required, bounds enforced).
    The default ``mode="drop_all"`` removes every copy (RefinedWeb).

    All per-batch work is flat-buffer vectorized (run detection,
    prefix-sum ordinals, fused gather rewrite) — no per-row Python.
    """
    if output not in ("rebuild", "explode"):
        raise ValueError(f"line_dedup: unknown output={output!r}")
    if unit not in _UNIT_INDEX:
        raise ValueError(f"line_dedup: unknown unit={unit!r}")
    if mode not in ("drop_all", "keep_first"):
        raise ValueError(f"line_dedup: unknown mode={mode!r}")
    import ray

    keep_first = mode == "keep_first"
    index_fn = _UNIT_INDEX[unit]
    dup_ref = _dup_line_broadcast(ds, field, min_count=min_count,
                                  max_dup_lines=max_dup_lines, unit=unit,
                                  keep_first=keep_first, id_col=id_col)

    def probe(t: pa.Table) -> pa.Table:
        got = ray.get(dup_ref)
        dups, wins = got if keep_first else (got, None)
        flat, ls, ll, dol, lno, _, n = index_fn(t[field])
        h = _line_hashes(_gather_strings(flat, ls, ll)).view(np.int64)
        if len(dups) and len(h):
            pos = np.searchsorted(dups, h)
            pos[pos == len(dups)] = 0
            hit = dups[pos] == h
            if keep_first:
                code = _occurrence_codes(t, id_col, dol, lno)
                keep = ~hit | (code == wins[pos])
            else:
                keep = ~hit
        else:
            keep = np.ones(len(h), bool)
        if output == "explode":
            lines = _gather_strings(flat, ls[keep], ll[keep])
            return pa.table({
                id_col: t[id_col].take(pa.array(dol[keep])),
                "line_no": pa.array(lno[keep].astype(np.int64)),
                "line": lines,
            })
        if unit != "line":
            # paragraph rebuild: kept parts per doc as a ListArray
            # joined by the separator (one vectorized Arrow kernel —
            # the fused-gather fast path below relies on every
            # inter-unit byte in `flat` being the 1-byte separator,
            # which only holds for lines)
            import pyarrow.compute as pc

            parts = _gather_strings(flat, ls[keep], ll[keep])
            per_doc = np.bincount(dol[keep], minlength=n).astype(np.int64)
            offs = np.zeros(n + 1, np.int64)
            np.cumsum(per_doc, out=offs[1:])
            lists = pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), parts)
            t = F.set_(t, "text_line_dedup",
                       pc.binary_join(lists, _UNIT_SEP[unit]))
            t = F.set_(t, "n_lines", pa.array(
                np.bincount(dol, minlength=n).astype(np.int64)))
            t = F.set_(t, "n_lines_kept", pa.array(per_doc))
            return t
        # rebuild: kept lines + following \n, trailing \n of each
        # doc's last kept line trimmed (the c4_clean_batch rewrite)
        k_starts, k_lens, k_doc = ls[keep], ll[keep], dol[keep]
        out_lens = k_lens + 1
        if len(k_doc):
            last_of_doc = np.ones(len(k_doc), bool)
            last_of_doc[:-1] = k_doc[1:] != k_doc[:-1]
            out_lens = out_lens - last_of_doc
        out_offs = np.zeros(len(k_starts) + 1, np.int64)
        np.cumsum(out_lens, out=out_offs[1:])
        total = int(out_offs[-1])
        gather = np.repeat(k_starts - out_offs[:-1], out_lens)
        gather += np.arange(total, dtype=np.int64)
        values = flat[gather] if total else np.empty(0, np.uint8)
        doc_out = np.bincount(k_doc, weights=out_lens, minlength=n)
        doc_offs = np.zeros(n + 1, np.int64)
        np.cumsum(doc_out.astype(np.int64), out=doc_offs[1:])
        text_new = pa.StringArray.from_buffers(
            n, pa.py_buffer(doc_offs.astype(np.int32).tobytes()),
            pa.py_buffer(values.tobytes()))
        t = F.set_(t, "text_line_dedup", text_new)
        t = F.set_(t, "n_lines", pa.array(
            np.bincount(dol, minlength=n).astype(np.int64)))
        t = F.set_(t, "n_lines_kept", pa.array(
            np.bincount(dol[keep], minlength=n).astype(np.int64)))
        return t

    return ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# blocklist_filter — C4's "bad words" page drop (Raffel et al. 2020
# §2.2 drops pages containing any phrase from a blocklist; list
# contents are caller-supplied — none are shipped here).


def blocklist_filter(ds, phrases, field: str = "text", *,
                     drop: bool = True, out: str = "blocklisted"):
    """Flag/drop docs whose text contains ANY of ``phrases``
    (case-insensitive substring). ONE compiled alternation regex per
    actor scanned over the batch's flat byte buffer (the c4_clean
    pattern — C-speed finditer, no per-row Python); the phrase list
    broadcasts inside the closure once. Phrases must not contain
    newlines (matches may not span docs)."""
    import re as _re

    pats = [p.lower().encode("utf-8") for p in phrases]
    if any(b"\n" in p for p in pats):
        raise ValueError("blocklist_filter: phrases must not contain \\n")
    rx = _re.compile(b"|".join(_re.escape(p) for p in pats)) if pats else None

    def fn(t: pa.Table) -> pa.Table:
        flat, doc_starts, n = _flat_joined(t[field], 0x0A)
        hit = np.zeros(n, bool)
        if rx is not None and len(flat):
            lflat = flat.copy()
            up = (lflat >= 0x41) & (lflat <= 0x5A)
            lflat[up] += 32
            pos = np.fromiter((m.start() for m in rx.finditer(
                lflat.tobytes())), np.int64)
            if len(pos):
                hit[np.unique(np.searchsorted(
                    doc_starts, pos, side="right") - 1)] = True
        t = F.set_(t, out, pa.array(~hit))
        if drop:
            t = t.filter(t[out])
        return t

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
