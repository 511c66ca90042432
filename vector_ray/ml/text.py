"""Text analysis stages over a documents table (doc_id, text, ...):

- ``TokenCount``: whitespace + punctuation-aware (BPE-ish) token counts
- ``QualityScore``: length / punctuation / stopword / uppercase ratios
  + composite quality score
- ``LangId``: n-gram/marker-word heuristic language ID (en/es/de/fr/zh)
- ``doc_fingerprint``: stable 64-bit content fingerprint of normalized
  text (dedup pre-key)

All are stateless vectorized ``map_batches`` bodies (pyarrow.compute
count_substring_regex does the heavy lifting; no per-row Python).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.expr import F
from vector_ray.stages.base import BatchStep

_WS_TOKEN = r"\S+"
# BPE-ish: words, numbers, punctuation runs each count as a token
_BPE_TOKEN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"

STOPWORDS = ["the", "and", "of", "a", "to", "in", "is", "it", "that", "for"]


class TokenCount(BatchStep):
    def __init__(self, field: str = "text", *, out_prefix: str = ""):
        self.field = field
        self.p = out_prefix

    def transform(self, tbl: pa.Table) -> pa.Table:
        txt = tbl[self.field]
        tbl = F.set_(tbl, f"{self.p}n_words", pc.count_substring_regex(txt, _WS_TOKEN))
        tbl = F.set_(tbl, f"{self.p}n_tokens_bpe", pc.count_substring_regex(txt, _BPE_TOKEN))
        return tbl


class QualityScore(BatchStep):
    """Quality heuristics: mean word length, punctuation ratio, stopword
    ratio, uppercase ratio → ``quality`` in [0, 1]."""

    def __init__(self, field: str = "text"):
        self.field = field
        self._stop_re = r"(?i)\b(?:" + "|".join(STOPWORDS) + r")\b"

    def transform(self, tbl: pa.Table) -> pa.Table:
        txt = tbl[self.field]
        n_chars = pc.cast(pc.utf8_length(txt), pa.float64())
        n_words = pc.cast(pc.count_substring_regex(txt, _WS_TOKEN), pa.float64())
        n_punct = pc.cast(pc.count_substring_regex(txt, r"[\.,;:!\?]"), pa.float64())
        n_stop = pc.cast(pc.count_substring_regex(txt, self._stop_re), pa.float64())
        n_upper = pc.cast(pc.count_substring_regex(txt, r"[A-Z]"), pa.float64())
        safe_words = pc.max_element_wise(n_words, 1.0)
        safe_chars = pc.max_element_wise(n_chars, 1.0)
        mean_wl = pc.divide(safe_chars, safe_words)
        punct_ratio = pc.divide(n_punct, safe_chars)
        stop_ratio = pc.divide(n_stop, safe_words)
        upper_ratio = pc.divide(n_upper, safe_chars)
        # composite: reward moderate word length + stopword presence,
        # punish punctuation/caps walls
        wl_term = pc.subtract(1.0, pc.min_element_wise(
            pc.divide(pc.abs(pc.subtract(mean_wl, 5.0)), 5.0), 1.0))
        stop_term = pc.min_element_wise(pc.multiply(stop_ratio, 3.0), 1.0)
        punct_term = pc.subtract(1.0, pc.min_element_wise(pc.multiply(punct_ratio, 5.0), 1.0))
        caps_term = pc.subtract(1.0, pc.min_element_wise(pc.multiply(upper_ratio, 5.0), 1.0))
        quality = pc.divide(
            pc.add(pc.add(wl_term, stop_term), pc.add(punct_term, caps_term)), 4.0
        )
        tbl = F.set_(tbl, "mean_word_len", mean_wl)
        tbl = F.set_(tbl, "punct_ratio", punct_ratio)
        tbl = F.set_(tbl, "stop_ratio", stop_ratio)
        tbl = F.set_(tbl, "upper_ratio", upper_ratio)
        tbl = F.set_(tbl, "quality", quality)
        return tbl


_LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "that"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
}


class LangId(BatchStep):
    """Marker-word language ID: count per-language marker hits and take
    the argmax; CJK character presence short-circuits to zh. Emits
    ``lang_pred`` and ``lang_score`` (hits of winner / words)."""

    def __init__(self, field: str = "text"):
        self.field = field
        self._res = {
            lang: r"(?i)\b(?:" + "|".join(words) + r")\b" for lang, words in _LANG_MARKERS.items()
        }

    def transform(self, tbl: pa.Table) -> pa.Table:
        txt = tbl[self.field]
        n = len(tbl)
        counts = np.zeros((len(self._res), n), dtype=np.float64)
        langs = list(self._res)
        for i, lang in enumerate(langs):
            counts[i] = pc.count_substring_regex(txt, self._res[lang]).to_numpy(zero_copy_only=False)
        cjk = pc.count_substring_regex(txt, r"[一-鿿]").to_numpy(zero_copy_only=False)
        best = counts.argmax(axis=0)
        best_hits = counts.max(axis=0)
        pred = np.array(langs, dtype=object)[best]
        pred[best_hits == 0] = "und"
        pred[cjk > 0] = "zh"
        n_words = np.maximum(
            pc.count_substring_regex(txt, _WS_TOKEN).to_numpy(zero_copy_only=False), 1
        )
        score = best_hits / n_words
        score[cjk > 0] = 1.0
        tbl = F.set_(tbl, "lang_pred", pa.array(pred, pa.string()))
        tbl = F.set_(tbl, "lang_score", pa.array(score, pa.float64()))
        return tbl


def doc_fingerprint(tbl: pa.Table, field: str = "text", out: str = "fp") -> pa.Table:
    """Stable content fingerprint of whitespace/case-normalized text."""
    norm = pc.utf8_lower(pc.replace_substring_regex(tbl[field], r"\s+", " "))
    return F.set_(tbl, out, F.fingerprint(norm))


class Fingerprint(BatchStep):
    def __init__(self, field: str = "text", out: str = "fp"):
        self.field = field
        self.out = out

    def transform(self, tbl: pa.Table) -> pa.Table:
        return doc_fingerprint(tbl, self.field, self.out)


# ---------------------------------------------------------------------------
# Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
# Models", appendix A1.1 quality filters — public spec). Reference has
# no counterpart; this is part of the training-data toolkit layered on
# the engine (SURVEY §2 "beyond the reference" operators).


def repetition_signals_batch(texts: list) -> dict:
    """Per-doc repetition counters, fully vectorized (one flat byte
    buffer for the whole batch; word/line runs via diff; per-doc
    aggregation via bincount/reduceat — no per-row Python).

    Definitions (exact, integer-valued — oracle-hashable):

    - *words*: maximal runs of word bytes (``[a-z0-9_]``/``A-Z``/
      ``>=0x80``) in the utf-8 encoding of the lowercased text (the
      ``simhash_batch`` convention). ``word_chars`` = total word bytes.
    - *lines*: maximal runs of non-``\\n`` bytes (empty lines ignored),
      compared by exact content (engine: crc32 of the slice).
      ``n_lines``; ``line_chars`` = total line bytes;
      ``dup_line_cnt`` = occurrences beyond the first of each repeated
      line; ``dup_line_chars`` = those occurrences' bytes.
    - *2-grams*: adjacent word pairs in the doc's word stream (line
      breaks do not break adjacency). ``top2_cnt`` = occurrence count
      of the most frequent 2-gram; ``top2_chars`` = max over 2-grams
      with that count of ``count * (len(w1)+len(w2))`` (character
      coverage of the most frequent 2-gram; deterministic tiebreak).
    - *5-grams*: ``dup5_chars`` = word bytes covered by at least one
      occurrence of a 5-gram that occurs >= 2 times in the doc
      (interval union over word positions).

    Fractions (Gopher thresholds: dup_line_frac 0.30, dup_line_char_
    frac 0.20, top2 char frac 0.20, dup 5-gram char frac 0.15) are for
    the caller: e.g. ``dup_line_cnt * 10 > 3 * n_lines`` — exact
    integer comparisons, no float wobble.
    """
    from vector_ray.ml.dedup import _crc32_words, _sm64

    n = len(texts)
    out = {k: np.zeros(n, np.int64) for k in (
        "n_lines", "dup_line_cnt", "line_chars", "dup_line_chars",
        "word_chars", "top2_cnt", "top2_chars", "dup5_chars")}
    if n == 0:
        return out
    bufs = [(t or "").lower().encode("utf-8", "ignore") for t in texts]
    flat = np.frombuffer(b"\n".join(bufs) + b"\n", dtype=np.uint8)
    doc_starts = np.zeros(n, dtype=np.int64)
    np.cumsum([len(b) + 1 for b in bufs[:-1]], out=doc_starts[1:])

    def _runs(mask):
        d = np.diff(mask.astype(np.int8), prepend=np.int8(0))
        starts = np.nonzero(d == 1)[0]
        ends = np.nonzero(d == -1)[0]
        if len(ends) < len(starts):
            ends = np.append(ends, len(flat))
        return starts, ends - starts

    # ---- lines: runs of non-\n bytes (doc separator IS \n, so runs
    # never cross docs)
    l_starts, l_lens = _runs(flat != 0x0A)
    if len(l_starts):
        doc_of_line = np.searchsorted(doc_starts, l_starts, side="right") - 1
        np.add.at(out["n_lines"], doc_of_line, 1)
        np.add.at(out["line_chars"], doc_of_line, l_lens)
        lh = _crc32_words(flat, l_starts, l_lens).astype(np.uint64)
        order = np.lexsort((lh, doc_of_line))
        sd, sh, sl = doc_of_line[order], lh[order], l_lens[order]
        new = np.empty(len(sd), bool)
        new[0] = True
        new[1:] = (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])
        # every non-first occurrence in its (doc, line) run is a dup
        dup = ~new
        np.add.at(out["dup_line_cnt"], sd[dup], 1)
        np.add.at(out["dup_line_chars"], sd[dup], sl[dup])

    # ---- words
    wc = (
        ((flat >= 97) & (flat <= 122))
        | ((flat >= 48) & (flat <= 57))
        | (flat == 95)
        | (flat >= 128)
        | ((flat >= 65) & (flat <= 90))
    )
    w_starts, w_lens = _runs(wc)
    if len(w_starts) == 0:
        return out
    doc_of_word = np.searchsorted(doc_starts, w_starts, side="right") - 1
    np.add.at(out["word_chars"], doc_of_word, w_lens)
    wh = _crc32_words(flat, w_starts, w_lens).astype(np.uint64)

    def _gram_runs(k):
        """Sorted (doc, gram-id) runs over k-gram start positions.
        Returns (starts_idx sorted, run_offs, run_doc, run_cnt,
        run_charlen)."""
        if len(wh) < k:
            return None
        valid = doc_of_word[: len(wh) - k + 1] == doc_of_word[k - 1:]
        idx = np.nonzero(valid)[0]
        if len(idx) == 0:
            return None
        with np.errstate(over="ignore"):
            g = wh[idx].copy()
            for j in range(1, k):
                g = _sm64(g * np.uint64(0x100000001B3) ^ wh[idx + j])
        charlen = w_lens[idx].copy()
        for j in range(1, k):
            charlen = charlen + w_lens[idx + j]
        d = doc_of_word[idx]
        order = np.lexsort((g, d))
        sd, sg = d[order], g[order]
        new = np.empty(len(sd), bool)
        new[0] = True
        new[1:] = (sd[1:] != sd[:-1]) | (sg[1:] != sg[:-1])
        run_offs = np.nonzero(new)[0]
        run_cnt = np.diff(np.append(run_offs, len(sd)))
        return idx[order], run_offs, sd[run_offs], run_cnt, charlen[order][run_offs]

    # ---- top 2-gram coverage
    r2 = _gram_runs(2)
    if r2 is not None:
        _, run_offs, run_doc, run_cnt, run_charlen = r2
        doc_new = np.empty(len(run_doc), bool)
        doc_new[0] = True
        doc_new[1:] = run_doc[1:] != run_doc[:-1]
        doc_offs = np.nonzero(doc_new)[0]
        docs2 = run_doc[doc_offs]
        maxc = np.maximum.reduceat(run_cnt, doc_offs)
        out["top2_cnt"][docs2] = maxc
        is_top = run_cnt == np.repeat(maxc, np.diff(np.append(doc_offs, len(run_cnt))))
        cover = np.where(is_top, run_cnt * run_charlen, 0)
        out["top2_chars"][docs2] = np.maximum.reduceat(cover, doc_offs)

    # ---- duplicated 5-gram coverage (interval union over word positions)
    r5 = _gram_runs(5)
    if r5 is not None:
        sidx, run_offs, _, run_cnt, _ = r5
        in_dup_run = np.repeat(run_cnt >= 2, run_cnt)
        starts5 = sidx[in_dup_run]
        if len(starts5):
            diff = np.zeros(len(wh) + 5, np.int32)
            np.add.at(diff, starts5, 1)
            np.add.at(diff, starts5 + 5, -1)
            covered = np.cumsum(diff[: len(wh)]) > 0
            np.add.at(out["dup5_chars"], doc_of_word[covered], w_lens[covered])
    return out


class RepetitionSignals(BatchStep):
    """Append Gopher-style repetition counters (see
    ``repetition_signals_batch``) as int64 columns. Compose with
    ``C.expr`` / ``quantile_band_filter`` to drop repetitive docs,
    e.g. keep ``dup_line_cnt * 10 <= 3 * n_lines``."""

    def __init__(self, field: str = "text", prefix: str = ""):
        self.field = field
        self.prefix = prefix

    def transform(self, tbl: pa.Table) -> pa.Table:
        sig = repetition_signals_batch(tbl[self.field].to_pylist())
        for k, v in sig.items():
            tbl = F.set_(tbl, self.prefix + k, pa.array(v, pa.int64()))
        return tbl


def compression_ratio_batch(texts: list, *, level: int = 6) -> np.ndarray:
    """Per-doc zlib compression ratio ``compressed_bytes / raw_bytes``
    (1.0 for empty docs). Low ratios flag repetitive/templated content
    — the compressibility quality signal used alongside the Gopher
    repetition counters in web-curation pipelines. The per-row loop is
    intentional: each iteration is one C zlib call on the whole doc
    (the work is inside zlib, not the interpreter)."""
    import zlib

    out = np.ones(len(texts), np.float64)
    for i, s in enumerate(texts):
        b = (s or "").encode("utf-8", "ignore")
        if b:
            out[i] = len(zlib.compress(b, level)) / len(b)
    return out


class CompressionRatio(BatchStep):
    """Append ``comp_ratio: float64`` (see compression_ratio_batch).
    Compose with quantile_band_filter or a C.expr threshold to drop
    highly-compressible (repetitive) docs."""

    def __init__(self, field: str = "text", out: str = "comp_ratio",
                 level: int = 6):
        self.field = field
        self.out = out
        self.level = level

    def transform(self, tbl: pa.Table) -> pa.Table:
        r = compression_ratio_batch(tbl[self.field].to_pylist(),
                                    level=self.level)
        return F.set_(tbl, self.out, pa.array(r, pa.float64()))


_ENT_SCALE = 1_000_000


def _ent_log_table(maxn: int) -> np.ndarray:
    """L(c) = round(ln(c) * 1e6) for c in [0, maxn] (L(0) = 0). Array
    np.log on an arange — any mirror implementation must use the SAME
    array op (scalar math.log can differ by one ulp)."""
    t = np.zeros(maxn + 1, np.int64)
    if maxn >= 1:
        t[1:] = np.round(
            np.log(np.arange(1, maxn + 1, dtype=np.float64)) * _ENT_SCALE
        ).astype(np.int64)
    return t


def byte_entropy_batch(col) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc Shannon entropy of the UTF-8 byte distribution, as the
    INTEGER micro-nat total ``ent_micro = n*L(n) - sum_b c_b*L(c_b)``
    with ``L(c) = round(ln c * 1e6)`` — exact integer sums, so results
    are bit-identical under any batching/partitioning (the lm_score
    pattern); ``entropy_nats ~= ent_micro / n / 1e6``. Low entropy
    flags templated/repetitive gibberish, high entropy flags binary
    junk — the cheap quality gate next to compression_ratio (one
    bincount per batch instead of a zlib pass per doc).

    Returns ``(n_bytes, ent_micro)`` int64 arrays."""
    from vector_ray.expr.kernels import _flat_utf8

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr, data, offs = _flat_utf8(arr)
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    lo = int(offs[0])
    data = data[lo:int(offs[-1])]
    offs = offs - lo
    lens = np.diff(offs).astype(np.int64)
    if arr.null_count:
        valid = np.asarray(pc.is_valid(arr).to_numpy(zero_copy_only=False))
        lens = np.where(valid, lens, 0)
        # drop null docs' bytes from the flat view by rebuilding the
        # repeat off the masked lengths and the true byte starts
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        starts = offs[:-1]
        byte_pos = np.repeat(starts, lens) + (
            np.arange(lens.sum(), dtype=np.int64)
            - np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])), lens))
        bts = data[byte_pos]
    else:
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        bts = data
    key = doc_idx * 256 + bts.astype(np.int64)
    counts = np.bincount(key, minlength=n * 256)
    L = _ent_log_table(int(lens.max()) if len(lens) else 1)
    contrib = (counts * L[counts]).reshape(n, 256).sum(axis=1)
    ent = lens * L[lens] - contrib
    return lens, ent


class ByteEntropy(BatchStep):
    """Append ``n_bytes: int64`` and ``ent_micro: int64`` (see
    byte_entropy_batch); ``entropy: float64`` in nats derives as
    ent_micro / n_bytes / 1e6 (0 for empty docs)."""

    def __init__(self, field: str = "text", prefix: str = ""):
        self.field = field
        self.prefix = prefix

    def transform(self, tbl: pa.Table) -> pa.Table:
        lens, ent = byte_entropy_batch(tbl[self.field])
        tbl = F.set_(tbl, self.prefix + "n_bytes", pa.array(lens, pa.int64()))
        tbl = F.set_(tbl, self.prefix + "ent_micro", pa.array(ent, pa.int64()))
        dens = np.divide(ent, np.maximum(lens, 1) * 1e6)
        return F.set_(tbl, self.prefix + "entropy", pa.array(dens, pa.float64()))


class NormalizeText(BatchStep):
    """Canonical text normalization before hashing/dedup (the CCNet /
    OSCAR preprocessing step: Wenzek et al. 2020 normalize text before
    paragraph hashing): unicode NFC normalization, lowercasing,
    whitespace-run collapse to a single space, and edge trim — each
    individually toggleable. Entirely pyarrow.compute string kernels
    (utf8proc NFC + one RE2 pass over the flat buffer), stateless
    map-only, no shuffle. Reference parity: composes Vector's VRL
    ``downcase``/``strip_whitespace`` remap idioms
    (lib/vrl/stdlib/src/downcase.rs, strip_whitespace.rs) with the
    unicode normalization web-curation adds on top."""

    def __init__(self, field: str = "text", out: str | None = None, *,
                 form: str = "NFC", lower: bool = True,
                 collapse_ws: bool = True, strip: bool = True):
        self.field = field
        self.out = out or field
        self.form = form  # NFC/NFKC/NFD/NFKD, or "" to skip
        self.lower = lower
        self.collapse_ws = collapse_ws
        self.strip = strip

    def transform(self, tbl: pa.Table) -> pa.Table:
        col = tbl[self.field]
        if self.form in ("NFD", "NFKD"):
            col = pc.utf8_normalize(col, form=self.form)
        elif self.form:
            # This Arrow/utf8proc build decomposes but never RE-composes
            # (utf8_normalize(form="NFC") emits NFD — verified), so the
            # composing forms take a row fallback. ASCII is NFC-invariant,
            # so the overwhelmingly-common all-ASCII batch stays on the
            # zero-copy vectorized path; only batches that actually carry
            # non-ASCII rows pay a unicodedata pass.
            import unicodedata

            ascii_ok = pc.fill_null(pc.string_is_ascii(col), True)
            if not pc.all(ascii_ok).as_py():
                keep = ascii_ok.to_numpy(zero_copy_only=False)
                vals = col.to_pylist()
                form = self.form
                col = pa.array(
                    [v if ok or v is None
                     else unicodedata.normalize(form, v)
                     for v, ok in zip(vals, keep)], pa.string())
        if self.lower:
            col = pc.utf8_lower(col)
        if self.collapse_ws:
            # RE2 \s is ASCII whitespace (same engine DuckDB uses);
            # unicode spaces like U+00A0 are deliberately left alone.
            col = pc.replace_substring_regex(col, r"\s+", " ")
        if self.strip:
            col = pc.utf8_trim_whitespace(col)
        return F.set_(tbl, self.out, col)


def gopher_repetition_filter(ds, field: str = "text", *,
                             drop: bool = True):
    """The Gopher repetition FILTER (Rae et al. 2021 A1.1 thresholds
    over the ``repetition_signals_batch`` counters): a doc is dropped
    when any of
      dup_line_cnt   / n_lines     > 0.30
      dup_line_chars / line_chars  > 0.20
      top2_chars     / word_chars  > 0.20
      dup5_chars     / word_chars  > 0.15
    All comparisons are EXACT integer cross-multiplications
    (``a * 100 > t * b`` — no float wobble, so the kept set is
    oracle-hashable). Appends ``gopher_keep``; ``drop=True`` filters.
    Composes after/with ``RepetitionSignals`` — this runs the signals
    itself so it is a single map-only stage."""

    def fn(t: pa.Table) -> pa.Table:
        sig = repetition_signals_batch(t[field].to_pylist())
        keep = np.ones(len(t), bool)
        keep &= ~(sig["dup_line_cnt"] * 100 > 30 * sig["n_lines"])
        keep &= ~(sig["dup_line_chars"] * 100 > 20 * sig["line_chars"])
        keep &= ~(sig["top2_chars"] * 100 > 20 * sig["word_chars"])
        keep &= ~(sig["dup5_chars"] * 100 > 15 * sig["word_chars"])
        t = t.append_column("gopher_keep", pa.array(keep))
        if drop:
            t = t.filter(t["gopher_keep"])
        return t

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_ELLIPSIS_RE = re.compile(rb"\.\.\.")
_STRIP_BYTES = (0x2E, 0x2C, 0x21, 0x3F, 0x3B, 0x3A)  # . , ! ? ; :
_WS_BYTES = (0x20, 0x09, 0x0A, 0x0D, 0x0B, 0x0C)


def gopher_quality_batch(col) -> dict:
    """Per-doc Gopher quality counters (Rae et al. 2021 A1.2, public
    spec), BYTE-LEVEL and fully vectorized off the Arrow string buffer
    (no per-row Python — this IS a hot-path filter at corpus scale):

      n_words        maximal non-ASCII-whitespace byte runs
      word_chars     total bytes across words
      n_alpha_words  words containing >= 1 ``[A-Za-z]`` byte
      n_hash         ``#`` bytes; n_ellipsis: non-overlapping ``...``
      n_stop         words that, stripped of leading/trailing
                     ``.,!?;:`` and lowercased, equal one of the
                     8 Gopher stopwords
      doc_bytes      utf-8 byte length of the doc

    Exactness note: the stopword match compares stripped length + the
    vectorized CRC32 of the lowered bytes — every stopword is <= 4
    bytes and CRC32 is INJECTIVE on inputs of <= 4 bytes at fixed
    length, so crc equality here IS byte equality (no collision
    caveat). Accepts an Arrow string column or a Python list."""
    from vector_ray.ml.clean import _flat_joined
    from vector_ray.ml.dedup import _crc32_words

    if isinstance(col, list):
        col = pa.array([x if x is not None else "" for x in col],
                       pa.string())
    flat, doc_starts, n = _flat_joined(col, 0x20)  # space sep: words
    # and '...' can never span docs
    out = {k: np.zeros(n, np.int64) for k in (
        "n_words", "word_chars", "n_alpha_words", "n_hash",
        "n_ellipsis", "n_stop", "doc_bytes")}
    doc_ends = np.append(doc_starts[1:], len(flat)) - 1
    out["doc_bytes"] = (doc_ends - doc_starts).astype(np.int64)
    if len(flat) == 0 or n == 0:
        return out
    ws = np.zeros(256, bool)
    for b in _WS_BYTES:
        ws[b] = True
    m = ~ws[flat]
    w_starts = np.nonzero(m & ~np.concatenate(([False], m[:-1])))[0]
    w_ends = np.nonzero(m & ~np.concatenate((m[1:], [False])))[0]
    w_lens = w_ends - w_starts + 1
    if len(w_starts) == 0:
        return out
    dow = np.searchsorted(doc_starts, w_starts, side="right") - 1
    out["n_words"] = np.bincount(dow, minlength=n).astype(np.int64)
    out["word_chars"] = np.bincount(dow, weights=w_lens,
                                    minlength=n).astype(np.int64)
    # alpha words: per-word letter-count via cumsum range diff
    is_alpha = ((flat >= 0x41) & (flat <= 0x5A)) | \
        ((flat >= 0x61) & (flat <= 0x7A))
    acs = np.empty(len(flat) + 1, np.int64)
    acs[0] = 0
    np.cumsum(is_alpha, dtype=np.int64, out=acs[1:])
    alpha_w = (acs[w_ends + 1] - acs[w_starts]) > 0
    out["n_alpha_words"] = np.bincount(dow[alpha_w],
                                       minlength=n).astype(np.int64)
    # '#' per doc
    hcs = np.empty(len(flat) + 1, np.int64)
    hcs[0] = 0
    np.cumsum(flat == 0x23, dtype=np.int64, out=hcs[1:])
    out["n_hash"] = (hcs[doc_ends] - hcs[doc_starts]).astype(np.int64)
    # non-overlapping '...' (left-to-right, matching str.count)
    pos = np.fromiter((mm.start() for mm in
                       _ELLIPSIS_RE.finditer(flat.tobytes())), np.int64)
    if len(pos):
        np.add.at(out["n_ellipsis"],
                  np.searchsorted(doc_starts, pos, side="right") - 1, 1)
    # stopwords: strip .,!?;: at both ends, lowercase, length+crc match
    strip = np.zeros(256, bool)
    for b in _STRIP_BYTES:
        strip[b] = True
    cand = m & ~strip[flat]
    idx = np.arange(len(flat), dtype=np.int64)
    seg = w_starts  # reduceat segments word->next word (gap is ~cand)
    first_ns = np.minimum.reduceat(np.where(cand, idx, len(flat)), seg)
    last_ns = np.maximum.reduceat(np.where(cand, idx, -1), seg)
    has = last_ns >= first_ns
    sl = np.where(has, last_ns - first_ns + 1, 0)
    lflat = flat.copy()
    up = (lflat >= 0x41) & (lflat <= 0x5A)
    lflat[up] += 32
    import zlib

    hits = np.zeros(len(w_starts), bool)
    by_len: dict = {}
    for sw in _GOPHER_STOPWORDS:
        by_len.setdefault(len(sw), set()).add(
            zlib.crc32(sw.encode()) & 0xFFFFFFFF)
    for ln, crcs in by_len.items():
        mask = sl == ln
        if not mask.any():
            continue
        c = _crc32_words(lflat, first_ns[mask],
                         np.full(int(mask.sum()), ln, np.int64))
        ok = np.isin(np.asarray(c, np.uint32).astype(np.int64),
                     np.array(sorted(crcs), np.int64))
        hits[np.nonzero(mask)[0][ok]] = True
    out["n_stop"] = np.bincount(dow[hits], minlength=n).astype(np.int64)
    return out


def gopher_quality_filter(ds, field: str = "text", *, drop: bool = True,
                          min_words: int = 50, max_words: int = 100_000):
    """Gopher A1.2 quality gate — a doc is KEPT iff (exact integer
    comparisons, oracle-hashable):

      min_words <= n_words <= max_words
      3 <= mean word length <= 10      (3*n <= chars <= 10*n)
      hash chars  <= 10% of doc chars  (n_hash * 10 <= len)
      '...'       <= 1 per 100 words   (n_ellipsis * 100 <= n_words)
      alpha words >= 80% of words      (n_alpha * 10 >= 8 * n_words)
      >= 2 stopword hits
    """
    def fn(t: pa.Table) -> pa.Table:
        q = gopher_quality_batch(t[field])
        keep = (q["n_words"] >= min_words) & (q["n_words"] <= max_words)
        keep &= (3 * q["n_words"] <= q["word_chars"])
        keep &= (q["word_chars"] <= 10 * q["n_words"])
        keep &= (q["n_hash"] * 10 <= q["doc_bytes"])
        keep &= (q["n_ellipsis"] * 100 <= q["n_words"])
        keep &= (q["n_alpha_words"] * 10 >= 8 * q["n_words"])
        keep &= q["n_stop"] >= 2
        t = t.append_column("quality_keep", pa.array(keep))
        if drop:
            t = t.filter(t["quality_keep"])
        return t

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
