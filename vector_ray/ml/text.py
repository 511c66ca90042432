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
