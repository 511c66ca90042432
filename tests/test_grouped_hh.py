"""grouped_heavy_hitters (ml/corpus.py): exactness in the
capacity>=vocab regime vs a Python mirror, the MG compression bound
(per-key row budget + heavy term survival at tiny capacity), and
layout invariance."""

from collections import Counter

import pyarrow as pa
import ray.data as rd

from vector_ray.ml.corpus import (
    _mg_compress_per_key,
    grouped_heavy_hitters,
)


def _docs():
    rows = [
        ("en", "the cat sat on the mat the end"),
        ("en", "the dog sat"),
        ("de", "der hund der hund der"),
        ("de", "die katze"),
        ("fr", None),
        ("fr", "le le le chat"),
    ]
    return pa.table({
        "lang": pa.array([r[0] for r in rows]),
        "text": pa.array([r[1] for r in rows]),
    })


def _mirror(t, k):
    per = {}
    for lang, text in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
        if text is None:
            continue
        per.setdefault(lang, Counter()).update(
            w for w in text.split() if w)
    out = set()
    for lang, c in per.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out |= {(lang, w, n) for w, n in top}
    return out


class TestGroupedHeavyHitters:
    def test_exact_regime_matches_mirror(self):
        t = _docs()
        got = {(r["lang"], r["word"], r["cnt"])
               for r in grouped_heavy_hitters(
                   rd.from_arrow(t).repartition(3), "lang", col="text",
                   k=2, capacity=10_000).take_all()}
        assert got == _mirror(t, 2)

    def test_layout_invariant(self):
        t = _docs()
        mk = lambda p: sorted(
            (r["lang"], r["word"], r["cnt"])
            for r in grouped_heavy_hitters(
                rd.from_arrow(t).repartition(p), "lang", col="text",
                k=3, capacity=10_000).take_all())
        assert mk(2) == mk(5)

    def test_mg_per_key_budget_and_survival(self):
        # one block, two keys: key A has 50 distinct words + one
        # 40x-repeated heavy word; capacity 8 must keep <=8 rows per
        # key and the heavy word must survive with cnt > 0
        words_a = " ".join(f"w{i}" for i in range(50)) + " hot" * 40
        t = pa.table({
            "lang": pa.array(["a", "b"]),
            "text": pa.array([words_a, "x y z"]),
        })
        from vector_ray.ml.corpus import _keyed_count_partial

        part = _mg_compress_per_key(
            _keyed_count_partial(t, "lang", "text"), "lang", 8)
        by_key = Counter(part["lang"].to_pylist())
        assert by_key["a"] <= 8 and by_key["b"] <= 8
        rows = {(r["lang"], r["word"]): r["cnt"]
                for r in part.to_pylist()}
        assert rows[("a", "hot")] >= 40 - (90 // 9)  # n_key/(cap+1)

    def test_null_keyed_rows_kept_distinct(self):
        t = pa.table({
            "lang": pa.array(["en", None, None]),
            "text": pa.array(["a a", "b", "b b"]),
        })
        got = {(r["lang"], r["word"], r["cnt"])
               for r in grouped_heavy_hitters(
                   rd.from_arrow(t), "lang", k=1,
                   capacity=100).take_all()}
        assert ("en", "a", 2) in got
        assert (None, "b", 3) in got
