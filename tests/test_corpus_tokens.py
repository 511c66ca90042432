"""Tests for ml/corpus.py (vocab_topk, repetition_stats) and
ml/tokens.py (pack_sequences, chunk_sequences, decontaminate)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.ml.corpus import repetition_stats, vocab_topk
from vector_ray.ml.tokens import (
    chunk_sequences,
    decontaminate,
    dup_passages,
    ngram_hashes,
    pack_sequences,
)


def ds_of(tbl, blocks=2):
    return rd.from_arrow(tbl).repartition(blocks)


def tok_tbl(rows):
    """rows: list of (doc_id, tokens, source)."""
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "tokens": pa.array([r[1] for r in rows], pa.list_(pa.int32())),
        "n_tok": pa.array([len(r[1]) for r in rows], pa.int32()),
        "source": pa.array([r[2] for r in rows]),
    })


class TestVocabTopk:
    def test_words_topk(self):
        t = pa.table({"text": ["a b a", "b c b b", None, "  a  "]})
        out = vocab_topk(ds_of(t, blocks=3), col="text", k=2).take_all()
        assert [(r["word"], r["cnt"]) for r in out] == [("b", 4), ("a", 3)]

    def test_token_mode(self):
        t = pa.table({"tokens": pa.array([[5, 5, 1], [5, 2], [2]], pa.list_(pa.int32()))})
        out = vocab_topk(ds_of(t, blocks=2), col="tokens", k=10, mode="tokens").take_all()
        assert [(r["token"], r["cnt"]) for r in out] == [(5, 3), (2, 2), (1, 1)]

    def test_tie_break_is_term_ascending(self):
        t = pa.table({"text": ["x y", "y x", "z"]})
        out = vocab_topk(ds_of(t), col="text", k=2).take_all()
        assert [r["word"] for r in out] == ["x", "y"]


class TestRepetitionStats:
    def test_fractions(self):
        t = pa.table({"doc_id": [1, 2], "text": ["a a a b", "u v w"]})
        out = repetition_stats(t).to_pydict()
        assert out["n_words"] == [4, 3]
        assert out["n_distinct"] == [2, 3]
        assert out["dup_word_frac"] == [1 - 2 / 4.0, 0.0]
        assert out["top_word_frac"] == [3 / 4.0, 1 / 3.0]

    def test_empty_and_null(self):
        t = pa.table({"doc_id": [1, 2], "text": ["", None]})
        out = repetition_stats(t).to_pydict()
        assert out["n_words"] == [0, 0]
        assert out["dup_word_frac"] == [0.0, 0.0]
        assert out["top_word_frac"] == [0.0, 0.0]


class TestPackSequences:
    def test_greedy_first_fit(self):
        rows = [(f"d{i}", list(range(n)), "s") for i, n in
                enumerate([3, 4, 5, 10, 2])]
        out = pack_sequences(ds_of(tok_tbl(rows), blocks=3), 8,
                             num_shards=1).take_all()
        packs = sorted((r["pack_id"], r["n_seqs"], r["n_tok"]) for r in out)
        # doc order d0(3) d1(4) d2(5) d3(10) d4(2):
        # [d0,d1]=7, [d2,d4]? no — first-fit IN ORDER: [d0,d1]=7, [d2]=5+d4? d3 comes
        # before d4: [d2]=5 (d3 won't fit), [d3]=10 oversize alone, [d4]=2
        assert packs == [(0, 2, 7), (1, 1, 5), (2, 1, 10), (3, 1, 2)]

    def test_packs_never_cross_shards_or_groups(self):
        rng = np.random.default_rng(3)
        rows = [(f"d{i:03d}", list(range(int(rng.integers(1, 30)))),
                 f"s{i % 3}") for i in range(200)]
        out = pack_sequences(ds_of(tok_tbl(rows), blocks=4), 64,
                             num_shards=4).take_all()
        # every (source, shard) has contiguous pack_ids from 0 and all
        # packs within max_len unless single oversize
        seen = {}
        for r in out:
            assert r["n_tok"] <= 64 or r["n_seqs"] == 1
            seen.setdefault((r["source"], r["shard"]), []).append(r["pack_id"])
        for ids in seen.values():
            assert sorted(ids) == list(range(len(ids)))
        assert sum(r["n_seqs"] for r in out) == 200

    def test_deterministic_across_block_layouts(self):
        rows = [(f"d{i:03d}", list(range(1 + i % 17)), f"s{i % 2}")
                for i in range(120)]
        a = sorted(map(tuple, (r.values() for r in pack_sequences(
            ds_of(tok_tbl(rows), blocks=2), 32).take_all())))
        b = sorted(map(tuple, (r.values() for r in pack_sequences(
            ds_of(tok_tbl(rows), blocks=7), 32).take_all())))
        assert a == b


class TestChunkSequences:
    def test_shapes_and_overlap(self):
        t = tok_tbl([("a", list(range(7)), "s"), ("b", [9], "s")])
        out = chunk_sequences(ds_of(t), 4, overlap=2).take_all()
        by = {(r["doc_id"], r["chunk_id"]): r["tokens"] for r in out}
        assert by[("a", 0)] == [0, 1, 2, 3]
        assert by[("a", 1)] == [2, 3, 4, 5]
        assert by[("a", 2)] == [4, 5, 6]
        assert by[("b", 0)] == [9]
        assert len(out) == 4

    def test_no_overlap_covers_exactly(self):
        t = tok_tbl([("a", list(range(10)), "s")])
        out = chunk_sequences(ds_of(t, blocks=1), 4).take_all()
        cat = [x for r in sorted(out, key=lambda r: r["chunk_id"])
               for x in r["tokens"]]
        assert cat == list(range(10))

    def test_bad_overlap_raises(self):
        t = tok_tbl([("a", [1], "s")])
        with pytest.raises(ValueError):
            chunk_sequences(ds_of(t), 4, overlap=4)


class TestDecontaminate:
    def test_flags_exact_ngram_overlap(self):
        corpus = tok_tbl([
            ("clean", [1, 2, 3, 4, 5], "s"),
            ("dirty", [9, 9, 10, 11, 12, 13, 9], "s"),
            ("short", [10, 11], "s"),
        ])
        bench = tok_tbl([("b", [10, 11, 12], "s")])
        out = decontaminate(ds_of(corpus), bench, n=3).take_all()
        got = {r["doc_id"]: r["contaminated"] for r in out}
        assert got == {"clean": False, "dirty": True, "short": False}

    def test_drop_mode(self):
        corpus = tok_tbl([("a", [1, 2, 3], "s"), ("b", [4, 5, 6], "s")])
        bench = tok_tbl([("x", [1, 2, 3], "s")])
        out = decontaminate(ds_of(corpus), bench, n=3, mode="drop").take_all()
        assert [r["doc_id"] for r in out] == ["b"]

    def test_ngram_hashes_respect_row_boundaries(self):
        toks = pa.array([[1, 2, 3], [3, 1, 2]], pa.list_(pa.int32()))
        h, rows = ngram_hashes(toks, 3)
        assert len(h) == 2 and list(rows) == [0, 1]
        assert h[0] != h[1]  # (1,2,3) vs (3,1,2): order matters
        single = pa.array([[1, 2, 3]], pa.list_(pa.int32()))
        h2, _ = ngram_hashes(single, 3)
        assert h2[0] == h[0]  # no cross-row window ever formed


class TestDupPassages:
    def _corpus(self):
        rng = np.random.default_rng(0)
        docs = [rng.integers(0, 50_000, rng.integers(20, 120)).astype(np.int32)
                for _ in range(200)]
        span = rng.integers(0, 50_000, 40).astype(np.int32)
        docs[0] = np.concatenate([docs[0][:10], span, docs[0][10:]])
        docs[1] = np.concatenate([span, docs[1]])
        return pa.table({
            "doc_id": pa.array([f"d{i}" for i in range(200)]),
            "tokens": pa.array([d.tolist() for d in docs], pa.list_(pa.int32())),
        })

    def test_planted_span_found_exactly(self):
        t = self._corpus()
        out = dup_passages(rd.from_arrow(t).repartition(4), n=16).take_all()
        by = {r["doc_id"]: r for r in out}
        # a 40-token shared span has exactly 40-16+1 = 25 shared windows
        assert by["d0"]["n_dup"] == 25 and by["d1"]["n_dup"] == 25
        assert by["d1"]["dup_frac"] == 25 / by["d1"]["n_windows"]
        assert all(r["n_dup"] == 0 for r in out
                   if r["doc_id"] not in ("d0", "d1"))
        # docs shorter than n have no windows and no row
        assert all(r["n_windows"] > 0 for r in out)

    def test_sample_mod_is_content_consistent(self):
        t = self._corpus()
        full = {r["doc_id"]: r for r in
                dup_passages(rd.from_arrow(t).repartition(3), n=16).take_all()}
        samp = {r["doc_id"]: r for r in
                dup_passages(rd.from_arrow(t).repartition(3), n=16,
                             sample_mod=4).take_all()}
        # sampled counts are subsets, and the shared span is still seen
        # identically from both docs (selection by content hash)
        for d, r in samp.items():
            assert r["n_windows"] <= full[d]["n_windows"]
            assert r["n_dup"] <= full[d]["n_dup"]
        assert samp["d0"]["n_dup"] == samp["d1"]["n_dup"] > 0

    def test_min_docs_threshold(self):
        t = self._corpus()
        out = dup_passages(rd.from_arrow(t), n=16, min_docs=3).take_all()
        assert all(r["n_dup"] == 0 for r in out)


class TestTfIdf:
    def _tbl(self):
        return pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["the cat sat", "the the dog", "", "cat"]),
        })

    def test_doc_frequency(self):
        from vector_ray.ml.corpus import doc_frequency

        out = {r["word"]: r["df"] for r in
               doc_frequency(ds_of(self._tbl(), 3), col="text").take_all()}
        assert out == {"the": 2, "cat": 2, "sat": 1, "dog": 1}

    def test_tfidf_matches_reference(self):
        from vector_ray.ml.corpus import tfidf_score

        n = 4
        df = {"the": 2, "cat": 2, "sat": 1, "dog": 1}
        idf = {w: int(np.round(1e6 * np.log((n + 1) / (np.array([c + 1.0])))[0]))
               for w, c in df.items()}
        out = {r["doc_id"]: r for r in
               tfidf_score(ds_of(self._tbl(), 2), col="text",
                           id_col="doc_id").take_all()}
        assert out[1]["tfidf_micro"] == idf["the"] + idf["cat"] + idf["sat"]
        assert out[2]["tfidf_micro"] == 2 * idf["the"] + idf["dog"]
        assert out[1]["n_words"] == 3
        # empty doc: zero words, null mean
        assert out[3]["n_words"] == 0 and out[3]["tfidf"] is None
        assert out[4]["tfidf_micro"] == idf["cat"]
        # layout invariance
        out2 = {r["doc_id"]: r["tfidf_micro"] for r in
                tfidf_score(ds_of(self._tbl(), 4), col="text",
                            id_col="doc_id").take_all()}
        assert out2 == {k: v["tfidf_micro"] for k, v in out.items()}

    def test_max_vocab_guard(self):
        from vector_ray.ml.corpus import tfidf_score

        with pytest.raises(ValueError, match="max_vocab"):
            tfidf_score(ds_of(self._tbl(), 1), col="text", max_vocab=2)


class TestStripDupPassages:
    def test_matches_bruteforce_and_layout_invariant(self):
        from vector_ray.ml.tokens import row_token_hash, strip_dup_passages

        rng = np.random.default_rng(5)
        n = 4
        span = rng.integers(1000, 2000, 10).astype(np.int32)
        docs = []
        for i in range(30):
            base = rng.integers(0, 500, rng.integers(3, 25)).astype(np.int32)
            if i % 3 == 0:
                k = rng.integers(0, len(base) + 1)
                base = np.concatenate([base[:k], span, base[k:]])
            docs.append(base.tolist())
        t = pa.table({"doc_id": pa.array([f"d{i}" for i in range(30)]),
                      "tokens": pa.array(docs, pa.list_(pa.int32()))})

        P, M = 0x100000001B3, (1 << 64) - 1

        def wh(d, s):
            h = 0
            for j in range(n):
                h = (h * P + d[s + j]) & M
            return h

        cnt = {}
        for d in docs:
            for x in {wh(d, s) for s in range(max(0, len(d) - n + 1))}:
                cnt[x] = cnt.get(x, 0) + 1
        dups = {x for x, c in cnt.items() if c >= 2}
        want = {}
        for i, d in enumerate(docs):
            cov = np.zeros(len(d), bool)
            for s in range(max(0, len(d) - n + 1)):
                if wh(d, s) in dups:
                    cov[s:s + n] = True
            want[f"d{i}"] = [v for v, c in zip(d, cov) if not c]

        for parts in (1, 4):
            out = strip_dup_passages(ds_of(t, parts), n=n,
                                     min_docs=2).take_all()
            assert len(out) == 30
            for r in out:
                assert list(r["tokens"]) == want[r["doc_id"]], r["doc_id"]
                assert r["n_removed"] == len(docs[int(r["doc_id"][1:])]) - r["n_tok"]
        assert sum(r["n_removed"] for r in out) > 0

    def test_row_token_hash_matches_fold(self):
        from vector_ray.ml.tokens import row_token_hash

        P, M = 0x100000001B3, (1 << 64) - 1
        rows = [[1, 2, 3], [], [7], [2**31 - 1, 0, 5, 5]]
        got = row_token_hash(pa.array(rows, pa.list_(pa.int32())))
        for i, r in enumerate(rows):
            h = 0
            for v in r:
                h = (h * P + (v & M)) & M
            assert int(got[i]) == h
        # slice safety
        a = pa.array(rows, pa.list_(pa.int32()))
        assert row_token_hash(a.slice(1)).tolist() == got[1:].tolist()


class TestHeavyHitters:
    def _corpus(self):
        # skewed: term f"t{i}" appears (60 - i) times, i in 0..59
        words = []
        for i in range(60):
            words += [f"t{i:02d}"] * (60 - i)
        rng = np.random.default_rng(7)
        rng.shuffle(words)
        docs = [" ".join(words[i::20]) for i in range(20)]
        return pa.table({"text": pa.array(docs)})

    def test_exact_when_capacity_large(self):
        from vector_ray.ml.corpus import heavy_hitters, vocab_topk

        t = self._corpus()
        hh = heavy_hitters(rd.from_arrow(t).repartition(5), col="text",
                           k=10, capacity=1000).take_all()
        exact = vocab_topk(rd.from_arrow(t).repartition(5), col="text",
                           k=10).take_all()
        assert [(r["word"], r["cnt"]) for r in hh] == \
               [(r["word"], r["cnt"]) for r in exact]
        assert hh[0] == {"word": "t00", "cnt": 60}

    def test_mg_guarantee_small_capacity(self):
        from vector_ray.ml.corpus import heavy_hitters

        t = self._corpus()
        n_total = sum(60 - i for i in range(60))  # 1830
        cap = 16
        out = heavy_hitters(rd.from_arrow(t).repartition(6), col="text",
                            k=cap, capacity=cap).take_all()
        got = {r["word"]: r["cnt"] for r in out}
        thresh = n_total / (cap + 1)
        for i in range(60):
            true = 60 - i
            w = f"t{i:02d}"
            if true > thresh:
                # any term above n/(cap+1) must be present
                assert w in got, (w, true, thresh)
            if w in got:
                # counts are lower bounds within the summed error
                assert true - thresh <= got[w] <= true, (w, got[w], true)

    def test_token_mode(self):
        from vector_ray.ml.corpus import heavy_hitters

        t = pa.table({"tokens": pa.array(
            [[1, 1, 2], [1, 3, 3], [3, 3, 4]], pa.list_(pa.int32()))})
        out = heavy_hitters(rd.from_arrow(t).repartition(2), col="tokens",
                            k=2, capacity=100, mode="tokens").take_all()
        assert [(r["token"], r["cnt"]) for r in out] == [(3, 4), (1, 3)]

    def test_compress_is_deterministic_by_value(self):
        from vector_ray.ml.corpus import _mg_compress

        t = pa.table({"word": pa.array(["a", "b", "c", "d"]),
                      "cnt": pa.array([10, 7, 3, 3], pa.int64())})
        out = _mg_compress(t, "word", 2)
        assert out.to_pylist() == [{"word": "a", "cnt": 7}, {"word": "b", "cnt": 4}]
        # permuted input gives the same surviving set
        t2 = t.take(pa.array([3, 1, 0, 2]))
        out2 = _mg_compress(t2, "word", 2)
        assert sorted(out2.to_pylist(), key=lambda r: r["word"]) == out.to_pylist()


class TestPmiPairs:
    def test_matches_brute_force(self):
        import numpy as np

        from vector_ray.ml.corpus import _pmi_scores, pmi_pairs

        rng = np.random.default_rng(4)
        words = [f"w{i}" for i in range(30)]
        docs = [" ".join(rng.choice(words,
                                    size=rng.integers(3, 40)).tolist())
                for _ in range(300)]
        docs[5] = None
        docs[9] = ""
        t = pa.table({"text": pa.array(docs)})
        got = pmi_pairs(rd.from_arrow(t).repartition(6), window=2,
                        vocab_size=25, min_count=3, k=15).to_pandas()

        from collections import Counter
        wc = Counter()
        for d in docs:
            if d:
                wc.update(d.split())
        n_tok = sum(wc.values())
        vocab = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
        vwords = [w for w, _ in vocab]
        vcnt = np.array([c for _, c in vocab], np.int64)
        vid = {w: i for i, w in enumerate(vwords)}
        V = len(vwords)
        pcnt = Counter()
        for d in docs:
            if not d:
                continue
            cs = [vid.get(w, -1) for w in d.split()]
            for dd in (1, 2):
                for i in range(len(cs) - dd):
                    a, b = cs[i], cs[i + dd]
                    if a >= 0 and b >= 0:
                        pcnt[min(a, b) * V + max(a, b)] += 1
        n_pairs = sum(pcnt.values())
        cand = sorted((kk, c) for kk, c in pcnt.items() if c >= 3)
        key = np.array([kk for kk, _ in cand], np.int64)
        cnt = np.array([c for _, c in cand], np.int64)
        lo, hi = key // V, key % V
        pmi = _pmi_scores(cnt, vcnt[lo], vcnt[hi], n_tok, n_pairs)
        top = np.lexsort((key, -pmi))[:15]
        want = [(vwords[lo[i]], vwords[hi[i]], int(cnt[i]), float(pmi[i]))
                for i in top]
        assert list(map(tuple, got.values)) == want

    def test_empty_and_cap(self):
        import pytest

        from vector_ray.ml.corpus import pmi_pairs

        t = pa.table({"text": pa.array([None, ""], pa.string())})
        out = pmi_pairs(rd.from_arrow(t))
        assert len(out) == 0
        t2 = pa.table({"text": pa.array(["a b"] * 50)})
        with pytest.raises(ValueError, match="max_pairs"):
            pmi_pairs(rd.from_arrow(t2), min_count=1, max_pairs=0)
