"""Property-based tests (hypothesis) — the analogue of the reference's
VRL proptests (lib/vrl/proptests/)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_ray.expr import F

ident = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=1, max_size=12)
plain = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F),
    min_size=0,
    max_size=30,
)


class TestRoundTrips:
    @given(st.lists(st.integers(0, 2**32 - 1), min_size=1, max_size=20))
    @settings(max_examples=50, deadline=None)
    def test_ip_aton_ntoa_roundtrip(self, nums):
        ips = F.ip_ntoa(pa.array(nums, pa.uint32()))
        back = F.ip_aton(ips)
        assert back.to_pylist() == nums

    @given(st.lists(plain, min_size=1, max_size=10), st.sampled_from([",", "|", ";"]))
    @settings(max_examples=50, deadline=None)
    def test_split_join_roundtrip(self, parts, sep):
        s = sep.join(parts)
        out = F.join(F.split(pa.array([s]), sep), sep)
        assert out.to_pylist() == [s]

    @given(st.lists(st.tuples(plain, st.integers(-(10**6), 10**6)), min_size=1, max_size=8))
    @settings(max_examples=50, deadline=None)
    def test_template_render_matches_python(self, rows):
        t = pa.table(
            {"a": pa.array([r[0] for r in rows]), "n": pa.array([r[1] for r in rows])}
        )
        out = F.render(t, "{{a}}-x-{{n}}")
        assert out.to_pylist() == [f"{a}-x-{n}" for a, n in rows]


class TestFingerprint:
    @given(st.lists(plain, min_size=1, max_size=30))
    @settings(max_examples=50, deadline=None)
    def test_deterministic_and_native_parity(self, vals):
        import vector_ray.native as nv

        arr = pa.array(vals, pa.string())
        f1 = F.fingerprint(arr).to_pylist()
        saved = (nv._lib, nv._tried)
        try:
            nv._lib, nv._tried = None, True  # force numpy path
            f2 = F.fingerprint(arr).to_pylist()
        finally:
            nv._lib, nv._tried = saved
        assert f1 == f2
        assert F.fingerprint(arr).to_pylist() == f1

    @given(plain, plain)
    @settings(max_examples=50, deadline=None)
    def test_equal_iff_same_string_mostly(self, a, b):
        fa = F.fingerprint(pa.array([a])).to_pylist()[0]
        fb = F.fingerprint(pa.array([b])).to_pylist()[0]
        if a == b:
            assert fa == fb


class TestTokenMinHashProperties:
    @given(st.lists(st.integers(0, 50256), min_size=5, max_size=60),
           st.lists(st.integers(0, 50256), min_size=0, max_size=20))
    @settings(max_examples=40, deadline=None)
    def test_superset_monotonicity(self, base, extra):
        """Appending tokens can only lower (or keep) each minhash value."""
        from vector_ray.ml.dedup import TokenMinHash

        mh = TokenMinHash(num_hashes=4)
        t1 = pa.table({"tokens": pa.array([base], pa.list_(pa.int32()))})
        t2 = pa.table({"tokens": pa.array([base + extra], pa.list_(pa.int32()))})
        s1 = mh(t1)
        s2 = mh(t2)
        for h in range(4):
            assert s2[f"tok_sig{h}"].to_pylist()[0] <= s1[f"tok_sig{h}"].to_pylist()[0]

    @given(st.lists(st.lists(st.integers(0, 50256), min_size=0, max_size=30),
                    min_size=1, max_size=10))
    @settings(max_examples=30, deadline=None)
    def test_batch_invariance(self, rows):
        from vector_ray.ml.dedup import TokenMinHash

        mh = TokenMinHash(num_hashes=2)
        whole = mh(pa.table({"tokens": pa.array(rows, pa.list_(pa.int32()))}))
        per_row = [
            mh(pa.table({"tokens": pa.array([r], pa.list_(pa.int32()))})) for r in rows
        ]
        for h in range(2):
            assert whole[f"tok_sig{h}"].to_pylist() == [
                p[f"tok_sig{h}"].to_pylist()[0] for p in per_row
            ]


class TestSampleProperty:
    @given(st.lists(ident, min_size=1, max_size=50, unique=True), st.integers(2, 20))
    @settings(max_examples=30, deadline=None)
    def test_sample_subset_and_deterministic(self, keys, rate):
        from vector_ray.stages import Sample

        t = pa.table({"k": pa.array(keys)})
        s = Sample(rate, "k")
        a = s.transform(t)["k"].to_pylist()
        b = s.transform(t)["k"].to_pylist()
        assert a == b
        assert set(a) <= set(keys)


class TestHLLProperty:
    @given(st.integers(50, 3000))
    @settings(max_examples=15, deadline=None)
    def test_estimate_within_10pct(self, n):
        from vector_ray.stages.sketch import HLL

        h = HLL()
        h.add_strings(pa.array([f"val-{i}" for i in range(n)]))
        assert abs(h.estimate() - n) / n < 0.10


class TestGroupedAggregateProperty:
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c", "hot"]),
                st.one_of(st.integers(-1000, 1000), st.none()),
            ),
            min_size=1,
            max_size=60,
        ),
        st.integers(1, 4),
    )
    @settings(max_examples=25, deadline=None)
    def test_matches_pandas(self, rows, blocks):
        import pandas as pd
        import ray.data as rd

        from vector_ray.stages import grouped_aggregate

        t = pa.table(
            {
                "k": pa.array([r[0] for r in rows]),
                "v": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
        out = grouped_aggregate(
            rd.from_arrow(t).repartition(blocks),
            ["k"],
            {"s": ("sum", "v"), "mn": ("min", "v"), "mx": ("max", "v"),
             "n": ("count", "v"), "nd": ("nunique", "v")},
        ).take_all()
        got = {r["k"]: r for r in out}
        df = t.to_pandas()
        for k, g in df.groupby("k"):
            vals = g["v"].dropna()
            r = got[k]
            if len(vals):
                assert r["s"] == vals.sum()
                assert r["mn"] == vals.min()
                assert r["mx"] == vals.max()
            else:
                assert r["s"] is None
            assert r["n"] == len(vals)
            assert r["nd"] == vals.nunique()
        assert set(got) == set(df["k"].unique())


class TestRouteProperty:
    @given(
        st.lists(st.tuples(st.integers(0, 999), st.sampled_from(["hot", "warm", "cold"])),
                 min_size=1, max_size=50)
    )
    @settings(max_examples=30, deadline=None)
    def test_multiplicity_equals_matching_lanes(self, rows):
        from vector_ray.expr import C
        from vector_ray.stages.route import Route

        t = pa.table(
            {"x": pa.array([r[0] for r in rows]), "tier": pa.array([r[1] for r in rows])}
        )
        route = Route(
            {"big": C.ge("x", 500), "hot": C.eq("tier", "hot"), "even": C.expr(
                lambda tb: pc.equal(F.mod(tb["x"], 2), 0))},
            unmatched_lane="rest",
        )
        out = route._explode_batch(t)
        # every input row appears exactly max(1, #matching lanes) times
        import collections

        counts = collections.Counter(zip(out["x"].to_pylist(), out["tier"].to_pylist()))
        for x, tier in rows:
            expect = (x >= 500) + (tier == "hot") + (x % 2 == 0)
            assert counts[(x, tier)] >= max(1, expect)  # >= because duplicate input rows sum
        assert len(out) == sum(
            max(1, (x >= 500) + (tier == "hot") + (x % 2 == 0)) for x, tier in rows
        )


class TestPercentCodecProperty:
    @given(st.lists(st.text(max_size=40), max_size=20))
    @settings(max_examples=30, deadline=None)
    def test_roundtrip_any_unicode(self, texts):
        arr = pa.array(texts, pa.string())
        assert F.decode_percent(F.encode_percent(arr)).to_pylist() == texts

    @given(st.lists(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                            max_size=40), max_size=20))
    @settings(max_examples=30, deadline=None)
    def test_encode_matches_urllib(self, texts):
        import urllib.parse

        arr = pa.array(texts, pa.string())
        want = [urllib.parse.quote(t, safe="-_.~") for t in texts]
        assert F.encode_percent(arr).to_pylist() == want


class TestQuantileProperty:
    @given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                              allow_nan=False, allow_infinity=False),
                    min_size=1, max_size=300),
           st.floats(min_value=0.01, max_value=0.99))
    @settings(max_examples=15, deadline=None)
    def test_matches_sorted_rank(self, vals, p):
        import math

        import ray.data as rd

        from vector_ray.stages.quantile import exact_quantiles

        ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.float64())})).repartition(3)
        got = exact_quantiles(ds, "v", [p], bins=16, cap=50)
        s = sorted(vals)
        want = s[max(1, math.ceil(p * len(s))) - 1]
        assert got == [want]


class TestCaseConversionProperty:
    @given(st.lists(st.text(alphabet=st.characters(min_codepoint=48, max_codepoint=122),
                            max_size=25), max_size=15))
    @settings(max_examples=30, deadline=None)
    def test_snake_is_idempotent_and_lower(self, texts):
        arr = pa.array(texts, pa.string())
        once = F.snakecase(arr)
        twice = F.snakecase(once)
        assert once.to_pylist() == twice.to_pylist()
        for v in once.to_pylist():
            assert v == v.lower()


class TestCurationProperties:
    url_chars = st.text(
        alphabet="abcXYZ019-._~%&=?/#:@", min_size=0, max_size=30)

    @given(st.lists(url_chars, min_size=1, max_size=20))
    @settings(max_examples=60, deadline=None)
    def test_normalize_urls_idempotent(self, tails):
        from vector_ray.ml.urls import normalize_urls
        urls = [f"http://Host{i}.Example.com/{t}" for i, t in enumerate(tails)]
        once = normalize_urls(pa.array(urls, pa.string()))
        twice = normalize_urls(once)
        assert once.to_pylist() == twice.to_pylist()

    @given(st.lists(st.text(
        alphabet="abc XYZ.!?\"{\njavascript\t", min_size=0, max_size=80),
        min_size=1, max_size=12))
    @settings(max_examples=60, deadline=None)
    def test_c4_clean_idempotent_on_clean_text(self, texts):
        # cleaning already-cleaned text must be a fixpoint: every kept
        # line already satisfies all line rules
        from vector_ray.ml.clean import c4_clean_batch
        first = c4_clean_batch(texts)
        cleaned = first["text_clean"].to_pylist()
        second = c4_clean_batch(cleaned)
        assert second["text_clean"].to_pylist() == cleaned
        assert (second["n_lines_kept"] == first["n_lines_kept"]).all()
        assert (second["n_sentences"] == first["n_sentences"]).all()

    @given(st.lists(st.text(
        alphabet="ab c.\nx", min_size=0, max_size=60),
        min_size=1, max_size=10))
    @settings(max_examples=40, deadline=None)
    def test_repetition_signals_invariants(self, texts):
        from vector_ray.ml.text import repetition_signals_batch
        sig = repetition_signals_batch(texts)
        assert (sig["dup_line_cnt"] <= sig["n_lines"]).all()
        assert (sig["dup_line_chars"] <= sig["line_chars"]).all()
        assert (sig["dup5_chars"] <= sig["word_chars"]).all()
        assert (sig["top2_chars"] >= 0).all()


class TestUnitIndexSplitParity:
    """ml/clean.py _line_index / _para_index vs Python str.split
    semantics (the contract the line/paragraph-dedup SQL oracles rely
    on): non-empty parts with 1-based split ordinality, byte-exact."""

    texty = st.text(
        alphabet=st.sampled_from(list("ab \n\x00é")), min_size=0, max_size=40)

    @staticmethod
    def _extract(index_fn, texts, sep):
        from vector_ray.ml.clean import _gather_strings

        flat, ls, ll, dol, uno, _, n = index_fn(texts)
        parts = _gather_strings(flat, ls, ll).to_pylist()
        got = [[] for _ in range(n)]
        for d, no, p in zip(dol, uno, parts):
            got[int(d)].append((int(no), p))
        want = [[(j + 1, p) for j, p in enumerate((t or "").split(sep)) if p]
                for t in texts]
        return got, want

    @given(st.lists(texty, min_size=1, max_size=8))
    @settings(max_examples=120, deadline=None)
    def test_line_index_matches_split(self, texts):
        from vector_ray.ml.clean import _line_index

        got, want = self._extract(_line_index, texts, "\n")
        assert got == want

    @given(st.lists(texty, min_size=1, max_size=8))
    @settings(max_examples=120, deadline=None)
    def test_para_index_matches_split(self, texts):
        from vector_ray.ml.clean import _para_index

        got, want = self._extract(_para_index, texts, "\n\n")
        assert got == want

    @given(st.lists(st.one_of(st.none(), texty), min_size=1, max_size=8))
    @settings(max_examples=120, deadline=None)
    def test_line_index_arrow_parity(self, texts):
        """The zero-copy Arrow-buffer line index must agree with the
        Python-string reference on every field, nulls = empty docs."""
        from vector_ray.ml.clean import (_gather_strings, _line_index,
                                         _line_index_arrow)

        arr = pa.array(texts, pa.string())
        fa, sa, la, da, na, _, n_a = _line_index_arrow(arr)
        fp, sp, lp, dp, np_, _, n_p = _line_index(
            [t if t is not None else "" for t in texts])
        assert n_a == n_p
        assert _gather_strings(fa, sa, la).to_pylist() == \
            _gather_strings(fp, sp, lp).to_pylist()
        assert list(da) == list(dp)
        assert list(na) == list(np_)

    @given(st.lists(st.one_of(st.none(), texty), min_size=1, max_size=8),
           st.sampled_from([0x0A, 0x00]))
    @settings(max_examples=120, deadline=None)
    def test_flat_joined_matches_encode_join(self, texts, sep):
        from vector_ray.ml.clean import _flat_joined

        flat, starts, n = _flat_joined(pa.array(texts, pa.string()), sep)
        bufs = [(t or "").encode("utf-8") for t in texts]
        want = bytes([sep]).join(bufs) + bytes([sep])
        assert flat.tobytes() == want
        woff = [0]
        for b in bufs[:-1]:
            woff.append(woff[-1] + len(b) + 1)
        assert list(starts) == woff and n == len(texts)


class TestBpeMergeKernel:
    sym = st.integers(95, 99)  # tiny alphabet forces chains/overlaps

    @given(st.lists(st.lists(sym, min_size=0, max_size=12),
                    min_size=1, max_size=6),
           st.tuples(sym, sym))
    @settings(max_examples=150, deadline=None)
    def test_apply_merge_matches_per_row_python(self, rows, pair):
        import numpy as np

        from vector_ray.ml.bpe import _apply_merge_flat

        a, b = pair
        vals = np.array([s for r in rows for s in r], np.int32)
        offs = np.zeros(len(rows) + 1, np.int64)
        offs[1:] = np.cumsum([len(r) for r in rows])
        nv, no = _apply_merge_flat(vals, offs, a, b, 300)
        got = [list(nv[no[i]:no[i + 1]]) for i in range(len(rows))]
        want = []
        for r in rows:
            i, out = 0, []
            while i < len(r):
                if i + 1 < len(r) and r[i] == a and r[i + 1] == b:
                    out.append(300)
                    i += 2
                else:
                    out.append(r[i])
                    i += 1
            want.append(out)
        assert got == want


class TestSegmentedCummaxProperty:
    @given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=200),
           st.data())
    @settings(max_examples=100, deadline=None)
    def test_matches_loop(self, xs, data):
        import numpy as np

        from vector_ray.stages.intervals import _segmented_cummax

        seg = [True] + [data.draw(st.booleans()) for _ in xs[1:]]
        x = np.asarray(xs, np.int64)
        s = np.asarray(seg, bool)
        ref, cur = [], None
        for v, st_ in zip(x, s):
            cur = v if st_ else max(cur, v)
            ref.append(cur)
        assert _segmented_cummax(x, s).tolist() == ref


class TestMergeIntervalsProperty:
    @given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 60),
                              st.integers(0, 30)),
                    min_size=1, max_size=80),
           st.integers(0, 5))
    @settings(max_examples=40, deadline=None)
    def test_matches_brute(self, spans, gap):
        import collections

        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from vector_ray.stages.intervals import merge_intervals

        key = [k for k, _, _ in spans]
        s = [a for _, a, _ in spans]
        e = [a + w for _, a, w in spans]
        t = pa.table({"k": pa.array(key, pa.int64()),
                      "s": pa.array(s, pa.int64()),
                      "e": pa.array(e, pa.int64())})
        out = merge_intervals(rd.from_arrow(t).repartition(3),
                              "k", "s", "e", min_gap=gap,
                              count_col="n").to_pandas()
        got = sorted(map(tuple, out[["k", "s", "e", "n"]].values))
        by = collections.defaultdict(list)
        for kk, ss, ee in zip(key, s, e):
            by[kk].append((ss, ee))
        want = []
        for kk in sorted(by):
            cur = None
            for ss, ee in sorted(by[kk]):
                if cur is None:
                    cur = [ss, ee, 1]
                elif ss <= cur[1] + gap:
                    cur[1] = max(cur[1], ee)
                    cur[2] += 1
                else:
                    want.append((kk, *cur))
                    cur = [ss, ee, 1]
            if cur is not None:
                want.append((kk, *cur))
        assert got == sorted(want)


class TestAucProperty:
    @given(st.lists(st.tuples(st.integers(0, 20), st.booleans()),
                    min_size=2, max_size=120))
    @settings(max_examples=40, deadline=None)
    def test_matches_pair_counting(self, rows):
        import pyarrow as pa
        import ray.data as rd

        from vector_ray.ml.metrics import auc_score

        s = [float(a) for a, _ in rows]
        y = [b for _, b in rows]
        t = pa.table({"s": pa.array(s), "y": pa.array(y)})
        out = auc_score(rd.from_arrow(t).repartition(3), "s", "y")
        auc = out["auc"][0].as_py()
        pos = [v for v, lab in zip(s, y) if lab]
        neg = [v for v, lab in zip(s, y) if not lab]
        if not pos or not neg:
            assert auc is None
            return
        wins = sum((p > q) + 0.5 * (p == q) for p in pos for q in neg)
        assert auc == wins / (len(pos) * len(neg))


class TestRankValuesProperty:
    @given(st.lists(st.integers(-50, 50), min_size=1, max_size=150))
    @settings(max_examples=30, deadline=None)
    def test_matches_counting_definition(self, vals):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from vector_ray.stages.rownum import rank_values

        t = pa.table({"id": pa.array(range(len(vals)), pa.int64()),
                      "v": pa.array([float(v) for v in vals])})
        out = (rank_values(rd.from_arrow(t).repartition(3), "v",
                           id_col="id")
               .to_pandas().sort_values("id").reset_index(drop=True))
        arr = np.asarray(vals, np.float64)
        n = len(arr)
        for i in range(n):
            below = int((arr < arr[i]).sum())
            le = int((arr <= arr[i]).sum())
            assert out["pct_rank"][i] == below / max(n - 1, 1)
            assert out["cume_dist"][i] == le / n


class TestWordHashPaths:
    # the Arrow zero-copy path of flat_word_hashes (no separator
    # bytes; word runs split at doc boundaries) must be bit-identical
    # to the legacy list path on ASCII — including empty/None docs
    # sandwiched between word-adjacent docs (the r5 zero-length-run
    # bug class). Alphabet is ASCII-only: non-ASCII lowercasing is a
    # DOCUMENTED deviation (utf8_lower vs str.lower) out of scope.
    _doc = st.one_of(
        st.none(),
        st.text(
            alphabet="abcXYZ019_ .,-!\t\n",
            min_size=0,
            max_size=20,
        ),
    )

    @given(st.lists(_doc, min_size=0, max_size=12))
    @settings(max_examples=200, deadline=None)
    def test_arrow_path_bit_identical_to_list_path(self, docs):
        from vector_ray.ml.dedup import flat_word_hashes, simhash_batch

        col = pa.array(docs, pa.string())
        h_l, d_l = flat_word_hashes(docs)
        h_a, d_a = flat_word_hashes(col)
        assert np.array_equal(h_l, h_a) and np.array_equal(d_l, d_a)
        assert np.array_equal(simhash_batch(docs), simhash_batch(col))

    @given(st.lists(_doc, min_size=1, max_size=8), st.integers(1, 4))
    @settings(max_examples=50, deadline=None)
    def test_chunked_equals_combined(self, docs, nchunks):
        from vector_ray.ml.dedup import flat_word_hashes

        k = max(1, len(docs) // nchunks)
        chunks = [pa.array(docs[i:i + k], pa.string())
                  for i in range(0, len(docs), k)]
        ch = pa.chunked_array(chunks)
        h_c, d_c = flat_word_hashes(ch)
        h_1, d_1 = flat_word_hashes(pa.array(docs, pa.string()))
        assert np.array_equal(h_c, h_1) and np.array_equal(d_c, d_1)
