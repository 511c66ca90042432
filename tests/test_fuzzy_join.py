"""fuzzy_join (stages/fuzzy.py): exactness vs a brute-force Python
Levenshtein mirror, self vs two-sided modes, d=0 equality, layout
invariance, null/empty/short-string edges, the exact-mode bucket cap."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.fuzzy import _edit_band, fuzzy_join


def _lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def _brute_self(names, d):
    out = set()
    for i, a in enumerate(names):
        for j in range(i + 1, len(names)):
            b = names[j]
            if a is None or b is None:
                continue
            dist = _lev(a, b)
            if dist <= d:
                out.add((i, j, dist))
    return out


def _rows(res):
    return set((r["l_id"], r["r_id"], r["dist"]) for r in res.take_all())


def _tbl(names):
    return pa.table({
        "id": pa.array(range(len(names)), pa.int64()),
        "name": pa.array(names, pa.string()),
    })


def _rand_words(n, rng):
    alpha = "abcde"
    base = ["".join(rng.choice(list(alpha), size=rng.integers(0, 9)))
            for _ in range(n)]
    return base


class TestFuzzyJoin:
    @pytest.mark.parametrize("d", [0, 1, 2])
    def test_matches_bruteforce_self(self, d):
        rng = np.random.default_rng(17 + d)
        names = _rand_words(120, rng)
        names[5] = None  # nulls never match
        got = _rows(fuzzy_join(rd.from_arrow(_tbl(names)).repartition(4),
                               on="name", id_col="id", max_dist=d))
        assert got == _brute_self(names, d)

    def test_two_sided(self):
        left = ["kitten", "flaw", "gumbo", "x"]
        right = ["sitting", "lawn", "gambol", "", "xy"]
        lt = pa.table({"lid": pa.array(range(4), pa.int64()),
                       "lname": pa.array(left)})
        rt = pa.table({"rid": pa.array(range(10, 15), pa.int64()),
                       "rname": pa.array(right)})
        got = _rows(fuzzy_join(
            rd.from_arrow(lt), rd.from_arrow(rt), on="lname",
            right_on="rname", id_col="lid", right_id_col="rid",
            max_dist=2))
        want = set()
        for i, a in enumerate(left):
            for j, b in enumerate(right):
                dist = _lev(a, b)
                if dist <= 2:
                    want.add((i, j + 10, dist))
        assert got == want
        assert (3, 13, 1) in got and (3, 14, 1) in got  # short strings

    def test_layout_invariant(self):
        rng = np.random.default_rng(3)
        names = _rand_words(200, rng)
        a = _rows(fuzzy_join(rd.from_arrow(_tbl(names)).repartition(2),
                             on="name", id_col="id", max_dist=1))
        b = _rows(fuzzy_join(rd.from_arrow(_tbl(names)).repartition(9),
                             on="name", id_col="id", max_dist=1))
        assert a == b

    def test_common_prefix_population(self):
        # degenerate blocking (every key shares a long prefix) must
        # still be exact — the supplier-style workload
        names = [f"Supplier#{i:09d}" for i in range(80)]
        got = _rows(fuzzy_join(rd.from_arrow(_tbl(names)).repartition(3),
                               on="name", id_col="id", max_dist=1))
        assert got == _brute_self(names, 1)
        assert len(got) > 0

    def test_chunked_verify_identical(self):
        # tiny verify chunks (memory bound) must not change the result
        names = ["Supplier#%04d" % i for i in range(60)]
        ds = rd.from_arrow(_tbl(names))
        got = _rows(fuzzy_join(ds, on="name", id_col="id", max_dist=1,
                               num_buckets=1, max_pairs_per_bucket=7))
        assert got == _brute_self(names, 1)

    def test_resolve_entities(self):
        from vector_ray.stages.fuzzy import resolve_entities

        names = ["acme corp", "acme c0rp", "acme corp.", "zzz inc",
                 "zzz inc", None, "solo ltd"]
        out = sorted((r["id"], r["canonical"]) for r in resolve_entities(
            rd.from_arrow(_tbl(names)).repartition(3), on="name",
            id_col="id", max_dist=1).take_all())
        # 0-1-2 chain via transitivity; 3=4 exact; null + solo single
        assert out == [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 5),
                       (6, 6)]

    def test_resolve_entities_paths_agree(self):
        # driver union-find fast path vs distributed label propagation
        from vector_ray.stages.fuzzy import resolve_entities

        names = ["acme corp", "acme c0rp", "acme corp.", "zzz inc",
                 "zzz inc", "solo ltd"]
        run = lambda cap: sorted(
            (r["id"], r["canonical"]) for r in resolve_entities(
                rd.from_arrow(_tbl(names)).repartition(2), on="name",
                id_col="id", max_dist=1,
                driver_pairs_cap=cap).take_all())
        assert run(10**6) == run(0)

    def test_resolve_entities_matches_unionfind(self):
        from vector_ray.stages.fuzzy import resolve_entities

        rng = np.random.default_rng(23)
        names = _rand_words(150, rng)
        got = sorted((r["id"], r["canonical"]) for r in resolve_entities(
            rd.from_arrow(_tbl(names)).repartition(5), on="name",
            id_col="id", max_dist=1).take_all())
        parent = list(range(len(names)))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i, j, _ in sorted(_brute_self(names, 1)):
            ra, rb = find(i), find(j)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = sorted((i, find(i)) for i in range(len(names)))
        assert got == want

    def test_edit_band_kernel(self):
        rng = np.random.default_rng(5)
        pairs = [(a, b) for a in _rand_words(30, rng)
                 for b in _rand_words(30, rng)]
        flat_a = b"".join(p[0].encode() for p in pairs)
        flat_b = b"".join(p[1].encode() for p in pairs)
        fa = np.frombuffer(flat_a, np.uint8)
        fb = np.frombuffer(flat_b, np.uint8)
        la = np.array([len(p[0]) for p in pairs], np.int64)
        lb = np.array([len(p[1]) for p in pairs], np.int64)
        sa = np.zeros(len(pairs), np.int64)
        np.cumsum(la[:-1], out=sa[1:])
        sb = np.zeros(len(pairs), np.int64)
        np.cumsum(lb[:-1], out=sb[1:])
        for d in (0, 1, 2, 3):
            got = _edit_band(fa, sa, la, fb, sb, lb, d)
            want = np.array([min(_lev(a, b), d + 1) for a, b in pairs])
            assert (got == want).all()
