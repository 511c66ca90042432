"""Persistent seen-key index (state/seen.py): cross-run exact dedup —
build/filter/append round trips, multi-column keys, bucket-pruned
probes, compaction, and the incremental_dedupe convergence property
(re-ingesting any mix of old rows yields zero new rows)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from vector_ray.state.seen import (
    incremental_dedupe,
    seen_index_append,
    seen_index_build,
    seen_index_compact,
    seen_index_filter,
)


def _tbl(ids, extra=0):
    return pa.table({
        "k": pa.array(ids, pa.int64()),
        "payload": pa.array([i * 10 + extra for i in ids], pa.int64()),
    })


class TestSeenIndex:
    def test_build_then_filter(self, tmp_path):
        root = str(tmp_path / "idx")
        seen_index_build(rd.from_arrow(_tbl(range(100))), ["k"], root)
        newb = rd.from_arrow(_tbl(range(80, 140)))
        out = seen_index_filter(newb, ["k"], root).take_all()
        assert sorted(r["k"] for r in out) == list(range(100, 140))
        # payload columns ride through untouched
        assert all(r["payload"] == r["k"] * 10 for r in out)

    def test_append_then_filter(self, tmp_path):
        root = str(tmp_path / "idx")
        seen_index_build(rd.from_arrow(_tbl(range(50))), ["k"], root)
        seen_index_append(rd.from_arrow(_tbl(range(50, 90))), ["k"], root)
        out = seen_index_filter(rd.from_arrow(_tbl(range(120))), ["k"], root)
        assert sorted(r["k"] for r in out.take_all()) == list(range(90, 120))

    def test_multi_column_key(self, tmp_path):
        root = str(tmp_path / "idx")
        t = pa.table({
            "a": pa.array([1, 1, 2, 2], pa.int64()),
            "b": pa.array(["x", "y", "x", "y"], pa.string()),
        })
        seen_index_build(rd.from_arrow(t), ["a", "b"], root)
        probe = pa.table({
            "a": pa.array([1, 2, 3], pa.int64()),
            "b": pa.array(["y", "z", "x"], pa.string()),
        })
        out = seen_index_filter(rd.from_arrow(probe), ["a", "b"], root).take_all()
        got = sorted((r["a"], r["b"]) for r in out)
        assert got == [(2, "z"), (3, "x")]

    def test_compact_shrinks_duplicate_keys(self, tmp_path):
        root = str(tmp_path / "idx")
        seen_index_build(rd.from_arrow(_tbl(range(30))), ["k"], root)
        # append the SAME keys twice -> index stores them again
        seen_index_append(rd.from_arrow(_tbl(range(30))), ["k"], root)
        seen_index_append(rd.from_arrow(_tbl(range(30))), ["k"], root)
        kd = os.path.join(root, "keys")
        before = pq.read_table(kd).num_rows
        assert before > 30
        seen_index_compact(root)
        after = pq.read_table(kd).num_rows
        assert after == 30
        # filter semantics unchanged by compaction
        out = seen_index_filter(rd.from_arrow(_tbl(range(40))), ["k"], root)
        assert sorted(r["k"] for r in out.take_all()) == list(range(30, 40))

    def test_bucket_pruned_probe(self, tmp_path):
        from vector_ray.stages.bucketed import add_bucket

        root = str(tmp_path / "idx")
        seen_index_build(rd.from_arrow(_tbl(range(200))), ["k"], root,
                         num_buckets=8)
        probe = _tbl([5, 500])
        bkts = add_bucket(probe, ["k"], 8)["__bkt"].to_pylist()
        out = seen_index_filter(rd.from_arrow(probe), ["k"], root,
                                buckets=sorted(set(bkts)))
        assert [r["k"] for r in out.take_all()] == [500]

    def test_incremental_dedupe_rounds(self, tmp_path):
        root = str(tmp_path / "idx")
        # round 1: duplicates WITHIN the batch collapse too
        b1 = rd.from_arrow(_tbl([1, 2, 2, 3, 3, 3]))
        out1 = incremental_dedupe(b1, ["k"], root)
        assert sorted(r["k"] for r in out1.take_all()) == [1, 2, 3]
        # round 2: overlap drops, new keys pass
        out2 = incremental_dedupe(rd.from_arrow(_tbl([2, 3, 4, 5])), ["k"], root)
        assert sorted(r["k"] for r in out2.take_all()) == [4, 5]
        # round 3: all-old batch -> empty
        out3 = incremental_dedupe(rd.from_arrow(_tbl([1, 4, 5])), ["k"], root)
        assert out3.count() == 0

    def test_matches_single_shot_dedup(self, tmp_path):
        """Union of per-run outputs == one-shot distinct over the union."""
        rng = np.random.default_rng(11)
        runs = [rng.integers(0, 300, 150) for _ in range(4)]
        root = str(tmp_path / "idx")
        got = []
        seen_in_order = []
        for ids in runs:
            out = incremental_dedupe(
                rd.from_arrow(_tbl(ids.tolist())), ["k"], root)
            got.extend(r["k"] for r in out.take_all())
            seen_in_order.extend(ids.tolist())
        # exact first-occurrence set
        want = list(dict.fromkeys(seen_in_order))
        assert sorted(got) == sorted(want)
        assert len(got) == len(set(got))

    def test_bloom_prefiltered_filter_matches_plain(self, tmp_path):
        """batch_bloom_bits prunes index rows before the shuffle but
        must never change the anti-join result (no false negatives)."""
        root = str(tmp_path / "idx")
        seen_index_build(rd.from_arrow(_tbl(range(0, 5000, 2))), ["k"], root)
        probe = rd.from_arrow(_tbl([1, 2, 3, 4000, 4001, 9999]))
        plain = sorted(r["k"] for r in
                       seen_index_filter(probe, ["k"], root).take_all())
        fast = sorted(r["k"] for r in
                      seen_index_filter(probe, ["k"], root,
                                        batch_bloom_bits=1 << 16).take_all())
        assert fast == plain == [1, 3, 4001, 9999]

    def test_config_persistent_dedupe(self, tmp_path):
        """YAML-level `dedupe: {persist: dir}` drops keys seen by any
        previous run of the config (config.py _build_dedupe)."""
        from vector_ray.pipelines.config import TRANSFORMS

        step = TRANSFORMS["dedupe"]({
            "type": "dedupe", "fields": {"match": ["k"]},
            "persist": str(tmp_path / "dd"),
        })
        out1 = step.apply(rd.from_arrow(_tbl([1, 1, 2])))
        assert sorted(r["k"] for r in out1.take_all()) == [1, 2]
        out2 = step.apply(rd.from_arrow(_tbl([2, 3])))
        assert sorted(r["k"] for r in out2.take_all()) == [3]


class TestMinhashIngest:
    """Cross-run NEAR-dup ingest (ml/dedup.minhash_index_append/ingest):
    the fuzzy mirror of the seen-key index."""

    @staticmethod
    def _docs(pairs):
        import pyarrow as _pa

        ids, texts = zip(*pairs)
        return rd.from_arrow(_pa.table({
            "doc_id": _pa.array(ids, _pa.int64()),
            "text": _pa.array(texts, _pa.string()),
        }))

    def test_ingest_rounds(self, tmp_path):
        from vector_ray.ml.dedup import minhash_index_build, minhash_index_ingest

        base = [
            "the quick brown fox jumps over the lazy dog again and again",
            "pack my box with five dozen liquor jugs for the long trip",
            "sphinx of black quartz judge my vow said the old librarian",
        ]
        novel = [
            "completely different content about distributed stream engines",
            "another unrelated paragraph describing parquet row groups",
        ]
        idx = str(tmp_path / "mh")
        minhash_index_build(self._docs(list(enumerate(base))), idx)
        # batch B: copies of base docs (new ids) + two novel docs
        b = [(10, base[0]), (11, base[2])] + [(12, novel[0]), (13, novel[1])]
        s1 = minhash_index_ingest(self._docs(b), idx)
        got1 = sorted(r["doc_id"] for r in s1.take_all())
        assert got1 == [12, 13]
        # batch C: copy of a batch-B SURVIVOR -> the appended index
        # must catch it; plus one genuinely new doc
        c = [(20, novel[0]),
             (21, "a third fresh document mentioning actor pools and backpressure")]
        s2 = minhash_index_ingest(self._docs(c), idx)
        got2 = sorted(r["doc_id"] for r in s2.take_all())
        assert got2 == [21]


class TestInvertedAppend:
    def test_append_equals_full_build(self, tmp_path):
        """build(A) + append(B) must search identically to build(A∪B)."""
        import pyarrow as _pa
        from vector_ray.ml.search_index import (inverted_index_append,
                                                inverted_index_build,
                                                inverted_index_search)

        texts = [
            "stream engine block data", "parquet row group data",
            "actor pool stream backpressure", "index data block stream",
            "sort shuffle exchange", "tokenizer merge rules data",
        ]
        def mk(lo, hi):
            return rd.from_arrow(_pa.table({
                "doc_id": _pa.array(list(range(lo, hi)), _pa.int64()),
                "text": _pa.array(texts[lo:hi], _pa.string()),
            }))

        inc_dir, full_dir = str(tmp_path / "inc"), str(tmp_path / "full")
        inverted_index_build(mk(0, 3), inc_dir)
        inverted_index_append(mk(3, 6), inc_dir)
        inverted_index_build(mk(0, 6), full_dir)
        q = "stream data block"
        got, _ = inverted_index_search(inc_dir, q, k=10)
        want, _ = inverted_index_search(full_dir, q, k=10)
        assert got.to_pydict() == want.to_pydict()

    def test_append_false_defers_recording(self, tmp_path):
        """append=False: the caller controls at-least-once ordering —
        keys only become 'seen' via an explicit seen_index_append."""
        root = str(tmp_path / "idx")
        out1 = incremental_dedupe(rd.from_arrow(_tbl([1, 2])), ["k"], root,
                                  append=False)
        assert sorted(r["k"] for r in out1.take_all()) == [1, 2]
        # nothing recorded yet: the same batch re-emits
        out2 = incremental_dedupe(rd.from_arrow(_tbl([1, 2])), ["k"], root,
                                  append=False)
        assert sorted(r["k"] for r in out2.take_all()) == [1, 2]
        seen_index_append(out2, ["k"], root)
        out3 = incremental_dedupe(rd.from_arrow(_tbl([1, 2, 3])), ["k"], root)
        assert sorted(r["k"] for r in out3.take_all()) == [3]


class TestSeenTTL:
    def _ts_tbl(self, pairs):
        ks, ts = zip(*pairs)
        return rd.from_arrow(pa.table({
            "k": pa.array(ks, pa.int64()),
            "ts": pa.array(ts, pa.int64()),
        }))

    def test_expire_drops_old_keys(self, tmp_path):
        from vector_ray.state.seen import seen_index_expire

        root = str(tmp_path / "idx")
        seen_index_build(self._ts_tbl([(1, 100), (2, 200), (3, 300)]),
                         ["k"], root, ts_col="ts")
        res = seen_index_expire(root, 250)
        assert res == {"keys_dropped": 2, "keys_kept": 1}
        out = seen_index_filter(self._ts_tbl([(1, 400), (2, 400), (3, 400)]),
                                ["k"], root)
        # expired keys 1,2 count as new again; 3 still seen
        assert sorted(r["k"] for r in out.take_all()) == [1, 2]

    def test_newest_sighting_wins(self, tmp_path):
        """An append refreshes a key's timestamp: expiry keeps it."""
        from vector_ray.state.seen import seen_index_expire

        root = str(tmp_path / "idx")
        seen_index_build(self._ts_tbl([(7, 100)]), ["k"], root, ts_col="ts")
        seen_index_append(self._ts_tbl([(7, 500)]), ["k"], root, ts_col="ts")
        res = seen_index_expire(root, 300)
        assert res["keys_kept"] == 1 and res["keys_dropped"] == 0
        out = seen_index_filter(self._ts_tbl([(7, 600)]), ["k"], root)
        assert out.count() == 0  # still seen

    def test_append_without_ts_raises_on_ts_index(self, tmp_path):
        root = str(tmp_path / "idx")
        seen_index_build(self._ts_tbl([(1, 100)]), ["k"], root, ts_col="ts")
        with pytest.raises(ValueError):
            seen_index_append(self._ts_tbl([(2, 200)]), ["k"], root)

    def test_ts_compact_keeps_newest(self, tmp_path):
        root = str(tmp_path / "idx")
        seen_index_build(self._ts_tbl([(5, 100)]), ["k"], root, ts_col="ts")
        seen_index_append(self._ts_tbl([(5, 900)]), ["k"], root, ts_col="ts")
        seen_index_compact(root)
        kd = os.path.join(root, "keys")
        t = pq.read_table(kd)
        assert t.num_rows == 1
        assert t["__seen_ts"].to_pylist() == [900]

    def test_incremental_dedupe_with_ts_then_expire(self, tmp_path):
        from vector_ray.state.seen import seen_index_expire

        root = str(tmp_path / "idx")
        out1 = incremental_dedupe(self._ts_tbl([(1, 10), (2, 20)]),
                                  ["k"], root, ts_col="ts")
        assert out1.count() == 2
        seen_index_expire(root, 15)  # key 1 expires
        out2 = incremental_dedupe(self._ts_tbl([(1, 30), (2, 30)]),
                                  ["k"], root, ts_col="ts")
        assert sorted(r["k"] for r in out2.take_all()) == [1]
