"""Persisted template index (stages/templates.py index family):
novelty classification (new_group / changed / known), update-merge
equivalence with a one-shot mine, and the checkpoint swap."""

import os

import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.templates import (
    log_templates,
    template_index_build,
    template_index_update,
    template_novelty,
)


def _lines(rows):
    return rd.from_arrow(pa.table({"message": pa.array(rows, pa.string())}))


BASE = [
    "login user alice ok",
    "login user bob ok",
    "disk sda full",
    "disk sdb full",
]


class TestTemplateNovelty:
    def test_statuses(self, tmp_path):
        idx = str(tmp_path / "tidx")
        template_index_build(_lines(BASE), idx)
        batch = [
            "login user carol ok",          # fits login template: known
            "disk sda degraded",            # widens constant 'full': changed
            "restart service nginx now",    # brand-new group: new_group
        ]
        out = {r["t0"]: r for r in
               template_novelty(_lines(batch), idx).take_all()}
        assert out["login"]["status"] == "known"
        assert out["login"]["template_index"] == "login user <*> ok"
        assert out["disk"]["status"] == "changed"
        assert out["disk"]["template_batch"] == "disk sda degraded"
        assert out["restart"]["status"] == "new_group"
        assert out["restart"]["template_index"] is None
        assert out["restart"]["n_lines"] == 1

    def test_known_even_when_batch_is_narrower(self, tmp_path):
        """A batch whose lines agree where the index already has a
        wildcard is still 'known' — no constant widens."""
        idx = str(tmp_path / "tidx")
        template_index_build(_lines(BASE), idx)
        out = {r["t0"]: r for r in template_novelty(
            _lines(["disk sda full", "disk sda full"]), idx).take_all()}
        assert out["disk"]["status"] == "known"
        assert out["disk"]["n_lines"] == 2

    def test_update_merges_like_one_shot(self, tmp_path):
        idx = str(tmp_path / "tidx")
        extra = ["login user dave failed", "restart service nginx now"]
        template_index_build(_lines(BASE), idx)
        template_index_update(_lines(extra), idx)
        # render the updated index and compare to a one-shot mine of
        # the union — the merge must be exact
        from vector_ray.stages.templates import render_templates

        merged = rd.read_parquet(os.path.join(idx, "state-000001"))
        got = {(r["n_tok"], r["t0"]): (r["template"], r["n_lines"])
               for r in render_templates(merged).take_all()}
        want = {(r["n_tok"], r["t0"]): (r["template"], r["n_lines"])
                for r in log_templates(_lines(BASE + extra)).take_all()}
        assert got == want
        # after update the batch is 'known'
        out = {r["t0"]: r["status"] for r in
               template_novelty(_lines(extra), idx).take_all()}
        assert set(out.values()) == {"known"}

    def test_old_state_pruned_after_update(self, tmp_path):
        idx = str(tmp_path / "tidx")
        template_index_build(_lines(BASE), idx)
        template_index_update(_lines(["disk sdc full"]), idx)
        states = [d for d in os.listdir(idx) if d.startswith("state-")]
        assert states == ["state-000001"]


class TestConfigTransform:
    def test_config_template_novelty(self, tmp_path):
        from vector_ray.pipelines.config import TRANSFORMS

        idx = str(tmp_path / "tidx")
        template_index_build(_lines(BASE), idx)
        step = TRANSFORMS["template_novelty"]({
            "type": "template_novelty", "index": idx})
        out = {r["t0"]: r["status"] for r in step.apply(
            _lines(["login user zoe ok", "reboot host now"])).take_all()}
        assert out == {"login": "known", "reboot": "new_group"}


class TestTemplateMergeProperty:
    import hypothesis.strategies as st
    from hypothesis import given, settings

    words = st.sampled_from(["alpha", "beta", "gamma", "x1", "x2"])
    line = st.lists(words, min_size=1, max_size=4).map(" ".join)

    @given(st.lists(line, min_size=1, max_size=12),
           st.lists(line, min_size=1, max_size=12))
    @settings(max_examples=10, deadline=None)
    def test_update_equals_one_shot(self, tmp_path_factory, a, b):
        """index(A) updated with B must render exactly like a one-shot
        mine over A+B, for arbitrary line mixes (the min/max partial
        form is a lossless merge representation)."""
        import ray.data as rdd

        from vector_ray.stages.templates import render_templates

        tmp = tmp_path_factory.mktemp("tplprop")
        idx = str(tmp / "idx")
        template_index_build(_lines(a), idx)
        template_index_update(_lines(b), idx)
        import json

        with open(os.path.join(idx, "meta.json")) as fh:
            state = json.load(fh)["state"]
        merged = rdd.read_parquet(os.path.join(idx, state))
        got = {(r["n_tok"], r["t0"]): (r["template"], r["n_lines"])
               for r in render_templates(merged).take_all()}
        want = {(r["n_tok"], r["t0"]): (r["template"], r["n_lines"])
                for r in log_templates(_lines(a + b)).take_all()}
        assert got == want
