"""datadog_search condition grammar → Cond
(src/conditions/datadog_search.rs, re-expressed in
vector_ray/expr/datadog_search.py)."""

import pyarrow as pa
import pytest

from vector_ray.expr.datadog_search import parse_datadog_search as P


@pytest.fixture
def t():
    return pa.table({
        "message": ["Error connecting to db", "all good here", "error: timeout",
                    "warning issued", None],
        "status": ["error", "ok", "error", "warn", "ok"],
        "code": [500, 200, 503, 301, 200],
        "tags": pa.array([["env:prod", "svc:api"], ["env:dev"], ["env:prod"], [], None],
                         pa.list_(pa.string())),
    })


def run(q, t, **kw):
    return P(q, **kw)(t).to_pylist()


class TestDatadogSearch:
    def test_text_terms(self, t):
        assert run("error", t) == [True, False, True, False, False]
        assert run('"error connecting"', t) == [True, False, False, False, False]
        assert run("err*", t) == [True, False, True, False, False]

    def test_facets(self, t):
        assert run("status:error", t) == [True, False, True, False, False]
        assert run("status:e*r", t) == [True, False, True, False, False]
        assert run("nosuchfield:x", t) == [False] * 5

    def test_numeric_and_ranges(self, t):
        assert run("code:>501", t) == [False, False, True, False, False]
        assert run("code:[200 TO 500]", t) == [True, True, False, True, True]
        assert run("code:[* TO 300]", t) == [False, True, False, False, True]

    def test_boolean_precedence(self, t):
        # implicit AND binds tighter than OR
        assert run("status:error code:>501", t) == [False, False, True, False, False]
        assert run("status:error OR status:warn", t) == [True, False, True, True, False]
        assert run("-status:error", t) == [False, True, False, True, True]
        assert run("NOT (status:error OR status:warn)", t) == [False, True, False, False, True]

    def test_tags_exists_star(self, t):
        assert run('tags:"env:prod"', t) == [True, False, True, False, False]
        assert run("_exists_:status", t) == [True] * 5
        assert run("_missing_:nope", t) == [True] * 5
        assert run("*", t) == [True] * 5
        assert run("*:*", t) == [True] * 5

    def test_bad_syntax(self):
        with pytest.raises(ValueError):
            P("(unbalanced")


class TestDashedFacets:
    def test_dashed_field_names_and_negation(self):
        t = pa.table({"my-field": ["x", "y"], "status": ["error", "ok"],
                      "message": ["a", "b"]})
        assert run("my-field:x", t) == [True, False]
        assert run("-status:error", t) == [False, True]
        assert run("-my-field:x", t) == [False, True]


class TestNumericOnStringColumns:
    def test_numeric_operand_compares_numerically(self):
        # r2 advice: status stored as strings must compare numerically,
        # not lexicographically, when the query operand is numeric
        t = pa.table({"status": ["9", "200", "50", "abc", None],
                      "message": ["m"] * 5})
        assert run("status:>50", t) == [False, True, False, False, False]
        assert run("status:<=50", t) == [True, False, True, False, False]

    def test_string_operand_still_lexicographic(self):
        t = pa.table({"host": ["a", "b"], "message": ["m", "m"]})
        assert run("host:>a", t) == [False, True]
