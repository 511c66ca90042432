"""Property tests for the VRL compiler (expr/vrl.py): random
arithmetic/comparison/boolean expression trees rendered to VRL source
must evaluate identically to a direct NumPy mirror, and random
if/else-if/else band programs must match a mask-based mirror."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_ray.expr.vrl import compile_vrl


def _num_expr(depth):
    if depth == 0:
        return st.sampled_from([
            (".a", lambda a, b: a),
            (".b", lambda a, b: b),
            ("2.0", lambda a, b: np.float64(2.0)),
            ("0.5", lambda a, b: np.float64(0.5)),
        ])
    sub = _num_expr(depth - 1)
    ops = st.sampled_from([
        ("+", np.add), ("-", np.subtract), ("*", np.multiply),
    ])
    return st.one_of(
        sub,
        st.tuples(ops, sub, sub).map(
            lambda t: (f"({t[1][0]} {t[0][0]} {t[2][0]})",
                       lambda a, b, t=t: t[0][1](t[1][1](a, b),
                                                 t[2][1](a, b)))),
    )


def _cols(n=64, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(-10, 10, n)
    b = rng.uniform(-10, 10, n)
    return a, b, pa.table({"a": pa.array(a, pa.float64()),
                           "b": pa.array(b, pa.float64())})


class TestVrlProperties:
    @settings(max_examples=60, deadline=None)
    @given(_num_expr(3), st.integers(0, 10_000))
    def test_arith_matches_numpy(self, expr, seed):
        src, mirror = expr
        a, b, t = _cols(seed=seed)
        out = compile_vrl(f".r = {src}")(t)
        got = np.asarray(out["r"].to_numpy(zero_copy_only=False))
        want = np.broadcast_to(mirror(a, b), got.shape)
        assert np.array_equal(got, want), src

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.floats(-5, 5).map(lambda x: round(x, 2)),
                    min_size=1, max_size=3, unique=True),
           st.integers(0, 10_000))
    def test_if_chain_matches_mask_mirror(self, cuts, seed):
        cuts = sorted(cuts, reverse=True)
        a, _, t = _cols(seed=seed)
        src = []
        for i, c in enumerate(cuts):
            kw = "if" if i == 0 else "else if"
            src.append(f'{kw} .a > {c} {{ .band = "b{i}" }}')
        src.append('else { .band = "rest" }')
        out = compile_vrl("\n".join(src))(t)
        got = out["band"].to_pylist()
        want = []
        for x in a:
            for i, c in enumerate(cuts):
                if x > c:
                    want.append(f"b{i}")
                    break
            else:
                want.append("rest")
        assert got == want, (cuts, src)

    @settings(max_examples=40, deadline=None)
    @given(_num_expr(2), _num_expr(2), st.integers(0, 10_000))
    def test_comparisons_and_bools(self, e1, e2, seed):
        s1, m1 = e1
        s2, m2 = e2
        a, b, t = _cols(seed=seed)
        out = compile_vrl(
            f".p = ({s1} < {s2}) || !({s1} >= {s2})\n"
            f".q = ({s1} == {s2}) && ({s1} <= {s2})")(t)
        l1, l2 = (np.broadcast_to(m1(a, b), a.shape),
                  np.broadcast_to(m2(a, b), a.shape))
        assert np.array_equal(
            np.asarray(out["p"].to_numpy(zero_copy_only=False)),
            (l1 < l2) | ~(l1 >= l2))
        assert np.array_equal(
            np.asarray(out["q"].to_numpy(zero_copy_only=False)),
            (l1 == l2) & (l1 <= l2))
