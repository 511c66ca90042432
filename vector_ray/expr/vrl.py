"""VRL-source front end: parse a (subset of a) Vector Remap Language
program string and compile it to ONE vectorized ``pa.Table -> pa.Table``
batch function over the expr.F kernel library.

The reference's remap transform is configured with a VRL *program
string* (reference: src/transforms/remap.rs + the VRL crate); this
engine's kernels (expr/kernels.py) already implement the stdlib
semantics, so a user's remap program can run verbatim instead of being
hand-translated into the declarative op list. The supported subset —
chosen to cover the overwhelming majority of real remap programs:

- assignments           ``.field = <expr>``
- deletion              ``del(.field, .other)``
- conditionals          ``if <expr> { ... } else if ... else { ... }``
- literals              strings ("..", escapes), ints, floats,
                        true/false/null
- field refs            ``.field`` and nested ``.field.sub`` (struct
                        columns); absent fields read as null
- operators             ``?? || && == != < <= > >= + - * / % ! -``
                        (``??`` coalesces null, the columnar analogue
                        of VRL's error coalescing)
- function calls        any expr.F kernel (``upcase``, ``parse_json``,
                        ``sha2``, ``to_int`` …); a trailing ``!``
                        (VRL's fallible marker) is accepted and
                        stripped — fallible kernels yield null rows
- ``exists(.field)``    per-row presence (absent column -> false,
                        present column -> validity mask)
- root merge            ``. = merge(., parse_json!(.msg))`` — the
                        canonical "parse and hoist to top level"
                        idiom; the struct's fields become columns
- comments              ``# …``

Compilation model (this is the scale story): the program is parsed
ONCE; conditionals become boolean masks and assignments become
``pc.if_else(mask, new, old)`` — every statement is a whole-column
Arrow kernel, no per-row interpretation anywhere. A row-conditional
``del`` nulls the masked rows; an unconditional one drops the column.

Out of scope (raise at compile time or behave columnar-ly): closures /
iteration (``for_each``), metadata (``%``/``@``) paths, ``abort``,
multi-valued error assignments (``ok, err = …``), dynamic path
expressions. Conditional branches that assign INCOMPATIBLE Arrow types
to the same column raise (a columnar engine keeps one type per field).
"""

from __future__ import annotations

import re
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------- lexer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t\r]+)
  | (?P<comment>\#[^\n]*)
  | (?P<nl>\n)
  | (?P<float>\d+\.\d+(?:[eE][+-]?\d+)?)
  | (?P<int>\d+)
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<path>\.[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)
  | (?P<root>\.)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*!?)
  | (?P<op>\?\?|\|\||&&|==|!=|<=|>=|[=<>+\-*/%!(),{};])
    """,
    re.VERBOSE,
)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}


class VrlError(ValueError):
    pass


def _lex(src: str):
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            line = src.count("\n", 0, pos) + 1
            raise VrlError(f"vrl: unexpected character {src[pos]!r} "
                           f"on line {line}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment", "nl"):
            continue
        text = m.group()
        if kind == "string":
            text = re.sub(r"\\(.)",
                          lambda e: _ESCAPES.get(e.group(1), e.group(1)),
                          text[1:-1])
        toks.append((kind, text))
    toks.append(("eof", ""))
    return toks


# --------------------------------------------------------------- parser
# AST: ("lit", v) ("path", [segs]) ("call", name, [args])
#      ("bin", op, l, r) ("un", op, x)
# stmts: ("set", [segs], expr) ("del", [paths]) ("if", [(cond, body)],
#      else_body) ("expr", expr)

_BINARY = [  # precedence levels, low -> high
    ("??",), ("||",), ("&&",), ("==", "!="), ("<", "<=", ">", ">="),
    ("+", "-"), ("*", "/", "%"),
]


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text):
        k, v = self.next()
        if v != text:
            raise VrlError(f"vrl: expected {text!r}, got {v or k!r}")

    def program(self):
        stmts = []
        while self.peek()[0] != "eof":
            stmts.append(self.statement())
            while self.peek() == ("op", ";"):
                self.next()
        return stmts

    def statement(self):
        k, v = self.peek()
        if k == "ident" and v == "del":
            self.next()
            self.expect("(")
            paths = []
            while True:
                pk, pv = self.next()
                if pk != "path":
                    raise VrlError("vrl: del() takes field paths")
                paths.append(pv[1:].split("."))
                nk, nv = self.next()
                if nv == ")":
                    break
                if nv != ",":
                    raise VrlError("vrl: expected ',' or ')' in del()")
            return ("del", paths)
        if k == "ident" and v == "if":
            return self.if_stmt()
        if k == "ident" and v in ("for_each", "abort", "return"):
            raise VrlError(f"vrl: {v!r} is outside the supported subset")
        if k == "root":
            self.next()
            self.expect("=")
            expr = self.expr()
            # only `. = merge(., <struct expr>)` writes the root
            if not (expr[0] == "call" and expr[1] == "merge"
                    and len(expr[2]) == 2 and expr[2][0] == ("root",)):
                raise VrlError("vrl: the only supported root write is "
                               "`. = merge(., <struct expr>)`")
            return ("rootmerge", expr[2][1])
        if k == "path":
            save = self.i
            segs = self.next()[1][1:].split(".")
            if self.peek() == ("op", "="):
                self.next()
                return ("set", segs, self.expr())
            self.i = save
        return ("expr", self.expr())

    def if_stmt(self):
        arms = []
        self.next()  # 'if'
        cond = self.expr()
        arms.append((cond, self.block()))
        else_body = []
        while self.peek() == ("ident", "else"):
            self.next()
            if self.peek() == ("ident", "if"):
                self.next()
                arms.append((self.expr(), self.block()))
            else:
                else_body = self.block()
                break
        return ("if", arms, else_body)

    def block(self):
        self.expect("{")
        stmts = []
        while self.peek() != ("op", "}"):
            if self.peek()[0] == "eof":
                raise VrlError("vrl: unterminated block")
            stmts.append(self.statement())
            while self.peek() == ("op", ";"):
                self.next()
        self.next()
        return stmts

    def expr(self, level=0):
        if level == len(_BINARY):
            return self.unary()
        left = self.expr(level + 1)
        while self.peek()[0] == "op" and self.peek()[1] in _BINARY[level]:
            op = self.next()[1]
            right = self.expr(level + 1)
            left = ("bin", op, left, right)
        return left

    def unary(self):
        k, v = self.peek()
        if (k, v) == ("op", "!"):
            self.next()
            return ("un", "!", self.unary())
        if (k, v) == ("op", "-"):
            self.next()
            return ("un", "-", self.unary())
        return self.primary()

    def primary(self):
        k, v = self.next()
        if k == "float":
            return ("lit", float(v))
        if k == "int":
            return ("lit", int(v))
        if k == "string":
            return ("lit", v)
        if k == "path":
            return ("path", v[1:].split("."))
        if k == "root":
            return ("root",)
        if k == "ident":
            if v == "true":
                return ("lit", True)
            if v == "false":
                return ("lit", False)
            if v == "null":
                return ("lit", None)
            if self.peek() == ("op", "("):
                self.next()
                args = []
                if self.peek() != ("op", ")"):
                    while True:
                        args.append(self.expr())
                        nk, nv = self.next()
                        if nv == ")":
                            break
                        if nv != ",":
                            raise VrlError("vrl: expected ',' or ')'")
                else:
                    self.next()
                return ("call", v.rstrip("!"), args)
            raise VrlError(f"vrl: bare identifier {v!r} (variables are "
                           "outside the supported subset)")
        if (k, v) == ("op", "("):
            e = self.expr()
            self.expect(")")
            return e
        raise VrlError(f"vrl: unexpected token {v or k!r}")


# ------------------------------------------------------------- compiler

_FN_ALIASES = {
    "round": "round_",
    "abs": "abs_",
    "slice": "slice_",
    "string": "to_string",
    "to_str": "to_string",
    "int": "to_int",
    "float": "to_float",
    "bool": "to_bool",
    "hmac": "hmac_",
    "strlen": "length",
    "parse_regex": "extract_regex",
    "parse_timestamp": "to_timestamp",
}


def _resolve_fn(name: str):
    from vector_ray.expr import F

    target = _FN_ALIASES.get(name, name)
    fn = getattr(F, target, None)
    if fn is None or not callable(fn):
        raise VrlError(f"vrl: unknown function {name!r} (no matching "
                       "expr.F kernel)")
    return fn


def _as_array(v, n: int):
    if isinstance(v, pa.ChunkedArray):
        return v.combine_chunks()
    if isinstance(v, pa.Array):
        return v
    return pa.nulls(n) if v is None else pa.array([v] * n)


def _eval(node, tbl: pa.Table):
    """Evaluate an expression AST to a pa.Array / ChunkedArray / Python
    scalar over the batch."""
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "path":
        segs = node[1]
        if segs[0] not in tbl.column_names:
            return None
        col = tbl[segs[0]]
        for s in segs[1:]:
            try:
                col = pc.struct_field(col, s)
            except (pa.ArrowInvalid, pa.ArrowTypeError, KeyError):
                return None
        return col
    if kind == "call":
        from vector_ray.expr import F  # noqa: F401  (kernels resolved)

        if node[1] == "exists" and len(node[2]) == 1 \
                and node[2][0][0] == "path":
            # per-row presence: absent column -> all-false; present
            # column -> validity (columnar events fold absent into null)
            col = _eval(node[2][0], tbl)
            if col is None:
                return False
            return pc.is_valid(col)
        fn = _resolve_fn(node[1])
        args = [_eval(a, tbl) for a in node[2]]
        if args and args[0] is None:
            return None  # absent field through a kernel stays null
        if args and not isinstance(args[0], (pa.Array, pa.ChunkedArray)):
            args[0] = _as_array(args[0], len(tbl))
        return fn(*args)
    if kind == "un":
        x = _eval(node[2], tbl)
        if node[1] == "!":
            return pc.invert(pc.cast(_as_array(x, len(tbl)), pa.bool_()))
        return pc.negate(_as_array(x, len(tbl)))
    if kind == "bin":
        op, lx, rx = node[1], node[2], node[3]
        l = _eval(lx, tbl)
        r = _eval(rx, tbl)
        n = len(tbl)
        if op == "??":
            if l is None:
                return r
            if not isinstance(l, (pa.Array, pa.ChunkedArray)):
                return l
            return pc.coalesce(l, _as_array(r, n))
        la, ra = _as_array(l, n), _as_array(r, n)
        if op in ("&&", "||"):
            la = pc.cast(la, pa.bool_())
            ra = pc.cast(ra, pa.bool_())
            return (pc.and_kleene if op == "&&" else pc.or_kleene)(la, ra)
        if op == "+" and (pa.types.is_string(la.type)
                          or pa.types.is_string(ra.type)):
            return pc.binary_join_element_wise(
                pc.cast(la, pa.string()), pc.cast(ra, pa.string()), "")
        table = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
                 "<=": pc.less_equal, ">": pc.greater,
                 ">=": pc.greater_equal, "+": pc.add, "-": pc.subtract,
                 "*": pc.multiply, "/": pc.divide}
        if op == "%":
            from vector_ray.expr import F

            return F.mod(la, r if isinstance(r, int) else ra)
        return table[op](la, ra)
    raise VrlError(f"vrl: bad node {kind!r}")


def _null_like(col, n: int):
    t = col.type if isinstance(col, (pa.Array, pa.ChunkedArray)) else None
    return pa.nulls(n, t)


def _apply(stmts, tbl: pa.Table, mask) -> pa.Table:
    from vector_ray.expr import F

    for st in stmts:
        kind = st[0]
        if kind == "set":
            segs, expr = st[1], st[2]
            if len(segs) != 1:
                raise VrlError("vrl: assignment targets one flat field "
                               "(nested writes are outside the subset)")
            name = segs[0]
            new = _as_array(_eval(expr, tbl), len(tbl))
            if mask is None:
                tbl = F.set_(tbl, name, new)
            else:
                old = tbl[name].combine_chunks() \
                    if name in tbl.column_names else _null_like(new, len(tbl))
                if old.type != new.type:
                    try:
                        old = pc.cast(old, new.type)
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                            pa.ArrowTypeError):
                        raise VrlError(
                            f"vrl: conditional assignment to {name!r} "
                            f"mixes Arrow types {old.type} / {new.type}"
                        ) from None
                tbl = F.set_(tbl, name, pc.if_else(mask, new, old))
        elif kind == "del":
            for segs in st[1]:
                if len(segs) != 1:
                    raise VrlError("vrl: del targets one flat field")
                name = segs[0]
                if name not in tbl.column_names:
                    continue
                if mask is None:
                    tbl = F.del_(tbl, name)
                else:
                    old = tbl[name].combine_chunks()
                    tbl = F.set_(
                        tbl, name,
                        pc.if_else(mask, _null_like(old, len(tbl)), old))
        elif kind == "if":
            arms, else_body = st[1], st[2]
            seen = None  # rows claimed by earlier arms
            for cond_expr, body in arms:
                cond = pc.fill_null(pc.cast(
                    _as_array(_eval(cond_expr, tbl), len(tbl)),
                    pa.bool_()), False)
                if seen is not None:
                    cond = pc.and_(cond, pc.invert(seen))
                m = cond if mask is None else pc.and_(mask, cond)
                tbl = _apply(body, tbl, m)
                seen = cond if seen is None else pc.or_(seen, cond)
            if else_body:
                rest = pc.invert(seen)
                m = rest if mask is None else pc.and_(mask, rest)
                tbl = _apply(else_body, tbl, m)
        elif kind == "rootmerge":
            if mask is not None:
                raise VrlError("vrl: `. = merge(., ...)` must be "
                               "unconditional (top level)")
            v = _eval(st[1], tbl)
            if not (isinstance(v, (pa.Array, pa.ChunkedArray))
                    and pa.types.is_struct(v.type)):
                raise VrlError("vrl: root merge needs a struct "
                               "expression (e.g. parse_json!(.msg))")
            tbl = F.merge_struct(tbl, v)
        elif kind == "expr":
            _eval(st[1], tbl)  # evaluated for effect-free parity
        else:
            raise VrlError(f"vrl: bad statement {kind!r}")
    return tbl


def parse_vrl(source: str):
    """Parse only (the ``vector vrl`` / validate path) — raises
    VrlError with a message on unsupported or malformed programs."""
    return _Parser(_lex(source)).program()


def compile_vrl(source: str) -> Callable[[pa.Table], pa.Table]:
    """Parse once, return a vectorized ``pa.Table -> pa.Table`` batch
    function (compile-time errors surface here, not per batch)."""
    stmts = parse_vrl(source)
    # static pass: typos and unsupported write shapes fail at COMPILE
    # time, not on the first batch
    def check(nodes):
        for nd in nodes:
            if isinstance(nd, tuple):
                if nd[0] == "call" and nd[1] != "exists":
                    _resolve_fn(nd[1])
                elif nd[0] == "set" and len(nd[1]) != 1:
                    raise VrlError(
                        "vrl: assignment targets one flat field "
                        "(nested writes are outside the subset)")
                elif nd[0] == "del" and any(len(s) != 1 for s in nd[1]):
                    raise VrlError("vrl: del targets one flat field")
                check([x for x in nd if isinstance(x, (tuple, list))])
            elif isinstance(nd, list):
                check(nd)
    check(stmts)

    def run(tbl: pa.Table) -> pa.Table:
        return _apply(stmts, tbl, None)

    return run
