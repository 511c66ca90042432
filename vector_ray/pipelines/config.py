"""Config-driven topology — the rebuild of Vector's config surface:

- component registry (`inventory::submit!` + `#[typetag::serde]`
  dispatch, src/transforms/route.rs:77-83) → ``@register_transform``
  decorator over builder functions;
- config load → macro expansion → DAG validation → build
  (src/config/loading.rs, src/config/compiler.rs:105-146,
  src/config/graph.rs:1-60,202-260) → ``load_config`` / ``validate`` /
  ``Topology``;
- named outputs (``routed.hot``) for route lanes;
- ``graph()`` → DOT export (the `vector graph` subcommand);
- ``run_unit_tests`` → the `vector test` harness
  (src/config/unit_test.rs:15-100): insert_at / extract_from /
  condition assertions over the transform subgraph.

Execution compiles each sink's input chain into ONE lazy Dataset
pipeline: linear runs of function transforms fuse into a single
map_batches (ChainStep), route lanes become filtered views of the
masked dataset, TaskTransforms (dedupe/reduce/aggregate) insert their
shuffle stages.
"""

from __future__ import annotations

import io
from typing import Any, Callable, Dict, List, Optional

import pyarrow as pa

from vector_ray.expr import C, Cond
from vector_ray.stages import (
    AddFields,
    AnsiStripper,
    Coercer,
    Concat,
    Dedupe,
    Enrich,
    EnrichmentTable,
    Filter,
    GrokParser,
    JsonParser,
    KeyValueParser,
    LogfmtParser,
    LogToMetric,
    Aggregate,
    MetricToLog,
    Reduce,
    RegexParser,
    RemoveFields,
    RenameFields,
    Route,
    Sample,
    SplitParser,
    TagCardinalityLimit,
    Tokenizer,
)
from vector_ray.stages.base import Step, apply_chain

# ---------------------------------------------------------------------------
# condition spec → Cond
#
# {"field": "status", "op": "gte", "value": 500}
# {"all": [...]} / {"any": [...]} / {"not": {...}}
# string shorthand "status >= 500" is NOT supported (no expression
# parser by design — SURVEY.md §2.4: semantics, not syntax).

_OPS = {
    "eq": C.eq, "equals": C.eq, "neq": C.neq, "not_equals": C.neq,
    "gt": C.gt, "gte": C.ge, "ge": C.ge, "lt": C.lt, "lte": C.le,
    "le": C.le,
    "contains": C.contains, "prefix": C.prefix, "starts_with": C.prefix,
    "suffix": C.suffix, "ends_with": C.suffix, "regex": C.regex,
    "is_in": C.is_in, "length_eq": C.length_eq,
}


def build_condition(spec) -> Cond:
    if isinstance(spec, Cond):
        return spec
    if spec is True:
        return C.true()
    if not isinstance(spec, dict):
        raise ValueError(f"bad condition spec: {spec!r}")
    if "all" in spec:
        conds = [build_condition(s) for s in spec["all"]]
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out
    if "any" in spec:
        conds = [build_condition(s) for s in spec["any"]]
        out = conds[0]
        for c in conds[1:]:
            out = out | c
        return out
    if "not" in spec:
        return ~build_condition(spec["not"])
    if "exists" in spec:
        return C.exists(spec["exists"])
    if "datadog_search" in spec:
        # {"datadog_search": "status:error -env:dev", "default_field": "message"}
        from vector_ray.expr.datadog_search import parse_datadog_search

        return parse_datadog_search(
            spec["datadog_search"], default_field=spec.get("default_field", "message")
        )
    op = spec.get("op", "eq")
    if op == "exists":
        return C.exists(spec["field"])
    if op not in _OPS:
        raise ValueError(f"unknown condition op {op!r}")
    return _OPS[op](spec["field"], spec.get("value"))


# ---------------------------------------------------------------------------
# component registry

TRANSFORMS: Dict[str, Callable[[dict], Any]] = {}

# Source/sink types accepted by Topology._source_dataset / Topology.run
# (keep in sync with their dispatch chains; test_cli_tools asserts a
# config using each listed type validates). Backs `vector_ray list`,
# the analogue of the reference's `vector list` (src/list.rs:44-76).
SOURCE_TYPES = [
    "csv", "file", "generator", "incremental_agg", "json", "link_graph",
    "parquet", "text", "tokens_synth", "web_docs",
]
SINK_TYPES = [
    "blackhole", "console", "csv", "file", "json", "memory", "parquet",
]


def component_inventory() -> Dict[str, List[str]]:
    """{'sources': [...], 'transforms': [...], 'sinks': [...]} — every
    component type the config registry can build, sorted."""
    return {
        "sources": sorted(SOURCE_TYPES),
        "transforms": sorted(set(TRANSFORMS)
                             | {"compound", "route", "swimlanes", "join"}),
        "sinks": sorted(SINK_TYPES),
    }


def register_transform(name: str):
    def deco(fn):
        TRANSFORMS[name] = fn
        return fn

    return deco


def _opt(cfg: dict, *drop: str) -> dict:
    return {k: v for k, v in cfg.items() if k not in ("type", "inputs") + drop}


@register_transform("filter")
def _build_filter(cfg):
    return Filter(build_condition(cfg["condition"]))


@register_transform("field_filter")
def _build_field_filter(cfg):
    return Filter(C.eq(cfg["field"], cfg["value"]))


@register_transform("sample")
def _build_sample(cfg):
    exclude = build_condition(cfg["exclude"]) if "exclude" in cfg else None
    return Sample(cfg["rate"], cfg["key_field"], exclude=exclude)


@register_transform("regex_parser")
def _build_regex(cfg):
    pats = cfg.get("patterns") or [cfg["regex"]]
    return RegexParser(
        cfg.get("field", "message"), pats,
        types=cfg.get("types"), target_field=cfg.get("target_field"),
        overwrite_target=cfg.get("overwrite_target", True),
        drop_failed=cfg.get("drop_failed", False),
        drop_field=cfg.get("drop_field", True),
    )


@register_transform("grok_parser")
def _build_grok(cfg):
    return GrokParser(
        cfg.get("field", "message"), cfg["pattern"],
        custom_patterns=cfg.get("custom_patterns"), types=cfg.get("types"),
        drop_field=cfg.get("drop_field", False),
    )


@register_transform("json_parser")
def _build_json(cfg):
    return JsonParser(
        cfg.get("field", "message"), target_field=cfg.get("target_field"),
        drop_invalid=cfg.get("drop_invalid", False),
        drop_field=cfg.get("drop_field", True),
    )


@register_transform("key_value_parser")
def _build_kv(cfg):
    return KeyValueParser(
        cfg.get("field", "message"),
        separator=cfg.get("separator", " "),
        field_split=cfg.get("field_split", "="),
        fields=cfg.get("fields"), types=cfg.get("types"),
        drop_field=cfg.get("drop_field", True),
    )


@register_transform("logfmt_parser")
def _build_logfmt(cfg):
    return LogfmtParser(cfg.get("field", "message"), fields=cfg.get("fields"),
                        types=cfg.get("types"), drop_field=cfg.get("drop_field", True))


@register_transform("tokenizer")
def _build_tokenizer(cfg):
    return Tokenizer(cfg.get("field", "message"), cfg["field_names"], types=cfg.get("types"),
                     drop_field=cfg.get("drop_field", True))


@register_transform("split")
def _build_split(cfg):
    return SplitParser(cfg.get("field", "message"), cfg["field_names"],
                       separator=cfg.get("separator"), types=cfg.get("types"),
                       drop_field=cfg.get("drop_field", True))


@register_transform("coercer")
def _build_coercer(cfg):
    return Coercer(cfg["types"], drop_unspecified=cfg.get("drop_unspecified", False))


@register_transform("add_fields")
def _build_add_fields(cfg):
    return AddFields(cfg["fields"], overwrite=cfg.get("overwrite", True))


@register_transform("remove_fields")
def _build_remove_fields(cfg):
    return RemoveFields(cfg["fields"])


@register_transform("rename_fields")
def _build_rename_fields(cfg):
    return RenameFields(cfg["fields"])


@register_transform("add_tags")
def _build_add_tags(cfg):
    # metric tags are plain columns in the typed-table engine
    # (src/transforms/add_tags.rs:12-18)
    return AddFields(cfg["tags"], overwrite=cfg.get("overwrite", True))


@register_transform("remove_tags")
def _build_remove_tags(cfg):
    # src/transforms/remove_tags.rs:11-15
    return RemoveFields(cfg["tags"])


@register_transform("concat")
def _build_concat(cfg):
    return Concat(cfg["target"], cfg["items"], joiner=cfg.get("joiner", " "))


@register_transform("ansi_stripper")
def _build_ansi(cfg):
    return AnsiStripper(cfg.get("field", "message"))


@register_transform("dedupe")
def _build_dedupe(cfg):
    fields = cfg.get("fields")
    if isinstance(fields, dict):  # reference shape: fields.match = [...]
        fields = fields.get("match")
    fields = fields or cfg.get("match")
    persist = cfg.get("persist")
    if persist:
        # durable analogue of the reference's in-memory LRU cache
        # (src/transforms/dedupe.rs:155-163): keys seen by ANY previous
        # run of this config drop too (state/seen.py index at `persist`)
        num_buckets = int(cfg.get("num_buckets", 64))
        ts_field = cfg.get("ts_field")  # enables `lake seen-expire` TTL

        class _PersistentDedupe:
            name = "dedupe(persist)"

            def apply(self, ds):
                from vector_ray.state.seen import incremental_dedupe

                return incremental_dedupe(ds, fields, persist,
                                          num_buckets=num_buckets,
                                          ts_col=ts_field)

        return _PersistentDedupe()
    return Dedupe(fields, order_by=cfg.get("order_by"))


@register_transform("reduce")
def _build_reduce(cfg):
    return Reduce(
        cfg["group_by"],
        merge_strategies=cfg.get("merge_strategies"),
        order_by=cfg.get("order_by"),
        ends_when=build_condition(cfg["ends_when"]) if "ends_when" in cfg else None,
        starts_when=build_condition(cfg["starts_when"]) if "starts_when" in cfg else None,
    )


@register_transform("log_to_metric")
def _build_log_to_metric(cfg):
    return LogToMetric(cfg["metrics"])


@register_transform("aggregate")
def _build_aggregate(cfg):
    return Aggregate(tag_keys=cfg.get("tag_keys", []))


@register_transform("metric_to_log")
def _build_metric_to_log(cfg):
    return MetricToLog()


@register_transform("tag_cardinality_limit")
def _build_tcl(cfg):
    return TagCardinalityLimit(cfg["tags"], value_limit=cfg.get("value_limit", 500),
                               action=cfg.get("action", "drop_tag"))


@register_transform("enrich")
def _build_enrich(cfg):
    src = cfg["table"]
    if isinstance(src, str):
        if src.endswith(".csv"):
            table = EnrichmentTable.from_csv(src, cfg["key"],
                                             case_insensitive=cfg.get("case_insensitive", False))
        else:
            table = EnrichmentTable.from_parquet(src, cfg["key"],
                                                 case_insensitive=cfg.get("case_insensitive", False))
    else:
        table = EnrichmentTable(src, cfg["key"], case_insensitive=cfg.get("case_insensitive", False))
    return Enrich(table, select=cfg.get("select"), mode=cfg.get("mode", "get"),
                  key_map=cfg.get("key_map"), miss_col=cfg.get("miss_col", "_enrich_miss"),
                  concurrency=cfg.get("concurrency", 4))


@register_transform("merge")
def _build_merge(cfg):
    from vector_ray.stages.merge_partial import Merge

    return Merge(
        cfg.get("partial_event_marker_field", "_partial"),
        cfg.get("merge_fields", ["message"]),
        cfg.get("stream_discriminant_fields", []),
        order_by=cfg["order_by"],
        joiner=cfg.get("joiner", ""),
    )


@register_transform("unnest")
def _build_unnest(cfg):
    from vector_ray.stages.explode import Unnest

    return Unnest(cfg["column"], keep_empty=cfg.get("keep_empty", False))


@register_transform("explode_json_list")
def _build_explode_json(cfg):
    from vector_ray.stages.explode import ExplodeJsonList

    return ExplodeJsonList(cfg.get("field", "message"), drop_field=cfg.get("drop_field", True))


@register_transform("geoip")
def _build_geoip(cfg):
    from vector_ray.stages.geoip import GeoipLookup

    return GeoipLookup(cfg["field"], table=[tuple(x) for x in cfg["table"]],
                       target=cfg.get("target", "geoip"))


def compile_remap_op(op):
    """Compile ONE declarative remap op (see ``_build_remap``) to a
    ``tbl -> tbl`` callable. Module-level so the ``vrl`` REPL
    (cli.py) can apply ops one at a time against a sample event —
    the analogue of the reference's ``vector vrl`` REPL
    (src/cli.rs:176-208) for this engine's declarative programs."""
    from vector_ray.expr import F
    import pyarrow.compute as _pc

    fn = op["fn"]
    if fn == "set":
        if "template" in op:
            return lambda t, op=op: F.set_(t, op["field"], F.render(t, op["template"]))
        return lambda t, op=op: F.set_(t, op["field"], op["value"])
    if fn in ("upcase", "downcase", "strip_whitespace"):
        kern = {"upcase": F.upcase, "downcase": F.downcase,
                "strip_whitespace": F.strip_whitespace}[fn]
        return lambda t, op=op, kern=kern: F.set_(
            t, op.get("target", op["field"]), kern(t[op["field"]])
        )
    if fn == "strip_ansi":
        return lambda t, op=op: F.set_(
            t, op.get("target", op["field"]), F.strip_ansi_escape_codes(t[op["field"]])
        )
    if fn == "replace":
        return lambda t, op=op: F.set_(
            t, op.get("target", op["field"]),
            F.replace(t[op["field"]], op["pattern"], op["replacement"],
                      regex=op.get("regex", False)),
        )
    if fn == "coerce":
        return lambda t, op=op: F.set_(t, op["field"], F.coerce(t[op["field"]], op["kind"]))
    if fn == "del":
        return lambda t, op=op: F.del_(t, *op["fields"])
    if fn == "rename":
        return lambda t, op=op: F.rename(t, op["fields"])
    if fn == "fingerprint":
        return lambda t, op=op: F.set_(
            t, op.get("target", "fp"), F.fingerprint(_pc.cast(t[op["field"]], pa.string()))
        )
    if fn == "parse_regex":
        return lambda t, op=op: F.merge_struct(
            t, _pc.extract_regex(t[op["field"]], op["pattern"])
        )
    raise ConfigError(f"unknown remap op fn {fn!r}")


@register_transform("remap")
def _build_remap(cfg):
    """Declarative remap: a serial op list compiled to one vectorized
    batch fn — the config-file face of the VRL-semantics kernel library
    (each op maps to an expr.F kernel; src/transforms/remap.rs's role).

    ops:
      - {fn: set, field: x, value: lit | template: "{{a}}-{{b}}"}
      - {fn: upcase|downcase|strip_whitespace|strip_ansi, field: x [, target: y]}
      - {fn: replace, field: x, pattern: p, replacement: r [, regex: true]}
      - {fn: coerce, field: x, kind: int|float|bool|timestamp[|fmt]}
      - {fn: del, fields: [..]}
      - {fn: rename, fields: {old: new}}
      - {fn: fingerprint, field: x, target: y}
      - {fn: parse_regex, field: x, pattern: p}   (captures merged to root)
    """
    from vector_ray.stages.remap import Remap

    if "source" in cfg:  # reference-parity: a VRL program string
        if "ops" in cfg:
            raise ConfigError("remap: give either 'source' or 'ops'")
        from vector_ray.expr.vrl import compile_vrl

        return Remap(compile_vrl(cfg["source"]))

    compiled = [compile_remap_op(op) for op in cfg["ops"]]

    def program(t: pa.Table) -> pa.Table:
        for c in compiled:
            t = c(t)
        return t

    return Remap(program)


@register_transform("csv_parser")
def _build_csv(cfg):
    from vector_ray.expr import F
    from vector_ray.stages.base import FnStep

    field = cfg.get("field", "message")
    names = cfg["field_names"]
    types = cfg.get("types") or {}
    drop = cfg.get("drop_field", True)

    def parse(t: pa.Table) -> pa.Table:
        cols = F.parse_csv_line(t[field], names)
        for n, v in cols.items():
            if n in types:
                v = F.coerce(v, types[n])
            t = F.set_(t, n, v)
        return F.del_(t, field) if drop else t

    return FnStep(parse, name="csv_parser")


@register_transform("tumbling_window")
def _build_tumbling(cfg):
    from vector_ray.stages.window import TumblingWindow

    return TumblingWindow(cfg["keys"], cfg.get("ts_col", "ts"), cfg["size_s"],
                          {k: tuple(v) for k, v in cfg["specs"].items()})


@register_transform("session_window")
def _build_session(cfg):
    from vector_ray.stages.window import SessionWindow

    return SessionWindow(cfg["keys"], cfg.get("ts_col", "ts"), cfg["gap_s"],
                         {k: tuple(v) for k, v in cfg["aggs"].items()})


@register_transform("hopping_window")
def _build_hopping(cfg):
    from vector_ray.stages.window import HoppingWindow

    return HoppingWindow(cfg["keys"], cfg.get("ts_col", "ts"), cfg["size_s"],
                         cfg["hop_s"], {k: tuple(v) for k, v in cfg["specs"].items()})


@register_transform("topk")
def _build_topk(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.topk import grouped_topk

    class _TopK(Step):
        fusable = False

        def apply(self, ds):
            return grouped_topk(ds, cfg["keys"], cfg["order_col"], cfg["k"],
                                descending=cfg.get("descending", True),
                                tiebreak=cfg.get("tiebreak"))

    return _TopK()


@register_transform("token_count")
def _build_token_count(cfg):
    from vector_ray.ml.text import TokenCount

    return TokenCount(cfg.get("field", "text"))


@register_transform("quality_score")
def _build_quality(cfg):
    from vector_ray.ml.text import QualityScore

    return QualityScore(cfg.get("field", "text"))


@register_transform("lang_id")
def _build_langid(cfg):
    from vector_ray.ml.text import LangId

    return LangId(cfg.get("field", "text"))


@register_transform("c4_clean")
def _build_c4clean(cfg):
    from vector_ray.ml.clean import C4Clean

    return C4Clean(cfg.get("field", "text"),
                   min_words=int(cfg.get("min_words", 5)),
                   min_sentences=int(cfg.get("min_sentences", 3)),
                   drop=bool(cfg.get("drop", False)))


@register_transform("rollup")
def _build_rollup(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.rollup import rollup_aggregate

    class _Rollup(Step):
        fusable = False

        def apply(self, ds):
            specs = {k: tuple(v) for k, v in cfg["aggs"].items()}
            return rollup_aggregate(ds, cfg["keys"], specs)

    return _Rollup()


@register_transform("cube")
def _build_cube(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.rollup import (cube_aggregate,
                                          grouping_sets_aggregate)

    class _Cube(Step):
        fusable = False

        def apply(self, ds):
            specs = {k: tuple(v) for k, v in cfg["aggs"].items()}
            if "sets" in cfg:  # explicit GROUPING SETS
                return grouping_sets_aggregate(
                    ds, cfg["keys"], cfg["sets"], specs)
            return cube_aggregate(ds, cfg["keys"], specs)

    return _Cube()


@register_transform("dsir_score")
def _build_dsir_score(cfg):
    """Append DSIR importance log-weights (ml/dsir.py). The target
    corpus is either ``target`` (parquet path, read driver-side, must
    be small) or ``target_condition`` (a condition spec carving the
    target slice out of the INPUT stream itself — "make the corpus
    look like its own high-quality subset"; materialized driver-side,
    capped by ``target_max_rows``). ``target_field``/``field`` text
    columns; optional ``buckets``/``alpha``/``seed``/``out``."""
    from vector_ray.stages.base import Step

    class _Dsir(Step):
        fusable = False

        def apply(self, ds):
            from vector_ray.ml.dsir import (count_features,
                                            count_features_table,
                                            dsir_score, log_ratio)

            buckets = int(cfg.get("buckets", 1 << 13))
            seed = int(cfg.get("seed", 1))
            field = cfg.get("field", "text")
            tfield = cfg.get("target_field", field)
            if "target" in cfg:
                import pyarrow.parquet as pq

                tgt_texts = pq.read_table(
                    cfg["target"], columns=[tfield])[tfield].to_pylist()
            else:
                from vector_ray.stages.filters import Filter

                cap = int(cfg.get("target_max_rows", 100_000))
                sel = Filter(build_condition(cfg["target_condition"]))
                tgt_texts = [
                    r[tfield]
                    for r in sel.apply(ds.select_columns(
                        list({tfield}
                             | set(_cond_fields(cfg["target_condition"])))
                    )).limit(cap).take_all()
                ]
            tgt = count_features_table(tgt_texts, buckets=buckets,
                                       seed=seed)
            raw = count_features(ds, col=field, buckets=buckets,
                                 seed=seed)
            lr = log_ratio(tgt, raw, alpha=float(cfg.get("alpha", 1.0)))
            return dsir_score(ds, lr, col=field,
                              out=cfg.get("out", "dsir_logw"), seed=seed)

    return _Dsir()


def _cond_fields(spec) -> set:
    """Column names referenced by a condition spec (for projection)."""
    if isinstance(spec, dict):
        out = set()
        if "field" in spec:
            out.add(spec["field"])
        for k in ("all", "any"):
            for s in spec.get(k, []):
                out |= _cond_fields(s)
        if "not" in spec:
            out |= _cond_fields(spec["not"])
        return out
    return set()


@register_transform("window_shift")
def _build_window_shift(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.shift import partitioned_shift

    class _Shift(Step):
        fusable = False

        def apply(self, ds):
            specs = {k: tuple(v) for k, v in cfg["columns"].items()}
            return partitioned_shift(ds, cfg["keys"], cfg["order_by"],
                                     specs)

    return _Shift()


@register_transform("pivot")
def _build_pivot(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.pivot import pivot

    class _Pivot(Step):
        fusable = False

        def apply(self, ds):
            return pivot(ds, cfg["keys"], cfg["column"], cfg["value"],
                         agg=cfg.get("agg", "sum"),
                         max_columns=int(cfg.get("max_columns", 1000)),
                         prefix=cfg.get("prefix", ""))

    return _Pivot()


@register_transform("unpivot")
def _build_unpivot(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.pivot import unpivot

    class _Unpivot(Step):
        fusable = False

        def apply(self, ds):
            return unpivot(ds, cfg["keys"], cfg["value_cols"],
                           var_name=cfg.get("var_name", "name"),
                           value_name=cfg.get("value_name", "value"))

    return _Unpivot()


@register_transform("normalize_urls")
def _build_normurls(cfg):
    from vector_ray.ml.urls import NormalizeUrls

    return NormalizeUrls(cfg.get("field", "url"),
                         out=cfg.get("out", "norm_url"))


@register_transform("repetition_signals")
def _build_repetition(cfg):
    from vector_ray.ml.text import RepetitionSignals

    return RepetitionSignals(cfg.get("field", "text"),
                             prefix=cfg.get("prefix", ""))


@register_transform("compression_ratio")
def _build_compression_ratio(cfg):
    from vector_ray.ml.text import CompressionRatio

    return CompressionRatio(cfg.get("field", "text"),
                            out=cfg.get("out", "comp_ratio"),
                            level=int(cfg.get("level", 6)))


@register_transform("byte_entropy")
def _build_byte_entropy(cfg):
    from vector_ray.ml.text import ByteEntropy

    return ByteEntropy(cfg.get("field", "text"),
                       prefix=cfg.get("prefix", ""))


@register_transform("knn_graph")
def _build_knn_graph(cfg):
    from vector_ray.ml.ann import knn_graph
    from vector_ray.stages.base import Step

    class _KnnGraph(Step):
        fusable = False

        def apply(self, ds):
            return knn_graph(
                ds,
                k=int(cfg.get("k", 5)),
                n_clusters=int(cfg.get("n_clusters", 64)),
                n_probe=cfg.get("n_probe"),
                vec_col=cfg.get("field", "embedding"),
                id_col=cfg.get("id_field", "vec_id"),
                sample_size=int(cfg.get("sample_size", 2048)),
                max_cluster=int(cfg.get("max_cluster", 200_000)),
            )

    return _KnnGraph()


@register_transform("standardize")
def _build_standardize(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.feature import standardize

    class _Standardize(Step):
        fusable = False

        def apply(self, ds):
            return standardize(ds, list(cfg.get("fields", [])),
                               suffix=cfg.get("suffix", "_z"),
                               ddof=int(cfg.get("ddof", 1)))

    return _Standardize()


@register_transform("bucketize")
def _build_bucketize(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.feature import bucketize

    class _Bucketize(Step):
        fusable = False

        def apply(self, ds):
            return bucketize(ds, cfg["field"],
                             bins=int(cfg.get("bins", 10)),
                             mode=cfg.get("mode", "width"),
                             out=cfg.get("out"))

    return _Bucketize()


@register_transform("log_templates")
def _build_log_templates(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.templates import log_templates

    class _LogTemplates(Step):
        fusable = False

        def apply(self, ds):
            return log_templates(
                ds, cfg.get("field", "message"),
                max_tokens=int(cfg.get("max_tokens", 32)),
                num_buckets=cfg.get("buckets"))

    return _LogTemplates()


@register_transform("one_hot")
def _build_one_hot(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.feature import one_hot

    class _OneHot(Step):
        fusable = False

        def apply(self, ds):
            return one_hot(ds, cfg["field"],
                           max_categories=int(cfg.get("max_categories", 64)),
                           prefix=cfg.get("prefix"))

    return _OneHot()


@register_transform("target_encode")
def _build_target_encode(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.feature import target_encode

    class _TargetEncode(Step):
        fusable = False

        def apply(self, ds):
            return target_encode(
                ds, cfg["field"], cfg["target"],
                smoothing=float(cfg.get("smoothing", 0.0)),
                max_categories=int(cfg.get("max_categories", 100000)),
                out=cfg.get("out"))

    return _TargetEncode()


@register_transform("winsorize")
def _build_winsorize(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.feature import winsorize

    class _Winsorize(Step):
        fusable = False

        def apply(self, ds):
            return winsorize(ds, cfg["field"],
                             p_lo=float(cfg.get("p_lo", 0.01)),
                             p_hi=float(cfg.get("p_hi", 0.99)),
                             suffix=cfg.get("suffix", "_w"))

    return _Winsorize()


@register_transform("minmax_scale")
def _build_minmax_scale(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.feature import minmax_scale

    class _MinmaxScale(Step):
        fusable = False

        def apply(self, ds):
            return minmax_scale(ds, cfg["field"],
                                suffix=cfg.get("suffix", "_mm"))

    return _MinmaxScale()


@register_transform("scd2")
def _build_scd2(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.diff import scd2

    class _Scd2(Step):
        fusable = False

        def apply(self, ds):
            return scd2(
                ds,
                id_col=cfg.get("id_field", "id"),
                ts_col=cfg.get("ts_field", "ts"),
                attr_cols=list(cfg.get("fields", [])),
                collapse=bool(cfg.get("collapse", True)),
                num_buckets=cfg.get("buckets"),
            )

    return _Scd2()


@register_transform("fingerprint")
def _build_fingerprint(cfg):
    from vector_ray.ml.text import Fingerprint

    return Fingerprint(cfg.get("field", "text"), cfg.get("target", "fp"))


@register_transform("repetition_stats")
def _build_repetition_stats(cfg):
    from vector_ray.ml.corpus import RepetitionStats

    return RepetitionStats(cfg.get("field", "text"), cfg.get("id_col", "doc_id"))


@register_transform("vocab_topk")
def _build_vocab_topk(cfg):
    from vector_ray.ml.corpus import vocab_topk
    from vector_ray.stages.base import Step

    class _VocabTopK(Step):
        fusable = False

        def apply(self, ds):
            return vocab_topk(ds, col=cfg.get("field", "text"),
                              k=cfg.get("k", 50),
                              mode=cfg.get("mode", "words"))

    return _VocabTopK()


@register_transform("pmi_pairs")
def _build_pmi_pairs(cfg):
    from vector_ray.stages.base import Step

    class _PmiPairs(Step):
        fusable = False

        def apply(self, ds):
            import ray.data as rd

            from vector_ray.ml.corpus import pmi_pairs

            return rd.from_arrow(pmi_pairs(
                ds, col=cfg.get("field", "text"),
                window=int(cfg.get("window", 2)),
                vocab_size=int(cfg.get("vocab_size", 10_000)),
                min_count=int(cfg.get("min_count", 5)),
                k=int(cfg.get("k", 50)),
                max_pairs=int(cfg.get("max_pairs", 2_000_000))))

    return _PmiPairs()


@register_transform("auc_score")
def _build_auc_score(cfg):
    from vector_ray.stages.base import Step

    class _Auc(Step):
        fusable = False

        def apply(self, ds):
            import ray.data as rd

            from vector_ray.ml.metrics import auc_score

            if "key_col" in cfg:
                from vector_ray.ml.metrics import grouped_auc

                return grouped_auc(ds, cfg["key_col"],
                                   cfg["score_col"], cfg["label_col"])
            return rd.from_arrow(auc_score(
                ds, cfg["score_col"], cfg["label_col"]))

    return _Auc()


@register_transform("triangle_count")
def _build_triangle_count(cfg):
    from vector_ray.stages.base import Step

    class _Triangles(Step):
        fusable = False

        def apply(self, ds):
            import ray.data as rd

            from vector_ray.ml.graph import triangle_count

            return rd.from_arrow(triangle_count(
                ds, a_col=cfg.get("a_col", "src"),
                b_col=cfg.get("b_col", "dst"),
                buckets=int(cfg.get("buckets", 16))))

    return _Triangles()


@register_transform("classification_report")
def _build_classification_report(cfg):
    from vector_ray.stages.base import Step

    class _Report(Step):
        fusable = False

        def apply(self, ds):
            import ray.data as rd

            from vector_ray.ml.metrics import classification_report

            return rd.from_arrow(classification_report(
                ds, cfg["score_col"], cfg["label_col"],
                cfg["thresholds"]))

    return _Report()


@register_transform("quantiles_cont")
def _build_quantiles_cont(cfg):
    from vector_ray.stages.base import Step

    class _QuantCont(Step):
        fusable = False

        def apply(self, ds):
            import pyarrow as pa
            import ray.data as rd

            from vector_ray.stages.quantile import exact_quantiles_cont

            ps = [float(p) for p in cfg["ps"]]
            vals = exact_quantiles_cont(ds, cfg["field"], ps)
            return rd.from_arrow(pa.table({
                "p": pa.array(ps, pa.float64()),
                "v": pa.array(vals, pa.float64())}))

    return _QuantCont()


@register_transform("drift_report")
def _build_drift_report(cfg):
    """Drift check between two populations inside ONE input (the
    runner's multi-input fan-in is a union, so two upstream branches
    tag themselves with a constant ``side_field`` via add_fields and
    union here): rows with side_field == reference_value are the
    reference side. kind ∈ {ks, chi2, psi} selects the statistic
    (continuous / categorical significance / effect size)."""
    from vector_ray.stages.base import Step

    class _Drift(Step):
        fusable = False

        def apply(self, ds):
            import pyarrow as pa
            import pyarrow.compute as pc
            import ray.data as rd

            from vector_ray.ml.metrics import (chi2_drift, ks_test,
                                               psi_drift)

            side, refv = cfg["side_field"], cfg["reference_value"]

            def pick(want_ref: bool):
                def fn(t: pa.Table) -> pa.Table:
                    m = pc.equal(pc.cast(t[side], pa.string()),
                                 pa.scalar(str(refv)))
                    m = pc.fill_null(m, False)
                    if not want_ref:
                        m = pc.invert(m)
                    return t.filter(m)

                return fn

            cur = ds.map_batches(pick(False), batch_format="pyarrow",
                                 zero_copy_batch=True)
            ref = ds.map_batches(pick(True), batch_format="pyarrow",
                                 zero_copy_batch=True)
            kind = cfg.get("kind", "ks")
            fn = {"ks": ks_test, "chi2": chi2_drift,
                  "psi": psi_drift}[kind]
            return rd.from_arrow(fn(cur, ref, cfg["field"]))

    return _Drift()


@register_transform("template_novelty")
def _build_template_novelty(cfg):
    """Classify each batch's log shapes against a persisted template
    index (type: template_novelty, index: <dir>, field?) — the
    monitoring-config face of stages/templates.template_novelty."""
    from vector_ray.stages.base import Step

    class _Novelty(Step):
        fusable = False

        def apply(self, ds):
            from vector_ray.stages.templates import template_novelty

            return template_novelty(ds, cfg["index"],
                                    field=cfg.get("field", "message"))

    return _Novelty()


@register_transform("quantile_band_filter")
def _build_quantile_band(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.quantile import quantile_band_filter

    class _Band(Step):
        fusable = False

        def apply(self, ds):
            return quantile_band_filter(ds, cfg["field"],
                                        lo_q=cfg.get("lo_q"),
                                        hi_q=cfg.get("hi_q"))

    return _Band()


@register_transform("bm25")
def _build_bm25(cfg):
    """Append a BM25 relevance score against a fixed query."""
    from vector_ray.stages.base import Step

    class _BM25(Step):
        fusable = False

        def apply(self, ds):
            from vector_ray.ml.corpus import bm25_score

            return bm25_score(
                ds, cfg["query"], col=cfg.get("field", "text"),
                id_col=cfg.get("id", "doc_id"),
                k1=float(cfg.get("k1", 1.2)), b=float(cfg.get("b", 0.75)),
                keep_cols=tuple(cfg.get("keep", ())))

    return _BM25()


@register_transform("pca")
def _build_pca(cfg):
    """Fit-and-project PCA over an embedding column (exact integer
    moments → deterministic on any partitioning)."""
    from vector_ray.stages.base import Step

    class _PCA(Step):
        fusable = False

        def apply(self, ds):
            from vector_ray.ml.embed import pca_fit, pca_project

            vec = cfg.get("field", "embedding")
            model = pca_fit(ds, vec_col=vec, k=int(cfg.get("k", 8)),
                            whiten=bool(cfg.get("whiten", False)))
            return pca_project(ds, model, vec_col=vec,
                               out_prefix=cfg.get("out_prefix", "p"))

    return _PCA()


@register_transform("nb_classify")
def _build_nb_classify(cfg):
    """Train-and-score Naive Bayes gate: fits on the rows whose label
    column is non-null (or an explicit train_filter condition), then
    appends per-class scores + prediction to every row."""
    from vector_ray.stages.base import Step

    class _NB(Step):
        fusable = False

        def apply(self, ds):
            from vector_ray.ml.classify import nb_score, nb_train

            train = ds
            if cfg.get("train_filter"):
                cond = build_condition(cfg["train_filter"])
                train = ds.map_batches(
                    lambda t: t.filter(cond(t)),
                    batch_format="pyarrow", zero_copy_batch=True)
            model = nb_train(
                train, text_col=cfg.get("field", "text"),
                label_col=cfg.get("label", "lang"),
                buckets=int(cfg.get("buckets", 1 << 13)),
                seed=int(cfg.get("seed", 1)),
                alpha=float(cfg.get("alpha", 1.0)),
                max_classes=int(cfg.get("max_classes", 1000)))
            return nb_score(ds, model,
                            text_col=cfg.get("field", "text"),
                            out_prefix=cfg.get("out_prefix", "nb_"))

    return _NB()


@register_transform("normalize_text")
def _build_normalize_text(cfg):
    from vector_ray.ml.text import NormalizeText

    return NormalizeText(cfg.get("field", "text"), cfg.get("out"),
                         form=cfg.get("form", "NFC"),
                         lower=bool(cfg.get("lower", True)),
                         collapse_ws=bool(cfg.get("collapse_ws", True)),
                         strip=bool(cfg.get("strip", True)))


@register_transform("mad_outlier_filter")
def _build_mad_outlier(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.quantile import mad_outlier_filter

    class _Mad(Step):
        fusable = False

        def apply(self, ds):
            return mad_outlier_filter(ds, cfg["field"],
                                      k=float(cfg.get("k", 3.0)),
                                      keep=cfg.get("keep", "inlier"))

    return _Mad()


@register_transform("row_number")
def _build_row_number(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.rownum import global_row_number

    class _RowNumber(Step):
        fusable = False

        def apply(self, ds):
            return global_row_number(ds, cfg["order_by"],
                                     tiebreak=cfg.get("tiebreak"),
                                     out=cfg.get("out", "row_id"),
                                     descending=cfg.get("descending", False),
                                     shard_size=cfg.get("shard_size"),
                                     shard_col=cfg.get("shard_col", "shard"))

    return _RowNumber()


@register_transform("rank_values")
def _build_rank_values(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.rownum import rank_values

    class _RankValues(Step):
        fusable = False

        def apply(self, ds):
            return rank_values(ds, cfg["col"], id_col=cfg["id_col"],
                               out_rank=cfg.get("out_rank", "pct_rank"),
                               out_cume=cfg.get("out_cume", "cume_dist"),
                               buckets=int(cfg.get("buckets", 16)))

    return _RankValues()


@register_transform("merge_intervals")
def _build_merge_intervals(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.intervals import merge_intervals

    class _MergeIntervals(Step):
        fusable = False

        def apply(self, ds):
            return merge_intervals(
                ds, cfg["keys"], cfg["start_col"], cfg["end_col"],
                out_start=cfg.get("out_start"),
                out_end=cfg.get("out_end"),
                min_gap=int(cfg.get("min_gap", 0)),
                count_col=cfg.get("count_col"),
                num_buckets=cfg.get("num_buckets"))

    return _MergeIntervals()


@register_transform("interval_join")
def _build_interval_join(cfg):
    """Tag-union-split shape (like drift_report: the runner's
    multi-input fan-in is a union, so the two span branches arrive as
    one tagged stream): rows with side_field == right_value are the
    right spans, everything else the left. Both sides share
    start_col/end_col names; right payload gets ``suffix``."""
    from vector_ray.stages.base import Step
    from vector_ray.stages.intervals import interval_join

    side = cfg.get("side_field", "side")
    rval = cfg.get("right_value", "right")

    class _IntervalJoin(Step):
        fusable = False

        def apply(self, ds):
            import pyarrow.compute as pc_

            def pick(is_right: bool):
                def fn(t):
                    m = pc_.equal(pc_.cast(t[side], pa.string()), str(rval))
                    m = pc_.fill_null(m, False)
                    if not is_right:
                        m = pc_.invert(m)
                    return t.filter(m).drop_columns([side])

                return fn

            left = ds.map_batches(pick(False), batch_format="pyarrow",
                                  zero_copy_batch=True)
            right = ds.map_batches(pick(True), batch_format="pyarrow",
                                   zero_copy_batch=True)
            sc = cfg["start_col"]
            ec = cfg["end_col"]
            return interval_join(
                left, right, keys=cfg["keys"],
                l_start=sc, l_end=ec, r_start=sc, r_end=ec,
                chunk=int(cfg["chunk"]),
                suffix=cfg.get("suffix", "_r"),
                max_group=int(cfg.get("max_group", 2_000_000)),
                num_buckets=cfg.get("num_buckets"))

    return _IntervalJoin()


@register_transform("throttle")
def _build_throttle(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.throttle import throttle

    class _Throttle(Step):
        fusable = False

        def apply(self, ds):
            return throttle(ds, cfg["keys"], cfg["ts_col"],
                            threshold=int(cfg["threshold"]),
                            window=int(cfg["window"]),
                            tiebreak=cfg.get("tiebreak"),
                            num_buckets=cfg.get("num_buckets"))

    return _Throttle()


@register_transform("ttl_dedupe")
def _build_ttl_dedupe(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.throttle import ttl_dedupe

    class _TtlDedupe(Step):
        fusable = False

        def apply(self, ds):
            return ttl_dedupe(ds, cfg["keys"], cfg["ts_col"],
                              ttl=int(cfg["ttl"]),
                              tiebreak=cfg.get("tiebreak"),
                              num_buckets=cfg.get("num_buckets"))

    return _TtlDedupe()


@register_transform("assign_sessions")
def _build_assign_sessions(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.sessions import assign_sessions

    class _AssignSessions(Step):
        fusable = False

        def apply(self, ds):
            return assign_sessions(
                ds, cfg["keys"], cfg["ts_col"], gap=int(cfg["gap"]),
                id_cols=cfg.get("id_cols"),
                out_session=cfg.get("out_session", "session_seq"),
                out_pos=cfg.get("out_pos", "session_pos"),
                tiebreak=cfg.get("tiebreak"),
                num_buckets=cfg.get("num_buckets"))

    return _AssignSessions()


@register_transform("session_paths")
def _build_session_paths(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.paths import session_paths

    class _SessionPaths(Step):
        fusable = False

        def apply(self, ds):
            return session_paths(
                ds, key=cfg.get("key", "user_id"),
                ts_col=cfg.get("ts_col", "ts"),
                type_col=cfg.get("type_col", "event_type"),
                gap=int(cfg["gap"]),
                max_steps=int(cfg.get("max_steps", 8)),
                k=int(cfg.get("k", 20)),
                sep=cfg.get("sep", ">"),
                tiebreak=cfg.get("tiebreak"),
                num_buckets=cfg.get("num_buckets"))

    return _SessionPaths()


@register_transform("dedup_keep_best")
def _build_dedup_keep_best(cfg):
    """Pairs come from a sibling near-dup transform in the same config
    (the edge-list dataset is produced by the named pairs op over the
    SAME input); here the config form recomputes token-minhash pairs
    inline — the programmatic API accepts any verified pair list."""
    from vector_ray.stages.base import Step

    class _KeepBest(Step):
        fusable = False

        def apply(self, ds):
            from vector_ray.ml.dedup import (dedup_keep_best,
                                             token_minhash_pairs)

            pairs = token_minhash_pairs(
                ds, id_col=cfg.get("id_col", "doc_id"),
                tokens_col=cfg.get("tokens_col", "tokens"),
                num_hashes=int(cfg.get("num_hashes", 8)),
                bands=int(cfg.get("bands", 4)),
                ngram=int(cfg.get("ngram", 4)),
                sig_threshold=float(cfg.get("sig_threshold", 0.75)))
            return dedup_keep_best(
                ds, pairs, id_col=cfg.get("id_col", "doc_id"),
                quality_col=cfg["quality_col"],
                prefer_max=bool(cfg.get("prefer_max", True)))

    return _KeepBest()


@register_transform("weighted_per_key_cap")
def _build_weighted_per_key_cap(cfg):
    from vector_ray.stages.base import Step

    class _WeightedCap(Step):
        fusable = False

        def apply(self, ds):
            from vector_ray.ml.sampling import weighted_per_key_cap

            return weighted_per_key_cap(
                ds, cfg["key_col"], int(cfg["k"]), cfg["weight_col"],
                id_col=cfg.get("id_col", "doc_id"),
                seed=int(cfg.get("seed", 0)),
                log_weights=bool(cfg.get("log_weights", False)))

    return _WeightedCap()


@register_transform("heavy_hitters")
def _build_heavy_hitters(cfg):
    from vector_ray.ml.corpus import heavy_hitters
    from vector_ray.stages.base import Step

    class _HeavyHitters(Step):
        fusable = False

        def apply(self, ds):
            return heavy_hitters(ds, col=cfg.get("field", "text"),
                                 k=cfg.get("k", 20),
                                 capacity=cfg.get("capacity", 4096),
                                 mode=cfg.get("mode", "words"))

    return _HeavyHitters()


@register_transform("approx_quantiles")
def _build_approx_quantiles(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.quantile import grouped_approx_quantiles

    class _ApproxQ(Step):
        fusable = False

        def apply(self, ds):
            return grouped_approx_quantiles(
                ds, cfg["group_by"], cfg["field"],
                cfg.get("quantiles", [0.5, 0.9, 0.99]),
                id_col=cfg["id_field"], k=cfg.get("k", 1024),
                seed=cfg.get("seed", 0))

    return _ApproxQ()


@register_transform("fuzzy_dedupe")
def _build_fuzzy_dedupe(cfg):
    """Self fuzzy join → (l_id, r_id, dist) pairs (type: fuzzy_dedupe,
    field, id_field, max_dist)."""
    from vector_ray.stages.base import Step
    from vector_ray.stages.fuzzy import fuzzy_join

    class _Fuzzy(Step):
        fusable = False

        def apply(self, ds):
            return fuzzy_join(ds, on=cfg["field"],
                              id_col=cfg["id_field"],
                              max_dist=cfg.get("max_dist", 1))

    return _Fuzzy()


@register_transform("resolve_entities")
def _build_resolve_entities(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.fuzzy import resolve_entities

    class _Resolve(Step):
        fusable = False

        def apply(self, ds):
            return resolve_entities(ds, on=cfg["field"],
                                    id_col=cfg["id_field"],
                                    max_dist=cfg.get("max_dist", 1))

    return _Resolve()


@register_transform("zorder")
def _build_zorder(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.zorder import zorder_sort

    class _Z(Step):
        fusable = False

        def apply(self, ds):
            return zorder_sort(ds, cfg["fields"],
                               bits=cfg.get("bits"),
                               keep_key=cfg.get("keep_key", False))

    return _Z()


@register_transform("grouped_heavy_hitters")
def _build_grouped_hh(cfg):
    from vector_ray.ml.corpus import grouped_heavy_hitters
    from vector_ray.stages.base import Step

    class _GHH(Step):
        fusable = False

        def apply(self, ds):
            return grouped_heavy_hitters(
                ds, cfg["group_by"], col=cfg.get("field", "text"),
                k=cfg.get("k", 10),
                capacity=cfg.get("capacity", 4096))

    return _GHH()


@register_transform("grouped_mad_outliers")
def _build_grouped_mad(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.quantile import grouped_mad_outlier_filter

    class _GMad(Step):
        fusable = False

        def apply(self, ds):
            return grouped_mad_outlier_filter(
                ds, cfg["group_by"], cfg["field"],
                k=cfg.get("k", 3.0),
                keep=cfg.get("keep", "inlier"))

    return _GMad()


@register_transform("diverse_select")
def _build_diverse_select(cfg):
    import ray.data as rd

    from vector_ray.ml.select import diverse_select
    from vector_ray.stages.base import Step

    class _Diverse(Step):
        fusable = False

        def apply(self, ds):
            return rd.from_arrow(diverse_select(
                ds, cfg["k"], id_col=cfg.get("id_field", "vec_id"),
                vec_col=cfg.get("vector_field", "embedding"),
                candidates=cfg.get("candidates", 1024),
                seed=cfg.get("seed", 0)))

    return _Diverse()


@register_transform("uniform_sample_k")
def _build_uniform_sample_k(cfg):
    from vector_ray.ml.sampling import uniform_sample_k
    from vector_ray.stages.base import Step

    class _SampleK(Step):
        fusable = False

        def apply(self, ds):
            return uniform_sample_k(ds, cfg["k"],
                                    id_col=cfg.get("id_field", "doc_id"),
                                    seed=cfg.get("seed", 0))

    return _SampleK()


@register_transform("chunk_sequences")
def _build_chunk_sequences(cfg):
    from vector_ray.ml.tokens import chunk_sequences
    from vector_ray.stages.base import Step

    class _Chunk(Step):
        fusable = False

        def apply(self, ds):
            return chunk_sequences(ds, cfg["max_len"],
                                   overlap=cfg.get("overlap", 0),
                                   tok_col=cfg.get("tokens_col", "tokens"),
                                   id_col=cfg.get("id_col", "doc_id"))

    return _Chunk()


@register_transform("pack_sequences")
def _build_pack_sequences(cfg):
    from vector_ray.ml.tokens import pack_sequences
    from vector_ray.stages.base import Step

    class _Pack(Step):
        fusable = False

        def apply(self, ds):
            return pack_sequences(ds, cfg["max_len"],
                                  group_col=cfg.get("group_col", "source"),
                                  id_col=cfg.get("id_col", "doc_id"),
                                  tok_col=cfg.get("len_col", "n_tok"),
                                  num_shards=cfg.get("num_shards", 8))

    return _Pack()


@register_transform("dup_passages")
def _build_dup_passages(cfg):
    from vector_ray.ml.tokens import dup_passages
    from vector_ray.stages.base import Step

    class _DupPassages(Step):
        fusable = False

        def apply(self, ds):
            return dup_passages(ds, n=cfg.get("ngram", 16),
                                tok_col=cfg.get("field", "tokens"),
                                id_col=cfg.get("id_field", "doc_id"),
                                min_docs=cfg.get("min_docs", 2),
                                sample_mod=cfg.get("sample_mod", 1))

    return _DupPassages()


@register_transform("mixture_sample")
def _build_mixture_sample(cfg):
    from vector_ray.ml.sampling import mixture_sample
    from vector_ray.stages.base import Step

    class _Mixture(Step):
        fusable = False

        def apply(self, ds):
            return mixture_sample(ds, dict(cfg.get("rates", {})),
                                  key_col=cfg.get("key_field", "source"),
                                  id_col=cfg.get("id_field", "doc_id"),
                                  default_rate=cfg.get("default_rate", 1.0),
                                  seed=cfg.get("seed", 0))

    return _Mixture()


@register_transform("per_key_cap")
def _build_per_key_cap(cfg):
    from vector_ray.ml.sampling import per_key_cap
    from vector_ray.stages.base import Step

    class _Cap(Step):
        fusable = False

        def apply(self, ds):
            return per_key_cap(ds, cfg.get("key_field", "source"), cfg["k"],
                               id_col=cfg.get("id_field", "doc_id"),
                               seed=cfg.get("seed", 0))

    return _Cap()


@register_transform("strip_dup_passages")
def _build_strip_dup_passages(cfg):
    from vector_ray.ml.tokens import strip_dup_passages
    from vector_ray.stages.base import Step

    class _Strip(Step):
        fusable = False

        def apply(self, ds):
            return strip_dup_passages(ds, n=cfg.get("n", 16),
                                      tok_col=cfg.get("field", "tokens"),
                                      id_col=cfg.get("id_field", "doc_id"),
                                      min_docs=cfg.get("min_docs", 2),
                                      emit_hash=cfg.get("emit_hash", False))

    return _Strip()


@register_transform("grouped_mode")
def _build_grouped_mode(cfg):
    from vector_ray.stages.aggregate import grouped_mode
    from vector_ray.stages.base import Step

    class _Mode(Step):
        fusable = False

        def apply(self, ds):
            return grouped_mode(ds, cfg["keys"], cfg["field"],
                                out=cfg.get("out", "mode"))

    return _Mode()


@register_transform("bpe_train")
def _build_bpe_train(cfg):
    from vector_ray.stages.base import Step

    class _BpeTrain(Step):
        fusable = False  # iterative, owns its plan

        def apply(self, ds):
            import ray.data as rd

            from vector_ray.ml.bpe import bpe_train

            merges, _types = bpe_train(
                ds, cfg.get("field", "text"),
                num_merges=cfg.get("num_merges", 100),
                min_freq=cfg.get("min_freq", 1))
            return rd.from_arrow(merges)

    return _BpeTrain()


@register_transform("profile")
def _build_profile(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.profile import profile

    class _Profile(Step):
        fusable = False  # aggregating summary, owns its plan

        def apply(self, ds):
            return profile(ds, columns=cfg.get("columns"))

    return _Profile()


@register_transform("resample")
def _build_resample(cfg):
    from vector_ray.stages.base import Step
    from vector_ray.stages.window import resample

    class _Resample(Step):
        fusable = False  # owns a join + grid plan

        def apply(self, ds):
            specs = {out: (s["op"], s["field"])
                     for out, s in cfg["aggregates"].items()}
            return resample(ds, cfg.get("ts_field", "ts"),
                            cfg.get("size_s", 3600.0), specs,
                            keys=cfg.get("keys", []),
                            fill=cfg.get("fill", "null"))

    return _Resample()


@register_transform("pagerank")
def _build_pagerank(cfg):
    from vector_ray.ml.graph import pagerank
    from vector_ray.stages.base import Step

    class _PageRank(Step):
        fusable = False  # iterative, owns its plan

        def apply(self, ds):
            return pagerank(ds, src_col=cfg.get("src", "src"),
                            dst_col=cfg.get("dst", "dst"),
                            iters=cfg.get("iters", 10),
                            damping_num=cfg.get("damping_num", 85),
                            damping_den=cfg.get("damping_den", 100))

    return _PageRank()


@register_transform("line_dedup")
def _build_line_dedup(cfg):
    from vector_ray.ml.clean import line_dedup
    from vector_ray.stages.base import Step

    class _LineDedup(Step):
        fusable = False  # two-pass (count + probe), owns its plan

        def apply(self, ds):
            return line_dedup(ds, cfg.get("field", "text"),
                              min_count=cfg.get("min_count", 2),
                              id_col=cfg.get("id_field", "doc_id"),
                              output=cfg.get("output", "rebuild"),
                              unit=cfg.get("unit", "line"),
                              mode=cfg.get("mode", "drop_all"))

    return _LineDedup()


@register_transform("tfidf_score")
def _build_tfidf_score(cfg):
    from vector_ray.ml.corpus import tfidf_score
    from vector_ray.stages.base import Step

    class _TfIdf(Step):
        fusable = False

        def apply(self, ds):
            return tfidf_score(ds, col=cfg.get("field", "text"),
                               id_col=cfg.get("id_field", "doc_id"),
                               keep_cols=tuple(cfg.get("keep_fields", ())),
                               max_vocab=cfg.get("max_vocab", 20_000_000))

    return _TfIdf()


@register_transform("token_budget_cap")
def _build_token_budget_cap(cfg):
    from vector_ray.ml.sampling import token_budget_cap
    from vector_ray.stages.base import Step

    class _Budget(Step):
        fusable = False

        def apply(self, ds):
            return token_budget_cap(ds, cfg.get("key_field", "source"),
                                    cfg["budget"],
                                    weight_col=cfg.get("weight_field", "n_tok"),
                                    id_col=cfg.get("id_field", "doc_id"),
                                    seed=cfg.get("seed", 0))

    return _Budget()


@register_transform("split_holdout")
def _build_split_holdout(cfg):
    from vector_ray.ml.sampling import split_holdout
    from vector_ray.stages.base import Step

    class _Split(Step):
        fusable = False

        def apply(self, ds):
            return split_holdout(ds, cfg["frac"],
                                 id_col=cfg.get("id_field", "doc_id"),
                                 seed=cfg.get("seed", 0),
                                 which=cfg.get("which", "train"))

    return _Split()


@register_transform("deterministic_shuffle")
def _build_deterministic_shuffle(cfg):
    from vector_ray.ml.sampling import deterministic_shuffle
    from vector_ray.stages.base import Step

    class _Shuffle(Step):
        fusable = False

        def apply(self, ds):
            return deterministic_shuffle(ds,
                                         id_col=cfg.get("id_field", "doc_id"),
                                         seed=cfg.get("seed", 0),
                                         keep_key=cfg.get("keep_key"))

    return _Shuffle()


@register_transform("decontaminate")
def _build_decontaminate(cfg):
    from vector_ray.ml.tokens import decontaminate
    from vector_ray.stages.base import Step

    if "benchmark_path" in cfg:
        import pyarrow.parquet as _pq

        bench = _pq.read_table(cfg["benchmark_path"])
    else:  # self-contained: benchmark = a synth id range
        import numpy as _np

        from vector_ray.sources.synth import synth_table

        lo, hi = cfg["benchmark_rows"]
        bench = synth_table(_np.arange(lo, hi), seed=cfg.get("benchmark_seed", 42))

    class _Decontam(Step):
        fusable = False

        def apply(self, ds):
            return decontaminate(ds, bench, n=cfg.get("ngram", 8),
                                 tok_col=cfg.get("tokens_col", "tokens"),
                                 id_col=cfg.get("id_col", "doc_id"),
                                 mode=cfg.get("mode", "flag"))

    return _Decontam()


@register_transform("minhash_dedup")
def _build_minhash_dedup(cfg):
    """Near-duplicate removal (ml/dedup.py minhash_lsh_dedup): keep
    the lowest id per duplicate cluster. All scale guards (bucket cap,
    distributed components, broadcast-or-anti-join filter) at their
    library defaults unless overridden."""
    from vector_ray.stages.base import Step

    class _MinhashDedup(Step):
        fusable = False

        def apply(self, ds):
            from vector_ray.ml.dedup import minhash_lsh_dedup

            return minhash_lsh_dedup(
                ds, cfg.get("field", "text"),
                id_col=cfg.get("id_field", "doc_id"),
                num_hashes=int(cfg.get("num_hashes", 64)),
                bands=int(cfg.get("bands", 16)),
                k=int(cfg.get("k", 5)),
                jaccard_threshold=float(cfg.get("jaccard_threshold", 0.8)),
            )

    return _MinhashDedup()


@register_transform("semantic_dedup")
def _build_semantic_dedup(cfg):
    from vector_ray.ml.semdedup import semantic_dedup
    from vector_ray.stages.base import Step

    class _SemDedup(Step):
        fusable = False

        def apply(self, ds):
            return semantic_dedup(
                ds,
                tau=cfg.get("threshold", 0.9),
                n_clusters=cfg.get("n_clusters", 64),
                vec_col=cfg.get("field", "embedding"),
                id_col=cfg.get("id_field", "vec_id"),
                sample_size=cfg.get("sample_size", 8192),
                max_cluster=cfg.get("max_cluster", 8192),
            )

    return _SemDedup()


@register_transform("lm_score")
def _build_lm_score(cfg):
    from vector_ray.ml.lm_score import perplexity_score, train_char_lm
    from vector_ray.stages.base import Step

    class _LmScore(Step):
        fusable = False

        def apply(self, ds):
            model = train_char_lm(
                ds,
                text_col=cfg.get("field", "text"),
                id_col=cfg.get("id_field", "doc_id"),
                sample_mod=cfg.get("sample_mod", 1),
                alpha=cfg.get("alpha", 0.5),
            )
            keep = tuple(cfg.get("keep_fields", ("doc_id",)))
            return perplexity_score(
                ds, model, text_col=cfg.get("field", "text"), keep_cols=keep
            )

    return _LmScore()


def _preset_parser(kernel_name: str):
    """Preset single-regex log-format parsers (apache/nginx/glog/klog/
    linux-auth/user-agent/vpc-flow): parse `field`, unpack the result
    struct into columns (typed via `types`), optionally drop the source
    field."""

    def build(cfg):
        import pyarrow as pa
        import pyarrow.compute as pc

        from vector_ray.expr import kernels as F
        from vector_ray.stages.base import FnStep

        field = cfg.get("field", "message")
        drop = cfg.get("drop_field", False)
        types = cfg.get("types") or {}
        kw = {}
        if kernel_name == "parse_apache_log" and "format" in cfg:
            kw["format"] = cfg["format"]
        kernel = getattr(F, kernel_name)

        def fn(t: pa.Table) -> pa.Table:
            s = kernel(t[field], **kw)
            s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
            for sub in s.type:
                col = pc.struct_field(s, sub.name)
                if sub.name in types:
                    col = F.coerce(col, types[sub.name])
                t = F.set_(t, sub.name, col)
            if drop:
                t = F.del_(t, field)
            return t

        return FnStep(fn, name=kernel_name)

    return build


for _tname, _kname in [
    ("apache_log_parser", "parse_apache_log"),
    ("common_log_parser", "parse_common_log"),
    ("nginx_log_parser", "parse_nginx_log"),
    ("glog_parser", "parse_glog"),
    ("klog_parser", "parse_klog"),
    ("linux_auth_parser", "parse_linux_authorization"),
    ("user_agent_parser", "parse_user_agent"),
    ("vpc_flow_log_parser", "parse_aws_vpc_flow_log"),
]:
    register_transform(_tname)(_preset_parser(_kname))


# route is built inline by the topology (it has named outputs)


# ---------------------------------------------------------------------------
# topology


class ConfigError(ValueError):
    pass


def _inputs(cfg: dict) -> List[str]:
    """Normalize `inputs` (scalar string or list) to a list."""
    inp = cfg.get("inputs")
    if inp is None:
        return []
    return [inp] if isinstance(inp, str) else list(inp)


class Topology:
    def __init__(self, config: dict):
        self.config = config
        self.sources = config.get("sources", {})
        self.transforms = config.get("transforms", {})
        self.sinks = config.get("sinks", {})
        validate(config)

    # -- dataset construction ------------------------------------------

    def _source_dataset(self, name: str, overrides: Optional[dict] = None):
        import ray.data as rd

        cfg = self.sources[name]
        if overrides and name in overrides:
            return overrides[name]
        stype = cfg["type"]
        if stype == "parquet":
            return rd.read_parquet(cfg["path"], columns=cfg.get("columns"))
        if stype == "csv":
            return rd.read_csv(cfg["path"])
        if stype == "json":
            return rd.read_json(cfg["path"])
        if stype == "text":
            ds = rd.read_text(cfg["path"])
            return ds.map_batches(
                lambda t: t.rename_columns(["message"]), batch_format="pyarrow"
            )
        if stype == "file":
            # the reference's file source with framing (src/codecs/framers):
            # newline | character | length | octet
            from vector_ray.sources.lines import read_lines

            delim = cfg.get("delimiter", "\n")
            ds = read_lines(
                cfg["path"],
                framing=cfg.get("framing", "newline"),
                delimiter=delim.encode() if isinstance(delim, str) else delim,
                compression=cfg.get("compression", "auto"),
            )
            return ds.map_batches(
                lambda t: t.rename_columns(["message"]), batch_format="pyarrow"
            )
        if stype == "generator":
            from vector_ray.sources.synth import generator_lines

            tbl = generator_lines(cfg.get("count", 1000), cfg.get("format", "apache"),
                                  seed=cfg.get("seed", 42))
            return rd.from_arrow(tbl)
        if stype == "web_docs":
            # deterministic multi-line web-page corpus (doc_id, url,
            # text) with planted curation signals — self-contained
            # web-curation examples (sources/synth.py web_docs_table)
            from vector_ray.sources.synth import web_docs_table

            tbl = web_docs_table(cfg.get("count", 2000),
                                 seed=cfg.get("seed", 5))
            return rd.from_arrow(tbl).repartition(cfg.get("blocks", 8))
        if stype == "link_graph":
            # deterministic directed edge table (src, dst) — graph
            # examples (sources/synth.py link_graph_table)
            from vector_ray.sources.synth import link_graph_table

            tbl = link_graph_table(cfg.get("edges", 20_000),
                                   cfg.get("nodes", 4_000),
                                   seed=cfg.get("seed", 7))
            return rd.from_arrow(tbl).repartition(cfg.get("blocks", 8))
        if stype == "tokens_synth":
            # deterministic north-rule tokenized table (doc_id, tokens,
            # n_tok, source) — self-contained token-pipeline examples
            from vector_ray.sources.synth import synth_parquet

            path = synth_parquet(cfg.get("count", 10_000), seed=cfg.get("seed", 42),
                                 rows_per_file=cfg.get("rows_per_file", 2_500))
            return rd.read_parquet(path, columns=cfg.get("columns"))
        if stype == "incremental_agg":
            # checkpointed aggregate over a growing lake: each run of
            # the config scans only input fragments its state has not
            # seen (state/incremental.py), then the pipeline consumes
            # the CURRENT aggregate. aggs: {out: [kind, col]}.
            from vector_ray.state.incremental import IncrementalAggregate

            inc = IncrementalAggregate(
                cfg["state"], list(cfg["group_by"]),
                {k: tuple(v) for k, v in cfg["aggs"].items()})
            inc.update(cfg["input"])
            return inc.result()
        raise ConfigError(f"unknown source type {stype}")

    def node_dataset(self, ref: str, *, overrides: Optional[dict] = None, _cache=None):
        """Dataset for node reference `name` or `name.output` (route lane)."""
        if _cache is None:
            _cache = {}
        if ref in _cache:
            return _cache[ref]
        if overrides:
            if ref in overrides and ref not in self.sources:
                return overrides[ref]
        name, _, port = ref.partition(".")
        if name in self.sources:
            ds = self._source_dataset(name, overrides)
            _cache[ref] = ds
            return ds
        if name not in self.transforms:
            raise ConfigError(f"unknown node {name}")
        cfg = self.transforms[name]
        inputs = cfg["inputs"] if isinstance(cfg["inputs"], list) else [cfg["inputs"]]
        input_dss = [self.node_dataset(i, overrides=overrides, _cache=_cache) for i in inputs]
        if cfg["type"] == "join":
            # TRUE two-input node (the one fan-in that is NOT a union):
            # inputs[0] joins inputs[1]. mode=bucketed (default) is the
            # large×large partitioned hash join; mode=broadcast ships
            # the (small) right side once and the left never shuffles.
            from vector_ray.stages.join import broadcast_join, bucketed_join

            if len(input_dss) != 2:
                raise ConfigError(f"join {name} needs exactly 2 inputs")
            left, right = input_dss
            on = cfg["on"] if isinstance(cfg["on"], list) else [cfg["on"]]
            r_on = cfg.get("right_on")
            if r_on is not None and not isinstance(r_on, list):
                r_on = [r_on]
            how = cfg.get("how", "inner")
            if cfg.get("mode", "bucketed") == "broadcast":
                out = broadcast_join(left, right, on, join_type=how,
                                     right_on=r_on)
            else:
                out = bucketed_join(
                    left, right, on, join_type=how, right_on=r_on,
                    buckets=cfg.get("buckets"),
                    bloom_prefilter=bool(cfg.get("bloom_prefilter", False)))
            _cache[ref] = out
            return out
        ds = input_dss[0]
        if len(input_dss) > 1:  # fan-in = union (src/config/graph.rs edges)
            ds = ds.union(*input_dss[1:])
        if cfg["type"] in ("route", "swimlanes"):
            lanes = {ln: build_condition(spec) for ln, spec in cfg["route"].items()}
            route = Route(lanes, unmatched_lane=cfg.get("unmatched_lane"))
            if port:
                if port == "_unmatched" and cfg.get("unmatched_lane"):
                    port = cfg["unmatched_lane"]
                if port not in lanes and port != cfg.get("unmatched_lane"):
                    raise ConfigError(f"route {name} has no lane {port}")
                out = route.views(ds).get(port)
                if out is None:  # unmatched lane view
                    inv = None
                    for c in lanes.values():
                        inv = c if inv is None else (inv | c)
                    out = Filter(~inv).apply(ds)
                _cache[ref] = out
                return out
            # no port: exploded dataset with lane column
            out = route.explode(ds)
            _cache[ref] = out
            return out
        if cfg["type"] == "compound":  # serial macro (src/transforms/compound.rs)
            steps = [TRANSFORMS[c["type"]](c) for c in cfg["steps"]]
            out = apply_chain(ds, steps)
            _cache[ref] = out
            return out
        step = TRANSFORMS[cfg["type"]](cfg)
        out = step.apply(ds)
        _cache[ref] = out
        return out

    # -- sinks ----------------------------------------------------------

    def run(self, *, overrides: Optional[dict] = None) -> dict:
        """Execute every sink; returns {sink: result} (path, count, or
        rows for console)."""
        results = {}
        cache: dict = {}
        for name, cfg in self.sinks.items():
            inputs = cfg["inputs"] if isinstance(cfg["inputs"], list) else [cfg["inputs"]]
            dss = [self.node_dataset(i, overrides=overrides, _cache=cache) for i in inputs]
            ds = dss[0]
            if len(dss) > 1:
                ds = ds.union(*dss[1:])
            stype = cfg["type"]
            if stype == "parquet":
                pcols = list(cfg.get("partition_cols") or [])
                tpart = cfg.get("partition_by_time")
                if tpart:
                    # strftime sink-path templating (src/sinks/file/mod.rs:35-44)
                    # → derived date column + hive partition dir
                    field, fmt = tpart["field"], tpart.get("format", "%Y-%m-%d")
                    col = tpart.get("column", "dt")

                    def add_dt(t, field=field, fmt=fmt, col=col):
                        import pyarrow.compute as _pc

                        return t.append_column(col, _pc.strftime(t[field], format=fmt))

                    ds = ds.map_batches(add_dt, batch_format="pyarrow", zero_copy_batch=True)
                    pcols.append(col)
                ds.write_parquet(cfg["path"], partition_cols=pcols or None)
                results[name] = cfg["path"]
            elif stype == "csv":
                ds.write_csv(cfg["path"])
                results[name] = cfg["path"]
            elif stype == "json":
                ds.write_json(cfg["path"])
                results[name] = cfg["path"]
            elif stype == "file":
                # src/sinks/file/mod.rs: templated path + codec + gzip
                from vector_ray.sinks import FileSink

                sink = FileSink(
                    cfg["path"], codec=cfg.get("encoding", {}).get("codec", "ndjson")
                    if isinstance(cfg.get("encoding"), dict) else cfg.get("encoding", "ndjson"),
                    compression=cfg.get("compression", "none"),
                    text_field=cfg.get("text_field", "message"),
                )
                results[name] = sink.write(ds)
            elif stype == "console":
                results[name] = ds.take(cfg.get("limit", 20))
            elif stype == "blackhole":
                results[name] = ds.count()
            elif stype == "memory":
                results[name] = ds.to_pandas()
            else:
                raise ConfigError(f"unknown sink type {stype}")
        return results


# ---------------------------------------------------------------------------
# validate / graph (the `vector validate` / `vector graph` subcommands)


def validate(config: dict) -> List[str]:
    """Schema+graph validation; raises ConfigError on fatal problems,
    returns warnings."""
    warnings: List[str] = []
    sources = config.get("sources", {})
    transforms = config.get("transforms", {})
    sinks = config.get("sinks", {})
    if not sources:
        raise ConfigError("config has no sources")
    names = set(sources) | set(transforms)
    dup = set(sources) & set(transforms)
    if dup:
        raise ConfigError(f"duplicate component names: {sorted(dup)}")
    for name, cfg in transforms.items():
        t = cfg.get("type")
        if t in ("route", "swimlanes"):
            if "route" not in cfg:
                raise ConfigError(f"route {name} missing 'route' lanes")
        elif t == "compound":
            for c in cfg.get("steps", []):
                if c.get("type") not in TRANSFORMS:
                    raise ConfigError(f"compound {name}: unknown step type {c.get('type')}")
        elif t == "join":
            if True in cfg and "on" not in cfg:
                # YAML 1.1 parses a bare `on:` key as boolean True
                cfg["on"] = cfg.pop(True)
            if "on" not in cfg:
                raise ConfigError(f"join {name} missing 'on'")
            if len(_inputs(cfg)) != 2:
                raise ConfigError(f"join {name} needs exactly 2 inputs")
        elif t not in TRANSFORMS:
            raise ConfigError(f"unknown transform type {t!r} in {name}")
        for i in _inputs(cfg):
            base = i.split(".")[0]
            if base not in names:
                raise ConfigError(f"{name}: unknown input {i}")
    if not sinks:
        warnings.append("config has no sinks — nothing will execute")
    for name, cfg in sinks.items():
        for i in _inputs(cfg):
            base = i.split(".")[0]
            if base not in names:
                raise ConfigError(f"sink {name}: unknown input {i}")
    # cycle check (DAG requirement, src/config/graph.rs:202-260)
    adj = {n: [] for n in names}
    for name, cfg in transforms.items():
        for i in _inputs(cfg):
            adj[i.split(".")[0]].append(name)
    state: Dict[str, int] = {}

    def dfs(n):
        state[n] = 1
        for m in adj.get(n, []):
            if state.get(m) == 1:
                raise ConfigError(f"cycle through {m}")
            if m not in state:
                dfs(m)
        state[n] = 2

    for n in names:
        if n not in state:
            dfs(n)
    return warnings


# transform type -> data-exchange shape, the plan property that decides
# cluster cost (consulted by explain()). Anything not listed is a
# stateless per-batch kernel: map-only, no exchange.
_EXCHANGE: Dict[str, str] = {}
_EXCHANGE.update(dict.fromkeys(
    ["enrich", "geoip", "standardize", "bucketize", "one_hot",
     "target_encode", "winsorize", "minmax_scale", "quantile_band_filter",
     "mad_outlier_filter", "grouped_mad_outliers", "decontaminate",
     "blocklist_filter", "dsir_score", "nb_classify", "lm_score", "pca",
     "diverse_select", "tfidf_score", "dup_passages",
     "strip_dup_passages"],
    "fit/lookup broadcast (ray.put once) + map-only apply"))
_EXCHANGE.update(dict.fromkeys(
    ["aggregate", "reduce", "log_to_metric", "topk", "rollup", "cube",
     "tumbling_window", "hopping_window", "resample", "vocab_topk",
     "heavy_hitters", "grouped_heavy_hitters", "pmi_pairs", "auc_score",
     "classification_report", "quantiles_cont", "approx_quantiles",
     "profile", "tag_cardinality_limit", "log_templates", "bpe_train",
     "drift_report", "template_novelty"],
    "per-block partials → one aggregate-sized keyed exchange"))
_EXCHANGE.update(dict.fromkeys(
    ["dedupe", "session_window", "window_shift", "rank_values", "pivot",
     "scd2", "merge", "grouped_mode", "merge_intervals", "interval_join",
     "throttle", "ttl_dedupe", "assign_sessions", "session_paths",
     "dedup_keep_best", "weighted_per_key_cap", "per_key_cap",
     "token_budget_cap", "mixture_sample", "pack_sequences", "bm25"],
    "one keyed bucketed shuffle (narrow columns)"))
_EXCHANGE.update(dict.fromkeys(
    ["zorder", "deterministic_shuffle"],
    "one distributed sort (range-partitioned all-to-all)"))
_EXCHANGE.update(dict.fromkeys(
    ["minhash_dedup", "semantic_dedup", "fuzzy_dedupe",
     "resolve_entities", "knn_graph", "line_dedup", "pagerank",
     "triangle_count"],
    "multi-pass candidate/verify exchanges (keys/ids only, capped)"))
_EXCHANGE.update(dict.fromkeys(
    ["row_number", "uniform_sample_k", "split_holdout"],
    "map-only + O(#blocks) driver state"))


def explain(config: dict) -> str:
    """`vector_ray graph` companion: one line per component with its
    data-exchange shape — where the plan shuffles, broadcasts, sorts,
    or stays map-only. The honest cost model for a topology review
    before pointing it at 100 TB."""
    lines: List[str] = []
    for n, cfg in config.get("sources", {}).items():
        typ = cfg.get("type", "?")
        lines.append(f"source     {n:<24} {typ:<22} parallel read"
                     " (per-fragment blocks, column-pruned)")
    for n, cfg in config.get("transforms", {}).items():
        typ = cfg.get("type", "?")
        ex = _EXCHANGE.get(typ, "map-only (stateless batch kernel)")
        if typ == "dedupe" and cfg.get("persist"):
            ex = ("bucketed anti-join vs persisted seen-key index"
                  " + map-only append")
        elif typ == "join":
            ex = ("broadcast right side (ray.put once) + map-only probe"
                  if cfg.get("mode") == "broadcast"
                  else "partitioned hash join (both sides keyed-shuffle"
                  + (", bloom-prefiltered left)" if cfg.get("bloom_prefilter")
                     else ")"))
        ins = ",".join(_inputs(cfg))
        lines.append(f"transform  {n:<24} {typ:<22} {ex}  <- {ins}")
    for n, cfg in config.get("sinks", {}).items():
        typ = cfg.get("type", "?")
        ins = ",".join(_inputs(cfg))
        if typ in ("console", "blackhole"):
            shape = "driver-side consume (bounded sample / count only)"
        else:
            shape = "parallel write (one file per block)"
        lines.append(f"sink       {n:<24} {typ:<22} {shape}  <- {ins}")
    return "\n".join(lines) + "\n"


def graph(config: dict) -> str:
    """DOT export (`vector graph`)."""
    out = io.StringIO()
    out.write("digraph {\n")
    for n in config.get("sources", {}):
        out.write(f'  "{n}" [shape=trapezium]\n')
    for n, cfg in config.get("transforms", {}).items():
        out.write(f'  "{n}" [shape=diamond]\n')
        for i in _inputs(cfg):
            out.write(f'  "{i.split(".")[0]}" -> "{n}"\n')
    for n, cfg in config.get("sinks", {}).items():
        out.write(f'  "{n}" [shape=invtrapezium]\n')
        for i in _inputs(cfg):
            out.write(f'  "{i.split(".")[0]}" -> "{n}"\n')
    out.write("}\n")
    return out.getvalue()


def component_stats(config: dict) -> List[dict]:
    """Batch analogue of `vector top` (src/top/: live per-component
    event counters of a running instance): execute the graph node by
    node and report rows_out + wall seconds for each component. Each
    node is materialized once and cached, so every edge executes
    exactly once in dependency order; sinks report the rows flowing
    INTO them without writing any output."""
    import time

    topo = Topology(config)
    cache: dict = {}
    out: List[dict] = []

    def _mat(ref: str, kind: str, typ: str):
        t0 = time.time()
        ds = topo.node_dataset(ref, _cache=cache)
        m = ds.materialize()
        cache[ref] = m
        out.append({"component": ref, "kind": kind, "type": typ,
                    "rows_out": m.count(),
                    "wall_s": round(time.time() - t0, 3)})

    for name, cfg in topo.sources.items():
        _mat(name, "source", cfg["type"])
    for name, cfg in topo.transforms.items():
        _mat(name, "transform", cfg["type"])
    for name, cfg in topo.sinks.items():
        inputs = cfg["inputs"] if isinstance(cfg["inputs"], list) else [cfg["inputs"]]
        t0 = time.time()
        dss = [topo.node_dataset(i, _cache=cache) for i in inputs]
        ds = dss[0].union(*dss[1:]) if len(dss) > 1 else dss[0]
        out.append({"component": name, "kind": "sink", "type": cfg["type"],
                    "rows_out": ds.count(),
                    "wall_s": round(time.time() - t0, 3)})
    return out


def load_config(src) -> Topology:
    """Load from dict, YAML/JSON string, or path."""
    if isinstance(src, Topology):
        return src
    if isinstance(src, dict):
        return Topology(src)
    import yaml

    if isinstance(src, str) and "\n" not in src and src.endswith((".yaml", ".yml", ".json", ".toml")):
        with open(src) as f:
            text = f.read()
        if src.endswith(".toml"):
            import tomllib

            return Topology(tomllib.loads(text))
        return Topology(yaml.safe_load(text))
    return Topology(yaml.safe_load(src))


# ---------------------------------------------------------------------------
# unit-test harness (`vector test`, src/config/unit_test.rs:15-100)


def run_unit_tests(config, tests: List[dict]) -> List[dict]:
    """Each test: {"name", "input": {"insert_at": node, "rows": [...]},
    "outputs": [{"extract_from": node-ref, "conditions": [spec...],
                 "n_rows": int?}],
    "no_outputs_from": [node-ref...]}.

    Builds only the transform subgraph, injects the rows as the
    insert-at node's input, and asserts the conditions on every
    extracted row. Returns a list of {"name", "passed", "errors"}.
    """
    import ray.data as rd

    topo = load_config(config)
    results = []
    for test in tests:
        errors: List[str] = []
        insert_at = test["input"]["insert_at"]
        rows = test["input"]["rows"]
        injected = rd.from_arrow(pa.Table.from_pylist(rows))
        cfg = topo.transforms.get(insert_at)
        if cfg is None:
            raise ConfigError(f"test {test.get('name')}: unknown insert_at {insert_at}")
        # inject DIRECTLY as the insert_at node's input (unit_test.rs
        # semantics: rows enter AT the named transform, bypassing any
        # upstream transforms); unrelated sources produce nothing
        overrides = {ref: injected for ref in _inputs(cfg)}
        for sname in topo.sources:
            overrides.setdefault(sname, injected.limit(0))
        cache: dict = {}
        for out_spec in test.get("outputs", []):
            ref = out_spec["extract_from"]
            tbl = pa.Table.from_pylist(
                topo.node_dataset(ref, overrides=overrides, _cache=cache).take_all()
            )
            if "n_rows" in out_spec and len(tbl) != out_spec["n_rows"]:
                errors.append(f"{ref}: expected {out_spec['n_rows']} rows, got {len(tbl)}")
            for cond_spec in out_spec.get("conditions", []):
                cond = build_condition(cond_spec)
                if len(tbl) == 0:
                    errors.append(f"{ref}: no rows to assert {cond_spec}")
                    continue
                mask = cond(tbl)
                import pyarrow.compute as pc

                if not pc.all(mask).as_py():
                    errors.append(f"{ref}: condition {cond_spec} failed on some rows")
        for ref in test.get("no_outputs_from", []):
            n = topo.node_dataset(ref, overrides=overrides, _cache=cache).count()
            if n != 0:
                errors.append(f"{ref}: expected no outputs, got {n} rows")
        results.append({"name": test.get("name", "?"), "passed": not errors, "errors": errors})
    return results


@register_transform("gopher_filter")
def _build_gopher_filter(cfg):
    from vector_ray.ml.text import gopher_repetition_filter
    from vector_ray.stages.base import Step

    class _Gopher(Step):
        fusable = False

        def apply(self, ds):
            return gopher_repetition_filter(
                ds, cfg.get("field", "text"),
                drop=cfg.get("drop", True))

    return _Gopher()


@register_transform("blocklist_filter")
def _build_blocklist_filter(cfg):
    from vector_ray.ml.clean import blocklist_filter
    from vector_ray.stages.base import Step

    class _Blocklist(Step):
        fusable = False

        def apply(self, ds):
            return blocklist_filter(ds, cfg["phrases"],
                                    cfg.get("field", "text"),
                                    drop=cfg.get("drop", True))

    return _Blocklist()


@register_transform("gopher_quality")
def _build_gopher_quality(cfg):
    from vector_ray.ml.text import gopher_quality_filter
    from vector_ray.stages.base import Step

    class _GopherQ(Step):
        fusable = False

        def apply(self, ds):
            return gopher_quality_filter(
                ds, cfg.get("field", "text"),
                drop=cfg.get("drop", True),
                min_words=cfg.get("min_words", 50),
                max_words=cfg.get("max_words", 100_000))

    return _GopherQ()
