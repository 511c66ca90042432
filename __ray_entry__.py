"""Driver contract for the graft builder (Ray Data target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 (and the training-data extensions), each running the REAL
vector_ray stage over the driver's parquet tables; ``oracle_sql()``
gives the DuckDB-equivalent SQL for everything SQL-expressible.
Column names and types are matched to DuckDB defaults (BIGINT/DOUBLE/
VARCHAR); float aggregates are rounded identically on both sides
(fixed-point integers) so value hashes compare exactly.

Query → reference-transform parity map (paths under /root/reference):

  filter_events          src/transforms/filter.rs:65-73
  route_events           src/transforms/route.rs:57-65,101-120 (copy semantics)
  remap_fields           src/transforms/remap.rs + src/template.rs:28-32
  regex_parse_source     src/transforms/regex_parser.rs:242-300
  grok_first_word        src/transforms/grok_parser.rs:107-148
  json_parse_props       src/transforms/json_parser.rs:13-20
  kv_roundtrip           src/transforms/key_value_parser.rs:16-29
  tokenize_docs          src/transforms/tokenizer.rs / lib/shared/src/tokenize.rs
  dedupe_docs            src/transforms/dedupe.rs:155-163 (typed keys :131-143)
  agg_source_stats       src/transforms/aggregate.rs:72-107 (two-phase partials)
  reduce_events/concat   src/transforms/reduce/mod.rs:221-257 + merge_strategy.rs
  q1_lineitem            grouped aggregate composition (metric.rs:103-106 mergeable partials)
  enrich_*               lib/enrichment/src/lib.rs:37-74, src/enrichment_tables/file.rs
  window_events          aggregate interval flush (aggregate.rs:24-26) as event-time tumbling
  session_events         reduce expire_after_ms analogue as gap sessions
  cardinality_limit      src/transforms/tag_cardinality_limit.rs:25-53
  sample_events          src/transforms/sample.rs:107-139 (hash mode)
  geoip_events           src/transforms/geoip.rs:92-123
  unnest_words           VRL unnest (lib/vrl/stdlib) / cloudwatch explode
  salted_reduce          skew handling per BASELINE.json north_rule
  flagship_tokenized     the full north-rule topology (SURVEY.md §7), oracle = full SQL
  percentiles            sort/top-k (SURVEY.md §2.7 — absent in the reference)
  exact_dedup/minhash/simhash/embedding_dup/knn/ann_ivf/token_near_dup/
  lang_id/quality/approx_distinct/tumbling_histogram/media_features/
  ngram_dup_pairs        training-data extensions (driver brief), vector_ray.ml + stages.sketch
  apache_log_parse       lib/vrl/stdlib/src/parse_apache_log.rs (render→parse round trip)
  glog_parse             lib/vrl/stdlib/src/parse_glog.rs
  user_agent_parse       lib/vrl/stdlib/src/parse_user_agent.rs (simplified family table)
  syslog_lines           file source × codecs/framers (src/codecs/framers/*) end-to-end
  dd_search_events/docs  src/conditions/datadog_search.rs (full grammar → Cond)
  merge_partial_docs     src/transforms/merge.rs:18-37 (partial stitching round trip)
  log_to_metric_agg      src/transforms/log_to_metric.rs:27-78 + aggregate.rs:72-107
  metric_to_log_json     src/transforms/metric_to_log.rs:18-21
  grouped_percentiles    AggregatedSummary per-series quantiles (metric.rs:165-169),
                         distributed exact (stages/quantile.py)

Every query is oracle-gated (rows+schema+hash): SQL re-derivations
where expressible, golden-value oracles from independent
reimplementations (tools/golden.py) for the sketch/signature pipelines.

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or in vector_ray.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _rp(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _cast64(tbl: pa.Table) -> pa.Table:
    """Promote int{8,16,32}/float32 to DuckDB-default widths so the
    driver's schema compare lines up."""
    for i, f in enumerate(tbl.schema):
        if pa.types.is_integer(f.type) and f.type.bit_width < 64:
            tbl = tbl.set_column(i, f.name, pc.cast(tbl[f.name], pa.int64()))
        elif pa.types.is_floating(f.type) and f.type.bit_width < 64:
            tbl = tbl.set_column(i, f.name, pc.cast(tbl[f.name], pa.float64()))
    return tbl


def _finish(ds):
    return ds.map_batches(_cast64, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# query implementations (each exercises a vector_ray stage)


def q_filter_events(sf_dir):
    from vector_ray.expr import C
    from vector_ray.stages import Filter

    ds = _rp(sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"])
    out = Filter(C.eq("event_type", "error") & C.gt("value", 100.0)).apply(ds)
    return _finish(out.select_columns(["event_id", "user_id", "value"]))


def q_route_events(sf_dir):
    from vector_ray.expr import C
    from vector_ray.stages import Route

    ds = _rp(sf_dir, "events", columns=["event_id", "event_type", "value"])
    route = Route(
        {"high": C.ge("value", 150.0), "purchase": C.eq("event_type", "purchase")},
        unmatched_lane="rest",
    )
    return _finish(route.explode(ds).select_columns(["lane", "event_id"]))


def q_remap_fields(sf_dir):
    from vector_ray.expr import F
    from vector_ray.stages.remap import Remap

    ds = _rp(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment", "c_nationkey"])

    def prog(t: pa.Table) -> pa.Table:
        t = F.set_(t, "seg_key", F.render(t, "{{c_mktsegment}}-{{c_nationkey}}"))
        t = F.set_(t, "name_upper", F.upcase(t["c_name"]))
        return t.select(["c_custkey", "seg_key", "name_upper"])

    return _finish(Remap(prog).apply(ds))


def q_regex_parse_source(sf_dir):
    from vector_ray.stages import RegexParser

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source"])
    p = RegexParser("source", [r"src(?P<src_num>\d+)"], types={"src_num": "int"}, drop_field=True)
    return _finish(p.apply(ds))


def q_grok_first_word(sf_dir):
    from vector_ray.stages import GrokParser

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    p = GrokParser("text", "%{WORD:first_word}", drop_field=True)
    return _finish(p.apply(ds))


def q_json_parse_props(sf_dir):
    from vector_ray.stages import JsonParser

    ds = _rp(sf_dir, "events", columns=["event_id", "props"])
    out = JsonParser("props").apply(ds)
    return _finish(out.select_columns(["event_id", "k"]))


def q_kv_roundtrip(sf_dir):
    from vector_ray.expr import F
    from vector_ray.stages import KeyValueParser
    from vector_ray.stages.base import ChainStep, FnStep

    ds = _rp(sf_dir, "events", columns=["event_id", "user_id", "event_type"])

    def build_msg(t: pa.Table) -> pa.Table:
        msg = F.render(t, "u={{user_id}} t={{event_type}}")
        return pa.table({"event_id": t["event_id"], "message": msg})

    parser = KeyValueParser("message", fields=["u", "t"], types={"u": "int"})
    return _finish(ChainStep([FnStep(build_msg), parser]).apply(ds))


def q_tokenize_docs(sf_dir):
    from vector_ray.ml.text import TokenCount

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = TokenCount("text").apply(ds)
    return _finish(out.select_columns(["doc_id", "n_words", "n_tokens_bpe"]))


def q_text_counts(sf_dir):
    from vector_ray.expr import F
    from vector_ray.ml.text import STOPWORDS

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    stop_re = r"(?i)\b(?:" + "|".join(STOPWORDS) + r")\b"

    def counts(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_punct": pc.count_substring_regex(t["text"], r"[\.,;:!\?]"),
                "n_stop": pc.count_substring_regex(t["text"], stop_re),
                "n_upper": pc.count_substring_regex(t["text"], r"[A-Z]"),
            }
        )

    return _finish(ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True))


def q_dedupe_docs(sf_dir):
    from vector_ray.stages import Dedupe

    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "source"])
    out = Dedupe(["lang", "source"], order_by="doc_id").apply(ds)
    return _finish(out.select_columns(["doc_id", "lang", "source"]))


def q_agg_source_stats(sf_dir):
    from vector_ray.stages import grouped_aggregate

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source", "lang", "n_chars"])
    out = grouped_aggregate(
        ds,
        ["source"],
        {
            "n_docs": ("count", "doc_id"),
            "chars_sum": ("sum", "n_chars"),
            "chars_max": ("max", "n_chars"),
            "langs": ("nunique", "lang"),
        },
    )
    return _finish(out)


def q_reduce_events(sf_dir):
    from vector_ray.stages import Reduce

    ds = _rp(sf_dir, "events", columns=["user_id", "value"])
    red = Reduce(["user_id"], merge_strategies={"value": "sum"}, count_col="n_rows")
    out = red.apply(ds)

    def final(t: pa.Table) -> pa.Table:
        # fixed-point cents: float sums are order-sensitive in the last
        # ulp; integers hash identically on both sides
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0), ndigits=0), pa.int64())
        return pa.table(
            {
                "user_id": t["user_id"],
                "value_sum_c": cents,
                "n_rows": t["n_rows"],
            }
        )

    return _finish(out.map_batches(final, batch_format="pyarrow"))


def q_q1_lineitem(sf_dir):
    from vector_ray.stages import grouped_aggregate

    ds = _rp(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def derive(t: pa.Table) -> pa.Table:
        return t.append_column(
            "disc_price", pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        )

    ds = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_aggregate(
        ds,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("sum", "l_quantity"),
            "sum_base_price": ("sum", "l_extendedprice"),
            "sum_disc_price": ("sum", "disc_price"),
            "avg_disc": ("mean", "l_discount"),
            "n": ("count", "l_quantity"),
        },
    )

    def final(t: pa.Table) -> pa.Table:
        for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
            cents = pc.cast(pc.round(pc.multiply(t[c], 100.0), ndigits=0), pa.int64())
            t = t.set_column(t.column_names.index(c), f"{c}_c", cents)
        micro = pc.cast(pc.round(pc.multiply(t["avg_disc"], 1e6), ndigits=0), pa.int64())
        t = t.set_column(t.column_names.index("avg_disc"), "avg_disc_u", micro)
        return t

    return _finish(agg.map_batches(final, batch_format="pyarrow"))


def q_enrich_customer(sf_dir):
    import pyarrow.parquet as pq

    from vector_ray.stages import Enrich, EnrichmentTable

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"])
    table = EnrichmentTable(nation, key=["n_nationkey"])
    ds = _rp(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"])
    out = Enrich(table, key_map={"n_nationkey": "c_nationkey"}, miss_col=None, concurrency=2).apply(ds)
    return _finish(out.select_columns(["c_custkey", "c_name", "n_name"]))


def q_enrich_supplier_region(sf_dir):
    import pyarrow.parquet as pq

    from vector_ray.stages import Enrich, EnrichmentTable

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    ds = _rp(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    e1 = Enrich(EnrichmentTable(nation, key=["n_nationkey"]), key_map={"n_nationkey": "s_nationkey"},
                miss_col=None, concurrency=2)
    e2 = Enrich(EnrichmentTable(region, key=["r_regionkey"]), key_map={"r_regionkey": "n_regionkey"},
                miss_col=None, concurrency=2)
    out = e2.apply(e1.apply(ds))
    return _finish(out.select_columns(["s_suppkey", "n_name", "r_name"]))


def q_simhash_pairs(sf_dir):
    """SimHash banded hamming near-dup pairs over documents + 50 planted
    exact duplicates (hamming 0) — pigeonhole over 4×16-bit chunks makes
    recall exact for hamming ≤ 3 (ml/dedup.simhash_dup_pairs)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from vector_ray.ml.dedup import simhash_dup_pairs

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    base = pa.table({"doc_id": pc.cast(t["doc_id"], pa.string()), "text": t["text"]})
    dup = pa.table({
        "doc_id": pa.array([f"shdup-{i:04d}" for i in range(50)]),
        "text": t["text"].slice(0, 50).combine_chunks(),
    })
    full = pa.concat_tables([base, dup])
    return simhash_dup_pairs(rd.from_arrow(full).repartition(4))


def q_config_syslog_metrics(sf_dir):
    """End-to-end CONFIG-FILE oracle (round-3 verdict item 10): load
    examples/syslog_metrics.yaml through the same registry the CLI
    uses, run the full generator → regex → linux_auth → kv →
    log_to_metric → aggregate graph, and emit the final metric series
    table (golden-oracle checked; generator is deterministic)."""
    import yaml as _yaml

    from vector_ray.pipelines.config import load_config

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "examples", "syslog_metrics.yaml")
    with open(path) as f:
        topo = load_config(_yaml.safe_load(f))
    ds = topo.node_dataset("agg")

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "name": t["name"],
            "metric_type": t["metric_type"],
            "host": t["host"],
            "status": t["status"],
            "value": pc.cast(t["value"], pa.float64()),
        })

    return _finish(ds.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True))


def q_stdlib_tail(sf_dir):
    """Round-3 stdlib leaf tail in one oracle: reverse_dns (static PTR
    table), parse_ruby_hash (round-trips props via '=>' rewrite),
    tag_types_externally, compact (null member injected then dropped),
    to_regex (invalid pattern → null)."""
    from vector_ray.expr import F

    ds = _rp(sf_dir, "events", columns=["event_id", "user_id", "event_type", "props"])

    def xform(t: pa.Table) -> pa.Table:
        n = len(t)
        uid = pc.cast(t["user_id"], pa.int64())
        is_local = pc.equal(F.mod(uid, 50), 0)
        ip = pc.if_else(
            is_local, pa.scalar("127.0.0.1"),
            pc.binary_join_element_wise(
                pa.array(["10.0.0."] * n), pc.cast(F.mod(uid, 256), pa.string()), ""),
        )
        ruby = pc.replace_substring(t["props"], '":', '" =>')
        with_null = pc.replace_substring(t["props"], '{"k"', '{"a": null, "k"')
        bad_rx = pc.equal(F.mod(uid, 7), 0)
        rx_src = pc.if_else(
            bad_rx,
            pc.binary_join_element_wise(t["event_type"], "(", ""),
            t["event_type"],
        )
        return pa.table({
            "event_id": t["event_id"],
            "host": F.reverse_dns(ip),
            "ruby_round": F.parse_ruby_hash(ruby),
            "tagged": F.tag_types_externally(t["props"]),
            "compacted": F.compact(with_null),
            "rx": F.to_regex(rx_src),
        })

    return _finish(ds.map_batches(xform, batch_format="pyarrow", zero_copy_batch=True))


def q_enrich_find_ranges(sf_dir):
    """Enrichment find-mode (0..N output rows per probe), exercising the
    two §2.5 conditions that were pytest-only: case-insensitive key
    compare (Case::Insensitive, lib/enrichment/src/lib.rs:30-33) and the
    BetweenDates-style range condition (lib.rs:18-27) — probe key is
    upper-case, table key lower-case, and each customer fans out to the
    acctbal bands of its (synthetic) region."""
    import numpy as np
    import pyarrow.parquet as pq

    from vector_ray.stages import Enrich, EnrichmentTable

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    lo = pc.subtract(pc.multiply(pc.cast(nation["n_nationkey"], pa.float64()), 400.0), 1000.0)
    small = pa.table({
        "band_key": pc.binary_join_element_wise(
            pa.array(["region_"] * len(nation)),
            pc.cast(nation["n_regionkey"], pa.string()), ""),
        "band_name": nation["n_name"],
        "lo_bal": lo,
        "hi_bal": pc.add(lo, 1999.99),
    })
    table = EnrichmentTable(small, key=["band_key"], case_insensitive=True)
    ds = _rp(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def probe_key(t: pa.Table) -> pa.Table:
        reg = np.asarray(t["c_nationkey"].to_numpy(zero_copy_only=False)) % 5
        keys = pa.array([f"REGION_{r}" for r in reg])  # case-flipped probe
        return t.append_column("probe_key", keys)

    ds = ds.map_batches(probe_key, batch_format="pyarrow", zero_copy_batch=True)
    out = Enrich(
        table, key_map={"band_key": "probe_key"}, mode="find", miss_col=None,
        between=("c_acctbal", "lo_bal", "hi_bal"), concurrency=2,
    ).apply(ds)
    return _finish(out.select_columns(["c_custkey", "c_acctbal", "band_name"]))


def q_window_events(sf_dir):
    from vector_ray.stages import grouped_aggregate

    ds = _rp(sf_dir, "events", columns=["event_type", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        hours = pc.divide(pc.cast(t["ts"], pa.int64()), 3_600_000_000)
        return pa.table({"event_type": t["event_type"], "hour": hours, "value": t["value"]})

    ds = ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_aggregate(
        ds, ["event_type", "hour"], {"n": ("count", "value"), "value_sum": ("sum", "value")}
    )

    def final(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value_sum"], 100.0), ndigits=0), pa.int64())
        return t.set_column(t.column_names.index("value_sum"), "value_sum_c", cents)

    return _finish(agg.map_batches(final, batch_format="pyarrow"))


def q_cardinality_limit(sf_dir):
    from vector_ray.stages import TagCardinalityLimit

    ds = _rp(sf_dir, "events", columns=["event_id", "user_id"])
    out = TagCardinalityLimit(["user_id"], value_limit=5, action="drop_event").apply(ds)
    return _finish(out.select_columns(["event_id", "user_id"]))


def q_exact_dedup_docs(sf_dir):
    from vector_ray.ml.dedup import exact_dedup

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = exact_dedup(ds, "text", id_col="doc_id")
    return _finish(out.select_columns(["doc_id"]))


def q_knn_embeddings(sf_dir):
    import pyarrow.parquet as pq

    from vector_ray.ml.ann import knn_brute

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    qrows = emb.filter(pc.less(emb["vec_id"], 3)).sort_by("vec_id")
    queries = np.array(qrows["embedding"].to_pylist(), dtype=np.float64)
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = knn_brute(ds, queries, k=10)
    return _finish(out.select_columns(["query_idx", "vec_id", "rank"]))


def q_dd_search_events(sf_dir):
    """datadog_search condition syntax (src/conditions/datadog_search.rs
    → vector_ray/expr/datadog_search.py): facets, numeric range,
    negation, boolean precedence (implicit AND binds tighter than OR)."""
    from vector_ray.expr.datadog_search import parse_datadog_search
    from vector_ray.stages import Filter

    cond = parse_datadog_search("event_type:error OR (value:[150 TO 250] -event_type:purchase)")
    ds = _rp(sf_dir, "events", columns=["event_id", "event_type", "value"])
    return _finish(Filter(cond).apply(ds).select_columns(["event_id"]))


def q_dd_search_docs(sf_dir):
    """datadog_search full-text terms on a default field + facet mix."""
    from vector_ray.expr.datadog_search import parse_datadog_search
    from vector_ray.stages import Filter

    cond = parse_datadog_search("lang:en merge OR (lang:de -source:src0)",
                                default_field="text")
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    return _finish(Filter(cond).apply(ds).select_columns(["doc_id"]))


def q_syslog_lines(sf_dir):
    """Raw-line ingestion path end-to-end (sources/lines.py): render
    syslog-style lines from events into text files (the Vector
    'file source → syslog lines' topology), re-read them with newline
    framing via ray.data.read_text, parse with
    parse_linux_authorization + KV message fields, aggregate counts per
    (hostname, status). Oracle re-derives the aggregate from the events
    columns directly."""
    import glob as _g
    import hashlib

    from vector_ray.expr import F
    from vector_ray.sources.lines import read_lines
    from vector_ray.stages import grouped_aggregate

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out_dir = f"/tmp/vr_syslog_{tag}"

    def render(t: pa.Table) -> pa.Table:
        n = len(t)
        line = pc.binary_join_element_wise(
            F.const(n, "Feb  5 10:15:57 host-"),
            pc.cast(F.mod(t["user_id"], 20), pa.string()),
            F.const(n, " app["),
            pc.cast(F.mod(t["event_id"], 1000), pa.string()),
            F.const(n, "]: status="),
            pc.cast(t["event_type"], pa.string()),
            F.const(n, " value="),
            pc.cast(pc.cast(pc.floor(pc.fill_null(t["value"], 0.0)), pa.int64()), pa.string()),
            "",
        )
        return pa.table({"line": line})

    if not _g.glob(os.path.join(out_dir, "*.txt")):
        import ray.data as rd

        src = _rp(sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"])
        lines = src.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
        tbl = pa.concat_tables(
            [pa.table(b) for b in lines.iter_batches(batch_format="pyarrow", batch_size=None)]
        )
        os.makedirs(out_dir, exist_ok=True)
        text = "\n".join(tbl["line"].to_pylist())
        chunks = text.split("\n")
        per = max(1, len(chunks) // 4)
        for i in range(4):
            part = chunks[i * per : (i + 1) * per if i < 3 else len(chunks)]
            with open(os.path.join(out_dir, f"part-{i}.txt"), "w") as f:
                f.write("\n".join(part) + ("\n" if part else ""))

    ds = read_lines(sorted(_g.glob(os.path.join(out_dir, "*.txt"))))

    def parse(t: pa.Table) -> pa.Table:
        parsed = F.parse_linux_authorization(t["line"])
        parsed = parsed.combine_chunks() if isinstance(parsed, pa.ChunkedArray) else parsed
        msg = pc.struct_field(parsed, "message")
        status = pc.struct_field(pc.extract_regex(msg, r"status=(?P<s>\S+)"), "s")
        return pa.table({
            "hostname": pc.struct_field(parsed, "hostname"),
            "status": status,
        })

    parsed = ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)
    return _finish(grouped_aggregate(parsed, ["hostname", "status"], {"n": ("count", "status")}))


def q_apache_log_parse(sf_dir):
    """parse_apache_log (combined) round trip: render CLF+combined lines
    from events columns, parse them back with the kernel regex, emit
    typed fields. Oracle derives the same fields directly from the
    source columns — so the parse must exactly invert the render
    (lib/vrl/stdlib/src/parse_apache_log.rs)."""
    from vector_ray.expr import F

    ds = _rp(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"])

    def build_and_parse(t: pa.Table) -> pa.Table:
        n = len(t)
        host = pc.binary_join_element_wise(
            F.const(n, "10.0."),
            pc.cast(F.mod(t["user_id"], 256), pa.string()),
            F.const(n, "."),
            pc.cast(F.mod(t["event_id"], 256), pa.string()),
            "",
        )
        user = pc.binary_join_element_wise(
            F.const(n, "u"), pc.cast(t["user_id"], pa.string()), "")
        ts_us = pc.cast(pc.cast(t["ts"], pa.int64()), pa.string())
        path = pc.binary_join_element_wise(
            F.const(n, "/api/"), pc.cast(t["event_type"], pa.string()), "")
        status = pc.if_else(pc.greater(t["value"], 200.0), F.const(n, "500"), F.const(n, "200"))
        size = pc.cast(pc.cast(pc.floor(pc.multiply(pc.fill_null(t["value"], 0.0), 10.0)),
                               pa.int64()), pa.string())
        agent = pc.binary_join_element_wise(
            F.const(n, "curl/8."), pc.cast(F.mod(t["event_id"], 10), pa.string()), "")
        line = pc.binary_join_element_wise(
            host, F.const(n, "-"), user,
            pc.binary_join_element_wise(F.const(n, "["), ts_us, F.const(n, "]"), ""),
            pc.binary_join_element_wise(
                F.const(n, '"GET '), path, F.const(n, ' HTTP/1.1"'), ""),
            status, size,
            F.const(n, '"-"'),
            pc.binary_join_element_wise(F.const(n, '"'), agent, F.const(n, '"'), ""),
            " ",
        )
        parsed = F.parse_apache_log(line)
        parsed = parsed.combine_chunks() if isinstance(parsed, pa.ChunkedArray) else parsed
        return pa.table({
            "event_id": t["event_id"],
            "host": pc.struct_field(parsed, "host"),
            "user": pc.struct_field(parsed, "user"),
            "path": pc.struct_field(parsed, "path"),
            "status": pc.cast(pc.struct_field(parsed, "status"), pa.int64()),
            "size": pc.cast(pc.struct_field(parsed, "size"), pa.int64()),
            "agent": pc.struct_field(parsed, "agent"),
        })

    return _finish(ds.map_batches(build_and_parse, batch_format="pyarrow", zero_copy_batch=True))


def q_glog_parse(sf_dir):
    """parse_glog round trip over rendered glog lines
    (lib/vrl/stdlib/src/parse_glog.rs): level char from value, thread =
    user_id, file:line from event ids, free-text message."""
    from vector_ray.expr import F

    ds = _rp(sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"])

    def build_and_parse(t: pa.Table) -> pa.Table:
        n = len(t)
        level = pc.if_else(pc.greater(t["value"], 200.0), F.const(n, "E"),
                           pc.if_else(pc.greater(t["value"], 100.0), F.const(n, "W"),
                                      F.const(n, "I")))
        lineno = pc.cast(F.mod(t["event_id"], 1000), pa.string())
        line = pc.binary_join_element_wise(
            level, F.const(n, "0813 12:00:01.123456 "),
            pc.cast(t["user_id"], pa.string()), F.const(n, " main.cc:"),
            lineno, F.const(n, "] evt "), pc.cast(t["event_type"], pa.string()),
            "",
        )
        parsed = F.parse_glog(line)
        parsed = parsed.combine_chunks() if isinstance(parsed, pa.ChunkedArray) else parsed
        return pa.table({
            "event_id": t["event_id"],
            "level": pc.struct_field(parsed, "level"),
            "thread": pc.cast(pc.struct_field(parsed, "thread"), pa.int64()),
            "file": pc.struct_field(parsed, "file"),
            "line": pc.cast(pc.struct_field(parsed, "line"), pa.int64()),
            "message": pc.struct_field(parsed, "message"),
        })

    return _finish(ds.map_batches(build_and_parse, batch_format="pyarrow", zero_copy_batch=True))


_UA_POOL = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Safari/605.1.15",
    "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Mobile/15E148 Safari/604.1",
    "Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.43 Mobile Safari/537.36",
    "curl/8.4.0",
    "weird-client/1.0",
]

# hand-derived expected families per pool index (the oracle CASE table)
_UA_EXPECT = [
    ("Chrome", "120.0.0.0", "Windows", "Other"),
    ("Edge", "120.0.2210.91", "Windows", "Other"),
    ("Safari", "17.1", "macOS", "Other"),
    ("Firefox", "121.0", "Linux", "Other"),
    ("Safari", "17.1", "iOS", "Mobile"),
    ("Chrome", "120.0.6099.43", "Android", "Mobile"),
    ("curl", "8.4.0", "Other", "Other"),
    ("Other", None, "Other", "Other"),
]


def q_user_agent_parse(sf_dir):
    """parse_user_agent over a deterministic UA pool indexed by
    user_id % 8 (lib/vrl/stdlib/src/parse_user_agent.rs, simplified
    family table — see kernels.parse_user_agent)."""
    from vector_ray.expr import F

    ds = _rp(sf_dir, "events", columns=["event_id", "user_id"])
    pool = pa.array(_UA_POOL, pa.string())

    def pick_and_parse(t: pa.Table) -> pa.Table:
        idx = pc.cast(F.mod(t["user_id"], 8), pa.int64())
        ua = pool.take(idx.combine_chunks() if isinstance(idx, pa.ChunkedArray) else idx)
        parsed = F.parse_user_agent(ua)
        return pa.table({
            "event_id": t["event_id"],
            "browser_family": pc.struct_field(parsed, "browser_family"),
            "browser_version": pc.struct_field(parsed, "browser_version"),
            "os_family": pc.struct_field(parsed, "os_family"),
            "device": pc.struct_field(parsed, "device"),
        })

    return _finish(ds.map_batches(pick_and_parse, batch_format="pyarrow", zero_copy_batch=True))


def q_sample_events(sf_dir):
    from vector_ray.expr import F
    from vector_ray.stages import Sample
    from vector_ray.stages.base import ChainStep, FnStep

    ds = _rp(sf_dir, "events", columns=["event_id", "event_type"])

    def key(t: pa.Table) -> pa.Table:
        return t.append_column("key", pc.cast(t["event_id"], pa.string()))

    return _finish(ChainStep([FnStep(key), Sample(5, "key")]).apply(ds).select_columns(["event_id"]))


def q_minhash_pairs(sf_dir):
    from vector_ray.ml.dedup import minhash_lsh_dedup

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_lsh_dedup(ds, "text", id_col="doc_id", jaccard_threshold=0.7, return_pairs=True)


def q_simhash_docs(sf_dir):
    from vector_ray.ml.dedup import SimHash

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(SimHash("text"), batch_format="pyarrow", zero_copy_batch=True, concurrency=2)

    def final(t: pa.Table) -> pa.Table:
        signed = np.asarray(t["simhash"].combine_chunks()).view(np.int64)
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(signed, pa.int64())})

    return out.map_batches(final, batch_format="pyarrow")


def q_minhash_index(sf_dir):
    """Incremental near-dup (ml/dedup.minhash_index_build/probe): the
    old half of the corpus is persisted as an LSH index (band buckets +
    signatures, never payloads); the new half probes it — candidates
    via one (band, band_hash, id) exchange against the index buckets,
    verify from stored signatures. Oracle: the cross-split subset of
    the independent golden LSH pair list."""
    import tempfile

    from vector_ray.ml.dedup import minhash_index_build, minhash_index_probe

    def half(lo: bool):
        def f(t: pa.Table) -> pa.Table:
            m = pc.less(t["doc_id"], 250)
            return t.filter(m if lo else pc.invert(m))

        return _rp(sf_dir, "documents", columns=["doc_id", "text"]) \
            .map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    old, new = half(True), half(False)
    idx = tempfile.mkdtemp(prefix="vr_mhidx_")
    minhash_index_build(old, idx)
    return _finish(minhash_index_probe(new, idx))


def q_inverted_search(sf_dir):
    """Persisted inverted-index BM25 (ml/search_index.py): postings
    hive-partitioned by fnv1a(term) % buckets, search reads ONLY the
    probed term buckets (pruning asserted in-query), df from the probed
    postings, fixed-term-order float64 scoring inside a doc_id-bucketed
    shuffle. Oracle: independent candidates-only BM25 golden."""
    import tempfile

    from vector_ray.ml.search_index import (inverted_index_build,
                                            inverted_index_search)

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    idx = tempfile.mkdtemp(prefix="vr_invidx_")
    inverted_index_build(ds, idx)
    out, stats = inverted_index_search(idx, "index data stream block",
                                       k=20)
    if not stats["files_read"] < stats["files_total"]:
        raise AssertionError(f"no partition pruning: {stats}")
    return out


def q_file_sink_roundtrip(sf_dir):
    """Templated FileSink end-to-end (sinks/FileSink: {{ lang }} path
    template, ndjson codec, gzip): write the documents table one
    directory per language, then decode every part file back and
    return the rows — the oracle is the identity SELECT, so a lost /
    duplicated / mis-routed row breaks the hash. A fresh temp dir per
    call keeps reruns independent (part files are append-only)."""
    import gzip
    import json
    import tempfile

    from vector_ray.sinks import FileSink

    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    root = tempfile.mkdtemp(prefix="vr_sink_")
    sink = FileSink(os.path.join(root, "{{ lang }}"), codec="ndjson",
                    compression="gzip")
    manifest = sink.write(ds)
    rows = {"doc_id": [], "lang": [], "text": []}
    for path, _n in sorted(manifest):
        lang_dir = os.path.basename(os.path.dirname(path))
        with gzip.open(path, "rt") as fh:
            for line in fh:
                r = json.loads(line)
                rows["doc_id"].append(r["doc_id"])
                rows["lang"].append(r["lang"])
                rows["text"].append(r["text"])
                if r["lang"] != lang_dir:
                    raise AssertionError(
                        f"row routed to wrong template dir: "
                        f"{r['lang']} in {lang_dir}")
    return pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "lang": pa.array(rows["lang"], pa.string()),
        "text": pa.array(rows["text"], pa.string()),
    })


def q_resumable_pipeline(sf_dir):
    """Generic resumable runner (state/resumable.run_resumable): a
    filter+project pipeline over the documents fragment with manifest
    lineage, run TWICE into the same directory — the second run must
    skip every partition (asserted; a driver error surfaces as a red
    row) and the returned rows come from the durable per-partition
    parquet, so a skip/dup/loss in the resume path breaks the hash."""
    import glob
    import tempfile

    import ray.data as rd

    from vector_ray.state.resumable import run_resumable

    src = os.path.join(sf_dir, "documents.parquet")
    root = tempfile.mkdtemp(prefix="vr_resume_")

    def pipeline(ds):
        def f(t: pa.Table) -> pa.Table:
            keep = pc.equal(t["lang"], "en")
            return t.filter(keep).select(["doc_id", "source"])

        return ds.map_batches(f, batch_format="pyarrow",
                              zero_copy_batch=True)

    first = run_resumable([src], root, pipeline)
    second = run_resumable([src], root, pipeline)
    if second["skipped"] != second["partitions"]:
        raise AssertionError(
            f"resume failed to skip: {second}")
    files = sorted(glob.glob(os.path.join(root, "parts", "*", "*.parquet")))
    return _finish(rd.read_parquet(files))


def q_entropy_docs(sf_dir):
    """Byte-entropy quality signal (ml/text.ByteEntropy): integer
    micro-nat Shannon entropy of each doc's UTF-8 byte histogram — one
    bincount per batch, no per-row Python, bit-identical under any
    partitioning. Oracle: independent Counter-based golden rendered as
    VALUES."""
    from vector_ray.ml.text import ByteEntropy

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(ByteEntropy().transform, batch_format="pyarrow",
                         zero_copy_batch=True)
    return _finish(out.select_columns(["doc_id", "n_bytes", "ent_micro"]))


def q_theta_join(sf_dir):
    """Non-equi (theta) join (stages/join.broadcast_cross_join): every
    order paired with every region whose price floor it clears — the
    banding-rule shape no hash join expresses. Right side broadcast
    once; left batches chunked so the materialized product stays
    bounded. Oracle: plain SQL cross join + inequality."""
    import pyarrow.parquet as pq

    from vector_ray.stages.join import broadcast_cross_join

    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"),
                           columns=["r_regionkey"])

    def pred(t: pa.Table):
        thr = pc.multiply(pc.add(pc.cast(t["r_regionkey"], pa.float64()),
                                 1.0), 50_000.0)
        return pc.greater(t["o_totalprice"], thr)

    out = broadcast_cross_join(orders, region, predicate=pred)

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "r_regionkey": pc.cast(t["r_regionkey"], pa.int64()),
        })

    return _finish(out.map_batches(final, batch_format="pyarrow"))


def q_rolling_range(sf_dir):
    """Time-based trailing windows (stages/shift.py
    rolling_count_range / rolling_sum_range): per-user count and
    integer sum over the last hour of events — SQL RANGE frames with
    the ANSI later-peers rule, computed with ONE searchsorted over
    int64-banded per-run order values per bucket (no per-key Python).
    Oracle: ANSI RANGE BETWEEN INTERVAL 1 HOUR PRECEDING."""
    from vector_ray.stages.shift import partitioned_shift

    ds = _rp(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        eid = t["event_id"].combine_chunks()
        w = np.asarray(eid.to_numpy(zero_copy_only=False)) % 100
        return pa.table({
            "event_id": eid,
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "w": pa.array(w, pa.int64()),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
    out = partitioned_shift(prepped, ["user_id"], ["ts_us"], {
        "cnt1h": ("rolling_count_range", None, 3_600_000_000),
        "sum1h": ("rolling_sum_range", "w", 3_600_000_000),
    })
    return _finish(out.select_columns(["event_id", "cnt1h", "sum1h"]))


def q_connected_components(sf_dir):
    """Distributed hash-min connected components (ml/components.py) on
    a deterministic chain graph over doc_ids: chain edges (i, i+1)
    inside 7-wide groups plus merge edges joining group g to g+1 when
    g % 3 == 0 — 14-node-diameter paths, the worst case for label
    propagation (clique-ish LSH clusters converge in 2-3 rounds; this
    needs the full O(diameter) schedule). The closed-form component
    minimum makes the oracle plain SQL arithmetic."""
    from vector_ray.ml.components import connected_components

    docs = _rp(sf_dir, "documents", columns=["doc_id"])

    def make_edges(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
        hi = 499  # doc_ids are dense 0..499 at every sf
        chain = ids[(ids % 7 != 6) & (ids + 1 <= hi)]
        g = ids[(ids % 7 == 0) & ((ids // 7) % 3 == 0) & (ids + 7 <= hi)]
        return pa.table({
            "a": pa.array(np.concatenate([chain, g]), pa.int64()),
            "b": pa.array(np.concatenate([chain + 1, g + 7]), pa.int64()),
        })

    edges = docs.map_batches(make_edges, batch_format="pyarrow",
                             zero_copy_batch=True)
    out = connected_components(edges, a_col="a", b_col="b")
    return _finish(out)


def q_asof_tolerance(sf_dir):
    """As-of join with a match-window tolerance (stages/join.asof_join
    tolerance=): the latest purchase at most 3 days before each event;
    older matches fall back to null exactly like pandas merge_asof.
    Oracle: ASOF LEFT JOIN + CASE window filter."""
    import pandas as pd

    from vector_ray.stages.join import asof_join

    ev = _rp(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    purchases = _rp(sf_dir, "events",
                    columns=["user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        p = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({"user_id": p["user_id"], "ts": p["ts"],
                         "pts": p["ts"]})

    purchases = purchases.map_batches(prep, batch_format="pyarrow",
                                      zero_copy_batch=True)
    out = asof_join(ev, purchases, by=["user_id"], on="ts", buckets=8,
                    tolerance=pd.Timedelta(days=3))

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "last_purchase_us": pc.cast(
                pc.cast(t["pts"], pa.int64()), pa.float64()),
        })

    return out.map_batches(final, batch_format="pyarrow")


def q_audit_docs(sf_dir):
    """Data-quality audit (stages/expect.audit): five rule kinds in one
    counting pass + an exact distinct-values pass for `unique`
    (violations = rows - distinct). Oracle: UNION ALL of SQL FILTER
    aggregates mirroring each rule."""
    from vector_ray.stages.expect import audit

    ds = _rp(sf_dir, "documents")
    return audit(ds, [
        ("chars_range", "range", "n_chars", 50, 500),
        ("lang_not_null", "not_null", "lang"),
        ("lang_set", "in_set", "lang", ["en", "de", "fr"]),
        ("source_regex", "regex", "source", r"^src1"),
        ("source_unique", "unique", "source"),
    ])


def q_apply_changeset(sf_dir):
    """MERGE INTO (stages/diff.apply_changeset): deletes, upserts and
    inserts applied to the documents snapshot; only the changeset's id
    column touches the base (broadcast anti-join, payload never
    shuffles). The changeset is derived deterministically from the
    table itself so the oracle can rebuild it in plain SQL."""
    from vector_ray.stages.diff import apply_changeset

    base = _rp(sf_dir, "documents")

    def make_changes(t: pa.Table) -> pa.Table:
        # Literal arrays MUST be explicitly typed: a zero-match block
        # would otherwise produce null-typed columns, giving blocks
        # with divergent schemas (the r3 driver failure mode).
        mod = pc.cast(np_mod(t["doc_id"], 10), pa.int64())
        dels = t.filter(pc.equal(mod, 0))
        dels = dels.append_column(
            "op", pa.array(["D"] * len(dels), pa.string()))
        ups = t.filter(pc.equal(mod, 1))
        ups = ups.set_column(
            ups.column_names.index("source"), "source",
            pa.array(["patched"] * len(ups), pa.string()))
        ups = ups.set_column(
            ups.column_names.index("n_chars"), "n_chars",
            pc.add(ups["n_chars"], 1000))
        ups = ups.append_column(
            "op", pa.array(["U"] * len(ups), pa.string()))
        ins = t.filter(pc.equal(mod, 2))
        ins = ins.set_column(
            ins.column_names.index("doc_id"), "doc_id",
            pc.add(ins["doc_id"], 1_000_000))
        ins = ins.set_column(
            ins.column_names.index("source"), "source",
            pa.array(["inserted"] * len(ins), pa.string()))
        ins = ins.append_column(
            "op", pa.array(["I"] * len(ins), pa.string()))
        return pa.concat_tables([dels, ups, ins])

    changes = _rp(sf_dir, "documents").map_batches(
        make_changes, batch_format="pyarrow", zero_copy_batch=True)
    out = apply_changeset(base, changes, id_col="doc_id")
    return _finish(out)


def np_mod(col, m: int) -> pa.Array:
    """pyarrow 16 has no pc.mod — modulo via numpy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    v = np.asarray(col.to_numpy(zero_copy_only=False))
    return pa.array(v % m)


def q_approx_quantiles(sf_dir):
    """Per-key sample quantiles (stages/quantile.
    grouped_approx_quantiles): deterministic per-key bottom-k
    id-hash sample + nearest-rank — the unbounded-key-cardinality
    scale path grouped_exact_quantiles' max_keys bound points to.
    k=64 < the per-type row count at sf0.01, so the sampling path is
    genuinely exercised. Oracle: independent single-threaded mirror
    (tools/golden.py grouped_approx_quantiles_sql)."""
    from vector_ray.stages.quantile import grouped_approx_quantiles

    ds = _rp(sf_dir, "events",
             columns=["event_id", "event_type", "value"])
    out = grouped_approx_quantiles(
        ds, "event_type", "value", [0.5, 0.9, 0.99],
        id_col="event_id", k=64, seed=7)
    return _finish(out)


def q_diverse_select(sf_dir):
    """Farthest-point-first diversity selection (ml/select.
    diverse_select): bounded salted-hash candidate sample, driver-side
    k-center greedy, ids+ranks only in the output (hash-stability
    convention). Oracle: independent single-threaded mirror
    (tools/golden.py diverse_select_sql)."""
    from vector_ray.ml.select import diverse_select

    ds = _rp(sf_dir, "embeddings",
             columns=["vec_id", "embedding"]).repartition(6)
    return diverse_select(ds, 32, candidates=256, seed=3)


def q_fuzzy_join(sf_dir):
    """Blocked edit-distance self join (stages/fuzzy.fuzzy_join):
    PassJoin segment-pigeonhole candidates (exact recall), vectorized
    banded-Levenshtein verify per hash bucket, cross-bucket pair
    dedupe. Oracle: plain SQL via DuckDB's levenshtein()."""
    from vector_ray.stages.fuzzy import fuzzy_join

    ds = _rp(sf_dir, "supplier",
             columns=["s_suppkey", "s_name"]).repartition(4)
    return _finish(fuzzy_join(ds, on="s_name", id_col="s_suppkey",
                              max_dist=1))


def q_grouped_mad_outliers(sf_dir):
    """Per-key robust trim (stages/quantile.
    grouped_mad_outlier_filter): two grouped exact-quantile passes
    (per-key median, per-key MAD) + one broadcast map-only probe.
    Oracle: plain SQL with quantile_disc, op-for-op threshold
    arithmetic."""
    from vector_ray.stages.quantile import grouped_mad_outlier_filter

    ds = _rp(sf_dir, "events",
             columns=["event_id", "event_type", "value"])
    return _finish(grouped_mad_outlier_filter(ds, "event_type",
                                              "value", k=1.5))


def q_resolve_entities(sf_dir):
    """Entity resolution (stages/fuzzy.resolve_entities): exact
    blocked fuzzy self-join -> hash-min connected components ->
    bucketed left join to a canonical (min) id per cluster. Oracle:
    independent brute-force Levenshtein + union-find mirror
    (tools/golden.py resolve_entities_sql)."""
    from vector_ray.stages.fuzzy import resolve_entities

    ds = _rp(sf_dir, "supplier",
             columns=["s_suppkey", "s_name"]).repartition(4)
    return _finish(resolve_entities(ds, on="s_name",
                                    id_col="s_suppkey", max_dist=1))


def q_grouped_heavy_hitters(sf_dir):
    """Per-key heavy hitters (ml/corpus.grouped_heavy_hitters): keyed
    count partials, per-key Misra-Gries compression, one bucketed
    sum+topk pass. capacity >> per-lang vocab at sf0.01 => exact;
    oracle: GROUP BY + row_number() SQL."""
    from vector_ray.ml.corpus import grouped_heavy_hitters

    ds = _rp(sf_dir, "documents",
             columns=["lang", "text"]).repartition(4)
    return _finish(grouped_heavy_hitters(ds, "lang", col="text", k=5,
                                         capacity=200_000))


def q_vrl_remap_events(sf_dir):
    """A VRL program STRING compiled and run verbatim
    (expr/vrl.compile_vrl -> one vectorized batch fn; reference
    parity with remap's `source = '...'` config shape,
    src/transforms/remap.rs). Oracle: plain SQL."""
    from vector_ray.expr.vrl import compile_vrl

    fn = compile_vrl(
        """
        .sev = upcase(.event_type)
        .score = .value * 2.0 + 1.0
        if .value > 75.0 { .band = "high" }
        else if .value > 25.0 { .band = "mid" }
        else { .band = "low" }
        del(.props)
        """
    )
    ds = _rp(sf_dir, "events",
             columns=["event_id", "event_type", "value", "props"])
    return _finish(ds.map_batches(fn, batch_format="pyarrow",
                                  zero_copy_batch=True))


def q_zorder_events(sf_dir):
    """Z-order clustering key (stages/zorder.zorder_sort): exact
    global min/max pass, fixed-point quantization, Morton bit
    interleave — one distributed sort on the uint64 key clusters the
    write for multi-column min/max pruning. Oracle: independent
    bit-by-bit single-threaded mirror (tools/golden.py
    zorder_events_sql)."""
    from vector_ray.stages.zorder import zorder_sort

    ds = _rp(sf_dir, "events",
             columns=["event_id", "user_id", "value"]).repartition(6)
    out = zorder_sort(ds, ["user_id", "value"], bits=16, keep_key=True)

    def to_i64(t):
        return t.set_column(t.schema.get_field_index("zkey"), "zkey",
                            pc.cast(t["zkey"], pa.int64()))

    return _finish(out.select_columns(["event_id", "zkey"]).map_batches(
        to_i64, batch_format="pyarrow", zero_copy_batch=True))


def q_knn_graph(sf_dir):
    """k-NN graph (ml/ann.knn_graph): every vector is both query and
    member; IVF scatter (member once + query replica per probed
    centroid), per-cluster chunked float64 matmul, bucketed global
    top-k merge. Probing ALL clusters makes the graph exact, so the
    oracle is the brute-force cross-join QUALIFY shape (rank + tie
    columns only — float cosine never enters the hash)."""
    from vector_ray.ml.ann import knn_graph

    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = knn_graph(ds, k=5, n_clusters=6, n_probe=None)
    return _finish(out.select_columns(["src", "dst", "rank"]))


def q_retention_cohorts(sf_dir):
    """Cohort retention (stages/funnel.py retention_cohorts): integer
    epoch-µs period indices, one key-bucket shuffle, per-bucket distinct
    (user, offset) pre-aggregation — second exchange bounded by
    cohorts×offsets. Oracle: MIN-over-user + DISTINCT-period SQL with
    the same integer floor-division."""
    from vector_ray.stages.funnel import retention_cohorts

    ds = _rp(sf_dir, "events", columns=["user_id", "ts"])
    return _finish(retention_cohorts(ds, period_s=604_800))


def q_funnel_events(sf_dir):
    """Ordered-sequence funnel (stages/funnel.py): first view → first
    later click → first later purchase per user; only (key, ts, stage)
    triples shuffle. Oracle: chained MIN-after-threshold ANSI joins."""
    from vector_ray.stages.funnel import funnel

    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_type"])
    return _finish(funnel(ds, ["view", "click", "purchase"]))


def q_pq_search(sf_dir):
    """Product-quantization ANN (ml/pq.py — Jégou et al. 2011): 8
    subspace codebooks fit on the deterministic hash sample, map-only
    uint8 encoding (32× compression), broadcast ADC lookup tables,
    per-block top-k. Oracle: independent single-threaded PQ mirror."""
    import pyarrow.parquet as pq

    from vector_ray.ml.pq import pq_search, pq_train

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    qrows = emb.filter(pc.less(emb["vec_id"], 3)).sort_by("vec_id")
    queries = np.array(qrows["embedding"].to_pylist(), dtype=np.float64)
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    model = pq_train(ds, m=8, ncent=16, sample_size=1024)
    return pq_search(ds, model, queries, k=10)


def q_hist_quantiles(sf_dir):
    """The telemetry "p99 per service" staple: approx per-key quantiles
    from the MERGEABLE fixed-bucket histogram sketch
    (stages/sketch.py Histogram.quantile — upper-bound rule, the
    mergeable stand-in for the reference's non-mergeable
    AggregatedSummary, metric.rs:165-169). One two-phase grouped
    aggregate; the sketch is O(bins) per key. Oracle: the identical
    cumulative-count bin-selection rule in plain SQL."""
    import json

    from vector_ray.stages import grouped_aggregate

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    merged = grouped_aggregate(
        ds, ["event_type"],
        {"h": ("histogram", "value", [50.0, 100.0, 250.0])})

    def fin(t: pa.Table) -> pa.Table:
        cols = {"n": [], "p50": [], "p90": [], "p99": []}
        for js in t["h"].to_pylist():
            d = json.loads(js)
            cols["n"].append(d["count"])
            for p in ("p50", "p90", "p99"):
                cols[p].append(d[p])
        return pa.table({
            "event_type": t["event_type"],
            "n": pa.array(cols["n"], pa.int64()),
            "p50": pa.array(cols["p50"], pa.float64()),
            "p90": pa.array(cols["p90"], pa.float64()),
            "p99": pa.array(cols["p99"], pa.float64()),
        })

    return merged.map_batches(fin, batch_format="pyarrow",
                              zero_copy_batch=True)


def q_bm25_search(sf_dir):
    """Okapi BM25 top-k retrieval (ml/corpus.py bm25_search): one
    fixed-size integer stats pass (no vocabulary broadcast — only the
    query terms' df matter), one map-only scoring pass, per-block local
    top-k. Oracle: independent single-threaded BM25 golden."""
    from vector_ray.ml.corpus import bm25_search

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return bm25_search(ds, "table scan fast merge", k=20)


def q_pca_embeddings(sf_dir):
    """Distributed PCA over the embedding column (ml/embed.py): exact
    integer second moments (2^20 quantization, big-int sum tree),
    driver eigh with sign canonicalization, fixed-order map-only
    projection — deterministic on any partitioning. Oracle:
    independent single-threaded mirror (tools/golden.py)."""
    from vector_ray.ml.embed import pca_fit, pca_project

    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    model = pca_fit(ds, k=8)
    out = pca_project(ds, model)
    return _finish(out.drop_columns(["embedding"]))


def q_nb_classify(sf_dir):
    """Multinomial Naive Bayes domain classifier (ml/classify.py): train
    on the doc_id%5!=0 split (label = lang, counting-only → exactly
    mergeable), score ALL docs map-only with integer micro-nat
    class scores. Oracle: independent single-threaded NB
    (tools/golden.py nb_classify_sql)."""
    from vector_ray.ml.classify import nb_score, nb_train

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    def _train_split(t):
        import numpy as np
        return t.filter(pa.array(
            (t["doc_id"].to_numpy(zero_copy_only=False) % 5) != 0))

    train = ds.map_batches(_train_split, batch_format="pyarrow",
                           zero_copy_batch=True)
    model = nb_train(train, text_col="text", label_col="lang")
    out = nb_score(ds, model, text_col="text")
    return _finish(out.drop_columns(["text", "lang"]))


def q_normalize_text(sf_dir):
    """Canonical text normalization (ml/text.py NormalizeText): NFC +
    lowercase + whitespace-collapse + trim, all pyarrow.compute string
    kernels, stateless map-only. Oracle: the same composition in
    DuckDB (nfc_normalize/lower/regexp_replace/trim)."""
    from vector_ray.ml.text import NormalizeText

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = NormalizeText("text", "norm").apply(ds)
    return _finish(out.select_columns(["doc_id", "norm"]))


def q_mad_outliers(sf_dir):
    """Robust MAD outlier trim (stages/quantile.py mad_outlier_filter):
    |x - median| <= 3·MAD band on o_totalprice via two shuffle-free
    exact-quantile passes + a map-only filter. Oracle: quantile_disc
    scalar subqueries with the identical float64 band arithmetic."""
    from vector_ray.stages.quantile import mad_outlier_filter

    ds = _rp(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = mad_outlier_filter(ds, "o_totalprice", k=3.0)
    return _finish(out)


def q_dsir_select(sf_dir):
    """DSIR importance resampling (ml/dsir.py — Xie et al. 2023):
    hashed unigram+bigram bucket distributions fit on target (lang='de'
    documents, driver-side) and raw (distributed dense partials, the
    cms.py plan), per-doc log importance weights via one broadcast +
    weighted bincount, Gumbel top-k resample (deterministic noise keyed
    by doc_id). Oracle: independent single-threaded golden
    (tools/golden.py dsir_select_sql)."""
    import pyarrow.parquet as pq

    from vector_ray.ml.dsir import dsir_select

    tgt = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["text", "lang"])
    target_texts = tgt.filter(
        pc.equal(tgt["lang"], "de"))["text"].to_pylist()
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = dsir_select(ds, target_texts, 60, buckets=1 << 13,
                      hash_seed=1, sample_seed=0)
    return _finish(out.select_columns(["doc_id", "dsir_logw"]))


def q_embedding_dup_pairs(sf_dir):
    """Embedding near-dup with PLANTED duplicates: copies of vec_id<25
    re-appended as vec_id+10000, so the result must be exactly those 25
    pairs (the base table's max off-diagonal cosine is ~0.51) — the
    oracle recomputes every pairwise cosine in SQL and 0 rows fails.
    Copies share all LSH sign bits by construction, so bucketing cannot
    miss them."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from vector_ray.ml.dedup import embedding_dup_pairs

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    planted = emb.filter(pc.less(emb["vec_id"], 25))
    planted = pa.table({
        "vec_id": pc.add(planted["vec_id"], 10_000),
        "embedding": planted["embedding"],
    })
    ds = rd.from_arrow(pa.concat_tables([emb, planted])).repartition(4)
    pairs = embedding_dup_pairs(ds, cosine_threshold=0.9)
    return _finish(pairs.select_columns(["a", "b"]))


def q_field_shaping(sf_dir):
    """The field-shaping transform chain in one pipeline: concat (with
    substring ranges, src/transforms/concat.rs), templated add_fields,
    coercer cast, rename_fields, remove_fields — all plain-SQL
    expressible, so the oracle is direct."""
    from vector_ray.stages.base import ChainStep
    from vector_ray.stages.fields import (
        AddFields,
        Coercer,
        Concat,
        RemoveFields,
        RenameFields,
    )

    ds = _rp(sf_dir, "documents")
    chain = ChainStep([
        Concat("head", ["lang[0..1]", "source[3..5]"], joiner="-"),
        AddFields({"tag": "{{lang}}:{{source}}", "v": 3}),
        Coercer({"n_chars": "float"}),
        RenameFields({"lang": "language"}),
        RemoveFields(["text"]),
    ])
    return _finish(chain.apply(ds))


def q_ansi_logfmt_roundtrip(sf_dir):
    """ansi_stripper + logfmt_parser round trip: render ANSI-colored
    logfmt lines from events columns, strip the escapes
    (src/transforms/ansi_stripper.rs), parse the logfmt back out
    (logfmt_parser.rs) with a float coercion. The oracle derives the
    fields straight from the source columns, so strip+parse must
    exactly invert the render."""
    from vector_ray.expr import F
    from vector_ray.stages.base import ChainStep, FnStep
    from vector_ray.stages.fields import AnsiStripper
    from vector_ray.stages.parsers import LogfmtParser

    ds = _rp(sf_dir, "events", columns=["event_id", "event_type", "value"])
    esc = "\x1b"

    def build(t: pa.Table) -> pa.Table:
        msg = F.render(
            t, esc + "[1;32mtype={{event_type}}" + esc + "[0m val={{value}}"
        )
        return pa.table({"event_id": t["event_id"], "message": msg})

    chain = ChainStep([
        FnStep(build),
        AnsiStripper("message"),
        LogfmtParser("message", fields=["type", "val"], types={"val": "float"}),
    ])
    return _finish(chain.apply(ds))


def q_stdlib_hashes(sf_dir):
    """VRL crypto/codec/string leaf kernels vs DuckDB built-ins:
    md5, sha2(-256), encode_base64, upcase, truncate,
    strip_whitespace (lib/vrl/stdlib/src/{md5,sha2,encode_base64,
    upcase,truncate}.rs)."""
    from vector_ray.expr import F

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def fn(t: pa.Table) -> pa.Table:
        head = F.truncate(t["text"], 12)
        return pa.table({
            "doc_id": t["doc_id"],
            "h_md5": F.md5(t["source"]),
            "h_sha2": F.sha2(t["source"]),
            "b64": F.encode_base64(head),
            "up": F.upcase(t["source"]),
            "head": F.strip_whitespace(head),
        })

    return _finish(ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True))


def q_compound_route(sf_dir):
    """Config-macro oracle: a compound (serial) macro feeding a route
    with a named lane port, all through the registry
    (src/config/compiler.rs:105-146 expansion semantics,
    src/transforms/route.rs named outputs). Reads the real parquet
    source; the `en` lane port must equal the plain SQL filter."""
    from vector_ray.pipelines.config import load_config

    cfg = {
        "sources": {"docs": {
            "type": "parquet",
            "path": os.path.join(sf_dir, "documents.parquet"),
        }},
        "transforms": {
            "pipe": {"type": "compound", "inputs": ["docs"], "steps": [
                {"type": "add_fields",
                 "fields": {"bucket": "{{lang}}-{{source}}"}},
                {"type": "remove_fields", "fields": ["text"]},
            ]},
            "lanes": {"type": "route", "inputs": ["pipe"], "route": {
                "en": {"op": "eq", "field": "lang", "value": "en"},
                "big": {"op": "gte", "field": "n_chars", "value": 300},
            }, "unmatched_lane": "rest"},
        },
        "sinks": {"out": {"type": "memory", "inputs": ["lanes.en"]}},
    }
    return _finish(load_config(cfg).node_dataset("lanes.en"))


def q_split_fields(sf_dir):
    """split transform (src/transforms/split.rs): whitespace-split the
    doc text, assign the first three tokens positionally. Oracle:
    split_part — documents always have ≥3 words so positional
    assignment is total."""
    from vector_ray.stages.parsers import SplitParser

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    parser = SplitParser("text", ["w1", "w2", "w3"])
    return _finish(parser.apply(ds))


def q_pii_redact(sf_dir):
    """VRL `redact` as a corpus-scrubbing stage
    (lib/vrl/stdlib/src/redact.rs): every match of each pattern masked,
    patterns applied in order. Both the kernel
    (pc.replace_substring_regex) and the DuckDB oracle
    (regexp_replace 'g') are RE2, so semantics line up exactly."""
    from vector_ray.expr import F

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "redacted": F.redact(
                t["text"], [r"customer\w*", r"\b(?:fast|slow)\b"],
                replacement="[X]"),
        })

    return _finish(ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True))


def q_lm_perplexity(sf_dir):
    """CCNet-style LM quality scoring (ml/lm_score): char-trigram model
    trained on the id-hash quarter-sample of documents, broadcast once,
    scored map-only. Integer micro-nat NLLs make the result exact and
    partition-independent. Oracle: independent per-doc single-threaded
    reimplementation of the same spec (tools/golden.py)."""
    from vector_ray.ml.lm_score import perplexity_score, train_char_lm

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    model = train_char_lm(ds, sample_mod=4)
    out = perplexity_score(ds, model, keep_cols=("doc_id",))
    return _finish(out.select_columns(["doc_id", "n_tri", "nll_micro"]))


def q_semantic_dedup(sf_dir):
    """SemDeDup-style keep/drop decision (ml/semdedup.semantic_dedup):
    k-means cluster assignment (broadcast centroids) + ascending-id
    greedy leader dedup within each cluster, same planted-copy corpus
    as embedding_dup_pairs (vec_id<25 re-appended as +10000). Expected:
    exactly the 25 copies get keep=false. Oracle: independent
    single-threaded SemDeDup reimplementation (tools/golden.py)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from vector_ray.ml.semdedup import semantic_dedup

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    planted = emb.filter(pc.less(emb["vec_id"], 25))
    planted = pa.table({
        "vec_id": pc.add(planted["vec_id"], 10_000),
        "embedding": planted["embedding"],
    })
    ds = rd.from_arrow(pa.concat_tables([emb, planted])).repartition(4)
    out = semantic_dedup(ds, tau=0.9, n_clusters=8, sample_size=1024)
    return _finish(out.select_columns(["vec_id", "keep"]))


def q_ann_ivf(sf_dir):
    """IVF top-k with FULL probing (n_probe = n_clusters): exercises the
    whole IVF machinery — sampled k-means centroids, per-batch cluster
    assignment and pruning, per-cluster search, global merge — in the
    regime where it must equal exact brute-force top-k, which the
    DuckDB cross-join oracle verifies. The approximate n_probe < n
    recall path is covered by pytest (tests/test_ml.py::TestKnn)."""
    import pyarrow.parquet as pq

    from vector_ray.ml.ann import knn_ivf

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    qrows = emb.filter(pc.less(emb["vec_id"], 3)).sort_by("vec_id")
    queries = np.array(qrows["embedding"].to_pylist(), dtype=np.float64)
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = knn_ivf(ds, queries, k=10, n_clusters=8, n_probe=8)
    return _finish(out.select_columns(["query_idx", "vec_id", "rank"]))


def q_lang_id_docs(sf_dir):
    from vector_ray.ml.text import LangId

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out = LangId("text").apply(ds)
    return out.select_columns(["doc_id", "lang", "lang_pred"])


def q_quality_docs(sf_dir):
    from vector_ray.ml.text import QualityScore

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = QualityScore("text").apply(ds)
    return out.select_columns(["doc_id", "quality", "stop_ratio"])


def q_set_ops(sf_dir):
    """SQL INTERSECT / EXCEPT set ops (stages/align.py): distinct
    ordering customers in/not-in the BUILDING segment — semi/anti
    bucket exchange + vectorized keep-first dedup, both lanes in one
    checked result. Oracle: ANSI INTERSECT / EXCEPT."""
    from vector_ray.stages.align import except_, intersect

    orders = _rp(sf_dir, "orders", columns=["o_custkey"])
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
        return pa.table({"o_custkey": t["c_custkey"]})

    bldg = cust.map_batches(proj, batch_format="pyarrow",
                            zero_copy_batch=True)

    def lane(v):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column("lane", pa.array([v] * len(t)))
        return f

    both = intersect(orders, bldg).map_batches(
        lane("both"), batch_format="pyarrow", zero_copy_batch=True)
    only = except_(orders, bldg).map_batches(
        lane("only"), batch_format="pyarrow", zero_copy_batch=True)
    return _finish(both.union(only))


def q_union_align(sf_dir):
    """Schema-evolution union (stages/align.py — UNION ALL BY NAME):
    orders and customer shards projected to overlapping-but-different
    schemas union with null padding and int→float widening, one
    map-only projection per side, no shuffle. Oracle: UNION ALL with
    explicit NULL columns."""
    from vector_ray.stages.align import union_align

    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey",
                                            "o_totalprice"])

    def o_proj(t: pa.Table) -> pa.Table:
        return pa.table({"id": t["o_orderkey"], "cust": t["o_custkey"],
                         "price": t["o_totalprice"]})

    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_mktsegment",
                                            "c_acctbal"])

    def c_proj(t: pa.Table) -> pa.Table:
        return pa.table({"id": t["c_custkey"],
                         "segment": t["c_mktsegment"],
                         "price": pc.cast(t["c_acctbal"], pa.float32())})

    a = orders.map_batches(o_proj, batch_format="pyarrow",
                           zero_copy_batch=True)
    b = cust.map_batches(c_proj, batch_format="pyarrow",
                         zero_copy_batch=True)
    return _finish(union_align(a, b))


def q_pivot_events(sf_dir):
    """Long→wide pivot (stages/pivot.py): per-user event counts, one
    column per event_type — bounded-vocabulary distinct pass + map-only
    scatter + the standard two-phase grouped aggregate (same shuffle
    shape as a plain groupby; column count is the bound, not key
    cardinality). Count agg keeps the hash float-free. Oracle:
    count(*) FILTER per type."""
    from vector_ray.stages.pivot import pivot

    ds = _rp(sf_dir, "events", columns=["user_id", "event_type", "value"])
    out = pivot(ds, ["user_id"], "event_type", "value", agg="count",
                prefix="n_")
    return _finish(out)


def q_unpivot_orders(sf_dir):
    """Wide→long unpivot/melt (stages/pivot.py): stateless map-only
    1→N, one vectorized projection per value column, no shuffle.
    Oracle: UNION ALL of per-column projections."""
    from vector_ray.stages.pivot import unpivot

    ds = _rp(sf_dir, "orders",
             columns=["o_orderkey", "o_totalprice", "o_custkey"])
    out = unpivot(ds, ["o_orderkey"], ["o_totalprice", "o_custkey"])
    return _finish(out)


def q_window_shift(sf_dir):
    """Per-key ordered window functions (stages/shift.py): LAG/LEAD/
    delta/cumsum/ROW_NUMBER over (user_id, ORDER BY ts,event_id) — one
    hash-bucket shuffle, one sort per bucket, vectorized run-masked
    gathers (O(buckets) Python calls, skew-safe). Float arithmetic
    limited to single exact ops (lag/lead copy values; delta is one
    subtraction; the running sum is over int event_id) so the hash is
    association-order-independent. Oracle: ANSI window functions."""
    from vector_ray.stages.shift import partitioned_shift

    ds = _rp(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "value"])
    out = partitioned_shift(ds, ["user_id"], ["ts", "event_id"], {
        "prev_value": ("lag", "value"),
        "next_value": ("lead", "value"),
        "dvalue": ("delta", "value"),
        "cum_eid": ("cumsum", "event_id"),
        "rn": ("row_number", "event_id"),
        "roll3_eid": ("rolling_sum", "event_id", 3),
    })
    return _finish(out.select_columns(
        ["event_id", "user_id", "prev_value", "next_value", "dvalue",
         "cum_eid", "rn", "roll3_eid"]))


def q_rollup_orders(sf_dir):
    """GROUP BY ROLLUP (stages/rollup.py): one two-phase pass at the
    finest (priority, status) level, coarser levels re-aggregate the
    tiny finest RESULT (counts re-sum, mean carried as sum+count) —
    D-level rollup = 1 real shuffle + D-1 aggregate-table shuffles.
    Oracle: ANSI GROUP BY ROLLUP with GROUPING()-derived level. Float
    sums avoided (integer sums + one final division) so the hash is
    order-independent."""
    from vector_ray.stages.rollup import rollup_aggregate

    ds = _rp(sf_dir, "orders",
             columns=["o_orderpriority", "o_orderstatus", "o_orderkey",
                      "o_totalprice"])
    out = rollup_aggregate(ds, ["o_orderpriority", "o_orderstatus"], {
        "n": ("count", "o_orderkey"),
        "key_sum": ("sum", "o_orderkey"),
        "max_price": ("max", "o_totalprice"),
        "mean_key": ("mean", "o_orderkey"),
    })
    return _finish(out)


def q_compression_ratio(sf_dir):
    """Compressibility quality signal (ml/text.py CompressionRatio):
    zlib ratio per doc, low = repetitive/templated content. Oracle:
    independent golden (same zlib spec, single-threaded loop)."""
    from vector_ray.ml.text import CompressionRatio

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = CompressionRatio("text").apply(ds)
    return _finish(out.select_columns(["doc_id", "comp_ratio"]))


def q_broadcast_join_parts(sf_dir):
    """Map-only broadcast join (stages/join.py broadcast_join): the
    part dim table ships once via ray.put, lineitem never shuffles —
    the fact×dim plan for 100-TB fact sides. Left join so unmatched
    facts would surface (none here: referential integrity). Oracle:
    ANSI LEFT JOIN."""
    from vector_ray.stages.join import broadcast_join

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_partkey",
                      "l_quantity"])
    part = _rp(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    out = broadcast_join(li, part, ["l_partkey"],
                         right_on=["p_partkey"], join_type="left")
    return _finish(out)


def q_rank_lineitem(sf_dir):
    """Per-key RANK / DENSE_RANK / PERCENT_RANK (stages/shift.py): one
    hash-bucket shuffle on the partition key, per-bucket flat sort +
    vectorized tie-group passes (no per-key Python). l_quantity is a
    small int so tie groups are genuinely exercised. Oracle: ANSI
    window functions."""
    from vector_ray.stages.shift import partitioned_shift

    ds = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_quantity"])
    out = partitioned_shift(ds, ["l_orderkey"], ["l_quantity"], {
        "rnk": ("rank", None),
        "drnk": ("dense_rank", None),
        "prnk": ("percent_rank", None),
        "cume": ("cume_dist", None),
        "fv": ("first_value", "l_quantity"),
        "lv": ("last_value", "l_quantity"),
        "nv2": ("nth_value", "l_quantity", 2),
    })
    # ntile needs a UNIQUE order (tie order changes tile assignment);
    # chained second pass over (quantity, linenumber)
    out = partitioned_shift(out, ["l_orderkey"],
                            ["l_quantity", "l_linenumber"],
                            {"tile": ("ntile", None, 3)})
    return _finish(out)


def q_cube_orders(sf_dir):
    """GROUP BY CUBE (stages/rollup.py grouping_sets_aggregate): one
    distributed finest-level aggregate materialized once, all 2^D
    subsets re-aggregate that result (locally for small aggregate
    tables). grouping_id = ANSI GROUPING() bitmask. Oracle: DuckDB
    GROUP BY CUBE with GROUPING(). Integer sums only (order-stable
    hash); mean finalized by one division."""
    from vector_ray.stages.rollup import cube_aggregate

    ds = _rp(sf_dir, "orders",
             columns=["o_orderpriority", "o_orderstatus", "o_orderkey",
                      "o_totalprice"])
    out = cube_aggregate(ds, ["o_orderpriority", "o_orderstatus"], {
        "n": ("count", "o_orderkey"),
        "key_sum": ("sum", "o_orderkey"),
        "max_price": ("max", "o_totalprice"),
        "mean_key": ("mean", "o_orderkey"),
    })
    return _finish(out)


def q_full_outer_join(sf_dir):
    """Distributed FULL OUTER join (stages/join.py bucketed plan,
    Arrow 'full outer' per bucket — key column coalesced into the left
    name): every order keeps its customer segment, customers with no
    orders appear with null o_orderkey. Oracle: ANSI FULL OUTER JOIN
    with COALESCE on the key."""
    from vector_ray.stages.join import join

    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def _sub(t: pa.Table) -> pa.Table:
        # keep 1/7 of orders so some customers lose ALL their orders
        # and surface as unmatched right rows (null o_orderkey)
        ids = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False))
        return t.filter(pa.array(ids % 7 == 0))

    orders = orders.map_batches(_sub, batch_format="pyarrow",
                                zero_copy_batch=True)
    out = join(orders, cust, ["o_custkey"], right_on=["c_custkey"],
               join_type="full outer")
    return _finish(out.select_columns(["o_orderkey", "o_custkey",
                                       "c_mktsegment"]))


def q_semi_anti_join(sf_dir):
    """Distributed SEMI + ANTI join (stages/join.py bucketed plan,
    Arrow 'left semi'/'left anti' inside each hash bucket): orders of
    BUILDING-segment customers (lane='in') unioned with orders of
    everyone else (lane='out') — both probe paths in one checked
    result. Oracle: EXISTS / NOT EXISTS."""
    from vector_ray.stages.join import join

    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    from vector_ray.expr import C
    from vector_ray.stages import Filter

    bldg = Filter(C.eq("c_mktsegment", "BUILDING")).apply(cust)

    def lane(v):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column("lane", pa.array([v] * len(t)))
        return f

    semi = join(orders, bldg, ["o_custkey"], right_on=["c_custkey"],
                join_type="semi").map_batches(
        lane("in"), batch_format="pyarrow", zero_copy_batch=True)
    anti = join(orders, bldg, ["o_custkey"], right_on=["c_custkey"],
                join_type="anti").map_batches(
        lane("out"), batch_format="pyarrow", zero_copy_batch=True)
    return _finish(semi.union(anti))


def q_cms_counts(sf_dir):
    """Count-Min frequency estimation (ml/cms.py): distributed build
    over events.user_id (per-block matrix partials → sharded groupby
    SUM → driver SUM), map-only estimate pass, probe subset
    event_id%20==0. Width 2^8 is deliberately below the distinct-user
    count so collision overcounts are part of the checked surface.
    Oracle: independent plain-Python CMS — estimates bit-for-bit."""
    from vector_ray.expr import C
    from vector_ray.ml.cms import cms_build, cms_estimate
    from vector_ray.stages import Filter

    ds = _rp(sf_dir, "events", columns=["event_id", "user_id"])
    cms = cms_build(ds, "user_id", width=1 << 8, depth=4)
    out = cms_estimate(ds, "user_id", cms)

    def _probe(t):
        ids = np.asarray(t["event_id"].to_numpy(zero_copy_only=False))
        return pa.array(ids % 20 == 0)

    out = Filter(C.expr(_probe)).apply(out)
    return _finish(out.select_columns(["event_id", "user_id", "est_count"]))


def q_bloom_seen(sf_dir):
    """Mergeable Bloom membership (ml/bloom.py): distributed build over
    an 80% 'previous snapshot' of documents (per-block bitmap partials
    → sharded groupby OR → driver OR), then a map-only probe of ALL
    docs. Oracle: independent plain-Python python-int bitset
    reimplementation — flags match bit-for-bit including any false
    positives; false negatives are impossible by construction, so all
    400 snapshot docs must be seen=true."""
    from vector_ray.expr import C
    from vector_ray.ml.bloom import bloom_build, bloom_probe
    from vector_ray.stages import Filter

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    def _is_snap(t):
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
        return pa.array(ids % 5 != 0)

    snap = Filter(C.expr(_is_snap)).apply(ds)
    bloom = bloom_build(snap, "text", m_bits=1 << 16, k=4)
    out = bloom_probe(ds, "text", bloom, out="seen")
    return _finish(out.select_columns(["doc_id", "seen"]))


def q_c4_clean_docs(sf_dir):
    """C4-style line/document cleaning (Raffel et al. 2020 §2.2,
    ml/clean.py): terminal-punctuation / min-words / javascript line
    rules, brace + lorem-ipsum + min-sentences doc rules, and the
    text REWRITE itself (kept lines rejoined) — all over one flat byte
    buffer per batch with a fused gather into a zero-copy StringArray.
    Corpus replants lines/punctuation deterministically
    (golden.clean_corpus — shared INPUT construction); oracle is an
    independent plain-Python reimplementation rendered as VALUES."""
    import ray.data as rd

    from tools.golden import clean_corpus
    from vector_ray.ml.clean import C4Clean

    ids, texts = clean_corpus(sf_dir)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = C4Clean("text").apply(rd.from_arrow(tbl).repartition(4))
    return _finish(out.select_columns([
        "doc_id", "text_clean", "n_lines", "n_lines_kept",
        "n_sentences", "doc_kept"]))


def q_url_dedup_docs(sf_dir):
    """C4/RefinedWeb-style URL canonicalization + URL-level exact dedup
    (ml/urls.py): 200 canonical URLs each planted as 3 raw variants
    (case/www/default-port/tracking-params/param-order/trailing-slash/
    fragment) that must collapse to one kept row each — keep-first by
    doc_id, vectorized bucketed_first plan (no per-key Python). Oracle:
    independent urllib.parse reimplementation (tools/golden.py
    norm_url_py) rendered as VALUES."""
    import ray.data as rd

    from tools.golden import url_corpus
    from vector_ray.ml.urls import url_dedup

    ids, urls = url_corpus(sf_dir)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "url": pa.array(urls, pa.string())})
    out = url_dedup(rd.from_arrow(tbl).repartition(4), "url")
    return _finish(out.select_columns(["doc_id", "norm_url",
                                       "norm_url_domain"]))


def q_repetition_signals(sf_dir):
    """Gopher-style repetition counters (Rae et al. 2021, A1.1) —
    dup-line / top-2-gram / dup-5-gram coverage, all integer-exact.
    The raw word-soup text has single-line docs (zero line signal), so
    the corpus is deterministically replanted (golden.rep_corpus: 7-word
    lines, every 3rd doc repeats a line, every 4th plants a duplicated
    5-gram); the shared builder is INPUT construction, not the operator
    under test. Oracle: plain-Python content-compared reimplementation
    (tools/golden.py rep_signals_py) rendered as VALUES."""
    import ray.data as rd

    from tools.golden import rep_corpus
    from vector_ray.ml.text import RepetitionSignals

    ids, texts = rep_corpus(sf_dir)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = RepetitionSignals("text").apply(rd.from_arrow(tbl).repartition(4))
    return _finish(out.select_columns([
        "doc_id", "n_lines", "dup_line_cnt", "line_chars",
        "dup_line_chars", "word_chars", "top2_cnt", "top2_chars",
        "dup5_chars"]))


def q_line_dedup(sf_dir):
    """RefinedWeb/MassiveText corpus-wide line dedup (Penedo et al.
    2023 §4.2): a non-empty line occurring >= 2 times anywhere in the
    corpus is removed from EVERY document. Corpus is deterministically
    replanted multi-line (golden.line_corpus: rep_corpus lines + a
    cross-doc cookie banner on every 2nd doc, footer on every 5th).
    Explode output (doc_id, line_no, line) so the oracle is PLAIN SQL
    — DuckDB recomputes the dedup itself (string_split + count + join),
    no golden reimplementation. The pipeline-facing rebuild mode
    (text_line_dedup joined by newline) is pytest-covered."""
    import ray.data as rd

    from tools.golden import line_corpus
    from vector_ray.ml.clean import line_dedup

    ids, texts = line_corpus(sf_dir)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = line_dedup(rd.from_arrow(tbl).repartition(4), "text",
                     min_count=2, output="explode")
    return _finish(out)


def q_weighted_sample(sf_dir):
    """Gumbel top-k weighted sampling without replacement
    (ml/sampling.weighted_sample_k — Efraimidis-Spirakis): shuffle-free
    (≤k rows leave each block), deterministic on any cluster shape.
    Oracle: independent numpy mirror with the SAME vectorized ops
    (SIMD array log differs from scalar log by 1 ulp)."""
    from vector_ray.ml.sampling import weighted_sample_k

    ds = _rp(sf_dir, "documents", columns=["doc_id", "n_chars"])
    out = weighted_sample_k(ds, 50, "n_chars", seed=9)
    return _finish(out.select_columns(["doc_id", "n_chars"]))


def q_split_holdout(sf_dir):
    """Deterministic train/holdout split (ml/sampling.split_holdout):
    a row's side is a pure function of salted-hash(id|seed), so both
    sides are exactly complementary and cluster-shape-independent.
    The query runs BOTH sides and unions them with a side label;
    oracle = independent salted-hash reimplementation as VALUES."""
    from vector_ray.ml.sampling import split_holdout

    ds = _rp(sf_dir, "documents", columns=["doc_id"])

    def lab(side):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array([side] * len(t), pa.string()))

        return fn

    tr = split_holdout(ds, 0.2, seed=5, which="train").map_batches(
        lab("train"), batch_format="pyarrow", zero_copy_batch=True)
    ho = split_holdout(ds, 0.2, seed=5, which="holdout").map_batches(
        lab("holdout"), batch_format="pyarrow", zero_copy_batch=True)
    return _finish(tr.union(ho))


def q_gopher_quality(sf_dir):
    """Gopher A1.2 quality gate (ml/text.py gopher_quality_filter):
    word-count bounds, mean word length, hash/ellipsis ratios, alpha-
    word fraction, stopword presence — exact integer comparisons, so
    the kept set hash-gates against an independent plain-Python
    reimplementation (tools/golden.py)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from vector_ray.ml.text import gopher_quality_filter

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"]).slice(0, 400)
    out = gopher_quality_filter(rd.from_arrow(t).repartition(4))
    return _finish(out.select_columns(["doc_id"]))


def q_blocklist_filter(sf_dir):
    """C4-style blocklist page drop (ml/clean.py blocklist_filter):
    one compiled alternation regex over the batch flat buffer,
    case-insensitive. Corpus plants a phrase on every 6th doc (mixed
    case); oracle is plain SQL LIKE over the same VALUES corpus."""
    import ray.data as rd

    from tools.golden import blocklist_corpus
    from vector_ray.ml.clean import blocklist_filter

    ids, texts = blocklist_corpus(sf_dir)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = blocklist_filter(rd.from_arrow(tbl).repartition(4),
                           ["forbidden widget", "buy cheap pills"])
    return _finish(out.select_columns(["doc_id"]))


def q_gopher_filter(sf_dir):
    """Gopher repetition FILTER (Rae et al. 2021 A1.1 thresholds) over
    the replanted multi-line corpus: exact integer cross-multiplication
    comparisons (ml/text.py gopher_repetition_filter), so the kept-id
    set is oracle-hashable (tools/golden.py reimplementation)."""
    import ray.data as rd

    from tools.golden import rep_corpus
    from vector_ray.ml.text import gopher_repetition_filter

    ids, texts = rep_corpus(sf_dir)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = gopher_repetition_filter(rd.from_arrow(tbl).repartition(4))
    return _finish(out.select_columns(["doc_id"]))


def q_line_dedup_keep_first(sf_dir):
    """line_dedup mode='keep_first' (Dolma keep-first semantics): the
    globally first (doc_id, line_no) occurrence of each duplicated
    line survives; election = mergeable per-hash min of the
    doc_id*2^21+line_no occurrence code riding the count pass. Oracle
    is PLAIN SQL (window functions over the same corpus)."""
    import ray.data as rd

    from tools.golden import line_corpus
    from vector_ray.ml.clean import line_dedup

    ids, texts = line_corpus(sf_dir)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = line_dedup(rd.from_arrow(tbl).repartition(4), "text",
                     min_count=2, mode="keep_first", output="explode")
    return _finish(out)


def q_paragraph_dedup(sf_dir):
    """Dolma-style corpus-wide PARAGRAPH dedup (Soldaini et al. 2024):
    units are the doc's non-overlapping split('\\n\\n') segments; any
    paragraph occurring >= 2 times corpus-wide is removed from every
    document. Corpus replants cross-doc banner/footer as whole
    paragraphs (golden.para_corpus). Oracle is PLAIN SQL — DuckDB
    recomputes the dedup over string_split(text, chr(10)||chr(10))."""
    import ray.data as rd

    from tools.golden import para_corpus
    from vector_ray.ml.clean import line_dedup

    ids, texts = para_corpus(sf_dir)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = line_dedup(rd.from_arrow(tbl).repartition(4), "text",
                     min_count=2, unit="paragraph", output="explode")
    return _finish(out)


def q_range_join(sf_dir):
    """Interval-containment join (stages/join.py range_join): each
    event matched to its event_type's maintenance window containing
    ts (non-overlapping per-key intervals — the dimension-validity
    shape). Asof-backward candidate + one vectorized hi filter; only
    bucketed (key, ts) rows shuffle. Oracle: plain SQL BETWEEN join
    over the same deterministic window table."""
    import ray.data as rd

    from tools.golden import range_intervals
    from vector_ray.stages.join import range_join

    rows = range_intervals(sf_dir)
    iv = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "lo": pa.array([r[1] for r in rows], pa.int64()),
        "hi": pa.array([r[2] for r in rows], pa.int64()),
        "win_id": pa.array([r[3] for r in rows], pa.int64()),
    })
    ds = _rp(sf_dir, "events", columns=["event_id", "event_type", "ts"])

    def mk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "p": pc.cast(t["ts"], pa.int64())})

    pts = ds.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)
    out = range_join(pts, rd.from_arrow(iv).repartition(2),
                     by=["event_type"], point="p", lo="lo", hi="hi")
    return _finish(out.select_columns(["event_id", "win_id"]))


def q_grouped_mode(sf_dir):
    """Most frequent value per key, deterministic ties → smallest
    (stages/aggregate.py grouped_mode): only the grouped count table
    shuffles; per hash bucket one sort + run-start mask picks every
    key's head. Oracle: explicit row_number window (SQL mode() has
    unspecified ties)."""
    from vector_ray.stages.aggregate import grouped_mode

    ds = _rp(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority"])
    return _finish(grouped_mode(ds, ["o_orderstatus"], "o_orderpriority",
                                out="top_priority"))


def q_snapshot_diff(sf_dir):
    """Dataset-versioning diff (stages/diff.py): each snapshot reduces
    to (id, 64-bit content fingerprint) — payloads never shuffle —
    then one bucketed full outer join classifies added/removed/changed
    (unchanged omitted). Oracle: plain SQL full outer join comparing
    the TEXT directly over the same planted snapshots."""
    import ray.data as rd

    from tools.golden import diff_corpus
    from vector_ray.stages.diff import snapshot_diff

    old, new = diff_corpus(sf_dir)

    def tbl(rows):
        return pa.table({
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "text": pa.array([t for _, t in rows], pa.string())})

    return _finish(snapshot_diff(
        rd.from_arrow(tbl(old)).repartition(3),
        rd.from_arrow(tbl(new)).repartition(4)))


def q_scd2_user_state(sf_dir):
    """SCD Type-2 history (stages/diff.scd2): the events stream read
    as a per-user state changelog (user_id, ts, event_type) becomes
    validity intervals — consecutive identical states collapsed, each
    surviving change valid until the next one, the last open-ended.
    One hash-bucket shuffle on user_id; per-bucket flat sort + numpy
    consecutive-row passes (no per-key Python). Oracle: LAG collapse +
    LEAD validity window functions."""
    from vector_ray.stages.diff import scd2

    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return _finish(scd2(ds, id_col="user_id", ts_col="ts",
                        attr_cols=["event_type"]))


def q_grouped_var(sf_dir):
    """Grouped sample variance/stddev via mergeable (n, Σx, Σx²)
    partials (stages/aggregate.py var/std kinds). l_quantity is
    integer-valued, so every partial is exact in f64 and the explicit
    (Σx² − (Σx)²/n)/(n−1) formula — mirrored verbatim in the SQL —
    is partitioning-independent and hash-exact."""
    from vector_ray.stages.aggregate import grouped_aggregate

    ds = _rp(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    out = grouped_aggregate(ds, ["l_returnflag"], {
        "q_var": ("var", "l_quantity"),
        "q_std": ("std", "l_quantity"),
    })
    return _finish(out)


def q_grouped_corr(sf_dir):
    """Grouped covariance/correlation via two-column mergeable
    (n, Σx, Σy, Σxy, Σx², Σy²) partials (stages/aggregate.py cov/corr
    kinds, pairwise-null exclusion). Integer-valued inputs keep every
    partial exact in f64; the SQL oracle mirrors the explicit formula
    op-for-op."""
    from vector_ray.stages.aggregate import grouped_aggregate

    ds = _rp(sf_dir, "lineitem",
             columns=["l_returnflag", "l_quantity", "l_linenumber"])
    out = grouped_aggregate(ds, ["l_returnflag"], {
        "ql_cov": ("cov", "l_quantity", "l_linenumber"),
        "ql_corr": ("corr", "l_quantity", "l_linenumber"),
        "q_wmean": ("wmean", "l_quantity", "l_linenumber"),
        "q_slope": ("slope", "l_quantity", "l_linenumber"),
        "q_icept": ("intercept", "l_quantity", "l_linenumber"),
    })
    return _finish(out)


def q_bpe_merges(sf_dir):
    """Distributed BPE tokenizer training (ml/bpe.py, Sennrich 2016 /
    byte-level alphabet): ONE corpus pass builds the word-TYPE
    frequency table, then every merge iteration is a vectorized pair
    count over the vocabulary-bounded type Dataset + a small grouped
    sum + a deterministic (count desc, pair asc) argmax. Oracle:
    independent plain-Python Counter BPE over the same word
    frequencies (tools/golden.py bpe_merges_py) rendered as VALUES."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from vector_ray.ml.bpe import bpe_train

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"]).slice(0, 400)
    ds = rd.from_arrow(t).repartition(4)
    merges, _types = bpe_train(ds, "text", num_merges=24)
    return merges


def q_bpe_encode(sf_dir):
    """BPE ENCODE path (ml/bpe.py bpe_encode): merges trained on the
    first 400 docs, the last 120 docs encoded — some word types are
    OOV w.r.t. the training slice, exercising both the broadcast
    vocab-join gather AND the per-type merge replay. Output
    (doc_id, n_bpe, bpe_sum) — order-independent integers. Oracle:
    independent plain-Python train+encode (tools/golden.py)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from vector_ray.ml.bpe import bpe_encode, bpe_train

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    train = rd.from_arrow(t.slice(0, 400)).repartition(4)
    merges, types = bpe_train(train, "text", num_merges=24)
    enc_in = rd.from_arrow(t.slice(len(t) - 120)).repartition(3)
    enc = bpe_encode(enc_in, merges, types, field="text")

    def summarize(b: pa.Table) -> pa.Table:
        import numpy as np

        lst = b["bpe"].combine_chunks()
        offs = np.asarray(lst.offsets, np.int64)
        offs = offs - offs[0]
        vals = np.asarray(lst.flatten().to_numpy(zero_copy_only=False),
                          np.int64)
        cs = np.concatenate(([0], np.cumsum(vals)))
        return pa.table({
            "doc_id": b["doc_id"],
            "n_bpe": pa.array(np.diff(offs)),
            "bpe_sum": pa.array(cs[offs[1:]] - cs[offs[:-1]]),
        })

    return _finish(enc.map_batches(summarize, batch_format="pyarrow",
                                   zero_copy_batch=True))


def q_ffill_events(sf_dir):
    """Forward fill as a window function (stages/shift.py ffill —
    SQL last_value(x IGNORE NULLS) OVER (PARTITION BY user ORDER BY
    ts ROWS UNBOUNDED PRECEDING)): the last click value carried
    forward across each user's timeline. Values pass through
    untouched (no float arithmetic), so the oracle hash-matches."""
    from vector_ray.stages.shift import partitioned_shift

    ds = _rp(sf_dir, "events", columns=[
        "event_id", "user_id", "event_type", "value", "ts"])

    def mk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = pc.if_else(pc.equal(t["event_type"], pa.scalar("click")),
                       t["value"], pa.scalar(None, pa.float64()))
        return t.append_column("v", v)

    withv = ds.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)
    out = partitioned_shift(withv, ["user_id"], ["ts", "event_id"],
                            {"v_ffill": ("ffill", "v")})
    return _finish(out.select_columns(["event_id", "v_ffill"]))


def q_bfill_events(sf_dir):
    """Backward fill (stages/shift.py bfill — SQL first_value(x IGNORE
    NULLS) over the FOLLOWING frame): the next click value carried
    backward across each user's timeline. Values pass through
    untouched, so the oracle hash-matches."""
    from vector_ray.stages.shift import partitioned_shift

    ds = _rp(sf_dir, "events", columns=[
        "event_id", "user_id", "event_type", "value", "ts"])

    def mk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = pc.if_else(pc.equal(t["event_type"], pa.scalar("click")),
                       t["value"], pa.scalar(None, pa.float64()))
        return t.append_column("v", v)

    withv = ds.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)
    out = partitioned_shift(withv, ["user_id"], ["ts", "event_id"],
                            {"v_bfill": ("bfill", "v")})
    return _finish(out.select_columns(["event_id", "v_bfill"]))


def q_profile_orders(sf_dir):
    """Table profiling (stages/profile.py — the SUMMARIZE/describe
    analogue): one streaming pass, one tiny mergeable partial row per
    column per block, typed min/max channels so int64 never round-trips
    through float64. Oracle: plain SQL per-column aggregates over the
    int/string columns (float min/max formatting differs repr-vs-cast;
    documented exclusion)."""
    from vector_ray.stages.profile import profile

    ds = _rp(sf_dir, "orders", columns=[
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"])
    return _finish(profile(ds))


def q_resample_events(sf_dir):
    """Dense-grid resample (stages/window.py resample — the SQL
    generate_series + LEFT JOIN / pandas .resample analogue): hourly
    tumbling aggregate per event_type with EVERY window between each
    key's first and last event materialized, empty windows zero-filled.
    Aggregates chosen order-independent-exact (count + max) so the
    plain-SQL oracle hash-matches."""
    from vector_ray.stages.window import resample

    ds = _rp(sf_dir, "events", columns=["event_type", "ts", "value"])
    out = resample(ds, "ts", 3600.0,
                   {"n": ("count", "value"), "vmax": ("max", "value")},
                   keys=["event_type"], fill="zero")
    return _finish(out)


def q_resample_ffill(sf_dir):
    """resample fill='ffill': every agg column forward-filled from the
    key's last non-empty window (vectorized index-carry per hash
    bucket). Values pass through untouched, so the oracle —
    last_value(... IGNORE NULLS) over the same generate_series grid —
    hash-matches."""
    from vector_ray.stages.window import resample

    ds = _rp(sf_dir, "events", columns=["event_type", "ts", "value"])
    out = resample(ds, "ts", 3600.0,
                   {"n": ("count", "value"), "vmax": ("max", "value")},
                   keys=["event_type"], fill="ffill")
    return _finish(out)


def q_pagerank_hosts(sf_dir):
    """Fixed-point integer PageRank over a planted directed doc-id
    graph (ml/graph.py — the host-graph quality signal of web-corpus
    curation; Page et al. 1999). Integer floor arithmetic makes the
    result bit-identical at any partitioning, so the oracle is an
    independent plain-Python reimplementation rendered as VALUES
    (tools/golden.py pagerank_sql). Per iteration: edges ⋈ shares
    (bucketed, key=src) → grouped sum by dst — shuffles only
    (node, int64) pairs."""
    import ray.data as rd

    from tools.golden import pr_graph
    from vector_ray.ml.graph import pagerank

    src, dst = pr_graph(sf_dir)
    tbl = pa.table({"src": pa.array(src, pa.int64()),
                    "dst": pa.array(dst, pa.int64())})
    return _finish(pagerank(rd.from_arrow(tbl).repartition(4), iters=10))


def q_media_features(sf_dir):
    """Multimodal decode plumbing (deterministic fake decoder over the
    seeded synthetic media table — scale-free, sf-independent). Features
    are unnested to scalar f0..f7 columns (exact dyadic fractions) so a
    golden-value oracle from an independent re-implementation of the
    synth + feature spec can hash-match (tools/golden.py)."""
    import ray.data as rd

    from vector_ray.ml.multimodal import ImageDecode, decode_stage, synth_media_table

    media = synth_media_table(200)
    ds = rd.from_arrow(media)
    out = decode_stage(ds, ImageDecode, fake=True, concurrency=2)

    def unnest(t: pa.Table) -> pa.Table:
        feats = t["image_features"].combine_chunks()
        flat = np.asarray(feats.flatten(), dtype=np.float64).reshape(len(t), 8)
        cols = {"media_id": t["media_id"], "media_type": t["media_type"]}
        for j in range(8):
            cols[f"f{j}"] = pa.array(flat[:, j], pa.float64())
        return pa.table(cols)

    return out.map_batches(unnest, batch_format="pyarrow")


def q_unnest_words(sf_dir):
    from vector_ray.expr import F
    from vector_ray.stages.explode import Unnest

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def split_words(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "word": F.split(t["text"], " ")})

    ds = ds.map_batches(split_words, batch_format="pyarrow", zero_copy_batch=True)
    return _finish(Unnest("word").apply(ds))


def q_session_events(sf_dir):
    from vector_ray.stages.window import SessionWindow

    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "value"])
    w = SessionWindow(["user_id"], "ts", gap_s=1800, aggs={"n": ("count", "ts"), "v": ("sum", "value")})
    out = w.apply(ds)

    def final(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "session_id": pc.cast(t["session_id"], pa.int64()),
                "n": pc.cast(t["n"], pa.int64()),
                "value_sum_c": pc.cast(pc.round(pc.multiply(t["v"], 100.0), ndigits=0), pa.int64()),
            }
        )

    return out.map_batches(final, batch_format="pyarrow")


def q_geoip_events(sf_dir):
    from vector_ray.expr import F
    from vector_ray.stages.geoip import GeoipLookup

    ds = _rp(sf_dir, "events", columns=["event_id", "user_id"])

    def mk_ip(t: pa.Table) -> pa.Table:
        octet = pc.cast(F.mod(t["user_id"], 256), pa.string())
        ip = pc.binary_join_element_wise("10.", octet, ".0.1", "")
        return pa.table({"event_id": t["event_id"], "user_id": t["user_id"], "ip": ip})

    ds = ds.map_batches(mk_ip, batch_format="pyarrow", zero_copy_batch=True)
    db = [("10.0.0.0/9", {"region": "low"}), ("10.128.0.0/9", {"region": "high"})]
    out = GeoipLookup("ip", table=db, concurrency=2).apply(ds)

    def final(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": t["event_id"], "region": pc.struct_field(t["geoip"], "region")}
        )

    return out.map_batches(final, batch_format="pyarrow")


def q_approx_distinct_users(sf_dir):
    from vector_ray.stages import grouped_aggregate

    ds = _rp(sf_dir, "events", columns=["event_type", "user_id"])
    return _finish(
        grouped_aggregate(ds, ["event_type"], {"approx_users": ("approx_nunique", "user_id")})
    )


def q_tumbling_histogram(sf_dir):
    """Mergeable fixed-bucket histogram (AggregatedHistogram,
    metric.rs:160-164) through grouped_aggregate's sketch partials,
    finalized as one row per (event_type, bin) so bucket counts are
    exactly SQL-checkable (bin i = value <= bounds[i], last bin =
    overflow)."""
    import json

    from vector_ray.stages import grouped_aggregate

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    merged = grouped_aggregate(
        ds, ["event_type"], {"value_hist": ("histogram", "value", [50.0, 100.0, 250.0])}
    )

    def explode(t: pa.Table) -> pa.Table:
        rows = {"event_type": [], "bin": [], "n": []}
        for et, js in zip(t["event_type"].to_pylist(), t["value_hist"].to_pylist()):
            counts = json.loads(js)["counts"] if js else []
            for i, c in enumerate(counts):
                rows["event_type"].append(et)
                rows["bin"].append(i)
                rows["n"].append(int(c))
        return pa.table({
            "event_type": pa.array(rows["event_type"], pa.string()),
            "bin": pa.array(rows["bin"], pa.int64()),
            "n": pa.array(rows["n"], pa.int64()),
        })

    return merged.map_batches(explode, batch_format="pyarrow")


def q_salted_reduce(sf_dir):
    import pandas as pd

    from vector_ray.stages.salt import salted_group_reduce

    ds = _rp(sf_dir, "events", columns=["event_type", "event_id", "value"])

    def reduce_fn(g: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame(
            [{"event_type": g["event_type"].iloc[0], "value": g["value"].sum(),
              "n": len(g)}]
        )

    def merge_fn(g: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame(
            [{"event_type": g["event_type"].iloc[0], "value": g["value"].sum(),
              "n": int(g["n"].sum())}]
        )

    out = salted_group_reduce(ds, ["event_type"], reduce_fn, merge_fn, buckets=8,
                              salt_source="event_id")

    def final(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "value_sum_c": pc.cast(pc.round(pc.multiply(t["value"], 100.0), ndigits=0), pa.int64()),
                "n": pc.cast(t["n"], pa.int64()),
            }
        )

    return out.map_batches(final, batch_format="pyarrow")


def q_reduce_concat(sf_dir):
    from vector_ray.stages import Reduce

    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "source"])
    red = Reduce(["lang"], merge_strategies={"source": "concat"}, order_by="doc_id",
                 count_col="n_docs")
    out = red.apply(ds)
    return _finish(out.select_columns(["lang", "source", "n_docs"]))


def q_join_orders_customers(sf_dir):
    from vector_ray.stages.join import bucketed_join

    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_name"])
    out = bucketed_join(orders, cust, ["o_custkey"], right_on=["c_custkey"], buckets=8)
    return _finish(out.select_columns(["o_orderkey", "o_totalprice", "c_name"]))


def q_grouped_standardize(sf_dir):
    """Per-key z-score (stages/feature.grouped_standardize): each
    return-flag series normalized against its own exact (n, Σ, Σ²)
    moments, broadcast as an index_in-probed table — formula mirrored
    verbatim in the SQL join oracle."""
    from vector_ray.stages.feature import grouped_standardize

    ds = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_returnflag",
                      "l_quantity"])
    return _finish(grouped_standardize(ds, ["l_returnflag"],
                                       "l_quantity"))


def q_robust_scale(sf_dir):
    """Robust scaling (stages/feature.robust_scale): (x - median)/IQR
    with data-value quantiles (quantile_disc rank rule) — only the
    final two float ops exist, mirrored verbatim in the SQL."""
    from vector_ray.stages.feature import robust_scale

    ds = _rp(sf_dir, "events", columns=["event_id", "value"])
    return _finish(robust_scale(ds, "value"))


def q_minmax_events(sf_dir):
    """Min-max scaling (stages/feature.minmax_scale): one exact
    min/max scan then map-only (x-min)/(max-min) — same IEEE op order
    as the SQL mirror."""
    from vector_ray.stages.feature import minmax_scale

    ds = _rp(sf_dir, "events", columns=["event_id", "value"])
    return _finish(minmax_scale(ds, "value"))


def q_target_encode(sf_dir):
    """Target encoding (stages/feature.target_encode): category →
    smoothed mean of the integer-valued l_quantity, fit via one
    grouped (sum, count) scan bounded by the category count, applied
    with a vectorized index_in dictionary probe. Formula mirrored
    verbatim in the SQL oracle."""
    from vector_ray.stages.feature import target_encode

    ds = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_returnflag",
                      "l_quantity"])
    return _finish(target_encode(ds, "l_returnflag", "l_quantity",
                                 smoothing=10.0))


def q_one_hot_events(sf_dir):
    """One-hot encoding (stages/feature.one_hot): one distinct scan
    fits the sorted vocabulary (hard-capped — one-hot is for bounded
    categoricals), then map-only 0/1 columns. Oracle: explicit CASE
    columns per category."""
    from vector_ray.stages.feature import one_hot

    ds = _rp(sf_dir, "events", columns=["event_id", "event_type"])
    return _finish(one_hot(ds, "event_type"))


def q_log_templates(sf_dir):
    """Drain-style log template mining (stages/templates.py): lines
    group by (token_count, first_token); a position wildcards iff any
    two lines disagree, decided by mergeable min/max token partials —
    only O(templates × positions) rows ever shuffle. Fixture: log
    lines rendered deterministically from the events table; oracle
    computes each group's expected template by independent
    DISTINCT-count SQL."""
    from vector_ray.stages.templates import log_templates

    ds = _rp(sf_dir, "events", columns=["event_type", "user_id", "value"])

    def render(t: pa.Table) -> pa.Table:
        hl = pc.if_else(pc.greater_equal(t["value"], 0.5),
                        pa.scalar("high"), pa.scalar("low"))
        msg = pc.binary_join_element_wise(
            pc.cast(t["event_type"], pa.string()), pa.scalar("user"),
            pc.cast(t["user_id"], pa.string()), pa.scalar("value"),
            hl, pa.scalar(" "))
        return pa.table({"message": msg})

    lines = ds.map_batches(render, batch_format="pyarrow",
                           zero_copy_batch=True)
    return _finish(log_templates(lines, "message"))


def q_semantic_join(sf_dir):
    """Cross-corpus ANN join (ml/ann.semantic_join): even vec_ids are
    the query corpus, odd vec_ids the retrieval corpus; exact mode
    (probe every cluster) so the result equals the brute-force cosine
    top-3 join. Oracle: cross join + QUALIFY row_number (rank + ids
    only — float cosine never enters the hash, knn_graph convention)."""
    from vector_ray.ml.ann import semantic_join

    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def split(parity):
        def fn(t: pa.Table) -> pa.Table:
            mod = pc.cast(np_mod(t["vec_id"], 2), pa.int64())
            return t.filter(pc.equal(mod, parity))
        return fn

    left = ds.map_batches(split(0), batch_format="pyarrow",
                          zero_copy_batch=True)
    right = ds.map_batches(split(1), batch_format="pyarrow",
                           zero_copy_batch=True)
    out = semantic_join(left, right, k=3, n_clusters=8, n_probe=None)
    return _finish(out.select_columns(["src", "dst", "rank"]))


def q_argmax_events(sf_dir):
    """Grouped argmax (stages/aggregate.grouped_argmax): per event
    type, the full row at the maximum value — one bucket shuffle +
    vectorized sorted-run keep-first, deterministic tie-break on
    event_id. Oracle: QUALIFY row_number window."""
    from vector_ray.stages.aggregate import grouped_argmax

    ds = _rp(sf_dir, "events", columns=["event_type", "event_id", "value"])
    return _finish(grouped_argmax(ds, ["event_type"], "value",
                                  tie_col="event_id"))


def q_rate_events(sf_dir):
    """Counter-rate extraction (stages/shift.py "rate" window fn): the
    metrics-pipeline step that turns monotonic counter samples into
    increments, treating any decrease as a counter reset (emit the
    post-reset value). One bucket shuffle on the key; oracle is the
    equivalent LAG + CASE window expression."""
    from vector_ray.stages.shift import partitioned_shift

    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "value"])
    out = partitioned_shift(ds, ["user_id"], ["ts"],
                            {"rate": ("rate", "value")})

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "rate": t["rate"]})

    return _finish(out.map_batches(shape, batch_format="pyarrow",
                                   zero_copy_batch=True))


def q_ewma_events(sf_dir):
    """Per-key exponential moving average (stages/shift.py "ewma"
    window fn): y_i = α·x_i + (1−α)·y_{i−1} vectorized via w^{-p}
    rescaling over run-relative chunks laid out rectangularly so each
    key's float ops are bit-identical whatever other keys share the
    bucket. Oracle: single-threaded mirror of the same chunked
    arithmetic (tools/golden.py ewma_sql)."""
    from vector_ray.stages.shift import partitioned_shift

    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "value"])
    out = partitioned_shift(ds, ["user_id"], ["ts"],
                            {"ewma": ("ewma", "value", 0.25)})

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "value": t["value"],
            "ewma": t["ewma"]})

    return _finish(out.map_batches(shape, batch_format="pyarrow",
                                   zero_copy_batch=True))


def q_winsorize_events(sf_dir):
    """Quantile clipping (stages/feature.winsorize): cut points are
    actual data values from exact_quantiles (quantile_disc rank rule)
    broadcast into a map-only clip — comparisons exact, hash-gated
    against LEAST/GREATEST over quantile_disc subqueries."""
    from vector_ray.stages.feature import winsorize

    ds = _rp(sf_dir, "events", columns=["event_id", "value"])
    return _finish(winsorize(ds, "value", p_lo=0.05, p_hi=0.95))


def q_standardize_lineitem(sf_dir):
    """z-score standardization (stages/feature.standardize): one
    moment scan (n, Σx, Σx² — exact f64 for the integer-valued
    l_quantity), then a map-only transform; the explicit
    (x−Σx/n)/sqrt((Σx²−(Σx)²/n)/(n−1)) formula is mirrored verbatim
    in the SQL so every IEEE op matches."""
    from vector_ray.stages.feature import standardize

    ds = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_quantity"])
    return _finish(standardize(ds, ["l_quantity"]))


def q_bucketize_events(sf_dir):
    """Discretization (stages/feature.bucketize): equal-width bins
    from an exact min/max scan (the quantile machinery's bin formula)
    AND equal-frequency bins whose cut points are actual data values
    from exact_quantiles (quantile_disc rank rule) — both map-only
    after O(1) fitted state, no float reconstruction anywhere."""
    from vector_ray.stages.feature import bucketize

    ds = _rp(sf_dir, "events", columns=["event_id", "value"])
    ds = bucketize(ds, "value", bins=10, mode="width", out="wbin")
    ds = bucketize(ds, "value", bins=10, mode="quantile", out="qbin")
    return _finish(ds)


def q_kmeans_embeddings(sf_dir):
    """Distributed full-data k-means (ml/cluster.py): exact-integer
    Lloyd iterations on the 2^20 grid — assignment and centroid
    updates are partitioning-independent, so the whole fit is
    hash-gated. Output: per-cluster member count + polynomial checksum
    of the ascending member ids (any reassignment anywhere flips a
    hash). Oracle: single-threaded integer mirror (tools/golden.py
    kmeans_sql)."""
    from vector_ray.ml.cluster import kmeans_cluster_stats, kmeans_train

    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent = kmeans_train(ds, n_clusters=8, iters=5)
    return _finish(kmeans_cluster_stats(ds, cent))


def q_skew_join_docs(sf_dir):
    """Skew-aware hybrid join: 'en' holds ~40% of documents, so it is
    detected hot and joins map-only against the broadcast right slice
    while the tail langs go through the bucketed shuffle."""
    from vector_ray.stages.join import skew_join

    docs = _rp(sf_dir, "documents", columns=["doc_id", "lang"])
    counts = _rp(sf_dir, "documents", columns=["lang"]).groupby("lang").count()

    def ren(t: pa.Table) -> pa.Table:
        return t.rename_columns(["lang", "lang_docs"])

    counts = counts.map_batches(ren, batch_format="pyarrow", zero_copy_batch=True)
    out = skew_join(docs, counts, ["lang"], hot_frac=0.2, buckets=8)
    return _finish(out)


def q_bloom_join_lineitem(sf_dir):
    """Bloom-prefiltered bucketed join: ~80% of lineitem rows are
    dropped before the shuffle because their order key cannot match
    the (selective) right side."""
    from vector_ray.stages.join import bucketed_join

    li = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    big = orders.filter(expr="o_totalprice > 400000")
    out = bucketed_join(li, big, ["l_orderkey"], right_on=["o_orderkey"],
                        buckets=8, bloom_prefilter=True, bloom_bits=1 << 20)
    return _finish(out.select_columns(["l_orderkey", "l_quantity", "o_totalprice"]))


def q_asof_last_purchase(sf_dir):
    from vector_ray.stages.join import asof_join

    ev = _rp(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    purchases = _rp(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        p = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({"user_id": p["user_id"], "ts": p["ts"], "pts": p["ts"]})

    purchases = purchases.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    out = asof_join(ev, purchases, by=["user_id"], on="ts", buckets=8)

    def final(t: pa.Table) -> pa.Table:
        # the bucketed union pads the other side's columns with nulls, so
        # pandas upcasts int columns to float inside merge_bucket — cast back
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "last_purchase_us": pc.cast(pc.cast(t["pts"], pa.int64()), pa.float64()),
            }
        )

    return out.map_batches(final, batch_format="pyarrow")


def q_percentiles(sf_dir):
    """Exact distributed percentiles — histogram-refinement rank
    selection (vector_ray/stages/quantile.py): 3 shuffle-free column
    scans, driver sees only the candidate bins (≤cap values), never a
    sorted copy of the data. Capability the reference lacks entirely
    (SURVEY.md §2.7)."""
    from vector_ray.stages.quantile import exact_quantiles

    ds = _rp(sf_dir, "events", columns=["value"])
    ps = (0.5, 0.9, 0.99)
    vals = exact_quantiles(ds, "value", ps)
    return pa.table({"p": pa.array(ps, pa.float64()),
                     "value": pa.array(vals, pa.float64())})


def q_merge_partial_docs(sf_dir):
    """Merge (partial-event stitching, src/transforms/merge.rs:18-37)
    round trip: split each document's text into three partial rows,
    stitch them back per stream with order_by; the oracle is simply the
    original documents table — stitching must reproduce it exactly."""
    from vector_ray.stages.merge_partial import Merge

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def explode3(t: pa.Table) -> pa.Table:
        n = len(t)
        parts, seqs, partials, ids = [], [], [], []
        for lo, hi, seq in ((0, 100, 0), (100, 200, 1), (200, None, 2)):
            if hi is None:
                chunk = pc.utf8_slice_codeunits(t["text"], lo, 2**30)
            else:
                chunk = pc.utf8_slice_codeunits(t["text"], lo, hi)
            parts.append(chunk.combine_chunks() if isinstance(chunk, pa.ChunkedArray) else chunk)
            seqs.append(pa.array([seq] * n, pa.int64()))
            partials.append(pa.array([seq < 2] * n, pa.bool_()))
            ids.append(t["doc_id"].combine_chunks() if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"])
        return pa.table({
            "doc_id": pa.concat_arrays(ids),
            "seq": pa.concat_arrays(seqs),
            "msg": pa.concat_arrays(parts),
            "_partial": pa.concat_arrays(partials),
        })

    rows = ds.map_batches(explode3, batch_format="pyarrow", zero_copy_batch=True)
    merged = Merge("_partial", ["msg"], ["doc_id"], order_by="seq", joiner="").apply(rows)
    return _finish(merged.select_columns(["doc_id", "msg"]))


def q_log_to_metric_agg(sf_dir):
    """log_to_metric → aggregate chain (log_to_metric.rs:27-78 +
    aggregate.rs:72-107): counters (row-count and increment_by_value),
    a set metric, merged per series; cents-rounded sums for stable
    hashing."""
    from vector_ray.stages import Aggregate, LogToMetric

    ds = _rp(sf_dir, "events", columns=["event_type", "user_id", "value"])
    lm = LogToMetric([
        {"type": "counter", "name": "events_total", "tags": {"etype": "{{event_type}}"}},
        {"type": "counter", "name": "value_total", "field": "value",
         "increment_by_value": True, "tags": {"etype": "{{event_type}}"}},
        {"type": "set", "name": "users", "field": "user_id"},
    ])
    agg = Aggregate(tag_keys=["etype"]).apply(lm.apply(ds))

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "name": t["name"],
            "metric_type": t["metric_type"],
            "etype": t["etype"],
            "value_c": pc.cast(pc.round(pc.multiply(t["value"], 100.0), ndigits=0), pa.int64()),
        })

    return _finish(agg.map_batches(final, batch_format="pyarrow"))


def q_ngram_dup_pairs(sf_dir):
    """Exact word-3-gram Jaccard verification (ml/dedup.ngram_jaccard —
    the exact-verify stage behind MinHash candidates) over a planted
    near-dup set: docs 0..39 plus copies of 0..19 with a tail appended.
    Pairs with jaccard >= 0.5; the score ships as floor(1e6·j) so both
    sides use identical integer arithmetic. Oracle recomputes the
    3-gram sets and Jaccard in SQL list algebra."""
    import itertools

    import pyarrow.parquet as pq
    import ray.data as rd

    from vector_ray.ml.dedup import ngram_jaccard

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    base = docs.filter(pc.less(docs["doc_id"], 40))
    dup = docs.filter(pc.less(docs["doc_id"], 20))
    dup = pa.table({
        "doc_id": pc.add(dup["doc_id"], 10_000),
        "text": pc.binary_join_element_wise(dup["text"], " tail extra words here", ""),
    })
    all_docs = pa.concat_tables([base, dup])
    ds = rd.from_arrow(all_docs).repartition(2)

    def pairs(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_pylist()
        texts = g["text"].to_pylist()
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        out_a, out_b, out_j = [], [], []
        for x, y in itertools.combinations(order, 2):
            j = ngram_jaccard(texts[x], texts[y], 3)
            if j >= 0.5:
                out_a.append(ids[x])
                out_b.append(ids[y])
                out_j.append(int(np.floor(1_000_000.0 * j)))
        return pa.table({"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64()),
                         "jac_micro": pa.array(out_j, pa.int64())})

    one = ds.map_batches(lambda t: t.append_column("__g", pa.array([0] * len(t), pa.int8())),
                         batch_format="pyarrow", zero_copy_batch=True)
    return _finish(one.groupby("__g").map_groups(pairs, batch_format="pyarrow"))


def q_topk_users(sf_dir):
    """Top-3 most active users per event_type — two-phase grouped
    top-k (stages/topk.py): grouped count aggregate, then per-key
    ranked selection whose shuffle carries at most k rows per (key,
    block). Integer counts + user-id tie-break keep ranking exact.
    Oracle: QUALIFY row_number."""
    from vector_ray.stages import grouped_aggregate
    from vector_ray.stages.topk import grouped_topk

    ds = _rp(sf_dir, "events", columns=["event_type", "user_id"])
    per_user = grouped_aggregate(ds, ["event_type", "user_id"],
                                 {"n": ("count", "user_id")})
    top = grouped_topk(per_user, ["event_type"], "n", 3, tiebreak="user_id")
    return _finish(top.select_columns(["event_type", "user_id", "n"]))


def q_hopping_window(sf_dir):
    """Overlapping hopping windows (1h size, 30m hop — each event in 2
    windows) via vectorized explode + the two-phase grouped aggregate
    (stages/window.HoppingWindow); oracle re-derives window membership
    with integer epoch arithmetic."""
    from vector_ray.stages.window import HoppingWindow

    ds = _rp(sf_dir, "events", columns=["event_type", "ts", "value"])
    hw = HoppingWindow(["event_type"], "ts", 3600.0, 1800.0,
                       {"n": ("count", "value"), "vs": ("sum", "value")})
    out = hw.apply(ds)

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "window_start": t["window_start"],
            "n": pc.cast(t["n"], pa.int64()),
            "value_sum_c": pc.cast(pc.round(pc.multiply(t["vs"], 100.0), ndigits=0), pa.int64()),
        })

    return _finish(out.map_batches(final, batch_format="pyarrow"))


def q_metric_to_log_json(sf_dir):
    """metric_to_log (metric_to_log.rs:18-21): serialize aggregated
    metric series back into structured log rows with a JSON message.
    The metric values are cents-rounded ints first so the JSON string
    is bit-deterministic; the oracle reconstructs the exact
    sorted-key JSON in SQL string algebra."""
    from vector_ray.stages import Aggregate, LogToMetric, MetricToLog

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    lm = LogToMetric([
        {"type": "counter", "name": "value_total", "field": "value",
         "increment_by_value": True, "tags": {"etype": "{{event_type}}"}},
    ])
    agg = Aggregate(tag_keys=["etype"]).apply(lm.apply(ds))

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            "etype": t["etype"],
            "metric_type": t["metric_type"],
            "name": t["name"],
            "value_c": pc.cast(pc.round(pc.multiply(t["value"], 100.0), ndigits=0), pa.int64()),
        })

    narrowed = agg.map_batches(narrow, batch_format="pyarrow")
    return _finish(MetricToLog().apply(narrowed))


def q_grouped_percentiles(sf_dir):
    """Per-key exact quantiles (the AggregatedSummary per-series
    quantiles, metric.rs:165-169) — distributed three-scan plan
    (stages/quantile.py grouped_exact_quantiles), no sort, driver sees
    only candidate bins. Oracle: quantile_disc GROUP BY."""
    from vector_ray.stages.quantile import grouped_exact_quantiles

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    return grouped_exact_quantiles(ds, "event_type", "value", [0.5, 0.9, 0.99])


def q_token_near_dup(sf_dir):
    """Sequence-level near-dup pairs over the tokenized table (synth +
    100 planted duplicate rows) — TokenMinHash → banded LSH → pairs."""
    import ray.data as rd

    from vector_ray.ml.dedup import token_minhash_pairs
    from vector_ray.sources.synth import synth_table

    t = synth_table(5_000)
    dup = pa.table(
        {
            "doc_id": pa.array([f"dup-{i:04d}" for i in range(100)]),
            "tokens": t["tokens"].slice(0, 100).combine_chunks(),
            "n_tok": t["n_tok"].slice(0, 100).combine_chunks(),
            "source": t["source"].slice(0, 100).combine_chunks(),
        }
    )
    full = pa.concat_tables([t, dup])
    return token_minhash_pairs(rd.from_arrow(full).repartition(4))


_FLAGSHIP_Q_ROWS = 20_000


def _flagship_q_path() -> str:
    from vector_ray.sources.synth import synth_parquet

    return synth_parquet(_FLAGSHIP_Q_ROWS, seed=42, rows_per_file=5_000)


def q_flagship_tokenized(sf_dir):
    """Flagship parse→enrich→route→aggregate over the synthesized
    tokenized-log table (the BASELINE.json input shape; scale-free).
    Oracle-checked: oracle_sql() re-implements the ENTIRE pipeline in
    SQL over the same cached parquet fragments."""
    import glob as _g

    import ray.data as rd

    from vector_ray.pipelines.flagship import flagship_aggregate, parse_enrich_route

    path = _flagship_q_path()
    files = sorted(_g.glob(os.path.join(path, "part-*.parquet")))
    ds = rd.read_parquet(files, override_num_blocks=len(files))
    routed = parse_enrich_route(ds, enrich_concurrency=2)
    agg = flagship_aggregate(routed)

    def final(t: pa.Table) -> pa.Table:
        # count → BIGINT; int32-sourced sums already int64
        return _cast64(t)

    return agg.map_batches(final, batch_format="pyarrow")


# ---------------------------------------------------------------------------


_DAILY_Q_BATCHES = ((1000, 101), (800, 102))  # (rows, seed) per batch


def _daily_q_paths() -> list:
    from vector_ray.sources.synth import synth_parquet

    return [synth_parquet(n, seed=s, rows_per_file=max(200, n // 4))
            for n, s in _DAILY_Q_BATCHES]


def q_daily_pipeline(sf_dir):
    """The composed daily production run (pipelines/daily.run_daily):
    batch 1 then batch 2 ingested through the persistent seen-index
    dedupe → flagship parse/enrich/route → per-run routed commit →
    checkpointed incremental aggregate, then a REPLAY of batch 1
    (must admit zero rows end to end). Returns the cumulative
    per-(lane, source, region) aggregate. The oracle recomputes it
    one-shot in SQL over the distinct union of both batches
    (batch-1-wins on doc_id collisions — exactly what ingest order
    guarantees). The workdir is reset per call so every invocation
    exercises the full ingest + replay path, not a cached state."""
    import glob as _g
    import shutil

    from vector_ray.pipelines.daily import run_daily

    p1, p2 = _daily_q_paths()
    b1 = sorted(_g.glob(os.path.join(p1, "part-*.parquet")))
    b2 = sorted(_g.glob(os.path.join(p2, "part-*.parquet")))
    work = "/tmp/vector_ray_daily_q/work"
    shutil.rmtree(work, ignore_errors=True)
    run_daily(b1, work, enrich_concurrency=2)
    run_daily(b2, work, enrich_concurrency=2)
    res = run_daily(b1, work, enrich_concurrency=2)  # replay
    if res["new_docs"] != 0:
        raise AssertionError("daily replay admitted rows — seen index broken")
    t = res["aggregate"]
    return _cast64(t.sort_by([("lane", "ascending"),
                              ("source", "ascending"),
                              ("region", "ascending")]))


def _daily_oracle_sql() -> str:
    from vector_ray.sources.synth import source_lookup_table

    p1, p2 = _daily_q_paths()  # ensure the parquet exists for DuckDB
    lk = source_lookup_table().to_pylist()
    values = ", ".join(f"('{r['source']}', '{r['region']}', '{r['tier']}')" for r in lk)
    return (
        f"WITH tok AS ("
        f"SELECT *, 1 AS __b FROM read_parquet('{p1}/part-*.parquet') "
        f"UNION ALL SELECT *, 2 AS __b FROM read_parquet('{p2}/part-*.parquet')), "
        "uniq AS (SELECT * FROM tok "
        "QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY __b) = 1), "
        f"lookup(source, region, tier) AS (VALUES {values}), "
        r"parsed AS (SELECT doc_id, n_tok, t.source, "
        r"regexp_extract(doc_id, '^(\w+)-', 1) AS app, "
        r"CAST(regexp_extract(doc_id, '-(\d+)$', 1) AS BIGINT) AS seq, "
        "l.region, l.tier FROM uniq t LEFT JOIN lookup l ON l.source = t.source), "
        "routed AS ("
        "SELECT 'hot' AS lane, * FROM parsed WHERE tier = 'hot' "
        "UNION ALL SELECT 'web', * FROM parsed WHERE app = 'web' "
        "UNION ALL SELECT 'long', * FROM parsed WHERE n_tok >= 1024 "
        "UNION ALL SELECT 'rest', * FROM parsed "
        "WHERE NOT coalesce(tier = 'hot', FALSE) AND NOT coalesce(app = 'web', FALSE) "
        "AND NOT n_tok >= 1024) "
        "SELECT lane, source, region, COUNT(doc_id) AS n_rows, "
        "CAST(SUM(n_tok) AS BIGINT) AS tok_sum, MIN(seq) AS seq_min, MAX(seq) AS seq_max "
        "FROM routed GROUP BY lane, source, region"
    )


_MIXTURE_RATES = {
    **{f"src{i}": 1.0 for i in range(5)},
    **{f"src{i}": 0.5 for i in range(5, 10)},
    **{f"src{i}": 0.25 for i in range(10, 15)},
}


def q_mixture_sample(sf_dir):
    """Per-domain mixture sampling (ml/sampling.py mixture_sample):
    keep each doc with its source's rate, deterministically by
    fnv1a(doc_id|seed). Oracle: independent pure-Python FNV-1a
    reimplementation over the same parquet (tools/golden.py)."""
    from vector_ray.ml.sampling import mixture_sample

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source"])
    out = mixture_sample(
        ds, _MIXTURE_RATES, key_col="source", id_col="doc_id",
        default_rate=0.05, seed=7,
    )
    return _finish(out.select_columns(["doc_id", "source"]))


def q_per_key_cap(sf_dir):
    """Domain quota capping (ml/sampling.py per_key_cap): uniform
    k-without-replacement per source via hash-min reservoir — the k
    smallest salted id-hashes per key, two-phase grouped top-k plan.
    Oracle: per-key sort of pure-Python FNV hashes (tools/golden.py)."""
    from vector_ray.ml.sampling import per_key_cap

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source"])
    out = per_key_cap(ds, "source", 5, id_col="doc_id", seed=3)
    return _finish(out.select_columns(["doc_id", "source"]))


def q_tfidf_docs(sf_dir):
    """Per-doc TF-IDF quality score (ml/corpus.py tfidf_score):
    distributed document-frequency pass (distinct-(word,doc) partials →
    bucketed sum), integer micro-idf broadcast, one map-only scoring
    pass. Oracle: independent single-threaded reimplementation
    (tools/golden.py tfidf_sql) — exact by the integer-sum contract."""
    from vector_ray.ml.corpus import tfidf_score

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return _finish(tfidf_score(ds, col="text", id_col="doc_id"))


def q_stdlib_arrays(sf_dir):
    """Array/regex stdlib leaves in one oracle: parse_regex_all (all
    whole-match hits per row as list<string>, parse_regex_all.rs) and
    append (list ⊕ k items, append.rs — vectorized offset arithmetic)
    vs DuckDB regexp_extract_all / list_concat."""
    from vector_ray.expr import F

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def xform(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "nums": F.parse_regex_all(t["text"], "[0-9]+"),
            "appended": F.append(F.split(t["source"], "c"), ["x", "y"]),
        })

    return _finish(ds.map_batches(xform, batch_format="pyarrow",
                                  zero_copy_batch=True))


def q_token_budget_cap(sf_dir):
    """Per-domain token-budget sampling (ml/sampling.py
    token_budget_cap): per source keep the maximal salted-id-hash-order
    prefix with inclusive n_chars sum <= budget — the "mix N tokens per
    domain" step of corpus assembly. Two-phase: blocks prune rows whose
    LOCAL prefix already overflows and forward one first-overflow
    marker per (key, block); phase 2 cuts at the smallest marker, bit-
    equal to a global single pass. Oracle: pure-Python FNV strict-
    prefix reimplementation (tools/golden.py)."""
    from vector_ray.ml.sampling import token_budget_cap

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    out = token_budget_cap(ds, "source", 4000, weight_col="n_chars",
                           id_col="doc_id", seed=11)
    return _finish(out.select_columns(["doc_id", "source", "n_chars"]))


def q_shuffle_order(sf_dir):
    """Reproducible global shuffle (ml/sampling.py
    deterministic_shuffle): range-partitioned sort by fnv1a(id|seed);
    first 64 rows returned with their position so the ORDER (not just
    the set) is hash-checked. Oracle: pure-Python argsort of the same
    hashes (tools/golden.py)."""
    from vector_ray.ml.sampling import deterministic_shuffle

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source"])
    out = deterministic_shuffle(ds, id_col="doc_id", seed=5)
    head = out.limit(64).to_pandas()
    return pa.table({
        "pos": pa.array(range(len(head)), pa.int64()),
        "doc_id": pa.array(head["doc_id"].astype("int64"), pa.int64()),
    })


def q_token_dedup_collapse(sf_dir):
    """Near-dup CLUSTER COLLAPSE over tokenized sequences
    (ml/dedup.py token_minhash_dedup): LSH pairs → union-find → keep
    the lexicographically smallest id per cluster, broadcast drop set.
    Same planted-dup input as token_near_dup; oracle is an independent
    pairs+union-find reimplementation (tools/golden.py)."""
    import ray.data as rd

    from vector_ray.ml.dedup import token_minhash_dedup
    from vector_ray.sources.synth import synth_table

    t = synth_table(5_000)
    dup = pa.table({
        "doc_id": pa.array([f"dup-{i:04d}" for i in range(100)]),
        "tokens": t["tokens"].slice(0, 100).combine_chunks(),
        "n_tok": t["n_tok"].slice(0, 100).combine_chunks(),
        "source": t["source"].slice(0, 100).combine_chunks(),
    })
    full = pa.concat_tables([t, dup])
    kept = token_minhash_dedup(rd.from_arrow(full).repartition(4))
    return kept.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "n_tok": pc.cast(t["n_tok"], pa.int64()),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_vocab_topk(sf_dir):
    """Corpus vocabulary top-k (ml/corpus.py vocab_topk): per-batch
    value_counts partials → bucketed sum per word → two-phase global
    top-k. Oracle: UNNEST word count ORDER BY cnt DESC LIMIT k."""
    from vector_ray.ml.corpus import vocab_topk

    ds = _rp(sf_dir, "documents", columns=["text"])
    return vocab_topk(ds, col="text", k=40)


def q_repetition_docs(sf_dir):
    """Per-document Gopher-style repetition metrics (ml/corpus.py
    repetition_stats) — one vectorized lexsort/reduceat pass per batch,
    no shuffle. Float columns are exact int-ratio divisions so the
    DuckDB oracle is bit-identical."""
    from vector_ray.ml.corpus import repetition_stats

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: repetition_stats(t), batch_format="pyarrow", zero_copy_batch=True
    )


_TOKENS_Q_ROWS = 4_000


def _tokens_q_path() -> str:
    from vector_ray.sources.synth import synth_parquet

    return synth_parquet(_TOKENS_Q_ROWS, seed=11, rows_per_file=1_000)


def _passages_q_path() -> str:
    """Tokenized corpus with PLANTED shared passages: for the first 60
    base docs with ≥64 tokens, add a new doc whose tokens are a 48-token
    span of base doc 2i followed by a 32-token span of base doc 2i+1 —
    so 'found no duplicate passages' fails the oracle."""
    import pyarrow.parquet as pq

    from vector_ray.sources.synth import synth_table

    path = "/tmp/vr_oracle_passages"
    fp = os.path.join(path, "part-0.parquet")
    if not os.path.exists(fp):
        t = synth_table(1_200, seed=23)
        toks = t["tokens"].combine_chunks()
        long_idx = [i for i, nt in enumerate(t["n_tok"].to_pylist()) if nt >= 64][:120]
        ids, planted = [], []
        for i in range(60):
            a = toks[long_idx[2 * i]].as_py()[:48]
            b = toks[long_idx[2 * i + 1]].as_py()[:32]
            ids.append(f"pas-{i:03d}")
            planted.append(a + b)
        extra = pa.table({
            "doc_id": pa.array(ids),
            "tokens": pa.array(planted, pa.list_(pa.int32())),
            "n_tok": pa.array([len(p) for p in planted], pa.int32()),
            "source": pa.array(["planted"] * 60),
        })
        full = pa.concat_tables([t, extra.cast(t.schema)])
        os.makedirs(path, exist_ok=True)
        pq.write_table(full, fp)
    return fp


def q_dup_passages(sf_dir):
    """Intra-corpus duplicate-passage detection (ml/tokens.py
    dup_passages): distinct 16-gram windows per doc that occur in ≥2
    docs — the Lee-et-al substring-dedup signal. Two shuffles: (whash,
    id) pairs bucketed by hash, then per-doc partial sums. Oracle: the
    same spec in DuckDB over n-gram VALUES (list_slice windows joined
    on content, not hash)."""
    import ray.data as rd

    from vector_ray.ml.tokens import dup_passages

    ds = rd.read_parquet(_passages_q_path(), columns=["doc_id", "tokens"])
    return _finish(dup_passages(ds, n=16))


def q_strip_dup_passages(sf_dir):
    """Duplicate-passage REMOVAL (ml/tokens.py strip_dup_passages —
    the curation action behind dup_passages's score): drop every token
    covered by a 16-gram window shared by ≥2 docs; same planted-passage
    corpus, same two-pass plan (shuffle moves (whash, cnt) partials
    only). Oracle: independent brute-force reimplementation with a
    per-row polynomial checksum of the stripped sequence
    (tools/golden.py strip_dup_passages_sql)."""
    import ray.data as rd

    from vector_ray.ml.tokens import strip_dup_passages

    ds = rd.read_parquet(_passages_q_path(), columns=["doc_id", "tokens"])
    out = strip_dup_passages(ds, n=16, min_docs=2)
    return _finish(out.select_columns(["doc_id", "n_tok", "n_removed",
                                       "tok_hash"]))


def q_pack_sequences(sf_dir):
    """Greedy sequence packing into ≤2048-token training examples
    (ml/tokens.py pack_sequences) over the north-rule tokenized table.
    Columns pruned at the read — packing needs lengths, not tokens.
    Oracle: independent row-loop reimplementation (tools/golden.py)."""
    import ray.data as rd

    from vector_ray.ml.tokens import pack_sequences

    ds = rd.read_parquet(_tokens_q_path(), columns=["doc_id", "n_tok", "source"])
    out = pack_sequences(ds, 2048)
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("shard"), "shard",
            pc.cast(t["shard"], pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_chunk_sequences(sf_dir):
    """Split sequences into 512-token windows with 64-token overlap
    (ml/tokens.py chunk_sequences) — stateless vectorized 1→N, no
    shuffle. Compared by per-chunk length + token checksum (the SQL
    list_slice oracle recomputes both)."""
    import ray.data as rd

    from vector_ray.ml.tokens import chunk_sequences

    ds = rd.read_parquet(_tokens_q_path(), columns=["doc_id", "tokens"])
    out = chunk_sequences(ds, 512, overlap=64)

    def checksum(t: pa.Table) -> pa.Table:
        toks = t["tokens"].combine_chunks()
        vals = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), dtype=np.int64)
        offs = np.asarray(toks.offsets, np.int64)
        rel = offs - offs[0]
        cs = np.concatenate([[0], np.cumsum(vals)])
        sums = cs[rel[1:]] - cs[rel[:-1]]
        return pa.table({
            "doc_id": t["doc_id"],
            "chunk_id": t["chunk_id"],
            "n_tok": t["n_tok"],
            "tok_sum": pa.array(sums),
        })

    return out.map_batches(checksum, batch_format="pyarrow", zero_copy_batch=True)


def _decontam_bench_table():
    """Benchmark = 30 corpus rows (ids 100..129) → those docs are
    contaminated by construction; short rows (n_tok < 8) stay clean."""
    from vector_ray.sources.synth import synth_table

    return synth_table(np.arange(100, 130), seed=11)


def q_decontaminate(sf_dir):
    """Eval-set decontamination (ml/tokens.py decontaminate): flag docs
    sharing any 8-token n-gram with the benchmark. Benchmark hashes
    broadcast once; one vectorized rolling-hash probe per batch.
    Oracle: exact list_slice n-gram SEMI JOIN in DuckDB."""
    import ray.data as rd

    from vector_ray.ml.tokens import decontaminate

    ds = rd.read_parquet(_tokens_q_path(), columns=["doc_id", "tokens"])
    out = decontaminate(ds, _decontam_bench_table(), n=8, mode="flag")
    return out.select_columns(["doc_id", "contaminated"])


def entry() -> Any:
    """Flagship-shaped pipeline over sf0.001 documents: regex-parse →
    enrich → route(copy) → per-lane aggregate. Returns the aggregate
    Dataset (small)."""
    import ray.data as rd

    from vector_ray.expr import C
    from vector_ray.stages import Enrich, EnrichmentTable, RegexParser, Route, grouped_aggregate

    sf_dir = "/root/testdata/sf0.001"
    ds = _rp(sf_dir, "documents")
    parser = RegexParser("source", [r"src(?P<src_num>\d+)"], types={"src_num": "int"}, drop_field=False)
    ds = parser.apply(ds)
    # derived lookup: source → bucket (deterministic small side)
    srcs = sorted(set(pa.parquet.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["source"])["source"].to_pylist()))
    lookup = pa.table({"source": srcs, "bucket": [f"b{int(s[3:]) % 4}" for s in srcs]})
    ds = Enrich(EnrichmentTable(lookup, key=["source"]), concurrency=2).apply(ds)
    route = Route({"en": C.eq("lang", "en"), "long": C.ge("n_chars", 300)}, unmatched_lane="rest")
    routed = route.explode(ds)
    return grouped_aggregate(
        routed, ["lane", "bucket"], {"n_docs": ("count", "doc_id"), "chars_sum": ("sum", "n_chars")}
    )


def q_quantile_band(sf_dir):
    """Quantile-band filter (stages/quantile.py quantile_band_filter):
    CCNet-style keep-the-middle-band selection on a score column —
    exact quantile_disc edges via the shuffle-free histogram-refinement
    plan, then a stateless map-only filter. Oracle: scalar-subquery
    quantile_disc bounds."""
    from vector_ray.stages.quantile import quantile_band_filter

    ds = _rp(sf_dir, "events", columns=["event_id", "user_id", "value"])
    return _finish(quantile_band_filter(ds, "value", 0.25, 0.75))


def q_row_number_docs(sf_dir):
    """Distributed ROW_NUMBER (stages/rownum.py global_row_number):
    one range-partitioned sort, per-block (first-key, count) stats —
    O(#blocks) driver state — then offset+arange per block. Oracle:
    ANSI ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id DESC) - 1.
    Also emits ``shard = row_id // 1000`` (fixed-size training shards)."""
    from vector_ray.stages.rownum import global_row_number

    ds = _rp(sf_dir, "documents", columns=["doc_id", "n_chars"])
    out = global_row_number(ds.repartition(5), ["n_chars", "doc_id"],
                            descending=True, shard_size=1000)
    return _finish(out)


def q_rank_orders(sf_dir):
    """Exact GLOBAL percent_rank/cume_dist (stages/rownum.rank_values):
    per-block (value, count) partials keyed by the float64 bit pattern,
    one narrow distinct-value shuffle, block-offset prefix sum
    (O(#blocks) driver state), bucketed join back to (id, value).
    Oracle: ANSI percent_rank()/cume_dist() OVER (ORDER BY ...)."""
    from vector_ray.stages.rownum import rank_values

    ds = _rp(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return _finish(rank_values(ds.repartition(5), "o_totalprice",
                               id_col="o_orderkey"))


def q_auc_events(sf_dir):
    """Exact distributed ROC-AUC (ml/metrics.auc_score): tie-aware
    Mann-Whitney U over distinct-score count partials — all int64
    until the final division, O(#blocks) driver state. Score = value,
    positive = event_type ∈ {click, purchase}. Oracle: the same rank
    statistic via ANSI window SQL."""
    from vector_ray.ml.metrics import auc_score

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])

    def lab(t: pa.Table) -> pa.Table:
        # null event_type → null label (excluded), matching the
        # oracle's WHERE event_type IS NOT NULL
        y = pc.if_else(pc.is_valid(t["event_type"]),
                       pc.is_in(t["event_type"],
                                value_set=pa.array(["click",
                                                    "purchase"])),
                       pa.scalar(None, pa.bool_()))
        return pa.table({"s": t["value"], "y": y})

    labeled = ds.map_batches(lab, batch_format="pyarrow",
                             zero_copy_batch=True)
    return auc_score(labeled.repartition(5), "s", "y")


def q_quantiles_cont(sf_dir):
    """Interpolated global quantiles (stages/quantile.
    exact_quantiles_cont): SQL quantile_cont semantics via the
    sort-free iterative histogram-refinement rank machinery — both
    neighbouring order statistics fetch in one shared-scan call,
    interpolation mirrors DuckDB's float64 expression order. Oracle:
    quantile_cont()."""
    from vector_ray.stages.quantile import exact_quantiles_cont

    ds = _rp(sf_dir, "lineitem", columns=["l_extendedprice"])
    ps = [0.01, 0.25, 0.5, 0.9, 0.99]
    vals = exact_quantiles_cont(ds.repartition(5), "l_extendedprice",
                                ps)
    return pa.table({"p": pa.array(ps, pa.float64()),
                     "v": pa.array(vals, pa.float64())})


def q_ks_drift(sf_dir):
    """Exact two-sample Kolmogorov-Smirnov drift statistic
    (ml/metrics.ks_test): per-side distinct-value partials, one narrow
    union shuffle, two O(#blocks) passes over the sorted distinct
    table. Sides = events split by user_id parity. Oracle: ANSI window
    cumulative CDFs + MAX ABS difference."""
    import numpy as np
    import ray.data as rd

    from vector_ray.ml.metrics import ks_test

    ds = _rp(sf_dir, "events", columns=["user_id", "value"])

    def side(par: int):
        def fn(t: pa.Table) -> pa.Table:
            uid = np.asarray(pc.cast(t["user_id"], pa.int64())
                             .combine_chunks()
                             .to_numpy(zero_copy_only=False), np.int64)
            keep = pc.and_(pc.is_valid(t["user_id"]),
                           pa.array(uid % 2 == par))
            return pa.table({"v": t["value"]}).filter(keep)

        return fn

    a = ds.map_batches(side(0), batch_format="pyarrow",
                       zero_copy_batch=True).repartition(4)
    b = ds.map_batches(side(1), batch_format="pyarrow",
                       zero_copy_batch=True).repartition(3)
    return rd.from_arrow(ks_test(a, b, "v"))


def q_chi2_drift(sf_dir):
    """Two-sample chi-square drift over event_type (sides = user_id
    parity; ml/metrics.chi2_drift): exact per-side counts, one narrow
    union shuffle, fixed sorted-category float64 summation. Oracle:
    independent mirror (tools/golden.chi2_drift_sql)."""
    import numpy as np
    import ray.data as rd

    from vector_ray.ml.metrics import chi2_drift

    ds = _rp(sf_dir, "events", columns=["user_id", "event_type"])

    def side(par: int):
        def fn(t: pa.Table) -> pa.Table:
            uid = np.asarray(pc.cast(t["user_id"], pa.int64())
                             .combine_chunks()
                             .to_numpy(zero_copy_only=False), np.int64)
            keep = pc.and_(pc.is_valid(t["user_id"]),
                           pa.array(uid % 2 == par))
            return pa.table({"event_type": t["event_type"]}).filter(keep)

        return fn

    a = ds.map_batches(side(0), batch_format="pyarrow",
                       zero_copy_batch=True).repartition(4)
    b = ds.map_batches(side(1), batch_format="pyarrow",
                       zero_copy_batch=True).repartition(3)
    return rd.from_arrow(chi2_drift(a, b, "event_type"))


def q_throttle_events(sf_dir):
    """Per-key rate limit (stages/throttle.throttle): keep the first 2
    events per (user, UTC day) in (ts, event_id) order — the newer
    reference's throttle transform as a deterministic batch plan
    (grouped_topk two-phase: per-block local cap, one bucketed merge;
    ≤ threshold×blocks rows per (key, window) cross the exchange).
    Oracle: ANSI ROW_NUMBER over (user, day) partitions."""
    from vector_ray.stages.throttle import throttle

    ds = _rp(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "event_type"])
    out = throttle(ds, "user_id", "ts", threshold=2,
                   window=86_400_000_000, tiebreak="event_id")

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_type": t["event_type"],
        })

    return _finish(out.map_batches(proj, batch_format="pyarrow",
                                   zero_copy_batch=True))


def q_ttl_dedupe_events(sf_dir):
    """TTL-cache dedupe (stages/throttle.ttl_dedupe): per user, keep
    the first event then every next event ≥ 12 h after the LAST KEPT
    one — the reference dedupe transform's cache-with-TTL semantics
    (src/transforms/dedupe.rs:15-60) replayed deterministically. One
    key-hash exchange; the greedy chain resolves per bucket with a
    frontier loop vectorized ACROSS keys (searchsorted successor map;
    Python rounds = max chain length, not rows). Oracle: recursive
    CTE MIN-aggregate chain — exactly the greedy recurrence."""
    from vector_ray.stages.throttle import ttl_dedupe

    ds = _rp(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "value"])
    out = ttl_dedupe(ds, "user_id", "ts", ttl=43_200_000_000,
                     tiebreak="event_id")

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "value": t["value"],
        })

    return _finish(out.map_batches(proj, batch_format="pyarrow",
                                   zero_copy_batch=True))


def q_session_paths(sf_dir):
    """Top-k session journeys (stages/paths.session_paths): gap-8h
    sessionization per user, first-3-event-type path strings, global
    top-25 by session count (ties by path asc). One narrow (user, ts,
    type) exchange; paths render per bucket via ListArray +
    binary_join (no per-session Python); only (path, cnt) partials
    leave; two-phase global top-k merge. Oracle: ANSI LAG-break +
    SUM-over-rows session ids + STRING_AGG + ranked LIMIT."""
    from vector_ray.stages.paths import session_paths

    ds = _rp(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                        "event_type"])
    return _finish(session_paths(
        ds, key="user_id", ts_col="ts", type_col="event_type",
        gap=28_800_000_000, max_steps=3, k=25, sep=">",
        tiebreak="event_id"))


def q_assign_sessions(sf_dir):
    """Session labeling (stages/sessions.assign_sessions): every event
    tagged with its 0-based per-user session ordinal (8 h gap) and
    position-in-session — one narrow (user, ts, id) exchange, flat
    cumsum labeling per bucket. Oracle: ANSI LAG-break + SUM-over-rows
    + ROW_NUMBER."""
    from vector_ray.stages.sessions import assign_sessions

    ds = _rp(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    out = assign_sessions(ds, "user_id", "ts", gap=28_800_000_000,
                          tiebreak="event_id")

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "session_seq": t["session_seq"],
            "session_pos": t["session_pos"],
        })

    return _finish(out.map_batches(proj, batch_format="pyarrow",
                                   zero_copy_batch=True))


def q_interval_join(sf_dir):
    """Interval-OVERLAP join (stages/intervals.interval_join): even
    events' [ts, ts+1-7h] spans vs odd events' [ts, ts+1.5-7.5h]
    spans per user. Chunk-replicated (4h slabs), one (key, slab)
    exchange, per-group two-sided contiguous-range enumeration over
    start-sorted sides (work O(output), no post-filter), pairs
    deduped by the max(start)-slab rule. Oracle: plain SQL inner
    join on overlap."""
    from vector_ray.stages.intervals import interval_join

    ds = _rp(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def spans(parity: int, ident: str, width_mod: int, width_us: int):
        def fn(t: pa.Table) -> pa.Table:
            import numpy as np

            eid = np.asarray(pc.cast(t["event_id"], pa.int64())
                             .combine_chunks()
                             .to_numpy(zero_copy_only=False), np.int64)
            t = t.filter(pa.array(eid % 2 == parity))
            eid = eid[eid % 2 == parity]
            s = pc.cast(t["ts"], pa.int64())
            width = pa.array((eid % width_mod + 1) * width_us, pa.int64())
            return pa.table({"user_id": t["user_id"],
                             ident + "_id": t["event_id"],
                             ident + "_s": s,
                             ident + "_e": pc.add(s, width)})

        return fn

    a = ds.map_batches(spans(0, "a", 7, 3_600_000_000),
                       batch_format="pyarrow", zero_copy_batch=True)
    b = ds.map_batches(spans(1, "b", 5, 5_400_000_000),
                       batch_format="pyarrow", zero_copy_batch=True)
    out = interval_join(a, b, keys="user_id", l_start="a_s",
                        l_end="a_e", r_start="b_s", r_end="b_e",
                        chunk=14_400_000_000)
    return _finish(out)


def q_psi_drift(sf_dir):
    """Population Stability Index over event_type (sides = user_id
    parity; ml/metrics.psi_drift): chi2_drift's exact-count plan, PSI
    evaluated in fixed sorted-category numpy order. Oracle:
    independent mirror (tools/golden.psi_drift_sql)."""
    import numpy as np
    import ray.data as rd

    from vector_ray.ml.metrics import psi_drift

    ds = _rp(sf_dir, "events", columns=["user_id", "event_type"])

    def side(par: int):
        def fn(t: pa.Table) -> pa.Table:
            uid = np.asarray(pc.cast(t["user_id"], pa.int64())
                             .combine_chunks()
                             .to_numpy(zero_copy_only=False), np.int64)
            keep = pc.and_(pc.is_valid(t["user_id"]),
                           pa.array(uid % 2 == par))
            return pa.table({"event_type": t["event_type"]}).filter(keep)

        return fn

    a = ds.map_batches(side(0), batch_format="pyarrow",
                       zero_copy_batch=True).repartition(4)
    b = ds.map_batches(side(1), batch_format="pyarrow",
                       zero_copy_batch=True).repartition(3)
    return rd.from_arrow(psi_drift(a, b, "event_type"))


def q_grouped_quantiles_cont(sf_dir):
    """Per-key interpolated quantiles (grouped_exact_quantiles with
    interpolation="cont"): each p contributes two rank requests to the
    same three-scan distributed plan; interpolation mirrors DuckDB's
    symmetric float64 form. Oracle: GROUP BY quantile_cont()."""
    import ray.data as rd

    from vector_ray.stages.quantile import grouped_exact_quantiles

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    out = grouped_exact_quantiles(ds.repartition(5), "event_type",
                                  "value", [0.25, 0.5, 0.9],
                                  interpolation="cont")
    return rd.from_arrow(out)


def q_classification_report(sf_dir):
    """Per-threshold confusion counts + precision/recall/F1
    (ml/metrics.classification_report): one map-only pass with
    |thresholds|-row partials, one tiny grouped sum, single float64
    divisions of exact int64 counts. Oracle: ANSI conditional
    aggregation per threshold."""
    from vector_ray.ml.metrics import classification_report

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])

    def lab(t: pa.Table) -> pa.Table:
        y = pc.if_else(pc.is_valid(t["event_type"]),
                       pc.is_in(t["event_type"],
                                value_set=pa.array(["click",
                                                    "purchase"])),
                       pa.scalar(None, pa.bool_()))
        return pa.table({"s": t["value"], "y": y})

    labeled = ds.map_batches(lab, batch_format="pyarrow",
                             zero_copy_batch=True)
    return classification_report(labeled.repartition(5), "s", "y",
                                 [10.0, 25.0, 50.0, 75.0, 90.0])


def q_triangles(sf_dir):
    """Exact triangle count (ml/graph.triangle_count): degree-ordered
    compact-forward — canonical dedupe, two rank joins, per-source
    wedge enumeration (vectorized triu per sorted run), wedge ⋈ edge
    closure — every exchange (int64, int64) pairs. Same planted host
    graph as pagerank_hosts; oracle: ANSI three-way self-join
    (tools/golden.triangles_sql)."""
    import ray.data as rd

    from tools.golden import pr_graph
    from vector_ray.ml.graph import triangle_count

    src, dst = pr_graph(sf_dir)
    tbl = pa.table({"src": pa.array(src, pa.int64()),
                    "dst": pa.array(dst, pa.int64())})
    return triangle_count(rd.from_arrow(tbl).repartition(4))


def q_grouped_auc(sf_dir):
    """Per-slice exact ROC-AUC (ml/metrics.grouped_auc): distinct-
    (key, score) count partials, one bucketed exchange, run-segmented
    vectorized rank sums. Slices = user_id % 4. Oracle: the same rank
    statistic with PARTITION BY in ANSI SQL."""
    from vector_ray.ml.metrics import grouped_auc

    ds = _rp(sf_dir, "events",
             columns=["event_type", "user_id", "value"])

    def lab(t: pa.Table) -> pa.Table:
        import numpy as np

        y = pc.if_else(pc.is_valid(t["event_type"]),
                       pc.is_in(t["event_type"],
                                value_set=pa.array(["click",
                                                    "purchase"])),
                       pa.scalar(None, pa.bool_()))
        uid = np.asarray(pc.cast(t["user_id"], pa.int64())
                         .combine_chunks()
                         .to_numpy(zero_copy_only=False), np.int64)
        seg = pa.array(np.char.add("seg", (uid % 4).astype("U1")))
        return pa.table({"seg": seg, "s": t["value"], "y": y})

    labeled = ds.map_batches(lab, batch_format="pyarrow",
                             zero_copy_batch=True)
    return _finish(grouped_auc(labeled.repartition(5), "seg", "s", "y"))


def q_pmi_pairs(sf_dir):
    """Word-pair collocations by PMI (ml/corpus.pmi_pairs): exact
    vocab pass + broadcast vocab + map-only windowed pair partials +
    one narrow (pair, count) shuffle; bounded driver fan-in for the
    final PMI ranking. Oracle: independent single-threaded mirror
    (tools/golden.pmi_pairs_sql) with the same float64 op order."""
    import ray.data as rd

    from vector_ray.ml.corpus import pmi_pairs

    ds = _rp(sf_dir, "documents", columns=["text"]).repartition(4)
    return pmi_pairs(ds, window=2, vocab_size=500, min_count=5, k=40)


def q_weighted_key_cap(sf_dir):
    """Per-key WEIGHTED k-without-replacement
    (ml/sampling.weighted_per_key_cap): Gumbel top-k within each
    source, weight = n_chars, deterministic by (doc_id, seed). Oracle:
    independent scalar mirror (tools/golden.weighted_per_key_cap_sql)."""
    from vector_ray.ml.sampling import weighted_per_key_cap

    ds = _rp(sf_dir, "documents",
             columns=["doc_id", "source", "n_chars"]).repartition(4)
    out = weighted_per_key_cap(ds, "source", 5, "n_chars", seed=3)
    return _finish(out.map_batches(
        lambda t: t.select(["doc_id", "source"]),
        batch_format="pyarrow", zero_copy_batch=True))


def q_dedup_keep_best(sf_dir):
    """Near-dup cluster canonicalization (ml/dedup.dedup_keep_best):
    token_minhash_pairs edges → union-find → keep the max-n_tok member
    per cluster (tie: smallest id), stream-filter the rest. Same
    synth-with-planted-dups corpus as token_near_dup; oracle:
    independent mirror (tools/golden.dedup_keep_best_sql)."""
    import ray.data as rd

    from vector_ray.ml.dedup import dedup_keep_best, token_minhash_pairs
    from vector_ray.sources.synth import synth_table

    t = synth_table(5_000)
    dup = pa.table({
        "doc_id": pa.array([f"dup-{i:04d}" for i in range(100)]),
        "tokens": t["tokens"].slice(0, 100).combine_chunks(),
        "n_tok": t["n_tok"].slice(0, 100).combine_chunks(),
        "source": t["source"].slice(0, 100).combine_chunks(),
    })
    full = rd.from_arrow(pa.concat_tables([t, dup])).repartition(4)
    pairs = token_minhash_pairs(full)
    kept = dedup_keep_best(full, pairs, id_col="doc_id",
                           quality_col="n_tok")
    return _finish(kept.map_batches(
        lambda b: b.select(["doc_id", "n_tok"]),
        batch_format="pyarrow", zero_copy_batch=True))


def q_merge_intervals(sf_dir):
    """Per-key interval union (stages/intervals.merge_intervals):
    gaps-and-islands over [ts, ts + width] spans per user — one narrow
    (key, start, end) shuffle, per-bucket sort + segmented cummax scan
    (Hillis-Steele), no per-key Python. Width derives from event_id so
    both sides stay in exact int64 arithmetic. Oracle: ANSI window
    MAX-over-preceding break detection + SUM-over-rows island ids."""
    from vector_ray.stages.intervals import merge_intervals

    ds = _rp(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def spans(t: pa.Table) -> pa.Table:
        import numpy as np

        s = pc.cast(t["ts"], pa.int64())
        eid = np.asarray(pc.cast(t["event_id"], pa.int64())
                         .combine_chunks()
                         .to_numpy(zero_copy_only=False), np.int64)
        width = pa.array((eid % 7 + 1) * 60_000_000, pa.int64())
        return pa.table({"user_id": t["user_id"], "s": s,
                         "e": pc.add(s, width)})

    iv = ds.map_batches(spans, batch_format="pyarrow",
                        zero_copy_batch=True)
    return _finish(merge_intervals(iv, "user_id", "s", "e",
                                   out_start="span_start",
                                   out_end="span_end",
                                   count_col="n_spans"))


def q_uniform_sample_docs(sf_dir):
    """Global exactly-k uniform sample (ml/sampling.py uniform_sample_k):
    bottom-k of sm64(fnv1a(doc_id|seed)) — per-block local bottom-k then
    one ≤ k×blocks-row merge, no shuffle of the raw data. Oracle:
    pure-Python salted-hash sort (tools/golden.py uniform_sample_k_sql)."""
    from vector_ray.ml.sampling import uniform_sample_k

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source"])
    out = uniform_sample_k(ds.repartition(6), 37, id_col="doc_id", seed=5)
    return _finish(out.select_columns(["doc_id", "source"]))


def q_heavy_hitters(sf_dir):
    """Misra-Gries heavy hitters (ml/corpus.py heavy_hitters) over the
    synthetic pre-tokenized corpus (50k-id vocabulary, ~1M tokens):
    mergeable bounded-memory summaries — ≤ capacity counters leave each
    block. capacity ≥ global distinct here, so the sketch is provably
    exact and the plain SQL GROUP BY top-k is a valid oracle; the
    sketch path (capacity < distinct) is property-tested in
    tests/test_corpus_tokens.py against the n/(capacity+1) MG bound."""
    import ray.data as rd

    from vector_ray.ml.corpus import heavy_hitters

    ds = rd.read_parquet(_tokens_q_path(), columns=["tokens"])
    return _finish(heavy_hitters(ds, col="tokens", k=25, capacity=60_000,
                                 mode="tokens"))


def q_stats_pruned_read(sf_dir):
    """File-stats data skipping (state/datastats.py): cluster-write
    events by value (zorder_write), build the footer-stats manifest
    (map-only over file paths, no data pages), then answer a range
    query opening ONLY overlapping files + exact residual filter —
    pruning is asserted in-query. Oracle: plain SQL range filter +
    GROUP BY over the source table."""
    import tempfile

    from vector_ray.stages import grouped_aggregate
    from vector_ray.stages.zorder import zorder_write
    from vector_ray.state.datastats import (prune_paths, pruned_read,
                                            stats_index_build)

    root = tempfile.mkdtemp(prefix="vr_statslake_")
    ds = _rp(sf_dir, "events",
             columns=["event_id", "event_type", "value"]).repartition(12)
    zorder_write(ds, root, ["value"], bits=16)
    stats_index_build(root, cols=["value"])
    lo, hi = 50.0, 70.0
    kept, total = prune_paths(root, "value", lo, hi)
    assert len(kept) < len(total), (
        f"stats pruning had no effect: {len(kept)}/{len(total)} files")
    out = pruned_read(root, "value", lo, hi,
                      columns=["event_id", "event_type", "value"])
    agg = grouped_aggregate(out, ["event_type"], {
        "n": ("count", "event_id"),
        "vsum": ("sum", "value"),
    })

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "n": t["n"],
            "value_sum_c": pc.cast(
                pc.round(pc.multiply(t["vsum"], 100.0), ndigits=0),
                pa.int64()),
        })

    return _finish(agg.map_batches(cents, batch_format="pyarrow"))


def q_seen_filter_docs(sf_dir):
    """Persistent seen-key index (state/seen.py): cross-run exact
    dedup — build the index over one ingest (even n_chars), append a
    second (odd n_chars, lang='en'), then filter the full table: only
    never-seen doc_ids survive the bucketed anti-join (key VALUES
    stored, never hashes — collisions can't drop rows). Oracle:
    NOT IN over the same two ingest sets."""
    import tempfile

    from vector_ray.state.seen import (seen_index_append, seen_index_build,
                                       seen_index_filter)

    docs = _rp(sf_dir, "documents",
               columns=["doc_id", "lang", "source", "n_chars"])
    root = tempfile.mkdtemp(prefix="vr_seen_")

    def even(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(pc.bit_wise_and(t["n_chars"], 1), 0))

    def odd_en(t: pa.Table) -> pa.Table:
        m = pc.and_kleene(pc.equal(pc.bit_wise_and(t["n_chars"], 1), 1),
                          pc.equal(t["lang"], "en"))
        return t.filter(pc.fill_null(m, False))

    seen_index_build(docs.map_batches(even, batch_format="pyarrow",
                                      zero_copy_batch=True),
                     ["doc_id"], root)
    seen_index_append(docs.map_batches(odd_en, batch_format="pyarrow",
                                       zero_copy_batch=True),
                      ["doc_id"], root)
    out = seen_index_filter(docs, ["doc_id"], root)
    return _finish(out.select_columns(["doc_id", "lang", "source", "n_chars"]))


def q_incremental_agg(sf_dir):
    """Checkpointed incremental aggregation (state/incremental.py):
    the events table split into two fragment sets is fed in two
    update() calls — the second scans ONLY its new fragments and
    merges parquet-persisted partials (count/sum/min/max + mean as
    sum,count channels); a third replay call scans nothing (asserted).
    Oracle: plain GROUP BY over the full table — the incremental path
    must be indistinguishable from a one-shot aggregate."""
    import tempfile

    from vector_ray.state.incremental import IncrementalAggregate

    work = tempfile.mkdtemp(prefix="vr_incagg_")
    ds = _rp(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def half(rem: int):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(pc.bit_wise_and(t["event_id"], 1), rem))

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    a_dir, b_dir = os.path.join(work, "a"), os.path.join(work, "b")
    half(0).write_parquet(a_dir)
    half(1).write_parquet(b_dir)
    inc = IncrementalAggregate(os.path.join(work, "state"), ["event_type"], {
        "n": ("count", "event_id"),
        "vsum": ("sum", "value"),
        "vmin": ("min", "value"),
        "vmax": ("max", "value"),
        "vavg": ("mean", "value"),
        "vvar": ("var", "value"),
    })
    inc.update(a_dir)
    inc.update([a_dir, b_dir])
    replay = inc.update(a_dir)
    assert replay["new_fragments"] == 0, "replay re-scanned fragments"
    out = inc.result()

    def fixp(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "n": t["n"],
            "value_sum_c": pc.cast(
                pc.round(pc.multiply(t["vsum"], 100.0), ndigits=0), pa.int64()),
            "vmin": t["vmin"],
            "vmax": t["vmax"],
            "value_avg_u": pc.cast(
                pc.round(pc.multiply(t["vavg"], 1e6), ndigits=0), pa.int64()),
            "value_var_u": pc.cast(
                pc.round(pc.multiply(t["vvar"], 1e6), ndigits=0), pa.int64()),
        })

    return _finish(out.map_batches(fixp, batch_format="pyarrow"))


def q_minhash_ingest(sf_dir):
    """Cross-run near-dup ingest (ml/dedup.minhash_index_ingest): the
    old half is the persisted LSH index; the new half is ONE ingest
    step — probe, drop batch rows whose near-dup is indexed, append
    the survivors' buckets+signatures. Result = the surviving rows.
    Oracle: batch ids minus the cross-split dup set of the golden LSH
    pair list (tools/golden.py minhash_ingest_sql)."""
    import tempfile

    from vector_ray.ml.dedup import minhash_index_build, minhash_index_ingest

    def half(lo: bool):
        def f(t: pa.Table) -> pa.Table:
            m = pc.less(t["doc_id"], 250)
            return t.filter(m if lo else pc.invert(m))

        return _rp(sf_dir, "documents",
                   columns=["doc_id", "text", "n_chars"]) \
            .map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    idx = tempfile.mkdtemp(prefix="vr_mhing_")
    minhash_index_build(half(True), idx)
    out = minhash_index_ingest(half(False), idx)
    return _finish(out.select_columns(["doc_id", "n_chars"]))


def q_seen_ttl_users(sf_dir):
    """Seen-index TTL retention (state/seen.py seen_index_expire): the
    even-event_id half registers each user's newest sighting; expiry
    drops users last seen before the global median-ish cutoff; the odd
    half then filters against the SURVIVING set — expired users flow
    through as new again. Oracle: NOT IN over the HAVING-MAX surviving
    users in plain SQL."""
    import tempfile

    from vector_ray.state.seen import (seen_index_build, seen_index_expire,
                                       seen_index_filter)

    ds = _rp(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "value"])

    def half(rem: int):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(pc.bit_wise_and(t["event_id"], 1), rem))
            return pa.table({
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": pc.cast(pc.cast(t["ts"], pa.int64()), pa.int64()),
                "value": t["value"],
            })

        return ds.map_batches(f, batch_format="pyarrow",
                              zero_copy_batch=True)

    root = tempfile.mkdtemp(prefix="vr_seenttl_")
    seen_index_build(half(0), ["user_id"], root, ts_col="ts_us")
    # fixed cutoff: 2024-01-29 in epoch-µs (near the end of the
    # synthetic range so a meaningful user subset expires)
    cutoff = 1_706_486_400_000_000
    seen_index_expire(root, cutoff)
    out = seen_index_filter(half(1), ["user_id"], root)
    return _finish(out.select_columns(["event_id", "user_id", "value"]))


def q_template_novelty(sf_dir):
    """Persisted-template novelty detection (stages/templates.py
    template_index_build/template_novelty): the even-event_id half of
    the rendered log lines is the index, the odd half the day's batch;
    each (token_count, first_token) group classifies as new_group /
    changed (a stored constant widens) / known. Oracle: the same
    per-position DISTINCT-count CASE logic split by parity in plain
    SQL."""
    import tempfile

    from vector_ray.stages.templates import template_index_build, template_novelty

    ds = _rp(sf_dir, "events",
             columns=["event_id", "event_type", "user_id", "value"])

    def render(half):
        def f(t: pa.Table) -> pa.Table:
            keep = pc.equal(pc.bit_wise_and(t["event_id"], 1), half)
            t = t.filter(keep)
            hl = pc.if_else(pc.greater_equal(t["value"], 0.5),
                            pa.scalar("high"), pa.scalar("low"))
            msg = pc.binary_join_element_wise(
                pc.cast(t["event_type"], pa.string()), pa.scalar("user"),
                pc.cast(t["user_id"], pa.string()), pa.scalar("value"),
                hl, pa.scalar(" "))
            return pa.table({"message": msg})

        return ds.map_batches(f, batch_format="pyarrow",
                              zero_copy_batch=True)

    idx = tempfile.mkdtemp(prefix="vr_tplidx_")
    template_index_build(render(0), idx)
    return _finish(template_novelty(render(1), idx))


def q_lake_delete_compact(sf_dir):
    """Lake maintenance (state/maintain.py): documents written as a
    multi-file clustered lake, doc_ids ≡ 0 (mod 7) erased via
    manifest-pruned targeted rewrites (delete_by_keys — only candidate
    files are opened), then small files folded by compact_files
    (per-directory merge, no shuffle); the surviving lake reads back
    byte-identical to the SQL anti-filter. Oracle: plain NOT-divisible
    filter over the source table."""
    import tempfile

    from vector_ray.stages.zorder import zorder_write
    from vector_ray.state.datastats import stats_index_build
    from vector_ray.state.maintain import compact_files, delete_by_keys

    root = tempfile.mkdtemp(prefix="vr_lake_")
    ds = _rp(sf_dir, "documents",
             columns=["doc_id", "lang", "source", "n_chars"]).repartition(8)
    zorder_write(ds, root, ["doc_id"], bits=16)
    stats_index_build(root)
    # the keys to erase: every doc_id divisible by 7 (ids are dense
    # from 0; the range bound covers every driver scale)
    stats = delete_by_keys(root, "doc_id", list(range(0, 200_000, 7)))
    assert stats["files_scanned"] >= 1
    compact_files(root, target_bytes=64 << 20)
    import ray.data as rd

    out = rd.read_parquet(root, columns=["doc_id", "lang", "source",
                                         "n_chars"])
    return _finish(out)


def queries() -> dict[str, Callable[[str], Any]]:
    # ORDER MATTERS: the driver sweep records only the FIRST 50 entries
    # per round. r5 rotation (final round): the 44 queries that never
    # received a driver CORRECTNESS row in r1-r4 (union = 149 green
    # names over 193) are moved to the front, plus the new-in-r5
    # daily_pipeline at position 45 — so this round's 50-row window
    # verifies every remaining query and completes full driver
    # coverage (the 5 entries it displaces from positions 46-50 all
    # have r4 driver rows). The previously verified remainder keeps
    # its r4 relative order below the marker comment.
    return {
        "split_fields": q_split_fields,
        "pii_redact": q_pii_redact,
        "lm_perplexity": q_lm_perplexity,
        "semantic_dedup": q_semantic_dedup,
        "dup_passages": q_dup_passages,
        "mixture_sample": q_mixture_sample,
        "per_key_cap": q_per_key_cap,
        "shuffle_order": q_shuffle_order,
        "token_dedup_collapse": q_token_dedup_collapse,
        "vocab_topk": q_vocab_topk,
        "repetition_docs": q_repetition_docs,
        "pack_sequences": q_pack_sequences,
        "chunk_sequences": q_chunk_sequences,
        "decontaminate": q_decontaminate,
        "enrich_find_ranges": q_enrich_find_ranges,
        "stdlib_tail": q_stdlib_tail,
        "config_syslog_metrics": q_config_syslog_metrics,
        "simhash_pairs": q_simhash_pairs,
        "rank_orders": q_rank_orders,
        "merge_intervals": q_merge_intervals,
        "dedup_keep_best": q_dedup_keep_best,
        "weighted_key_cap": q_weighted_key_cap,
        "pmi_pairs": q_pmi_pairs,
        "auc_events": q_auc_events,
        "grouped_auc": q_grouped_auc,
        "triangles_hosts": q_triangles,
        "classification_report": q_classification_report,
        "quantiles_cont": q_quantiles_cont,
        "grouped_quantiles_cont": q_grouped_quantiles_cont,
        "ks_drift": q_ks_drift,
        "chi2_drift": q_chi2_drift,
        "psi_drift": q_psi_drift,
        "throttle_events": q_throttle_events,
        "ttl_dedupe_events": q_ttl_dedupe_events,
        "session_paths": q_session_paths,
        "interval_join_events": q_interval_join,
        "assign_sessions": q_assign_sessions,
        "stats_pruned_read": q_stats_pruned_read,
        "seen_filter_docs": q_seen_filter_docs,
        "incremental_agg": q_incremental_agg,
        "lake_delete_compact": q_lake_delete_compact,
        "minhash_ingest": q_minhash_ingest,
        "template_novelty": q_template_novelty,
        "seen_ttl_users": q_seen_ttl_users,
        # new in r5 (position ≤50 so the driver verifies it this round)
        "daily_pipeline": q_daily_pipeline,
        # --- previously driver-verified (r1-r4 union) below this line ---
        "apply_changeset": q_apply_changeset,
        "approx_quantiles": q_approx_quantiles,
        "diverse_select": q_diverse_select,
        "fuzzy_join_suppliers": q_fuzzy_join,
        "zorder_events": q_zorder_events,
        "vrl_remap_events": q_vrl_remap_events,
        "grouped_heavy_hitters": q_grouped_heavy_hitters,
        "resolve_entities": q_resolve_entities,
        "grouped_mad_outliers": q_grouped_mad_outliers,
        "rollup_orders": q_rollup_orders,
        "full_outer_join": q_full_outer_join,
        "semi_anti_join": q_semi_anti_join,
        "cms_counts": q_cms_counts,
        "bloom_seen": q_bloom_seen,
        "c4_clean_docs": q_c4_clean_docs,
        "url_dedup_docs": q_url_dedup_docs,
        "repetition_signals": q_repetition_signals,
        "line_dedup_docs": q_line_dedup,
        "paragraph_dedup_docs": q_paragraph_dedup,
        "line_dedup_keep_first": q_line_dedup_keep_first,
        "gopher_filter": q_gopher_filter,
        "gopher_quality": q_gopher_quality,
        "split_holdout_docs": q_split_holdout,
        "weighted_sample_docs": q_weighted_sample,
        "blocklist_filter": q_blocklist_filter,
        "pagerank_hosts": q_pagerank_hosts,
        "resample_events": q_resample_events,
        "resample_ffill": q_resample_ffill,
        "profile_orders": q_profile_orders,
        "ffill_events": q_ffill_events,
        "bfill_events": q_bfill_events,
        "bpe_merges": q_bpe_merges,
        "bpe_encode_docs": q_bpe_encode,
        "grouped_var": q_grouped_var,
        "grouped_corr": q_grouped_corr,
        "snapshot_diff": q_snapshot_diff,
        "grouped_mode": q_grouped_mode,
        "range_join_events": q_range_join,
        "quantile_band": q_quantile_band,
        "row_number_docs": q_row_number_docs,
        "uniform_sample_docs": q_uniform_sample_docs,
        "heavy_hitters": q_heavy_hitters,
        "strip_dup_passages": q_strip_dup_passages,
        "tfidf_docs": q_tfidf_docs,
        "stdlib_arrays": q_stdlib_arrays,
        "token_budget_cap": q_token_budget_cap,
        "field_shaping": q_field_shaping,
        "ansi_logfmt_roundtrip": q_ansi_logfmt_roundtrip,
        "stdlib_hashes": q_stdlib_hashes,
        "compound_route": q_compound_route,
        "token_near_dup": q_token_near_dup,
        "flagship_tokenized": q_flagship_tokenized,
        "scd2_user_state": q_scd2_user_state,
        "kmeans_embeddings": q_kmeans_embeddings,
        "standardize_lineitem": q_standardize_lineitem,
        "ewma_events": q_ewma_events,
        "rate_events": q_rate_events,
        "argmax_events": q_argmax_events,
        "semantic_join": q_semantic_join,
        "log_templates": q_log_templates,
        "one_hot_events": q_one_hot_events,
        "target_encode": q_target_encode,
        "minmax_events": q_minmax_events,
        "robust_scale_events": q_robust_scale,
        "grouped_standardize": q_grouped_standardize,
        "bucketize_events": q_bucketize_events,
        "winsorize_events": q_winsorize_events,
        "skew_join_docs": q_skew_join_docs,
        "bloom_join_lineitem": q_bloom_join_lineitem,
        "inverted_search": q_inverted_search,
        "minhash_index": q_minhash_index,
        "file_sink_roundtrip": q_file_sink_roundtrip,
        "resumable_pipeline": q_resumable_pipeline,
        "entropy_docs": q_entropy_docs,
        "theta_join": q_theta_join,
        "rolling_range": q_rolling_range,
        "connected_components": q_connected_components,
        "asof_tolerance": q_asof_tolerance,
        "audit_docs": q_audit_docs,
        "knn_graph": q_knn_graph,
        "retention_cohorts": q_retention_cohorts,
        "funnel_events": q_funnel_events,
        "pq_search": q_pq_search,
        "hist_quantiles": q_hist_quantiles,
        "bm25_search": q_bm25_search,
        "pca_embeddings": q_pca_embeddings,
        "nb_classify_docs": q_nb_classify,
        "normalize_text_docs": q_normalize_text,
        "mad_outliers": q_mad_outliers,
        "dsir_select": q_dsir_select,
        "cube_orders": q_cube_orders,
        "rank_lineitem": q_rank_lineitem,
        "broadcast_join_parts": q_broadcast_join_parts,
        "compression_ratio": q_compression_ratio,
        "set_ops": q_set_ops,
        "union_align": q_union_align,
        "pivot_events": q_pivot_events,
        "unpivot_orders": q_unpivot_orders,
        "window_shift": q_window_shift,
        "filter_events": q_filter_events,
        "route_events": q_route_events,
        "remap_fields": q_remap_fields,
        "regex_parse_source": q_regex_parse_source,
        "grok_first_word": q_grok_first_word,
        "json_parse_props": q_json_parse_props,
        "kv_roundtrip": q_kv_roundtrip,
        "tokenize_docs": q_tokenize_docs,
        "text_counts": q_text_counts,
        "dedupe_docs": q_dedupe_docs,
        "agg_source_stats": q_agg_source_stats,
        "reduce_events": q_reduce_events,
        "q1_lineitem": q_q1_lineitem,
        "enrich_customer": q_enrich_customer,
        "enrich_supplier_region": q_enrich_supplier_region,
        "window_events": q_window_events,
        "cardinality_limit": q_cardinality_limit,
        "exact_dedup_docs": q_exact_dedup_docs,
        "knn_embeddings": q_knn_embeddings,
        "salted_reduce": q_salted_reduce,
        "reduce_concat": q_reduce_concat,
        "join_orders_customers": q_join_orders_customers,
        "asof_last_purchase": q_asof_last_purchase,
        "unnest_words": q_unnest_words,
        "session_events": q_session_events,
        "geoip_events": q_geoip_events,
        "approx_distinct_users": q_approx_distinct_users,
        "tumbling_histogram": q_tumbling_histogram,
        "sample_events": q_sample_events,
        "apache_log_parse": q_apache_log_parse,
        "syslog_lines": q_syslog_lines,
        "dd_search_events": q_dd_search_events,
        "dd_search_docs": q_dd_search_docs,
        "glog_parse": q_glog_parse,
        "user_agent_parse": q_user_agent_parse,
        "minhash_pairs": q_minhash_pairs,
        "simhash_docs": q_simhash_docs,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "ann_ivf": q_ann_ivf,
        "lang_id_docs": q_lang_id_docs,
        "quality_docs": q_quality_docs,
        "media_features": q_media_features,
        "percentiles": q_percentiles,
        "grouped_percentiles": q_grouped_percentiles,
        "merge_partial_docs": q_merge_partial_docs,
        "ngram_dup_pairs": q_ngram_dup_pairs,
        "metric_to_log_json": q_metric_to_log_json,
        "hopping_window": q_hopping_window,
        "topk_users": q_topk_users,
        "log_to_metric_agg": q_log_to_metric_agg,
    }


_STOP_RE_SQL = r"(?i)\b(?:the|and|of|a|to|in|is|it|that|for)\b"


def _flagship_oracle_sql() -> str:
    from vector_ray.sources.synth import source_lookup_table

    path = _flagship_q_path()  # ensure the parquet exists for DuckDB
    lk = source_lookup_table().to_pylist()
    values = ", ".join(f"('{r['source']}', '{r['region']}', '{r['tier']}')" for r in lk)
    return (
        f"WITH tok AS (SELECT * FROM read_parquet('{path}/part-*.parquet')), "
        f"lookup(source, region, tier) AS (VALUES {values}), "
        r"parsed AS (SELECT doc_id, n_tok, t.source, "
        r"regexp_extract(doc_id, '^(\w+)-', 1) AS app, "
        r"CAST(regexp_extract(doc_id, '-(\d+)$', 1) AS BIGINT) AS seq, "
        "l.region, l.tier FROM tok t LEFT JOIN lookup l ON l.source = t.source), "
        "routed AS ("
        "SELECT 'hot' AS lane, * FROM parsed WHERE tier = 'hot' "
        "UNION ALL SELECT 'web', * FROM parsed WHERE app = 'web' "
        "UNION ALL SELECT 'long', * FROM parsed WHERE n_tok >= 1024 "
        "UNION ALL SELECT 'rest', * FROM parsed "
        "WHERE NOT coalesce(tier = 'hot', FALSE) AND NOT coalesce(app = 'web', FALSE) "
        "AND NOT n_tok >= 1024) "
        "SELECT lane, source, region, COUNT(doc_id) AS n_rows, "
        "CAST(SUM(n_tok) AS BIGINT) AS tok_sum, MIN(seq) AS seq_min, MAX(seq) AS seq_max "
        "FROM routed GROUP BY lane, source, region"
    )


def oracle_sql() -> dict[str, str]:
    tokp = _tokens_q_path()
    bench_ids = ", ".join(
        f"'{d}'" for d in _decontam_bench_table()["doc_id"].to_pylist()
    )
    return {
        "file_sink_roundtrip": (
            "SELECT doc_id, lang, text FROM documents"
        ),
        "resumable_pipeline": (
            "SELECT doc_id, source FROM documents WHERE lang = 'en'"
        ),
        "theta_join": (
            "SELECT o.o_orderkey, CAST(r.r_regionkey AS BIGINT) "
            "AS r_regionkey FROM orders o, region r "
            "WHERE o.o_totalprice > 50000 * (r.r_regionkey + 1)"
        ),
        "grouped_mad_outliers": (
            "WITH m AS (SELECT event_type, quantile_disc(value, 0.5) "
            "AS med FROM events WHERE value IS NOT NULL GROUP BY 1), "
            "d AS (SELECT e.event_id, e.event_type, e.value, "
            "abs(e.value - m.med) AS dev, m.med FROM events e "
            "JOIN m USING(event_type) WHERE e.value IS NOT NULL), "
            "md AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad "
            "FROM d GROUP BY 1) "
            "SELECT d.event_id, d.event_type, d.value FROM d "
            "JOIN md USING(event_type) "
            "WHERE abs(d.value - d.med) <= 1.5 * md.mad"
        ),
        "grouped_heavy_hitters": (
            r"WITH w AS (SELECT lang, UNNEST(regexp_split_to_array("
            r"text, '\s+')) AS word FROM documents), "
            "c AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS cnt "
            "FROM w WHERE word <> '' GROUP BY 1, 2), "
            "r AS (SELECT lang, word, cnt, row_number() OVER "
            "(PARTITION BY lang ORDER BY cnt DESC, word) AS rn FROM c) "
            "SELECT lang, word, cnt FROM r WHERE rn <= 5"
        ),
        "vrl_remap_events": (
            "SELECT event_id, event_type, value, "
            "upper(event_type) AS sev, value * 2.0 + 1.0 AS score, "
            "CASE WHEN value > 75.0 THEN 'high' "
            "WHEN value > 25.0 THEN 'mid' ELSE 'low' END AS band "
            "FROM events"
        ),
        "fuzzy_join_suppliers": (
            "SELECT a.s_suppkey AS l_id, b.s_suppkey AS r_id, "
            "CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist "
            "FROM supplier a JOIN supplier b "
            "ON a.s_suppkey < b.s_suppkey "
            "AND levenshtein(a.s_name, b.s_name) <= 1"
        ),
        "rolling_range": (
            "SELECT event_id, CAST(COUNT(*) OVER w AS BIGINT) AS cnt1h, "
            "CAST(SUM(event_id % 100) OVER w AS BIGINT) AS sum1h "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
        ),
        # chain (i, i+1) within 7-wide groups + merge (7g, 7g+7) for
        # g % 3 == 0: the component minimum is 7*(b-1) when b = id//7
        # has b % 3 == 1 (merged into the previous group), else 7b
        "connected_components": (
            "SELECT doc_id AS node, CAST(7 * ((doc_id // 7) - "
            "CASE WHEN (doc_id // 7) % 3 = 1 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS label FROM documents"
        ),
        "asof_tolerance": (
            "SELECT e.event_id, CAST(epoch_us(CASE WHEN "
            "e.ts - p.ts <= INTERVAL 3 DAY THEN p.ts END) AS BIGINT) "
            "AS last_purchase_us "
            "FROM events e ASOF LEFT JOIN "
            "(SELECT user_id, ts FROM events "
            "WHERE event_type = 'purchase') p "
            "ON e.user_id = p.user_id AND e.ts >= p.ts"
        ),
        "audit_docs": (
            "SELECT 'chars_range' AS rule, 'range' AS kind, "
            "'n_chars' AS col, COUNT(n_chars) AS checked, "
            "COUNT(*) FILTER (WHERE n_chars IS NOT NULL AND "
            "(n_chars < 50 OR n_chars > 500)) AS violations "
            "FROM documents "
            "UNION ALL SELECT 'lang_not_null', 'not_null', 'lang', "
            "COUNT(*), COUNT(*) FILTER (WHERE lang IS NULL) "
            "FROM documents "
            "UNION ALL SELECT 'lang_set', 'in_set', 'lang', "
            "COUNT(lang), COUNT(*) FILTER (WHERE lang IS NOT NULL AND "
            "lang NOT IN ('en', 'de', 'fr')) FROM documents "
            "UNION ALL SELECT 'source_regex', 'regex', 'source', "
            "COUNT(source), COUNT(*) FILTER (WHERE source IS NOT NULL "
            "AND NOT regexp_matches(source, '^src1')) FROM documents "
            "UNION ALL SELECT 'source_unique', 'unique', 'source', "
            "COUNT(source), COUNT(source) - COUNT(DISTINCT source) "
            "FROM documents"
        ),
        "apply_changeset": (
            "WITH ch AS ("
            "SELECT doc_id, text, lang, source, n_chars, 'D' AS op "
            "FROM documents WHERE doc_id % 10 = 0 "
            "UNION ALL SELECT doc_id, text, lang, 'patched', "
            "n_chars + 1000, 'U' FROM documents WHERE doc_id % 10 = 1 "
            "UNION ALL SELECT doc_id + 1000000, text, lang, 'inserted', "
            "n_chars, 'I' FROM documents WHERE doc_id % 10 = 2) "
            "SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars "
            "FROM documents d WHERE d.doc_id NOT IN "
            "(SELECT doc_id FROM ch) "
            "UNION ALL SELECT doc_id, text, lang, source, n_chars "
            "FROM ch WHERE op <> 'D'"
        ),
        "knn_graph": (
            "WITH s AS (SELECT a.vec_id AS src, b.vec_id AS dst, "
            "list_cosine_similarity(a.embedding, b.embedding) AS c "
            "FROM embeddings a CROSS JOIN embeddings b "
            "WHERE a.vec_id <> b.vec_id) "
            "SELECT src, dst, CAST(row_number() OVER "
            "(PARTITION BY src ORDER BY c DESC, dst) - 1 AS BIGINT) AS rank "
            "FROM s QUALIFY row_number() OVER "
            "(PARTITION BY src ORDER BY c DESC, dst) <= 5"
        ),
        "vocab_topk": (
            r"WITH w AS (SELECT UNNEST(regexp_split_to_array(text, '\s+')) AS word "
            "FROM documents), "
            "c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM w "
            "WHERE word <> '' GROUP BY 1) "
            "SELECT word, cnt FROM c ORDER BY cnt DESC, word LIMIT 40"
        ),
        "repetition_docs": (
            r"WITH w AS (SELECT doc_id, UNNEST(regexp_split_to_array(text, '\s+')) AS word "
            "FROM documents), "
            "c AS (SELECT doc_id, word, COUNT(*) AS cnt FROM w WHERE word <> '' GROUP BY 1, 2), "
            "s AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words, "
            "CAST(COUNT(*) AS BIGINT) AS n_distinct, MAX(cnt) AS top_cnt FROM c GROUP BY 1) "
            "SELECT d.doc_id, COALESCE(s.n_words, 0) AS n_words, "
            "COALESCE(s.n_distinct, 0) AS n_distinct, "
            "COALESCE(1 - (s.n_distinct / CAST(s.n_words AS DOUBLE)), 0.0) AS dup_word_frac, "
            "COALESCE(s.top_cnt / CAST(s.n_words AS DOUBLE), 0.0) AS top_word_frac "
            "FROM documents d LEFT JOIN s USING (doc_id)"
        ),
        "chunk_sequences": (
            f"WITH tok AS (SELECT * FROM read_parquet('{tokp}/part-*.parquet')), "
            "c AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_id, "
            "list_slice(tokens, CAST(i*448 + 1 AS BIGINT), CAST(i*448 + 512 AS BIGINT)) AS ch "
            "FROM tok, UNNEST(range(0, CASE WHEN len(tokens) <= 512 THEN 1 "
            "ELSE 1 + CAST(CEIL((len(tokens) - 512)::DOUBLE / 448) AS BIGINT) END)) AS u(i)) "
            "SELECT doc_id, chunk_id, CAST(len(ch) AS BIGINT) AS n_tok, "
            "CAST(list_aggregate(ch, 'sum') AS BIGINT) AS tok_sum FROM c"
        ),
        "decontaminate": (
            f"WITH tok AS (SELECT * FROM read_parquet('{tokp}/part-*.parquet')), "
            f"bench AS (SELECT tokens FROM tok WHERE doc_id IN ({bench_ids})), "
            "bg AS (SELECT DISTINCT list_slice(tokens, CAST(i AS BIGINT), CAST(i + 7 AS BIGINT)) AS ng "
            "FROM bench, UNNEST(range(1, len(tokens) - 6)) AS u(i)), "
            "cg AS (SELECT doc_id, list_slice(tokens, CAST(i AS BIGINT), CAST(i + 7 AS BIGINT)) AS ng "
            "FROM tok, UNNEST(range(1, len(tokens) - 6)) AS u(i)) "
            "SELECT doc_id, doc_id IN (SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (ng)) "
            "AS contaminated FROM tok"
        ),
        "dup_passages": (
            f"WITH tok AS (SELECT * FROM read_parquet('{_passages_q_path()}')), "
            "d AS (SELECT DISTINCT doc_id, "
            "list_slice(tokens, CAST(i AS BIGINT), CAST(i + 15 AS BIGINT)) AS ng "
            "FROM tok, UNNEST(range(1, len(tokens) - 14)) AS u(i)), "
            "c AS (SELECT ng, COUNT(*) AS ndocs FROM d GROUP BY ng), "
            "per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows, "
            "CAST(SUM(CASE WHEN c.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup "
            "FROM d JOIN c USING (ng) GROUP BY doc_id) "
            "SELECT doc_id, n_windows, n_dup, "
            "n_dup / CAST(n_windows AS DOUBLE) AS dup_frac FROM per"
        ),
        "filter_events": (
            "SELECT event_id, user_id, value FROM events "
            "WHERE event_type = 'error' AND value > 100"
        ),
        "route_events": (
            "SELECT 'high' AS lane, event_id FROM events WHERE value >= 150 "
            "UNION ALL SELECT 'purchase' AS lane, event_id FROM events WHERE event_type = 'purchase' "
            "UNION ALL SELECT 'rest' AS lane, event_id FROM events "
            "WHERE NOT (value >= 150) AND NOT (event_type = 'purchase')"
        ),
        "remap_fields": (
            "SELECT c_custkey, c_mktsegment || '-' || CAST(c_nationkey AS VARCHAR) AS seg_key, "
            "UPPER(c_name) AS name_upper FROM customer"
        ),
        "regex_parse_source": (
            r"SELECT doc_id, CAST(regexp_extract(source, 'src(\d+)', 1) AS BIGINT) AS src_num "
            "FROM documents"
        ),
        "grok_first_word": (
            r"SELECT doc_id, regexp_extract(text, '\b(\w+)\b', 1) AS first_word FROM documents"
        ),
        "json_parse_props": (
            "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events"
        ),
        "kv_roundtrip": (
            "SELECT event_id, user_id AS u, event_type AS t FROM events"
        ),
        "tokenize_docs": (
            r"SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_words, "
            r"len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS n_tokens_bpe "
            "FROM documents"
        ),
        "text_counts": (
            r"SELECT doc_id, len(regexp_extract_all(text, '[\.,;:!\?]')) AS n_punct, "
            f"len(regexp_extract_all(text, '{_STOP_RE_SQL}')) AS n_stop, "
            r"len(regexp_extract_all(text, '[A-Z]')) AS n_upper FROM documents"
        ),
        "dedupe_docs": (
            "SELECT doc_id, lang, source FROM documents "
            "QUALIFY row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) = 1"
        ),
        "agg_source_stats": (
            "SELECT source, COUNT(doc_id) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars_sum, "
            "MAX(n_chars) AS chars_max, CAST(COUNT(DISTINCT lang) AS BIGINT) AS langs "
            "FROM documents GROUP BY source"
        ),
        "reduce_events": (
            "SELECT user_id, CAST(ROUND(SUM(value) * 100) AS BIGINT) AS value_sum_c, "
            "COUNT(*) AS n_rows FROM events GROUP BY user_id"
        ),
        "q1_lineitem": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT) AS sum_qty_c, "
            "CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS sum_base_price_c, "
            "CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS sum_disc_price_c, "
            "CAST(ROUND(AVG(l_discount) * 1000000) AS BIGINT) AS avg_disc_u, "
            "COUNT(l_quantity) AS n "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "enrich_customer": (
            "SELECT c_custkey, c_name, n_name FROM customer "
            "LEFT JOIN nation ON nation.n_nationkey = customer.c_nationkey"
        ),
        "enrich_supplier_region": (
            "SELECT s_suppkey, n_name, r_name FROM supplier "
            "LEFT JOIN nation ON n_nationkey = s_nationkey "
            "LEFT JOIN region ON r_regionkey = n_regionkey"
        ),
        "enrich_find_ranges": (
            "SELECT c_custkey, c_acctbal, n_name AS band_name FROM customer "
            "JOIN nation ON lower('REGION_' || CAST(c_nationkey % 5 AS VARCHAR)) = "
            "lower('region_' || CAST(n_regionkey AS VARCHAR)) "
            "AND c_acctbal BETWEEN (n_nationkey * 400.0 - 1000.0) "
            "AND (n_nationkey * 400.0 - 1000.0 + 1999.99)"
        ),
        "stdlib_tail": (
            "SELECT event_id, "
            "CASE WHEN user_id % 50 = 0 THEN 'localhost' ELSE NULL END AS host, "
            "props AS ruby_round, "
            "'{\"k\": {\"integer\": ' || "
            "CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR) || '}}' AS tagged, "
            "props AS compacted, "
            "CASE WHEN user_id % 7 = 0 THEN NULL ELSE event_type END AS rx "
            "FROM events"
        ),
        "window_events": (
            "SELECT event_type, CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour, "
            "COUNT(value) AS n, CAST(ROUND(SUM(value) * 100) AS BIGINT) AS value_sum_c "
            "FROM events GROUP BY event_type, hour"
        ),
        "cardinality_limit": (
            "SELECT event_id, user_id FROM events WHERE CAST(user_id AS VARCHAR) IN "
            "(SELECT u FROM (SELECT DISTINCT CAST(user_id AS VARCHAR) AS u FROM events) "
            "ORDER BY u LIMIT 5)"
        ),
        "exact_dedup_docs": (
            r"SELECT doc_id FROM documents "
            r"QUALIFY row_number() OVER (PARTITION BY lower(regexp_replace(text, '\s+', ' ', 'g')) "
            "ORDER BY doc_id) = 1"
        ),
        "salted_reduce": (
            "SELECT event_type, CAST(ROUND(SUM(value) * 100) AS BIGINT) AS value_sum_c, "
            "COUNT(*) AS n FROM events GROUP BY event_type"
        ),
        "reduce_concat": (
            "SELECT lang, string_agg(source, ' ' ORDER BY doc_id) AS source, "
            "COUNT(*) AS n_docs FROM documents GROUP BY lang"
        ),
        "join_orders_customers": (
            "SELECT o_orderkey, o_totalprice, c_name FROM orders "
            "JOIN customer ON c_custkey = o_custkey"
        ),
        "skew_join_docs": (
            "SELECT d.doc_id, d.lang, c.lang_docs FROM documents d JOIN "
            "(SELECT lang, COUNT(*) AS lang_docs FROM documents GROUP BY lang) c "
            "USING (lang)"
        ),
        "bloom_join_lineitem": (
            "SELECT l_orderkey, l_quantity, o_totalprice FROM lineitem "
            "JOIN orders ON o_orderkey = l_orderkey WHERE o_totalprice > 400000"
        ),
        "asof_last_purchase": (
            "SELECT e.event_id, CAST(epoch_us(p.ts) AS BIGINT) AS last_purchase_us "
            "FROM events e ASOF LEFT JOIN "
            "(SELECT user_id, ts FROM events WHERE event_type = 'purchase') p "
            "ON e.user_id = p.user_id AND e.ts >= p.ts"
        ),
        "unnest_words": (
            "SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents"
        ),
        "session_events": (
            "WITH x AS (SELECT user_id, ts, value, "
            "CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE "
            "THEN 1 ELSE 0 END AS new_s FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "y AS (SELECT user_id, value, SUM(new_s) OVER "
            "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM x) "
            "SELECT user_id, CAST(sid AS BIGINT) AS session_id, COUNT(*) AS n, "
            "CAST(ROUND(SUM(value) * 100) AS BIGINT) AS value_sum_c "
            "FROM y GROUP BY user_id, sid"
        ),
        "geoip_events": (
            "SELECT event_id, CASE WHEN user_id % 256 < 128 THEN 'low' ELSE 'high' END AS region "
            "FROM events"
        ),
        "percentiles": (
            "SELECT 0.5 AS p, quantile_disc(value, 0.5) AS value FROM events "
            "UNION ALL SELECT 0.9, quantile_disc(value, 0.9) FROM events "
            "UNION ALL SELECT 0.99, quantile_disc(value, 0.99) FROM events"
        ),
        "merge_partial_docs": (
            "SELECT doc_id, text AS msg FROM documents"
        ),
        "log_to_metric_agg": (
            "SELECT 'events_total' AS name, 'counter' AS metric_type, "
            "event_type AS etype, CAST(COUNT(*) * 100 AS BIGINT) AS value_c "
            "FROM events GROUP BY event_type "
            "UNION ALL SELECT 'value_total', 'counter', event_type, "
            "CAST(ROUND(SUM(value) * 100) AS BIGINT) FROM events "
            "WHERE value IS NOT NULL GROUP BY event_type "
            "UNION ALL SELECT 'users', 'set', NULL, "
            "CAST(COUNT(DISTINCT user_id) * 100 AS BIGINT) FROM events"
        ),
        "grouped_percentiles": (
            "SELECT event_type, quantile_disc(value, 0.5) AS p50, "
            "quantile_disc(value, 0.9) AS p90, quantile_disc(value, 0.99) AS p99 "
            "FROM events GROUP BY event_type"
        ),
        "topk_users": (
            "WITH c AS (SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM events GROUP BY 1, 2) "
            "SELECT event_type, user_id, n FROM c "
            "QUALIFY row_number() OVER (PARTITION BY event_type "
            "ORDER BY n DESC, user_id) <= 3"
        ),
        "hopping_window": (
            "WITH e AS (SELECT event_type, epoch_us(ts) AS tu, value FROM events), "
            "x AS (SELECT event_type, value, "
            "((tu // 1800000000) * 1800000000) - k * 1800000000 AS ws "
            "FROM e CROSS JOIN (SELECT unnest(range(2)) AS k) "
            "WHERE ((tu // 1800000000) * 1800000000) - k * 1800000000 > tu - 3600000000) "
            "SELECT event_type, CAST(ws AS BIGINT) AS window_start, "
            "CAST(COUNT(value) AS BIGINT) AS n, "
            "CAST(ROUND(SUM(value) * 100) AS BIGINT) AS value_sum_c "
            "FROM x GROUP BY 1, 2"
        ),
        "metric_to_log_json": (
            "WITH s AS (SELECT event_type AS etype, 'counter' AS metric_type, "
            "'value_total' AS name, CAST(ROUND(SUM(value) * 100) AS BIGINT) AS value_c "
            "FROM events WHERE value IS NOT NULL GROUP BY event_type) "
            "SELECT etype, metric_type, name, value_c, "
            "'{\"etype\": \"' || etype || '\", \"metric_type\": \"' || metric_type || "
            "'\", \"name\": \"' || name || '\", \"value_c\": ' || "
            "CAST(value_c AS VARCHAR) || '}' AS message FROM s"
        ),
        "ngram_dup_pairs": (
            "WITH all_docs AS ("
            "SELECT doc_id, text FROM documents WHERE doc_id < 40 "
            "UNION ALL SELECT doc_id + 10000, text || ' tail extra words here' "
            "FROM documents WHERE doc_id < 20), "
            "g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS grams "
            "FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w "
            "FROM all_docs)), "
            "p AS (SELECT x.doc_id AS a, y.doc_id AS b, "
            "len(list_intersect(x.grams, y.grams)) AS i, "
            "len(x.grams) + len(y.grams) - len(list_intersect(x.grams, y.grams)) AS u "
            "FROM g x JOIN g y ON x.doc_id < y.doc_id) "
            "SELECT a, b, CAST(FLOOR(1000000.0 * (CAST(i AS DOUBLE) / u)) AS BIGINT) "
            "AS jac_micro FROM p WHERE 2 * i >= u"
        ),
        "flagship_tokenized": _flagship_oracle_sql(),
        "daily_pipeline": _daily_oracle_sql(),
        "knn_embeddings": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3), "
            "s AS (SELECT q.qid AS query_idx, e.vec_id, "
            "list_cosine_similarity(q.qe, e.embedding) AS c FROM q CROSS JOIN embeddings e) "
            "SELECT query_idx, vec_id, CAST(row_number() OVER "
            "(PARTITION BY query_idx ORDER BY c DESC, vec_id) - 1 AS BIGINT) AS rank FROM s "
            "QUALIFY row_number() OVER (PARTITION BY query_idx ORDER BY c DESC, vec_id) <= 10"
        ),
        # ann_ivf probes ALL clusters (n_probe = n_clusters), so the IVF
        # machinery must reproduce exact brute-force top-k — same oracle
        # shape as knn_embeddings.
        "ann_ivf": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3), "
            "s AS (SELECT q.qid AS query_idx, e.vec_id, "
            "list_cosine_similarity(q.qe, e.embedding) AS c FROM q CROSS JOIN embeddings e) "
            "SELECT query_idx, vec_id, CAST(row_number() OVER "
            "(PARTITION BY query_idx ORDER BY c DESC, vec_id) - 1 AS BIGINT) AS rank FROM s "
            "QUALIFY row_number() OVER (PARTITION BY query_idx ORDER BY c DESC, vec_id) <= 10"
        ),
        # the engine's keep test is FNV-1a-64(decimal(event_id)) % 5 == 0
        # (kernels.fingerprint); re-implemented in pure SQL arithmetic:
        # byte fold via list_reduce with mod-2^64 HUGEINT multiplication.
        "sample_events": (
            "WITH s AS (SELECT event_id, CAST(event_id AS VARCHAR) AS k FROM events), "
            "f AS (SELECT event_id, list_reduce("
            "list_prepend(14695981039346656037::HUGEINT, "
            "list_transform(range(1, length(k) + 1), i -> ascii(substr(k, i, 1))::HUGEINT)), "
            "(acc, b) -> ((acc - (acc % 256) + xor((acc % 256)::BIGINT, b::BIGINT)::HUGEINT) "
            "* 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT) AS h FROM s) "
            "SELECT event_id FROM f WHERE h % 5 = 0"
        ),
        # marker-word argmax with first-match tie-break (en,es,de,fr);
        # CJK presence short-circuits to zh; zero hits → und.
        "lang_id_docs": (
            "WITH c AS (SELECT doc_id, lang, "
            "len(regexp_extract_all(text, '(?i)\\b(?:the|and|of|is|that)\\b')) AS c_en, "
            "len(regexp_extract_all(text, '(?i)\\b(?:el|la|de|que|los)\\b')) AS c_es, "
            "len(regexp_extract_all(text, '(?i)\\b(?:der|die|und|ist|nicht)\\b')) AS c_de, "
            "len(regexp_extract_all(text, '(?i)\\b(?:le|la|et|les|des)\\b')) AS c_fr, "
            "len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS cjk FROM documents) "
            "SELECT doc_id, lang, CASE WHEN cjk > 0 THEN 'zh' "
            "WHEN greatest(c_en, c_es, c_de, c_fr) = 0 THEN 'und' "
            "WHEN c_en >= greatest(c_es, c_de, c_fr) THEN 'en' "
            "WHEN c_es >= greatest(c_de, c_fr) THEN 'es' "
            "WHEN c_de >= c_fr THEN 'de' ELSE 'fr' END AS lang_pred FROM c"
        ),
        # mirrors QualityScore's float64 formula op-for-op (same IEEE
        # association order), over regexp match counts.
        "quality_docs": (
            "WITH c AS (SELECT doc_id, "
            "CAST(length(text) AS DOUBLE) AS n_chars, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS n_words, "
            "CAST(len(regexp_extract_all(text, '[\\.,;:!\\?]')) AS DOUBLE) AS n_punct, "
            "CAST(len(regexp_extract_all(text, "
            "'(?i)\\b(?:the|and|of|a|to|in|is|it|that|for)\\b')) AS DOUBLE) AS n_stop, "
            "CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE) AS n_upper FROM documents), "
            "r AS (SELECT doc_id, "
            "greatest(n_chars, 1.0) / greatest(n_words, 1.0) AS mean_wl, "
            "n_punct / greatest(n_chars, 1.0) AS punct_ratio, "
            "n_stop / greatest(n_words, 1.0) AS stop_ratio, "
            "n_upper / greatest(n_chars, 1.0) AS upper_ratio FROM c) "
            "SELECT doc_id, "
            "(((1.0 - least(abs(mean_wl - 5.0) / 5.0, 1.0)) + least(stop_ratio * 3.0, 1.0)) + "
            "((1.0 - least(punct_ratio * 5.0, 1.0)) + (1.0 - least(upper_ratio * 5.0, 1.0)))) / 4.0 "
            "AS quality, stop_ratio FROM r"
        ),
        # exact bucket counts of the mergeable histogram: bin i = value
        # <= bounds[i] (searchsorted side='left'), last bin = overflow;
        # empty bins materialize as 0 like the sketch's counts array.
        "tumbling_histogram": (
            "WITH b AS (SELECT unnest(range(4)) AS bin), "
            "et AS (SELECT DISTINCT event_type FROM events), "
            "c AS (SELECT event_type, CASE WHEN value <= 50.0 THEN 0 "
            "WHEN value <= 100.0 THEN 1 WHEN value <= 250.0 THEN 2 ELSE 3 END AS bin, "
            "COUNT(*) AS n FROM events WHERE value IS NOT NULL GROUP BY 1, 2) "
            "SELECT et.event_type, CAST(b.bin AS BIGINT) AS bin, "
            "CAST(COALESCE(c.n, 0) AS BIGINT) AS n "
            "FROM et CROSS JOIN b LEFT JOIN c ON c.event_type = et.event_type AND c.bin = b.bin"
        ),
        # honest recomputation: every pairwise cosine over the base +
        # planted-copy union; only the 25 planted pairs clear 0.9.
        "embedding_dup_pairs": (
            "WITH all_v AS (SELECT vec_id, embedding FROM embeddings "
            "UNION ALL SELECT vec_id + 10000, embedding FROM embeddings WHERE vec_id < 25), "
            "p AS (SELECT x.vec_id AS a, y.vec_id AS b, "
            "list_cosine_similarity(x.embedding, y.embedding) AS c "
            "FROM all_v x JOIN all_v y ON x.vec_id < y.vec_id) "
            "SELECT a, b FROM p WHERE c >= 0.9"
        ),
        "field_shaping": (
            "SELECT doc_id, lang AS language, source, "
            "CAST(n_chars AS DOUBLE) AS n_chars, "
            "substr(lang, 1, 1) || '-' || substr(source, 4, 2) AS head, "
            "lang || ':' || source AS tag, CAST(3 AS BIGINT) AS v "
            "FROM documents"
        ),
        "ansi_logfmt_roundtrip": (
            "SELECT event_id, event_type AS type, "
            "CAST(value AS DOUBLE) AS val FROM events"
        ),
        "stdlib_hashes": (
            "SELECT doc_id, md5(source) AS h_md5, sha256(source) AS h_sha2, "
            "to_base64(encode(left(text, 12))) AS b64, upper(source) AS up, "
            "trim(left(text, 12)) AS head FROM documents"
        ),
        "compound_route": (
            "SELECT doc_id, lang, source, n_chars, "
            "lang || '-' || source AS bucket "
            "FROM documents WHERE lang = 'en'"
        ),
        "split_fields": (
            "SELECT doc_id, split_part(text, ' ', 1) AS w1, "
            "split_part(text, ' ', 2) AS w2, split_part(text, ' ', 3) AS w3 "
            "FROM documents"
        ),
        "pii_redact": (
            "SELECT doc_id, regexp_replace(regexp_replace(text, "
            "'customer\\w*', '[X]', 'g'), '\\b(?:fast|slow)\\b', '[X]', 'g') "
            "AS redacted FROM documents"
        ),
        "dd_search_events": (
            "SELECT event_id FROM events WHERE event_type = 'error' "
            "OR ((value >= 150 AND value <= 250) AND NOT event_type = 'purchase')"
        ),
        "dd_search_docs": (
            "SELECT doc_id FROM documents WHERE "
            "(lang = 'en' AND regexp_matches(text, '(?i)\\bmerge\\b')) "
            "OR (lang = 'de' AND NOT source = 'src0')"
        ),
        "syslog_lines": (
            "SELECT 'host-' || CAST(user_id % 20 AS VARCHAR) AS hostname, "
            "event_type AS status, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM events GROUP BY 1, 2"
        ),
        # the render→parse round trips: the oracle derives the fields
        # straight from the source columns, so the kernel regex must
        # exactly invert the deterministic line renderer.
        "apache_log_parse": (
            "SELECT event_id, "
            "'10.0.' || CAST(user_id % 256 AS VARCHAR) || '.' || "
            "CAST(event_id % 256 AS VARCHAR) AS host, "
            "'u' || CAST(user_id AS VARCHAR) AS \"user\", "
            "'/api/' || event_type AS path, "
            "CAST(CASE WHEN value > 200.0 THEN 500 ELSE 200 END AS BIGINT) AS status, "
            "CAST(FLOOR(COALESCE(value, 0.0) * 10.0) AS BIGINT) AS size, "
            "'curl/8.' || CAST(event_id % 10 AS VARCHAR) AS agent "
            "FROM events"
        ),
        "glog_parse": (
            "SELECT event_id, "
            "CASE WHEN value > 200.0 THEN 'E' WHEN value > 100.0 THEN 'W' ELSE 'I' END AS level, "
            "CAST(user_id AS BIGINT) AS thread, 'main.cc' AS file, "
            "CAST(event_id % 1000 AS BIGINT) AS line, "
            "'evt ' || event_type AS message FROM events"
        ),
        "user_agent_parse": (
            "SELECT event_id, "
            + "CASE user_id % 8 "
            + " ".join(f"WHEN {i} THEN '{fam}'" for i, (fam, _v, _o, _d) in enumerate(_UA_EXPECT))
            + " END AS browser_family, "
            + "CASE user_id % 8 "
            + " ".join(
                f"WHEN {i} THEN " + ("NULL" if v is None else f"'{v}'")
                for i, (_f, v, _o, _d) in enumerate(_UA_EXPECT))
            + " END AS browser_version, "
            + "CASE user_id % 8 "
            + " ".join(f"WHEN {i} THEN '{o}'" for i, (_f, _v, o, _d) in enumerate(_UA_EXPECT))
            + " END AS os_family, "
            + "CASE user_id % 8 "
            + " ".join(f"WHEN {i} THEN '{d}'" for i, (_f, _v, _o, d) in enumerate(_UA_EXPECT))
            + " END AS device FROM events"
        ),
        "rank_orders": (
            "SELECT o_orderkey, "
            "percent_rank() OVER (ORDER BY o_totalprice) AS pct_rank, "
            "cume_dist() OVER (ORDER BY o_totalprice) AS cume_dist "
            "FROM orders WHERE o_totalprice IS NOT NULL"
        ),
        "auc_events": (
            "WITH d AS (SELECT value AS s, CASE WHEN event_type IN "
            "('click','purchase') THEN 1 ELSE 0 END AS yy FROM events "
            "WHERE value IS NOT NULL AND event_type IS NOT NULL), "
            "g AS (SELECT s, SUM(yy) AS pos, COUNT(*)-SUM(yy) AS neg "
            "FROM d GROUP BY s), "
            "o AS (SELECT pos, neg, COALESCE(SUM(neg) OVER (ORDER BY s "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),0) "
            "AS cumneg FROM g) "
            "SELECT CAST(SUM(pos*(2*cumneg+neg)) AS DOUBLE) / "
            "CAST(2*(SELECT SUM(pos) FROM g)*(SELECT SUM(neg) FROM g) "
            "AS DOUBLE) AS auc, "
            "CAST((SELECT SUM(pos) FROM g) AS BIGINT) AS n_pos, "
            "CAST((SELECT SUM(neg) FROM g) AS BIGINT) AS n_neg FROM o"
        ),
        "quantiles_cont": (" UNION ALL ".join(
            f"SELECT CAST({p} AS DOUBLE) AS p, "
            f"(SELECT quantile_cont(l_extendedprice, {p}) "
            f"FROM lineitem) AS v"
            for p in (0.01, 0.25, 0.5, 0.9, 0.99))),
        "ks_drift": (
            "WITH a AS (SELECT value AS v FROM events WHERE value IS "
            "NOT NULL AND user_id % 2 = 0), "
            "b AS (SELECT value AS v FROM events WHERE value IS NOT "
            "NULL AND user_id % 2 = 1), "
            "u AS (SELECT v, 1 AS ia, 0 AS ib FROM a UNION ALL "
            "SELECT v, 0, 1 FROM b), "
            "g AS (SELECT v, SUM(ia) AS ca, SUM(ib) AS cb FROM u "
            "GROUP BY v), "
            "o AS (SELECT SUM(ca) OVER (ORDER BY v) AS cuma, "
            "SUM(cb) OVER (ORDER BY v) AS cumb FROM g) "
            "SELECT MAX(ABS(CAST(cuma AS DOUBLE) / "
            "(SELECT COUNT(*) FROM a) - CAST(cumb AS DOUBLE) / "
            "(SELECT COUNT(*) FROM b))) AS ks, "
            "CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_a, "
            "CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_b FROM o"
        ),
        "grouped_quantiles_cont": (
            "SELECT event_type, quantile_cont(value, 0.25) AS p25, "
            "quantile_cont(value, 0.5) AS p50, "
            "quantile_cont(value, 0.9) AS p90 FROM events "
            "WHERE value IS NOT NULL GROUP BY event_type"
        ),
        "classification_report": (
            "WITH d AS (SELECT value AS s, CASE WHEN event_type IN "
            "('click','purchase') THEN 1 ELSE 0 END AS y FROM events "
            "WHERE value IS NOT NULL AND event_type IS NOT NULL), "
            "t(threshold) AS (VALUES (10.0),(25.0),(50.0),(75.0),"
            "(90.0)), "
            "c AS (SELECT threshold, "
            "CAST(SUM(CASE WHEN s >= threshold AND y = 1 THEN 1 ELSE 0 "
            "END) AS BIGINT) AS tp, "
            "CAST(SUM(CASE WHEN s >= threshold AND y = 0 THEN 1 ELSE 0 "
            "END) AS BIGINT) AS fp, "
            "CAST(SUM(CASE WHEN s < threshold AND y = 1 THEN 1 ELSE 0 "
            "END) AS BIGINT) AS fn, "
            "CAST(SUM(CASE WHEN s < threshold AND y = 0 THEN 1 ELSE 0 "
            "END) AS BIGINT) AS tn FROM d CROSS JOIN t GROUP BY "
            "threshold) "
            "SELECT CAST(threshold AS DOUBLE) AS threshold, tp, fp, "
            "fn, tn, "
            "CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / "
            "CAST(tp + fp AS DOUBLE) END AS precision, "
            "CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / "
            "CAST(tp + fn AS DOUBLE) END AS recall, "
            "CASE WHEN 2*tp + fp + fn > 0 THEN CAST(2*tp AS DOUBLE) / "
            "CAST(2*tp + fp + fn AS DOUBLE) END AS f1 FROM c"
        ),
        "grouped_auc": (
            "WITH d AS (SELECT 'seg' || CAST(user_id % 4 AS VARCHAR) "
            "AS seg, value AS s, CASE WHEN event_type IN "
            "('click','purchase') THEN 1 ELSE 0 END AS yy FROM events "
            "WHERE value IS NOT NULL AND event_type IS NOT NULL "
            "AND user_id IS NOT NULL), "
            "g AS (SELECT seg, s, SUM(yy) AS pos, COUNT(*)-SUM(yy) AS "
            "neg FROM d GROUP BY seg, s), "
            "o AS (SELECT seg, pos, neg, COALESCE(SUM(neg) OVER "
            "(PARTITION BY seg ORDER BY s ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND 1 PRECEDING),0) AS cumneg FROM g) "
            "SELECT seg, CASE WHEN SUM(pos)>0 AND SUM(neg)>0 THEN "
            "CAST(SUM(pos*(2*cumneg+neg)) AS DOUBLE) / "
            "CAST(2*SUM(pos)*SUM(neg) AS DOUBLE) END AS auc, "
            "CAST(SUM(pos) AS BIGINT) AS n_pos, "
            "CAST(SUM(neg) AS BIGINT) AS n_neg FROM o GROUP BY seg"
        ),
        "merge_intervals": (
            "WITH iv AS (SELECT user_id, epoch_us(ts) AS s, "
            "epoch_us(ts) + (event_id % 7 + 1) * 60000000 AS e "
            "FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL), "
            "x AS (SELECT user_id, s, e, CASE WHEN s > COALESCE("
            "MAX(e) OVER (PARTITION BY user_id ORDER BY s, e "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), s - 1) "
            "THEN 1 ELSE 0 END AS brk FROM iv), "
            "g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id "
            "ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "CURRENT ROW) AS grp FROM x) "
            "SELECT user_id, MIN(s) AS span_start, MAX(e) AS span_end, "
            "CAST(COUNT(*) AS BIGINT) AS n_spans "
            "FROM g GROUP BY user_id, grp"
        ),
        "assign_sessions": (
            "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us "
            "FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL), "
            "x AS (SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER "
            "(PARTITION BY user_id ORDER BY ts_us, event_id) "
            "> 28800000000 THEN 1 ELSE 0 END AS brk FROM e), "
            "s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW) AS sess FROM x) "
            "SELECT event_id, user_id, ts_us, "
            "CAST(sess AS BIGINT) AS session_seq, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY user_id, sess "
            "ORDER BY ts_us, event_id) - 1 AS BIGINT) AS session_pos "
            "FROM s"
        ),
        "interval_join_events": (
            "WITH a AS (SELECT user_id, event_id AS a_id, "
            "epoch_us(ts) AS a_s, epoch_us(ts) + "
            "(event_id % 7 + 1) * 3600000000 AS a_e FROM events "
            "WHERE ts IS NOT NULL AND user_id IS NOT NULL "
            "AND event_id % 2 = 0), "
            "b AS (SELECT user_id, event_id AS b_id, "
            "epoch_us(ts) AS b_s, epoch_us(ts) + "
            "(event_id % 5 + 1) * 5400000000 AS b_e FROM events "
            "WHERE ts IS NOT NULL AND user_id IS NOT NULL "
            "AND event_id % 2 = 1) "
            "SELECT a.user_id, a_id, a_s, a_e, b_id, b_s, b_e "
            "FROM a JOIN b ON a.user_id = b.user_id "
            "AND a_s <= b_e AND b_s <= a_e"
        ),
        "throttle_events": (
            "SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type "
            "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, "
            "epoch_us(ts) // 86400000000 ORDER BY ts, event_id) AS rn "
            "FROM events WHERE ts IS NOT NULL) WHERE rn <= 2"
        ),
        "ttl_dedupe_events": (
            # greedy TTL chain per user: the recursive working table
            # holds each user's LAST kept timestamp; every step emits
            # the next event >= last + ttl. Kept rows then resolve to
            # the min-event_id row at their (user, ts).
            "WITH RECURSIVE e AS (SELECT event_id, user_id, "
            "epoch_us(ts) AS ts_us, value FROM events "
            "WHERE ts IS NOT NULL), "
            "kept AS (SELECT user_id, MIN(ts_us) AS ts_us FROM e "
            "GROUP BY user_id "
            "UNION ALL "
            "SELECT e.user_id, MIN(e.ts_us) FROM e JOIN kept "
            "ON e.user_id = kept.user_id "
            "AND e.ts_us >= kept.ts_us + 43200000000 "
            "GROUP BY e.user_id) "
            "SELECT MIN(e.event_id) AS event_id, e.user_id, e.ts_us, "
            "arg_min(e.value, e.event_id) AS value "
            "FROM e JOIN kept ON e.user_id = kept.user_id "
            "AND e.ts_us = kept.ts_us GROUP BY e.user_id, e.ts_us"
        ),
        "session_paths": (
            "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "event_type FROM events WHERE user_id IS NOT NULL AND "
            "ts IS NOT NULL AND event_type IS NOT NULL), "
            "x AS (SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER "
            "(PARTITION BY user_id ORDER BY ts_us, event_id) "
            "> 28800000000 THEN 1 ELSE 0 END AS brk FROM e), "
            "s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW) AS sess FROM x), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, "
            "sess ORDER BY ts_us, event_id) AS rn FROM s), "
            "p AS (SELECT user_id, sess, STRING_AGG(event_type, '>' "
            "ORDER BY ts_us, event_id) AS path FROM r WHERE rn <= 3 "
            "GROUP BY user_id, sess) "
            "SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions "
            "FROM p GROUP BY path ORDER BY n_sessions DESC, path "
            "LIMIT 25"
        ),
        "stats_pruned_read": (
            "SELECT event_type, COUNT(event_id) AS n, "
            "CAST(ROUND(SUM(value) * 100) AS BIGINT) AS value_sum_c "
            "FROM events WHERE value >= 50.0 AND value <= 70.0 "
            "GROUP BY event_type"
        ),
        "seen_filter_docs": (
            "SELECT doc_id, lang, source, n_chars FROM documents "
            "WHERE doc_id NOT IN ("
            "SELECT doc_id FROM documents WHERE n_chars % 2 = 0 "
            "UNION ALL "
            "SELECT doc_id FROM documents WHERE n_chars % 2 = 1 "
            "AND lang = 'en')"
        ),
        "lake_delete_compact": (
            "SELECT doc_id, lang, source, n_chars FROM documents "
            "WHERE doc_id % 7 <> 0"
        ),
        "seen_ttl_users": (
            "SELECT event_id, user_id, value FROM events "
            "WHERE event_id % 2 = 1 AND user_id NOT IN ("
            "SELECT user_id FROM events WHERE event_id % 2 = 0 "
            "GROUP BY user_id "
            "HAVING MAX(epoch_us(ts)) >= 1706486400000000)"
        ),
        "template_novelty": (
            "WITH e AS (SELECT event_type, user_id, "
            "CASE WHEN value >= 0.5 THEN 'high' ELSE 'low' END AS band, "
            "event_id % 2 = 0 AS is_idx FROM events), "
            "g AS (SELECT event_type, "
            "COUNT(*) FILTER (WHERE is_idx) AS n_idx, "
            "COUNT(*) FILTER (WHERE NOT is_idx) AS n_bat, "
            "(CASE WHEN COUNT(DISTINCT user_id) FILTER (WHERE is_idx) > 1 "
            "THEN '<*>' ELSE CAST(MIN(user_id) FILTER (WHERE is_idx) "
            "AS VARCHAR) END) AS iu, "
            "(CASE WHEN COUNT(DISTINCT band) FILTER (WHERE is_idx) > 1 "
            "THEN '<*>' ELSE MIN(band) FILTER (WHERE is_idx) END) AS ib, "
            "(CASE WHEN COUNT(DISTINCT user_id) FILTER (WHERE NOT is_idx) "
            "> 1 THEN '<*>' ELSE CAST(MIN(user_id) FILTER "
            "(WHERE NOT is_idx) AS VARCHAR) END) AS bu, "
            "(CASE WHEN COUNT(DISTINCT band) FILTER (WHERE NOT is_idx) > 1 "
            "THEN '<*>' ELSE MIN(band) FILTER (WHERE NOT is_idx) END) "
            "AS bb, "
            "(CASE WHEN COUNT(DISTINCT user_id) > 1 THEN '<*>' "
            "ELSE CAST(MIN(user_id) AS VARCHAR) END) AS mu, "
            "(CASE WHEN COUNT(DISTINCT band) > 1 THEN '<*>' "
            "ELSE MIN(band) END) AS mb "
            "FROM e GROUP BY event_type) "
            "SELECT CAST(5 AS BIGINT) AS n_tok, event_type AS t0, "
            "CASE WHEN n_idx = 0 THEN 'new_group' "
            "WHEN (mu <> iu OR mb <> ib) THEN 'changed' "
            "ELSE 'known' END AS status, "
            "event_type || ' user ' || bu || ' value ' || bb "
            "AS template_batch, "
            "CASE WHEN n_idx = 0 THEN NULL ELSE event_type || ' user ' "
            "|| iu || ' value ' || ib END AS template_index, "
            "n_bat AS n_lines FROM g WHERE n_bat > 0"
        ),
        "incremental_agg": (
            "SELECT event_type, COUNT(event_id) AS n, "
            "CAST(ROUND(SUM(value) * 100) AS BIGINT) AS value_sum_c, "
            "MIN(value) AS vmin, MAX(value) AS vmax, "
            "CAST(ROUND(AVG(value) * 1000000) AS BIGINT) AS value_avg_u, "
            "CAST(ROUND(VAR_SAMP(value) * 1000000) AS BIGINT) "
            "AS value_var_u FROM events GROUP BY event_type"
        ),
        # golden-value oracles (tools/golden.py): independent
        # single-threaded re-implementations of the sketch / signature
        # specs, rendered as VALUES literals over the sf0.01 inputs.
        **_golden_oracles(),
    }


_GOLDEN_CACHE: dict = {}


def _golden_oracles() -> dict[str, str]:
    if _GOLDEN_CACHE:
        return _GOLDEN_CACHE
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "golden.py")
    spec = importlib.util.spec_from_file_location("vr_golden", path)
    golden = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(golden)
    tokp = _tokens_q_path()
    _GOLDEN_CACHE.update({
        "inverted_search": golden.inverted_search_sql(),
        "minhash_index": golden.minhash_index_sql(),
        "minhash_ingest": golden.minhash_ingest_sql(),
        "entropy_docs": golden.byte_entropy_sql(),
        "quantile_band": (
            "SELECT event_id, user_id, value FROM events "
            "WHERE value >= (SELECT quantile_disc(value, 0.25) FROM events) "
            "AND value <= (SELECT quantile_disc(value, 0.75) FROM events)"
        ),
        "row_number_docs": (
            "SELECT doc_id, n_chars, CAST(ROW_NUMBER() OVER "
            "(ORDER BY n_chars DESC, doc_id DESC) - 1 AS BIGINT) AS row_id, "
            "CAST((ROW_NUMBER() OVER "
            "(ORDER BY n_chars DESC, doc_id DESC) - 1) // 1000 AS BIGINT) "
            "AS shard FROM documents"
        ),
        "uniform_sample_docs": golden.uniform_sample_k_sql(37, 5),
        "heavy_hitters": (
            f"WITH f AS (SELECT UNNEST(tokens) AS token "
            f"FROM read_parquet('{tokp}/part-*.parquet')), "
            "c AS (SELECT CAST(token AS BIGINT) AS token, "
            "CAST(COUNT(*) AS BIGINT) AS cnt FROM f GROUP BY 1) "
            "SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 25"
        ),
        "retention_cohorts": (
            "WITH p AS (SELECT user_id, "
            "CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS per "
            "FROM events), "
            "c AS (SELECT user_id, MIN(per) AS cohort FROM p GROUP BY 1), "
            "d AS (SELECT DISTINCT p.user_id, c.cohort, "
            "p.per - c.cohort AS off FROM p JOIN c USING (user_id)) "
            "SELECT cohort AS cohort_period, off AS period_offset, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1, 2"
        ),
        "funnel_events": (
            "WITH u AS (SELECT DISTINCT user_id FROM events "
            "WHERE event_type IN ('view', 'click', 'purchase')), "
            "s0 AS (SELECT user_id, MIN(ts) AS t_view FROM events "
            "WHERE event_type = 'view' GROUP BY 1), "
            "s1 AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e "
            "JOIN s0 USING (user_id) WHERE e.event_type = 'click' "
            "AND e.ts > s0.t_view GROUP BY 1), "
            "s2 AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM events e "
            "JOIN s1 USING (user_id) WHERE e.event_type = 'purchase' "
            "AND e.ts > s1.t_click GROUP BY 1) "
            "SELECT u.user_id, s0.t_view, s1.t_click, s2.t_purchase, "
            "CAST(CASE WHEN s2.user_id IS NOT NULL THEN 3 "
            "WHEN s1.user_id IS NOT NULL THEN 2 "
            "WHEN s0.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) "
            "AS stages_completed "
            "FROM u LEFT JOIN s0 USING (user_id) "
            "LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)"
        ),
        "pq_search": golden.pq_search_sql(),
        "hist_quantiles": (
            "WITH c AS (SELECT event_type, CASE WHEN value <= 50.0 THEN 0 "
            "WHEN value <= 100.0 THEN 1 WHEN value <= 250.0 THEN 2 "
            "ELSE 3 END AS bin, COUNT(*) AS bn FROM events "
            "WHERE value IS NOT NULL GROUP BY 1, 2), "
            "t AS (SELECT event_type, CAST(SUM(bn) AS BIGINT) AS total "
            "FROM c GROUP BY 1), "
            "cum AS (SELECT event_type, bin, SUM(bn) OVER "
            "(PARTITION BY event_type ORDER BY bin) AS cum FROM c), "
            "ps AS (SELECT * FROM (VALUES (0.5, 'p50'), (0.9, 'p90'), "
            "(0.99, 'p99')) AS v(p, nm)), "
            "sel AS (SELECT cum.event_type, ps.nm, MIN(cum.bin) AS b "
            "FROM cum JOIN t USING (event_type) CROSS JOIN ps "
            "WHERE cum.cum >= ps.p * t.total GROUP BY 1, 2), "
            "val AS (SELECT event_type, nm, CASE b WHEN 0 THEN 50.0 "
            "WHEN 1 THEN 100.0 WHEN 2 THEN 250.0 "
            "ELSE 'infinity'::DOUBLE END AS v FROM sel) "
            "SELECT t.event_type, t.total AS n, "
            "MAX(CASE WHEN nm = 'p50' THEN v END) AS p50, "
            "MAX(CASE WHEN nm = 'p90' THEN v END) AS p90, "
            "MAX(CASE WHEN nm = 'p99' THEN v END) AS p99 "
            "FROM t JOIN val USING (event_type) GROUP BY 1, 2"
        ),
        "bm25_search": golden.bm25_search_sql(),
        "pca_embeddings": golden.pca_embeddings_sql(),
        "nb_classify_docs": golden.nb_classify_sql(),
        "normalize_text_docs": (
            r"SELECT doc_id, trim(regexp_replace(lower(nfc_normalize(text)), "
            r"'\s+', ' ', 'g')) AS norm FROM documents"
        ),
        "mad_outliers": (
            "WITH m AS (SELECT quantile_disc(o_totalprice, 0.5) AS med "
            "FROM orders), "
            "d AS (SELECT quantile_disc(abs(o_totalprice - med), 0.5) AS mad "
            "FROM orders, m) "
            "SELECT o_orderkey, o_totalprice FROM orders, m, d "
            "WHERE abs(o_totalprice - med) <= 3.0 * mad"
        ),
        "simhash_docs": golden.simhash_docs_sql(),
        "dsir_select": golden.dsir_select_sql(),
        "minhash_pairs": golden.minhash_pairs_sql(),
        "token_near_dup": golden.token_near_dup_sql(),
        "approx_distinct_users": golden.approx_distinct_users_sql(),
        "media_features": golden.media_features_sql(),
        "config_syslog_metrics": golden.config_syslog_metrics_sql(),
        "simhash_pairs": golden.simhash_pairs_sql(),
        "repetition_signals": golden.repetition_signals_sql(),
        "line_dedup_docs": golden.line_dedup_sql(),
        "paragraph_dedup_docs": golden.paragraph_dedup_sql(),
        "line_dedup_keep_first": golden.line_dedup_keep_first_sql(),
        "gopher_filter": golden.gopher_filter_sql(),
        "blocklist_filter": golden.blocklist_sql(),
        "gopher_quality": golden.gopher_quality_sql(),
        "split_holdout_docs": golden.split_holdout_sql(),
        "weighted_sample_docs": golden.weighted_sample_sql(),
        "pagerank_hosts": golden.pagerank_sql(),
        "profile_orders": golden.profile_orders_sql(),
        "bpe_merges": golden.bpe_merges_sql(),
        "bpe_encode_docs": golden.bpe_encode_sql(),
        "snapshot_diff": golden.snapshot_diff_sql(),
        "kmeans_embeddings": golden.kmeans_sql(),
        "ewma_events": golden.ewma_sql(),
        "grouped_standardize": (
            "WITH c AS (SELECT l_returnflag AS k, "
            "COUNT(l_quantity) AS n, SUM(l_quantity) AS sx, "
            "SUM(l_quantity*l_quantity) AS sxx FROM lineitem "
            "GROUP BY 1) "
            "SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS "
            "l_linenumber, l.l_returnflag, l.l_quantity, "
            "(l.l_quantity - c.sx/c.n) / "
            "sqrt((c.sxx - c.sx*c.sx/c.n)/(c.n - 1)) AS l_quantity_z "
            "FROM lineitem l JOIN c ON l.l_returnflag = c.k"
        ),
        "robust_scale_events": (
            "WITH m AS (SELECT quantile_disc(value, 0.25) AS q1, "
            "quantile_disc(value, 0.5) AS med, "
            "quantile_disc(value, 0.75) AS q3 FROM events) "
            "SELECT event_id, value, "
            "(value - med) / (q3 - q1) AS value_r FROM events, m"
        ),
        "minmax_events": (
            "WITH m AS (SELECT min(value) AS mn, max(value) AS mx "
            "FROM events) SELECT event_id, value, "
            "(value - mn) / (mx - mn) AS value_mm FROM events, m"
        ),
        "target_encode": (
            "WITH g AS (SELECT SUM(l_quantity) AS gs, "
            "COUNT(l_quantity) AS gn FROM lineitem), "
            "c AS (SELECT l_returnflag AS k, SUM(l_quantity) AS s, "
            "COUNT(l_quantity) AS n FROM lineitem GROUP BY 1) "
            "SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS "
            "l_linenumber, l.l_returnflag, l.l_quantity, "
            "(c.s + 10.0 * (g.gs / g.gn)) / (c.n + 10.0) "
            "AS l_returnflag_te "
            "FROM lineitem l, g JOIN c ON l.l_returnflag = c.k"
        ),
        "one_hot_events": (
            "SELECT event_id, event_type, COALESCE(CAST(event_type = 'click' AS BIGINT), 0) AS event_type_click, COALESCE(CAST(event_type = 'error' AS BIGINT), 0) AS event_type_error, COALESCE(CAST(event_type = 'purchase' AS BIGINT), 0) AS event_type_purchase, COALESCE(CAST(event_type = 'signup' AS BIGINT), 0) AS event_type_signup, COALESCE(CAST(event_type = 'view' AS BIGINT), 0) AS event_type_view FROM events"
        ),
        "log_templates": (
            "SELECT CAST(5 AS BIGINT) AS n_tok, event_type AS t0, "
            "event_type || ' user ' || "
            "(CASE WHEN COUNT(DISTINCT user_id) > 1 THEN '<*>' "
            "ELSE CAST(MIN(user_id) AS VARCHAR) END) || ' value ' || "
            "(CASE WHEN COUNT(DISTINCT (CASE WHEN value >= 0.5 "
            "THEN 'high' ELSE 'low' END)) > 1 THEN '<*>' "
            "ELSE MIN(CASE WHEN value >= 0.5 THEN 'high' ELSE 'low' "
            "END) END) AS template, COUNT(*) AS n_lines "
            "FROM events GROUP BY event_type"
        ),
        "semantic_join": (
            "WITH s AS (SELECT a.vec_id AS src, b.vec_id AS dst, "
            "list_cosine_similarity(a.embedding, b.embedding) AS c "
            "FROM embeddings a, embeddings b "
            "WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1) "
            "SELECT src, dst, CAST(row_number() OVER "
            "(PARTITION BY src ORDER BY c DESC, dst) - 1 AS BIGINT) "
            "AS rank FROM s QUALIFY row_number() OVER "
            "(PARTITION BY src ORDER BY c DESC, dst) <= 3"
        ),
        "argmax_events": (
            "SELECT event_type, event_id, value FROM events "
            "QUALIFY row_number() OVER (PARTITION BY event_type "
            "ORDER BY value DESC, event_id) = 1"
        ),
        "rate_events": (
            "WITH s AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, "
            "value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts) "
            "AS d, value FROM events) "
            "SELECT user_id, ts_us, "
            "CASE WHEN d < 0 THEN value ELSE d END AS rate FROM s"
        ),
        "winsorize_events": (
            "WITH m AS (SELECT quantile_disc(value, 0.05) AS lo, "
            "quantile_disc(value, 0.95) AS hi FROM events) "
            "SELECT event_id, value, "
            "LEAST(GREATEST(value, lo), hi) AS value_w FROM events, m"
        ),
        "standardize_lineitem": (
            "WITH m AS (SELECT COUNT(l_quantity) AS n, "
            "SUM(l_quantity) AS sx, SUM(l_quantity*l_quantity) AS sxx "
            "FROM lineitem) "
            "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) "
            "AS l_linenumber, l_quantity, "
            "(l_quantity - sx/n) / sqrt((sxx - sx*sx/n)/(n-1)) "
            "AS l_quantity_z FROM lineitem, m"
        ),
        "bucketize_events": (
            "WITH m AS (SELECT min(value) AS mn, max(value) AS mx "
            "FROM events) "
            "SELECT event_id, value, "
            "LEAST(GREATEST(CAST(FLOOR((value - mn) * "
            "(CAST(10 AS DOUBLE) / (mx - mn))) AS BIGINT), 0), 9) "
            "AS wbin, "
            "CAST(value > (SELECT quantile_disc(value, 1/10.0) FROM events) AS BIGINT) + CAST(value > (SELECT quantile_disc(value, 2/10.0) FROM events) AS BIGINT) + CAST(value > (SELECT quantile_disc(value, 3/10.0) FROM events) AS BIGINT) + CAST(value > (SELECT quantile_disc(value, 4/10.0) FROM events) AS BIGINT) + CAST(value > (SELECT quantile_disc(value, 5/10.0) FROM events) AS BIGINT) + CAST(value > (SELECT quantile_disc(value, 6/10.0) FROM events) AS BIGINT) + CAST(value > (SELECT quantile_disc(value, 7/10.0) FROM events) AS BIGINT) + CAST(value > (SELECT quantile_disc(value, 8/10.0) FROM events) AS BIGINT) + CAST(value > (SELECT quantile_disc(value, 9/10.0) FROM events) AS BIGINT) "
            "AS qbin FROM events, m"
        ),
        "scd2_user_state": (
            "WITH s AS (SELECT user_id, ts, event_type, "
            "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts) "
            "AS prev FROM events), "
            "c AS (SELECT user_id, event_type, ts AS valid_from "
            "FROM s WHERE prev IS NULL OR prev <> event_type) "
            "SELECT user_id, event_type, valid_from, "
            "LEAD(valid_from) OVER (PARTITION BY user_id "
            "ORDER BY valid_from) AS valid_to, "
            "(LEAD(valid_from) OVER (PARTITION BY user_id "
            "ORDER BY valid_from) IS NULL) AS is_current FROM c"
        ),
        "range_join_events": golden.range_join_sql(),
        "grouped_mode": (
            "SELECT o_orderstatus, top_priority FROM ("
            " SELECT o_orderstatus, o_orderpriority AS top_priority,"
            " row_number() OVER (PARTITION BY o_orderstatus"
            " ORDER BY count(*) DESC, o_orderpriority ASC) AS rn"
            " FROM orders GROUP BY o_orderstatus, o_orderpriority"
            ") WHERE rn = 1"
        ),
        "grouped_corr": (
            "SELECT l_returnflag,"
            " (sum(l_quantity*l_linenumber) - sum(l_quantity)*"
            "sum(l_linenumber)/count(*)) / (count(*)-1) AS ql_cov,"
            " (sum(l_quantity*l_linenumber) - sum(l_quantity)*"
            "sum(l_linenumber)/count(*)) / sqrt("
            "(sum(l_quantity*l_quantity) - sum(l_quantity)*sum(l_quantity)"
            "/count(*)) * (sum(l_linenumber*l_linenumber) - "
            "sum(l_linenumber)*sum(l_linenumber)/count(*))) AS ql_corr,"
            " sum(l_quantity*l_linenumber)/sum(l_linenumber) AS q_wmean,"
            " (sum(l_quantity*l_linenumber) - sum(l_quantity)*"
            "sum(l_linenumber)/count(*)) / (sum(l_quantity*l_quantity)"
            " - sum(l_quantity)*sum(l_quantity)/count(*)) AS q_slope,"
            " sum(l_linenumber)/count(*) - ((sum(l_quantity*"
            "l_linenumber) - sum(l_quantity)*sum(l_linenumber)/count(*))"
            " / (sum(l_quantity*l_quantity) - sum(l_quantity)*"
            "sum(l_quantity)/count(*))) * (sum(l_quantity)/count(*)) "
            "AS q_icept FROM lineitem GROUP BY l_returnflag"
        ),
        "grouped_var": (
            "SELECT l_returnflag,"
            " (sum(l_quantity*l_quantity) - sum(l_quantity)*sum(l_quantity)"
            "/count(l_quantity)) / (count(l_quantity)-1) AS q_var,"
            " sqrt((sum(l_quantity*l_quantity) - sum(l_quantity)*"
            "sum(l_quantity)/count(l_quantity)) / (count(l_quantity)-1))"
            " AS q_std FROM lineitem GROUP BY l_returnflag"
        ),
        "ffill_events": (
            "SELECT event_id, last_value(CASE WHEN event_type = 'click'"
            " THEN value END IGNORE NULLS) OVER (PARTITION BY user_id"
            " ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING"
            " AND CURRENT ROW) AS v_ffill FROM events"
        ),
        "bfill_events": (
            "SELECT event_id, first_value(CASE WHEN event_type = 'click'"
            " THEN value END IGNORE NULLS) OVER (PARTITION BY user_id"
            " ORDER BY ts, event_id ROWS BETWEEN CURRENT ROW"
            " AND UNBOUNDED FOLLOWING) AS v_bfill FROM events"
        ),
        "resample_ffill": (
            "WITH agg AS (SELECT event_type, (epoch_us(ts) // 3600000000)"
            " * 3600000000 AS window_start, count(value) AS n,"
            " max(value) AS vmax FROM events GROUP BY 1, 2),"
            " rng AS (SELECT event_type, min(window_start) lo,"
            " max(window_start) hi FROM agg GROUP BY 1),"
            " grid AS (SELECT event_type, unnest(range(lo,"
            " hi + 3600000000, 3600000000)) AS window_start FROM rng),"
            " j AS (SELECT g.event_type, g.window_start, a.n, a.vmax"
            " FROM grid g LEFT JOIN agg a USING (event_type, window_start))"
            " SELECT event_type, window_start,"
            " last_value(n IGNORE NULLS) OVER w AS n,"
            " last_value(vmax IGNORE NULLS) OVER w AS vmax"
            " FROM j WINDOW w AS (PARTITION BY event_type"
            " ORDER BY window_start ROWS BETWEEN UNBOUNDED PRECEDING"
            " AND CURRENT ROW)"
        ),
        "resample_events": (
            "WITH agg AS (SELECT event_type, (epoch_us(ts) // 3600000000)"
            " * 3600000000 AS window_start, count(value) AS n,"
            " max(value) AS vmax FROM events GROUP BY 1, 2),"
            " rng AS (SELECT event_type, min(window_start) lo,"
            " max(window_start) hi FROM agg GROUP BY 1),"
            " grid AS (SELECT event_type, unnest(range(lo,"
            " hi + 3600000000, 3600000000)) AS window_start FROM rng)"
            " SELECT g.event_type, g.window_start, coalesce(a.n, 0) AS n,"
            " coalesce(a.vmax, 0) AS vmax"
            " FROM grid g LEFT JOIN agg a USING (event_type, window_start)"
        ),
        "url_dedup_docs": golden.url_dedup_sql(),
        "c4_clean_docs": golden.c4_clean_sql(),
        "bloom_seen": golden.bloom_seen_sql(),
        "cms_counts": golden.cms_counts_sql(),
        "set_ops": (
            "SELECT o_custkey, 'both' AS lane FROM "
            "(SELECT o_custkey FROM orders INTERSECT "
            "SELECT c_custkey FROM customer WHERE "
            "c_mktsegment = 'BUILDING') "
            "UNION ALL SELECT o_custkey, 'only' AS lane FROM "
            "(SELECT o_custkey FROM orders EXCEPT "
            "SELECT c_custkey FROM customer WHERE "
            "c_mktsegment = 'BUILDING')"
        ),
        "union_align": (
            "SELECT o_orderkey AS id, o_custkey AS cust, "
            "o_totalprice AS price, CAST(NULL AS VARCHAR) AS segment "
            "FROM orders UNION ALL "
            "SELECT c_custkey, CAST(NULL AS BIGINT), "
            "CAST(CAST(c_acctbal AS FLOAT) AS DOUBLE), c_mktsegment "
            "FROM customer"
        ),
        "pivot_events": (
            "SELECT user_id, "
            "count(value) FILTER (event_type = 'click') AS n_click, "
            "count(value) FILTER (event_type = 'error') AS n_error, "
            "count(value) FILTER (event_type = 'purchase') AS n_purchase, "
            "count(value) FILTER (event_type = 'signup') AS n_signup, "
            "count(value) FILTER (event_type = 'view') AS n_view "
            "FROM events GROUP BY user_id"
        ),
        "unpivot_orders": (
            "SELECT o_orderkey, 'o_totalprice' AS name, "
            "CAST(o_totalprice AS DOUBLE) AS value FROM orders "
            "UNION ALL SELECT o_orderkey, 'o_custkey' AS name, "
            "CAST(o_custkey AS DOUBLE) AS value FROM orders"
        ),
        "window_shift": (
            "SELECT event_id, user_id, "
            "LAG(value) OVER w AS prev_value, "
            "LEAD(value) OVER w AS next_value, "
            "value - LAG(value) OVER w AS dvalue, "
            "CAST(SUM(event_id) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
            "AS cum_eid, "
            "ROW_NUMBER() OVER w AS rn, "
            "CAST(SUM(event_id) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND "
            "CURRENT ROW) AS BIGINT) AS roll3_eid FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ),
        "compression_ratio": golden.compression_ratio_sql(),
        "broadcast_join_parts": (
            "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS "
            "l_linenumber, l_partkey, l_quantity, p_brand, "
            "CAST(p_size AS BIGINT) AS p_size FROM lineitem "
            "LEFT JOIN part ON l_partkey = p_partkey"
        ),
        "rank_lineitem": (
            "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) "
            "AS l_linenumber, l_quantity, "
            "RANK() OVER w AS rnk, "
            "CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk, "
            "PERCENT_RANK() OVER w AS prnk, "
            "CUME_DIST() OVER w AS cume, "
            "FIRST_VALUE(l_quantity) OVER w AS fv, "
            "LAST_VALUE(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND UNBOUNDED FOLLOWING) AS lv, "
            "NTH_VALUE(l_quantity, 2) OVER (w ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND UNBOUNDED FOLLOWING) AS nv2, "
            "CAST(NTILE(3) OVER (PARTITION BY l_orderkey ORDER BY "
            "l_quantity, l_linenumber) AS BIGINT) AS tile "
            "FROM lineitem "
            "WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_quantity)"
        ),
        "cube_orders": (
            "SELECT o_orderpriority, o_orderstatus, "
            "count(o_orderkey) AS n, "
            "CAST(sum(o_orderkey) AS BIGINT) AS key_sum, "
            "max(o_totalprice) AS max_price, "
            "CAST(sum(o_orderkey) AS DOUBLE) / count(o_orderkey) "
            "AS mean_key, "
            "CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) "
            "AS grouping_id "
            "FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)"
        ),
        "rollup_orders": (
            "SELECT o_orderpriority, o_orderstatus, "
            "count(o_orderkey) AS n, "
            "CAST(sum(o_orderkey) AS BIGINT) AS key_sum, "
            "max(o_totalprice) AS max_price, "
            "CAST(sum(o_orderkey) AS DOUBLE) / count(o_orderkey) "
            "AS mean_key, "
            "2 - GROUPING(o_orderpriority) - GROUPING(o_orderstatus) "
            "AS grouping_level "
            "FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)"
        ),
        "full_outer_join": (
            "WITH o7 AS (SELECT * FROM orders WHERE o_orderkey % 7 = 0) "
            "SELECT o.o_orderkey, "
            "COALESCE(o.o_custkey, c.c_custkey) AS o_custkey, "
            "c.c_mktsegment FROM o7 o FULL OUTER JOIN customer c "
            "ON o.o_custkey = c.c_custkey"
        ),
        "semi_anti_join": (
            "SELECT o_orderkey, o_custkey, 'in' AS lane FROM orders o "
            "WHERE EXISTS (SELECT 1 FROM customer c WHERE "
            "c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING') "
            "UNION ALL "
            "SELECT o_orderkey, o_custkey, 'out' AS lane FROM orders o "
            "WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE "
            "c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')"
        ),
        "pack_sequences": golden.pack_sequences_sql(_TOKENS_Q_ROWS, 11, 2048, 8),
        "token_dedup_collapse": golden.token_dedup_collapse_sql(),
        "strip_dup_passages": golden.strip_dup_passages_sql(
            _passages_q_path(), 16, 2),
        "tfidf_docs": golden.tfidf_sql(),
        "stdlib_arrays": (
            "SELECT doc_id, regexp_extract_all(text, '[0-9]+') AS nums, "
            "list_concat(string_split(source, 'c'), ['x', 'y']) AS appended "
            "FROM documents"
        ),
        "token_budget_cap": golden.token_budget_cap_sql(4000, 11),
        "mixture_sample": golden.mixture_sample_sql(_MIXTURE_RATES, 0.05, 7),
        "per_key_cap": golden.per_key_cap_sql(5, 3),
        "shuffle_order": golden.shuffle_order_sql(5, 64),
        "semantic_dedup": golden.semantic_dedup_sql(),
        "lm_perplexity": golden.lm_perplexity_sql(),
        "approx_quantiles": golden.grouped_approx_quantiles_sql(),
        "diverse_select": golden.diverse_select_sql(),
        "zorder_events": golden.zorder_events_sql(),
        "resolve_entities": golden.resolve_entities_sql(),
        "dedup_keep_best": golden.dedup_keep_best_sql(),
        "weighted_key_cap": golden.weighted_per_key_cap_sql(5, 3),
        "pmi_pairs": golden.pmi_pairs_sql(2, 500, 5, 40),
        "triangles_hosts": golden.triangles_sql(),
        "chi2_drift": golden.chi2_drift_sql(),
        "psi_drift": golden.psi_drift_sql(),
    })
    return _GOLDEN_CACHE
