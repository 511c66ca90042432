"""CLI subprocess tests (`python -m vector_ray ...`) — the `vector`
binary's subcommand surface."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLE = os.path.join(REPO, "examples", "apache_routing.yaml")


def run_cli(*args, timeout=180):
    return subprocess.run(
        [sys.executable, "-m", "vector_ray", *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


class TestCli:
    def test_validate(self):
        r = run_cli("validate", EXAMPLE)
        assert r.returncode == 0
        assert "ok" in r.stdout

    def test_graph(self):
        r = run_cli("graph", EXAMPLE)
        assert r.returncode == 0
        assert '"parsed" -> "routed"' in r.stdout

    def test_validate_rejects_bad_config(self, tmp_path):
        bad = tmp_path / "bad.yaml"
        bad.write_text("sources: {}\ntransforms: {}\nsinks: {}\n")
        r = run_cli("validate", str(bad))
        assert r.returncode != 0

    def test_unit_tests_run(self):
        r = run_cli("test", EXAMPLE, "--num-cpus", "2")
        assert r.returncode == 0, r.stdout + r.stderr
        assert "2/2 tests passed" in r.stdout

    def test_run_executes_sinks(self):
        r = run_cli("run", EXAMPLE, "--num-cpus", "2")
        assert r.returncode == 0, r.stdout + r.stderr
        assert "all_count: 10000" in r.stdout


class TestTrainingDedupExample:
    def test_runs_and_writes_templated_ndjson(self):
        import glob
        import json
        import shutil

        shutil.rmtree("/tmp/vr_training_dedup", ignore_errors=True)
        shutil.rmtree("/tmp/vr_training_dedup_parquet", ignore_errors=True)
        r = run_cli("run", os.path.join(REPO, "examples", "training_dedup.yaml"),
                    timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        files = glob.glob("/tmp/vr_training_dedup/*/*.ndjson")
        assert files
        row = json.loads(open(files[0]).readline())
        assert {"doc_id", "text", "quality", "lang_pred"} <= set(row)


class TestTrainingCurationExample:
    def test_runs_decontaminate_chunk_pack(self):
        import glob
        import shutil

        import pyarrow.parquet as pq

        shutil.rmtree("/tmp/vr_training_curation", ignore_errors=True)
        r = run_cli("run", os.path.join(REPO, "examples", "training_curation.yaml"),
                    timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        chunk_files = glob.glob("/tmp/vr_training_curation/chunks/**/*.parquet",
                                recursive=True)
        pack_files = glob.glob("/tmp/vr_training_curation/packs/**/*.parquet",
                               recursive=True)
        assert chunk_files and pack_files
        chunks = pq.read_table(chunk_files)
        assert {"doc_id", "chunk_id", "tokens", "n_tok"} <= set(chunks.column_names)
        assert max(chunks["n_tok"].to_pylist()) <= 512
        packs = pq.read_table(pack_files)
        n_seqs = sum(packs["n_seqs"].to_pylist())
        # all 20k sequences assigned to exactly one pack; contaminated
        # docs were only dropped on the chunk branch
        assert n_seqs == 20000


class TestCorpusMixtureExample:
    def test_runs_mixture_cap_shuffle(self):
        import glob
        import shutil

        import pyarrow.parquet as pq

        shutil.rmtree("/tmp/vr_corpus_mixture", ignore_errors=True)
        r = run_cli("run", os.path.join(REPO, "examples", "corpus_mixture.yaml"),
                    timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        files = glob.glob("/tmp/vr_corpus_mixture/out/**/*.parquet", recursive=True)
        assert files
        t = pq.read_table(files)
        per = {}
        toks = {}
        for s, n in zip(t["source"].to_pylist(), t["n_tok"].to_pylist()):
            per[s] = per.get(s, 0) + 1
            toks[s] = toks.get(s, 0) + n
        # the hot source was downweighted to 0.1 then capped like the rest
        assert max(per.values()) <= 200
        # the token budget binds every source and at least one is near it
        assert max(toks.values()) <= 40000
        assert max(toks.values()) > 38000
        # deterministic: rerun produces the identical kept set
        assert len(set(t["doc_id"].to_pylist())) == t.num_rows
        # row_number assigned contiguous example ids in shuffle_key order
        ids = sorted(t["example_id"].to_pylist())
        assert ids == list(range(t.num_rows))
        pairs = sorted(zip(t["example_id"].to_pylist(),
                           t["shuffle_key"].to_pylist()))
        keys = [k for _, k in pairs]
        assert keys == sorted(keys)


class TestWebCurationExample:
    def test_runs_clean_signals_urldedup(self):
        import glob
        import shutil

        import pyarrow.parquet as pq

        shutil.rmtree("/tmp/vr_web_curation", ignore_errors=True)
        r = run_cli("run", os.path.join(REPO, "examples", "web_curation.yaml"),
                    timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        files = glob.glob("/tmp/vr_web_curation/out/**/*.parquet", recursive=True)
        assert files
        t = pq.read_table(files)
        assert {"doc_id", "norm_url", "norm_url_domain", "text_clean",
                "doc_kept", "dup_line_cnt", "text_line_dedup"} <= set(
                    t.column_names)
        # C4 drop + repetition filter really fired
        assert all(t["doc_kept"].to_pylist())
        assert max(t["dup_line_cnt"].to_pylist()) == 0
        # corpus-wide line dedup fired: every surviving line is unique
        # across the whole output, and some boilerplate was stripped
        from collections import Counter
        lines = Counter(ln for txt in t["text_line_dedup"].to_pylist()
                        for ln in txt.split("\n") if ln)
        assert lines and max(lines.values()) == 1
        assert (sum(len(x) for x in t["text_line_dedup"].to_pylist())
                < sum(len(x) for x in t["text_clean"].to_pylist()))
        # URL variants collapsed: canonical URLs are unique, and fewer
        # rows than the 1000 canonicals (some dropped by cleaning)
        urls = t["norm_url"].to_pylist()
        assert len(urls) == len(set(urls))
        assert 0 < len(urls) <= 1000
        for u in urls:
            assert "utm_" not in u and "#" not in u and "WWW" not in u

    def test_runs_dsir_curation(self):
        import glob
        import shutil

        import pyarrow.parquet as pq

        shutil.rmtree("/tmp/vr_dsir", ignore_errors=True)
        r = run_cli("run", os.path.join(REPO, "examples", "dsir_curation.yaml"),
                    timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        files = glob.glob("/tmp/vr_dsir/out/**/*.parquet", recursive=True)
        assert files
        t = pq.read_table(files)
        assert {"doc_id", "text", "comp_ratio", "dsir_logw"} <= set(t.column_names)
        # the filter kept only positive-logw docs and some were dropped
        assert 0 < len(t) < 3000
        assert min(t["dsir_logw"].to_pylist()) > 0.0


class TestHostRankExample:
    def test_runs_pagerank_topology(self):
        import glob
        import shutil

        import pyarrow.parquet as pq

        shutil.rmtree("/tmp/vr_host_rank", ignore_errors=True)
        r = run_cli("run", os.path.join(REPO, "examples", "host_rank.yaml"),
                    timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        files = glob.glob("/tmp/vr_host_rank/out/**/*.parquet", recursive=True)
        assert files
        t = pq.read_table(files)
        assert set(t.column_names) == {"node", "rank"}
        ranks = dict(zip(t["node"].to_pylist(), t["rank"].to_pylist()))
        # the filter kept only above-uniform hosts; the planted hub
        # (every 17th edge) is strongly boosted (>=20x uniform share)
        assert ranks and min(ranks.values()) > 250_000_000
        assert 0 in ranks and ranks[0] > 20 * 250_000_000


class TestTokenizerTrainExample:
    def test_runs_bpe_topology(self):
        import glob
        import shutil

        import pyarrow.parquet as pq

        shutil.rmtree("/tmp/vr_tokenizer_train", ignore_errors=True)
        r = run_cli("run", os.path.join(REPO, "examples",
                                        "tokenizer_train.yaml"),
                    timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        files = glob.glob("/tmp/vr_tokenizer_train/out/**/*.parquet",
                          recursive=True)
        assert files
        t = pq.read_table(files)
        assert set(t.column_names) == {"merge_idx", "a", "b", "new_id"}
        assert len(t) == 64
        idx = sorted(t["merge_idx"].to_pylist())
        assert idx == list(range(64))
        # new ids are allocated sequentially above the byte alphabet
        assert sorted(t["new_id"].to_pylist()) == [256 + i for i in range(64)]


class TestClassifiedRoutingExample:
    def test_classifier_gate_keeps_structured(self):
        import glob
        import shutil

        import pyarrow.parquet as pq

        shutil.rmtree("/tmp/vr_classified", ignore_errors=True)
        r = run_cli("run",
                    os.path.join(REPO, "examples",
                                 "classified_routing.yaml"),
                    timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        files = glob.glob("/tmp/vr_classified/out/**/*.parquet",
                          recursive=True)
        assert files
        t = pq.read_table(files)
        assert {"norm", "nb_pred", "nb_score_structured",
                "nb_score_salad"} <= set(t.column_names)
        # the model is trained on provenance labels; disjoint-enough
        # vocabularies mean the apache stream dominates the kept side
        assert set(t["nb_pred"].to_pylist()) == {"structured"}
        labs = t["lab"].to_pylist()
        assert labs.count("structured") > 0.9 * len(labs)
        # normalize_text ran: no double spaces, no uppercase
        assert all(("  " not in s) and (s == s.lower())
                   for s in t["norm"].to_pylist())


class TestVrlRepl:
    def test_one_shot_program(self, tmp_path):
        import json

        ev = tmp_path / "ev.json"
        ev.write_text('{"message": "hello", "status": "500"}\n'
                      '{"message": "bye", "status": "404"}\n')
        prog = tmp_path / "prog.yaml"
        prog.write_text(
            "ops:\n"
            "  - {fn: upcase, field: message, target: loud}\n"
            "  - {fn: coerce, field: status, kind: int}\n")
        r = run_cli("vrl", str(prog), "--input", str(ev))
        assert r.returncode == 0, r.stderr
        lines = [json.loads(x) for x in r.stdout.strip().splitlines()]
        assert lines[0] == {"message": "hello", "status": 500,
                            "loud": "HELLO"}
        assert lines[1]["loud"] == "BYE"

    def test_repl_applies_ops_and_survives_errors(self, tmp_path):
        import json
        import subprocess
        import sys

        ev = tmp_path / "ev.json"
        ev.write_text('{"message": "hi there"}')
        r = subprocess.run(
            [sys.executable, "-m", "vector_ray", "vrl",
             "--input", str(ev)],
            input=("{fn: upcase, field: message}\n"
                   "{fn: nosuch, field: x}\n"
                   ".\n.exit\n"),
            cwd=REPO, capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        out = [json.loads(x) for x in r.stdout.strip().splitlines()]
        assert out[-1]["message"] == "HI THERE"
        assert "nosuch" in r.stderr


class TestComponentTools:
    """`list` / `generate` / `tap` / `top` — the reference's component
    tooling surface (src/list.rs, src/generate.rs, src/tap, src/top)."""

    def test_list_text_and_json(self):
        import json

        r = run_cli("list")
        assert r.returncode == 0, r.stderr
        assert "Sources:" in r.stdout and "- remap" in r.stdout
        r = run_cli("list", "--format", "json")
        inv = json.loads(r.stdout)
        assert set(inv) == {"sources", "transforms", "sinks"}
        for t in ("filter", "reduce", "route", "compound", "dedupe"):
            assert t in inv["transforms"]
        assert "parquet" in inv["sources"] and "parquet" in inv["sinks"]
        assert len(inv["transforms"]) > 90

    def test_generate_validates_and_runs(self, tmp_path):
        import yaml

        out = tmp_path / "gen.yaml"
        r = run_cli("generate", "generator/regex_parser,filter/console",
                    "--file", str(out))
        assert r.returncode == 0, r.stderr
        cfg = yaml.safe_load(out.read_text())
        assert list(cfg["sources"]) == ["source1"]
        assert cfg["transforms"]["transform2"]["inputs"] == ["transform1"]
        assert cfg["sinks"]["sink1"]["inputs"] == ["transform2"]
        # named components: foo:generator/bar:remap
        r = run_cli("generate", "foo:generator/bar:remap")
        assert r.returncode == 0, r.stderr
        named = yaml.safe_load(r.stdout)
        assert list(named["sources"]) == ["foo"]
        assert named["transforms"]["bar"]["inputs"] == ["foo"]
        # the skeleton actually executes end to end
        r = run_cli("run", str(out), "--num-cpus", "2")
        assert r.returncode == 0, r.stderr
        assert "sink1" in r.stdout

    def test_tap_prints_ndjson_sample(self, tmp_path):
        import json

        out = tmp_path / "gen.yaml"
        run_cli("generate", "generator/regex_parser/console",
                "--file", str(out))
        r = run_cli("tap", str(out), "transform1", "--limit", "3",
                    "--num-cpus", "2")
        assert r.returncode == 0, r.stderr
        rows = [json.loads(x) for x in r.stdout.strip().splitlines()]
        assert len(rows) == 3
        assert all("word" in row for row in rows)

    def test_top_reports_per_component_rows(self, tmp_path):
        out = tmp_path / "gen.yaml"
        run_cli("generate", "generator/regex_parser/console",
                "--file", str(out))
        r = run_cli("top", str(out), "--num-cpus", "2")
        assert r.returncode == 0, r.stderr
        lines = r.stdout.strip().splitlines()
        assert lines[0].startswith("COMPONENT")
        by_name = {ln.split()[0]: ln.split() for ln in lines[1:]}
        assert by_name["source1"][3] == "1000"   # rows_out
        assert by_name["transform1"][3] == "1000"
        assert by_name["sink1"][1] == "sink"


class TestRateLimitingExample:
    def test_throttle_ttl_paths_topology(self):
        import glob
        import shutil

        import duckdb
        import pyarrow.parquet as pq

        shutil.rmtree("/tmp/vr_rate_limiting", ignore_errors=True)
        r = run_cli("run", os.path.join(REPO, "examples",
                                        "rate_limiting.yaml"),
                    timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        dd = glob.glob("/tmp/vr_rate_limiting/deduped/**/*.parquet",
                       recursive=True)
        jj = glob.glob("/tmp/vr_rate_limiting/journeys/**/*.parquet",
                       recursive=True)
        assert dd and jj
        kept = pq.read_table(dd)
        # TTL dedupe: per user, consecutive kept events are >= 12 h apart
        gaps = duckdb.sql(
            "SELECT MIN(epoch_us(ts) - prev) FROM (SELECT user_id, ts, "
            "LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) "
            "AS prev FROM kept) WHERE prev IS NOT NULL"
        ).fetchone()[0]
        assert gaps is not None and gaps >= 43_200_000_000
        src = pq.read_table(
            "/root/testdata/sf0.001/events.parquet")
        assert 0 < len(kept) < len(src)
        paths = pq.read_table(jj)
        assert set(paths.column_names) == {"path", "n_sessions"}
        assert 0 < len(paths) <= 10
        # paths are over the 5 event types, at most 3 steps
        for p in paths["path"].to_pylist():
            assert 1 <= len(p.split(">")) <= 3


class TestExplain:
    def test_explain_all_examples(self, capsys):
        """explain() renders every example config; every known-shuffle
        transform gets a non-default exchange label."""
        import glob

        import yaml

        from vector_ray.pipelines.config import _EXCHANGE, explain

        for path in sorted(glob.glob("examples/*.yaml")):
            with open(path) as fh:
                cfg = yaml.safe_load(fh)
            text = explain(cfg)
            by_name = {}
            for ln in text.splitlines():
                if ln.startswith("transform"):
                    parts = ln.split(None, 2)
                    by_name[parts[1]] = ln
            for node, ncfg in cfg.get("transforms", {}).items():
                assert node in by_name, (path, node)
                if ncfg.get("type") in _EXCHANGE:
                    assert "map-only (stateless batch kernel)" not in by_name[node], (path, node)

    def test_explain_persistent_dedupe_label(self):
        from vector_ray.pipelines.config import explain

        cfg = {
            "sources": {"s": {"type": "parquet", "path": "/x"}},
            "transforms": {"d": {"type": "dedupe", "inputs": ["s"],
                                 "fields": ["k"], "persist": "/tmp/i"}},
            "sinks": {"o": {"type": "blackhole", "inputs": ["d"]}},
        }
        text = explain(cfg)
        assert "anti-join vs persisted seen-key index" in text
        assert "driver-side consume" in text


class TestDailyCommand:
    def test_daily_ingest_then_replay(self, tmp_path):
        """`vector_ray daily <input> <workdir>` — one effectively-once
        ingest step; replaying the same input admits 0 docs."""
        from vector_ray.sources.synth import synth_parquet

        src = synth_parquet(400, seed=31, rows_per_file=100,
                            root=str(tmp_path / "in"))
        work = str(tmp_path / "work")
        r1 = run_cli("daily", src, work, "--num-cpus", "4", timeout=300)
        assert r1.returncode == 0, r1.stderr[-2000:]
        assert "new_docs: 400" in r1.stdout
        assert "aggregate:" in r1.stdout
        r2 = run_cli("daily", src, work, "--num-cpus", "4", timeout=300)
        assert r2.returncode == 0, r2.stderr[-2000:]
        assert "new_docs: 0" in r2.stdout
        assert "routed_dir: None" in r2.stdout

    def test_daily_usage_error(self):
        r = run_cli("daily", "/tmp/nonexistent-input-only")
        assert r.returncode == 2
        assert "usage" in r.stderr
