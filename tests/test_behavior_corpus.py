"""Run the YAML behavior corpus (tests/behavior/*.yaml) through the
config unit-test harness — the rebuild of the reference's
tests/behavior/transforms/*.toml executed by `vector test`
(src/config/unit_test.rs)."""

import glob
import os

import pytest
import yaml

from vector_ray.pipelines.config import run_unit_tests

CORPUS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "behavior", "*.yaml")))


@pytest.mark.parametrize("path", CORPUS, ids=[os.path.basename(p) for p in CORPUS])
def test_behavior_file(path):
    with open(path) as f:
        cfg = yaml.safe_load(f)
    tests = cfg.pop("tests")
    results = run_unit_tests(cfg, tests)
    failures = [r for r in results if not r["passed"]]
    assert not failures, failures


def test_corpus_not_empty():
    assert len(CORPUS) >= 7
