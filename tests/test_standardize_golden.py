"""Golden end-to-end tests for the match pipeline (no Spark — pure kernel).

AUTHORITATIVE goldens come from the reference's own sqllogictest
(test/sql/title_mapper.test:16-41); the rest are VALIDATED vectors from
FIXTURES.md.
"""

from duckdb_title_mapper_spark.operators.standardize import (
    match_titles,
    standardize_title_str,
)

from goldens import AUTHORITATIVE, CORPUS_104, EDGE_CASES, MESSY_PROBES


def _check(golden: dict):
    inputs = list(golden)
    results = match_titles(inputs)
    fails = [
        (i, got, want)
        for i, got, want in zip(inputs, results, golden.values())
        if got != want
    ]
    assert not fails, fails


def test_authoritative_sqllogictest_goldens():
    _check(AUTHORITATIVE)


def test_corpus_104_goldens():
    _check(CORPUS_104)


def test_messy_probe_goldens():
    _check(MESSY_PROBES)


def test_edge_cases():
    _check(EDGE_CASES)


def test_duplicates_in_batch_agree():
    out = match_titles(["poet", "author", "poet", "poet"])
    assert out[0] == out[2] == out[3] == "Poet - Writers and Authors"


def test_single_string_api():
    assert standardize_title_str("biologist") == (
        "Biologist - Biological Scientists, All Other"
    )
