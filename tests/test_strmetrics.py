"""Jaro-Winkler semantics pinned to DuckDB's builtin: textbook values,
edge cases, and a randomized equivalence sweep (no Spark needed)."""

import math
import random

import duckdb
import pytest

from duckdb_title_mapper_spark.functions.strmetrics import jaro, jaro_winkler


@pytest.mark.parametrize(
    "s1,s2,expected",
    [
        ("martha", "marhta", 0.9611111111111111),
        ("dwayne", "duane", 0.84),
        ("dixon", "dicksonx", 0.8133333333333332),
        ("same", "same", 1.0),
        ("", "", 0.0),          # DuckDB quirk: empty-vs-empty is 0
        ("", "abc", 0.0),
        ("abc", "", 0.0),
        ("zzz", "abc", 0.0),    # no matches
    ],
)
def test_textbook_values(s1, s2, expected):
    assert math.isclose(jaro_winkler(s1, s2), expected, rel_tol=0, abs_tol=1e-12)


def test_boost_only_above_0_7():
    # common prefix but jaro <= 0.7 -> no Winkler boost
    j = jaro("abcdefgh", "abzzzzzz")
    assert j <= 0.7
    assert jaro_winkler("abcdefgh", "abzzzzzz") == j


def test_randomized_equivalence_vs_duckdb():
    rng = random.Random(42)
    con = duckdb.connect()
    for _ in range(500):
        s1 = "".join(rng.choice("abcdef ") for _ in range(rng.randint(0, 12)))
        s2 = "".join(rng.choice("abcdef ") for _ in range(rng.randint(0, 12)))
        d = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [s1, s2]
        ).fetchone()[0]
        assert math.isclose(jaro_winkler(s1, s2), d, rel_tol=0, abs_tol=1e-12), (
            s1,
            s2,
        )
