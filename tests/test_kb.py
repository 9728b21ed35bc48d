"""KB loader invariants (FIXTURES.md §1.3, SURVEY.md §1.2)."""

from duckdb_title_mapper_spark.kb import load_kb


def test_kb_counts():
    kb = load_kb()
    assert kb.num_records == 1105
    assert len(kb.corpus) == 17772
    assert len(set(kb.corpus)) == 14525


def test_record_zero_is_default():
    kb = load_kb()
    assert kb.corpus[0] == "General Worker"
    assert kb.bls_for("General Worker") == "All Occupations"


def test_reverse_map_last_wins():
    # 2,021 variants collide across categories; straight insertion over JSON
    # order means the LAST record containing a variant wins (utils.rs:218-219).
    import json
    from importlib import resources

    raw = json.loads(
        resources.files("duckdb_title_mapper_spark.resources")
        .joinpath("standarized_titles.json")
        .read_text()
    )
    kb = load_kb()
    # recompute expected winner for a known colliding variant
    for variant in ("Team Leader", "Operations Manager", "Project Manager"):
        winner = None
        for rec in raw:
            if variant in rec.get("other_titles", []) or rec["title_name"] == variant:
                winner = rec["title_name"]
        assert kb.bls_for(variant) == winner


def test_unknown_variant_identity():
    kb = load_kb()
    assert kb.bls_for("Totally Unknown Thing") == "Totally Unknown Thing"
