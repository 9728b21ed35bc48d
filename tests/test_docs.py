"""Structural locks for the two r9 hygiene defects (VERDICT r9 #1).

1. README's stated query count drifted twice (r8: three docs, r9: one
   count) — assert it against the live registry so it can't go stale.
2. A redefined module-level SQL helper silently shadows every earlier
   query that calls it (Python late binding broke x_k_anonymity in r9);
   the @_q decorator raises on duplicate *query* names but nothing
   guarded duplicate *helper* names — scan the module AST for them.
"""

import ast
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_query_count_matches_registry():
    from duckdb_title_mapper_spark.workload import all_queries

    with open(os.path.join(REPO, "README.md")) as f:
        readme = f.read()
    m = re.search(r"## Declared query surface \((\d+) queries", readme)
    assert m, "README lost its query-count heading"
    assert int(m.group(1)) == len(all_queries()), (
        f"README says {m.group(1)} queries; registry has "
        f"{len(all_queries())} — update README.md's heading"
    )


def test_no_duplicate_toplevel_defs_in_workload():
    """Any duplicated top-level def rebinds the name for every earlier
    caller at call time (late binding) — the x_k_anonymity failure mode.
    Covers _foo_sql helpers AND query functions alike."""
    path = os.path.join(REPO, "duckdb_title_mapper_spark", "workload.py")
    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    seen, dups = {}, {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if node.name in seen:
                dups.setdefault(node.name, [seen[node.name]]).append(
                    node.lineno)
            else:
                seen[node.name] = node.lineno
    assert not dups, f"duplicate top-level defs in workload.py: {dups}"
