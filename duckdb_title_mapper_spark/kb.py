"""Knowledge-base loader for the standardized-titles corpus.

The reference embeds ``resources/standarized_titles.json`` at compile time
(``src/utils.rs:28``, ``src/utils.rs:198``); we vendor the same JSON as
package data.  Two derived structures (reference ``utils.rs:27-37`` and
``utils.rs:197-227``):

* ``corpus`` — the flattened ``other_titles`` only, in JSON order.  The
  ``title_name`` strings themselves are NOT matchable.
* ``reverse_bls`` — variant -> ``title_name``; each record contributes
  ``other_titles + [title_name]``, built by straight insertion over JSON
  order, so for the 2,021 variants that appear under multiple categories the
  LAST record containing the variant wins.  Unknown keys fall back to
  identity (``utils.rs:223-226``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from functools import lru_cache
from importlib import resources as importlib_resources

_KB_FILENAME = "standarized_titles.json"


@dataclass(frozen=True)
class KnowledgeBase:
    corpus: tuple[str, ...]  # 17,772 variant titles, JSON order
    reverse_bls: dict  # variant -> BLS title_name (last record wins)
    num_records: int

    def bls_for(self, standard_title: str) -> str:
        """Variant -> BLS category; unknown -> identity
        (reference ``utils.rs:221-226``)."""
        return self.reverse_bls.get(standard_title, standard_title)


def _load_raw() -> list[dict]:
    data = (
        importlib_resources.files("duckdb_title_mapper_spark.resources")
        .joinpath(_KB_FILENAME)
        .read_text(encoding="utf-8")
    )
    return json.loads(data)


@lru_cache(maxsize=1)
def load_kb() -> KnowledgeBase:
    records = _load_raw()
    corpus: list[str] = []
    reverse: dict[str, str] = {}
    for rec in records:
        title_name = rec["title_name"]
        others = rec.get("other_titles", [])
        corpus.extend(others)
        for variant in others:
            reverse[variant] = title_name
        reverse[title_name] = title_name
    return KnowledgeBase(
        corpus=tuple(corpus), reverse_bls=reverse, num_records=len(records)
    )
