"""DuckDB-oracle dialect helpers."""

from __future__ import annotations

import re

_CTE_RE = re.compile(r"\b(\w+) AS \(")


def materialize_ctes(sql: str) -> str:
    """Rewrite every named CTE to ``name AS MATERIALIZED (...)``.

    DuckDB inlines CTEs by default; our oracle queries build deep chains
    (synthesis → extraction → linking → encoding → scoring) where each CTE
    is referenced several times downstream — inlining makes the plan (and
    runtime) grow multiplicatively. Materializing each CTE evaluates it
    once, mirroring Spark-side stage materialization.

    The regex only matches a word character run immediately before
    `` AS (`` — recursive CTE headers like ``rr(node, r) AS (`` end in
    ``)`` and are untouched (they cannot be materialized).
    """
    return _CTE_RE.sub(r"\1 AS MATERIALIZED (", sql)
