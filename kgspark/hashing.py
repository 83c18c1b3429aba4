"""Portable deterministic hashing — the engine's randomness substrate.

The reference seeds nothing (raw ``random``/``np.random`` — e.g.
/root/reference/util.py:464-501, /root/reference/generate_errors.py:32-74).
For reproducible fixtures AND partition-count invariance (the N vs 4N
executor requirement) every "random" decision here is a pure function of
row content: a 32-bit integer derived from md5 of a key string.

Crucially the same value is computable in DuckDB (the correctness oracle):

    Spark : cast(conv(substr(md5(k), 1, 8), 16, 10) as bigint)
    DuckDB: ('0x' || substr(md5(k), 1, 8))::BIGINT

Spark's own ``rand(seed)`` is partition-dependent and ``xxhash64`` has no
DuckDB twin, so neither is used for semantic decisions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_SPACE = float(2**32)


def _key(cols: list[Column | str], salt: str) -> Column:
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.concat_ws("|", F.lit(salt), *[c.cast("string") for c in cs])


def phash32(cols: list[Column | str], salt: str = "") -> Column:
    """Portable 32-bit non-negative hash of the given columns."""
    k = _key(cols, salt)
    return F.conv(F.substring(F.md5(k), 1, 8), 16, 10).cast("bigint")


def puniform(cols: list[Column | str], salt: str = "") -> Column:
    """Deterministic uniform in [0, 1) keyed on row content."""
    return phash32(cols, salt) / F.lit(HASH_SPACE)


def pick_mod(cols: list[Column | str], n: Column | int, salt: str = "") -> Column:
    """Deterministic choice in [0, n) keyed on row content."""
    nn = F.lit(n) if isinstance(n, int) else n
    return F.pmod(phash32(cols, salt), nn)


# ---------------------------------------------------------------- SQL (oracle)


def sql_phash32(key_sql: str, dialect: str) -> str:
    """Same hash as :func:`phash32` as a SQL fragment.

    ``key_sql`` must already be a string-typed SQL expression identical in
    both dialects (concat_ws works in both).
    """
    if dialect == "duckdb":
        return f"(('0x' || substr(md5({key_sql}), 1, 8))::BIGINT)"
    return f"cast(conv(substr(md5({key_sql}), 1, 8), 16, 10) as bigint)"


def sql_puniform(key_sql: str, dialect: str) -> str:
    return f"({sql_phash32(key_sql, dialect)} / 4294967296.0)"
