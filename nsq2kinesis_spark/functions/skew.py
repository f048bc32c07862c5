"""Skew-mitigation helpers: salted joins for keys AQE can't split.

AQE's skew-join handling (on by default in session.py) splits oversized
SORT-MERGE partitions at runtime and is the first line of defense. Salting
is the explicit fallback for the cases AQE can't rewrite — e.g. a skewed
shuffled HASH join, or a key so hot that a single key's rows exceed one
task's memory: the hot side spreads each key over ``n_salts`` sub-keys and
the other side replicates each row to all sub-keys, so the hot key's rows
land on ``n_salts`` tasks instead of one.

Cost model: replication multiplies the small side by ``n_salts`` — use
only when the replicated side is far smaller than the skewed side (the
usual shape: a big skewed fact against a mid-size dimension too large to
broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Add a deterministic per-row salt in [0, n_salts): row-unique id
    hashed mod n. Deterministic (no rand()) so retried tasks resalt
    identically and results are reproducible."""
    return df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
    )


def replicate_salts(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate every row once per salt value (the join's other side)."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side replicated.

    Semantically identical to ``skewed.join(other, on, how)`` for inner and
    left joins (each skewed row matches exactly the replicas carrying its
    salt). The salt column never leaks into the result.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    s = with_salt(skewed, n_salts)
    r = replicate_salts(other, n_salts)
    return s.join(r, on + [SALT_COL], how).drop(SALT_COL)
