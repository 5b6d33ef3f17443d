"""Explicit salted-key skew handling for dense cells.

Reference analogue: the Ignite LOCAL_PEEK backend shuffles its cell-key
iteration order into ~1M-entry buffers so heavy (dense-urban) cells spread
across worker threads
(/root/reference/oshdb-api-ignite/src/main/java/org/heigit/ohsome/oshdb/api/mapreducer/backend/MapReducerIgniteLocalPeek.java:221-268,
Collections.shuffle) — load balancing by randomizing work order.  Spark's
equivalent problem is a shuffle-hash/sort-merge join where a handful of
cell_ids hold orders of magnitude more rows than the rest: every row of a
hot cell lands in one reducer task.

Two complementary mechanisms, both explicit (north_rule):

  * ``salted_join`` — deterministic fact-side salt `pmod(xxhash64(id), n)`
    widens each join key to (key, salt); the dimension side is exploded
    n ways.  The hot key's rows now spread over n reducer tasks.  Salt
    count is chosen from a key histogram (``pick_salts``), not guessed.
  * AQE skew-join splitting (spark.sql.adaptive.skewJoin.*) stays ON as
    the runtime safety net for skew the histogram missed (session.py).

At 10^12 documents the histogram itself is computed on the (already small)
per-cell count aggregate, never on raw rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salt_col(unique_col: str | Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) — xxhash64 is a JVM intrinsic
    (whole-stage codegen), no Python involved."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int")


def explode_salts(df: DataFrame, n_salts: int, name: str = "__salt") -> DataFrame:
    """Replicate every row once per salt value (the dimension side)."""
    return df.withColumn(
        name, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    fact_unique_col: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """fact ⋈ dim on `on`, fact side salted by `fact_unique_col`.

    Result is row-identical to fact.join(dim, on, how) for inner/left/
    left_semi/left_anti joins — the salt is an extra equi-key both sides
    agree on, then dropped.  Right/full-outer joins are rejected: every
    unmatched dim row would surface n_salts times (once per exploded salt
    replica).  With broadcast_dim the dim side (replicated n_salts times)
    is broadcast, so the fact side never shuffles at all — the preferred
    shape when dim is a query-cell set.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched dim rows "
            f"{n_salts}x (dim side is exploded per salt); use one of {sorted(allowed)}"
        )
    f = fact.withColumn("__salt", salt_col(fact_unique_col, n_salts))
    d = explode_salts(dim, n_salts)
    if broadcast_dim:
        d = F.broadcast(d)
    return f.join(d, on + ["__salt"], how).drop("__salt")


def pick_salts(
    df: DataFrame,
    key_cols: list[str],
    target_rows_per_task: int = 5_000_000,
    max_salts: int = 64,
) -> int:
    """Histogram-driven salt count: ceil(max key cardinality / target).

    Runs ONE aggregate over the (key, count) histogram — at any scale this
    is a shuffle of pre-aggregated partial counts, not of rows.
    """
    top = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]["mx"]
    )
    if top is None:
        return 1
    return max(1, min(max_salts, -(-int(top) // target_rows_per_task)))


def skew_profile(
    df: DataFrame,
    key_cols: list[str],
    target_rows_per_task: int = 5_000_000,
    max_salts: int = 64,
    hot_multiplier: int = 4,
) -> DataFrame:
    """Per-key salting PLAN: the distributed generalization of
    ``pick_salts`` — for every key, its row count, a heavy-hitter flag,
    and the salt factor a salted join should use for it (the north
    rule's "explicit salted-key skew handling for dense urban cells",
    made inspectable as a table instead of one global scalar).

    Plan shape: ONE map-side-combinable count aggregate over the keys,
    then a 1-row moments broadcast — at any scale the profile is
    cell-table-sized, raw rows shuffle once as pre-aggregated partials.

    Determinism: everything is integer arithmetic — the hot flag
    compares cnt * n_keys > hot_multiplier * total (the integer
    cross-multiplied form of cnt > hot_multiplier * mean, no double
    division), and salt_factor is the integer ceiling
    min(max_salts, (cnt + target - 1) DIV target).

    Returns (key_cols..., n_rows, is_hot, salt_factor).
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    moments = counts.agg(
        F.sum("n_rows").alias("__total"), F.count(F.lit(1)).alias("__nkeys")
    )
    t = int(target_rows_per_task)
    return (
        counts.crossJoin(F.broadcast(moments))
        .select(
            *key_cols,
            "n_rows",
            (
                F.col("n_rows") * F.col("__nkeys")
                > F.lit(int(hot_multiplier)) * F.col("__total")
            ).alias("is_hot"),
            F.least(
                F.lit(int(max_salts)).cast("long"),
                F.expr(f"(n_rows + {t - 1}) DIV {t}"),
            ).alias("salt_factor"),
        )
    )
