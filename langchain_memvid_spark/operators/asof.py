"""As-of (temporal) join — an operator Spark lacks natively.

For each left row, find the most recent right row with the same key
and right_ts ≤ left_ts (or < for strict). The naive formulation is a
range join (quadratic blowup per key); this implementation is the
scalable union+window pattern:

  1. union both sides tagged by origin (right rows carry their full row
     as a struct payload, left rows carry null),
  2. one shuffle: window partitioned by key, ordered by (ts, flag) —
     right rows sort before left at equal ts for inclusive semantics,
     after left for strict,
  3. last(payload, ignorenulls) over ROWS UNBOUNDED PRECEDING gives
     each left row its matching right row,
  4. filter back to left rows.

One shuffle on the join key, linear state, no per-key quadratic work —
this survives 100 TB where a range-condition join would not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    strict: bool = False,
    right_prefix: str = "r_",
) -> DataFrame:
    """Backward as-of left join. Output: all left columns + each right
    column prefixed with `right_prefix` (null when no match)."""
    r = (
        right.select(
            F.col(on).alias("__k"),
            F.col(right_ts).alias("__t"),
            F.struct(*[F.col(c) for c in right.columns]).alias("__r"),
        )
        .withColumn("__flag", F.lit(2 if strict else 0))
    )
    l = (
        left.select(
            F.col(on).alias("__k"),
            F.col(left_ts).alias("__t"),
            F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        )
        .withColumn("__flag", F.lit(1))
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__flag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__l").isNotNull()
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in right.columns
    ]
    return matched.select(*out_cols)
