"""Deterministic statistical aggregates for cross-engine parity at scale.

The built-in stddev/var/corr aggregate doubles in partition order, so two
runs (or two engines) can disagree in the last ulp — and at 1000 executors
the partial-aggregation order is never stable.  These variants accumulate
the raw moments (sum x, sum x^2, sum xy, ...) as DECIMAL — exact,
associative, order-independent — then evaluate the closed-form in double at
the very end.  The shuffle shape is identical to the built-ins (one partial
+ one final aggregate); only the sum buffer type changes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

#: (18,6) so a product of two casts is decimal(37,12) — exact within the
#: 38-digit cap on both Spark and DuckDB (wider inputs would trigger
#: Spark's precision-loss rescale and break cross-engine exactness)
_DEC = "decimal(18,6)"
_DEC_SQ = "decimal(38,12)"


def _d(c: Column) -> Column:
    return c.cast(_DEC)


def exact_variance(df: DataFrame, value_col: str, group_cols: list[str]) -> DataFrame:
    """Per-group n / mean / var_samp / stddev_samp with exact decimal
    moment sums: var = (S2 - S1^2/n) / (n-1).  Bit-identical across runs,
    partitionings, and engines (same formula over the same exact sums)."""
    v = F.col(value_col)
    s1, s2 = _d(v), (_d(v) * _d(v)).cast(_DEC_SQ)
    agg = df.groupBy(*group_cols).agg(
        F.count(v).alias("n"),
        F.sum(s1).alias("_s1"),
        F.sum(s2).alias("_s2"),
    )
    s1d, s2d = F.col("_s1").cast("double"), F.col("_s2").cast("double")
    n = F.col("n").cast("double")
    var = (s2d - s1d * s1d / n) / (n - 1)
    return agg.select(
        *group_cols, "n",
        F.round(s1d / n, 6).alias("mean"),
        F.round(var, 6).alias("var_samp"),
        F.round(F.sqrt(var), 6).alias("stddev_samp"),
    )


def exact_corr(df: DataFrame, x_col: str, y_col: str,
               group_cols: list[str]) -> DataFrame:
    """Per-group Pearson correlation from exact decimal cross-moments:
    corr = (n*Sxy - Sx*Sy) / sqrt((n*Sx2 - Sx^2) * (n*Sy2 - Sy^2))."""
    x, y = F.col(x_col), F.col(y_col)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_d(x)).alias("_sx"),
        F.sum(_d(y)).alias("_sy"),
        F.sum((_d(x) * _d(x)).cast(_DEC_SQ)).alias("_sx2"),
        F.sum((_d(y) * _d(y)).cast(_DEC_SQ)).alias("_sy2"),
        F.sum((_d(x) * _d(y)).cast(_DEC_SQ)).alias("_sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sx2, sy2 = F.col("_sx2").cast("double"), F.col("_sy2").cast("double")
    sxy = F.col("_sxy").cast("double")
    num = n * sxy - sx * sy
    den = F.sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy))
    return agg.select(
        *group_cols, "n",
        F.round(num / den, 6).alias("corr"),
    )


def deterministic_mode(df: DataFrame, value_col: str,
                       group_cols: list[str]) -> DataFrame:
    """Per-group mode with a total tie-break (highest count, then smallest
    value) — built-in mode() picks an arbitrary winner on ties, which is a
    silent nondeterminism under repartitioning.  Two shuffles: count, then
    a per-group window on the (much smaller) distinct-value counts."""
    counts = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("_cnt"))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("_cnt").desc(), F.col(value_col))
    return (counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(*group_cols,
                    F.col(value_col).alias("mode"),
                    F.col("_cnt").alias("mode_count")))


def histogram(df: DataFrame, value_col: str, lo: float, hi: float,
              buckets: int) -> DataFrame:
    """Fixed-range histogram: bucket = clamp(floor((v-lo)/width)).  A plain
    floor-division projection + one count shuffle of at most `buckets`
    groups — engine-portable (no width_bucket dependency) and immune to the
    two-pass min/max scan a data-driven range would need."""
    width = (hi - lo) / buckets
    raw = F.floor((F.col(value_col) - lo) / width).cast("int")
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(buckets - 1))
    return (df.select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("bucket_lo", F.round(F.col("bucket") * width + lo, 6))
            .withColumn("bucket_hi", F.round((F.col("bucket") + 1) * width + lo, 6)))
