"""Version diff: added / removed / changed rows between two table
versions — the operator the reference's "git for tables" model implies but
never ships (its version access is whole-table reads at fixed offsets,
client/td-sdk/tabsdata/tableuri.py `HEAD~n`; there is no row-level diff
service in server/libraries/td-services).

Scale design (100 TB x 2 versions):
- Each side is projected to (key, digest) BEFORE the join: the digest is
  one xxhash64 over the canonical JSON of the compared columns, so the
  full-outer join shuffles 8-byte digests, never row payloads.
- One shuffle per side, keyed on the diff key — with both versions
  bucketed by key on write (scale.write_bucketed) the exchange disappears
  entirely.
- Output is status + keys only; callers join back to either version for
  payloads (semi-join on an already-partitioned key).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .table_store import TableStore

#: diff status values, in output order
ADDED, REMOVED, CHANGED = "added", "removed", "changed"


def _digest(df: DataFrame, key_cols: list[str],
            compare_cols: list[str] | None) -> DataFrame:
    cols = compare_cols or [c for c in df.columns if c not in key_cols]
    # canonical row digest: names are baked into to_json keys, so column
    # reordering between versions does not fake a change
    payload = F.to_json(F.struct(*[F.col(c) for c in sorted(cols)]))
    return df.select(*key_cols, F.xxhash64(payload).alias("__digest"))


def table_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
               compare_cols: list[str] | None = None,
               include_unchanged: bool = False) -> DataFrame:
    """Row-level diff of two versions of a table: one row per key present
    in either side, with `status` in {added, removed, changed[, unchanged]}.

    Keys must be unique per side (enforce upstream with `unique`); the
    comparison is null-safe on every compared column."""
    # prefix-rename the new side so same-lineage inputs (both derived from
    # one scan) can never hit Spark's ambiguous-column resolution
    a = _digest(old, key_cols, compare_cols)
    b = _digest(new, key_cols, compare_cols)
    b = b.select(*[F.col(c).alias(f"__b_{c}") for c in b.columns])
    cond = [F.col(k).eqNullSafe(F.col(f"__b_{k}")) for k in key_cols]
    joined = a.join(b, cond, "full_outer")
    a_key = F.col(key_cols[0])
    b_key = F.col(f"__b_{key_cols[0]}")
    status = (
        F.when(b_key.isNull(), F.lit(REMOVED))
        .when(a_key.isNull(), F.lit(ADDED))
        .when(F.col("__digest") != F.col("__b___digest"), F.lit(CHANGED))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        *[F.coalesce(F.col(k), F.col(f"__b_{k}")).alias(k) for k in key_cols],
        status.alias("status"),
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


def diff_summary(old: DataFrame, new: DataFrame, key_cols: list[str],
                 compare_cols: list[str] | None = None) -> DataFrame:
    """(status, n) counts — the cheap health check before a full diff
    materialization.  Same digest plan; the count is a partial agg."""
    d = table_diff(old, new, key_cols, compare_cols, include_unchanged=True)
    return d.groupBy("status").agg(F.count(F.lit(1)).alias("n"))


def diff_versions(spark: SparkSession, store: TableStore, collection: str,
                  table: str, old_version: str, new_version: str,
                  key_cols: list[str],
                  compare_cols: list[str] | None = None) -> DataFrame:
    """Diff two stored versions of `collection/table` (any version selector
    the store resolves: HEAD, HEAD~n, fixed id)."""
    from ..tableframe._system import is_system_column

    def user(tf) -> DataFrame:
        df = tf.to_spark()
        return df.select(*[c for c in df.columns if not is_system_column(c)])

    old = user(store.read(spark, collection, table, versions=old_version))
    new = user(store.read(spark, collection, table, versions=new_version))
    return table_diff(old, new, key_cols, compare_cols)


def version_drift(spark, store, collection: str, table: str,
                  value_col: str, lo: float, hi: float, buckets: int = 10,
                  old: str = "HEAD~1", new: str = "HEAD"):
    """PSI distribution drift of `value_col` between two stored versions
    (default: the last commit vs the one before) — stats.drift_psi over
    time travel.  The version-store form of a data-quality gate: alert
    when a publish shifts a column's distribution."""
    from tabsdata_spark.stats import drift_psi

    a = store.read(spark, collection, table, versions=old).to_spark()
    b = store.read(spark, collection, table, versions=new).to_spark()
    return drift_psi(a, b, value_col, lo, hi, buckets)


def scd2_apply(history: DataFrame, updates: DataFrame, key_cols: list[str],
               tracked_cols: list[str], ts_col: str,
               valid_from: str = "valid_from",
               valid_to: str = "valid_to") -> DataFrame:
    """Slowly-changing-dimension Type 2 merge: apply an update batch to a
    versioned dimension history, closing out rows whose tracked
    attributes changed (their `valid_to` becomes the update timestamp)
    and opening new current rows — the warehouse-history sibling of the
    store's version diff.

    Input contract: `history` carries key_cols + tracked_cols +
    valid_from/valid_to (valid_to NULL = current row); `updates` carries
    key_cols + tracked_cols + ts_col (one row per key — pre-aggregate
    upstream if a batch can contain several).  Unchanged keys pass
    through untouched; brand-new keys open their first row.

    Scale shape: already-closed history never joins (it unions straight
    through); ONE equi-join shuffle on the keys between the open slice
    and the update batch, then projections — no windows, no second
    scan."""
    closed = history.filter(F.col(valid_to).isNotNull())
    open_rows = history.filter(F.col(valid_to).isNull())
    u = updates.select(
        *[F.col(k).alias(f"__uk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__u_{c}") for c in tracked_cols],
        F.col(ts_col).alias("__uts"))
    cond = [open_rows[k] == u[f"__uk_{k}"] for k in key_cols]
    j = open_rows.join(u, cond, "left")
    changed = F.lit(False)
    for c in tracked_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    has_upd = F.col("__uts").isNotNull()
    # current rows: close if a differing update arrived, else pass through
    kept = (j.select(*key_cols, *tracked_cols, F.col(valid_from),
                     F.when(has_upd & changed, F.col("__uts"))
                     .otherwise(F.lit(None).cast(j.schema[valid_to].dataType))
                     .alias(valid_to)))
    # new versions for changed keys
    reopened = (j.filter(has_upd & changed)
                .select(*key_cols,
                        *[F.col(f"__u_{c}").alias(c) for c in tracked_cols],
                        F.col("__uts").alias(valid_from),
                        F.lit(None).cast(j.schema[valid_to].dataType)
                        .alias(valid_to)))
    # first versions for brand-new keys
    uk = [f"__uk_{k}" for k in key_cols]
    new_keys = u.join(open_rows.select(*key_cols),
                      [u[f"__uk_{k}"] == open_rows[k] for k in key_cols],
                      "left_anti")
    opened = new_keys.select(
        *[F.col(f"__uk_{k}").alias(k) for k in key_cols],
        *[F.col(f"__u_{c}").alias(c) for c in tracked_cols],
        F.col("__uts").alias(valid_from),
        F.lit(None).cast(history.schema[valid_to].dataType).alias(valid_to))
    cols = key_cols + tracked_cols + [valid_from, valid_to]
    return (closed.select(*cols)
            .unionByName(kept.select(*cols))
            .unionByName(reopened.select(*cols))
            .unionByName(opened.select(*cols)))


def incremental_rollup(old_agg: DataFrame, added: DataFrame,
                       removed: DataFrame, key_cols: list[str],
                       value_col: str) -> DataFrame:
    """Incremental view maintenance for a count/sum rollup: update an
    existing aggregate with a version delta (rows added, rows removed)
    WITHOUT rescanning the base table — at 100 TB the difference between
    re-aggregating everything and touching only the changed rows.

    Classic signed-union IVM: the old aggregate enters with weight +1,
    added rows with +1, removed rows with -1; one partial-agg shuffle
    merges them, groups whose count reaches zero drop out.  Sums run in
    DECIMAL(18,2) (exact, associative), so the maintained aggregate is
    BIT-IDENTICAL to a full recompute — the invariant the registry query
    pins with its full-recompute oracle.

    `old_agg` carries key_cols + n + total_dec (as produced by this
    function or the matching base rollup); pass empty frames for
    no-op sides."""
    dec = "decimal(18,2)"

    def rollup(rows, sign):
        return rows.groupBy(*key_cols).agg(
            (F.count(F.lit(1)) * sign).alias("n"),
            (F.sum(F.col(value_col).cast(dec)) * sign).cast(dec)
            .alias("total_dec"))

    parts = old_agg.select(*key_cols, "n", "total_dec")
    merged = (parts
              .unionByName(rollup(added, F.lit(1)))
              .unionByName(rollup(removed, F.lit(-1)))
              .groupBy(*key_cols)
              .agg(F.sum("n").alias("n"),
                   F.sum("total_dec").cast(dec).alias("total_dec"))
              .filter(F.col("n") > 0))
    return merged


def base_rollup(rows: DataFrame, key_cols: list[str],
                value_col: str) -> DataFrame:
    """The count/sum rollup shape incremental_rollup maintains."""
    dec = "decimal(18,2)"
    return rows.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast(dec)).cast(dec).alias("total_dec"))
