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
    corr = (n*Sxy - Sx*Sy) / sqrt((n*Sx2 - Sx^2) * (n*Sy2 - Sy^2)).

    NULL handling is pairwise-complete: rows with NULL x or y are
    dropped up front so n and every moment cover the same analyzed
    subset (count(*) over a NULL-bearing column would otherwise count
    rows the sums skip — an incoherent mixed-base correlation)."""
    x, y = F.col(x_col), F.col(y_col)
    df = df.filter(x.isNotNull() & y.isNotNull())
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


def heavy_hitters(df: DataFrame, value_col: str, k: int = 20,
                  budget: int = 1024) -> DataFrame:
    """EXACT top-k most frequent values with a bounded shuffle — the
    two-pass candidate/recount pattern (Misra-Gries / SpaceSaving per
    partition, then exact verification):

    Pass 1 keeps each partition's `budget` most frequent values (a pandas
    value_counts per Arrow batch — vectorized, no python-per-row).  By the
    pigeonhole guarantee, any value with global frequency >= N/budget tops
    the budget in at least one partition, so the candidate union covers
    every true heavy hitter whenever freq(k-th hitter) >= N/budget.
    Pass 2 exact-counts ONLY the candidates (broadcast semi-join, one
    partial-agg shuffle of <= partitions*budget groups) and takes the
    top-k with TakeOrderedAndProject.

    vs the naive groupBy-everything: the shuffle carries candidates
    instead of |distinct values| — the difference between ~k rows and a
    1e9-row vocabulary exchange at web scale.  `guarantee_ok` is FALSE on
    any returned row whose count falls under N/budget — the caller's
    signal to re-run with a bigger budget (the result may then miss true
    hitters below that line)."""
    import pandas as pd

    src = df.select(F.col(value_col).alias("v"))

    def candidates(batches):
        counts: dict = {}
        for pdf in batches:
            for v, c in pdf["v"].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
        top = sorted(counts.items(), key=lambda t: (-t[1], str(t[0])))[:budget]
        yield pd.DataFrame({"v": [t[0] for t in top]})

    cand = src.mapInPandas(candidates, f"v {dict(src.dtypes)['v']}").distinct()
    total = src.agg(F.count(F.lit(1)).alias("n_total"))
    counted = (src.join(F.broadcast(cand), "v", "left_semi")
               .groupBy("v").agg(F.count(F.lit(1)).alias("n"))
               .orderBy(F.col("n").desc(), F.col("v").asc())
               .limit(k))
    return (counted.crossJoin(F.broadcast(total))
            .select(F.col("v").alias(value_col), "n",
                    (F.col("n") >= F.col("n_total") / budget)
                    .alias("guarantee_ok")))


def hll_mergeable_distinct(df: DataFrame, group_col: str, value_col: str,
                           lg_k: int = 14) -> DataFrame:
    """Mergeable distinct-count sketches (DataSketches HLL via Spark's
    hll_sketch_agg): one sketch per group plus their UNION — the shape of
    a 100 TB rollup where per-partition/per-day sketches are stored once
    and re-aggregated endlessly without rescanning.

    HLL union is register-wise max, so estimate(union of per-group
    sketches) is IDENTICAL to the estimate of a single sketch over all
    rows — the query invariant asserts that equality (union_lossless) and
    a 5% band against the exact count.  Returns per-group rows plus an
    '__all__' row.  lg_k=14 keeps the relative standard error ~0.8%
    (2^14 registers, 16 KiB/sketch): the 5% band then holds with wide
    margin at any test scale — lg_k=12 was measured OUTSIDE 5% on a
    523-distinct column at sf0.1."""
    per = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sk"),
        F.countDistinct(value_col).alias("exact_distinct"))
    union_est = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias("est"))
    direct = df.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))).alias("est"),
        F.countDistinct(value_col).alias("exact_distinct"))
    per_rows = per.select(
        "grp", "exact_distinct",
        (F.abs(F.hll_sketch_estimate(F.col("sk")) - F.col("exact_distinct"))
         <= 0.05 * F.col("exact_distinct")).alias("within_5pct"))
    all_row = (union_est.crossJoin(direct.withColumnRenamed("est", "est_d"))
               .select(F.lit("__all__").alias("grp"), "exact_distinct",
                       ((F.col("est") == F.col("est_d"))
                        & (F.abs(F.col("est") - F.col("exact_distinct"))
                           <= 0.05 * F.col("exact_distinct")))
                       .alias("within_5pct")))
    return per_rows.unionByName(all_row)


def drift_psi(df_a: DataFrame, df_b: DataFrame, value_col: str,
              lo: float, hi: float, buckets: int = 10) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard distribution-drift monitor between corpus /
    feature versions (PSI < 0.1 stable, > 0.25 drifted).

    Each side is reduced to its fixed-range histogram (one partial-agg
    shuffle of <= buckets groups per side — the scan dominates, state is
    O(buckets)); proportions get add-half Laplace smoothing so empty
    buckets stay finite AND deterministic; contributions are
    (pa - pb) * ln(pa / pb) per bucket.  Returns one row per bucket plus
    the total under bucket = -1."""
    def hist(df):
        return histogram(df, value_col, lo, hi, buckets) \
            .select("bucket", "n")

    ha = hist(df_a).withColumnRenamed("n", "na")
    hb = hist(df_b).withColumnRenamed("n", "nb")
    grid = df_a.sparkSession.range(buckets) \
        .select(F.col("id").cast("int").alias("bucket"))
    j = (grid.join(ha, "bucket", "left").join(hb, "bucket", "left")
         .fillna(0, ["na", "nb"]))
    tot = j.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    pa = (F.col("na") + 0.5) / (F.col("ta") + 0.5 * buckets)
    pb = (F.col("nb") + 0.5) / (F.col("tb") + 0.5 * buckets)
    per = (j.crossJoin(F.broadcast(tot))
           .select("bucket",
                   F.round(pa, 6).alias("p_a"),
                   F.round(pb, 6).alias("p_b"),
                   F.round((pa - pb) * F.log(pa / pb), 6).alias("psi")))
    total = per.agg(F.lit(-1).alias("bucket"),
                    F.lit(None).cast("double").alias("p_a"),
                    F.lit(None).cast("double").alias("p_b"),
                    F.round(F.sum("psi"), 6).alias("psi"))
    return per.unionByName(total)


def mad_outliers(df: DataFrame, value_col: str, group_cols: list[str],
                 threshold: float = 3.5) -> DataFrame:
    """Robust outlier flags via the modified z-score (Iglewicz & Hoaglin):
    |0.6745 * (x - median) / MAD| > threshold — immune to the outliers
    themselves, unlike mean/stddev z-scores.

    Plan shape: per-group median and MAD are two exact-percentile
    aggregates (each a partial-agg shuffle on the group keys); the flags
    join the tiny per-group stats table back (broadcast).  Rows in groups
    with MAD = 0 (constant-valued) are never flagged.  Returns the input
    plus (grp_median, grp_mad, robust_z, is_outlier)."""
    med = F.expr(f"percentile({value_col}, 0.5)")
    stats1 = df.groupBy(*group_cols).agg(med.alias("grp_median"))
    dev = df.join(F.broadcast(stats1), group_cols).withColumn(
        "__ad", F.abs(F.col(value_col) - F.col("grp_median")))
    stats2 = dev.groupBy(*group_cols).agg(
        F.first("grp_median").alias("grp_median"),
        F.expr("percentile(__ad, 0.5)").alias("grp_mad"))
    z = F.when(F.col("grp_mad") > 0,
               0.6745 * (F.col(value_col) - F.col("grp_median"))
               / F.col("grp_mad"))
    return (df.join(F.broadcast(stats2), group_cols)
            .withColumn("robust_z", F.round(z, 6))
            .withColumn("is_outlier",
                        F.coalesce(F.abs(F.col("robust_z")) > threshold,
                                   F.lit(False))))


def exact_regression(df: DataFrame, x_col: str, y_col: str,
                     group_cols: list[str]) -> DataFrame:
    """Per-group simple OLS (y = slope*x + intercept) from exact integer
    cross-moments: both inputs must already be BIGINT-quantized by the
    caller (epoch seconds, micros-scaled values, counts...), so every sum
    below is exact integer arithmetic — no float accumulation-order drift
    across partitionings or engines.

        slope     = (n*Sxy - Sx*Sy) / (n*Sx2 - Sx^2)
        intercept = (Sy - slope*Sx) / n

    The closed-form moments are summed as decimal(38,0) (Spark's exact
    128-bit integer path; DuckDB sums BIGINT into HUGEINT the same way);
    numerator and denominator are cast to double ONCE, and the final
    divisions are identical IEEE ops in any engine.  Callers whose x spans
    a large absolute range (epoch seconds) should pre-subtract a constant
    offset so n*Sxy stays inside 38 digits.

    Scale shape: one partial-agg shuffle on the group keys — moments
    combine associatively, so map-side combine does most of the work."""
    big = "decimal(38,0)"
    x, y = F.col(x_col).cast(big), F.col(y_col).cast(big)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum((x * y).cast(big)).alias("_sxy"),
        F.sum((x * x).cast(big)).alias("_sx2"),
    )
    n = F.col("n").cast(big)
    num = (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("double")
    den = (n * F.col("_sx2") - F.col("_sx") * F.col("_sx")).cast("double")
    slope = num / den
    intercept = (F.col("_sy").cast("double")
                 - slope * F.col("_sx").cast("double")) / F.col("n").cast("double")
    return agg.select(
        *group_cols, "n",
        F.round(slope, 9).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


def welch_ttest(df: DataFrame, value_col: str, cohort_col: str,
                group_cols: list[str]) -> DataFrame:
    """Per-group Welch two-sample t-test between the rows where
    `cohort_col` is true (A) and false (B) — the A/B-experiment primitive:

        t   = (mA - mB) / sqrt(vA/nA + vB/nB)
        dof = (vA/nA + vB/nB)^2
              / ((vA/nA)^2/(nA-1) + (vB/nB)^2/(nB-1))   (Welch-Satterthwaite)

    Exactness contract: both cohorts' moment sums are integer sums of
    micros-quantized values (m = floor(v*1e6 + 0.5); squares summed as
    decimal(38,0) — Spark's exact 128-bit path, DuckDB's HUGEINT), so
    means/variances/t/dof are identical IEEE derivations over identical
    integers in any engine and partitioning.

    Scale shape: ONE partial-agg shuffle on the group keys — six
    conditional sums that combine associatively; no join between cohorts,
    no second scan.  Rows with null value or null cohort are excluded from
    both sides."""
    big = "decimal(38,0)"
    m = F.floor(F.col(value_col) * 1e6 + F.lit(0.5)).cast("bigint")
    cond = F.col(cohort_col)
    a, b = F.when(cond, m), F.when(~cond, m)
    # cast to decimal BEFORE squaring: (a * a) evaluates in 64-bit long
    # first, silently wrapping (non-ANSI) or throwing (ANSI) once
    # |value| > ~3037 (m^2 > 2^63) — the cast after the fact cannot
    # recover the wrapped product
    am, bm = a.cast(big), b.cast(big)
    agg = df.groupBy(*group_cols).agg(
        F.count(a).alias("n_a"),
        F.sum(am).alias("_s1a"),
        F.sum(am * am).alias("_s2a"),
        F.count(b).alias("n_b"),
        F.sum(bm).alias("_s1b"),
        F.sum(bm * bm).alias("_s2b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    s1a, s2a = F.col("_s1a").cast("double"), F.col("_s2a").cast("double")
    s1b, s2b = F.col("_s1b").cast("double"), F.col("_s2b").cast("double")
    # degenerate cohorts (empty, or a single observation) are guarded
    # with lazy CASE branches: ANSI double division by zero RAISES, so an
    # unguarded group with n<=1 on either side would kill the whole job.
    # Guarded cells surface as NULL, matching non-ANSI NULL propagation.
    ma = F.when(na > 0.0, (s1a / 1e6) / na)
    mb = F.when(nb > 0.0, (s1b / 1e6) / nb)
    va = F.when(na > 1.0, ((s2a - s1a * s1a / na) / (na - 1)) / 1e12)
    vb = F.when(nb > 1.0, ((s2b - s1b * s1b / nb) / (nb - 1)) / 1e12)
    se2 = F.when((na > 1.0) & (nb > 1.0), va / na + vb / nb)
    t = F.when(se2 > 0.0, (ma - mb) / F.sqrt(se2))
    dof = F.when(se2 > 0.0,
                 (se2 * se2) / ((va / na) * (va / na) / (na - 1)
                                + (vb / nb) * (vb / nb) / (nb - 1)))
    return agg.select(
        *group_cols, "n_a", "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("dof"),
    )


def mutual_information(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns:

        MI = sum_cells (c/N) * ln(c*N / (rx*cy))

    plus the entropies H(x), H(y) and the normalized MI / min(H) — the
    standard "how redundant are these two labels" diagnostic (e.g. lang
    vs source in a curation pipeline).

    Exactness: each cell/marginal contribution is a bit-identical IEEE
    expression over integer counts; the sums run through DECIMAL(28,14)
    (order-free exact addition, same trick as js_divergence_sources), so
    the scalar result is independent of partitioning and engine.

    Scale shape: one partial-agg shuffle to the (x, y) cell table —
    bounded by |X|*|Y|, corpus-size independent after that; marginals are
    re-aggregations of the cell table; the scalar combine is a crossJoin
    of three 1-row frames."""
    dec = "decimal(28,14)"
    cells = df.groupBy(F.col(x_col).alias("__x"), F.col(y_col).alias("__y")) \
        .agg(F.count(F.lit(1)).alias("c"))
    rx = cells.groupBy("__x").agg(F.sum("c").alias("rx"))
    cy = cells.groupBy("__y").agg(F.sum("c").alias("cy"))
    n = cells.agg(F.sum("c").alias("n_total"))
    cn, rxn, cyn = (F.col("c").cast("double"), F.col("rx").cast("double"),
                    F.col("cy").cast("double"))
    nn = F.col("n_total").cast("double")
    mi_contrib = ((cn / nn) * F.log(cn * nn / (rxn * cyn))).cast(dec)
    mi = (cells.join(F.broadcast(rx), "__x")
          .join(F.broadcast(cy), "__y")
          .crossJoin(F.broadcast(n))
          .agg(F.sum(mi_contrib).alias("_mi"), F.count(F.lit(1)).alias("n_cells")))
    hx_contrib = (-(rxn / nn) * F.log(rxn / nn)).cast(dec)
    hx = rx.crossJoin(F.broadcast(n)).agg(F.sum(hx_contrib).alias("_hx"))
    hy_contrib = (-(cyn / nn) * F.log(cyn / nn)).cast(dec)
    hy = cy.crossJoin(F.broadcast(n)).agg(F.sum(hy_contrib).alias("_hy"))
    out = mi.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    mid = F.col("_mi").cast("double")
    hxd, hyd = F.col("_hx").cast("double"), F.col("_hy").cast("double")
    return out.select(
        "n_cells",
        F.round(mid, 6).alias("mi_nats"),
        F.round(hxd, 6).alias("h_x"),
        F.round(hyd, 6).alias("h_y"),
        F.round(mid / F.least(hxd, hyd), 6).alias("nmi"),
    )


def winsorize(df: DataFrame, value_col: str, group_cols: list[str],
              lo: float = 0.01, hi: float = 0.99) -> DataFrame:
    """Per-group winsorization: clip values into the exact interpolated
    [p_lo, p_hi] percentile interval — the outlier-taming complement to
    mad_outliers (which only flags).  Exact percentile() keeps the bounds
    engine-portable (matches quantile_cont); the clip itself is
    LEAST/GREATEST, value-exact.

    Scale shape: two-quantile aggregate per group (one partial-agg
    shuffle), bounds broadcast back — the raw table is scanned twice but
    never reshuffled.  Returns the input plus (q_lo, q_hi, value_w)."""
    qs = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, {lo}d)").alias("q_lo"),
        F.expr(f"percentile({value_col}, {hi}d)").alias("q_hi"))
    clipped = F.least(F.greatest(F.col(value_col), F.col("q_lo")),
                      F.col("q_hi"))
    return (df.join(F.broadcast(qs), group_cols)
            .withColumn("value_w", clipped))


def benford_deviation(df: DataFrame, value_col: str,
                      group_cols: list[str]) -> DataFrame:
    """Per-group Benford's-law conformity: chi-square statistic of the
    first-significant-digit distribution against log10(1 + 1/d) — the
    classic fabricated-numbers / data-quality screen (Benford 1938,
    Nigrini's audit usage; public formulas).

    The first digit comes from the micros-quantized INTEGER rendered as a
    string (integer-to-string is identical in every engine — no float
    formatting or log10-of-value edge cases); zero/negative values are
    excluded.  Digits with zero observations still contribute (0-np)^2/np
    via a per-group 1..9 grid.  The 9 contributions are decimal-summed
    (order-free), so chi2 is bit-stable across engines and partitionings.

    Scale shape: one partial-agg shuffle to (group, digit) — at most
    9 rows per group after combine — then grid join + tiny re-agg."""
    dec = "decimal(28,14)"
    m = F.floor(F.col(value_col) * 1e6 + F.lit(0.5)).cast("bigint")
    base = (df.select(*group_cols, m.alias("__m"))
            .filter(F.col("__m") > 0))
    digit = F.substring(F.col("__m").cast("string"), 1, 1).cast("int")
    counts = (base.select(*group_cols, digit.alias("digit"))
              .groupBy(*group_cols, "digit")
              .agg(F.count(F.lit(1)).alias("obs")))
    totals = counts.groupBy(*group_cols).agg(
        F.sum("obs").alias("n_total"))
    grid = totals.select(*group_cols, "n_total",
                         F.explode(F.sequence(F.lit(1), F.lit(9)))
                         .alias("digit"))
    full = (grid.join(counts, [*group_cols, "digit"], "left")
            .withColumn("obs", F.coalesce(F.col("obs"), F.lit(0))))
    p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    expd = F.col("n_total").cast("double") * p
    od = F.col("obs").cast("double")
    contrib = (((od - expd) * (od - expd)) / expd).cast(dec)
    out = (full.groupBy(*group_cols)
           .agg(F.first("n_total").alias("n"),
                F.sum(contrib).alias("_chi2")))
    return out.select(*group_cols, "n",
                      F.round(F.col("_chi2").cast("double"), 6)
                      .alias("chi2"))


def mann_whitney_u(df: DataFrame, value_col: str, cohort_col: str,
                   group_cols: list[str]) -> DataFrame:
    """Per-group Mann-Whitney U (Wilcoxon rank-sum) test between the rows
    where `cohort_col` is true (A) and false (B) — the nonparametric
    sibling of welch_ttest for skewed metrics:

        U_A = R_A - n_A(n_A+1)/2          (R_A = rank sum of cohort A)
        z   = (U_A - n_A n_B / 2) / sigma
        sigma^2 = (n_A n_B / 12) * ((N+1) - T / (N(N-1)))   (tie-corrected,
                  T = sum over tie groups of t^3 - t)

    Exactness contract: values are micros-quantized (m = floor(v*1e6+0.5))
    so tie groups are integer-exact; average ranks are carried DOUBLED
    (2*avg_rank = 2*|less| + t + 1, an integer) and every moment is summed
    in decimal(38,0), so U/z are identical IEEE derivations over identical
    integers in any engine and partitioning.

    Scale shape: one partial-agg shuffle onto (group, value) tie cells,
    one cumulative window over DISTINCT values per group (state bounded by
    value cardinality, not row count), one final partial agg.  No joins.
    Degenerate groups (empty cohort, all-tied values) surface NULL z via
    lazy CASE guards — never a divide-by-zero under ANSI."""
    big = "decimal(38,0)"
    base = df.filter(F.col(value_col).isNotNull()
                     & F.col(cohort_col).isNotNull())
    m = F.floor(F.col(value_col) * 1e6 + F.lit(0.5)).cast("bigint")
    per = (base.withColumn("__m", m)
           .groupBy(*group_cols, "__m")
           .agg(F.count(F.lit(1)).alias("__c"),
                F.count(F.when(F.col(cohort_col), 1)).alias("__ca")))
    w = (Window.partitionBy(*group_cols).orderBy("__m")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    less = F.sum("__c").over(w) - F.col("__c")
    rank2 = (F.lit(2) * less + F.col("__c") + F.lit(1)).cast(big)
    cd = F.col("__c").cast(big)
    agg = (per.withColumn("__rank2", rank2)
           .groupBy(*group_cols)
           .agg(F.sum(F.col("__ca").cast(big) * F.col("__rank2"))
                .alias("_r2a"),
                F.sum("__ca").alias("_na"),
                F.sum("__c").alias("_n"),
                F.sum(cd * cd * cd - cd).alias("_tie")))
    na = F.col("_na").cast("double")
    nn = F.col("_n").cast("double")
    nb = nn - na
    r_a = F.col("_r2a").cast("double") / 2.0
    u_a = r_a - (na * (na + 1.0)) / 2.0
    tie = F.col("_tie").cast("double")
    sig2 = F.when(nn > 1.0,
                  (na * nb / 12.0) * ((nn + 1.0) - tie / (nn * (nn - 1.0))))
    z = F.when(sig2 > 0.0, (u_a - F.lit(0.5) * na * nb) / F.sqrt(sig2))
    return agg.select(
        *group_cols,
        F.col("_na").alias("n_a"),
        (F.col("_n") - F.col("_na")).alias("n_b"),
        F.round(u_a, 6).alias("u_stat"),
        F.round(z, 6).alias("z_score"),
    )


def chi_squared_independence(df: DataFrame, a_col: str,
                             b_col: str) -> DataFrame:
    """Chi-squared test of independence between two categorical columns,
    with Cramer's V effect size — the category-drift / feature-association
    primitive (is event mix independent of hour?  does source predict
    language?).

        chi2 = sum over the full r x c grid of (o - e)^2 / e,
        e    = row_total * col_total / N
        V    = sqrt(chi2 / (N * min(r-1, c-1)))

    Exactness contract: observed/row/col totals are exact integer counts;
    each cell's contribution is quantized to nanos (floor(x*1e9 + 0.5))
    and summed in decimal(38,0), so chi2 is independent of partial-agg
    ordering — the float-sum-order trap on a wide grid.

    Scale shape: one partial agg onto the observed cells, two
    dimension-sized aggs for the margins, and a margins-cross-margins
    grid join (r x c rows — category cardinality squared, never row
    count).  Absent combinations enter the grid with o = 0, as the test
    requires."""
    big = "decimal(38,0)"
    base = df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
    cells = base.groupBy(a_col, b_col).agg(F.count(F.lit(1)).alias("__o"))
    rows_ = cells.groupBy(a_col).agg(F.sum("__o").alias("__ri"))
    cols_ = cells.groupBy(b_col).agg(F.sum("__o").alias("__cj"))
    tot = cells.agg(F.sum("__o").alias("__n"),
                    F.count_distinct(F.col(a_col)).alias("__r"),
                    F.count_distinct(F.col(b_col)).alias("__c"))
    grid = (rows_.crossJoin(cols_)
            .join(cells, [a_col, b_col], "left")
            .withColumn("__o", F.coalesce(F.col("__o"), F.lit(0)))
            .crossJoin(F.broadcast(tot)))
    e = (F.col("__ri").cast("double") * F.col("__cj").cast("double")
         / F.col("__n").cast("double"))
    o = F.col("__o").cast("double")
    contrib = (o - e) * (o - e) / e
    cm = F.floor(contrib * 1e9 + F.lit(0.5)).cast(big)
    out = (grid.withColumn("__cm", cm)
           .groupBy("__n", "__r", "__c")
           .agg(F.sum("__cm").alias("_chi2m")))
    chi2 = out["_chi2m"].cast("double") / 1e9
    mindim = F.least(F.col("__r") - 1, F.col("__c") - 1)
    v = F.when(mindim > 0,
               F.sqrt(chi2 / (F.col("__n").cast("double")
                              * mindim.cast("double"))))
    return out.select(
        F.col("__n").alias("n"),
        ((F.col("__r") - 1) * (F.col("__c") - 1)).alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(v, 6).alias("cramers_v"),
    )


def ols_two_features(df: DataFrame, y_col: str, x1_col: str, x2_col: str,
                     group_cols: list[str]) -> DataFrame:
    """Per-group two-regressor OLS  y ~ b0 + b1*x1 + b2*x2  via the 3x3
    normal equations solved in closed form (Cramer's rule) — the
    multi-factor sibling of exact_regression for integer-ish regressors
    (hour-of-day, day-of-week, tier, ...).

    Exactness contract: x1/x2 must be integer-valued columns; y is
    micros-quantized.  Every moment (sums of x1, x2, y, x1^2, x2^2,
    x1*x2, x1*y, x2*y) is an exact decimal(38,0) integer sum, and the
    determinant / betas / R^2 are identical IEEE derivations over those
    integers in any engine or partitioning.

    Scale shape: ONE partial-agg shuffle on the group keys — nine
    associative sums, no joins, no second scan.  Groups with a singular
    design (constant regressor, n < 3) surface NULL betas via lazy CASE
    guards instead of an ANSI divide-by-zero."""
    big = "decimal(38,0)"
    base = df.filter(F.col(y_col).isNotNull()
                     & F.col(x1_col).isNotNull() & F.col(x2_col).isNotNull())
    my = F.floor(F.col(y_col) * 1e6 + F.lit(0.5)).cast("bigint").cast(big)
    x1 = F.col(x1_col).cast("bigint").cast(big)
    x2 = F.col(x2_col).cast("bigint").cast(big)
    agg = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("_s1"), F.sum(x2).alias("_s2"),
        F.sum(my).alias("_sy"),
        F.sum(x1 * x1).alias("_s11"), F.sum(x2 * x2).alias("_s22"),
        F.sum(x1 * x2).alias("_s12"),
        F.sum(x1 * my).alias("_s1y"), F.sum(x2 * my).alias("_s2y"),
        F.sum(my * my).alias("_syy"),
    )
    n = F.col("n").cast("double")
    s1, s2 = F.col("_s1").cast("double"), F.col("_s2").cast("double")
    sy = F.col("_sy").cast("double") / 1e6
    s11, s22 = F.col("_s11").cast("double"), F.col("_s22").cast("double")
    s12 = F.col("_s12").cast("double")
    s1y = F.col("_s1y").cast("double") / 1e6
    s2y = F.col("_s2y").cast("double") / 1e6
    syy = F.col("_syy").cast("double") / 1e12
    # centered moments (still exact-derived doubles)
    a11 = s11 - s1 * s1 / n
    a22 = s22 - s2 * s2 / n
    a12 = s12 - s1 * s2 / n
    c1 = s1y - s1 * sy / n
    c2 = s2y - s2 * sy / n
    syy_c = syy - sy * sy / n
    det = a11 * a22 - a12 * a12
    b1 = F.when(det != 0.0, (c1 * a22 - c2 * a12) / det)
    b2 = F.when(det != 0.0, (c2 * a11 - c1 * a12) / det)
    b0 = (sy - b1 * s1 - b2 * s2) / n
    ssr = b1 * c1 + b2 * c2
    r2 = F.when(syy_c > 0.0, ssr / syy_c)
    return agg.select(
        *group_cols, "n",
        F.round(b0, 6).alias("beta0"),
        F.round(b1, 6).alias("beta1"),
        F.round(b2, 6).alias("beta2"),
        F.round(r2, 6).alias("r_squared"),
    )


def _adj3(a11, a12, a13, a22, a23, a33):
    """Adjugate entries + determinant of a symmetric 3x3, as a dict of
    identically-structured expressions (shared by the Spark driver-side
    solve and the DuckDB oracle so the IEEE op order is the same)."""
    adj11 = a22 * a33 - a23 * a23
    adj12 = a13 * a23 - a12 * a33
    adj13 = a12 * a23 - a13 * a22
    adj22 = a11 * a33 - a13 * a13
    adj23 = a12 * a13 - a11 * a23
    adj33 = a11 * a22 - a12 * a12
    det = a11 * adj11 + a12 * adj12 + a13 * adj13
    return adj11, adj12, adj13, adj22, adj23, adj33, det


def logistic_two_features(df: DataFrame, label_col: str, x1_col: str,
                          x2_col: str, iters: int = 2) -> DataFrame:
    """Logistic regression  P(label) ~ sigmoid(b0 + b1*x1 + b2*x2)  by
    IRLS (iteratively reweighted least squares), returning each row's
    fitted probability — the in-pipeline quality-classifier primitive
    (fasttext-style weak-label filters: train on a cheap label, score
    everything, keep by threshold).

    Each IRLS round is one broadcast of the 3-float beta out, one narrow
    scoring pass, and a driver collect of exactly NINE weighted moment
    sums (X'WX upper triangle + X'Wz) — the kmeans model-roundtrip
    contract; corpus size never reaches the driver.  The 3x3 solve runs
    driver-side through the same adjugate expressions the oracle uses.

    Determinism contract: beta starts at 0 (p=0.5 exactly); per-row
    weighted contributions are micros-quantized and summed as
    decimal(38,0), so the moments are exact integers in any partitioning;
    beta then derives through fixed-structure IEEE ops.  Cross-engine
    caveat: sigmoid needs exp(), which is not guaranteed correctly
    rounded — empirically Java and C libm agree on these inputs (same
    standing as the log2/pow oracles), and the micros quantization makes
    a final-ulp disagreement flip a cell only when p*1e6 sits within
    ~1e-10 of an integer."""
    big = "decimal(38,0)"
    beta = [0.0, 0.0, 0.0]
    x1, x2 = F.col(x1_col).cast("double"), F.col(x2_col).cast("double")
    y = F.col(label_col).cast("double")
    # A NULL label would contribute to the X'WX moments (w depends only on
    # x1/x2) while dropping out of X'Wz (wz is NULL) — silently biasing
    # beta.  Fit on fully-observed rows only, like ols_two_features and
    # welch_ttest; scoring below still covers every row with features.
    fit = df.filter(F.col(label_col).isNotNull()
                    & F.col(x1_col).isNotNull()
                    & F.col(x2_col).isNotNull())

    def quant(c):
        return F.floor(c * 1e6 + F.lit(0.5)).cast("bigint").cast(big)

    for _ in range(iters):
        eta = F.lit(beta[0]) + F.lit(beta[1]) * x1 + F.lit(beta[2]) * x2
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = p * (F.lit(1.0) - p)
        wz = w * eta + (y - p)          # w*z with z = eta + (y-p)/w
        sums = fit.agg(
            F.sum(quant(w)).alias("s11"),
            F.sum(quant(w * x1)).alias("s12"),
            F.sum(quant(w * x2)).alias("s13"),
            F.sum(quant(w * x1 * x1)).alias("s22"),
            F.sum(quant(w * x1 * x2)).alias("s23"),
            F.sum(quant(w * x2 * x2)).alias("s33"),
            F.sum(quant(wz)).alias("r1"),
            F.sum(quant(wz * x1)).alias("r2"),
            F.sum(quant(wz * x2)).alias("r3"),
        ).collect()[0]
        if sums["s11"] is None:         # no fully-observed rows: keep beta=0
            break
        a11, a12, a13 = (float(sums["s11"]) / 1e6, float(sums["s12"]) / 1e6,
                         float(sums["s13"]) / 1e6)
        a22, a23, a33 = (float(sums["s22"]) / 1e6, float(sums["s23"]) / 1e6,
                         float(sums["s33"]) / 1e6)
        r1, r2, r3 = (float(sums["r1"]) / 1e6, float(sums["r2"]) / 1e6,
                      float(sums["r3"]) / 1e6)
        j11, j12, j13, j22, j23, j33, det = _adj3(a11, a12, a13,
                                                  a22, a23, a33)
        if det == 0.0:
            break
        beta = [(j11 * r1 + j12 * r2 + j13 * r3) / det,
                (j12 * r1 + j22 * r2 + j23 * r3) / det,
                (j13 * r1 + j23 * r2 + j33 * r3) / det]

    eta = F.lit(beta[0]) + F.lit(beta[1]) * x1 + F.lit(beta[2]) * x2
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    return df.select("*", F.round(p, 6).alias("score"))


def kaplan_meier(df: DataFrame, group_cols: list[str], duration_col: str,
                 event_col: str) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator per group: for each
    time with at least one event, the number at risk, the number of
    events, and the estimated survival S(t) = prod_{t'<=t} (1 - d/n) —
    time-to-outcome analysis under right censoring (churn, order
    fulfillment, job completion; `event_col` false = censored).

    Exactness contract: n_at_risk and d are exact integer window sums;
    the product runs as exp(sum(ln(1 - d/n))) with each ln term
    quantized to 1e9 and summed exactly, so S(t) is one IEEE exp over
    an identical integer in any engine/partitioning (round 6 display).
    Once a time exhausts the risk set (d = n), survival pins to 0
    without evaluating ln(0).

    Scale shape: one partial-agg shuffle onto (group, time), then
    windows inside each group partition — group count never constrains
    the risk-set math."""
    g = [F.col(c) for c in group_cols]
    ev = F.col(event_col).cast("int")
    pts = (df.groupBy(*g, F.col(duration_col).alias("t"))
           .agg(F.sum(ev).alias("d"),
                F.sum(F.lit(1) - ev).alias("c")))
    wo = Window.partitionBy(*group_cols).orderBy("t")
    cum_all = (F.sum(F.col("d") + F.col("c"))
               .over(wo.rowsBetween(Window.unboundedPreceding,
                                    Window.currentRow)))
    total = F.sum(F.col("d") + F.col("c")).over(
        Window.partitionBy(*group_cols))
    pts = pts.withColumn(
        "n_risk", (total - cum_all + F.col("d") + F.col("c")).cast("bigint"))
    lnq = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.floor(F.log((F.col("n_risk") - F.col("d"))
                      / F.col("n_risk").cast("double")) * 1e9 + F.lit(0.5))
        .cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    extinct = F.max((F.col("d") >= F.col("n_risk")).cast("int")).over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_ln = F.sum(lnq).over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = pts.select(
        *g, "t", "n_risk", F.col("d").alias("n_events"),
        F.when(extinct == 1, F.lit(0.0))
         .otherwise(F.round(F.exp(cum_ln.cast("double") / F.lit(1e9)), 6))
         .alias("survival"))
    return out.filter(F.col("n_events") > 0)


#: Poisson(1) CDF thresholds at k = 0..6, scaled to 2^60 and floored —
#: derived from the exact rational series for e^-1 (60 alternating terms,
#: error < 1/60! << 2^-60, so every floor is the true one).  A 60-bit
#: uniform u maps to weight w = min k with u < T[k], else 7.  Shared
#: verbatim by the Spark expression and the DuckDB oracle, so bootstrap
#: weights are engine-identical by construction.
POISSON1_T = [424136118829305329, 848272237658610659, 1060340297073263324,
              1131029650211480879, 1148701988496035267, 1152236456152946145,
              1152825534095764625]

#: Two-sided geometric (alpha = 1/2) CDF thresholds at noise = -4..3,
#: tails collapsed into the +-4 extremes: exact fractions n/24 for
#: n in [1,2,4,8,16,20,22,23], scaled to 2^60 and floored.  This is the
#: discrete (geometric) DP mechanism of Ghosh-Roughgarden-Sundararajan
#: (epsilon = ln 2) — integer noise, no floating-point sampling, and a
#: deterministic replay from a keyed hash so two engines agree bit-for-bit.
GEOM_HALF_T = [48038396025285290, 96076792050570581, 192153584101141162,
               384307168202282325, 768614336404564650, 960767920505705813,
               1056844712556276394, 1104883108581561685]


def _ladder(u: Column, thresholds: list[int], values: list[int]) -> Column:
    """values[i] where u < thresholds[i], else values[-1] (one extra
    value).  Built as a single CASE chain — stays in codegen."""
    expr = F.lit(values[-1])
    for t, v in zip(reversed(thresholds), reversed(values[:-1])):
        expr = F.when(u < F.lit(t), F.lit(v)).otherwise(expr)
    return expr


def cuped(units: DataFrame, x_col: str, y_col: str,
          variant_col: str) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi, Walker, WSDM'13): given
    one row per experiment unit with a pre-period covariate x, a
    post-period metric y, and a variant assignment, compute
    theta = cov(x, y) / var(x) POOLED across variants, then report each
    variant's raw and covariate-adjusted metric mean and variance —
    y_adj = y - theta * (x - mean(x)) — plus the realized variance
    reduction.  The workhorse of large-scale A/B analysis: weeks less
    exposure time for the same power.

    Exactness contract: all first/second cross-moments accumulate as
    exact decimals (order/partitioning-free); theta, means, and the
    closed-form var(y_adj) = var_y - 2*theta*cov + theta^2*var_x are then
    fixed IEEE expressions over those sums, identical in any engine.

    Scale shape: two partial-agg shuffles over the unit frame (one global
    1-row moment pass for theta/xbar, one per-variant pass) joined by a
    1-row broadcast combine — no per-unit window, no driver collect."""
    x, y = F.col(x_col), F.col(y_col)
    moments = [
        F.count(F.lit(1)).alias("n"),
        F.sum(_d(x)).alias("_sx"),
        F.sum(_d(y)).alias("_sy"),
        F.sum((_d(x) * _d(x)).cast(_DEC_SQ)).alias("_sx2"),
        F.sum((_d(y) * _d(y)).cast(_DEC_SQ)).alias("_sy2"),
        F.sum((_d(x) * _d(y)).cast(_DEC_SQ)).alias("_sxy"),
    ]
    g = units.agg(*moments)
    ng = F.col("n").cast("double")
    sxg, syg = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sx2g, sxyg = F.col("_sx2").cast("double"), F.col("_sxy").cast("double")
    glob = g.select(
        ((ng * sxyg - sxg * syg) / (ng * sx2g - sxg * sxg)).alias("_theta"),
        (sxg / ng).alias("_xbar"))
    v = units.groupBy(variant_col).agg(*moments)
    n = F.col("n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sx2 = F.col("_sx2").cast("double")
    sy2, sxy = F.col("_sy2").cast("double"), F.col("_sxy").cast("double")
    th, xb = F.col("_theta"), F.col("_xbar")
    var_y = (sy2 - sy * sy / n) / (n - 1)
    var_x = (sx2 - sx * sx / n) / (n - 1)
    cov = (sxy - sx * sy / n) / (n - 1)
    var_adj = var_y - 2 * th * cov + th * th * var_x
    return (v.crossJoin(F.broadcast(glob)).select(
        variant_col,
        F.col("n").alias("n_units"),
        F.round(sy / n, 6).alias("mean_y"),
        F.round(sy / n - th * (sx / n - xb), 6).alias("mean_y_adj"),
        F.round(var_y, 6).alias("var_y"),
        F.round(var_adj, 6).alias("var_y_adj"),
        F.round((var_y - var_adj) / var_y * 100, 6)
        .alias("var_reduction_pct"),
        F.round(th, 6).alias("theta")))


def poisson_bootstrap_mean(df: DataFrame, id_col: str, value_col: str,
                           group_cols: list[str], b: int = 32) -> DataFrame:
    """Per-group bootstrap standard error of the mean via the Poisson
    bootstrap (the only bootstrap that works on a cluster: classical
    resampling needs global n and per-replicate sampling passes; Poisson
    gives each row an independent Poisson(1) multiplicity per replicate,
    so all B resamples stream in ONE pass with map-side partial aggs).

    Determinism contract: the replicate weight is the Poisson(1) inverse
    CDF applied to a 60-bit md5-derived uniform keyed on (row id,
    replicate) — POISSON1_T thresholds, identical literals in the DuckDB
    oracle.  Replicate means are micros-quantized and their spread is an
    exact-decimal moment sum, so the SE is bit-stable under any
    partitioning.

    Scale shape: one projection exploding B (replicate, weight) pairs per
    row — partial aggregation collapses them map-side, so the shuffle
    carries |groups| * B rows, never |rows| * B."""
    from tabsdata_spark.llm.textual import portable_hash60

    vm = F.floor(F.col(value_col) * 1e6 + F.lit(0.5)).cast("bigint")
    # stage the hash as a REAL column before the ladder: the CASE chain
    # references its scrutinee once per arm, so an inlined md5 would be
    # evaluated 8x per pair (and interpreted, if built inside a
    # higher-order lambda) — the PQ/word_ngrams bind-once lesson
    pairs = (df.filter(F.col(value_col).isNotNull())
             .select(*group_cols, vm.alias("_vm"),
                     F.col(id_col).cast("string").alias("_id"),
                     F.explode(F.sequence(F.lit(0), F.lit(b - 1)))
                     .alias("rep"))
             .select(*group_cols, "_vm", "rep",
                     portable_hash60(
                         F.concat(F.col("_id"), F.lit(":"),
                                  F.col("rep").cast("string")))
                     .alias("_h"))
             .select(*group_cols, "_vm", "rep",
                     _ladder(F.col("_h"), POISSON1_T,
                             list(range(8))).alias("w")))
    rep_agg = pairs.groupBy(*group_cols, "rep").agg(
        F.sum("w").alias("_sw"),
        F.sum((F.col("w") * F.col("_vm")).cast("decimal(38,0)"))
        .alias("_swv"))
    rep_mean_q = F.when(
        F.col("_sw") > 0,
        F.floor(F.col("_swv").cast("double") / F.col("_sw") + F.lit(0.5))
        .cast("bigint"))
    reps_q = rep_agg.select(*group_cols, rep_mean_q.alias("_mq"))
    out = reps_q.groupBy(*group_cols).agg(
        F.count("_mq").alias("n_reps"),
        F.sum(F.col("_mq").cast("decimal(18,0)")).alias("_s1"),
        F.sum((F.col("_mq").cast("decimal(18,0)")
               * F.col("_mq").cast("decimal(18,0)")).cast("decimal(38,0)"))
        .alias("_s2"))
    nr = F.col("n_reps").cast("double")
    s1, s2 = F.col("_s1").cast("double"), F.col("_s2").cast("double")
    return out.select(
        *group_cols, "n_reps",
        F.round(s1 / nr / 1e6, 6).alias("boot_mean"),
        F.round(F.sqrt((s2 - s1 * s1 / nr) / (nr - 1)) / 1e6, 6)
        .alias("boot_se"))


def dp_noisy_counts(df: DataFrame, group_cols: list[str],
                    k_min: int = 10) -> DataFrame:
    """Differentially-private release of group counts: the two-sided
    geometric mechanism (integer Laplace, epsilon = ln 2) plus a k-min
    suppression gate — the standard pattern for publishing usage
    aggregates without exposing small cohorts.

    The noise draw is a deterministic replay: a 60-bit uniform keyed on
    the group values runs through the exact GEOM_HALF_T inverse-CDF
    ladder (noise in [-4, 4], tail mass collapsed into the extremes).
    Deterministic noise keeps the release idempotent across reruns and
    lets a SQL oracle reproduce it bit-for-bit; a production deployment
    would key the hash with a private per-release salt instead of the
    public group key.

    Scale shape: one partial-agg count shuffle; noise and suppression are
    per-group projections."""
    from tabsdata_spark.llm.textual import portable_hash60

    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in group_cols])
    noise = _ladder(portable_hash60(key), GEOM_HALF_T,
                    list(range(-4, 5)))
    return (counts.filter(F.col("n") >= k_min)
            .select(*group_cols, "n",
                    F.greatest(F.col("n") + noise, F.lit(0).cast("bigint"))
                    .alias("noisy_n")))


def count_min_sketch(items: DataFrame, item_col: str, probe: DataFrame,
                     depth: int = 4, width: int = 1024) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan '05): a depth x width
    counter grid where every item increments one counter per depth row
    (bucket = hash_d(item) mod width); a point estimate is the MIN over
    the depth counters — never an underestimate, over by at most
    eps * N with probability 1 - delta (eps = e/width, delta = e^-depth).
    The mergeable sketch behind count monitoring where the exact
    vocabulary is too large to keep.

    `probe` is a frame with `item_col` naming the items to estimate;
    returns (item, cms_n).  Deterministic by construction: ONE md5-derived
    60-bit hash per occurrence splits into (h1, h2) and the depth buckets
    are (h1 + d * h2) mod width — Kirsch-Mitzenmacher double hashing,
    which preserves the CMS guarantee while paying a single hash per
    item.  A SQL oracle rebuilds the identical grid.

    Scale shape: one explode(depth) + partial-agg shuffle onto at most
    depth * width counter cells (map-side combine collapses the stream);
    estimates are a broadcast-sized join of probes against the tiny
    grid."""
    from tabsdata_spark.llm.textual import portable_hash60

    def buckets(term: Column) -> Column:
        h = portable_hash60(term)
        h1 = F.pmod(h, F.lit(1 << 30))
        # integer shift, NOT h / 2^30: the double quotient of a 60-bit
        # hash is not exactly representable and would round the bucket
        h2 = F.shiftright(h, 30) * 2 + 1
        return F.transform(
            F.sequence(F.lit(0), F.lit(depth - 1)),
            lambda d: F.pmod(h1 + d.cast("bigint") * h2, F.lit(width)))

    cells = (items.select(
        F.posexplode(buckets(F.col(item_col))).alias("d", "bucket"))
        .groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c")))
    probes = probe.select(
        F.col(item_col).alias("_p"),
        F.posexplode(buckets(F.col(item_col))).alias("d", "bucket"))
    est = (probes.join(F.broadcast(cells), ["d", "bucket"], "left")
           .groupBy("_p")
           .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_n")))
    return est.select(F.col("_p").alias(item_col), "cms_n")


def calibration_bins(df: DataFrame, score_col: str, label_col: str,
                     bins: int = 10) -> DataFrame:
    """Reliability diagram for a probabilistic classifier: bucket rows by
    predicted score, report each bucket's size, mean prediction, and
    observed positive rate — the calibration check that decides whether
    a quality/filter model's scores can be thresholded as probabilities.

    Exactness contract: bin assignment is floor(score*bins) clamped to
    the top bin; mean prediction sums micros-quantized scores exactly;
    the positive rate is an integer ratio — every cell is a fixed IEEE
    expression over exact integers.

    Scale shape: one projection + one partial-agg shuffle of at most
    `bins` groups."""
    s = F.col(score_col)
    bin_ = F.least(F.floor(s * bins).cast("int"), F.lit(bins - 1))
    sq = F.floor(s * 1e6 + F.lit(0.5)).cast("bigint")
    y = F.col(label_col).cast("int")
    return (df.select(bin_.alias("bin"), sq.alias("__sq"), y.alias("__y"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("__sq").alias("__ss"),
                 F.sum("__y").alias("__pos"))
            .select("bin", "n",
                    F.round(F.col("__ss").cast("double") / 1e6
                            / F.col("n"), 6).alias("mean_score"),
                    F.round(F.col("__pos").cast("double") / F.col("n"), 6)
                    .alias("frac_pos")))


def nelson_aalen(df: DataFrame, group_cols: list[str], duration_col: str,
                 event_col: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator per group: at each time
    with events, H(t) = sum_{t'<=t} d/n — the nonparametric hazard
    twin of kaplan_meier (reference parity: time-to-event analytics,
    e.g. tabsdata/expansions feature set), preferred over KM when the
    quantity of interest is the hazard itself or when d/n is small.

    Exactness contract: each increment d/n is quantized to micros via
    FLOOR(d*1e6/n + 0.5) — d*1e6 is an exact double below 2^53 and the
    division is one IEEE op — then cumulative-summed as BIGINT, so H(t)
    is identical integers in any engine/partitioning.  The Breslow
    survival exp(-H) is one IEEE exp per row (round 6 display).

    Scale shape: identical to kaplan_meier — one partial-agg shuffle
    onto (group, time), then windows inside group partitions."""
    g = [F.col(c) for c in group_cols]
    ev = F.col(event_col).cast("int")
    pts = (df.groupBy(*g, F.col(duration_col).alias("t"))
           .agg(F.sum(ev).alias("d"),
                F.sum(F.lit(1) - ev).alias("c")))
    wo = Window.partitionBy(*group_cols).orderBy("t")
    cum_all = (F.sum(F.col("d") + F.col("c"))
               .over(wo.rowsBetween(Window.unboundedPreceding,
                                    Window.currentRow)))
    total = F.sum(F.col("d") + F.col("c")).over(
        Window.partitionBy(*group_cols))
    pts = pts.withColumn(
        "n_risk", (total - cum_all + F.col("d") + F.col("c")).cast("bigint"))
    hm = (F.floor(F.col("d") * F.lit(1e6) / F.col("n_risk").cast("double")
                  + F.lit(0.5)).cast("bigint"))
    cum_h = F.sum(hm).over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = pts.select(
        *g, "t", "n_risk", F.col("d").alias("n_events"),
        F.round(cum_h.cast("double") / F.lit(1e6), 6).alias("cum_hazard"),
        F.round(F.exp(-(cum_h.cast("double") / F.lit(1e6))), 6)
        .alias("na_survival"))
    return out.filter(F.col("n_events") > 0)


def theil_sen(df: DataFrame, x_col: str, y_col: str,
              group_cols: list[str], max_points: int = 60) -> DataFrame:
    """Per-group Theil-Sen robust trend: the median of all pairwise
    slopes (y_j - y_i) / (x_j - x_i), i < j — breakdown point ~29%, the
    outlier-resistant complement to exact_regression's OLS slope.

    Inputs must be BIGINT-quantized by the caller (same contract as
    exact_regression).  Exactness: each pairwise slope is quantized to
    micros via FLOOR(dy*1e6/dx + 0.5) (dy*1e6 exact below 2^53, one
    IEEE division), and the median is the LOWER median — the value at
    sorted position (n_pairs+1) div 2 — so no float averaging of the
    two middle elements; ties need no tie-break because equal micros
    are interchangeable at the picked position.

    Every input group surfaces: a group with NO valid pair (a single
    point, or every point sharing one x) has no slopes to take a
    median of and comes back with n_pairs = 0 and slope NULL rather
    than vanishing.

    Scale shape: pairwise enumeration is O(k^2) per group, so the
    series is CAPPED at the first `max_points` points by x (window
    row_number) — the cap is the 100 TB guard; per-group work is then
    bounded at max_points^2/2 regardless of input size.  One window
    pass + one within-group self-join + one agg, plus one
    group-cardinality distinct + broadcast-able left join to surface
    pairless groups."""
    w = Window.partitionBy(*group_cols).orderBy("__x")
    pts = (df.select(*group_cols, F.col(x_col).alias("__x"),
                     F.col(y_col).alias("__y"))
           .withColumn("__rn", F.row_number().over(w))
           .filter(F.col("__rn") <= max_points))
    a = pts.select(*group_cols, F.col("__x").alias("__x1"),
                   F.col("__y").alias("__y1"))
    b = pts.select(*group_cols, F.col("__x").alias("__x2"),
                   F.col("__y").alias("__y2"))
    pairs = (a.join(b, group_cols)
             .filter(F.col("__x2") > F.col("__x1"))
             .select(*group_cols,
                     F.floor((F.col("__y2") - F.col("__y1")).cast("double")
                             * F.lit(1e6)
                             / (F.col("__x2") - F.col("__x1")).cast("double")
                             + F.lit(0.5)).cast("bigint").alias("__sm")))
    ws = Window.partitionBy(*group_cols).orderBy("__sm")
    ranked = (pairs.withColumn("__rn", F.row_number().over(ws))
              .withColumn("__np", F.count(F.lit(1)).over(
                  Window.partitionBy(*group_cols))))
    # lower median = position floor((np+1)/2); the float floor form is
    # exact (np < 2^52) and unambiguous in both engines
    med = ranked.filter(
        F.col("__rn") == F.floor((F.col("__np") + 1) / F.lit(2.0)))
    med = med.select(
        *group_cols, F.col("__np").alias("n_pairs"),
        F.round(F.col("__sm").cast("double") / 1e6, 6).alias("slope"))
    groups = df.select(*group_cols).distinct()
    return (groups.join(med, group_cols, "left")
            .select(*group_cols,
                    F.coalesce(F.col("n_pairs"), F.lit(0))
                    .cast("bigint").alias("n_pairs"),
                    F.col("slope")))


def exact_skew_kurtosis(df: DataFrame, value_col: str,
                        group_cols: list[str]) -> DataFrame:
    """Per-group skewness and excess kurtosis from exact integer raw
    moments.  `value_col` must be BIGINT-quantized by the caller at a
    scale where |m| stays below ~1e6 (e.g. MILLIS for values under
    ~1000): m^4 then caps near 1e24 per row, leaving 14 digits of
    decimal(38,0) headroom for the row count — enough for ~1e14 rows,
    the 100 TB regime.  (Micros would overflow the 4th moment at
    ~1e5 rows — the same class of wrap the rolling-zscore fix killed.)

    All four raw-moment sums are exact decimals; the central-moment
    closed forms are evaluated in double with ONE fixed expression
    tree, so both engines produce identical IEEE results:

        m2 = S2/n - mu^2
        m3 = S3/n - 3*mu*S2/n + 2*mu^3
        m4 = S4/n - 4*mu*S3/n + 6*mu^2*S2/n - 3*mu^4
        skew = m3 / m2^1.5 ; excess kurtosis = m4/m2^2 - 3

    Degenerate groups (m2 <= 0) surface NULL rather than raising under
    ANSI or emitting engine-dependent NaN orderings.

    Scale shape: one partial-agg shuffle; moments combine associatively
    so map-side combine does the heavy lifting."""
    big = "decimal(38,0)"
    m = F.col(value_col).cast(big)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(m).alias("_s1"),
        F.sum((m * m).cast(big)).alias("_s2"),
        F.sum((m * m * m).cast(big)).alias("_s3"),
        F.sum((m * m * m * m).cast(big)).alias("_s4"))
    n = F.col("n").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    s3 = F.col("_s3").cast("double")
    s4 = F.col("_s4").cast("double")
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - F.lit(3.0) * mu * (s2 / n) + F.lit(2.0) * mu * mu * mu
    m4 = (s4 / n - F.lit(4.0) * mu * (s3 / n)
          + F.lit(6.0) * mu * mu * (s2 / n)
          - F.lit(3.0) * mu * mu * mu * mu)
    ok = m2 > F.lit(0.0)
    return agg.select(
        *group_cols, "n",
        F.when(ok, F.round(m3 / F.sqrt(m2 * m2 * m2), 6)).alias("skewness"),
        F.when(ok, F.round(m4 / (m2 * m2) - F.lit(3.0), 6))
        .alias("excess_kurtosis"))


def did_means(df: DataFrame, treated_col: str, post_col: str,
              value_col: str) -> DataFrame:
    """Difference-in-differences estimator: mean outcome per
    (treated, post) cell and DiD = (treated_post - treated_pre)
    - (control_post - control_pre) — the workhorse causal contrast for
    before/after rollouts with a concurrent control group (completes
    the causal trio with cuped and poisson_bootstrap_mean).

    Exactness contract: outcomes are micros-quantized and summed as
    decimal(38,0) per cell via conditional aggregation (ONE pass, no
    joins); the four means and the DiD are a single fixed IEEE
    expression over those exact integers (round 6 display).

    Scale shape: one partial aggregate onto a single row — the
    map-side combine does all the work; no shuffle wider than the
    4-cell moment set."""
    big = "decimal(38,0)"
    t = F.col(treated_col).cast("boolean")
    p = F.col(post_col).cast("boolean")
    vm = (F.floor(F.col(value_col) * 1e6 + F.lit(0.5))
          .cast("bigint").cast(big))

    def cell(tt, pp, tag):
        cond = (t == tt) & (p == pp)
        return [F.sum(F.when(cond, 1).otherwise(0)).alias(f"n_{tag}"),
                F.sum(F.when(cond, vm).otherwise(F.lit(0).cast(big)))
                .alias(f"_s_{tag}")]

    agg = df.agg(*cell(True, False, "t0"), *cell(True, True, "t1"),
                 *cell(False, False, "c0"), *cell(False, True, "c1"))

    def mean(tag):
        return (F.col(f"_s_{tag}").cast("double") / 1e6
                / F.col(f"n_{tag}").cast("double"))

    return agg.select(
        F.col("n_t0").cast("bigint").alias("n_treated_pre"),
        F.col("n_t1").cast("bigint").alias("n_treated_post"),
        F.col("n_c0").cast("bigint").alias("n_control_pre"),
        F.col("n_c1").cast("bigint").alias("n_control_post"),
        F.round(mean("t0"), 6).alias("mean_treated_pre"),
        F.round(mean("t1"), 6).alias("mean_treated_post"),
        F.round(mean("c0"), 6).alias("mean_control_pre"),
        F.round(mean("c1"), 6).alias("mean_control_post"),
        F.round((mean("t1") - mean("t0")) - (mean("c1") - mean("c0")), 6)
        .alias("did"))


def ipw_means(df: DataFrame, strata_cols: list[str], treat_col: str,
              value_col: str) -> DataFrame:
    """Inverse-propensity-weighted outcome means under stratified
    propensities: within each stratum the propensity is the observed
    treatment rate e_s = n_t/n_s, and the IPW estimate reweights each
    arm to the full population — the standardization / G-computation
    estimate for confounded treatment assignment.

    Exactness contract: per-stratum micros outcome sums are exact
    decimals; each stratum's reweighted contribution
    S_arm * n_s / n_arm is evaluated in double and quantized back to
    micros (FLOOR(x + 0.5)) BEFORE the cross-strata sum, which then
    runs as exact BIGINT — no float accumulation-order drift no matter
    how many strata or partitions.  Strata with an empty arm are
    excluded from BOTH arms (the common-support filter) and counted.

    Scale shape: one partial-agg shuffle onto strata, one bounded agg
    onto a single row."""
    big = "decimal(38,0)"
    tr = F.col(treat_col).cast("boolean")
    vm = (F.floor(F.col(value_col) * 1e6 + F.lit(0.5))
          .cast("bigint").cast(big))
    per = df.groupBy(*strata_cols).agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum(tr.cast("int")).alias("n_t"),
        F.sum(F.when(tr, vm).otherwise(F.lit(0).cast(big))).alias("_st"),
        F.sum(F.when(~tr, vm).otherwise(F.lit(0).cast(big))).alias("_sc"))
    per = per.withColumn("__ok", (F.col("n_t") > 0)
                         & (F.col("n_t") < F.col("n_s")))
    n_s = F.col("n_s").cast("double")

    def contrib(sum_col, arm_n):
        x = (F.col(sum_col).cast("double") * n_s / arm_n.cast("double"))
        return F.when(F.col("__ok"),
                      F.floor(x + F.lit(0.5)).cast("bigint")).otherwise(0)

    tot = per.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(F.when(F.col("__ok"), 0).otherwise(1)).alias("n_excluded"),
        F.sum(F.when(F.col("__ok"), F.col("n_s")).otherwise(0)).alias("_n"),
        F.sum(F.when(F.col("__ok"), F.col("n_t")).otherwise(0)).alias("_nt"),
        F.sum(F.when(F.col("__ok"), F.col("_st"))
              .otherwise(F.lit(0).cast(big))).alias("_rt"),
        F.sum(F.when(F.col("__ok"), F.col("_sc"))
              .otherwise(F.lit(0).cast(big))).alias("_rc"),
        F.sum(contrib("_st", F.col("n_t"))).alias("_wt"),
        F.sum(contrib("_sc", F.col("n_s") - F.col("n_t"))).alias("_wc"))
    n = F.col("_n").cast("double")
    naive_t = F.col("_rt").cast("double") / 1e6 / F.col("_nt").cast("double")
    naive_c = (F.col("_rc").cast("double") / 1e6
               / (F.col("_n") - F.col("_nt")).cast("double"))
    ipw_t = F.col("_wt").cast("double") / 1e6 / n
    ipw_c = F.col("_wc").cast("double") / 1e6 / n
    return tot.select(
        F.col("n_strata").cast("bigint").alias("n_strata"),
        F.col("n_excluded").cast("bigint").alias("n_excluded"),
        F.col("_n").cast("bigint").alias("n"),
        F.round(naive_t - naive_c, 6).alias("naive_diff"),
        F.round(ipw_t, 6).alias("ipw_treated_mean"),
        F.round(ipw_c, 6).alias("ipw_control_mean"),
        F.round(ipw_t - ipw_c, 6).alias("ipw_diff"))


def cross_correlation(a: DataFrame, b: DataFrame, t_col: str,
                      x_col: str, y_col: str,
                      max_lag: int = 7) -> DataFrame:
    """Lead-lag cross-correlation between two integer-valued series:
    Pearson r between x_t and y_{t+lag} for every lag in
    [-max_lag, max_lag] — which series LEADS (marketing spend vs
    conversions, errors vs churn) and by how much.

    Inputs are (t, value) frames with BIGINT t (e.g. epoch days) and
    BIGINT values (counts, micros) — the exact_regression quantization
    contract.  Exactness: per-lag moments are exact decimal(38,0)
    sums; r is one fixed IEEE expression; degenerate lags (either
    variance 0, or fewer than 3 aligned points) surface NULL.

    Scale shape: the lag grid ((2*max_lag+1) rows) broadcast-expands
    the x series once; ONE join onto y (on the shifted key) and ONE
    partial-agg shuffle onto the bounded lag column."""
    big = "decimal(38,0)"
    lags = F.explode(F.sequence(F.lit(-max_lag), F.lit(max_lag)))
    ax = (a.select(F.col(t_col).alias("__t"), F.col(x_col).alias("__x"))
          .select("__t", "__x", lags.alias("lag")))
    by = b.select(F.col(t_col).alias("__ty"), F.col(y_col).alias("__y"))
    j = ax.join(by, ax["__t"] + ax["lag"] == by["__ty"])
    x, y = F.col("__x").cast(big), F.col("__y").cast(big)
    agg = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"), F.sum(y).alias("_sy"),
        F.sum((x * y).cast(big)).alias("_sxy"),
        F.sum((x * x).cast(big)).alias("_sx2"),
        F.sum((y * y).cast(big)).alias("_sy2"))
    n = F.col("n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sx2, sy2 = F.col("_sx2").cast("double"), F.col("_sy2").cast("double")
    cov = n * sxy - sx * sy
    vx = n * sx2 - sx * sx
    vy = n * sy2 - sy * sy
    ok = (F.col("n") >= 3) & (vx > F.lit(0.0)) & (vy > F.lit(0.0))
    return agg.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n"),
        F.when(ok, F.round(cov / F.sqrt(vx * vy), 6)).alias("r"))


def l_diversity(df: DataFrame, qi_cols: list[str],
                sensitive_col: str) -> DataFrame:
    """l-diversity report per quasi-identifier equivalence class: class
    size and the number of DISTINCT sensitive values — the companion
    disclosure check to k-anonymity (a k-anonymous class with one
    sensitive value still leaks; publishable classes need l >= L).

    Exact integer counts only.  Scale shape: one partial-agg shuffle
    onto (qi..., sensitive), one onto qi — both map-side combined."""
    cells = (df.groupBy(*qi_cols, F.col(sensitive_col).alias("__s"))
             .agg(F.count(F.lit(1)).alias("__c")))
    return (cells.groupBy(*qi_cols)
            .agg(F.sum("__c").cast("bigint").alias("n"),
                 F.count(F.lit(1)).cast("bigint").alias("l_distinct")))


def roc_auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC AUC with tie handling (the Mann-Whitney identity):
    AUC = P(score_pos > score_neg) + P(tie)/2 — the
    threshold-independent classifier metric, computed WITHOUT a global
    per-row rank.

    Exactness contract: rows first aggregate to the DISTINCT-SCORE
    level (n_pos, n_neg per score); the pair count
    2*sum_s(pos_s * cumneg_<s) + sum_s(pos_s * neg_s) is exact
    integers, and AUC = that / (2 * n_pos * n_neg) is one IEEE
    division (round 6).  Empty classes surface NULL.

    Scale shape: one partial-agg shuffle onto distinct scores, then a
    cumulative window over the SCORE-LEVEL table — bounded by score
    cardinality, not rows (quantize/bucket heavy-cardinality scores
    upstream); one 1-row final aggregate."""
    big = "decimal(38,0)"
    lab = F.col(label_col).cast("boolean")
    pts = (df.groupBy(F.col(score_col).alias("__s"))
           .agg(F.sum(F.when(lab, 1).otherwise(0)).alias("__p"),
                F.sum(F.when(lab, 0).otherwise(1)).alias("__n")))
    w = (Window.orderBy("__s")
         .rowsBetween(Window.unboundedPreceding, -1))
    pts = pts.withColumn(
        "__cumneg", F.coalesce(F.sum("__n").over(w), F.lit(0)))
    tot = pts.agg(
        F.sum("__p").alias("n_pos"), F.sum("__n").alias("n_neg"),
        F.sum((F.lit(2) * F.col("__p") * F.col("__cumneg")
               + F.col("__p") * F.col("__n")).cast(big)).alias("__num"))
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return tot.select(
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        F.when(ok, F.round(
            F.col("__num").cast("double")
            / (F.lit(2.0) * F.col("n_pos").cast("double")
               * F.col("n_neg").cast("double")), 6)).alias("auc"))


def pr_curve(df: DataFrame, score_col: str, label_col: str,
             bins: int = 10) -> DataFrame:
    """Precision / recall / F1 at `bins` score thresholds: rows bucket
    by floor(score * bins) clamped to [0, bins-1] (the calibration_bins
    contract — scores in [0, 1]); threshold t predicts positive when
    bucket >= t.  The operating-point table that turns a scored filter
    model into a deployable cutoff.

    Exactness: per-bucket class counts are exact integers; the
    reverse-cumulative window runs over the <= bins-row bucket table;
    precision/recall/F1 are fixed IEEE expressions (round 6); empty
    prediction sets surface NULL rather than 0/0.

    Scale shape: one partial-agg shuffle onto <= bins cells, then
    bounded windows — row count never reaches the curve math."""
    lab = F.col(label_col).cast("boolean")
    b = F.least(F.greatest(F.floor(F.col(score_col) * bins), F.lit(0)),
                F.lit(bins - 1)).cast("int")
    cells = (df.groupBy(b.alias("bin"))
             .agg(F.sum(F.when(lab, 1).otherwise(0)).alias("__p"),
                  F.sum(F.when(lab, 0).otherwise(1)).alias("__n")))
    w = (Window.orderBy(F.col("bin").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot_p = F.sum("__p").over(
        Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing))
    cum = cells.select(
        "bin",
        F.sum("__p").over(w).alias("__tp"),
        F.sum("__n").over(w).alias("__fp"),
        tot_p.alias("__pos"))
    prec = F.col("__tp").cast("double") / (F.col("__tp")
                                           + F.col("__fp")).cast("double")
    rec = F.col("__tp").cast("double") / F.col("__pos").cast("double")
    ok = (F.col("__tp") + F.col("__fp")) > 0
    f1 = F.lit(2.0) * prec * rec / (prec + rec)
    return cum.select(
        F.col("bin").alias("threshold_bin"),
        F.col("__tp").cast("bigint").alias("tp"),
        F.col("__fp").cast("bigint").alias("fp"),
        F.when(ok, F.round(prec, 6)).alias("precision"),
        F.when(F.col("__pos") > 0, F.round(rec, 6)).alias("recall"),
        F.when(ok & (F.col("__tp") > 0), F.round(f1, 6)).alias("f1"))


def cohens_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's kappa between two categorical raters/classifiers:
    agreement beyond chance, kappa = (po - pe) / (1 - pe) with
    po = observed agreement rate and pe = sum_k row_k * col_k / n^2 —
    the scalar summary of a confusion matrix (language-ID vs truth,
    two annotators, model vs heuristic).

    Exactness: all counts are exact integers summed as decimal(38,0)
    (n * diag and the row*col cross products stay inside 38 digits to
    ~1e12 rows per category); kappa is one fixed IEEE expression
    (round 6).  Perfect-chance degenerate (pe = 1) surfaces NULL.

    Scale shape: one partial-agg shuffle onto the |A| x |B| cell grid,
    then bounded-cardinality joins of the margin tables."""
    big = "decimal(38,0)"
    cells = (df.groupBy(F.col(a_col).alias("__a"),
                        F.col(b_col).alias("__b"))
             .agg(F.count(F.lit(1)).alias("__c")))
    rows_ = cells.groupBy("__a").agg(F.sum("__c").alias("__ra"))
    cols_ = cells.groupBy("__b").agg(F.sum("__c").alias("__cb"))
    marg = (rows_.join(cols_, rows_["__a"] == cols_["__b"])
            .select((F.col("__ra").cast(big) * F.col("__cb").cast(big))
                    .cast(big).alias("__rc")))
    pe_num = marg.agg(F.sum("__rc").alias("__pe")) \
        .select(F.coalesce(F.col("__pe"), F.lit(0).cast(big))
                .alias("__pe"))
    base = cells.agg(
        F.sum("__c").alias("__n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__c"))
              .otherwise(0)).alias("__d"))
    j = base.crossJoin(F.broadcast(pe_num))
    n = F.col("__n").cast("double")
    po = F.col("__d").cast("double") / n
    pe = F.col("__pe").cast("double") / (n * n)
    return j.select(
        F.col("__n").cast("bigint").alias("n"),
        F.col("__d").cast("bigint").alias("n_agree"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.when(pe < F.lit(1.0),
               F.round((po - pe) / (F.lit(1.0) - pe), 6)).alias("kappa"))


def fano_factor(df: DataFrame, key_cols: list[str], bucket_col: str
                ) -> DataFrame:
    """Burstiness of event arrivals per key: bucket counts (e.g. per
    day/hour), then Fano factor F = var/mean and the bounded
    burstiness score B = (sigma - mu) / (sigma + mu) — F ~ 1 / B < 0
    for Poisson-like traffic, larger for bursty keys (bot storms,
    batch jobs, thundering herds).

    Exactness: bucket counts are exact integers; the variance uses
    decimal(38,0) raw moments (sample variance, n-1); F and B are
    fixed IEEE expressions (round 6); degenerate keys (n < 2 buckets
    or mean 0) surface NULL.

    Scale shape: one partial-agg shuffle onto (key, bucket), one onto
    key — both map-side combined."""
    big = "decimal(38,0)"
    counts = (df.groupBy(*key_cols, F.col(bucket_col).alias("__b"))
              .agg(F.count(F.lit(1)).alias("__c")))
    c = F.col("__c").cast(big)
    agg = counts.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(c).alias("_s1"),
        F.sum((c * c).cast(big)).alias("_s2"))
    n = F.col("n_buckets").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - F.lit(1.0))
    ok = (F.col("n_buckets") >= 2) & (mean > F.lit(0.0)) \
        & (var >= F.lit(0.0))
    sd = F.sqrt(var)
    return agg.select(
        *key_cols, F.col("n_buckets").cast("bigint").alias("n_buckets"),
        F.round(mean, 6).alias("mean_per_bucket"),
        F.when(ok, F.round(var / mean, 6)).alias("fano"),
        F.when(ok & (sd + mean > F.lit(0.0)),
               F.round((sd - mean) / (sd + mean), 6)).alias("burstiness"))


def logrank_test(df: DataFrame, duration_col: str, event_col: str,
                 group_col) -> DataFrame:
    """Two-sample log-rank test statistic comparing survival between
    group TRUE and group FALSE (Mantel-Cox): at each event time the
    observed-minus-expected events in the treatment arm accumulate,
    with the hypergeometric variance — the standard A/B readout on
    time-to-event outcomes (churn, fulfillment), completing the
    survival family with kaplan_meier and nelson_aalen.

        O-E   = sum_t (d1_t - d_t * n1_t / n_t)
        V     = sum_t d_t * (n1_t/n_t) * (1 - n1_t/n_t)
                      * (n_t - d_t) / (n_t - 1)
        chi^2 = (O-E)^2 / V

    Exactness contract: risk sets and event counts are exact integer
    window sums; each time's O-E and V terms are quantized to 1e9 and
    summed as exact BIGINT, so the statistic is identical integers in
    any engine/partitioning (one IEEE division + square at the end,
    round 6).  Times with n_t <= 1 contribute zero variance.

    Scale shape: one partial-agg shuffle onto times, one ordered
    window INSIDE the single survival table (time cardinality), one
    1-row final agg."""
    g = F.col(group_col).cast("boolean")
    ev = F.col(event_col).cast("int")
    pts = (df.groupBy(F.col(duration_col).alias("t"))
           .agg(F.sum(ev).alias("d"),
                F.sum(F.when(g, ev).otherwise(0)).alias("d1"),
                F.count(F.lit(1)).alias("m"),
                F.sum(F.when(g, 1).otherwise(0)).alias("m1")))
    wo = Window.orderBy("t")
    cum_m = (F.sum("m").over(wo.rowsBetween(Window.unboundedPreceding,
                                            Window.currentRow)))
    cum_m1 = (F.sum("m1").over(wo.rowsBetween(Window.unboundedPreceding,
                                              Window.currentRow)))
    tot = Window.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    pts = pts.select(
        "t", "d", "d1",
        (F.sum("m").over(tot) - cum_m + F.col("m")).alias("n"),
        (F.sum("m1").over(tot) - cum_m1 + F.col("m1")).alias("n1"))
    n, n1 = F.col("n").cast("double"), F.col("n1").cast("double")
    d = F.col("d").cast("double")
    oe = F.col("d1").cast("double") - d * n1 / n
    v = F.when(F.col("n") > 1,
               d * (n1 / n) * (F.lit(1.0) - n1 / n)
               * (n - d) / (n - F.lit(1.0))).otherwise(F.lit(0.0))
    q = pts.filter(F.col("d") > 0).select(
        F.floor(oe * 1e9 + F.lit(0.5)).cast("bigint").alias("__oe"),
        F.floor(v * 1e9 + F.lit(0.5)).cast("bigint").alias("__v"))
    agg = q.agg(F.count(F.lit(1)).alias("n_times"),
                F.sum("__oe").alias("__soe"), F.sum("__v").alias("__sv"))
    soe = F.col("__soe").cast("double") / 1e9
    sv = F.col("__sv").cast("double") / 1e9
    return agg.select(
        F.col("n_times").cast("bigint").alias("n_times"),
        F.round(soe, 6).alias("o_minus_e"),
        F.round(sv, 6).alias("variance"),
        F.when(sv > F.lit(0.0), F.round(soe * soe / sv, 6))
        .alias("chi2"))


def dp_noisy_sum(df: DataFrame, group_cols: list[str], value_col: str,
                 clip: float, k_min: int = 10) -> DataFrame:
    """Differentially-private release of group SUMS: each row's value
    clips to [0, clip] (the sensitivity bound), sums run as exact
    decimal micros, and the two-sided geometric mechanism from
    dp_noisy_counts adds noise SCALED BY THE CLIP (integer noise units
    x clip micros — the discrete analog of Laplace(clip/eps)).  Small
    cohorts are suppressed below k_min, releases floor at 0.

    Deterministic replay contract: same keyed-hash uniform and exact
    GEOM_HALF_T ladder as dp_noisy_counts (a production deployment
    keys the hash with a private salt).

    Scale shape: one partial-agg shuffle; clip, noise, and suppression
    are per-row/per-group projections."""
    from tabsdata_spark.llm.textual import portable_hash60

    big = "decimal(38,0)"
    cm = int(round(clip * 1e6))
    vm = F.least(F.greatest(
        F.floor(F.col(value_col) * 1e6 + F.lit(0.5)).cast("bigint"),
        F.lit(0)), F.lit(cm))
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vm.cast(big)).alias("__s"))
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in group_cols])
    noise = _ladder(portable_hash60(key), GEOM_HALF_T, list(range(-4, 5)))
    noisy = (F.col("__s").cast("double") / 1e6
             + noise.cast("double") * F.lit(float(cm)) / 1e6)
    return (agg.filter(F.col("n") >= k_min)
            .select(*group_cols, F.col("n").cast("bigint").alias("n"),
                    F.round(F.col("__s").cast("double") / 1e6, 6)
                    .alias("clipped_sum"),
                    F.round(F.greatest(noisy, F.lit(0.0)), 6)
                    .alias("noisy_sum")))


def ks_test(df: DataFrame, bucket_col: str, cohort_col: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between cohort TRUE and
    cohort FALSE over a PRE-BUCKETED statistic column: D = max over
    buckets of |ECDF_1 - ECDF_2| — the distribution-shift test that
    catches what a mean-based monitor misses.

    The caller buckets the raw statistic (e.g. floor(value)) so the
    cumulative scan runs over BUCKET CARDINALITY, never rows — the
    same bounded-window contract as roc_auc; D is then the exact KS
    distance of the bucketed distributions.

    Exactness contract: per-bucket cohort counts are exact integers;
    |cum1 * n2 - cum2 * n1| is an exact integer cross product (no
    rational arithmetic), and D = max_diff / (n1 * n2) is ONE IEEE
    division (round 6).  Empty cohorts surface NULL."""
    big = "decimal(38,0)"
    c = F.col(cohort_col).cast("boolean")
    pts = (df.groupBy(F.col(bucket_col).alias("__b"))
           .agg(F.sum(F.when(c, 1).otherwise(0)).alias("__c1"),
                F.sum(F.when(c, 0).otherwise(1)).alias("__c2")))
    w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    tot = Window.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    cum = pts.select(
        F.sum("__c1").over(w).alias("__k1"),
        F.sum("__c2").over(w).alias("__k2"),
        F.sum("__c1").over(tot).alias("__n1"),
        F.sum("__c2").over(tot).alias("__n2"))
    diff = F.abs(F.col("__k1").cast(big) * F.col("__n2").cast(big)
                 - F.col("__k2").cast(big) * F.col("__n1").cast(big))
    agg = cum.agg(F.max(diff.cast(big)).alias("__d"),
                  F.max("__n1").alias("n_1"), F.max("__n2").alias("n_2"))
    ok = (F.col("n_1") > 0) & (F.col("n_2") > 0)
    return agg.select(
        F.col("n_1").cast("bigint").alias("n_1"),
        F.col("n_2").cast("bigint").alias("n_2"),
        F.when(ok, F.round(
            F.col("__d").cast("double")
            / (F.col("n_1").cast("double") * F.col("n_2").cast("double")),
            6)).alias("ks_d"))


def two_proportion_ztest(df: DataFrame, success_col: str, cohort_col: str,
                         group_cols: list[str]) -> DataFrame:
    """Per-group two-proportion z-test between cohort TRUE and FALSE:
    z = (p1 - p2) / sqrt(p(1-p)(1/n1 + 1/n2)) with the pooled rate p —
    the conversion-rate significance readout for funnels and A/B
    gates.

    Exactness: all counts exact integers; z is one fixed IEEE
    expression (round 6); degenerate groups (either cohort empty, or
    pooled rate 0/1) surface NULL.

    Scale shape: one partial-agg shuffle onto the group keys."""
    c = F.col(cohort_col).cast("boolean")
    s = F.col(success_col).cast("int")
    agg = df.groupBy(*group_cols).agg(
        F.sum(F.when(c, 1).otherwise(0)).alias("n_1"),
        F.sum(F.when(c, s).otherwise(0)).alias("s_1"),
        F.sum(F.when(~c, 1).otherwise(0)).alias("n_2"),
        F.sum(F.when(~c, s).otherwise(0)).alias("s_2"))
    n1, n2 = F.col("n_1").cast("double"), F.col("n_2").cast("double")
    s1, s2 = F.col("s_1").cast("double"), F.col("s_2").cast("double")
    p1, p2 = s1 / n1, s2 / n2
    p = (s1 + s2) / (n1 + n2)
    se2 = p * (F.lit(1.0) - p) * (F.lit(1.0) / n1 + F.lit(1.0) / n2)
    ok = (F.col("n_1") > 0) & (F.col("n_2") > 0) & (se2 > F.lit(0.0))
    return agg.select(
        *group_cols,
        F.col("n_1").cast("bigint").alias("n_1"),
        F.col("n_2").cast("bigint").alias("n_2"),
        F.round(p1, 6).alias("rate_1"),
        F.round(p2, 6).alias("rate_2"),
        F.when(ok, F.round((p1 - p2) / F.sqrt(se2), 6)).alias("z"))


def mahalanobis_outliers(df: DataFrame, x1_col: str, x2_col: str,
                         group_cols: list[str],
                         threshold: float = 9.0) -> DataFrame:
    """Per-group bivariate Mahalanobis outlier report: squared distance
    d2 = (x - mu)' S^-1 (x - mu) under the group's own 2x2 sample
    covariance — the correlation-aware outlier test that univariate
    z-scores miss (a point can be 2 sigma on each axis yet wildly
    off the joint distribution).

    Inputs must be BIGINT-quantized (the exact_regression contract).
    Exactness: the five moment sums are exact decimal(38,0); mu, the
    covariance cells, the inverse, and each row's d2 are fixed IEEE
    expressions; the report counts rows with d2 > threshold and the
    max d2 (round 6).  Degenerate groups (singular covariance, n < 3)
    surface NULL and count no outliers.

    Scale shape: one moment shuffle onto groups, one broadcast join of
    the 7-scalar model back onto rows, one final partial agg."""
    big = "decimal(38,0)"
    x1, x2 = F.col(x1_col).cast(big), F.col(x2_col).cast(big)
    mom = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(x1).alias("__s1"), F.sum(x2).alias("__s2"),
        F.sum((x1 * x1).cast(big)).alias("__s11"),
        F.sum((x2 * x2).cast(big)).alias("__s22"),
        F.sum((x1 * x2).cast(big)).alias("__s12"))
    n = F.col("__n").cast("double")
    s1, s2 = F.col("__s1").cast("double"), F.col("__s2").cast("double")
    s11 = F.col("__s11").cast("double")
    s22 = F.col("__s22").cast("double")
    s12 = F.col("__s12").cast("double")
    mu1, mu2 = s1 / n, s2 / n
    v11 = (s11 - s1 * s1 / n) / (n - F.lit(1.0))
    v22 = (s22 - s2 * s2 / n) / (n - F.lit(1.0))
    v12 = (s12 - s1 * s2 / n) / (n - F.lit(1.0))
    det = v11 * v22 - v12 * v12
    model = mom.select(
        *group_cols, F.col("__n").alias("__mn"),
        mu1.alias("__mu1"), mu2.alias("__mu2"),
        v11.alias("__v11"), v22.alias("__v22"), v12.alias("__v12"),
        det.alias("__det"))
    j = df.join(F.broadcast(model), group_cols)
    d1 = F.col(x1_col).cast("double") - F.col("__mu1")
    d2c = F.col(x2_col).cast("double") - F.col("__mu2")
    ok = (F.col("__mn") >= 3) & (F.col("__det") > F.lit(0.0))
    d2 = ((F.col("__v22") * d1 * d1
           - F.lit(2.0) * F.col("__v12") * d1 * d2c
           + F.col("__v11") * d2c * d2c) / F.col("__det"))
    return (j.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(ok & (d2 > F.lit(float(threshold))), 1)
              .otherwise(0)).alias("n_outliers"),
        F.max(F.when(ok, F.round(d2, 6))).alias("max_d2"))
        .select(*group_cols, F.col("n").cast("bigint").alias("n"),
                F.col("n_outliers").cast("bigint").alias("n_outliers"),
                "max_d2"))


def gini_mean_difference(df: DataFrame, value_col: str,
                         group_cols: list[str]) -> DataFrame:
    """Per-group Gini mean difference (mean absolute pairwise gap) and
    relative GMD — the robust dispersion measure that, unlike
    variance, is directly interpretable in the value's units and less
    tail-dominated.

    Identity used (no pairwise enumeration):
        GMD = 2 / (n(n-1)) * sum_i (2i - n - 1) * x_(i)
    over the ASCENDING-sorted values x_(i), i = 1..n — so the cost is
    one rank window inside each group partition, not O(n^2) pairs.

    Inputs must be BIGINT-quantized (micros/millis — the
    exact_regression contract).  Exactness: the weighted sum runs as
    exact decimal(38,0) ((2i-n-1) < 2^40, x fits the caller's scale);
    GMD is one IEEE division (round 6).  Rank ties are harmless: tied
    values are interchangeable under any tie order because the weights
    applied to equal x sum to the same total."""
    big = "decimal(38,0)"
    ranked = (df.select(*group_cols, F.col(value_col).alias("__x"))
              .withColumn("__i", F.row_number().over(
                  Window.partitionBy(*group_cols).orderBy("__x")))
              .withColumn("__n", F.count(F.lit(1)).over(
                  Window.partitionBy(*group_cols))))
    term = ((F.lit(2) * F.col("__i") - F.col("__n") - 1).cast(big)
            * F.col("__x").cast(big)).cast(big)
    agg = ranked.groupBy(*group_cols).agg(
        F.max("__n").alias("n"),
        F.sum(term).alias("__s"),
        F.sum(F.col("__x").cast(big)).alias("__sx"))
    n = F.col("n").cast("double")
    gmd = (F.lit(2.0) * F.col("__s").cast("double")
           / (n * (n - F.lit(1.0))))
    mean = F.col("__sx").cast("double") / n
    ok = F.col("n") >= 2
    return agg.select(
        *group_cols, F.col("n").cast("bigint").alias("n"),
        F.when(ok, F.round(gmd / 1e6, 6)).alias("gmd"),
        F.when(ok & (mean > F.lit(0.0)),
               F.round(gmd / mean, 6)).alias("relative_gmd"))


def rolling_correlation(df: DataFrame, t_col: str, x_col: str, y_col: str,
                        window: int = 7) -> DataFrame:
    """Trailing-window Pearson correlation between two aligned
    integer-valued series (x_t, y_t): the co-movement monitor for
    metric pairs (spend vs conversions, errors vs latency) whose
    relationship drifts over time.

    Inputs are BIGINT-quantized aligned series (one row per t).
    Exactness contract: the five cross-moments accumulate as exact
    decimal(38,0) CUMULATIVE sums and each trailing frame is the
    difference of two cumulative rows (the rolling_zscore lesson:
    O(1)/row instead of re-adding the frame, and exact decimals make
    the differences order-free); r is one fixed IEEE expression
    (round 6), degenerate windows NULL.

    Scale shape: the series is an AGGREGATED table (daily/hourly
    grid), so the ordered window runs over bucket cardinality — the
    roc_auc bounded-window contract."""
    big = "decimal(38,0)"
    x, y = F.col(x_col).cast(big), F.col(y_col).cast(big)
    base = df.select(F.col(t_col).alias("t"), x.alias("__x"),
                     y.alias("__y"),
                     (x * y).cast(big).alias("__xy"),
                     (x * x).cast(big).alias("__xx"),
                     (y * y).cast(big).alias("__yy"))
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow)
    wlag = Window.orderBy("t")
    cums = base.select(
        "t", "__x", "__y",
        *[F.sum(c).over(wcum).alias(f"__c{c[2:]}")
          for c in ("__x", "__y", "__xy", "__xx", "__yy")])
    lagged = cums.select(
        "t",
        *[(F.col(f"__c{k}")
           - F.coalesce(F.lag(f"__c{k}", window).over(wlag),
                        F.lit(0).cast(big))).alias(f"__w{k}")
          for k in ("x", "y", "xy", "xx", "yy")],
        F.least(F.row_number().over(wlag), F.lit(window)).alias("__n"))
    n = F.col("__n").cast("double")
    sx = F.col("__wx").cast("double")
    sy = F.col("__wy").cast("double")
    sxy = F.col("__wxy").cast("double")
    sxx = F.col("__wxx").cast("double")
    syy = F.col("__wyy").cast("double")
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    ok = (F.col("__n") >= 3) & (vx > F.lit(0.0)) & (vy > F.lit(0.0))
    return lagged.select(
        "t", F.col("__n").cast("bigint").alias("n_window"),
        F.when(ok, F.round(cov / F.sqrt(vx * vy), 6)).alias("r"))


def spearman_correlation(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Spearman rank correlation between two columns: Pearson over
    AVERAGE ranks, the monotonic-association test that is robust to
    outliers and nonlinearity (the corr() a drift monitor should use
    on heavy-tailed metrics).

    Rank computation never sorts rows: each column's average ranks
    come from its DISTINCT-VALUE table (group -> count -> cumulative
    count), so the only unpartitioned window runs over VALUE
    CARDINALITY, the roc_auc contract — quantize a heavy continuous
    column upstream.  Double-ranks 2*rank_avg = 2*(cum-c) + c + 1 stay
    exact integers (no .5 halves), the five moments accumulate as
    exact decimal(38,0), and rho is one fixed IEEE expression over the
    exact sums (round 6) — bit-stable across engines/partitionings.

    NULL handling is pairwise-complete: rows with NULL x OR NULL y are
    dropped BEFORE the rank tables are built, so ranks are computed
    over exactly the analyzed subset (not the full column).

    Scale shape: two distinct-value aggregations + two equi-joins back
    (AQE broadcasts the value tables), one final partial agg."""
    big = "decimal(38,0)"
    df = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())

    def _ranks(col: str, alias: str) -> DataFrame:
        grp = df.groupBy(F.col(col).alias("__v")).agg(
            F.count(F.lit(1)).alias("__c"))
        w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding,
                                              Window.currentRow)
        return grp.select(
            "__v",
            (F.lit(2) * (F.sum("__c").over(w) - F.col("__c"))
             + F.col("__c") + F.lit(1)).cast("bigint").alias(alias))

    rx = _ranks(x_col, "__drx")
    ry = _ranks(y_col, "__dry")
    j = (df.select(F.col(x_col).alias("__xv"), F.col(y_col).alias("__yv"))
         .join(rx, F.col("__xv") == rx["__v"]).drop("__v")
         .join(ry, F.col("__yv") == ry["__v"]).drop("__v"))
    drx, dry = F.col("__drx").cast(big), F.col("__dry").cast(big)
    agg = j.agg(F.count(F.lit(1)).alias("n"),
                F.sum(drx).alias("__sx"), F.sum(dry).alias("__sy"),
                F.sum((drx * dry).cast(big)).alias("__sxy"),
                F.sum((drx * drx).cast(big)).alias("__sxx"),
                F.sum((dry * dry).cast(big)).alias("__syy"))
    n = F.col("n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    ok = (F.col("n") >= 3) & (vx > F.lit(0.0)) & (vy > F.lit(0.0))
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.when(ok, F.round((n * sxy - sx * sy) / F.sqrt(vx * vy), 6))
        .alias("rho"))


def kendall_tau(df: DataFrame, key_col: str, x_col: str,
                y_col: str) -> DataFrame:
    """Kendall tau-b over a BOUNDED, pre-aggregated grid (e.g. the
    daily metric table): concordant/discordant pair counts with the
    tie-corrected denominator sqrt((n0-n1)(n0-n2)).

    The pairwise enumeration is O(n^2) BY CONTRACT — the caller must
    pass an aggregate whose cardinality is bounded by construction
    (calendar days, category grid), never raw rows; the small side is
    broadcast so the non-equi join plans as a nested-loop broadcast,
    not a shuffled cartesian.  All pair/tie counts are exact integers;
    tau_b is one IEEE expression (round 6).

    NULL handling is pairwise-complete (the spearman contract): rows
    with NULL x or y are dropped up front, so they inflate neither the
    n0 pair total nor the tie counts."""
    big = "decimal(38,0)"
    df = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    a = df.select(F.col(key_col).alias("__k1"), F.col(x_col).alias("__x1"),
                  F.col(y_col).alias("__y1"))
    b = df.select(F.col(key_col).alias("__k2"), F.col(x_col).alias("__x2"),
                  F.col(y_col).alias("__y2"))
    prod = ((F.col("__x1") - F.col("__x2")).cast(big)
            * (F.col("__y1") - F.col("__y2")).cast(big))
    pairs = a.join(F.broadcast(b), F.col("__k1") < F.col("__k2"))
    cd = pairs.agg(
        F.sum(F.when(prod > 0, 1).otherwise(0)).alias("__c"),
        F.sum(F.when(prod < 0, 1).otherwise(0)).alias("__d"))

    def _ties(col: str) -> DataFrame:
        g = df.groupBy(F.col(col).alias("__v")).agg(
            F.count(F.lit(1)).alias("__c"))
        t = (F.col("__c").cast(big) * (F.col("__c") - 1).cast(big)) / 2
        return g.agg(F.sum(t.cast(big)).alias("__t"),
                     F.sum("__c").alias("__n"))

    tx = _ties(x_col).select(F.col("__t").alias("__tx"),
                             F.col("__n").alias("__nn"))
    ty = _ties(y_col).select(F.col("__t").alias("__ty"))
    one = cd.crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty))
    n = F.col("__nn").cast(big)
    n0 = ((n * (F.col("__nn") - 1).cast(big)) / 2).cast(big)
    d1 = (n0 - F.col("__tx")).cast("double")
    d2 = (n0 - F.col("__ty")).cast("double")
    ok = (d1 > F.lit(0.0)) & (d2 > F.lit(0.0))
    return one.select(
        F.col("__nn").cast("bigint").alias("n"),
        F.col("__c").cast("bigint").alias("n_conc"),
        F.col("__d").cast("bigint").alias("n_disc"),
        F.when(ok, F.round(
            (F.col("__c").cast("double") - F.col("__d").cast("double"))
            / F.sqrt(d1 * d2), 6)).alias("tau_b"))


def weighted_median(df: DataFrame, value_col: str, weight_col: str,
                    group_cols: list[str]) -> DataFrame:
    """Per-group lower weighted median: the smallest value v whose
    cumulative weight reaches half the group total (2*cum >= total) —
    the robust center for weight-skewed measures (revenue-weighted
    quantity, token-weighted quality).

    The value column must be LOW-CARDINALITY by contract (integer
    grades, bucketed scores): the cumulative scan runs per group over
    the (group, value) AGGREGATE, never rows.  Weights accumulate as
    exact DECIMAL(18,2) so the half-total comparison is exact — no
    float cumsum ties.

    Scale shape: one partial-agg shuffle onto (group, value), then a
    value-cardinality-bounded window per group."""
    wdec = F.col(weight_col).cast("decimal(18,2)")
    g = df.groupBy(*group_cols, F.col(value_col).alias("__v")).agg(
        F.sum(wdec).alias("__w"))
    wc = Window.partitionBy(*group_cols).orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    cum = g.select(*group_cols, "__v",
                   F.sum("__w").over(wc).alias("__cw"),
                   F.sum("__w").over(wt).alias("__tw"))
    hit = cum.filter(F.col("__cw") * 2 >= F.col("__tw"))
    return (hit.groupBy(*group_cols)
            .agg(F.min("__v").alias("w_median"),
                 F.max(F.col("__tw")).alias("__t"))
            .select(*group_cols,
                    F.col("w_median").cast("bigint").alias("w_median"),
                    F.round(F.col("__t").cast("double"), 2)
                    .alias("total_weight")))


def wilson_interval(df: DataFrame, success_col: str,
                    group_cols: list[str], z: float = 1.96) -> DataFrame:
    """Per-group Wilson score interval for a binary rate: the CI that
    stays inside [0,1] and behaves at small n where the normal
    interval collapses — the right error bar for per-segment
    conversion dashboards.

    Exactness: n/s are exact integers; z*z is folded to a double
    literal once in Python so both engines parse the same decimal
    literal; lo/hi are fixed IEEE expressions (round 6).

    Scale shape: one partial-agg shuffle onto the group keys."""
    z2 = z * z
    s = F.col(success_col).cast("int")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"), F.sum(s).alias("s"))
    nd = F.col("n").cast("double")
    p = F.col("s").cast("double") / nd
    denom = F.lit(1.0) + F.lit(z2) / nd
    center = (p + F.lit(z2) / (F.lit(2.0) * nd)) / denom
    half = (F.lit(z) * F.sqrt(
        (p * (F.lit(1.0) - p) + F.lit(z2) / (F.lit(4.0) * nd)) / nd)) / denom
    ok = F.col("n") > 0
    return agg.select(
        *group_cols,
        F.col("n").cast("bigint").alias("n"),
        F.col("s").cast("bigint").alias("s"),
        F.when(ok, F.round(p, 6)).alias("rate"),
        F.when(ok, F.round(F.greatest(center - half, F.lit(0.0)), 6))
        .alias("wilson_lo"),
        F.when(ok, F.round(F.least(center + half, F.lit(1.0)), 6))
        .alias("wilson_hi"))


def mcnemar_test(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """McNemar's test for two PAIRED binary classifiers/gates on the
    same rows (e.g. two quality filters over one corpus): the
    discordant-pair chi-square (b-c)^2/(b+c) that asks whether the
    gates disagree systematically — the right test when both gates
    see the SAME documents, where a two-proportion z-test would
    double-count the shared variance.

    Exact integer cell counts; chi2 is one IEEE expression (round 6);
    no discordant pairs -> NULL.

    Scale shape: one scalar aggregate, no shuffle beyond the partial
    merge."""
    a = F.col(a_col).cast("boolean")
    b = F.col(b_col).cast("boolean")
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(a & b, 1).otherwise(0)).alias("n_both"),
        F.sum(F.when(a & ~b, 1).otherwise(0)).alias("n_a_only"),
        F.sum(F.when(~a & b, 1).otherwise(0)).alias("n_b_only"),
        F.sum(F.when(~a & ~b, 1).otherwise(0)).alias("n_neither"))
    d = (F.col("n_a_only").cast("double")
         - F.col("n_b_only").cast("double"))
    tot = (F.col("n_a_only").cast("double")
           + F.col("n_b_only").cast("double"))
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_both").cast("bigint").alias("n_both"),
        F.col("n_a_only").cast("bigint").alias("n_a_only"),
        F.col("n_b_only").cast("bigint").alias("n_b_only"),
        F.col("n_neither").cast("bigint").alias("n_neither"),
        F.when(tot > F.lit(0.0), F.round(d * d / tot, 6)).alias("chi2"))


def t_closeness(df: DataFrame, qi_cols: list[str],
                bucket_col: str) -> DataFrame:
    """t-closeness report per quasi-identifier class over an ORDERED
    sensitive attribute (pre-bucketed by the caller): t = the 1-D
    earth-mover distance between the class's bucket distribution and
    the global one, normalized by (m-1) — the disclosure metric that
    catches what k-anonymity and l-diversity miss (a class can be
    large and diverse yet skewed toward 'high salary').

    Every class is densified against the GLOBAL bucket grid (missing
    buckets count 0), so cumulative differences are comparable.
    Exactness: |cum_class*N - cum_global*n| accumulates as exact
    decimal(38,0) cross products; t is one IEEE division (round 6).
    Classes see only their own <= m-row partition in the window —
    bucket cardinality is bounded by contract (quantize upstream).

    Scale shape: two partial-agg shuffles (global buckets, class x
    bucket cells), one broadcast of the bounded bucket grid, one
    per-class window over <= m rows."""
    big = "decimal(38,0)"
    g = df.groupBy(F.col(bucket_col).alias("__b")).agg(
        F.count(F.lit(1)).alias("__g"))
    classes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("__n"))
    cells = df.groupBy(*qi_cols, F.col(bucket_col).alias("__b")).agg(
        F.count(F.lit(1)).alias("__c"))
    grid = classes.crossJoin(F.broadcast(g))
    dense = grid.join(cells, [*qi_cols, "__b"], "left") \
        .select(*qi_cols, "__b", "__n", "__g",
                F.coalesce(F.col("__c"), F.lit(0)).alias("__c"))
    wc = Window.partitionBy(*qi_cols).orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy(*qi_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    cum = dense.select(
        *qi_cols, "__n",
        F.sum("__c").over(wc).alias("__cc"),
        F.sum("__g").over(wc).alias("__cg"),
        F.sum("__g").over(wt).alias("__tot"),
        F.count(F.lit(1)).over(wt).alias("__m"))
    diff = F.abs(F.col("__cc").cast(big) * F.col("__tot").cast(big)
                 - F.col("__cg").cast(big) * F.col("__n").cast(big))
    agg = cum.groupBy(*qi_cols).agg(
        F.max("__n").alias("n"), F.max("__tot").alias("__gt"),
        F.max("__m").alias("__mt"),
        F.sum(diff.cast(big)).alias("__sd"))
    t = (F.col("__sd").cast("double")
         / (F.col("n").cast("double") * F.col("__gt").cast("double")
            * (F.col("__mt").cast("double") - F.lit(1.0))))
    return agg.select(
        *qi_cols, F.col("n").cast("bigint").alias("n"),
        F.when(F.col("__mt") > 1, F.round(t, 6)).alias("t_emd"))


def eb_beta_binomial(df: DataFrame, success_col: str,
                     group_cols: list[str]) -> DataFrame:
    """Empirical-Bayes shrunk per-group rates under a beta-binomial
    prior fitted by method of moments across groups: small groups pull
    hard toward the grand mean, large groups keep their own rate —
    the ranking-safe estimator for per-source/per-segment quality
    rates (raw rates over-rank tiny sources).

    Determinism: per-group rates quantize to exact ppm integers
    ((s*1e6) div n) before the cross-group moment sums, so the fitted
    prior is identical in any partitioning; alpha/beta and the shrunk
    rate are fixed IEEE expressions over those exact sums.  A
    degenerate prior (fewer than 2 groups, zero variance, or
    out-of-range mean) falls back to the uniform Beta(1,1).

    Scale shape: one partial-agg shuffle onto the group keys, a
    1-row prior broadcast, and a final projection.  The ppm quantizer
    is exact while s < ~9e12 rows per group."""
    big = "decimal(38,0)"
    s = F.col(success_col).cast("int")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"), F.sum(s).alias("s"))
    agg = agg.select(*group_cols, "n", "s",
                     F.expr("(s * 1000000) div n").alias("__rm"))
    pri = agg.agg(
        F.count(F.lit(1)).alias("__g"),
        F.sum(F.col("__rm").cast(big)).alias("__sr"),
        F.sum((F.col("__rm").cast(big) * F.col("__rm").cast(big))
              .cast(big)).alias("__s2"))
    gd = F.col("__g").cast("double")
    srd = F.col("__sr").cast("double")
    s2d = F.col("__s2").cast("double")
    m = srd / gd / F.lit(1e6)
    v = (gd * s2d - srd * srd) / (gd * (gd - F.lit(1.0))) / F.lit(1e12)
    c = m * (F.lit(1.0) - m) / v - F.lit(1.0)
    ok = ((F.col("__g") >= 2) & (v > F.lit(0.0)) & (c > F.lit(0.0))
          & (m > F.lit(0.0)) & (m < F.lit(1.0)))
    prior = pri.select(
        F.when(ok, m * c).otherwise(F.lit(1.0)).alias("__alpha"),
        F.when(ok, (F.lit(1.0) - m) * c).otherwise(F.lit(1.0))
        .alias("__beta"))
    one = agg.crossJoin(F.broadcast(prior))
    nd, sd = F.col("n").cast("double"), F.col("s").cast("double")
    shrunk = (sd + F.col("__alpha")) / (nd + F.col("__alpha")
                                        + F.col("__beta"))
    return one.select(
        *group_cols,
        F.col("n").cast("bigint").alias("n"),
        F.col("s").cast("bigint").alias("s"),
        F.round(sd / nd, 6).alias("rate"),
        F.round(F.col("__alpha"), 6).alias("alpha"),
        F.round(F.col("__beta"), 6).alias("beta"),
        F.round(shrunk, 6).alias("shrunk_rate"))


def trend_test(df: DataFrame, score_col: str,
               success_col: str) -> DataFrame:
    """Cochran-Armitage trend test: is a binary success rate
    monotonically associated with an ORDERED integer score (dose,
    bucket, tier)?  z = T / sqrt(Var) with T = sum w*s - (sum w*n)*S/N
    and Var = pbar*(1-pbar)*(sum w^2*n - (sum w*n)^2/N) — the test a
    two-group z-test can't express when the exposure is graded.

    Exactness: all five moment sums accumulate as exact
    decimal(38,0) integers (scores must be integers by contract); z
    is one fixed IEEE expression over the exact sums (round 6).
    Degenerate inputs (all-success, all-failure, or zero score
    variance) surface NULL.

    Scale shape: one partial-agg shuffle onto the score, then a
    score-cardinality-bounded final aggregate."""
    big = "decimal(38,0)"
    s = F.col(success_col).cast("int")
    g = df.groupBy(F.col(score_col).alias("__w")).agg(
        F.count(F.lit(1)).alias("__n"), F.sum(s).alias("__s"))
    w = F.col("__w").cast(big)
    agg = g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("__n").alias("__nt"), F.sum("__s").alias("__st"),
        F.sum((w * F.col("__n").cast(big)).cast(big)).alias("__wn"),
        F.sum((w * F.col("__s").cast(big)).cast(big)).alias("__ws"),
        F.sum((w * w * F.col("__n").cast(big)).cast(big)).alias("__wwn"))
    nd = F.col("__nt").cast("double")
    sd = F.col("__st").cast("double")
    wn = F.col("__wn").cast("double")
    ws = F.col("__ws").cast("double")
    wwn = F.col("__wwn").cast("double")
    pbar = sd / nd
    t = ws - wn * pbar
    var = pbar * (F.lit(1.0) - pbar) * (wwn - wn * wn / nd)
    ok = (var > F.lit(0.0))
    return agg.select(
        F.col("n_groups").cast("bigint").alias("n_groups"),
        F.col("__nt").cast("bigint").alias("n"),
        F.col("__st").cast("bigint").alias("s"),
        F.when(ok, F.round(t / F.sqrt(var), 6)).alias("z"))


def rmst(df: DataFrame, group_cols: list[str], duration_col: str,
         event_col: str, tau: int) -> DataFrame:
    """Restricted mean survival time per group: the area under the
    Kaplan-Meier curve up to horizon `tau` — 'average event-free days
    in the first tau days', the single-number survival summary that
    stays meaningful under censoring where a plain mean of durations
    is biased.

    Composes kaplan_meier (same exactness contract: integer risk
    sets, 1e9-quantized log-products).  Each curve segment's area
    S(t_i) * (min(t_{i+1}, tau) - t_i) quantizes to exact 1e6 micros
    BEFORE the per-group sum (S is the already-round-6 curve value,
    so both engines integrate the identical step function); the head
    segment [0, t_1) integrates survival 1 exactly.

    Every input group surfaces: a group with NO events (all subjects
    censored) has a flat S(t) = 1 curve, so its area to tau IS tau —
    it comes back with n_times = 0 and rmst = tau rather than
    vanishing (kaplan_meier's table is event-times-only, so such a
    group has no curve rows to integrate).

    Scale shape: kaplan_meier's one partial-agg shuffle + per-group
    windows; the integration is one more per-group window + agg over
    the bounded event-time grid, plus one group-cardinality distinct
    + broadcast-able left join to surface event-free groups."""
    km = kaplan_meier(df, group_cols, duration_col, event_col)
    w = Window.partitionBy(*group_cols).orderBy("t")
    seg = km.select(
        *group_cols, "t", "survival",
        F.lead("t").over(w).alias("__tn"),
        F.row_number().over(w).alias("__rn"))
    t0 = F.least(F.col("t"), F.lit(tau))
    t1 = F.least(F.coalesce(F.col("__tn"), F.lit(tau)), F.lit(tau))
    contrib = F.floor(F.col("survival") * (t1 - t0).cast("double")
                      * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    head = F.when(F.col("__rn") == 1,
                  F.least(F.col("t"), F.lit(tau)).cast("bigint")
                  * F.lit(1000000)).otherwise(F.lit(0))
    agg = seg.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_times"),
        F.sum(contrib + head).alias("__q"))
    groups = df.select(*group_cols).distinct()
    return (groups.join(agg, group_cols, "left")
            .select(*group_cols,
                    F.coalesce(F.col("n_times"), F.lit(0))
                    .cast("bigint").alias("n_times"),
                    F.coalesce(
                        F.round(F.col("__q").cast("double") / F.lit(1e6), 6),
                        F.lit(float(tau))).alias("rmst")))


def partial_correlation(df: DataFrame, x_col: str, y_col: str,
                        z_col: str) -> DataFrame:
    """Partial correlation r_xy.z: the correlation between x and y
    with the confounder z regressed out of both —
    (r_xy - r_xz*r_yz) / sqrt((1-r_xz^2)(1-r_yz^2)).  The
    first-order causal sanity check before reading anything into a
    raw correlation (daily clicks and purchases both track traffic).

    Inputs must be integer-valued by contract (counts, micros): the
    nine moment sums accumulate as exact decimal(38,0); every r and
    the partial are fixed IEEE expressions over the exact sums
    (round 6).  Degenerate variance or |r|=1 in a confounder leg
    surfaces NULL.

    NULL handling is listwise-complete: rows with NULL in any of
    x/y/z are dropped up front, so n and every moment sum cover the
    same analyzed subset (a NULL row must not inflate n while being
    skipped by the sums).

    Scale shape: ONE scalar aggregate pass — no joins, no windows."""
    big = "decimal(38,0)"
    df = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
                   & F.col(z_col).isNotNull())
    x = F.col(x_col).cast(big)
    y = F.col(y_col).cast(big)
    z = F.col(z_col).cast(big)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("__sx"), F.sum(y).alias("__sy"),
        F.sum(z).alias("__sz"),
        F.sum((x * y).cast(big)).alias("__sxy"),
        F.sum((x * z).cast(big)).alias("__sxz"),
        F.sum((y * z).cast(big)).alias("__syz"),
        F.sum((x * x).cast(big)).alias("__sxx"),
        F.sum((y * y).cast(big)).alias("__syy"),
        F.sum((z * z).cast(big)).alias("__szz"))
    n = F.col("n").cast("double")

    def s(c):
        return F.col(c).cast("double")

    vx = n * s("__sxx") - s("__sx") * s("__sx")
    vy = n * s("__syy") - s("__sy") * s("__sy")
    vz = n * s("__szz") - s("__sz") * s("__sz")
    cxy = n * s("__sxy") - s("__sx") * s("__sy")
    cxz = n * s("__sxz") - s("__sx") * s("__sz")
    cyz = n * s("__syz") - s("__sy") * s("__sz")
    rxy = cxy / F.sqrt(vx * vy)
    rxz = cxz / F.sqrt(vx * vz)
    ryz = cyz / F.sqrt(vy * vz)
    den = (F.lit(1.0) - rxz * rxz) * (F.lit(1.0) - ryz * ryz)
    ok = ((F.col("n") >= 3) & (vx > F.lit(0.0)) & (vy > F.lit(0.0))
          & (vz > F.lit(0.0)))
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.when(ok, F.round(rxy, 6)).alias("r_xy"),
        F.when(ok, F.round(rxz, 6)).alias("r_xz"),
        F.when(ok, F.round(ryz, 6)).alias("r_yz"),
        F.when(ok & (den > F.lit(0.0)),
               F.round((rxy - rxz * ryz) / F.sqrt(den), 6))
        .alias("partial_r"))


def pairwise_mean_diffs(df: DataFrame, group_col: str,
                        xq_col: str) -> DataFrame:
    """All pairwise group-mean comparisons with Welch standard
    errors: for every group pair (a < b), the mean difference and
    z = diff / sqrt(va/na + vb/nb) — the post-hoc readout after an
    omnibus test says 'something differs', over a BOUNDED group
    grid.

    Inputs are caller-quantized integer micros (the exact_variance
    contract): per-group moment sums are exact decimal(38,0); means,
    variances, and z are fixed IEEE expressions (round 6).  The
    group-pair join is |groups|^2 BY CONTRACT (bounded categories),
    broadcast nested-loop, never a shuffled cartesian.

    Scale shape: one partial-agg shuffle onto the group key, then the
    bounded pair grid."""
    big = "decimal(38,0)"
    xq = F.col(xq_col).cast(big)
    g = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(xq).alias("__s"),
        F.sum((xq * xq).cast(big)).alias("__s2"))
    a = g.select(F.col("__g").alias("g_a"), F.col("__n").alias("__na"),
                 F.col("__s").alias("__sa"), F.col("__s2").alias("__s2a"))
    b = g.select(F.col("__g").alias("g_b"), F.col("__n").alias("__nb"),
                 F.col("__s").alias("__sb"), F.col("__s2").alias("__s2b"))
    p = a.join(F.broadcast(b), F.col("g_a") < F.col("g_b"))

    def moments(n, s, s2):
        nd = F.col(n).cast("double")
        mean = F.col(s).cast("double") / nd / F.lit(1e6)
        var = ((nd * F.col(s2).cast("double")
                - F.col(s).cast("double") * F.col(s).cast("double"))
               / (nd * (nd - F.lit(1.0))) / F.lit(1e12))
        return nd, mean, var

    na, ma, va = moments("__na", "__sa", "__s2a")
    nb, mb, vb = moments("__nb", "__sb", "__s2b")
    se2 = va / na + vb / nb
    ok = (F.col("__na") >= 2) & (F.col("__nb") >= 2) & (se2 > F.lit(0.0))
    return p.select(
        "g_a", "g_b",
        F.col("__na").cast("bigint").alias("n_a"),
        F.col("__nb").cast("bigint").alias("n_b"),
        F.round(ma - mb, 6).alias("mean_diff"),
        F.when(ok, F.round((ma - mb) / F.sqrt(se2), 6)).alias("z"))


def brier_decomposition(df: DataFrame, score_col: str, label_col: str,
                        bins: int = 10) -> DataFrame:
    """Murphy decomposition of the Brier score: raw Brier plus the
    binned RELIABILITY (calibration error), RESOLUTION (how much the
    forecast separates outcomes), and UNCERTAINTY (base-rate
    variance) — the one-row verdict on whether a filter model's
    scores are trustworthy probabilities, mis-calibrated, or just
    uninformative.

    Exactness: the per-row squared error and each bin's REL/RES
    contribution quantize to 1e12 integers BEFORE their sums, so
    every term is partition-order-free; bin assignment and the bin
    means follow calibration_bins exactly.

    Scale shape: one projection + one <=bins partial agg + a 1-row
    totals broadcast."""
    big = "decimal(38,0)"
    s = F.col(score_col)
    y = F.col(label_col).cast("int")
    bin_ = F.least(F.floor(s * bins).cast("int"), F.lit(bins - 1))
    sq = F.floor(s * 1e6 + F.lit(0.5)).cast("bigint")
    bq = F.floor((s - y.cast("double")) * (s - y.cast("double"))
                 * F.lit(1e12) + F.lit(0.5)).cast("bigint")
    base = df.select(bin_.alias("__b"), sq.alias("__sq"),
                     y.alias("__y"), bq.alias("__bq"))
    per_bin = base.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__sq").alias("__ss"),
        F.sum("__y").alias("__pos"),
        F.sum(F.col("__bq").cast(big)).alias("__bsum"))
    tot = per_bin.agg(F.sum("__n").alias("__nt"),
                      F.sum("__pos").alias("__pt"))
    j = per_bin.crossJoin(F.broadcast(tot))
    nd = F.col("__n").cast("double")
    f = F.col("__ss").cast("double") / 1e6 / nd
    o = F.col("__pos").cast("double") / nd
    obar = F.col("__pt").cast("double") / F.col("__nt").cast("double")
    relq = F.floor(nd * (f - o) * (f - o) * F.lit(1e12)
                   + F.lit(0.5)).cast("bigint")
    resq = F.floor(nd * (o - obar) * (o - obar) * F.lit(1e12)
                   + F.lit(0.5)).cast("bigint")
    agg = j.agg(F.max("__nt").alias("n"), F.max("__pt").alias("__p"),
                F.sum(F.col("__bsum")).alias("__bs"),
                F.sum(relq).alias("__rel"), F.sum(resq).alias("__res"))
    ntd = F.col("n").cast("double")
    ob = F.col("__p").cast("double") / ntd
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("__bs").cast("double") / 1e12 / ntd, 6)
        .alias("brier"),
        F.round(F.col("__rel").cast("double") / 1e12 / ntd, 6)
        .alias("reliability"),
        F.round(F.col("__res").cast("double") / 1e12 / ntd, 6)
        .alias("resolution"),
        F.round(ob * (F.lit(1.0) - ob), 6).alias("uncertainty"))


def neyman_allocation(df: DataFrame, stratum_col: str, xq_col: str,
                      budget: int = 10000) -> DataFrame:
    """Neyman sample allocation: split a sampling `budget` across
    strata proportionally to n_h * s_h (size times standard
    deviation) — the variance-minimizing design for a stratified
    estimate, vs proportional allocation that oversamples flat
    strata.

    Inputs are caller-quantized integer micros (the exact_variance
    contract).  Each stratum's n*s weight quantizes to 1e6 integers
    before the cross-strata total, so weights are order-free; the
    final allocation floor(budget * w/W) is a fixed IEEE expression
    (the floor may leave a few units unassigned — by design, no
    largest-remainder pass).

    Scale shape: one partial-agg shuffle onto the stratum key + a
    1-row total broadcast."""
    big = "decimal(38,0)"
    xq = F.col(xq_col).cast(big)
    g = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("__n"), F.sum(xq).alias("__s"),
        F.sum((xq * xq).cast(big)).alias("__s2"))
    nd = F.col("__n").cast("double")
    var = ((nd * F.col("__s2").cast("double")
            - F.col("__s").cast("double") * F.col("__s").cast("double"))
           / (nd * (nd - F.lit(1.0))) / F.lit(1e12))
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    wq = F.when(F.col("__n") >= 2,
                F.floor(nd * sd * F.lit(1e6) + F.lit(0.5))
                .cast("bigint")).otherwise(F.lit(0))
    g2 = g.select("stratum", "__n", wq.alias("__wq"),
                  F.round(sd, 6).alias("stddev"))
    tot = g2.agg(F.sum("__wq").alias("__wt"))
    j = g2.crossJoin(F.broadcast(tot))
    alloc = F.floor(F.lit(float(budget))
                    * (F.col("__wq").cast("double")
                       / F.col("__wt").cast("double"))).cast("bigint")
    return j.select(
        "stratum", F.col("__n").cast("bigint").alias("n"), "stddev",
        F.round(F.col("__wq").cast("double")
                / F.col("__wt").cast("double"), 6).alias("weight"),
        F.when(F.col("__wt") > 0, alloc).otherwise(F.lit(0))
        .alias("alloc"))


def runs_test(df: DataFrame, t_col: str, y_col: str) -> DataFrame:
    """Wald-Wolfowitz runs test over a BOUNDED time grid: are the
    up/down moves of a series random, or do they streak (momentum) /
    alternate (mean reversion)?  z = (R - E[R]) / sqrt(Var[R]) with
    R the observed run count over the sign sequence of consecutive
    differences (ties dropped).

    Exact integer run/sign counts from lag windows over the
    aggregate grid (the growth_curve contract); z is one fixed IEEE
    expression (round 6); degenerate sequences (all one sign, < 2
    moves) surface NULL."""
    w = Window.orderBy(t_col)
    base = df.select(F.col(t_col).alias("t"), F.col(y_col).alias("__y"),
                     F.lag(y_col).over(w).alias("__p"))
    signs = (base.filter(F.col("__p").isNotNull()
                         & (F.col("__y") != F.col("__p")))
             .select("t", (F.col("__y") > F.col("__p")).cast("int")
                     .alias("__s")))
    w2 = Window.orderBy("t")
    runs = signs.select(
        "__s",
        F.when(F.lag("__s").over(w2).isNull()
               | (F.lag("__s").over(w2) != F.col("__s")), 1)
        .otherwise(0).alias("__new"))
    agg = runs.agg(
        F.sum("__s").alias("n_up"),
        F.sum(F.lit(1) - F.col("__s")).alias("n_down"),
        F.sum("__new").alias("n_runs"))
    n1 = F.col("n_up").cast("double")
    n2 = F.col("n_down").cast("double")
    r = F.col("n_runs").cast("double")
    n = n1 + n2
    e = F.lit(2.0) * n1 * n2 / n + F.lit(1.0)
    v = (F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - n1 - n2)
         / (n * n * (n - F.lit(1.0))))
    ok = (F.col("n_up") > 0) & (F.col("n_down") > 0) & (v > F.lit(0.0))
    return agg.select(
        F.col("n_up").cast("bigint").alias("n_up"),
        F.col("n_down").cast("bigint").alias("n_down"),
        F.col("n_runs").cast("bigint").alias("n_runs"),
        F.when(ok, F.round((r - e) / F.sqrt(v), 6)).alias("z"))


def theil_u(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Theil's uncertainty coefficient U(x|y) = MI(x,y) / H(x): the
    share of x's entropy explained by knowing y — the normalized,
    asymmetric association readout that chi-square and raw MI leave
    unscaled (1 = y determines x, 0 = independent).

    Exact integer cell counts; every entropy/MI term quantizes to
    1e12 integers before its sum (the markov_entropy contract); the
    final ratio is one IEEE division (round 6).

    Scale shape: one (x, y) partial agg (cells bounded by category
    cardinality), two marginal re-aggregations, a 1-row total
    broadcast."""
    big = "decimal(38,0)"
    cells = df.groupBy(F.col(x_col).alias("__x"),
                       F.col(y_col).alias("__y")).agg(
        F.count(F.lit(1)).alias("__c"))
    mx = cells.groupBy("__x").agg(F.sum("__c").alias("__cx"))
    my = cells.groupBy("__y").agg(F.sum("__c").alias("__cy"))
    tot = cells.agg(F.sum("__c").alias("__n"))
    j = (cells.join(F.broadcast(mx), "__x")
         .join(F.broadcast(my), "__y")
         .crossJoin(F.broadcast(tot)))
    nd = F.col("__n").cast("double")
    c = F.col("__c").cast("double")
    cx = F.col("__cx").cast("double")
    cy = F.col("__cy").cast("double")
    miq = F.floor(c / nd * (F.log(c * nd / (cx * cy))
                            / F.log(F.lit(2.0)))
                  * F.lit(1e12) + F.lit(0.5)).cast("bigint")
    hx = (mx.crossJoin(F.broadcast(tot))
          .agg(F.sum(F.floor(
              F.col("__cx").cast("double") / F.col("__n").cast("double")
              * (F.log(F.col("__n").cast("double")
                       / F.col("__cx").cast("double"))
                 / F.log(F.lit(2.0))) * F.lit(1e12) + F.lit(0.5))
              .cast("bigint")).alias("__hx")))
    mi = j.agg(F.max("__n").alias("n"),
               F.sum(miq.cast(big)).alias("__mi"))
    one = mi.crossJoin(F.broadcast(hx))
    hxd = F.col("__hx").cast("double") / 1e12
    mid = F.col("__mi").cast("double") / 1e12
    return one.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(hxd, 6).alias("h_x"),
        F.round(mid, 6).alias("mi_bits"),
        F.when(F.col("__hx") > 0, F.round(mid / hxd, 6))
        .alias("theil_u"))


#: O'Brien-Fleming-style group-sequential z bounds for up to 5 interim
#: looks (two-sided alpha ~ 0.05; standard published table, e.g.
#: Jennison & Turnbull ch. 2).  Looks beyond the 5th fall back to 2.0.
OBF_BOUNDS = [4.877, 3.357, 2.680, 2.290, 2.031]


def sequential_ztest(df: DataFrame, look_col: str, cohort_col: str,
                     success_col: str,
                     bounds: list[float] | None = None) -> DataFrame:
    """Group-sequential A/B monitoring: per interim look (e.g. week),
    the CUMULATIVE two-proportion z between cohorts, compared to an
    O'Brien-Fleming-style spending bound — peeking made legitimate:
    early looks need overwhelming evidence, the final look nearly the
    fixed-sample threshold.

    Exact cumulative integer counts from windows over the bounded
    look grid (the growth_curve contract); z is the pooled
    two-proportion expression (round 6); `crossed` compares |z| to
    the look's bound.

    Scale shape: one partial agg onto (look), then a bounded-grid
    cumulative window."""
    bs = bounds or OBF_BOUNDS
    c = F.col(cohort_col).cast("boolean")
    s = F.col(success_col).cast("int")
    per = df.groupBy(F.col(look_col).alias("look")).agg(
        F.sum(F.when(c, 1).otherwise(0)).alias("__n1"),
        F.sum(F.when(c, s).otherwise(0)).alias("__s1"),
        F.sum(F.when(~c, 1).otherwise(0)).alias("__n2"),
        F.sum(F.when(~c, s).otherwise(0)).alias("__s2"))
    w = Window.orderBy("look").rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow)
    cum = per.select(
        "look", F.row_number().over(Window.orderBy("look")).alias("__k"),
        F.sum("__n1").over(w).alias("n_1"),
        F.sum("__s1").over(w).alias("s_1"),
        F.sum("__n2").over(w).alias("n_2"),
        F.sum("__s2").over(w).alias("s_2"))
    n1, n2 = F.col("n_1").cast("double"), F.col("n_2").cast("double")
    s1, s2 = F.col("s_1").cast("double"), F.col("s_2").cast("double")
    p1, p2 = s1 / n1, s2 / n2
    p = (s1 + s2) / (n1 + n2)
    se2 = p * (F.lit(1.0) - p) * (F.lit(1.0) / n1 + F.lit(1.0) / n2)
    z = F.when((F.col("n_1") > 0) & (F.col("n_2") > 0)
               & (se2 > F.lit(0.0)),
               F.round((p1 - p2) / F.sqrt(se2), 6))
    bound = F.element_at(
        F.array(*[F.lit(b) for b in bs]),
        F.least(F.col("__k"), F.lit(len(bs))).cast("int"))
    return cum.select(
        F.col("look").cast("bigint").alias("look"),
        F.col("__k").cast("bigint").alias("look_no"),
        F.col("n_1").cast("bigint").alias("n_1"),
        F.col("n_2").cast("bigint").alias("n_2"),
        z.alias("z"), F.round(bound, 6).alias("bound"),
        F.when(z.isNotNull(), F.abs(z) > bound).otherwise(F.lit(False))
        .alias("crossed"))


def rdd_estimate(df: DataFrame, x_col: str, y_col: str, cutoff: int,
                 bandwidth: int) -> DataFrame:
    """Sharp regression-discontinuity estimate: fit one exact OLS line
    per side of `cutoff` within +-`bandwidth` of the (integer-valued)
    running variable, and report the jump between the two side
    predictions AT the cutoff — the causal-effect readout when
    treatment switches deterministically at a threshold.

    Exactness: per-side moment sums are exact decimal(38,0)
    (exact_regression contract); slopes, intercepts, the two cutoff
    predictions, and the jump are fixed IEEE expressions (round 6).
    Degenerate sides (n < 3 or zero x variance) surface NULL.

    Scale shape: one filtered scan + a 2-group partial agg."""
    big = "decimal(38,0)"
    x = F.col(x_col).cast(big)
    y = F.col(y_col).cast(big)
    side = (F.col(x_col) >= cutoff).alias("__right")
    base = df.filter((F.col(x_col) >= cutoff - bandwidth)
                     & (F.col(x_col) <= cutoff + bandwidth))
    g = base.groupBy(side).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(x).alias("__sx"), F.sum(y).alias("__sy"),
        F.sum((x * y).cast(big)).alias("__sxy"),
        F.sum((x * x).cast(big)).alias("__sxx"))
    nd = F.col("__n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxy, sxx = F.col("__sxy").cast("double"), F.col("__sxx").cast("double")
    vx = nd * sxx - sx * sx
    slope = F.when((F.col("__n") >= 3) & (vx > F.lit(0.0)),
                   (nd * sxy - sx * sy) / vx)
    intercept = sy / nd - slope * (sx / nd)
    yhat = intercept + slope * F.lit(float(cutoff))
    per_side = g.select("__right", "__n", yhat.alias("__yhat"))
    # Single conditional aggregate (not two filtered frames crossJoined)
    # so a side with NO rows inside the bandwidth still yields the one
    # report row with NULL yhat/jump instead of an empty result.
    one = per_side.agg(
        F.coalesce(F.sum(F.when(~F.col("__right"), F.col("__n"))),
                   F.lit(0)).alias("n_left"),
        F.min(F.when(~F.col("__right"), F.col("__yhat"))).alias("__yl"),
        F.coalesce(F.sum(F.when(F.col("__right"), F.col("__n"))),
                   F.lit(0)).alias("n_right"),
        F.min(F.when(F.col("__right"), F.col("__yhat"))).alias("__yr"))
    return one.select(
        F.col("n_left").cast("bigint").alias("n_left"),
        F.col("n_right").cast("bigint").alias("n_right"),
        F.round(F.col("__yl"), 6).alias("yhat_left"),
        F.round(F.col("__yr"), 6).alias("yhat_right"),
        F.round(F.col("__yr") - F.col("__yl"), 6).alias("jump"))


def chi2_residuals(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Per-cell chi-square diagnostics for a contingency table: the
    observed count, expected count under independence, the
    standardized residual (o - e)/sqrt(e), and the cell's chi2
    contribution — WHICH cells drive a significant omnibus chi2, not
    just that one exists.

    Exact integer margins; expected/residual are fixed IEEE
    expressions over the exact counts (round 6).

    Scale shape: one (a, b) partial agg + two broadcast marginal
    joins + a 1-row total."""
    cells = df.groupBy(F.col(a_col).alias("a"),
                       F.col(b_col).alias("b")).agg(
        F.count(F.lit(1)).alias("n_obs"))
    ma = cells.groupBy("a").agg(F.sum("n_obs").alias("__ca"))
    mb = cells.groupBy("b").agg(F.sum("n_obs").alias("__cb"))
    tot = cells.agg(F.sum("n_obs").alias("__n"))
    j = (cells.join(F.broadcast(ma), "a").join(F.broadcast(mb), "b")
         .crossJoin(F.broadcast(tot)))
    e = (F.col("__ca").cast("double") * F.col("__cb").cast("double")
         / F.col("__n").cast("double"))
    o = F.col("n_obs").cast("double")
    return j.select(
        "a", "b", F.col("n_obs").cast("bigint").alias("n_obs"),
        F.round(e, 6).alias("expected"),
        F.when(e > F.lit(0.0), F.round((o - e) / F.sqrt(e), 6))
        .alias("std_residual"),
        F.when(e > F.lit(0.0), F.round((o - e) * (o - e) / e, 6))
        .alias("chi2_cell"))


def power_two_proportion(df: DataFrame, group_cols: list[str],
                         success_col: str, rel_lift: float = 0.2,
                         z_alpha: float = 1.959964,
                         z_beta: float = 0.841621) -> DataFrame:
    """Sample-size calculator seeded by OBSERVED baselines: per group,
    the n-per-arm needed to detect a `rel_lift` relative improvement
    over the group's observed rate at the given alpha/power z values
    — the pre-experiment readout that stops underpowered A/B launches.

    n = (za*sqrt(2*pbar*qbar) + zb*sqrt(p1*q1 + p2*q2))^2 / (p2-p1)^2
    with p2 = min(p1*(1+lift), 1).  Exact integer counts; the formula
    is one fixed IEEE expression; ceil is identical on both engines
    for positive doubles.  Degenerate baselines (p1 = 0 or p2 = p1)
    surface NULL.

    Scale shape: one partial-agg shuffle onto the group keys."""
    s = F.col(success_col).cast("int")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"), F.sum(s).alias("s"))
    p1 = F.col("s").cast("double") / F.col("n").cast("double")
    p2 = F.least(p1 * F.lit(1.0 + rel_lift), F.lit(1.0))
    pbar = (p1 + p2) / F.lit(2.0)
    num = (F.lit(z_alpha)
           * F.sqrt(F.lit(2.0) * pbar * (F.lit(1.0) - pbar))
           + F.lit(z_beta)
           * F.sqrt(p1 * (F.lit(1.0) - p1) + p2 * (F.lit(1.0) - p2)))
    ok = (p1 > F.lit(0.0)) & (p2 > p1)
    n_req = F.ceil(num * num / ((p2 - p1) * (p2 - p1))).cast("bigint")
    return agg.select(
        *group_cols,
        F.col("n").cast("bigint").alias("n"),
        F.round(p1, 6).alias("rate"),
        F.when(ok, F.round(p2, 6)).alias("target_rate"),
        F.when(ok, n_req).alias("n_per_arm"))


def lorenz_curve(df: DataFrame, xq_col: str, buckets: int = 20,
                 lo: int = 0, hi: int = 1) -> DataFrame:
    """Lorenz curve over a BOUNDED value grid: cumulative population
    share vs cumulative value share per equal-width bucket — the
    curve behind the Gini number, showing WHERE the concentration
    lives (one whale vs a broad head).

    Values are caller-quantized integers clamped to [lo, hi] and
    bucketed equal-width (the histogram contract).  Counts and value
    sums are exact (decimal); shares are IEEE divisions (round 6);
    the cumulative scan runs over the <= `buckets` grid.

    Scale shape: one projection + one bounded partial agg + a
    bounded-grid window."""
    big = "decimal(38,0)"
    x = F.greatest(F.least(F.col(xq_col), F.lit(hi)), F.lit(lo))
    b = F.least(F.expr(f"(({xq_col} - {lo}) * {int(buckets)})"
                       f" div ({hi} - {lo} + 1)"),
                F.lit(buckets - 1))
    base = df.select(F.greatest(b, F.lit(0)).alias("__b"),
                     x.cast(big).alias("__x"))
    g = base.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"),
                                F.sum("__x").alias("__s"))
    w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    wt = Window.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)
    cum = g.select(
        "__b",
        F.sum("__n").over(w).alias("__cn"),
        F.sum("__s").over(w).alias("__cs"),
        F.sum("__n").over(wt).alias("__tn"),
        F.sum("__s").over(wt).alias("__ts"))
    return cum.select(
        F.col("__b").cast("bigint").alias("bucket"),
        F.col("__cn").cast("bigint").alias("cum_count"),
        F.round(F.col("__cn").cast("double")
                / F.col("__tn").cast("double"), 6).alias("pop_share"),
        F.when(F.col("__ts").cast("double") > 0.0,
               F.round(F.col("__cs").cast("double")
                       / F.col("__ts").cast("double"), 6))
        .alias("value_share"))
