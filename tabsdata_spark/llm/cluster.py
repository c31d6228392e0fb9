"""Distributed clustering over embedding columns.

`kmeans` is Lloyd's algorithm expressed Spark-first: the corpus never
leaves the executors — each iteration is one broadcast of the (k x dim)
centroid model out, one narrow assignment pass, and one elementwise-mean
aggregation back.  Only the centroid matrix (k*dim doubles, a few KB)
round-trips through the driver, which is the same contract as any
broadcast-model scoring step; corpus size is irrelevant to driver memory.

Determinism contract (drives the DuckDB oracle in queries.py):
- centroid init = the k rows with the smallest ids (no RNG);
- distances and updated centroid elements are rounded to 6 decimals each
  iteration, so independent engines computing the same math in different
  association orders stay bit-aligned;
- argmin ties break on the smaller centroid id.

Reference surface: the tabsdata reference has no clustering operator —
this extends the training-data suite (semantic curation / SemDeDup-style
cluster-then-prune needs cluster assignments first).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _sq_dist(a: Column, b: Column) -> Column:
    """Squared euclidean distance between two array columns, computed in
    float64 regardless of storage type."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double")),
        F.lit(0.0),
        lambda acc, d: acc + d * d,
    )


def kmeans(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means; returns (id_col, cluster, dist) assignments.

    `cluster` is the seed id of the centroid (stable across iterations —
    clusters keep their identity as the centroid moves).  Each iteration:

    1. assign: argmin over the broadcast centroid array — a literal
       (k x dim) array expression, evaluated JVM-side per row; no shuffle.
    2. update: posexplode(vec) -> groupBy(cluster, dim_index) -> avg —
       one map-side-combined shuffle of k*dim partials per partition, then
       a driver collect of exactly k*dim means (the new model).

    At 100 TB the assignment pass is embarrassingly parallel and the
    update shuffle carries k*dim*partitions partial sums — independent of
    row count.  Compare ivf_topk (similarity.py) which uses one sampled
    Lloyd pass for its coarse quantizer; this is the full, oracle-checked
    operator.
    """
    seeds = (emb.orderBy(F.col(id_col)).limit(k)
             .select(F.col(id_col), F.col(vec_col)).collect())
    cents: list[tuple[int, list[float]]] = [
        (r[0], [float(x) for x in r[1]]) for r in seeds
    ]

    def assign(df: DataFrame, cents) -> DataFrame:
        scored = F.array(*[
            F.struct(
                F.round(_sq_dist(F.col(vec_col),
                                 F.array(*[F.lit(x) for x in vec])), 6)
                 .alias("dist"),
                F.lit(cid).cast("long").alias("cluster"),
            )
            for cid, vec in cents
        ])
        # array_sort on (dist, cluster) structs: lexicographic -> nearest
        # centroid, ties to the smaller cluster id
        best = F.array_sort(scored)[0]
        return df.select(
            F.col(id_col),
            F.col(vec_col),
            best["cluster"].alias("cluster"),
            best["dist"].alias("dist"),
        )

    for _ in range(iters):
        assigned = assign(emb, cents)
        new_rows = (
            assigned
            .select("cluster", F.posexplode(F.col(vec_col)).alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("s"))
            .select("cluster", F.transform("s", lambda st: st["m"]).alias("c"))
            .collect()
        )
        moved = {r["cluster"]: [float(x) for x in r["c"]] for r in new_rows}
        # empty clusters keep their previous centroid
        cents = [(cid, moved.get(cid, vec)) for cid, vec in cents]

    return assign(emb, cents).select(id_col, "cluster", "dist")


def cluster_quality(emb: DataFrame, label_col: str = "label",
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-cluster separation diagnostic (silhouette-lite): for each label,
    the mean euclidean distance of members to their own centroid (intra)
    and the distance to the nearest OTHER centroid (inter), plus
    separation = inter / intra — the cheap Davies-Bouldin-style readout
    that says whether label groups are actually separated in embedding
    space (all public textbook formulas).

    Exactness contract: centroid coordinates are decimal-summed per
    (label, dim) then divided once in double (order-free); per-point
    distances are the same sequential zip_with/aggregate fold as the
    kmeans assignment (matches DuckDB list_sum); intra means decimal-sum
    the point distances.  Everything replays bit-identically in SQL.

    Scale shape: one posexplode shuffle of dim*N partials (map-side
    combined to |labels|*dim rows), centroids broadcast back (|labels|
    rows), one narrow distance pass + one partial-agg per label; the
    centroid-pair grid is |labels|^2, driver-free."""
    dec = "decimal(28,14)"
    pts = emb.select(F.col(label_col).alias("lbl"),
                     F.transform(F.col(vec_col),
                                 lambda x: x.cast("double")).alias("v"))
    dims = pts.select("lbl", F.posexplode(F.col("v")).alias("dim", "val"))
    cstats = (dims.groupBy("lbl", "dim")
              .agg(F.sum(F.col("val").cast(dec)).alias("_s"),
                   F.count(F.lit(1)).alias("_n")))
    coords = cstats.select(
        "lbl", "dim",
        (F.col("_s").cast("double") / F.col("_n").cast("double"))
        .alias("coord"))
    cents = (coords.groupBy("lbl")
             .agg(F.array_sort(F.collect_list(F.struct("dim", "coord")))
                  .alias("_sc"))
             .select("lbl",
                     F.transform(F.col("_sc"), lambda s: s["coord"])
                     .alias("c")))
    dist = F.sqrt(F.aggregate(
        F.zip_with(F.col("v"), F.col("c"), lambda x, c: x - c),
        F.lit(0.0), lambda acc, d: acc + d * d))
    intra = (pts.join(F.broadcast(cents), "lbl")
             .select("lbl", dist.alias("d"))
             .groupBy("lbl")
             .agg(F.count(F.lit(1)).alias("n_points"),
                  (F.sum(F.col("d").cast(dec)).cast("double")
                   / F.count(F.lit(1)).cast("double")).alias("intra_mean")))
    a = cents.select(F.col("lbl").alias("lbl"), F.col("c").alias("ca"))
    b = cents.select(F.col("lbl").alias("lbl_b"), F.col("c").alias("cb"))
    cdist = F.sqrt(F.aggregate(
        F.zip_with(F.col("ca"), F.col("cb"), lambda x, y: x - y),
        F.lit(0.0), lambda acc, d: acc + d * d))
    inter = (a.crossJoin(F.broadcast(b))
             .filter(F.col("lbl") != F.col("lbl_b"))
             .select("lbl", cdist.alias("cd"))
             .groupBy("lbl")
             .agg(F.min("cd").alias("nearest_other")))
    return (intra.join(inter, "lbl")
            .select(F.col("lbl").alias(label_col), "n_points",
                    F.round("intra_mean", 6).alias("intra_mean"),
                    F.round("nearest_other", 6).alias("nearest_other"),
                    F.round(F.col("nearest_other") / F.col("intra_mean"), 6)
                    .alias("separation")))


def power_iteration_pc(
    emb: DataFrame,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal direction of an (uncentered) embedding matrix by
    power iteration, plus each vector's projection onto it — the
    one-number embedding diagnostic (dominant axis of variation; the
    "is everything collapsed onto one direction" check that precedes
    SemDeDup-style curation, cf. anisotropy analyses of contextual
    embeddings).

    Each iteration computes  v <- normalize(sum_rows x * (x . v))
    WITHOUT materializing the dim x dim covariance: one broadcast of the
    current 64-float direction out, one narrow dot-product pass, one
    (dim x partitions)-bounded partial-agg shuffle back, one driver
    collect of exactly dim sums — the kmeans model-roundtrip contract;
    corpus size never touches the driver.

    Determinism contract (drives the DuckDB oracle):
    - init v = uniform 1/sqrt(dim) (no RNG);
    - the dot product folds left over idx order (F.aggregate), float64;
    - each row's per-coordinate contribution x_i * dot is quantized to
      micros and summed as decimal(38,0) — the accumulation across rows
      is exact integers, immune to partition order;
    - normalization (sqrt of a left-fold sum of squares) happens
      driver-side in python floats = the same IEEE ops the oracle's
      list_reduce performs.
    Projections are emitted unquantized (round 6, display only).
    """
    head = emb.select(vec_col).first()
    if head is None or head[0] is None:
        # empty frame (or all-NULL vector head): nothing to fit — return
        # the empty (id, projection) frame with the contract schema
        return emb.select(F.col(id_col),
                          F.lit(None).cast("double").alias("projection"))
    n_dim = len(head[0])
    v = [1.0 / (n_dim ** 0.5)] * n_dim

    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    for _ in range(iters):
        lit_v = F.array(*[F.lit(float(c)) for c in v])
        dot = F.aggregate(F.zip_with(xd, lit_v, lambda a, b: a * b),
                          F.lit(0.0), lambda acc, x: acc + x)
        contrib = F.posexplode(
            F.transform(xd, lambda x: F.floor(x * dot * 1e6 + F.lit(0.5))
                        .cast("bigint").cast("decimal(38,0)")))
        sums = (emb.select(contrib.alias("idx", "m"))
                .groupBy("idx").agg(F.sum("m").alias("s"))
                .collect())
        raw = [0.0] * n_dim
        for r in sums:
            raw[r["idx"]] = float(r["s"]) / 1e6
        norm = 0.0
        for c in raw:                      # left fold in idx order ==
            norm += c * c                  # the oracle's list_reduce
        norm = norm ** 0.5
        v = [c / norm for c in raw] if norm > 0.0 else v

    lit_v = F.array(*[F.lit(float(c)) for c in v])
    proj = F.aggregate(F.zip_with(xd, lit_v, lambda a, b: a * b),
                       F.lit(0.0), lambda acc, x: acc + x)
    return emb.select(F.col(id_col), F.round(proj, 6).alias("projection"))


def label_centroid_cosine(emb: DataFrame, label_col: str = "label",
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Pairwise cosine similarity between per-label embedding centroids —
    the embedding-space diagnostic that shows which classes/clusters/
    domains a representation separates and which it conflates (low
    inter-centroid cosine = separable; near 1 = the labels are
    indistinguishable to this embedding).

    Exactness contract: centroid coordinates are micros-quantized
    decimal sums divided by exact counts (identical integers in any
    partitioning); the |labels|^2 pair grid then computes dot and norms
    as fixed-order index folds — every cosine reproduces bit-for-bit.

    Scale shape: one posexplode partial-agg shuffle onto
    (label, coordinate) — corpus-sized, but fixed-width per group —
    then everything else runs on the |labels|-row centroid table
    (bounded grid, broadcast join)."""
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    contrib = F.posexplode(
        F.transform(xd, lambda x: F.floor(x * 1e6 + F.lit(0.5))
                    .cast("bigint").cast("decimal(38,0)")))
    sums = (emb.select(F.col(label_col).alias("lbl"),
                       contrib.alias("idx", "m"))
            .groupBy("lbl", "idx")
            .agg(F.sum("m").alias("s"), F.count(F.lit(1)).alias("n")))
    cent = (sums.select(
        "lbl", "idx",
        ((F.col("s").cast("double") / F.lit(1e6)) / F.col("n"))
        .alias("c"))
        .groupBy("lbl")
        .agg(F.array_sort(F.collect_list(F.struct("idx", "c")))
             .alias("__sc")))
    cent = cent.select(
        "lbl", F.transform(F.col("__sc"), lambda s: s["c"]).alias("cv"))
    a = cent.select(F.col("lbl").alias("label_a"), F.col("cv").alias("va"))
    b = cent.select(F.col("lbl").alias("label_b"), F.col("cv").alias("vb"))
    grid = a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
    dot = F.aggregate(F.zip_with(F.col("va"), F.col("vb"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(F.col("va"), lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(F.col("vb"), lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return grid.select("label_a", "label_b",
                       F.round(dot / (na * nb), 6).alias("cosine"))


def density_grid(vectors: DataFrame, vec_col: str = "embedding",
                 dim_x: int = 0, dim_y: int = 1, cell: float = 0.2,
                 min_pts: int = 5) -> DataFrame:
    """DBSCAN-lite density report over a 2-D slice of the embedding
    space: quantize two chosen dimensions onto a `cell`-sized grid,
    count points per cell, and flag cells at or above `min_pts` — the
    cheap density map that finds over-represented embedding regions
    (template clusters, mode collapse) without any pairwise work.

    Exact by construction: the cell coordinates are floor(v/cell) on
    IEEE doubles (identical in any engine) and everything else is
    integer counts — no float surfaces at all.

    Scale shape: one projection + one partial-agg shuffle onto the
    bounded cell grid; nothing pairwise, nothing collected."""
    vx = F.element_at(F.col(vec_col), dim_x + 1).cast("double")
    vy = F.element_at(F.col(vec_col), dim_y + 1).cast("double")
    g = vectors.select(
        F.floor(vx / F.lit(cell)).cast("bigint").alias("cell_x"),
        F.floor(vy / F.lit(cell)).cast("bigint").alias("cell_y"))
    agg = g.groupBy("cell_x", "cell_y").agg(
        F.count(F.lit(1)).alias("n"))
    return agg.select("cell_x", "cell_y",
                      F.col("n").cast("bigint").alias("n"),
                      (F.col("n") >= min_pts).alias("dense"))
