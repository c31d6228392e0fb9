"""Similarity search over embedding columns (array<float>).

Two tiers, per the standard scale playbook:
- `brute_force_topk`: exact cosine top-k.  Query side broadcast (small),
  corpus side streamed — one pass, no shuffle of the corpus.  The dot
  product is a JVM higher-order function by default; `method='numpy'`
  switches to an Arrow-batched mapInPandas doing one BLAS matmul per batch
  (10-50x faster per row when k*dim is large).
- `lsh_topk`: random-hyperplane (sign) LSH bucketing — the scale path:
  corpus shuffled once by bucket id, probes only touch matching buckets.
  Approximate; recall grows with `num_tables`.
- `ivf_topk`: IVF-style coarse quantization using deterministic seeded
  centroids (kmeans-lite via one sampled iteration) — candidate lists per
  probe limited to `nprobe` nearest centroids.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window


def _dbl(a: Column) -> Column:
    """Element-wise cast to double: keeps the fold arithmetic in float64 on
    both Spark and any float32-stored input (bit-stable vs oracles)."""
    return F.transform(a, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    method: str = "builtin",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Plan shape: broadcast(queries) x corpus -> per-(query,row) cosine ->
    window top-k partitioned by query.  The window shuffles only
    |corpus| * |queries| / corpus-partitions candidate rows; with a
    pre-filter (keep per-partition top-k via mapInPandas in 'numpy' mode)
    the shuffle carries k rows per partition per query only.
    """
    if method == "numpy":
        return _brute_force_topk_numpy(corpus, queries, k, id_col, vec_col, query_id_col)
    from ..scale import fan_out

    q = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    joined = (fan_out(corpus.select(F.col(id_col), F.col(vec_col)))
              .crossJoin(F.broadcast(q)))
    sim = cosine(F.col(vec_col), F.col("__qvec"))
    scored = joined.select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col),
        F.round(sim, 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _brute_force_topk_numpy(corpus, queries, k, id_col, vec_col, query_id_col):
    """Arrow path: one matmul per Arrow batch, emit per-partition top-k, then
    a tiny global top-k reduce.  The shuffle carries only k rows per
    partition per query — this is the 100 TB-shaped plan."""
    import numpy as np
    import pandas as pd

    qrows = queries.select(query_id_col, vec_col).collect()
    qids = [r[0] for r in qrows]
    qmat = np.asarray([r[1] for r in qrows], dtype=np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    out_schema = T.StructType([
        T.StructField(query_id_col, T.LongType()),
        T.StructField(id_col, T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ])

    def part(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            # float64 end-to-end: float32 matmul drifts a ulp at the 6th
            # decimal vs the float64 oracle on larger corpora (measured at
            # sf0.1) — BLAS dgemm costs ~2x sgemm, still one call per batch
            mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ qnorm.T  # (rows, nq)
            top = min(k, len(ids))
            sel = np.argpartition(-sims, top - 1, axis=0)[:top]
            rows = []
            for qi, qid in enumerate(qids):
                for ri in sel[:, qi]:
                    rows.append((qid, int(ids[ri]), round(float(sims[ri, qi]), 6)))
            yield pd.DataFrame(rows, columns=[query_id_col, id_col, "cosine"])

    from ..scale import fan_out

    partial = fan_out(corpus.select(id_col, vec_col)).mapInPandas(part, out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return partial.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    lo: float = 0.4,
    hi: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    block_col: str | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-k most-similar corpus rows whose cosine falls in
    [lo, hi) — similar enough to be confusable, below the near-duplicate
    band (near-dups are false negatives, not hard ones).

    Scale shape: with `block_col` the candidate set is a hash-join on the
    block key (shard/topic/label), never an all-pairs product — the same
    blocking contract as embedding_near_dup_pairs.  Without a block the
    query side is broadcast (queries are the small side by construction).
    The band filter runs on the UNROUNDED cosine before the per-query
    top-k window; `rank` partitions by query id, so the window shuffle
    carries only band-surviving candidates.
    """
    c_cols = [F.col(id_col), F.col(vec_col).alias("__cvec")]
    q_cols = [F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")]
    if block_col is not None:
        c = corpus.select(F.col(block_col).alias("__blk"), *c_cols)
        q = queries.select(F.col(block_col).alias("__blk"), *q_cols)
        joined = q.join(c, "__blk")
    else:
        c = corpus.select(*c_cols)
        q = queries.select(*q_cols)
        joined = c.crossJoin(F.broadcast(q))
    sim = cosine(F.col("__qvec"), F.col("__cvec"))
    banded = (
        joined.filter(F.col("__qid") != F.col(id_col))
        .withColumn("__sim", sim)
        .filter((F.col("__sim") >= lo) & (F.col("__sim") < hi))
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("__sim").desc(), F.col(id_col).asc())
    return (
        banded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("__qid").alias(query_id_col), F.col(id_col),
                F.round("__sim", 6).alias("cosine"), "rank")
    )


# ---------------------------------------------------------------------------
# sign-LSH (random hyperplane) bucketing
# ---------------------------------------------------------------------------
def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG — reproducible
    across driver runs without numpy RNG state)."""
    state = seed * 6364136223846793005 + 1442695040888963407
    planes = []
    for _ in range(bits):
        vec = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            # map to (-1, 1)
            vec.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(vec)
    return planes


def sign_lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket id = sign bits against each hyperplane, packed into a long.
    JVM-expression form — fine for a handful of bits; for many tables use
    `sign_lsh_buckets_udf` (one vectorized matmul for all tables)."""
    acc = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = (dot(vec, p) > 0).cast("long")
        acc = acc + F.shiftleft(bit, i)
    return acc


def sign_lsh_buckets_udf(all_planes: list[list[list[float]]]):
    """All-tables bucketing as ONE Arrow pandas_udf: vecs(n,dim) @
    planes(dim,bits) per table, sign bits packed to a long — returns
    array<long>, one bucket per table.

    Why not expressions: Spark's higher-order array functions evaluate
    interpreted (no codegen), so tables*bits dot products become
    tables*bits*dim lambda calls per row AND a literal-array expression
    tree that inflates driver planning time.  The numpy matmul does the
    same arithmetic in one BLAS call per Arrow batch (measured ~6x on the
    lsh_topk query)."""
    mats = [np.asarray(p, dtype=np.float32).T for p in all_planes]  # (dim, bits)
    weights = [1 << np.arange(m.shape[1], dtype=np.int64) for m in mats]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vs: pd.Series) -> pd.Series:
        mat = np.asarray(list(vs), dtype=np.float32)  # (n, dim)
        if mat.ndim != 2 or len(mat) == 0:
            return pd.Series([[0] * len(mats)] * len(vs))
        per_table = [((mat @ m) > 0).astype(np.int64) @ w
                     for m, w in zip(mats, weights)]
        return pd.Series(list(np.stack(per_table, axis=1)))

    return buckets


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bits: int = 8,
    num_tables: int = 4,
    dim: int | None = None,
    seed: int = 42,
    min_corpus_for_lsh: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing any LSH bucket
    with the query in any table, then exact cosine re-rank.  Corpus-side
    cost is one projection + one shuffle by bucket; this is the plan that
    survives a 100x corpus.

    Measured-size adaptivity (same policy as the connected-components
    small-graph path): below `min_corpus_for_lsh` rows the buckets are so
    sparse that bucketing is pure overhead while brute force costs
    nothing —
    so tiny corpora route to the exact scan.  The LSH path is untouched
    at scale, where the count is a metadata-cheap parquet statistic."""
    if corpus.count() < min_corpus_for_lsh:
        return brute_force_topk(corpus, queries, k, id_col, vec_col,
                                query_id_col)
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    all_planes = [_hyperplanes(dim, bits, seed + t) for t in range(num_tables)]
    buckets = sign_lsh_buckets_udf(all_planes)

    from ..scale import fan_out

    c = fan_out(corpus).select(
        F.col(id_col), F.col(vec_col),
        F.posexplode(buckets(F.col(vec_col))).alias("table", "bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    ).select(
        "__qid", "__qvec",
        F.posexplode(buckets(F.col("__qvec"))).alias("table", "bucket"),
    )
    cand = (
        c.join(F.broadcast(q), on=["table", "bucket"])
        .dropDuplicates([id_col, "__qid"])
    )
    sim = cosine(F.col(vec_col), F.col("__qvec"))
    scored = cand.select(
        F.col("__qid").alias(query_id_col), F.col(id_col),
        F.round(sim, 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# IVF-lite
# ---------------------------------------------------------------------------
def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF coarse quantization: centroids from a deterministic sample, each
    corpus vector assigned to its nearest centroid (one pass), queries probe
    the `nprobe` nearest lists.  Centroid table is tiny -> broadcast both
    directions; the corpus shuffles once on list id at build time."""
    import numpy as np

    sample = corpus.select(vec_col).orderBy(F.xxhash64(F.col(id_col))).limit(nlist * 8).collect()
    mat = np.asarray([r[0] for r in sample], dtype=np.float64)
    rng_idx = [int(h % len(mat)) for h in range(0, nlist * 997, 997)][:nlist]
    cents = mat[rng_idx]
    # one Lloyd iteration for stability
    assign = np.argmax(
        (mat / np.linalg.norm(mat, axis=1, keepdims=True))
        @ (cents / np.linalg.norm(cents, axis=1, keepdims=True)).T,
        axis=1,
    )
    for i in range(nlist):
        members = mat[assign == i]
        if len(members):
            cents[i] = members.mean(axis=0)

    cent_arr = F.array(*[
        F.struct(F.lit(i).alias("list_id"),
                 F.array(*[F.lit(float(x)) for x in c]).alias("cvec"))
        for i, c in enumerate(cents)
    ])

    def nearest_lists(vec: Column, n: int) -> Column:
        scored = F.transform(
            cent_arr,
            lambda s: F.struct((-cosine(vec, s["cvec"])).alias("neg"), s["list_id"].alias("list_id")),
        )
        return F.slice(F.transform(F.array_sort(scored), lambda s: s["list_id"]), 1, n)

    c = corpus.withColumn("__list", nearest_lists(F.col(vec_col), 1)[0])
    q = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec"),
        F.explode(nearest_lists(F.col(vec_col), nprobe)).alias("__list"),
    )
    cand = c.join(F.broadcast(q), on="__list")
    sim = cosine(F.col(vec_col), F.col("__qvec"))
    scored = cand.select(
        F.col("__qid").alias(query_id_col), F.col(id_col),
        F.round(sim, 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Product quantization (PQ / ADC)
# ---------------------------------------------------------------------------
def pq_train(corpus: DataFrame, vec_col: str = "embedding", m: int = 4,
             ksub: int = 16, sample: int = 2048, iters: int = 5,
             id_col: str = "vec_id", seed: int = 42,
             normalize: bool = True) -> list[list[list[float]]]:
    """Train PQ codebooks (Jégou et al., "Product Quantization for Nearest
    Neighbor Search", TPAMI 2011): split vectors into `m` subvectors, run
    k-means with `ksub` centroids independently in each subspace over a
    deterministic hash-ordered sample (bounded: `sample` rows collected,
    codebooks are m*ksub*subdim floats — a few KB).  Returns
    codebooks[sub][code] -> centroid (python lists, ready to embed as plan
    literals)."""
    rows = (corpus.select(vec_col)
            .orderBy(F.xxhash64(F.col(id_col)))
            .limit(sample).collect())
    mat = np.asarray([r[0] for r in rows], dtype=np.float64)
    if normalize:
        # train in the same geometry the encoder will see (unit sphere)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                               1e-12)
    dim = mat.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m
    books = []
    for j in range(m):
        x = mat[:, j * sub:(j + 1) * sub]
        # deterministic init: spread by hash order
        idx = [(i * 997 + seed) % len(x) for i in range(ksub)]
        cents = x[idx].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                members = x[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append([[float(v) for v in c] for c in cents])
    return books


def _bind(expr: Column, f) -> Column:
    """Evaluate `expr` ONCE and pass the result to `f` as a bound lambda
    variable (one-element-transform binding, same trick as
    textual.word_ngrams): Catalyst inlines referenced expressions into
    every lambda call site, so an unbound computed array inside a nested
    higher-order function is re-evaluated per element per level — the
    O(len^2)+ blowup measured in DSIR and again here in the PQ distance
    tables (0.5s/row interpreted -> sub-ms bound)."""
    return F.element_at(F.transform(F.array(expr), f), 1)


def unit_vector(vec: Column) -> Column:
    """L2-normalized copy of `vec` (double elements).  The norm is bound
    once — the naive transform(vec, x -> x / norm(vec)) re-aggregates the
    norm per ELEMENT once Catalyst inlines it."""
    return _bind(
        F.greatest(norm(vec), F.lit(1e-12)),
        lambda n: F.transform(vec, lambda x: x.cast("double") / n))


def pq_encode(vec: Column, books: list[list[list[float]]]) -> Column:
    """array<int> PQ codes for `vec` — per subspace, the argmin-L2 codeword
    index.  Pure array expressions over ONE nested codebook literal with a
    single transform over the subspace index: codegen stays O(1) in m
    (m unrolled per-subspace columns would m-plicate the generated code —
    the measured trap behind the minhash signature rewrite).  The input is
    bound once (`_bind`) so upstream computed vectors (e.g. unit_vector)
    are not re-evaluated per centroid.  Encoding runs at scan speed with
    no join, no shuffle, no python."""
    m = len(books)
    sub = len(books[0][0])
    books_lit = F.lit(books)  # array<array<array<double>>>, a few KB

    def codes_of(dq: Column) -> Column:
        def code_for(j: Column) -> Column:
            x = F.slice(dq, j * sub + 1, sub)
            d2 = F.transform(
                F.element_at(books_lit, j + 1),
                lambda c: F.aggregate(
                    F.zip_with(x, c, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0), lambda acc, e: acc + e))
            return (F.array_position(d2, F.array_min(d2)) - 1).cast("int")

        return F.transform(F.sequence(F.lit(0), F.lit(m - 1)), code_for)

    return _bind(F.transform(vec, lambda v: v.cast("double")), codes_of)


def pq_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            query_id_col: str = "query_id", m: int = 4, ksub: int = 16,
            books: list[list[list[float]]] | None = None) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance (ADC): corpus vectors
    compressed to `m` byte-codes, each query precomputes an m×ksub
    distance table, and the scored distance is m table lookups per
    candidate instead of a dim-wide dot product.

    Scale shape: codebooks are plan literals (a few KB); the corpus is
    scanned once — encode + lookup are pure expressions; queries broadcast
    (small by contract); per-query top-k is a window over candidates.  At
    100 TB the corpus side stores m bytes/vector instead of 4*dim — the
    classic memory/recall trade; re-rank the top candidates with exact
    distance when recall matters (see the embed_pq_topk registry query).

    Vectors are L2-NORMALIZED before encoding (and queries before table
    building): on the unit sphere ||a-b||^2 = 2 - 2*cos(a,b), so the ADC
    ordering agrees with cosine similarity up to quantization error —
    without it, norm variance dominates and the candidate ranking drifts
    from the cosine ranking callers actually want."""
    if books is None:
        books = pq_train(corpus, vec_col, m, ksub, id_col=id_col)
    unit = unit_vector

    enc = corpus.select(F.col(id_col),
                        pq_encode(unit(F.col(vec_col)), books).alias("__code"))

    sub = len(books[0][0])
    m = len(books)
    books_lit = F.lit(books)

    def dist_table(qvec: Column) -> Column:
        # tables[j][c] = ||q_j - books[j][c]||^2  (m arrays of ksub
        # doubles); one nested transform over (j, c), input bound once —
        # same O(1)-in-m codegen shape and binding discipline as pq_encode
        def tab_of(dq: Column) -> Column:
            return F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.transform(
                    F.element_at(books_lit, j + 1),
                    lambda c: F.aggregate(
                        F.zip_with(F.slice(dq, j * sub + 1, sub), c,
                                   lambda a, b: (a - b) * (a - b)),
                        F.lit(0.0), lambda acc, e: acc + e)))

        return _bind(F.transform(qvec, lambda v: v.cast("double")), tab_of)

    q = queries.select(F.col(query_id_col).alias("__qid"),
                       dist_table(unit(F.col(vec_col))).alias("__tab"))
    cand = enc.crossJoin(F.broadcast(q))
    # adc = sum_j tab[j][code_j]
    adc = F.aggregate(
        F.zip_with(F.col("__tab"), F.col("__code"),
                   lambda t, c: F.element_at(t, c + 1)),
        F.lit(0.0), lambda acc, e: acc + e)
    scored = cand.select(F.col("__qid").alias(query_id_col), F.col(id_col),
                         F.round(adc, 6).alias("adc_dist"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= k)


def mmr_rerank(candidates: DataFrame, lam: float = 0.75, k: int = 5,
               query_col: str = "query_id", id_col: str = "vec_id",
               vec_col: str = "embedding", rel_col: str = "rel") -> DataFrame:
    """Maximal-marginal-relevance diversified reranking (Carbonell &
    Goldstein 1998): per query, greedily select k results maximizing

        lam * rel(d) - (1 - lam) * max_{s in selected} cos(d, s)

    (empty selected set -> 0.0 for the diversity term); ties break to the
    smallest id.  Returns (query, sel_rank 1..k, id, mmr_score unrounded).

    Scale shape: candidates are an ALREADY-BOUNDED per-query top-n (from
    brute_force_topk / lsh_topk), so the greedy O(k*n) selection runs
    per-query-group in ONE applyInPandas pass — Arrow-batched, n*k bounded
    work per group, corpus-size independent.  The cosine inside is the
    same sequential float64 fold as the similarity suite / DuckDB's
    list_cosine_similarity (loop accumulation, dot/(sqrt(sa)*sqrt(sb))),
    so selections and scores are bit-identical to a SQL replay."""
    import pandas as pd

    one_minus = 1 - lam  # fold 1-lam ONCE, same as the SQL literal tree

    def _cos(a: list, b: list) -> float:
        dot = 0.0
        sa = 0.0
        sb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            sa += x * x
            sb += y * y
        import math
        return dot / (math.sqrt(sa) * math.sqrt(sb))

    def _select(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf[query_col].iloc[0]
        vecs = {}
        rels = {}
        for _, row in pdf.iterrows():
            cid = int(row[id_col])
            vecs[cid] = [float(x) for x in row[vec_col]]
            rels[cid] = float(row[rel_col])
        sims: dict = {}

        def pair(a: int, b: int) -> float:
            key = (a, b) if a < b else (b, a)
            if key not in sims:
                sims[key] = _cos(vecs[key[0]], vecs[key[1]])
            return sims[key]

        avail = set(vecs)
        selected: list = []
        out = []
        for step in range(1, k + 1):
            if not avail:
                break
            best_id, best_score = None, None
            for cid in sorted(avail):
                ms = max((pair(cid, s) for s in selected), default=0.0)
                score = lam * rels[cid] - one_minus * ms
                if best_id is None or score > best_score:
                    best_id, best_score = cid, score
            out.append((qid, step, best_id, best_score))
            avail.discard(best_id)
            selected.append(best_id)
        return pd.DataFrame(
            out, columns=[query_col, "sel_rank", id_col, "mmr_score"])

    return candidates.groupBy(query_col).applyInPandas(
        _select,
        schema=f"{query_col} long, sel_rank int, {id_col} long, "
               f"mmr_score double")


def int8_quantize_stats(emb: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization report: each embedding
    scales by max|x|/127, rounds to int8, and the report carries the
    scale plus the reconstruction error (MSE and max absolute error) —
    the go/no-go measurement before shrinking a vector index 4x (the
    standard faiss/SQ8 memory trade).

    Exactness contract: amax is an order-independent array max; the
    quantize-reconstruct-error chain is a fixed-structure per-element
    IEEE expression folded in index order (F.aggregate), so every
    statistic reproduces bit-for-bit cross-engine.  All-zero vectors
    report scale 0 with zero error instead of dividing by zero.

    Scale shape: pure per-row expressions — no shuffle, no UDF, no
    state; streams at scan speed over any corpus size."""
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(xd, F.abs))
    scale = amax / F.lit(127.0)
    # ANSI double division by zero RAISES even in rows the final CASE
    # discards, so the quantizer divides by a guarded scale (all-zero
    # vectors quantize by 1.0 and report 0 everywhere)
    sdiv = F.when(amax > 0, scale).otherwise(F.lit(1.0))
    # materialize __x/__q as real columns FIRST: a computed array
    # referenced inside later higher-order lambdas is INLINED and
    # re-evaluated per element (the PQ/word_ngrams lesson — this was a
    # measured 20x slowdown as a single projection)
    staged = emb.select(
        F.col(id_col), xd.alias("__x"), amax.alias("__amax"),
        scale.alias("__scale"),
        F.transform(xd, lambda x: F.least(
            F.greatest(F.floor(x / sdiv + F.lit(0.5)), F.lit(-127.0)),
            F.lit(127.0))).alias("__q"))
    xc, qc = F.col("__x"), F.col("__q")
    sc, am = F.col("__scale"), F.col("__amax")
    err = F.zip_with(xc, qc, lambda x, b: (x - b * sc) * (x - b * sc))
    sse = F.aggregate(err, F.lit(0.0), lambda acc, e: acc + e)
    mae = F.array_max(F.zip_with(xc, qc, lambda x, b: F.abs(x - b * sc)))
    dim = F.size(xc)
    zero = F.lit(0.0)
    return staged.select(
        F.col(id_col),
        F.round(F.when(am > 0, sc).otherwise(zero), 6).alias("scale"),
        F.round(F.when(am > 0, sse / dim).otherwise(zero), 6).alias("mse"),
        F.round(F.when(am > 0, mae).otherwise(zero), 6)
        .alias("max_abs_err"))


def embedding_norm_stats(emb: DataFrame, label_col: str = "label",
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         outlier_factor: float = 1.5) -> DataFrame:
    """Per-label embedding L2-norm distribution report: n, mean, exact
    p50/p99, and the count of norm outliers (> factor * p50) — the
    index-health check that catches unnormalized batches, collapsed
    clusters, and mis-scaled encoders before vectors enter an index.

    Exactness contract: the norm is a fixed-order index fold; per-label
    statistics run over micros-quantized integer norms (mean via exact
    decimal sums, percentiles via exact interpolation over integers), so
    every cell reproduces bit-for-bit cross-engine.

    Scale shape: one narrow per-row pass for the norm, one partial-agg
    shuffle per label for mean/percentiles, one broadcast join back for
    the outlier count — label count bounds every post-scan structure."""
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(F.transform(xd, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))
    nq = F.floor(norm * 1e6 + F.lit(0.5)).cast("bigint")
    pts = emb.select(F.col(label_col).alias("lbl"), nq.alias("__nq"))
    stats = (pts.groupBy("lbl")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("__nq").cast("decimal(38,0)")).alias("__s"),
                  F.expr("percentile(__nq, 0.5d)").alias("__p50"),
                  F.expr("percentile(__nq, 0.99d)").alias("__p99")))
    out = (pts.join(F.broadcast(stats.select("lbl", "__p50")), "lbl")
           .filter(F.col("__nq").cast("double")
                   > F.lit(float(outlier_factor)) * F.col("__p50"))
           .groupBy("lbl").agg(F.count(F.lit(1)).alias("__out")))
    return (stats.join(out, "lbl", "left")
            .select(F.col("lbl").alias(label_col), "n",
                    F.round(F.col("__s").cast("double") / 1e6
                            / F.col("n"), 6).alias("mean_norm"),
                    F.round(F.col("__p50") / 1e6, 6).alias("p50_norm"),
                    F.round(F.col("__p99") / 1e6, 6).alias("p99_norm"),
                    F.coalesce(F.col("__out"), F.lit(0)).cast("bigint")
                    .alias("n_outliers")))


def random_projection(emb: DataFrame, out_dim: int = 8,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Johnson-Lindenstrauss random projection with a DETERMINISTIC
    Rademacher (+-1) sign matrix: proj_j = sum_i x_i * s(i, j), the
    dimensionality-reduction front end for cheap distance sketches and
    LSH preconditioning.  The sign matrix is derived from a keyed
    integer mix — no RNG state, so any engine (and any rerun) builds
    the identical matrix:

        h(i, j) = ((i+1)*2654435761 + (j+1)*1779033703
                   + (i+1)*(j+1)*97) % 65521
        s(i, j) = +1 if h is even else -1

    (products stay < 2^63 for any realistic dim, so the mix is exact
    BIGINT arithmetic everywhere; 2654435761 is the Knuth multiplier,
    65521 the largest 16-bit prime.)

    Exactness contract: the fold over i runs in index order with
    double-cast elements on both engines, so each projected component
    is a fixed-order IEEE sum (round 6 display).

    Scale shape: ONE narrow per-row pass — no shuffle, no UDF, no
    broadcast; the sign matrix is an expression, never materialized.
    Output is long-form (id, dim, proj) so downstream ops can
    re-assemble or index without array surgery."""
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dims = F.sequence(F.lit(0), F.lit(out_dim - 1))

    def sign(i, j):
        h = ((i + F.lit(1)) * F.lit(2654435761)
             + (j + F.lit(1)) * F.lit(1779033703)
             + (i + F.lit(1)) * (j + F.lit(1)) * F.lit(97)) % F.lit(65521)
        return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))

    def project(j):
        sx = F.zip_with(
            xd,
            F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
            lambda x, i: x * sign(i.cast("bigint"), j.cast("bigint")))
        return F.aggregate(sx, F.lit(0.0), lambda acc, x: acc + x)

    proj = F.transform(dims, project)
    return (emb.select(F.col(id_col), F.posexplode(proj)
                       .alias("dim", "__p"))
            .select(id_col, "dim", F.round("__p", 6).alias("proj")))


def ndcg_at_k(corpus: DataFrame, queries: DataFrame, k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding",
              label_col: str = "label",
              query_id_col: str = "query_id") -> DataFrame:
    """Retrieval-quality evaluation: NDCG@k per query over exact
    brute-force cosine ranking, with same-label candidates as the
    binary relevance signal — the eval harness that grades an ANN
    index, an embedding model, or a hard-negative miner against ground
    truth.

    Exactness contract: ranking is the unrounded cosine with an id
    tie-break (the embed_topk contract); each rank's discount
    1/log2(r+1) is quantized to 1e12 integers, so DCG and ideal DCG
    are exact integer sums in any partitioning and NDCG is one IEEE
    division (round 6 display).  Queries with no same-label candidate
    surface NULL (no 0/0).

    Queries need NOT be corpus members (the retrieval_eval contract):
    self-exclusion and the n_rel discount of 1 apply only to queries
    whose id actually appears in the corpus — an id is an identity, so
    a shared id IS the same row.  External queries rank against the
    full corpus and n_rel is the undiscounted label count.

    Scale shape: broadcast(queries) x corpus -> per-query window top-k
    (the brute_force_topk plan), one label-count broadcast join, one
    broadcast-probe membership semi join, one bounded sequence explode
    for the ideal prefix.  |queries| bounds every post-scan
    structure."""
    from ..scale import fan_out

    q0 = queries.select(F.col(query_id_col).alias("__qid"),
                        F.col(vec_col).alias("__qvec"),
                        F.col(label_col).alias("__qlab"))
    members = (q0.select("__qid")
               .join(corpus.select(F.col(id_col).alias("__qid")),
                     "__qid", "left_semi")
               .withColumn("__qmem", F.lit(True)))
    q = (q0.join(F.broadcast(members), "__qid", "left")
         .select("__qid", "__qvec", "__qlab",
                 F.coalesce(F.col("__qmem"), F.lit(False))
                 .alias("__qmem")))
    cand = (fan_out(corpus.select(F.col(id_col), F.col(vec_col),
                                  F.col(label_col)))
            .crossJoin(F.broadcast(q))
            .filter((F.col(id_col) != F.col("__qid"))
                    | ~F.col("__qmem")))
    scored = cand.select(
        "__qid", "__qlab", "__qmem", F.col(id_col),
        F.col(label_col).alias("__clab"),
        cosine(F.col(vec_col), F.col("__qvec")).alias("__sim"))
    w = Window.partitionBy("__qid").orderBy(
        F.col("__sim").desc(), F.col(id_col).asc())
    top = (scored.withColumn("__r", F.row_number().over(w))
           .filter(F.col("__r") <= k))

    def wq(r):
        return (F.floor(F.lit(1e12) / (F.log(r + F.lit(1)) / F.log(F.lit(2.0)))
                        + F.lit(0.5)).cast("bigint"))

    dcg = top.groupBy("__qid", "__qlab", "__qmem").agg(
        F.sum(F.when(F.col("__clab") == F.col("__qlab"),
                     wq(F.col("__r"))).otherwise(0)).alias("__dcg"))
    labn = corpus.groupBy(F.col(label_col).alias("__lab")).agg(
        F.count(F.lit(1)).alias("__ln"))
    # LEFT join (r6 ADVICE): a query whose label has ZERO corpus
    # occurrences must surface n_rel=0 / NULL ndcg, not vanish.  The
    # greatest(0) clamp covers a corpus-member query whose queries-frame
    # label differs from every corpus label (discount would go negative).
    per = (dcg.join(F.broadcast(labn), dcg["__qlab"] == labn["__lab"],
                    "left")
           .select("__qid", "__qlab", "__dcg",
                   F.greatest(
                       F.lit(0),
                       F.coalesce(F.col("__ln"), F.lit(0))
                       - F.when(F.col("__qmem"), 1).otherwise(0))
                   .cast("bigint").alias("n_rel")))
    ideal = (per.filter(F.col("n_rel") > 0)
             .select("__qid", F.explode(
                 F.sequence(F.lit(1),
                            F.least(F.lit(k), F.col("n_rel"))
                            .cast("int"))).alias("__i"))
             .groupBy("__qid")
             .agg(F.sum(wq(F.col("__i"))).alias("__idcg")))
    return (per.join(ideal, "__qid", "left")
            .select(F.col("__qid").alias(query_id_col),
                    F.col("__qlab").alias(label_col), "n_rel",
                    F.when(F.col("n_rel") > 0,
                           F.round(F.col("__dcg").cast("double")
                                   / F.col("__idcg").cast("double"), 6))
                    .alias("ndcg")))


def prefix_dim_quality(corpus: DataFrame, queries: DataFrame,
                       prefix_dim: int = 16,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       query_id_col: str = "query_id") -> DataFrame:
    """Matryoshka-style prefix-truncation quality report: for each
    query, how well cosine over the FIRST `prefix_dim` dimensions
    agrees with full-dimension cosine — the measurement that decides
    whether a cheap prefix index can front a full-dim reranker.

    Per query: the full-dim and prefix-dim top-1 neighbor ids, whether
    they agree, and the mean absolute cosine delta across all
    candidates (each pair's delta quantized to micros BEFORE the mean,
    so the sum is exact integers in any partitioning; the mean is one
    IEEE division, round 6).

    Scale shape: broadcast(queries) x corpus (the brute_force_topk
    plan), one per-query window for the two top-1 picks, one
    partial agg for the delta mean.

    Identity contract: a corpus candidate sharing a query's id is
    treated as the query row itself and excluded from that query's
    candidates (ids are identities; for guaranteed-external query
    sets use ids disjoint from the corpus).
    """
    from ..scale import fan_out

    q = queries.select(F.col(query_id_col).alias("__qid"),
                       F.col(vec_col).alias("__qvec"))
    cand = (fan_out(corpus.select(F.col(id_col), F.col(vec_col)))
            .crossJoin(F.broadcast(q))
            .filter(F.col(id_col) != F.col("__qid")))
    full = cosine(F.col(vec_col), F.col("__qvec"))
    pref = cosine(F.slice(F.col(vec_col), 1, prefix_dim),
                  F.slice(F.col("__qvec"), 1, prefix_dim))
    scored = cand.select("__qid", F.col(id_col),
                         full.alias("__cf"), pref.alias("__cp"))
    wf = Window.partitionBy("__qid").orderBy(
        F.col("__cf").desc(), F.col(id_col).asc())
    wp = Window.partitionBy("__qid").orderBy(
        F.col("__cp").desc(), F.col(id_col).asc())
    ranked = (scored
              .withColumn("__rf", F.row_number().over(wf))
              .withColumn("__rp", F.row_number().over(wp)))
    dq = F.floor(F.abs(F.col("__cf") - F.col("__cp")) * 1e6
                 + F.lit(0.5)).cast("bigint")
    agg = ranked.groupBy("__qid").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.min(F.when(F.col("__rf") == 1, F.col(id_col))).alias("top1_full"),
        F.min(F.when(F.col("__rp") == 1, F.col(id_col))).alias("top1_prefix"),
        F.sum(dq).alias("__sd"))
    return agg.select(
        F.col("__qid").alias(query_id_col),
        F.col("n_candidates").cast("bigint").alias("n_candidates"),
        "top1_full", "top1_prefix",
        (F.col("top1_full") == F.col("top1_prefix")).alias("top1_agree"),
        F.round(F.col("__sd").cast("double") / 1e6
                / F.col("n_candidates").cast("double"), 6)
        .alias("mean_abs_cos_delta"))


def reciprocal_nn(vectors: DataFrame, k: int = 5,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Reciprocal nearest-neighbor pairs WITHIN the given vector set:
    (a, b) such that b is in a's cosine top-k AND a is in b's — the
    high-precision seed pairs for semantic dedup and cluster
    bootstrapping (RNN pairs are far cleaner than one-directional
    neighbors).

    Contract: mutuality is evaluated within `vectors` — pass a bounded
    slice or an LSH/IVF candidate pool; the all-pairs scoring is the
    brute_force_topk plan (broadcast one side), so the input set must
    fit the broadcast budget.  At corpus scale, feed this the ANN
    candidate output, not the raw corpus.

    Exactness: ranking is unrounded cosine with id tie-break (the
    embed_topk contract); output pairs are a < b with both ranks and
    the rounded cosine."""
    from ..scale import fan_out

    q = vectors.select(F.col(id_col).alias("__qid"),
                       F.col(vec_col).alias("__qvec"))
    cand = (fan_out(vectors.select(F.col(id_col), F.col(vec_col)))
            .crossJoin(F.broadcast(q))
            .filter(F.col(id_col) != F.col("__qid")))
    scored = cand.select(
        F.col("__qid"), F.col(id_col).alias("__cid"),
        cosine(F.col(vec_col), F.col("__qvec")).alias("__sim"))
    w = Window.partitionBy("__qid").orderBy(
        F.col("__sim").desc(), F.col("__cid").asc())
    top = (scored.withColumn("__r", F.row_number().over(w))
           .filter(F.col("__r") <= k))
    a = top.select(F.col("__qid").alias("a_id"),
                   F.col("__cid").alias("b_id"),
                   F.col("__r").alias("rank_ab"),
                   F.col("__sim").alias("__s"))
    b = top.select(F.col("__qid").alias("b_id2"),
                   F.col("__cid").alias("a_id2"),
                   F.col("__r").alias("rank_ba"))
    mutual = a.join(b, (a["a_id"] == b["a_id2"])
                    & (a["b_id"] == b["b_id2"]))
    return (mutual.filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id",
                    F.col("rank_ab").cast("int").alias("rank_ab"),
                    F.col("rank_ba").cast("int").alias("rank_ba"),
                    F.round("__s", 6).alias("cosine")))


def retrieval_eval(corpus: DataFrame, queries: DataFrame, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label",
                   query_id_col: str = "query_id") -> DataFrame:
    """Retrieval eval companions to ndcg_at_k: per-query FIRST relevant
    rank within the exact top-k, its reciprocal (the MRR numerator),
    and the hit@k bit — the coarse metrics a retriever dashboard
    tracks next to NDCG.

    Ranking contract matches ndcg_at_k exactly (unrounded cosine, id
    tie-break), so the two evals are comparable row-for-row.  The
    reciprocal rank is ROUND(1/r, 6) of an exact integer rank; queries
    with no same-label candidate in the top-k surface NULL rank and
    hit=false.

    Queries need NOT be corpus members: self-exclusion (dropping the
    corpus candidate whose id equals the query id) and the n_rel
    discount of 1 apply only to queries whose id actually appears in
    the corpus — an id is an identity, so a shared id IS the same row.
    External queries rank against the full corpus and n_rel is the
    undiscounted label count.

    Scale shape: broadcast(queries) x corpus -> per-query window
    top-k, one broadcast label-count join, one broadcast-probe
    membership semi join; |queries| bounds every post-scan
    structure."""
    from ..scale import fan_out

    q0 = queries.select(F.col(query_id_col).alias("__qid"),
                        F.col(vec_col).alias("__qvec"),
                        F.col(label_col).alias("__qlab"))
    members = (q0.select("__qid")
               .join(corpus.select(F.col(id_col).alias("__qid")),
                     "__qid", "left_semi")
               .withColumn("__qmem", F.lit(True)))
    q = (q0.join(F.broadcast(members), "__qid", "left")
         .select("__qid", "__qvec", "__qlab",
                 F.coalesce(F.col("__qmem"), F.lit(False))
                 .alias("__qmem")))
    cand = (fan_out(corpus.select(F.col(id_col), F.col(vec_col),
                                  F.col(label_col)))
            .crossJoin(F.broadcast(q))
            .filter((F.col(id_col) != F.col("__qid"))
                    | ~F.col("__qmem")))
    scored = cand.select(
        "__qid", "__qlab", "__qmem", F.col(id_col),
        F.col(label_col).alias("__clab"),
        cosine(F.col(vec_col), F.col("__qvec")).alias("__sim"))
    w = Window.partitionBy("__qid").orderBy(
        F.col("__sim").desc(), F.col(id_col).asc())
    top = (scored.withColumn("__r", F.row_number().over(w))
           .filter(F.col("__r") <= k))
    per = top.groupBy("__qid", "__qlab", "__qmem").agg(
        F.min(F.when(F.col("__clab") == F.col("__qlab"), F.col("__r")))
        .alias("first_rel_rank"))
    labn = corpus.groupBy(F.col(label_col).alias("__lab")).agg(
        F.count(F.lit(1)).alias("__ln"))
    # LEFT join (r6 ADVICE): a query whose label has ZERO corpus
    # occurrences must surface n_rel=0 / NULL rank / hit=false, not
    # vanish.  greatest(0) clamps the member discount for a member query
    # whose queries-frame label appears nowhere in the corpus.
    out = per.join(F.broadcast(labn), per["__qlab"] == labn["__lab"],
                   "left")
    rr = F.round(F.lit(1.0) / F.col("first_rel_rank").cast("double"), 6)
    return out.select(
        F.col("__qid").alias(query_id_col),
        F.col("__qlab").alias(label_col),
        F.greatest(F.lit(0),
                   F.coalesce(F.col("__ln"), F.lit(0))
                   - F.when(F.col("__qmem"), 1).otherwise(0))
        .cast("bigint").alias("n_rel"),
        F.col("first_rel_rank").cast("bigint").alias("first_rel_rank"),
        F.when(F.col("first_rel_rank").isNotNull(), rr).alias("rr"),
        F.col("first_rel_rank").isNotNull().alias("hit"))


def embedding_drift(a: DataFrame, b: DataFrame,
                    vec_col: str = "embedding") -> DataFrame:
    """Embedding-distribution drift between two corpus slices (two
    days, two model versions, two sources): the cosine between the
    slice centroids plus the centroid-norm ratio — the two cheapest
    signals that an embedding space moved (centroid rotation) or
    rescaled (norm inflation), each computable in one pass per side.

    Exactness: per-dimension components quantize to 1e6 micros
    BEFORE the sums, so each side's sum vector is exact integers in
    any partitioning; cosine is scale-invariant, so it is evaluated
    directly on the integer sum vectors (no centroid division), and
    both outputs are fixed IEEE expressions (round 6).

    Scale shape: one posexplode + per-dim partial agg per side
    (dim-bounded results), a dim-aligned join, one scalar aggregate —
    no pairwise work, nothing collected."""
    big = "decimal(38,0)"

    def _sums(df: DataFrame, tag: str) -> DataFrame:
        ex = df.select(F.posexplode(F.col(vec_col)).alias("__d", "__v"))
        qv = F.floor(F.col("__v").cast("double") * 1e6
                     + F.lit(0.5)).cast("bigint")
        return ex.groupBy("__d").agg(
            F.sum(qv.cast(big)).alias(f"__s{tag}"))

    na = a.count()
    nb = b.count()
    j = _sums(a, "a").join(_sums(b, "b"), "__d")
    sa, sb = F.col("__sa"), F.col("__sb")
    agg = j.agg(
        F.sum((sa * sb).cast(big)).alias("__dot"),
        F.sum((sa * sa).cast(big)).alias("__na"),
        F.sum((sb * sb).cast(big)).alias("__nb"))
    dot = F.col("__dot").cast("double")
    qa, qb = F.col("__na").cast("double"), F.col("__nb").cast("double")
    ok = (qa > F.lit(0.0)) & (qb > F.lit(0.0))
    return agg.select(
        F.lit(na).cast("bigint").alias("n_a"),
        F.lit(nb).cast("bigint").alias("n_b"),
        F.when(ok, F.round(dot / F.sqrt(qa * qb), 6))
        .alias("centroid_cosine"),
        F.when(ok & (na > 0) & (nb > 0), F.round(
            (F.sqrt(qa) * F.lit(float(nb)))
            / (F.sqrt(qb) * F.lit(float(na))), 6))
        .alias("centroid_norm_ratio"))


def intrinsic_dimension(corpus: DataFrame, queries: DataFrame,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        query_id_col: str = "query_id") -> DataFrame:
    """TwoNN intrinsic-dimension estimate (Facco et al. 2017) of the
    embedding manifold: for each sampled point, the ratio of its 2nd
    to 1st nearest-neighbor distance; ID_hat = n / sum(ln mu) — low
    intrinsic dimension means the space compresses (PQ, prefix
    truncation, aggressive ANN) far below its ambient width.

    Exactness: neighbors rank on the UNROUNDED squared Euclidean
    distance with an id tie-break (the embed_topk contract);
    ln(mu) = 0.5 * ln(d2/d1) quantizes to 1e12 integers before the
    sum.  Points whose nearest neighbor is an exact duplicate
    (d1 = 0) are excluded from the estimate and counted separately.

    Scale shape: broadcast(queries) x corpus -> per-query window
    top-2; |queries| bounds everything after the scan.

    Identity contract: a corpus candidate sharing a query's id is
    treated as the query row itself and excluded from that query's
    candidates (ids are identities; for guaranteed-external query
    sets use ids disjoint from the corpus).
    """
    from ..scale import fan_out

    q = queries.select(F.col(query_id_col).alias("__qid"),
                       F.col(vec_col).alias("__qvec"))
    cand = (fan_out(corpus.select(F.col(id_col), F.col(vec_col)))
            .crossJoin(F.broadcast(q))
            .filter(F.col(id_col) != F.col("__qid")))
    d2 = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("__qvec"),
                   lambda a, b: (a.cast("double") - b.cast("double"))
                   * (a.cast("double") - b.cast("double"))),
        F.lit(0.0), lambda acc, x: acc + x)
    w = Window.partitionBy("__qid").orderBy(
        F.col("__d2").asc(), F.col(id_col).asc())
    top2 = (cand.select("__qid", F.col(id_col), d2.alias("__d2"))
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= 2))
    per = top2.groupBy("__qid").agg(
        F.min(F.when(F.col("__r") == 1, F.col("__d2"))).alias("__d1"),
        F.min(F.when(F.col("__r") == 2, F.col("__d2"))).alias("__dd2"))
    lnq = F.floor(F.lit(0.5) * F.log(F.col("__dd2") / F.col("__d1"))
                  * F.lit(1e12) + F.lit(0.5)).cast("bigint")
    usable = (F.col("__d1") > F.lit(0.0)) & F.col("__dd2").isNotNull()
    agg = per.agg(
        F.sum(F.when(usable, 1).otherwise(0)).alias("n_used"),
        F.sum(F.when(~usable, 1).otherwise(0)).alias("n_degenerate"),
        F.sum(F.when(usable, lnq).otherwise(0)).alias("__ls"))
    ok = (F.col("n_used") > 0) & (F.col("__ls") > 0)
    return agg.select(
        F.col("n_used").cast("bigint").alias("n_used"),
        F.col("n_degenerate").cast("bigint").alias("n_degenerate"),
        F.when(ok, F.round(
            F.col("n_used").cast("double")
            / (F.col("__ls").cast("double") / 1e12), 6))
        .alias("intrinsic_dim"))


def cosine_histogram(corpus: DataFrame, queries: DataFrame,
                     buckets: int = 20, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Pairwise-cosine distribution report: histogram of cosine
    similarities between a probe sample and the corpus — the
    embedding-space health check (anisotropy shows up as a mass
    spike near +1; a healthy space spreads) and the calibration input
    for choosing near-dup / ANN thresholds.

    Bucket = floor((cos+1)/2 * buckets) clamped to the top bucket —
    pure comparisons on the unrounded cosine, so counts are exact
    integers in any engine.

    Scale shape: broadcast(queries) x corpus -> one bounded partial
    agg onto <= `buckets` groups; |queries| bounds the pair stream.

    Identity contract: a corpus candidate sharing a query's id is
    treated as the query row itself and excluded from that query's
    candidates (ids are identities; for guaranteed-external query
    sets use ids disjoint from the corpus).
    """
    from ..scale import fan_out

    q = queries.select(F.col(query_id_col).alias("__qid"),
                       F.col(vec_col).alias("__qvec"))
    cand = (fan_out(corpus.select(F.col(id_col), F.col(vec_col)))
            .crossJoin(F.broadcast(q))
            .filter(F.col(id_col) != F.col("__qid")))
    cos = cosine(F.col(vec_col), F.col("__qvec"))
    b = F.least(F.floor((cos + F.lit(1.0)) / F.lit(2.0)
                        * buckets).cast("int"),
                F.lit(buckets - 1))
    g = cand.select(F.greatest(b, F.lit(0)).alias("bucket")).groupBy(
        "bucket").agg(F.count(F.lit(1)).alias("n_pairs"))
    tot = g.agg(F.sum("n_pairs").alias("__t"))
    j = g.crossJoin(F.broadcast(tot))
    return j.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.round(F.col("n_pairs").cast("double")
                / F.col("__t").cast("double"), 6).alias("share"))
