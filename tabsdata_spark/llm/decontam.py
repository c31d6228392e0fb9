"""Benchmark decontamination + corpus boilerplate detection.

Training-data hygiene operators (reference has no counterpart; semantics
follow the published GPT-3/PaLM appendix recipes): remove or flag training
documents that share high-order n-grams with an evaluation benchmark, and
surface n-grams repeated across many documents (boilerplate/templates).

Scale shape: the benchmark side of decontamination is small by nature
(eval sets are thousands of documents), so its distinct n-gram set is
broadcast and the corpus side never shuffles — one scan, one broadcast
hash join, one partial-agg groupBy on doc id.  Boilerplate detection is
one explode + map-side-combined groupBy on the gram; the min-docs
threshold prunes the long unique tail before any further join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .dedup import shingles


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """(doc_id, n_contaminated_grams) for every training doc sharing at
    least `min_hits` distinct word `n`-grams with the benchmark corpus.

    `shingles` is per-document distinct, so the count after the gram join
    is exactly the number of distinct shared n-grams.  The benchmark gram
    set is explicitly broadcast: at 100 TB the corpus side stays
    shuffle-free (the only exchange is the final partial-agg on doc id).
    """
    bench_grams = (
        benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), n)).alias("gram"),
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
        .filter(F.col("n_contaminated_grams") >= min_hits)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """Drop contaminated docs (left-anti against `contamination`)."""
    bad = contamination(docs, benchmark, id_col, text_col, n, min_hits) \
        .select(id_col)
    return docs.join(bad, on=id_col, how="left_anti")


def boilerplate_ngrams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 3,
) -> DataFrame:
    """(gram, n_docs) for word n-grams appearing in >= `min_docs` distinct
    documents — template/boilerplate text that near-dup pipelines should
    down-weight.  Per-doc distinct shingles make count() == distinct-doc
    count with no count_distinct shuffle amplification."""
    grams = docs.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), n)).alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def bloom_bitset(benchmark: DataFrame, text_col: str = "text", n: int = 5,
                 m_bits: int = 1 << 16, k_hashes: int = 3,
                 hash_fn=None) -> list[int]:
    """Build a Bloom filter (list of 64-bit words, driver-side) over the
    benchmark's distinct word n-grams.  Bit positions come from
    `hash(j + "|" + gram) % m_bits` for j in 0..k-1.  The default hash is
    xxhash64 (JVM-side, the production path); pass
    `hash_fn=portable_hash60` when an external oracle must recompute the
    identical bit set (the registry query does — ~3x slower per gram).

    The collect is bounded by the BENCHMARK size (eval sets are thousands
    of documents by nature — the same smallness assumption the broadcast
    join in `contamination` already makes); the returned bitset is
    m_bits/8 bytes regardless of benchmark size, e.g. 8 KiB at the
    default 2^16 bits."""
    hf = hash_fn or F.xxhash64
    g = benchmark.select(
        F.explode(shingles(F.col(text_col), n)).alias("gram")).distinct()
    # pmod: xxhash64 is signed; portable_hash60 is non-negative (same result)
    pos_cols = [
        ((hf(F.concat(F.lit(f"{j}|"), F.col("gram"))) % m_bits + m_bits)
         % m_bits).alias(f"p{j}")
        for j in range(k_hashes)
    ]
    rows = (g.select(F.explode(F.array(*pos_cols)).alias("pos"))
            .distinct().collect())
    words = [0] * ((m_bits + 63) // 64)
    for r in rows:
        p = int(r["pos"])
        words[p // 64] |= 1 << (p % 64)
    # literals are signed 64-bit in Spark: wrap to the signed range
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_contains(gram, words: list[int], m_bits: int = 1 << 16,
                   k_hashes: int = 3, hash_fn=None):
    """Boolean Column: all `k_hashes` Bloom bits for `gram` are set in
    `words` (the bitset from `bloom_bitset`; same `hash_fn` required).
    Pure JVM expressions — element_at on a literal array + bit_get —
    evaluated at scan speed with no join and no shuffle on the probe
    side."""
    hf = hash_fn or F.xxhash64
    arr = F.lit(words)
    cond = F.lit(True)
    for j in range(k_hashes):
        p = (hf(F.concat(F.lit(f"{j}|"), gram)) % m_bits + m_bits) % m_bits
        word = F.element_at(arr, (p / F.lit(64)).cast("int") + 1)
        cond = cond & (F.bit_get(word, (p % 64).cast("int")) == 1)
    return cond


def bloom_contamination(docs: DataFrame, benchmark: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 5, m_bits: int = 1 << 16,
                        k_hashes: int = 3, hash_fn=None) -> DataFrame:
    """(doc_id, n_bloom_hits) for docs with at least one n-gram whose
    Bloom membership test passes against the benchmark gram set.

    The scale story vs `contamination`'s broadcast join: the corpus side
    does ZERO joins — each task probes a fixed-size literal bitset
    (m_bits/8 bytes shipped once per executor inside the serialized plan),
    so the only exchange in the whole plan is the final partial-agg on doc
    id.  The price is Bloom false positives (~(1-e^{-kn/m})^k); callers
    either accept the over-flagging (removal is the safe direction for
    decontamination) or re-verify flagged docs with the exact join, which
    then runs on the tiny flagged subset."""
    words = bloom_bitset(benchmark, text_col, n, m_bits, k_hashes, hash_fn)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), n)).alias("gram"))
    return (doc_grams
            .filter(bloom_contains(F.col("gram"), words, m_bits, k_hashes,
                                   hash_fn))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bloom_hits")))


def semantic_decontaminate(corpus_emb: DataFrame, bench_emb: DataFrame,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           threshold: float = 0.85) -> DataFrame:
    """Embedding-level benchmark decontamination: flag every corpus vector
    whose cosine similarity to ANY benchmark vector reaches `threshold`,
    reporting the best-matching benchmark id (ties -> smallest id).

    Semantic twin of the n-gram `contamination` operator — catches
    paraphrased benchmark leakage that exact n-gram overlap misses
    (SemDeDup/Phi-style decontamination, public recipes).

    Scale shape: the benchmark side is small by nature (eval suites are
    thousands of rows), so it is broadcast and the corpus side NEVER
    shuffles — one scan, one broadcast nested-loop prune, one partial-agg
    max per corpus id.  Norms are precomputed ONCE PER ROW on each side
    before the join, so the per-pair condition is a single dot-product
    array pass instead of dot + two norms (3x less lambda work over the
    |corpus|*|bench| pair stream); the value is still the bit-identical
    dot/(na*nb) expression tree of the similarity suite, and the threshold
    filters on the UNROUNDED value (round is display-only, see NOTES
    oracle rules)."""
    from tabsdata_spark.llm import similarity as sim

    left = corpus_emb.select(F.col(id_col).alias("corpus_id"),
                             F.col(vec_col).alias("__cv"),
                             sim.norm(F.col(vec_col)).alias("__cn"))
    right = bench_emb.select(F.col(id_col).alias("bench_id"),
                             F.col(vec_col).alias("__bv"),
                             sim.norm(F.col(vec_col)).alias("__bn"))
    cos = sim.dot(F.col("__cv"), F.col("__bv")) \
        / (F.col("__cn") * F.col("__bn"))
    pairs = (left.join(F.broadcast(right),
                       cos >= F.lit(threshold), "inner"))
    best = (pairs.groupBy("corpus_id")
            .agg(F.max(F.struct(cos.alias("c"),
                                (-F.col("bench_id")).alias("nb")))
                 .alias("__best"))
            .select("corpus_id",
                    (-F.col("__best.nb")).alias("bench_id"),
                    F.round(F.col("__best.c"), 6).alias("cosine")))
    return best


def ngram_novelty(docs: DataFrame, reference: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3) -> DataFrame:
    """Per-document novelty against a reference corpus: the fraction of
    the document's DISTINCT word n-grams absent from the reference's
    distinct gram set — the dedup-aware sampling signal (novel documents
    add information; low-novelty ones mostly restate the reference).

    Returns (doc_id, n_grams, n_novel, novelty = n_novel / n_grams).

    Scale shape: unlike `contamination` (whose benchmark side is small by
    nature and broadcast), the reference here is CORPUS-sized, so its
    distinct gram set joins on the gram key with NO broadcast hint — AQE
    picks the strategy; both sides partial-agg before the exchange, the
    per-doc ratio is one more keyed agg."""
    from .dedup import shingles

    ref_g = (reference.select(F.explode(
        shingles(F.col(text_col), n)).alias("gram"))
        .dropDuplicates()
        .withColumn("__seen", F.lit(1)))
    doc_g = docs.select(F.col(id_col),
                        F.explode(shingles(F.col(text_col), n)).alias("gram"))
    j = doc_g.join(ref_g, "gram", "left")
    return (j.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.count(F.when(F.col("__seen").isNull(), 1))
                 .alias("n_novel"))
            .select(id_col, "n_grams", "n_novel",
                    F.round(F.col("n_novel").cast("double")
                            / F.col("n_grams").cast("double"), 6)
                    .alias("novelty")))


def bloom_fpr_report(corpus: DataFrame, benchmark: DataFrame,
                     text_col: str = "text", n: int = 5,
                     m_bits: int = 1 << 16, k_hashes: int = 3,
                     hash_fn=None) -> DataFrame:
    """Bloom-filter false-positive-rate calibration: build the bitset
    over the benchmark's n-grams, probe it with the corpus grams that
    are PROVABLY absent (anti-joined against the benchmark's exact
    gram set), and report the measured FPR next to the load-based
    expectation (bits_set/m)^k — the sketch-measurement twin of
    minhash_jaccard_calibration, sizing m/k before trusting the
    zero-join decontamination path at corpus scale.

    Exactness: false-positive counts are exact integers; measured and
    expected rates are fixed IEEE expressions (round 6; the power is
    spelled as an explicit product, not POW).

    Scale shape: the bitset build collects benchmark-bounded rows (the
    bloom_bitset contract); negatives come from ONE distinct + ONE
    anti-join on grams; probing is pure expressions — no joins on the
    probe side."""
    words = bloom_bitset(benchmark, text_col=text_col, n=n,
                         m_bits=m_bits, k_hashes=k_hashes,
                         hash_fn=hash_fn)
    bits_set = sum(bin(w & ((1 << 64) - 1)).count("1") for w in words)
    bench_g = benchmark.select(
        F.explode(shingles(F.col(text_col), n)).alias("gram")).distinct()
    corp_g = corpus.select(
        F.explode(shingles(F.col(text_col), n)).alias("gram")).distinct()
    negatives = corp_g.join(bench_g, "gram", "left_anti")
    hit = bloom_contains(F.col("gram"), words, m_bits=m_bits,
                         k_hashes=k_hashes, hash_fn=hash_fn)
    agg = negatives.agg(
        F.count(F.lit(1)).alias("n_neg_probes"),
        F.sum(F.when(hit, 1).otherwise(0)).alias("n_false_pos"))
    load = float(bits_set) / float(m_bits)
    expected = load
    for _ in range(k_hashes - 1):
        expected = expected * load
    return agg.select(
        F.lit(int(bits_set)).cast("bigint").alias("n_bits_set"),
        F.col("n_neg_probes").cast("bigint").alias("n_neg_probes"),
        F.col("n_false_pos").cast("bigint").alias("n_false_pos"),
        F.round(F.col("n_false_pos").cast("double")
                / F.col("n_neg_probes").cast("double"), 6)
        .alias("measured_fpr"),
        F.round(F.lit(expected), 6).alias("expected_fpr"))
