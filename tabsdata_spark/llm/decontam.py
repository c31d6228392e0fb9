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
