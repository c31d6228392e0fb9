"""One-call corpus curation: the composition from examples/llm_data_pipeline
as a library surface, so a user gets the standard web-corpus recipe
(normalize -> exact dedup -> paragraph dedup -> near-dup keep-best ->
decontaminate -> quality gate -> token budget) with one function and a
per-stage audit report.

Every stage is the scale-shaped operator documented in its own module;
this file only composes them.  Stage counts are collected driver-side
(one count() per enabled stage — each a cheap aggregate; pass
`report=False` to skip them and keep the whole pipeline lazy)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from . import decontam, dedup, textual
from .corpus import token_budget_select


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    normalize: bool = True,
    exact: bool = True,
    segment_dedup: bool = True,
    near_dup_threshold: float | None = 0.6,
    keep: str = "best",
    order_col: str | None = None,
    benchmark: DataFrame | None = None,
    quality_min: float | None = 0.3,
    token_budget: int | None = None,
    report: bool = True,
) -> tuple[DataFrame, dict]:
    """Returns (curated_docs, report).  `keep='best'` keeps the longest
    copy per near-dup cluster (or by `order_col` if given); `keep='min'`
    keeps the min id.  `benchmark` enables Bloom decontamination.
    `token_budget` keeps the best-quality bin-prefix fitting the budget."""
    rep: dict = {}

    def note(stage: str, df: DataFrame) -> None:
        if report:
            rep[stage] = df.count()

    note("input", docs)

    if normalize:
        docs = docs.withColumn(text_col,
                               textual.normalize_text(F.col(text_col)))
    if exact:
        docs = dedup.dedup_exact(docs, key_cols=[text_col], id_col=id_col)
        note("exact_dedup", docs)
    if segment_dedup:
        seg = dedup.segment_dedup(docs, id_col=id_col, text_col=text_col)
        docs = (docs.drop(text_col)
                .join(seg.filter(F.col("segs_kept") > 0)
                      .select(id_col, F.col("text_dedup").alias(text_col)),
                      id_col))
        note("segment_dedup", docs)
    if near_dup_threshold is not None:
        cands = dedup.minhash_lsh_candidates(docs, id_col, text_col)
        # candidates are an unmaterialized lineage over the same docs:
        # verify against the full shingled corpus (prune would re-run LSH)
        confirmed = dedup.ngram_jaccard_pairs(
            docs, cands.select("id_a", "id_b"), id_col, text_col,
            prune_to_pairs=False) \
            .filter(F.col("jaccard") >= near_dup_threshold) \
            .select("id_a", "id_b")
        if keep == "best":
            oc = order_col
            if oc is None:
                docs = docs.withColumn("__len", F.length(F.col(text_col)))
                oc = "__len"
            docs = dedup.dedup_keep_best(docs, confirmed, oc, id_col=id_col)
            if order_col is None:
                docs = docs.drop("__len")
        else:
            docs = dedup.dedup_by_components(docs, confirmed, id_col=id_col)
        note("near_dedup", docs)
    if benchmark is not None:
        flagged = decontam.bloom_contamination(
            docs, benchmark, id_col=id_col, text_col=text_col)
        docs = docs.join(flagged.select(id_col), id_col, "left_anti")
        note("decontaminated", docs)
    if quality_min is not None:
        docs = docs.withColumn(
            "quality", textual.quality_score(F.col(text_col))) \
            .filter(F.col("quality") >= quality_min)
        note("quality_gated", docs)
    if token_budget is not None:
        sel = token_budget_select(docs, token_budget, id_col=id_col,
                                  text_col=text_col)
        docs = docs.join(sel.select(id_col), id_col, "left_semi")
        note("budget_selected", docs)
    return docs, rep
