"""Pipeline-evaluation example: measure everything before trusting it.

The other examples BUILD datasets; this one grades the machinery itself —
the sketches, filters, indexes, and classifiers a 100 TB pipeline leans
on — using the exact-measurement operators:

sketch accuracy   -> MinHash estimate vs exact Jaccard calibration,
                     Bloom-filter measured FPR vs load expectation
index quality     -> NDCG@10 of brute-force retrieval against labels,
                     Matryoshka prefix-dim truncation report,
                     reciprocal-NN seed-pair yield
classifier checks -> exact tie-aware ROC AUC, precision/recall curve,
                     Cohen's kappa of language-ID vs truth
distribution gate -> two-sample KS between user cohorts

Every number is driver-grade exact (integer-quantized sums, fixed IEEE
expressions), so a regression in ANY component flips a hard value, not a
vibe.

Run:  python examples/eval_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

import tabsdata_spark as td
from tabsdata_spark import stats
from tabsdata_spark.llm import decontam, dedup, similarity, textual

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = td.get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # 1. sketch calibration: is 16 hashes enough for our near-dup gate?
    cal = dedup.minhash_jaccard_calibration(
        docs.filter(F.col("doc_id") < 60), num_hashes=16)
    worst = cal.agg(F.max("abs_err"), F.avg("abs_err")).first()
    print(f"minhash calibration: max |est-exact| = {worst[0]}, "
          f"mean = {round(worst[1], 4)}")

    # 2. Bloom FPR: measured vs load expectation
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corp = docs.filter(F.col("doc_id") % 97 != 0)
    fpr = decontam.bloom_fpr_report(corp, bench).first()
    print(f"bloom fpr: measured {fpr['measured_fpr']} vs expected "
          f"{fpr['expected_fpr']} over {fpr['n_neg_probes']} negatives")

    # 3. retrieval quality: NDCG@10 with labels as relevance
    qs = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding", "label")
    ndcg = similarity.ndcg_at_k(emb, qs, k=10)
    mean_ndcg = ndcg.agg(F.avg("ndcg")).first()[0]
    print(f"retrieval NDCG@10 over 20 queries: {round(mean_ndcg, 4)}")

    # 4. can a 16-dim prefix front the index?
    pq = similarity.prefix_dim_quality(emb, qs.drop("label"),
                                       prefix_dim=16)
    agree = pq.agg(F.avg(F.col("top1_agree").cast("double")),
                   F.avg("mean_abs_cos_delta")).first()
    print(f"prefix-16 top1 agreement {round(agree[0], 3)}, "
          f"mean |cos delta| {round(agree[1], 4)}")

    # 5. reciprocal-NN seed pairs for semantic dedup
    rnn = similarity.reciprocal_nn(emb.filter(F.col("vec_id") < 200), k=5)
    print(f"reciprocal-NN seed pairs (k=5, 200 vecs): {rnn.count()}")

    # 6. classifier checks: token count as an English detector
    base = docs.select(
        F.size(textual.tokens(F.lower(F.col("text")))).alias("s"),
        (F.col("lang") == "en").alias("lab"))
    auc = stats.roc_auc(base, "s", "lab").first()["auc"]
    kappa = stats.cohens_kappa(
        docs.select(F.col("lang").alias("a"),
                    textual.language_id(F.col("text")).alias("b")),
        "a", "b").first()["kappa"]
    print(f"doc-length AUC for English: {auc}; language-ID kappa: {kappa}")

    # 7. distribution gate: did cohort values drift?
    from tabsdata_spark.queries import load_events
    ev = load_events(spark, SF_DIR).df
    ks = stats.ks_test(
        ev.filter(F.col("value").isNotNull())
          .select(F.floor("value").cast("bigint").alias("b"),
                  (F.col("user_id") % 2 == 0).alias("c")),
        "b", "c").first()
    print(f"cohort KS distance: {ks['ks_d']} "
          f"(n={ks['n_1']}/{ks['n_2']})")

    assert mean_ndcg is not None and auc is not None
    print("eval pipeline complete")


if __name__ == "__main__":
    main()
