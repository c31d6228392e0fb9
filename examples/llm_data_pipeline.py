"""LLM training-data pipeline example: the 100 TB-shaped composition.

documents -> normalize -> exact dedup -> paragraph-level dedup ->
MinHash-LSH candidates -> transitive clusters (keep the BEST copy per
cluster) -> benchmark decontamination (Bloom bitset probe) -> quality
filter -> token-budget selection -> versioned store (hive-partitioned by
source).

Every stage is a DataFrame transform: shingle/minhash work is JVM-side
(xxhash64 + affine permutations), candidate generation shuffles band keys
not pairs, component resolution is O(diameter) label-propagation rounds,
and quality/token scoring is pure expression work.  At scale the only knobs
are partition counts and LSH band/bucket caps.

Run:  python examples/llm_data_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

import tabsdata_spark as td
from tabsdata_spark import scale
from tabsdata_spark.llm import bpe, corpus, decontam, dedup, textual
from tabsdata_spark.store.table_store import TableStore

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = td.get_spark(app_name="llm-data-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()

    # 0. canonicalize raw text (quotes/dashes/control chars/whitespace)
    #    BEFORE any fingerprinting, so trivially-different copies collide
    docs = docs.withColumn("text", textual.normalize_text(F.col("text")))

    # 1. exact dedup (hash-groupBy on normalized text)
    docs = dedup.dedup_exact(docs, key_cols=["text"])
    n1 = docs.count()

    # 1b. paragraph-level exact dedup (C4/RefinedWeb line dedup): drop
    #     repeated 20-word segments corpus-wide, rebuild the documents
    seg = dedup.segment_dedup(docs)
    docs = (docs.drop("text")
            .join(seg.filter(F.col("segs_kept") > 0)
                     .select("doc_id", F.col("text_dedup").alias("text")),
                  "doc_id"))

    # 2. near-dup: LSH candidates -> exact-Jaccard verify -> transitive
    #    clusters -> keep one representative per cluster
    cands = dedup.minhash_lsh_candidates(docs)
    confirmed = dedup.ngram_jaccard_pairs(docs, cands.select("id_a", "id_b"),
                                          prune_to_pairs=False) \
        .filter(F.col("jaccard") >= 0.6)
    #    keep the LONGEST copy of every duplicate cluster, not the min id —
    #    near-dup web pages usually differ by truncation
    docs = dedup.dedup_keep_best(docs, confirmed.select("id_a", "id_b"),
                                 "n_chars")
    n2 = docs.count()

    # 2b. benchmark decontamination: eval-set 5-grams as an 8 KiB Bloom
    #     bitset probed at scan speed — zero corpus-side joins
    benchmark = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .filter(F.col("doc_id") % 97 == 0)
    flagged = decontam.bloom_contamination(docs, benchmark, n=5)
    docs = docs.join(flagged.select("doc_id"), "doc_id", "left_anti")

    # 3. quality filter + readability band + token counts (pure JVM
    #    expressions; Flesch-Kincaid rejects fragment soup and run-ons)
    scored = (docs.withColumn("quality", textual.quality_score(F.col("text")))
              .withColumn("fk_grade", textual.readability(F.col("text"))))
    kept = scored.filter((F.col("quality") >= 0.3)
                         & F.col("fk_grade").between(-20, 60)) \
        .withColumn("n_tokens", textual.token_count(F.col("text")))
    n3 = kept.count()

    # 3b. token-budget selection: keep the best-quality bin-prefix that
    #     fits 80%% of the surviving token mass (the "we can afford N
    #     tokens" cut, histogram-bounded — no global sort)
    total_tokens = kept.agg(F.sum("n_tokens")).first()[0]
    budget = corpus.token_budget_select(kept, int(total_tokens * 0.8))
    kept = kept.join(budget.select("doc_id"), "doc_id", "left_semi")
    n4 = kept.count()

    # 4. commit as a versioned table (atomic publish)
    work = tempfile.mkdtemp(prefix="tdspark_llm_")
    store = TableStore(os.path.join(work, "warehouse"))
    ver = store.write(kept, "corpus", "training_docs",
                      partition_by=["source"])  # scans prune by source

    print(f"docs: {n0} -> exact-dedup {n1} -> near-dup(keep-best) {n2} "
          f"-> quality-filtered {n3} -> budget-selected {n4}")
    print(f"published corpus/training_docs version {ver}")
    print("token total:",
          kept.agg(F.sum("n_tokens").alias("t")).first().t)

    # 5. tokenize the final corpus: train BPE merges on the surviving docs
    #    (one word-count shuffle + driver merge loop), encode Arrow-batched
    merges = bpe.train_bpe(kept, num_merges=64, max_vocab_words=20_000)
    encoded = bpe.bpe_encode(kept, merges)
    print("bpe tokens:",
          encoded.agg(F.sum(F.size("bpe_tokens")).alias("t")).first().t)

    # 6. rebalance the language mix (share^0.5 temperature sampling — the
    #    XLM-R recipe, a pure row-hash filter) and assign training shards
    #    deterministically, checking the balance BEFORE materializing
    mix = corpus.temperature_sample(kept, "lang", "doc_id", alpha=0.5)
    final = kept.join(mix.select("doc_id"), "doc_id", "left_semi")
    shards = scale.shard_assign(final, "doc_id", n_shards=8,
                                weight_col="n_tokens")
    report = shards.orderBy("shard").collect()
    print(f"tempered mix: {final.count()} docs -> 8 shards, "
          f"balance {min(r.balance_ratio for r in report):.3f}"
          f"-{max(r.balance_ratio for r in report):.3f}")


if __name__ == "__main__":
    main()
