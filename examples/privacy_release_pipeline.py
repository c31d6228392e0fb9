"""Privacy release-gate pipeline example: the pre-publication composition.

documents -> PII density + per-pattern breakdown (rank sources by risk)
-> redact -> cross-source duplication matrix (mirror detection) ->
stratified train/val/test split; events -> k-anonymity audit ->
generalization-ladder k-anonymization -> published equivalence classes.

This is the gate a training-data release runs before anything leaves the
building: measure what each source leaks, scrub it, verify the published
event aggregates cannot re-identify anyone, and prove the splits stay
representative per language.

Every stage is pure expression work or bounded-output aggregation: PII
scanning is chained JVM regex at scan speed, the dup matrix is a
fingerprint-keyed equi-join onto a |sources|^2 grid, k-anonymization
publishes class SIZES (never raw identifiers), and the split report is
one count shuffle.  At 100 TB nothing here widens beyond key-partitioned
shuffles and broadcast scalars.

Run:  python examples/privacy_release_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

import tabsdata_spark as td
from tabsdata_spark.llm import dedup, textual
from tabsdata_spark.queries import load_events

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = td.get_spark(app_name="privacy-release-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1. measure: which sources leak PII, and which kind
    density = textual.pii_density(docs).orderBy(F.col("pii_rate").desc())
    worst = density.first()
    print(f"highest-risk source: {worst['source']} "
          f"(pii_rate={worst['pii_rate']}, chars_delta={worst['chars_delta']})")
    patterns = textual.pii_pattern_counts(docs)
    top_pat = (patterns.orderBy(F.col("rate").desc()).first())
    print(f"most-leaked pattern: {top_pat['pattern']} in {top_pat['source']} "
          f"(rate={top_pat['rate']})")

    # 2. scrub: chained-regex redaction at scan speed
    clean = docs.withColumn("text", textual.redact_pii(F.col("text")))
    still = clean.filter(F.col("text") != textual.redact_pii(F.col("text")))
    assert still.count() == 0, "redaction must be idempotent"
    print(f"redacted corpus: {clean.count()} docs, 0 residual PII matches")

    # 3. mirror check: cross-source duplication matrix (syndicated feeds
    #    re-leak what one source redacts poorly)
    matrix = dedup.cross_source_dup_matrix(docs)
    dup_pairs = matrix.filter(F.col("shared") > 0).count()
    print(f"cross-source dup matrix: {matrix.count()} pairs, "
          f"{dup_pairs} with shared content")

    # 4. representative splits: per-language stratified assignment
    split = textual.stratified_split_report(clean, "lang", "doc_id")
    spread = (split.filter(F.col("split") == "train")
              .agg(F.min("share"), F.max("share")).first())
    print(f"train share across languages: {spread[0]}-{spread[1]}")

    # 5. events side: audit, then publish k-anonymous aggregates
    ev = load_events(spark, SF_DIR).df
    audit = textual.k_anonymity_report(
        ev, ["user_id", "event_type"], k=5)
    violating = (audit.filter(F.col("violates_k"))
                 .agg(F.coalesce(F.sum("rows_covered"), F.lit(0))).first()[0])
    print(f"k-anonymity audit at raw granularity: {violating} rows in "
          f"violating classes")

    h = F.hour("ts")
    h6 = (F.floor(h / 6).cast("bigint") * 6)
    ladder = [
        [F.col("user_id") % 100, F.col("event_type"), h],
        [F.col("user_id") % 100, F.col("event_type"), h6],
        [F.col("user_id") % 20, F.col("event_type"), h6],
        [F.lit("*"), F.col("event_type"), h6],
    ]
    published = textual.k_anonymize(ev, ladder, ["q1", "q2", "q3"], k=5)
    lvl = published.select(F.max("level")).first()[0]
    assert published.filter(F.col("n") < 5).count() == 0 or lvl == 3
    print(f"published {published.count()} equivalence classes at ladder "
          f"level {lvl}; every class >= k or fully suppressed")


if __name__ == "__main__":
    main()
