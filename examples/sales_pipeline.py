"""End-to-end pub/sub pipeline example — the migration target for a
tabsdata user.

Shape (reference README.md:14-27): a *publisher* ingests external CSVs into
a versioned table, a *transformer* derives an aggregate table, and a
*subscriber* exports it — wired by the trigger DAG so publishing new data
re-runs everything downstream in one atomic transaction per function.

Run:  python examples/sales_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tabsdata_spark as td
from tabsdata_spark.pubsub import PubSubEngine
from tabsdata_spark.store.table_store import TableStore
from tabsdata_spark.store import services


def main() -> None:
    spark = td.get_spark(app_name="sales-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    work = Path(tempfile.mkdtemp(prefix="tdspark_example_"))
    src = work / "incoming"
    src.mkdir()
    (src / "2024-01.csv").write_text(
        "region,amount\nEMEA,100\nAMER,250\nEMEA,50\n")
    out_dir = work / "export"

    store = TableStore(str(work / "warehouse"))
    engine = PubSubEngine(spark, store)

    @td.publisher(td.LocalFileSource(str(src / "*.csv"), format="csv"),
                  tables="sales_raw")
    def ingest(tf):
        return tf.filter(td.col("amount") > 0)

    @td.transformer(input_tables=["sales_raw"], output_tables=["sales_by_region"])
    def summarize(tf):
        return (tf.group_by("region")
                .agg(total=td.col("amount").sum(),
                     n=td.col("amount").count()))

    @td.subscriber(tables=["sales_by_region"],
                   destination=td.LocalFileDestination(
                       str(out_dir), format="csv", single_file=True))
    def export(tf):
        return tf.sort("region")

    for fn in (ingest, summarize, export):
        engine.register("sales", fn)

    # 1st trigger: full cascade
    reports = engine.trigger("sales", "ingest")
    print("run 1:", [(r.function, r.status) for r in reports])

    # New data arrives -> trigger again.  The incremental source publishes
    # only files newer than the stored offset, so the new table version is
    # that run's DELTA (reference semantics: a version is one run's output;
    # to accumulate, a transformer self-depends on its own table —
    # input_tables=[..., "acc@HEAD"] with trigger_by excluding it; see
    # test_self_dependent_accumulator).
    (src / "2024-02.csv").write_text("region,amount\nAPAC,300\nEMEA,25\n")
    reports = engine.trigger("sales", "ingest")
    print("run 2:", [(r.function, r.status) for r in reports])

    # versioned reads: HEAD vs previous
    head = store.read(spark, "sales", "sales_by_region").sort("region").to_dict()
    print("HEAD:  ", head)
    prev = store.read(spark, "sales", "sales_by_region", "HEAD~1") \
        .sort("region").to_dict()
    print("HEAD~1:", prev)

    # REST-style sample service with SQL
    top = services.sample_table(
        spark, store, "sales/sales_by_region",
        sql="SELECT region, total FROM sales_by_region ORDER BY total DESC")
    print("sample:", top)


if __name__ == "__main__":
    main()
