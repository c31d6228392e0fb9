"""File-format IO and Structured-Streaming extension tests."""

from __future__ import annotations

import datetime as dt
import os

import pyspark.sql.functions as F
import pytest

import tabsdata_spark as td
from tabsdata_spark.io.file_io import LocalFileDestination, LocalFileSource
from tabsdata_spark.store.table_store import TableStore
from tabsdata_spark.streaming import bus


def test_ndjson_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    out = str(tmp_path / "out.ndjson")
    LocalFileDestination(out, format="ndjson").save(df)
    back, _ = LocalFileSource(out, format="ndjson").load(spark)
    assert sorted((r.k, r.v) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_log_format_single_column(spark, tmp_path):
    p = tmp_path / "app.log"
    p.write_text("line one\nline two\n")
    df, _ = LocalFileSource(str(p), format="log").load(spark)
    assert df.columns == ["log"]
    assert sorted(r.log for r in df.collect()) == ["line one", "line two"]


def test_csv_separator_option(spark, tmp_path):
    p = tmp_path / "data.tsv"
    p.write_text("k;v\n1;x\n2;y\n")
    df, _ = LocalFileSource(str(p), format=td.CSVFormat(separator=";")).load(spark)
    assert sorted((r.k, r.v) for r in df.collect()) == [(1, "x"), (2, "y")]


def test_incremental_last_modified(spark, tmp_path):
    a = tmp_path / "a.csv"
    a.write_text("k\n1\n")
    src = LocalFileSource(str(tmp_path / "*.csv"), format="csv")
    df1, offset1 = src.load(spark)
    assert df1.count() == 1 and offset1 is not None
    # nothing newer than offset -> no files kept
    src2 = LocalFileSource(str(tmp_path / "*.csv"), format="csv",
                           initial_last_modified=offset1)
    paths, _ = src2._filtered_paths()
    assert paths == []
    # a newer file appears -> only it is picked up
    os.utime(a, (0, 0))  # push a into the past
    b = tmp_path / "b.csv"
    b.write_text("k\n2\n")
    paths2, _ = src2._filtered_paths()
    assert paths2 == [str(b)]


def test_incremental_no_new_files_yields_empty_frame(spark, tmp_path):
    """A run with nothing newer than the offset is a no-op, not a failure:
    load() must return an empty frame with the source schema (ADVICE r1 —
    reader.load([]) used to raise unable-to-infer-schema)."""
    (tmp_path / "a.csv").write_text("k,v\n1,x\n")
    src = LocalFileSource(str(tmp_path / "*.csv"), format="csv")
    _, offset1 = src.load(spark)
    src2 = LocalFileSource(str(tmp_path / "*.csv"), format="csv",
                           initial_last_modified=offset1)
    df2, _ = src2.load(spark)
    assert df2.columns == ["k", "v"] and df2.count() == 0


def test_avro_roundtrip_pure_python(spark, tmp_path):
    """Without the spark-avro jar, the avro_py container codec serves the
    format: distributed write -> distributed read, values preserved."""
    df = spark.createDataFrame(
        [(1, "a", 1.5, [1, 2]), (2, None, 2.5, []), (3, "c", -0.25, [7])],
        "k long, s string, d double, arr array<long>")
    dest = LocalFileDestination(str(tmp_path / "o.avro"), format="avro")
    out_path = dest.save(df)
    src = LocalFileSource(out_path + "/*.avro", format="avro")
    back, _ = src.load(spark)
    rows = sorted((r.k, r.s, r.d, r.arr) for r in back.collect())
    assert rows == [(1, "a", 1.5, [1, 2]), (2, None, 2.5, []),
                    (3, "c", -0.25, [7])]


def test_avro_codec_matches_jvm_avro(spark, tmp_path):
    """Cross-implementation oracle: files written by the Java Avro library
    (on Spark's classpath) decode identically through avro_py, and files
    written by avro_py read back through Java Avro."""
    from tabsdata_spark.io import avro_py
    jvm = spark._jvm
    sch_json = ('{"type":"record","name":"R","fields":['
                '{"name":"a","type":"long"},'
                '{"name":"s","type":["null","string"],"default":null}]}')
    sch = jvm.org.apache.avro.Schema.Parser().parse(sch_json)
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch))
    w.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    f = jvm.java.io.File(str(tmp_path / "j.avro"))
    w.create(sch, f)
    for i in range(10):
        rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
        rec.put("a", i)
        rec.put("s", None if i % 3 == 0 else f"v{i}")
        w.append(rec)
    w.close()
    schema, recs = avro_py.read_container((tmp_path / "j.avro").read_bytes())
    assert [r["a"] for r in recs] == list(range(10))
    assert recs[1]["s"] == "v1" and recs[3]["s"] is None

    blob = avro_py.write_container(schema, recs, codec="deflate")
    (tmp_path / "p.avro").write_bytes(blob)
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(str(tmp_path / "p.avro")),
        jvm.org.apache.avro.generic.GenericDatumReader())
    back = []
    while rdr.hasNext():
        back.append(rdr.next())
    assert len(back) == 10 and back[4].get("a") == 4
    assert str(back[4].get("s")) == "v4"


def test_streaming_available_now_to_store(spark, tmp_path):
    """file stream -> watermarked tumbling agg -> versioned store sink,
    then the version-bus consumer sees exactly the committed versions."""
    src = tmp_path / "in"
    src.mkdir()
    rows = [(i, dt.datetime(2024, 1, 1, 0, i), float(i)) for i in range(10)]
    spark.createDataFrame(rows, ["id", "ts", "value"]).coalesce(1) \
        .write.mode("overwrite").parquet(str(src))

    stream = bus.stream_file_source(
        spark, str(src), "id long, ts timestamp, value double")
    agg = bus.windowed_aggregate(
        stream, "ts", "5 minutes", "10 minutes",
        {"n": F.count(F.lit(1)), "total": F.sum("value")})
    flat = agg.select(F.col("window.start").alias("ws"), "n", "total")

    store = TableStore(str(tmp_path / "store"))
    qy = bus.stream_to_table(flat, store, "col1", "win_agg",
                             str(tmp_path / "ckpt"), output_mode="update")
    qy.awaitTermination(120)

    got = store.read(spark, "col1", "win_agg")
    vals = {(r.ws, r.n) for r in got.df.select("ws", "n").collect()}
    assert vals == {(dt.datetime(2024, 1, 1, 0, 0), 5),
                    (dt.datetime(2024, 1, 1, 0, 5), 5)}

    seen = []
    n = bus.process_new_versions(spark, store, "col1", "win_agg", "t1",
                                 lambda d: seen.append(d.count()))
    assert n == 1 and seen == [2]
    # idempotent: nothing new on the second poll
    assert bus.process_new_versions(spark, store, "col1", "win_agg", "t1",
                                    lambda d: seen.append(d.count())) == 0


def test_stream_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "in2"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [(1, t0), (1, t0), (2, t0)]
    spark.createDataFrame(rows, ["k", "ts"]).coalesce(1) \
        .write.mode("overwrite").parquet(str(src))
    stream = bus.stream_file_source(spark, str(src), "k long, ts timestamp")
    dd = bus.stream_dedup(stream, ["k"], "ts", "10 minutes")
    out = []
    qy = (dd.writeStream.foreachBatch(
            lambda b, i: out.extend(r.k for r in b.collect()))
          .option("checkpointLocation", str(tmp_path / "ckpt2"))
          .trigger(availableNow=True).start())
    qy.awaitTermination(120)
    assert sorted(out) == [1, 2]


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState: state persists across micro-batches."""
    src = tmp_path / "in3"
    src.mkdir()
    spark.createDataFrame([(1, 1.0), (1, 2.0), (2, 5.0)], ["user", "v"]) \
        .coalesce(1).write.mode("overwrite").parquet(str(src / "batch1"))

    def run_once():
        stream = bus.stream_file_source(
            spark, str(src / "*"), "user long, v double")
        out = bus.stateful_running_totals(stream, "user", "v")
        rows = []
        qy = (out.writeStream.outputMode("update")
              .foreachBatch(lambda b, i: rows.extend(
                  (r.k, r.n, r.total) for r in b.collect()))
              .option("checkpointLocation", str(tmp_path / "ckpt3"))
              .trigger(availableNow=True).start())
        qy.awaitTermination(120)
        return rows

    first = run_once()
    assert sorted(first) == [(1, 2, 3.0), (2, 1, 5.0)]
    # second batch arrives; state carries the running totals forward
    spark.createDataFrame([(1, 10.0)], ["user", "v"]).coalesce(1) \
        .write.mode("overwrite").parquet(str(src / "batch2"))
    second = run_once()
    assert sorted(second) == [(1, 3, 13.0)]


def test_stateful_running_totals_tws(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 API): typed value state persists
    across micro-batches on the RocksDB state store.  The operator's state
    protocol needs protobuf; without it the gate must raise a clear error
    (this container has no protobuf -> gated path)."""
    try:
        import google.protobuf  # noqa: F401
        have_protobuf = True
    except ImportError:
        have_protobuf = False

    src = tmp_path / "in_tws"
    src.mkdir()
    spark.createDataFrame([(1, 1.0), (1, 2.0), (2, 5.0)], ["user", "v"]) \
        .coalesce(1).write.mode("overwrite").parquet(str(src / "batch1"))

    if not have_protobuf:
        stream = bus.stream_file_source(
            spark, str(src / "*"), "user long, v double")
        try:
            bus.stateful_running_totals_tws(stream, "user", "v")
            assert False, "expected gated ImportError without protobuf"
        except ImportError as e:
            assert "protobuf" in str(e)
        return

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try:
        def run_once():
            stream = bus.stream_file_source(
                spark, str(src / "*"), "user long, v double")
            out = bus.stateful_running_totals_tws(stream, "user", "v")
            rows = []
            qy = (out.writeStream.outputMode("update")
                  .foreachBatch(lambda b, i: rows.extend(
                      (r.k, r.n, r.total) for r in b.collect()))
                  .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
                  .trigger(availableNow=True).start())
            qy.awaitTermination(120)
            return rows

        first = run_once()
        assert sorted(first) == [(1, 2, 3.0), (2, 1, 5.0)]
        spark.createDataFrame([(1, 10.0)], ["user", "v"]).coalesce(1) \
            .write.mode("overwrite").parquet(str(src / "batch2"))
        second = run_once()
        assert sorted(second) == [(1, 3, 13.0)]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_iceberg_catalog_gated(spark):
    """Iceberg/Glue catalog publish: conf rendering is pure; publish()
    raises a clear jar-missing error in this container (no iceberg
    runtime jar), mirroring the avro gate."""
    from tabsdata_spark.io import IcebergCatalogDestination, catalog_confs

    confs = catalog_confs("glue_cat", "s3://bucket/wh", kind="glue")
    assert confs["spark.sql.catalog.glue_cat"] == \
        "org.apache.iceberg.spark.SparkCatalog"
    assert confs["spark.sql.catalog.glue_cat.catalog-impl"].endswith("GlueCatalog")
    assert confs["spark.sql.catalog.glue_cat.warehouse"] == "s3://bucket/wh"
    local = catalog_confs("dev", "/tmp/wh", kind="hadoop")
    assert local["spark.sql.catalog.dev.type"] == "hadoop"

    dest = IcebergCatalogDestination("glue_cat", "ns", "t1",
                                     partition_by=["days(ts)"])
    df = spark.createDataFrame([(1,)], ["k"])
    try:
        dest.publish(df, spark)
        raise AssertionError("expected gated RuntimeError without iceberg jar")
    except RuntimeError as e:
        assert "iceberg-spark-runtime" in str(e)


def test_csv_crlf_line_endings(spark, tmp_path):
    """CRLF csv files must not leak \\r into the last column (lineSep is
    only forced when the user sets a non-default eol_char)."""
    p = tmp_path / "crlf.csv"
    p.write_bytes(b"k,v\r\n1,10\r\n2,20\r\n")
    src = LocalFileSource(str(p), format="csv")
    df, _ = src.load(spark) if isinstance(src.load(spark), tuple) else (src.load(spark), None)
    assert df.columns == ["k", "v"]
    assert sorted((int(r.k), int(r.v)) for r in df.collect()) == [(1, 10), (2, 20)]


def test_stream_ingest_dedup(spark, tmp_path):
    src = tmp_path / "in3"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        (10, "alpha  beta", t0),   # corpus dup (normalizes to 'alpha beta')
        (11, "epsilon zeta", t0),  # fresh
        (12, "epsilon  zeta", t0), # in-stream dup of 11
        (13, "new content", t0),   # fresh
    ]
    spark.createDataFrame(rows, ["doc_id", "text", "ts"]).coalesce(1) \
        .write.mode("overwrite").parquet(str(src))
    corpus = spark.createDataFrame(
        [(1, "alpha beta")], ["doc_id", "text"])
    stream = bus.stream_file_source(
        spark, str(src), "doc_id long, text string, ts timestamp")
    dd = bus.stream_ingest_dedup(stream, corpus, "text", "ts")
    out = []
    qy = (dd.writeStream.foreachBatch(
            lambda b, i: out.extend(r.doc_id for r in b.collect()))
          .option("checkpointLocation", str(tmp_path / "ckpt3"))
          .trigger(availableNow=True).start())
    qy.awaitTermination(120)
    assert sorted(out) in ([11, 13], [12, 13])  # one of the in-stream dups
    assert 10 not in out


def test_orc_roundtrip(spark, tmp_path):
    from tabsdata_spark.io.file_io import LocalFileSource, LocalFileDestination
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    dest = LocalFileDestination(str(tmp_path / "out.orc"), format="orc")
    dest.save(df, spark)
    src = LocalFileSource(str(tmp_path / "out.orc"))
    back, _ = src.load(spark)
    assert sorted((r.k, r.v) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_stream_interval_join_clicks_to_impressions(spark, tmp_path):
    """Stream-stream interval join: clicks attach to the impression they
    followed within 10 minutes; both states watermark-bounded."""
    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(); clk_dir.mkdir()
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    imps = [(1, t0), (2, t0), (3, dt.datetime(2024, 1, 1, 1, 0))]
    clicks = [(1, dt.datetime(2024, 1, 1, 0, 5)),     # within 10m -> joins
              (2, dt.datetime(2024, 1, 1, 0, 20)),    # 20m late -> no join
              (3, dt.datetime(2024, 1, 1, 1, 2))]     # within -> joins
    spark.createDataFrame(imps, ["ad_id", "imp_ts"]).coalesce(1) \
        .write.mode("overwrite").parquet(str(imp_dir))
    spark.createDataFrame(clicks, ["ad_id", "clk_ts"]).coalesce(1) \
        .write.mode("overwrite").parquet(str(clk_dir))

    imp_s = bus.stream_file_source(spark, str(imp_dir),
                                   "ad_id long, imp_ts timestamp")
    clk_s = bus.stream_file_source(spark, str(clk_dir),
                                   "ad_id long, clk_ts timestamp")
    joined = bus.stream_interval_join(
        imp_s, clk_s, on="ad_id", left_ts="imp_ts", right_ts="clk_ts",
        left_watermark="30 minutes", right_watermark="30 minutes",
        within="10 MINUTES")
    qy = (joined.writeStream.format("memory").queryName("ij")
          .trigger(availableNow=True).outputMode("append").start())
    qy.awaitTermination(120)
    got = sorted((r.ad_id, r.clk_ts) for r in
                 spark.sql("SELECT ad_id, clk_ts FROM ij").collect())
    assert got == [(1, dt.datetime(2024, 1, 1, 0, 5)),
                   (3, dt.datetime(2024, 1, 1, 1, 2))]


def test_stream_near_dup_flag(spark, tmp_path):
    import datetime as dt
    src = tmp_path / "in_nd"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        (20, "the quick brown fox jumps over the lazy dog today", t0),  # ~corpus
        (21, "an entirely different new document about catalysts", t0), # fresh
        (22, "the quick brown fox jumps over the lazy dog now", t0),    # ~corpus
    ]
    spark.createDataFrame(rows, ["doc_id", "text", "ts"]).coalesce(1) \
        .write.mode("overwrite").parquet(str(src))
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tomorrow"),
         (2, "unrelated corpus text about storage engines")],
        ["doc_id", "text"])
    stream = bus.stream_file_source(
        spark, str(src), "doc_id long, text string, ts timestamp")
    flagged = bus.stream_near_dup_flag(stream, corpus)
    out = []
    qy = (flagged.writeStream.foreachBatch(
            lambda b, i: out.extend(r.doc_id for r in b.collect()))
          .option("checkpointLocation", str(tmp_path / "ckpt_nd"))
          .trigger(availableNow=True).start())
    qy.awaitTermination(120)
    # batch-LSH parity: the flagged set equals the batch candidate front half
    from tabsdata_spark.llm import dedup as d
    tagged = spark.createDataFrame(rows, ["doc_id", "text", "ts"]) \
        .select("doc_id", "text")
    import pyspark.sql.functions as FF
    sb = d.band_signature_rows(tagged).select("__id", "band", "bsig")
    cb = d.band_signature_rows(corpus).select("band", "bsig").distinct()
    expect = sorted(r["__id"] for r in
                    sb.join(cb, ["band", "bsig"], "left_semi")
                    .select("__id").distinct().collect())
    assert sorted(out) == expect
    assert 21 not in out
    assert 20 in out and 22 in out


def test_xml_roundtrip(spark, tmp_path):
    from tabsdata_spark.io.file_io import LocalFileDestination, LocalFileSource
    from tabsdata_spark.io.formats import XMLFormat

    df = spark.createDataFrame([(1, "a"), (2, "b & c")], ["k", "v"])
    dest = LocalFileDestination(str(tmp_path / "out.xml"),
                                format=XMLFormat(row_tag="rec"))
    dest.save(df, spark)
    src = LocalFileSource(str(tmp_path / "out.xml"),
                          format=XMLFormat(row_tag="rec"))
    back, _ = src.load(spark)
    assert sorted((r["k"], r["v"]) for r in back.collect()) == \
        [(1, "a"), (2, "b & c")]


def test_stream_drift_monitor_flags_shifted_window(spark, tmp_path):
    import datetime as dt
    import math

    src = tmp_path / "in_drift"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 0, 5)
    t1 = dt.datetime(2024, 1, 1, 1, 5)
    t2 = dt.datetime(2024, 1, 1, 3, 0)
    rows = ([(t0, float(v % 10)) for v in range(100)]          # uniform 0-9
            + [(t1, 0.0)] * 100                                # all in bucket 0
            + [(t2, 5.0)])   # watermark pusher: closes the hour-1 window
    spark.createDataFrame(rows, "ts timestamp, value double").coalesce(1) \
        .write.mode("overwrite").parquet(str(src))
    stream = bus.stream_file_source(spark, str(src),
                                    "ts timestamp, value double")
    baseline = [0.1] * 10  # uniform reference
    mon = bus.stream_drift_monitor(stream, "ts", "value", baseline,
                                   0.0, 10.0, window="30 minutes",
                                   watermark="5 minutes")
    out = []
    qy = (mon.writeStream.outputMode("append").foreachBatch(
            lambda b, i: out.extend(b.collect()))
          .option("checkpointLocation", str(tmp_path / "ckpt_drift"))
          .trigger(availableNow=True).start())
    qy.awaitTermination(120)
    got = {r["window_start"].hour: r for r in out}
    assert got[0]["n_events"] == 100 and got[1]["n_events"] == 100

    def psi_model(counts):
        tot = sum(counts)
        s = 0.0
        for d in range(10):
            p = (counts[d] + 0.5) / (tot + 5.0)
            q = 0.1
            s += (p - q) * math.log(p / q)
        return round(s, 6)

    assert got[0]["psi"] == psi_model([10] * 10)
    assert got[1]["psi"] == psi_model([100] + [0] * 9)
    assert got[1]["psi"] > 10 * max(got[0]["psi"], 1e-9)


def test_csv_bad_lines_drop_and_permissive(spark, tmp_path):
    from tabsdata_spark.io.file_io import LocalFileSource
    from tabsdata_spark.io.formats import CSVFormat

    p = tmp_path / "bad.csv"
    p.write_text("k,v\n1,10\nnot_an_int,20\n3,30\n")
    schema_opts = dict(infer_schema=False)

    # DROPMALFORMED: the bad row vanishes (needs an explicit schema to
    # define "malformed")
    src = LocalFileSource(str(p), format=CSVFormat(on_bad_lines="drop",
                                                   **schema_opts))
    df, _ = src.load(spark)
    df = spark.read.options(**CSVFormat(on_bad_lines="drop").reader_options()) \
        .schema("k int, v int").csv(str(p))
    assert sorted((r["k"], r["v"]) for r in df.collect()) == [(1, 10), (3, 30)]

    perm = spark.read.options(
        **CSVFormat(on_bad_lines="permissive").reader_options()) \
        .schema("k int, v int").csv(str(p))
    rows = sorted(perm.collect(), key=lambda r: (r["k"] is None, r["k"]))
    assert len(rows) == 3 and rows[-1]["k"] is None  # kept, nulled


def test_stream_anomaly_flag_matches_batch_rolling_zscore(spark, tmp_path):
    """Streaming trailing-window z-score == batch rolling_zscore on
    time-ordered input, with the window carried across micro-batches."""
    import datetime as dt

    from tabsdata_spark.extensions import rolling_zscore

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    rid = 0
    for u in (1, 2):
        for i in range(30):
            # flat baseline with a spike at i==25 for user 1 only
            v = 100.0 if (u == 1 and i == 25) else 10.0 + (i % 4) * 0.25 + u
            rows.append((rid, u, t0 + dt.timedelta(minutes=i), v))
            rid += 1
    schema = "event_id long, user long, ts timestamp, v double"
    df = spark.createDataFrame(rows, schema)

    batch = {r.event_id: r.zscore
             for r in rolling_zscore(df, "user", "ts", "v", window=20,
                                     min_periods=8, threshold=2.5,
                                     tie_cols=["event_id"]).collect()}
    assert batch  # the spike must be flagged

    src = tmp_path / "anom"
    src.mkdir()
    # split time-ordered halves into two micro-batch files
    df.filter(F.col("event_id") % 60 < 30).coalesce(1).write.parquet(
        str(src / "b1"))
    df.filter(F.col("event_id") % 60 >= 30).coalesce(1).write.parquet(
        str(src / "b2"))

    flagged = {}

    def run_once():
        stream = bus.stream_file_source(spark, str(src / "*"), schema)
        out = bus.stream_anomaly_flag(stream, "user", "ts", "v", "event_id",
                                      window=20, min_periods=8, threshold=2.5)
        qy = (out.writeStream.outputMode("update")
              .foreachBatch(lambda b, i: flagged.update(
                  {r.event_id: r.zscore for r in b.collect()}))
              .option("checkpointLocation", str(tmp_path / "anom_ckpt"))
              .trigger(availableNow=True).start())
        qy.awaitTermination(120)

    run_once()
    assert set(flagged) == set(batch)
    for eid, z in flagged.items():
        assert abs(z - batch[eid]) < 5e-7   # batch col is rounded to 6


def test_stream_anomaly_flag_constant_series_no_crash(spark, tmp_path):
    """ADVICE r3: a zero-variance trailing window (heartbeat metric) must
    not kill the streaming query with ZeroDivisionError; parity with the
    batch operator means the degenerate rows are silently dropped."""
    import datetime as dt

    from tabsdata_spark.extensions import rolling_zscore

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, 1, t0 + dt.timedelta(minutes=i), 5.0) for i in range(15)]
    rows.append((15, 1, t0 + dt.timedelta(minutes=15), 500.0))
    schema = "event_id long, user long, ts timestamp, v double"
    df = spark.createDataFrame(rows, schema)

    batch = {r.event_id for r in
             rolling_zscore(df, "user", "ts", "v", window=20,
                            min_periods=8, threshold=2.5,
                            tie_cols=["event_id"]).collect()}
    assert batch == set()   # constant window -> var 0 -> dropped, not Inf

    src = tmp_path / "const_anom"
    src.mkdir()
    df.coalesce(1).write.parquet(str(src / "b1"))
    flagged = {}
    stream = bus.stream_file_source(spark, str(src / "*"), schema)
    out = bus.stream_anomaly_flag(stream, "user", "ts", "v", "event_id",
                                  window=20, min_periods=8, threshold=2.5)
    qy = (out.writeStream.outputMode("update")
          .foreachBatch(lambda b, i: flagged.update(
              {r.event_id: r.zscore for r in b.collect()}))
          .option("checkpointLocation", str(tmp_path / "const_anom_ckpt"))
          .trigger(availableNow=True).start())
    qy.awaitTermination(120)
    assert set(flagged) == batch == set()


def test_stream_k_anonymize_picks_per_window(spark, tmp_path):
    """stream_k_anonymize counts every rung's classes in one windowed agg;
    pick_k_anonymous_level publishes the first rung reaching k per window."""
    src = tmp_path / "in_kanon"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    d1 = dt.datetime(2024, 1, 2, 0, 0)
    # day 1: 6 users in group 'a' (passes k=5 at rung 0);
    # day 2: 2 in 'a' + 4 in 'b' (rung 0 min=2 < 5; rung 1 pools to 6 >= 5)
    rows = ([(i, t0, "a") for i in range(6)]
            + [(10 + i, d1, "a") for i in range(2)]
            + [(20 + i, d1, "b") for i in range(4)])
    spark.createDataFrame(rows, ["event_id", "ts", "grp"]).coalesce(1) \
        .write.mode("overwrite").parquet(str(src))
    stream = bus.stream_file_source(
        spark, str(src), "event_id long, ts timestamp, grp string")
    ladder = [[F.col("grp")], [F.lit("*")]]
    out = bus.stream_k_anonymize(stream, "ts", "1 day", "10 minutes",
                                 ladder, ["q1"])
    acc = {}
    qy = (out.writeStream.outputMode("update")
          .foreachBatch(lambda b, i: acc.update(
              {(r["window"]["start"], r["level"], r["q1"]): r["n"]
               for r in b.collect()}))
          .option("checkpointLocation", str(tmp_path / "ckpt_kanon"))
          .trigger(availableNow=True).start())
    qy.awaitTermination(120)
    snap = spark.createDataFrame(
        [(k[0], k[1], k[2], v) for k, v in acc.items()],
        "window_start timestamp, level int, q1 string, n long")
    got = {(r.window_start, r.level, r.q1): r.n
           for r in bus.pick_k_anonymous_level(snap, ["q1"], k=5).collect()}
    assert got == {(t0, 0, "a"): 6,       # day 1 publishes at rung 0
                   (d1, 1, "*"): 6}       # day 2 escalates to suppression


def test_pick_topk_per_window_ranks_and_ties(spark):
    snap = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), "a", 5), (dt.datetime(2024, 1, 1), "b", 5),
         (dt.datetime(2024, 1, 1), "c", 1), (dt.datetime(2024, 1, 2), "z", 9)],
        "window_start timestamp, event_type string, n long")
    got = [(r.window_start, r.event_type, r.rank) for r in
           bus.pick_topk_per_window(snap, ["event_type"], "n", k=2)
           .orderBy("window_start", "rank").collect()]
    assert got == [(dt.datetime(2024, 1, 1), "a", 1),   # tie -> lexicographic
                   (dt.datetime(2024, 1, 1), "b", 2),
                   (dt.datetime(2024, 1, 2), "z", 1)]


def test_stream_ewma_matches_integer_recursion_across_batches(spark,
                                                              tmp_path):
    """Streaming EWMA level == the exact floor-halving micros recursion,
    with the level carried across micro-batch boundaries."""
    import datetime as dt
    import math

    t0 = dt.datetime(2024, 1, 1)
    vals = [4.0, 9.0, 2.25, 15.5, 7.0, 7.0, 11.0, 0.5, 3.0, 20.0]
    rows = [(i, 1, t0 + dt.timedelta(minutes=i), v)
            for i, v in enumerate(vals)]
    schema = "event_id long, user long, ts timestamp, v double"
    df = spark.createDataFrame(rows, schema)

    src = tmp_path / "ewma"
    src.mkdir()
    df.filter(F.col("event_id") < 5).coalesce(1).write.parquet(
        str(src / "b1"))
    df.filter(F.col("event_id") >= 5).coalesce(1).write.parquet(
        str(src / "b2"))

    got = {}
    stream = bus.stream_file_source(spark, str(src / "*"), schema)
    out = bus.stream_ewma(stream, "user", "ts", "v", "event_id")
    qy = (out.writeStream.outputMode("update")
          .foreachBatch(lambda b, i: got.update(
              {r.event_id: r.level for r in b.collect()}))
          .option("checkpointLocation", str(tmp_path / "ewma_ckpt"))
          .trigger(availableNow=True).start())
    qy.awaitTermination(120)

    l = None
    for i, v in enumerate(vals):
        ym = math.floor(v * 1e6 + 0.5)
        l = ym if l is None else math.floor((ym + l) / 2.0)
        assert got[i] == l / 1e6


def test_stream_cusum_carries_state_across_batches(spark, tmp_path):
    """Streaming CUSUM == max(0, S + x - k) recursion with S carried
    across micro-batch boundaries; breach latches where S >= h."""
    import datetime as dt
    import math

    t0 = dt.datetime(2024, 1, 1)
    vals = [5.0, 9.0, 2.0, 9.0, 9.0, 9.0, 1.0, 9.0]
    rows = [(i, 1, t0 + dt.timedelta(minutes=i), v)
            for i, v in enumerate(vals)]
    schema = "event_id long, user long, ts timestamp, v double"
    df = spark.createDataFrame(rows, schema)

    src = tmp_path / "cusum"
    src.mkdir()
    df.filter(F.col("event_id") < 4).coalesce(1).write.parquet(
        str(src / "b1"))
    df.filter(F.col("event_id") >= 4).coalesce(1).write.parquet(
        str(src / "b2"))

    k, h = 6_000_000, 5_000_000  # k = 6.0, h = 5.0 in micros
    got = {}
    stream = bus.stream_file_source(spark, str(src / "*"), schema)
    out = bus.stream_cusum(stream, "user", "ts", "v", "event_id",
                           k_micros=k, h_micros=h)
    qy = (out.writeStream.outputMode("update")
          .foreachBatch(lambda b, i: got.update(
              {r.event_id: (r.cusum, r.breach) for r in b.collect()}))
          .option("checkpointLocation", str(tmp_path / "cusum_ckpt"))
          .trigger(availableNow=True).start())
    qy.awaitTermination(120)

    s = 0
    for i, v in enumerate(vals):
        ym = math.floor(v * 1e6 + 0.5)
        s = max(0, s + ym - k)
        assert got[i] == (s / 1e6, s >= h)
    assert any(flag for _, flag in got.values())


def test_windowed_aggregate_batch_split_invariance(spark, tmp_path):
    """The update-mode last-wins sink contract is independent of
    micro-batch slicing as long as batches respect event-time order
    within the watermark delay: the same rows processed as ONE
    availableNow batch or as four time-ordered maxFilesPerTrigger=1
    batches yield identical final (window, key) -> aggregates.  (A
    window straddling a batch boundary emits twice; last-wins keeps
    the complete second emission.)"""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(minutes=(i * 37) % 300),
             "ab"[i % 2], float(i)) for i in range(40)]
    schema = "event_id long, ts timestamp, k string, v double"
    df = spark.createDataFrame(rows, schema)

    def run(src_dir, ckpt, splits, max_files):
        # `splits`: list of (lo, hi) minute ranges — written in order,
        # consumed in lexicographic file order by maxFilesPerTrigger=1
        for j, (lo, hi) in enumerate(splits):
            mins = (F.unix_timestamp("ts")
                    - F.unix_timestamp(F.lit(t0))) / 60
            df.filter((mins >= lo) & (mins < hi)) \
              .coalesce(1).write.parquet(f"{src_dir}/b{j}")
        stream = bus.stream_file_source(
            spark, f"{src_dir}/*", schema,
            max_files_per_trigger=max_files)
        out = bus.windowed_aggregate(
            stream, "ts", "1 hour", "30 minutes",
            {"n": F.count(F.lit(1)),
             "s": F.sum(F.col("v").cast("decimal(18,2)"))
             .cast("double")},
            group_extra=["k"])
        acc = {}
        qy = (out.writeStream.outputMode("update")
              .foreachBatch(lambda b, i: acc.update(
                  {(r["window"]["start"], r["k"]): (r["n"], r["s"])
                   for r in b.collect()}))
              .option("checkpointLocation", ckpt)
              .trigger(availableNow=True).start())
        qy.awaitTermination(120)
        return acc

    one = run(str(tmp_path / "one"), str(tmp_path / "ck1"),
              [(0, 300)], None)
    four = run(str(tmp_path / "four"), str(tmp_path / "ck4"),
               [(0, 75), (75, 150), (150, 225), (225, 300)], 1)
    assert one == four
    assert len(one) > 0


def test_windowed_aggregate_out_of_order_batches_diverge(spark, tmp_path):
    """Executable pin REFINING the round-5 watermark finding: rows
    arriving behind the watermark ARE dropped from a windowed
    aggregation — but only once eviction has propagated, which lags
    the watermark advance by ONE micro-batch.  (The r5 two-batch
    harness saw late rows aggregated because it only ever exercised
    the lag batch; with an intermediate batch the [00:00,01:00)
    window's final count stays at the on-time 5, the 3 late rows
    silently vanishing.)  Spark semantics, not an engine bug; it is
    why every registered windowed streaming query feeds a
    single-batch (or time-ordered) source — an out-of-order source
    under-counts relative to the batch oracle.  If this assertion
    ever fails, Spark's late-row handling changed and the streaming
    contracts must be re-audited."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    schema = "event_id long, ts timestamp, k string, v double"
    early = [(i, t0 + dt.timedelta(minutes=i), "a", 1.0)
             for i in range(5)]                       # window [00:00,01:00)
    advance = [(100, t0 + dt.timedelta(hours=6), "a", 1.0)]
    advance2 = [(101, t0 + dt.timedelta(hours=7), "a", 1.0)]
    late = [(200 + i, t0 + dt.timedelta(minutes=30 + i), "a", 1.0)
            for i in range(3)]                        # same early window

    # state eviction lags one batch behind the watermark update, so an
    # intermediate batch (b1) is needed for the [00:00,01:00) state to
    # actually be dropped before the late rows arrive in b2
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(early + advance, schema).coalesce(1) \
        .write.parquet(str(src / "b0"))
    spark.createDataFrame(advance2, schema).coalesce(1) \
        .write.parquet(str(src / "b1"))
    spark.createDataFrame(late, schema).coalesce(1) \
        .write.parquet(str(src / "b2"))

    stream = bus.stream_file_source(spark, str(src / "*"), schema,
                                    max_files_per_trigger=1)
    out = bus.windowed_aggregate(
        stream, "ts", "1 hour", "30 minutes",
        {"n": F.count(F.lit(1))}, group_extra=["k"])
    acc = {}
    qy = (out.writeStream.outputMode("update")
          .foreachBatch(lambda b, i: acc.update(
              {(r["window"]["start"], r["k"]): r["n"]
               for r in b.collect()}))
          .option("checkpointLocation", str(tmp_path / "ckpt"))
          .trigger(availableNow=True).start())
    qy.awaitTermination(120)

    # the early window's final value is the ON-TIME count (5): the 3
    # late rows were dropped, not re-aggregated (and not the complete 8)
    assert acc[(t0, "a")] == 5


def test_last_modified_rejects_naive_and_bad_iso(tmp_path):
    """Reference parity (file_inputs.py:1410 _raise_exception_if_no_tzinfo
    + the SOCE5 ISO guard): tz-naive cutoffs and non-ISO strings raise at
    CONFIG time — a naive cutoff would otherwise resolve in the box's
    local timezone and make incremental ingest machine-dependent."""
    import datetime as dt

    import pytest

    from tabsdata_spark.io.file_io import LocalFileSource

    with pytest.raises(ValueError, match="timezone-aware"):
        LocalFileSource(str(tmp_path / "*.csv"),
                        initial_last_modified=dt.datetime(2024, 1, 1))
    with pytest.raises(ValueError, match="ISO 8601"):
        LocalFileSource(str(tmp_path / "*.csv"),
                        initial_last_modified="last tuesday")
    # tz-aware forms (str and datetime) both construct
    LocalFileSource(str(tmp_path / "*.csv"),
                    initial_last_modified="2024-01-01T00:00:00+00:00")
    LocalFileSource(str(tmp_path / "*.csv"),
                    initial_last_modified=dt.datetime(
                        2024, 1, 1, tzinfo=dt.timezone.utc))


def test_csv_write_preserves_whitespace(spark, tmp_path):
    """Fuzzer-found (r10, seed 20260912): Spark's CSV WRITER trims
    leading/trailing whitespace by default (the write-side
    ignore*WhiteSpace options default true, unlike the read side), so
    '  spaced  ' came back 'spaced' after a write->read round-trip.
    Polars write_csv preserves padding — writer_options must disable the
    trim."""
    from tabsdata_spark.io.file_io import LocalFileDestination, LocalFileSource

    tf = td.TableFrame.from_dict(spark, {"s": ["  spaced  ", "x", "\ttab"]})
    dest = str(tmp_path / "ws.csv")
    LocalFileDestination(dest, format="csv").save(tf.to_spark())
    back, _ = LocalFileSource(dest, format="csv").load(spark)
    assert sorted(r["s"] for r in back.collect()) == \
        sorted(["  spaced  ", "x", "\ttab"])


def test_csv_custom_eol_write_read_roundtrip(spark, tmp_path):
    """Fuzzer-found (r10): a custom single-char eol_char was IGNORED on
    write (files came out newline-separated while the paired reader
    expected the custom eol).  '\\r' must round-trip; '\\r\\n' output is
    not expressible in Spark's 1-char CSV lineSep and must raise instead
    of silently writing '\\n'."""
    import pytest

    from tabsdata_spark.io.file_io import LocalFileDestination, LocalFileSource

    fmt = td.CSVFormat(eol_char="\r")
    tf = td.TableFrame.from_dict(spark, {"a": [1, 2, 3], "s": ["x", "y", "z"]})
    dest = str(tmp_path / "cr.csv")
    LocalFileDestination(dest, format=fmt).save(tf.to_spark())
    back, _ = LocalFileSource(dest, format=fmt).load(spark)
    assert sorted((r["a"], r["s"]) for r in back.collect()) == \
        [(1, "x"), (2, "y"), (3, "z")]

    with pytest.raises(ValueError, match="1-character"):
        td.CSVFormat(eol_char="\r\n").writer_options()
    # reading CRLF files keeps working via Spark's default line splitting
    p = tmp_path / "crlf.csv"
    p.write_bytes(b"a,s\r\n1,x\r\n2,y\r\n")
    got, _ = LocalFileSource(str(p), format=td.CSVFormat(eol_char="\r\n")).load(spark)
    assert sorted((r["a"], r["s"]) for r in got.collect()) == [(1, "x"), (2, "y")]


# --------------------------- NDJSON Polars-parity round-trip contract


def test_ndjson_all_null_column_survives(spark, tmp_path):
    """Polars write_ndjson serializes null fields explicitly, so an
    all-null column must survive a round-trip (Spark's default
    ignoreNullFields=true drops it from the file and the re-read
    schema).  Re-inferred dtype for an all-null JSON field is string."""
    df = spark.createDataFrame([(1, None), (2, None)],
                               "k bigint, gone string")
    out = str(tmp_path / "nulls.ndjson")
    LocalFileDestination(out, format="ndjson").save(df)
    back, _ = LocalFileSource(out, format="ndjson").load(spark)
    assert back.columns == ["k", "gone"]
    assert back.schema["gone"].dataType.simpleString() == "string"
    assert [r.gone for r in back.collect()] == [None, None]


def test_ndjson_non_finite_doubles_null_keep_dtype(spark, tmp_path):
    """JSON has no NaN/Infinity token; Spark's writer would emit the
    STRINGS "NaN"/"Infinity" and corrupt the column to string on
    re-read.  Polars serializes non-finite floats as null — match it,
    including inside arrays and structs; a null struct stays null."""
    df = spark.createDataFrame(
        [(1, float("nan"), [1.0, float("inf")], (float("-inf"), "a")),
         (2, 2.5, None, None),
         (3, 0.5, [2.0], (7.5, "b"))],
        "k bigint, d double, arr array<double>, st struct<p:double,q:string>")
    out = str(tmp_path / "nonfinite.ndjson")
    LocalFileDestination(out, format="ndjson").save(df)
    back, _ = LocalFileSource(out, format="ndjson").load(spark)
    assert back.schema["d"].dataType.simpleString() == "double"
    assert back.schema["arr"].dataType.simpleString() == "array<double>"
    assert back.schema["st"].dataType.simpleString() == \
        "struct<p:double,q:string>"
    rows = {r.k: r for r in back.collect()}
    assert rows[1].d is None and rows[2].d == 2.5
    assert rows[1].arr == [1.0, None]
    assert rows[1].st.p is None and rows[1].st.q == "a"
    assert rows[2].arr is None and rows[2].st is None


def test_ndjson_column_order_preserved(spark, tmp_path):
    """Spark's JSON schema inference sorts field names alphabetically;
    Polars read_ndjson keeps first-seen key order.  The loader restores
    the written order from the first data line."""
    df = spark.createDataFrame([(1, "x", 2.5)], "zz bigint, mm string, aa double")
    out = str(tmp_path / "order.ndjson")
    LocalFileDestination(out, format="ndjson").save(df)
    back, _ = LocalFileSource(out, format="ndjson").load(spark)
    assert back.columns == ["zz", "mm", "aa"]


def test_ndjson_temporal_reads_back_as_string(spark, tmp_path):
    """Dates/timestamps serialize as ISO strings and — like Polars
    read_ndjson, which does no datetime inference — read back as
    string columns whose values still parse to the original instants."""
    df = spark.createDataFrame(
        [(dt.date(2026, 3, 2), dt.datetime(2026, 3, 2, 4, 5, 6))],
        "d date, ts timestamp")
    out = str(tmp_path / "temporal.ndjson")
    LocalFileDestination(out, format="ndjson").save(df)
    back, _ = LocalFileSource(out, format="ndjson").load(spark)
    assert [f.dataType.simpleString() for f in back.schema.fields] == \
        ["string", "string"]
    r = back.select(F.to_date("d").alias("d"),
                    F.to_timestamp("ts").alias("ts")).first()
    assert r.d == dt.date(2026, 3, 2)
    assert r.ts == dt.datetime(2026, 3, 2, 4, 5, 6)
