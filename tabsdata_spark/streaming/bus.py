"""Streaming extension: Structured Streaming over the table-version bus.

The reference is micro-batch/trigger-based with NO streaming operators
(SURVEY §2.9) — this module is the BASELINE.json north-star extension:
model pub/sub triggers as Structured Streaming `availableNow` micro-batches
over the same versioned table store, and expose the standard streaming
toolkit (watermarked windows, session windows, stateful dedup) for the
`events`-style tables.

Scale design: file-source streams track processed files in checkpoints (no
re-listing cost explosion), every aggregation is watermarked so state
stores stay bounded, and sinks write through foreachBatch into the
versioned store — giving streaming outputs the same atomic-version
semantics as batch."""

from __future__ import annotations

from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..store.table_store import TableStore


def stream_file_source(spark: SparkSession, path: str, schema,
                       fmt: str = "parquet",
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """Incremental file-directory stream (the reference's
    initial_last_modified incremental ingest, upgraded to a checkpointed
    Structured Streaming source)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def windowed_aggregate(stream: DataFrame, ts_col: str, window: str,
                       watermark: str, aggs: dict, slide: str | None = None,
                       group_extra: list[str] | None = None) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation.  Late rows beyond
    `watermark` are dropped and state is evicted — bounded memory at any
    throughput."""
    wm = stream.withWatermark(ts_col, watermark)
    win = (F.window(F.col(ts_col), window, slide) if slide
           else F.window(F.col(ts_col), window))
    keys = [win] + [F.col(c) for c in (group_extra or [])]
    agg_cols = [expr.alias(name) for name, expr in aggs.items()]
    return wm.groupBy(*keys).agg(*agg_cols)


def session_windows(stream: DataFrame, ts_col: str, gap: str,
                    watermark: str, keys: list[str], aggs: dict) -> DataFrame:
    """Session windows via the built-in session_window (gap-based)."""
    wm = stream.withWatermark(ts_col, watermark)
    agg_cols = [expr.alias(name) for name, expr in aggs.items()]
    return wm.groupBy(
        F.session_window(F.col(ts_col), gap), *[F.col(k) for k in keys]
    ).agg(*agg_cols)


def stream_dedup(stream: DataFrame, keys: list[str], ts_col: str,
                 watermark: str) -> DataFrame:
    """Streaming exact-dedup with bounded state (dropDuplicatesWithinWatermark)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_ingest_dedup(stream: DataFrame, corpus: DataFrame,
                        text_col: str, ts_col: str,
                        watermark: str = "10 minutes") -> DataFrame:
    """Continuous-ingestion dedup: the streaming twin of
    `llm.dedup.incremental_dedup`.

    New documents are fingerprinted (normalized-content md5), dropped if
    the digest exists in the static corpus (stream-static left_anti join —
    the static side is broadcast/re-read per micro-batch, the stream side
    never buffers), then deduped against other in-flight documents with
    watermark-bounded state (dropDuplicatesWithinWatermark keys on the
    16-byte digest, so state size is digests, not text).

    At scale the static side should be the corpus's distinct-fingerprint
    table, not the corpus itself — pass `corpus` pre-projected if the
    fingerprint column is materialized."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    fp_stream = stream.withColumn("__fp", F.md5(norm))
    fp_corpus = corpus.select(F.md5(norm).alias("__fp")).distinct()
    fresh = fp_stream.join(fp_corpus, "__fp", "left_anti")
    return (fresh.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["__fp"])
            .drop("__fp"))


def stream_near_dup_flag(stream: DataFrame, corpus: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         ts_col: str = "ts", watermark: str = "10 minutes",
                         num_hashes: int = 32, bands: int = 8,
                         shingle_size: int = 3,
                         max_bucket: int = 50) -> DataFrame:
    """Streaming NEAR-dedup flagger: the minhash sibling of
    `stream_ingest_dedup`'s exact digests — emit incoming documents whose
    banded minhash signature collides with any corpus band bucket (i.e.
    LSH candidates against the ingested corpus, the same front half as
    `llm.dedup.incremental_near_dup`; exact-jaccard verification, which
    needs the specific partner document, stays a batch follow-up on the
    flagged trickle).

    Plan shape: corpus band buckets are a STATIC distinct (band, bsig)
    table, boilerplate-capped on the static side (streams can't count
    their own buckets); the stream computes its band signatures with pure
    expressions and left-semi joins the static buckets per micro-batch —
    no stream-side buffering.  A watermark-bounded
    dropDuplicatesWithinWatermark collapses the bands-per-doc fan-out so
    each flagged doc id is emitted once; state holds ids, not text."""
    from tabsdata_spark.llm import dedup as _dedup

    lsh_args = dict(num_hashes=num_hashes, bands=bands,
                    shingle_size=shingle_size)
    corpus_buckets = (
        _dedup.band_signature_rows(corpus, id_col, text_col, **lsh_args)
        .groupBy("band", "bsig")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= max_bucket)
        .select("band", "bsig")
    )
    sb = _dedup.band_signature_rows(stream, id_col, text_col,
                                    widen=False, keep_cols=(ts_col,),
                                    **lsh_args)
    flagged = sb.join(corpus_buckets, ["band", "bsig"], "left_semi")
    return (flagged.select(F.col("__id").alias(id_col), F.col(ts_col))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark([id_col]))


def stream_k_anonymize(stream: DataFrame, ts_col: str, window: str,
                       watermark: str, ladder: list[list],
                       names: list[str]) -> DataFrame:
    """Streaming half of the generalization-ladder k-anonymization
    (`llm.textual.k_anonymize`): every event projects into one row PER
    LADDER RUNG (level + generalized quasi-identifiers, cast to string),
    and a single watermarked tumbling-window aggregation counts the
    equivalence classes of every rung at once — (window, level,
    *names, n).

    The Samarati pick itself (lowest rung whose smallest class reaches
    k) is a per-window decision over the rung minima, so it runs
    DOWNSTREAM of the stream — in the sink's foreachBatch or on the
    collected snapshot — exactly like the batch operator's 1-number-per-
    rung driver decision.  Splitting it this way keeps the streaming
    plan a single stateful aggregation: state is bounded by (windows x
    rungs x classes), late data beyond `watermark` is dropped, and no
    rung ever needs a second pass over the raw events."""
    lvl_rows = F.explode(F.array(*[
        F.struct(
            F.lit(lvl).alias("level"),
            *[e.cast("string").alias(n) for e, n in zip(exprs, names)])
        for lvl, exprs in enumerate(ladder)
    ])).alias("__rung")
    wm = stream.withWatermark(ts_col, watermark)
    exploded = wm.select(F.col(ts_col), lvl_rows).select(
        F.col(ts_col), F.col("__rung.level").alias("level"),
        *[F.col(f"__rung.{n}").alias(n) for n in names])
    return (exploded
            .groupBy(F.window(F.col(ts_col), window), F.col("level"),
                     *[F.col(n) for n in names])
            .agg(F.count(F.lit(1)).alias("n")))


def pick_k_anonymous_level(snapshot: DataFrame, names: list[str],
                           k: int = 5) -> DataFrame:
    """Batch post-step for `stream_k_anonymize` snapshots: per window,
    publish the FIRST rung whose smallest equivalence class reaches k
    (fall back to the most general rung) — the same Samarati walk the
    batch operator performs, applied to the streamed per-rung class
    counts.  Input columns: window_start, level, *names, n."""
    mins = (snapshot.groupBy("window_start", "level")
            .agg(F.min("n").alias("__minn")))
    max_lvl = (snapshot.groupBy("window_start")
               .agg(F.max("level").alias("__maxl")))
    pick = (mins.groupBy("window_start")
            .agg(F.min(F.when(F.col("__minn") >= k, F.col("level")))
                 .alias("__lvl"))
            .join(max_lvl, "window_start")
            .select("window_start",
                    F.coalesce(F.col("__lvl"), F.col("__maxl"))
                    .alias("level")))
    return snapshot.join(pick, ["window_start", "level"]).select(
        "window_start", "level", *names, "n")


def stream_drift_monitor(stream: DataFrame, ts_col: str, value_col: str,
                         baseline: list[float], lo: float, hi: float,
                         window: str = "10 minutes",
                         watermark: str = "10 minutes") -> DataFrame:
    """Continuous PSI drift monitoring: per event-time window, the
    Population Stability Index of `value_col`'s histogram against a static
    `baseline` (reference proportions per bucket, e.g. from
    stats.histogram over the training corpus) — the streaming twin of
    stats.drift_psi, alerting when serving data drifts from what the
    model/corpus was built on.

    Plan shape: TWO chained event-time aggregations (Spark's
    multiple-stateful-operator support): bucket counts per window
    (state = buckets x open windows), then per-window assembly via
    collect_list of <= buckets structs; PSI folds over that bounded array
    against the baseline literal — observed proportions get the same
    add-half smoothing as the batch twin.  Emits
    (window_start, window_end, n_events, psi) once the watermark closes
    each window."""
    buckets = len(baseline)
    width = (hi - lo) / buckets
    raw = F.floor((F.col(value_col) - lo) / width).cast("int")
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(buckets - 1))
    counts = (stream.withWatermark(ts_col, watermark)
              .groupBy(F.window(F.col(ts_col), window).alias("w"),
                       bucket.alias("bucket"))
              .agg(F.count(F.lit(1)).alias("n")))
    per_window = (counts
                  .groupBy(F.window(F.window_time("w"), window).alias("w"))
                  .agg(F.collect_list(F.struct("bucket", "n")).alias("arr")))
    total = F.aggregate(F.col("arr"), F.lit(0).cast("long"),
                        lambda acc, x: acc + x["n"])

    def n_of(d: int):
        return F.aggregate(
            F.col("arr"), F.lit(0).cast("long"),
            lambda acc, x: acc + F.when(x["bucket"] == d, x["n"])
            .otherwise(F.lit(0).cast("long")))

    psi = F.lit(0.0)
    for d in range(buckets):
        p_obs = (n_of(d) + 0.5) / (total.cast("double") + 0.5 * buckets)
        p_ref = F.lit(max(float(baseline[d]), 1e-9))
        psi = psi + (p_obs - p_ref) * F.log(p_obs / p_ref)
    return per_window.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        total.alias("n_events"),
        F.round(psi, 6).alias("psi"))


def stream_interval_join(left: DataFrame, right: DataFrame,
                         on: str, left_ts: str, right_ts: str,
                         left_watermark: str, right_watermark: str,
                         within: str, how: str = "inner") -> DataFrame:
    """Stream-stream interval join (the ad-tech click<->impression shape):
    rows join when keys match AND right_ts in [left_ts, left_ts + within].

    Both sides carry watermarks, and the time-range predicate bounds the
    join state on BOTH sides — without it a stream-stream join buffers
    forever.  State eviction: a left row is dropped once the right
    watermark passes left_ts + within; a right row once the left watermark
    passes right_ts.  Outer flavors emit the unmatched row when the
    watermark closes the interval (late results, exactly once).
    """
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= F.expr(f"{left_ts} + INTERVAL {within}"))
    )
    joined = lw.join(rw, cond, how)
    # collapse the duplicated key: keep the side that is never null
    return (joined.drop(lw[on]) if how in ("right", "rightOuter", "right_outer")
            else joined.drop(rw[on]))


def stream_to_table(stream: DataFrame, store: TableStore, collection: str,
                    table: str, checkpoint_dir: str,
                    available_now: bool = True,
                    output_mode: str = "append") -> StreamingQuery:
    """Sink a stream into the versioned table store: each micro-batch
    becomes one committed table version (atomic, pub/sub-visible).
    `available_now=True` reproduces the reference's trigger-when-asked
    batch semantics; False runs continuously.

    For watermarked aggregations use output_mode='update': append mode
    holds a window back until the watermark passes its end, and in an
    availableNow run the watermark only advances on the *next* batch — the
    final windows would never be emitted."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.write(batch_df, collection, table)

    writer = (stream.writeStream.foreachBatch(write_batch)
              .outputMode(output_mode)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def process_new_versions(spark: SparkSession, store: TableStore,
                         collection: str, table: str, state_key: str,
                         fn: Callable[[DataFrame], None]) -> int:
    """Version-bus consumer: apply `fn` to every table version committed
    since the last call (offset tracked in the metadata store).  This is
    the reference's pub/sub trigger loop expressed as an idempotent
    poll-and-advance."""
    hist = store.meta.committed_history(collection, table)
    last = store.meta.get_offset(collection, f"__stream__{state_key}", "version_idx")
    start = int(last) + 1 if last is not None else 0
    for idx in range(start, len(hist)):
        _, path = hist[idx]
        fn(spark.read.parquet(path))
        store.meta.set_offset(collection, f"__stream__{state_key}",
                              "version_idx", idx)
    return max(0, len(hist) - start)


def stateful_running_totals(stream: DataFrame, key: str, value_col: str,
                            output_mode: str = "update") -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-key running
    count/sum maintained across micro-batches in the state store.

    This is the template for operators Spark lacks natively — the state is
    one small tuple per key (bounded memory; keys partition across
    executors), updates are Arrow-batched per group, and the operator
    composes with watermarks/timeouts for eviction at scale."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "k long, n long, total double"
    state_schema = "n long, total double"

    def update(key_tuple, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({"k": [key_tuple[0]], "n": [n], "total": [total]})

    return (stream.groupBy(F.col(key))
            .applyInPandasWithState(update, out_schema, state_schema,
                                    output_mode,
                                    GroupStateTimeout.NoTimeout))


def stateful_running_totals_tws(stream: DataFrame, key: str, value_col: str,
                                output_mode: str = "Update") -> DataFrame:
    """Per-key running count/sum via transformWithStateInPandas — Spark 4's
    successor to applyInPandasWithState (same semantics as
    stateful_running_totals, new operator API).

    Differences that matter at scale: typed composable state (value/list/
    map handles instead of one tuple), per-key timers for eviction, and the
    RocksDB state-store backend (required by this operator) whose
    changelog checkpointing keeps commit cost proportional to the delta,
    not the state size — the right backend when keyed state no longer fits
    the executor heap.

    Gated: the transformWithState protocol speaks protobuf to the state
    server; raise a clear error when google.protobuf is absent instead of
    crashing the streaming python worker mid-query."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(its state-server protocol is protobuf-encoded); install "
            "protobuf or use stateful_running_totals "
            "(applyInPandasWithState) instead") from e
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key_tuple, rows, timerValues):
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._totals.update((n, total))
            yield pd.DataFrame({"k": [key_tuple[0]], "n": [n], "total": [total]})

        def close(self) -> None:
            pass

    return (stream.groupBy(F.col(key))
            .transformWithStateInPandas(
                statefulProcessor=RunningTotals(),
                outputStructType="k long, n long, total double",
                outputMode=output_mode,
                timeMode="None"))


def stream_anomaly_flag(stream: DataFrame, key: str, ts_col: str,
                        value_col: str, id_col: str,
                        window: int = 20, min_periods: int = 8,
                        threshold: float = 2.5,
                        output_mode: str = "update") -> DataFrame:
    """Streaming twin of extensions.rolling_zscore: per-key trailing-window
    anomaly detection with the window carried in the state store (one
    bounded array of `window` micros-quantized longs per key — fixed
    memory, keys partition across executors).

    Parity contract with the batch operator: rows are processed in
    (ts, id) order within each micro-batch, the trailing frame EXCLUDES
    the current row, and mean/std/z are the identical IEEE expressions
    over the identical integer moment sums — so on time-ordered input the
    flagged rows and scores match extensions.rolling_zscore bit-for-bit
    (asserted by the parity test).  Late (out-of-order across batches)
    rows score against the state as-arrived; bound disorder upstream with
    a watermark if exact replay parity is required."""
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (f"{id_col} long, k long, {value_col} double, "
                  f"zscore double")
    state_schema = "w array<long>"

    def update(key_tuple, pdf_iter, state: GroupState):
        (w,) = state.get if state.exists else ([],)
        w = list(w)
        flagged_ids, flagged_vs, flagged_zs = [], [], []
        # concatenate ALL Arrow chunks before sorting: a key whose rows
        # span multiple chunks (default ~10k rows each) would otherwise
        # only be ordered within a chunk, silently breaking the
        # (ts, id)-order parity contract with batch rolling_zscore
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = (chunks[0] if len(chunks) == 1 else
                   pd.concat(chunks, ignore_index=True))
            pdf = pdf.sort_values([ts_col, id_col])
            for v, rid in zip(pdf[value_col], pdf[id_col]):
                v = float(v)
                m = int(math.floor(v * 1e6 + 0.5))
                n = len(w)
                if n >= min_periods:
                    s1 = float(sum(w))
                    s2 = float(sum(x * x for x in w))
                    nd = float(n)
                    mean = (s1 / 1e6) / nd
                    var = ((s2 - s1 * s1 / nd) / (nd - 1)) / 1e12
                    # degenerate window guard (parity with batch
                    # rolling_zscore): a constant window makes var 0 —
                    # or a hair negative under float rounding — and the
                    # batch operator drops such rows (std is NULL under
                    # its CASE guard), so emit no flag instead of
                    # dividing by zero / sqrt'ing a negative
                    if var > 0.0:
                        std = math.sqrt(var)
                        z = (v - mean) / std
                        if abs(z) > threshold:
                            flagged_ids.append(int(rid))
                            flagged_vs.append(v)
                            flagged_zs.append(z)
                w.append(m)
                if len(w) > window:
                    w = w[-window:]
        state.update((w,))
        if flagged_ids:
            yield pd.DataFrame({
                id_col: flagged_ids,
                "k": [key_tuple[0]] * len(flagged_ids),
                value_col: flagged_vs,
                "zscore": flagged_zs,
            })

    return (stream.groupBy(F.col(key))
            .applyInPandasWithState(update, out_schema, state_schema,
                                    output_mode,
                                    GroupStateTimeout.NoTimeout))


def stream_ewma(stream: DataFrame, key: str, ts_col: str,
                value_col: str, id_col: str,
                output_mode: str = "update") -> DataFrame:
    """Streaming per-key EWMA (alpha = 1/2) with O(1) state: the
    smoothed level for every arriving row — the live twin of
    extensions.holt_linear's level recursion (trend-free), for load
    smoothing and online baselining.

    Exactness contract (shared with the batch oracle): levels run in
    micros INTEGERS with explicit floor((y_m + l)/2.0) halving — each
    step is exact integer arithmetic (the /2.0 division is IEEE-exact
    below 2^53), so the sequential recursion replays bit-identically
    in a SQL recursive CTE.  Rows are processed in (ts, id) order
    within each micro-batch (all Arrow chunks concatenated first — the
    stream_anomaly_flag ordering lesson); state is ONE long per key.

    Scale shape: keys partition across executors; state store holds 8
    bytes per key; every micro-batch is one applyInPandasWithState
    pass, no joins, no window."""
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (f"{id_col} long, k long, {value_col} double, "
                  f"level double")
    state_schema = "l long, started boolean"

    def update(key_tuple, pdf_iter, state: GroupState):
        l, started = state.get if state.exists else (0, False)
        ids, vals, levels = [], [], []
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = (chunks[0] if len(chunks) == 1 else
                   pd.concat(chunks, ignore_index=True))
            pdf = pdf.sort_values([ts_col, id_col])
            for v, rid in zip(pdf[value_col], pdf[id_col]):
                v = float(v)
                ym = int(math.floor(v * 1e6 + 0.5))
                if not started:
                    l, started = ym, True
                else:
                    l = int(math.floor((ym + l) / 2.0))
                ids.append(int(rid))
                vals.append(v)
                levels.append(l / 1e6)
        state.update((l, started))
        if ids:
            yield pd.DataFrame({
                id_col: ids,
                "k": [key_tuple[0]] * len(ids),
                value_col: vals,
                "level": levels,
            })

    return (stream.groupBy(F.col(key))
            .applyInPandasWithState(update, out_schema, state_schema,
                                    output_mode,
                                    GroupStateTimeout.NoTimeout))


def pick_topk_per_window(snapshot: DataFrame, key_cols: list[str],
                         n_col: str = "n", k: int = 3) -> DataFrame:
    """Batch post-step for windowed streaming counts: per window, keep
    the top-k keys by count (ties to the lexicographically smaller key)
    — the trending-items pattern: the STREAM maintains only the cheap
    windowed aggregation; the ranking runs on the collected snapshot /
    foreachBatch sink where a per-window sort is tiny.  Input columns:
    window_start, *key_cols, n."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy("window_start").orderBy(
        F.col(n_col).desc(), *[F.col(c).asc() for c in key_cols])
    return (snapshot.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .select("window_start", *key_cols, n_col,
                    F.col("__rk").cast("int").alias("rank")))


def stream_cusum(stream: DataFrame, key: str, ts_col: str,
                 value_col: str, id_col: str, k_micros: int,
                 h_micros: int, output_mode: str = "update") -> DataFrame:
    """Streaming per-key one-sided CUSUM drift detector with O(1)
    integer state: S = max(0, S + x - k) per arriving row, breach
    flagged at S >= h — the live twin of extensions.cusum, catching a
    small persistent per-key shift (a user gone hot, a sensor gone
    biased) long before any single row looks anomalous.

    Exactness contract (shared with the batch oracle): values
    quantize to 1e6 micros and the recursion is pure integer
    arithmetic, so the batch CLOSED FORM S_t = C_t - min(0, min C_j)
    over prefix sums replays it bit-identically.  Rows are processed
    in (ts, id) order within each micro-batch (all Arrow chunks
    concatenated first — the stream_anomaly_flag ordering lesson);
    state is ONE long per key.

    Scale shape: keys partition across executors; state store holds 8
    bytes per key; one applyInPandasWithState pass per micro-batch,
    no joins, no window."""
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (f"{id_col} long, k long, {value_col} double, "
                  f"cusum double, breach boolean")
    state_schema = "s long"

    def update(key_tuple, pdf_iter, state: GroupState):
        (s,) = state.get if state.exists else (0,)
        ids, vals, sums, flags = [], [], [], []
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = (chunks[0] if len(chunks) == 1 else
                   pd.concat(chunks, ignore_index=True))
            pdf = pdf.sort_values([ts_col, id_col])
            for v, rid in zip(pdf[value_col], pdf[id_col]):
                v = float(v)
                ym = int(math.floor(v * 1e6 + 0.5))
                s = max(0, s + ym - k_micros)
                ids.append(int(rid))
                vals.append(v)
                sums.append(s / 1e6)
                flags.append(s >= h_micros)
        state.update((s,))
        if ids:
            yield pd.DataFrame({
                id_col: ids,
                "k": [key_tuple[0]] * len(ids),
                value_col: vals,
                "cusum": sums,
                "breach": flags,
            })

    return (stream.groupBy(F.col(key))
            .applyInPandasWithState(update, out_schema, state_schema,
                                    output_mode,
                                    GroupStateTimeout.NoTimeout))
