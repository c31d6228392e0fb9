"""File sources and destinations (reference _io/inputs/file_inputs.py and
_io/outputs/file_outputs.py).

Spark-first: the reference shells out to a Rust `transporter` binary to
download+convert files (file_inputs.py:1101-1277); Spark readers are already
distributed, so a source here is just (paths, format, options) + the
incremental `initial_last_modified` filter, and a destination is a
DataFrame writer with the reference's path-placeholder semantics.

Cloud variants (S3/Azure/GCS) are the same readers with filesystem configs
(fs.s3a.* / abfss / gs) carried by credential objects — identical code
path, so one implementation covers the whole matrix.
"""

from __future__ import annotations

import datetime as dt
import glob as _glob
import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from .formats import (AvroFormat, FileFormat, LogFormat, NDJSONFormat,
                      format_for)


def _null_non_finite(col, dtype):
    """JSON has no NaN/Infinity token: Spark's writer emits them as the
    STRINGS "NaN"/"Infinity", which silently corrupts the column to
    string on schema-inferred re-read.  The reference's Polars ndjson
    writer serializes non-finite floats as null (serde JSON), keeping
    the column numeric — match that.  Rewrites nested floats too
    (arrays / structs / map values)."""
    from pyspark.sql import types as T

    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return F.when(F.isnan(col) | col.isin(float("inf"), float("-inf")),
                      F.lit(None)).otherwise(col)
    if isinstance(dtype, T.ArrayType):
        return F.transform(col, lambda x: _null_non_finite(x, dtype.elementType))
    if isinstance(dtype, T.MapType):
        return F.transform_values(
            col, lambda _, v: _null_non_finite(v, dtype.valueType))
    if isinstance(dtype, T.StructType):
        rebuilt = F.struct(*[
            _null_non_finite(col.getField(f.name), f.dataType).alias(f.name)
            for f in dtype.fields])
        # a null struct must stay null, not become a struct of nulls
        return F.when(col.isNull(), F.lit(None)).otherwise(rebuilt)
    return col


def _has_float(dtype) -> bool:
    from pyspark.sql import types as T

    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return True
    if isinstance(dtype, T.ArrayType):
        return _has_float(dtype.elementType)
    if isinstance(dtype, T.MapType):
        return _has_float(dtype.valueType)
    if isinstance(dtype, T.StructType):
        return any(_has_float(f.dataType) for f in dtype.fields)
    return False


def _ndjson_key_order(paths: list[str]) -> list[str]:
    """Top-level key order of the first non-empty line of the first
    readable local file.  Spark's JSON schema inference SORTS field names
    alphabetically, losing the column order the frame was written with;
    Polars' read_ndjson preserves first-seen key order, and the loader
    restores it from this peek.  Best-effort: unreadable / non-local /
    non-object input returns [] and the Spark order stands."""
    import json as _json

    for p in sorted(paths):
        candidates = sorted(_glob.glob(p)) if any(ch in p for ch in "*?[") \
            else [p]
        for c in candidates:
            if os.path.isdir(c):
                candidates.extend(
                    sorted(_glob.glob(os.path.join(c, "part-*"))))
                continue
            try:
                with open(c, encoding="utf-8") as fh:
                    for line in fh:
                        line = line.strip()
                        if not line:
                            continue
                        pairs = _json.loads(
                            line, object_pairs_hook=lambda kv: kv)
                        if isinstance(pairs, list):
                            return [k for k, _ in pairs]
                        return []
            except (OSError, ValueError):
                continue
    return []


_AVRO_PROBE_CACHE: dict[int, bool] = {}


def _spark_avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro *data source* is registered (preferred:
    block-splittable scans, codegen row decode).  Without it the
    pure-Python container codec in avro_py takes over.  NB: Class.forName
    on AvroFileFormat is NOT a valid probe — the spark-connect jar shades
    the avro classes without registering the source — so probe the actual
    DataSource lookup and cache per session."""
    key = id(spark)
    if key not in _AVRO_PROBE_CACHE:
        try:
            spark.read.format("avro").load("/nonexistent-avro-probe-path")
            _AVRO_PROBE_CACHE[key] = True
        except Exception as e:
            # path-not-found means the source resolved; find-data-source
            # failure means the jar is absent
            _AVRO_PROBE_CACHE[key] = "find data source" not in str(e).lower()
    return _AVRO_PROBE_CACHE[key]


# --------------------------------------------------------------------------
# credentials (reference _credentials.py shapes; applied as hadoop confs)
# --------------------------------------------------------------------------
@dataclass
class S3AccessKeyCredentials:
    access_key_id: str
    secret_access_key: str
    region: str | None = None

    def spark_confs(self) -> dict[str, str]:
        c = {
            "fs.s3a.access.key": self.access_key_id,
            "fs.s3a.secret.key": self.secret_access_key,
        }
        if self.region:
            c["fs.s3a.endpoint.region"] = self.region
        return c


@dataclass
class AzureAccountKeyCredentials:
    account_name: str
    account_key: str

    def spark_confs(self) -> dict[str, str]:
        return {
            f"fs.azure.account.key.{self.account_name}.dfs.core.windows.net":
                self.account_key,
        }


@dataclass
class GCSServiceAccountCredentials:
    keyfile_json_path: str

    def spark_confs(self) -> dict[str, str]:
        return {
            "google.cloud.auth.service.account.enable": "true",
            "google.cloud.auth.service.account.json.keyfile": self.keyfile_json_path,
        }


def _parse_last_modified(value: str | dt.datetime | None) -> dt.datetime | None:
    """Validate + normalize an initial_last_modified value (reference
    file_inputs.py setter): falsy -> None, ISO-8601 strings parse, and
    tz-naive inputs raise (SOCE41) instead of silently resolving in the
    box's local timezone."""
    if not value:
        return None
    if isinstance(value, str):
        try:
            value = dt.datetime.fromisoformat(value)
        except ValueError:
            raise ValueError(
                f"initial_last_modified is not ISO 8601: {value!r}") from None
    if not isinstance(value, dt.datetime):
        raise TypeError(
            f"initial_last_modified must be str or datetime, got {type(value)}")
    if value.tzinfo is None:
        raise ValueError(
            "initial_last_modified must be timezone-aware (the reference "
            "rejects naive datetimes; a naive cutoff would depend on the "
            "machine's local timezone)")
    return value


def _apply_confs(spark: SparkSession, confs: dict[str, str]) -> None:
    try:
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for k, v in confs.items():
            hconf.set(k, v)
    except Exception:
        # Spark Connect: no JVM handle.  Hadoop FS confs are also accepted
        # as runtime SQL confs by the connectors' per-bucket/per-container
        # resolution; best-effort set them there.
        for k, v in confs.items():
            spark.conf.set(k, v)


# --------------------------------------------------------------------------
# sources
# --------------------------------------------------------------------------
@dataclass
class FileSource:
    """Base: scan files of one format, with wildcard support and the
    incremental last-modified filter (reference file_inputs.py:580
    `initial_last_modified`).  Returns (DataFrame, new_offset)."""

    path: str | list[str]
    format: Any = None
    initial_last_modified: str | dt.datetime | None = None

    scheme: str = ""
    credentials: Any = None

    def __post_init__(self):
        # config-time validation, reference parity (file_inputs.py:237-268
        # + _raise_exception_if_no_tzinfo:1410): a bad ISO string raises
        # SOCE5; a tz-NAIVE datetime raises SOCE41 — a naive cutoff would
        # otherwise resolve in the box's local timezone, making the
        # incremental filter machine-dependent.
        _parse_last_modified(self.initial_last_modified)

    def _paths(self) -> list[str]:
        return self.path if isinstance(self.path, list) else [self.path]

    def _fmt(self) -> FileFormat:
        return format_for(self.format if self.format is not None else self._paths()[0])

    def load(self, spark: SparkSession) -> tuple[DataFrame, str | None]:
        if self.credentials is not None:
            _apply_confs(spark, self.credentials.spark_confs())
        fmt = self._fmt()
        paths, new_offset = self._filtered_paths()
        if isinstance(fmt, AvroFormat) and not _spark_avro_available(spark):
            # spark-avro jar absent: pure-Python container codec, still
            # distributed (binaryFile + mapInPandas; avro_py module doc)
            from .avro_py import read_avro

            df = read_avro(spark, paths or self._paths())
            if not paths:
                df = df.limit(0)
            return df, new_offset
        reader = spark.read.format(fmt.name).options(**fmt.reader_options())
        if not paths:
            # No files newer than the stored offset: a no-op run, not a
            # failure.  reader.load([]) raises (unable to infer schema), so
            # derive the schema from the full (already-ingested) file set
            # and return an empty frame of the right shape.
            df = reader.load(self._paths()).limit(0)
        else:
            df = reader.load(paths)
        if isinstance(fmt, LogFormat):
            df = df.withColumnRenamed("value", "log")
        if isinstance(fmt, NDJSONFormat) and self.scheme in ("", "file"):
            order = _ndjson_key_order(paths or self._paths())
            if order and set(order) <= set(df.columns):
                df = df.select(
                    *order, *[c for c in df.columns if c not in order])
        return df, new_offset

    def _filtered_paths(self) -> tuple[list[str], str | None]:
        """Local-scheme incremental filter: keep files modified strictly
        after the stored offset; return the max mtime seen as next offset.
        (Cloud schemes delegate listing to Spark; offset passthrough.)"""
        paths = self._paths()
        if self.scheme not in ("", "file"):
            return paths, None
        expanded: list[tuple[str, float]] = []
        for p in paths:
            matches = _glob.glob(p) if any(ch in p for ch in "*?[") else [p]
            for m in matches:
                if os.path.isfile(m):
                    expanded.append((m, os.path.getmtime(m)))
                elif os.path.isdir(m):
                    expanded.append((m, os.path.getmtime(m)))
        if not expanded:
            raise FileNotFoundError(f"no files match {paths}")
        parsed = _parse_last_modified(self.initial_last_modified)
        cutoff = parsed.timestamp() if parsed is not None else None
        # compare at microsecond granularity: the ISO offset string only
        # carries µs, so a raw float compare would re-ingest the newest file
        # forever (its ns-precision mtime is > the truncated cutoff)
        us = lambda t: int(t * 1_000_000)
        kept = [p for p, m in expanded if cutoff is None or us(m) > us(cutoff)]
        max_m = max((m for _, m in expanded), default=None)
        new_offset = (
            dt.datetime.fromtimestamp(max_m, dt.timezone.utc).isoformat()
            if max_m is not None else None
        )
        if not kept:
            kept = []  # nothing new: empty scan list handled by caller
        return kept, new_offset


@dataclass
class LocalFileSource(FileSource):
    scheme: str = ""


@dataclass
class S3Source(FileSource):
    scheme: str = "s3a"


@dataclass
class AzureSource(FileSource):
    scheme: str = "abfss"


@dataclass
class GCSSource(FileSource):
    scheme: str = "gs"


# --------------------------------------------------------------------------
# destinations
# --------------------------------------------------------------------------
@dataclass
class FileDestination:
    """Write a DataFrame with the reference's placeholder semantics
    (file_outputs.py:90,1779): `$EXPORT_TIMESTAMP` -> epoch ms at export;
    `$FRAGMENT_IDX` -> Spark's natural part-file numbering (fragments ARE
    part files in a distributed engine — the reference writes fragments
    serially, Spark writes them in parallel)."""

    path: str
    format: Any = None
    single_file: bool = False

    scheme: str = ""
    credentials: Any = None

    def save(self, df: DataFrame, spark: SparkSession | None = None) -> str:
        if self.credentials is not None and spark is not None:
            _apply_confs(spark, self.credentials.spark_confs())
        fmt = format_for(self.format if self.format is not None else self.path)
        path = self.path.replace(
            "$EXPORT_TIMESTAMP",
            str(int(dt.datetime.now(dt.timezone.utc).timestamp() * 1000)),
        )
        # $FRAGMENT_IDX: Spark part-file numbering subsumes it; a path
        # containing the placeholder becomes a directory write
        path = path.replace("$FRAGMENT_IDX", "").rstrip("-_")
        out = df
        if isinstance(fmt, LogFormat):
            cols = df.columns
            out = df.select(F.col(cols[0]).cast("string").alias("value"))
        if isinstance(fmt, NDJSONFormat):
            # see _null_non_finite: Polars-parity NaN/Inf -> null
            floats = [f for f in out.schema.fields if _has_float(f.dataType)]
            if floats:
                out = out.withColumns({
                    f.name: _null_non_finite(F.col(f.name), f.dataType)
                    for f in floats})
        if self.single_file:
            out = out.coalesce(1)
        if isinstance(fmt, AvroFormat) and \
                not _spark_avro_available(df.sparkSession):
            import shutil

            from .avro_py import write_avro

            shutil.rmtree(path, ignore_errors=True)   # overwrite semantics
            write_avro(out, path)
            return path
        (out.write.format(fmt.name).options(**fmt.writer_options())
            .mode("overwrite").save(path))
        return path


@dataclass
class LocalFileDestination(FileDestination):
    scheme: str = ""


@dataclass
class S3Destination(FileDestination):
    scheme: str = "s3a"


@dataclass
class AzureDestination(FileDestination):
    scheme: str = "abfss"


@dataclass
class GCSDestination(FileDestination):
    scheme: str = "gs"
