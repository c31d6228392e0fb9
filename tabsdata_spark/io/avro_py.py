"""Pure-Python Avro Object Container File codec + distributed Spark I/O.

The reference ships Avro read support through its file importer
(client/td-sdk/tabsdata/io/input.py avro branch); Spark's own Avro source
lives in the external `spark-avro` module, which is not bundled with
pyspark.  Rather than gate the whole format on a missing jar, this module
implements the Avro 1.x Object Container File spec (public:
avro.apache.org/docs/current/specification) directly:

- binary encoding: zigzag-varint longs, length-prefixed bytes/strings,
  little-endian IEEE float/double, unions by branch index, arrays/maps in
  counted blocks;
- container framing: magic 'Obj\\x01', metadata map (schema JSON + codec),
  16-byte sync marker, blocks of (record_count, byte_length, payload);
- codecs: null and deflate (zlib raw); snappy needs python-snappy — gated.

Distribution model (scale note): reads go through Spark's `binaryFile`
source — each .avro file is one input row, decoded executor-side inside
`mapInPandas` with this codec, so a directory of N files decodes with
parallelism N and the driver never holds file bytes.  Avro files don't
block-split here (one file = one task), which matches how the reference's
importer consumes them (file-at-a-time); produce many files for
parallelism.  Writes encode per-partition container files executor-side.

Correctness is held to the *Java* Avro implementation already on Spark's
classpath (avro-1.12 jar): tests round-trip files written by
org.apache.avro.file.DataFileWriter through this decoder and vice versa.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, Iterator

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------
def _write_long(out: io.BytesIO, n: int) -> None:
    z = (n << 1) ^ (n >> 63)
    z &= (1 << 64) - 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


class _Reader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        shift = 0
        accum = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            accum |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (accum >> 1) ^ -(accum & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


# ---------------------------------------------------------------------------
# schema-driven datum codec
# ---------------------------------------------------------------------------
def _resolve(schema: Any) -> Any:
    """{'type': 'long'} -> 'long'; leave dicts for complex types."""
    if isinstance(schema, dict) and isinstance(schema.get("type"), str) \
            and set(schema) <= {"type", "logicalType", "precision", "scale"} \
            and schema["type"] not in ("record", "enum", "array", "map", "fixed"):
        return schema["type"]
    return schema


def decode_datum(schema: Any, r: _Reader) -> Any:
    schema = _resolve(schema)
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            return r.read(1) == b"\x01"
        if schema in ("int", "long"):
            return r.read_long()
        if schema == "float":
            return struct.unpack("<f", r.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", r.read(8))[0]
        if schema == "bytes":
            return r.read_bytes()
        if schema == "string":
            return r.read_bytes().decode("utf-8")
        raise ValueError(f"unsupported avro type: {schema}")
    if isinstance(schema, list):                      # union: branch index
        idx = r.read_long()
        return decode_datum(schema[idx], r)
    t = schema["type"]
    if t == "record":
        return {f["name"]: decode_datum(f["type"], r)
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:                                  # block with byte size
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(decode_datum(schema["items"], r))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = decode_datum(schema["values"], r)
        return out
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "fixed":
        return r.read(schema["size"])
    raise ValueError(f"unsupported avro type: {t}")


def encode_datum(schema: Any, v: Any, out: io.BytesIO) -> None:
    schema = _resolve(schema)
    if isinstance(schema, str):
        if schema == "null":
            return
        if schema == "boolean":
            out.write(b"\x01" if v else b"\x00")
        elif schema in ("int", "long"):
            _write_long(out, int(v))
        elif schema == "float":
            out.write(struct.pack("<f", float(v)))
        elif schema == "double":
            out.write(struct.pack("<d", float(v)))
        elif schema == "bytes":
            _write_long(out, len(v))
            out.write(bytes(v))
        elif schema == "string":
            b = str(v).encode("utf-8")
            _write_long(out, len(b))
            out.write(b)
        else:
            raise ValueError(f"unsupported avro type: {schema}")
        return
    if isinstance(schema, list):                      # union
        for i, branch in enumerate(schema):
            bt = _resolve(branch)
            if v is None and bt == "null":
                _write_long(out, i)
                return
            if v is not None and bt != "null":
                _write_long(out, i)
                encode_datum(branch, v, out)
                return
        raise ValueError(f"no union branch for {v!r} in {schema}")
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            encode_datum(f["type"], v.get(f["name"]), out)
    elif t == "array":
        if v:
            _write_long(out, len(v))
            for item in v:
                encode_datum(schema["items"], item, out)
        _write_long(out, 0)
    elif t == "map":
        if v:
            _write_long(out, len(v))
            for k, val in v.items():
                kb = str(k).encode("utf-8")
                _write_long(out, len(kb))
                out.write(kb)
                encode_datum(schema["values"], val, out)
        _write_long(out, 0)
    elif t == "enum":
        _write_long(out, schema["symbols"].index(v))
    elif t == "fixed":
        out.write(bytes(v))
    else:
        raise ValueError(f"unsupported avro type: {t}")


# ---------------------------------------------------------------------------
# container file framing
# ---------------------------------------------------------------------------
def read_container(data: bytes) -> tuple[dict, list[dict]]:
    """Decode a whole Object Container File -> (schema, records)."""
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError("not an avro object container file")
    meta = decode_datum({"type": "map", "values": "bytes"}, r)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = r.read(16)
    records: list[dict] = []
    while not r.at_end():
        n = r.read_long()
        blen = r.read_long()
        payload = r.read(blen)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec == "snappy":
            raise NotImplementedError(
                "snappy avro codec needs python-snappy (absent); "
                "use null or deflate")
        elif codec != "null":
            raise ValueError(f"unknown avro codec {codec}")
        br = _Reader(payload)
        for _ in range(n):
            records.append(decode_datum(schema, br))
        if r.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return schema, records


def write_container(schema: dict, records: list[dict],
                    codec: str = "null") -> bytes:
    """Encode records into one Object Container File (single block)."""
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    encode_datum({"type": "map", "values": "bytes"}, meta, out)
    # deterministic sync marker from the schema (content-addressed; the
    # spec only requires the 16 bytes to match between blocks of one file)
    import hashlib
    sync = hashlib.md5(json.dumps(schema).encode()).digest()
    out.write(sync)
    payload = io.BytesIO()
    for rec in records:
        encode_datum(schema, rec, payload)
    body = payload.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(wbits=-15)
        body = comp.compress(body) + comp.flush()
    elif codec != "null":
        raise NotImplementedError(f"write codec {codec} unsupported")
    if records:
        _write_long(out, len(records))
        _write_long(out, len(body))
        out.write(body)
        out.write(sync)
    return out.getvalue()


# ---------------------------------------------------------------------------
# Spark <-> Avro schema mapping
# ---------------------------------------------------------------------------
_SPARK_TO_AVRO = {"bigint": "long", "long": "long", "int": "int",
                  "smallint": "int", "tinyint": "int",
                  "double": "double", "float": "float", "boolean": "boolean",
                  "string": "string", "binary": "bytes"}
_AVRO_TO_SPARK = {"long": "bigint", "int": "int", "double": "double",
                  "float": "float", "boolean": "boolean", "string": "string",
                  "bytes": "binary", "null": "string"}


def avro_schema_for(spark_schema, name: str = "row") -> dict:
    """StructType -> Avro record schema; every field nullable via union."""
    fields = []
    for f in spark_schema.fields:
        simple = f.dataType.simpleString()
        if simple.startswith("array<"):
            inner = simple[len("array<"):-1]
            at: Any = {"type": "array",
                       "items": _SPARK_TO_AVRO.get(inner, "string")}
        elif simple in _SPARK_TO_AVRO:
            at = _SPARK_TO_AVRO[simple]
        elif simple.startswith("timestamp"):
            at = {"type": "long", "logicalType": "timestamp-micros"}
        elif simple == "date":
            at = {"type": "int", "logicalType": "date"}
        else:
            at = "string"                              # lossy fallback
        fields.append({"name": f.name, "type": ["null", at],
                       "default": None})
    return {"type": "record", "name": name, "fields": fields}


def spark_ddl_for(avro_schema: dict) -> str:
    """Avro record schema -> Spark DDL string."""
    cols = []
    for f in avro_schema["fields"]:
        t = f["type"]
        if isinstance(t, list):                        # nullable union
            t = next((b for b in t if _resolve(b) != "null"), "string")
        # logicalType check must precede _resolve (which strips the
        # annotated-primitive dict down to its raw storage type)
        if isinstance(t, dict) and t.get("logicalType") == "timestamp-micros":
            cols.append(f"`{f['name']}` timestamp")
            continue
        if isinstance(t, dict) and t.get("logicalType") == "date":
            cols.append(f"`{f['name']}` date")
            continue
        t = _resolve(t)
        if isinstance(t, dict) and t.get("type") == "array":
            items = _resolve(t["items"])
            if isinstance(items, list):
                items = next((b for b in items if _resolve(b) != "null"),
                             "string")
            inner = _AVRO_TO_SPARK.get(items if isinstance(items, str)
                                       else "string", "string")
            ddl = f"array<{inner}>"
        elif isinstance(t, dict) and t.get("logicalType") == "timestamp-micros":
            ddl = "timestamp"
        elif isinstance(t, dict) and t.get("logicalType") == "date":
            ddl = "date"
        elif isinstance(t, str):
            ddl = _AVRO_TO_SPARK.get(t, "string")
        else:
            ddl = "string"
        cols.append(f"`{f['name']}` {ddl}")
    return ", ".join(cols)


# ---------------------------------------------------------------------------
# distributed read / write
# ---------------------------------------------------------------------------
def read_avro(spark, paths: str | list[str]):
    """Distributed Avro read: binaryFile source (one row per file) ->
    mapInPandas decode.  Schema comes from the first file, driver-side
    (footer-sized read, not a full scan)."""
    import pandas as pd

    first = spark.read.format("binaryFile").load(paths) \
        .select("path").limit(1).collect()
    if not first:
        raise FileNotFoundError(f"no avro files at {paths}")
    fpath = first[0].path
    local = fpath[len("file:"):] if fpath.startswith("file:") else fpath
    with open(local, "rb") as fh:
        # header + first block is enough for schema; read a bounded chunk
        head = fh.read(1 << 20)
    r = _Reader(head)
    r.read(4)
    meta = decode_datum({"type": "map", "values": "bytes"}, r)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    ddl = spark_ddl_for(schema)
    names = [f["name"] for f in schema["fields"]]

    # logical-type columns arrive as raw longs/ints from the binary codec;
    # convert at the pandas boundary (codec stays logical-type-agnostic)
    logical = {}
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            t = next((b for b in t if _resolve(b) != "null"), None)
        if isinstance(t, dict) and t.get("logicalType") == "timestamp-micros":
            logical[f["name"]] = "ts"
        elif isinstance(t, dict) and t.get("logicalType") == "date":
            logical[f["name"]] = "date"

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import datetime as _dt
        for pdf in batches:
            for content in pdf["content"]:
                _, recs = read_container(bytes(content))
                cols = {n: [rec.get(n) for rec in recs] for n in names}
                for n, kind in logical.items():
                    if kind == "ts":
                        cols[n] = pd.to_datetime(cols[n], unit="us")
                    else:
                        epoch = _dt.date(1970, 1, 1)
                        cols[n] = [
                            None if d is None
                            else epoch + _dt.timedelta(days=d)
                            for d in cols[n]]
                yield pd.DataFrame(cols)

    files = spark.read.format("binaryFile").load(paths).select("content")
    return files.mapInPandas(_decode, schema=ddl)


def write_avro(df, path: str, codec: str = "null") -> None:
    """Distributed Avro write: one container file per partition, encoded
    executor-side (POSIX/shared-fs destination, like all local writes)."""
    schema = avro_schema_for(df.schema)
    os.makedirs(path, exist_ok=True)
    names = df.columns
    simple = {f.name: f.dataType.simpleString() for f in df.schema.fields}

    def _to_avro_value(col: str, v):
        if v is None:
            return None
        t = simple[col]
        if t.startswith("timestamp"):
            import datetime as _dt
            epoch = _dt.datetime(1970, 1, 1, tzinfo=getattr(v, "tzinfo", None))
            return int((v - epoch).total_seconds() * 1_000_000)
        if t == "date":
            import datetime as _dt
            return (v - _dt.date(1970, 1, 1)).days
        return v

    def _write_partition(idx, rows_iter):
        rows = [tuple(r) for r in rows_iter]
        recs = [{n: _to_avro_value(n, v) for n, v in zip(names, row)}
                for row in rows]
        if not recs:
            return iter([])
        blob = write_container(schema, recs, codec=codec)
        with open(os.path.join(path, f"part-{idx:05d}.avro"), "wb") as fh:
            fh.write(blob)
        return iter([len(recs)])

    df.rdd.mapPartitionsWithIndex(_write_partition).count()


__all__ = ["read_container", "write_container", "read_avro", "write_avro",
           "avro_schema_for", "spark_ddl_for"]
