"""File format descriptors (reference client/td-sdk/tabsdata/_format.py:
Avro:70, CSV:119-466, NDJSON:467, Log:482, Parquet:497).

Each maps to a Spark reader/writer format + options.  CSV keeps the
reference's knobs (separator, quote, eol, header, schema inference).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class FileFormat:
    name = "parquet"

    def reader_options(self) -> dict[str, str]:
        return {}

    def writer_options(self) -> dict[str, str]:
        return {}


@dataclass
class ParquetFormat(FileFormat):
    name = "parquet"


@dataclass
class CSVFormat(FileFormat):
    """reference _format.py:119-466"""

    name = "csv"
    separator: str = ","
    quote_char: str = '"'
    eol_char: str = "\n"
    has_header: bool = True
    infer_schema: bool = True
    infer_schema_length: int = 100
    null_values: list[str] | None = None
    try_parse_dates: bool = False
    encoding: str = "utf8"
    #: malformed-row policy: "permissive" (keep, null the bad fields),
    #: "drop" (silently skip), "fail" (abort the job).  Web-scale ingest
    #: defaults to permissive — a 100 TB crawl ALWAYS has bad rows, and a
    #: FAILFAST import that dies at row 3 billion wastes the whole job.
    on_bad_lines: str = "permissive"

    def reader_options(self) -> dict[str, str]:
        mode = {"permissive": "PERMISSIVE", "drop": "DROPMALFORMED",
                "fail": "FAILFAST"}.get(self.on_bad_lines)
        if mode is None:
            raise ValueError(
                f"on_bad_lines must be permissive/drop/fail, "
                f"got {self.on_bad_lines!r}")
        opts = {
            "sep": self.separator,
            "quote": self.quote_char,
            "header": str(self.has_header).lower(),
            "inferSchema": str(self.infer_schema).lower(),
            "samplingRatio": "1.0",
            "mode": mode,
            "encoding": "UTF-8" if self.encoding == "utf8" else self.encoding,
        }
        # only force lineSep when the user set a non-default eol: Spark's
        # default line splitting tolerates \n, \r\n and \r, and an explicit
        # lineSep="\n" would leave \r in the last column of CRLF files.
        # "\r\n" is likewise covered by the default splitting (and Spark's
        # CSV lineSep is limited to ONE character, so it cannot be set
        # explicitly anyway).
        if self.eol_char not in ("\n", "\r\n"):
            opts["lineSep"] = self.eol_char
        if self.null_values:
            opts["nullValue"] = self.null_values[0]
        if self.try_parse_dates:
            opts["timestampFormat"] = "yyyy-MM-dd HH:mm:ss"
        return opts

    def writer_options(self) -> dict[str, str]:
        opts = {
            "sep": self.separator,
            "quote": self.quote_char,
            "header": str(self.has_header).lower(),
            # fuzzer-found (r10, seed 20260912): Spark's CSV WRITER trims
            # leading/trailing whitespace by default (both ignore*WhiteSpace
            # write options default true, unlike the read side), silently
            # corrupting whitespace-padded fields on a write->read
            # round-trip.  Polars write_csv preserves them — so do we.
            "ignoreLeadingWhiteSpace": "false",
            "ignoreTrailingWhiteSpace": "false",
        }
        # a custom eol was previously IGNORED on write (files came out
        # '\n'-separated while the paired reader expected the custom eol).
        # Spark's CSV lineSep is one character on both sides; "\r\n" output
        # is not expressible, so reject it rather than silently write '\n'.
        if self.eol_char != "\n":
            if len(self.eol_char) > 1:
                raise ValueError(
                    "Spark CSV writes 1-character line separators; "
                    f"cannot write eol_char={self.eol_char!r} (reading "
                    "CRLF files works via the default line splitting)")
            opts["lineSep"] = self.eol_char
        return opts


@dataclass
class NDJSONFormat(FileFormat):
    """newline-delimited JSON -> Spark 'json' (lines mode is the default).

    Write-side contract follows the reference's Polars-backed ndjson
    (file_outputs.py delegates to polars write_ndjson): null fields are
    serialized explicitly (`{"a":null}`) rather than omitted, so
    partially- and even fully-null columns survive a round-trip — with
    Spark's default ignoreNullFields=true an all-null column vanishes
    from the file and therefore from the re-read schema.  (Non-finite
    doubles are nulled in FileDestination.save — JSON has no NaN/Inf
    token; see the note there.)"""

    name = "json"

    def writer_options(self) -> dict[str, str]:
        return {"ignoreNullFields": "false"}


@dataclass
class LogFormat(FileFormat):
    """whole lines as a single string column (reference _format.py:482 ->
    one 'str' column) -> Spark 'text' (column named value, renamed later)."""

    name = "text"


@dataclass
class ORCFormat(FileFormat):
    """Columnar sibling of parquet; Spark ships the ORC reader/writer
    in-core (orc-core jar is bundled).  Extension beyond the reference's
    format list — useful for Hive-adjacent lakes."""

    name = "orc"


@dataclass
class XMLFormat(FileFormat):
    """Spark 4 ships the (formerly spark-xml) XML source in-core.
    Extension beyond the reference's format list — the long tail of
    enterprise feeds is XML.  `row_tag` names the repeated element that
    becomes a row; `root_tag` wraps written output."""

    name = "xml"
    row_tag: str = "row"
    root_tag: str = "rows"

    def reader_options(self) -> dict[str, str]:
        return {"rowTag": self.row_tag}

    def writer_options(self) -> dict[str, str]:
        return {"rowTag": self.row_tag, "rootTag": self.root_tag}


@dataclass
class AvroFormat(FileFormat):
    """Spark's avro is an external module; reading raises a clear error if
    the spark-avro jar is absent (gate, don't crash at import)."""

    name = "avro"


def _tsv() -> CSVFormat:
    # a .tsv read with the CSV default comma separator is silently wrong
    return CSVFormat(separator="\t")


_EXT_MAP = {
    ".parquet": ParquetFormat, ".pq": ParquetFormat,
    ".csv": CSVFormat, ".tsv": _tsv,
    ".ndjson": NDJSONFormat, ".jsonl": NDJSONFormat, ".json": NDJSONFormat,
    ".log": LogFormat, ".txt": LogFormat,
    ".avro": AvroFormat,
    ".orc": ORCFormat,
    ".xml": XMLFormat,
}


def format_for(path_or_fmt) -> FileFormat:
    """Accept a FileFormat, a format name, or infer from a path extension."""
    if isinstance(path_or_fmt, FileFormat):
        return path_or_fmt
    if isinstance(path_or_fmt, str):
        low = path_or_fmt.lower()
        by_name = {"parquet": ParquetFormat, "csv": CSVFormat,
                   "ndjson": NDJSONFormat, "json": NDJSONFormat,
                   "jsonl": NDJSONFormat, "log": LogFormat,
                   "avro": AvroFormat, "orc": ORCFormat,
                   "xml": XMLFormat}
        if low in by_name:
            return by_name[low]()
        for ext, cls in _EXT_MAP.items():
            if low.endswith(ext):
                return cls()
    raise ValueError(f"cannot determine file format for {path_or_fmt!r}")
