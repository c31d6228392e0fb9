"""Seeded differential fuzz of three surfaces the existing fuzzers don't
reach (r9 verdict item 4):

  A. dq namespace — random check chains (null/NaN/sign/membership/range)
     over mixed null/NaN/inf columns vs a DuckDB predicate oracle on
     identical rows.  Pinned subtleties: Spark isnan(NULL) is false (so
     is_nan never yields null while DuckDB's isnan propagates), NaN
     compares greater than every number in BOTH engines, and membership
     checks stay three-valued (null in / not in -> null).
  B. UDF struct pack/unpack round-trips — random output schemas
     (bigint/double/string/boolean) over random input column subsets,
     on_batch vs on_element parity across both signature styles
     ('unpacked' and 'list') vs a DuckDB oracle computing the same
     formulas.
  C. CSV format round-trips — separator x quote x eol x header x
     inferSchema grids with separator/quote/space-bearing field values:
     LocalFileDestination.save -> LocalFileSource.load must reproduce
     the frame exactly (the r8 '.tsv' defect class).

Every program is reproducible from the printed (seed, program, spec)
triple; committed seeds are frozen.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

import tabsdata_spark as td

# ----------------------------------------------------------------- common


def _canon(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, bool):
                vals.append(v)
            elif isinstance(v, float) and math.isnan(v):
                vals.append("NaN")
            elif isinstance(v, (int, float)):
                vals.append(round(float(v), 9))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(type(x)), x)
                                           for x in t))


def _check(got, want, ctx):
    gc, wc = _canon([tuple(r) for r in got]), _canon([tuple(r) for r in want])
    assert gc == wc, (f"{ctx}\nspark ({len(gc)}): {gc[:8]}\n"
                      f"duckdb({len(wc)}): {wc[:8]}")


# ------------------------------------------------- family A: dq namespace

_NAN, _INF = float("nan"), float("inf")
_D_POOL = [None, _NAN, _INF, -_INF, -0.0, 0.0, 1.5, -2.25, 1e300, 3.0]
_I_POOL = [None, 0, 1, -1, 7, -42, 2 ** 40]
_S_POOL = [None, "", "a", "ab", "Z9", " x", "0"]


def _dq_rows(rng: random.Random, n: int = 36):
    return [(k, rng.choice(_D_POOL), rng.choice(_I_POOL), rng.choice(_S_POOL))
            for k in range(n)]


def _duck_values(rows) -> str:
    def lit(v, typ):
        if v is None:
            return f"NULL::{typ}"
        if typ == "DOUBLE":
            if math.isnan(v):
                return "'nan'::DOUBLE"
            if math.isinf(v):
                return ("'inf'::DOUBLE" if v > 0 else "'-inf'::DOUBLE")
            return f"CAST({v!r} AS DOUBLE)"
        if typ == "BIGINT":
            return f"CAST({v} AS BIGINT)"
        return "'" + v.replace("'", "''") + "'"

    parts = [f"({k}, {lit(d, 'DOUBLE')}, {lit(i, 'BIGINT')},"
             f" {lit(s, 'VARCHAR')})" for k, d, i, s in rows]
    return "(VALUES " + ", ".join(parts) + ") t(id, d, i, s)"


def _num_lit(v) -> str:
    return repr(float(v)) if isinstance(v, float) else str(v)


def _gen_dq_check(rng: random.Random, name: str):
    """One dq check: returns (apply(tf) -> tf, oracle_sql_predicate, spec)."""
    kind = rng.choice([
        "is_null", "is_not_null", "is_nan", "is_not_nan", "is_null_or_nan",
        "is_not_null_or_nan", "is_in", "is_not_in", "is_positive",
        "is_positive_or_zero", "is_negative", "is_negative_or_zero",
        "is_zero", "is_between", "is_not_between"])
    if kind in ("is_nan", "is_not_nan", "is_null_or_nan",
                "is_not_null_or_nan"):
        col = "d"
    elif kind in ("is_in", "is_not_in"):
        col = rng.choice(["i", "s"])
    elif kind in ("is_null", "is_not_null"):
        col = rng.choice(["d", "i", "s"])
    else:
        col = rng.choice(["d", "i"])

    if kind in ("is_in", "is_not_in"):
        pool = [v for v in (_I_POOL if col == "i" else _S_POOL)
                if v is not None]
        vals = rng.sample(pool, rng.randint(1, 3))
        if col == "i":
            inlist = ", ".join(str(v) for v in vals)
        else:
            inlist = ", ".join("'" + v.replace("'", "''") + "'"
                               for v in vals)
        neg = "NOT " if kind == "is_not_in" else ""
        sql = f"{neg}({col} IN ({inlist})) AS {name}"
        return (lambda tf: getattr(tf.dq, kind)(col, vals, name=name),
                sql, f"{kind}({col}, {vals})")
    if kind in ("is_between", "is_not_between"):
        pool = [v for v in (_I_POOL if col == "i" else _D_POOL)
                if v is not None and (not isinstance(v, float)
                                      or math.isfinite(v))]
        lo, hi = rng.choice(pool), rng.choice(pool)
        if kind == "is_between":
            sql = (f"(({col} >= {_num_lit(lo)}) AND ({col} <= {_num_lit(hi)}))"
                   f" AS {name}")
        else:
            sql = (f"(({col} < {_num_lit(lo)}) OR ({col} > {_num_lit(hi)}))"
                   f" AS {name}")
        return (lambda tf: getattr(tf.dq, kind)(col, lo, hi, name=name),
                sql, f"{kind}({col}, {lo}, {hi})")

    oracle = {
        "is_null": "{c} IS NULL",
        "is_not_null": "{c} IS NOT NULL",
        # Spark's isnan(NULL) is false, DuckDB's propagates null
        "is_nan": "COALESCE(isnan({c}), false)",
        "is_not_nan": "NOT COALESCE(isnan({c}), false)",
        "is_null_or_nan": "({c} IS NULL OR COALESCE(isnan({c}), false))",
        "is_not_null_or_nan": "({c} IS NOT NULL AND NOT isnan({c}))",
        "is_positive": "{c} > 0",
        "is_positive_or_zero": "{c} >= 0",
        "is_negative": "{c} < 0",
        "is_negative_or_zero": "{c} <= 0",
        "is_zero": "{c} = 0",
    }[kind].format(c=col)
    return (lambda tf: getattr(tf.dq, kind)(col, name=name),
            f"{oracle} AS {name}", f"{kind}({col})")


@pytest.mark.parametrize("seed", [20260910])
def test_fuzz_dq_checks(spark, seed):
    from _concurrency import run_concurrent

    # phase 1: all rng draws stay SEQUENTIAL (bit-identical program
    # stream to the former inline loop)
    rng = random.Random(seed)
    programs = []
    for prog in range(150):
        rows = _dq_rows(rng)
        n_checks = rng.randint(3, 6)
        checks = [_gen_dq_check(rng, f"c{k}") for k in range(n_checks)]
        programs.append((prog, rows, checks))

    # phase 2: execute concurrently (per-program DuckDB connections)
    def run_one(p):
        prog, rows, checks = p
        tf = td.TableFrame.from_spark(spark.createDataFrame(
            rows, "id bigint, d double, i bigint, s string"))
        sqls, specs = [], []
        for apply_fn, sql, spec in checks:
            tf = apply_fn(tf)
            sqls.append(sql)
            specs.append(spec)
        names = [f"c{k}" for k in range(len(checks))]
        got = tf.select("id", *names).to_spark().collect()
        con = duckdb.connect()
        want = con.sql(
            f"SELECT id, {', '.join(sqls)} FROM {_duck_values(rows)}"
        ).fetchall()
        con.close()
        _check(got, want, f"seed={seed} prog={prog} specs={specs}")

    run_concurrent(programs, run_one)


def test_dq_fn_row_batch_parity(spark):
    """dq.fn row vs batch mode must agree with each other and with the
    equivalent JVM predicate (non-null inputs: Arrow's null->NaN float64
    coercion is out of scope for the custom-fn contract)."""
    rng = random.Random(20260913)
    for prog in range(20):
        vals = [rng.randint(-50, 50) for _ in range(30)]
        thr = rng.randint(-40, 40)
        tf = td.TableFrame.from_dict(spark, {"x": vals})
        via_row = tf.dq.fn("x", lambda v: v > thr, name="f", mode="row")
        via_batch = tf.dq.fn("x", lambda s: s > thr, name="f", mode="batch")
        via_jvm = tf.dq.expr(td.col("x") > thr, name="f")
        r = sorted(map(tuple, via_row.to_spark().collect()))
        b = sorted(map(tuple, via_batch.to_spark().collect()))
        j = sorted(map(tuple, via_jvm.to_spark().collect()))
        assert r == b == j, f"prog={prog} thr={thr}"


# -------------------------------- family B: UDF struct pack/unpack

def _gen_udf_outputs(rng: random.Random):
    """Random output schema + per-output (pandas formula, scalar formula,
    duckdb formula) triples over input columns a (bigint), b (double),
    s (string)."""
    outs = []
    for k in range(rng.randint(1, 3)):
        dtype = rng.choice(["bigint", "double", "string", "boolean"])
        name = f"o{k}"
        if dtype == "bigint":
            m, c = rng.randint(-3, 3), rng.randint(-5, 5)
            outs.append((name, "bigint",
                         lambda a, b, s, m=m, c=c: a * m + c,
                         f"(a * {m} + {c})"))
        elif dtype == "double":
            f = rng.choice([0.5, -1.25, 2.0])
            outs.append((name, "double",
                         lambda a, b, s, f=f: b * f + a,
                         f"(b * {f} + a)"))
        elif dtype == "string":
            suf = rng.choice(["!", "_x", ""])
            outs.append((name, "string",
                         lambda a, b, s, suf=suf: s + suf,
                         f"(s || '{suf}')"))
        else:
            m = rng.randint(2, 5)
            # Python % and DuckDB % agree for positive modulus on
            # negative operands only via floored vs truncated division —
            # keep operands non-negative by construction (abs)
            outs.append((name, "boolean",
                         lambda a, b, s, m=m: abs(a) % m == 0,
                         f"(abs(a) % {m} = 0)"))
    return outs


@pytest.mark.parametrize("seed", [20260911])
def test_fuzz_udf_struct_roundtrip(spark, seed):
    import pandas as pd

    from _concurrency import run_concurrent

    # phase 1: generate every program SEQUENTIALLY on the seeded rng
    # (bit-identical program stream to the former inline loop)
    rng = random.Random(seed)
    programs = []
    for prog in range(100):
        n = 25
        rows = [(rng.randint(-40, 40),
                 round(rng.uniform(-5, 5), 3),
                 rng.choice(["a", "bc", "Z", "q9", " sp "]))
                for _ in range(n)]
        outs = _gen_udf_outputs(rng)
        as_list = rng.random() < 0.5
        programs.append((prog, rows, outs, as_list))

    # phase 2: execute programs concurrently (independent Spark jobs +
    # a per-program DuckDB connection)
    def run_one(p):
        prog, rows, outs, as_list = p
        tf = td.TableFrame.from_spark(spark.createDataFrame(
            rows, "a bigint, b double, s string"))
        base = td.UDFList if as_list else td.UDFUnpacked

        class Batch(base):
            output_columns = [(nm, dt) for nm, dt, _, _ in outs]

            def on_batch(self, *series):
                sers = series[0] if as_list else list(series)
                a, b, s = sers
                res = []
                for nm, dt, fn, _ in outs:
                    vals = [fn(x, y, z) for x, y, z in zip(a, b, s)]
                    res.append(pd.Series(vals))
                return res

        class Elem(base):
            output_columns = [(nm, dt) for nm, dt, _, _ in outs]

            def on_element(self, *values):
                vals = values[0] if as_list else list(values)
                a, b, s = vals
                return [fn(a, b, s) for _, _, fn, _ in outs]

        cols = ["a", "b", "s"]
        names = [nm for nm, _, _, _ in outs]
        got_b = (tf.udf(cols, Batch()).select("a", "b", "s", *names)
                 .to_spark().collect())
        got_e = (tf.udf(cols, Elem()).select("a", "b", "s", *names)
                 .to_spark().collect())
        sel = ", ".join(f"{dsql} AS {nm}" for nm, _, _, dsql in outs)
        vals = ", ".join(
            f"({a}, CAST({b!r} AS DOUBLE), '{s}')" for a, b, s in rows)
        con = duckdb.connect()
        try:
            want = con.execute(
                f"SELECT a, b, s, {sel} FROM (VALUES {vals}) t(a, b, s)"
            ).fetchall()
        finally:
            con.close()
        ctx = (f"seed={seed} prog={prog} as_list={as_list} "
               f"outs={[(nm, dt, dsql) for nm, dt, _, dsql in outs]}")
        _check(got_b, want, "on_batch " + ctx)
        _check(got_e, want, "on_element " + ctx)

    run_concurrent(programs, run_one)


# ------------------------------------ family C: CSV format round-trips

_CSV_FIELD_POOL = [
    "plain", "with,comma", "semi;colon", "tab\there", "pipe|bar",
    'quo"te', "quo'te", "  spaced  ", "ümlaut", "0", "-7", "end.",
]


@pytest.mark.parametrize("seed", [20260912])
def test_fuzz_csv_roundtrip(spark, seed, tmp_path):
    from tabsdata_spark.io.file_io import (LocalFileDestination,
                                           LocalFileSource)

    from _concurrency import run_concurrent

    # sequential generation (bit-identical rng stream), concurrent
    # execution — each program writes its own rt_{prog}.csv path
    rng = random.Random(seed)
    programs = []
    for prog in range(120):
        sep = rng.choice([",", ";", "\t", "|"])
        quote = rng.choice(['"', "'"])
        eol = rng.choice(["\n", "\r"])
        header = rng.random() < 0.7
        infer = rng.random() < 0.7
        n = rng.randint(1, 20)
        rows = [(k,
                 rng.choice(_CSV_FIELD_POOL),
                 rng.randint(-10 ** 6, 10 ** 6))
                for k in range(n)]
        # anchor one non-numeric string: a column whose every value looks
        # numeric ('0', '-7') legitimately re-infers as a number column on
        # read-back — inherent CSV lossiness, not a round-trip defect
        rows[0] = (rows[0][0], "plain", rows[0][2])
        programs.append((prog, sep, quote, eol, header, infer, n, rows))

    def run_one(p):
        prog, sep, quote, eol, header, infer, n, rows = p
        fmt = td.CSVFormat(separator=sep, quote_char=quote, eol_char=eol,
                           has_header=header, infer_schema=infer)
        tf = td.TableFrame.from_spark(spark.createDataFrame(
            rows, "id bigint, s string, v bigint"))
        dest = str(tmp_path / f"rt_{prog}.csv")
        LocalFileDestination(dest, format=fmt).save(tf.to_spark())
        back, _ = LocalFileSource(dest, format=fmt).load(spark)
        got = [tuple(r) for r in back.collect()]
        ctx = (f"seed={seed} prog={prog} sep={sep!r} quote={quote!r} "
               f"eol={eol!r} header={header} infer={infer}")
        assert len(got) == n, f"{ctx}: {len(got)} rows back, wrote {n}"
        if infer:
            want = rows
        else:
            # no schema inference: everything reads back as strings
            want = [(str(a), b, str(c)) for a, b, c in rows]
        _check(got, want, ctx)

    run_concurrent(programs, run_one)


# ------------------------------------- family D: NDJSON round-trips

_NDJ_STR_POOL = [
    "plain", "", "x\ny", 'q"uo', "tab\there", "back\\slash",
    "üñíçødé ✓", "{\"looks\":\"json\"}", " padded ", "0", "-7.5",
]


def _ndj_clean(v):
    """Expected read-back value: non-finite floats null out on write
    (JSON has no NaN/Inf token; Polars serializes them as null)."""
    if isinstance(v, float) and not math.isfinite(v):
        return None
    if isinstance(v, list):
        return [_ndj_clean(x) for x in v]
    if isinstance(v, tuple):
        return tuple(_ndj_clean(x) for x in v)
    return v


@pytest.mark.parametrize("seed", [20260913])
def test_fuzz_ndjson_roundtrip(spark, seed, tmp_path):
    """Random schemas (ints, non-finite-bearing doubles, gnarly strings,
    booleans, double arrays, structs, an always-null column) through
    LocalFileDestination.save -> LocalFileSource.load.  Pinned contract
    (Polars write_ndjson/read_ndjson parity): null fields serialize
    explicitly so all-null columns SURVIVE (re-inferred as string);
    NaN/Inf -> null keeping the column double; the written column order
    is restored on read (Spark's JSON inference alone sorts names)."""
    from tabsdata_spark.io.file_io import (LocalFileDestination,
                                           LocalFileSource)

    kinds = {
        "int": ("bigint", lambda r: r.choice(_I_POOL)),
        "dbl": ("double", lambda r: r.choice(_D_POOL)),
        "str": ("string", lambda r: r.choice([None] + _NDJ_STR_POOL)),
        "bool": ("boolean", lambda r: r.choice([None, True, False])),
        "arr": ("array<double>",
                lambda r: r.choice([None, []]) if r.random() < 0.3
                else [r.choice(_D_POOL) for _ in range(r.randint(1, 4))]),
        "st": ("struct<p:double,q:string>",
               lambda r: None if r.random() < 0.25
               else (r.choice(_D_POOL), r.choice([None, "s", "t\nv"]))),
        "allnull": ("string", lambda r: None),
    }
    anchors = {
        "int": 1, "dbl": 1.5, "str": "plain", "bool": True,
        "arr": [1.0, 2.5], "st": (3.5, "anchor"), "allnull": None,
    }
    from _concurrency import run_concurrent

    rng = random.Random(seed)
    programs = []
    for prog in range(100):
        k = rng.randint(1, 6)
        cols = [rng.choice(sorted(kinds)) for _ in range(k)]
        names = [f"c{j}_{cols[j]}" for j in range(k)]
        ddl = ", ".join(f"{nm} {kinds[cd][0]}"
                        for nm, cd in zip(names, cols))
        n = rng.randint(1, 25)
        rows = [tuple(kinds[cd][1](rng) for cd in cols) for _ in range(n)]
        # anchor row 0 fully finite/non-null so every column's inferred
        # dtype is deterministic (an all-null double column legitimately
        # re-infers as string — that contract is pinned by 'allnull')
        rows[0] = tuple(anchors[cd] for cd in cols)
        programs.append((prog, cols, names, ddl, rows))

    def run_one(p):
        prog, cols, names, ddl, rows = p
        df = spark.createDataFrame(rows, ddl)
        dest = str(tmp_path / f"ndj_{prog}.ndjson")
        LocalFileDestination(dest, format="ndjson").save(df)
        back, _ = LocalFileSource(dest, format="ndjson").load(spark)
        ctx = f"seed={seed} prog={prog} cols={list(zip(names, cols))}"
        assert back.columns == names, \
            f"{ctx}: column order {back.columns} != written {names}"
        for j, cd in enumerate(cols):
            want_t = "string" if cd == "allnull" else kinds[cd][0]
            got_t = back.schema[j].dataType.simpleString()
            assert got_t == want_t, \
                f"{ctx}: col {names[j]} dtype {got_t} != {want_t}"
        # containers -> repr strings: _canon's sort key cannot order
        # lists that mix None and floats across rows
        flat = lambda x: (repr([_ndj_clean(e) for e in x])
                          if isinstance(x, (list, tuple)) else x)
        got = [tuple(flat(tuple(x) if hasattr(x, "asDict") else x)
                     for x in r) for r in back.collect()]
        want = [tuple(flat(_ndj_clean(v)) for v in row) for row in rows]
        _check(got, want, ctx)

    run_concurrent(programs, run_one)


# -------------------- family E: incremental last-modified filter


@pytest.mark.parametrize("seed", [20260915])
def test_fuzz_incremental_lastmod_filter(spark, seed, tmp_path):
    """Random file sets with crafted mtimes (including equal-µs pairs and
    sub-µs jitter) against random cutoffs — kept files must be exactly
    those with µs-truncated mtime strictly greater than the µs-truncated
    cutoff (the stored ISO offset only carries µs, so a raw float compare
    would re-ingest the newest file forever), and the returned offset is
    the max mtime seen over ALL matched files, kept or not."""
    import datetime as dtt
    import os

    from tabsdata_spark.io.file_io import LocalFileSource

    rng = random.Random(seed)
    base = 1_700_000_000
    for prog in range(40):
        d = tmp_path / f"inc_{prog}"
        d.mkdir()
        n = rng.randint(2, 7)
        mtimes = []
        for i in range(n):
            p = d / f"f{i}.csv"
            p.write_text(f"fid\n{i}\n")
            # µs grid with occasional sub-µs jitter and duplicate stamps
            t = base + rng.randint(0, 50) + rng.randint(0, 999_999) / 1e6
            if rng.random() < 0.3 and mtimes:
                t = mtimes[-1]
            if rng.random() < 0.3:
                t += rng.randint(1, 999) / 1e9
            os.utime(p, (t, t))
            mtimes.append(os.path.getmtime(p))
        cutoff = rng.choice([
            None,
            rng.choice(mtimes),                      # exact boundary
            min(mtimes) - 1, max(mtimes) + 1,
            base + rng.randint(0, 51) + rng.randint(0, 999_999) / 1e6,
        ])
        iso = (None if cutoff is None else
               dtt.datetime.fromtimestamp(
                   cutoff, dtt.timezone.utc).isoformat())
        us = lambda t: int(t * 1_000_000)
        want = sorted(i for i, m in enumerate(mtimes)
                      if cutoff is None or us(m) > us(cutoff))
        src = LocalFileSource(str(d / "*.csv"), format="csv",
                              initial_last_modified=iso)
        df, offset = src.load(spark)
        got = sorted(int(r.fid) for r in df.collect())
        ctx = f"seed={seed} prog={prog} cutoff={iso} mtimes={mtimes}"
        assert got == want, f"{ctx}: kept {got} != {want}"
        want_off = dtt.datetime.fromtimestamp(
            max(mtimes), dtt.timezone.utc).isoformat()
        assert offset == want_off, f"{ctx}: offset {offset} != {want_off}"
