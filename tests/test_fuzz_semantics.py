"""Seeded differential fuzz of the remaining pinned-semantics surface
(r8 verdict item 3) vs DuckDB on identical rows — five directed families
the generic expression/relational fuzzers don't reach:

  A. string strip/zfill/pad chains + find/contains/len terminals
     (pad-never-truncates, zfill sign handling, byte-offset find)
  B. unique(keep=first/last/none) under an explicit total sort order
     (window order must honor the frame's logical sort, incl. reversal
     of BOTH direction and null placement for keep=last)
  C. concat relaxed-supertype casts across int/bigint/double frames
     (vertical_relaxed + diagonal/diagonal_relaxed null-filling)
  D. fill_null/fill_nan/drop_nulls/drop_nans on mixed null/NaN floats
     (null is not NaN: fill_null must leave NaN, fill_nan must leave null)
  E. group_by aggregates over all-null groups and null group keys
     (SQL sum/mean/min/max null-group semantics; n_unique counts null)

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
    """Multiset canonicalization with numeric coercion: int/float compare
    as float (supertype casts legitimately change the Python type)."""
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


# ------------------------------------------------- family A: string chains

_S_ALPHABET = " \t\n0+-abXY"


def _gen_string_op(rng: random.Random, expr, sql: str):
    """One strip/pad/zfill link: returns (expr', sql')."""
    kind = rng.choice(["strip", "strip_start", "strip_end", "strip_ws",
                       "zfill", "pad_start", "pad_end"])
    if kind == "strip_ws":
        return (expr.str.strip_chars(),
                f"regexp_replace({sql}, '^\\s+|\\s+$', '', 'g')")
    if kind in ("strip", "strip_start", "strip_end"):
        chars = "".join(rng.sample(" -0a\t", rng.randint(1, 3)))
        lit = "'" + chars.replace("'", "''") + "'"
        if kind == "strip":
            return expr.str.strip_chars(chars), f"trim({sql}, {lit})"
        if kind == "strip_start":
            return expr.str.strip_chars_start(chars), f"ltrim({sql}, {lit})"
        return expr.str.strip_chars_end(chars), f"rtrim({sql}, {lit})"
    n = rng.randint(0, 8)
    if kind == "zfill":
        # Polars/Python zfill: never truncates, '-' stays in front of the
        # zeros ('+' is NOT special in Polars)
        return (expr.str.zfill(n),
                f"(CASE WHEN length({sql}) >= {n} THEN {sql} "
                f"WHEN substr({sql}, 1, 1) = '-' THEN '-' || "
                f"lpad(substr({sql}, 2, 1000000), {max(n - 1, 0)}, '0') "
                f"ELSE lpad({sql}, {n}, '0') END)")
    ch = rng.choice("_0#x")
    fn = "lpad" if kind == "pad_start" else "rpad"
    meth = expr.str.pad_start if kind == "pad_start" else expr.str.pad_end
    # Polars pads to AT LEAST length — never truncates
    return (meth(n, ch),
            f"(CASE WHEN length({sql}) >= {n} THEN {sql} "
            f"ELSE {fn}({sql}, {n}, '{ch}') END)")


@pytest.mark.parametrize("seed", [20260901])
def test_fuzz_string_strip_pad_find(spark, seed):
    rng = random.Random(seed)
    con = duckdb.connect()
    PROGRAMS, BATCH = 300, 10
    for base in range(0, PROGRAMS, BATCH):
        n = rng.randint(4, 10)
        rows = [(i, None if rng.random() < 0.2 else
                 "".join(rng.choice(_S_ALPHABET)
                         for _ in range(rng.randint(0, 9))))
                for i in range(n)]
        tf = td.TableFrame.from_spark(
            spark.createDataFrame(rows, "idx long, s string"))
        con.execute("DROP TABLE IF EXISTS fs")
        con.execute("CREATE TABLE fs (idx BIGINT, s VARCHAR)")
        con.executemany("INSERT INTO fs VALUES (?,?)", rows)
        named, sqls = {}, []
        for p in range(BATCH):
            expr, sql = td.col("s"), "s"
            for _ in range(rng.randint(1, 3)):
                expr, sql = _gen_string_op(rng, expr, sql)
            term = rng.choice(["id", "find", "len", "contains"])
            if term == "find":
                sub = "".join(rng.choice("0a-X ")
                              for _ in range(rng.randint(1, 2)))
                lit = "'" + sub + "'"
                expr = expr.str.find(sub, literal=True)
                sql = (f"(CASE WHEN strpos({sql}, {lit}) = 0 THEN NULL "
                       f"ELSE strpos({sql}, {lit}) - 1 END)")
            elif term == "len":
                expr, sql = expr.str.len_chars(), f"length({sql})"
            elif term == "contains":
                sub = rng.choice(["a", "0", "-", "X", " "])
                expr = expr.str.contains(sub, literal=True)
                sql = f"contains({sql}, '{sub}')"
            named[f"c{p}"] = expr
            sqls.append(f"{sql} AS c{p}")
        got = tf.select(td.col("idx"), **named).to_spark().collect()
        want = con.execute(
            f"SELECT idx, {', '.join(sqls)} FROM fs").fetchall()
        _check(got, want, f"seed={seed} batch={base} sqls={sqls}")


# ------------------------------------------- family B: unique keep + order


@pytest.mark.parametrize("seed", [20260902])
def test_fuzz_unique_keep_with_order(spark, seed):
    from _concurrency import run_concurrent

    rng = random.Random(seed)
    programs = []
    for p in range(100):
        n = rng.randint(4, 16)
        rows = [(i,
                 None if rng.random() < 0.25 else rng.randint(0, 3),
                 None if rng.random() < 0.25 else rng.choice("xyz"),
                 round(rng.uniform(-5, 5), 3))
                for i in range(n)]
        subset = rng.choice([["k"], ["s"], ["k", "s"]])
        keep = rng.choice(["first", "last", "none"])
        sc = rng.choice(["v", "s", "idx"])
        d, nl = rng.random() < 0.5, rng.random() < 0.5
        programs.append((p, rows, subset, keep, sc, d, nl))

    def run_one(prog):
        p, rows, subset, keep, sc, d, nl = prog
        tf = td.TableFrame.from_spark(spark.createDataFrame(
            rows, "idx long, k long, s string, v double"))
        con = duckdb.connect()
        con.execute("CREATE TABLE fu (idx BIGINT, k BIGINT, s VARCHAR, "
                    "v DOUBLE)")
        con.executemany("INSERT INTO fu VALUES (?,?,?,?)", rows)
        sorted_tf = tf.sort([sc, "idx"], descending=[d, False],
                            nulls_last=[nl, False])
        got = (sorted_tf.unique(subset=subset, keep=keep)
               .select("idx").to_spark().collect())
        part = ", ".join(subset)
        if keep == "none":
            want = con.execute(
                f"SELECT idx FROM fu QUALIFY "
                f"count(*) OVER (PARTITION BY {part}) = 1").fetchall()
        else:
            # keep=last reverses BOTH direction and null placement
            rd, rnl = (not d, not nl) if keep == "last" else (d, nl)
            o1 = (f"{sc} {'DESC' if rd else 'ASC'} "
                  f"NULLS {'LAST' if rnl else 'FIRST'}")
            o2 = "idx DESC" if keep == "last" else "idx ASC"
            want = con.execute(
                f"SELECT idx FROM fu QUALIFY row_number() OVER "
                f"(PARTITION BY {part} ORDER BY {o1}, {o2}) = 1").fetchall()
        con.close()
        _check(got, want,
               f"seed={seed} p={p} subset={subset} keep={keep} "
               f"sort=({sc}, desc={d}, nulls_last={nl})")

    run_concurrent(programs, run_one)


# ------------------------------------------ family C: concat supertypes


@pytest.mark.parametrize("seed", [20260903])
def test_fuzz_concat_relaxed_supertypes(spark, seed):
    from _concurrency import run_concurrent

    rng = random.Random(seed)
    DUCK = {"int": "INTEGER", "long": "BIGINT", "double": "DOUBLE",
            "string": "VARCHAR"}

    def gen_rows(cols):
        # sequential-rng row generation (was inline in mk); the Spark /
        # DuckDB materialization moved to the concurrent executor below
        n = rng.randint(2, 6)
        rows = []
        for i in range(n):
            row = []
            for _, t in cols:
                if rng.random() < 0.2:
                    row.append(None)
                elif t == "string":
                    row.append(rng.choice("pqr"))
                elif t == "double":
                    row.append(float(rng.randint(-9, 9)))
                else:
                    row.append(rng.randint(-9, 9))
            rows.append(tuple(row))
        return rows

    def supertype(types):
        ts = set(types)
        if "string" in ts:
            return "string"
        if "double" in ts:
            return "double"
        if "long" in ts:
            return "long"
        return "int"

    programs = []
    for p in range(150):
        how = rng.choice(["vertical_relaxed", "diagonal", "diagonal_relaxed"])
        all_cols = ["a", "b", "c"]
        nf = rng.randint(2, 3)
        specs = []
        if how == "vertical_relaxed":
            names = all_cols[:rng.randint(1, 3)]
            for _ in range(nf):
                specs.append([(c, rng.choice(["int", "long", "double"]))
                              for c in names])
        elif how == "diagonal":
            # non-relaxed diagonal: shared columns keep ONE dtype
            fixed = {c: rng.choice(["long", "double", "string"])
                     for c in all_cols}
            for _ in range(nf):
                sub = sorted(rng.sample(all_cols, rng.randint(1, 3)))
                specs.append([(c, fixed[c]) for c in sub])
        else:
            for _ in range(nf):
                sub = sorted(rng.sample(all_cols, rng.randint(1, 3)))
                specs.append([(c, rng.choice(["int", "long", "double"]))
                              for c in sub])
        programs.append((p, how, specs,
                         [gen_rows(cols) for cols in specs]))

    def run_one(prog):
        p, how, specs, all_rows = prog
        con = duckdb.connect()
        frames = []
        for i, (cols, rows) in enumerate(zip(specs, all_rows)):
            schema = ", ".join(f"{c} {t}" for c, t in cols)
            frames.append(td.TableFrame.from_spark(
                spark.createDataFrame(rows, schema)))
            con.execute(f"CREATE TABLE cf{i} (" + ", ".join(
                f"{c} {DUCK[t]}" for c, t in cols) + ")")
            con.executemany(
                f"INSERT INTO cf{i} VALUES ({','.join('?' * len(cols))})",
                rows)
        got = td.concat(frames, how=how).to_spark().collect()
        # oracle: per-frame SELECT casting every output column to the
        # supertype (NULL-filled when absent), chained by UNION ALL
        if how == "vertical_relaxed":
            out_names = [c for c, _ in specs[0]]
        else:
            out_names = []
            for cols in specs:
                for c, _ in cols:
                    if c not in out_names:
                        out_names.append(c)
        types = {c: supertype([dict(cols).get(c)
                               for cols in specs if c in dict(cols)])
                 for c in out_names}
        selects = []
        for i, cols in enumerate(specs):
            have = dict(cols)
            sel = ", ".join(
                (f"CAST({c} AS {DUCK[types[c]]}) AS {c}" if c in have
                 else f"CAST(NULL AS {DUCK[types[c]]}) AS {c}")
                for c in out_names)
            selects.append(f"SELECT {sel} FROM cf{i}")
        want = con.execute(" UNION ALL ".join(selects)).fetchall()
        con.close()
        _check(got, want, f"seed={seed} p={p} how={how} specs={specs}")
        # the result schema must BE the supertype, not just cast-compatible
        got_schema = dict(td.concat(frames, how=how).schema.items())
        SPARK = {"int": "IntegerType()", "long": "LongType()",
                 "double": "DoubleType()", "string": "StringType()"}
        for c in out_names:
            if how == "diagonal":
                continue  # unionByName keeps Spark's own coercion
            assert repr(got_schema[c]) == SPARK[types[c]], \
                (p, how, c, got_schema[c], types[c])

    run_concurrent(programs, run_one)


# ------------------------------------- family D: null/NaN fill and drop


@pytest.mark.parametrize("seed", [20260904])
def test_fuzz_fill_null_nan_mixed(spark, seed):
    from _concurrency import run_concurrent

    # phase 1: all rng draws stay SEQUENTIAL (bit-identical program
    # stream to the former inline loop); ops are recorded as (name, arg)
    rng = random.Random(seed)
    programs = []
    for p in range(150):
        n = rng.randint(4, 12)
        rows = []
        for i in range(n):
            a = None if rng.random() < 0.3 else rng.randint(-9, 9)
            r = rng.random()
            b = (None if r < 0.25 else float("nan") if r < 0.5
                 else round(rng.uniform(-5, 5), 3))
            rows.append((i, a, b))
        ops = []
        for _ in range(rng.randint(1, 2)):
            op = rng.choice(["fill_null", "fill_nan", "drop_nulls",
                             "drop_nans"])
            if op == "fill_null":
                ops.append((op, rng.randint(-9, 9)))
            elif op == "fill_nan":
                ops.append((op, float(rng.randint(-9, 9))))
            elif op == "drop_nulls":
                ops.append((op, rng.choice([["a"], ["b"], ["a", "b"]])))
            else:
                ops.append((op, None))
        programs.append((p, rows, ops))

    # phase 2: execute concurrently (per-program DuckDB connections)
    def run_one(prog):
        p, rows, ops = prog
        tf = td.TableFrame.from_spark(
            spark.createDataFrame(rows, "idx long, a long, b double"))
        con = duckdb.connect()
        con.execute("CREATE TABLE ff (idx BIGINT, a BIGINT, b DOUBLE)")
        con.executemany("INSERT INTO ff VALUES (?,?,?)", rows)
        cols = {"idx": "idx", "a": "a", "b": "b"}
        where = []
        for op, arg in ops:
            if op == "fill_null":
                tf = tf.fill_null(arg)
                # fills NULL in every column; NaN is NOT null and stays
                cols = {c: f"coalesce({s}, {arg})" for c, s in cols.items()}
            elif op == "fill_nan":
                tf = tf.fill_nan(arg)
                # floats only; NULL is NOT NaN and stays
                cols["b"] = (f"(CASE WHEN isnan({cols['b']}) THEN {arg} "
                             f"ELSE {cols['b']} END)")
            elif op == "drop_nulls":
                tf = tf.drop_nulls(arg)
                where += [f"({cols[c]}) IS NOT NULL" for c in arg]
            else:
                tf = tf.drop_nans(["b"])
                where.append(f"(NOT isnan({cols['b']}) "
                             f"OR ({cols['b']}) IS NULL)")
        got = tf.to_spark().collect()
        sel = ", ".join(f"{s} AS {c}" for c, s in cols.items())
        sql = f"SELECT {sel} FROM ff"
        if where:
            sql += " WHERE " + " AND ".join(where)
        want = con.execute(sql).fetchall()
        con.close()
        _check(got, want, f"seed={seed} p={p} sql={sql}")

    run_concurrent(programs, run_one)


# ------------------------------------ family F: datetime trunc/offset


@pytest.mark.parametrize("seed", [20260906])
def test_fuzz_datetime_trunc_offset_totals(spark, seed):
    """dt.truncate / offset_by / epoch / month bounds / duration totals
    vs DuckDB on identical instants (pre-epoch included).  Pinned
    contracts in the oracle: Monday-based weeks, month-end clamping on
    calendar offsets, truncate-toward-zero duration division."""
    import datetime as dt

    rng = random.Random(seed)
    con = duckdb.connect()
    TRUNC = {"1s": "second", "1m": "minute", "1h": "hour", "1d": "day",
             "1w": "week", "1mo": "month", "1q": "quarter", "1y": "year"}
    TOTALS = {
        "total_seconds": 1_000_000, "total_minutes": 60_000_000,
        "total_hours": 3_600_000_000, "total_days": 86_400_000_000,
        "total_milliseconds": 1000,
    }
    PROGRAMS, BATCH = 200, 8
    for base in range(0, PROGRAMS, BATCH):
        n = rng.randint(4, 10)

        def ts():
            return dt.datetime(1960, 1, 1) + dt.timedelta(
                seconds=rng.randint(0, 70 * 365 * 86400),
                microseconds=rng.randint(0, 999_999))

        rows = [(i,
                 None if rng.random() < 0.2 else ts(),
                 None if rng.random() < 0.2 else ts())
                for i in range(n)]
        tf = td.TableFrame.from_spark(spark.createDataFrame(
            rows, "idx long, t timestamp, t2 timestamp"))
        con.execute("DROP TABLE IF EXISTS fdt")
        con.execute("CREATE TABLE fdt (idx BIGINT, t TIMESTAMP, "
                    "t2 TIMESTAMP)")
        con.executemany("INSERT INTO fdt VALUES (?,?,?)", rows)
        named, sqls = {}, []
        for p in range(BATCH):
            kind = rng.choice(["trunc", "offset", "epoch", "bounds",
                               "total"])
            if kind == "trunc":
                every = rng.choice(sorted(TRUNC))
                named[f"c{p}"] = td.col("t").dt.truncate(every)
                # DuckDB date_trunc returns DATE for calendar units;
                # Polars truncate keeps the datetime dtype (so does Spark)
                sqls.append(f"CAST(date_trunc('{TRUNC[every]}', t) "
                            f"AS TIMESTAMP) AS c{p}")
            elif kind == "offset":
                nv = rng.choice([-5, -2, -1, 1, 2, 5, 13])
                unit = rng.choice(["d", "h", "m", "s", "mo", "y", "w"])
                named[f"c{p}"] = td.col("t").dt.offset_by(f"{nv}{unit}")
                iv = {"d": "DAY", "h": "HOUR", "m": "MINUTE",
                      "s": "SECOND", "mo": "MONTH", "y": "YEAR",
                      "w": "WEEK"}[unit]
                sqls.append(f"(t + INTERVAL ({nv}) {iv}) AS c{p}")
            elif kind == "epoch":
                u = rng.choice(["ms", "us", "ns"])
                named[f"c{p}"] = td.col("t").dt.epoch(u)
                # pre-epoch pin: epoch('ms') FLOORS (Spark unix_millis =
                # rust chrono timestamp_millis); DuckDB's own epoch_ms
                # truncates toward zero, so the oracle floors explicitly
                e = {"ms": "CAST(floor(epoch_us(t) / 1000.0) AS BIGINT)",
                     "us": "epoch_us(t)",
                     "ns": "epoch_us(t) * 1000"}[u]
                sqls.append(f"{e} AS c{p}")
            elif kind == "bounds":
                if rng.random() < 0.5:
                    named[f"c{p}"] = td.col("t").dt.month_start()
                    sqls.append(f"CAST(date_trunc('month', t) AS DATE)"
                                f" AS c{p}")
                else:
                    named[f"c{p}"] = td.col("t").dt.month_end()
                    sqls.append(f"last_day(t) AS c{p}")
            else:
                meth, unit_us = rng.choice(sorted(TOTALS.items()))
                diff = td.col("t") - td.col("t2")
                named[f"c{p}"] = getattr(diff.dt, meth)()
                # truncate-toward-zero division; micros diff < 2^53 so
                # the double arithmetic is exact
                sqls.append(
                    f"CAST(trunc((epoch_us(t) - epoch_us(t2)) / "
                    f"{unit_us}.0) AS BIGINT) AS c{p}")
        got = tf.select(td.col("idx"), **named).to_spark().collect()
        want = con.execute(
            f"SELECT idx, {', '.join(sqls)} FROM fdt").fetchall()
        _check(got, want, f"seed={seed} batch={base} sqls={sqls}")


# --------------------------------- family E: all-null groups aggregates


@pytest.mark.parametrize("seed", [20260905])
def test_fuzz_group_agg_all_null_groups(spark, seed):
    from _concurrency import run_concurrent

    rng = random.Random(seed)
    AGGS = {
        "cnt": (lambda: td.col("a").count(), "count(a)"),
        "sm": (lambda: td.col("a").sum(), "sum(a)"),
        "mn": (lambda: td.col("a").mean(), "avg(a)"),
        "mi": (lambda: td.col("a").min(), "min(a)"),
        "mx": (lambda: td.col("a").max(), "max(a)"),
        "nu": (lambda: td.col("a").n_unique(),
               "(count(DISTINCT a) + max(CASE WHEN a IS NULL THEN 1 "
               "ELSE 0 END))"),
        "ln": (lambda: td.col("a").len(), "count(*)"),
        "md": (lambda: td.col("b").median(), "median(b)"),
    }
    programs = []
    for p in range(100):
        n = rng.randint(5, 20)
        # force some keys to be ALL-null in `a`: per-key null probability
        # is drawn once, so a key with p_null=1.0 is an all-null group
        key_null_p = {k: rng.choice([0.0, 0.4, 1.0]) for k in range(4)}
        rows = []
        for _ in range(n):
            k = None if rng.random() < 0.2 else rng.randint(0, 3)
            pn = 0.5 if k is None else key_null_p[k]
            a = None if rng.random() < pn else rng.randint(-9, 9)
            b = None if rng.random() < 0.3 else float(rng.randint(-20, 20))
            rows.append((k, a, b))
        picked = rng.sample(sorted(AGGS), rng.randint(1, 4))
        programs.append((p, rows, picked))

    def run_one(prog):
        p, rows, picked = prog
        tf = td.TableFrame.from_spark(
            spark.createDataFrame(rows, "k long, a long, b double"))
        con = duckdb.connect()
        con.execute("CREATE TABLE fg (k BIGINT, a BIGINT, b DOUBLE)")
        con.executemany("INSERT INTO fg VALUES (?,?,?)", rows)
        named = {name: AGGS[name][0]() for name in picked}
        got = tf.group_by("k").agg(**named).to_spark().collect()
        sel = ", ".join(f"{AGGS[name][1]} AS {name}" for name in picked)
        want = con.execute(
            f"SELECT k, {sel} FROM fg GROUP BY k").fetchall()
        con.close()
        _check(got, want, f"seed={seed} p={p} aggs={picked}")

    run_concurrent(programs, run_one)
