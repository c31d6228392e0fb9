"""Seeded differential fuzz of the Expr surface vs DuckDB (r7 verdict
item 8): random small frames + random expression trees evaluated through
the TableFrame API AND as ANSI SQL in DuckDB on the same data, compared
cell-by-cell.  The manual edge-contract sweeps keep finding defects of
exactly the class a fuzzer enumerates automatically; this guards the long
tail.

Grammar is restricted to operations whose semantics are pinned identical
across Polars/Spark/DuckDB (no banker's-rounding round, no % on
negatives, no int division, no NaN inputs, denominators bounded away from
zero, bounded literals so ANSI overflow can't fire).  Every program is
reproducible from the printed (seed, expr, sql) triple.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

import tabsdata_spark as td

# ------------------------------------------------------------------ data


def _make_frame(spark, rng: random.Random, con):
    n = rng.randint(4, 12)

    def opt(gen, p=0.25):
        return [None if rng.random() < p else gen() for _ in range(n)]

    import datetime as dt

    def ts():
        # pre-epoch instants included: the sub-second extraction family
        # uses pmod there, a past defect class
        base = dt.datetime(1960, 1, 1) + dt.timedelta(
            seconds=rng.randint(0, 70 * 365 * 86400),
            microseconds=rng.randint(0, 999_999))
        return base

    rows = list(zip(
        range(n),
        opt(lambda: rng.randint(-50, 50)),
        opt(lambda: round(rng.uniform(-20.0, 20.0), 6)),
        opt(lambda: "".join(rng.choice("abXY z_") for _ in
                            range(rng.randint(0, 8)))),
        opt(ts),
    ))
    df = spark.createDataFrame(
        rows, "idx long, a long, b double, s string, t timestamp")
    con.execute("DROP TABLE IF EXISTS fuzz")
    con.execute("CREATE TABLE fuzz (idx BIGINT, a BIGINT, b DOUBLE, "
                "s VARCHAR, t TIMESTAMP)")
    con.executemany("INSERT INTO fuzz VALUES (?,?,?,?,?)", rows)
    return td.TableFrame.from_spark(df)


# ------------------------------------------------------------- generator
# each node -> (expr, sql_text); kinds: 'i' int, 'f' float, 's' str, 'b' bool


def _lit_str(rng):
    v = "".join(rng.choice("abXY z") for _ in range(rng.randint(0, 4)))
    return v


def gen(rng: random.Random, kind: str, depth: int):
    if depth <= 0:
        if kind == "i":
            if rng.random() < 0.5:
                return td.col("a"), "a"
            v = rng.randint(-9, 9)
            return td.lit(v), str(v)
        if kind == "f":
            if rng.random() < 0.5:
                return td.col("b"), "b"
            v = round(rng.uniform(-9.0, 9.0), 3)
            return td.lit(v), repr(v)
        if kind == "s":
            if rng.random() < 0.6:
                return td.col("s"), "s"
            v = _lit_str(rng)
            return td.lit(v), "'" + v.replace("'", "''") + "'"
        # bool leaves derive from comparisons
        e, q = gen(rng, rng.choice("if"), 0)
        op = rng.choice(["<", "<=", ">", ">=", "=", "!="])
        e2, q2 = gen(rng, "i", 0)
        pyop = {"=": "__eq__", "!=": "__ne__", "<": "__lt__",
                "<=": "__le__", ">": "__gt__", ">=": "__ge__"}[op]
        return getattr(e, pyop)(e2), f"({q} {op} {q2})"

    d = depth - 1
    if kind == "i":
        choice = rng.choice(["add", "sub", "mul", "abs", "when", "coalesce",
                             "lenchars", "dtpart"])
        if choice == "dtpart":
            part = rng.choice(["year", "month", "day", "hour", "minute",
                               "second", "millisecond", "microsecond"])
            e = getattr(td.col("t").dt, part)()
            # DuckDB's millisecond/microsecond parts INCLUDE the seconds;
            # Polars returns the within-second fraction
            if part == "millisecond":
                return e, "(date_part('millisecond', t) % 1000)"
            if part == "microsecond":
                return e, "(date_part('microsecond', t) % 1000000)"
            return e, f"date_part('{part}', t)"
        if choice in ("add", "sub", "mul"):
            x, qx = gen(rng, "i", d)
            y, qy = gen(rng, "i", d)
            op = {"add": "+", "sub": "-", "mul": "*"}[choice]
            e = {"add": x + y, "sub": x - y, "mul": x * y}[choice]
            return e, f"({qx} {op} {qy})"
        if choice == "abs":
            x, qx = gen(rng, "i", d)
            return x.abs(), f"abs({qx})"
        if choice == "when":
            c, qc = gen(rng, "b", d)
            x, qx = gen(rng, "i", d)
            y, qy = gen(rng, "i", d)
            return (td.when(c).then(x).otherwise(y),
                    f"(CASE WHEN {qc} THEN {qx} ELSE {qy} END)")
        if choice == "coalesce":
            x, qx = gen(rng, "i", d)
            y, qy = gen(rng, "i", d)
            return x.fill_null(y), f"coalesce({qx}, {qy})"
        x, qx = gen(rng, "s", d)
        return x.str.len_chars(), f"length({qx})"
    if kind == "f":
        choice = rng.choice(["add", "sub", "mul", "div", "abs", "sqrt",
                             "when", "mix"])
        if choice in ("add", "sub", "mul"):
            x, qx = gen(rng, "f", d)
            y, qy = gen(rng, "f", d)
            op = {"add": "+", "sub": "-", "mul": "*"}[choice]
            e = {"add": x + y, "sub": x - y, "mul": x * y}[choice]
            return e, f"({qx} {op} {qy})"
        if choice == "div":
            x, qx = gen(rng, "f", d)
            y, qy = gen(rng, "f", d)
            # denominator bounded away from zero on both sides
            return x / (y.abs() + 1.0), f"({qx} / (abs({qy}) + 1.0))"
        if choice == "abs":
            x, qx = gen(rng, "f", d)
            return x.abs(), f"abs({qx})"
        if choice == "sqrt":
            x, qx = gen(rng, "f", d)
            return x.abs().sqrt(), f"sqrt(abs({qx}))"
        if choice == "when":
            c, qc = gen(rng, "b", d)
            x, qx = gen(rng, "f", d)
            y, qy = gen(rng, "f", d)
            return (td.when(c).then(x).otherwise(y),
                    f"(CASE WHEN {qc} THEN {qx} ELSE {qy} END)")
        x, qx = gen(rng, "i", d)  # int -> float promotion
        y, qy = gen(rng, "f", d)
        return x + y, f"({qx} + {qy})"
    if kind == "s":
        choice = rng.choice(["upper", "lower", "slice", "strip", "when",
                             "replace", "pad", "head", "tail", "reverse"])
        if choice == "replace":
            x, qx = gen(rng, "s", d)
            old = _lit_str(rng) or "a"
            new = _lit_str(rng)
            oq = old.replace("'", "''")
            nq = new.replace("'", "''")
            return (x.str.replace_all(old, new, literal=True),
                    f"replace({qx}, '{oq}', '{nq}')")
        if choice == "pad":
            x, qx = gen(rng, "s", d)
            n = rng.randint(0, 10)
            fill = rng.choice("xy_")
            side = rng.choice(["start", "end"])
            fn = "lpad" if side == "start" else "rpad"
            # Polars pads to AT LEAST n (never truncates); SQL lpad/rpad
            # truncate, so the oracle pins the Polars semantics explicitly
            sql = (f"(CASE WHEN length({qx}) >= {n} THEN {qx} "
                   f"ELSE {fn}({qx}, {n}, '{fill}') END)")
            e = (x.str.pad_start(n, fill) if side == "start"
                 else x.str.pad_end(n, fill))
            return e, sql
        if choice == "head":
            x, qx = gen(rng, "s", d)
            n = rng.randint(0, 6)
            return x.str.head(n), f"left({qx}, {n})"
        if choice == "tail":
            x, qx = gen(rng, "s", d)
            n = rng.randint(0, 6)
            return x.str.tail(n), f"right({qx}, {n})"
        if choice == "reverse":
            x, qx = gen(rng, "s", d)
            return x.str.reverse(), f"reverse({qx})"
        if choice == "upper":
            x, qx = gen(rng, "s", d)
            return x.str.to_uppercase(), f"upper({qx})"
        if choice == "lower":
            x, qx = gen(rng, "s", d)
            return x.str.to_lowercase(), f"lower({qx})"
        if choice == "slice":
            x, qx = gen(rng, "s", d)
            off = rng.randint(0, 3)
            ln = rng.randint(0, 4)
            return (x.str.slice(off, ln),
                    f"substr({qx}, {off + 1}, {ln})")
        if choice == "strip":
            x, qx = gen(rng, "s", d)
            return x.str.strip_chars(), f"trim({qx})"
        c, qc = gen(rng, "b", d)
        x, qx = gen(rng, "s", d)
        y, qy = gen(rng, "s", d)
        return (td.when(c).then(x).otherwise(y),
                f"(CASE WHEN {qc} THEN {qx} ELSE {qy} END)")
    # bool
    choice = rng.choice(["cmp_i", "cmp_f", "cmp_t", "and", "or", "not",
                         "isnull", "starts", "contains"])
    if choice == "cmp_t":
        import datetime as dtm

        pivot = dtm.datetime(1960, 1, 1) + dtm.timedelta(
            days=rng.randint(0, 70 * 365))
        op = rng.choice(["<", ">="])
        e = (td.col("t") < td.lit(pivot) if op == "<"
             else td.col("t") >= td.lit(pivot))
        return e, f"(t {op} TIMESTAMP '{pivot.isoformat(sep=' ')}')"
    if choice == "cmp_i":
        x, qx = gen(rng, "i", d)
        y, qy = gen(rng, "i", d)
        return x < y, f"({qx} < {qy})"
    if choice == "cmp_f":
        x, qx = gen(rng, "f", d)
        y, qy = gen(rng, "f", d)
        return x >= y, f"({qx} >= {qy})"
    if choice == "and":
        x, qx = gen(rng, "b", d)
        y, qy = gen(rng, "b", d)
        return x & y, f"({qx} AND {qy})"
    if choice == "or":
        x, qx = gen(rng, "b", d)
        y, qy = gen(rng, "b", d)
        return x | y, f"({qx} OR {qy})"
    if choice == "not":
        x, qx = gen(rng, "b", d)
        return ~x, f"(NOT {qx})"
    if choice == "isnull":
        x, qx = gen(rng, rng.choice("ifs"), d)
        return x.is_null(), f"({qx} IS NULL)"
    if choice == "starts":
        x, qx = gen(rng, "s", d)
        p = _lit_str(rng)
        return (x.str.starts_with(p),
                f"starts_with({qx}, '" + p.replace("'", "''") + "')")
    x, qx = gen(rng, "s", d)
    p = _lit_str(rng) or "a"
    return (x.str.contains(p, literal=True),
            f"(instr({qx}, '" + p.replace("'", "''") + "') > 0)")


# ------------------------------------------------------------- comparison


def _cell_eq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, bool) or isinstance(b, bool):
        return bool(a) == bool(b)
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        if math.isinf(fa) or math.isinf(fb):
            return fa == fb
        return abs(fa - fb) <= 1e-9 + 1e-9 * max(abs(fa), abs(fb))
    return a == b


BATCH = 8          # expressions per select (amortizes Spark job overhead)
PROGRAMS = 200     # total random expressions per run


@pytest.mark.parametrize("seed", [20260816])
def test_expr_differential_fuzz(spark, seed):
    rng = random.Random(seed)
    con = duckdb.connect()
    checked = 0
    while checked < PROGRAMS:
        tf = _make_frame(spark, rng, con)
        exprs, sqls = [], []
        for _ in range(BATCH):
            kind = rng.choice("iifsb")
            depth = rng.randint(1, 3)
            e, q = gen(rng, kind, depth)
            exprs.append(e)
            sqls.append(q)
        sel = tf.select(td.col("idx"),
                        *[e.alias(f"e{i}") for i, e in enumerate(exprs)])
        srows = {r["idx"]: r for r in sel.to_spark().collect()}
        qsql = ("SELECT idx, " +
                ", ".join(f"{q} AS e{i}" for i, q in enumerate(sqls)) +
                " FROM fuzz")
        cols = [f"e{i}" for i in range(BATCH)]
        for drow in con.execute(qsql).fetchall():
            idx, dvals = drow[0], drow[1:]
            srow = srows[idx]
            for cname, dv in zip(cols, dvals):
                sv = srow[cname]
                assert _cell_eq(sv, dv), (
                    f"seed={seed} idx={idx} col={cname} spark={sv!r} "
                    f"duckdb={dv!r}\nexpr sql: {sqls[int(cname[1:])]}\n"
                    f"full sql: {qsql}")
        checked += BATCH


@pytest.mark.parametrize("seed", [20260818])
def test_rank_differential_fuzz(spark, seed):
    """rank(min/max/dense/average, both directions) vs a DuckDB window
    oracle over random ties+nulls data.  Pins the Polars contract the r7
    fix established: null inputs get a NULL rank and never shift non-null
    ranks (nulls sort last in the window; the output is nulled)."""
    rng = random.Random(seed)
    con = duckdb.connect()
    for _ in range(20):
        n = rng.randint(3, 14)
        rows = [(i, None if rng.random() < 0.3 else rng.randint(0, 4))
                for i in range(n)]
        tf = td.TableFrame.from_spark(
            spark.createDataFrame(rows, "idx long, v long"))
        con.execute("DROP TABLE IF EXISTS rk")
        con.execute("CREATE TABLE rk (idx BIGINT, v BIGINT)")
        con.executemany("INSERT INTO rk VALUES (?,?)", rows)
        desc = rng.random() < 0.5
        direction = "DESC" if desc else "ASC"
        base = f"ORDER BY v {direction} NULLS LAST"
        oracles = {
            "min": f"RANK() OVER ({base})",
            "dense": f"DENSE_RANK() OVER ({base})",
            "max": (f"(RANK() OVER ({base}) + COUNT(*) OVER "
                    "(PARTITION BY v) - 1)"),
            "average": (f"((RANK() OVER ({base})) * 2 + COUNT(*) OVER "
                        "(PARTITION BY v) - 1) / 2.0"),
        }
        sel = tf.select(
            td.col("idx"),
            *[td.col("v").rank(m, descending=desc).alias(f"r_{m}")
              for m in oracles])
        srows = {r["idx"]: r for r in sel.to_spark().collect()}
        qsql = ("SELECT idx, " + ", ".join(
            f"(CASE WHEN v IS NULL THEN NULL ELSE {o} END) AS r_{m}"
            for m, o in oracles.items()) + " FROM rk")
        for drow in con.execute(qsql).fetchall():
            idx = drow[0]
            for m, dv in zip(oracles, drow[1:]):
                sv = srows[idx][f"r_{m}"]
                assert _cell_eq(sv, dv), (
                    f"seed={seed} idx={idx} method={m} desc={desc} "
                    f"spark={sv!r} duckdb={dv!r} rows={rows}")
