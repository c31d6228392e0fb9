"""Seeded relational differential fuzz: random filter / group-agg /
join / distinct pipelines run through the TableFrame API AND as SQL in
DuckDB on identical rows, compared as row multisets.  The sibling of
test_fuzz_differential.py (expression-level): this one exercises the
frame operators — join null-key semantics, grouped nulls, 3-valued
filter logic — where the expression fuzzer cannot reach.

Anti/semi joins are oracled with NOT EXISTS / EXISTS (NOT IN is a null
trap in SQL; Spark's left_anti keeps null-key rows exactly like
NOT EXISTS does).  Sort order is never compared — results are multisets.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

import tabsdata_spark as td


def _rows(rng: random.Random, n: int):
    def opt(gen, p=0.25):
        return None if rng.random() < p else gen()

    return [(opt(lambda: rng.randint(0, 6)),
             opt(lambda: rng.randint(-20, 20)),
             opt(lambda: round(rng.uniform(-5.0, 5.0), 3)),
             opt(lambda: rng.choice(["x", "y", "z", "w", ""])))
            for _ in range(n)]


def _mk(spark, con, name: str, rows):
    df = spark.createDataFrame(rows, "k long, a long, b double, s string")
    con.execute(f"DROP TABLE IF EXISTS {name}")
    con.execute(f"CREATE TABLE {name} (k BIGINT, a BIGINT, b DOUBLE, s VARCHAR)")
    con.executemany(f"INSERT INTO {name} VALUES (?,?,?,?)", rows)
    return td.TableFrame.from_spark(df)


def _pred(rng: random.Random):
    """A simple predicate with Spark/DuckDB-identical 3-valued logic."""
    choice = rng.choice(["ka", "af", "sn", "comb"])
    if choice == "ka":
        v = rng.randint(0, 6)
        return td.col("k") <= v, f"(k <= {v})"
    if choice == "af":
        v = rng.randint(-10, 10)
        return td.col("a") > v, f"(a > {v})"
    if choice == "sn":
        return td.col("s").is_null(), "(s IS NULL)"
    e1, q1 = _pred(rng) if rng.random() < 0.3 else (td.col("k") < 3, "(k < 3)")
    v = rng.randint(-10, 10)
    return (e1 | (td.col("a") < v)), f"({q1} OR (a < {v}))"


def _canon(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(round(v, 9))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(type(x)), x)
                                           for x in t))


PROGRAMS = 60


@pytest.mark.parametrize("seed", [20260910])
def test_relational_differential_fuzz_extended(spark, seed):
    """r9 grammar growth: outer joins (right / full, both key-coalesce
    modes), null-safe join keys (`join_nulls` -> IS NOT DISTINCT FROM),
    and sort+slice pipelines under a total order (positive, zero, and
    negative offsets with Python-slice clamping)."""
    from _concurrency import run_concurrent

    # phase 1: all rng draws stay SEQUENTIAL (bit-identical program
    # stream to the former inline loop)
    rng = random.Random(seed)
    programs = []
    for p in range(80):
        n1, n2 = rng.randint(3, 15), rng.randint(2, 10)
        rows1 = _rows(rng, n1)
        shape = rng.choice(["right", "full", "full_coalesce",
                            "join_nulls", "slice"])
        if shape == "slice":
            rows = [(i, *r) for i, r in enumerate(_rows(rng, n1))]
            sc = rng.choice(["k", "a", "b", "s"])
            d, nl = rng.random() < 0.5, rng.random() < 0.5
            off = rng.choice([0, 1, 2, -2, -5, n1 + 2, -(n1 + 3)])
            ln = rng.choice([0, 1, 3, n1, n1 + 4])
            programs.append((p, shape, rows1, (rows, sc, d, nl, off, ln)))
        else:
            rows2 = _rows(rng, n2)
            how = (rng.choice(["inner", "left"])
                   if shape == "join_nulls" else None)
            programs.append((p, shape, rows1, (rows2, how)))

    # phase 2: execute concurrently (per-program DuckDB connections)
    def run_one(prog):
        p, shape, rows1, extra = prog
        con = duckdb.connect()
        t1 = _mk(spark, con, "t1", rows1)
        if shape == "slice":
            # total order: (sort col, idx-as-b is not unique) — order by
            # (k,a,b,s) tuple is still not total, so re-key with a unique
            # idx column first
            rows, sc, d, nl, off, ln = extra
            con.execute("CREATE TABLE ts (idx BIGINT, k BIGINT, a BIGINT,"
                        " b DOUBLE, s VARCHAR)")
            con.executemany("INSERT INTO ts VALUES (?,?,?,?,?)", rows)
            tf = td.TableFrame.from_spark(spark.createDataFrame(
                rows, "idx long, k long, a long, b double, s string"))
            got = (tf.sort([sc, "idx"], descending=[d, False],
                           nulls_last=[nl, False])
                   .slice(off, ln).select("idx").to_spark().collect())
            o1 = (f"{sc} {'DESC' if d else 'ASC'} "
                  f"NULLS {'LAST' if nl else 'FIRST'}, idx ASC")
            if off >= 0:
                want = con.execute(
                    f"SELECT idx FROM (SELECT idx FROM ts ORDER BY {o1} "
                    f"LIMIT {ln} OFFSET {off})").fetchall()
            else:
                # Python-slice clamping: end = (N+off) + len computed from
                # the UNCLAMPED start (l[-7:-3] on 4 rows is 1 row, not 4),
                # then both clamped to [0, N]; rows [start, end)
                want = con.execute(
                    f"SELECT idx FROM (SELECT idx, row_number() OVER "
                    f"(ORDER BY {o1}) AS rn, count(*) OVER () AS n "
                    f"FROM ts) WHERE rn - 1 >= greatest(n + {off}, 0) "
                    f"AND rn - 1 < least(n + {off} + {ln}, n)"
                ).fetchall()
            con.close()
            _check_eq(got, want, f"seed={seed} p={p} slice off={off} "
                                 f"len={ln} sort=({sc},{d},{nl})")
            return

        rows2, how = extra
        t2 = _mk(spark, con, "t2", rows2)
        u = "(SELECT k, a AS a2 FROM t2) u"
        t2sel = t2.select(td.col("k"), td.col("a").alias("a2"))
        if shape == "right":
            # default coalesce=True for a `using` right join: single key
            # column = COALESCE(left, right)
            got = t1.join(t2sel, on="k", how="right").to_spark().collect()
            want = con.execute(
                f"SELECT COALESCE(t1.k, u.k) AS k, t1.a, t1.b, t1.s, u.a2 "
                f"FROM t1 RIGHT JOIN {u} ON t1.k = u.k").fetchall()
        elif shape == "full_coalesce":
            got = t1.join(t2sel, on="k", how="full",
                          coalesce=True).to_spark().collect()
            want = con.execute(
                f"SELECT COALESCE(t1.k, u.k) AS k, t1.a, t1.b, t1.s, u.a2 "
                f"FROM t1 FULL JOIN {u} ON t1.k = u.k").fetchall()
        elif shape == "full":
            # Polars default for full: keys NOT merged — both survive,
            # right one suffixed
            got = t1.join(t2sel, on="k", how="full").to_spark().collect()
            want = con.execute(
                f"SELECT t1.k, t1.a, t1.b, t1.s, u.k AS k_right, u.a2 "
                f"FROM t1 FULL JOIN {u} ON t1.k = u.k").fetchall()
        else:
            got = t1.join(t2sel, on="k", how=how,
                          join_nulls=True).to_spark().collect()
            jk = "INNER" if how == "inner" else "LEFT"
            want = con.execute(
                f"SELECT t1.k, t1.a, t1.b, t1.s, u.a2 FROM t1 {jk} JOIN "
                f"{u} ON t1.k IS NOT DISTINCT FROM u.k").fetchall()
        con.close()
        _check_eq(got, want, f"seed={seed} p={p} shape={shape}")

    run_concurrent(programs, run_one)


def _check_eq(got, want, ctx):
    gc, wc = _canon([tuple(r) for r in got]), _canon(want)
    assert gc == wc, (f"{ctx}\nspark ({len(gc)}): {gc[:6]}\n"
                      f"duckdb({len(wc)}): {wc[:6]}")


@pytest.mark.parametrize("seed", [20260817])
def test_relational_differential_fuzz(spark, seed):
    rng = random.Random(seed)
    con = duckdb.connect()
    for p in range(PROGRAMS):
        t1 = _mk(spark, con, "t1", _rows(rng, rng.randint(3, 15)))
        shape = rng.choice(["filter", "group", "join", "distinct",
                            "filter_group"])
        if shape == "filter":
            e, q = _pred(rng)
            got = t1.filter(e).to_spark().collect()
            want = con.execute(f"SELECT * FROM t1 WHERE {q}").fetchall()
        elif shape == "group":
            got = (t1.group_by("k")
                   .agg(n=td.col("a").count(),
                        sa=td.col("a").sum(),
                        mb=td.col("b").mean(),
                        mx=td.col("a").max())
                   .to_spark().collect())
            want = con.execute(
                "SELECT k, count(a) AS n, sum(a) AS sa, avg(b) AS mb, "
                "max(a) AS mx FROM t1 GROUP BY k").fetchall()
        elif shape == "join":
            t2 = _mk(spark, con, "t2", _rows(rng, rng.randint(2, 10)))
            how = rng.choice(["inner", "left", "semi", "anti"])
            if how in ("inner", "left"):
                got = (t1.join(t2.select(td.col("k"),
                                         td.col("a").alias("a2")),
                               on="k", how=how).to_spark().collect())
                jk = "INNER" if how == "inner" else "LEFT"
                want = con.execute(
                    f"SELECT t1.k, t1.a, t1.b, t1.s, u.a2 FROM t1 {jk} JOIN "
                    "(SELECT k, a AS a2 FROM t2) u USING (k)").fetchall()
            else:
                got = t1.join(t2, on="k", how=how).to_spark().collect()
                ex = "EXISTS" if how == "semi" else "NOT EXISTS"
                want = con.execute(
                    f"SELECT * FROM t1 WHERE {ex} "
                    "(SELECT 1 FROM t2 WHERE t2.k = t1.k)").fetchall()
        elif shape == "distinct":
            got = t1.select(td.col("k"), td.col("s")).unique() \
                    .to_spark().collect()
            want = con.execute("SELECT DISTINCT k, s FROM t1").fetchall()
        else:
            e, q = _pred(rng)
            got = (t1.filter(e).group_by("s")
                   .agg(n=td.col("k").count(), sa=td.col("a").sum())
                   .to_spark().collect())
            want = con.execute(
                f"SELECT s, count(k) AS n, sum(a) AS sa FROM t1 "
                f"WHERE {q} GROUP BY s").fetchall()
        gc, wc = _canon([tuple(r) for r in got]), _canon(want)
        assert gc == wc, (f"seed={seed} program={p} shape={shape}\n"
                          f"spark ({len(gc)}): {gc[:6]}\n"
                          f"duckdb({len(wc)}): {wc[:6]}")
