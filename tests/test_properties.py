"""Property-based relational invariants (hypothesis).

The reference has no randomized testing (SURVEY §5); these cover the
algebraic laws operator rewrites must preserve, over arbitrary small
frames (nulls included).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

import tabsdata_spark as td

ints_with_null = st.lists(st.one_of(st.integers(-50, 50), st.none()),
                          min_size=1, max_size=20)

SET = settings(max_examples=10, deadline=None)


def _tf(spark, vals):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "idx int, v int")
    return td.TableFrame.from_spark(df)


@given(vals=ints_with_null)
@SET
def test_filter_partitions_rows(spark, vals):
    tf = _tf(spark, vals)
    p = td.col("v") > 0
    kept = tf.filter(p).df.count()
    # ~p drops nulls too (3-valued logic): null rows are in neither side
    dropped = tf.filter(~p).df.count()
    nulls = tf.filter(td.col("v").is_null()).df.count()
    assert kept + dropped + nulls == len(vals)


@given(a=ints_with_null, b=ints_with_null)
@SET
def test_concat_counts_add(spark, a, b):
    fa, fb = _tf(spark, a), _tf(spark, b)
    assert td.concat([fa, fb]).df.count() == len(a) + len(b)


@given(vals=ints_with_null)
@SET
def test_unique_is_subset_with_distinct_keys(spark, vals):
    tf = _tf(spark, vals)
    uq = tf.unique(subset="v").df
    got = [r.v for r in uq.collect()]
    assert len(got) == len(set(got))
    assert set(got) <= set(vals) | {None}


@given(vals=ints_with_null)
@SET
def test_sort_preserves_multiset(spark, vals):
    tf = _tf(spark, vals)
    out = [r.v for r in tf.sort("v").df.collect()]
    assert sorted((x for x in out if x is not None)) == \
           sorted(x for x in vals if x is not None)
    assert out.count(None) == vals.count(None)


@given(vals=ints_with_null, fill=st.integers(-5, 5))
@SET
def test_fill_null_removes_all_nulls(spark, vals, fill):
    tf = _tf(spark, vals)
    out = tf.fill_null(fill)
    assert out.df.filter("v IS NULL").count() == 0
    assert out.df.count() == len(vals)


@given(vals=ints_with_null)
@SET
def test_groupby_sum_equals_total(spark, vals):
    tf = _tf(spark, vals)
    per_group = tf.with_columns(g=td.col("v") % 3) \
        .group_by("g").agg(s=td.col("v").sum()).df.collect()
    total = sum(r.s for r in per_group if r.s is not None)
    expected = sum(x for x in vals if x is not None)
    assert total == expected or (expected == 0 and total == 0)


# ---------------------------------------------------------------- avro codec
# Spark-free: the binary codec is pure Python, so hypothesis can hammer it
# at full speed (no session involved).
_avro_scalar = st.one_of(
    st.none(),
    st.integers(-(2 ** 63), 2 ** 63 - 1),
    st.text(max_size=40),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
)


@given(rows=st.lists(
    st.fixed_dictionaries({
        "a": st.integers(-(2 ** 63), 2 ** 63 - 1),
        "s": st.one_of(st.none(), st.text(max_size=60)),
        "d": st.one_of(st.none(),
                       st.floats(allow_nan=False, allow_infinity=False)),
        "arr": st.lists(st.integers(-(2 ** 31), 2 ** 31), max_size=8),
        "m": st.dictionaries(st.text(min_size=1, max_size=10),
                             st.integers(-1000, 1000), max_size=5),
    }),
    max_size=30),
    codec=st.sampled_from(["null", "deflate"]))
@settings(max_examples=60, deadline=None)
def test_avro_container_roundtrip_property(rows, codec):
    from tabsdata_spark.io import avro_py

    schema = {
        "type": "record", "name": "R", "fields": [
            {"name": "a", "type": "long"},
            {"name": "s", "type": ["null", "string"], "default": None},
            {"name": "d", "type": ["null", "double"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "int"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
        ],
    }
    blob = avro_py.write_container(schema, rows, codec=codec)
    got_schema, got = avro_py.read_container(blob)
    assert got_schema == schema
    assert got == rows


@given(n=st.integers(-(2 ** 63), 2 ** 63 - 1))
@settings(max_examples=200, deadline=None)
def test_avro_zigzag_varint_roundtrip_property(n):
    import io as _io

    from tabsdata_spark.io.avro_py import _Reader, _write_long

    buf = _io.BytesIO()
    _write_long(buf, n)
    assert _Reader(buf.getvalue()).read_long() == n


# ---------------------------------------------------------------- seg dedup
@settings(max_examples=15, deadline=None)
@given(docs=st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
             min_size=0, max_size=50),
    min_size=1, max_size=8))
def test_segment_dedup_invariants(spark, docs):
    """For any corpus: a reference python implementation of keep-first
    segment dedup agrees exactly with the distributed one — totals, kept
    counts, and rebuilt text per document."""
    from tabsdata_spark.llm.dedup import segment_dedup

    k = 3
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           segment_dedup(df, seg_words=k).collect()}

    def segs(text):
        w = text.split(" ")          # '' splits to [''] — one empty segment
        return [" ".join(w[i:i + k]) for i in range(0, len(w), k)]

    seen: set[str] = set()
    for doc_id, text in rows:        # rows are in (doc_id, seg_idx) order
        mine = segs(text)
        kept = []
        for s in mine:               # within-doc repeats dedup too
            if s not in seen:
                kept.append(s)
                seen.add(s)
        r = out[doc_id]
        assert r["segs_total"] == len(mine)
        assert r["segs_kept"] == len(kept)
        assert r["text_dedup"] == " ".join(kept)
    assert len(out) == len(rows)


# Spark-free: the AVI container codec is pure Python — hammer the
# roundtrip over arbitrary frame geometries (odd widths exercise row
# padding; single-frame videos exercise the empty-motion path).
@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 5),
    h=st.integers(1, 12),
    w=st.integers(1, 13),
    fps=st.integers(1, 60),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_container_roundtrip(n, h, w, fps, seed):
    import numpy as np

    from tabsdata_spark.llm import codecs

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    avi = codecs.encode_avi(frames, fps=fps)
    meta = codecs.decode_avi(avi)
    assert (meta["width"], meta["height"], meta["n_frames"], meta["fps"]) \
        == (w, h, n, fps)
    for i in range(n):
        bmp = codecs.avi_frame(avi, meta, i)
        d = codecs.decode_bmp(bmp)
        assert (d["width"], d["height"]) == (w, h)
        assert np.array_equal(d["pixels"], frames[i])
    if n == 1:
        assert meta["features"][1] == 0.0


@given(vals=st.lists(st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2030),
    max_size=40), min_size=1, max_size=8))
@SET
def test_normalize_text_idempotent(spark, vals):
    """normalize(normalize(x)) == normalize(x) for arbitrary unicode."""
    from tabsdata_spark.llm import textual
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i int, t string")
    out = df.select(
        textual.normalize_text(F.col("t")).alias("once"),
        textual.normalize_text(textual.normalize_text(F.col("t")))
        .alias("twice")).collect()
    for r in out:
        assert r["once"] == r["twice"]


@given(xs=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                             allow_nan=False), min_size=1, max_size=12))
@SET
def test_zorder_value_matches_python_model(spark, xs):
    from tabsdata_spark.scale import zorder_value
    import pyspark.sql.functions as F

    bits, lo, hi = 6, -100.0, 100.0
    df = spark.createDataFrame([(i, float(x)) for i, x in enumerate(xs)],
                               "i int, x double")
    got = {r["i"]: r["z"] for r in df.select(
        "i", zorder_value([F.col("x"), F.col("x")],
                          [(lo, hi), (lo, hi)], bits).alias("z")).collect()}

    def model(x):
        import math
        q = int(math.floor((min(max(x, lo), hi) - lo) / (hi - lo)
                           * ((1 << bits) - 1)))
        z = 0
        for b in range(bits):
            bit = (q >> b) & 1
            z |= bit << (2 * b)
            z |= bit << (2 * b + 1)
        return z

    for i, x in enumerate(xs):
        assert got[i] == model(x), (x, got[i], model(x))


# ------------------------------------------------------- containment/jaccard
@settings(max_examples=10, deadline=None)
@given(docs=st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
             min_size=1, max_size=30),
    min_size=2, max_size=6))
def test_containment_bounds_jaccard(spark, docs):
    """For any pair: J(A,B) <= min(C(A,B), C(B,A)) and both containments
    are in [0, 1] — set algebra the distributed ops must respect."""
    from tabsdata_spark.llm.dedup import containment_pairs, ngram_jaccard_pairs

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(len(docs) - 1)], "id_a long, id_b long")
    cont = {(r["id_a"], r["id_b"]): (r["containment_ab"], r["containment_ba"])
            for r in containment_pairs(df, pairs, n=3).collect()}
    jac = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(df, pairs, n=3).collect()}
    assert set(cont) == set(jac)
    for key, (cab, cba) in cont.items():
        assert 0.0 <= cab <= 1.0 and 0.0 <= cba <= 1.0
        assert jac[key] <= min(cab, cba) + 1e-9


# ---------------------------------------------------------- weighted sample
@settings(max_examples=10, deadline=None)
@given(weights=st.lists(st.integers(min_value=0, max_value=100),
                        min_size=1, max_size=40),
       k=st.integers(min_value=1, max_value=10))
def test_weighted_sample_subset_and_size(spark, weights, k):
    """Sample is always a subset of the positive-weight rows, of size
    min(k, |positive|), and equals the reference A-ES computed in pure
    Python with the same portable hash."""
    import hashlib
    import math as m

    from tabsdata_spark.llm.corpus import weighted_sample

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sorted(r["doc_id"] for r in
                 weighted_sample(df, "w", "doc_id", k).collect())
    pos = [(i, w) for i, w in rows if w > 0]
    assert len(got) == min(k, len(pos))
    assert set(got) <= {i for i, _ in pos}

    def es_key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        return m.log((h + 1) / float(2 ** 60)) / float(w)

    expect = sorted(i for i, _ in sorted(
        pos, key=lambda t: (-es_key(*t), t[0]))[:k])
    assert got == expect


@given(obs=st.lists(
    st.tuples(st.integers(1, 3),                      # key
              st.integers(0, 30),                     # minutes offset
              st.floats(-50, 50, allow_nan=False, width=32)),
    min_size=1, max_size=25))
@settings(max_examples=15, deadline=None)
def test_resample_ffill_matches_python_model(spark, obs):
    """Grid bounds, fill values, and pre-observation nulls all match a
    direct python replay of the spec."""
    import datetime as dt

    from tabsdata_spark.extensions import resample_ffill

    t0 = dt.datetime(2024, 1, 1)
    rows = [(k, t0 + dt.timedelta(minutes=m), float(v)) for k, m, v in obs]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    got = {(r.k, r.grid_ts): r.value_ffill
           for r in resample_ffill(df, "k", "ts", "v").collect()}

    def floor_h(t):
        return t.replace(minute=0, second=0, microsecond=0)

    by_key: dict = {}
    for k, t, v in rows:
        by_key.setdefault(k, []).append((t, v))
    expect = {}
    for k, pts in by_key.items():
        lo = floor_h(min(t for t, _ in pts))
        hi = floor_h(max(t for t, _ in pts))
        g = lo
        while g <= hi:
            past = [(t, v) for t, v in pts if t <= g]
            if past:
                tmax = max(t for t, _ in past)
                # ties at the same instant resolve to the max value
                expect[(k, g)] = max(v for t, v in past if t == tmax)
            else:
                expect[(k, g)] = None
            g += dt.timedelta(hours=1)
    assert got == expect


@given(baskets=st.lists(
    st.tuples(st.integers(1, 5), st.sampled_from("abcd")),
    min_size=1, max_size=30))
@settings(max_examples=15, deadline=None)
def test_cooccurrence_lift_matches_set_model(spark, baskets):
    from tabsdata_spark.extensions import cooccurrence_lift

    df = spark.createDataFrame(baskets, "b long, i string")
    got = {(r.item_a, r.item_b): (r.n_ab, r.support, r.confidence, r.lift)
           for r in cooccurrence_lift(df, "b", "i").collect()}

    sets: dict = {}
    for b, i in baskets:
        sets.setdefault(b, set()).add(i)
    n_total = len(sets)
    items = sorted({i for s in sets.values() for i in s})
    marg = {i: sum(1 for s in sets.values() if i in s) for i in items}
    expect = {}
    for x in items:
        for y in items:
            if x < y:
                n_ab = sum(1 for s in sets.values() if x in s and y in s)
                if n_ab:
                    expect[(x, y)] = n_ab
    assert set(got) == set(expect)
    for (x, y), (n_ab, sup, conf, lift) in got.items():
        assert n_ab == expect[(x, y)]
        assert sup == round(n_ab / n_total, 6)
        assert conf == round(n_ab / marg[x], 6)
        assert abs(lift - n_ab * n_total / (marg[x] * marg[y])) < 1e-6


@given(seq=st.lists(st.sampled_from("abc"), min_size=2, max_size=20))
@settings(max_examples=15, deadline=None)
def test_markov_transitions_rows_sum_to_one(spark, seq):
    import datetime as dt

    from tabsdata_spark.extensions import markov_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, i, t0 + dt.timedelta(minutes=i), s)
            for i, s in enumerate(seq)]
    df = spark.createDataFrame(rows, "u long, eid long, ts timestamp, s string")
    out = markov_transitions(df, "u", "ts", "s", tie_cols=["eid"]).collect()
    assert sum(r.n_ab for r in out) == len(seq) - 1
    by_state: dict = {}
    for r in out:
        by_state.setdefault(r.state, []).append(r.p)
    for ps in by_state.values():
        assert abs(sum(ps) - 1.0) < 1e-5   # rounded to 6 per row


@given(cand=st.lists(
    st.tuples(st.integers(1, 40),
              st.floats(0, 1, allow_nan=False, width=16),
              st.lists(st.floats(-4, 4, allow_nan=False, width=16),
                       min_size=3, max_size=3)),
    min_size=1, max_size=12, unique_by=lambda t: t[0]))
@settings(max_examples=15, deadline=None)
def test_mmr_rerank_matches_python_greedy(spark, cand):
    """The Arrow MMR selection equals a direct python greedy replay
    (same sequential-fold cosine, same tie rule)."""
    import math

    from tabsdata_spark.llm import similarity

    # vectors must be non-zero for a defined cosine
    cand = [(i, r, v) for i, r, v in cand if any(x != 0 for x in v)]
    if not cand:
        return
    df = spark.createDataFrame(
        [(0, i, r, v) for i, r, v in cand],
        "query_id long, vec_id long, rel double, embedding array<double>")
    got = sorted(((r.sel_rank, r.vec_id) for r in
                  similarity.mmr_rerank(df, lam=0.75, k=4).collect()))

    def cos(a, b):
        d = sa = sb = 0.0
        for x, y in zip(a, b):
            d += x * y
            sa += x * x
            sb += y * y
        return d / (math.sqrt(sa) * math.sqrt(sb))

    rels = {i: r for i, r, _ in cand}
    vecs = {i: v for i, _, v in cand}
    avail, sel, expect = set(vecs), [], []
    for step in range(1, 5):
        if not avail:
            break
        best, best_s = None, None
        for i in sorted(avail):
            ms = max((cos(vecs[i], vecs[s]) for s in sel), default=0.0)
            s = 0.75 * rels[i] - 0.25 * ms
            if best is None or s > best_s:
                best, best_s = i, s
        expect.append((step, best))
        avail.discard(best)
        sel.append(best)
    assert got == sorted(expect)


# ---------------------------------------------------------------------------
# r4 statistical operators vs brute-force python models
# ---------------------------------------------------------------------------

@given(vals=st.lists(st.tuples(st.booleans(),
                               st.integers(-30, 30)),
                     min_size=4, max_size=24))
@SET
def test_mann_whitney_matches_python_model(spark, vals):
    from tabsdata_spark import stats

    # need both cohorts non-empty for a defined U
    if not any(c for c, _ in vals) or all(c for c, _ in vals):
        return
    rows = [("g", c, float(v)) for c, v in vals]
    df = spark.createDataFrame(rows, "g string, cohort boolean, v double")
    r = stats.mann_whitney_u(df, "v", "cohort", ["g"]).collect()[0]

    # brute-force U_A: pairs won + half the ties
    a = sorted(v for c, v in vals if c)
    b = sorted(v for c, v in vals if not c)
    u = sum((1.0 if x > y else 0.5 if x == y else 0.0)
            for x in a for y in b)
    assert r.u_stat == round(u, 6)
    assert (r.n_a, r.n_b) == (len(a), len(b))


@given(vals=st.lists(st.tuples(st.sampled_from("xyz"),
                               st.sampled_from("uvw")),
                     min_size=2, max_size=30))
@SET
def test_chi_squared_matches_python_model(spark, vals):
    from tabsdata_spark import stats
    from collections import Counter
    import math

    df = spark.createDataFrame(list(vals), "a string, b string")
    r = stats.chi_squared_independence(df, "a", "b").collect()[0]

    cells = Counter(vals)
    ra = Counter(a for a, _ in vals)
    cb = Counter(b for _, b in vals)
    n = len(vals)
    chi2 = 0
    for a in ra:
        for b in cb:
            e = ra[a] * cb[b] / n
            o = cells.get((a, b), 0)
            chi2 += math.floor((o - e) * (o - e) / e * 1e9 + 0.5)
    assert r.chi2 == round(chi2 / 1e9, 6)
    assert r.n == n and r.dof == (len(ra) - 1) * (len(cb) - 1)


@given(upd_keys=st.sets(st.integers(0, 9), max_size=8),
       changed=st.sets(st.integers(0, 9), max_size=8))
@SET
def test_scd2_history_invariants(spark, upd_keys, changed):
    import datetime as dt

    from tabsdata_spark.store.diff import scd2_apply

    t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1)
    hist = spark.createDataFrame(
        [(k, f"v{k}", t0, None) for k in range(5)],
        "k long, attr string, valid_from timestamp, valid_to timestamp")
    upd = spark.createDataFrame(
        [(k, f"v{k}_new" if k in changed else f"v{k}", t1)
         for k in sorted(upd_keys)] or [(99, "x", t1)],
        "k long, attr string, ts timestamp")
    out = scd2_apply(hist, upd, ["k"], ["attr"], "ts").collect()
    # invariant 1: exactly one OPEN row per key ever seen
    open_per_key = {}
    for r in out:
        if r.valid_to is None:
            open_per_key[r.k] = open_per_key.get(r.k, 0) + 1
    assert all(v == 1 for v in open_per_key.values())
    # invariant 2: every original key still has an open row; every update
    # key has one too
    keys = {r.k for r in out if r.valid_to is None}
    expect = set(range(5)) | (upd_keys or {99})
    if not upd_keys:
        expect = set(range(5)) | {99}
    assert keys == expect
    # invariant 3: closed rows close exactly at the update ts
    for r in out:
        if r.valid_to is not None:
            assert r.valid_to == t1 and r.k in (changed & upd_keys
                                                & set(range(5)))


@given(lts=st.lists(st.integers(0, 40), min_size=1, max_size=12),
       rts=st.sets(st.integers(0, 40), min_size=1, max_size=10),
       direction=st.sampled_from(["backward", "forward", "nearest"]))
@SET
def test_asof_join_matches_pandas_merge_asof(spark, lts, rts, direction):
    """extensions.asof_join (union + forward-fill windows) must agree
    with pandas merge_asof — the de-facto reference semantics — on
    arbitrary frames, all three strategies, with `by` groups.  Right
    `on` values are unique per group so tie rules cannot differ."""
    import pandas as pd

    from tabsdata_spark.extensions import asof_join

    left = [(i, i % 2, t) for i, t in enumerate(lts)]
    right = [(t % 2, t, float(t) * 10 + t % 2) for t in sorted(rts)]
    ldf = spark.createDataFrame(left, "idx long, g long, t long")
    rdf = spark.createDataFrame(right, "g long, t long, rv double")

    out = asof_join(ldf, rdf, on="t", by="g", strategy=direction)
    got = {r.idx: r.rv for r in out.collect()}

    lp = pd.DataFrame(left, columns=["idx", "g", "t"]).sort_values("t")
    rp = pd.DataFrame(right, columns=["g", "t", "rv"]).sort_values("t")
    exp_df = pd.merge_asof(lp, rp, on="t", by="g", direction=direction)
    exp = {int(r.idx): (None if pd.isna(r.rv) else float(r.rv))
           for r in exp_df.itertuples()}
    assert got == exp


def test_ewma_matches_pandas_reference(spark):
    """extensions.ewma == pandas ewm(alpha, adjust=True) wherever the
    series is shorter than the truncation depth."""
    import pandas as pd

    from tabsdata_spark import extensions

    vals = [3.0, 1.5, 4.0, -2.0, 0.25, 10.0]
    expected = pd.Series(vals).ewm(alpha=0.5, adjust=True).mean()
    df = spark.createDataFrame(
        [(i, 1, v) for i, v in enumerate(vals)], "i long, u long, v double")
    got = {r.i: r.ewma for r in
           extensions.ewma(df, "u", ["i"], "v", alpha=0.5, terms=8).collect()}
    for i, e in enumerate(expected):
        assert abs(got[i] - round(e, 6)) <= 1e-6, (i, got[i], e)


def test_pagerank_exact_mass_conserved(spark):
    """Sum of PageRank over an undirected graph stays ~1 (no dangling
    nodes by construction)."""
    from tabsdata_spark import graph

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")],
        ["s", "d"])
    out = graph.pagerank_exact(edges, "s", "d", iters=4).collect()
    total = sum(r.pagerank for r in out)
    assert abs(total - 1.0) < 1e-4


def test_quantile_normalize_is_permutation_invariant(spark):
    """Shuffling input rows (different partitioning) must not change any
    normalized value — the determinism contract."""
    from tabsdata_spark import extensions

    rows = [(i, "g" + str(i % 3), float((i * 37) % 101)) for i in range(60)]
    df1 = spark.createDataFrame(rows, "id long, g string, v double")
    df2 = spark.createDataFrame(rows[::-1], "id long, g string, v double") \
        .repartition(7)
    a = {r.id: r.value_norm
         for r in extensions.quantile_normalize(df1, "g", "v", "id").collect()}
    b = {r.id: r.value_norm
         for r in extensions.quantile_normalize(df2, "g", "v", "id").collect()}
    assert a == b


def test_kaplan_meier_matches_ecdf_without_censoring(spark):
    """With zero censoring, KM survival equals 1 - empirical CDF."""
    from tabsdata_spark import stats

    durations = [1, 2, 2, 3, 5, 5, 5, 8]
    df = spark.createDataFrame([("g", t, True) for t in durations],
                               "g string, t int, ev boolean")
    got = {r.t: r.survival
           for r in stats.kaplan_meier(df, ["g"], "t", "ev").collect()}
    n = len(durations)
    for t in sorted(set(durations)):
        ecdf = sum(1 for d in durations if d <= t) / n
        assert abs(got[t] - (1 - ecdf)) < 1e-6, (t, got[t], 1 - ecdf)


def test_calibration_bins_totals_partition_input(spark):
    from tabsdata_spark import stats

    rows = [((i % 97) / 97.0, i % 2) for i in range(200)]
    df = spark.createDataFrame(rows, "score double, y int")
    out = stats.calibration_bins(df, "score", "y", bins=10).collect()
    assert sum(r.n for r in out) == 200
    # weighted mean of frac_pos recovers the global positive rate
    pos = sum(r.n * r.frac_pos for r in out)
    assert abs(pos - 100) < 0.01
