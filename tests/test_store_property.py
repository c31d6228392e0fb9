"""Model-based property test of the versioned TableStore.

Random operation sequences — plain writes, keyed merges (upsert and
full-snapshot), multi-write transactions that randomly abort, and
vacuum(keep_last) — run against a real store, mirrored by a pure-Python
model tracking (version_id, rows) per table.  After every operation the
committed history ids, HEAD contents, random HEAD~n / fixed-id / range
reads, and empty-table errors must all match the model.

Covers the interleavings the directed store tests don't: merge after
vacuum, aborted transactions between merges, ranges spanning merged and
written versions, and vacuum horizons landing on merge outputs.
Reproducible from the printed (seed, step, op) triple; the committed
seed is frozen.
"""

from __future__ import annotations

import random

import pytest

import tabsdata_spark as td
from tabsdata_spark.errors import VersionResolutionError
from tabsdata_spark.store.table_store import TableStore

TABLES = ["ta", "tb"]


def _frame(spark, rows):
    return td.TableFrame.from_dict(
        spark, {"k": [r[0] for r in rows], "v": [r[1] for r in rows]})


def _rows(rng, lo=1, hi=5):
    ks = rng.sample(range(10), rng.randint(lo, hi))
    return [(k, f"s{rng.randint(0, 99)}") for k in ks]


def _collect(tf):
    d = tf.to_dict()
    return sorted(zip(d["k"], d["v"]))


def _check_table(spark, store, model, t, rng, ctx):
    hist = store.history("c", t)
    ids = [vid for vid, _ in model[t]]
    assert hist == ids, f"{ctx}: history {hist} != model {ids}"
    if not ids:
        with pytest.raises(VersionResolutionError):
            store.read(spark, "c", t)
        return
    got = _collect(store.read(spark, "c", t))
    assert got == sorted(model[t][-1][1]), f"{ctx}: HEAD mismatch {got}"
    n = rng.randrange(len(ids))
    got = _collect(store.read(spark, "c", t, f"HEAD~{n}"))
    want = sorted(model[t][-1 - n][1])
    assert got == want, f"{ctx}: HEAD~{n} {got} != {want}"
    vid, rows = model[t][rng.randrange(len(ids))]
    got = _collect(store.read(spark, "c", t, vid))
    assert got == sorted(rows), f"{ctx}: @{vid} mismatch"
    if len(ids) >= 2:
        a = rng.randrange(1, len(ids))
        b = rng.randrange(0, a + 1)
        got = _collect(store.read(spark, "c", t, f"HEAD~{a}..HEAD~{b}"))
        want = sorted(sum((r for _, r in model[t][-1 - a:len(ids) - b]), []))
        assert got == want, f"{ctx}: range HEAD~{a}..HEAD~{b} mismatch"


def _model_merge(head_rows, batch, delete_missing):
    if delete_missing:
        return list(batch)
    keys = {k for k, _ in batch}
    return [r for r in head_rows if r[0] not in keys] + list(batch)


@pytest.mark.parametrize("seed", [20260914])
def test_store_random_op_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    for seq in range(4):
        store = TableStore(str(tmp_path / f"w{seq}"))
        model: dict[str, list[tuple[str, list]]] = {t: [] for t in TABLES}
        for step in range(12):
            op = rng.choice(["write", "write", "merge", "merge", "txn",
                             "vacuum"])
            t = rng.choice(TABLES)
            ctx = f"seed={seed} seq={seq} step={step} op={op} t={t}"
            if op == "write":
                rows = _rows(rng)
                vid = store.write(_frame(spark, rows), "c", t)
                model[t].append((vid, rows))
            elif op == "merge":
                batch = _rows(rng)
                delete_missing = rng.random() < 0.3
                vid = store.merge(_frame(spark, batch), "c", t,
                                  key_cols=["k"],
                                  delete_missing=delete_missing)
                head = model[t][-1][1] if model[t] else None
                if head is None:
                    model[t].append((vid, list(batch)))
                else:
                    model[t].append(
                        (vid, _model_merge(head, batch, delete_missing)))
            elif op == "txn":
                writes = [(rng.choice(TABLES), _rows(rng))
                          for _ in range(rng.randint(1, 2))]
                abort = rng.random() < 0.5
                try:
                    with store.transaction() as txn:
                        staged = [
                            (wt, rows,
                             store.write(_frame(spark, rows), "c", wt,
                                         txn_id=txn))
                            for wt, rows in writes]
                        if abort:
                            raise RuntimeError("fuzz abort")
                except RuntimeError:
                    pass
                else:
                    for wt, rows, vid in staged:
                        model[wt].append((vid, rows))
            else:  # vacuum
                keep = rng.randint(1, 3)
                store.vacuum(keep_last=keep)
                for mt in TABLES:
                    model[mt] = model[mt][-keep:]
            _check_table(spark, store, model, t, rng, ctx)
        for t in TABLES:
            _check_table(spark, store, model, t, rng,
                         f"seed={seed} seq={seq} final t={t}")
