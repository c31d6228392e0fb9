"""Capture .explain("formatted") output for named registry queries.

Usage: python tools/capture_plans.py [--out DIR] <suffix> [sf_dir] <query> [query ...]

Writes <DIR>/<query>_<suffix>.txt for each query (suffix is usually
"before" or "after"; DIR defaults to plans/r11).  Plans are captured on
the tuned bench session — the same session bench.py times — so Exchange
counts / join strategies match what the bench measures.  Uses the public
df.explain() (stdout capture), so it also works on Spark Connect
sessions, which fan_out explicitly supports.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    out_dir = None
    if args and args[0] == "--out":
        out_dir = args[1]
        args = args[2:]
    suffix = args[0]
    rest = args[1:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest

    import tabsdata_spark as td
    from tabsdata_spark import queries as registry

    spark = td.get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    if out_dir is None:
        out_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "plans", "r11")
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
