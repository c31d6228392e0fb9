"""Capture .explain("formatted") output for named registry queries.

Usage: python tools/capture_plans.py <suffix> [sf_dir] <query> [query ...]

Writes plans/r10/<query>_<suffix>.txt for each query (suffix is usually
"before" or "after").  Plans are captured on the tuned bench session —
the same session bench.py times — so Exchange counts / join strategies
match what the bench measures.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    rest = sys.argv[2:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest

    import tabsdata_spark as td
    from tabsdata_spark import queries as registry

    spark = td.get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
