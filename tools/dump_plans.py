"""Dump .explain("formatted") for named queries to plans/<round>/<q>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> <query> [query ...]
Round dir defaults to r13; override with SPARK_GRAFT_PLANS_DIR.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from modware_loader_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get("SPARK_GRAFT_PLANS_DIR") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)


def main() -> None:
    import __spark_entry__ as entrymod

    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("modware-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
