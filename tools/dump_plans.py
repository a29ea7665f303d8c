#!/usr/bin/env python3
"""Dump .explain("formatted") for every declared query to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [suffix] [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix default "before").
Plan-only — nothing is executed, so this is safe to run on a busy box.
With AQE on the text shows the initial plan (isFinalPlan=false); the
Exchange count / join strategy / PushedFilters are what we pin.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_sber_spark.plans.queries import QUERIES
    from etl_sber_spark.session import get_spark

    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        buf = io.StringIO()
        try:
            df = fn(spark, sf_dir)
            with redirect_stdout(buf):
                df.explain("formatted")
        except Exception as exc:  # noqa: BLE001 - record, keep going
            buf.write(f"EXPLAIN FAILED: {exc}\n")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
