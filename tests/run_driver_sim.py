"""One-shot replica of the driver's full correctness pass at sf0.01.

Run manually (not collected by pytest — no test_ prefix):

    python tests/run_driver_sim.py [sf_dir]

Executes every registered query against the DuckDB oracle at the
driver's grading scale (sf0.01 by default; the per-test differential
suite uses sf0.001) and prints a one-line verdict per query, mirroring
what CORRECTNESS_r{N}.json will contain.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from etl_sber_spark.plans.queries import ORACLE, QUERIES
    from etl_sber_spark.session import get_spark
    from tests.diffcheck import compare, duck_connect

    spark = get_spark("driver-sim")
    duck = duck_connect(sf_dir)
    failed = []
    for name, fn in QUERIES.items():
        t0 = time.time()
        try:
            if name not in ORACLE:
                n = fn(spark, sf_dir).count()
                print(f"ROWS-ONLY {name}: {n} rows  ({time.time()-t0:.1f}s)")
                continue
            compare(name, fn(spark, sf_dir), duck, ORACLE[name])
            print(f"PASS {name}  ({time.time()-t0:.1f}s)")
        except Exception:
            failed.append(name)
            print(f"FAIL {name}")
            traceback.print_exc(limit=3)
    print(f"\n{len(QUERIES) - len(failed)}/{len(QUERIES)} green")
    if failed:
        print("failed:", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
