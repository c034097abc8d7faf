#!/usr/bin/env python
"""Local mimic of the driver's correctness sweep.

Fresh process, VANILLA SparkSession (no engine confs — exactly what the
driver supplies), every registry gate run against its DuckDB oracle at
sf0.01 (the driver's oracle scale).  Usage:

    python tools/verify_sweep.py [sf_dir] [name_substring ...]

Prints one line per gate; exits non-zero if any gate fails.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("verify-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )

    import __spark_entry__ as entry
    from parity import check_query

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = [n for n in qs if not only or any(s in n for s in only)]
    print(f"registry: {len(qs)} queries, {len(oracles)} oracles; running {len(names)}")

    failures = []
    for name in names:
        t0 = time.perf_counter()
        try:
            problems = check_query(spark, name, sf_dir)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            problems = [f"EXC {type(exc).__name__}: {exc}"]
        dt = time.perf_counter() - t0
        if problems:
            failures.append(name)
            print(f"{name} FAIL ({dt:.1f}s): " + " | ".join(problems)[:500], flush=True)
        else:
            print(f"{name} OK ({dt:.1f}s)", flush=True)

    print(f"\n{len(names) - len(failures)}/{len(names)} OK")
    if failures:
        print("FAILED:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
