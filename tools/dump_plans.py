#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> q1 [q2 ...]
e.g.:  python tools/dump_plans.py r10 before graph_betweenness graph_ktruss

Plan capture executes the query DAG only as far as the gates themselves do
(iterative gates materialize per-round checkpoints while BUILDING the
DataFrame, so this does run those rounds once); the dumped plan is the
final assembled stage the noop sink would execute.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from egraphdb_spark.queries import REGISTRY, fixture
    from egraphdb_spark.session import get_spark

    spark = get_spark("egraphdb-plans")
    fixture(spark, sf_dir)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn, _ = REGISTRY[name]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
