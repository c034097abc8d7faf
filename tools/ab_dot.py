#!/usr/bin/env python
"""Micro A/B: interpreted HOF dot product vs plan-time-unrolled static sum.

Times the candidate-pair cosine scoring shape of knn_graph (pairs joined on
a blocking key, one dot per pair) both ways, interleaved N-O-O-N in one
session.  The unrolled form is the SAME left-to-right IEEE add chain as the
sequential HOF fold, so rounded cosines are bit-identical; this script also
asserts that on the live pairs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from egraphdb_spark.graph import load_tables
    from egraphdb_spark.operators.similarity import _as_double, _cos_pre, _norm
    from egraphdb_spark.session import get_spark

    spark = get_spark("egraphdb-ab-dot")
    emb = load_tables(spark, sf_dir)["embeddings"]
    d = 64
    base = (
        emb.select(
            F.col("vec_id").alias("id"),
            _as_double("embedding").alias("vec"),
            (F.col("vec_id") % 40).alias("blk"),
        )
        .withColumn("vn", _norm(F.col("vec")))
        .localCheckpoint()
    )
    pairs = base.join(
        base.select(
            F.col("id").alias("nbr"),
            F.col("vec").alias("nvec"),
            F.col("vn").alias("nn"),
            "blk",
        ),
        "blk",
    ).where(F.col("id") < F.col("nbr")).localCheckpoint()
    print("pairs:", pairs.count())

    hof = F.round(_cos_pre(F.col("vec"), F.col("nvec"), F.col("vn"), F.col("nn")), 9)

    # unrolled: ((0.0 + v[0]*w[0]) + v[1]*w[1]) + ... — the identical
    # fold-order add chain the HOF aggregate produces
    dot = "0.0D"
    for i in range(d):
        dot = f"({dot} + vec[{i}] * nvec[{i}])"
    unrolled = F.round(
        F.when(F.col("vn") * F.col("nn") == 0.0, F.lit(0.0)).otherwise(
            F.expr(dot) / (F.col("vn") * F.col("nn"))
        ),
        9,
    )

    # bit-identity check
    diff = (
        pairs.withColumn("a", hof).withColumn("b", unrolled)
        .where(F.col("a") != F.col("b"))
        .count()
    )
    print("mismatches:", diff)

    def t(col):
        t0 = time.perf_counter()
        pairs.select(F.sum(col)).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    for order in (["hof", "unr", "unr", "hof"], ["unr", "hof", "hof", "unr"]):
        res = []
        for arm in order:
            res.append((arm, t(hof if arm == "hof" else unrolled)))
        print(res, flush=True)


if __name__ == "__main__":
    main()
