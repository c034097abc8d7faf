"""Explicit skew-mitigation utilities (salting).

AQE's skew-join split covers shuffle joins at runtime, and hash
aggregation does map-side partial combine — but two shapes still
single-thread a hot key:

* **window functions** (``row_number`` over ``partitionBy(key)``): ALL
  rows of a hot key land in one task.  ``salted_topn`` splits the key
  across ``n_salt`` sub-partitions, takes a local top-n in each, then a
  final top-n over the tiny survivor set (≤ n_salt*n rows per key).
* **broadcast-less joins against a skewed fact side**: ``salted_join``
  replicates the small side ``n_salt`` times and scatters the big side by
  a salt, so one hot key spreads over ``n_salt`` reducers.

Salt = ``spark_partition_id() % n_salt``: deterministic per input split,
zero-cost (no rand(), no hash of payload), and rows of one hot key are
spread because they span many input partitions.  Results are exactly the
plain-operator results — salting is invisible in the output (the
correctness gate checks both against unsalted oracles).

At 100 TB: pick n_salt ~ (hot-key rows / target-partition-rows); the
survivor set of salted_topn stays n_salt*n regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column, Window as W, functions as F


def _salt(n_salt: int) -> Column:
    return (F.spark_partition_id() % F.lit(n_salt)).alias("__salt")


def salted_topn(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column],
    n: int,
    n_salt: int = 32,
) -> DataFrame:
    """Top-``n`` rows per key under a TOTAL order, hot-key safe.

    Two-phase: local top-n within (key, salt) — each hot key's rows split
    across up to n_salt tasks — then global top-n over ≤ n_salt*n
    survivors per key.  ``order_cols`` must be a total order (include a
    unique tie-break) or the survivor set is nondeterministic.
    Output = input columns + ``rn`` (1-based rank per key).
    """
    cols = df.columns
    local = W.partitionBy(*key_cols, "__salt").orderBy(*order_cols)
    phase1 = (
        df.withColumn("__salt", _salt(n_salt))
        .withColumn("__lrn", F.row_number().over(local))
        .where(F.col("__lrn") <= n)
        .drop("__salt", "__lrn")
    )
    final = W.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        phase1.withColumn("rn", F.row_number().over(final))
        .where(F.col("rn") <= n)
        .select(*cols, "rn")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: scatter ``big`` by salt, replicate ``small``
    n_salt ways, join on (keys + salt).  Same rows as ``big.join(small,
    on, how)`` — one hot key now occupies n_salt reducers instead of one.

    Use when the small side is too big to broadcast and AQE's skew split
    is unavailable (e.g. the join feeds a co-partitioned downstream op
    that must not be re-split).  ``how`` must be 'inner' or a left-ish
    join keyed on ``big`` ('left', 'left_semi'); right/full would need
    the salt on the other side.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(f"salted_join: unsupported how={how!r}")
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("__salt")
    small_rep = small.select("*", salts)
    big_s = big.withColumn("__salt", _salt(n_salt))
    return big_s.join(small_rep, on + ["__salt"], how).drop("__salt")


def bloom_prefilter_join(
    probe: "DataFrame",
    probe_key: str,
    build: "DataFrame",
    build_key: str,
) -> "DataFrame":
    """Inner join with an explicit Bloom runtime filter: build the ≤8 KB
    sketch over the build side's keys, embed it as a literal map in a
    probe-side expression, and drop non-members BEFORE the probe side
    shuffles.  Result is IDENTICAL to the plain inner join — Bloom has no
    false negatives, and the exact join removes the false positives — but
    the shuffle carries only rows that can match (at 100 TB, with a
    selective build side, that is the difference between shuffling the
    full fact table and shuffling the matching slice).

    This is Spark's own runtime row-filter made explicit, persistent-able
    (bloom_build rows merge by bit_or), and engine-portable.  The ≤1024-row
    sketch stays a DataFrame: each of the k=4 positions probes it with a
    BROADCAST left join (map-side, pre-shuffle — no driver collect, and no
    1024-entry literal-map expression, which measured 6× slower than the
    joins by blowing up codegen).

    The ORACLE for any gate over this operator is the plain join — the
    equivalence IS the contract being checked.
    """
    from .checkpoint import cut_lineage
    from .sketches import _bloom_pos, bloom_build

    # cut_lineage: the ≤1024-row filter is probed once per hash position
    # (k=4 broadcast joins) — uncut, each join re-built the bloom from a
    # fresh scan of the build side (4 extra scans measured)
    words = cut_lineage(
        bloom_build(build.select(F.col(build_key)), build_key)
    )
    key = F.col(probe_key)
    from ..graph import spread_low_parallelism

    # four hash positions × (broadcast probe + bit test) per probe row
    # follow — spread a single-split probe scan first so the membership
    # pass runs at full width (guide §2.5; no-op on wide inputs)
    pruned = spread_low_parallelism(probe)
    member = None
    for j, pos in enumerate(_bloom_pos(key)):
        w = words.select(
            F.col("word").alias(f"_bw{j}"), F.col("bits").alias(f"_bb{j}")
        )
        # pos < 2^16, so the double division is exact; cast truncates
        pruned = pruned.join(
            F.broadcast(w), (pos / 64).cast("long") == F.col(f"_bw{j}"), "left"
        )
        hit = (
            F.bit_get(
                F.coalesce(F.col(f"_bb{j}"), F.lit(0)).cast("long"),
                (pos % 64).cast("int"),
            )
            == 1
        )
        member = hit if member is None else (member & hit)
    pruned = pruned.where(member).drop(
        *[c for j in range(4) for c in (f"_bw{j}", f"_bb{j}")]
    )
    return pruned.join(build, pruned[probe_key] == build[build_key])
