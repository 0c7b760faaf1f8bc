"""Mergeable HLL sketch rollups (Apache DataSketches via the built-in
``hll_sketch_agg`` family, JVM-side).

The reference computes exact ``COUNT(DISTINCT wallet)`` per window by
rescanning the warehouse (reference src/analytics.rs:577-599). At
100 TB the scale-correct pattern is to materialize a *sketch* per
fine-grained partition (day) once, then answer any coarser window
(week / month / all-time) by merging sketches -- merge is lossless
for HLL, so the rollup estimate is identical to sketching the raw
rows, without ever rescanning them.

These cannot be DuckDB-oracled (sketch binaries are engine-specific),
so the suite registers the rollup as a rows-only query; the accuracy
and merge-consistency contracts are pinned in tests/test_approx.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def daily_user_sketches(events: DataFrame) -> DataFrame:
    """One HLL sketch of user_id per day -- the materialized building
    block. Single partial+final agg; the shuffle carries one sketch
    (~KBs) per (partition, day), not user rows."""
    return events.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg(F.col("user_id")).alias("user_sketch"),
        F.count("*").alias("events"),
    )


def merge_user_sketches(daily: DataFrame) -> DataFrame:
    """Coarse rollup from the materialized daily sketches: one merged
    estimate, never touching the raw events again."""
    return daily.agg(F.hll_union_agg("user_sketch").alias("merged")).select(
        F.hll_sketch_estimate("merged").alias("est_users")
    )


def user_exact_rollup(events: DataFrame) -> DataFrame:
    """Exact COUNT(DISTINCT) twin of :func:`user_sketch_rollup` --
    identical ROLLUP grouping sets (Expand + distinct agg) with exact
    counts instead of HLL estimates, so the grouping-set *shape* is
    fully DuckDB-oracle-able while the sketch variant stays rows-only.
    At 100 TB you run the sketch version; this is the correctness
    anchor that pins the plan the two share."""
    return (
        events.rollup(F.to_date("ts").alias("day"))
        .agg(F.count_distinct(F.col("user_id")).alias("n_users"))
        .select(
            F.when(F.col("day").isNull(), F.lit("total")).otherwise(F.lit("day")).alias("grain"),
            "day",
            "n_users",
        )
    )


def user_sketch_rollup(events: DataFrame) -> DataFrame:
    """Per-day + grand-total distinct-user estimates in ONE scan via
    ROLLUP grouping sets (Expand + single partial+final agg) -- the
    day rows are what you would materialize; the total row demonstrates
    the coarser grain from the same pass."""
    return (
        events.rollup(F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg(F.col("user_id"))).alias("est_users"))
        .select(
            F.when(F.col("day").isNull(), F.lit("total")).otherwise(F.lit("day")).alias("grain"),
            "day",
            "est_users",
        )
    )


#: Count-Min geometry: depth independent hash rows x width cells.
#: The sketch is depth*width counters REGARDLESS of vocabulary size
#: -- the whole point at corpus scale.
CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_heavy_hitters(
    df: DataFrame,
    k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    text_col: str = "text",
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over the token
    stream, evaluated on the exact top-k heavy hitters: for each of
    the k most frequent tokens, the exact count, the CMS estimate
    (min over depth rows of the hashed cell's counter), and the
    overestimate in integer basis points. CMS NEVER underestimates
    (every occurrence of a token lands in its own cells), so
    over_bp >= 0 is a structural invariant; the overestimate is the
    hash-collision mass the width dial controls.

    Why this exists next to the exact vocab count: at 100 TB the
    vocabulary-keyed aggregation behind vocab_top_words shuffles one
    row per (partition, token) -- vocabulary-sized. The sketch
    aggregation shuffles AT MOST depth*width counter cells (here
    1024) no matter how large the vocabulary grows, and sketches
    merge losslessly across partitions/days exactly like the HLL
    rollup above. Unlike HLL's engine-specific binaries, every number
    here is deterministic md5 integer arithmetic -- fully
    DuckDB-oracle-able.

    Scale shape: ONE token explode fans out to depth (row, cell)
    pairs whose groupBy map-side-combines down to <= depth*width
    rows; the exact top-k side is vocab_top_words' s counting agg +
    TakeOrderedAndProject (the correctness anchor, same stance as
    user_exact_rollup vs the HLL rollup); the estimate join
    broadcasts the bounded sketch."""
    from solana_data_etl_pipeline_spark.operators.text import vocab_top_words

    sketch = cms_sketch(df, depth=depth, width=width, text_col=text_col)
    cand = vocab_top_words(df, top_n=k).select(
        "token", F.col("freq").alias("exact_count")
    )
    cand_cells = cand.select(
        "token", "exact_count", F.explode(_cms_cells(F.col("token"), depth, width)).alias("s")
    ).select("token", "exact_count", "s.rw", "s.cell")
    est = (
        cand_cells.join(F.broadcast(sketch), ["rw", "cell"])
        .groupBy("token", "exact_count")
        .agg(F.min("c").alias("cms_count"))
    )
    return est.select(
        "token",
        "exact_count",
        "cms_count",
        F.expr("(cms_count - exact_count) * 10000 div exact_count")
        .cast("long")
        .alias("over_bp"),
    ).orderBy(F.desc("exact_count"), F.asc("token"))


def cms_sketch(
    df: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    text_col: str = "text",
) -> DataFrame:
    """The raw Count-Min sketch frame (rw, cell, c) for a corpus slice
    -- the mergeable building block behind cms_heavy_hitters, exposed
    so partitions/days/batches can each materialize their own bounded
    sketch once and any coarser window merges them (cms_merge) without
    rescanning rows: the CMS analog of daily_user_sketches. Merge is
    LOSSLESS -- counters are additive -- so estimates from a merged
    sketch are identical to sketching the concatenated stream (pinned
    by test)."""
    from solana_data_etl_pipeline_spark.operators.text import tokens_col

    def _ne(t):
        return t != F.lit("")

    tok = df.select(F.explode(F.filter(tokens_col(text_col), _ne)).alias("token"))
    cells = tok.select(
        F.explode(_cms_cells(F.col("token"), depth, width)).alias("s")
    ).select("s.rw", "s.cell")
    return cells.groupBy("rw", "cell").agg(F.count(F.lit(1)).cast("long").alias("c"))


def _cms_cells(token_col, depth: int, width: int):
    """The depth (rw, cell) pairs of one token -- the single source of
    the salted-hash cell derivation shared by the sketch builder and
    the heavy-hitter estimate side (drift here would silently zero
    the estimates)."""
    from solana_data_etl_pipeline_spark.operators.dedup import _hash64

    return F.array(
        *[
            F.struct(
                F.lit(i).alias("rw"),
                F.pmod(
                    _hash64(F.concat(F.lit(f"cms{i}|"), token_col)), F.lit(width)
                )
                .cast("int")
                .alias("cell"),
            )
            for i in range(depth)
        ]
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge Count-Min sketches by cell-wise counter addition -- the
    lossless rollup (union the bounded frames, one <= depth*width
    aggregation)."""
    if not sketches:
        raise ValueError("cms_merge: need at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("rw", "cell").agg(F.sum("c").cast("long").alias("c"))
