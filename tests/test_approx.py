"""The approximate-aggregate opt-in path (SCALE.md): exact distinct is
kept for oracle parity; approx_count_distinct is the documented escape
hatch when the exact-distinct expand+shuffle dominates at scale. This
pins its accuracy envelope on the testdata so the trade is a measured
one."""

from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.plans.testdata_model import load_table, normalized_events

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_5pct_of_exact(spark):
    ev = normalized_events(spark, SF).filter(F.col("event_type") == "transaction")
    row = ev.agg(
        F.countDistinct("wallet").alias("exact"),
        F.approx_count_distinct("wallet", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_approx_percentile_brackets_exact(spark):
    orders = load_table(spark, SF, "orders")
    row = orders.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.02


def test_hll_rollup_merge_is_lossless_and_accurate(spark):
    """Merging daily sketches must give the same estimate as sketching
    the raw rows (HLL merge is lossless), and land within 5% of exact."""
    from pyspark.sql import functions as F

    from solana_data_etl_pipeline_spark.operators.sketches import (
        daily_user_sketches,
        merge_user_sketches,
        user_sketch_rollup,
    )

    ev = spark.range(0, 20_000).select(
        F.col("id").alias("event_id"),
        (F.lit("2024-01-01").cast("timestamp") + (F.col("id") % 10) * F.expr("INTERVAL 1 DAY")).alias("ts"),
        (F.col("id") % 3777).alias("user_id"),
    )
    exact = ev.select("user_id").distinct().count()

    merged = merge_user_sketches(daily_user_sketches(ev)).first().est_users
    rollup = {r.grain: r for r in user_sketch_rollup(ev).collect() if r.grain == "total"}
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col("user_id"))).alias("e")
    ).first().e

    assert merged == direct == rollup["total"].est_users  # lossless merge
    assert abs(merged - exact) / exact < 0.05

    # per-day estimates also accurate
    days = [r for r in user_sketch_rollup(ev).collect() if r.grain == "day"]
    assert len(days) == 10
    per_day_exact = {
        r.day: r.n for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count_distinct("user_id").alias("n")).collect()
    }
    for r in days:
        assert abs(r.est_users - per_day_exact[r.day]) / per_day_exact[r.day] < 0.05


def test_cms_never_underestimates_and_is_exact_when_uncollided(spark):
    """Count-Min structural invariants on a hand-sized corpus: the
    estimate never drops below the exact count (every occurrence
    lands in its own cells), equals it when no collision exists at
    the given width, and genuinely collides (over_bp > 0 somewhere)
    when the width is squeezed far below the vocabulary."""
    from solana_data_etl_pipeline_spark.operators.sketches import cms_heavy_hitters

    rows = []
    for i in range(60):
        toks = " ".join(f"tok{j}" for j in range(i % 7 + 3))
        rows.append((i, f"common common {toks}", "en", "s", 30))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    wide = cms_heavy_hitters(docs, k=10, width=4096).collect()
    assert all(r.cms_count >= r.exact_count for r in wide)
    assert all(r.over_bp >= 0 for r in wide)
    # 10 distinct tokens in 4096 cells x 4 rows: no collisions expected
    assert all(r.cms_count == r.exact_count for r in wide)
    assert wide[0].token == "common" and wide[0].exact_count == 120
    narrow = cms_heavy_hitters(docs, k=10, width=4).collect()
    assert all(r.cms_count >= r.exact_count for r in narrow)
    assert any(r.over_bp > 0 for r in narrow)  # width 4 must collide


def test_cms_merge_is_lossless(spark):
    """Merging per-slice sketches equals sketching the concatenated
    stream cell-for-cell -- the property that lets a 100 TB corpus
    materialize one bounded sketch per partition/day and answer any
    window by addition."""
    from solana_data_etl_pipeline_spark.operators.sketches import cms_merge, cms_sketch

    a = spark.createDataFrame(
        [(1, "x x y", "en", "s", 5), (2, "y z", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    b = spark.createDataFrame(
        [(3, "z z q", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    merged = {(r.rw, r.cell): r.c for r in cms_merge(cms_sketch(a), cms_sketch(b)).collect()}
    whole = {(r.rw, r.cell): r.c for r in cms_sketch(a.unionByName(b)).collect()}
    assert merged == whole
