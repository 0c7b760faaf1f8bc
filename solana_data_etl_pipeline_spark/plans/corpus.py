"""Composed training-corpus selection: the end-to-end document
filtering pipeline an LLM-data run actually executes, as ONE
declarative plan -- quality gates, language ID, exact-dedup keepers,
and consistent hash sampling composed so Catalyst fuses the per-doc
scoring into a single scan pass.

Scale shape: three narrow per-doc scoring branches share the scan; the
only shuffle is the dedup-keeper aggregation (uniform md5 keys); the
sample is a pure filter. Selection criteria are deliberately simple
constants so the oracle mirrors them verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.operators import dedup as D
from solana_data_etl_pipeline_spark.operators import text as X
from solana_data_etl_pipeline_spark.plans.testdata_model import load_table

MIN_TOKENS = 10
MIN_ALPHA_RATIO = 0.5
SAMPLE_PCT = 50


def corpus_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selected training documents: quality-gated, language-labeled,
    exact-dedup-kept, consistently sampled."""
    docs = load_table(spark, sf_dir, "documents")
    quality = X.quality_scores(docs).select("doc_id", "n_tokens", "alpha_ratio")
    lang = X.language_id(docs).select("doc_id", "predicted_lang")
    keepers = D.exact_duplicates(docs).select(F.col("keep_doc_id").alias("doc_id"))
    selected = (
        docs.select("doc_id", "source")
        .join(quality, "doc_id")
        .join(lang, "doc_id")
        .join(keepers, "doc_id")  # semi-join shape: keepers has unique doc_id
        .filter((F.col("n_tokens") >= MIN_TOKENS) & (F.col("alpha_ratio") >= MIN_ALPHA_RATIO))
    )
    return X.consistent_sample(selected, pct=SAMPLE_PCT).select(
        "doc_id", "source", "predicted_lang", "n_tokens"
    )


# corpus_curation knobs: the near-dup parameters MUST equal the
# registered dedup suite's (threshold 0.2, bucket cap 50) so the
# oracle reuses the clusters pipeline's pair/CC CTEs verbatim.
VAL_PCT = 20
NEAR_DUP_THRESHOLD = 0.2
TAU = 0.5
TARGET_FRAC = 0.8
TOKEN_BUDGET = 10_000


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL training-data assembly, end to end, as one composed
    declarative plan -- what a production curation run executes before
    sharding: quality gates -> exact-dedup keepers -> leakage-free
    train/val split (cluster-level near-dup decontamination) ->
    temperature-scaled source rebalancing over the surviving TRAIN
    docs -> token-budget selection of the best-scored docs that fit
    the training budget. Returns the curated train set (doc_id,
    source, n_tokens, alpha_ratio, rate_bp).

    Stage order is the standard one and it matters: dedup/decontam
    run on the raw corpus (drop rules must see every twin), the mix
    rates are computed over the POST-gate/dedup/split population
    (rebalancing what actually remains), and the budget threshold is
    computed LAST over the mixed candidate set (the budget buys the
    final corpus, not the pre-mix one).

    Scale shape: every stage is the registered operator's plan --
    per-doc scoring fuses into the scan, the only corpus-keyed
    shuffles are the exact-dedup window and the LSH band join, and
    the split/mix/budget machinery all reduces to pairs-sized or
    scalar broadcasts against un-shuffled projections."""
    from solana_data_etl_pipeline_spark.plans.suite import DEDUP_MAX_BUCKET

    docs = load_table(spark, sf_dir, "documents")
    quality = X.quality_scores(docs).select("doc_id", "n_tokens", "alpha_ratio")
    keepers = D.exact_duplicates(docs).select(F.col("keep_doc_id").alias("doc_id"))
    split = D.leakage_free_split(
        docs,
        val_pct=VAL_PCT,
        threshold=NEAR_DUP_THRESHOLD,
        max_bucket=DEDUP_MAX_BUCKET,
        on_low_coverage="warn",
    )
    train = (
        docs.select("doc_id", "source")
        .join(quality, "doc_id")
        .join(keepers, "doc_id")
        .join(split.filter(F.col("split") == "train").select("doc_id"), "doc_id")
        .filter((F.col("n_tokens") >= MIN_TOKENS) & (F.col("alpha_ratio") >= MIN_ALPHA_RATIO))
        # the expensive gate/dedup/split prefix feeds FOUR consumers
        # (mix rates, mix join-back, budget histogram, budget filter):
        # lazily checkpoint it so it computes once -- the idiom
        # v3/v4/curation_funnel already use (r13, guide §2.4: the
        # un-checkpointed form re-executed the post-exchange join
        # chain per consumer; only the shuffle stages below it were
        # AQE-reused)
        .localCheckpoint(eager=False)
    )
    mixed = X.temperature_mix(train, tau=TAU, target_frac=TARGET_FRAC)
    return X.token_budget_select(
        mixed, budget=TOKEN_BUDGET, score_col="alpha_ratio", weight_col="n_tokens"
    ).select("doc_id", "source", "n_tokens", "alpha_ratio", "rate_bp")


# corpus_curation_v2 swaps the simple MIN_TOKENS/alpha constants for
# the PUBLISHED gate operators a production curation run uses: C4
# page/line cleaning (Raffel et al. 2020 §2.2) and the full Gopher
# rule set (Rae et al. 2021 §A1.1). Budget is tighter than v1 so the
# threshold stage is exercised (non-vacuous) on the test corpora.
V2_TOKEN_BUDGET = 5_000


def corpus_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_curation with the published quality gates threaded in as
    the pipeline's gate stages: C4 cleaning (page-blocklist drop +
    line-keeping signals) and the Gopher rule conjunction replace the
    v1 MIN_TOKENS/alpha-ratio constants; downstream the composition is
    unchanged -- exact-dedup keepers -> cluster-level leakage-free
    train/val split -> temperature mix -> token-budget selection, with
    the budget stage weighted by Gopher's n_words and scored by the
    CONTINUOUS char-level alpha_ratio (Gopher's word-level
    alpha_word_frac is a gate signal, not a scorer: on all-alphabetic
    corpora it is identically 1.0, which degenerates the budget
    histogram to a single level). Returns (doc_id, source, n_words,
    alpha_ratio, kept_lines, rate_bp).

    Dedup and the decontamination split deliberately see the RAW text,
    not C4's clean_text: drop rules must see every twin, and cleaning
    can make two near-twins differ -- raw-text decontamination is the
    conservative direction. C4's kept_lines rides along in the output
    so the line-cleaning computation is hash-verified even on corpora
    whose documents carry no line structure (the synthetic tables:
    zero newlines, so kept_lines is 0 and the page gate does the
    filtering there).

    Scale shape: both gate operators are ZERO-shuffle per-doc
    projections (bound token/line arrays, fused into the corpus scan),
    so v2 adds no exchange over v1 -- the corpus-keyed shuffles remain
    the exact-dedup window and the LSH band join, and mix/budget still
    reduce to broadcast-sized frames."""
    from solana_data_etl_pipeline_spark.plans.suite import DEDUP_MAX_BUCKET

    docs = load_table(spark, sf_dir, "documents")
    # one-scan fused gate signals (c4 + gopher + alpha_ratio): the
    # three standalone operators are per-row projections of the SAME
    # scan, so joining them would pay three corpus-keyed joins for
    # zero information -- curation_gates is pinned column-identical
    # to that composition by test
    gates = X.curation_gates(docs)
    keepers = D.exact_duplicates(docs).select(F.col("keep_doc_id").alias("doc_id"))
    split = D.leakage_free_split(
        docs,
        val_pct=VAL_PCT,
        threshold=NEAR_DUP_THRESHOLD,
        max_bucket=DEDUP_MAX_BUCKET,
        on_low_coverage="warn",
    )
    train = (
        docs.select("doc_id", "source")
        .join(gates, "doc_id")
        .join(keepers, "doc_id")  # semi-join shape: keepers has unique doc_id
        .join(split.filter(F.col("split") == "train").select("doc_id"), "doc_id")
        .filter(~F.col("page_filtered") & F.col("gopher_pass"))
        .select("doc_id", "source", "n_words", "alpha_ratio", "kept_lines")
        # four downstream consumers -- same lazy checkpoint as v1/v3/v4
        .localCheckpoint(eager=False)
    )
    mixed = X.temperature_mix(train, tau=TAU, target_frac=TARGET_FRAC)
    return X.token_budget_select(
        mixed, budget=V2_TOKEN_BUDGET, score_col="alpha_ratio", weight_col="n_words"
    ).select("doc_id", "source", "n_words", "alpha_ratio", "kept_lines", "rate_bp")


# corpus_curation_v3 swaps the rate-only temperature mix + global
# budget threshold for the ALLOCATION-CONSTRAINED planners: the
# waterfilled per-source budget (and, when the budget exceeds the
# corpus, data-constrained epoch repetition) decides how many tokens
# each source contributes, and the per-doc selection spends exactly
# that allocation. Budget sized so the sf corpora exercise both
# saturation and lambda-allocation.
V3_TOKEN_BUDGET = 7_000


def corpus_curation_v3(
    spark: SparkSession, sf_dir: str, budget: int = V3_TOKEN_BUDGET
) -> DataFrame:
    """corpus_curation_v2's gate/dedup/decontamination prefix with the
    mix stage replaced by the ACHIEVABLE-allocation planners -- the
    pipeline a data-constrained run (Muennighoff et al. 2023) would
    execute. Per-source token capacities come from the surviving
    train set; target weights are tau=0.5 temperature weights
    (w_s = floor(sqrt(capacity)), engine-exact: sqrt is correctly
    rounded IEEE and floor is exact); then:

    - budget <= total capacity: `mixture_waterfill` allocates
      a_s = min(cap_s, lambda * w_s) -- saturated sources give
      everything, the rest split the remainder by weight;
    - budget  > total capacity: `epoch_plan` repeats sources at
      decaying value, so tokens_served can exceed capacity and
      epochs_bp records the repetition plan.

    The branch is a scalar comparison folded into the plan (both
    allocators run on the bounded source frame; the unused one costs
    a sources-sized aggregation). Per-doc selection spends each
    source's single-pass allocation min(tokens_served, capacity)
    greedily by (alpha_ratio desc, doc_id) under a per-source
    cumulative window. Returns (doc_id, source, n_words, alpha_ratio,
    kept_lines, src_alloc, epochs_bp).

    Scale shape: identical corpus-keyed work to v2 (the dedup window
    + the LSH band join); both planners and the branch scalar are
    SOURCES-sized frames broadcast back; the selection window
    partitions by source (the hot-source caveat and its histogram
    fallback are source_quota_sample's, documented there)."""
    from solana_data_etl_pipeline_spark.plans.suite import DEDUP_MAX_BUCKET

    docs = load_table(spark, sf_dir, "documents")
    gates = X.curation_gates(docs)
    keepers = D.exact_duplicates(docs).select(F.col("keep_doc_id").alias("doc_id"))
    split = D.leakage_free_split(
        docs,
        val_pct=VAL_PCT,
        threshold=NEAR_DUP_THRESHOLD,
        max_bucket=DEDUP_MAX_BUCKET,
        on_low_coverage="warn",
    )
    train = (
        docs.select("doc_id", "source")
        .join(gates, "doc_id")
        .join(keepers, "doc_id")
        .join(split.filter(F.col("split") == "train").select("doc_id"), "doc_id")
        .filter(~F.col("page_filtered") & F.col("gopher_pass"))
        .select("doc_id", "source", "n_words", "alpha_ratio", "kept_lines")
        .localCheckpoint(eager=False)  # feeds capacities AND selection
    )
    return _allocation_select(train, budget, carry=["kept_lines"])


def _allocation_select(train: DataFrame, budget: int, carry: list[str]) -> DataFrame:
    """The allocation-constrained planner + per-doc selection stages
    shared by corpus_curation_v3/v4 (docstrings there): per-source
    capacities and tau=0.5 weights from `train`, the
    waterfill-vs-epoch branch folded in as a scalar comparison, and
    the greedy per-source cumulative-window spend. `train` must carry
    (doc_id, source, n_words, alpha_ratio) plus the `carry` columns
    passed through to the output. All planner frames are
    SOURCES-sized broadcasts; the selection window partitions by
    source."""
    caps = (
        train.groupBy("source")
        .agg(F.sum("n_words").cast("long").alias("capacity"))
        .withColumn(
            "weight",
            F.greatest(
                F.floor(F.sqrt(F.col("capacity").cast("double"))), F.lit(1)
            ).cast("long"),
        )
    )
    wf = X.mixture_waterfill(caps, budget=budget).select("source", "alloc")
    ep = X.epoch_plan(caps, budget=budget).select("source", "tokens_served")
    totc = caps.agg(F.sum("capacity").cast("double").alias("_tc"))
    served = (
        caps.select("source", "capacity")
        .join(wf, "source")
        .join(ep.withColumnRenamed("tokens_served", "_ep"), "source")
        .crossJoin(F.broadcast(totc))
        .select(
            "source",
            "capacity",
            F.when(F.lit(float(budget)) > F.col("_tc"), F.col("_ep"))
            .otherwise(F.col("alloc"))
            .cast("long")
            .alias("src_alloc"),
        )
    )
    wsel = (
        Window.partitionBy("source")
        .orderBy(F.col("alpha_ratio").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        train.join(F.broadcast(served), "source")
        .withColumn("_cum", F.sum("n_words").over(wsel))
        .filter(F.col("_cum") <= F.least(F.col("src_alloc"), F.col("capacity")))
        .select(
            "doc_id",
            "source",
            "n_words",
            "alpha_ratio",
            *carry,
            "src_alloc",
            F.floor(F.col("src_alloc") * 10000 / F.col("capacity"))
            .cast("long")
            .alias("epochs_bp"),
        )
    )


# corpus_curation_v4 threads the MEDIA column through the pipeline:
# every surviving document's binary payload is decoded by the REAL
# stdlib codec and gated on the DECODED features -- the multimodal
# analog of the Gopher text gates (duration bounds + a near-silence
# floor). Thresholds sit inside the measured synthetic-corpus
# distribution (frames p10~105, max ~558; rms p10~43.9, p50~44.9) so
# both bounds are exercised non-vacuously at every test sf.
V4_MEDIA_MIN_FRAMES = 80
V4_MEDIA_MAX_FRAMES = 520
V4_MEDIA_MIN_RMS = 44.0


def corpus_curation_v4(
    spark: SparkSession, sf_dir: str, budget: int = V3_TOKEN_BUDGET
) -> DataFrame:
    """corpus_curation_v3 with media as a FIRST-CLASS corpus column:
    each gated document's audio payload (synth_wav -- a genuine
    RIFF/WAV container standing in for reading real recordings;
    reference analog: the schema-on-read payload drill-down,
    /root/reference/docs/SCHEMA.md:373-380) is decoded through the
    real stdlib wave codec and the pipeline gates on the DECODED
    features: duration within [V4_MEDIA_MIN_FRAMES,
    V4_MEDIA_MAX_FRAMES] frames and RMS amplitude >= V4_MEDIA_MIN_RMS
    (the near-silence floor) -- the multimodal analog of the Gopher
    gate conjunction. The decoded features ride into the output
    (media_frames, media_rms) so the codec round-trip itself is
    hash-verified, not just the filter. Downstream, the
    allocation-constrained planners run unchanged over the
    media-gated train set.

    Stage order: the codec is the most expensive per-doc stage (an
    Arrow-batched mapInPandas pass), so it runs on the
    text-gate/dedup/split SURVIVORS only -- decode cost scales with
    what the cheap zero-shuffle gates admit, not with the raw corpus.
    Dedup/decontamination still see every raw twin (they run before
    and independently of the media gate, which is per-doc
    deterministic, so the order cannot change its verdicts).

    Scale shape: v3's corpus-keyed work (the dedup window + the LSH
    band join) plus ONE map-side encode/decode pass over the gated
    population (behind ensure_parallelism -- the single-split
    lesson); the payload bytes are born and die map-side, never
    shuffling; planner stages stay sources-sized broadcasts."""
    from solana_data_etl_pipeline_spark.operators import multimodal as M
    from solana_data_etl_pipeline_spark.plans.suite import DEDUP_MAX_BUCKET

    docs = load_table(spark, sf_dir, "documents")
    gates = X.curation_gates(docs)
    keepers = D.exact_duplicates(docs).select(F.col("keep_doc_id").alias("doc_id"))
    split = D.leakage_free_split(
        docs,
        val_pct=VAL_PCT,
        threshold=NEAR_DUP_THRESHOLD,
        max_bucket=DEDUP_MAX_BUCKET,
        on_low_coverage="warn",
    )
    gated = (
        docs.select("doc_id", "source", "text")
        .join(gates, "doc_id")
        .join(keepers, "doc_id")
        .join(split.filter(F.col("split") == "train").select("doc_id"), "doc_id")
        .filter(~F.col("page_filtered") & F.col("gopher_pass"))
        .select("doc_id", "source", "text", "n_words", "alpha_ratio", "kept_lines")
    )
    # fused synth+decode kernel (r14): identical codec sequence to
    # wav_stats(synth_wav(...)), but the payload bytes never cross the
    # Arrow boundary between the two stages
    mstats = M.synth_wav_stats(gated.select("doc_id", "text")).select(
        F.col("media_id").alias("doc_id"),
        F.col("n_frames").alias("media_frames"),
        F.round("rms", 4).alias("media_rms"),
    )
    train = (
        gated.drop("text")
        .join(mstats, "doc_id")
        .filter(
            F.col("media_frames").between(V4_MEDIA_MIN_FRAMES, V4_MEDIA_MAX_FRAMES)
            & (F.col("media_rms") >= V4_MEDIA_MIN_RMS)
        )
        .localCheckpoint(eager=False)  # feeds capacities AND selection
    )
    return _allocation_select(
        train, budget, carry=["kept_lines", "media_frames", "media_rms"]
    )


def allocation_report(
    spark: SparkSession, sf_dir: str, budget: int = V3_TOKEN_BUDGET
) -> DataFrame:
    """Per-source planned-vs-realized mixture manifest over the v3
    pipeline -- the table a data-constrained run publishes next to its
    corpus (the funnel answers "where did documents die?"; this
    answers "did each source deliver its planned token share?"):
    for every source surviving the v3 selection, its train capacity,
    the planner's allocation (waterfill or epoch-extended), the
    realized token mass actually selected, the realized document
    count, and utilization_bp = floor(realized * 10000 / alloc). The
    greedy whole-document selection can only UNDERSHOOT its
    allocation (a doc that would cross the cumulative cap is dropped
    whole), so utilization_bp <= 10000 and the gap is the
    quantization loss the seq-packing stage later reclaims.

    Scale shape: one bounded (sources-sized) aggregation over the v3
    output plan -- every scale property is corpus_curation_v3's; the
    report adds a single map-side-combined groupBy."""
    sel = corpus_curation_v3(spark, sf_dir, budget=budget)
    return (
        sel.groupBy("source", "src_alloc", "epochs_bp")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("realized_tokens"),
        )
        .select(
            "source",
            "src_alloc",
            "epochs_bp",
            "n_docs",
            "realized_tokens",
            F.floor(F.col("realized_tokens") * 10000 / F.col("src_alloc"))
            .cast("long")
            .alias("utilization_bp"),
        )
    )


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage attrition report over the v2 curation pipeline -- the
    funnel every production curation run publishes next to its output
    corpus (how many documents and tokens die at each gate is the
    first thing a data lead reads): raw -> published gates (C4 page +
    Gopher conjunction) -> exact-dedup keepers -> cluster-level
    decontaminated train split -> temperature mix -> token budget.
    Returns one row per stage: (stage_id, stage, docs, tokens), where
    tokens is the Gopher n_words surviving AT that stage -- the unit
    the budget stage spends.

    Scale shape: each stage row is a scalar aggregation of the
    corresponding v2 prefix (map-side combined; the frames are the
    registered pipeline's own plans); the expensive shared prefix
    (gates + keepers + LSH split = `train`) is lazily checkpointed so
    the three downstream stage rows re-read one narrow frame instead
    of re-running the band-join pipeline each. Consistency with the
    registered pipeline is pinned by test: the budget row's count
    equals corpus_curation_v2's output count."""
    from solana_data_etl_pipeline_spark.plans.suite import DEDUP_MAX_BUCKET

    docs = load_table(spark, sf_dir, "documents")
    gates = X.curation_gates(docs)
    gated = gates.filter(~F.col("page_filtered") & F.col("gopher_pass"))
    keepers = D.exact_duplicates(docs).select(F.col("keep_doc_id").alias("doc_id"))
    deduped = gated.join(keepers, "doc_id")
    split = D.leakage_free_split(
        docs,
        val_pct=VAL_PCT,
        threshold=NEAR_DUP_THRESHOLD,
        max_bucket=DEDUP_MAX_BUCKET,
        on_low_coverage="warn",
    )
    train = (
        docs.select("doc_id", "source")
        .join(deduped, "doc_id")
        .join(split.filter(F.col("split") == "train").select("doc_id"), "doc_id")
        .select("doc_id", "source", "n_words", "alpha_ratio")
        .localCheckpoint(eager=False)
    )
    mixed = X.temperature_mix(train, tau=TAU, target_frac=TARGET_FRAC)
    selected = X.token_budget_select(
        mixed, budget=V2_TOKEN_BUDGET, score_col="alpha_ratio", weight_col="n_words"
    )

    def stage(df: DataFrame, i: int, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.coalesce(F.sum("n_words"), F.lit(0)).cast("long").alias("tokens"),
        ).select(
            F.lit(i).cast("int").alias("stage_id"),
            F.lit(name).alias("stage"),
            "docs",
            "tokens",
        )

    out = stage(gates, 0, "raw")
    for i, (name, df) in enumerate(
        [
            ("gates", gated),
            ("dedup", deduped),
            ("decontaminated", train),
            ("mixed", mixed),
            ("budget", selected),
        ],
        start=1,
    ):
        out = out.unionByName(stage(df, i, name))
    return out


def contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-method decontamination summary over the benchmark slice --
    the one-table answer to "how contaminated is this corpus, and by
    which detector?" a curation run publishes next to its funnel:
    exact n-gram overlap (`benchmark_contamination`) and
    Jaccard-verified MinHash near-dup (`cross_corpus_near_dup`, the
    paraphrase-robust 16x2 decontamination scheme) over the SAME
    corpus/benchmark split, one row per method with the flagged-doc
    count, raw hit mass (overlapping grams / verified pairs), and the
    corpus size the fractions divide by. (The winnowing/containment
    route is the INGEST-time variant -- `delta_containment` probes a
    materialized index per batch and is reported by the streaming
    CLI, not this batch report.)

    Scale shape: both detector plans are the registered ones
    (benchmark side broadcasts, corpus never shuffles); each report
    row is a scalar aggregation, and the corpus count joins on as a
    broadcast literal-sized frame. All statistics are integer counts
    -- fractions are left to the reader so the compare frame stays
    engine-exact."""
    from solana_data_etl_pipeline_spark.plans.suite import _BENCH_SOURCE

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") != _BENCH_SOURCE)
    bench = docs.filter(F.col("source") == _BENCH_SOURCE)
    total = corpus.agg(F.count(F.lit(1)).cast("long").alias("corpus_docs"))
    exact = X.benchmark_contamination(corpus, bench, n=3)
    near = D.cross_corpus_near_dup(corpus, bench, threshold=0.2)
    e = exact.agg(
        F.count(F.lit(1)).cast("long").alias("flagged_docs"),
        F.coalesce(F.sum("n_overlap_grams"), F.lit(0)).cast("long").alias("hits"),
    ).select(F.lit("exact_ngram").alias("method"), "flagged_docs", "hits")
    n = near.agg(
        F.countDistinct("doc_id").cast("long").alias("flagged_docs"),
        F.count(F.lit(1)).cast("long").alias("hits"),
    ).select(F.lit("near_dup").alias("method"), "flagged_docs", "hits")
    return (
        e.unionByName(n)
        .crossJoin(F.broadcast(total))
        .select("method", "flagged_docs", "hits", "corpus_docs")
    )


def quality_gate_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab of the three registered quality signals -- the
    text-quality sibling of dedup_family_agreement: per (gopher_pass,
    c4_pass, perplexity bucket) document count and token mass, from
    EXACTLY the registered operators (gopher_quality's full rule
    conjunction, c4_clean's page gate, the CCNet head/middle/tail
    bucketing of the interpolated LM score). The calibration table
    for stacking gates: a fat (fail, pass, head) cell says the Gopher
    rules reject fluent text the LM likes (over-filtering); a fat
    (pass, pass, tail) cell says rule gates alone admit
    high-perplexity text an LM filter would catch -- the reason CCNet
    and Gopher pipelines layer both.

    Scale shape: three per-doc projections over the same corpus scan
    (the LM score adds its bounded vocab broadcast + per-language
    histogram, see grouped_quantile_buckets), one doc_id equi-join
    chain that AQE plans within the corpus partitioning, and a
    bounded <=12-row rollup."""
    docs = load_table(spark, sf_dir, "documents")
    g = X.gopher_quality(docs).select("doc_id", "gopher_pass", "n_words")
    c = X.c4_clean(docs).select(
        "doc_id", (~F.col("page_filtered")).alias("c4_pass")
    )
    p = X.grouped_quantile_buckets(
        X.interp_logprob(docs, carry_cols=("lang",)),
        "lang",
        "avg_interp_logprob",
    ).select("doc_id", "bucket")
    return (
        g.join(c, "doc_id")
        .join(p, "doc_id")
        .groupBy("gopher_pass", "c4_pass", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_words"),
        )
        .orderBy("gopher_pass", "c4_pass", "bucket")
    )


def corpus_topic_map(
    df: DataFrame,
    top_terms: int = 3,
    text_col: str = "text",
    member: DataFrame | None = None,
) -> DataFrame:
    """Cluster-level corpus TOPIC MAP -- the inspection table of
    cluster-based curation (MiniPile, Kaddour 2023: embed, cluster,
    eyeball clusters, drop the junk ones): the corpus is hash-embedded
    (operators/text.py hash_embed -- the model-free encoder) and
    clustered by the deterministic Lloyd quantizer
    (operators/similarity.py lloyd_cells), then each cluster reports
    its document count, token mass, mean tokens per document (integer
    floor), dominant source, and top ``top_terms`` terms by frequency
    -- one row per (cell, term_rank). A data lead reads this table to
    decide which clusters are boilerplate/spam (low mean_tokens,
    template top-terms) before a cluster-drop gate; the dominant
    source column shows when a cluster is really a source in disguise.

    Scale shape: the Lloyd fit is n_iters bounded-centroid
    aggregations + broadcast assignments (the corpus never shuffles in
    the fit; see lloyd_cells); the single corpus-keyed exchange is the
    doc_id equi-join of the cell assignment onto the token projection,
    checkpointed once and shared by all three rollups. The term
    rollup shuffles (cell, term) counts -- VOCABULARY-sized, sublinear
    in corpus mass; its per-cell top-k window runs over that counted
    frame, never the corpus. Report size is n_cells x top_terms.

    `member` supplies a PRECOMPUTED (doc_id, cell) assignment -- the
    production stance: clustering runs at ingest cadence and is
    shared by every cluster-curation consumer (this map, the prune
    gate), exactly the materialize_ivf amortization; the registered
    entries pass the per-sf cached membership and bench.py times the
    fit separately as `cluster_fit_build`. Default None re-derives it
    inline (result-identical; test-pinned)."""
    from solana_data_etl_pipeline_spark.operators import similarity as V

    if member is None:
        emb = X.hash_embed(df, text_col=text_col)
        member = V.lloyd_cells(emb).select(F.col("vec_id").alias("doc_id"), "cell")
    toks = df.select(
        "doc_id",
        "source",
        F.filter(X.tokens_col(text_col), lambda t: t != "").alias("_tk"),
    )
    # one corpus-keyed join, three consumers: checkpoint the joined
    # frame so stats/source/term rollups re-read one narrow relation
    # instead of re-deriving the Lloyd fit per branch
    base = toks.join(member, "doc_id").localCheckpoint(eager=False)
    stats = (
        base.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size("_tk")).cast("long").alias("total_tokens"),
        )
        .withColumn(
            "mean_tokens", F.expr("total_tokens div n_docs").cast("long")
        )
    )
    wsrc = Window.partitionBy("cell").orderBy(F.col("_c").desc(), F.col("source"))
    top_src = (
        base.groupBy("cell", "source")
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn("_r", F.row_number().over(wsrc))
        .filter(F.col("_r") == 1)
        .select("cell", F.col("source").alias("top_source"))
    )
    wterm = Window.partitionBy("cell").orderBy(F.col("term_count").desc(), F.col("term"))
    top = (
        base.select("cell", F.explode("_tk").alias("term"))
        .groupBy("cell", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("term_count"))
        .withColumn("term_rank", F.row_number().over(wterm))
        .filter(F.col("term_rank") <= top_terms)
    )
    # the three rollup outputs are cells-/report-sized -- broadcast
    # them so the final assembly never sort-merges
    return (
        stats.join(F.broadcast(top_src), "cell")
        .join(F.broadcast(top), "cell")
        .select(
            "cell",
            "n_docs",
            "total_tokens",
            "mean_tokens",
            "top_source",
            F.col("term_rank").cast("int").alias("term_rank"),
            "term",
            "term_count",
        )
        .orderBy("cell", "term_rank")
    )


#: cluster-prune bar: clusters whose mean document length (whitespace
#: tokens, integer floor) sits below this are template/boilerplate
#: populations on the synthetic corpus (measured bimodal: short
#: clusters 20-43, content clusters 47-64 at every SF)
MIN_CLUSTER_MEAN_TOKENS = 45


def cluster_prune_keepers(
    df: DataFrame,
    min_mean_tokens: int = MIN_CLUSTER_MEAN_TOKENS,
    text_col: str = "text",
    member: DataFrame | None = None,
) -> DataFrame:
    """The ACTING form of corpus_topic_map -- MiniPile's pruning step
    (Kaddour 2023: cluster the embedded corpus, judge clusters, drop
    the junk ones WHOLE): documents keep their hash_embed ->
    lloyd_cells cluster assignment, each cluster's mean document
    length (integer floor of one token-mass division) is the
    cluster-quality proxy, and every document in a cluster below
    ``min_mean_tokens`` is dropped -- template/boilerplate
    populations die as a population, including their individually
    long members that a per-document length gate would keep. Returns
    (doc_id, cell, cluster_mean_tokens) for the survivors so the
    gate's reasoning stays auditable; semi-join on doc_id for the
    pruned corpus.

    Scale shape: identical to corpus_topic_map's fit (bounded Lloyd
    aggregations, corpus never shuffles) plus ONE cells-sized stats
    rollup broadcast back onto the membership -- the gate adds no
    corpus-keyed exchange beyond the shared doc_id join. `member`
    supplies the precomputed ingest-time assignment shared with
    corpus_topic_map (see there); default None re-derives inline."""
    from solana_data_etl_pipeline_spark.operators import similarity as V

    if member is None:
        emb = X.hash_embed(df, text_col=text_col)
        member = V.lloyd_cells(emb).select(F.col("vec_id").alias("doc_id"), "cell")
    toks = df.select(
        "doc_id",
        F.size(F.filter(X.tokens_col(text_col), lambda t: t != "")).cast("long").alias("_nt"),
    )
    base = toks.join(member, "doc_id").localCheckpoint(eager=False)
    stats = (
        base.groupBy("cell")
        .agg(
            F.sum("_nt").cast("long").alias("_tot"),
            F.count(F.lit(1)).cast("long").alias("_n"),
        )
        .select(
            "cell",
            F.expr("_tot div _n").cast("long").alias("cluster_mean_tokens"),
        )
        .filter(F.col("cluster_mean_tokens") >= min_mean_tokens)
    )
    # no global sort: the keepers frame is corpus-sized and every
    # consumer is a semi-join or the order-insensitive oracle compare
    return base.join(F.broadcast(stats), "cell").select(
        "doc_id", "cell", "cluster_mean_tokens"
    )


def source_scorecard(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-SOURCE quality scorecard -- the data-acquisition decision
    table a corpus team reads before renewing/weighting a source
    (the per-source analog of corpus_card, and the table the
    source-level weighting in temperature/waterfill/UniMax planning
    is chosen FROM): for every source, document count, Gopher token
    mass, and the pass/incident rates of the registered quality
    signals in integer basis points -- Gopher rule conjunction, C4
    page gate, PII any-hit rate, and the exact-duplicate rate
    (documents whose normalized content hash appears more than once
    corpus-wide, dedup_exact's normalization).

    Scale shape: three zero-shuffle per-doc projections over one
    corpus scan (gopher/c4/pii), one hash-window pass for the dup
    flag (count window over the content hash -- reuses that
    shuffle's partitioning, the cap-stats idiom), a doc_id equi-join
    chain AQE plans within the corpus partitioning, and a bounded
    sources-sized rollup. All rates are integer-div basis points."""
    g = X.gopher_quality(df, text_col=text_col).select(
        "doc_id", "n_words", "gopher_pass"
    )
    c = X.c4_clean(df, text_col=text_col).select(
        "doc_id", (~F.col("page_filtered")).alias("c4_pass")
    )
    p = X.pii_scan(df, text_col=text_col).select("doc_id", "has_pii")
    hash_w = Window.partitionBy(F.md5(D.normalized_text(text_col)))
    base = df.select(
        "doc_id",
        "source",
        (F.count(F.lit(1)).over(hash_w) > 1).alias("is_dup"),
    )
    joined = base.join(g, "doc_id").join(c, "doc_id").join(p, "doc_id")
    agg = joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum(F.col("gopher_pass").cast("long")).alias("_g"),
        F.sum(F.col("c4_pass").cast("long")).alias("_c"),
        F.sum(F.col("has_pii").cast("long")).alias("_p"),
        F.sum(F.col("is_dup").cast("long")).alias("_d"),
    )
    return agg.select(
        "source",
        "n_docs",
        "total_words",
        F.expr("_g * 10000 div n_docs").cast("long").alias("gopher_pass_bp"),
        F.expr("_c * 10000 div n_docs").cast("long").alias("c4_pass_bp"),
        F.expr("_p * 10000 div n_docs").cast("long").alias("pii_bp"),
        F.expr("_d * 10000 div n_docs").cast("long").alias("exact_dup_bp"),
    ).orderBy("source")
