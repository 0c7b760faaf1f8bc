"""Two-point scaling curve: generate a 10x replica of the sf0.1
documents/embeddings tables and time the heavy-hitter queries at both
scales, so the linearity claims in SCALE.md get a data point beyond
the fixed-cost-dominated sf0.01 -> sf0.1 check.

Replication protocol (deterministic, content-disjoint):
- documents: 10 replicas; replica 0 is the original; replica i>0 gets
  fresh doc_ids (doc_id + i*stride) and every TOKEN suffixed "_ri",
  so replicas share no word n-grams -- no cross-replica near-dup or
  shared-gram pairs. The pair/cluster structure of the original corpus
  is therefore replicated exactly 10x: workload density per row is
  unchanged and "10x data" means 10x, not a denser different dataset.
- embeddings: fresh vec_ids, vectors kept as-is (labels too, so IVF
  cells grow 10x in mass at the same cell count). Identical copies
  across replicas are fine for the queries timed here -- none of them
  compares embeddings across replicas at a similarity threshold.

Usage: python tools/scale10.py [--skip-gen] [--replicas N] [QUERY ...]
Writes the replica under .scale{N}/ (gitignored) and prints a
per-query table sf0.1 vs Nx with the time ratio. `--replicas 100`
is the third scale point (500k docs); positional QUERY names
restrict the run to a subset of HEAVY.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
REPLICAS = (
    int(sys.argv[sys.argv.index("--replicas") + 1]) if "--replicas" in sys.argv else 10
)
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), f".scale{REPLICAS}"
)
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

#: the expensive registered plans worth a second scale point
HEAVY = [
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_keepers",
    "delta_dedup",
    "simhash_near_dup",
    "span_dup_stats",
    "span_dedup_rewrite",
    "benchmark_contamination",
    "chunk_documents",
    "knn_ivf_materialized",
    "embedding_dedup_keepers",
    "training_shuffle",
    "token_budget_select",
    "containment_pairs",
    "leakage_free_split",
    "temperature_mix",
    "bigram_logprob",
    "corpus_curation",
    "benchmark_near_dup",
    "bpe_merge_stats",
    "tokenize_corpus",
    # round-8 registrants
    "simhash_dedup_keepers",
    "winnow_overlap_pairs",
    "corpus_curation_v2",
    "tokenize_pack",
    "delta_containment",
    "source_quota_hot",
    "gopher_quality",
    "c4_clean",
    "delta_embedding_dedup",
    "pii_redact",
    "packing_efficiency",
    "interp_logprob",
    "novelty_scores",
    "perplexity_buckets",
    "line_dedup",
    "semdedup_keepers",
    "hash_embed_stats",
    "curation_funnel",
    "dsir_scores",
    "text_knn",
    "pack_boundaries",
    "corpus_card",
    "canary_registry",
    "denoising_spans",
    "mixture_waterfill",
    "corpus_diversity",
    "stratified_holdout",
    "minhash_calibration",
    # round-9 registrants
    "semdedup_multiprobe",
    "semdedup_multiprobe_scaled",
    "corpus_curation_v3",
    "allocation_report",
    "bm25_rank",
    "media_wav_stats",
    "media_bmp_stats",
    "tokenizer_fertility",
    # late-r9 registrants
    "media_avi_stats",
    "dedup_family_agreement",
    "epoch_expand",
    "fim_split",
    "quality_gate_agreement",
    "dedup_family_agreement_full",
    "fim_render",
    "denoise_render",
    # round-10 registrants
    "knn_ivf_kmeans",
    "corpus_curation_v4",
    "knn_ivf_int8",
    "media_near_dup",
    # late-r10 registrants
    "corpus_drift",
    "corpus_topic_map",
    "cluster_prune_keepers",
    "knn_ivf_pq",
    "hybrid_rank",
    "cms_heavy_hitters",
    "unimax_allocation",
    "bm25_indexed",
    "source_scorecard",
    # round-11 registrants
    "semdedup_near_dup",
    "knn_ivf_mrl",
    "bpe_train",
    "bpe_encode",
    # round-12 registrants: the ladder composition (the replica-
    # degeneracy mitigation -- semdedup_near_dup's 16.45x row should
    # read ~linear here because the exact stage absorbs the
    # byte-identical replicas this protocol plants) and the
    # stored-artifact fusion
    "semdedup_exact_first",
    "hybrid_rank_indexed",
    "media_near_dup_subkey",
]


def generate(spark) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    d_stride = docs.agg(F.max("doc_id")).first()[0] + 1
    v_stride = emb.agg(F.max("vec_id")).first()[0] + 1

    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("_rep"))
    tagged_text = F.when(F.col("_rep") == 0, F.col("text")).otherwise(
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.lit("_r"), F.col("_rep").cast("string")),
            ),
            " ",
        )
    )
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("_rep").cast("long") * d_stride).alias("doc_id"),
            tagged_text.alias("text"),
            "lang",
            "source",
            F.length(tagged_text).alias("n_chars"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{OUT}/documents.parquet")
    )
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("_rep").cast("long") * v_stride).alias("vec_id"),
            "embedding",
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{OUT}/embeddings.parquet")
    )


def main() -> None:
    import statistics

    from solana_data_etl_pipeline_spark.plans.suite import all_queries
    from solana_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("scale10")
    spark.sparkContext.setLogLevel("ERROR")

    if "--skip-gen" not in sys.argv:
        t0 = time.perf_counter()
        generate(spark)
        print(f"# generated {OUT} in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    qs = all_queries()
    # warm-up
    spark.read.parquet(f"{OUT}/documents.parquet").count()
    qs["dedup_exact"](spark, BASE).write.format("noop").mode("overwrite").save()

    wanted = [
        a for a in sys.argv[1:] if not a.startswith("--") and not a.isdigit()
    ]
    run_list = [n for n in HEAVY if not wanted or n in wanted]
    print(f"{'query':28s} {'sf0.1':>8s} {f'{REPLICAS}x':>8s} {'ratio':>6s}")
    results: dict[str, dict] = {}
    for name in run_list:
        row = {}
        for tag, d in (("base", BASE), ("x10", OUT)):
            samples = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                qs[name](spark, d).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            row[tag] = statistics.median(samples)
        results[name] = {
            "base_sec": round(row["base"], 3),
            f"x{REPLICAS}_sec": round(row["x10"], 3),
            "ratio": round(row["x10"] / row["base"], 2),
        }
        print(
            f"{name:28s} {row['base']:8.2f} {row['x10']:8.2f} {row['x10'] / row['base']:6.2f}"
        )
    if "--json" in sys.argv:
        # machine-readable tail for tools/solobench.py (the BENCH_SOLO
        # replica10 section -- VERDICT r12 #5: the semdedup pair's
        # replica-protocol contrast stays measured, not remembered)
        import json as _json

        print(_json.dumps({"replicas": REPLICAS, "queries": results}))


if __name__ == "__main__":
    main()
