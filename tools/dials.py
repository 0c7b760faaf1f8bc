"""Measured cost/recall DIALS for the approximate-similarity families,
matching the evidence standard the IVF nprobe curve set (SCALE.md):
every tunable that trades work for recall gets a measured curve
against its exact twin, not just the analytic formula.

- MinHash-LSH banding: pair recall vs bands (at fixed num_hashes=16,
  threshold 0.2) against exact n-gram Jaccard pairs. More bands =
  lower per-band rows = more candidate collisions = higher recall and
  more candidate work (the 1-(1-s^r)^b s-curve, s=jaccard, r=16/b).
- Embedding sign-LSH: pair recall vs table count (threshold 0.35)
  against the exact cosine cross join. More tables = union of more
  independent bucketings = recall 1-(1-p^b)^L.

Usage: python tools/dials.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one markdown table per dial; runtime ~2-4 min at sf0.1.

`--scale10` instead runs ONLY the multi-probe SemDeDup dial's 10x
pricing (SCALE.md's nprobe coverage-vs-pair-mass tradeoff at the
second scale point): coverage AND runtime for nprobe=2/3 at sf0.1
and at the 10x replica (tools/scale10.py protocol; generated under
.scale10/ if missing). Exact pairs at 10x are DERIVED, not
brute-forced: replicas carry identical embeddings, so the 10x exact
pair set is (base pairs x replica pairs) union (identical-twin
pairs) -- and probe assignments are measured on the actual 10x
table (centroids of 10x replicated cells equal the base centroids,
so this also verifies the replica-invariance argument empirically).
Runtime ~10 min.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pairs(df, a, b):
    return {frozenset((r[a], r[b])) for r in df.collect()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from solana_data_etl_pipeline_spark.operators import dedup as D
    from solana_data_etl_pipeline_spark.plans.testdata_model import load_table
    from solana_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("dials")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    print("## MinHash banding dial (num_hashes=16, jaccard>=0.2, vs exact n-gram pairs)")
    exact = _pairs(D.ngram_jaccard_pairs(docs, threshold=0.2), "doc_a", "doc_b")
    print(f"true pairs: {len(exact)}")
    print("| bands | rows/band | candidate pairs | recall | sec |")
    print("|---|---|---|---|---|")
    for bands in (2, 4, 8):
        t0 = time.perf_counter()
        got_df = D.minhash_lsh_pairs(docs, threshold=0.2, bands=bands, max_bucket=50)
        got = _pairs(got_df, "doc_a", "doc_b")
        sec = time.perf_counter() - t0
        rec = len(exact & got) / max(len(exact), 1)
        print(f"| {bands} | {16 // bands} | {len(got)} | {rec:.3f} | {sec:.2f} |")

    print()
    print("## Embedding sign-LSH table dial (cos>=0.35, vs exact cross join)")
    exact_e = _pairs(D.embedding_near_dup_pairs(emb, threshold=0.35), "vec_a", "vec_b")
    print(f"true pairs: {len(exact_e)}")
    print("| tables | verified pairs | recall | sec |")
    print("|---|---|---|---|")
    for n_tables in (1, 2, 4):
        t0 = time.perf_counter()
        got = _pairs(
            D.embedding_near_dup_lsh(emb, threshold=0.35, max_bucket=50, n_tables=n_tables),
            "vec_a",
            "vec_b",
        )
        sec = time.perf_counter() - t0
        rec = len(exact_e & got) / max(len(exact_e), 1)
        print(f"| {n_tables} | {len(got)} | {rec:.3f} | {sec:.2f} |")

    print()
    print("## Decontamination scheme dial (planted paraphrase J~0.55, vs plant)")
    # the knob behind cross_corpus_near_dup's 16x2 default: planted
    # every-10th-word-drop paraphrases of 50 corpus docs, recall =
    # fraction of planted (source, paraphrase) pairs each (hashes,
    # bands) scheme emits. The analytic column is 1-(1-J^r)^b at the
    # measured mean planted Jaccard.
    offset = 100_000
    rows, planted = [], set()
    for r in docs.orderBy("doc_id").limit(50).collect():
        words = r["text"].split()
        kept = [w for i, w in enumerate(words) if i % 10 != 9]
        rows.append((offset + int(r["doc_id"]), " ".join(kept)))
        planted.add((int(r["doc_id"]), offset + int(r["doc_id"])))
    pb = spark.createDataFrame(rows, "doc_id long, text string")
    print("| hashes | bands | rows/band | s-curve thr | planted recall | sec |")
    print("|---|---|---|---|---|---|")
    for num_hashes, bands in ((16, 4), (16, 8), (32, 8), (32, 16)):
        r_ = num_hashes // bands
        t0 = time.perf_counter()
        got = {
            (x["doc_id"], x["bench_id"])
            for x in D.cross_corpus_near_dup(
                docs, pb, threshold=0.2, num_hashes=num_hashes, bands=bands
            ).collect()
        }
        sec = time.perf_counter() - t0
        thr = (1 / bands) ** (1 / r_)
        rec = len(planted & got) / len(planted)
        print(f"| {num_hashes} | {bands} | {r_} | {thr:.2f} | {rec:.3f} | {sec:.2f} |")


    print()
    print("## Signature-resolution dial (estimator error vs num_hashes)")
    # the knob minhash_calibration exists to size: |err| should track
    # sqrt(J(1-J)/num_hashes) -- quadrupling hashes halves the error.
    # bands scale with hashes (rows/band fixed at 4) so the candidate
    # set stays comparable across rows.
    print("| num_hashes | decile | n_pairs | mean_abs_err_ppm | analytic_ppm | sec |")
    print("|---|---|---|---|---|---|")
    for num_hashes in (16, 32, 64):
        t0 = time.perf_counter()
        rows_ = D.minhash_calibration(
            docs, num_hashes=num_hashes, bands=num_hashes // 4, max_bucket=50
        ).collect()
        sec = time.perf_counter() - t0
        for x in sorted(rows_, key=lambda r: r["decile"]):
            j = (x["mean_exact_ppm"] / 1e6)
            analytic = int((j * (1 - j) / num_hashes) ** 0.5 * 1e6)
            print(
                f"| {num_hashes} | {x['decile']} | {x['n_pairs']} |"
                f" {x['mean_abs_err_ppm']:.0f} | {analytic} | {sec:.2f} |"
            )

    print()
    print("## Multi-probe SemDeDup coverage dial (nprobe vs exact-pair coverage)")
    # the routing knob semdedup_keepers_multiprobe exists to size:
    # coverage of the exact cos>=0.30 pair list under the shipped
    # probe assignment; within-cell pair mass grows ~nprobe^2
    from solana_data_etl_pipeline_spark.operators.dedup import (
        embedding_near_dup_pairs,
        semdedup_probe_assignments,
    )
    from solana_data_etl_pipeline_spark.plans.suite import load_table as _lt

    emb = _lt(spark, sf_dir, "embeddings")
    exact = {
        frozenset((r["vec_a"], r["vec_b"]))
        for r in embedding_near_dup_pairs(emb, threshold=0.30).collect()
    }
    print("| nprobe | pair_coverage | sec |")
    print("|---|---|---|")
    for nprobe in (1, 2, 3, 4):
        t0 = time.perf_counter()
        ps: dict = {}
        for r in (
            semdedup_probe_assignments(emb, nprobe=nprobe)
            .select("vec_id", "_pcl")
            .collect()
        ):
            ps.setdefault(r["vec_id"], set()).add(r["_pcl"])
        cov = sum(
            1
            for pr in exact
            for a, b in (tuple(pr),)
            if ps.get(a, set()) & ps.get(b, set())
        ) / max(len(exact), 1)
        print(f"| {nprobe} | {cov:.3f} | {time.perf_counter() - t0:.2f} |")

    print()
    print("## PQ subspace dial (m vs planted recall; bytes = m*4 bits of codes)")
    # the compression knob knn_ivf_pq exists to size: planted-near-dup
    # recall of the full registered shape (residual-encoded IVF-ADC,
    # nprobe=2) as the subspace count m varies, with the raw-vector
    # form priced beside it at every m -- the residual-vs-raw gap is
    # what encoding x - centroid(x) buys at each code budget
    import numpy as np

    from solana_data_etl_pipeline_spark.operators.similarity import (
        knn_ivf,
        lloyd_cells,
        reconstructed_pq,
        reconstructed_pq_residual,
    )

    base = emb.orderBy("vec_id").limit(50).collect()
    offset = 10_000_000
    print("| form | m | code_bytes | recall@.95 | recall@.85 | fit_sec |")
    print("|---|---|---|---|---|---|")
    for form, m in (
        ("residual", 2), ("residual", 4), ("residual", 8),
        ("raw", 2), ("raw", 4), ("raw", 8),
    ):
        t0 = time.perf_counter()
        if form == "residual":
            idx = (
                reconstructed_pq_residual(emb, m=m)
                .withColumnRenamed("cell", "label")
                .localCheckpoint()
            )
        else:
            idx = (
                lloyd_cells(reconstructed_pq(emb, m=m).localCheckpoint())
                .withColumnRenamed("cell", "label")
                .localCheckpoint()
            )
        fit = time.perf_counter() - t0
        rng = np.random.default_rng(42)
        rec = {}
        for target, tag in ((0.95, "95"), (0.85, "85")):
            rows_q = []
            for r in base:
                v = np.asarray(r["embedding"], dtype=float)
                v /= np.linalg.norm(v)
                u = rng.standard_normal(v.size)
                u -= u.dot(v) * v
                u /= np.linalg.norm(u)
                rows_q.append(
                    (offset + int(r["vec_id"]),
                     [float(x) for x in target * v + (1 - target**2) ** 0.5 * u])
                )
            q = spark.createDataFrame(rows_q, "query_id long, embedding array<double>")
            hit = {
                rr["query_id"]
                for rr in knn_ivf(idx, q, k=10).collect()
                if rr["neighbor_id"] == rr["query_id"] - offset
            }
            rec[tag] = len(hit) / len(rows_q)
        print(
            f"| {form} | {m} | {m * 4 // 8 or 1} | {rec['95']:.2f} | {rec['85']:.2f} | {fit:.1f} |"
        )

    print()
    print("## SemDeDup operating grid (tau x nprobe x refine_bits; VERDICT r10 #4)")
    # the coverage-honesty map: for each tau, exact pairs are
    # brute-forced at THAT tau and each (nprobe, bits) point reports
    # pair coverage (probe-set intersection + shared sub-bits) and
    # removed_frac of the full keeper pipeline. The question the grid
    # answers: does a point with coverage >= 0.5 AND removal < 1.0
    # exist? At a percolating tau (0.30 here: one giant component) it
    # provably cannot -- breaking the component and destroying
    # coverage are the same partitioning; at a near-dup tau (>= 0.5)
    # nprobe=3/bits=0 meets both bars (the registered
    # semdedup_near_dup point). See the tau routing rule in
    # semdedup_keepers_multiprobe's docstring + SCALE.md.
    from solana_data_etl_pipeline_spark.operators.dedup import (
        embedding_near_dup_pairs as _endp,
        sign_sub_bits as _ssb2,
    )
    from solana_data_etl_pipeline_spark.operators.dedup import (
        semdedup_keepers_multiprobe as _smp2,
        semdedup_probe_assignments as _spa2,
    )
    from solana_data_etl_pipeline_spark.operators.similarity import _dvec as _dv2

    from pyspark.sql import functions as F

    n_corpus = emb.count()
    print("| tau | exact_pairs | nprobe | bits | coverage | removed | sec |")
    print("|---|---|---|---|---|---|---|")
    for tau in (0.3, 0.5):
        exact_t = _pairs(_endp(emb, threshold=tau), "vec_a", "vec_b")
        for nprobe in (2, 3):
            for bits in (0, 2, 4):
                t0 = time.perf_counter()
                pv = _spa2(emb, nprobe=nprobe).select("vec_id", "_pcl")
                if bits:
                    sub = emb.select(
                        "vec_id", _ssb2(_dv2(F.col("embedding")), bits).alias("_sb")
                    )
                    pv = pv.join(sub, "vec_id").select(
                        "vec_id",
                        (F.col("_pcl") * (2**bits) + F.col("_sb")).alias("_pcl"),
                    )
                pset: dict = {}
                for r in pv.collect():
                    pset.setdefault(r["vec_id"], set()).add(r["_pcl"])
                cov = sum(
                    1
                    for p in exact_t
                    for a, b in (tuple(p),)
                    if pset.get(a, set()) & pset.get(b, set())
                ) / max(len(exact_t), 1)
                removed = 1 - _smp2(
                    emb, threshold=tau, nprobe=nprobe, refine_bits=bits
                ).count() / max(n_corpus, 1)
                print(
                    f"| {tau} | {len(exact_t)} | {nprobe} | {bits} | {cov:.3f} "
                    f"| {removed:.3f} | {time.perf_counter() - t0:.1f} |"
                )


def scale10_multiprobe() -> None:
    """The 10x pricing of the multi-probe dial (see module docstring)."""
    import statistics

    from pyspark.sql import functions as F

    from solana_data_etl_pipeline_spark.operators.dedup import (
        embedding_near_dup_pairs,
        semdedup_keepers_multiprobe,
        semdedup_probe_assignments,
    )
    from solana_data_etl_pipeline_spark.session import get_spark
    from tools import scale10

    spark = get_spark("dials10")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(os.path.join(scale10.OUT, "embeddings.parquet")):
        t0 = time.perf_counter()
        scale10.generate(spark)
        print(f"# generated {scale10.OUT} in {time.perf_counter() - t0:.1f}s")

    base = spark.read.parquet(f"{scale10.BASE}/embeddings.parquet")
    big = spark.read.parquet(f"{scale10.OUT}/embeddings.parquet")
    v_stride = base.agg(F.max("vec_id")).first()[0] + 1
    n_base = base.count()
    reps = scale10.REPLICAS

    # base exact pairs once (brute force is affordable at sf0.1 only)
    bp = embedding_near_dup_pairs(base, threshold=0.30).select("vec_a", "vec_b")
    bp = bp.localCheckpoint(eager=True)
    n_bp = bp.count()

    # the DERIVED 10x exact pair set: every base pair at every ordered
    # replica combination, plus every vector's identical cross-replica
    # twins (cos 1.0 >= 0.30 by construction)
    ra = spark.range(reps).select(F.col("id").alias("_ra"))
    rb = spark.range(reps).select(F.col("id").alias("_rb"))
    lifted = (
        bp.crossJoin(ra)
        .crossJoin(rb)
        .select(
            (F.col("vec_a") + F.col("_ra") * v_stride).alias("a"),
            (F.col("vec_b") + F.col("_rb") * v_stride).alias("b"),
        )
    )
    twins = (
        base.select("vec_id")
        .crossJoin(ra)
        .crossJoin(rb)
        .filter(F.col("_ra") < F.col("_rb"))
        .select(
            (F.col("vec_id") + F.col("_ra") * v_stride).alias("a"),
            (F.col("vec_id") + F.col("_rb") * v_stride).alias("b"),
        )
    )
    pairs10 = lifted.unionByName(twins)

    def coverage(emb, pairs, nprobe):
        probes = (
            semdedup_probe_assignments(emb, nprobe=nprobe)
            .groupBy("vec_id")
            .agg(F.collect_set("_pcl").alias("cells"))
        )
        hit = (
            pairs.join(probes.select(F.col("vec_id").alias("a"), F.col("cells").alias("ca")), "a")
            .join(probes.select(F.col("vec_id").alias("b"), F.col("cells").alias("cb")), "b")
            .select(
                (F.size(F.array_intersect("ca", "cb")) > 0).cast("long").alias("h")
            )
            .agg(F.avg("h").alias("cov"), F.count("*").alias("n"))
            .first()
        )
        return float(hit["cov"]), int(hit["n"])

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "1"))

    def timed(emb, nprobe, bits):
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            semdedup_keepers_multiprobe(emb, nprobe=nprobe, refine_bits=bits).write.format(
                "noop"
            ).mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        return statistics.median(samples)

    print(f"# base vectors {n_base}, base exact pairs {n_bp}, replicas {reps}")
    print("| nprobe | coverage sf0.1 | coverage 10x | bits | sec sf0.1 | sec 10x | ratio |")
    print("|---|---|---|---|---|---|---|")
    for nprobe in (2, 3):
        cov1, _ = coverage(base, bp.select(F.col("vec_a").alias("a"), F.col("vec_b").alias("b")), nprobe)
        cov10, n10 = coverage(big, pairs10, nprobe)
        for bits in (0, 4):
            t1 = timed(base, nprobe, bits)
            t10 = timed(big, nprobe, bits)
            print(
                f"| {nprobe} | {cov1:.3f} | {cov10:.3f} ({n10} pairs) | {bits} |"
                f" {t1:.2f} | {t10:.2f} | {t10 / t1:.1f} |"
            )


if __name__ == "__main__":
    if "--scale10" in sys.argv:
        scale10_multiprobe()
    else:
        main()
