"""CLI surface (reference src/main.rs parity): every subcommand runs
end-to-end against the offline fixture chain and a tmp warehouse."""

from pyspark.sql import functions as F

from solana_data_etl_pipeline_spark.cli import main


def test_cli_health(spark, tmp_path, capsys):
    rc = main(["--warehouse-path", str(tmp_path / "wh"), "--fixtures", "health"])
    assert rc == 0
    assert "healthy" in capsys.readouterr().out


def test_cli_backfill_then_analytics(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    rc = main(
        ["--warehouse-path", wh, "--fixtures", "backfill", "--start-slot", "1", "--end-slot", "12"]
    )
    assert rc == 0
    assert "backfill wrote" in capsys.readouterr().out

    rc = main(["--warehouse-path", wh, "--fixtures", "analytics"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "analytics_transaction_volume: written" in out
    assert "dim_wallets: written" in out  # dims ride the same recompute
    # materialized outputs readable
    got = spark.read.parquet(f"{wh}/analytics_transaction_volume")
    assert got.count() == 4  # total/today/week/month rows
    dims = spark.read.parquet(f"{wh}/dim_programs")
    assert {"program_id", "program_name", "program_type"} <= set(dims.columns)
    assert dims.count() > 0


def test_cli_incremental_bounded(spark, tmp_path):
    wh = str(tmp_path / "wh")
    rc = main(
        [
            "--warehouse-path",
            wh,
            "--fixtures",
            "--fixture-tip",
            "8",
            "incremental",
            "--max-iterations",
            "1",
        ]
    )
    assert rc == 0
    from solana_data_etl_pipeline_spark.sinks.warehouse import ParquetWarehouse

    assert ParquetWarehouse(spark, wh).get_last_slot() == 8


def test_cli_corpus_pipeline(spark, tmp_path, capsys):
    from solana_data_etl_pipeline_spark.cli import main

    wh = str(tmp_path / "wh")
    rc = main(
        [
            "--warehouse-path",
            wh,
            "corpus",
            "--documents",
            "/root/testdata/sf0.001/documents.parquet",
        ]
    )
    assert rc == 0
    feats = spark.read.parquet(f"{wh}/corpus/doc_features")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert feats.count() == docs.count()
    assert {"predicted_lang", "fingerprint", "has_pii"} <= set(feats.columns)
    deduped = spark.read.parquet(f"{wh}/corpus/documents_dedup")
    assert 0 < deduped.count() <= docs.count()
    # kept set respects near-dup semantics: no doc_id appears twice
    assert deduped.select("doc_id").distinct().count() == deduped.count()
    out = capsys.readouterr().out
    assert "documents_dedup: written" in out


def test_cli_corpus_zorder_compact_layout(spark, tmp_path, capsys):
    """Selection -> compaction -> z-order end-to-end: the production
    layout story as one CLI invocation, with the layout properties
    asserted on the written files."""
    import glob

    from solana_data_etl_pipeline_spark.cli import main

    wh = str(tmp_path / "wh")
    rc = main(
        [
            "--warehouse-path",
            wh,
            "corpus",
            "--documents",
            "/root/testdata/sf0.001/documents.parquet",
            "--zorder",
            "--compact",
            "--target-file-mb",
            "1",
            "--chunk-window",
            "16",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "compacted" in out and "z-ordered" in out and "corpus_chunks" in out

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = spark.read.parquet(f"{wh}/corpus/doc_features")
    assert feats.count() == docs.count()

    chunks = spark.read.parquet(f"{wh}/corpus/corpus_chunks")
    assert chunks.count() > 0
    assert {"doc_id", "chunk_id", "start_token", "n_chunk_tokens", "chunk_text"} <= set(
        chunks.columns
    )

    dedup_dir = f"{wh}/corpus/documents_dedup"
    deduped = spark.read.parquet(dedup_dir)
    # z-order enrichment carried the clustering columns onto the corpus
    assert {"predicted_lang", "n_tokens"} <= set(deduped.columns)
    assert 0 < deduped.count() <= docs.count()
    assert deduped.select("doc_id").distinct().count() == deduped.count()
    # no temp/old dirs left behind by the atomic rewrites
    assert not glob.glob(f"{dedup_dir}._*") and not glob.glob(f"{wh}/corpus/doc_features._*")
    # layout property: with >1 file, per-file n_tokens min/max spans
    # must be tighter than the global span (the point of clustering)
    files = sorted(glob.glob(f"{dedup_dir}/*.parquet"))
    if len(files) > 1:
        import pyarrow.parquet as pq

        glo = deduped.agg(
            F.min("n_tokens").alias("lo"), F.max("n_tokens").alias("hi")
        ).first()
        spans = []
        for f in files:
            t = pq.read_table(f, columns=["n_tokens"])
            col = t.column("n_tokens").to_pylist()
            if col:
                spans.append(max(col) - min(col))
        assert max(spans) <= (glo["hi"] - glo["lo"])
        assert min(spans) < (glo["hi"] - glo["lo"])


def test_cli_stream_corpus(spark, tmp_path, capsys):
    """stream-corpus drains the landing zone into the corpus with the
    near-dup index maintained; a second invocation is incremental."""
    import json
    import os

    land = str(tmp_path / "land")
    os.makedirs(land, exist_ok=True)
    wh = str(tmp_path / "wh")

    def _doc(i, text):
        return json.dumps(
            {"doc_id": i, "text": text, "lang": "en", "source": "s1",
             "ingest_time": "2024-01-01T00:00:00"}
        )

    t1 = "the quick brown fox jumps over the lazy dog again and again today ok"
    with open(os.path.join(land, "a.jsonl"), "w") as f:
        f.write(_doc(1, t1) + "\n")

    rc = main(["--warehouse-path", wh, "stream-corpus", "--input", land, "--near-dup"])
    assert rc == 0
    assert "drained (1 documents" in capsys.readouterr().out

    # second shard: near-dup of doc 1 dropped, fresh doc kept
    t2 = "completely different material about spark partitions and shuffle joins here"
    with open(os.path.join(land, "b.jsonl"), "w") as f:
        f.write(_doc(2, t1 + " extra") + "\n")
        f.write(_doc(3, t2) + "\n")

    rc = main(
        ["--warehouse-path", wh, "stream-corpus", "--input", land, "--near-dup",
         "--compact-clusters"]
    )
    assert rc == 0
    out2 = capsys.readouterr().out
    docs = spark.read.parquet(f"{wh}/corpus_stream/documents")
    assert {r.doc_id for r in docs.collect()} == {1, 3}
    assert spark.read.parquet(f"{wh}/corpus_stream/near_dup_index/bands").select(
        "doc_id"
    ).distinct().count() == 2
    # dropped doc 2 attributed to doc 1's cluster; compaction folded
    # and reset the remap log
    assert "near_dup_clusters: 2 docs in 1 clusters" in out2
    idx = f"{wh}/corpus_stream/near_dup_index"
    raw = {r.doc_id: r.cluster_id for r in spark.read.parquet(f"{idx}/clusters").collect()}
    assert raw == {1: 1, 2: 1}


def test_cli_sql_adhoc_over_warehouse(spark, tmp_path, capsys):
    """`sql` registers every warehouse parquet dir as a view and runs
    arbitrary SQL -- the reference's queryable-Postgres surface."""
    wh = str(tmp_path / "wh")
    rc = main(
        ["--warehouse-path", wh, "--fixtures", "backfill", "--start-slot", "1", "--end-slot", "8"]
    )
    assert rc == 0
    capsys.readouterr()

    rc = main(
        ["--warehouse-path", wh, "sql", "-q",
         "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY n DESC",
         "--format", "jsonl"]
    )
    assert rc == 0
    import json

    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows and all({"event_type", "n"} <= set(r) for r in rows)

    # joins across registered views work too
    rc = main(["--warehouse-path", wh, "sql", "-q",
               "SELECT count(*) AS c FROM events e JOIN events f ON e.event_id = f.event_id"])
    assert rc == 0
    out = capsys.readouterr().out
    # show() table format: a header row containing the alias and at
    # least one data row between the +---+ rules
    assert "c" in out and out.count("+") >= 2


def test_cli_stream_corpus_curation_flags(spark, tmp_path, capsys):
    """The streaming curation policy flags reach run_document_stream:
    temperature rates get logged under policy_rates and the token
    budget caps the corpus."""
    import json
    import os

    land = str(tmp_path / "land")
    os.makedirs(land, exist_ok=True)
    wh = str(tmp_path / "wh")

    def _doc(i, src):
        words = " ".join(f"doc{i}word{j}" for j in range(12))
        return json.dumps(
            {"doc_id": i, "text": words, "lang": "en", "source": src,
             "ingest_time": "2024-01-01T00:00:00"}
        )

    with open(os.path.join(land, "a.jsonl"), "w") as f:
        for i in range(12):
            f.write(_doc(i, "big") + "\n")
        for i in range(100, 103):
            f.write(_doc(i, "small") + "\n")

    rc = main(["--warehouse-path", wh, "stream-corpus", "--input", land,
               "--temperature-tau", "0.5", "--token-budget", "120"])
    assert rc == 0
    out = str(tmp_path / "wh") + "/corpus_stream"
    rates = {r.source: r.rate_bp for r in spark.read.parquet(f"{out}/policy_rates").collect()}
    assert set(rates) == {"big", "small"} and all(0 <= v <= 10_000 for v in rates.values())
    docs = spark.read.parquet(f"{out}/documents").collect()
    assert docs and sum(r.n_tokens for r in docs) <= 120


def test_cli_corpus_export_shards(spark, tmp_path, capsys):
    import glob

    wh = str(tmp_path / "wh")
    rc = main(["--warehouse-path", wh, "corpus",
               "--documents", "/root/testdata/sf0.001/documents.parquet",
               "--export-shards", "4", "--shard-seed", "3"])
    assert rc == 0
    assert "shards: written (4 shuffled shards" in capsys.readouterr().out
    dirs = sorted(glob.glob(f"{wh}/corpus/shards/shard=*"))
    assert len(dirs) == 4
    exported = spark.read.parquet(f"{wh}/corpus/shards")
    deduped = spark.read.parquet(f"{wh}/corpus/documents_dedup")
    assert exported.count() == deduped.count()
    assert {"doc_id", "pos", "shard"} <= set(exported.columns)


def test_cli_corpus_token_shards(spark, tmp_path, capsys):
    import glob

    wh = str(tmp_path / "wh")
    rc = main(["--warehouse-path", wh, "corpus",
               "--documents", "/root/testdata/sf0.001/documents.parquet",
               "--token-shards", "4", "--vocab-size", "50",
               "--seq-budget", "64", "--shard-seed", "3"])
    assert rc == 0
    cli_out = capsys.readouterr().out
    assert "token_shards: written (4 model-ready" in cli_out
    assert "packing:" in cli_out and "fill_ratio=" in cli_out
    dirs = sorted(glob.glob(f"{wh}/corpus/token_shards/shard=*"))
    assert len(dirs) == 4
    exported = spark.read.parquet(f"{wh}/corpus/token_shards")
    deduped = spark.read.parquet(f"{wh}/corpus/documents_dedup")
    # every deduped doc lands in exactly one shard with an id sequence
    assert exported.count() == deduped.count()
    rows = exported.collect()
    for r in rows:
        assert len(r.token_ids) == r.n_tokens
        assert all(isinstance(t, int) and 0 <= t <= 50 for t in r.token_ids)
    # packing law within each shard: offsets are the cumulative token
    # stream in pos order, sequence bounds follow the 64-token budget
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: r.pos)
        cum = 0
        for r in rs:
            assert r.start_offset == cum
            assert r.first_seq == r.start_offset // 64
            assert r.last_seq == (r.start_offset + max(r.n_tokens, 1) - 1) // 64
            cum += r.n_tokens


def test_cli_corpus_decontaminate(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    # benchmark set = lightly-paraphrased copies of two real corpus
    # docs (drop every 10th word) -- the regime the fuzzy
    # decontaminator exists for -- plus one unrelated doc
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    two = src.orderBy("doc_id").limit(2).collect()
    rows = []
    for r in two:
        words = r.text.split()
        rows.append((9_000_000 + r.doc_id, " ".join(w for i, w in enumerate(words) if i % 10 != 9)))
    rows.append((9_999_999, "totally unrelated benchmark question about nothing"))
    bench_path = str(tmp_path / "bench.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(bench_path)

    rc = main(["--warehouse-path", wh, "corpus",
               "--documents", "/root/testdata/sf0.001/documents.parquet",
               "--decontaminate", bench_path, "--decon-threshold", "0.2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "decontaminated: against" in out
    kept_ids = {r.doc_id for r in spark.read.parquet(f"{wh}/corpus/documents_dedup").collect()}
    # the two paraphrase-source docs must be gone (or their dedup
    # representative if the source doc lost batch dedup first)
    for r in two:
        assert r.doc_id not in kept_ids


def test_cli_stream_corpus_semantic_dedup(spark, tmp_path, capsys):
    """--semantic-dedup drops a bag-of-words twin (permuted tokens)
    that the fingerprint gate passes, and maintains the embedding
    index under the stream output dir."""
    import json
    import os

    land = str(tmp_path / "land")
    os.makedirs(land, exist_ok=True)
    wh = str(tmp_path / "wh")

    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()

    def _doc(i, text):
        return json.dumps(
            {"doc_id": i, "text": text, "lang": "en", "source": "s1",
             "ingest_time": "2024-01-01T00:00:00"}
        )

    with open(os.path.join(land, "a.jsonl"), "w") as f:
        f.write(_doc(1, " ".join(words)) + "\n")
        f.write(_doc(2, " ".join(reversed(words))) + "\n")

    rc = main(["--warehouse-path", wh, "stream-corpus", "--input", land, "--semantic-dedup"])
    assert rc == 0
    assert "drained (1 documents" in capsys.readouterr().out
    docs = spark.read.parquet(f"{wh}/corpus_stream/documents")
    assert {r.doc_id for r in docs.collect()} == {1}
    idx = spark.read.parquet(f"{wh}/corpus_stream/semantic_index/buckets")
    assert {r.vec_id for r in idx.collect()} == {1}
    # width-health report surfaced for the maintained index
    from solana_data_etl_pipeline_spark.streaming.corpus import index_health

    h = index_health(
        spark, f"{wh}/corpus_stream/semantic_index", ("table", "bucket"),
        max_bucket=64, sub="buckets",
    )
    from solana_data_etl_pipeline_spark.operators.dedup import EMBED_INDEX_TABLES

    # 1 vec x EMBED_INDEX_TABLES hash tables
    assert h["rows"] == EMBED_INDEX_TABLES and h["buckets"] == EMBED_INDEX_TABLES
    assert h["max_width"] == 1 and h["at_cap"] == 0


def test_cli_stream_corpus_semantic_route_blind(spark, tmp_path, capsys):
    """--semantic-route-blind end to end: the over-capped permutation
    family makes the capped gate blind in batch 1; batch 2's twin is
    caught by the overflow fallback, and the health summary surfaces
    the excluded buckets + the overflow twin."""
    import json
    import os

    land = str(tmp_path / "land")
    os.makedirs(land, exist_ok=True)
    wh = str(tmp_path / "wh")

    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()

    def _doc(i, text):
        return json.dumps(
            {"doc_id": i, "text": text, "lang": "en", "source": "s1",
             "ingest_time": "2024-01-01T00:00:00"}
        )

    args = [
        "--warehouse-path", wh, "stream-corpus", "--input", land,
        "--semantic-dedup", "--semantic-route-blind",
    ]
    # 66 distinct permutations of one bag of words (> the shipped cap
    # of 64): identical hash-embed vectors share every bucket, so the
    # capped gate is blind to the whole family and the catch-up
    # rejects all its index rows into excluded/overflow
    import itertools

    perms = list(itertools.islice(itertools.permutations(words), 66))
    with open(os.path.join(land, "a.jsonl"), "w") as f:
        for i, p in enumerate(perms, start=1):
            f.write(_doc(i, " ".join(p)) + "\n")
        f.write(_doc(900, "a clean document about adaptive query execution internals and shuffles") + "\n")
    rc = main(args)
    assert rc == 0
    out1 = capsys.readouterr().out
    assert "semantic_blind_spot:" in out1
    assert "excluded buckets" in out1
    assert "overflow twin" in out1
    # batch 2: one more permutation -- blind in the capped index but
    # cosine-1.0 against the overflow twin -> dropped pre-commit
    with open(os.path.join(land, "b.jsonl"), "w") as f:
        f.write(_doc(901, " ".join(words[5:] + words[:5])) + "\n")
    rc = main(args)
    assert rc == 0
    capsys.readouterr()
    docs = spark.read.parquet(f"{wh}/corpus_stream/documents")
    assert 901 not in {r.doc_id for r in docs.collect()}
    assert 900 in {r.doc_id for r in docs.collect()}


def test_cli_stream_corpus_waterfill_budget(spark, tmp_path, capsys):
    """--waterfill-budget end to end: the small source saturates, the
    big one is cut to its weighted allocation."""
    import json
    import os

    wh = str(tmp_path / "wh")
    land = str(tmp_path / "land")
    os.makedirs(land, exist_ok=True)

    def _doc(i, src):
        words = " ".join(f"doc{i}word{j}" for j in range(12))
        return json.dumps({"doc_id": i, "text": words, "lang": "en", "source": src,
                           "ingest_time": "2024-01-01T00:00:00"})

    with open(os.path.join(land, "a.jsonl"), "w") as f:
        f.write(_doc(0, "a") + "\n")
        for i in range(10, 20):
            f.write(_doc(i, "b") + "\n")
    rc = main(["--warehouse-path", wh, "stream-corpus", "--input", land,
               "--waterfill-budget", "60"])
    assert rc == 0
    rows = spark.read.parquet(f"{wh}/corpus_stream/documents").collect()
    srcs = sorted(r.source for r in rows)
    assert srcs.count("a") == 1 and srcs.count("b") == 4
    assert sum(r.n_tokens for r in rows) == 60


def test_cli_stream_corpus_decon_route_blind(spark, tmp_path, capsys):
    """--decon-route-blind end to end: a benchmark whose boilerplate
    repeats past the capped index's bucket width (70 copies > the
    64-wide default cap) leaves the capped probe blind to the
    contaminated ingest doc; the routing flag sends it through the
    uncapped fallback twin and it is dropped before the corpus
    commit, while the clean doc lands."""
    import json
    import os

    wh = str(tmp_path / "wh")
    land = str(tmp_path / "land")
    os.makedirs(land, exist_ok=True)

    boiler = (
        "standard benchmark license header text repeated verbatim across "
        "every single benchmark file in the distribution"
    )
    bench_path = str(tmp_path / "bench.parquet")
    spark.createDataFrame(
        [(900 + i, boiler) for i in range(70)], "doc_id long, text string"
    ).write.parquet(bench_path)

    def _doc(i, text):
        return json.dumps(
            {"doc_id": i, "text": text, "lang": "en", "source": "s1",
             "ingest_time": "2024-01-01T00:00:00"}
        )

    with open(os.path.join(land, "a.jsonl"), "w") as f:
        f.write(_doc(1, boiler) + "\n")
        f.write(_doc(2, "a clean document about adaptive query execution internals and shuffles") + "\n")

    rc = main(["--warehouse-path", wh, "stream-corpus", "--input", land,
               "--decontaminate", bench_path, "--decon-threshold", "0.5",
               "--decon-route-blind"])
    assert rc == 0
    out = f"{wh}/corpus_stream"
    assert {r.doc_id for r in spark.read.parquet(f"{out}/documents").collect()} == {2}
    # the uncapped fallback twin was materialized beside the capped index
    assert (
        spark.read.parquet(f"{out}/documents_decon_index_full/fingerprints").count() > 0
    )


def test_cli_corpus_epoch_budget(spark, tmp_path, capsys):
    """--epoch-budget end to end: the deduped corpus expands to the
    planned repetitions (2.5x budget => every doc 2 or 3 copies) and
    --token-shards packs the EXPANDED stream -- one exported doc
    per copy."""
    from pyspark.sql import functions as F

    wh = str(tmp_path / "wh")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    budget = int(
        2.5
        * docs.agg(
            F.sum(F.size(F.split(F.trim(F.lower("text")), r"\s+")))
        ).first()[0]
    )
    rc = main(["--warehouse-path", wh, "corpus",
               "--documents", "/root/testdata/sf0.001/documents.parquet",
               "--epoch-budget", str(budget),
               "--token-shards", "2", "--vocab-size", "50",
               "--seq-budget", "64"])
    assert rc == 0
    cli_out = capsys.readouterr().out
    assert "documents_epochs: written" in cli_out
    expanded = spark.read.parquet(f"{wh}/corpus/documents_epochs")
    deduped = spark.read.parquet(f"{wh}/corpus/documents_dedup")
    per_doc = {
        r.orig_doc_id: r.n
        for r in expanded.groupBy("orig_doc_id").agg(F.count("*").alias("n")).collect()
    }
    # 2.5x budget over one source class: every doc repeats 2 or 3 times
    assert set(per_doc.values()) <= {2, 3} and len(per_doc) == deduped.count()
    # rep ids are unique and reversible
    assert expanded.select("doc_id").distinct().count() == expanded.count()
    r = expanded.filter(F.col("copy") == 2).first()
    assert r.doc_id == r.orig_doc_id * 100 + 2
    # token shards pack the EXPANDED stream: one exported row per copy
    exported = spark.read.parquet(f"{wh}/corpus/token_shards")
    assert exported.count() == expanded.count()


def test_cli_corpus_fim_plan(spark, tmp_path, capsys):
    """--fim-rate writes the FIM plan for the deduped corpus: one row
    per kept doc, segment lengths partition n_tokens, selected
    fraction tracks the rate."""
    from pyspark.sql import functions as F

    wh = str(tmp_path / "wh")
    rc = main(["--warehouse-path", wh, "corpus",
               "--documents", "/root/testdata/sf0.001/documents.parquet",
               "--fim-rate", "0.5"])
    assert rc == 0
    assert "fim_plan: written" in capsys.readouterr().out
    plan = spark.read.parquet(f"{wh}/corpus/fim_plan")
    deduped = spark.read.parquet(f"{wh}/corpus/documents_dedup")
    assert plan.count() == deduped.count()
    bad = plan.filter(
        F.col("prefix_len") + F.col("middle_len") + F.col("suffix_len")
        != F.col("n_tokens")
    ).count()
    assert bad == 0
    frac = plan.filter("fim_applied = 1").count() / plan.count()
    assert 0.35 < frac < 0.65


def test_cli_stream_corpus_media_health(spark, tmp_path, capsys):
    """--media-health end to end: the sidecar tables land under the
    output dir and the summary line reports decode/quarantine
    counts."""
    import base64
    import json
    import os

    from solana_data_etl_pipeline_spark.operators.multimodal import _wav_encode

    wh = str(tmp_path / "wh")
    land = str(tmp_path / "land")
    os.makedirs(land, exist_ok=True)

    def _doc(i, media=None, modality=None):
        words = " ".join(f"doc{i}word{j}" for j in range(12))
        d = {"doc_id": i, "text": words, "lang": "en", "source": "s",
             "ingest_time": "2024-01-01T00:00:00"}
        if media is not None:
            d["media_b64"] = base64.b64encode(media).decode()
            d["modality"] = modality
        return json.dumps(d)

    with open(os.path.join(land, "a.jsonl"), "w") as f:
        f.write(_doc(1, _wav_encode(b"xyz", 8000), "audio") + "\n")
        f.write(_doc(2, b"garbage", "image") + "\n")

    rc = main(["--warehouse-path", wh, "stream-corpus",
               "--input", land, "--output", f"{wh}/cs", "--media-health"])
    assert rc == 0
    cli_out = capsys.readouterr().out
    assert "media_health: 1 payloads decoded, 1 quarantined" in cli_out
    mq = spark.read.parquet(f"{wh}/cs/documents_media_quarantine").collect()
    assert [(r.doc_id, r.modality) for r in mq] == [(2, "image")]


def test_cli_stream_corpus_compact_indexes(spark, tmp_path, capsys):
    """--compact-indexes compacts the maintained index sub-tables
    after the drain and reports the file counts."""
    import json
    import os

    wh = str(tmp_path / "wh")
    land = str(tmp_path / "land")
    os.makedirs(land, exist_ok=True)
    with open(os.path.join(land, "a.jsonl"), "w") as f:
        for i in range(6):
            words = " ".join(f"doc{i}word{j}" for j in range(12))
            f.write(json.dumps({"doc_id": i, "text": words, "lang": "en",
                                "source": "s", "ingest_time": "2024-01-01T00:00:00"}) + "\n")

    rc = main(["--warehouse-path", wh, "stream-corpus",
               "--input", land, "--output", f"{wh}/cs",
               "--near-dup", "--compact-indexes"])
    assert rc == 0
    cli_out = capsys.readouterr().out
    assert "compacted near_dup_index/bands:" in cli_out
    # the index still probes after the swap
    assert spark.read.parquet(f"{wh}/cs/near_dup_index/bands").count() > 0


def test_cli_stream_corpus_drift_report(spark, tmp_path):
    """--drift-report end to end: the drift sidecar lands under the
    output dir from the second drained batch on, ranking the planted
    new-vocabulary token."""
    import json
    import os

    wh = str(tmp_path / "wh")
    land = str(tmp_path / "land")
    os.makedirs(land, exist_ok=True)

    def _doc(i, text):
        return json.dumps(
            {"doc_id": i, "text": text, "lang": "en", "source": "s",
             "ingest_time": "2024-01-01T00:00:00"}
        )

    with open(os.path.join(land, "a.jsonl"), "w") as f:
        f.write(_doc(1, " ".join(["base"] * 12)) + "\n")
    rc = main(["--warehouse-path", wh, "stream-corpus",
               "--input", land, "--output", f"{wh}/cs", "--drift-report"])
    assert rc == 0
    with open(os.path.join(land, "b.jsonl"), "w") as f:
        f.write(_doc(2, " ".join(["base"] * 6 + ["novel"] * 6)) + "\n")
    rc = main(["--warehouse-path", wh, "stream-corpus",
               "--input", land, "--output", f"{wh}/cs", "--drift-report"])
    assert rc == 0
    rows = spark.read.parquet(f"{wh}/cs/documents_drift").collect()
    by_tok = {r.token: r for r in rows}
    assert by_tok["novel"].drift_bp == 5000 and by_tok["base"].drift_bp == -5000
