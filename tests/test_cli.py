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
