"""Training-shard export: permutation layout, within-file order, and
replay determinism of sinks/shards.py."""

import glob
import hashlib

import pyarrow.parquet as pq

from solana_data_etl_pipeline_spark.sinks.shards import export_shards


def _perm_key(i: int, seed: int) -> int:
    return int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16)


def test_export_shards_layout_order_and_replay(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(200)], "doc_id long, text string"
    )
    out = str(tmp_path / "shards")
    export_shards(df, out, n_shards=8, seed=7)

    shard_dirs = sorted(glob.glob(f"{out}/shard=*"))
    assert len(shard_dirs) == 8

    seen = []
    for d in shard_dirs:
        shard = int(d.rsplit("=", 1)[1])
        files = sorted(glob.glob(f"{d}/*.parquet"))
        rows = []
        for f in files:
            t = pq.read_table(f, columns=["doc_id", "pos"])
            rows.extend(zip(t.column("doc_id").to_pylist(), t.column("pos").to_pylist()))
        # within-shard: pos contiguous from 1 and file order IS pos order
        assert [p for _, p in rows] == list(range(1, len(rows) + 1))
        # the permutation law: shard = key mod n, pos ranks the key
        keys = [_perm_key(i, 7) for i, _ in rows]
        assert all(k % 8 == shard for k in keys)
        assert keys == sorted(keys)
        seen.extend(i for i, _ in rows)
    # every doc exactly once across shards
    assert sorted(seen) == list(range(200))

    # replay determinism: a second export yields the identical layout
    before = {d: [r for f in sorted(glob.glob(f"{d}/*.parquet"))
                  for r in pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist()]
              for d in shard_dirs}
    export_shards(df, out, n_shards=8, seed=7)
    after = {d: [r for f in sorted(glob.glob(f"{d}/*.parquet"))
                 for r in pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist()]
             for d in sorted(glob.glob(f"{out}/shard=*"))}
    assert before == after

    # a different seed is a genuinely different permutation
    out2 = str(tmp_path / "shards2")
    export_shards(df, out2, n_shards=8, seed=8)
    d0 = sorted(glob.glob(f"{out2}/shard=*"))
    assert {k.rsplit('/', 1)[-1] for k in d0} == {k.rsplit('/', 1)[-1] for k in shard_dirs}
    other = [r for f in sorted(glob.glob(f"{d0[0]}/*.parquet"))
             for r in pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist()]
    first = before[shard_dirs[0]]
    assert other != first


def test_export_token_shards_replay_identical(spark, tmp_path):
    from solana_data_etl_pipeline_spark.sinks.shards import export_token_shards

    df = spark.createDataFrame(
        [(i, " ".join(f"w{j % 7}" for j in range(5 + i % 4))) for i in range(60)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "tok")
    export_token_shards(df, out, n_shards=4, vocab_size=5, budget=16, seed=9)
    dirs = sorted(glob.glob(f"{out}/shard=*"))
    assert len(dirs) == 4

    def _layout(root):
        return {
            d.rsplit("/", 1)[-1]: [
                r
                for f in sorted(glob.glob(f"{d}/*.parquet"))
                for r in pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist()
            ]
            for d in sorted(glob.glob(f"{root}/shard=*"))
        }

    before = _layout(out)
    export_token_shards(df, out, n_shards=4, vocab_size=5, budget=16, seed=9)
    assert _layout(out) == before
    # ids respect the vocab bound; oov maps to 0
    t = spark.read.parquet(out)
    assert t.count() == 60
    for r in t.select("token_ids").collect():
        assert all(0 <= x <= 5 for x in r.token_ids)


def test_shard_manifest_detects_drift(spark, tmp_path):
    """The manifest is identical across same-seed re-exports (the
    checkable form of the byte-identity contract) and names the
    drifted shards when the seed -- i.e. the permutation -- changes."""
    from solana_data_etl_pipeline_spark.sinks.shards import export_shards, shard_manifest

    df = spark.createDataFrame(
        [(i, f"doc {i} text") for i in range(60)], "doc_id long, text string"
    )
    out = str(tmp_path / "shards")
    export_shards(df, out, n_shards=4, seed=9)
    m1 = {r.shard: (r.n_docs, r.id_digest) for r in shard_manifest(spark, out).collect()}
    assert set(m1) == {0, 1, 2, 3}
    assert sum(n for n, _ in m1.values()) == 60

    export_shards(df, out, n_shards=4, seed=9)
    m2 = {r.shard: (r.n_docs, r.id_digest) for r in shard_manifest(spark, out).collect()}
    assert m2 == m1

    export_shards(df, out, n_shards=4, seed=10)
    m3 = {r.shard: (r.n_docs, r.id_digest) for r in shard_manifest(spark, out).collect()}
    assert m3 != m1
