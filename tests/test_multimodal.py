"""Multimodal plumbing semantics: binary payload metadata, Arrow-batch
feature extraction, resize transform, unknown-modality contract."""

import hashlib

import pytest

from solana_data_etl_pipeline_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world of spark"), (2, "tiny"), (3, "a" * 100)],
        "doc_id long, text string",
    )
    return M.attach_binary(docs)


def test_attach_binary_metadata(media):
    rows = {r.media_id: r for r in media.collect()}
    assert bytes(rows[1].payload) == b"hello world of spark"
    assert rows[3].byte_len == 100
    assert rows[2].checksum == hashlib.sha256(b"tiny").hexdigest()


def test_extract_features_matches_stub_decoder(media):
    rows = {r.media_id: r.feature for r in M.extract_features(media).collect()}
    want = M._fake_decode(b"tiny", "text")
    assert [round(x, 6) for x in rows[2]] == [round(x, 6) for x in want]
    assert all(len(f) == M.FEATURE_DIM for f in rows.values())


def test_resize_media_truncates_and_recomputes_metadata(media):
    out = {r.media_id: r for r in M.resize_media(media, target=10).collect()}
    # long payload truncated to 10 chars; metadata consistent
    assert bytes(out[3].payload) == b"a" * 10
    assert out[3].byte_len == 10
    assert out[3].checksum == hashlib.sha256(b"a" * 10).hexdigest()
    # short payload unchanged
    assert bytes(out[2].payload) == b"tiny"
    assert out[2].byte_len == 4
    # output is a valid media table: columns/types closed under resize
    # (nullability flags differ between a select-built frame and the
    # declared MEDIA_SCHEMA — names and types are the contract)
    got = [(f.name, f.dataType) for f in M.resize_media(media).schema.fields]
    assert got == [(f.name, f.dataType) for f in media.schema.fields]


def test_binary_modality_resize_raises_not_silent_corruption(spark):
    # real binary payloads (non-utf8) must hit the explicit
    # NotImplementedError codec hook, never the utf-8-truncating text
    # stand-in (which would raise an opaque UnicodeDecodeError or --
    # worse -- silently corrupt bytes that happen to decode)
    img = spark.createDataFrame(
        [(4, "image", bytearray(b"\x89PNG\r\n\x1a\n\x00\xff"), 10, "c")],
        M.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|register a resizer"):
        M.resize_media(img).collect()


def test_unknown_modality_raises_in_both_pipelines(spark):
    weird = spark.createDataFrame(
        [(9, "hologram", bytearray(b"xx"), 2, "c")],
        M.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|register a"):
        M.extract_features(weird).collect()
    with pytest.raises(Exception, match="NotImplementedError|register a"):
        M.resize_media(weird).collect()


def test_frame_sample_offsets(media):
    rows = [
        (r.frame_idx, r.byte_offset)
        for r in M.frame_sample(media, every_n_bytes=32).where("media_id = 3").collect()
    ]
    assert rows == [(0, 0), (1, 32), (2, 64), (3, 96)]
