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
    # real binary payloads in an unsupported format must hit a REAL
    # decode error (the image resizer is the struct BMP codec: a PNG
    # payload fails its magic check; the video resizer is the AVI
    # demuxer: an mp4 payload fails ITS magic check), never the
    # utf-8-truncating text stand-in (which would raise an opaque
    # UnicodeDecodeError or -- worse -- silently corrupt bytes that
    # happen to decode)
    img = spark.createDataFrame(
        [(4, "image", bytearray(b"\x89PNG\r\n\x1a\n\x00\xff"), 10, "c")],
        M.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="not a BMP"):
        M.resize_media(img).collect()
    vid = spark.createDataFrame(
        [(6, "video", bytearray(b"\x00\x00\x00\x18ftypmp42"), 12, "c")],
        M.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="not an AVI"):
        M.resize_media(vid).collect()


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


def test_wav_roundtrip_real_codec(spark):
    """synth_wav emits genuine RIFF/WAV containers: magic bytes,
    canonical 44-byte header, and the stdlib wave codec parses back
    exactly the header and samples that went in."""
    import wave as _wave

    df = spark.createDataFrame([(1, "ab"), (2, "hello")], "doc_id long, text string")
    out = {r.media_id: r for r in M.synth_wav(df).collect()}
    payload = bytes(out[1].payload)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert out[1].byte_len == 44 + 2  # canonical PCM header + 2 samples
    m = M._wav_parse(payload)
    assert m["n_frames"] == 2 and m["framerate"] == 8000
    assert m["n_channels"] == 1 and m["sampwidth"] == 1
    assert m["samples"] == [ord("a"), ord("b")]


def test_wav_stats_hand_model(spark):
    """Decoded stats match hand arithmetic: 'ab' -> samples (97, 98),
    mean 97.5, rms sqrt(((97-128)^2 + (98-128)^2)/2), peak 98."""
    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    r = M.wav_stats(M.synth_wav(df)).collect()[0]
    assert r.n_frames == 2 and r.framerate == 8000 and r.n_channels == 1
    assert r.mean_amp == 97.5
    assert abs(r.rms - ((31**2 + 30**2) / 2) ** 0.5) < 1e-12
    assert r.peak == 98


def test_wav_resample_decimates_and_reencodes(spark):
    """Stride-4 decimation through the real codec: every 4th sample
    survives, the framerate drops 4x, and the output is itself a
    parseable WAV container."""
    df = spark.createDataFrame([(1, "abcdefghi")], "doc_id long, text string")
    rs = M.wav_resample(M.synth_wav(df), stride=4).collect()[0]
    m = M._wav_parse(bytes(rs.payload))
    assert m["framerate"] == 2000
    assert m["samples"] == [ord(c) for c in "aei"]
    assert rs.byte_len == 44 + 3


def test_wav_decoder_wired_into_feature_and_resize_pipelines(spark):
    """DECODERS['audio'] / RESIZERS['audio'] are the REAL wave codec:
    extract_features returns header-derived features and resize_media
    produces a valid <=target-frame thumbnail container."""
    df = spark.createDataFrame([(7, "abcdefgh" * 10)], "doc_id long, text string")
    media = M.synth_wav(df)
    feats = M.extract_features(media).collect()[0]
    assert feats.modality == "audio"
    assert feats.feature[0] == 80.0   # n_frames
    assert feats.feature[1] == 8000.0
    assert feats.feature[2] == 1.0 and feats.feature[3] == 1.0
    thumb = M.resize_media(media, target=10).collect()[0]
    m = M._wav_parse(bytes(thumb.payload))
    assert 0 < m["n_frames"] <= 10
    assert m["framerate"] == 1000  # stride 8 -> 8000/8


def test_wav_decode_rejects_malformed_bytes(spark):
    """A real decoder fails on malformed bytes -- the audio path no
    longer hashes garbage into fake features."""
    bad = spark.createDataFrame(
        [(5, "audio", bytearray(b"not a wav container"), 19, "c")],
        M.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="(?i)wave|riff|Error"):
        M.extract_features(bad).collect()


def test_bmp_roundtrip_real_codec(spark):
    """synth_bmp emits genuine uncompressed 24bpp BMP containers:
    magic bytes, 54-byte header, 4-byte row padding, and the struct
    parser restores exactly the (zero-padded) grayscale pixels that
    went in, in logical top-down order."""
    df = spark.createDataFrame([(1, "ab"), (2, "x" * 17)], "doc_id long, text string")
    out = {r.media_id: r for r in M.synth_bmp(df).collect()}
    payload = bytes(out[1].payload)
    assert payload[:2] == b"BM"
    # 16 gray pixels -> one row of 48 bytes (already 4-aligned)
    assert out[1].byte_len == 54 + 48
    m = M._bmp_parse(payload)
    assert m["width"] == 16 and m["height"] == 1
    gray = [t[0] for row in m["rows"] for t in row]
    assert gray == [ord("a"), ord("b")] + [0] * 14
    assert all(t[0] == t[1] == t[2] for row in m["rows"] for t in row)
    # 17 chars -> 2 rows, second row zero-padded
    m2 = M._bmp_parse(bytes(out[2].payload))
    assert m2["height"] == 2
    assert [t[0] for t in m2["rows"][1]] == [ord("x")] + [0] * 15


def test_bmp_stats_hand_model(spark):
    """Decoded stats match hand arithmetic: 'ab' -> 16 pixels
    (97, 98, 14 zeros), mean (97+98)/16, max 98."""
    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    r = M.bmp_stats(M.synth_bmp(df)).collect()[0]
    assert r.width == 16 and r.height == 1 and r.n_pixels == 16
    assert r.mean_lum == (97 + 98) / 16
    assert r.max_lum == 98


def test_bmp_resize_decimates_rows_and_columns(spark):
    """Stride-2 nearest-neighbor downsample through the real codec:
    even rows x even columns survive, and the output is itself a
    parseable 8-wide BMP container."""
    text = "".join(chr(65 + i % 26) for i in range(48))  # 3 full rows
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rs = M.bmp_resize(M.synth_bmp(df), stride=2).collect()[0]
    m = M._bmp_parse(bytes(rs.payload))
    assert m["width"] == 8 and m["height"] == 2  # ceil(3/2)
    got = [t[0] for row in m["rows"] for t in row]
    exp = [ord(text[r * 16 + c]) for r in (0, 2) for c in range(0, 16, 2)]
    assert got == exp


def test_bmp_decoder_wired_into_feature_and_resize_pipelines(spark):
    """DECODERS['image'] / RESIZERS['image'] are the REAL struct
    codec: extract_features returns geometry-derived features and
    resize_media produces a valid <=target-column thumbnail."""
    df = spark.createDataFrame([(7, "abcdefgh" * 10)], "doc_id long, text string")
    media = M.synth_bmp(df)
    feats = M.extract_features(media).collect()[0]
    assert feats.modality == "image"
    assert feats.feature[0] == 16.0  # width
    assert feats.feature[1] == 5.0   # height = 80/16
    assert feats.feature[2] == 80.0  # n_pixels
    thumb = M.resize_media(media, target=4).collect()[0]
    m = M._bmp_parse(bytes(thumb.payload))
    assert m["width"] == 4 and m["height"] == 2  # stride 4 on 16x5


def test_bmp_decode_rejects_malformed_bytes(spark):
    """A real decoder fails on malformed bytes -- the image path no
    longer hashes garbage into fake features."""
    bad = spark.createDataFrame(
        [(5, "image", bytearray(b"not a bmp container at all"), 26, "c")],
        M.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="(?i)bmp|magic|Error"):
        M.extract_features(bad).collect()


def test_avi_roundtrip_real_codec(spark):
    """synth_avi emits genuine RIFF/AVI containers: RIFF magic with
    the AVI form type, validated avih/strh/strf headers, one 00db DIB
    chunk per 64-pixel frame plus a spec-complete idx1, and the
    struct demuxer restores exactly the (zero-padded) grayscale
    pixels that went in, frame by frame in logical row order."""
    df = spark.createDataFrame([(1, "ab"), (2, "x" * 65)], "doc_id long, text string")
    out = {r.media_id: r for r in M.synth_avi(df).collect()}
    payload = bytes(out[1].payload)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    m = M._avi_parse(payload)
    assert m["width"] == 8 and m["height"] == 8 and m["fps"] == 4
    assert m["n_frames"] == 1
    gray = [t[0] for fr in m["frames"] for row in fr for t in row]
    assert gray == [ord("a"), ord("b")] + [0] * 62
    assert all(t[0] == t[1] == t[2] for fr in m["frames"] for row in fr for t in row)
    # 65 chars -> 2 frames, second frame zero-padded after one pixel
    m2 = M._avi_parse(bytes(out[2].payload))
    assert m2["n_frames"] == 2
    f2 = [t[0] for row in m2["frames"][1] for t in row]
    assert f2 == [ord("x")] + [0] * 63


def test_avi_stats_hand_model(spark):
    """Decoded stats match hand arithmetic: 'ab' -> one 64-pixel
    frame (97, 98, 62 zeros), mean (97+98)/64, max 98, fps 4."""
    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    r = M.avi_stats(M.synth_avi(df)).collect()[0]
    assert r.n_frames == 1 and r.width == 8 and r.height == 8 and r.fps == 4
    assert r.mean_lum == (97 + 98) / 64
    assert r.max_lum == 98


def test_avi_frame_sample_decimates_and_reencodes(spark):
    """Every-2nd-frame temporal decimation through the real demuxer:
    frames 0, 2, 4 of a 5-frame video survive, the frame rate halves,
    and the output is itself a parseable AVI container."""
    text = "".join(chr(65 + i % 26) for i in range(5 * 64))  # 5 full frames
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rs = M.avi_frame_sample(M.synth_avi(df), stride=2).collect()[0]
    m = M._avi_parse(bytes(rs.payload))
    assert m["n_frames"] == 3 and m["fps"] == 2
    got = [t[0] for fr in m["frames"] for row in fr for t in row]
    exp = [ord(text[f * 64 + i]) for f in (0, 2, 4) for i in range(64)]
    assert got == exp


def test_avi_decoder_wired_into_feature_and_resize_pipelines(spark):
    """DECODERS['video'] / RESIZERS['video'] are the REAL struct
    demuxer: extract_features returns header-derived features and
    resize_media produces a valid <=target-frame decimation."""
    df = spark.createDataFrame([(7, "abcdefgh" * 24)], "doc_id long, text string")
    media = M.synth_avi(df)  # 192 chars -> 3 frames
    feats = M.extract_features(media).collect()[0]
    assert feats.modality == "video"
    assert feats.feature[0] == 3.0  # n_frames
    assert feats.feature[1] == 8.0 and feats.feature[2] == 8.0
    assert feats.feature[3] == 4.0  # fps
    assert feats.feature[7] == 192.0  # n_pixels
    thumb = M.resize_media(media, target=1).collect()[0]
    m = M._avi_parse(bytes(thumb.payload))
    assert m["n_frames"] == 1 and m["fps"] == 1  # stride 3: 4 // 3 -> 1


def test_avi_decode_rejects_malformed_bytes(spark):
    """A real demuxer fails on malformed bytes -- the video path no
    longer hashes garbage into fake features."""
    bad = spark.createDataFrame(
        [(5, "video", bytearray(b"not an avi container at all"), 27, "c")],
        M.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="(?i)avi|magic|Error"):
        M.extract_features(bad).collect()


def test_avi_parse_validates_headers_and_index(spark):
    """Header cross-checks catch real corruption classes: a RIFF size
    mismatch, a frame-count lie in avih, and a truncated idx1 all
    raise instead of decoding garbage."""
    gray = bytes(range(64)) * 2
    good = M._avi_encode(gray, 8, 8, 4)
    assert M._avi_parse(good)["n_frames"] == 2
    # RIFF size lies
    bad_size = good[:4] + (len(good)).to_bytes(4, "little") + good[8:]
    with pytest.raises(ValueError, match="size"):
        M._avi_parse(bad_size)
    # avih claims 3 frames while movi carries 2
    idx = good.index(b"avih") + 8 + 16
    bad_count = good[:idx] + (3).to_bytes(4, "little") + good[idx + 4 :]
    with pytest.raises(ValueError, match="frame count"):
        M._avi_parse(bad_count)
    # idx1 entry count disagrees with movi
    iidx = good.index(b"idx1") + 4
    (isize,) = __import__("struct").unpack("<I", good[iidx : iidx + 4])
    bad_idx = good[: iidx + 8] + good[iidx + 8 + 16 :]  # drop one entry
    bad_idx = bad_idx[:iidx] + (isize - 16).to_bytes(4, "little") + bad_idx[iidx + 4 :]
    bad_idx = bad_idx[:4] + (len(bad_idx) - 8).to_bytes(4, "little") + bad_idx[8:]
    with pytest.raises(ValueError, match="idx1"):
        M._avi_parse(bad_idx)


def test_wav_rejects_unsupported_sample_width(spark):
    """A VALID 16-bit PCM container is an unsupported variant, not a
    silently-empty decode: before this guard the resampler would
    re-encode it as a valid-but-empty 8-bit WAV (total audio loss
    with a fresh checksum and no error)."""
    import io
    import wave as _wave

    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)  # 16-bit PCM
        w.setframerate(8000)
        w.writeframes(b"\x00\x01" * 10)
    payload = buf.getvalue()
    with pytest.raises(ValueError, match="unsupported WAV variant"):
        M._wav_parse(payload)
    bad = spark.createDataFrame(
        [(5, "audio", bytearray(payload), len(payload), "c")], M.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="unsupported WAV variant"):
        M.resize_media(bad, target=4).collect()


def test_media_exact_dups_digest_groups(spark):
    """Byte-identical payloads collapse to one keeper (min media_id);
    raw-byte semantics: texts differing only in case are DIFFERENT
    media (no normalization, unlike text exact_duplicates)."""
    docs = spark.createDataFrame(
        [
            (1, "identical audio content here"),
            (2, "identical audio content here"),
            (3, "IDENTICAL AUDIO CONTENT HERE"),
            (4, "something else entirely okay"),
        ],
        "doc_id long, text string",
    )
    rows = {r.keep_media_id: r.dup_count for r in M.media_exact_dups(M.synth_wav(docs)).collect()}
    assert rows == {1: 2, 3: 1, 4: 1}


def test_media_near_dup_pairs_feature_agreement(spark):
    """Same decoded duration + mean/RMS within tolerance pairs; a
    different-duration item never pairs regardless of content, and a
    same-duration item with a shifted amplitude profile stays out."""
    base = "aaaaaaaaaaaaaaaaaaaa"          # 20 frames of 'a' (97)
    close = "aaaaaaaaaaaaaaaaaaab"         # one sample off: d_mean 5bp
    far = "zzzzzzzzzzzzzzzzzzzz"           # same duration, mean 122 vs 97
    other_len = "aaaaaaaaaaaaaaaaaaaaa"    # 21 frames
    docs = spark.createDataFrame(
        [(1, base), (2, close), (3, far), (4, other_len)],
        "doc_id long, text string",
    )
    pairs = {
        (r.media_a, r.media_b): r
        for r in M.media_near_dup_pairs(M.synth_wav(docs)).collect()
    }
    assert set(pairs) == {(1, 2)}
    p = pairs[(1, 2)]
    assert p.n_frames == 20
    assert abs(p.d_mean_bp) <= M.MEDIA_NEAR_DUP_TOL_BP
    assert abs(p.d_rms_bp) <= M.MEDIA_NEAR_DUP_TOL_BP


def test_media_near_dup_sub_key_identical_under_degenerate_durations(spark):
    """The duration-blocking hot-key fix (VERDICT r10 #6): on a
    planted DEGENERATE population -- every doc the same length, so
    the plain key is one corpus-wide block -- the pigeonhole sub-key
    (n_frames, floor(mean_bp/tol) with double emission) returns the
    IDENTICAL pair set while splitting the block: measured here one
    120-wide block -> max sub-block width bounded well under the
    population, candidate mass cut accordingly. Completeness is the
    pigeonhole argument: |mean_a - mean_b| <= tol implies the
    sub-bucket ids differ by at most 1, and emitting each row into
    (q, q+1) makes any such pair share a bucket."""
    import random

    random.seed(7)
    rows = [
        (i, "".join(random.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(30)))
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = M.synth_wav(docs).localCheckpoint()
    base = {(r.media_a, r.media_b) for r in M.media_near_dup_pairs(media).collect()}
    keyed = {
        (r.media_a, r.media_b)
        for r in M.media_near_dup_pairs(media, sub_key=True).collect()
    }
    assert keyed == base and len(base) > 0
    plain = M.media_block_stats(media).collect()[0]
    sub = M.media_block_stats(media, sub_key=True).collect()[0]
    # the degenerate population is ONE block under the plain key
    assert plain.n_blocks == 1 and plain.max_width == 120
    assert plain.candidate_pairs == 120 * 119 // 2
    # the sub-key splits it and cuts the candidate mass
    assert sub.n_blocks > 10
    assert sub.max_width < 60
    assert sub.candidate_pairs < plain.candidate_pairs // 3


# ---------------------------------------------------------------------------
# Fused synth+decode kernels (r14): the fused one-pass forms must be
# ROW-IDENTICAL to the composed operator chains they replace -- same
# helpers in the same order, verified end-to-end on a corpus slice
# plus the edge cases (empty text, exactly-one-unit text, long text).


@pytest.fixture(scope="module")
def fusion_docs(spark):
    rows = [
        (1, "hello world of spark and more text to fill frames"),
        (2, ""),
        (3, "a"),
        (4, "b" * 64),  # exactly one AVI frame
        (5, "c" * 65),  # one byte past a frame boundary
        (6, "The quick brown fox jumps over the lazy dog " * 12),
    ]
    corpus = [
        (100 + r.doc_id, r.text)
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(40)
        .collect()
    ]
    return spark.createDataFrame(rows + corpus, "doc_id long, text string")


def _rows_sorted(df):
    return sorted(
        ([None if v is None else v for v in r] for r in df.collect()),
        key=lambda t: t[0],
    )


def test_synth_wav_stats_identical_to_composition(spark, fusion_docs):
    composed = M.wav_stats(M.synth_wav(fusion_docs))
    fused = M.synth_wav_stats(fusion_docs)
    assert fused.columns == composed.columns
    assert _rows_sorted(fused) == _rows_sorted(composed)


def test_synth_wav_stats_decimated_identical_to_composition(spark, fusion_docs):
    media = M.synth_wav(fusion_docs).localCheckpoint()
    from pyspark.sql import functions as F

    orig = M.wav_stats(media)
    rs = M.wav_stats(M.wav_resample(media, stride=4)).select(
        "media_id",
        F.col("n_frames").alias("rs_n_frames"),
        F.col("framerate").alias("rs_framerate"),
        F.col("mean_amp").alias("rs_mean_amp"),
    )
    composed = orig.join(rs, "media_id")
    fused = M.synth_wav_stats_decimated(fusion_docs, stride=4)
    assert fused.columns == composed.columns
    assert _rows_sorted(fused) == _rows_sorted(composed)


def test_synth_bmp_stats_resized_identical_to_composition(spark, fusion_docs):
    media = M.synth_bmp(fusion_docs).localCheckpoint()
    from pyspark.sql import functions as F

    orig = M.bmp_stats(media)
    rs = M.bmp_stats(M.bmp_resize(media, stride=2)).select(
        "media_id",
        F.col("width").alias("rs_width"),
        F.col("height").alias("rs_height"),
        F.col("n_pixels").alias("rs_n_pixels"),
        F.col("mean_lum").alias("rs_mean_lum"),
    )
    composed = orig.join(rs, "media_id")
    fused = M.synth_bmp_stats_resized(fusion_docs, stride=2)
    assert fused.columns == composed.columns
    assert _rows_sorted(fused) == _rows_sorted(composed)


def test_synth_avi_stats_sampled_identical_to_composition(spark, fusion_docs):
    media = M.synth_avi(fusion_docs).localCheckpoint()
    from pyspark.sql import functions as F

    orig = M.avi_stats(media)
    rs = M.avi_stats(M.avi_frame_sample(media, stride=2)).select(
        "media_id",
        F.col("n_frames").alias("rs_n_frames"),
        F.col("fps").alias("rs_fps"),
        F.col("mean_lum").alias("rs_mean_lum"),
    )
    composed = orig.join(rs, "media_id")
    fused = M.synth_avi_stats_sampled(fusion_docs, stride=2)
    assert fused.columns == composed.columns
    assert _rows_sorted(fused) == _rows_sorted(composed)


def test_synth_wav_digest_identical_to_synth_minus_payload(spark, fusion_docs):
    composed = M.synth_wav(fusion_docs).drop("payload")
    fused = M.synth_wav_digest(fusion_docs)
    assert fused.columns == composed.columns
    assert _rows_sorted(fused) == _rows_sorted(composed)


def test_media_near_dup_pairs_from_stats_identical(spark, fusion_docs):
    media = M.synth_wav(fusion_docs).localCheckpoint()
    for sub_key in (False, True):
        composed = {
            tuple(r) for r in M.media_near_dup_pairs(media, sub_key=sub_key).collect()
        }
        fused = {
            tuple(r)
            for r in M.media_near_dup_pairs_from_stats(
                M.synth_wav_stats(fusion_docs), sub_key=sub_key
            ).collect()
        }
        assert fused == composed
