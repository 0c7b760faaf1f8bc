"""Multimodal column handling: opaque binary payloads + typed metadata.

Design: media (image/audio/video) travels as an opaque ``binary``
column plus a typed metadata struct (modality, byte length, checksum).
Decode / feature-extraction runs as Arrow-batched ``mapInPandas``
pipelines -- the Spark-side plumbing (schemas, batching, partitioning)
is real and tested; the actual codec call is stubbed behind
``DECODERS`` because no image/audio libraries ship in this
environment (a deterministic fake stands in, clearly marked).

At 100 TB: binary payloads are the dominant bytes -- the plans below
never shuffle the binary column (metadata-only projections before any
wide operation) and decode runs map-side only.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 8


def _fake_decode(payload: bytes, modality: str) -> list[float]:
    """Deterministic stand-in for a real codec: folds the sha256 of the
    payload into FEATURE_DIM floats in [0, 1). Replace with a real
    decoder (PIL / torchaudio / pyav) where available."""
    digest = hashlib.sha256(payload).digest()
    return [int.from_bytes(digest[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(FEATURE_DIM)]


def _unavailable_decode(payload: bytes, modality: str) -> list[float]:
    raise NotImplementedError(
        "real media decoding requires image/audio codecs not present in this environment; "
        "register a decoder in DECODERS['image'|'audio'|'video']"
    )

# Swap entries for real decoders when the codec libraries exist.
DECODERS = {
    "text": _fake_decode,
    "image": _fake_decode,  # STUB: deterministic fake, not a real image decode
    "audio": _fake_decode,  # STUB
    "video": _fake_decode,  # STUB
}


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from a text corpus: payload = utf-8 bytes.
    Stands in for reading real media files; metadata is computed
    JVM-side (no UDF)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("text").alias("modality"),
        payload.alias("payload"),
        F.octet_length(F.col(text_col)).cast("long").alias("byte_len"),
        F.sha2(payload, 256).alias("checksum"),
    )


def extract_features(media_df: DataFrame, batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    `mapInPandas` keeps the decode map-side (no shuffle of payload
    bytes); the iterator contract handles arbitrarily large partitions
    in bounded memory.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                DECODERS.get(m, _unavailable_decode)(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "byte_len": pdf["byte_len"],
                    "feature": feats,
                }
            )

    return media_df.mapInPandas(run, schema=FEATURE_SCHEMA)


def _fake_resize(payload: bytes, modality: str, target: int) -> bytes:
    """Deterministic stand-in for a real media resize (PIL thumbnail /
    audio downsample / video transcode): keep the payload's first
    `target` utf-8 characters. Character-based (not byte-based) so the
    DuckDB oracle can reproduce it exactly with substring()."""
    return bytes(payload).decode("utf-8")[:target].encode("utf-8")


def _unavailable_resize(payload: bytes, modality: str, target: int) -> bytes:
    raise NotImplementedError(
        "real media resizing requires codecs not present in this environment; "
        "register a resizer in RESIZERS['image'|'audio'|'video']"
    )


# Swap entries for real resizers when the codec libraries exist.
# Unlike _fake_decode (which hashes arbitrary bytes), _fake_resize
# utf-8-DECODES the payload -- honest only for the text modality the
# synthetic tables use. Real binary payloads would hit an opaque
# UnicodeDecodeError (or silent corruption), so image/audio/video map
# to the explicit NotImplementedError hook until real codecs exist.
RESIZERS = {
    "text": _fake_resize,
    "image": _unavailable_resize,
    "audio": _unavailable_resize,
    "video": _unavailable_resize,
}


def resize_media(media_df: DataFrame, target: int = 40, batch_size: int = 256) -> DataFrame:
    """Payload -> smaller payload, map-side: the binary column never
    shuffles, metadata (byte_len, checksum) is recomputed in the same
    Arrow batch so the output is a valid media table (MEDIA_SCHEMA).
    This is the resize/transcode slot of a multimodal pipeline; the
    Spark plumbing (mapInPandas iterator contract, schema, bounded
    batches) is real, the codec call is the RESIZERS stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                RESIZERS.get(m, _unavailable_resize)(bytes(p), m, target)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload": out,
                    "byte_len": [len(b) for b in out],
                    "checksum": [hashlib.sha256(b).hexdigest() for b in out],
                }
            )

    return media_df.mapInPandas(run, schema=MEDIA_SCHEMA)


def media_stats(media_df: DataFrame) -> DataFrame:
    """Metadata-only rollup (never touches payload bytes -> the parquet
    reader prunes the binary column entirely)."""
    return media_df.groupBy("modality").agg(
        F.count("*").alias("n_items"),
        F.sum("byte_len").alias("total_bytes"),
        F.round(F.avg("byte_len"), 4).alias("avg_bytes"),
        F.count_distinct("checksum").alias("distinct_payloads"),
    )


def frame_sample(media_df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing demo on opaque payloads: emit one row
    per sampled offset (posexplode over a computed offset sequence) --
    the same plan shape real video frame-sampling uses, with byte
    offsets standing in for frame indices."""
    offsets = F.sequence(F.lit(0), F.greatest(F.col("byte_len") - 1, F.lit(0)), F.lit(every_n_bytes))
    return media_df.select(
        "media_id",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )
