"""Multimodal column handling: opaque binary payloads + typed metadata.

Design: media (image/audio/video) travels as an opaque ``binary``
column plus a typed metadata struct (modality, byte length, checksum).
Decode / feature-extraction runs as Arrow-batched ``mapInPandas``
pipelines -- the Spark-side plumbing (schemas, batching, partitioning)
is real and tested. The AUDIO modality decodes REAL bytes: payloads
are genuine RIFF/WAV containers and ``DECODERS['audio']`` parses them
with the stdlib ``wave`` codec (header + PCM frames), including a real
decimating resample (``wav_resample``). The IMAGE modality decodes
REAL bytes too: payloads are genuine uncompressed 24-bit BMP
containers and ``DECODERS['image']`` struct-parses them (validated
headers + padded bottom-up pixel rows), including a real
nearest-neighbor downsample (``bmp_resize``). The VIDEO modality
decodes REAL bytes as well: payloads are genuine RIFF/AVI containers
(uncompressed 24-bit DIB frames; ``avih``/``strh``/``strf`` headers,
``movi`` frame chunks, ``idx1`` index) struct-parsed with validated
magic, stream headers and frame geometry, including a real temporal
decimation (``avi_frame_sample``) that re-encodes a valid container
at the reduced frame rate. No third-party codec is needed for any of
the three: WAV rides the stdlib ``wave`` module, BMP and AVI are
fixed-layout structures the stdlib ``struct`` module parses, which is
what makes real-bytes decode possible in this codec-free
environment.

At 100 TB: binary payloads are the dominant bytes -- the plans below
never shuffle the binary column (metadata-only projections before any
wide operation) and decode runs map-side only.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
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
        "real media decoding requires image/video codecs not present in this environment; "
        "register a decoder in DECODERS['image'|'video']"
    )


def _wav_parse_raw(payload: bytes) -> dict:
    """REAL audio decode: parse a RIFF/WAV container with the stdlib
    ``wave`` codec -- header fields from the fmt chunk, PCM samples
    from the data chunk (8-bit PCM = unsigned bytes), returned as the
    RAW bytes object (``samples`` key) so hot paths can wrap them in
    a numpy view without a per-sample Python loop (guide §4.2: the
    per-element ``list(...)`` materialization dominated every decode
    batch). Raises ``wave.Error`` on malformed bytes like any real
    decoder, and ``ValueError`` on a VALID container in an
    unsupported variant (non-8-bit PCM) -- the BMP/AVI "unsupported
    variant" stance; silently returning no samples would let the
    resamplers re-encode a 16-bit recording into a valid-but-empty
    8-bit container (total audio loss with a fresh checksum and no
    error)."""
    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        n = w.getnframes()
        out = {
            "n_frames": n,
            "framerate": w.getframerate(),
            "n_channels": w.getnchannels(),
            "sampwidth": w.getsampwidth(),
        }
        if out["sampwidth"] != 1:
            raise ValueError(
                "unsupported WAV variant (need 8-bit PCM; got "
                f"sampwidth={out['sampwidth']})"
            )
        out["samples"] = w.readframes(n)
    return out


def _wav_parse(payload: bytes) -> dict:
    """_wav_parse_raw with ``samples`` as a list of ints -- the
    original public contract (tests and ad-hoc callers index it);
    performance paths use the raw form + numpy instead."""
    out = _wav_parse_raw(payload)
    out["samples"] = list(out["samples"])
    return out


def _wav_decode(payload: bytes, modality: str) -> list[float]:
    """DECODERS adapter over _wav_parse_raw: folds the real decode
    into FEATURE_DIM floats [n_frames, framerate, n_channels,
    sampwidth, mean, rms (centered at the 8-bit PCM midpoint 128),
    peak, min]. Sample statistics are integer sums on a numpy view of
    the raw PCM bytes -- value-identical to the former per-sample
    Python loop (int64 sums are exact; the closing divisions are the
    same IEEE ops) at vector speed."""
    m = _wav_parse_raw(payload)
    s = np.frombuffer(m["samples"], dtype=np.uint8)
    if s.size:
        s64 = s.astype(np.int64)
        mean = int(s64.sum()) / s.size
        rms = (int(((s64 - 128) ** 2).sum()) / s.size) ** 0.5
        peak, lo = float(s.max()), float(s.min())
    else:
        mean = rms = peak = lo = 0.0
    return [
        float(m["n_frames"]),
        float(m["framerate"]),
        float(m["n_channels"]),
        float(m["sampwidth"]),
        mean,
        rms,
        peak,
        lo,
    ]


def _bmp_encode(pixels: bytes, width: int) -> bytes:
    """Encode grayscale pixel bytes as a canonical uncompressed
    24-bit BI_RGB Windows BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
    bottom-up rows, 4-byte row padding) using only stdlib ``struct``
    -- no codec library needed; each gray value v becomes the BGR
    triple (v, v, v). ``len(pixels)`` must be a multiple of
    ``width``."""
    if width <= 0 or len(pixels) % width:
        raise ValueError("_bmp_encode: pixels must tile into `width` columns")
    height = len(pixels) // width
    body = _dib_body(pixels, width)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return head + info + bytes(body)


def _bmp_parse_px(payload: bytes) -> dict:
    """REAL image decode, numpy form: struct-parse an uncompressed
    24-bit BI_RGB BMP -- validate the magic, header sizes, bpp and
    compression fields -- and return the pixel data as ONE zero-copy
    numpy view ``px_bottomup`` of shape (height, width*3): bottom-up
    BGR rows with the 4-byte padding sliced off. Raises
    ``ValueError`` on malformed bytes like any real decoder. Hot
    decode paths consume this form; ``_bmp_parse`` keeps the original
    tuple-rows contract on top of it (guide §4.2)."""
    b = bytes(payload)
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP: bad magic/size")
    magic, fsize, _, _, offset = struct.unpack("<2sIHHI", b[:14])
    hsize, width, height, planes, bpp, comp = struct.unpack("<IiiHHI", b[14:34])
    if hsize != 40 or planes != 1 or bpp != 24 or comp != 0:
        raise ValueError("unsupported BMP variant (need uncompressed 24bpp BI_RGB)")
    if width <= 0 or height <= 0 or fsize != len(b):
        raise ValueError("corrupt BMP geometry")
    row_bytes = width * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if offset + stride * height > len(b):
        raise ValueError("truncated BMP pixel array")
    px = (
        np.frombuffer(b, dtype=np.uint8, count=stride * height, offset=offset)
        .reshape(height, stride)[:, :row_bytes]
    )
    return {"width": width, "height": height, "px_bottomup": px}


def _bmp_parse(payload: bytes) -> dict:
    """_bmp_parse_px with the pixel array as per-row (b, g, r) tuple
    lists in logical top-down order -- the original public contract
    (tests and ad-hoc callers index it); performance paths use the px
    form directly."""
    m = _bmp_parse_px(payload)
    px = m.pop("px_bottomup")
    row_bytes = px.shape[1]
    m["rows"] = [
        [tuple(int(v) for v in row[i : i + 3]) for i in range(0, row_bytes, 3)]
        for row in px[::-1]  # bottom-up -> logical
    ]
    return m


def _bmp_decode(payload: bytes, modality: str) -> list[float]:
    """DECODERS adapter over _bmp_parse_px: folds the real decode into
    FEATURE_DIM floats [width, height, n_pixels, mean B, mean G,
    mean R, min, max] (BGR channel means; min/max over all channels).
    Integer numpy sums -- value-identical to the former tuple loops."""
    m = _bmp_parse_px(payload)
    px = m["px_bottomup"]
    n = px.size // 3
    if n:
        tri = px.reshape(-1, 3).astype(np.int64)
        chan = [int(tri[:, i].sum()) / n for i in range(3)]
        lo, hi = float(int(px.min())), float(int(px.max()))
    else:
        chan = [0.0, 0.0, 0.0]
        lo = hi = 0.0
    return [
        float(m["width"]),
        float(m["height"]),
        float(n),
        chan[0],
        chan[1],
        chan[2],
        lo,
        hi,
    ]


def _bmp_gray_topdown(m: dict, row_stride: int, col_stride: int) -> bytes:
    """Grayscale bytes (B channel) of every (row_stride, col_stride)
    decimated pixel of a _bmp_parse_px result, rows in logical
    top-down order."""
    px = m["px_bottomup"][::-1]  # logical order
    return np.ascontiguousarray(px[::row_stride, 0::3][:, ::col_stride]).tobytes()


def _bmp_thumbnail(payload: bytes, modality: str, target: int) -> bytes:
    """REAL image resize: nearest-neighbor decimation of a parsed BMP
    to at most ``target`` columns (stride = ceil(width/target), the
    same stride applied to rows), re-encoded as a valid container --
    decode and encode both through the struct codec."""
    m = _bmp_parse_px(payload)
    stride = max(1, -(-m["width"] // max(target, 1)))
    kept_w = len(range(0, m["width"], stride))
    return _bmp_encode(_bmp_gray_topdown(m, stride, stride), kept_w)


AVI_FRAME_W = 8
AVI_FRAME_H = 8
AVI_FPS = 4


def _dib_body(gray: bytes, width: int) -> bytes:
    """Raw DIB pixel array for one grayscale frame: bottom-up rows of
    BGR triples with 4-byte row padding -- the payload an uncompressed
    AVI ``00db`` chunk carries (a BMP pixel array without the file
    header). Built with one numpy repeat/pad pass (byte-identical to
    the former per-pixel loop -- pure byte moves; guide §4.2)."""
    height = len(gray) // width
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    g = np.frombuffer(gray, dtype=np.uint8).reshape(height, width)
    bgr = np.repeat(g[::-1], 3, axis=1)  # bottom-up rows; v -> (v, v, v)
    if not pad:
        return bgr.tobytes()
    out = np.zeros((height, row_bytes + pad), dtype=np.uint8)
    out[:, :row_bytes] = bgr
    return out.tobytes()


def _riff_chunk(fourcc: bytes, data: bytes) -> bytes:
    """One RIFF chunk: fourcc + little-endian size + data, padded to an
    even byte boundary per the RIFF spec."""
    return fourcc + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")


def _riff_list(list_type: bytes, data: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + data)


def _avi_encode(gray: bytes, width: int, height: int, fps: int) -> bytes:
    """Encode grayscale pixel bytes as a canonical RIFF/AVI container
    with one uncompressed 24-bit ``vids``/DIB stream, using only the
    stdlib ``struct`` module: ``LIST hdrl`` (``avih`` main header +
    ``LIST strl`` with ``strh``/``strf``), ``LIST movi`` with one
    ``00db`` chunk per frame, and a spec-complete ``idx1`` keyframe
    index. ``len(gray)`` must tile into ``width*height``-pixel
    frames; each gray value v becomes the BGR triple (v, v, v)."""
    if width <= 0 or height <= 0 or fps <= 0 or len(gray) % (width * height):
        raise ValueError("_avi_encode: pixels must tile into width*height frames")
    n_frames = len(gray) // (width * height)
    row_bytes = width * 3
    frame_size = (row_bytes + ((-row_bytes) % 4)) * height
    frames = [
        _dib_body(gray[f * width * height : (f + 1) * width * height], width)
        for f in range(n_frames)
    ]
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_size * fps,  # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        n_frames, 0, 1,    # dwTotalFrames, dwInitialFrames, dwStreams
        frame_size, width, height,
        0, 0, 0, 0,        # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHH8I4h",
        b"vids", b"DIB ",
        0, 0, 0,           # dwFlags, wPriority, wLanguage
        0, 1, fps,         # dwInitialFrames, dwScale, dwRate (fps = rate/scale)
        0, n_frames,       # dwStart, dwLength
        frame_size, 0, 0,  # dwSuggestedBufferSize, dwQuality, dwSampleSize
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_size, 2835, 2835, 0, 0
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi = _riff_list(b"movi", b"".join(_riff_chunk(b"00db", f) for f in frames))
    entries = bytearray()
    off = 4  # offset of the first 00db fourcc, counted from the movi list type
    for f in frames:
        entries += b"00db" + struct.pack("<III", 0x10, off, len(f))  # AVIIF_KEYFRAME
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _riff_chunk(b"idx1", bytes(entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_riff(buf: bytes):
    """Iterate (fourcc, data) over a run of RIFF chunks, honoring the
    even-byte padding rule; raises on a truncated chunk."""
    pos = 0
    while pos + 8 <= len(buf):
        fcc = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        data = buf[pos + 8 : pos + 8 + size]
        if len(data) != size:
            raise ValueError("truncated AVI chunk")
        yield fcc, data
        pos += 8 + size + (size % 2)


def _avi_parse_px(payload: bytes) -> dict:
    """REAL video decode, numpy form: struct-parse a RIFF/AVI
    container -- validate the RIFF magic and size, the
    ``avih``/``strh``/``strf`` headers (one uncompressed 24-bit
    ``vids`` stream whose geometry agrees across headers), collect
    the ``movi`` frame chunks, check the frame count against both the
    main header and the ``idx1`` index -- and return the pixel data
    as ONE zero-copy numpy view ``px_bottomup`` of shape (n_frames,
    height, width*3): bottom-up BGR rows with the 4-byte padding
    sliced off. Raises ``ValueError`` on malformed bytes like any
    real demuxer. The hot decode paths (avi_stats / _avi_decode /
    frame sampling) consume this form; ``_avi_parse`` keeps the
    original tuple-rows contract on top of it (guide §4.2: the
    per-pixel tuple materialization dominated every decode batch)."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF magic")
    (riff_size,) = struct.unpack("<I", b[4:8])
    if riff_size != len(b) - 8:
        raise ValueError("corrupt AVI: RIFF size mismatch")
    avih = strh = strf = None
    frames_raw: list[bytes] = []
    idx_count = None
    for fcc, data in _walk_riff(b[12:]):
        if fcc == b"LIST" and data[:4] == b"hdrl":
            for f2, d2 in _walk_riff(data[4:]):
                if f2 == b"avih":
                    avih = struct.unpack("<14I", d2[:56])
                elif f2 == b"LIST" and d2[:4] == b"strl":
                    for f3, d3 in _walk_riff(d2[4:]):
                        if f3 == b"strh":
                            strh = struct.unpack("<4s4sIHH8I4h", d3[:56])
                        elif f3 == b"strf":
                            strf = struct.unpack("<IiiHHIIiiII", d3[:40])
        elif fcc == b"LIST" and data[:4] == b"movi":
            for f2, d2 in _walk_riff(data[4:]):
                if f2 == b"00db":
                    frames_raw.append(d2)
        elif fcc == b"idx1":
            idx_count = len(data) // 16
    if avih is None or strh is None or strf is None:
        raise ValueError("corrupt AVI: missing avih/strh/strf headers")
    if strh[0] != b"vids" or strf[3] != 1 or strf[4] != 24 or strf[5] != 0:
        raise ValueError("unsupported AVI variant (need one uncompressed 24bpp vids stream)")
    width, height = strf[1], strf[2]
    if width <= 0 or height <= 0 or (avih[8], avih[9]) != (width, height):
        raise ValueError("corrupt AVI geometry")
    n_frames = avih[4]
    if len(frames_raw) != n_frames or strh[9] != n_frames:
        raise ValueError("corrupt AVI: frame count disagrees across headers")
    if idx_count is not None and idx_count != n_frames:
        raise ValueError("corrupt AVI: idx1 entry count disagrees with movi")
    scale, rate = strh[6], strh[7]
    row_bytes = width * 3
    stride = row_bytes + ((-row_bytes) % 4)
    for fr in frames_raw:
        if len(fr) != stride * height:
            raise ValueError("corrupt AVI frame size")
    px = (
        np.frombuffer(b"".join(frames_raw), dtype=np.uint8)
        .reshape(n_frames, height, stride)[:, :, :row_bytes]
    )
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "fps": rate // max(scale, 1),
        "px_bottomup": px,
    }


def _avi_gray_topdown(m: dict, frame_stride: int = 1) -> bytes:
    """Grayscale bytes (B channel; grayscale payloads have B==G==R) of
    every ``frame_stride``-th frame of an _avi_parse_px result, rows
    restored to logical top-down order."""
    px = m["px_bottomup"][::frame_stride]
    return np.ascontiguousarray(px[:, ::-1, 0::3]).tobytes()


def _avi_parse(payload: bytes) -> dict:
    """_avi_parse_px with frames as lists of per-row (b, g, r) tuple
    lists -- the original public contract (tests and ad-hoc callers
    index it); performance paths use the px form directly."""
    m = _avi_parse_px(payload)
    px = m.pop("px_bottomup")
    n_frames, height, row_bytes = px.shape
    frames = [
        [
            [tuple(int(v) for v in row[i : i + 3]) for i in range(0, row_bytes, 3)]
            for row in fr[::-1]  # bottom-up -> logical
        ]
        for fr in px
    ]
    m["frames"] = frames
    return m


def _avi_decode(payload: bytes, modality: str) -> list[float]:
    """DECODERS adapter over _avi_parse_px: folds the real decode into
    FEATURE_DIM floats [n_frames, width, height, fps, mean luminance
    across all frames, max, min, n_pixels] (luminance of a BGR triple
    = the channel mean; grayscale payloads give the gray value).
    Integer numpy sums -- value-identical to the former tuple loops."""
    m = _avi_parse_px(payload)
    px = m["px_bottomup"]
    n = px.size // 3
    s = int(px.astype(np.int64).sum()) if n else 0
    return [
        float(m["n_frames"]),
        float(m["width"]),
        float(m["height"]),
        float(m["fps"]),
        (s / (3 * n)) if n else 0.0,
        float(int(px.max())) if n else 0.0,
        float(int(px.min())) if n else 0.0,
        float(n),
    ]


def _avi_thumbnail(payload: bytes, modality: str, target: int) -> bytes:
    """REAL video resize: temporal decimation of a parsed AVI to at
    most ``target`` frames (keep every ceil(n/target)-th frame, the
    video analog of an image thumbnail), re-encoded as a valid
    container at the reduced frame rate -- decode and encode both
    through the struct demuxer."""
    m = _avi_parse_px(payload)
    stride = max(1, -(-m["n_frames"] // max(target, 1)))
    gray = _avi_gray_topdown(m, stride)
    return _avi_encode(gray, m["width"], m["height"], max(m["fps"] // stride, 1))


# All three media modalities are REAL decoders now: stdlib wave for
# RIFF/WAV audio, struct-parsed uncompressed BMP for image, and
# struct-parsed RIFF/AVI (DIB frames + idx1) for video.
DECODERS = {
    "text": _fake_decode,
    "image": _bmp_decode,   # REAL: uncompressed 24bpp BMP via stdlib struct
    "audio": _wav_decode,   # REAL: RIFF/WAV via the stdlib wave codec
    "video": _avi_decode,   # REAL: RIFF/AVI with uncompressed DIB frames
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


def _wav_thumbnail(payload: bytes, modality: str, target: int) -> bytes:
    """REAL audio resize: decimate a WAV to at most `target` frames
    (keep every ceil(n/target)-th frame, the audio analog of an image
    thumbnail) and re-encode a valid container at the reduced
    framerate -- decode and encode both through the stdlib wave
    codec."""
    m = _wav_parse_raw(payload)
    n = m["n_frames"]
    stride = max(1, -(-n // max(target, 1)))  # ceil(n / target)
    return _wav_encode(
        bytes(m["samples"][::stride]), max(m["framerate"] // stride, 1)
    )


# text's resizer is the deterministic stand-in (utf-8 truncation);
# audio is a REAL decimation through the wave codec, image a REAL
# nearest-neighbor BMP downsample through the struct codec, and video
# a REAL temporal decimation through the AVI demuxer (every modality
# resize re-encodes a valid container).
RESIZERS = {
    "text": _fake_resize,
    "image": _bmp_thumbnail,
    "audio": _wav_thumbnail,
    "video": _avi_thumbnail,
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


def _wav_encode(samples: bytes, framerate: int) -> bytes:
    """Encode raw 8-bit PCM mono samples as a canonical RIFF/WAV
    container via the stdlib wave codec."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(framerate)
        w.writeframes(samples)
    return buf.getvalue()


def synth_wav(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    framerate: int = 8000,
) -> DataFrame:
    """Build a REAL audio media table from a text corpus: each document
    becomes a genuine 8-bit PCM mono RIFF/WAV container whose samples
    are the text's ASCII byte values -- the audio twin of
    attach_binary, standing in for reading real recordings while
    keeping every downstream byte a real container the wave codec
    must parse (reference analog: the schema-on-read payload
    drill-down raw_payload exists for,
    /root/reference/docs/SCHEMA.md:373-380). Deterministic, so the
    decoded stats are oracle-checkable from the text itself.

    Arrow-batched mapInPandas; payload bytes are born map-side and
    never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _wav_encode(t.encode("ascii"), framerate) for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "modality": "audio",
                    "payload": payloads,
                    "byte_len": [len(b) for b in payloads],
                    "checksum": [hashlib.sha256(b).hexdigest() for b in payloads],
                }
            )

    from solana_data_etl_pipeline_spark.operators.util import ensure_parallelism

    return ensure_parallelism(df.select(F.col(id_col), F.col(text_col))).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("framerate", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("mean_amp", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.LongType()),
    ]
)


def wav_stats(media_df: DataFrame) -> DataFrame:
    """Typed per-item stats from a REAL decode of WAV payloads: header
    fields (frames, rate, channels) plus sample statistics (mean
    amplitude, RMS centered at the 8-bit midpoint 128, peak).
    mean/rms leave the UDF as RAW doubles and are rounded by F.round
    in the caller's plan -- Python round() is banker's while both
    engines' SQL round is half-away-from-zero, and exact-tie values
    (e.g. sample sums over 1/20000-granular frame counts) would
    otherwise hash-diverge.

    Scale shape: one Arrow-batched map-side pass over the payload
    column, no shuffle; downstream aggregations see only the narrow
    typed columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                rows.append({"media_id": mid, **_wav_stats_vals(_wav_parse_raw(bytes(p)))})
            yield pd.DataFrame(rows, columns=[f.name for f in WAV_STATS_SCHEMA.fields])

    return media_df.mapInPandas(run, schema=WAV_STATS_SCHEMA)


def _wav_stats_vals(m: dict) -> dict:
    """The per-item arithmetic of wav_stats over one parsed container
    (_wav_parse_raw result) -- shared by the stats operator and the
    fused synth+stats kernels so the two can never diverge."""
    s = np.frombuffer(m["samples"], dtype=np.uint8)
    s64 = s.astype(np.int64) if s.size else None
    return {
        "n_frames": m["n_frames"],
        "framerate": m["framerate"],
        "n_channels": m["n_channels"],
        "mean_amp": (int(s64.sum()) / s.size) if s.size else None,
        "rms": ((int(((s64 - 128) ** 2).sum()) / s.size) ** 0.5) if s.size else None,
        "peak": int(s.max()) if s.size else None,
    }


def wav_resample(media_df: DataFrame, stride: int = 4) -> DataFrame:
    """REAL decimating resample of WAV payloads: keep every
    `stride`-th frame and re-encode a valid container at
    framerate/stride -- decode and re-encode both through the wave
    codec, map-side, emitting a valid media table (MEDIA_SCHEMA)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                m = _wav_parse_raw(bytes(p))
                out.append(
                    _wav_encode(
                        bytes(m["samples"][::stride]),
                        max(m["framerate"] // stride, 1),
                    )
                )
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


def media_exact_dups(media_df: DataFrame) -> DataFrame:
    """Exact MEDIA dedup via payload digest: one row per distinct
    payload with the kept (min) media_id and the copy count -- the
    binary twin of dedup.exact_duplicates (which normalizes text;
    bytes are compared RAW, since two payloads differing in any byte
    are different media). The digest (sha256, MEDIA_SCHEMA's
    checksum) is computed map-side at synth/ingest, so dedup is one
    hash aggregation over (checksum) -- the payload itself never
    shuffles, and at 100 TB the digest column is the only thing the
    exchange carries. Returns (keep_media_id, dup_count)."""
    return media_df.groupBy("checksum").agg(
        F.min("media_id").alias("keep_media_id"),
        F.count(F.lit(1)).alias("dup_count"),
    ).select("keep_media_id", "dup_count")


MEDIA_NEAR_DUP_TOL_BP = 2000


def media_near_dup_pairs(
    media_df: DataFrame,
    tol_bp: int = MEDIA_NEAR_DUP_TOL_BP,
    sub_key: bool = False,
) -> DataFrame:
    """Feature-based MEDIA near-dup pairs: decode every payload through
    the REAL wave codec, then call two items near-duplicates when
    their DECODED features agree -- equal duration (n_frames, the
    blocking key) and mean amplitude + RMS within `tol_bp` basis
    points (integer 1e-4 sample units; quantized BEFORE the compare so
    both engines difference identical integers). The digest ladder's
    second rung: media_exact_dups catches byte-identical copies; this
    catches re-encodes/containers of the same signal whose bytes
    differ but whose decoded profile does not -- the standard
    coarse-feature stage before perceptual hashing.

    Scale shape: one Arrow-batched map-side decode (payloads die
    map-side; only the NARROW typed feature rows shuffle), then a
    self-equi-join blocked on decoded duration. Duration is a
    high-cardinality key for real audio (max block width 6 on the
    test corpus), but a boilerplate-length corpus can make a block
    hot -- the same degenerate-bucket story as every LSH family here.
    `sub_key=True` is the measured answer (SCALE.md r11): the
    blocking key becomes (n_frames, floor(mean_bp / tol_bp)) with
    each row emitted into its own sub-bucket AND the next one -- the
    pigeonhole guarantee that any pair within tol_bp shares at least
    one sub-bucket (|q_a - q_b| <= 1 when |mean_a - mean_b| <=
    tol_bp), so the result is IDENTICAL to the unkeyed form
    (test-pinned) while a duration-degenerate block splits by
    amplitude: planted 500 equal-duration docs -> one 500-wide block
    (124,750 candidates) becomes 72 sub-blocks, max width 34,
    candidate mass 10,623 (11.7x cut), pair set unchanged (1,688).
    Returns (media_a, media_b, n_frames, d_mean_bp, d_rms_bp)."""
    return media_near_dup_pairs_from_stats(wav_stats(media_df), tol_bp, sub_key)


def media_near_dup_pairs_from_stats(
    stats_df: DataFrame,
    tol_bp: int = MEDIA_NEAR_DUP_TOL_BP,
    sub_key: bool = False,
) -> DataFrame:
    """media_near_dup_pairs' blocking/verify tail over an
    already-decoded stats frame (WAV_STATS_SCHEMA columns) -- lets
    callers feed the fused synth_wav_stats kernel, which keeps the
    payload bytes from ever crossing the Arrow boundary (r14; the
    pair logic and result are IDENTICAL, media_near_dup_pairs
    delegates here)."""
    feats = stats_df.select(
        "media_id",
        "n_frames",
        F.round(F.col("mean_amp") * 10000, 0).cast("long").alias("mean_bp"),
        F.round(F.col("rms") * 10000, 0).cast("long").alias("rms_bp"),
    )
    if sub_key:
        q = F.floor(F.col("mean_bp") / F.lit(int(tol_bp))).cast("long")
        feats = feats.withColumn("_q", F.explode(F.array(q, q + 1)))
        block = ["n_frames", "_q"]
    else:
        block = ["n_frames"]
    a, b = feats.alias("a"), feats.alias("b")
    cond = F.col("a.media_id") < F.col("b.media_id")
    for k in block:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    out = (
        a.join(b, cond)
        .filter(
            (F.abs(F.col("a.mean_bp") - F.col("b.mean_bp")) <= tol_bp)
            & (F.abs(F.col("a.rms_bp") - F.col("b.rms_bp")) <= tol_bp)
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.col("a.n_frames").alias("n_frames"),
            (F.col("a.mean_bp") - F.col("b.mean_bp")).alias("d_mean_bp"),
            (F.col("a.rms_bp") - F.col("b.rms_bp")).alias("d_rms_bp"),
        )
    )
    # a pair can share both its sub-buckets (q equal); dedup the
    # doubled candidates -- the unkeyed form emits each pair once
    return out.distinct() if sub_key else out


def media_block_stats(
    media_df: DataFrame,
    tol_bp: int = MEDIA_NEAR_DUP_TOL_BP,
    sub_key: bool = False,
) -> DataFrame:
    """Observability for media_near_dup_pairs' blocking key (the
    *_cap_stats idiom -- no silent hot buckets): one row with the
    block count, max/mean block width, and total candidate-pair mass
    sum(w*(w-1)/2) for the chosen key ((n_frames) or the sub-keyed
    (n_frames, floor(mean_bp/tol_bp)) with the pigeonhole double
    emission). Watch max_width under a boilerplate-duration corpus;
    the sub-keyed row is the cost the fix actually pays."""
    feats = wav_stats(media_df).select(
        "media_id",
        "n_frames",
        F.round(F.col("mean_amp") * 10000, 0).cast("long").alias("mean_bp"),
    )
    if sub_key:
        q = F.floor(F.col("mean_bp") / F.lit(int(tol_bp))).cast("long")
        feats = feats.withColumn("_q", F.explode(F.array(q, q + 1)))
        keys = ["n_frames", "_q"]
    else:
        keys = ["n_frames"]
    widths = feats.groupBy(*keys).agg(F.count(F.lit(1)).alias("w"))
    return widths.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.max("w").alias("max_width"),
        F.round(F.avg("w"), 2).alias("mean_width"),
        F.sum(F.expr("w * (w - 1) div 2")).alias("candidate_pairs"),
    )


BMP_WIDTH = 16


def synth_bmp(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = BMP_WIDTH,
) -> DataFrame:
    """Build a REAL image media table from a text corpus: each document
    becomes a genuine uncompressed 24-bit BMP whose grayscale pixels
    are the text's ASCII byte values, zero-padded to fill the last
    `width`-pixel row (empty text yields one all-zero row) -- the
    image twin of synth_wav: every downstream byte is a real container
    the struct codec must parse, and the decode is deterministic, so
    the oracle recomputes every pixel statistic from the text itself.

    Arrow-batched mapInPandas; payload bytes are born map-side and
    never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                raw = t.encode("ascii")
                h = max(1, -(-len(raw) // width))
                payloads.append(_bmp_encode(raw.ljust(h * width, b"\x00"), width))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "modality": "image",
                    "payload": payloads,
                    "byte_len": [len(b) for b in payloads],
                    "checksum": [hashlib.sha256(b).hexdigest() for b in payloads],
                }
            )

    from solana_data_etl_pipeline_spark.operators.util import ensure_parallelism

    return ensure_parallelism(df.select(F.col(id_col), F.col(text_col))).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


BMP_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("mean_lum", T.DoubleType()),
        T.StructField("max_lum", T.LongType()),
    ]
)


def bmp_stats(media_df: DataFrame) -> DataFrame:
    """Typed per-item stats from a REAL decode of BMP payloads: header
    geometry plus luminance statistics over the pixel array
    (luminance of a BGR triple = the exact integer-sum mean
    (b+g+r)/3; on grayscale-encoded payloads this is the gray value).
    mean_lum leaves the UDF raw and is rounded by F.round in the
    caller's plan (Python round() is banker's -- the wav_stats
    lesson).

    Scale shape: one Arrow-batched map-side pass over the payload
    column, no shuffle; downstream sees only narrow typed columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                rows.append({"media_id": mid, **_bmp_stats_vals(_bmp_parse_px(bytes(p)))})
            yield pd.DataFrame(rows, columns=[f.name for f in BMP_STATS_SCHEMA.fields])

    return media_df.mapInPandas(run, schema=BMP_STATS_SCHEMA)


def _bmp_stats_vals(m: dict) -> dict:
    """The per-item arithmetic of bmp_stats over one parsed container
    (_bmp_parse_px result) -- shared by the stats operator and the
    fused synth+stats kernel so the two can never diverge."""
    px = m["px_bottomup"]
    n = px.size // 3
    s = int(px.astype(np.int64).sum()) if n else 0
    return {
        "width": m["width"],
        "height": m["height"],
        "n_pixels": n,
        "mean_lum": (s / (3 * n)) if n else None,
        "max_lum": int(px.max()) if n else None,
    }


def bmp_resize(media_df: DataFrame, stride: int = 2) -> DataFrame:
    """REAL nearest-neighbor image downsample of BMP payloads: keep
    every `stride`-th row and column and re-encode a valid container
    -- decode and encode both through the struct codec, map-side,
    emitting a valid media table (MEDIA_SCHEMA)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                m = _bmp_parse_px(bytes(p))
                kept_w = len(range(0, m["width"], stride))
                out.append(_bmp_encode(_bmp_gray_topdown(m, stride, stride), kept_w))
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


def synth_avi(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = AVI_FRAME_W,
    height: int = AVI_FRAME_H,
    fps: int = AVI_FPS,
) -> DataFrame:
    """Build a REAL video media table from a text corpus: each document
    becomes a genuine RIFF/AVI container whose uncompressed DIB frames
    carry the text's ASCII byte values as grayscale pixels,
    zero-padded to fill the last ``width*height``-pixel frame (empty
    text yields one all-zero frame) -- the video sibling of synth_wav
    and synth_bmp: every downstream byte is a real container the
    struct demuxer must parse, and the encode is deterministic, so the
    oracle recomputes every decoded number from the text itself.

    Arrow-batched mapInPandas; payload bytes are born map-side and
    never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fpx = width * height
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                raw = t.encode("ascii")
                n = max(1, -(-len(raw) // fpx))
                payloads.append(_avi_encode(raw.ljust(n * fpx, b"\x00"), width, height, fps))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "modality": "video",
                    "payload": payloads,
                    "byte_len": [len(b) for b in payloads],
                    "checksum": [hashlib.sha256(b).hexdigest() for b in payloads],
                }
            )

    from solana_data_etl_pipeline_spark.operators.util import ensure_parallelism

    return ensure_parallelism(df.select(F.col(id_col), F.col(text_col))).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


AVI_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("fps", T.LongType()),
        T.StructField("mean_lum", T.DoubleType()),
        T.StructField("max_lum", T.LongType()),
    ]
)


def avi_stats(media_df: DataFrame) -> DataFrame:
    """Typed per-item stats from a REAL decode of AVI payloads: header
    fields (frame count, geometry, frame rate) plus luminance
    statistics over every frame's pixel array. mean_lum leaves the UDF
    raw and is rounded by F.round in the caller's plan (Python round()
    is banker's -- the wav_stats lesson).

    Scale shape: one Arrow-batched map-side pass over the payload
    column, no shuffle; downstream sees only narrow typed columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                rows.append({"media_id": mid, **_avi_stats_vals(_avi_parse_px(bytes(p)))})
            yield pd.DataFrame(rows, columns=[f.name for f in AVI_STATS_SCHEMA.fields])

    return media_df.mapInPandas(run, schema=AVI_STATS_SCHEMA)


def _avi_stats_vals(m: dict) -> dict:
    """The per-item arithmetic of avi_stats over one parsed container
    (_avi_parse_px result) -- shared by the stats operator and the
    fused synth+stats kernel so the two can never diverge."""
    px = m["px_bottomup"]
    n = px.size // 3
    s = int(px.astype(np.int64).sum()) if n else 0
    return {
        "n_frames": m["n_frames"],
        "width": m["width"],
        "height": m["height"],
        "fps": m["fps"],
        "mean_lum": (s / (3 * n)) if n else None,
        "max_lum": int(px.max()) if n else None,
    }


def avi_frame_sample(media_df: DataFrame, stride: int = 2) -> DataFrame:
    """REAL temporal frame sampling of AVI payloads: keep every
    ``stride``-th frame and re-encode a valid container at
    fps/stride -- decode and encode both through the struct demuxer,
    map-side, emitting a valid media table (MEDIA_SCHEMA). The video
    analog of wav_resample's decimation; the plan shape a real
    frame-sampling stage uses (cf. the byte-offset plumbing demo
    ``frame_sample`` below, which this operator upgrades to real
    frames)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                m = _avi_parse_px(bytes(p))
                gray = _avi_gray_topdown(m, stride)
                out.append(
                    _avi_encode(
                        gray, m["width"], m["height"], max(m["fps"] // stride, 1)
                    )
                )
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


# ---------------------------------------------------------------------------
# Fused synth+decode kernels (r14, guide §4.2/§2.3): the *_stats suite
# entries composed synth -> [checkpoint] -> decode -> decimate ->
# re-encode -> re-decode as FOUR Python stages, shipping the payload
# bytes across the Arrow boundary at every seam (and, r13, storing
# them in a localCheckpoint between the two decode branches). Every
# operation in that chain is per-item and independent, so one kernel
# runs the identical helper sequence per item -- encode, parse, stats,
# decimate, re-encode, re-parse, stats -- and emits ONLY the narrow
# stats row: the payload bytes never cross the Python/JVM boundary at
# all, no checkpoint holds them, and the join of the two branches
# disappears. Row-identical to the composed operators by construction
# (same helpers, same order; pinned by tests).


def _synth_stats_frame(df: DataFrame, per_text, schema, text_col: str, id_col: str) -> DataFrame:
    """Shared plumbing for the fused kernels: one Arrow-batched
    map-side pass over (id, text), per_text(text) -> stats dict."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            rows = [
                {"media_id": mid, **per_text(t)}
                for mid, t in zip(pdf[id_col], pdf[text_col])
            ]
            yield pd.DataFrame(rows, columns=cols)

    from solana_data_etl_pipeline_spark.operators.util import ensure_parallelism

    return ensure_parallelism(df.select(F.col(id_col), F.col(text_col))).mapInPandas(
        run, schema=schema
    )


def synth_wav_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    framerate: int = 8000,
) -> DataFrame:
    """wav_stats(synth_wav(df)) fused into one kernel: the container is
    encoded AND parsed back in-process, so the payload bytes never
    cross the Arrow boundary. Row-identical to the composition
    (same _wav_encode / _wav_parse_raw / _wav_stats_vals sequence)."""

    def per_text(t: str) -> dict:
        return _wav_stats_vals(_wav_parse_raw(_wav_encode(t.encode("ascii"), framerate)))

    return _synth_stats_frame(df, per_text, WAV_STATS_SCHEMA, text_col, id_col)


WAV_STATS_DECIMATED_SCHEMA = T.StructType(
    list(WAV_STATS_SCHEMA.fields)
    + [
        T.StructField("rs_n_frames", T.LongType()),
        T.StructField("rs_framerate", T.LongType()),
        T.StructField("rs_mean_amp", T.DoubleType()),
    ]
)


def synth_wav_stats_decimated(
    df: DataFrame,
    stride: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    framerate: int = 8000,
) -> DataFrame:
    """The full media_wav_stats chain -- synth_wav -> wav_stats plus
    wav_resample(stride) -> wav_stats -- fused into one kernel: the
    decimated branch still round-trips through the real codec
    (_wav_encode at framerate/stride, re-parsed), exactly the composed
    operators' helper sequence, but no payload crosses Arrow and no
    checkpoint holds it. Row-identical to the composition (pinned)."""

    def per_text(t: str) -> dict:
        m = _wav_parse_raw(_wav_encode(t.encode("ascii"), framerate))
        vals = _wav_stats_vals(m)
        rs = _wav_stats_vals(
            _wav_parse_raw(
                _wav_encode(bytes(m["samples"][::stride]), max(m["framerate"] // stride, 1))
            )
        )
        vals["rs_n_frames"] = rs["n_frames"]
        vals["rs_framerate"] = rs["framerate"]
        vals["rs_mean_amp"] = rs["mean_amp"]
        return vals

    return _synth_stats_frame(df, per_text, WAV_STATS_DECIMATED_SCHEMA, text_col, id_col)


BMP_STATS_RESIZED_SCHEMA = T.StructType(
    list(BMP_STATS_SCHEMA.fields)
    + [
        T.StructField("rs_width", T.LongType()),
        T.StructField("rs_height", T.LongType()),
        T.StructField("rs_n_pixels", T.LongType()),
        T.StructField("rs_mean_lum", T.DoubleType()),
    ]
)


def synth_bmp_stats_resized(
    df: DataFrame,
    stride: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = BMP_WIDTH,
) -> DataFrame:
    """The full media_bmp_stats chain -- synth_bmp -> bmp_stats plus
    bmp_resize(stride) -> bmp_stats -- fused into one kernel (same
    helper sequence as the composed operators, including the resized
    branch's real re-encode/re-parse round trip). Row-identical."""

    def per_text(t: str) -> dict:
        raw = t.encode("ascii")
        h = max(1, -(-len(raw) // width))
        m = _bmp_parse_px(_bmp_encode(raw.ljust(h * width, b"\x00"), width))
        vals = _bmp_stats_vals(m)
        kept_w = len(range(0, m["width"], stride))
        rs = _bmp_stats_vals(
            _bmp_parse_px(_bmp_encode(_bmp_gray_topdown(m, stride, stride), kept_w))
        )
        vals["rs_width"] = rs["width"]
        vals["rs_height"] = rs["height"]
        vals["rs_n_pixels"] = rs["n_pixels"]
        vals["rs_mean_lum"] = rs["mean_lum"]
        return vals

    return _synth_stats_frame(df, per_text, BMP_STATS_RESIZED_SCHEMA, text_col, id_col)


AVI_STATS_SAMPLED_SCHEMA = T.StructType(
    list(AVI_STATS_SCHEMA.fields)
    + [
        T.StructField("rs_n_frames", T.LongType()),
        T.StructField("rs_fps", T.LongType()),
        T.StructField("rs_mean_lum", T.DoubleType()),
    ]
)


def synth_avi_stats_sampled(
    df: DataFrame,
    stride: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = AVI_FRAME_W,
    height: int = AVI_FRAME_H,
    fps: int = AVI_FPS,
) -> DataFrame:
    """The full media_avi_stats chain -- synth_avi -> avi_stats plus
    avi_frame_sample(stride) -> avi_stats -- fused into one kernel
    (same helper sequence as the composed operators, including the
    sampled branch's real re-encode at fps/stride and re-demux).
    Row-identical to the composition (pinned)."""

    def per_text(t: str) -> dict:
        fpx = width * height
        raw = t.encode("ascii")
        n = max(1, -(-len(raw) // fpx))
        m = _avi_parse_px(_avi_encode(raw.ljust(n * fpx, b"\x00"), width, height, fps))
        vals = _avi_stats_vals(m)
        gray = _avi_gray_topdown(m, stride)
        rs = _avi_stats_vals(
            _avi_parse_px(
                _avi_encode(gray, m["width"], m["height"], max(m["fps"] // stride, 1))
            )
        )
        vals["rs_n_frames"] = rs["n_frames"]
        vals["rs_fps"] = rs["fps"]
        vals["rs_mean_lum"] = rs["mean_lum"]
        return vals

    return _synth_stats_frame(df, per_text, AVI_STATS_SAMPLED_SCHEMA, text_col, id_col)


MEDIA_DIGEST_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def synth_wav_digest(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    framerate: int = 8000,
) -> DataFrame:
    """synth_wav minus the payload column: the container is still
    encoded per item (the checksum is sha256 over the REAL bytes,
    identical to synth_wav's), but digest-only consumers
    (media_exact_dups) no longer ship the payload across the Arrow
    boundary just to drop it. Column-identical to
    synth_wav(df).drop('payload') (pinned)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _wav_encode(t.encode("ascii"), framerate) for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "modality": "audio",
                    "byte_len": [len(b) for b in payloads],
                    "checksum": [hashlib.sha256(b).hexdigest() for b in payloads],
                }
            )

    from solana_data_etl_pipeline_spark.operators.util import ensure_parallelism

    return ensure_parallelism(df.select(F.col(id_col), F.col(text_col))).mapInPandas(
        run, schema=MEDIA_DIGEST_SCHEMA
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
