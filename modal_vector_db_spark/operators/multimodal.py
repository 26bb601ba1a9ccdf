"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, processed via Arrow-batched ``mapInPandas``.

Decoding depth is tiered by what the environment allows: image HEADER
metadata (PNG/GIF/BMP/JPEG width/height) and WAV audio are decoded for REAL
with the stdlib (``_decode_image_headers``, ``_decode_audio_real``); pixel
data / video / compressed-audio decoding needs PIL/ffmpeg/torchaudio, which
are NOT available here, so those route to ``DECODERS``' deterministic fakes
(documented as such) with the PIL implementation raising
``NotImplementedError`` until swapped in.  Everything Spark-side is real and
tested: schemas, binary handling, batch iteration shape, partition sizing.

Scale notes (100 TB of media):
- blobs ride in parquet binary columns (or out-of-line object-store URIs
  with only the URI in the column — same operator shape);
- ``mapInPandas`` streams Arrow record batches, so executor memory is
  bounded by batch size, not partition size — set
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap peak blob bytes;
- feature extraction is embarrassingly parallel: no shuffle anywhere.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of feature extraction — id + typed media metadata.
#: Visual media fill (width, height, n_frames); audio fills (sample_rate,
#: duration_ms); the complement stays NULL — one stable schema for a mixed
#: media table (the parquet-friendly alternative to per-type tables).
MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)


def _decode_image_real(blob: bytes) -> dict[str, Any]:
    """Real image decode via PIL — same contract as the stub: a dict with
    int ``width``/``height``/``n_frames``.  Raises ``NotImplementedError``
    when PIL is absent (this environment); the swap-in contract is pinned
    by ``tests/test_multimodal.py::test_real_image_decoder_contract``,
    which runs whenever PIL IS importable."""
    try:
        import io

        from PIL import Image
    except ImportError as e:  # pragma: no cover - env without PIL
        raise NotImplementedError(
            "image decoding requires PIL; not installed here"
        ) from e
    with Image.open(io.BytesIO(blob)) as im:
        return {
            "width": int(im.width),
            "height": int(im.height),
            "n_frames": int(getattr(im, "n_frames", 1)),
        }


def _decode_image_headers(blob: bytes) -> dict[str, Any]:
    """REAL image metadata decode for the common container formats, stdlib
    only — parses (width, height) straight from the header bytes:

    - PNG:  8-byte signature, IHDR width/height as big-endian uint32 at
      offsets 16/20;
    - GIF:  ``GIF87a``/``GIF89a``, logical-screen width/height as
      little-endian uint16 at offsets 6/8;
    - BMP:  ``BM``, BITMAPINFOHEADER width/height as little-endian int32 at
      offsets 18/22 (height may be negative for top-down rows);
    - JPEG: marker walk to the first SOF segment, height/width as
      big-endian uint16 at segment offsets 3/5.

    Pixel DATA decoding (and true GIF frame counts) still needs PIL — this
    covers the metadata a layout/filter pass actually reads, with no
    dependency.  Unrecognized magic falls back to the deterministic stub
    (:func:`_decode_image_fake`), so non-image bytes keep flowing."""
    import struct

    try:
        if blob[:8] == b"\x89PNG\r\n\x1a\n" and len(blob) >= 24:
            w, h = struct.unpack(">II", blob[16:24])
            return {"width": int(w), "height": int(h), "n_frames": 1}
        if blob[:6] in (b"GIF87a", b"GIF89a") and len(blob) >= 10:
            w, h = struct.unpack("<HH", blob[6:10])
            return {"width": int(w), "height": int(h), "n_frames": 1}
        if blob[:2] == b"BM" and len(blob) >= 26:
            w, h = struct.unpack("<ii", blob[18:26])
            return {"width": int(w), "height": abs(int(h)), "n_frames": 1}
        if blob[:2] == b"\xff\xd8":
            i = 2
            while i + 1 < len(blob) and blob[i] == 0xFF:
                # 0xFF fill bytes may pad between segments (JPEG spec §B.1.1.2)
                # — consume them without treating the run as a marker, or the
                # walk misreads the next real marker's length field.
                while i + 1 < len(blob) and blob[i + 1] == 0xFF:
                    i += 1
                marker = blob[i + 1]
                # Standalone markers (TEM, RSTn, SOI, EOI) carry NO length
                # field; consuming two length bytes here would misalign every
                # subsequent segment and real JPEGs would silently fall
                # through to the fake decoder.
                if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                    i += 2
                    continue
                if i + 4 > len(blob):
                    break
                seglen = struct.unpack(">H", blob[i + 2 : i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    if i + 9 > len(blob):
                        break
                    h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
                    return {"width": int(w), "height": int(h), "n_frames": 1}
                i += 2 + seglen
    except (struct.error, IndexError):  # truncated header → stub fallback
        pass
    return _decode_image_fake(blob)


def _decode_image_fake(blob: bytes) -> dict[str, Any]:
    """Deterministic STUB decoder: derives fake dimensions from the blob
    bytes (stands in for PIL.Image.open(blob).size)."""
    import hashlib

    h = hashlib.md5(blob).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "n_frames": 1,
    }


def _decode_video_fake(blob: bytes) -> dict[str, Any]:
    import hashlib

    h = hashlib.md5(blob).digest()
    return {"width": 320, "height": 240, "n_frames": 1 + h[2] % 120}


def _decode_video_headers(blob: bytes) -> dict[str, Any]:
    """REAL video metadata decode for the common containers, stdlib only —
    header/box parsing, no frame decode:

    - MP4/MOV (ISO BMFF): top-level box walk to ``moov``, then ``mvhd``
      (timescale + duration → duration_ms) and the first ``trak``→``tkhd``
      (16.16 fixed-point width/height at the box tail);
    - AVI (RIFF): ``avih`` main header — dwMicroSecPerFrame, dwTotalFrames,
      dwWidth, dwHeight (all little-endian uint32).

    Frame COUNT for MP4 still needs the sample tables (stbl) — left to the
    ffmpeg-backed decoder; AVI reports dwTotalFrames directly.  Unrecognized
    magic falls back to the deterministic stub."""
    import struct

    def mp4_boxes(buf: bytes, start: int, end: int):
        i = start
        while i + 8 <= end:
            size, btype = struct.unpack(">I4s", buf[i : i + 8])
            if size < 8:  # size 0/1 (to-eof / 64-bit) — not in headers we read
                return
            yield btype, i + 8, min(i + size, end)
            i += size

    try:
        if len(blob) >= 12 and blob[4:8] == b"ftyp":
            out: dict[str, Any] = {"n_frames": None}
            for btype, s, e in mp4_boxes(blob, 0, len(blob)):
                if btype != b"moov":
                    continue
                for ityp, is_, ie in mp4_boxes(blob, s, e):
                    if ityp == b"mvhd" and ie - is_ >= 20:
                        ver = blob[is_]
                        if ver == 1:
                            ts, dur = struct.unpack(">IQ", blob[is_ + 20 : is_ + 32])
                        else:
                            ts, dur = struct.unpack(">II", blob[is_ + 12 : is_ + 20])
                        out["duration_ms"] = int(dur * 1000 // max(ts, 1))
                    elif ityp == b"trak" and "width" not in out:
                        for ttyp, ts_, te in mp4_boxes(blob, is_, ie):
                            if ttyp == b"tkhd" and te - ts_ >= 84:
                                w, h = struct.unpack(">II", blob[te - 8 : te])
                                out["width"], out["height"] = w >> 16, h >> 16
                if "width" in out or "duration_ms" in out:
                    return out
        if blob[:4] == b"RIFF" and blob[8:12] == b"AVI " and len(blob) >= 72:
            i = blob.find(b"avih")
            if i != -1 and len(blob) >= i + 48:
                usec, _, _, _, frames, _, _, _, w, h = struct.unpack(
                    "<10I", blob[i + 8 : i + 48]
                )
                return {
                    "width": int(w),
                    "height": int(h),
                    "n_frames": int(frames),
                    "duration_ms": int(usec * frames // 1000),
                }
    except (struct.error, IndexError):
        pass
    return _decode_video_fake(blob)


def _decode_audio_real(blob: bytes) -> dict[str, Any]:
    """Real audio decode for WAV via the stdlib ``wave`` module — unlike the
    image/video decoders this needs NO external dependency, so the real
    path runs (and is tested) even in this environment.  Non-WAV codecs
    (mp3/flac/…) would route through ffmpeg/torchaudio behind the same
    contract."""
    import io
    import wave

    with wave.open(io.BytesIO(blob), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        return {
            "sample_rate": int(rate),
            "duration_ms": int(n * 1000 // max(rate, 1)),
        }


def _decode_audio_headers(blob: bytes) -> dict[str, Any]:
    """Default audio path: sniff RIFF/WAVE magic and decode for REAL via the
    stdlib ``wave`` module (:func:`_decode_audio_real`); anything else —
    non-WAV codecs, truncated/garbage bytes — falls through to the
    deterministic fake, exactly like the image header decoder does for
    unknown magic.  So real WAV bytes in a user's table yield real
    sample_rate/duration with no configuration."""
    import wave

    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        try:
            return _decode_audio_real(blob)
        except (wave.Error, EOFError, ValueError):  # malformed header
            pass
    return _decode_audio_fake(blob)


def _decode_audio_fake(blob: bytes) -> dict[str, Any]:
    """Deterministic STUB audio decoder (stands in for wave/ffmpeg probing
    when blobs aren't real audio): md5-derived sample rate + duration."""
    import hashlib

    h = hashlib.md5(blob).digest()
    return {
        "sample_rate": (16000, 22050, 44100)[h[3] % 3],
        "duration_ms": 500 + (h[4] * 256 + h[5]) % 60000,
    }


DECODERS: dict[str, Callable[[bytes], dict[str, Any]]] = {
    # Header formats (PNG/GIF/BMP/JPEG) parse REAL dimensions stdlib-side;
    # anything else falls through to the deterministic fake.  Swap for
    # _decode_image_real (PIL) when pixel data is needed.
    "image": _decode_image_headers,
    "video": _decode_video_headers,
    "audio": _decode_audio_headers,  # real stdlib WAV parse, fake fallback
}


def extract_media_features(df: DataFrame, blob_col: str = "blob", type_col: str = "media_type") -> DataFrame:
    """Decode + feature-extract media blobs via ``mapInPandas``.

    Input: (doc_id, media_type, blob: binary).  Output:
    :data:`MEDIA_FEATURES_SCHEMA`.  One Arrow batch in, one out — constant
    memory per task regardless of partition row count.
    """

    # The mapInPandas closure references this module's globals (DECODERS,
    # the fake decoders); register the module for by-value pickling so
    # executors do NOT need modal_vector_db_spark importable on their
    # sys.path (local workers under a plain SparkSession, cluster executors
    # without the package shipped) — same pattern as embedders.embed_udf.
    import sys

    try:  # Spark's vendored cloudpickle is the one that serializes UDFs
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # pragma: no cover - best effort on exotic versions
        pass

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mtype, blob, cksum in zip(
                pdf["doc_id"], pdf[type_col], pdf[blob_col], pdf["_checksum"]
            ):
                blob = bytes(blob)
                meta = DECODERS.get(mtype, _decode_image_fake)(blob)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "media_type": mtype,
                        "n_bytes": len(blob),
                        "checksum": cksum,
                        "width": meta.get("width"),
                        "height": meta.get("height"),
                        "n_frames": meta.get("n_frames"),
                        "sample_rate": meta.get("sample_rate"),
                        "duration_ms": meta.get("duration_ms"),
                    }
                )
            out = pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURES_SCHEMA.fields])
            # Pin nullable dtypes: mixed None/int columns otherwise surface
            # as float64/object and trip the Arrow→Integer conversion.
            yield out.astype(
                {
                    "width": "Int32",
                    "height": "Int32",
                    "n_frames": "Int32",
                    "sample_rate": "Int32",
                    "duration_ms": "Int64",
                }
            )

    # Checksum JVM-side (F.sha2 inside codegen, passed THROUGH the Arrow
    # batch) — the Python loop touches bytes only for what genuinely needs
    # Python, the stdlib header decode.
    pre = df.withColumn("_checksum", F.sha2(F.col(blob_col), 256))
    return pre.mapInPandas(_extract, MEDIA_FEATURES_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int, blob_col: str = "blob") -> DataFrame:
    """Resize plumbing: real implementation needs an image lib; the stub
    passes blobs through and records the target size (schema/partitioning
    identical to the real op)."""
    return df.withColumn("target_width", F.lit(width)).withColumn(
        "target_height", F.lit(height)
    )


def frame_sample_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing for video blobs: emits (doc_id, frame_idx)
    rows from the (fake-)decoded frame count — the explode shape of the
    real operator."""
    feats = extract_media_features(df)
    idx = F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
    return feats.select("doc_id", F.explode(idx).alias("frame_idx"))
