"""Image / audio / video columns as opaque binary + typed metadata
(SURVEY §2.12 "multimodal columns"; task brief: decode / resize /
frame-sample / feature-extract as Pandas UDFs).

STUB LAYER like multimodal/codecs.py: the container has no
PIL/ffmpeg/librosa, so the byte-level decoders are deterministic fakes
— clearly marked, swappable for real ones — while everything Spark
cares about is REAL: binary columns with a typed metadata struct,
Arrow-batched ``mapInPandas`` stages, per-kind routing, and exact
integer size models that a pure-SQL oracle can recompute from the
``documents`` fixture (the same verification strategy as
plans/binary_ops.py).

Derivation (all integer, dialect-common):
- kind        = doc_id % 3 -> image | audio | video
- image       : width  = 100 + n_chars % 512
                height = 100 + (n_chars * 7) % 512
                bytes  = 16 + (width * height) // 16
- audio       : duration_ms = n_chars * 50
                bytes = 20 + duration_ms // 4
- video       : n_frames = max(1, n_chars // 40), frame = 500 bytes
                bytes = 8 + n_frames * 500
Transforms:
- resize (image): target height 64, width scaled w64 = max(1,
  (width * 64) // height); out = 16 + (w64 * 64) // 16
- frame-sample (video): every 10th frame, n_sampled = 1 +
  (n_frames - 1) // 10; out = 8 + n_sampled * 500
- features (audio): 8 ints, feature i = first 7 md5 hex chars of
  "{doc_id}:{i}" as int (md5-derived => identical in Spark/DuckDB)
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FRAME_BYTES = 500
RESIZE_H = 64
SAMPLE_EVERY = 10

MEDIA_SCHEMA = (
    "doc_id BIGINT, kind STRING, width INT, height INT, duration_ms BIGINT,"
    " n_frames INT, content BINARY"
)


def _stream(seed: bytes, n: int) -> bytes:
    out = bytearray()
    ctr = 0
    while len(out) < n:
        out.extend(hashlib.sha256(seed + struct.pack(">Q", ctr)).digest())
        ctr += 1
    return bytes(out[:n])


def _image_bytes(doc_id: int, w: int, h: int) -> bytes:
    return b"IMGX" + struct.pack(">II", w, h) + _stream(f"img:{doc_id}".encode(), 4 + (w * h) // 16)


def _audio_bytes(doc_id: int, duration_ms: int) -> bytes:
    return b"AUDX" + struct.pack(">QI", duration_ms, 0) + _stream(f"aud:{doc_id}".encode(), 4 + duration_ms // 4)


def _video_bytes(doc_id: int, n_frames: int) -> bytes:
    head = b"VIDX" + struct.pack(">I", n_frames)
    frames = [_stream(f"vid:{doc_id}:{i}".encode(), FRAME_BYTES) for i in range(n_frames)]
    return head + b"".join(frames)


def documents_to_media(documents: DataFrame) -> DataFrame:
    """Materialize a mixed media table: one opaque binary column plus
    typed metadata, kind-routed by doc_id % 3. (STUB for a binaryFile
    scan of a real media lake.)"""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                doc_id, n_chars = int(doc_id), int(n_chars)
                kind = ("image", "audio", "video")[doc_id % 3]
                w = 100 + n_chars % 512
                h = 100 + (n_chars * 7) % 512
                dur = n_chars * 50
                nf = max(1, n_chars // 40)
                if kind == "image":
                    content, dur, nf = _image_bytes(doc_id, w, h), 0, 0
                elif kind == "audio":
                    content, w, h, nf = _audio_bytes(doc_id, dur), 0, 0, 0
                else:
                    content, w, h, dur = _video_bytes(doc_id, nf), 0, 0, 0
                rows.append((doc_id, kind, w, h, dur, nf, content))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "kind", "width", "height", "duration_ms", "n_frames", "content"],
            )

    return documents.select("doc_id", "n_chars").mapInPandas(encode, MEDIA_SCHEMA)


def resize_images(media: DataFrame) -> DataFrame:
    """Aspect-preserving resize to height 64 (STUB for PIL resize —
    real impl decodes, resamples, re-encodes; the fake re-derives a
    payload of the modeled size)."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, w, h, content in zip(pdf["doc_id"], pdf["width"], pdf["height"], pdf["content"]):
                doc_id, w, h = int(doc_id), int(w), int(h)
                if bytes(content)[:4] != b"IMGX":
                    raise ValueError("resize_images fed a non-image row")
                w64 = max(1, (w * RESIZE_H) // h)
                out = b"IMGX" + struct.pack(">II", w64, RESIZE_H) + _stream(
                    f"rsz:{doc_id}".encode(), 4 + (w64 * RESIZE_H) // 16
                )
                rows.append((doc_id, w64, RESIZE_H, len(out)))
            yield pd.DataFrame(rows, columns=["doc_id", "out_width", "out_height", "out_bytes"])

    return media.where("kind = 'image'").mapInPandas(
        work, "doc_id BIGINT, out_width INT, out_height INT, out_bytes BIGINT"
    )


def sample_video_frames(media: DataFrame) -> DataFrame:
    """Every-10th-frame sampling (STUB for ffmpeg frame extraction);
    parses the real frame layout of the fake container."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                raw = bytes(content)
                if raw[:4] != b"VIDX":
                    raise ValueError("sample_video_frames fed a non-video row")
                nf = struct.unpack(">I", raw[4:8])[0]
                frames = [
                    raw[8 + i * FRAME_BYTES : 8 + (i + 1) * FRAME_BYTES]
                    for i in range(0, nf, SAMPLE_EVERY)
                ]
                out = b"VIDX" + struct.pack(">I", len(frames)) + b"".join(frames)
                rows.append((int(doc_id), nf, len(frames), len(out)))
            yield pd.DataFrame(rows, columns=["doc_id", "n_frames", "n_sampled", "out_bytes"])

    return media.where("kind = 'video'").mapInPandas(
        work, "doc_id BIGINT, n_frames INT, n_sampled INT, out_bytes BIGINT"
    )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """8-dim integer feature vector per audio row (STUB for an MFCC-ish
    extractor): feature i = 28-bit int from md5(f'{doc_id}:{i}') —
    md5-derived so a SQL oracle recomputes it exactly."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                if bytes(content)[:4] != b"AUDX":
                    raise ValueError("extract_audio_features fed a non-audio row")
                doc_id = int(doc_id)
                feats = [
                    int(hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()[:7], 16)
                    for i in range(8)
                ]
                rows.append((doc_id, *feats))
            yield pd.DataFrame(rows, columns=["doc_id"] + [f"f{i}" for i in range(8)])

    schema = "doc_id BIGINT, " + ", ".join(f"f{i} BIGINT" for i in range(8))
    return media.where("kind = 'audio'").mapInPandas(work, schema)
