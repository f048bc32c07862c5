"""Multimodal (image/audio/video) column processing for LLM data pipelines.

Design (north-star extension, BASELINE.json): media travel as opaque
``binary`` columns with typed metadata structs — the same black-box-bytes
stance as the reference's message bodies (proto/aggregation.proto:20),
upgraded with schemas. All per-byte work runs in Arrow-batched
``mapInPandas`` so executors stream batches without JVM↔Python row churn.

The actual codec calls (Pillow/librosa/av) are NOT in this image, so decode
is gated: ``decode_fn`` defaults to a deterministic structural parser that
understands the magic headers of common formats (enough to exercise the
real plumbing: schema, batching, partitioning, null handling). Swapping in
a real codec is a one-argument change; the Spark plan is identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "doc_id long, format string, width int, height int, n_bytes long, content_hash string"
)

_MAGIC = {
    b"\x89PNG\r\n\x1a\n": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"RIFF": "riff",  # wav/avi container
    b"ID3": "mp3",
}


def sniff_format(data: bytes) -> str:
    for magic, fmt in _MAGIC.items():
        if data[: len(magic)] == magic:
            return fmt
    return "unknown"


def fake_decode(data: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a pixel decode: derives a stable (width,
    height) from the content hash. Replace with e.g. PIL.Image.open for a
    real deployment (lib not in this image).
    """
    h = hashlib.sha256(data).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def real_decode(data: bytes) -> tuple[int, int]:
    """Real codec path — gated on optional deps not present in this image."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image codec not available in this environment; use fake_decode "
            "or install Pillow"
        ) from e
    import io

    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        return im.width, im.height


def extract_media_meta(df: DataFrame, decode_fn=fake_decode) -> DataFrame:
    """(doc_id, payload: binary) → typed metadata rows.

    One pass, Arrow-batched; at 100 TB this runs embarrassingly parallel
    over the scan with no shuffle. Null/empty payloads yield format
    'empty' with null dims rather than failing the batch.
    """
    def meta_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    rows.append((doc_id, "empty", None, None, 0, None))
                    continue
                data = bytes(payload)
                width, height = decode_fn(data)
                rows.append(
                    (
                        doc_id,
                        sniff_format(data),
                        width,
                        height,
                        len(data),
                        hashlib.md5(data).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "format", "width", "height", "n_bytes", "content_hash"],
            )

    return df.select("doc_id", "payload").mapInPandas(meta_batches, MEDIA_META_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' over binary payloads: emit up to max_frames slices
    per payload (one row per frame) — the explode-shaped plumbing a video
    pipeline needs (frame extraction itself would be the codec call)."""
    def sample_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                for i in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    chunk = data[i * every_n_bytes : (i + 1) * every_n_bytes]
                    out.append((doc_id, i, chunk, hashlib.md5(chunk).hexdigest()))
            yield pd.DataFrame(out, columns=["doc_id", "frame_no", "frame", "frame_hash"])

    return df.select("doc_id", "payload").mapInPandas(
        sample_batches, "doc_id long, frame_no int, frame binary, frame_hash string"
    )
