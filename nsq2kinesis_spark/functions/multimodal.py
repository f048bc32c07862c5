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
    b"BM": "bmp",
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


def parse_image_dimensions(data: bytes) -> tuple[int, int] | None:
    """REAL (width, height) from the container structure of PNG / GIF /
    BMP / JPEG — pure struct parsing of public file formats, no codec
    library and no pixel decompression (dimensions live in fixed header
    fields; JPEG requires walking the marker stream to the SOF segment).
    Returns None for formats whose dimensions genuinely need a codec."""
    import struct

    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        # IHDR is mandatory-first: width/height at bytes 16..24, big-endian
        w, h = struct.unpack(">II", data[16:24])
        return w, h
    if data[:4] == b"GIF8" and len(data) >= 10:
        # logical screen descriptor, little-endian u16 pair at bytes 6..10
        w, h = struct.unpack("<HH", data[6:10])
        return w, h
    if data[:2] == b"BM" and len(data) >= 26:
        # Only the BITMAPINFOHEADER family stores i32 width/height at
        # offset 18 — verify the DIB header-size field first; the legacy
        # 12-byte BITMAPCOREHEADER (u16 dims) would otherwise parse as
        # garbage, and "structurally unknown" must mean None, not wrong.
        dib_size = struct.unpack("<I", data[14:18])[0]
        if dib_size not in (40, 52, 56, 64, 108, 124):
            return None
        w, h = struct.unpack("<ii", data[18:26])
        return w, abs(h)  # negative height = top-down rows
    if data[:3] == b"\xff\xd8\xff":
        # walk JPEG markers to a start-of-frame (SOF0..SOF15, excluding
        # DHT/JPG/DAC): segment payload is [precision u8, height u16,
        # width u16, ...], big-endian
        i = 2
        while i + 9 <= len(data):
            if data[i] != 0xFF:
                return None  # desynchronized marker stream
            # any number of 0xFF fill bytes may pad before a marker
            while i + 1 < len(data) and data[i + 1] == 0xFF:
                i += 1
            if i + 9 > len(data):
                return None  # fill skip consumed the tail; truncated stream
            marker = data[i + 1]
            if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers (incl. EOI) carry no length
                continue
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return w, h
            i += 2 + seg_len
    return None


def parse_wav_meta(data: bytes) -> dict | None:
    """REAL audio metadata from a RIFF/WAVE container: channels, sample
    rate, bits per sample, and duration derived from the data-chunk byte
    count — again pure public-format struct parsing, no audio library.
    Returns None if the payload is not a WAVE file."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    meta: dict = {}
    i = 12
    while i + 8 <= len(data):
        chunk_id = data[i : i + 4]
        chunk_len = struct.unpack("<I", data[i + 4 : i + 8])[0]
        if chunk_id == b"fmt " and chunk_len >= 16 and i + 24 <= len(data):
            # chunk_len >= 16 guards the PCM WAVEFORMATEX layout: a legacy
            # 14-byte WAVEFORMAT has no wBitsPerSample and reading past it
            # would take the next chunk's header bytes as the bit depth
            _fmt, channels, rate = struct.unpack("<HHI", data[i + 8 : i + 16])
            bits = struct.unpack("<H", data[i + 22 : i + 24])[0]
            meta.update(channels=channels, sample_rate=rate, bits_per_sample=bits)
        elif chunk_id == b"data":
            meta["data_bytes"] = chunk_len
        i += 8 + chunk_len + (chunk_len & 1)  # chunks are word-aligned
    if {"channels", "sample_rate", "bits_per_sample", "data_bytes"} <= meta.keys():
        bytes_per_s = meta["sample_rate"] * meta["channels"] * meta["bits_per_sample"] // 8
        meta["duration_s"] = meta["data_bytes"] / bytes_per_s if bytes_per_s else None
    return meta


def structural_decode(data: bytes) -> tuple[int, int]:
    """Dimension decode via the pure-structural parsers above. Raises
    NotImplementedError for formats that genuinely need a codec library,
    ValueError for a recognized image container whose structure doesn't
    parse (truncated/corrupt — a codec would fail on it too)."""
    dims = parse_image_dimensions(data)
    if dims is None:
        fmt = sniff_format(data)
        if fmt in ("png", "gif", "bmp", "jpeg"):
            raise ValueError(f"corrupt or truncated {fmt} container")
        raise NotImplementedError(
            f"format {fmt!r} needs a codec library (install Pillow) "
            "or is not an image"
        )
    return dims


def real_decode(data: bytes) -> tuple[int, int]:
    """Real decode path: Pillow when available (full codec coverage),
    otherwise the dependency-free structural parser (PNG/GIF/BMP/JPEG
    dimensions from their public container headers)."""
    try:
        import io

        from PIL import Image  # optional dependency, absent in this image

        with Image.open(io.BytesIO(data)) as im:
            return im.width, im.height
    except ImportError:
        return structural_decode(data)


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
                try:
                    width, height = decode_fn(data)
                except Exception:  # noqa: BLE001 - any decode failure degrades, never kills the stage
                    # one corrupt/undecodable payload must not fail the
                    # whole Spark stage — degrade to null dimensions (the
                    # same convention as empty payloads) and keep the row
                    width = height = None
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


def byte_features(df: DataFrame) -> DataFrame:
    """Feature extraction over opaque payloads (the 'feature-extract' verb
    of the multimodal pipeline): per-payload byte statistics — count, mean
    byte value, distinct-byte cardinality — as one Arrow-batched pass.
    With a real vision/audio model this function body becomes the
    embedding call; the schema/batching/no-shuffle shape is identical."""
    from collections.abc import Iterator

    def feat_batches(batches: Iterator) -> Iterator:
        import math

        import pandas as pd

        def round_half_up(x: float, nd: int = 6) -> float:
            # Python round() is banker's (half-to-even); the SQL oracle's
            # ROUND is half away from zero — ties at the 6th decimal (e.g.
            # odd byte sums over power-of-two lengths, exact in binary)
            # would diverge. x is always >= 0 here.
            scale = 10**nd
            return math.floor(x * scale + 0.5) / scale

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    rows.append((doc_id, 0, None, 0))
                    continue
                data = bytes(payload)
                rows.append(
                    (
                        doc_id,
                        len(data),
                        round_half_up(sum(data) / len(data)),
                        len(set(data)),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "mean_byte", "n_distinct_bytes"]
            )

    return df.select("doc_id", "payload").mapInPandas(
        feat_batches, "doc_id long, n_bytes long, mean_byte double, n_distinct_bytes int"
    )


def byte_resize(df: DataFrame, stride: int = 4) -> DataFrame:
    """Resize/downsample over opaque payloads (the 'resize' verb): keep
    every ``stride``-th byte — the deterministic stand-in for a pixel
    resampler (a real one swaps the slice for cv2/PIL resize; the
    Arrow-batched plumbing and output schema stay put)."""
    import hashlib
    from collections.abc import Iterator

    def resize_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    # same null contract as byte_features: keep the row
                    # with empty output rather than dropping the document
                    rows.append((doc_id, None, 0, None))
                    continue
                thumb = bytes(payload)[::stride]
                rows.append(
                    (doc_id, thumb, len(thumb), hashlib.md5(thumb).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "thumb", "thumb_bytes", "thumb_hash"]
            )

    return df.select("doc_id", "payload").mapInPandas(
        resize_batches,
        "doc_id long, thumb binary, thumb_bytes long, thumb_hash string",
    )
