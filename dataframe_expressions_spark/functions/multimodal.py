"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
decode / feature-extraction as Arrow-batched ``mapInPandas`` stages.

The image/audio codec LIBRARIES are not in this container, but
``strict=True`` decode is no longer a pure stub: BMP payloads decode REAL
width/height (round 9), RIFF/WAVE payloads decode REAL sample rate /
channels / duration (round 10), and the strict frame sampler demuxes a
real multi-frame container (concatenated self-sized BMP frames, round 10)
— all from public byte-layout knowledge with no library at all.
``make_bmp`` / ``make_wav`` / ``make_bmp_container`` build deterministic
fixtures, and ``NotImplementedError`` remains only for formats that
genuinely need PIL/libav (JPEG/PNG/compressed audio/real video).  The
default (non-strict) paths keep the deterministic fake dimensions so the
oracle-checked queries are byte-stable.  Everything Spark-side is real and tested either way: the
binary column, the metadata struct schema, the ``mapInPandas``
signature, Arrow batching, and partition behavior.

Scale notes: binary payloads ride in the same parquet row groups as their
metadata; ``mapInPandas`` streams Arrow batches so a 100 TB decode job is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` × row size per
worker, not by partition size.  Feature extraction lands back as plain
columns → downstream is ordinary relational Spark.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "attach_fake_image",
    "bmp_dims",
    "decode_meta",
    "frame_sample",
    "make_bmp",
    "make_bmp_container",
    "make_wav",
    "wav_meta",
    "DECODED_SCHEMA",
    "DECODED_STRICT_SCHEMA",
    "FRAME_SCHEMA",
]


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Build a minimal valid 24-bit BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER + pixel array) — a deterministic fixture for the
    strict decode path.  Layout is the public Windows BMP format: 14-byte
    file header (``BM``, file size, reserved, pixel-data offset), 40-byte
    info header (size, int32 LE width/height, planes, bpp, ...), rows
    padded to 4 bytes."""
    import struct

    row = ((width * 3 + 3) // 4) * 4
    pix = bytes((seed + i) % 256 for i in range(row * height))
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix),
        2835, 2835, 0, 0,
    )
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
    return hdr + dib + pix


def bmp_dims(buf: bytes) -> "tuple[int, int]":
    """Parse (width, height) from BMP header bytes — the real codec the
    strict path runs.  Supports the 40-byte+ BITMAPINFOHEADER family
    (int32 LE dims at offset 18/22; negative height = top-down row
    order) and the legacy 12-byte BITMAPCOREHEADER (uint16 dims).
    Raises ``NotImplementedError`` for anything that is not a BMP —
    decoding JPEG/PNG/video genuinely needs PIL/libav."""
    import struct

    if len(buf) < 26 or buf[:2] != b"BM":
        raise NotImplementedError(
            "not a BMP payload; real image decode requires PIL/libav "
            "(not in container)"
        )
    dib = struct.unpack_from("<I", buf, 14)[0]
    if dib == 12:  # BITMAPCOREHEADER: uint16 dims
        w, h = struct.unpack_from("<HH", buf, 18)
    else:
        w, h = struct.unpack_from("<ii", buf, 18)
    # negative int32 height = top-down row order (valid; normalize), but
    # a non-positive width or zero height is a corrupt header — reject
    # loudly instead of emitting a negative-width row (round-10 ADVICE),
    # matching the non-BMP rejection path above.
    if w <= 0 or h == 0:
        raise ValueError(
            f"malformed BMP header: width={int(w)}, height={int(h)}"
        )
    return int(w), abs(int(h))


def make_wav(
    sample_rate: int = 8000,
    channels: int = 1,
    n_samples: int = 16,
    bits: int = 16,
    seed: int = 0,
) -> bytes:
    """Build a minimal valid PCM WAV (RIFF/WAVE with canonical ``fmt `` +
    ``data`` chunks) — the deterministic audio fixture for the strict
    decode path.  Layout is the public RIFF/WAVE format: 12-byte RIFF
    header, 16-byte PCM fmt chunk (format tag 1, uint16 channels, uint32
    sample rate, byte rate, block align, bits per sample), then the
    sample data."""
    import struct

    block_align = channels * bits // 8
    data = bytes((seed + i) % 256 for i in range(n_samples * block_align))
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_meta(buf: bytes) -> "tuple[int, int, int, int]":
    """Parse ``(sample_rate, channels, n_frames, duration_ms)`` from real
    RIFF/WAVE header bytes — the second real codec the strict path runs
    (round-10; public byte-layout knowledge, no library needed).  Walks
    the chunk list (word-aligned, per the RIFF spec) to the ``fmt `` and
    ``data`` chunks.  Raises ``NotImplementedError`` for anything that is
    not RIFF/WAVE (compressed audio genuinely needs libav) and
    ``ValueError`` for a malformed WAV (missing chunks, zero channels /
    rate / block align) — the same loud-rejection discipline as
    ``bmp_dims``."""
    import struct

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise NotImplementedError(
            "not a RIFF/WAVE payload; real audio decode requires libav "
            "(not in container)"
        )
    sample_rate = channels = block_align = None
    data_size = None
    off = 12
    while off + 8 <= len(buf):
        cid = buf[off : off + 4]
        (size,) = struct.unpack_from("<I", buf, off + 4)
        if cid == b"fmt " and size >= 16 and off + 8 + 16 <= len(buf):
            _tag, channels, sample_rate, _brate, block_align, _bits = (
                struct.unpack_from("<HHIIHH", buf, off + 8)
            )
        elif cid == b"data":
            if size > len(buf) - off - 8:
                # Declared data chunk overruns the buffer: a truncated
                # payload.  Raise rather than clamp — silently computing
                # a duration over whatever bytes remain breaks the
                # module's loud-rejection discipline (bmp_dims and the
                # container walker both raise on truncation; round-10
                # ADVICE).
                raise ValueError(
                    f"malformed WAV: data chunk declares {size} bytes "
                    f"but only {len(buf) - off - 8} remain"
                )
            data_size = size
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data_size is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    if not sample_rate or not channels or not block_align:
        raise ValueError(
            f"malformed WAV header: rate={sample_rate}, "
            f"channels={channels}, block_align={block_align}"
        )
    n_frames = data_size // block_align
    duration_ms = (n_frames * 1000) // sample_rate
    return int(sample_rate), int(channels), int(n_frames), int(duration_ms)


def attach_fake_image(docs: DataFrame) -> DataFrame:
    """Stand-in media ingestion: utf-8 bytes of the text as the payload
    (real pipelines read image bytes from object storage the same way —
    one opaque binary column plus typed metadata)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("img_bytes"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        ).alias("media_meta"),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)

# Strict-mode output: one row per payload with a ``kind`` discriminator
# and per-kind fields NULLed where not applicable.  The strict path is
# exercised only by fixture tests (no registered query), so it can carry
# the richer schema while the oracle-checked default path keeps
# DECODED_SCHEMA byte-stable.
DECODED_STRICT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def decode_meta(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode each payload's metadata via mapInPandas.

    ``strict=True`` runs the REAL codecs, dispatching on the payload's
    magic bytes: BMP headers decode actual width/height (``bmp_dims``),
    RIFF/WAVE headers decode actual sample rate / channels / duration
    (``wav_meta``, round-10) — output is ``DECODED_STRICT_SCHEMA`` with a
    ``kind`` discriminator.  Any other payload raises
    ``NotImplementedError`` — the formats that genuinely need PIL/libav,
    which this container lacks.  The default path computes deterministic
    fake dimensions from the byte length (schema ``DECODED_SCHEMA``,
    unchanged) so the full Arrow plumbing is exercised and
    oracle-checkable on the synthetic corpus (whose payloads are neither
    BMPs nor WAVs)."""

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            n = pdf["img_bytes"].map(len)
            if strict:
                rows: dict[str, list] = {
                    "kind": [], "width": [], "height": [],
                    "sample_rate": [], "channels": [], "duration_ms": [],
                }
                for b in pdf["img_bytes"]:
                    buf = bytes(b)
                    if buf[:2] == b"BM":
                        w, h = bmp_dims(buf)
                        rows["kind"].append("image")
                        rows["width"].append(w)
                        rows["height"].append(h)
                        rows["sample_rate"].append(None)
                        rows["channels"].append(None)
                        rows["duration_ms"].append(None)
                    else:
                        sr, ch, _nf, dur = wav_meta(buf)  # raises on non-WAV
                        rows["kind"].append("audio")
                        rows["width"].append(None)
                        rows["height"].append(None)
                        rows["sample_rate"].append(sr)
                        rows["channels"].append(ch)
                        rows["duration_ms"].append(dur)
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "n_bytes": n, **rows}
                )
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "width": n % 640,
                    "height": (n * 31) % 480,
                }
            )

    return media.mapInPandas(
        decode, DECODED_STRICT_SCHEMA if strict else DECODED_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_off", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def make_bmp_container(frames: "list[bytes]") -> bytes:
    """Concatenate BMP frames into a multi-frame container — the
    public-format analogue of a video container for the strict frame
    sampler.  Each BMP self-describes its length (uint32 LE file size at
    offset 2), so a demuxer can walk frame boundaries with no index."""
    for f in frames:
        if f[:2] != b"BM":
            raise ValueError("container frames must be BMP payloads")
    return b"".join(frames)


def _walk_bmp_frames(buf: bytes) -> "list[tuple[int, bytes]]":
    """Demux a concatenated-BMP container into ``(offset, frame_bytes)``
    entries by following each frame's self-described file size.  Raises
    ``NotImplementedError`` when the payload does not start with a BMP
    frame (real video demuxing needs libav) and ``ValueError`` for a
    truncated/corrupt container — a frame whose declared size overruns
    the buffer, or trailing garbage between frames."""
    import struct

    if buf[:2] != b"BM":
        raise NotImplementedError(
            "not a BMP multi-frame container; real video demuxing "
            "requires libav (not in container)"
        )
    frames: list[tuple[int, bytes]] = []
    off = 0
    while off < len(buf):
        if buf[off : off + 2] != b"BM" or off + 6 > len(buf):
            raise ValueError(f"corrupt container: bad frame magic at {off}")
        (size,) = struct.unpack_from("<I", buf, off + 2)
        if size < 26 or off + size > len(buf):
            raise ValueError(
                f"corrupt container: frame at {off} declares {size} bytes, "
                f"{len(buf) - off} remain"
            )
        frames.append((off, buf[off : off + size]))
        off += size
    return frames


def frame_sample(media: DataFrame, every: int = 256, strict: bool = False) -> DataFrame:
    """Sample 'frames' from each payload (1 output row per sampled frame —
    the explode-shaped mapInPandas pattern a video pipeline uses).

    ``strict=True`` (round-10) demuxes a REAL multi-frame container —
    concatenated BMP frames, walked by each frame's self-described file
    size — and emits every ``every``-th WHOLE frame (decodable by
    ``bmp_dims``), with ``frame_idx`` the frame's index in the container
    and ``frame_off`` its byte offset.  Non-container payloads raise
    ``NotImplementedError`` (real video demuxing needs libav).

    The default path keeps the byte-stride stub — a 'frame' is the
    16-byte slice at each ``every``-byte offset — so the oracle-checked
    registered query is byte-stable.  Real decoders drop into the same
    iterator: one input batch yields a variable number of output rows,
    and Arrow handles the fan-out."""

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_off": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["img_bytes"]):
                buf = bytes(payload)
                if strict:
                    for idx, (off, fb) in enumerate(_walk_bmp_frames(buf)):
                        if idx % every:
                            continue
                        out["doc_id"].append(doc_id)
                        out["frame_idx"].append(idx)
                        out["frame_off"].append(off)
                        out["frame_bytes"].append(fb)
                    continue
                for idx, off in enumerate(range(0, len(buf), every)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_off"].append(off)
                    out["frame_bytes"].append(buf[off : off + 16])
            yield pd.DataFrame(out)

    return media.mapInPandas(sample, FRAME_SCHEMA)
