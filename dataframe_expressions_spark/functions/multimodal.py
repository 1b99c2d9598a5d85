"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
decode / feature-extraction as Arrow-batched ``mapInPandas`` stages.

The image/audio codec LIBRARIES are not in this container, but as of
round 9 ``strict=True`` decode is no longer a pure stub: BMP payloads
(the one mainstream raster format parseable from public byte-layout
knowledge with no library at all) decode REAL width/height from real
header bytes — ``make_bmp`` builds deterministic fixtures, and
``NotImplementedError`` remains only for formats that genuinely need
PIL/libav (JPEG/PNG/video).  The default (non-strict) path keeps the
deterministic fake dimensions so the oracle-checked queries are
byte-stable.  Everything Spark-side is real and tested either way: the
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
    "DECODED_SCHEMA",
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
        return int(w), int(h)
    w, h = struct.unpack_from("<ii", buf, 18)
    return int(w), abs(int(h))


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


def decode_meta(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode each payload to (width, height) via mapInPandas.

    ``strict=True`` runs the REAL codec: BMP headers decode actual
    dimensions from actual bytes (``bmp_dims``); any non-BMP payload
    raises ``NotImplementedError`` — the formats that genuinely need
    PIL/libav, which this container lacks.  The default path computes
    deterministic fake dimensions from the byte length so the full
    Arrow plumbing is exercised and oracle-checkable on the synthetic
    corpus (whose payloads are not BMPs)."""

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            n = pdf["img_bytes"].map(len)
            if strict:
                dims = [bmp_dims(bytes(b)) for b in pdf["img_bytes"]]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "n_bytes": n,
                        "width": [d[0] for d in dims],
                        "height": [d[1] for d in dims],
                    }
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

    return media.mapInPandas(decode, DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_off", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def frame_sample(media: DataFrame, every: int = 256, strict: bool = False) -> DataFrame:
    """Sample fixed-stride 'frames' from each payload (1 output row per
    frame — the explode-shaped mapInPandas pattern a video pipeline uses).

    The codec is stubbed: a 'frame' is the 16-byte slice at each stride
    offset.  Real decoders drop into the same iterator — one input batch
    yields a variable number of output rows, and Arrow handles the fan-out.
    """

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real frame extraction requires libav (not in container)"
                )
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_off": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["img_bytes"]):
                buf = bytes(payload)
                for idx, off in enumerate(range(0, len(buf), every)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_off"].append(off)
                    out["frame_bytes"].append(buf[off : off + 16])
            yield pd.DataFrame(out)

    return media.mapInPandas(sample, FRAME_SCHEMA)
