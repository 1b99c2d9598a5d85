"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
decode / feature-extraction as Arrow-batched ``mapInPandas`` stages.

The image/audio codecs are NOT in this container, so the actual decode is
stubbed (deterministic fake dimensions derived from the bytes, or
``NotImplementedError`` when ``strict=True``) — but everything Spark-side
is real and tested: the binary column, the metadata struct schema, the
``mapInPandas`` signature, Arrow batching, and partition behavior.

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
    "decode_meta",
    "frame_sample",
    "DECODED_SCHEMA",
    "FRAME_SCHEMA",
]


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
    """'Decode' each payload to (width, height) via mapInPandas.

    ``strict=True`` takes the real-codec path, which raises
    ``NotImplementedError`` here (no PIL/libav in this container); the
    default path computes deterministic fake dimensions from the byte
    length so the full Arrow plumbing is exercised and oracle-checkable.
    """

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real image decode requires PIL/libav (not in container)"
                )
            n = pdf["img_bytes"].map(len)
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
