"""Multimodal column plumbing (decode stubbed).

Treats media as opaque ``binary`` payload columns with typed metadata,
decoded via ``mapInPandas`` in Arrow batches — the shape a real
image/audio pipeline takes on Spark. The actual codec libraries are not
in this container, so the decode step is a clearly-marked deterministic
fake (features derived from the payload bytes themselves); the
Spark-side plumbing — schema, batch iteration, UDF signature — is real
and oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def fake_decode_image(payload: bytes) -> dict:
    """STUB: stands in for a real image decode (no codec libs in this
    container). Deterministic features from the payload bytes so the
    pipeline is testable end-to-end. A real deployment swaps this single
    function for PIL/ffmpeg and keeps every Spark-side line unchanged."""
    if not payload:
        raise NotImplementedError("real decoder required for empty payloads")
    return {
        "width": payload[0],
        "height": payload[1] if len(payload) > 1 else 0,
        "n_bytes": len(payload),
        "mean_byte": sum(payload) / len(payload),
    }


def decode_media(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """mapInPandas over Arrow batches: (id, binary payload) -> features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[payload_col].map(fake_decode_image)
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": feats.map(lambda f: f["width"]).astype("int32"),
                    "height": feats.map(lambda f: f["height"]).astype("int32"),
                    "n_bytes": feats.map(lambda f: f["n_bytes"]).astype("int64"),
                    "mean_byte": feats.map(lambda f: round(f["mean_byte"], 6)),
                }
            )
            yield out

    return df.mapInPandas(run, DECODED_SCHEMA)


RESIZE_MAX_DIM = 64

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("scale", T.DoubleType()),
    ]
)


def resize_media(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas resize: fit each image inside RESIZE_MAX_DIM while
    preserving aspect ratio. The pixel resample itself is the stubbed
    codec step (PIL absent); the dimension arithmetic, batch shape and
    UDF signature — the Spark-side work — are real and oracle-checked."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                f = fake_decode_image(payload)
                w, h = f["width"], f["height"]
                m = max(w, h)
                if m <= RESIZE_MAX_DIM:
                    ow, oh, scale = w, h, 1.0
                else:
                    scale = RESIZE_MAX_DIM / m
                    ow = int(w * RESIZE_MAX_DIM / m)  # floor
                    oh = int(h * RESIZE_MAX_DIM / m)
                rows.append((int(doc_id), w, h, ow, oh, round(scale, 6)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            ).astype(
                {
                    "doc_id": "int64",
                    "width": "int32",
                    "height": "int32",
                    "out_width": "int32",
                    "out_height": "int32",
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


FRAME_BYTES = 4
FRAME_STEP = 2

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sum", T.LongType()),
    ]
)


def sample_frames(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas frame sampling: treat the payload as a frame stream
    (FRAME_BYTES bytes per frame), keep every FRAME_STEP-th frame, emit
    one row per sampled frame — the 1→N fan-out shape a real video
    pipeline has (decode is the stubbed step; the per-frame feature here
    is the byte sum so the output is deterministic and oracle-checked)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n_frames = len(payload) // FRAME_BYTES
                for i in range(0, n_frames, FRAME_STEP):
                    chunk = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    rows.append((int(doc_id), i, int(sum(chunk))))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES_SCHEMA.fields]).astype(
                {"doc_id": "int64", "frame_idx": "int32", "frame_sum": "int64"}
            )

    return df.mapInPandas(run, FRAMES_SCHEMA)


def with_fake_payload(docs: DataFrame) -> DataFrame:
    """Synthesize a deterministic binary payload column (md5 digest bytes
    of the text) so the multimodal path has real binary plumbing to chew
    on without shipping media files."""
    return docs.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
