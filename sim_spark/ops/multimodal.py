"""Multimodal (binary) column plumbing (driver mandate: multimodal columns).

Images/audio/video are opaque ``binary`` columns with typed metadata
alongside. The Spark-side machinery here is real — schema, Arrow
batching, mapInPandas signature, partition behavior — while the actual
media decoding is STUBBED (`NotImplementedError`): the decode libraries
(PIL/ffmpeg/etc.) are not in this container, and nothing in the engine's
planning depends on them. Swap `decode_stub` for a real decoder and the
pipeline shape is unchanged.

At 100 TB: binary payloads ride in parquet with the metadata columns;
`mapInPandas` processes one Arrow batch at a time so executor memory is
bounded by batch size × payload size, and decode parallelism equals
partition count — tune `spark.sql.files.maxPartitionBytes` so one
partition's payloads fit the worker.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

BINARY_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("head_hex", T.StringType()),
        T.StructField("n_chunks", T.LongType()),
    ]
)

CHUNK = 4096


def decode_stub(payload: bytes) -> None:
    """STUB for the media decode step (image/audio/video → tensor).

    Deliberately unimplemented: decode libraries are absent here. The
    surrounding plumbing (schema, batching, UDF signature) is the real,
    tested part."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "environment; plug a decoder in here — the Spark plumbing is ready"
    )


def _features_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": payloads.map(len).astype("int64"),
                "head_hex": payloads.map(lambda b: bytes(b[:8]).hex().upper()),
                "n_chunks": payloads.map(
                    lambda b: (len(b) + CHUNK - 1) // CHUNK
                ).astype("int64"),
            }
        )


def binary_features(df: DataFrame) -> DataFrame:
    """Feature-extract over a (doc_id, payload: binary) DataFrame via
    mapInPandas — the deterministic stand-in for the decode step."""
    return df.mapInPandas(_features_batches, BINARY_FEATURES_SCHEMA)


# --- frame sampling (video-shaped payloads) ---------------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.LongType()),
        T.StructField("frame_sig", T.StringType()),
    ]
)

FRAME_SIZE = 64
FRAME_STRIDE = 2
_SIG_BYTES = 8


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """1→N row expansion per Arrow batch: every ``FRAME_STRIDE``-th
    fixed-size frame of each payload, signature = hex of its head bytes.
    A real video pipeline swaps the signature for `decode_stub` output;
    the fan-out shape, schema, and batch handling are what's tested."""
    for pdf in batches:
        ids, frames, sigs = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            n_frames = (len(raw) + FRAME_SIZE - 1) // FRAME_SIZE
            for f in range(0, n_frames, FRAME_STRIDE):
                ids.append(doc_id)
                frames.append(f)
                sigs.append(raw[f * FRAME_SIZE : f * FRAME_SIZE + _SIG_BYTES].hex().upper())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_no": pd.Series(frames, dtype="int64"),
                "frame_sig": pd.Series(sigs, dtype="object"),
            }
        )


def frame_sample(df: DataFrame) -> DataFrame:
    """Sample frames from (doc_id, payload: binary): mapInPandas emits a
    row per kept frame. Output cardinality is data-dependent (unlike a
    pandas_udf, which is 1:1) — the reason this plumbing must be
    mapInPandas."""
    return df.mapInPandas(_frame_batches, FRAME_SCHEMA)


# --- resize (image-shaped metadata) -----------------------------------------

RESIZE_TARGET = 224


def resize_dims(df: DataFrame, w_col: str = "width", h_col: str = "height") -> DataFrame:
    """Fit-within-target resize arithmetic as an Arrow-vectorized pandas
    UDF (numpy whole-column math — the shape a real resize kernel plugs
    into; pixel work would happen next to this, on the decoded buffer).
    No upscaling; floor(x+0.5) rounding so the decision is engine-
    portable (np.round/SQL ROUND disagree on half-values)."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("bigint")
    def _scaled(dim: pd.Series, other: pd.Series) -> pd.Series:
        d = dim.to_numpy(dtype=np.float64)
        o = other.to_numpy(dtype=np.float64)
        scale = np.minimum(1.0, RESIZE_TARGET / np.maximum(d, o))
        return pd.Series(np.floor(d * scale + 0.5).astype(np.int64))

    return df.withColumn("out_w", _scaled(F.col(w_col), F.col(h_col))).withColumn(
        "out_h", _scaled(F.col(h_col), F.col(w_col))
    )


def write_payload_dir(df: DataFrame, out_dir: str) -> None:
    """Materialize a (doc_id, payload: binary) frame as one opaque file
    per document under ``out_dir`` — executor-side (each task writes its
    own partition's files; nothing routes through the driver), the
    ingest half of the `binaryFile` source round-trip. On a cluster
    ``out_dir`` is a shared filesystem/object-store path; here it is the
    per-process scratch root."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with open(os.path.join(out_dir, f"{int(doc_id)}.bin"), "wb") as f:
                    f.write(bytes(payload))
            n += len(pdf)
        yield pd.DataFrame({"n_written": [n]})

    (
        df.select("doc_id", "payload")
        .mapInPandas(_write, "n_written long")
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
