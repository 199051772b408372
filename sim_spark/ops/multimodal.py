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
