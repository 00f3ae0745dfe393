"""Multimodal column plumbing: opaque binary payloads + typed metadata.

BASELINE.json:6 mandates multimodal columns. The Spark-side design is
real and tested end-to-end — ``BinaryType`` payload column, typed
metadata struct, Arrow-batched ``mapInPandas`` feature extraction with
an explicit output schema and bounded batch sizes. The *decoder* is
where image/audio libraries would plug in; they are not in this
environment, so decoding is a clearly-marked deterministic stand-in
(STUB) behind the same interface: byte-level features that any real
decoder would replace.

At 100 TB: payloads stay columnar in parquet (binary), feature
extraction is a narrow mapInPandas stage (no shuffle), and batch size
is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so
executor memory is independent of payload count.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "doc_id long, mime string, n_bytes long, features array<float>"
)


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a column as an opaque binary payload with typed metadata —
    the schema shape a real image/audio table would have."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> np.ndarray:
    """STUB decoder: deterministic byte-level features standing in for a
    real image/audio decode (libraries unavailable here). A real
    implementation would replace ONLY this function; the Spark plumbing
    (schema, batching, partitioning) is unchanged."""
    if payload is None or len(payload) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    a = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(a, FEATURE_DIM)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)


def extract_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (mapInPandas: per-partition batch iterator, zero shuffle)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "features": [list(_decode_stub(p)) for p in pdf["payload"]],
                }
            )

    return payloads.mapInPandas(op, schema=FEATURES_SCHEMA)
