"""Multimodal (binary) column plumbing.

Images/audio/video are carried as opaque ``binary`` columns with typed
metadata, processed via Arrow-batched ``mapInPandas`` — the Spark-side
schema, partitioning and batch shape are real; the actual media decode is
STUBBED (decode libraries are not in this container) with a clearly
deterministic fake so the pipeline is testable end-to-end and the decode
metadata has a SQL oracle.

At scale: binary payloads stay columnar (parquet binary), batches stream
through Arrow without row-at-a-time Python overhead, and the UDF is a
narrow map — no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, fake_width BIGINT, fake_height BIGINT, status STRING"
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + media metadata."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decode: a real implementation would call PIL/ffmpeg here.
    Emits deterministic fake dimensions derived from the byte length so
    the whole pipeline remains oracle-checkable."""
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "fake_width": n_bytes % 640,
                "fake_height": (n_bytes * 7) % 480,
                "status": "stub_decoded",
            }
        )


def decode_stub(payloads: DataFrame) -> DataFrame:
    """Run the (stubbed) decoder over binary payloads via mapInPandas."""
    return payloads.select("doc_id", "payload").mapInPandas(_decode_batches, DECODE_SCHEMA)


def real_decode_example() -> None:
    """Where a real decoder would plug in. Kept as an explicit stub."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; wire PIL/torchaudio/ffmpeg into _decode_batches"
    )
