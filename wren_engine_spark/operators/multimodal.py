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


RESIZE_SCHEMA = "doc_id BIGINT, payload BINARY, width INT, height INT, status STRING"


def resize_stub(payloads: DataFrame, width: int = 64, height: int = 48) -> DataFrame:
    """STUB image resize via mapInPandas: a real implementation calls
    PIL.Image.resize per batch. The fake keeps width*height bytes of the
    payload (truncate/tile) so output size is deterministic and the
    Arrow batch shape matches a real resize (binary out, typed dims)."""
    target = width * height

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def fake_resize(b: bytes) -> bytes:
                if len(b) >= target:
                    return bytes(b[:target])
                reps = target // max(len(b), 1) + 1
                return bytes((b * reps)[:target])

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(fake_resize),
                    "width": width,
                    "height": height,
                    "status": "stub_resized",
                }
            )

    return payloads.select("doc_id", "payload").mapInPandas(_batches, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id BIGINT, frame_idx BIGINT, frame_bytes BIGINT, status STRING"


def frame_sample_stub(payloads: DataFrame, bytes_per_frame: int = 256) -> DataFrame:
    """STUB video frame sampling: 1 -> N rows per payload via
    mapInPandas (the real version seeks keyframes with ffmpeg). Emits
    one row per ``bytes_per_frame`` chunk — deterministic, so the
    fan-out is SQL-oracle-checkable: frame_idx in [0, len div bpf]."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                nframes = n // bytes_per_frame + 1
                for i in range(nframes):
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(min(bytes_per_frame, n - i * bytes_per_frame))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_bytes": sizes,
                    "status": "stub_frame",
                }
            )

    return payloads.select("doc_id", "payload").mapInPandas(_batches, FRAME_SCHEMA)


FEATURE_DIM = 8
FEATURE_SCHEMA = f"doc_id BIGINT, feature ARRAY<DOUBLE>"


def extract_features_stub(payloads: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """STUB embedding extraction: payload -> fixed-dim float vector via
    mapInPandas (a real version runs a vision/audio encoder per Arrow
    batch). The fake is position-weighted byte sums mod 97 — cheap,
    deterministic, and shaped exactly like a model output, so the
    result feeds the similarity operators (cosine_topk / ivf_topk)
    unchanged."""

    import numpy as np

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                # vectorized position-bucketed byte sums: modular addition
                # is associative, so summing per bucket then reducing
                # mod 97 equals the per-byte sequential definition
                arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                if len(arr) % dim:
                    arr = np.pad(arr, (0, dim - len(arr) % dim))
                v = arr.reshape(-1, dim).sum(axis=0) % 97
                feats.append([float(x) for x in v])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return payloads.select("doc_id", "payload").mapInPandas(_batches, FEATURE_SCHEMA)


def real_decode_example() -> None:
    """Where a real decoder would plug in. Kept as an explicit stub."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; wire PIL/torchaudio/ffmpeg into _decode_batches"
    )
