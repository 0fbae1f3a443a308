"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Real training pipelines carry image/audio/video as binary columns and
run decode / resize / frame-sample as Arrow-batched Pandas UDFs. The
decode libraries (PIL/ffmpeg/...) are NOT in this container, so the
decode step is STUBBED behind ``decode_image`` (raises
``NotImplementedError``) with a deterministic fake
(``fake_decode_meta``) standing in — the Spark-side plumbing (binary
schema, ``mapInPandas`` batch shape, Arrow transfer, partition
behavior) is real and tested.

Scale notes: ``mapInPandas`` streams Arrow batches — no per-row Python,
no driver collect; binary payloads never shuffle (per-row projection).
"""

from __future__ import annotations

import numpy as np

from lucene_spark.ops import dialect as dl

MEDIA_SCHEMA = (
    "doc_id long, n_bytes long, fake_width long, fake_height long, "
    "n_frames long, content_sha string"
)


def decode_image(payload: bytes):
    """Placeholder for a real image decode (PIL/torchvision). The
    container has no imaging libraries; metadata extraction uses
    ``fake_decode_meta`` instead."""
    raise NotImplementedError("image decode libraries not available in this container")


def fake_decode_meta(n_bytes: np.ndarray) -> dict:
    """Deterministic fake of decoded-media metadata, vectorized.
    Mirrored exactly by ``media_features_oracle_sql``."""
    n = n_bytes.astype(np.int64)
    return {
        "fake_width": 64 + n % 576,
        "fake_height": 64 + (n * 7) % 416,
        "n_frames": 1 + n % 15,
    }


def media_features_df(spark, docs_df):
    """documents -> (doc_id, n_bytes, fake_width, fake_height, n_frames,
    content_sha) via binary payload + mapInPandas feature extraction."""
    import hashlib

    import pyspark.sql.functions as F

    payloads = docs_df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )

    def extract(batches):
        import pandas as pd

        for pdf in batches:
            raw = pdf["payload"]
            n_bytes = np.fromiter((len(b) for b in raw), dtype=np.int64, count=len(raw))
            meta = fake_decode_meta(n_bytes)
            sha = [hashlib.sha256(b).hexdigest() for b in raw]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n_bytes,
                    "fake_width": meta["fake_width"],
                    "fake_height": meta["fake_height"],
                    "n_frames": meta["n_frames"],
                    "content_sha": sha,
                }
            )

    return payloads.mapInPandas(extract, schema=MEDIA_SCHEMA).orderBy("doc_id")


def media_features_oracle_sql(table: str = "documents") -> str:
    """DuckDB mirror of ``media_features_df`` (fake metadata formulas
    must stay in lockstep with ``fake_decode_meta``)."""
    d = dl.DUCK
    nb = "octet_length(encode(text))"
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST({nb} AS BIGINT) AS n_bytes,
       CAST(64 + {nb} % 576 AS BIGINT) AS fake_width,
       CAST(64 + ({nb} * 7) % 416 AS BIGINT) AS fake_height,
       CAST(1 + {nb} % 15 AS BIGINT) AS n_frames,
       {dl.sha256(d, 'text')} AS content_sha
FROM {table}
ORDER BY doc_id
"""
