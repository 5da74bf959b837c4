"""Multimodal column plumbing (north-star extension, BASELINE.json).

Treat image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, processed by Arrow-batched pandas functions via
``mapInPandas``. The decode step itself is STUBBED — the container has
no image/audio codecs (no PIL/cv2/librosa) — but everything Spark-side
is real and tested: schema contract, batch iteration shape, UDF
signatures, partition behavior.

At 100 TB this shape matters: binary payloads dominate bytes, so the
plumbing (a) never shuffles payloads — feature extraction is a narrow
mapInPandas pass before any wide op, and (b) prunes the payload column
as soon as features are extracted.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

#: output contract of extract_features — stable driver-facing schema
FEATURE_SCHEMA = "doc_id long, n_bytes long, content_md5 string, width int, height int"


def attach_binary(documents: DataFrame) -> DataFrame:
    """Demonstrates the multimodal column contract on the text fixture:
    payload as ``binary`` + typed metadata struct. A real pipeline
    reads parquet with an identical shape (payload binary, meta struct)."""
    return documents.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.octet_length("text").alias("n_bytes"),
            F.lit("text/plain").alias("content_type"),
        ).alias("meta"),
    )


try:  # soft dependency: real codec when available, stub otherwise
    from PIL import Image as _PIL_Image
except ImportError:  # container ships no image codec
    _PIL_Image = None


def decode_image(payload: bytes) -> tuple[int, int]:
    """Decode an image payload to (width, height).

    Soft-dependency design: if PIL is importable AND the payload is a
    decodable image, return the real dimensions (header-only read — no
    pixel decode, so the Arrow batch loop stays cheap). Otherwise fall
    back to a DETERMINISTIC stand-in derived from the content hash, so
    the distributed plumbing is exercised end-to-end with verifiable
    outputs even in codec-less environments (this container) and on
    corrupt payloads in production (a 100 TB crawl always contains
    some). The registry fixture carries text payloads, which no codec
    accepts, so its oracle is PIL-independent by construction.
    """
    if _PIL_Image is not None:
        import io

        try:
            with _PIL_Image.open(io.BytesIO(payload)) as im:
                return im.width, im.height
        except Exception:
            pass  # not a decodable image — deterministic fallback below
    hexd = hashlib.md5(payload).hexdigest()
    width = 64 + int(hexd[0:2], 16) % 192  # deterministic fake, clearly not a decode
    height = 64 + int(hexd[2:4], 16) % 192
    return width, height


def extract_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The pandas function receives columnar batches (no per-row pickling
    — dumbo's per-record pipe overhead is exactly what this avoids,
    SURVEY §1.5) and must never materialize more than one batch.
    """
    from dumbo_spark.session import ensure_runtime_confs

    ensure_runtime_confs(with_payload.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [decode_image(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "content_md5": [hashlib.md5(p).hexdigest() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return with_payload.mapInPandas(fn, FEATURE_SCHEMA)


def multimodal_features(documents: DataFrame) -> DataFrame:
    """attach → extract, payload column pruned after extraction."""
    return extract_features(attach_binary(documents))
