"""Multimodal column plumbing.

Convention: a media asset is an opaque `binary` column plus a typed
metadata struct — the engine treats payloads as bytes exactly the way
Gazette journals treat messages ("only raw serializations",
message/interfaces.go:121-124); schema lives beside the payload, not
inside the engine.

The decode/transform operators are Arrow-batched `mapInPandas` stages:
per-partition iterators of pandas batches, binary in → binary/meta
out, so a 100 TB media corpus streams through executors without
driver involvement and without row-at-a-time serde. The actual codec
calls are STUBBED — this container has no image/audio libraries — but
the Spark-side contract (schema, batch shape, partition behavior,
worker self-containment) is real and tested:

- real mode (`fake=False`) raises NotImplementedError naming the
  library that would be used (PIL / libsndfile / pyav);
- fake mode derives deterministic metadata from an md5 of the payload,
  so the full pipeline is runnable and oracle-checkable end-to-end.

Worker closures are self-contained (stdlib+pandas only, pickled by
value) — callers' Python workers never need this repo importable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id long, mime string, width long, height long, n_bytes long"
)
AUDIO_FRAME_SCHEMA = "doc_id long, frame_idx long, offset_ms long, n_bytes long"


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (UTF-8 bytes of the
    text stand in for real media bytes in this container)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_image_meta(
    df: DataFrame, payload_col: str = "payload", fake: bool = True
) -> DataFrame:
    """Decode image metadata from binary payloads.

    Output: IMAGE_META_SCHEMA. Real decode is stubbed (no PIL here);
    fake mode hashes the payload into deterministic dimensions.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        if not fake:
            raise NotImplementedError(
                "STUB: real image decode requires PIL (pillow); "
                "install it and decode via PIL.Image.open(io.BytesIO(b))"
            )
        for pdf in batches:
            hexes = [
                hashlib.md5(bytes(b)).hexdigest() for b in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": "image/png",
                    "width": [64 + int(h[0:4], 16) % 512 for h in hexes],
                    "height": [64 + int(h[8:12], 16) % 512 for h in hexes],
                    "n_bytes": [len(bytes(b)) for b in pdf[payload_col]],
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(
        decode, schema=IMAGE_META_SCHEMA
    )


def resize_images(
    df: DataFrame, payload_col: str = "payload", max_side: int = 256,
    fake: bool = True,
) -> DataFrame:
    """Resize payloads to bounded dimensions (batch in → batch out;
    output payload replaces input). Stubbed: fake mode truncates the
    payload deterministically to emulate a smaller encode."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            raise NotImplementedError(
                "STUB: real resize requires PIL (pillow).Image.thumbnail"
            )
        for pdf in batches:
            out = pdf.copy()
            out[payload_col] = [
                bytes(b)[: max_side * 4] for b in pdf[payload_col]
            ]
            yield out

    return df.mapInPandas(resize, schema=df.schema)


def sample_audio_frames(
    df: DataFrame, payload_col: str = "payload", frame_ms: int = 1000,
    fake: bool = True,
) -> DataFrame:
    """Explode audio payloads into fixed-interval frames (1 row per
    frame — the fan-out shape of frame sampling). Stubbed: fake mode
    treats every 100 bytes as one frame_ms of audio."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            raise NotImplementedError(
                "STUB: real audio framing requires libsndfile/pyav"
            )
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                raw = bytes(b)
                for i in range(max(1, len(raw) // 100)):
                    rows.append(
                        (int(doc_id), i, i * frame_ms, min(100, len(raw) - i * 100))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "offset_ms", "n_bytes"]
            )

    return df.select("doc_id", payload_col).mapInPandas(
        sample, schema=AUDIO_FRAME_SCHEMA
    )
