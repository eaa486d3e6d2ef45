"""Multimodal declared query: the binary-column decode pipeline,
oracle-checked because the (fake) decoder derives metadata from an md5
both engines can compute over the same bytes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from core_spark.io import load_table
from core_spark.multimodal import attach_payload, decode_image_meta
from core_spark.plans.registry import query


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           'image/png' AS mime,
           64 + CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 512 AS width,
           64 + CAST('0x' || substr(md5(text), 9, 4) AS BIGINT) % 512 AS height,
           strlen(text) AS n_bytes
    FROM documents ORDER BY doc_id
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → typed metadata via the Arrow-batched
    mapInPandas decode stage (core_spark/multimodal/columns.py). The
    payload is the document's UTF-8 bytes (no media libs in this
    container); the decode derivation is md5-based, so the oracle
    reproduces it byte-for-byte — proving the plumbing (schema, batch
    shape, worker self-containment) rather than a codec."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_image_meta(attach_payload(docs)).orderBy("doc_id")
