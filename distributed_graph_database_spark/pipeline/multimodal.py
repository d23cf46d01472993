"""Multimodal-column plumbing — opaque binary payloads with typed
metadata, decoded via Arrow-batched Pandas UDFs (`mapInPandas`).

The brief's fourth pillar: image/audio/video at 100 TB are `binary`
columns + metadata, processed by vectorized Python (the decode libs
live in the executor image). This container ships no codec libraries,
so the *decode kernel* is a deterministic fake behind the real
plumbing, and `decode_image_real` raises NotImplementedError where a
deployment would call into PIL/ffmpeg. Everything Spark-side — schema,
Arrow batch shape, partition-preserving mapInPandas, the metadata
contract — is real and oracle-checked: the fake decode computes pure
arithmetic on payload bytes, which the DuckDB oracle reproduces in
SQL, so even the Pandas-UDF path gets an exact value hash.

Scale notes: mapInPandas streams Arrow batches (no per-row Python
overhead); payload columns never enter a shuffle here (metadata is
projected out before any wide op); a real pipeline would partition by
content-hash range so decode work balances regardless of size skew.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, first_byte int, width int, height int, channels int"
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque payload column: utf-8 bytes of the text stand
    in for image bytes (deterministic; at deployment this column comes
    off the wire already binary)."""
    return docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))


def _fake_decode(payload: bytes) -> tuple[int, int, int, int, int]:
    """Deterministic stand-in for an image header parse: dimensions
    derived from byte length + first byte. Pure arithmetic so the
    DuckDB oracle can replicate it exactly."""
    n = len(payload)
    first = payload[0] if n else 0
    width = 16 + (n % 97)
    height = 16 + ((n * 31 + first) % 89)
    channels = 1 + (first % 3)
    return n, first, width, height, channels


def decode_image_real(payload: bytes):  # pragma: no cover - deployment hook
    """Real decode hook (PIL/libvips in the executor image).

    STUB: codec libraries are not in this container by design."""
    raise NotImplementedError(
        "image decode requires codec libraries in the executor image; "
        "wire PIL/libvips here at deployment"
    )


def decode_metadata(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one metadata batch out.
    Row-wise python only *inside* the vectorized batch loop — this is
    the sanctioned shape for opaque-binary kernels."""
    for pdf in batches:
        meta = pdf["payload"].map(_fake_decode)
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [m[0] for m in meta],
                "first_byte": [m[1] for m in meta],
                "width": [m[2] for m in meta],
                "height": [m[3] for m in meta],
                "channels": [m[4] for m in meta],
            }
        )
        yield out


def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: binary payload → typed metadata via mapInPandas
    → (doc_id, n_bytes, first_byte, width, height, channels)."""
    docs = table(spark, sf_dir, "documents")
    return with_binary_payload(docs).mapInPandas(decode_metadata, DECODE_SCHEMA)


# The oracle reproduces the fake-decode arithmetic in SQL: utf-8 text
# payload ⇒ n_bytes = octet_length, first_byte = ascii of char 1.
ORACLE_MM_DECODE_META = """
WITH b AS (
  SELECT doc_id,
         CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes,
         CAST(COALESCE(ASCII(SUBSTR(text, 1, 1)), 0) AS INT) AS first_byte
  FROM documents
)
SELECT doc_id, n_bytes, first_byte,
       CAST(16 + (n_bytes % 97) AS INT) AS width,
       CAST(16 + ((n_bytes * 31 + first_byte) % 89) AS INT) AS height,
       CAST(1 + (first_byte % 3) AS INT) AS channels
FROM b
"""


QUERIES = {
    "mm_decode_meta": mm_decode_meta,
}

ORACLE_SQL = {
    "mm_decode_meta": ORACLE_MM_DECODE_META,
}
