"""Multimodal plumbing: Arrow-batch mapInPandas decode path (oracle
parity covered in test_oracle_parity.py) and the deployment stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_graph_database_spark.catalog import table
from distributed_graph_database_spark.pipeline import multimodal


def test_decode_meta_schema_and_determinism(spark, sf_smoke):
    df = multimodal.mm_decode_meta(spark, sf_smoke)
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,n_bytes:int,first_byte:int,"
        "width:int,height:int,channels:int>"
    )
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, multimodal.mm_decode_meta(spark, sf_smoke).collect()))
    assert a == b  # deterministic across runs
    n_docs = table(spark, sf_smoke, "documents").count()
    assert len(a) == n_docs


def test_payload_bytes_match_text_length(spark, sf_smoke):
    """n_bytes is the utf-8 byte length of the text payload."""
    joined = (
        multimodal.mm_decode_meta(spark, sf_smoke)
        .join(table(spark, sf_smoke, "documents"), "doc_id")
        .withColumn("expect", F.octet_length(F.encode(F.col("text"), "utf-8")))
    )
    assert joined.filter(F.col("n_bytes") != F.col("expect")).count() == 0


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError, match="codec libraries"):
        multimodal.decode_image_real(b"\x89PNG")
