"""SURVEY 2.8 surface completion: grouped-agg pandas UDAF + Python UDTF.

The UDTF test pins the engine's stance: the lateral UDTF and the JVM
explode/slice plan (`chunk_tokens`) must produce identical rows — the JVM
plan is what ships (whole-stage codegen, no Python workers); the UDTF is
the extension surface for logic builtin generators can't express.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ccdb_data_pipeline_spark.functions.udaf import mad
from ccdb_data_pipeline_spark.functions.udtf import ChunkUdtf, register_udtfs
from ccdb_data_pipeline_spark.operators.packing import chunk_tokens


def test_mad_udaf_matches_numpy(spark):
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 5 + ["b"] * 4 + ["c"],
            "v": [1, 2, 3, 4, 100, 10, 10, 10, 50, 7],
        }
    )
    got = {
        r["g"]: r["m"]
        for r in spark.createDataFrame(pdf)
        .groupBy("g")
        .agg(mad(F.col("v")).alias("m"))
        .collect()
    }
    for g, sub in pdf.groupby("g"):
        med = np.median(sub.v)
        assert got[g] == pytest.approx(float(np.median(np.abs(sub.v - med))))


def test_mad_single_and_even_groups(spark):
    # n=1 -> MAD 0; n=2 -> interpolated midpoint of |x-mid| (equal halves)
    pdf = pd.DataFrame({"g": ["one", "two", "two"], "v": [9, 10, 20]})
    got = {
        r["g"]: r["m"]
        for r in spark.createDataFrame(pdf)
        .groupBy("g")
        .agg(mad(F.col("v")).alias("m"))
        .collect()
    }
    assert got["one"] == 0.0
    assert got["two"] == 5.0


_DOCS = [
    ("d1", "the quick   brown fox jumps over the lazy dog " * 4),  # 36 words
    ("d2", "short text"),
    ("d3", ""),
    ("d4", None),
    ("d5", "exactly five words right here"),
]


def test_chunk_udtf_matches_jvm_plan(spark):
    df = spark.createDataFrame(_DOCS, "doc_id string, text string")
    df.createOrReplaceTempView("udtf_docs")
    register_udtfs(spark)
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text
        FROM udtf_docs d, LATERAL chunk_udtf(d.text, 8, 5) c
        """
    )
    via_jvm = chunk_tokens(df, "doc_id", "text", window=8, stride=5).select(
        "doc_id", "chunk_idx", "chunk_text"
    )
    key = lambda r: (r["doc_id"], r["chunk_idx"])
    a = sorted((tuple(r) for r in via_udtf.collect()), key=lambda t: t[:2])
    b = sorted((tuple(r) for r in via_jvm.collect()), key=lambda t: t[:2])
    assert a == b
    # null/empty text behaves like Spark split: one empty chunk
    assert ("d3", 0, "") in a and ("d4", 0, "") in a


def test_chunk_udtf_validates_args():
    with pytest.raises(ValueError):
        list(ChunkUdtf().eval("a b c", 4, 9))
