from __future__ import annotations

from pyspark.sql import functions as F

from simkit_spark.corpus import DOC_SCHEMA, synthesize
from simkit_spark.functions.multimodal import extract_media_features, fetch_media
from simkit_spark.pipeline.extract import explode_spans
from simkit_spark.streaming import run_stream_to_table, stream_documents, streaming_raw_triples


def test_media_plumbing(spark):
    docs, _ = synthesize(spark, n_docs=60, n_entities=20, seed=42)
    spans = explode_spans(docs)
    media = fetch_media(spans)
    n_media = media.count()
    assert n_media == spans.where(F.col("kind") != "text").count()
    assert n_media > 0
    feats = extract_media_features(media)
    assert feats.count() == n_media
    row = feats.first()
    assert len(row["feat"]) == 32
    # deterministic: same media_ref -> same features
    f2 = extract_media_features(fetch_media(spans.repartition(5)))
    j = feats.alias("a").join(
        f2.alias("b"), ["doc_id", "span_idx"]
    ).where(F.col("a.feat") != F.col("b.feat"))
    assert j.count() == 0


def test_streaming_stateful_counts(spark, tmp_path):
    from simkit_spark.pipeline.extract import detect_mentions
    from simkit_spark.streaming import running_entity_counts

    docs, _ = synthesize(spark, n_docs=50, n_entities=15, seed=42)
    src = str(tmp_path / "sin")
    docs.repartition(3).write.parquet(src)
    stream = stream_documents(spark, src, DOC_SCHEMA, max_files=1)
    counts = running_entity_counts(stream)
    out, ckpt = str(tmp_path / "sout"), str(tmp_path / "sckpt")
    # update-mode operator -> foreachBatch appends each micro-batch's
    # emitted updates (parquet sinks only take append mode directly)
    q = (
        counts.writeStream.foreachBatch(
            lambda bdf, _id: bdf.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    # the LAST emitted total per surface equals the batch ground truth
    final = got.groupBy("surface").agg(F.max("total").alias("total"))
    want = detect_mentions(explode_spans(docs)).groupBy("surface").count()
    diff = final.join(want, "surface").where(F.col("total") != F.col("count"))
    assert diff.count() == 0
    assert final.count() == want.count()


def test_streaming_extraction(spark, tmp_path):
    docs, truth = synthesize(spark, n_docs=80, n_entities=20, seed=42)
    src = str(tmp_path / "in")
    docs.repartition(4).write.parquet(src)
    stream = stream_documents(spark, src, DOC_SCHEMA, max_files=2)
    assert stream.isStreaming
    triples = streaming_raw_triples(stream)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_stream_to_table(triples, out, ckpt, once=True)
    got = spark.read.parquet(out)
    # streaming output == batch output
    assert got.count() == truth.count()
