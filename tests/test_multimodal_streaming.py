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


def test_mention_counts_event_time_late_drop(spark, tmp_path):
    """Watermark semantics on REAL event time: a row arriving more than
    `watermark` behind the max seen event time is dropped; on-time rows
    keep aggregating (VERDICT.md round-1 'what's missing' #4)."""
    import datetime as dt
    import time

    from simkit_spark.streaming import mention_counts

    schema = (
        "doc_id string, "
        "spans array<struct<kind:string, text:string, media_ref:string, offset:int>>, "
        "event_ts timestamp"
    )

    def doc(doc_id, surface, ts):
        return (doc_id, [("text", f"{surface} acquired Target.", None, 0)], ts)

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    src = str(tmp_path / "src")

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.2)  # distinct mtimes -> deterministic file order

    # batch 1: three Alpha mentions in window [10:00, 10:10) plus one
    # Omega at 10:25 that advances the watermark to 10:15
    write_batch(
        [
            doc("d1", "Alpha", t0 + dt.timedelta(minutes=1)),
            doc("d2", "Alpha", t0 + dt.timedelta(minutes=3)),
            doc("d3", "Alpha", t0 + dt.timedelta(minutes=5)),
            doc("d4", "Omega", t0 + dt.timedelta(minutes=25)),
        ]
    )
    # batch 2: filler — since SPARK-42376 the LATE-EVENT filter uses the
    # PREVIOUS batch's watermark (eviction uses the current one), so the
    # 10:15 watermark only starts dropping late rows one batch later
    write_batch([doc("d5", "Omega", t0 + dt.timedelta(minutes=26))])
    # batch 3: one LATE Alpha at 10:05 (behind the 10:15 late-event
    # watermark -> dropped) and one on-time Alpha at 10:27
    write_batch(
        [
            doc("d6", "Alpha", t0 + dt.timedelta(minutes=5)),
            doc("d7", "Alpha", t0 + dt.timedelta(minutes=27)),
        ]
    )

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    counts = mention_counts(stream, ts_col="event_ts", watermark="10 minutes")
    q = (
        counts.writeStream.format("memory")
        .queryName("mc_late")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    rows = spark.sql("select window.start as ws, surface, count from mc_late").collect()
    w1 = [r for r in rows if r["ws"] == t0 and r["surface"] == "Alpha"]
    # late d6 dropped: window [10:00,10:10) never reports 4
    assert w1, rows
    assert max(r["count"] for r in w1) == 3, rows
    w2 = [
        r
        for r in rows
        if r["ws"] == t0 + dt.timedelta(minutes=20) and r["surface"] == "Alpha"
    ]
    # on-time d7 lands in [10:20,10:30)
    assert w2 and max(r["count"] for r in w2) == 1, rows
    # the drop is visible in the operator metrics too
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped >= 1


def test_resize_and_frame_sample(spark):
    from pyspark.sql import functions as F

    from simkit_spark.corpus import synthesize
    from simkit_spark.functions.multimodal import fetch_media, resize_media, sample_frames
    from simkit_spark.pipeline.extract import explode_spans

    docs, _ = synthesize(spark, n_docs=120, n_entities=30, seed=42)
    media = fetch_media(explode_spans(docs).where(F.col("kind") != "text")).cache()
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert "video" in kinds and "image" in kinds

    rs = resize_media(media, out_h=4, out_w=4)
    rows = rs.collect()
    assert rows and all(len(r["pixels"]) == 4 * 4 * 3 for r in rows)
    assert {r["kind"] for r in rows} <= {"image", "video"}  # audio skipped

    fr = sample_frames(media, n_frames=2)
    frows = fr.collect()
    n_videos = media.where(F.col("kind") == "video").count()
    assert len(frows) == 2 * n_videos
    assert all(len(r["frame"]) == 16 * 16 * 3 for r in frows)
    # deterministic across partitionings
    fr2 = sample_frames(media.repartition(7), n_frames=2)
    assert {(r["doc_id"], r["span_idx"], r["frame_idx"]) for r in frows} == {
        (r["doc_id"], r["span_idx"], r["frame_idx"]) for r in fr2.collect()
    }


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicate fingerprints arriving while the key's state is live are
    suppressed; a distinct doc passes; state is watermark-bounded (the
    unbounded-state dropDuplicates is unusable on an infinite feed)."""
    import datetime as dt
    import time

    from simkit_spark.streaming import streaming_dedup

    schema = "doc_id string, text string, event_ts timestamp"
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    src = str(tmp_path / "src")

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.2)

    write_batch([
        ("d1", "Alpha acquired Target.", t0),
        ("d2", "totally different text", t0 + dt.timedelta(minutes=1)),
    ])
    # same normalized text as d1 (case/whitespace differ), within the
    # dedup window -> suppressed; d4 is new -> kept
    write_batch([
        ("d3", "  alpha acquired target. ", t0 + dt.timedelta(minutes=2)),
        ("d4", "yet another unique doc", t0 + dt.timedelta(minutes=3)),
    ])

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = streaming_dedup(stream, delay="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    kept = {r["doc_id"] for r in spark.sql("select doc_id from sdedup").collect()}
    assert kept == {"d1", "d2", "d4"}, kept


def test_bmp_decode_hand_fixture():
    """Decode parity against hand-assembled bytes (no encoder in the
    loop): a 2x1 24-bit BMP, bottom-up, red then blue pixel."""
    import struct

    import numpy as np

    from simkit_spark.functions.multimodal import decode_bmp

    w, h = 2, 1
    row = w * 3  # 6 bytes + 2 pad
    pad = 2
    img_size = (row + pad) * h
    b = (
        struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 0, 0, 0, 0)
        # BGR: pixel0 = red (00 00 FF), pixel1 = blue (FF 00 00), pad
        + bytes([0x00, 0x00, 0xFF, 0xFF, 0x00, 0x00, 0, 0])
    )
    arr = decode_bmp(b)
    assert arr.shape == (1, 2, 3)
    assert np.allclose(arr[0, 0], [1.0, 0.0, 0.0])  # red, RGB order
    assert np.allclose(arr[0, 1], [0.0, 0.0, 1.0])  # blue


def test_wav_decode_hand_fixture():
    import struct

    import numpy as np

    from simkit_spark.functions.multimodal import decode_wav

    pcm = struct.pack("<4h", 0, 32767, -32768, 16384)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    b = (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(pcm), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(pcm))
        + pcm
    )
    s = decode_wav(b)
    assert s.shape == (4,)
    assert np.allclose(s, [0.0, 1.0, -32768.0 / 32767.0, 16384.0 / 32767.0])


def test_codec_roundtrips():
    """encode->decode recovers pixels/samples to quantization error."""
    import numpy as np

    from simkit_spark.functions.multimodal import (
        decode_bmp,
        decode_vid,
        decode_wav,
        encode_bmp,
        encode_vid,
        encode_wav,
    )

    rng = np.random.RandomState(3)
    img = rng.rand(5, 7, 3)  # odd width exercises row padding
    assert np.abs(decode_bmp(encode_bmp(img)) - img).max() <= 0.5 / 255
    au = rng.rand(333) * 2 - 1
    assert np.abs(decode_wav(encode_wav(au)) - au).max() <= 1.0 / 32767
    vid = rng.rand(3, 4, 5, 3)
    assert np.abs(decode_vid(encode_vid(vid)) - vid).max() <= 0.5 / 255


def test_decode_rejects_garbage():
    import pytest

    from simkit_spark.functions.multimodal import _decode_bytes

    with pytest.raises(ValueError):
        _decode_bytes(b"not a bmp at all....", "image")
    with pytest.raises(NotImplementedError):
        _decode_bytes(b"....", "hologram")
