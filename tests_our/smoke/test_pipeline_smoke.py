"""Smoke tests: resumable slice-checkpointed job, streaming, multimodal."""

import json
import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.smoke


def test_job_runs_and_resumes(spark, tmp_path):
    from doc_parser_spark.plans.pipeline import completed_slices, run_extraction_job
    from doc_parser_spark.sources.pages import pages_df

    out = str(tmp_path / "job_out")
    pages = pages_df(spark, 120, num_partitions=4)

    summary = run_extraction_job(spark, pages, out, num_slices=4, salt_partitions=4)
    assert all(s["status"] == "completed" for s in summary["slices"].values())
    assert completed_slices(out) == {0, 1, 2, 3}
    assert summary["accumulators"]["success"] > 100

    docs = spark.read.parquet(os.path.join(out, "documents"))
    assert docs.count() == 120
    chunks = spark.read.parquet(os.path.join(out, "chunks"))
    assert chunks.count() >= 100
    metrics = spark.read.parquet(os.path.join(out, "metrics"))
    mrow = metrics.agg(
        F.sum("n_rows").alias("r"), F.sum("n_failure").alias("f")
    ).first()
    assert mrow["r"] == 120

    # manifest content is a valid lineage record
    with open(os.path.join(out, "_manifests", "slice_0.json")) as f:
        manifest = json.load(f)
    assert manifest["slice"] == 0 and manifest["n_rows"] > 0
    assert manifest["partitions"][0]["min_url"] <= manifest["partitions"][0]["max_url"]

    # resume: drop one manifest → only that slice re-runs
    os.remove(os.path.join(out, "_manifests", "slice_2.json"))
    summary2 = run_extraction_job(spark, pages, out, num_slices=4, salt_partitions=4)
    statuses = {k: v["status"] for k, v in summary2["slices"].items()}
    assert statuses[2] == "completed"
    assert all(v == "resumed_skip" for k, v in statuses.items() if k != 2)
    # output is complete again after the partial re-run
    assert spark.read.parquet(os.path.join(out, "documents")).count() == 120


def test_streaming_extraction(spark, tmp_path):
    from doc_parser_spark.sources.pages import pages_df
    from doc_parser_spark.streaming.stream import stream_extract

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages_df(spark, 60, num_partitions=2).write.parquet(in_dir)

    q = stream_extract(spark, in_dir, out_dir, ckpt, available_now=True)
    assert q.awaitTermination(120), "streaming query timed out"
    docs = spark.read.parquet(out_dir)
    assert docs.count() == 60
    assert docs.where("status = 'success'").count() >= 50

    # restart with no new data: checkpoint prevents reprocessing
    q2 = stream_extract(spark, in_dir, out_dir, ckpt, available_now=True)
    assert q2.awaitTermination(120), "streaming query timed out"
    assert spark.read.parquet(out_dir).count() == 60

    # new files arriving are picked up incrementally
    pages_df(spark, 20, seed=99, num_partitions=1).write.mode("append").parquet(in_dir)
    q3 = stream_extract(spark, in_dir, out_dir, ckpt, available_now=True)
    assert q3.awaitTermination(120), "streaming query timed out"
    assert spark.read.parquet(out_dir).count() == 80


def test_streaming_kill_resume_exactly_once_parity(spark, tmp_path):
    """Kill the extraction stream mid-backlog, resume from checkpoint,
    and require the final sink to be row-exact vs the batch run — the
    file sink's commit log (_spark_metadata) is the exactly-once
    mechanism: files from uncommitted batches are invisible to readers."""
    import time

    from doc_parser_spark.operators.extract import extract_documents
    from doc_parser_spark.sources.pages import pages_df
    from doc_parser_spark.streaming.stream import stream_extract

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    total = 120
    # many small files -> many micro-batches at maxFilesPerTrigger=1,
    # so a stop after the first committed batch lands mid-backlog
    pages_df(spark, total, num_partitions=24).write.parquet(in_dir)

    batch = extract_documents(
        spark.read.parquet(in_dir), with_markdown=False
    ).select("url", "document_hash", "status")
    expected = {tuple(r) for r in batch.collect()}
    assert len(expected) == total

    q = stream_extract(
        spark, in_dir, out_dir, ckpt,
        available_now=True, max_files_per_trigger=1,
    )
    deadline = time.time() + 120
    while q.isActive and time.time() < deadline:
        p = q.lastProgress
        if p and p.get("numInputRows", 0) > 0:
            break  # >=1 micro-batch committed; backlog still pending
        time.sleep(0.1)
    q.stop()  # kill mid-stream
    assert q.awaitTermination(60), "streaming query timed out"
    mid = spark.read.parquet(out_dir).count()
    assert 0 < mid < total, f"stream not killed mid-backlog (mid={mid})"

    # resume from the same checkpoint; drain the rest
    q2 = stream_extract(
        spark, in_dir, out_dir, ckpt,
        available_now=True, max_files_per_trigger=1,
    )
    assert q2.awaitTermination(180), "streaming query timed out"
    out = spark.read.parquet(out_dir).select(
        "url", "document_hash", "status"
    )
    rows = out.collect()
    assert len(rows) == total  # no replays, no losses
    assert {tuple(r) for r in rows} == expected  # value parity with batch


def test_streaming_windowed_counts(spark, tmp_path):
    from doc_parser_spark.streaming.stream import windowed_event_counts

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # static-DataFrame path (same code serves the stream)
    win = windowed_event_counts(events, window="1 hour")
    rows = win.collect()
    assert rows and all(r["window_end"] > r["window_start"] for r in rows)
    total = sum(r["n_events"] for r in rows)
    assert total == events.count()


def test_streaming_stateful_totals(spark, tmp_path):
    from pyspark.sql import functions as F

    from doc_parser_spark.streaming.stream import running_user_totals

    src = str(tmp_path / "ev_in")
    ckpt = str(tmp_path / "ev_ckpt")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.parquet(src)

    stream = (
        spark.readStream.schema(events.schema).parquet(src)
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query timed out"
    got = {
        r["user_id"]: r["n_events"]
        for r in spark.sql("select * from user_totals").collect()
    }
    expected = {
        r["user_id"]: r["cnt"]
        for r in events.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == expected


def test_multimodal_decode_and_features(spark):
    from doc_parser_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        make_fake_audio,
        make_fake_image,
        resize_images,
    )

    import numpy as np

    from doc_parser_spark.core.jpeg import encode_jpeg, encode_jpeg_progressive

    gradient = np.linspace(0, 255, 12 * 10, dtype=np.uint8).reshape(10, 12)
    jpg = encode_jpeg(gradient)
    prog_jpg = encode_jpeg_progressive(gradient)
    rows = [
        ("m://img0", "image", make_fake_image(8, 6, 3, seed=1)),
        ("m://img1", "image", make_fake_image(4, 4, 1, seed=2)),
        ("m://aud0", "audio", make_fake_audio(16000, 1000, seed=3)),
        ("m://bad", "image", b"FAKEIMG" + b"\x00\x08\x00\x06\x03short"),
        ("m://real.jpg", "image", jpg),
        ("m://progressive.jpg", "image", prog_jpg),
        ("m://noscan.jpg", "image", b"\xff\xd8\xff\xc2\x00\x0b" + b"\x08\x00\x10\x00\x10\x01\x01\x11\x00"),
        ("m://truncated.jpg", "image", b"\xff\xd8\xff\xe0JFIF-junk"),
        ("m://empty", "image", b""),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r["url"]: r for r in decode_media(media).collect()}

    assert out["m://img0"]["status"] == "decoded"
    assert (out["m://img0"]["width"], out["m://img0"]["height"]) == (8, 6)
    assert len(out["m://img0"]["features"]) == 18
    assert abs(sum(out["m://img0"]["features"][:16]) - 1.0) < 1e-5
    assert out["m://aud0"]["sample_rate"] == 16000
    assert out["m://bad"]["status"] == "corrupt"
    # baseline JPEG decodes for real now (core/jpeg.py)
    assert out["m://real.jpg"]["status"] == "decoded"
    assert (out["m://real.jpg"]["width"], out["m://real.jpg"]["height"]) == (12, 10)
    # progressive SOF2 decodes for real; a frame header with no scan
    # data is corrupt, not codec_unavailable
    assert out["m://progressive.jpg"]["status"] == "decoded"
    assert (out["m://progressive.jpg"]["width"], out["m://progressive.jpg"]["height"]) == (12, 10)
    assert out["m://noscan.jpg"]["status"] == "corrupt"
    assert out["m://truncated.jpg"]["status"] == "corrupt"
    assert out["m://empty"]["status"] == "empty"

    resized = {r["url"]: r for r in resize_images(media, 4, 4).collect()}
    # FAKEIMG and PNG payloads resize for real (nearest-neighbor → PNG out)
    from doc_parser_spark.core.png import decode_png

    for url in ("m://img0", "m://img1", "m://real.jpg", "m://progressive.jpg"):
        assert resized[url]["status"] == "resized"
        arr = decode_png(bytes(resized[url]["payload"]))
        assert arr.shape[:2] == (4, 4)
    # header-only progressive and corrupt/empty isolate per-item
    assert resized["m://noscan.jpg"]["status"] == "corrupt"
    assert resized["m://bad"]["status"] == "corrupt"
    assert resized["m://empty"]["status"] == "empty"


def test_multimodal_page_render_and_crops(spark):
    """PDF bytes → rendered page PNGs → bbox crops, end-to-end in Spark."""
    from doc_parser_spark.core.png import decode_png
    from doc_parser_spark.operators.multimodal import (
        crop_page_regions,
        render_pdf_pages,
    )
    from doc_parser_spark.pdf import writer

    pdf = writer.write_pdf(
        [
            [(72, 700, 12, "Hello render"), (72, 650, 12, "Second line")],
            [(100, 400, 14, "Page two")],
        ]
    )
    pages = spark.createDataFrame(
        [("p://a", pdf), ("p://broken", b"%PDF-1.4 not really")],
        "url string, html binary",
    )
    rendered = render_pdf_pages(pages, scale=0.5).collect()
    by_key = {(r["url"], r["page_no"]): r for r in rendered}
    assert by_key[("p://a", 1)]["status"] == "rendered"
    assert by_key[("p://a", 2)]["status"] == "rendered"
    assert by_key[("p://broken", 0)]["status"].startswith("failure:")
    img = decode_png(bytes(by_key[("p://a", 1)]["image"]))
    assert img.shape == (
        by_key[("p://a", 1)]["height"],
        by_key[("p://a", 1)]["width"],
        1,
    )
    # determinism: re-render → byte-identical PNGs
    again = {(r["url"], r["page_no"]): r for r in render_pdf_pages(pages, scale=0.5).collect()}
    assert bytes(again[("p://a", 1)]["image"]) == bytes(by_key[("p://a", 1)]["image"])

    ok = [r for r in rendered if r["status"] == "rendered"]
    with_boxes = spark.createDataFrame(
        [
            (r["url"], r["page_no"], bytes(r["image"]), [[0.0, 0.0, 0.5, 0.5], [0.5, 0.5, 1.0, 1.0]])
            for r in ok
        ],
        "url string, page_no int, image binary, bboxes array<array<double>>",
    )
    crops = crop_page_regions(with_boxes).collect()
    assert len(crops) == 2 * len(ok)
    for c in crops:
        assert c["status"] == "cropped"
        arr = decode_png(bytes(c["crop"]))
        assert arr.shape[:2] == (c["height"], c["width"])


def test_multimodal_determinism(spark):
    from doc_parser_spark.operators.multimodal import make_fake_image

    assert make_fake_image(8, 6, 3, seed=1) == make_fake_image(8, 6, 3, seed=1)
    assert make_fake_image(8, 6, 3, seed=1) != make_fake_image(8, 6, 3, seed=2)


def test_evaluation_spark_path(spark):
    from pyspark.sql import functions as F

    from doc_parser_spark.core.evaluation import evaluate_spans_df
    from doc_parser_spark.operators.extract import extract_documents
    from doc_parser_spark.sources.pages import pages_df

    # PDFs carry bboxes; use extraction output as its own groundtruth
    docs = extract_documents(pages_df(spark, 100, seed=7)).where(
        F.col("format") == "pdf"
    ).cache()
    gt = (
        docs.select("url", F.explode("spans").alias("s"))
        .where(F.col("s.bbox").isNotNull())
        .select(
            "url",
            F.col("s.page_no").alias("page"),
            F.col("s.bbox.l").alias("l"), F.col("s.bbox.t").alias("t"),
            F.col("s.bbox.r").alias("r"), F.col("s.bbox.b").alias("b"),
            F.col("s.label").alias("category_name"),
        )
    )
    row = evaluate_spans_df(spark, gt, docs).first()
    docs.unpersist()
    assert row["TP"] > 0 and row["FP"] == 0 and row["FN"] == 0
    assert row["class_correct"] == row["TP"]


def test_multimodal_page_records(spark):
    """Per-page training records: text + normalized segment/cell bboxes +
    optional page PNG (reference generate_multimodal_pages analog)."""
    from doc_parser_spark.core.png import decode_png
    from doc_parser_spark.operators.multimodal import multimodal_page_records
    from doc_parser_spark.pdf import writer

    pdf = writer.write_pdf(
        [
            [(72, 700, 18, "Big Title"), (72, 650, 10, "Body text here")],
            [(90, 400, 10, "Second page body")],
        ]
    )
    df = spark.createDataFrame(
        [("p://ok", pdf), ("p://bad", b"%PDF-garbage")], "url string, html binary"
    )
    rows = {(r["url"], r["page_no"]): r for r in
            multimodal_page_records(df, with_images=True).collect()}
    assert rows[("p://bad", 0)]["status"].startswith("failure:")
    p1 = rows[("p://ok", 1)]
    assert p1["status"] == "ok"
    assert "Big Title" in p1["content_text"]
    labels = [s["label"] for s in p1["segments"]]
    assert "title" in labels or "section_header" in labels
    for seg in p1["segments"]:
        assert len(seg["bbox"]) == 4
        assert all(0.0 <= v <= 1.0 for v in seg["bbox"])
    assert len(p1["cells"]) == 2
    for cell in p1["cells"]:
        assert cell["ocr"] is False
        assert all(0.0 <= v <= 1.0 for v in cell["bbox"])
    img = decode_png(bytes(p1["image"]))
    assert img.shape[0] == round(p1["height"]) and img.shape[1] == round(p1["width"])
    p2 = rows[("p://ok", 2)]
    assert p2["content_text"] == "Second page body"


def test_extract_pdf_embedded_images(spark):
    """Embedded XObject images (figures + JPEG soft masks) extract with
    real decoding — amt_handbook carries 9 indexed figures + 9 JPEG
    smasks."""
    from doc_parser_spark.core.png import decode_png
    from doc_parser_spark.operators.multimodal import extract_pdf_images

    with open("/root/reference/tests/data/pdf/amt_handbook_sample.pdf", "rb") as f:
        pdf = f.read()
    df = spark.createDataFrame([("p://amt", pdf)], "url string, html binary")
    rows = extract_pdf_images(df).collect()
    assert len(rows) == 18
    decoded = [r for r in rows if r["status"] == "decoded_png"]
    assert len(decoded) == 9
    for r in decoded:
        arr = decode_png(bytes(r["image"]))
        assert arr.shape[:2] == (r["height"], r["width"])
    assert all(r["status"] == "raw_samples" for r in rows if r not in decoded)


def test_streaming_watermark_drops_late_events(spark, tmp_path):
    """True streaming semantics: once the watermark passes a window, a
    late event for it is dropped — the finalized (append-mode) window
    count never changes."""
    import datetime as dt

    from doc_parser_spark.streaming.stream import windowed_event_counts

    src = str(tmp_path / "wm_in")
    out = str(tmp_path / "wm_out")
    ckpt = str(tmp_path / "wm_ckpt")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def t(hh, mm):
        return dt.datetime(2024, 3, 1, hh, mm)

    def run_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = (
            windowed_event_counts(
                spark.readStream.schema(
                    spark.read.parquet(src).schema
                ).parquet(src),
                window="10 minutes",
                watermark="30 minutes",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "streaming query timed out"

    # batch 1: three on-time events in [10:00,10:10) + a 12:00 event that
    # pushes the watermark to 11:30, finalizing the 10:00 window
    run_batch(
        [
            (1, t(10, 0), 1, "view", 1.0, ""),
            (2, t(10, 2), 2, "view", 1.0, ""),
            (3, t(10, 5), 3, "view", 1.0, ""),
            (4, t(12, 0), 4, "view", 1.0, ""),
        ]
    )
    first = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.read.parquet(out).collect()
    }
    assert first[(t(10, 0), "view")] == 3

    # batch 2: a LATE event for the finalized window (dropped) + a fresh
    # 12:30 event that finalizes the 12:00 window
    run_batch(
        [
            (5, t(10, 3), 5, "view", 1.0, ""),  # late: behind the watermark
            (6, t(12, 45), 6, "view", 1.0, ""),  # watermark → 12:15 ≥ 12:10
        ]
    )
    rows = spark.read.parquet(out).collect()
    counts = {}
    for r in rows:
        key = (r["window_start"], r["event_type"])
        counts[key] = counts.get(key, 0) + r["n_events"]
    # the finalized window was emitted once, with the late event DROPPED
    assert counts[(t(10, 0), "view")] == 3
    # the 12:00 window finalized with only its on-time event
    assert counts[(t(12, 0), "view")] == 1


def test_manifest_store_hadoop_fs_roundtrip(spark, tmp_path):
    """Schemed paths route through the Hadoop FileSystem API (the cluster
    path — hdfs://, s3a://); file:// exercises that code against the same
    local dir the os fast path sees, proving the two views agree."""
    import pytest
    from doc_parser_spark.plans.manifests import ManifestStore

    out = str(tmp_path / "job_out")
    hadoop = ManifestStore("file://" + out, spark)
    local = ManifestStore(out)
    assert hadoop._use_hadoop and not local._use_hadoop

    assert hadoop.completed_slices() == set()
    hadoop.write_atomic(3, {"slice": 3, "n_rows": 42, "num_slices": 8})
    hadoop.write_atomic(5, {"slice": 5, "n_rows": 7, "num_slices": 8})
    assert hadoop.completed_slices() == {3, 5}
    # the os view of the same directory agrees (same files, same bytes)
    assert local.completed_slices() == {3, 5}
    assert local.read(3) == hadoop.read(3) == {
        "slice": 3, "n_rows": 42, "num_slices": 8,
    }
    # overwrite is atomic-replace, not append
    hadoop.write_atomic(3, {"slice": 3, "n_rows": 43, "num_slices": 8})
    assert hadoop.read(3)["n_rows"] == 43
    hadoop.remove(5)
    assert hadoop.completed_slices() == {3}
    # no leftover tmp files after commits
    import os as _os
    leftovers = [n for n in _os.listdir(out + "/_manifests") if ".tmp." in n]
    assert leftovers == []
    # schemed path without a session is refused loudly
    with pytest.raises(ValueError):
        ManifestStore("s3a://bucket/prefix")


def test_table_io_parquet_roundtrip_and_validation(spark, tmp_path):
    import pytest
    from doc_parser_spark.sources.catalog import TableIO

    io = TableIO(spark, "parquet", root=str(tmp_path))
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02")], "id long, warc_day string"
    )
    io.overwrite_partitioned(df, "documents/slice=0", ["warc_day"])
    back = io.read("documents/slice=0")
    assert sorted(r["id"] for r in back.collect()) == [1, 2]
    # partition layout on disk (pruning-ready)
    assert (tmp_path / "documents" / "slice=0" / "warc_day=2024-01-01").exists()
    io.append(df.where("id = 1"), "documents/slice=0", ["warc_day"])
    assert io.read("documents/slice=0").count() == 3

    ice = TableIO(spark, "iceberg", catalog="prod", namespace="crawl")
    assert ice.identifier("documents") == "prod.crawl.documents"
    with pytest.raises(ValueError):
        TableIO(spark, "parquet")  # no root
    with pytest.raises(ValueError):
        TableIO(spark, "iceberg")  # no catalog
    with pytest.raises(ValueError):
        TableIO(spark, "delta", root="x")


def test_streaming_url_dedup(spark, tmp_path):
    from datetime import datetime, timezone

    from pyspark.sql import Row

    from doc_parser_spark.streaming.stream import stream_url_dedup

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ts = datetime(2024, 1, 1, 12, 0, tzinfo=timezone.utc)

    def page(url):
        return Row(url=url, warc_ts=ts, html=b"<p>x</p>", text="", lang="en")

    batch1 = [page("http://WWW.ex.com:80/a?utm_source=1"), page("http://ex.com/b")]
    spark.createDataFrame(batch1).write.parquet(in_dir)
    q = stream_url_dedup(spark, in_dir, out_dir, ckpt)
    assert q.awaitTermination(120), "streaming query timed out"

    # second batch: a canonical re-fetch of /a plus a new url — state must
    # survive the restart through the checkpoint
    batch2 = [page("http://ex.com/a"), page("http://ex.com/c")]
    spark.createDataFrame(batch2).write.mode("append").parquet(in_dir)
    q2 = stream_url_dedup(spark, in_dir, out_dir, ckpt)
    assert q2.awaitTermination(120), "streaming query timed out"

    out = spark.read.parquet(out_dir)
    urls = sorted(r.canonical_url for r in out.collect())
    assert urls == ["http://ex.com/a", "http://ex.com/b", "http://ex.com/c"]


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """Event-time gap sessionization under applyInPandasWithState: every
    closed session emitted by the stream must equal the batch
    sessionize row bit-for-bit (same gap, numbering, aggregates), and
    the stream must close every session the watermark has sealed."""
    from pyspark.sql import functions as F

    from doc_parser_spark.operators.relational import sessionize
    from doc_parser_spark.streaming.stream import streaming_sessionize

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # 4 time-sliced files -> 4 micro-batches in event-time order (per-user
    # order is preserved because slices don't overlap in time)
    epoch = ("timestampdiff(SECOND, "
             "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), ts)")
    bounds = [r[0] for r in events.selectExpr(
        f"percentile({epoch}, array(0.25, 0.5, 0.75))").collect()][0]
    src = str(tmp_path / "sess_in")
    import os

    os.makedirs(src)
    lo = None
    for i, hi in enumerate(list(bounds) + [None]):
        sl = events
        if lo is not None:
            sl = sl.where(F.expr(f"{epoch} >= {lo}"))
        if hi is not None:
            sl = sl.where(F.expr(f"{epoch} < {hi}"))
        sl.coalesce(1).write.parquet(f"{src}/slice={i}")
        lo = hi

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/slice=*")
    )
    q = (
        streaming_sessionize(stream, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "streaming query timed out"
    got = {
        (r["user_id"], r["session_no"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from sessions_stream").collect()
    }
    expected = {
        (r["user_id"], r["session_no"]): (r["n_events"], r["sum_value"])
        for r in sessionize(events).collect()
    }
    # exactness: every closed session equals its batch twin
    assert got, "stream closed no sessions"
    for k, (n, sv) in got.items():
        assert k in expected, k
        en, esv = expected[k]
        assert n == en and abs(sv - esv) < 1e-6, (k, (n, sv), (en, esv))
    # completeness: nothing the watermark sealed may be missing. With a
    # 0-second watermark every session except possibly each user's final
    # (still-open or sealed only after the last batch) must be emitted.
    last_per_user = {}
    for (u, sn) in expected:
        last_per_user[u] = max(last_per_user.get(u, -1), sn)
    must_close = {
        (u, sn) for (u, sn) in expected if sn < last_per_user[u]
    }
    missing = must_close - set(got)
    assert not missing, sorted(missing)[:5]


def test_extraction_kernel_handles_empty_input(spark):
    """A zero-row input must yield a zero-row, schema-correct output
    (an empty pandas batch has no columns without columns=)."""
    from pyspark.sql import types as T

    from doc_parser_spark.core import schemas
    from doc_parser_spark.operators.extract import extract_documents

    pages_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    empty = spark.createDataFrame([], pages_schema)
    out = extract_documents(empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        f.name for f in schemas.DOCUMENTS_OUT_SCHEMA.fields
    ]


def test_streaming_ingestion_relations(spark, tmp_path):
    """The session-7 ingestion kernels (WARC record walk, charset
    verdicts) are plain mapInPandas stages, so they must compose with
    readStream unchanged — micro-batch output equals the batch run."""
    from doc_parser_spark.operators.extract import extract_charset, warc_records

    def rec(wtype, body, extra=""):
        return (
            f"WARC/1.0\r\nWARC-Type: {wtype}\r\n{extra}"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body

    chain = b"\r\n\r\n".join(
        [
            rec("warcinfo", b"software: s\r\n"),
            rec(
                "response",
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>ok</p>",
                "WARC-Target-URI: https://e.com/s\r\n",
            ),
        ]
    )
    sjis = "<html><head><meta charset=Shift_JIS></head><body>日本語</body></html>".encode(
        "shift_jis"
    )
    pages = spark.createDataFrame(
        [("https://e.com/s", bytearray(chain)), ("https://e.com/j", bytearray(sjis))],
        "url string, html binary",
    )
    src = str(tmp_path / "warc_in")
    pages.write.parquet(src)
    stream = spark.readStream.schema(pages.schema).parquet(src)

    for name, op in (("warc_stream", warc_records), ("cs_stream", extract_charset)):
        q = (
            op(stream)
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "streaming query timed out"
        got = sorted(
            tuple(r) for r in spark.sql(f"select * from {name}").collect()
        )
        want = sorted(tuple(r) for r in op(pages).collect())
        assert got == want and len(got) > 0


def test_streaming_polite_schedule_slots_continue_across_batches(spark, tmp_path):
    from datetime import datetime, timezone

    from pyspark.sql import Row

    from doc_parser_spark.streaming.stream import streaming_polite_schedule

    in_dir = str(tmp_path / "fin")
    out_dir = str(tmp_path / "fout")
    ckpt = str(tmp_path / "fckpt")

    def t(m):
        return datetime(2024, 1, 1, 12, m, tzinfo=timezone.utc)

    def run():
        stream = (
            spark.readStream.schema(
                "host string, url string, discovered_ts timestamp,"
                " delay_ms long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            streaming_polite_schedule(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "streaming query timed out"

    b1 = [
        Row(host="a.com", url="u2", discovered_ts=t(1), delay_ms=1000),
        Row(host="a.com", url="u1", discovered_ts=t(0), delay_ms=1000),
        Row(host="b.com", url="v1", discovered_ts=t(0), delay_ms=7000),
    ]
    # one file per logical batch (maxFilesPerTrigger=1 -> one micro-batch)
    spark.createDataFrame(b1).coalesce(1).write.parquet(in_dir)
    run()
    # batch 2: a.com discovers two more urls — slots must CONTINUE (2, 3)
    b2 = [
        Row(host="a.com", url="u3", discovered_ts=t(5), delay_ms=1000),
        Row(host="a.com", url="u4", discovered_ts=t(6), delay_ms=1000),
    ]
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(in_dir)
    run()

    out = {(r.host, r.url): r for r in spark.read.parquet(out_dir).collect()}
    # within-batch order: (discovered_ts, url) — u1 before u2
    assert (out[("a.com", "u1")].slot, out[("a.com", "u2")].slot) == (0, 1)
    assert out[("b.com", "v1")].slot == 0
    assert {out[("a.com", "u3")].slot, out[("a.com", "u4")].slot} == {2, 3}
    assert out[("a.com", "u3")].slot < out[("a.com", "u4")].slot
    # spacing: slot * per-host delay
    assert out[("a.com", "u4")].not_before_ms == 3 * 1000
    assert out[("b.com", "v1")].not_before_ms == 0


def test_streaming_host_rate_matches_batch_and_flags_violations(
    spark, tmp_path
):
    """Stream-static join + watermarked window agg: the streamed
    politeness monitor must equal the batch run row-for-row, and the
    budget math must flag exactly the host that exceeded
    window_seconds DIV crawl_delay fetches in a window."""
    import datetime
    import os

    from pyspark.sql import functions as F

    from doc_parser_spark.streaming.stream import streaming_host_rate

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # fast.com: 5 fetches in minute 0 (delay 20s -> allowed 3) = over
    for i in range(5):
        rows.append((f"https://fast.com/p{i}",
                     t0 + datetime.timedelta(seconds=i * 10), b"x" * 100))
    # slow.com: 2 fetches in minute 0 (delay 30s -> allowed 2) = ok
    for i in range(2):
        rows.append((f"https://slow.com/p{i}",
                     t0 + datetime.timedelta(seconds=i * 25), b"y" * 50))
    # free.com: no robots row -> NULL allowance, never over
    rows.append(("https://free.com/a", t0, b"z"))
    # fast.com minute 1: only 2 fetches = ok
    for i in range(2):
        rows.append((f"https://fast.com/q{i}",
                     t0 + datetime.timedelta(seconds=60 + i * 20), b"x" * 10))
    # sentinel capture far ahead: advances the stream's watermark past
    # minute 1 so append mode seals every window under comparison (its
    # own window stays open by construction — excluded below)
    rows.append(("https://sentinel.com/w",
                 t0 + datetime.timedelta(seconds=300), b"s"))
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )
    profile = spark.createDataFrame(
        [("fast.com", 20), ("slow.com", 30)], "host string, crawl_delay_s int"
    )

    batch = [
        r for r in streaming_host_rate(pages, profile).collect()
        if r.host != "sentinel.com"
    ]
    got = {(str(r.window_start), r.host): r for r in batch}
    over = got[("2024-01-01 00:00:00", "fast.com")]
    assert (over.n_fetches, over.allowed_fetches, over.over_budget) == (5, 3, True)
    ok = got[("2024-01-01 00:00:00", "slow.com")]
    assert (ok.n_fetches, ok.allowed_fetches, ok.over_budget) == (2, 2, False)
    free = got[("2024-01-01 00:00:00", "free.com")]
    assert free.allowed_fetches is None and not free.over_budget
    later = got[("2024-01-01 00:01:00", "fast.com")]
    assert not later.over_budget

    # streamed in 2 micro-batches -> identical rows
    src = str(tmp_path / "rate_in")
    os.makedirs(src)
    pages.where("warc_ts < '2024-01-01 00:01:00'").coalesce(1).write.parquet(
        f"{src}/slice=0")
    pages.where(
        "warc_ts >= '2024-01-01 00:01:00' AND warc_ts < '2024-01-01 00:02:00'"
    ).coalesce(1).write.parquet(f"{src}/slice=1")
    pages.where("warc_ts >= '2024-01-01 00:02:00'").coalesce(1).write.parquet(
        f"{src}/slice=2")
    stream = (
        spark.readStream.schema(pages.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/slice=*")
    )
    q = (
        streaming_host_rate(stream, profile, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("host_rate_stream")
        .option("checkpointLocation", str(tmp_path / "rate_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "streaming query timed out"
    streamed = [
        r for r in spark.sql("SELECT * FROM host_rate_stream").collect()
        if r.host != "sentinel.com"
    ]
    key = lambda r: (str(r.window_start), r.host)  # noqa: E731
    assert {key(r): tuple(r) for r in streamed} == {
        key(r): tuple(r) for r in batch
    }


def test_streaming_wav_stats_parity(spark, tmp_path):
    """The codec-stat kernels are plain Arrow-batched mapInPandas stages,
    so they run UNCHANGED under Structured Streaming — prove it: stream
    the synthetic audio corpus through wav_stats with an exactly-once
    file sink and require row parity with the batch run."""
    from doc_parser_spark.operators import multimodal as mm

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.range(40).selectExpr("id AS doc_id")
    mm.synth_audio_corpus(docs).write.parquet(in_dir)

    batch = {
        tuple(r) for r in mm.wav_stats(spark.read.parquet(in_dir)).collect()
    }
    assert len(batch) == 40

    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .parquet(in_dir)
    )
    q = (
        mm.wav_stats(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query timed out"
    out = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    assert out == batch
