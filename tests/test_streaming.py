"""Structured Streaming smoke: streaming extraction over a docs directory,
watermarked windows, stateful sessionization."""

import pytest
from pyspark.sql import functions as F

from akf_cdparser_spark.operators import extract as X
from akf_cdparser_spark.streaming import pipeline


def test_stream_extract(spark, tmp_path):
    docs_dir = str(tmp_path / "docs_stream")
    X.docs_dataframe(spark, 16).write.parquet(docs_dir)
    q = pipeline.stream_extract(spark, docs_dir, query_name="t_stream_extract")
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM t_stream_extract")
        assert out.count() == 16
        assert out.filter(F.col("name").isNull()).count() == 0
    finally:
        q.stop()


def test_windowed_counts_batch_streaming_agree(spark, tmp_path):
    """The same windowed aggregation gives the same answer on a batch frame
    and on a stream over the same files (complete mode)."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch = pipeline.windowed_event_counts(events)
    expected = {(r.window_start, r.event_type): (r.n, r.sum_value)
                for r in batch.collect()}

    stream_src = (spark.readStream.schema(events.schema)
                  .parquet("/root/testdata/sf0.001"))
    agg = pipeline.windowed_event_counts(stream_src)
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName("t_windows").start())
    try:
        q.processAllAvailable()
        got = {(r.window_start, r.event_type): (r.n, r.sum_value)
               for r in spark.sql("SELECT * FROM t_windows").collect()}
        assert got == expected
    finally:
        q.stop()


def test_sessionize_stream_state(spark, tmp_path):
    """Stateful operator accumulates per-user state across micro-batches."""
    src_dir = str(tmp_path / "evt")
    events = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
              .filter(F.col("user_id") < 5)
              .select("user_id", "value"))
    events.write.parquet(src_dir)
    stream = (spark.readStream.schema(events.schema).parquet(src_dir))
    q = (pipeline.sessionize_stream(stream)
         .writeStream.outputMode("append")
         .format("memory").queryName("t_sessions")
         .trigger(availableNow=True).start())
    try:
        assert q.awaitTermination(120)
        rows = {r.user_id: (r.n_events, r.sum_value)
                for r in spark.sql("SELECT * FROM t_sessions").collect()}
        expected = {r.user_id: r.n for r in
                    events.groupBy("user_id")
                    .agg(F.count("*").alias("n")).collect()}
        assert {u: n for u, (n, _s) in rows.items()} == expected
    finally:
        q.stop()


def test_stream_exact_dedup_matches_batch_keeplist(spark, tmp_path):
    """Streaming exact dedup keeps exactly one row per content fingerprint
    and agrees with the batch keep-set (canonical members of
    analytics.dedup.exact_dedup) on fingerprints — first-arrival choice of
    doc_id may differ, the fingerprint set may not."""
    from akf_cdparser_spark.analytics import dedup

    docs_dir = str(tmp_path / "docs_dedup")
    base = spark.createDataFrame(
        [("a", "Hello  World"), ("b", "hello world"),   # dup after norm
         ("c", "Other Doc"), ("d", "OTHER   doc"),      # dup after norm
         ("e", "unique one")],
        "doc_id string, text string")
    base.write.parquet(docs_dir)

    batch_keep = {r.fingerprint for r in
                  dedup.exact_dedup(base).filter("is_canonical").collect()}

    stream = (spark.readStream.schema("doc_id string, text string")
              .parquet(docs_dir))
    q = (pipeline.stream_exact_dedup(stream)
         .writeStream.outputMode("append")
         .format("memory").queryName("t_dedup").start())
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT fingerprint FROM t_dedup").collect()
        assert len(got) == 3
        assert {r.fingerprint for r in got} == batch_keep
    finally:
        q.stop()
    # batch fallback: same operator, exact, no watermark state
    assert pipeline.stream_exact_dedup(base).count() == 3


def test_stream_curation_gate_matches_batch(spark, tmp_path):
    """The fused projection gate produces IDENTICAL rows on the streaming
    and batch paths (stateless — no watermark, no state store), and its
    columns agree with the batch operators it fuses (pii_scan +
    quality_scores)."""
    from akf_cdparser_spark.analytics import text as T

    docs_dir = str(tmp_path / "docs_gate")
    base = spark.createDataFrame(
        [("a", "Kontakt max.muster@firma.de erreichbar unter +49 30 1234567"
               " in allen wichtigen Angelegenheiten"),
         ("b", "!!!???!!!"),                       # fails quality gate
         ("c", "ein sauberes dokument ohne pii mit genug worten darin")],
        "doc_id string, text string")
    base.write.parquet(docs_dir)

    batch_rows = {tuple(r) for r in
                  pipeline.stream_curation_gate(base).collect()}
    pii = {r.doc_id: r for r in T.pii_scan(base).collect()}
    qual = {r.doc_id: r for r in T.quality_scores(base).collect()}
    for r in pipeline.stream_curation_gate(base).collect():
        assert r.redacted == pii[r.doc_id].redacted
        assert r.has_pii == pii[r.doc_id].has_pii
        assert r.quality_ok == qual[r.doc_id].quality_ok

    stream = (spark.readStream.schema("doc_id string, text string")
              .option("maxFilesPerTrigger", 1).parquet(docs_dir))
    q = (pipeline.stream_curation_gate(stream)
         .writeStream.outputMode("append")
         .format("memory").queryName("t_gate").start())
    try:
        q.processAllAvailable()
        stream_rows = {tuple(r) for r in
                       spark.sql("SELECT * FROM t_gate").collect()}
        assert stream_rows == batch_rows
        assert any(r.has_pii for r in pii.values())
    finally:
        q.stop()


def test_stream_gate_rounding_edge_agrees_with_batch(spark):
    """The round-5 ADVICE drift case: a doc whose RAW punct_ratio is in
    [0.2999995, 0.3) rounds to 0.3 at 6 dp, so the batch gate rejects it
    — the stream gate must reject it too (both now share
    text.quality_gate_exprs). A doc one punct short of the edge passes
    both."""
    from akf_cdparser_spark.analytics import text as T

    def doc(n_punct):
        # 5 leading tokens keep n_tokens >= 5; total length 2_000_000
        head = "a a a a "
        return head + "." * n_punct + "x" * (2_000_000 - len(head) - n_punct)

    base = spark.createDataFrame(
        [("edge", doc(599_999)),    # ratio exactly 0.2999995 -> rounds 0.3
         ("below", doc(599_998))],  # ratio 0.299999 -> passes
        "doc_id string, text string")
    batch = {r.doc_id: r.quality_ok
             for r in T.quality_scores(base).collect()}
    stream = {r.doc_id: r.quality_ok
              for r in pipeline.stream_curation_gate(base).collect()}
    assert batch == stream == {"edge": False, "below": True}


def test_stream_media_dedup_matches_batch_mapping(spark, tmp_path):
    """Streaming media dedup keeps exactly one row per payload hash and
    agrees with the batch media_dedup canonical set on hashes (first
    arrival may pick a different holder ref; the HASH set may not
    differ). Content bytes never enter streaming state — only the
    32-byte hash keys the dedup."""
    from akf_cdparser_spark.analytics import multimodal
    from akf_cdparser_spark.operators import extract as X

    docs = X.docs_dataframe(spark, 12)
    media = multimodal.synth_media_pooled(spark, docs, pool=3)
    media_dir = str(tmp_path / "media_pool")
    media.write.parquet(media_dir)

    batch_hashes = {r.content_hash for r in
                    multimodal.media_dedup(media).collect()}
    assert len(batch_hashes) == 3

    stream = (spark.readStream
              .schema(multimodal.MEDIA_SCHEMA)
              .option("maxFilesPerTrigger", 2)
              .parquet(media_dir))
    q = (pipeline.stream_media_dedup(stream)
         .select("media_ref", "content_hash")
         .writeStream.outputMode("append")
         .format("memory").queryName("t_media_dedup").start())
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT content_hash FROM t_media_dedup").collect()
        assert len(got) == 3
        assert {r.content_hash for r in got} == batch_hashes
    finally:
        q.stop()
    # batch fallback: same operator, exact
    assert pipeline.stream_media_dedup(media).count() == 3
