"""Physical-plan quality gates: the optimizations SURVEY §4 promises must
actually appear in the plans — filter pushdown to the parquet scan, column
pruning, map-side partial aggregation, broadcast joins for dimensions,
top-k without a global sort, binary-column pruning, whole-stage codegen."""

import re

import pytest

from akf_cdparser_spark.analytics import multimodal
from akf_cdparser_spark.operators import extract as X
from akf_cdparser_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


def test_q01_scan_quality(spark):
    p = _plan(spark, REGISTRY["q01_pricing_summary"][0](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    assert p.count("HashAggregate") >= 2          # partial + final
    assert "l_tax" not in p                        # column pruning
    # whole-stage codegen spans: AQE finalizes the physical plan only at
    # execution, so run the query and inspect the executed plan's * markers
    df = REGISTRY["q01_pricing_summary"][0](spark, SF)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "*(" in executed  # codegen stage ids like *(1), *(2)


def test_q02_broadcast_and_topk(spark):
    p = _plan(spark, REGISTRY["q02_top_customers"][0](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p            # top-k, no global sort


def test_q04_dimension_broadcasts(spark):
    p = _plan(spark, REGISTRY["q04_region_rollup"][0](spark, SF))
    assert p.count("BroadcastHashJoin") >= 2


def test_q20_column_pruning(spark):
    p = _plan(spark, REGISTRY["q20_token_count"][0](spark, SF))
    m = re.search(r"ReadSchema: (.*)", p)
    assert m and "lang" not in m.group(1) and "source" not in m.group(1)


def test_q27_query_side_broadcast(spark):
    p = _plan(spark, REGISTRY["q27_embedding_topk"][0](spark, SF))
    assert "Broadcast" in p


def test_multimodal_binary_pruned(spark):
    docs = X.docs_dataframe(spark, 8)
    media = multimodal.synth_media(spark, docs)
    p = _plan(spark, multimodal.metadata_only(media))
    out = re.search(r"Output.*", p)
    assert out and "content" not in out.group(0)


def test_q26_simhash_shuffle_free(spark):
    """SimHash is a pure per-document function, so the plan must carry NO
    Exchange at all (round-7: the single-groupBy lane formulation became a
    per-partition mapInArrow kernel — the one shuffle it still paid was
    removed outright, guide §2.4) and the scan must stay pruned to
    (doc_id, text)."""
    from akf_cdparser_spark.analytics import dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(spark, dedup.simhash(docs))
    # formatted mode prints each node in the tree AND a detail section —
    # count the detail headers "(N) Exchange"
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 0, p
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_q61_media_features_plan(spark):
    """The media feature pipeline stays a single Arrow stage per input
    split: no shuffle between the spans scan and the feature UDF (the
    repartition width is data-size derived, one Exchange at most)."""
    df = REGISTRY["q61_media_features"][0](spark, SF)
    p = _plan(spark, df)
    # mapInPandas stages for synthesis + media + features; the only
    # exchange is the byte-budget repartition before the decode UDF
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 1, p


def test_ivf_inverted_lists_shuffle_free(spark):
    """The IVF assignment stage (similarity.ivf_inverted_lists) must build
    the multi-assignment inverted lists without shuffling the corpus: the
    centroid row arrives by broadcast, scoring/top-a are higher-order
    projections, explode fans out in place. The only allowed Exchanges are
    on the (tiny) centroid subplan feeding TakeOrderedAndProject /
    the one-row collapse — never a hashpartitioning of the corpus by
    vec_id or list_id."""
    from akf_cdparser_spark.analytics import similarity
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = _plan(spark, similarity.ivf_inverted_lists(emb, n_lists=8, n_assign=2))
    assert "BroadcastExchange" in p
    assert not re.search(r"Exchange hashpartitioning\((vec_id|list_id)", p), p


def test_q67_training_mix_single_exchange(spark):
    """The composed curation pass (dedup + quality + langid + sharding)
    promises ONE shuffle — the fingerprint window. More Exchanges would
    mean the composition degraded into per-feature joins."""
    p = _plan(spark, REGISTRY["q67_training_mix"][0](spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_q108_semantic_mix_plan_shape(spark):
    """The semantically-composed capstone: the relational tail must STILL
    shuffle exactly once on the fingerprint (the q67 guard extended — the
    semdedup prepass adds its own clustering stages, but composing it in
    must not degrade the tail into per-feature joins), and the
    quality-canonical window must not add a second fingerprint Exchange
    (row_number rides the same partitioning)."""
    p = _plan(spark, REGISTRY["q108_curated_semantic_mix"][0](spark, SF))
    # formatted mode lists Exchange args on their own "Arguments:" line
    assert len(re.findall(r"hashpartitioning\(fingerprint", p)) == 1, p


def test_quality_canonical_mix_single_exchange(spark):
    """quality_canonical=True alone keeps the one-Exchange promise: the
    keeper-order row_number shares the fingerprint window partition."""
    from akf_cdparser_spark.analytics import text as T
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(spark, T.curate_training_mix(docs, quality_canonical=True))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_q06_filters_pushed(spark):
    p = _plan(spark, REGISTRY["q06_revenue_filter"][0](spark, SF))
    assert "PushedFilters: [IsNotNull" in p


def test_crawl_fetch_join_broadcasts_keys(spark):
    """resolve_docs must broadcast the (tiny) scheduled keys so the
    multi-TB docs store never shuffles — no Exchange on the store side."""
    from akf_cdparser_spark.crawl.frontier import resolve_docs
    from pyspark.sql import functions as F

    docs_slim = X.slim_docs(X.docs_dataframe(spark, 32))
    scheduled = (spark.range(0, 8)
                 .select(F.format_string("akf://cd1999/%04d.html", "id")
                         .alias("url"),
                         F.col("id").alias("url_hash")))
    p = _plan(spark, resolve_docs(scheduled, docs_slim))
    assert "BroadcastHashJoin" in p
    # the docs side feeds the join directly (its only exchange is the
    # broadcast of the key side)
    assert p.count("Exchange hashpartitioning") == 0


def test_media_dedup_shuffle_excludes_payload_bytes(spark):
    """media_dedup's whole point at 100 TB: the sha256 is computed in the
    scan-side projection, so every Exchange in the plan moves
    (ref, hash, n_bytes) — the binary content column must appear in NO
    Exchange input. The plan string prints each Exchange's child output
    schema; assert 'content' is absent from all of them."""
    import re as _re

    from akf_cdparser_spark.analytics import multimodal

    docs = X.docs_dataframe(spark, 12)
    media = multimodal.synth_media_pooled(spark, docs, pool=3)
    df = multimodal.media_dedup(media)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    blocks = _re.findall(
        r"\(\d+\) (?:Broadcast)?Exchange\n((?:.+\n)+?)\n", p)
    assert blocks, p                              # the dedup shuffle exists
    for b in blocks:
        # the binary column is content#<id>; content_hash#<id> is the
        # 64-hex digest and is exactly what SHOULD move
        assert not _re.search(r"\bcontent#\d", b), b
    assert "sha2" in p and "content_hash" in p, p
