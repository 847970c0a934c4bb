"""Batch/stream parity and state-carry tests for the streaming skin."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from mongo_polars_reconciliation_spark.functions.timenorm import ensure_epoch_nanos
from mongo_polars_reconciliation_spark.harness.queries import QUERIES, _ab
from mongo_polars_reconciliation_spark.scratch import scratch_path
from mongo_polars_reconciliation_spark.streaming.events import (
    EVENTS_SCHEMA,
    read_events_stream,
    run_to_table,
    session_agg,
    user_running_seq,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_hourly_stream_equals_batch(spark):
    streamed = QUERIES["stream_events_hourly"](spark, SF_DIR)
    batch = QUERIES["events_hourly"](spark, SF_DIR)
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def test_session_window_batch_and_stream_agree(spark):
    """session_agg is one function for both regimes: applied to the batch
    frame it must give the same sessions as the drained stream."""
    streamed = QUERIES["stream_sessionize_agg"](spark, SF_DIR)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = session_agg(
        spark.read.parquet(f"{SF_DIR}/events.parquet"), watermark=None
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def test_user_seq_state_carries_across_batches(spark):
    """Two micro-batches (maxFilesPerTrigger=1 over two files): the stateful
    operator must continue each user's sequence where batch 1 left off —
    max(seq) per user equals that user's total events, with no gaps."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # normalize ts to the engine's nanos-long convention BEFORE writing the
    # feed files: the stream below declares EVENTS_SCHEMA (ts bigint), and
    # feed files must physically match the declared schema
    ev = ensure_epoch_nanos(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    root = scratch_path("test_userseq_2batch")
    shutil.rmtree(root, ignore_errors=True)
    # split by time so batch order == event order per user
    mid = ev.approxQuantile("ts", [0.5], 0.0)[0]
    ev.where(F.col("ts") <= mid).write.parquet(f"{root}/feed/000_first.parquet")
    ev.where(F.col("ts") > mid).write.parquet(f"{root}/feed/001_second.parquet")
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{root}/feed/*.parquet")
    )
    out = run_to_table(user_running_seq(src), "mem_userseq_2b", output_mode="append")
    per_user = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("seq_in_user").alias("mx"),
        F.countDistinct("seq_in_user").alias("uniq"),
    )
    bad = per_user.where(
        (F.col("n") != F.col("mx")) | (F.col("n") != F.col("uniq"))
    ).count()
    assert bad == 0
    expected = ev.groupBy("user_id").count()
    assert sorted(map(tuple, per_user.select("user_id", "n").collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_incremental_match_converges_to_batch_set(spark):
    """The foreachBatch incremental reconciliation over two half-feeds must
    match exactly the A ids the one-shot batch engine matches."""
    from mongo_polars_reconciliation_spark.operators.match import match_records

    inc = QUERIES["stream_incremental_match"](spark, SF_DIR)
    cfg, a, b = _ab(spark, SF_DIR)
    batch_matched, _ = match_records(a, b, cfg)
    assert sorted(r["_id"] for r in inc.collect()) == sorted(
        r["_id"] for r in batch_matched.select("_id").collect()
    )


def test_user_seq_orders_across_arrow_chunk_boundaries(spark):
    """A user group bigger than arrow.maxRecordsPerBatch arrives as several
    Arrow chunks; the operator must still number events in global (ts,
    event_id) order, not chunk-arrival order. Force 7-row chunks over a
    50-event user written to the feed file in REVERSE time order."""
    import pandas as pd

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        root = scratch_path("test_userseq_chunks")
        shutil.rmtree(root, ignore_errors=True)
        n = 50
        pdf = pd.DataFrame(
            {
                "event_id": range(n, 0, -1),
                "ts": range(n, 0, -1),  # epoch nanos; ts == event_id
                "user_id": [1] * n,
                "event_type": ["view"] * n,
                "value": [1.0] * n,
                "props": ["{}"] * n,
            }
        )
        spark.createDataFrame(pdf, schema=EVENTS_SCHEMA).coalesce(1).write.parquet(
            f"{root}/feed/batch0.parquet"
        )
        src = spark.readStream.schema(EVENTS_SCHEMA).parquet(f"{root}/feed/*.parquet")
        out = run_to_table(
            user_running_seq(src), "mem_userseq_chunks", output_mode="append"
        )
        got = {r["event_id"]: r["seq_in_user"] for r in out.collect()}
        # event_id k has ts=k seconds, so seq must equal event_id
        assert got == {k: k for k in range(1, n + 1)}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_view_attribution_stream_equals_batch(spark):
    """The interval join is one function for both regimes: applied to the
    batch events frame it must equal the drained stream result."""
    from mongo_polars_reconciliation_spark.streaming.events import (
        view_purchase_attribution,
    )

    streamed = QUERIES["stream_view_attribution"](spark, SF_DIR)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = view_purchase_attribution(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_corrupt_state_dir_fails_loudly(spark, tmp_path):
    """A state dir that EXISTS but is unreadable must fail the stream, not
    be silently treated as first-batch (which would re-match everything)."""
    from mongo_polars_reconciliation_spark.streaming.recon import (
        _has_state_files,
        incremental_match,
    )

    root = str(tmp_path / "corrupt_state")
    state, ckpt, feed = f"{root}/state", f"{root}/ckpt", f"{root}/feed"
    os.makedirs(state)
    with open(f"{state}/part-00000.parquet", "wb") as f:
        f.write(b"this is not a parquet file")
    assert _has_state_files(spark, state)

    cfg, a, b = _ab(spark, SF_DIR)
    b.limit(10).write.mode("overwrite").parquet(f"{feed}/half0")
    b_stream = (
        spark.readStream.schema(b.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{feed}/half*")
    )
    with pytest.raises(Exception, match="(?i)parquet|magic|foreach"):
        incremental_match(a, b_stream, cfg, state, ckpt)


def test_has_state_files_absent_and_empty(spark, tmp_path):
    from mongo_polars_reconciliation_spark.streaming.recon import _has_state_files

    assert not _has_state_files(spark, str(tmp_path / "never_created"))
    empty = tmp_path / "empty_state"
    empty.mkdir()
    assert not _has_state_files(spark, str(empty))


def test_stream_dedup_corpus_state_carries_across_batches(spark):
    """A text whose copies arrive in DIFFERENT micro-batches must still
    aggregate to one state row with the global min keeper and total count —
    the cross-batch state-store merge, not just within-batch grouping."""
    from pyspark.sql import functions as F

    from mongo_polars_reconciliation_spark.streaming.corpus import (
        dedup_state,
        read_documents_stream,
    )
    from mongo_polars_reconciliation_spark.streaming.events import run_to_table

    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "only once")],
        "doc_id long, text string",
    )
    # doc 1 and 3 in batch 0; doc 2 (the duplicate) in batch 1
    stream = read_documents_stream(
        spark,
        docs,
        name="dedup_carry",
        split_expr=F.when(F.col("doc_id") == 2, F.lit(1)).otherwise(F.lit(0)),
    )
    out = run_to_table(
        dedup_state(stream), "mem_dedup_carry", output_mode="complete"
    )
    got = {r["keeper_id"]: r["n_copies"] for r in out.collect()}
    assert got == {1: 2, 3: 1}


def test_compact_ingest_state_closes_the_loop(spark):
    """r9: after the streaming crawl loop drains, compacting the
    append-only state dirs into bucketed tables preserves the admission
    horizon — re-delivering the SAME batch against the compacted tables
    admits nothing (idempotence survives the rewrite), and the compacted
    faces carry the bucketed layout the anti-join plan pins rely on."""
    from mongo_polars_reconciliation_spark.extensions.dedup import (
        ingest_novel_neardup,
    )
    from mongo_polars_reconciliation_spark.streaming.corpus import (
        compact_ingest_state,
    )

    sf_dir = "/root/testdata/sf0.001"
    # drain the streaming loop (also the parity query's path)
    admitted = QUERIES["stream_ingest_neardup"](spark, sf_dir)
    n_admitted = admitted.count()
    assert n_admitted > 0
    root = scratch_path("sf0.001", "neardup_state")
    tables = compact_ingest_state(spark, f"{root}/state",
                                  table_prefix="t_compact", buckets=4)
    assert set(tables) == {"digests", "bands", "docs"}
    # compacted digest count == distinct admitted digests
    assert (
        spark.table(tables["digests"]).count()
        == admitted.select("text_hash").distinct().count()
    )
    # the full admission horizon = seeds + compacted state; re-deliver
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    hist = docs.where(F.col("doc_id") % 3 < 2)
    near_text = F.expr("substring(text, instr(text, ' ') + 1)")
    batch = (
        docs.where(F.col("doc_id") % 3 == 2)
        .unionByName(
            docs.where(F.col("doc_id") % 10 == 7).select(
                (F.col("doc_id") + 100000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") % 10 == 3).select(
                (F.col("doc_id") + 200000).alias("doc_id"),
                near_text.alias("text"),
            )
        )
    )
    from mongo_polars_reconciliation_spark.extensions.dedup import band_state

    seed_digests = hist.select(
        F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary")).alias(
            "text_hash"
        )
    ).distinct()
    again = ingest_novel_neardup(
        batch,
        seed_digests.unionByName(
            spark.table(tables["digests"]).select("text_hash")
        ).distinct(),
        band_state(hist).unionByName(spark.table(tables["bands"])),
        hist.unionByName(spark.table(tables["docs"])),
        mis_max_iter=8,
    )
    assert again.count() == 0
    # layout: every face carries the bucket spec on its join key (a bare
    # scan won't USE buckets — the join-side exploitation is what the
    # test_bucketing.py plan pins verify; here we pin the catalog spec)
    keys = {"digests": "text_hash", "bands": "bband", "docs": "doc_id"}
    for face, key in keys.items():
        desc = {
            r["col_name"].strip(): r["data_type"].strip()
            for r in spark.sql(f"DESCRIBE FORMATTED {tables[face]}").collect()
        }
        assert desc.get("Num Buckets") == "4", (face, desc)
        assert key in desc.get("Bucket Columns", ""), (face, desc)


def test_neardup_stream_state_matches_nondefault_geometry(spark):
    """r10 (advice): the crawl loop must persist admitted docs' band
    state with the SAME MinHash geometry (n/num_hashes/bands/hash_mode)
    it admits with. With non-default bands, a near-dup of a batch-1
    ADMISSION arriving in batch 2 collides only if the persisted bband
    keys were built with the matching rows-per-band — before the fix,
    ``band_state`` ran with defaults and the probe silently missed."""
    from mongo_polars_reconciliation_spark.streaming.corpus import (
        incremental_neardup_ingest,
        read_documents_stream,
    )

    toks = [f"w{i:02d}" for i in range(1, 13)]
    orig = " ".join(toks)            # doc 10, batch 0 (novel)
    near = " ".join(toks[1:])        # doc 20, batch 1: J = 9/10 near-dup
    docs = spark.createDataFrame(
        [(10, orig), (20, near)], "doc_id long, text string"
    )
    stream = read_documents_stream(
        spark,
        docs.coalesce(1),
        name="nondefault_geom",
        split_expr=(F.col("doc_id") >= 20).cast("int"),
    )
    empty_dg = spark.createDataFrame([], "text_hash string")
    empty_bands = spark.createDataFrame([], "bband string, doc_id long")
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    root = scratch_path("unit", "nondefault_geom_state")
    shutil.rmtree(root, ignore_errors=True)
    incremental_neardup_ingest(
        stream,
        empty_dg,
        empty_bands,
        empty_docs,
        f"{root}/state",
        f"{root}/ckpt",
        num_hashes=12,
        bands=6,
    )
    admitted = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{root}/state/admitted").collect()
    )
    # doc 20 must be rejected THROUGH the persisted band state: with
    # mismatched geometry its probe keys never equal the stored keys and
    # it slips in (admitted == [10, 20])
    assert admitted == [10], admitted
    # sanity: the pair really is a verified near-dup under this geometry
    # (otherwise the rejection above proves nothing)
    from mongo_polars_reconciliation_spark.extensions.dedup import (
        band_state,
    )

    b10 = {
        r["bband"]
        for r in band_state(
            docs.where(F.col("doc_id") == 10), num_hashes=12, bands=6
        ).collect()
    }
    b20 = {
        r["bband"]
        for r in band_state(
            docs.where(F.col("doc_id") == 20), num_hashes=12, bands=6
        ).collect()
    }
    assert b10 & b20, "fixture lost its band collision"


def test_neardup_ingest_tolerates_duplicate_state_rows(spark):
    """r10 (advice): the ledger-last write order means a crash-replayed
    trigger can append bands/ and docs/ rows twice; the batch operator
    must return the same admissions over duplicated state faces (the
    docs dedup happens after the candidate semi-join, so a duplicated
    history doc cannot double its Jaccard sizes)."""
    from mongo_polars_reconciliation_spark.extensions.dedup import (
        band_state,
        ingest_novel_neardup,
    )
    from tests.test_properties import _neardup_fixture

    hist, batch, digests, bands = _neardup_fixture(spark)
    clean = sorted(
        r["doc_id"]
        for r in ingest_novel_neardup(
            batch, digests, bands, hist, mis_max_iter=8
        ).collect()
    )
    dup = sorted(
        r["doc_id"]
        for r in ingest_novel_neardup(
            batch,
            digests,
            bands.unionAll(bands),
            hist.unionAll(hist),
            mis_max_iter=8,
        ).collect()
    )
    assert clean == dup and len(clean) > 0


def test_compact_ingest_state_refuses_remote_warehouse(spark):
    """r10 (advice): the compaction's stale-location cleanup shells out
    to the local filesystem; a non-file: warehouse URI must fail loudly
    BEFORE any table drop, not rmtree a stripped-scheme path."""
    import pytest as _pytest

    from mongo_polars_reconciliation_spark.streaming.corpus import (
        compact_ingest_state,
    )

    class _Conf:
        def get(self, key):
            assert key == "spark.sql.warehouse.dir"
            return "s3a://bucket/warehouse"

    class _FakeSpark:
        conf = _Conf()

        def sql(self, *_a, **_k):  # pragma: no cover - must not be reached
            raise AssertionError("guard must fire before any catalog op")

    with _pytest.raises(ValueError, match="local .file:. warehouse"):
        compact_ingest_state(_FakeSpark(), "/tmp/nowhere")


def test_semantic_stream_rejects_cross_trigger_dup(spark):
    """r10: the embedding-space crawl loop must reject a trigger-2 exact
    re-upload of a trigger-1 ADMISSION through the persisted (assign,
    vecs) state — the cross-trigger face of the cos-1.0 ledger. The
    drained vecs/ face is the admitted set."""
    from mongo_polars_reconciliation_spark.streaming.corpus import (
        incremental_semantic_ingest,
        read_documents_stream,
    )

    vecs = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0]),
            (20, [1.0, 0.0, 0.0]),   # batch 1: exact copy of admitted 10
            (21, [0.0, 0.0, 1.0]),   # batch 1: genuinely novel
        ],
        "vec_id long, embedding array<float>",
    )
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    stream = read_documents_stream(
        spark,
        vecs.coalesce(1),
        name="sem_cross_trigger",
        id_col="vec_id",
        split_expr=(F.col("vec_id") >= 20).cast("int"),
    )
    from mongo_polars_reconciliation_spark.harness.queries import (
        _pin_feed_trigger_order,
    )

    _pin_feed_trigger_order(scratch_path("corpus", "sem_cross_trigger", "feed"))
    empty_assign = spark.createDataFrame([], "blk int, vec_id long")
    empty_vecs = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    root = scratch_path("unit", "sem_cross_trigger_state")
    shutil.rmtree(root, ignore_errors=True)
    incremental_semantic_ingest(
        stream,
        empty_assign,
        empty_vecs,
        cents,
        f"{root}/state",
        f"{root}/ckpt",
        threshold=0.9,
        nprobe=2,
    )
    admitted = sorted(
        r["vec_id"]
        for r in spark.read.parquet(f"{root}/state/vecs").collect()
    )
    assert admitted == [10, 21], admitted
    # the assign face carries nprobe rows per admitted vector
    assign = spark.read.parquet(f"{root}/state/assign")
    assert assign.count() == 4 and sorted(
        {r["vec_id"] for r in assign.collect()}
    ) == [10, 21]


def test_payload_stream_rejects_cross_trigger_dups(spark):
    """r10: the payload crawl loop must reject, through the persisted
    state, BOTH a trigger-2 byte-exact re-upload of a trigger-1
    admission (digest ledger) and a trigger-2 chunked-block near-dup of
    it (block face, shared fraction 3/4 >= 0.5)."""
    from mongo_polars_reconciliation_spark.streaming.corpus import (
        incremental_payload_ingest,
        read_documents_stream,
    )

    p = b"AAAABBBBCCCCDDDD"            # 4 blocks of 4 bytes
    near = b"AAAABBBBCCCCEEEE"         # shares 3/4 aligned blocks
    novel = b"WWWWXXXXYYYYZZZZ"
    mm = spark.createDataFrame(
        [(10, p), (20, p), (21, near), (22, novel)],
        "doc_id long, payload binary",
    )
    stream = read_documents_stream(
        spark,
        mm.coalesce(1),
        name="payload_cross_trigger",
        split_expr=(F.col("doc_id") >= 20).cast("int"),
    )
    from mongo_polars_reconciliation_spark.harness.queries import (
        _pin_feed_trigger_order,
    )

    _pin_feed_trigger_order(
        scratch_path("corpus", "payload_cross_trigger", "feed")
    )
    empty_dg = spark.createDataFrame([], "payload_hash string")
    empty_blocks = spark.createDataFrame(
        [], "bblock string, doc_id long, n_blocks long"
    )
    root = scratch_path("unit", "payload_cross_trigger_state")
    shutil.rmtree(root, ignore_errors=True)
    incremental_payload_ingest(
        stream,
        empty_dg,
        empty_blocks,
        f"{root}/state",
        f"{root}/ckpt",
        block_bytes=4,
        threshold=0.5,
    )
    admitted = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{root}/state/admitted").collect()
    )
    assert admitted == [10, 22], admitted


def _bucket_spec(spark, table):
    return {
        r["col_name"].strip(): r["data_type"].strip()
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    }


def test_compact_semantic_state_closes_the_loop(spark):
    """r10: compacting the embedding-space crawl loop's append-only faces
    into bucketed tables preserves the admission horizon — re-delivering
    the SAME batch against (seeds + compacted tables) admits nothing —
    and each face carries the bucket spec on its join key."""
    from mongo_polars_reconciliation_spark.extensions.similarity import (
        assignment_state,
        ingest_novel_semantic,
        load_centroids,
    )
    from mongo_polars_reconciliation_spark.streaming.corpus import (
        compact_semantic_state,
    )

    sf_dir = "/root/testdata/sf0.001"
    admitted = QUERIES["stream_ingest_semantic"](spark, sf_dir)
    assert admitted.count() > 0
    root = scratch_path("sf0.001", "sem_ingest_state")
    tables = compact_semantic_state(
        spark, f"{root}/state", table_prefix="t_sem_compact", buckets=4
    )
    assert set(tables) == {"vecs", "assign"}

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    hist = emb.where(F.col("vec_id") % 3 < 2)
    batch = (
        emb.where(F.col("vec_id") % 3 == 2)
        .unionByName(
            emb.where(F.col("vec_id") % 10 == 1).select(
                (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
            )
        )
        .unionByName(
            emb.where(F.col("vec_id") % 10 == 4).select(
                (F.col("vec_id") + 200000).alias("vec_id"),
                F.expr(
                    "transform(embedding, (x, i) -> CASE WHEN i < 8 "
                    "THEN CAST(0.0 AS FLOAT) ELSE x END)"
                ).alias("embedding"),
            )
        )
    )
    cents = load_centroids(
        spark, scratch_path("sf0.001", "stream_ingest_centroids")
    )
    again = ingest_novel_semantic(
        batch,
        assignment_state(hist, cents, nprobe=2).unionByName(
            spark.table(tables["assign"])
        ),
        hist.unionByName(spark.table(tables["vecs"])),
        cents,
        mis_max_iter=8,
    )
    assert again.count() == 0
    for face, key in {"vecs": "vec_id", "assign": "blk"}.items():
        desc = _bucket_spec(spark, tables[face])
        assert desc.get("Num Buckets") == "4", (face, desc)
        assert key in desc.get("Bucket Columns", ""), (face, desc)


def test_compact_payload_state_closes_the_loop(spark):
    """r10: the payload-face mirror of the compaction pin — re-delivery
    against (seeds + compacted tables) admits nothing, bucket specs on
    the digest and block join keys."""
    from mongo_polars_reconciliation_spark.extensions.multimodal import (
        attach_payload,
        ingest_novel_payloads,
        payload_block_state,
    )
    from mongo_polars_reconciliation_spark.harness.fixtures import (
        MM_PAYLOAD_TAIL,
    )
    from mongo_polars_reconciliation_spark.streaming.corpus import (
        compact_payload_state,
    )

    sf_dir = "/root/testdata/sf0.001"
    admitted = QUERIES["stream_ingest_payloads"](spark, sf_dir)
    assert admitted.count() > 0
    root = scratch_path("sf0.001", "payload_ingest_state")
    tables = compact_payload_state(
        spark, f"{root}/state", table_prefix="t_payload_compact", buckets=4
    )
    assert set(tables) == {"digests", "blocks"}
    # compacted ledger == drained admitted set
    assert spark.table(tables["digests"]).count() == admitted.count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    hist = attach_payload(docs.where(F.col("doc_id") % 3 < 2))
    batch = attach_payload(
        docs.where(F.col("doc_id") % 3 == 2)
        .unionByName(
            docs.where(F.col("doc_id") % 10 == 7).select(
                (F.col("doc_id") + 100000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") % 10 == 5).select(
                (F.col("doc_id") + 300000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(MM_PAYLOAD_TAIL)).alias(
                    "text"
                ),
            )
        )
    ).select("doc_id", "payload")
    seed_digests = hist.select(
        F.md5(
            F.coalesce(F.col("payload"), F.lit("").cast("binary"))
        ).alias("payload_hash")
    ).distinct()
    again = ingest_novel_payloads(
        batch,
        seed_digests.unionByName(
            spark.table(tables["digests"]).select("payload_hash")
        ).distinct(),
        payload_block_state(hist, block_bytes=64).unionByName(
            spark.table(tables["blocks"])
        ),
        block_bytes=64,
        mis_max_iter=8,
    )
    assert again.count() == 0
    for face, key in {"digests": "payload_hash", "blocks": "bblock"}.items():
        desc = _bucket_spec(spark, tables[face])
        assert desc.get("Num Buckets") == "4", (face, desc)
        assert key in desc.get("Bucket Columns", ""), (face, desc)


def test_stream_cms_equals_batch_counters(spark):
    """r14 carrying pin for the RETIRED registry face stream_cms_counters
    (VERDICT r13 #5): the drained complete-mode CMS state equals the batch
    sketch's (j, b) counters bit-for-bit — counter increments are plain
    sums, so they commute with micro-batching. The counter MATH itself
    stays independently oracle-checked through text_heavy_hitters_cms and
    text_cms_merge (same hashes, DuckDB-recomputed); this pin carries the
    one thing the retired face added — stream ≡ batch."""
    from mongo_polars_reconciliation_spark.extensions.text import (
        cms_merge_check,
    )
    from mongo_polars_reconciliation_spark.harness.queries import (
        stream_cms_counters,
    )

    sf_dir = "/root/testdata/sf0.001"
    streamed = sorted(
        tuple(r) for r in stream_cms_counters(spark, sf_dir).collect()
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = sorted(
        (r["j"], r["b"], r["cnt_global"])
        for r in cms_merge_check(docs).collect()
    )
    assert streamed == batch
