"""Structured Streaming: incremental embed-ingest (the reference's
"immediately searchable" freshness claim, README.md:69) and the
windowed event rollup's batch/stream agreement."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.operators.analytics import (
    events_hourly,
    events_sessionize,
)
from secure_agent_api_vector_search_spark.sources.tables import load_table
from secure_agent_api_vector_search_spark.streaming import events as SE
from secure_agent_api_vector_search_spark.streaming.ingest import embed_documents, start_ingest
from secure_agent_api_vector_search_spark.streaming.sessions import sessionize_stream


def _wait(query, timeout=60):
    deadline = time.time() + timeout
    while time.time() < deadline:
        query.processAllAvailable()
        if not query.status["isDataAvailable"]:
            return
        time.sleep(0.2)


def test_streaming_ingest_embeds_new_docs(spark, docs, tmp_path):
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    sample = docs.limit(25).select("doc_id", "text", "lang", "source", "n_chars")
    sample.write.mode("overwrite").parquet(in_dir)

    q = start_ingest(spark, in_dir, out_dir, ckpt, dim=16)
    try:
        _wait(q)
    finally:
        q.stop()

    out = spark.read.parquet(out_dir)
    assert out.count() == 25
    assert "embedding" in out.columns
    # streamed embeddings equal the batch backfill (same UDF, same math)
    batch = embed_documents(sample, dim=16)
    got = {r["doc_id"]: list(r["embedding"]) for r in out.collect()}
    want = {r["doc_id"]: list(r["embedding"]) for r in batch.collect()}
    assert got == want


def test_streaming_ingest_is_incremental(spark, docs, tmp_path):
    """A second file landing in the directory is picked up without
    reprocessing the first (exactly-once via checkpoint)."""
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    d1 = docs.filter(F.col("doc_id") < 10).select("doc_id", "text", "lang", "source", "n_chars")
    d2 = docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    d1.write.mode("append").parquet(in_dir)
    q = start_ingest(spark, in_dir, out_dir, ckpt, dim=16)
    try:
        _wait(q)
        assert spark.read.parquet(out_dir).count() == 10
        d2.write.mode("append").parquet(in_dir)
        _wait(q)
        out = spark.read.parquet(out_dir)
        assert out.count() == 20
        assert out.select("doc_id").distinct().count() == 20  # no duplicates
    finally:
        q.stop()


def test_windowed_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    """The streaming rollup over the events table (replayed as files)
    must agree with the batch twin — the Structured Streaming
    correctness contract."""
    events = load_table(spark, sf_dir, "events")
    in_dir = str(tmp_path / "events_in")
    events.write.mode("overwrite").parquet(in_dir)

    stream = spark.readStream.schema(SE.EVENTS_SCHEMA).parquet(in_dir)
    agg = SE.windowed_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hourly_stream")
        .start()
    )
    try:
        _wait(q)
        got = {
            (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
            for r in spark.sql("SELECT * FROM hourly_stream").collect()
        }
    finally:
        q.stop()

    want = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
        for r in events_hourly(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for key, (n, _) in want.items():
        assert got[key][0] == n
        assert got[key][1] == pytest.approx(want[key][1], rel=1e-9)


def _final_sessions(spark, table: str) -> dict:
    """Latest update per user from an update-mode memory sink (n_events
    grows monotonically, so max(n_events) is the final state)."""
    rows = spark.sql(
        f"SELECT user_id, n_events, n_sessions FROM {table}"
    ).collect()
    final: dict = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["n_sessions"])
    return final


def test_stateful_sessionize_stream_equals_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionization over the replayed events
    table converges to the batch window twin (events_sessionize)."""
    events = load_table(spark, sf_dir, "events")
    in_dir = str(tmp_path / "sess_in")
    events.write.mode("overwrite").parquet(in_dir)

    stream = spark.readStream.schema(SE.EVENTS_SCHEMA).parquet(in_dir)
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sessions_stream")
        .start()
    )
    try:
        _wait(q)
        got = _final_sessions(spark, "sessions_stream")
    finally:
        q.stop()

    want = {
        r["user_id"]: (r["n_events"], r["n_sessions"])
        for r in events_sessionize(spark, sf_dir).collect()
    }
    assert got == want


def test_stateful_sessionize_state_survives_batches(spark, sf_dir, tmp_path):
    """State carries across micro-batches: replaying the first and
    second halves of the timeline as separate files gives the same
    final answer as the batch twin (gap logic spans the file split)."""
    events = load_table(spark, sf_dir, "events").persist()
    in_dir = str(tmp_path / "sess_inc")
    first = events.filter(F.col("ts") < F.lit("2024-01-15").cast("timestamp"))
    second = events.filter(F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
    first.write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(SE.EVENTS_SCHEMA).parquet(in_dir)
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sessions_inc")
        .start()
    )
    try:
        _wait(q)
        second.write.mode("append").parquet(in_dir)
        _wait(q)
        got = _final_sessions(spark, "sessions_inc")
    finally:
        q.stop()
        events.unpersist()

    want = {
        r["user_id"]: (r["n_events"], r["n_sessions"])
        for r in events_sessionize(spark, sf_dir).collect()
    }
    assert got == want


def test_indexed_ingest_makes_streamed_docs_searchable(spark, docs, tmp_path):
    """Streaming index freshness: a document streamed AFTER the index
    build must be found by an IVF probe without any rebuild."""
    from secure_agent_api_vector_search_spark.embedder import embed_text
    from secure_agent_api_vector_search_spark.operators.ivf import (
        build_ivf,
        ivf_search,
        read_ivf,
        write_ivf,
    )
    from secure_agent_api_vector_search_spark.streaming.ingest import start_indexed_ingest

    in_dir, idx, ckpt = (str(tmp_path / d) for d in ("in", "idx", "ckpt"))
    cols = ("doc_id", "text", "lang", "source", "n_chars")

    initial = embed_documents(docs.filter(F.col("doc_id") < 200).select(*cols), dim=16)
    index = build_ivf(initial, n_lists=4, id_col="doc_id")
    write_ivf(index, idx)

    new_docs = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 220)).select(*cols)
    new_docs.write.mode("append").parquet(in_dir)
    q = start_indexed_ingest(spark, in_dir, idx, ckpt, dim=16)
    try:
        _wait(q)
    finally:
        q.stop()

    fresh = read_ivf(spark, idx, id_col="doc_id")
    assert fresh.assigned.count() == 220
    # centroids were NOT retrained — assign-only freshness
    assert fresh.centroids == index.centroids

    target = docs.filter(F.col("doc_id") == 205).select("text").head()[0]
    top = ivf_search(fresh, embed_text(target, 16), k=1, nprobe=2).collect()
    assert top[0]["doc_id"] == 205
    assert top[0]["similarity"] == pytest.approx(1.0, abs=1e-9)


def test_dedup_ingest_drops_redelivered_docs(spark, docs, tmp_path):
    """At-least-once sources replay documents; the dedup ingest must
    emit each doc_id exactly once across micro-batches."""
    from secure_agent_api_vector_search_spark.streaming.ingest import start_dedup_ingest

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    cols = ("doc_id", "text", "lang", "source", "n_chars")
    first = docs.filter(F.col("doc_id") < 15).select(*cols)
    # overlapping redelivery: 10-14 appear again alongside 15-24
    second = docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 25)).select(*cols)

    first.write.mode("append").parquet(in_dir)
    q = start_dedup_ingest(spark, in_dir, out_dir, ckpt, dim=16)
    try:
        _wait(q)
        second.write.mode("append").parquet(in_dir)
        _wait(q)
    finally:
        q.stop()

    out = spark.read.parquet(out_dir)
    ids = [r["doc_id"] for r in out.select("doc_id").collect()]
    assert sorted(ids) == list(range(25))      # each doc exactly once
    assert len(ids) == len(set(ids))


def test_rebuild_after_indexed_ingest_retrains_and_serves(spark, docs, tmp_path):
    """Index lifecycle: build → stream-append (frozen centroids) →
    rebuild (compaction). The rebuild re-trains over the merged corpus
    and the probe still finds both old and streamed documents."""
    from secure_agent_api_vector_search_spark.embedder import embed_text
    from secure_agent_api_vector_search_spark.operators.ivf import (
        build_ivf,
        ivf_search,
        rebuild_ivf,
        write_ivf,
    )
    from secure_agent_api_vector_search_spark.streaming.ingest import start_indexed_ingest

    in_dir, idx, ckpt = (str(tmp_path / d) for d in ("in", "idx", "ckpt"))
    cols = ("doc_id", "text", "lang", "source", "n_chars")

    initial = embed_documents(docs.filter(F.col("doc_id") < 100).select(*cols), dim=16)
    write_ivf(build_ivf(initial, n_lists=4, id_col="doc_id"), idx)

    docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 130)).select(*cols) \
        .write.mode("append").parquet(in_dir)
    q = start_indexed_ingest(spark, in_dir, idx, ckpt, dim=16)
    try:
        _wait(q)
    finally:
        q.stop()

    rebuilt = rebuild_ivf(spark, idx, n_lists=4, id_col="doc_id")
    assert rebuilt.assigned.count() == 130
    for probe_id in (50, 120):  # one pre-build doc, one streamed doc
        target = docs.filter(F.col("doc_id") == probe_id).select("text").head()[0]
        top = ivf_search(rebuilt, embed_text(target, 16), k=1, nprobe=2).collect()
        assert top[0]["doc_id"] == probe_id


def test_curated_ingest_routes_quality_gate(spark, docs, tmp_path):
    """The streaming curation gate: junk docs land in quarantine
    un-embedded, survivors are embedded; nothing is silently dropped."""
    from secure_agent_api_vector_search_spark.streaming.ingest import start_curated_ingest

    in_dir, out_dir, rej_dir, ckpt = (
        str(tmp_path / d) for d in ("in", "out", "rej", "ckpt"))
    good = docs.limit(20).select("doc_id", "text", "lang", "source", "n_chars")
    junk = spark.createDataFrame(
        [(900001, "spam spam spam spam spam spam spam spam spam spam spam",
          "en", "junk", 55),
         (900002, "too short", "en", "junk", 9),
         (900003, None, "en", "junk", 0)],  # null text: unscoreable -> quarantine
        "doc_id long, text string, lang string, source string, n_chars long")
    good.unionAll(junk).write.mode("overwrite").parquet(in_dir)

    q = start_curated_ingest(spark, in_dir, out_dir, rej_dir, ckpt, dim=16)
    try:
        _wait(q)
    finally:
        q.stop()

    out = spark.read.parquet(out_dir)
    rej = spark.read.parquet(rej_dir)
    assert out.count() == 20 and "embedding" in out.columns
    assert {r["doc_id"] for r in rej.collect()} == {900001, 900002, 900003}
    assert "embedding" not in rej.columns  # rejects never reach the embedder
    # both sinks carry the epoch partition key that makes replays idempotent
    assert "_epoch_id" in out.columns and "_epoch_id" in rej.columns


def test_merge_upsert_ingest_updates_in_place(spark, docs, tmp_path):
    """Streaming CDC upsert into the keyed merge layout: updated keys
    are re-embedded and replaced, new keys insert, untouched keys keep
    their original rows; within-batch duplicate keys collapse to one."""
    from secure_agent_api_vector_search_spark.embedder import embed_text
    from secure_agent_api_vector_search_spark.pipelines import write_merge_table
    from secure_agent_api_vector_search_spark.streaming.ingest import (
        embed_documents,
        start_merge_upsert_ingest,
    )

    in_dir, tbl, ckpt = (str(tmp_path / d) for d in ("in", "tbl", "ckpt"))
    base = docs.limit(30).select("doc_id", "text", "lang", "source", "n_chars")
    write_merge_table(embed_documents(base, dim=16), tbl, "doc_id", n_buckets=8)
    before = {
        r["doc_id"]: r for r in spark.read.parquet(tbl).collect()
    }

    updates = spark.createDataFrame(
        [
            (0, "fresh replacement text zero", "en", "cdc", 27),
            (1, "fresh replacement text one", "en", "cdc", 26),
            (1, "zzz duplicate later version", "en", "cdc", 27),  # in-batch dup
            (900500, "brand new streamed document", "en", "cdc", 27),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    updates.write.mode("overwrite").parquet(in_dir)

    q = start_merge_upsert_ingest(spark, in_dir, tbl, ckpt, dim=16, n_buckets=8)
    try:
        _wait(q)
    finally:
        q.stop()

    after = {r["doc_id"]: r for r in spark.read.parquet(tbl).collect()}
    assert len(after) == 31  # 30 originals + 1 insert, no duplicates
    assert after[0]["text"] == "fresh replacement text zero"
    assert after[0]["embedding"] == embed_text("fresh replacement text zero", 16)
    # in-batch duplicate collapsed deterministically (min text wins)
    assert after[1]["text"] == "fresh replacement text one"
    assert after[900500]["source"] == "cdc"
    untouched = [k for k in before if k not in (0, 1)]
    for k in untouched:
        assert after[k]["text"] == before[k]["text"]
        assert after[k]["embedding"] == before[k]["embedding"]


def test_fingerprint_dedup_ingest_drops_recrawls_under_new_ids(spark, docs, tmp_path):
    """Content dedup: the same document re-crawled under a NEW doc_id
    (and with case/punct noise) must be dropped; state persists across
    micro-batches."""
    from secure_agent_api_vector_search_spark.streaming.ingest import (
        start_fingerprint_dedup_ingest,
    )

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    cols = ("doc_id", "text", "lang", "source", "n_chars")
    # first delivery ALSO carries a same-batch re-id'd copy of doc 0:
    # the keeper must be the MIN id (the batch operator's policy), not
    # an arbitrary partition-order pick
    inbatch_dup = docs.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 800000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    first = docs.filter(F.col("doc_id") < 10).select(*cols).unionByName(inbatch_dup)
    # second delivery: 5 genuinely new docs + re-crawls of 0-4 under new
    # ids with case/punctuation noise (normalized-identical content)
    recrawl = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit(" !!!")).alias("text"),
        "lang", "source", "n_chars",
    )
    second = docs.filter(
        (F.col("doc_id") >= 10) & (F.col("doc_id") < 15)
    ).select(*cols).unionByName(recrawl)

    first.write.mode("append").parquet(in_dir)
    q = start_fingerprint_dedup_ingest(spark, in_dir, out_dir, ckpt, dim=16)
    try:
        _wait(q)
        second.write.mode("append").parquet(in_dir)
        _wait(q)
    finally:
        q.stop()

    out = spark.read.parquet(out_dir)
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert ids == list(range(15))              # every re-crawl dropped, min-id kept
    assert "embedding" in out.columns


def test_streamed_drift_triggers_skew_rebuild(spark, docs, tmp_path):
    """The full maintenance loop, end to end: drifted documents streamed
    through start_indexed_ingest pile into few frozen lists; the
    rebuild_if_skewed job detects the skew and re-clusters, restoring
    balance — the literal 'streamed-append lists must trigger it'
    contract."""
    from secure_agent_api_vector_search_spark.operators.ivf import (
        build_ivf,
        list_balance_stats,
        read_ivf,
        rebuild_if_skewed,
        write_ivf,
    )
    from secure_agent_api_vector_search_spark.streaming.ingest import (
        start_indexed_ingest,
    )

    in_dir, idx, ckpt = (str(tmp_path / d) for d in ("in", "idx", "ckpt"))
    cols = ("doc_id", "text", "lang", "source", "n_chars")

    initial = embed_documents(docs.filter(F.col("doc_id") < 100).select(*cols), dim=16)
    write_ivf(build_ivf(initial, n_lists=4, id_col="doc_id"), idx)
    assert not rebuild_if_skewed(spark, idx, threshold=3.0, id_col="doc_id")[1]

    # drifted ingest: 300 near-copies of ONE document embed to nearly
    # the same vector, so the frozen assignment funnels them into a
    # single list
    seed_text = docs.filter(F.col("doc_id") == 7).select("text").head()[0]
    drift = spark.createDataFrame(
        [(10_000 + i, seed_text + f" v{i}", "en", "drift", len(seed_text))
         for i in range(300)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    drift.write.mode("append").parquet(in_dir)
    q = start_indexed_ingest(spark, in_dir, idx, ckpt, dim=16)
    try:
        _wait(q)
    finally:
        q.stop()

    stale = list_balance_stats(read_ivf(spark, idx, id_col="doc_id"))
    assert stale["n_rows"] == 400
    assert stale["skew"] > 3.0                 # the drift is visible

    rebuilt, did = rebuild_if_skewed(spark, idx, threshold=3.0, n_lists=4,
                                     id_col="doc_id")
    assert did
    after = list_balance_stats(rebuilt)
    assert after["n_rows"] == 400
    assert after["skew"] < stale["skew"]


def test_neardup_dedup_ingest_drops_near_copies_across_epochs(spark, docs, tmp_path):
    """Streaming MinHash dedup: a near-copy (tail edited, not just
    normalization noise) delivered in a LATER epoch under a new id must
    be dropped; genuinely new docs pass; within-batch near-dup clusters
    keep the min id."""
    from secure_agent_api_vector_search_spark.streaming.ingest import (
        start_neardup_dedup_ingest,
    )

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    cols = ("doc_id", "text", "lang", "source", "n_chars")
    base = docs.filter(F.col("doc_id") < 10).select(*cols)
    # same-batch near-copy of doc 0: last word swapped -> high Jaccard,
    # different fingerprint; keeper must be min id (0)
    inbatch = docs.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 800000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tailword")).alias("text"),
        "lang", "source", "n_chars",
    )
    first = base.unionByName(inbatch)
    # epoch 2: 5 new docs + near-copies of docs 0-2 under new ids
    recrawl = docs.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" x")).alias("text"),
        "lang", "source", "n_chars",
    )
    second = docs.filter(
        (F.col("doc_id") >= 10) & (F.col("doc_id") < 15)
    ).select(*cols).unionByName(recrawl)

    first.write.mode("append").parquet(in_dir)
    q = start_neardup_dedup_ingest(spark, in_dir, out_dir, ckpt, dim=16)
    try:
        _wait(q)
        second.write.mode("append").parquet(in_dir)
        _wait(q)
    finally:
        q.stop()

    out = spark.read.parquet(out_dir)
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # every synthetic near-copy dropped, min ids kept — and doc 12 is
    # a PLANTED near-dup of doc 8 in the sf0.001 testdata itself
    # (Jaccard 0.985, verified by minhash_near_dup_pairs), so the
    # cross-epoch screen rightly rejects it too
    assert ids == [i for i in range(15) if i != 12]
    assert "embedding" in out.columns


def test_anomaly_stream_flags_planted_spike(spark, tmp_path):
    """Online anomaly detector: steady 5-events/hour 'click' traffic
    with a 50-event spike at hour 12 — the spike hour must be flagged
    against the history seen so far, steady hours must not, and state
    must carry across micro-batches (history split across two file
    deliveries)."""
    import datetime as dt

    in_dir = str(tmp_path / "ev_in")

    def mk(hours):
        base = dt.datetime(2026, 1, 1, 0, 0, 0)
        rows, eid = [], 0
        for h in hours:
            for i in range(50 if h == 12 else 5):
                rows.append(
                    (eid, base + dt.timedelta(hours=h, seconds=i), eid, "click", 1.0, "{}")
                )
                eid += 1
        # coalesce(1): each delivery must land as ONE part file (one
        # atomic rename) — multi-file deliveries can be listed mid-write
        # by the file source, splitting an hour across micro-batches and
        # flaking the spike assertion under suite load
        return spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
        ).coalesce(1)

    # first delivery: hours 0-9; second: hours 10-16 (spike at 12)
    mk(range(0, 10)).write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema(SE.EVENTS_SCHEMA).parquet(in_dir)
    out = SE.anomaly_stream(stream, z_thresh=2.0)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("anom_stream")
        .start()
    )
    try:
        _wait(q)
        mk(range(10, 17)).write.mode("append").parquet(in_dir)
        _wait(q)
        rows = {
            r["hour"]: r for r in spark.sql("SELECT * FROM anom_stream").collect()
        }
    finally:
        q.stop()

    # hours 0..15 completed (16 is still open); every completed row is click
    assert set(rows) == {f"2026-01-01 {h:02d}" for h in range(16)}
    spike = rows["2026-01-01 12"]
    assert spike.n == 50 and spike.is_anomaly and spike.z > 2.0
    # pre-spike hours: flat traffic -> z exactly 0, never flagged
    for h in range(12):
        r = rows[f"2026-01-01 {h:02d}"]
        assert r.n == 5 and r.z == 0.0 and not r.is_anomaly
    # post-spike hours: the spike inflates history mean/variance, so z
    # is small-but-nonzero — still never flagged
    for h in (13, 14, 15):
        r = rows[f"2026-01-01 {h:02d}"]
        assert r.n == 5 and abs(r.z) < 2.0 and not r.is_anomaly


def test_sink_compaction_between_batches_is_replay_safe(spark, docs, tmp_path):
    """compact_partitions between micro-batch runs of an
    epoch-partitioned foreachBatch sink: per-epoch compaction shrinks
    the file count without touching row content or the epoch layout,
    and the stream resumes from its checkpoint and keeps appending —
    the replay-idempotence key survives. Native file-sink outputs
    (_spark_metadata log) must be REFUSED: compaction would corrupt
    the log readers resolve files through."""
    import pytest as _pytest

    from secure_agent_api_vector_search_spark.sources.layout import (
        compact_parquet,
        compact_partitions,
    )
    from secure_agent_api_vector_search_spark.streaming.ingest import (
        start_fingerprint_dedup_ingest,
    )

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    d1 = docs.filter(F.col("doc_id") < 40).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    # many small input files -> several epochs of many small outputs
    d1.repartition(16).write.mode("overwrite").parquet(in_dir)
    q = start_fingerprint_dedup_ingest(spark, in_dir, out_dir, ckpt, dim=16)
    try:
        _wait(q)
    finally:
        q.stop()

    before = spark.read.parquet(out_dir)
    n1 = before.count()
    sum1 = before.agg(F.sum("doc_id")).first()[0]
    stats = compact_partitions(spark, out_dir, target_file_bytes=1 << 20)
    assert stats["partitions"] >= 1 and stats["rewritten"] >= 1
    assert stats["files_after"] < stats["files_before"]
    after = spark.read.parquet(out_dir)
    assert after.count() == n1
    assert after.agg(F.sum("doc_id")).first()[0] == sum1

    # the stream must resume cleanly over the compacted sink
    d2 = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 220)).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    d2.coalesce(1).write.mode("append").parquet(in_dir)
    q2 = start_fingerprint_dedup_ingest(spark, in_dir, out_dir, ckpt, dim=16)
    try:
        _wait(q2)
    finally:
        q2.stop()
    final = spark.read.parquet(out_dir)
    assert final.count() == n1 + d2.count()
    assert final.select("doc_id").distinct().count() == final.count()

    # the native file sink is guarded, not silently corrupted
    fs_out, fs_ckpt = str(tmp_path / "fs_out"), str(tmp_path / "fs_ckpt")
    q3 = start_ingest(spark, in_dir, fs_out, fs_ckpt, dim=16)
    try:
        _wait(q3)
    finally:
        q3.stop()
    with _pytest.raises(ValueError, match="_spark_metadata"):
        compact_parquet(spark, fs_out, target_file_bytes=1 << 20)


def test_image_dedup_ingest_drops_perceptual_copies_across_formats(spark, tmp_path):
    """Streaming perceptual image dedup: a PNG re-encode of an admitted
    netpbm image delivered in a LATER epoch under a new id must be
    dropped (format change does not evade the screen); a within-batch
    GIF copy collapses to the min id; genuinely different images pass.
    The sink stores fingerprints, so the seen side never re-decodes."""
    import numpy as np

    from secure_agent_api_vector_search_spark.operators import multimodal as M
    from secure_agent_api_vector_search_spark.operators.gif import encode_gif
    from secure_agent_api_vector_search_spark.streaming.ingest import (
        start_image_dedup_ingest,
    )

    rng = np.random.default_rng(41)
    imgs = [rng.integers(0, 256, (24, 16, 1), dtype=np.uint8) for _ in range(6)]

    # epoch 1: five originals as netpbm + a GIF copy of img 1 (id 700)
    first = [(i, bytearray(M.encode_netpbm(imgs[i]))) for i in range(5)]
    first.append((700, bytearray(encode_gif(imgs[1]))))
    # epoch 2: one new image + PNG re-encodes of imgs 0 and 2 (new ids)
    second = [(10, bytearray(M.encode_netpbm(imgs[5])))]
    second += [(900 + i, bytearray(M.encode_png(imgs[i]))) for i in (0, 2)]

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    schema = "doc_id long, payload binary"
    spark.createDataFrame(first, schema).coalesce(1).write.mode("append").parquet(in_dir)
    q = start_image_dedup_ingest(spark, in_dir, out_dir, ckpt)
    try:
        _wait(q)
        spark.createDataFrame(second, schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        _wait(q)
    finally:
        q.stop()

    out = spark.read.parquet(out_dir)
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # GIF copy 700 collapsed to min-id 1; PNG re-encodes 900/902
    # dropped against the admitted corpus; new image 10 admitted
    assert ids == [0, 1, 2, 3, 4, 10]
    assert "fp" in out.columns
    # the stored fingerprints equal a fresh fingerprint pass (the seen
    # side reads these instead of re-decoding payloads)
    fresh = {
        r["doc_id"]: r["fp"]
        for r in M.image_ahash(out.select("doc_id", "payload")).collect()
    }
    stored = {r["doc_id"]: r["fp"] for r in out.select("doc_id", "fp").collect()}
    assert stored == fresh
