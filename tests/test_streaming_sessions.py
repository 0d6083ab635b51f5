"""Streaming sessionization (applyInPandasWithState) equivalence: closed
sessions emitted by the stream must equal the batch gap rule's closed
sessions regardless of micro-batch slicing (maxFilesPerTrigger=1 forces
the cross-batch state path), and the open tail must NOT be emitted."""
import os
import shutil
import tempfile

import pandas as pd
import pytest

from text_similarity_node_spark.streaming.sessions import sessionize_stream

GAP_US = 1_800_000_000  # 30 min


def _batch_rule(rows):
    """Reference: closed sessions of the gap rule over the FULL input."""
    out = []
    by_user = {}
    for r in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        u, ts, _eid, v = r
        st = by_user.get(u)
        if st is None:
            by_user[u] = [ts, ts, 1, v]
        elif ts - st[1] > GAP_US:
            out.append((u, st[0], st[1], st[2], st[3]))
            by_user[u] = [ts, ts, 1, v]
        else:
            st[1], st[2], st[3] = ts, st[2] + 1, st[3] + v
    return sorted(out)  # open tails intentionally excluded


def test_stream_matches_batch_rule(spark):
    h = 3_600_000_000
    rows = [
        # user 1: two sessions closed by gaps inside/across batches + tail
        (1, 0, 0, 10), (1, 600_000_000, 1, 5),          # session A (batch 1)
        (1, 3 * h, 2, 7),                                # closes A (batch 1)
        (1, 6 * h, 3, 2), (1, 6 * h + 60_000_000, 4, 1), # closes B (batch 2), tail C
        # user 2: one event per batch, within gap -> single OPEN session
        (2, 0, 5, 4), (2, 1_200_000_000, 6, 4),
        # user 3: batch-2-only user, gap inside the batch
        (3, 0, 7, 9), (3, 4 * h, 8, 9),
    ]
    batch1 = [r for r in rows if r[2] in (0, 1, 2, 5)]
    batch2 = [r for r in rows if r[2] not in (0, 1, 2, 5)]

    src = tempfile.mkdtemp(prefix="tsn_sess_src_")
    out = tempfile.mkdtemp(prefix="tsn_sess_out_")
    cp = tempfile.mkdtemp(prefix="tsn_sess_cp_")
    cols = ["user_id", "ts_us", "event_id", "value_cents"]
    try:
        for i, batch in enumerate([batch1, batch2]):
            pdf = pd.DataFrame(batch, columns=cols).astype("int64")
            spark.createDataFrame(pdf).coalesce(1).write.parquet(
                os.path.join(src, f"b{i}"), mode="overwrite"
            )
        stream = (
            spark.readStream.schema(
                "user_id long, ts_us long, event_id long, value_cents long"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
        )
        q = (
            sessionize_stream(stream, gap_us=GAP_US)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            tuple(int(x) for x in r)
            for r in spark.read.parquet(out)
            .select("user_id", "session_start_us", "session_end_us",
                    "n_events", "value_cents")
            .collect()
        )
        assert got == _batch_rule(rows)
        users_open_only = {2}
        assert not users_open_only & {g[0] for g in got}
    finally:
        for d in (src, out, cp):
            shutil.rmtree(d, ignore_errors=True)


def test_state_survives_query_restart(spark):
    """Resume-from-checkpoint for the CUSTOM state store: a session left
    open by a terminated query is closed correctly by a brand-new query
    started on the same checkpoint after more files arrive — the open
    session's (start, last, n, value) round-trips through the state
    checkpoint, not just the source offsets."""
    h = 3_600_000_000
    batch1 = [(1, 0, 0, 10), (1, 600_000_000, 1, 5)]   # open session
    batch2 = [(1, 3 * h, 2, 7)]                         # gap -> closes it
    src = tempfile.mkdtemp(prefix="tsn_sess_rs_src_")
    out = tempfile.mkdtemp(prefix="tsn_sess_rs_out_")
    cp = tempfile.mkdtemp(prefix="tsn_sess_rs_cp_")
    cols = ["user_id", "ts_us", "event_id", "value_cents"]

    def run_once():
        stream = (
            spark.readStream.schema(
                "user_id long, ts_us long, event_id long, value_cents long"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
        )
        q = (
            sessionize_stream(stream, gap_us=GAP_US)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    try:
        pdf = pd.DataFrame(batch1, columns=cols).astype("int64")
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            os.path.join(src, "b0"), mode="overwrite"
        )
        run_once()  # first query: consumes batch1, terminates, session open
        assert spark.read.parquet(out).count() == 0
        pdf = pd.DataFrame(batch2, columns=cols).astype("int64")
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            os.path.join(src, "b1"), mode="overwrite"
        )
        run_once()  # NEW query, same checkpoint: state restored, gap closes A
        got = [
            tuple(int(x) for x in r)
            for r in spark.read.parquet(out)
            .select("user_id", "session_start_us", "session_end_us",
                    "n_events", "value_cents")
            .collect()
        ]
        assert got == [(1, 0, 600_000_000, 2, 15)]
    finally:
        for d in (src, out, cp):
            shutil.rmtree(d, ignore_errors=True)


def test_idle_timeout_flushes_open_session(spark):
    """With idle_timeout_ms set, a key absent from later batches has its
    OPEN session flushed (emitted + state freed) when the timeout fires on
    a subsequent micro-batch — the bounded-state mode.  User 7 only exists
    in batch 1; user 8 keeps batch 2 non-empty so the operator runs."""
    batch1 = [(7, 0, 0, 3), (7, 1_000_000, 1, 4)]
    batch2 = [(8, 0, 2, 5)]
    src = tempfile.mkdtemp(prefix="tsn_sess_ttl_src_")
    out = tempfile.mkdtemp(prefix="tsn_sess_ttl_out_")
    cp = tempfile.mkdtemp(prefix="tsn_sess_ttl_cp_")
    cols = ["user_id", "ts_us", "event_id", "value_cents"]
    try:
        for i, batch in enumerate([batch1, batch2]):
            pdf = pd.DataFrame(batch, columns=cols).astype("int64")
            spark.createDataFrame(pdf).coalesce(1).write.parquet(
                os.path.join(src, f"b{i}"), mode="overwrite"
            )
        stream = (
            spark.readStream.schema(
                "user_id long, ts_us long, event_id long, value_cents long"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
        )
        q = (
            sessionize_stream(stream, gap_us=GAP_US, idle_timeout_ms=1)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r.user_id: (r.session_start_us, r.session_end_us, r.n_events,
                        r.value_cents)
            for r in spark.read.parquet(out).collect()
        }
        # user 7's open session was flushed by the timeout on batch 2
        assert got[7] == (0, 1_000_000, 2, 7)
        # user 8 arrived in the last data batch; availableNow may run one
        # more timeout-only batch before terminating, so its session is
        # either still open (absent) or flushed with these exact values
        assert got.get(8, (0, 0, 1, 5)) == (0, 0, 1, 5)
    finally:
        for d in (src, out, cp):
            shutil.rmtree(d, ignore_errors=True)
