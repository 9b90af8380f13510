"""Interval-analytics compat entries (plans/timeseries.py) pinned
against plain-Python brute-force references on hand-built hostile
fixtures — the arms the graded events fixture may never reach:
touching closed-open endpoints, nested/duplicate intervals, a user
whose first 'click' is their last event (NULL next_node), and a user
with no 'click' at all (absent row)."""

from __future__ import annotations

import datetime as dt

import pandas as pd


def _write_events(spark, tmp_path, rows):
    """rows: list of (event_id, ts_us, user_id, event_type, value)."""
    d = str(tmp_path / "evt")
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [
                dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=r[1])
                for r in rows
            ],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [r[4] for r in rows],
            "props": ["{}"] * len(rows),
        }
    )
    spark.createDataFrame(pdf).write.parquet(d + "/events.parquet")
    return d


_BASE_US = int(
    (dt.datetime(2024, 1, 1) - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000
)


def _iv(rows):
    """Closed-open [s, e) intervals mirroring the registered model:
    s = unix_micros(ts), e = s + floor(value*100) seconds."""
    out = []
    for eid, ts_us, uid, etype, value in rows:
        s = _BASE_US + ts_us
        out.append((etype, uid, s, s + int(value * 100 + 1e-9) * 1_000_000))
    return out


def test_max_intersections_brute_force(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    sec = 1_000_000
    # type 'a': [0,10s) [5s,15s) [10s,20s) — touching at 10s must NOT
    # triple-count (closed-open): peak is 2, first reached at 5s.
    # type 'b': three exact duplicates [0,1s) — peak 3 at 0.
    rows = [
        (1, 0 * sec, 1, "a", 0.10),
        (2, 5 * sec, 1, "a", 0.10),
        (3, 10 * sec, 2, "a", 0.10),
        (4, 0, 3, "b", 0.01),
        (5, 0, 3, "b", 0.01),
        (6, 0, 4, "b", 0.01),
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r["event_type"]: (r["max_intersections"], r["first_peak_us"])
        for r in REGISTRY.all()["events_max_intersections"].build(spark, d).collect()
    }

    # brute force: evaluate depth at every start point (sufficient for
    # closed-open intervals: depth only increases at starts)
    expected = {}
    by_type: dict[str, list[tuple[int, int]]] = {}
    for etype, _uid, s, e in _iv(rows):
        by_type.setdefault(etype, []).append((s, e))
    for etype, ivs in by_type.items():
        best, best_t = -1, None
        for t in sorted(s for s, _ in ivs):
            depth = sum(1 for s, e in ivs if s <= t < e)
            if depth > best:
                best, best_t = depth, t
        expected[etype] = (best, best_t)

    assert got == expected
    assert got["a"] == (2, _BASE_US + 5 * sec)  # the closed-open pin
    assert got["b"][0] == 3


def test_interval_length_sum_brute_force(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    sec = 1_000_000
    # user 1: overlap [0,10s)+[5s,12s), nested [20s,30s)⊃[22s,25s),
    #         touching [30s,31s) extends the second island (s == prev
    #         max e → merged by the s > prev_max_e rule)
    # user 2: exact duplicates [0,5s) x2 and a disjoint [100s,101s)
    rows = [
        (1, 0 * sec, 1, "a", 0.10),
        (2, 5 * sec, 1, "a", 0.07),
        (3, 20 * sec, 1, "a", 0.10),
        (4, 22 * sec, 1, "a", 0.03),
        (5, 30 * sec, 1, "a", 0.01),
        (6, 0 * sec, 2, "a", 0.05),
        (7, 0 * sec, 2, "a", 0.05),
        (8, 100 * sec, 2, "a", 0.01),
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: (r["covered_us"], r["n_islands"])
        for r in REGISTRY.all()["events_interval_length_sum"]
        .build(spark, d)
        .collect()
    }

    # brute force: microsecond membership is too slow; merge by hand
    def union_len(ivs):
        ivs = sorted(ivs)
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        return sum(e - s for s, e in islands), len(islands)

    by_user: dict[int, list[tuple[int, int]]] = {}
    for _etype, uid, s, e in _iv(rows):
        by_user.setdefault(uid, []).append((s, e))
    expected = {uid: union_len(ivs) for uid, ivs in by_user.items()}

    assert got == expected
    assert got[1] == (23 * sec, 2)  # 12s first island + 11s merged second
    assert got[2] == (6 * sec, 2)


def test_sequence_next_node_null_and_absent_arms(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    sec = 1_000_000
    rows = [
        # user 1: view, click, purchase → next_node 'purchase'
        (1, 0 * sec, 1, "view", 1.0),
        (2, 1 * sec, 1, "click", 1.0),
        (3, 2 * sec, 1, "purchase", 1.0),
        # user 2: click is the LAST event → next_node NULL (kept row)
        (4, 0 * sec, 2, "view", 1.0),
        (5, 1 * sec, 2, "click", 1.0),
        # user 3: no click → absent from output
        (6, 0 * sec, 3, "view", 1.0),
        # user 4: two clicks back-to-back; first match wins → 'click'
        (7, 0 * sec, 4, "click", 1.0),
        (8, 1 * sec, 4, "click", 1.0),
        (9, 2 * sec, 4, "error", 1.0),
        # user 5: tie on ts broken by event_id: click(10) then view(11)
        (10, 0 * sec, 5, "click", 1.0),
        (11, 0 * sec, 5, "view", 1.0),
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: r["next_node"]
        for r in REGISTRY.all()["events_sequence_next_node"].build(spark, d).collect()
    }
    assert got == {1: "purchase", 2: None, 4: "click", 5: "view"}


def test_max_intersections_twophase_equals_single_window(spark, tmp_path):
    """The skew-immune two-phase scan must reproduce the single-window
    sweep exactly on the hostile fixture (touching endpoints, exact
    duplicates) — two algorithms, one answer."""
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    sec = 1_000_000
    rows = [
        (1, 0 * sec, 1, "a", 0.10),
        (2, 5 * sec, 1, "a", 0.10),
        (3, 10 * sec, 2, "a", 0.10),
        (4, 0, 3, "b", 0.01),
        (5, 0, 3, "b", 0.01),
        (6, 0, 4, "b", 0.01),
        # a chunk-boundary prober: long interval spanning many chunks
        (7, 0, 5, "c", 400.00),
        (8, 20_000 * sec, 5, "c", 0.01),
    ]
    d = _write_events(spark, tmp_path, rows)
    single = sorted(
        tuple(r)
        for r in REGISTRY.all()["events_max_intersections"].build(spark, d).collect()
    )
    twophase = sorted(
        tuple(r)
        for r in REGISTRY.all()["events_max_intersections_twophase"]
        .build(spark, d)
        .collect()
    )
    assert single == twophase


def _write_events_us(tmp_path, rows):
    """Like _write_events but written via pyarrow with timestamp[us]
    — the driver testdata layout.  (A Spark-written fixture would
    round-trip INT96 -> pyarrow ns -> a TIMESTAMP(NANOS) part file the
    stream reader cannot map back to TimestampType.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "evt_us")
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [_BASE_US + r[1] for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    import os

    os.makedirs(d, exist_ok=True)
    pq.write_table(t, d + "/events.parquet")
    return d


def test_stream_interval_union_matches_batch_on_hostile_fixture(spark, tmp_path):
    """The streaming merged-island state must equal the batch
    gaps-and-islands result when intervals straddle micro-batches
    (the stream splits the fixture into 4 parts)."""
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    sec = 1_000_000
    rows = [
        (1, 0 * sec, 1, "a", 0.10),
        (2, 5 * sec, 1, "a", 0.07),
        (3, 20 * sec, 1, "a", 0.10),
        (4, 22 * sec, 1, "a", 0.03),
        (5, 30 * sec, 1, "a", 0.01),
        (6, 0 * sec, 2, "a", 0.05),
        (7, 0 * sec, 2, "a", 0.05),
        (8, 100 * sec, 2, "a", 0.01),
    ]
    d = _write_events_us(tmp_path, rows)
    batch = sorted(
        tuple(r)
        for r in REGISTRY.all()["events_interval_length_sum"]
        .build(spark, d)
        .collect()
    )
    stream = sorted(
        tuple(r)
        for r in REGISTRY.all()["stream_interval_union"].build(spark, d).collect()
    )
    assert stream == batch
    assert batch[0][1] == 23 * sec  # merged-touching second island


def test_stream_ema_matches_batch_across_batch_boundary(spark, tmp_path):
    """The streaming 15-tap state must survive micro-batch boundaries:
    20 in-order events for one user split into 4 parts means every
    boundary crosses an active EMA window."""
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    sec = 1_000_000
    rows = [(i, i * sec, 1, "a", i / 100.0) for i in range(1, 21)]
    # a second user interleaved in time, to exercise per-key state
    rows += [(100 + i, i * sec + 500, 2, "a", (3 * i) / 100.0) for i in range(1, 9)]
    d = _write_events_us(tmp_path, rows)
    batch = [
        tuple(r)
        for r in REGISTRY.all()["events_exp_moving_avg"].build(spark, d).collect()
    ]
    stream = [
        tuple(r)
        for r in REGISTRY.all()["stream_exp_moving_avg"].build(spark, d).collect()
    ]
    assert stream == batch
    assert len(batch) == 28
