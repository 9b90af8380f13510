"""Batch-B time-series compat entries (moving sum / dyadic EMA / LTTB)
pinned against plain-Python references on hand-built fixtures covering
the arms the graded fixture may miss: short-history frames, tie
timestamps, empty interior buckets, and the first/last-point rule."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_us, user_id, event_type, value)."""
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


def test_moving_sum_short_frames_and_ties(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    sec = 1_000_000
    # user 1: 1,2,3,4 cents -> moving sums 1,3,6,9; ties on ts at 2s
    # broken by event_id (3 before 4)
    rows = [
        (1, 0 * sec, 1, "a", 0.01),
        (2, 1 * sec, 1, "a", 0.02),
        (3, 2 * sec, 1, "a", 0.03),
        (4, 2 * sec, 1, "a", 0.04),
        # user 2: single row — frame of one
        (5, 0, 2, "a", 0.99),
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: (r["moving_sums_cents"], r["n"])
        for r in REGISTRY.all()["events_moving_sum"].build(spark, d).collect()
    }
    assert got == {1: ("1,3,6,9", 4), 2: ("99", 1)}


def test_exp_moving_avg_dyadic_exact(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    sec = 1_000_000
    # 20 rows for one user: taps saturate at 16; values = cents 1..20
    rows = [(i, i * sec, 1, "a", i / 100.0) for i in range(1, 21)]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r["event_id"]: (r["ema_num"], r["ema_den"])
        for r in REGISTRY.all()["events_exp_moving_avg"].build(spark, d).collect()
    }

    vals = {i: i for i in range(1, 21)}  # cents(i/100) == i
    for rn, eid in enumerate(sorted(vals)):
        num = den = 0
        for j in range(16):
            if rn - j < 0:
                continue
            w = 1 << (15 - j)
            num += vals[sorted(vals)[rn - j]] * w
            den += w
        assert got[eid] == (num, den), eid
    # saturated rows have the full dyadic denominator 2^16 - 1
    assert got[20][1] == (1 << 16) - 1
    # first row: only tap j=0 present
    assert got[1] == (1 << 15, 1 << 15)


def _lttb_reference(pts, n_buckets=24):
    """Plain-Python mirror of the registered quantized-anchor variant.
    pts: list of (t_s, y_cents, event_id)."""
    tmin = min(p[0] for p in pts)
    tmax = max(p[0] for p in pts)
    width = tmax - tmin + 1
    by_bucket: dict[int, list] = {}
    for t, y, eid in pts:
        b = min(n_buckets - 1, math.floor((t - tmin) * float(n_buckets) / width))
        by_bucket.setdefault(b, []).append((t, y, eid))
    buckets = sorted(by_bucket)
    anchors = {}
    for i, b in enumerate(buckets):
        def mean(idx):
            rows = by_bucket[buckets[idx]]
            n = len(rows)
            return (
                math.floor(sum(r[0] for r in rows) / n),
                math.floor(sum(r[1] for r in rows) / n),
            )
        prev_a = mean(i - 1) if i > 0 else None
        next_a = mean(i + 1) if i + 1 < len(buckets) else None
        anchors[b] = (prev_a, next_a)
    last_bucket = buckets[-1]
    out = []
    for b in buckets:
        prev_a, next_a = anchors[b]
        scored = []
        for t, y, eid in by_bucket[b]:
            if prev_a is None or next_a is None:
                area2 = 0
            else:
                (xa, ya), (xc, yc) = prev_a, next_a
                area2 = abs((xa - xc) * (y - ya) - (xa - t) * (yc - ya))
            tkey = -t if b == last_bucket else t
            scored.append((-area2, tkey, eid, t, y))
        scored.sort()
        _, _, eid, t, y = scored[0]
        out.append((b, t, y, eid))
    return out


def test_lttb_quantized_anchor_reference(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    sec = 1_000_000
    # 0..100 minutes; bucket width ~4.2 min.  A deliberate dead zone
    # (minutes 30-45 empty) leaves interior buckets empty; a spike at
    # minute 50 must win its bucket; duplicate (ts,value) rows at
    # minute 70 exercise the event_id tiebreak.
    rows = []
    eid = 0
    for m in list(range(0, 30)) + list(range(45, 101)):
        eid += 1
        rows.append((eid, m * 60 * sec, 1, "a", 1.00 + (m % 7) / 100.0))
    eid += 1
    rows.append((eid, 50 * 60 * sec, 1, "a", 4.99))  # spike
    eid += 1
    rows.append((eid, 70 * 60 * sec, 1, "a", 1.02))  # dup shape
    d = _write_events(spark, tmp_path, rows)

    got = [
        (r["bucket"], r["t_seconds"], r["value_cents"], r["event_id"])
        for r in REGISTRY.all()["events_lttb_downsample"].build(spark, d).collect()
    ]
    pts = [
        (( _BASE_US + ts_us) // 1_000_000, int(v * 100 + 1e-9), e)
        for e, ts_us, _u, _t, v in rows
    ]
    exp = _lttb_reference(pts)
    assert got == exp
    # the spike survives downsampling
    assert any(y == 499 for _b, _t, y, _e in got)
    # first/last points kept
    ts_sorted = sorted(p[0] for p in pts)
    assert got[0][1] == ts_sorted[0] and got[-1][1] == ts_sorted[-1]
