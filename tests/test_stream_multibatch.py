"""Multi-micro-batch stateful streaming: with events split over several
files (one file per trigger), update-mode emits intermediate states —
the conformance entry must still reduce to exactly the batch oracle."""

from __future__ import annotations

import os

import duckdb
import pyarrow.parquet as pq

from conftest import SF_SMALL


def test_stateful_sessions_across_micro_batches(spark, tmp_path):
    # synthetic sf_dir whose events.parquet is a DIRECTORY of 3 parts:
    # the file stream source then runs 3 micro-batches
    sf = str(tmp_path / "sf")
    ev_dir = os.path.join(sf, "events.parquet")
    os.makedirs(ev_dir)
    t = pq.read_table(f"{SF_SMALL}/events.parquet")
    n = t.num_rows
    per = (n + 2) // 3
    for i in range(3):
        piece = t.slice(i * per, per)
        if piece.num_rows:
            path = os.path.join(ev_dir, f"part-{i}.parquet")
            pq.write_table(piece, path)
            # the file stream source orders files by MODIFICATION TIME;
            # three writes inside one mtime-granularity window tie, and
            # the tie-break order is unspecified — an out-of-order part
            # feeds earlier timestamps after later ones and the gap
            # tracker over-counts sessions (the rare in-suite flake).
            # Pin strictly ascending mtimes to make batch order = row
            # order deterministically.
            ts = 1_700_000_000 + i
            os.utime(path, (ts, ts))

    from duckdb_extension_clickhouse_native_spark.plans.streaming_queries import (
        _stream_stateful_sessions,
    )

    got = {
        r["user_id"]: (r["session_no"], r["n_events"])
        for r in _stream_stateful_sessions(spark, sf).collect()
    }

    con = duckdb.connect()
    expect_rows = con.execute(
        f"""
        WITH e AS (
          SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) / 1000000.0 AS t
          FROM '{ev_dir}/*.parquet'
        ),
        marked AS (
          SELECT user_id, t,
                 CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800
                      THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
        ),
        sessions AS (
          SELECT user_id, t,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                                  ROWS UNBOUNDED PRECEDING) AS sess
          FROM marked
        )
        SELECT user_id, MAX(sess) AS session_no,
               COUNT(*) FILTER (WHERE sess = (SELECT MAX(s2.sess) FROM sessions s2
                                              WHERE s2.user_id = sessions.user_id)) AS n_events
        FROM sessions GROUP BY user_id
        """
    ).fetchall()
    expect = {u: (s, ne) for u, s, ne in expect_rows}
    assert got == expect


def test_stream_minhash_pairs_span_micro_batches(spark):
    """The streaming LSH detector must exercise REAL cross-batch state:
    the documents stream is split into 4 part files (one per trigger),
    and at least one verified near-dup pair must span two different
    parts — i.e. the second member arrived batches after the first was
    indexed into bucket state. Also pins the split fixture layout."""
    import os

    import pyarrow.parquet as pq

    import __spark_entry__  # noqa: F401 - populates REGISTRY
    from conftest import SF_SMALL
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY
    from duckdb_extension_clickhouse_native_spark.streaming.events_stream import (
        read_documents_stream,
    )

    # building the reader materializes the split fixture
    read_documents_stream(spark, SF_SMALL)
    # locate the fixture via the same stamping logic
    import hashlib
    import tempfile

    target = os.path.abspath(f"{SF_SMALL}/documents.parquet")
    tag = hashlib.md5(target.encode()).hexdigest()[:12]
    parent = os.path.join(tempfile.gettempdir(), "chsql_stream_src_docs", tag)
    stamps = [s for s in os.listdir(parent) if not s.endswith(".tmp")]
    assert len(stamps) == 1, f"stale stamps not pruned: {stamps}"
    parts = sorted(os.listdir(os.path.join(parent, stamps[0])))
    assert len(parts) >= 2, "split fixture must force multiple micro-batches"
    # doc_id -> part index
    part_of = {}
    for i, p in enumerate(parts):
        for d in pq.read_table(os.path.join(parent, stamps[0], p))["doc_id"].to_pylist():
            part_of[d] = i
    q = REGISTRY.all()["stream_minhash_candidates"]
    pairs = [(r.doc_a, r.doc_b) for r in q.build(spark, SF_SMALL).collect()]
    assert pairs, "no near-dup pairs found"
    cross = [p for p in pairs if part_of[p[0]] != part_of[p[1]]]
    assert cross, "no pair spans micro-batches — state never crossed a trigger"


def test_row_band_exprs_match_batch_sigs(spark):
    """The streaming per-row HOF band keys claim bit-parity with the
    batch exploded-aggregation signatures 'by construction' — pin it
    directly: run both forms over the same documents and compare every
    (doc_id, band_idx, band_key) row."""
    from pyspark.sql import functions as F

    from conftest import SF_SMALL
    from duckdb_extension_clickhouse_native_spark.operators.dedup import (
        minhash_row_band_exprs,
    )
    from duckdb_extension_clickhouse_native_spark.plans.base import load_tables

    load_tables(spark, SF_SMALL, ["documents"])
    s1, s2, s3 = minhash_row_band_exprs()
    per_row = (
        spark.table("documents")
        .selectExpr(*s1)
        .selectExpr(*s2)
        .selectExpr(*s3)
        .select(
            "doc_id",
            F.posexplode(F.array("band0", "band1", "band2", "band3")).alias(
                "band_idx", "band_key"
            ),
        )
    )
    # the batch form: sigs via exploded shingle aggregation, exactly as
    # minhash_lsh_sql builds them (reuse its CTE chain up to band_rows)
    from duckdb_extension_clickhouse_native_spark.operators.dedup import (
        minhash_lsh_sql,
    )

    full = minhash_lsh_sql("spark")
    # cut the CTE chain just before the verification tail and select
    # the band rows the batch candidate join consumes
    idx = full.index("candidates AS (")
    prefix = full[:idx].rstrip().rstrip(",")
    batch_sql = prefix + "\n    SELECT doc_id, band_idx, band_key FROM band_rows"
    batch = spark.sql(batch_sql)
    a = {tuple(r) for r in per_row.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert a == b, f"band-key mismatch: {len(a ^ b)} differing rows"


def test_stream_limit_by_straddles_micro_batches(spark, tmp_path):
    """A user's 3rd admitted row lands in a LATER micro-batch than the
    first two: the admitted-count state must carry across batches and
    stop at exactly 3."""
    import pandas as pd

    sf = str(tmp_path / "sf")
    ev_dir = os.path.join(sf, "events.parquet")
    os.makedirs(ev_dir)
    base = pd.Timestamp("2024-01-01")
    # user 1: 5 events (2 in batch 0, 3 in batch 1 -> only 1 admitted
    # from batch 1); user 2: 2 events split 1/1 (both admitted)
    batches = [
        pd.DataFrame(
            {
                "event_id": [1, 2, 10],
                "ts": [base, base + pd.Timedelta(seconds=1), base],
                "user_id": [1, 1, 2],
                "event_type": ["a", "b", "x"],
                "value": [0.0] * 3,
                "props": ["{}"] * 3,
            }
        ),
        pd.DataFrame(
            {
                "event_id": [3, 4, 5, 11],
                "ts": [base + pd.Timedelta(seconds=s) for s in (2, 3, 4)]
                + [base + pd.Timedelta(seconds=1)],
                "user_id": [1, 1, 1, 2],
                "event_type": ["c", "d", "e", "y"],
                "value": [0.0] * 4,
                "props": ["{}"] * 4,
            }
        ),
    ]
    for i, pdf in enumerate(batches):
        path = os.path.join(ev_dir, f"part-{i}.parquet")
        spark.createDataFrame(pdf).toPandas().to_parquet(path)
        ts = 1_700_000_000 + i
        os.utime(path, (ts, ts))

    from duckdb_extension_clickhouse_native_spark.plans.streaming_queries import (
        _stream_limit_by,
    )

    rows = [
        (r["user_id"], r["event_id"])
        for r in _stream_limit_by(spark, sf).collect()
    ]
    assert rows == [(1, 1), (1, 2), (1, 3), (2, 10), (2, 11)]


def test_stream_sequence_match_pairs_straddle_batches(spark, tmp_path):
    """click in batch 0 pairs with a purchase in batch 1 (state carries
    the click); a click outside the 10-min horizon never pairs."""
    import pandas as pd

    sf = str(tmp_path / "sf2")
    ev_dir = os.path.join(sf, "events.parquet")
    os.makedirs(ev_dir)
    base = pd.Timestamp("2024-01-01")
    batches = [
        pd.DataFrame(
            {
                "event_id": [1, 2],
                "ts": [base, base + pd.Timedelta(minutes=30)],
                "user_id": [1, 2],
                "event_type": ["click", "click"],
                "value": [0.0] * 2,
                "props": ["{}"] * 2,
            }
        ),
        pd.DataFrame(
            {
                # user 1: purchase 11 min after its click -> NO pair;
                # user 2: purchase 5 min after its click -> pair
                "event_id": [3, 4],
                "ts": [
                    base + pd.Timedelta(minutes=11),
                    base + pd.Timedelta(minutes=35),
                ],
                "user_id": [1, 2],
                "event_type": ["purchase", "purchase"],
                "value": [0.0] * 2,
                "props": ["{}"] * 2,
            }
        ),
    ]
    for i, pdf in enumerate(batches):
        path = os.path.join(ev_dir, f"part-{i}.parquet")
        pdf.to_parquet(path)
        ts = 1_700_000_000 + i
        os.utime(path, (ts, ts))

    from duckdb_extension_clickhouse_native_spark.plans.streaming_queries import (
        _stream_sequence_match_timed,
    )

    row = _stream_sequence_match_timed(spark, sf).collect()[0]
    assert (row["users_matched"], row["pairs"]) == (1, 1)
    assert row["min_gap_us"] == 5 * 60 * 1_000_000


def test_group_bitmap_membership_straddles_micro_batches(spark, tmp_path):
    """A user whose qualifying event types arrive in DIFFERENT
    micro-batches must still count toward and_card: the (user, type)
    state accumulates across triggers."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa

    sf = str(tmp_path / "sf")
    ev_dir = os.path.join(sf, "events.parquet")
    os.makedirs(ev_dir)
    base = dt.datetime(2024, 1, 1)
    batches = [
        # batch 0: u1 view, u2 view
        [(1, base, 1, "view", 0.0, "{}"), (2, base, 2, "view", 0.0, "{}")],
        # batch 1: u1 click, u2 error (doesn't qualify)
        [(3, base, 1, "click", 0.0, "{}"), (4, base, 2, "error", 0.0, "{}")],
        # batch 2: u1 purchase -> u1 completes the AND set across 3 batches
        [(5, base, 1, "purchase", 0.0, "{}")],
    ]
    for i, rows in enumerate(batches):
        df = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        path = os.path.join(ev_dir, f"part-{i}.parquet")
        pq.write_table(pa.Table.from_pandas(df), path)
        ts = 1_700_000_000 + i
        os.utime(path, (ts, ts))

    from duckdb_extension_clickhouse_native_spark.plans.streaming_queries import (
        _stream_group_bitmap,
    )

    [r] = _stream_group_bitmap(spark, sf).collect()
    # u1: all three (assembled across 3 micro-batches); u2: view only
    assert (r["and_card"], r["or_card"], r["exactly_one_card"]) == (1, 2, 1)


def test_projection_mv_states_straddle_micro_batches(spark, tmp_path):
    """stream_projection_mv with events split over 3 files = 3
    micro-batches: per-batch partial states land as separate batch
    dirs and the read-time merge still equals the batch GROUP BY —
    the AggregatingMergeTree MV contract."""
    import glob

    sf = str(tmp_path / "sf")
    ev_dir = os.path.join(sf, "events.parquet")
    os.makedirs(ev_dir)
    t = pq.read_table(f"{SF_SMALL}/events.parquet")
    n = t.num_rows
    per = (n + 2) // 3
    for i in range(3):
        piece = t.slice(i * per, per)
        if piece.num_rows:
            path = os.path.join(ev_dir, f"part-{i}.parquet")
            pq.write_table(piece, path)
            ts = 1_700_000_000 + i
            os.utime(path, (ts, ts))

    from duckdb_extension_clickhouse_native_spark.plans.streaming_queries import (
        _stream_projection_mv,
    )

    got = {
        r.event_type: (r.n, round(r.total_value, 4), r.max_user)
        for r in _stream_projection_mv(spark, sf).collect()
    }
    exp = {
        r[0]: (r[1], round(r[2], 4), r[3])
        for r in duckdb.sql(
            f"""
            SELECT event_type, COUNT(*),
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE),
                   MAX(user_id)
            FROM '{ev_dir}/*.parquet' GROUP BY event_type
            """
        ).fetchall()
    }
    assert got == exp
    # the MV really accumulated one batch dir per micro-batch
    import tempfile, hashlib  # noqa: E401

    src = os.path.abspath(f"{sf}/events.parquet")
    st = os.stat(src)
    work = os.path.join(
        tempfile.gettempdir(),
        "chsql_native_fixtures",
        hashlib.md5(src.encode()).hexdigest()[:10],
        f"stream-mv-{int(st.st_mtime)}-{st.st_size}",
    )
    batches = glob.glob(os.path.join(work, "out", "batch-*"))
    assert len(batches) == 3


def test_cumulative_uniques_state_straddles_micro_batches(spark, tmp_path):
    """a user first seen in micro-batch 1 who reappears in batch 3
    must NOT count as new again — the MIN(first_day) state carries
    across batches."""
    sf = str(tmp_path / "sf")
    ev_dir = os.path.join(sf, "events.parquet")
    os.makedirs(ev_dir)
    t = pq.read_table(f"{SF_SMALL}/events.parquet")
    n = t.num_rows
    per = (n + 2) // 3
    for i in range(3):
        piece = t.slice(i * per, per)
        if piece.num_rows:
            path = os.path.join(ev_dir, f"part-{i}.parquet")
            pq.write_table(piece, path)
            ts = 1_700_000_000 + i
            os.utime(path, (ts, ts))

    from duckdb_extension_clickhouse_native_spark.plans.streaming_queries import (
        _stream_cumulative_uniques,
    )

    got = [
        (r.day.isoformat(), r.new_users, r.cum_users)
        for r in _stream_cumulative_uniques(spark, sf).collect()
    ]
    exp = [
        (d.isoformat(), n_new, cum)
        for d, n_new, cum in duckdb.sql(
            f"""
            WITH d AS (SELECT CAST(ts AS DATE) AS day, user_id
                       FROM '{ev_dir}/*.parquet'),
            days AS (SELECT DISTINCT day FROM d)
            SELECT day,
                   (SELECT COUNT(DISTINCT user_id) FROM d WHERE d.day <= days.day)
                 - (SELECT COUNT(DISTINCT user_id) FROM d WHERE d.day < days.day),
                   (SELECT COUNT(DISTINCT user_id) FROM d WHERE d.day <= days.day)
            FROM days ORDER BY day
            """
        ).fetchall()
    ]
    assert got == exp
    # the curve is strictly more informative than per-batch counts:
    # cumulative must be monotone and end at the distinct-user total
    total = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{ev_dir}/*.parquet'"
    ).fetchone()[0]
    assert got[-1][2] == total
    assert all(a[2] <= b[2] for a, b in zip(got, got[1:]))
