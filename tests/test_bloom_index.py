"""Bloom-filter skip index (native/bloomindex.py + writer option
``index_bloom`` + reader-side pruning): the ClickHouse ``bloom_filter``
data-skipping analogue. Min/max stats cannot prune a point lookup that
lands inside a part's value range; the bloom proves definite absence
for `=` / `IN` on int and string columns."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from duckdb_extension_clickhouse_native_spark.native.bloomindex import (
    MAX_DISTINCT,
    bloom_maybe_contains,
    build_bloom,
    value_bytes,
)
from duckdb_extension_clickhouse_native_spark.native.writer import (
    stats_sidecar_path,
    write_native_file,
)


# ---- pure unit level -------------------------------------------------------


def test_bloom_no_false_negatives_and_low_fp():
    vals = [f"user-{i * 7}" for i in range(5000)]
    bl = build_bloom(value_bytes(v) for v in vals)
    assert all(bloom_maybe_contains(bl, v) for v in vals)  # never miss
    probes = [f"user-{i * 7 + 3}" for i in range(5000)]  # none present
    fp = sum(bloom_maybe_contains(bl, p) for p in probes)
    assert fp / len(probes) < 0.03  # ~1% design point, 3% ceiling


def test_bloom_type_tagging_and_unsupported():
    bl = build_bloom([value_bytes(42), value_bytes("42")])
    assert bloom_maybe_contains(bl, 42) and bloom_maybe_contains(bl, "42")
    # int 7 and string '7' don't alias each other
    bl2 = build_bloom([value_bytes(7)])
    assert not bloom_maybe_contains(bl2, "7")
    # unsupported types never prune
    assert bloom_maybe_contains(bl2, 3.14) and bloom_maybe_contains(bl2, True)
    assert value_bytes(True) is None and value_bytes(2.5) is None
    # over-cap and empty inputs build nothing
    assert build_bloom([]) is None
    assert build_bloom(value_bytes(i) for i in range(MAX_DISTINCT + 1)) is None


def test_bloom_malformed_entry_never_prunes():
    assert bloom_maybe_contains({}, "x")
    assert bloom_maybe_contains({"m": -1, "k": 7, "b64": ""}, "x")
    assert bloom_maybe_contains({"m": 64, "k": 2, "b64": "AA=="}, 5) in (
        False,
        True,
    )  # short bitset -> conservative True
    assert bloom_maybe_contains({"m": 64, "k": 2, "b64": "AA=="}, 5) is True


# ---- writer sidecar --------------------------------------------------------


def _write_part(d, name, uids, index_bloom=("uid",)):
    t = pa.table(
        {
            "uid": pa.array(uids),
            "v": pa.array(range(len(uids)), type=pa.int64()),
        }
    )
    p = os.path.join(d, name)
    write_native_file(p, t, index_bloom=list(index_bloom))
    return p


def test_writer_emits_bloom_sidecar(tmp_path):
    d = str(tmp_path)
    p = _write_part(d, "p0.clickhouse", ["a", "zzz", "m"])
    side = json.load(open(stats_sidecar_path(p)))
    assert "bloom" in side and "uid" in side["bloom"]
    bl = side["bloom"]["uid"]
    assert bloom_maybe_contains(bl, "zzz")
    assert not bloom_maybe_contains(bl, "q")  # inside min/max, absent
    # min/max CANNOT prune 'q' ('a' <= 'q' <= 'zzz') — that's the point
    assert side["columns"]["uid"]["min"] == "a"
    assert side["columns"]["uid"]["max"] == "zzz"


def test_writer_drops_bloom_on_unsupported_type(tmp_path):
    d = str(tmp_path)
    t = pa.table({"f": pa.array([1.5, 2.5])})
    p = os.path.join(d, "p0.clickhouse")
    write_native_file(p, t, index_bloom=["f"])
    side = json.load(open(stats_sidecar_path(p)))
    assert "bloom" not in side  # float equality pruning refused


# ---- end-to-end scan pruning ----------------------------------------------


def _scattered_dir(spark, d, n_parts=8, per=200):
    """uid values hash-scattered across parts: every part's min/max
    spans nearly the whole key space, so ONLY the bloom can prune a
    point probe."""
    import hashlib

    os.makedirs(d, exist_ok=True)
    buckets = {i: [] for i in range(n_parts)}
    for i in range(n_parts * per):
        uid = f"u{i}"
        h = int(hashlib.md5(uid.encode()).hexdigest(), 16) % n_parts
        buckets[h].append(uid)
    for b, uids in buckets.items():
        _write_part(d, f"part-{b:03d}.clickhouse", uids)
    return buckets


def _planned_partitions(spark, df) -> int:
    df.count()  # force execution
    # the DataSource plans one partition per kept file; assert via the
    # reader's own pruning by re-deriving kept paths
    return df.rdd.getNumPartitions()


def test_scan_prunes_on_bloom_absent_value(spark, tmp_path):
    d = str(tmp_path / "tbl")
    buckets = _scattered_dir(spark, d)
    probe = "u42"
    import hashlib

    home = int(hashlib.md5(probe.encode()).hexdigest(), 16) % 8

    df = (
        spark.read.format("clickhouse_native")
        .load(d)
        .filter(f"uid = '{probe}'")
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0].uid == probe
    # the planner kept ONLY the probe's home part (7 of 8 bloom-pruned;
    # min/max alone cannot prune: every part spans u0..u9xx)
    assert _planned_partitions(spark, df) == 1
    # a value absent everywhere plans the conservative 1-file floor
    df2 = (
        spark.read.format("clickhouse_native")
        .load(d)
        .filter("uid = 'not-there'")
    )
    assert df2.count() == 0
    assert _planned_partitions(spark, df2) == 1  # paths[:1] floor


def test_scan_prunes_on_in_list(spark, tmp_path):
    d = str(tmp_path / "tbl")
    _scattered_dir(spark, d)
    df = (
        spark.read.format("clickhouse_native")
        .load(d)
        .filter("uid IN ('u42', 'u43')")
    )
    assert sorted(r.uid for r in df.collect()) == ["u42", "u43"]
    assert _planned_partitions(spark, df) <= 2


def test_ngrambf_unit_contract():
    from duckdb_extension_clickhouse_native_spark.native.bloomindex import (
        ngrambf_may_match_substring,
        string_ngrams,
    )

    corpus = ["the quick brown fox", "jumps over", "lazy dog"]
    grams = set()
    for v in corpus:
        grams |= string_ngrams(v)
    bl = build_bloom(grams)
    # every true substring's grams are present
    assert ngrambf_may_match_substring(bl, "quick bro")
    assert ngrambf_may_match_substring(bl, "dog")
    # a needle with a gram nowhere in the corpus is provably absent
    assert not ngrambf_may_match_substring(bl, "zebra")
    # short needles never prune (no gram to probe)
    assert ngrambf_may_match_substring(bl, "zq")
    assert ngrambf_may_match_substring(bl, "")


def test_scan_prunes_on_substring_predicate(spark, tmp_path):
    d = str(tmp_path / "tbl")
    os.makedirs(d)
    t0 = pa.table({"s": pa.array(["alpha beta", "gamma delta"])})
    t1 = pa.table({"s": pa.array(["omega psi", "sigma tau"])})
    write_native_file(
        os.path.join(d, "p0.clickhouse"), t0, index_ngrambf=["s"]
    )
    write_native_file(
        os.path.join(d, "p1.clickhouse"), t1, index_ngrambf=["s"]
    )
    df = (
        spark.read.format("clickhouse_native")
        .load(d)
        .filter("s LIKE '%omega%'")
    )
    assert [r.s for r in df.collect()] == ["omega psi"]
    assert _planned_partitions(spark, df) == 1  # p0 ngram-pruned
    # startswith/endswith prune through the same gram proof
    df2 = (
        spark.read.format("clickhouse_native")
        .load(d)
        .filter("s LIKE 'gamma%'")
    )
    assert [r.s for r in df2.collect()] == ["gamma delta"]
    assert _planned_partitions(spark, df2) == 1
    # a 2-char needle cannot prune; result still correct
    df3 = (
        spark.read.format("clickhouse_native").load(d).filter("s LIKE '%ps%'")
    )
    assert [r.s for r in df3.collect()] == ["omega psi"]
    assert _planned_partitions(spark, df3) == 2


def test_ngrambf_sidecar_dropped_for_non_string(tmp_path):
    t = pa.table({"n": pa.array([1, 2], type=pa.int64())})
    p = os.path.join(str(tmp_path), "p0.clickhouse")
    write_native_file(p, t, index_ngrambf=["n"])
    side = json.load(open(stats_sidecar_path(p)))
    assert "ngrambf" not in side


def test_mutation_part_reuse_uses_bloom(spark, tmp_path):
    """_part_untouched consults the same sidecars: a DELETE on a
    bloom-absent value hard-links every other part untouched."""
    from duckdb_extension_clickhouse_native_spark.operators.mutations import (
        mutate_native_dir,
    )

    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    _scattered_dir(spark, src)
    st = mutate_native_dir(
        spark, src, out, delete_where=[("uid", "=", "u42")]
    )
    assert st["untouched_parts"] == 7 and st["rewritten_parts"] == 1
    assert (
        spark.read.format("clickhouse_native").load(out).count() == 8 * 200 - 1
    )
