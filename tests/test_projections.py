"""MergeTree projection analogue (operators/projections.py):
materialized partial aggregate states + incremental refresh +
automatic query-time selection with staleness fallback."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from duckdb_extension_clickhouse_native_spark.operators.projections import (
    add_projection,
    drop_projection,
    list_projections,
    query_projection_aware,
    refresh_projection,
)

AGGS = {
    "n": ("count", None),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _part(d: str, i: int, keys: list[str], vals: list[int]) -> str:
    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )

    t = pa.table(
        {
            "g": pa.array(keys),
            "h": pa.array([k[0] for k in keys]),
            "v": pa.array(vals, type=pa.int64()),
        }
    )
    p = os.path.join(d, f"part-{i:03d}.clickhouse")
    write_native_file(p, t)
    return p


def _expected(rows):
    out = {}
    for g, _h, v in rows:
        e = out.setdefault(g, [0, 0, None, None])
        e[0] += 1
        e[1] += v
        e[2] = v if e[2] is None else min(e[2], v)
        e[3] = v if e[3] is None else max(e[3], v)
    return out


@pytest.fixture()
def proj_dir(tmp_path):
    d = str(tmp_path / "tbl")
    os.makedirs(d)
    _part(d, 0, ["aa", "ab", "aa", "ba"], [1, 2, 3, 4])
    _part(d, 1, ["ab", "ba", "bb", "aa"], [10, 20, 30, 40])
    return d


def _query(spark, d, group_by=("g",)):
    df, used = query_projection_aware(
        spark, d, group_by=list(group_by), aggs=AGGS
    )
    rows = {
        tuple(getattr(r, c) for c in group_by): (r.n, r.total, r.lo, r.hi)
        for r in df.collect()
    }
    return rows, used


EXPECT = {
    ("aa",): (3, 44, 1, 40),
    ("ab",): (2, 12, 2, 10),
    ("ba",): (2, 24, 4, 20),
    ("bb",): (1, 30, 30, 30),
}


def test_add_select_and_merge(spark, proj_dir):
    add_projection(spark, proj_dir, "by_g", group_by=["g"], aggs=AGGS)
    rows, used = _query(spark, proj_dir)
    assert used == "by_g"
    assert rows == EXPECT
    # projection files live under an underscore dir: invisible to a
    # plain scan of the table directory
    df = spark.read.format("clickhouse_native").load(proj_dir)
    assert df.count() == 8


def test_subset_key_merge_reaggregates(spark, proj_dir):
    """Query keys ⊂ projection keys: stored (g, h) partials merge
    down to g."""
    add_projection(
        spark, proj_dir, "by_gh", group_by=["g", "h"], aggs=AGGS
    )
    rows, used = _query(spark, proj_dir)
    assert used == "by_gh"
    assert rows == EXPECT
    # and the h-only rollup also works from the same projection
    rows_h, used_h = _query(spark, proj_dir, group_by=("h",))
    assert used_h == "by_gh"
    assert rows_h == {
        ("a",): (5, 56, 1, 40),
        ("b",): (3, 54, 4, 30),
    }


def test_no_covering_projection_falls_back(spark, proj_dir):
    add_projection(spark, proj_dir, "by_h", group_by=["h"], aggs=AGGS)
    rows, used = _query(spark, proj_dir)  # g not ⊆ {h}
    assert used is None
    assert rows == EXPECT


def test_missing_state_falls_back(spark, proj_dir):
    add_projection(
        spark,
        proj_dir,
        "by_g",
        group_by=["g"],
        aggs={"n": ("count", None)},
    )
    _rows, used = _query(spark, proj_dir)  # needs sum/min/max states
    assert used is None


def test_new_part_staleness_and_incremental_refresh(spark, proj_dir):
    add_projection(spark, proj_dir, "by_g", group_by=["g"], aggs=AGGS)
    before = set(os.listdir(os.path.join(proj_dir, "_projection_by_g")))
    _part(proj_dir, 2, ["aa", "bb"], [100, 200])
    # stale projection must NOT answer the query
    rows, used = _query(spark, proj_dir)
    assert used is None
    assert rows[("aa",)] == (4, 144, 1, 100)
    # incremental refresh reads only the new part and appends states
    st = refresh_projection(spark, proj_dir, "by_g")
    assert st["mode"] == "incremental" and st["new_parts"] == 1
    after = set(os.listdir(os.path.join(proj_dir, "_projection_by_g")))
    assert before <= after and len(after) > len(before)
    rows, used = _query(spark, proj_dir)
    assert used == "by_g"
    assert rows[("aa",)] == (4, 144, 1, 100)
    assert rows[("bb",)] == (2, 230, 30, 200)


def test_mutated_part_refreshes_incrementally(spark, proj_dir):
    # r11: the per-part state layout rebuilds ONLY the mutated part's
    # projection partition (pre-r11 this degenerated to a full rebuild)
    add_projection(spark, proj_dir, "by_g", group_by=["g"], aggs=AGGS)
    # overwrite part 0 with different content (a mutation analogue)
    _part(proj_dir, 0, ["zz"], [7])
    _rows, used = _query(spark, proj_dir)
    assert used is None
    st = refresh_projection(spark, proj_dir, "by_g")
    assert st.get("mode") == "incremental"
    assert st["changed_parts"] == 1 and st["new_parts"] == 0
    rows, used = _query(spark, proj_dir)
    assert used == "by_g"
    # part 0's original rows are gone; only part 1 remains beside zz
    assert rows == {
        ("zz",): (1, 7, 7, 7),
        ("ab",): (1, 10, 10, 10),
        ("ba",): (1, 20, 20, 20),
        ("bb",): (1, 30, 30, 30),
        ("aa",): (1, 40, 40, 40),
    }


def test_removed_part_invalidates_only_its_partition(spark, proj_dir):
    add_projection(spark, proj_dir, "by_g", group_by=["g"], aggs=AGGS)
    from duckdb_extension_clickhouse_native_spark.native.writer import (
        stats_sidecar_path,
    )

    p0 = os.path.join(proj_dir, "part-000.clickhouse")
    os.remove(p0)
    side = stats_sidecar_path(p0)
    if os.path.exists(side):
        os.remove(side)
    st = refresh_projection(spark, proj_dir, "by_g")
    assert st.get("mode") == "incremental"
    assert st["removed_parts"] == 1 and st["changed_parts"] == 0
    rows, used = _query(spark, proj_dir)
    assert used == "by_g"
    # only part 1's rows remain
    assert rows == {
        ("ab",): (1, 10, 10, 10),
        ("ba",): (1, 20, 20, 20),
        ("bb",): (1, 30, 30, 30),
        ("aa",): (1, 40, 40, 40),
    }


def test_legacy_flat_manifest_rebuilds_once_then_per_part(spark, proj_dir):
    import json

    add_projection(spark, proj_dir, "by_g", group_by=["g"], aggs=AGGS)
    # simulate a pre-r11 manifest (flat layout marker removed)
    man_path = os.path.join(proj_dir, "_projection_by_g.json")
    man = json.load(open(man_path))
    man.pop("layout")
    json.dump(man, open(man_path, "w"))
    _part(proj_dir, 7, ["xx"], [5])  # any churn
    st = refresh_projection(spark, proj_dir, "by_g")
    assert st.get("mode") == "rebuild"
    _part(proj_dir, 8, ["yy"], [6])
    st2 = refresh_projection(spark, proj_dir, "by_g")
    assert st2.get("mode") == "incremental" and st2["new_parts"] == 1
    rows, used = _query(spark, proj_dir)
    assert used == "by_g"
    assert rows[("xx",)] == (1, 5, 5, 5) and rows[("yy",)] == (1, 6, 6, 6)


def test_avg_derivation_and_idempotent_add(spark, proj_dir):
    st1 = add_projection(spark, proj_dir, "by_g", group_by=["g"], aggs=AGGS)
    st2 = add_projection(spark, proj_dir, "by_g", group_by=["g"], aggs=AGGS)
    assert st1["built"] and not st2["built"]
    df, used = query_projection_aware(
        spark,
        proj_dir,
        group_by=["g"],
        aggs={"a": ("avg", "v"), "n": ("count", None)},
    )
    assert used == "by_g"
    got = {r.g: (r.a, r.n) for r in df.collect()}
    assert got["aa"] == (44 / 3, 3)
    assert got["bb"] == (30.0, 1)


def test_best_projection_is_smallest_covering(spark, proj_dir):
    add_projection(spark, proj_dir, "by_gh", group_by=["g", "h"], aggs=AGGS)
    add_projection(spark, proj_dir, "by_g", group_by=["g"], aggs=AGGS)
    assert list_projections(proj_dir) == ["by_g", "by_gh"]
    _rows, used = _query(spark, proj_dir)
    assert used == "by_g"  # fewer keys -> smaller partial relation
    drop_projection(proj_dir, "by_g")
    _rows, used = _query(spark, proj_dir)
    assert used == "by_gh"


def test_unsupported_agg_fn_rejected(spark, proj_dir):
    with pytest.raises(ValueError, match="mergeable"):
        add_projection(
            spark,
            proj_dir,
            "bad",
            group_by=["g"],
            aggs={"s": ("stddev", "v")},
        )


def test_optimize_deduplicate(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.sources.native_datasource import (
        compact_native_dir,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    os.makedirs(src)
    _part(src, 0, ["aa", "ab"], [1, 2])
    _part(src, 1, ["aa", "ab"], [1, 9])  # ("aa",1) duplicates part 0
    n = compact_native_dir(spark, src, dst, target_files=1, deduplicate=True)
    assert n == 3
    got = sorted(
        (r.g, r.v)
        for r in spark.read.format("clickhouse_native").load(dst).collect()
    )
    assert got == [("aa", 1), ("ab", 2), ("ab", 9)]


from hypothesis import given, settings, strategies as st  # noqa: E402

_part_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-50, 50)),  # (g-idx, v)
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(
    parts=st.lists(_part_strategy, min_size=1, max_size=4),
    proj_two_keys=st.booleans(),
    query_key=st.sampled_from(["g", "h"]),
)
def test_projection_merge_equals_full_scan_property(
    spark, tmp_path_factory, parts, proj_two_keys, query_key
):
    """Random part layouts x random projection/query key choices: when
    the projection covers the query it must be SELECTED and its merge
    must equal the full scan bit-for-bit; when it cannot cover (query
    key outside projection keys) the fallback must equal it too."""
    d = str(tmp_path_factory.mktemp("proj"))
    keys = ["aa", "ab", "ba", "bb"]
    for i, rows in enumerate(parts):
        _part(d, i, [keys[g] for g, _v in rows], [v for _g, v in rows])
    group_by = ["g", "h"] if proj_two_keys else ["g"]
    add_projection(spark, d, "p", group_by=group_by, aggs=AGGS)
    df, used = query_projection_aware(
        spark, d, group_by=[query_key], aggs=AGGS
    )
    got = {
        getattr(r, query_key): (r.n, r.total, r.lo, r.hi)
        for r in df.collect()
    }
    covered = query_key in group_by
    assert (used == "p") == covered
    # independent expectation from the raw rows
    exp = {}
    for rows in parts:
        for g, v in rows:
            k = keys[g] if query_key == "g" else keys[g][0]
            e = exp.setdefault(k, [0, 0, None, None])
            e[0] += 1
            e[1] += v
            e[2] = v if e[2] is None else min(e[2], v)
            e[3] = v if e[3] is None else max(e[3], v)
    assert got == {k: tuple(v) for k, v in exp.items()}


def _hive_proj_dir(tmp_path):
    """lang=en/lang=fr tree; per dir one part of g-keyed rows."""
    d = str(tmp_path / "t")
    for lang, keys, vals in [
        ("en", ["aa", "ab", "aa"], [1, 2, 3]),
        ("fr", ["aa", "ba"], [10, 20]),
    ]:
        sub = os.path.join(d, f"lang={lang}")
        os.makedirs(sub)
        _part(sub, 0, keys, vals)
    return d


def test_projection_over_hive_layout(spark, tmp_path):
    """r11: manifests key parts by LOAD-RELATIVE path, so hive trees
    project like flat dirs — including GROUP BY on the path-derived
    partition column itself."""
    d = _hive_proj_dir(tmp_path)
    add_projection(
        spark, d, "by_lang_g", group_by=["lang", "g"], aggs=AGGS
    )
    df, used = query_projection_aware(
        spark, d, group_by=["lang", "g"], aggs=AGGS
    )
    assert used == "by_lang_g"
    got = {(r.lang, r.g): (r.n, r.total) for r in df.collect()}
    assert got == {
        ("en", "aa"): (2, 4),
        ("en", "ab"): (1, 2),
        ("fr", "aa"): (1, 10),
        ("fr", "ba"): (1, 20),
    }
    # subset-key merge across partition dirs
    df2, used2 = query_projection_aware(spark, d, group_by=["g"], aggs=AGGS)
    assert used2 == "by_lang_g"
    got2 = {r.g: (r.n, r.total) for r in df2.collect()}
    assert got2 == {"aa": (3, 14), "ab": (1, 2), "ba": (1, 20)}


def test_projection_hive_incremental_refresh_per_part(spark, tmp_path):
    d = _hive_proj_dir(tmp_path)
    add_projection(spark, d, "p", group_by=["lang", "g"], aggs=AGGS)
    # mutate ONLY the fr part in place
    _part(os.path.join(d, "lang=fr"), 0, ["zz"], [7])
    _df, used = query_projection_aware(
        spark, d, group_by=["lang", "g"], aggs=AGGS
    )
    assert used is None  # stale until refreshed
    st = refresh_projection(spark, d, "p")
    assert st["mode"] == "incremental" and st["changed_parts"] == 1
    df, used = query_projection_aware(
        spark, d, group_by=["lang", "g"], aggs=AGGS
    )
    assert used == "p"
    got = {(r.lang, r.g): (r.n, r.total) for r in df.collect()}
    assert got == {
        ("en", "aa"): (2, 4),
        ("en", "ab"): (1, 2),
        ("fr", "zz"): (1, 7),
    }
    # and a new part in a NEW partition directory appends incrementally
    sub = os.path.join(d, "lang=de")
    os.makedirs(sub)
    _part(sub, 0, ["aa"], [100])
    st2 = refresh_projection(spark, d, "p")
    assert st2["mode"] == "incremental" and st2["new_parts"] == 1
    df3, used3 = query_projection_aware(spark, d, group_by=["g"], aggs=AGGS)
    assert used3 == "p"
    assert {r.g: r.total for r in df3.collect()} == {
        "aa": 104,
        "ab": 2,
        "zz": 7,
    }
