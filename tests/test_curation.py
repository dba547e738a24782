"""Curation sampling: determinism across partitionings, stability
under corpus growth, exact quotas, and scale-shaped plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cugraph_spark.functions.curation import (
    deterministic_sample_n,
    hash_sample,
    stratified_sample,
    top_k_per_group,
)


def _docs(spark, n=500, parts=4):
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("lang"), (F.col("id") % 5).cast("string")).alias("lang"),
        (F.abs(F.xxhash64("id")) % 10000).alias("n_chars"),
    )


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5_60"])
def test_hash_sample_deterministic_and_partition_invariant(spark, hash_fn):
    a = {r.doc_id for r in hash_sample(_docs(spark, parts=2), 0.2, hash_fn=hash_fn).collect()}
    b = {r.doc_id for r in hash_sample(_docs(spark, parts=13), 0.2, hash_fn=hash_fn).collect()}
    assert a == b
    # roughly the asked-for rate (uniform hash, 500 keys)
    assert 0.12 <= len(a) / 500 <= 0.28


def test_hash_sample_stable_under_growth(spark):
    small = {r.doc_id for r in hash_sample(_docs(spark, 300), 0.2).collect()}
    grown = {r.doc_id for r in hash_sample(_docs(spark, 500), 0.2).collect()}
    # every kept doc stays kept when the corpus grows
    assert small == {d for d in grown if d < 300}


def test_hash_sample_seed_changes_selection(spark):
    a = {r.doc_id for r in hash_sample(_docs(spark), 0.2, seed=1).collect()}
    b = {r.doc_id for r in hash_sample(_docs(spark), 0.2, seed=2).collect()}
    assert a != b


def test_hash_sample_no_shuffle(spark):
    plan = hash_sample(_docs(spark), 0.2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scan-stage filter only


def test_stratified_exact_quota_and_invariance(spark):
    out = stratified_sample(_docs(spark, parts=3), ["lang"], 30).collect()
    per = {}
    for r in out:
        per[r.lang] = per.get(r.lang, 0) + 1
    assert per == {f"lang{i}": 30 for i in range(5)}
    assert all(1 <= r.sample_rank <= 30 for r in out)
    out2 = stratified_sample(_docs(spark, parts=11), ["lang"], 30).collect()
    assert {(r.doc_id, r.sample_rank) for r in out} == {
        (r.doc_id, r.sample_rank) for r in out2
    }


def test_stratified_quota_exceeding_stratum(spark):
    # 500 docs / 5 langs = 100 per stratum; quota 150 → all 100 kept
    out = stratified_sample(_docs(spark), ["lang"], 150).collect()
    assert len(out) == 500


def test_top_k_per_group_exact(spark):
    docs = _docs(spark)
    out = top_k_per_group(docs, ["lang"], "n_chars", 3).collect()
    assert len(out) == 15
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append((r.rank, r.n_chars, r.doc_id))
    rows = docs.collect()
    for lang, got in by_lang.items():
        want = sorted(
            ((-r.n_chars, r.doc_id) for r in rows if r.lang == lang)
        )[:3]
        got = sorted(got)
        assert [(nc, d) for _, nc, d in got] == [(-nc, d) for nc, d in want]
        assert [rk for rk, _, _ in got] == [1, 2, 3]


def test_deterministic_sample_n_exact_and_planned_as_topn(spark):
    df = deterministic_sample_n(_docs(spark, parts=7), 40)
    rows = df.collect()
    assert len(rows) == 40
    rows2 = deterministic_sample_n(_docs(spark, parts=2), 40).collect()
    assert {r.doc_id for r in rows} == {r.doc_id for r in rows2}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global Sort


def test_validation_errors(spark):
    d = _docs(spark, 10)
    with pytest.raises(ValueError):
        hash_sample(d, 1.5)
    with pytest.raises(ValueError):
        stratified_sample(d, ["lang"], 0)
    with pytest.raises(ValueError):
        top_k_per_group(d, ["lang"], "n_chars", -1)
    with pytest.raises(ValueError):
        deterministic_sample_n(d, 0)


def test_hash_sample_boundary_fractions(spark):
    # fraction=1.0's xxhash64 threshold is 2^63 — one past LongType's
    # max — so it must short-circuit; 0.0 keeps nothing.
    d = _docs(spark, 10)
    total = d.count()
    for fn in ("xxhash64", "md5_60"):
        assert hash_sample(d, 1.0, hash_fn=fn).count() == total
        assert hash_sample(d, 0.0, hash_fn=fn).count() == 0
