"""Code-repo table generator + import-edge extraction + RMAT generator:
determinism, partition invariance, sha256 row invariant, end-to-end
graph derivation (the north-rule input path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cugraph_spark import Graph, pagerank
from cugraph_spark.sources import (
    extract_import_edges,
    generate_code_repo_table,
    rmat_edges,
    verify_content_sha,
    with_content_sha,
)


def test_code_repo_table_shape_and_determinism(spark):
    t1 = generate_code_repo_table(spark, n_repos=4, files_per_repo=10, seed=7)
    assert t1.columns == ["repo", "path", "commit", "lang", "content"]
    assert t1.count() == 40
    # identical content regardless of partition count (scale invariance)
    t2 = generate_code_repo_table(spark, n_repos=4, files_per_repo=10, seed=7, num_partitions=13)
    a = sorted(t1.collect())
    b = sorted(t2.collect())
    assert a == b
    # different seed → different content
    t3 = generate_code_repo_table(spark, n_repos=4, files_per_repo=10, seed=8)
    assert sorted(t3.collect()) != a


def test_import_edges_resolve_and_hub(spark):
    t = generate_code_repo_table(spark, n_repos=3, files_per_repo=8, seed=42)
    edges = extract_import_edges(t)
    rows = edges.collect()
    assert len(rows) > 0
    # every dst resolves to a real file
    files = {r["repo"] + ":" + r["path"] for r in t.collect()}
    for r in rows:
        assert r["src"] in files and r["dst"] in files
        assert r["weight"] >= 1.0
    # stdlib files are hubs: every non-stdlib file imports its repo stdlib
    in_deg = {}
    for r in rows:
        in_deg[r["dst"]] = in_deg.get(r["dst"], 0) + 1
    stdlib_in = [v for k, v in in_deg.items() if k.endswith("stdlib.src")]
    assert max(stdlib_in) >= 7  # 7 non-stdlib files per repo import it


def test_content_sha_invariant_through_materialization(spark, tmp_path):
    t = with_content_sha(generate_code_repo_table(spark, n_repos=2, files_per_repo=6))
    p = str(tmp_path / "files.parquet")
    t.write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p)
    assert verify_content_sha(back) == 0
    assert back.count() == 12


def test_pagerank_on_code_repo_graph(spark):
    """End-to-end north-rule path: repo table → string-id edges →
    renumbered Graph → PageRank sums to ~1."""
    t = generate_code_repo_table(spark, n_repos=3, files_per_repo=10)
    edges = extract_import_edges(t)
    G = Graph.from_edgelist(edges, weight_col="weight", directed=True, do_renumber=True)
    pr = pagerank(G, tol=1e-6, max_iter=200)
    total = pr.agg(F.sum("pagerank")).first()[0]
    assert abs(total - 1.0) < 1e-6
    # hub stdlib files should outrank leaf modules
    from cugraph_spark.graph import unrenumber
    named = unrenumber(pr, G.mapping)
    top = named.orderBy(F.desc("pagerank")).limit(3).collect()
    assert all(r["vertex"].endswith("stdlib.src") for r in top)


@pytest.mark.parametrize("parts", [3, 9])
def test_rmat_partition_invariant(spark, parts):
    e = rmat_edges(spark, scale=6, edgefactor=4, seed=42, num_partitions=parts)
    rows = sorted((r["src"], r["dst"]) for r in e.collect())
    assert len(rows) == 4 << 6
    e2 = rmat_edges(spark, scale=6, edgefactor=4, seed=42, num_partitions=5)
    assert rows == sorted((r["src"], r["dst"]) for r in e2.collect())
    # bounds
    assert all(0 <= s < 64 and 0 <= d < 64 for s, d in rows)


def test_rmat_skew(spark):
    """Graph500 a=0.57 concentrates mass on low ids — verify power-law
    hubs exist (max in-degree ≫ mean)."""
    e = rmat_edges(spark, scale=8, edgefactor=8, seed=42)
    deg = e.groupBy("dst").count().agg(F.max("count"), F.avg("count")).first()
    assert deg[0] > 5 * deg[1]
