"""Source-code repository table → import-link edge extraction.

The north-star input (BASELINE.json ``input_hint``) is an Iceberg table
of source-code repositories with columns
``(repo:string, path:string, commit:string, lang:string, content:string)``;
repo/path/commit import-and-link relationships form the graph. This
module provides:

- ``generate_code_repo_table``: a deterministic, *distributed* synthetic
  generator of exactly that shape (seeded, partition-count-invariant —
  every cell is a pure function of the file id), used for tests and
  benchmarks since no external data is allowed. Content embeds
  ``import repo:path`` statements; every file also imports a per-repo
  "stdlib" file so the graph has the power-law hub skew the engine's
  salting/AQE path must handle (SURVEY.md §7.3.2).
- ``extract_import_edges``: projection-only edge extraction with
  built-in SQL functions (``regexp_extract_all`` + ``explode`` — no
  per-row Python, per input_hint), yielding ``(src, dst, weight)`` over
  string vertex ids ``repo:path``; weight = number of times the target
  is imported (multi-import collapse, like multi-edge dedup-sum).
- sha256 row invariant helpers: ``with_content_sha`` /
  ``verify_content_sha`` — content columns never pass through lossy
  transforms; checkpointed/materialized tables carry ``content_sha``
  computed once at ingest and re-verified on read (SURVEY.md §7.3.6).

Scale notes: generation is ``spark.range`` + vectorized column
expressions (fully JVM-side, no UDF at all); extraction is
regexp+explode+groupBy — one shuffle keyed on (src,dst). On a real
cluster the read side is ``spark.read.format("iceberg")`` with Catalyst
pushing the (repo, lang) filters and the 5-column projection into the
scan; here parquet behaves identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "java", "go", "rust", "cpp", "ts"]


def generate_code_repo_table(
    spark: SparkSession,
    n_repos: int = 20,
    files_per_repo: int = 50,
    seed: int = 42,
    imports_per_file: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic synthetic (repo, path, commit, lang, content) table.

    File id ``i`` lives in repo ``i // files_per_repo``; its imports are
    pure hash functions of (seed, i, k) → same table for any partition
    count or cluster size. File 0 of each repo is the hub "stdlib"
    imported by every other file in the repo; cross-repo links go to
    repo (r+1+h) % n_repos's stdlib, modeling dependency edges.
    """
    n = n_repos * files_per_repo
    ids = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)
    fpr = F.lit(files_per_repo)
    r = (F.col("id") / fpr).cast("long")
    fidx = F.col("id") % fpr

    def h(k: int):
        # deterministic per-(file, slot) hash → non-negative long
        return F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(k)))

    repo = F.concat(F.lit("repo"), F.format_string("%04d", r))
    path = F.concat(
        F.lit("src/"),
        F.when(fidx == 0, F.lit("stdlib")).otherwise(
            F.concat(F.lit("mod"), F.format_string("%05d", fidx))
        ),
        F.lit(".src"),
    )
    commit = F.sha2(F.concat(repo, path, F.lit(str(seed))), 256).substr(1, 12)
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), (r % len(LANGS) + 1).cast("int"))

    # import targets: the repo stdlib (hub), a few intra-repo modules,
    # and one cross-repo stdlib link
    intra = [
        F.concat(
            F.lit("import "), repo, F.lit(":src/mod"),
            F.format_string("%05d", (h(k) % (fpr - 1)) + 1), F.lit(".src"),
        )
        for k in range(imports_per_file)
    ]
    cross_repo = F.concat(
        F.lit("repo"), F.format_string("%04d", (r + 1 + h(99) % F.lit(max(n_repos - 1, 1))) % F.lit(n_repos))
    )
    lines = [
        F.concat(F.lit("// file "), repo, F.lit(":"), path),
        F.when(fidx != 0, F.concat(F.lit("import "), repo, F.lit(":src/stdlib.src"))).otherwise(F.lit("// hub")),
        *[F.when(fidx != 0, x).otherwise(F.lit("// -")) for x in intra],
        F.when(fidx != 0, F.concat(F.lit("import "), cross_repo, F.lit(":src/stdlib.src"))).otherwise(F.lit("// -")),
        F.concat(F.lit("fn body_"), F.col("id").cast("string"), F.lit("() { return "), (h(7) % 1000).cast("string"), F.lit("; }")),
    ]
    content = F.concat_ws("\n", *lines)

    return ids.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


IMPORT_RE = r"import (repo\d+:[\w/.]+)"


def extract_import_edges(files: DataFrame, self_loops: bool = False) -> DataFrame:
    """(repo,path,...,content) → edge DataFrame (src, dst, weight) over
    string vertex ids ``repo:path``; weight = import multiplicity.

    Projection-only on content (the sha256 invariant holds: content is
    read, never rewritten); unresolved imports (target file not in the
    table) are dropped via the semi-join, mirroring a linker ignoring
    unknown symbols.
    """
    nodes = files.select(
        F.concat(F.col("repo"), F.lit(":"), F.col("path")).alias("file_id")
    ).distinct()
    raw = (
        files.select(
            F.concat(F.col("repo"), F.lit(":"), F.col("path")).alias("src"),
            F.explode(F.regexp_extract_all(F.col("content"), F.lit(IMPORT_RE), 1)).alias("dst"),
        )
    )
    if not self_loops:
        raw = raw.filter(F.col("src") != F.col("dst"))
    resolved = raw.join(
        nodes.withColumnRenamed("file_id", "dst"), "dst", "left_semi"
    )
    return resolved.groupBy("src", "dst").agg(
        F.count("*").cast("double").alias("weight")
    )


def with_content_sha(files: DataFrame) -> DataFrame:
    """Stamp the per-row content sha256 at ingest (input_hint invariant)."""
    return files.withColumn("content_sha", F.sha2(F.col("content"), 256))


def verify_content_sha(files: DataFrame) -> int:
    """Count rows whose content no longer matches its ingest-time sha
    (must be 0 after any materialization/checkpoint round-trip)."""
    return files.filter(
        F.sha2(F.col("content"), 256) != F.col("content_sha")
    ).count()
