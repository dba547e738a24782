"""Training-data curation selection: deterministic sampling and
per-group top-k over the documents table.

A 100 TB corpus pipeline needs selection primitives that are (a)
deterministic across partition counts and cluster sizes (re-runs and
resumes must pick the SAME rows — the repo-wide invariance contract,
same reason renumber/walks use content-keyed hashes, never
``rand()``/``monotonically_increasing_id``), and (b) shuffle-minimal.

- ``hash_sample``: Bernoulli-by-hash sampling — keep a row iff
  ``h(key) < fraction · H``. ZERO shuffles: the predicate evaluates in
  the scan stage (whole-stage codegen) and composes with predicate
  pushdown on other filters. This is the scale path for "sample ~10%
  of the corpus"; the sample is a pure function of the key, so it is
  also STABLE under corpus growth (a kept document stays kept when new
  data arrives — exactly what incremental training-data refreshes
  want; Spark's own ``df.sample`` guarantees neither determinism under
  repartition nor stability under growth).
- ``stratified_sample``: EXACT per-stratum quotas (e.g. "20k docs per
  language") via ``row_number`` over seeded-hash order within each
  stratum — one shuffle keyed by the strata columns. Rows of one
  stratum sort within their partitions (Spark windows sort
  per-partition after the hash exchange, never globally); a stratum
  with billions of rows makes that sort the bottleneck, so for huge
  strata pre-thin with ``hash_sample`` at ~2× the target rate first
  (documented two-phase pattern; determinism composes because both
  phases are keyed hashes).
- ``top_k_per_group``: rank inside each group by a score column and
  keep k — quality-gating per language/source. Same shuffle shape as
  ``stratified_sample``; ties break on the key column so results are
  total-order deterministic.
- ``deterministic_sample_n``: exact global n via seeded-hash order +
  ``limit`` — Catalyst plans TakeOrderedAndProject (per-partition
  top-n heaps + single driver merge of n·P rows), never a global sort.

Hashes: ``xxhash64`` (JVM-side) for production; ``md5_60`` (the
portable 60-bit md5 from ``functions.dedup._hash64``) when a DuckDB
oracle must reproduce the selection bit-exactly — the driver-gate
queries ``doc_sample`` / ``doc_stratified`` / ``doc_topk`` use it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _hash64

_H60_MAX = 1 << 60  # md5_60 values are uniform in [0, 2^60)
_H64_SPAN = float(1 << 64)  # xxhash64 values are uniform in [-2^63, 2^63)


def hash_sample(
    df: DataFrame,
    fraction: float,
    seed: int = 42,
    key_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic Bernoulli sample: keeps each row iff the keyed
    hash of ``key_col`` falls below ``fraction`` of the hash range.
    No shuffle — a scan-stage filter; stable under repartition and
    under corpus growth."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction == 1.0:
        return df  # threshold would be 2^63, one past LongType's max
    h = _hash64(F.col(key_col).cast("string"), seed=seed, fn=hash_fn)
    if hash_fn == "md5_60":
        return df.filter(h < F.lit(int(fraction * _H60_MAX)))
    # xxhash64 is signed; shift into [0, 2^64) by comparing against the
    # signed threshold at the same quantile
    thr = int(-(1 << 63) + fraction * _H64_SPAN)
    return df.filter(h < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    quota: int,
    seed: int = 42,
    key_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Exactly ``min(quota, |stratum|)`` rows per stratum, chosen by
    seeded-hash order (uniform within the stratum, deterministic).
    Adds ``sample_rank`` (1-based position in the stratum's hash
    order). One shuffle on ``strata_cols``; pre-thin huge strata with
    ``hash_sample`` first (see module docstring)."""
    if quota <= 0:
        raise ValueError(f"quota must be positive, got {quota}")
    h = _hash64(F.col(key_col).cast("string"), seed=seed, fn=hash_fn)
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= quota)
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    k: int,
    descending: bool = True,
    key_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` rows per group by ``score_col`` (ties broken by
    ``key_col`` ascending — a total order, so the result is exact and
    partition-invariant). Adds ``rank`` (1-based). One shuffle on
    ``group_cols``."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    score = F.col(score_col).desc() if descending else F.col(score_col).asc()
    w = Window.partitionBy(*group_cols).orderBy(score, F.col(key_col).asc())
    return (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def deterministic_sample_n(
    df: DataFrame,
    n: int,
    seed: int = 42,
    key_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Exactly ``min(n, |df|)`` rows, uniform by seeded hash,
    deterministic. ``orderBy(hash).limit(n)`` → Catalyst's
    TakeOrderedAndProject: each partition keeps an n-row heap and the
    driver merges P heaps — O(n·P) driver work, NO global sort (the
    reservoir-sampling analog with a deterministic tape)."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    h = _hash64(F.col(key_col).cast("string"), seed=seed, fn=hash_fn)
    return df.orderBy(h.asc(), F.col(key_col).asc()).limit(n)
