"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle → minhash → band →
bucket-join), SimHash, n-gram Jaccard, and embedding-cosine near-dup.
All heavy lifting stays JVM-side: shingling via higher-order SQL
functions (``text.shingles``), minhash via ``xxhash64(shingle, seed)``
min-aggregates (map-side combinable), simhash via 64 conditional-sum
aggregates, cosine via ``zip_with``/``aggregate``. No Python UDFs.

Scale notes: the LSH band join is the standard sub-quadratic path —
candidate pairs only for banded-signature collisions; the verify step
(exact Jaccard over shingle arrays) touches candidates only. Band
buckets on popular signatures can skew; the bucket join key includes
the band index so AQE skew splitting applies per band.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import shingles


def _hash64(col, seed: int | None = None, fn: str = "xxhash64"):
    """64-bit (or 60-bit) keyed hash of a string column.

    ``xxhash64`` (default): JVM-native, the fast production path.
    ``md5_60``: first 15 hex chars of md5("<seed>:<value>") as a
    non-negative 60-bit long — bit-for-bit reproducible in ANSI SQL
    (DuckDB: ``('0x' || substr(md5(...), 1, 15))::BIGINT``), which lets
    the driver's oracle gate verify the FULL minhash/simhash pipelines
    value-exactly instead of rows-only. Same distributional quality for
    min-hashing/banding; ~2-3× slower, so only oracle queries use it."""
    if fn == "xxhash64":
        return F.xxhash64(col, F.lit(seed)) if seed is not None else F.xxhash64(col)
    if fn != "md5_60":
        raise ValueError(f"unknown hash fn {fn!r}")
    s = col if seed is None else F.concat_ws(":", F.lit(seed), col)
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical documents: [dup_group (sha256), ids,
    n_dups], only groups with ≥ 2 members."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("dup_group"))
        .agg(
            F.sort_array(F.collect_list(id_col)).alias("ids"),
            F.count("*").alias("n_dups"),
        )
        .filter(F.col("n_dups") >= 2)
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the min-id representative of each identical-content group —
    one shuffle on the content hash (hub-safe: hash keys are uniform)."""
    w = (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("k"))
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(w.select(id_col), id_col, "left_semi")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    hash_fn: str = "xxhash64",
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """[id, sig: array<long>] — minhash over word n-gram shingles;
    hash family = hash64(shingle, seed=i) (see ``_hash64``). Documents
    with no shingles are dropped (nothing to compare).

    ``shingles_df``: precomputed ``[id_col, shingles]`` frame (e.g. a
    persisted one shared with the verify step) — skips re-shingling."""
    sh = (
        shingles_df
        if shingles_df is not None
        else shingles(df.select(id_col, text_col), text_col, n=n)
    )
    exploded = sh.select(id_col, F.explode("shingles").alias("g"))
    aggs = [
        F.min(_hash64(F.col("g"), i, hash_fn)).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = exploded.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Candidate pairs [a, b] (a < b) sharing ≥ 1 LSH band bucket.
    Bucket key = (band index, hash of the band's signature slice)."""
    banded = sigs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    _hash64(
                        F.concat_ws(",", F.slice("sig", i * rows_per_band + 1, rows_per_band)),
                        i,
                        hash_fn,
                    ).alias("bucket"),
                )
                for i in range(bands)
            ])
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bucket")
    l = banded.select(F.col("band"), F.col("bucket"), F.col("id").alias("a"))
    r = banded.select(F.col("band"), F.col("bucket"), F.col("id").alias("b"))
    return (
        l.join(r, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.0,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs (or all
    pairs sharing ≥ 1 shingle when ``pairs`` is None — the inverted-
    index join). Returns [a, b, jaccard].

    Candidate-scoped path (``pairs`` given, the LSH verify step): the
    candidate pair list joins the two shingle ARRAYS and computes
    ``size(array_intersect)`` per pair — O(|pairs|) rows, zero
    inverted-index fan-out, so one hot shingle shared by millions of
    docs can never re-create the all-pairs blowup the LSH banding
    exists to avoid (the round-1 verify path did exactly that).

    ``shingles_df``: precomputed ``[id_col, shingles]`` frame (e.g. a
    persisted one shared with the signature step) — skips re-shingling."""
    from ..plans.lineage import truncate_plan

    # The all-pairs paths scan the shingle frame 3+ times (inverted
    # index + both verify legs; the prefix-filter path adds the
    # document-frequency ordering). Unless the caller supplied an
    # already-shared frame, persist it for the duration of this call and
    # materialize the result eagerly while the cache is live (the
    # triangle_count live-cache pattern).
    own_cache = shingles_df is None
    base = (
        shingles(df.select(id_col, text_col), text_col, n=n).persist()
        if own_cache
        else shingles_df
    )
    sh = base.select(F.col(id_col).alias("id"), F.col("shingles"))

    def _finish(out: DataFrame) -> DataFrame:
        if own_cache:
            out = truncate_plan(out, eager=True)
            base.unpersist()
        return out

    def _verify(want: DataFrame) -> DataFrame:
        # candidate-scoped exact verify: per-pair array_intersect on the
        # two full shingle arrays — O(|pairs|) rows, no inverted-index
        # fan-out regardless of shingle skew
        out = (
            want.join(sh.select(F.col("id").alias("a"), F.col("shingles").alias("sha")), "a")
            .join(sh.select(F.col("id").alias("b"), F.col("shingles").alias("shb")), "b")
            .select(
                "a", "b",
                F.size(F.array_intersect("sha", "shb")).alias("isect"),
                F.size("sha").alias("sz_a"),
                F.size("shb").alias("sz_b"),
            )
            .select(
                "a", "b",
                (F.col("isect") / (F.col("sz_a") + F.col("sz_b") - F.col("isect"))).alias("jaccard"),
            )
        )
        return out.filter(F.col("jaccard") >= threshold)

    if pairs is not None:
        return _finish(_verify(
            pairs.select(
                F.least(pairs.columns[0], pairs.columns[1]).alias("a"),
                F.greatest(pairs.columns[0], pairs.columns[1]).alias("b"),
            ).distinct()
        ))

    ex = sh.select("id", F.explode("shingles").alias("g"))
    if threshold > 0.0:
        # Exact prefix-filtered all-pairs (Bayardo/Ma/Srikant, "Scaling
        # Up All Pairs Similarity Search", WWW'07): under one global
        # shingle order, any pair with Jaccard >= t shares an element
        # inside both docs' first |s| - ceil(t*|s|) + 1 shingles (the
        # smallest common element has at most |s| - ceil(t*|s|) rarer
        # non-common elements before it, since overlap >= ceil(t*|s|)).
        # Ordering by ascending document frequency puts the RAREST
        # shingles in the prefix, so hot shingles — the quadratic
        # fan-out risk of a plain inverted-index self-join — are
        # excluded from the index for almost every document. The 1e-9
        # slack guards float rounding of t*|s| upward at exact-integer
        # products (a too-long prefix is harmless, a too-short one
        # drops pairs).
        freq = ex.groupBy("g").agg(F.count("*").alias("df_g"))
        ordered = (
            ex.join(freq, "g")
            .groupBy("id")
            .agg(F.array_sort(F.collect_list(F.struct("df_g", "g"))).alias("s"))
        )
        plen = (
            F.size("s") - F.ceil(F.lit(threshold) * F.size("s") - F.lit(1e-9)) + 1
        ).cast("int")
        idx = ordered.select(
            "id", F.explode(F.slice("s", F.lit(1), plen)).alias("p")
        ).select("id", F.col("p.g").alias("g"))
        cand = (
            idx.select(F.col("id").alias("a"), "g")
            .join(idx.select(F.col("id").alias("b"), "g"), "g")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
        return _finish(_verify(cand))

    # threshold == 0: every co-shingled pair is in the answer, so the
    # full inverted-index join IS the output size — no filter to exploit
    sizes = sh.select("id", F.size("shingles").alias("sz"))
    inter = (
        ex.select(F.col("id").alias("a"), "g")
        .join(ex.select(F.col("id").alias("b"), "g"), "g")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("isect"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("sz").alias("sz_a")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("sz").alias("sz_b")), "b")
        .select(
            "a", "b",
            (F.col("isect") / (F.col("sz_a") + F.col("sz_b") - F.col("isect"))).alias("jaccard"),
        )
    )
    return _finish(out.filter(F.col("jaccard") >= threshold))


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → band candidates
    → exact-Jaccard verify ≥ threshold. Returns [a, b, jaccard].

    The shingle frame is computed ONCE, persisted, and shared by the
    signature aggregation and both verify join legs — without this the
    narrow shingling map (regex split + n-gram transform over every
    document) re-runs three times, once per downstream scan. The result
    materializes eagerly while the cache is live (same live-cache
    pattern as ``triangle_count``), then the shingles unpersist."""
    from ..plans.lineage import truncate_plan

    sh = shingles(df.select(id_col, text_col), text_col, n=n).persist()
    sigs = minhash_signatures(
        df, text_col, id_col, n, num_hashes, hash_fn, shingles_df=sh
    )
    cands = minhash_lsh_candidates(sigs, id_col, bands, num_hashes // bands, hash_fn)
    out = ngram_jaccard_pairs(
        df, cands, text_col, id_col, n, threshold, shingles_df=sh
    )
    out = truncate_plan(out, eager=True)
    sh.unpersist()
    return out


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """[id, simhash: long] — Charikar simhash over word tokens: for
    each bit, Σ(±1) over token hashes; bit set iff the sum > 0.
    One explode + one groupBy with ``bits`` conditional-sum aggregates
    (all map-side combinable, JVM-only). With ``hash_fn='md5_60'`` use
    ``bits<=60`` (the portable hash is 60-bit)."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"[^\w\s]", "")), r"\s+")
        ).alias("t"),
    ).filter(F.length("t") > 0)
    h = _hash64(F.col("t"), None, hash_fn)
    aggs = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    sums = toks.groupBy(id_col).agg(*aggs)
    sim = functools.reduce(
        lambda acc, b: acc.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        ),
        range(bits),
        F.lit(0).cast("long"),
    )
    return sums.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance ≤ max_hamming.
    Blocking: split the ``bits``-bit hash into (max_hamming+1) chunks —
    any pair within distance must agree on ≥ 1 chunk exactly
    (pigeonhole), so the join is on (chunk index, chunk value), never
    all-pairs. Returns [a, b, hamming]."""
    chunks = max_hamming + 1
    width = bits // chunks
    sims = simhash(df, text_col, id_col, bits, hash_fn)
    mask = (1 << width) - 1
    blocked = sims.select(
        F.col(id_col).alias("id"),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftrightunsigned("simhash", c * width).bitwiseAND(F.lit(mask)).alias("val"),
                )
                for c in range(chunks)
            ])
        ).alias("blk"),
    ).select("id", "simhash", "blk.chunk", "blk.val")
    l = blocked.select("chunk", "val", F.col("id").alias("a"), F.col("simhash").alias("sa"))
    r = blocked.select("chunk", "val", F.col("id").alias("b"), F.col("simhash").alias("sb"))
    pairs = (
        l.join(r, ["chunk", "val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"))
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
