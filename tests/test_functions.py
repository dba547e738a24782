"""Text analysis / dedup / ANN / multimodal pipeline function tests
(python-side reference checks on small deterministic inputs)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from cugraph_spark.functions import (
    attach_media,
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_near_duplicates,
    exact_dedup,
    exact_duplicates,
    extract_features,
    fingerprint,
    language_id,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_score,
    sample_frames,
    shingles,
    simhash,
    simhash_near_duplicates,
    token_count,
)

DOCS = [
    (1, "The cat and the dog played in the garden with a ball of yarn."),
    (2, "The cat and the dog played in the garden with a ball of wool."),
    (3, "Der Hund und die Katze spielen nicht mit dem Ball in dem Garten."),
    (4, "Le chat et le chien jouent dans le jardin avec une balle pour les enfants."),
    (5, "completely unrelated text about quantum chromodynamics lattices"),
    (6, "The cat and the dog played in the garden with a ball of yarn."),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_language_id(spark, docs):
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    assert got[1] == "en" and got[6] == "en"
    assert got[3] == "de"
    assert got[4] == "fr"
    assert got[5] in ("en", "und")  # sparse text — weak signal is fine


def test_token_count_modes(spark, docs):
    ws = {r["doc_id"]: r["n_tokens"] for r in token_count(docs).collect()}
    assert ws[1] == len(DOCS[0][1].split())
    bp = {r["doc_id"]: r["n_tokens"] for r in token_count(docs, mode="bpe_ish").collect()}
    assert all(bp[d] >= ws[d] for d in ws)  # punctuation splits add tokens
    empty = spark.createDataFrame([(9, "")], "doc_id long, text string")
    assert token_count(empty).first()["n_tokens"] == 0


def test_quality_score_range(spark, docs):
    got = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    assert all(0.0 <= q <= 1.0 for q in got.values())
    assert got[1] >= 0.75  # clean English sentence
    junk = spark.createDataFrame([(9, "@@@@ ///// $$$$$")], "doc_id long, text string")
    assert quality_score(junk).first()["quality"] <= 0.5


def test_fingerprint_whitespace_case_invariant(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "other")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert got[1] == got[2] != got[3]

    # portable md5-60 hash: same invariant, and bit-for-bit reproducible
    # outside the JVM (hashlib twin of the DuckDB oracle expression)
    import hashlib

    got60 = {
        r["doc_id"]: r["fingerprint"]
        for r in fingerprint(df, hash_fn="md5_60").collect()
    }
    assert got60[1] == got60[2] != got60[3]
    expect = int(hashlib.md5(b"hello world").hexdigest()[:15], 16)
    assert got60[1] == expect


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b")], "doc_id long, text string")
    got = {r["doc_id"]: sorted(r["shingles"]) for r in shingles(df, n=3).collect()}
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == []


def test_exact_dedup(spark, docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1 and sorted(groups[0]["ids"]) == [1, 6]
    kept = sorted(r["doc_id"] for r in exact_dedup(docs).collect())
    assert kept == [1, 2, 3, 4, 5]


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in minhash_dedup_pairs(docs, threshold=0.5).collect()}
    assert (1, 6) in pairs and pairs[(1, 6)] == 1.0
    assert (1, 2) in pairs and 0.5 <= pairs[(1, 2)] < 1.0
    assert (1, 5) not in pairs


def test_minhash_signature_shape(spark, docs):
    sigs = minhash_signatures(docs, num_hashes=16).collect()
    assert all(len(r["sig"]) == 16 for r in sigs)
    by_id = {r["doc_id"]: r["sig"] for r in sigs}
    assert by_id[1] == by_id[6]  # identical docs → identical signatures


def test_ngram_jaccard_exact_value(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d x")], "doc_id long, text string"
    )
    got = ngram_jaccard_pairs(df, n=2).collect()
    # bigrams: {ab,bc,cd,de} vs {ab,bc,cd,dx} → 3/5
    assert len(got) == 1 and abs(got[0]["jaccard"] - 3 / 5) < 1e-12


def test_ngram_prefix_filter_matches_full_join(spark):
    # prefix filtering (threshold > 0 path) must be lossless vs the
    # plain inverted-index join — same pairs, same jaccard values
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.1, 0.2, 0.5, 0.8):
        fast = {
            (r["a"], r["b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(df, n=2, threshold=t).collect()
        }
        slow = {
            (r["a"], r["b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(df, n=2, threshold=0.0).collect()
            if r["jaccard"] >= t
        }
        assert fast == slow, f"threshold={t}"


def test_simhash_near_duplicates(spark, docs):
    h = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert h[1] == h[6]
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in simhash_near_duplicates(docs, max_hamming=12).collect()}
    assert pairs[(1, 6)] == 0
    assert (1, 2) in pairs  # one-word difference → small hamming
    assert (1, 5) not in pairs


def _vec(theta):
    return [math.cos(theta), math.sin(theta), 0.0, 0.0]


@pytest.fixture()
def vecs(spark):
    rows = [(i, _vec(i * 0.03), i % 3) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_bruteforce_topk_exact(spark, vecs):
    q = vecs.filter(F.col("vec_id") == 0)
    got = cosine_topk_bruteforce(vecs, q, k=3).orderBy("rank").collect()
    assert [r["vec_id"] for r in got] == [1, 2, 3]  # angular order
    assert got[0]["cosine"] > got[1]["cosine"] > got[2]["cosine"]


def test_lsh_topk_recall(spark, vecs):
    q = vecs.filter(F.col("vec_id") == 20)
    bf = {r["vec_id"] for r in cosine_topk_bruteforce(vecs, q, k=5).collect()}
    ls = {r["vec_id"] for r in cosine_topk_lsh(vecs, q, k=5, n_bands=4, band_bits=2).collect()}
    assert len(bf & ls) >= 2  # bucketed search keeps most near neighbors


def test_ivf_topk_recall(spark, vecs):
    q = vecs.filter(F.col("vec_id") == 10)
    bf = [r["vec_id"] for r in cosine_topk_bruteforce(vecs, q, k=5).collect()]
    iv = [r["vec_id"] for r in cosine_topk_ivf(vecs, q, k=5, n_centroids=8, nprobe=4).collect()]
    assert len(set(bf) & set(iv)) >= 3


def test_embedding_near_duplicates(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.9999, 0.0141]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["a"], r["b"]) for r in embedding_near_duplicates(df, threshold=0.99).collect()}
    assert got == {(1, 2)}


def test_testdata_embeddings_roundtrip(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.limit(2)
    got = cosine_topk_bruteforce(emb, q, k=5).collect()
    assert len(got) == 10
    assert all(-1.0001 <= r["cosine"] <= 1.0001 for r in got)


def test_multimodal_plumbing(spark):
    rows = [(1, b"\x89PNGfake1"), (2, b"\x89PNGfake2")]
    df = attach_media(
        spark.createDataFrame(rows, "doc_id long, raw binary"),
        "raw", "image/png", width=64, height=64,
    )
    row = df.first()
    assert row["media"]["mime"] == "image/png" and row["media"]["width"] == 64
    feats = extract_features(df, n_features=8).collect()
    assert len(feats) == 2 and all(len(r["features"]) == 8 for r in feats)
    # determinism: same payload → same features
    again = extract_features(df, n_features=8).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))
    # 'auto' without codec libs = the deterministic fallback
    from cugraph_spark.functions.multimodal import codec_available

    auto = extract_features(df, n_features=8, decode="auto").collect()
    if not codec_available("image"):
        assert sorted(map(str, auto)) == sorted(map(str, feats))
        with pytest.raises(Exception):
            extract_features(df, decode="strict").collect()
    else:
        # fake PNG magic bytes are not a decodable image
        with pytest.raises(Exception):
            extract_features(df, decode="strict").collect()


def test_multimodal_real_image_decode(spark):
    """Real Pillow kernel — runs wherever the environment provides it
    (skipped in codec-free containers)."""
    from cugraph_spark.functions.multimodal import codec_available
    from cugraph_spark.functions.multimodal import resize_images

    if not codec_available("image"):
        pytest.skip("Pillow not importable in this environment")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 16), (200, 10, 10)).save(buf, "PNG")
    df = attach_media(
        spark.createDataFrame([(1, buf.getvalue())], "doc_id long, raw binary"),
        "raw", "image/png", width=32, height=16,
    )
    feats = extract_features(df, n_features=9, decode="auto").first()["features"]
    assert len(feats) == 9 and all(0.0 <= f <= 1.0 for f in feats)
    out = resize_images(df, width=8, height=8, decode="auto").first()["media"]
    assert (out["width"], out["height"]) == (8, 8)
    img = Image.open(io.BytesIO(bytes(out["data"])))
    assert img.size == (8, 8)
    import hashlib

    assert out["sha256"] == hashlib.sha256(bytes(out["data"])).hexdigest()


def test_resize_passthrough_keeps_declared_dims(spark):
    """Rows NOT actually resized (non-image mime in auto/fake mode,
    corrupt image payload in auto mode) must keep their original
    declared dims — stamping the target dims on an untouched payload
    would make the metadata lie about the data."""
    from cugraph_spark.functions.multimodal import codec_available
    from cugraph_spark.functions.multimodal import resize_images

    audio = attach_media(
        spark.createDataFrame([(1, b"RIFFxxxx")], "doc_id long, raw binary"),
        "raw", "audio/wav", duration_ms=1234,
    )
    for mode in ("fake", "auto"):
        out = resize_images(audio, width=8, height=8, decode=mode).first()["media"]
        assert bytes(out["data"]) == b"RIFFxxxx"
        assert out["width"] is None and out["height"] is None  # unchanged
    if codec_available("image"):
        # image mime but undecodable payload: auto passes it through whole
        broken = attach_media(
            spark.createDataFrame([(1, b"\x89PNGnotreally")], "doc_id long, raw binary"),
            "raw", "image/png", width=640, height=480,
        )
        out = resize_images(broken, width=8, height=8, decode="auto").first()["media"]
        assert bytes(out["data"]) == b"\x89PNGnotreally"
        assert (out["width"], out["height"]) == (640, 480)


def test_sample_frames(spark):
    rows = [(1, b"videodata")]
    df = attach_media(
        spark.createDataFrame(rows, "doc_id long, raw binary"),
        "raw", "video/mp4", duration_ms=3500,
    )
    frames = sample_frames(df, every_ms=1000).collect()
    assert len(frames) == 3
    assert sorted(r["frame"] for r in frames) == [0, 1, 2]


def test_sample_frames_strict_requires_binding(spark):
    """decode='strict' must raise where no ffmpeg binding imports (the
    honesty contract for this codec-free container); where one DOES
    import, strict is exercised by the real-decode test below."""
    from cugraph_spark.functions.multimodal import codec_available

    if codec_available("video"):
        pytest.skip("an ffmpeg binding is importable here")
    df = attach_media(
        spark.createDataFrame([(1, b"videodata")], "doc_id long, raw binary"),
        "raw", "video/mp4", duration_ms=2000,
    )
    with pytest.raises(NotImplementedError):
        sample_frames(df, decode="strict")


def test_multimodal_real_video_decode(spark, tmp_path):
    """Real ffmpeg-binding kernel (PyAV or imageio-ffmpeg) — synthesize
    a tiny mp4 with whichever binding imports, then sample frames from
    the ACTUAL stream (skipped in codec-free containers, mirroring the
    Pillow/soundfile skip-if tests)."""
    import numpy as np

    from cugraph_spark.functions.multimodal import codec_available

    if not codec_available("video"):
        pytest.skip("no ffmpeg binding importable in this environment")

    # 2-second 4fps 32x16 gradient clip via whichever binding exists
    frames = [
        (np.full((16, 32, 3), 30 * i, dtype=np.uint8)) for i in range(8)
    ]
    path = str(tmp_path / "tiny.mp4")
    try:
        import av

        with av.open(path, "w") as container:
            stream = container.add_stream("mpeg4", rate=4)
            stream.width, stream.height = 32, 16
            stream.pix_fmt = "yuv420p"
            for arr in frames:
                frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
                for pkt in stream.encode(frame):
                    container.mux(pkt)
            for pkt in stream.encode():
                container.mux(pkt)
    except ImportError:
        import imageio_ffmpeg

        writer = imageio_ffmpeg.write_frames(path, (32, 16), fps=4)
        writer.send(None)
        for arr in frames:
            writer.send(arr.tobytes())
        writer.close()

    data = open(path, "rb").read()
    df = attach_media(
        spark.createDataFrame([(1, data)], "doc_id long, raw binary"),
        "raw", "video/mp4", width=32, height=16, duration_ms=2000,
    )
    out = sample_frames(df, every_ms=1000, n_features=4, decode="strict").collect()
    # 2 s clip sampled every 1 s → 2 frames (timestamps 0 and 1000 ms)
    assert len(out) == 2
    assert sorted(r["frame"] for r in out) == [0, 1]
    for r in out:
        assert len(r["features"]) == 4
        assert all(0.0 <= f <= 1.0 for f in r["features"])


def test_cosine_topk_separate_query_id_space(spark):
    """With query_id_col declaring a separate id space, a corpus vector
    whose id numerically equals a query id must NOT be dropped as a
    self-match."""
    corpus = spark.createDataFrame(
        [(7, [1.0, 0.0]), (8, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(7, [1.0, 0.0])], "q_id long, embedding array<double>"
    )
    got = cosine_topk_bruteforce(
        corpus, queries, k=1, query_id_col="q_id"
    ).collect()
    assert len(got) == 1 and got[0]["vec_id"] == 7
    # same id space (no query_id_col): the self-match IS excluded
    sq = spark.createDataFrame(
        [(7, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got2 = cosine_topk_bruteforce(corpus, sq, k=1).collect()
    assert len(got2) == 1 and got2[0]["vec_id"] == 8
