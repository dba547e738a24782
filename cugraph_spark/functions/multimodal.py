"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns
with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over
``mapInPandas``. Decode modes: ``'auto'`` runs the REAL kernels
(Pillow for image/*, soundfile for audio/*, PyAV or imageio-ffmpeg
for video/*) wherever those libraries
import on the executors and falls back to a deterministic
bytes→feature hash elsewhere; ``'strict'`` raises instead of falling
back; ``'fake'`` always uses the stand-in (plumbing tests). This
container ships no codec libraries, so here 'auto' == the fallback —
the real kernels are exercised by skip-if tests wherever the
environment provides the libs, and the Spark-side plumbing (schema,
batching, partitioning, UDF signatures, metadata propagation) is real
and tested everywhere.

Schema convention::

    media: struct<
        data: binary,            -- opaque encoded payload
        mime: string,            -- image/png, audio/wav, video/mp4 ...
        width: int, height: int, -- images/video (NULL for audio)
        duration_ms: long,       -- audio/video (NULL for images)
        sha256: string           -- payload hash (row invariant)
    >
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "data binary, mime string, width int, height int, duration_ms long, sha256 string"
)


def attach_media(
    df: DataFrame,
    data_col: str,
    mime: str,
    width=None,
    height=None,
    duration_ms=None,
    out_col: str = "media",
) -> DataFrame:
    """Wrap a binary column into the typed media struct, stamping the
    payload sha256 (the materialization invariant)."""
    return df.withColumn(
        out_col,
        F.struct(
            F.col(data_col).alias("data"),
            F.lit(mime).alias("mime"),
            (F.lit(width) if width is None else F.lit(int(width))).cast("int").alias("width"),
            (F.lit(height) if height is None else F.lit(int(height))).cast("int").alias("height"),
            (F.lit(duration_ms) if duration_ms is None else F.lit(int(duration_ms))).cast("long").alias("duration_ms"),
            F.sha2(F.col(data_col), 256).alias("sha256"),
        ),
    )


def _fake_decode(data: bytes, n_features: int) -> np.ndarray:
    """Deterministic bytes → feature vector stand-in for a real decoder:
    sha256-seeded uniform features. Stable across partitions/machines."""
    h = hashlib.sha256(data).digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.rand(n_features).astype(np.float32)


@lru_cache(maxsize=None)
def codec_available(kind: str) -> bool:
    """True when the real decode kernel for ``kind`` ('image'/'audio')
    can run in this environment (Pillow / soundfile importable).
    Cached: the answer is environment-level, and the per-row dispatch
    in ``_decode_one`` probes it inside the Arrow batch hot loop."""
    try:
        if kind == "image":
            from PIL import Image  # noqa: F401
            return True
        if kind == "audio":
            import soundfile  # noqa: F401
            return True
        if kind == "video":
            try:
                import av  # noqa: F401
                return True
            except ImportError:
                import imageio_ffmpeg  # noqa: F401
                return True
    except ImportError:
        return False
    return False


def _real_decode_image(data: bytes, n_features: int) -> np.ndarray:
    """Pillow decode → grayscale → bilinear downsample to n_features
    cells → [0,1] floats. Deterministic (no RNG, fixed resample)."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("L")
    side = int(np.ceil(np.sqrt(n_features)))
    arr = np.asarray(
        img.resize((side, side), Image.BILINEAR), dtype=np.float32
    ).reshape(-1) / 255.0
    return arr[:n_features]


def _real_decode_audio(data: bytes, n_features: int) -> np.ndarray:
    """soundfile decode → per-segment RMS energy over n_features equal
    slices. Deterministic."""
    import io

    import soundfile as sf

    samples, _rate = sf.read(io.BytesIO(data), dtype="float32", always_2d=True)
    mono = samples.mean(axis=1)
    if len(mono) == 0:
        return np.zeros(n_features, dtype=np.float32)
    segs = np.array_split(mono, n_features)
    return np.array(
        [float(np.sqrt(np.mean(s * s))) if len(s) else 0.0 for s in segs],
        dtype=np.float32,
    )


def _downsample_gray(arr: np.ndarray, n_features: int) -> np.ndarray:
    """Block-mean downsample a 2-D grayscale array to ~n_features cells
    (the Pillow-free analog of the image recipe). Deterministic."""
    side = int(np.ceil(np.sqrt(n_features)))
    h, w = arr.shape[:2]
    ys = np.array_split(np.arange(h), side)
    xs = np.array_split(np.arange(w), side)
    out = np.empty(side * side, dtype=np.float32)
    k = 0
    for yb in ys:
        for xb in xs:
            block = arr[yb[0]: yb[-1] + 1, xb[0]: xb[-1] + 1]
            out[k] = float(block.mean()) / 255.0 if block.size else 0.0
            k += 1
    return out[:n_features]


def _real_sample_frames(
    data: bytes, every_ms: int, n_features: int
) -> list[np.ndarray]:
    """Real video frame sampling via an importable ffmpeg binding —
    PyAV (in-memory demux) preferred, imageio-ffmpeg (temp-file +
    ffmpeg pipe) fallback. One grayscale block-mean feature vector per
    sampled timestamp (0, every_ms, 2·every_ms, … over the ACTUAL
    stream duration; always ≥1 frame). Deterministic: fixed sampling
    grid, no RNG."""
    import io

    try:
        import av

        frames: list[np.ndarray] = []
        with av.open(io.BytesIO(data)) as container:
            stream = container.streams.video[0]
            tb = float(stream.time_base) if stream.time_base else 0.0
            next_t = 0.0
            for frame in container.decode(stream):
                t_ms = (
                    float(frame.pts) * tb * 1000.0
                    if (frame.pts is not None and tb)
                    else next_t
                )
                if t_ms + 1e-6 >= next_t:
                    arr = frame.to_ndarray(format="gray").astype(np.float32)
                    frames.append(_downsample_gray(arr, n_features))
                    next_t += every_ms
        return frames
    except ImportError:
        pass

    import os
    import tempfile

    import imageio_ffmpeg

    fd, path = tempfile.mkstemp(suffix=".mp4")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        gen = imageio_ffmpeg.read_frames(path)
        meta = next(gen)
        fps = float(meta.get("fps") or 0.0) or 25.0
        w, h = meta["size"]
        step = max(int(round(fps * every_ms / 1000.0)), 1)
        frames = []
        for idx, buf in enumerate(gen):
            if idx % step == 0:
                arr = (
                    np.frombuffer(buf, dtype=np.uint8)
                    .reshape(h, w, 3)
                    .mean(axis=2)
                    .astype(np.float32)
                )
                frames.append(_downsample_gray(arr, n_features))
        return frames
    finally:
        os.unlink(path)


def _decode_one(data: bytes, mime: str, n_features: int, decode: str) -> np.ndarray:
    """Dispatch one payload. ``auto``: real kernel when the codec lib
    imports AND the mime family is supported, else the deterministic
    fake. ``strict``: real kernel or raise. ``fake``: always the
    stand-in."""
    if decode == "fake":
        return _fake_decode(data, n_features)
    kind = mime.split("/")[0] if mime else ""
    if kind == "image" and codec_available("image"):
        return _real_decode_image(data, n_features)
    if kind == "audio" and codec_available("audio"):
        return _real_decode_audio(data, n_features)
    if decode == "strict":
        raise NotImplementedError(
            f"real decode for mime {mime!r} requires codec libraries "
            "(Pillow for image/*, soundfile for audio/*) not importable "
            "in this environment; use decode='auto' (deterministic "
            "fallback) or decode='fake'"
        )
    return _fake_decode(data, n_features)


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    n_features: int = 16,
    decode: str = "fake",
) -> DataFrame:
    """[id, features: array<float>] via Arrow-batched mapInPandas.

    ``decode='auto'``: real decode (Pillow for image/*, soundfile for
    audio/*) wherever those libraries import on the executors,
    deterministic fake elsewhere. ``decode='strict'``: real decode or
    raise. ``decode='fake'``: always the deterministic stand-in (the
    plumbing-test mode)."""
    if decode not in ("fake", "strict", "auto"):
        raise ValueError(decode)
    src = df.select(
        F.col(id_col).alias("id"),
        F.col(media_col + ".data").alias("data"),
        F.col(media_col + ".mime").alias("mime"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_one(bytes(d), m, n_features, decode).tolist()
                for d, m in zip(pdf["data"], pdf["mime"])
            ]
            yield pd.DataFrame({"id": pdf["id"], "features": feats})

    out = src.mapInPandas(run, schema="id long, features array<float>")
    return out.withColumnRenamed("id", id_col)


def resize_images(
    df: DataFrame,
    media_col: str = "media",
    width: int = 224,
    height: int = 224,
    decode: str = "fake",
) -> DataFrame:
    """Image resize. With Pillow importable and ``decode='auto'`` /
    ``'strict'`` rows whose mime is ``image/*`` are REALLY decoded,
    resized (bilinear) and re-encoded as PNG, with the sha256 restamped
    over the new bytes (the materialization invariant follows the
    payload). Non-image rows always pass through unchanged (dims
    restamped only). ``'auto'`` additionally passes through rows whose
    payload fails to decode and whole executors where Pillow does not
    import; ``'strict'`` raises in both cases. ``'fake'`` (or 'auto'
    without Pillow anywhere) updates the declared dimensions only."""
    if decode not in ("fake", "strict", "auto"):
        raise ValueError(decode)
    if decode == "strict" and not codec_available("image"):
        raise NotImplementedError(
            "image resize requires Pillow, not importable in this "
            "environment; use decode='auto' (metadata-only fallback) "
            "or decode='fake'"
        )
    if decode in ("auto", "strict") and codec_available("image"):
        m = media_col
        other = [c for c in df.columns if c != m]
        src = df.select(*other, F.col(m + ".data").alias("_data"),
                        F.col(m + ".mime").alias("_mime"),
                        F.col(m + ".width").alias("_w"),
                        F.col(m + ".height").alias("_h"),
                        F.col(m + ".duration_ms").alias("_dur"))

        keep_cols = [
            c for c, _t in src.dtypes
            if c not in ("_data", "_mime", "_w", "_h")
        ]
        strict = decode == "strict"

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            try:
                from PIL import Image
            except ImportError:
                # the driver-side probe saw Pillow but this EXECUTOR
                # doesn't have it (mixed install) — 'auto' falls back to
                # payload passthrough; 'strict' keeps its contract
                if strict:
                    raise
                Image = None

            for pdf in batches:
                out_bytes, out_mime, out_w, out_h = [], [], [], []
                for d, mm, ow, oh in zip(
                    pdf["_data"], pdf["_mime"], pdf["_w"], pdf["_h"]
                ):
                    raw = bytes(d)
                    is_img = bool(mm) and mm.startswith("image/")
                    if Image is not None and is_img:
                        try:
                            img = Image.open(io.BytesIO(raw))
                            buf = io.BytesIO()
                            img.resize((width, height), Image.BILINEAR).save(buf, "PNG")
                            out_bytes.append(buf.getvalue())
                            out_mime.append("image/png")
                            out_w.append(width)
                            out_h.append(height)
                            continue
                        except Exception:
                            # corrupt/truncated payload: 'auto' passes
                            # the row through untouched, 'strict' fails
                            # the job rather than silently degrading
                            if strict:
                                raise
                    # non-image mime, missing codec, or auto-mode decode
                    # failure: FULL passthrough — bytes AND declared
                    # dims (stamping the target dims on a row that was
                    # not actually resized would make the metadata lie
                    # about the payload)
                    out_bytes.append(raw)
                    out_mime.append(mm)
                    out_w.append(ow)
                    out_h.append(oh)
                out = pdf[keep_cols].copy()
                out["_data"] = out_bytes
                out["_mime"] = out_mime
                out["_w"] = out_w
                out["_h"] = out_h
                yield out

        fields = ", ".join(
            f"{c} {t}" for c, t in src.dtypes
            if c not in ("_data", "_mime", "_w", "_h")
        )
        resized = src.mapInPandas(
            run, schema=f"{fields}, _data binary, _mime string, _w int, _h int"
        )
        return resized.withColumn(
            m,
            F.struct(
                F.col("_data").alias("data"),
                F.col("_mime").alias("mime"),
                F.col("_w").alias("width"),
                F.col("_h").alias("height"),
                F.col("_dur").alias("duration_ms"),
                F.sha2(F.col("_data"), 256).alias("sha256"),
            ),
        ).drop("_data", "_mime", "_w", "_h", "_dur")
    m = media_col
    # deterministic fake: restamp dims ONLY where a real resize would
    # have acted (image/* rows) — non-image rows pass through unchanged
    is_img = F.col(f"{m}.mime").startswith("image/")
    return df.withColumn(
        m,
        F.struct(
            F.col(f"{m}.data").alias("data"),
            F.col(f"{m}.mime").alias("mime"),
            F.when(is_img, F.lit(width)).otherwise(F.col(f"{m}.width"))
            .cast("int").alias("width"),
            F.when(is_img, F.lit(height)).otherwise(F.col(f"{m}.height"))
            .cast("int").alias("height"),
            F.col(f"{m}.duration_ms").alias("duration_ms"),
            F.col(f"{m}.sha256").alias("sha256"),
        ),
    )


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    every_ms: int = 1000,
    n_features: int = 8,
    decode: str = "fake",
) -> DataFrame:
    """Frame sampling for video: one feature row per sampled timestamp.

    ``decode='auto'``: REAL decode (PyAV or imageio-ffmpeg, whichever
    imports on the executor — ``_real_sample_frames``) sampling the
    actual stream every ``every_ms``; deterministic fallback where no
    binding imports or a payload fails to demux. ``decode='strict'``:
    real decode or raise (NotImplementedError where no binding is
    importable — e.g. this repo's CI container, whose test is
    skip-if). ``decode='fake'``: the deterministic stand-in — one row
    per metadata timestamp (duration_ms // every_ms rows, ≥1),
    features keyed by (payload sha, frame index); the explode/batch
    shape matches the real sampler."""
    if decode not in ("fake", "strict", "auto"):
        raise ValueError(decode)
    if decode == "strict" and not codec_available("video"):
        raise NotImplementedError(
            "video frame sampling requires an ffmpeg binding (PyAV or "
            "imageio-ffmpeg), neither importable in this environment; "
            "use decode='auto' (deterministic fallback) or decode='fake'"
        )
    src = df.select(
        F.col(id_col).alias("id"),
        F.col(media_col + ".data").alias("data"),
        F.coalesce(F.col(media_col + ".duration_ms"), F.lit(0)).alias("dur"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # re-probe per executor (driver probe can differ from worker
        # env — same contract as resize_images)
        real = decode in ("auto", "strict") and codec_available("video")
        for pdf in batches:
            ids, frames, feats = [], [], []
            for i, d, dur in zip(pdf["id"], pdf["data"], pdf["dur"]):
                payload = bytes(d)
                vecs = None
                if real:
                    try:
                        vecs = _real_sample_frames(payload, every_ms, n_features)
                    except Exception:
                        if decode == "strict":
                            raise
                        vecs = None  # undecodable payload → fallback
                if not vecs:
                    n = max(int(dur) // every_ms, 1)
                    vecs = [
                        _fake_decode(
                            payload + fidx.to_bytes(4, "big"), n_features
                        )
                        for fidx in range(n)
                    ]
                for fidx, vec in enumerate(vecs):
                    ids.append(i)
                    frames.append(fidx)
                    feats.append(vec.tolist())
            yield pd.DataFrame({"id": ids, "frame": frames, "features": feats})

    out = src.mapInPandas(run, schema="id long, frame int, features array<float>")
    return out.withColumnRenamed("id", id_col)
