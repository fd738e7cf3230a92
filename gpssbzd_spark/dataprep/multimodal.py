"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata structs.

Decode kernels come in three flavors, selected by ``decode=``:

- ``"fake"`` — deterministic pseudo-kernels derived from the bytes
  (sha256-folded features, seeded thumbnail bytes), so partitioning,
  schema, UDF signatures and Arrow batch shapes are real and tested
  end-to-end with zero native dependencies;
- ``"real"`` — real decoders per kind: images via Pillow
  (IMPORT-GUARDED — a missing Pillow raises ``NotImplementedError``
  naming the dependency; this container ships no Pillow/ffmpeg, so the
  image path is exercised by tests/test_dataprep.py only where PIL
  imports, and the stub contract is asserted where it doesn't), audio
  via the stdlib ``wave`` module + numpy (ALWAYS available — WAV
  header + PCM statistics need no native deps, so the audio real path
  runs and is tested in this container), video stubbed (no ffmpeg;
  frame sampling stays metadata-driven, :func:`sample_frames`);
- ``"auto"`` — per kind: images ``real`` iff Pillow is importable else
  ``fake``; audio always ``real`` (stdlib); video ``fake``.

The Spark-side plumbing — ``mapInPandas`` batch iteration, Arrow
transfer of binary columns, metadata struct schemas, partition-count
invariance — is the part this engine owns and tests everywhere.
"""

from __future__ import annotations

import hashlib
import importlib.util
import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _pil_available() -> bool:
    return importlib.util.find_spec("PIL") is not None


def _resolve_decode(decode: str, feature: str) -> str:
    """``auto`` → real iff Pillow importable; validate the flag."""
    assert decode in ("fake", "real", "auto"), decode
    if decode == "auto":
        return "real" if _pil_available() else "fake"
    if decode == "real" and not _pil_available():
        raise NotImplementedError(
            f"real {feature} needs Pillow (pip install Pillow); not "
            "available in this environment — decode='fake' runs the same "
            "plumbing with a deterministic stub kernel, decode='auto' "
            "falls back automatically"
        )
    return decode

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),  # image|audio|video
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

_FEATURE_DIM = 8

_META_FIELDS = ["kind", "mime", "width", "height", "duration_ms"]


def _meta_frame(meta_col: pd.Series) -> pd.DataFrame:
    """Meta structs → DataFrame, tolerating NULL structs (schema-legal:
    meta is nullable). ``pd.DataFrame(list(...))`` raises on a None
    element, and an all-None batch would lose the columns — substitute
    empty dicts and pin the column set."""
    return pd.DataFrame([(m if m is not None else {}) for m in meta_col]).reindex(
        columns=_META_FIELDS
    )

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, feature array<double>"
)


def media_from_binary(
    df: DataFrame, id_col: str, content_col: str, kind: str, mime: str
) -> DataFrame:
    """Wrap an arbitrary binary column into the engine's media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(content_col).cast("binary").alias("content"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_features(content: bytes) -> list[float]:
    """Deterministic stand-in for a decode+embed kernel: sha256 of the
    bytes, folded into _FEATURE_DIM floats in [0, 1)."""
    digest = hashlib.sha256(content or b"").digest()
    arr = np.frombuffer(digest, dtype=np.uint32)[:_FEATURE_DIM]
    return (arr / np.float64(2**32)).tolist()


def _real_features(content: bytes | None) -> list[float]:
    """Pillow-backed image features: (width, height, n_channels, mean
    and std of grayscale intensity in [0,1], aspect ratio), zero-padded
    to _FEATURE_DIM. Undecodable bytes degrade to the all-zero vector
    per-row (never fail the batch — one corrupt blob must not kill a
    100 TB scan)."""
    from PIL import Image

    if not content:
        return [0.0] * _FEATURE_DIM
    try:
        img = Image.open(io.BytesIO(content))
        img.load()
    except Exception:
        return [0.0] * _FEATURE_DIM
    arr = np.asarray(img.convert("L"), dtype=np.float64) / 255.0
    n_channels = len(img.getbands())
    feats = [
        float(img.width),
        float(img.height),
        float(n_channels),
        float(arr.mean()),
        float(arr.std()),
        float(img.width) / float(img.height) if img.height else 0.0,
    ]
    return (feats + [0.0] * _FEATURE_DIM)[:_FEATURE_DIM]


def _real_audio_features(content: bytes | None) -> list[float]:
    """Stdlib-``wave``-backed WAV features: (duration_ms, channels,
    framerate, sample_width, RMS and peak of PCM amplitude normalized
    to [0,1]), zero-padded to _FEATURE_DIM. No native deps — unlike the
    Pillow image path this real decoder always runs. Undecodable bytes
    degrade to the all-zero vector per-row (one corrupt blob must not
    kill a 100 TB scan), matching :func:`_real_features`."""
    import wave

    if not content:
        return [0.0] * _FEATURE_DIM
    try:
        r = wave.open(io.BytesIO(content), "rb")
        nch, sw = r.getnchannels(), r.getsampwidth()
        rate, nf = r.getframerate(), r.getnframes()
        raw = r.readframes(nf)
    except Exception:
        return [0.0] * _FEATURE_DIM
    dur_ms = 1000.0 * nf / rate if rate else 0.0
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None or not raw:
        rms = peak = 0.0
    else:
        pcm = np.frombuffer(raw, dtype=dtype).astype(np.float64)
        if sw == 1:  # 8-bit WAV is unsigned, centered at 128
            pcm -= 128.0
        scale = float(2 ** (8 * sw - 1))
        rms = float(np.sqrt(np.mean(pcm * pcm)) / scale)
        peak = float(np.max(np.abs(pcm)) / scale)
    feats = [dur_ms, float(nch), float(rate), float(sw), rms, peak]
    return (feats + [0.0] * _FEATURE_DIM)[:_FEATURE_DIM]


def extract_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """media df → (media_id, kind, n_bytes, feature array<double>).

    ``mapInPandas`` so one Arrow batch of binary blobs is decoded per
    iteration — the real decoders and the deterministic stub share the
    same kernel seam, dispatched per ``meta.kind`` (module docstring:
    image → Pillow, audio → stdlib wave, video/unknown → stub). Batch
    size is governed by spark.sql.execution.arrow.maxRecordsPerBatch;
    with real media blobs, lower it so a batch of decoded frames fits
    executor memory.
    """
    assert decode in ("fake", "real", "auto"), decode
    if decode == "real" and not _pil_available():
        # strict contract preserved: real demands every real kernel,
        # and the image one needs Pillow
        _resolve_decode("real", "media decode")
    real_image = decode == "real" or (decode == "auto" and _pil_available())
    real_audio = decode in ("real", "auto")
    img_kernel = _real_features if real_image else _fake_features
    audio_kernel = _real_audio_features if real_audio else _fake_features

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = _meta_frame(pdf["meta"])
            is_audio = (meta["kind"] == "audio").to_numpy()
            feature = pd.Series(index=pdf.index, dtype=object)
            feature[is_audio] = pdf["content"][is_audio].map(audio_kernel)
            feature[~is_audio] = pdf["content"][~is_audio].map(img_kernel)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": meta["kind"],
                    "n_bytes": pdf["content"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "feature": feature,
                }
            )

    return df.mapInPandas(batches, FEATURES_SCHEMA)


def resize_images(
    df: DataFrame, width: int, height: int, decode: str = "fake"
) -> DataFrame:
    """Resize image rows to ``width × height``, preserving the media
    schema (content replaced, meta.width/height updated).

    Same plumbing contract as :func:`extract_features`: ``mapInPandas``
    streams Arrow batches of binary blobs through the kernel. The
    ``real`` kernel is Pillow (decode → LANCZOS resize → re-encode PNG;
    undecodable blobs pass through unchanged rather than failing the
    batch); the ``fake`` kernel is a deterministic byte transform
    (sha256-seeded bytes of length width·height÷64, stand-in for a
    re-encoded thumbnail) so output sizes, schema, and batch shapes are
    real without native deps. Non-image rows pass through untouched.
    """
    decode = _resolve_decode(decode, "image resize")
    n_out = max(1, width * height // 64)

    def fake_resize(b: bytes | None) -> bytes | None:
        if b is None:
            return None
        seed = hashlib.sha256(b).digest()
        reps = -(-n_out // len(seed))  # ceil
        return (seed * reps)[:n_out]

    def real_resize(b: bytes | None) -> tuple[bytes | None, bool]:
        """→ (bytes, re-encoded?). Undecodable blobs pass through
        UNCHANGED with re-encoded=False so one corrupt row cannot fail
        the batch — and so their metadata is left alone below."""
        from PIL import Image

        if b is None:
            return None, False
        try:
            img = Image.open(io.BytesIO(b))
            img.load()
        except Exception:
            return b, False
        out = io.BytesIO()
        img.resize((width, height), Image.LANCZOS).save(out, format="PNG")
        return out.getvalue(), True

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = _meta_frame(pdf["meta"])
            is_img = meta["kind"] == "image"
            if decode == "real":
                # retag meta ONLY for rows the kernel actually
                # re-encoded: a passed-through JPEG keeping its
                # original bytes must keep its original mime/dims —
                # PNG bytes get mime='image/png' (ADVICE r4: the old
                # code retagged dims but left mime at the source
                # value, producing genuinely mislabeled media)
                res = pdf["content"].map(real_resize)
                content = pdf["content"].where(
                    ~is_img.values, res.map(lambda t: t[0])
                )
                ok = (is_img & res.map(lambda t: t[1]).astype(bool)).values
                meta.loc[ok, "width"] = width
                meta.loc[ok, "height"] = height
                meta.loc[ok, "mime"] = "image/png"
            else:
                # fake kernel: bytes are a deterministic stand-in, not
                # a PNG — mime keeps the source value BY DESIGN (the
                # stub mimics re-encoding shape, not format), dims
                # retag for every image row as the real kernel would
                # on a fully decodable batch
                content = pdf["content"].where(
                    ~is_img.values, pdf["content"].map(fake_resize)
                )
                meta.loc[is_img, "width"] = width
                meta.loc[is_img, "height"] = height
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": content,
                    "meta": meta.to_dict("records"),
                }
            )

    return df.mapInPandas(batches, MEDIA_SCHEMA)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling plan for video rows: explodes per-frame timestamps
    from metadata (native sequence — the decode of each frame would slot
    into extract_features). Rows without a duration, or with a corrupt
    NEGATIVE duration, produce no frames — an unguarded negative bound
    would crash the whole scan (``sequence(0, -n)`` throws), turning one
    bad-metadata row into a failed 100 TB job."""
    ts = F.sequence(
        F.lit(0),
        F.least(
            F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
            F.lit(every_ms * (max_frames - 1)),
        ),
        F.lit(every_ms),
    )
    return (
        df.filter(F.col("meta.kind") == "video")
        .filter(F.col("meta.duration_ms") >= 0)
        .select("media_id", F.explode(ts).alias("frame_ms"))
    )
