"""Multimodal columns: opaque binary payloads with typed metadata.

Pattern (for image/audio/video at 100 TB): the payload travels as a
``binary`` column next to a metadata struct; decode / feature-extract
/ resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so
the heavy per-item work is vectorized Python over columnar batches,
while everything around it (filter, join, partition) stays JVM-side.

The actual image/audio codecs are not available in this environment,
so ``decode_image``/``decode_audio`` raise ``NotImplementedError``
behind an import-try, and ``extract_features`` ships a deterministic
byte-histogram "decoder" that exercises the real plumbing (schema,
batching, Arrow transfer) end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

MULTIMODAL_META = (
    "mime STRING, n_bytes INT, width INT, height INT, sample_rate INT"
)


def with_binary_payload(
    df: DataFrame, source_col: str, mime: str = "application/octet-stream"
) -> DataFrame:
    """Attach (payload BINARY, meta STRUCT) columns.  In production the
    payload comes off object storage; here it derives from a text
    column so the plumbing is testable at any scale factor."""
    payload = F.col(source_col).cast("binary")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode (resize, pixel stats).  STUB: the imaging
    stack (PIL/opencv) is not bundled in this environment."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires pillow/opencv on the executors; "
            "install and swap the byte-histogram extractor in "
            "extract_features for PIL.Image.open"
        ) from exc
    raise NotImplementedError("wire the PIL decode path here")


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real audio decode (PCM frames, sample-rate resample).  STUB:
    the audio stack (soundfile/librosa) is not bundled in this
    environment — the deterministic waveform proxy below
    (:func:`audio_window_features`) exercises the identical Spark
    plumbing."""
    try:
        import soundfile  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "audio decode requires soundfile/librosa on the executors; "
            "install and swap audio_window_features' int8-waveform "
            "proxy for soundfile.read"
        ) from exc
    raise NotImplementedError("wire the soundfile decode path here")


def audio_window_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    window: int = 64,
    max_windows: int = 8,
) -> DataFrame:
    """Deterministic audio-feature extraction over binary payloads via
    mapInPandas: interpret the bytes as an int8 waveform and emit
    per-window RMS energy + zero-crossing rate — the stand-in for a
    real PCM decode + framing pipeline (same schema/batch shape a
    librosa-backed version would produce).

    Scale: identical contract to :func:`extract_features` — Arrow
    column batches, no per-row Python calls into the JVM, decode
    parallelism = partition count."""
    out_schema = (
        f"{id_col} LONG, n_windows INT, rms ARRAY<DOUBLE>, zcr ARRAY<DOUBLE>"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                wave = np.frombuffer(data, dtype=np.int8).astype(np.float64)
                n_win = min(len(wave) // window, max_windows)
                rms, zcr = [], []
                for w in range(n_win):
                    seg = wave[w * window : (w + 1) * window]
                    rms.append(round(float(np.sqrt(np.mean(seg**2))), 6))
                    signs = np.signbit(seg)
                    zcr.append(
                        round(float(np.mean(signs[1:] != signs[:-1])), 6)
                    )
                rows.append(
                    {
                        id_col: doc_id,
                        "n_windows": n_win,
                        "rms": rms,
                        "zcr": zcr,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "n_windows", "rms", "zcr"]
            )

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def extract_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic feature extraction over binary payloads via
    mapInPandas (Arrow-batched): an 8-bucket byte histogram normalized
    to frequencies — the stand-in for an image/audio embedding model.

    Scale: mapInPandas streams column batches; no per-row Python, no
    shuffle; partition count controls decode parallelism."""
    out_schema = f"{id_col} LONG, n_bytes INT, features ARRAY<DOUBLE>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if data:
                    arr = np.frombuffer(data, dtype=np.uint8) % FEATURE_DIM
                    hist = np.bincount(arr, minlength=FEATURE_DIM)
                else:
                    hist = np.zeros(FEATURE_DIM, dtype=np.int64)
                total = max(len(data), 1)
                rows.append(
                    {
                        id_col: doc_id,
                        "n_bytes": len(data),
                        "features": [round(float(h) / total, 6) for h in hist],
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "n_bytes", "features"])

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def resize_payload(
    df: DataFrame,
    target_bytes: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize plumbing: deterministic nearest-neighbor byte resample
    of each payload to ``target_bytes`` via mapInPandas — the stand-in
    for an image resize (a PIL-backed version swaps only the per-item
    function; schema, batching, and Arrow transfer are identical).

    Scale: same contract as :func:`extract_features` — streaming
    column batches, no per-row JVM crossings."""
    if target_bytes < 1:
        raise ValueError("target_bytes must be >= 1")
    out_schema = f"{id_col} LONG, n_bytes INT, resized BINARY"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if data:
                    src = np.frombuffer(data, dtype=np.uint8)
                    # nearest-neighbor index map (what a 1-D image
                    # resize does per axis)
                    idx = np.floor(
                        np.arange(target_bytes) * (len(src) / target_bytes)
                    ).astype(np.int64)
                    resized = src[idx].tobytes()
                else:
                    resized = b"\x00" * target_bytes
                rows.append(
                    {id_col: doc_id, "n_bytes": len(data), "resized": resized}
                )
            yield pd.DataFrame(rows, columns=[id_col, "n_bytes", "resized"])

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Video frame-sampling plumbing: plan which frames to decode
    (every_n-th) without touching the payload — pure metadata op that
    prunes decode work before the expensive stage."""
    n_frames = F.coalesce(F.col("meta.n_bytes"), F.lit(0)) / 100  # fake fps proxy
    return df.select(
        id_col,
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(n_frames.cast("int") - 1, F.lit(0)), F.lit(every_n)
            )
        ).alias("frame_idx"),
    )
