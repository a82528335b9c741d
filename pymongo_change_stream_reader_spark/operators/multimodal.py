"""Multimodal columns: opaque binary payloads with typed metadata.

Pattern (for image/audio/video at 100 TB): the payload travels as a
``binary`` column next to a metadata struct; decode / feature-extract
/ resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so
the heavy per-item work is vectorized Python over columnar batches,
while everything around it (filter, join, partition) stays JVM-side.

``decode_image``/``decode_audio`` are REAL implementations gated on
their codec libraries (pillow / soundfile — not bundled in this
environment, so they raise a NotImplementedError pointing at
RUNBOOK.md §3 and the named gated tests until the libs are installed);
``extract_features``/``audio_window_features`` are the dependency-free
deterministic decoders that exercise the identical plumbing (schema,
batching, Arrow transfer) end-to-end in any environment.
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


def decode_image(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Real image decode via PIL over Arrow-batched mapInPandas:
    (width, height, mode, per-channel mean pixel) per payload;
    undecodable payloads yield null fields rather than failing the
    task (a corpus always contains corrupt blobs).

    ENV-GATED on pillow — absent here (RUNBOOK.md §3;
    tests/test_integration_gated.py::test_decode_image_real runs when
    it is installed).  Same schema/batch contract as
    :func:`extract_features`, so the plumbing is tested either way."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires pillow on the executors — "
            "`pip install pillow` on every node, then run "
            "tests/test_integration_gated.py::test_decode_image_real "
            "(RUNBOOK.md §3)"
        ) from exc

    out_schema = (
        f"{id_col} LONG, width INT, height INT, mode STRING, "
        "mean_pixel ARRAY<DOUBLE>"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as np
        from PIL import Image

        cols = [id_col, "width", "height", "mode", "mean_pixel"]
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    img = Image.open(io.BytesIO(data))
                    img.load()
                    arr = np.asarray(img, dtype=np.float64)
                    if arr.ndim == 2:
                        arr = arr[:, :, None]
                    rows.append(
                        {
                            id_col: doc_id,
                            "width": img.width,
                            "height": img.height,
                            "mode": img.mode,
                            "mean_pixel": [
                                round(float(m), 6)
                                for m in arr.mean(axis=(0, 1))
                            ],
                        }
                    )
                except Exception:
                    rows.append(
                        {
                            id_col: doc_id,
                            "width": None,
                            "height": None,
                            "mode": None,
                            "mean_pixel": None,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def decode_audio(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    window: int = 1024,
    max_windows: int = 16,
) -> DataFrame:
    """Real audio decode via soundfile over Arrow-batched mapInPandas:
    (sample_rate, n_frames, n_channels, per-window RMS) per payload;
    undecodable payloads yield null fields.

    ENV-GATED on soundfile — absent here (RUNBOOK.md §3;
    tests/test_integration_gated.py::test_decode_audio_real runs when
    it is installed).  :func:`audio_window_features` is the
    dependency-free proxy with the identical Spark plumbing."""
    try:
        import soundfile  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "audio decode requires soundfile on the executors — "
            "`pip install soundfile` on every node, then run "
            "tests/test_integration_gated.py::test_decode_audio_real "
            "(RUNBOOK.md §3)"
        ) from exc

    out_schema = (
        f"{id_col} LONG, sample_rate INT, n_frames LONG, n_channels INT, "
        "rms ARRAY<DOUBLE>"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as np
        import soundfile as sf

        cols = [id_col, "sample_rate", "n_frames", "n_channels", "rms"]
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    wave, rate = sf.read(io.BytesIO(data), dtype="float64")
                    if wave.ndim == 1:
                        wave = wave[:, None]
                    mono = wave.mean(axis=1)
                    n_win = min(len(mono) // window, max_windows)
                    rms = [
                        round(
                            float(
                                np.sqrt(
                                    np.mean(
                                        mono[w * window : (w + 1) * window]
                                        ** 2
                                    )
                                )
                            ),
                            6,
                        )
                        for w in range(n_win)
                    ]
                    rows.append(
                        {
                            id_col: doc_id,
                            "sample_rate": int(rate),
                            "n_frames": int(wave.shape[0]),
                            "n_channels": int(wave.shape[1]),
                            "rms": rms,
                        }
                    )
                except Exception:
                    rows.append(
                        {
                            id_col: doc_id,
                            "sample_rate": None,
                            "n_frames": None,
                            "n_channels": None,
                            "rms": None,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


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
