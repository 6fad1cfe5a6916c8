"""Multimodal (image/audio/video) column plumbing
(SURVEY.md §2 Part C.5).

Design: media lives in opaque ``binary`` columns with a typed metadata
struct alongside (mime, n_bytes, sha256). Decode / feature-extraction
runs as Arrow-batched ``mapInPandas`` — the Spark-side contract
(schema, batch shape, partitioning) is real and tested; the actual
codec call is stubbed (``NotImplementedError``) because image/audio
libraries are not in this environment, with a deterministic fake
implementation for tests, per the build brief.

At scale the binary column rides the same parquet/shuffle machinery as
any other column; `spark.read.format("binaryFile")` or parquet with a
binary field are the ingestion paths. Keep media rows under the
parquet row-group target by storing large blobs chunked or by
reference (URI column) — metadata stays queryable either way.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id BIGINT, mime STRING, n_bytes INT, mean_byte DOUBLE, feature ARRAY<DOUBLE>"
)


def attach_binary_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", mime: str = "text/plain"
) -> DataFrame:
    """Opaque binary content column + typed metadata struct. (Test
    tables carry no real media; UTF-8 text bytes stand in — the
    plumbing is identical for image/audio bytes.)"""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        content.alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(content).alias("n_bytes"),
            F.sha2(content, 256).alias("sha256"),
        ).alias("meta"),
    )


def _decode_media(content: bytes, mime: str) -> Any:
    """Real codec hook — image/audio libs are not available here."""
    raise NotImplementedError(
        f"no codec for {mime!r} in this environment; pass fake=True for the "
        "deterministic test implementation"
    )


def extract_features(
    df: DataFrame, n_features: int = 8, fake: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    ``mapInPandas`` so each task pulls whole Arrow batches (not rows)
    into Python once; output schema is fixed so downstream plans stay
    columnar. ``fake=True`` computes deterministic pseudo-features from
    the raw bytes (mean byte value + byte-histogram buckets), which
    exercises the full batch path end-to-end."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            # Contract: NULL or zero-byte content produces NO feature
            # row — there is nothing to featurize, and a NULL payload
            # must not crash the whole Arrow batch (it did: frombuffer
            # raises on None, killing the task for every row sharing
            # the batch).
            mask = [c is not None and len(c) > 0 for c in pdf["content"]]
            pdf = pdf[mask]
            if len(pdf) == 0:
                continue
            if not fake:
                _decode_media(pdf["content"].iloc[0], pdf["meta"].iloc[0]["mime"])
            # Vectorized over the Arrow batch: the O(n_bytes) work
            # (histogram + mean) runs in numpy, never a per-row or
            # per-byte Python loop.
            arrs = [np.frombuffer(c, dtype=np.uint8) for c in pdf["content"]]
            n_bytes = np.fromiter((a.size for a in arrs), dtype=np.int64, count=len(arrs))
            totals = np.maximum(n_bytes, 1).astype(np.float64)
            sums = np.fromiter(
                (int(a.sum()) for a in arrs), dtype=np.int64, count=len(arrs)
            )
            hists = np.stack(
                [np.bincount(a % n_features, minlength=n_features) for a in arrs]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": n_bytes.astype(np.int32),
                    "mean_byte": sums / totals,
                    "feature": (hists / totals[:, None]).tolist(),
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id BIGINT, frame_idx INT, frame BINARY"


def sample_frames(
    df: DataFrame, frame_size: int = 64, every_k: int = 4, fake: bool = False
) -> DataFrame:
    """C5b: fixed-rate frame sampling over binary media — the video
    analog of chunking (one input row -> many frame rows).

    Real path: container demux + keyframe seek (stubbed, no codecs in
    this environment). Fake path: fixed-size byte windows stand in for
    decoded frames, keeping every ``every_k``-th window — identical
    schema, explode shape, and Arrow batch mechanics. ``frame_idx`` is
    the index within the *sampled* sequence.

    ``mapInPandas`` (not a scalar UDF) because the operator is
    one-to-many: each task turns its Arrow batch into a frame batch
    without ever materializing all frames driver-side. The inner loop
    is per-frame (bounded by output size), never per-byte — slicing is
    zero-copy on the numpy buffer.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not fake:
                _decode_media(pdf["content"].iloc[0], pdf["meta"].iloc[0]["mime"])
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                if content is None:
                    continue  # NULL media: no frames (same as 0 bytes)
                buf = np.frombuffer(content, dtype=np.uint8)
                n_frames = (buf.size + frame_size - 1) // frame_size
                for i in range(0, n_frames, every_k):
                    ids.append(doc_id)
                    idxs.append(i // every_k)
                    frames.append(buf[i * frame_size : (i + 1) * frame_size].tobytes())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, FRAME_SCHEMA)


RESIZE_SCHEMA = "doc_id BIGINT, mime STRING, orig_bytes INT, resized BINARY"


def resize_media(df: DataFrame, factor: int = 4, fake: bool = False) -> DataFrame:
    """C5c: media downsampling behind the same codec boundary.

    Real path: decode -> interpolate -> re-encode (stubbed). Fake
    path: keep every ``factor``-th byte — the 1-D analog of
    nearest-neighbor image downsampling, fully vectorized as a numpy
    stride per row. Output stays a ``binary`` column so downstream
    operators (feature extraction, frame sampling) compose unchanged.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not fake:
                _decode_media(pdf["content"].iloc[0], pdf["meta"].iloc[0]["mime"])
            # Contract: a NULL payload keeps its row (resize is 1:1 —
            # callers join on doc_id) with NULL size/output, instead of
            # crashing the batch.
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "orig_bytes": [
                        len(c) if c is not None else None
                        for c in pdf["content"]
                    ],
                    "resized": [
                        np.frombuffer(c, dtype=np.uint8)[::factor].tobytes()
                        if c is not None
                        else None
                        for c in pdf["content"]
                    ],
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)
