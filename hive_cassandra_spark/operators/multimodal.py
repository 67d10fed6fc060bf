"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(SURVEY.md §2.C).

Design: the payload is a ``BinaryType`` column; metadata is a typed struct
alongside it. Heavy per-item work (decode, feature-extract, resize,
frame-sample) runs as Arrow-batched ``mapInPandas`` so each Python worker
sees a whole batch — the only sane shape for 100 TB of blobs. Real codec
libraries (PIL/ffmpeg/librosa) are NOT in this container, so the decode
kernels are stubbed: ``fake=True`` uses a deterministic byte-level fake
(real schema, real partitioning, real batch plumbing — fake pixels);
``fake=False`` raises NotImplementedError at the exact point the real
library call belongs.

The binary type itself mirrors the reference's binary cells incl. their
Base64 sniff (CassandraLazyBinary.java:26-51 → codecs.decode_binary).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_BINS = 16

META_SCHEMA = "struct<format:string,width:int,height:int,n_frames:int>"


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary payload + metadata struct from the
    documents fixture (deterministic: payload = utf-8 bytes of the text;
    metadata derived from the id). Stands in for reading real blobs."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            (F.pmod(F.col(id_col), F.lit(64)) + 16).cast("int").alias("width"),
            (F.pmod(F.col(id_col), F.lit(48)) + 16).cast("int").alias("height"),
            (F.pmod(F.col(id_col), F.lit(10)) + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def payload_stats(df: DataFrame, keep_payload: bool = False) -> DataFrame:
    """Cheap JVM-side metadata over binary payloads: byte length + sha256.
    No Python boundary — this is the 'is the blob intact' scan you run
    before spending decode cycles. ``keep_payload`` retains the payload
    column for a downstream decode stage in the same pipeline."""
    cols = [
        F.col("doc_id"),
        F.length(F.col("payload")).alias("payload_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    ]
    if keep_payload:
        cols.append(F.col("payload"))
    return df.select(*cols)


def extract_features(
    df: DataFrame, fake: bool = True, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Decode + feature-extract each payload → fixed-size float vector.

    ``mapInPandas``: one Arrow batch in, one out; the UDF never sees a
    Python object per row for the hot fields. Fake kernel = normalized
    16-bin byte histogram (deterministic); real kernel = decode via
    PIL/ffmpeg then embed — stubbed.

    ``passthrough`` columns are forwarded through the Arrow batch unchanged
    (same batch, no rejoin) so metadata computed upstream doesn't force a
    doc_id shuffle to reattach later.
    """
    keep = list(passthrough)
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(
        ["doc_id long"]
        + [f"{c} {by_name[c]}" for c in keep]
        + ["features array<double>"]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image/audio decode needs PIL/ffmpeg — not in this "
                    "container; run with fake=True for the plumbing path"
                )
            feats = []
            for buf in pdf["payload"]:
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=FEATURE_BINS).astype("float64")
                total = hist.sum()
                feats.append((hist / total if total else hist).round(6).tolist())
            out = {"doc_id": pdf["doc_id"]}
            out.update({c: pdf[c] for c in keep})
            out["features"] = feats
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema=out_schema)


def _meta_dict(meta) -> dict:
    """Arrow hands a struct column to pandas as a dict (or Row-like)."""
    if isinstance(meta, dict):
        return meta
    return meta.asDict() if hasattr(meta, "asDict") else dict(meta)


def _nn_resize_raw(buf: bytes, src_w: int, src_h: int, dst_w: int, dst_h: int) -> bytes:
    """Nearest-neighbor resample of a raw row-major single-channel byte
    image — pure numpy fancy indexing, no codec library needed."""
    size = src_w * src_h
    arr = np.frombuffer(
        bytes(buf)[:size].ljust(size, b"\x00"), dtype=np.uint8
    ).reshape(src_h, src_w)
    rows = np.arange(dst_h) * src_h // dst_h
    cols = np.arange(dst_w) * src_w // dst_w
    return arr[rows][:, cols].tobytes()


def resize(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize each payload to width x height.

    ``fake=True``: deterministic truncate/pad (schema + batch-shape
    exercise). ``fake=False``: REAL kernel for the ``raw`` format — the
    payload is interpreted as a meta.width x meta.height single-channel
    byte image and nearest-neighbor-resampled in pure numpy (requires the
    ``meta`` struct column from attach_payload). Non-raw formats (real
    JPEG/PNG) still need PIL, which is absent from this container —
    stubbed with NotImplementedError at that exact branch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = width * height
        for pdf in batches:
            if fake:
                out = [
                    bytes(buf)[:size].ljust(size, b"\x00") for buf in pdf["payload"]
                ]
            else:
                out = []
                for buf, meta in zip(pdf["payload"], pdf["meta"]):
                    m = _meta_dict(meta)
                    if not str(m.get("format", "")).endswith("raw"):
                        raise NotImplementedError(
                            f"resize of format {m.get('format')!r} needs PIL — stubbed"
                        )
                    out.append(
                        _nn_resize_raw(buf, int(m["width"]), int(m["height"]), width, height)
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})

    return df.mapInPandas(kernel, schema="doc_id long, payload binary")


def frame_sample(df: DataFrame, n_frames: int = 3, fake: bool = True) -> DataFrame:
    """Sample n frames per 'video' payload → one output row per frame
    (explode-shaped mapInPandas).

    ``fake=True``: frame = deterministic byte slice. ``fake=False``: REAL
    kernel for the ``raw`` format — the payload is a sequence of
    meta.width x meta.height byte frames; n_frames are sampled at evenly
    spaced frame indices (requires the ``meta`` struct column). Container
    formats (MP4 etc.) still need ffmpeg — stubbed at that branch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, idxs = [], [], []
            if fake:
                for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                    raw = bytes(buf)
                    step = max(len(raw) // n_frames, 1)
                    for i in range(n_frames):
                        ids.append(doc_id)
                        idxs.append(i)
                        frames.append(raw[i * step : i * step + step])
            else:
                for doc_id, buf, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                    m = _meta_dict(meta)
                    if not str(m.get("format", "")).endswith("raw"):
                        raise NotImplementedError(
                            f"frame extraction from {m.get('format')!r} needs "
                            "ffmpeg — stubbed"
                        )
                    raw = bytes(buf)
                    frame_size = max(int(m["width"]) * int(m["height"]), 1)
                    total = max(len(raw) // frame_size, 1)
                    for i in range(n_frames):
                        src = i * total // n_frames  # evenly spaced frame index
                        chunk = raw[src * frame_size : (src + 1) * frame_size]
                        ids.append(doc_id)
                        idxs.append(i)
                        frames.append(chunk.ljust(frame_size, b"\x00"))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(kernel, schema="doc_id long, frame_idx int, frame binary")
