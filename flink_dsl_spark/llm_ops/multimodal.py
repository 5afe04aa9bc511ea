"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic STUB (metadata derived arithmetically from
the byte stream) — but the Spark-side plumbing is real and is what
matters at 100 TB: binary columns travel as Arrow buffers, mapInPandas
processes them in columnar batches, output schema is declared up front,
and partitioning is preserved (no shuffle added by the decode).

Swap ``_fake_decode``/``_fake_frames`` for PIL/ffmpeg calls when codecs
are available; nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = ("id long, byte_len long, format string, width int, "
                 "height int, channels int")

FRAME_SCHEMA = "id long, n_frames int, frame_offsets array<long>"

#: probed at import: when PIL is installed the decode/resize paths use
#: real codecs; otherwise the deterministic stubs run (the container
#: ships none — re-checked every round per the build plan)
try:                                    # pragma: no cover - env dependent
    from PIL import Image as _PILImage
    REAL_CODECS_AVAILABLE = True
except ImportError:
    _PILImage = None
    REAL_CODECS_AVAILABLE = False


def with_binary_column(df: DataFrame, text_col: str, id_col: str,
                       out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary payload column (here: utf-8 bytes of
    the text — stands in for image/audio bytes, which would come from
    ``spark.read.format('binaryFile')`` in production)."""
    return df.select(F.col(id_col).alias("id"),
                     F.encode(F.col(text_col), "utf-8").alias(out_col))


def _fake_decode(payload: bytes) -> tuple:
    """STUB decoder: deterministic metadata from the byte stream.
    Replace with PIL.Image.open(io.BytesIO(payload)) when available."""
    n = len(payload)
    fmt = ("jpeg", "png", "webp")[n % 3]
    return n, fmt, n % 640 + 1, n % 480 + 1, 3


def decode_metadata(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "id") -> DataFrame:
    """Decode image metadata in Arrow batches via mapInPandas.  The UDF
    sees pandas chunks (zero row-at-a-time Python); schema is declared so
    Catalyst can prune/push around it."""
    import pandas as pd

    def decode_one(b: bytes) -> tuple:
        if REAL_CODECS_AVAILABLE:       # pragma: no cover - env dependent
            import io
            try:
                with _PILImage.open(io.BytesIO(b)) as im:
                    return (len(b), (im.format or "raw").lower(),
                            im.width, im.height, len(im.getbands()))
            except Exception:
                pass                    # non-image payload: stub metadata
        return _fake_decode(b)

    def decode_batches(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            meta = [decode_one(bytes(p)) for p in payloads]
            yield pd.DataFrame({
                "id": pdf[id_col].values,
                "byte_len": [m[0] for m in meta],
                "format": [m[1] for m in meta],
                "width": [m[2] for m in meta],
                "height": [m[3] for m in meta],
                "channels": [m[4] for m in meta],
            })

    return df.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = "id long, width int, height int, payload binary"


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload",
                  id_col: str = "id") -> DataFrame:
    """Image resize to ``width x height`` RGB raw bytes.  With PIL
    present, payloads decode and resample for real (bilinear); without
    codecs — or for undecodable payloads — a STUB tiles/truncates the
    source bytes to exactly ``width * height * 3``.  Either way the
    Spark shape is the production one: binary in, binary out, Arrow
    batches, no shuffle — a resize never moves a row off its
    partition."""
    import pandas as pd

    target = width * height * 3

    def resize_one(b: bytes) -> bytes:
        if REAL_CODECS_AVAILABLE:       # pragma: no cover - env dependent
            import io
            try:
                with _PILImage.open(io.BytesIO(b)) as im:
                    return im.convert("RGB") \
                             .resize((width, height),
                                     _PILImage.BILINEAR).tobytes()
            except Exception:
                pass                    # non-image payload: stub tiling
        if not b:
            b = b"\x00"
        reps = target // len(b) + 1
        return (b * reps)[:target]

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "id": pdf[id_col].values,
                "width": width, "height": height,
                "payload": [resize_one(bytes(p))
                            for p in pdf[payload_col]],
            })

    return df.mapInPandas(resize, schema=RESIZE_SCHEMA)


def extract_features(df: DataFrame, dim: int = 64,
                     payload_col: str = "payload",
                     id_col: str = "id") -> DataFrame:
    """Feature extraction over binary payloads: an L1-normalized folded
    byte histogram (256 bins folded to ``dim``) — unlike the codec
    stubs this is a REAL, deterministic featurizer, vectorized with
    numpy over Arrow batches (one bincount per row, no Python
    byte loops).  Output (id, features array<double>) feeds directly
    into the ANN/embedding-dedup operators."""
    import numpy as np
    import pandas as pd

    if 256 % dim != 0:
        raise ValueError("dim must divide 256")
    fold = 256 // dim

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for p in pdf[payload_col]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(arr, minlength=256).astype("float64")
                folded = hist.reshape(dim, fold).sum(axis=1)
                total = folded.sum()
                vecs.append((folded / total if total else folded).tolist())
            yield pd.DataFrame({"id": pdf[id_col].values,
                                "features": vecs})

    return df.mapInPandas(feats,
                          schema="id long, features array<double>")


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "id", every_n_bytes: int = 4096) \
        -> DataFrame:
    """STUB video frame sampler: one "frame" offset per ``every_n_bytes``
    of payload (replace with ffmpeg keyframe extraction).  Demonstrates
    the batch shape for frame-sampling at scale: array output column,
    no shuffle, Arrow both ways."""
    import pandas as pd

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # video keyframes need ffmpeg/av (PIL is stills-only); the byte
        # stride stands in until a video backend ships in the container
        for pdf in batches:
            lens = pdf[payload_col].map(len)
            offsets = [list(range(0, int(ln), every_n_bytes))
                       for ln in lens]
            yield pd.DataFrame({
                "id": pdf[id_col].values,
                # derived from the offsets so count and list always agree
                # (exact-multiple and empty payloads included)
                "n_frames": pd.Series([len(o) for o in offsets],
                                      dtype="int32"),
                "frame_offsets": offsets,
            })

    return df.mapInPandas(frames, schema=FRAME_SCHEMA)
