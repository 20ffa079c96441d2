"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extraction runs as Arrow-batched mapInPandas so
payload bytes cross to Python once per batch, never per row. The actual
codec step is STUBBED (this container ships no PIL/ffmpeg): decode_image /
sample_frames raise NotImplementedError unless the optional library is
importable, while extract_binary_features is a real, deterministic
featureizer (length, md5, head/tail bytes) exercising the full Spark-side
plumbing — schema, batching, partitioning — that a real decoder would use.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<n_bytes: long, declared_format: string>"
)
FEATURES_SCHEMA = "media_id long, n_bytes long, digest string, head_hex string"


def to_media_table(df: DataFrame, id_col: str, payload_col: str, kind: str = "blob") -> DataFrame:
    """Wrap an arbitrary binary column as a typed media table."""
    p = F.col(payload_col)
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        p.alias("payload"),
        F.struct(
            F.length(p).cast("long").alias("n_bytes"),
            F.lit(kind).alias("declared_format"),
        ).alias("meta"),
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {"media_id": pdf["media_id"], "n_bytes": [], "digest": [], "head_hex": []}
        for payload in pdf["payload"]:
            b = bytes(payload) if payload is not None else b""
            out["n_bytes"].append(len(b))
            out["digest"].append(hashlib.md5(b).hexdigest())
            out["head_hex"].append(b[:8].hex())
        yield pd.DataFrame(out)


def extract_binary_features(media: DataFrame) -> DataFrame:
    """Deterministic per-payload features via ONE Arrow crossing."""
    return media.select("media_id", "payload").mapInPandas(
        _feature_batches, schema=FEATURES_SCHEMA
    )


# ---- stubbed codec steps (real plumbing, fake/raising kernels) ----------

def decode_image(media: DataFrame, target_size: tuple[int, int] = (64, 64)) -> DataFrame:
    """STUB: real image decode+resize requires PIL (not in this container).

    The Spark-side contract is pinned: mapInPandas over (media_id, payload)
    → (media_id, width int, height int, pixels binary). With PIL present
    this decodes for real; without it, it raises at plan *execution* time.
    """
    schema = "media_id long, width int, height int, pixels binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - env without PIL
            raise NotImplementedError(
                "image decode requires PIL; use extract_binary_features for "
                "codec-free pipelines"
            ) from e
        import io

        for pdf in batches:  # pragma: no cover - env without PIL
            rows = {"media_id": pdf["media_id"], "width": [], "height": [], "pixels": []}
            for payload in pdf["payload"]:
                img = Image.open(io.BytesIO(bytes(payload))).resize(target_size)
                rows["width"].append(img.width)
                rows["height"].append(img.height)
                rows["pixels"].append(img.tobytes())
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(kernel, schema=schema)


def fake_decode_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic FAKE embedding per payload (md5-seeded floats in
    [0,1)) — stands in for a real image/audio encoder so downstream
    similarity plumbing is testable end-to-end. Clearly not a real model."""
    schema = f"media_id long, feat array<float>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                d = hashlib.md5(b).digest()
                feats.append([d[i % 16] / 256.0 for i in range(dim)])
                ids.append(mid)
            yield pd.DataFrame({"media_id": ids, "feat": feats})

    return media.select("media_id", "payload").mapInPandas(kernel, schema=schema)
