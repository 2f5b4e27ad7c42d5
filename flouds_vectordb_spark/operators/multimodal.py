"""Multimodal column plumbing: opaque binary payloads + typed metadata.

LLM-pipeline operator beyond the reference surface (SURVEY.md §7 Phase 4):
image/audio/video content is carried as an opaque `binary` column with
typed metadata, and decode / feature-extract steps run as Arrow-batched
Pandas functions over `mapInPandas` — the Spark-idiomatic shape for
per-item Python media processing at 100 TB (each task streams record
batches; no row-at-a-time Python, no driver collection).

The container has no image/audio libraries, so the DECODE step is a
clearly-marked stub (`decode_media`, raises NotImplementedError), and the
default pipeline uses a deterministic fake extractor
(`fake_feature_extractor`) whose outputs are pure functions of the bytes
(length + md5-derived features) — making the WHOLE mapInPandas pipeline
(schema, batching, partitioning) real and oracle-checkable: DuckDB computes
identical features from the same md5.

A real deployment swaps `fake_feature_extractor` for a decoder
(PIL/ffmpeg/...) with the same signature; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "id long, media_type string, n_bytes int, content_hash string, feat array<double>"
)
FEATURE_DIM = 4


def decode_media(payload: bytes, media_type: str):
    """Real decode hook — image/audio libs are not available in this
    container. Swap in PIL.Image.open / soundfile / av here."""
    raise NotImplementedError(
        f"no decoder available for {media_type!r}; install a media library "
        "and replace decode_media / the extractor passed to extract_features"
    )


def fake_feature_extractor(payload: bytes) -> tuple[int, str, list[float]]:
    """Deterministic stand-in for decode+embed: md5-derived features.
    (n_bytes, md5_hex, 4 floats from 8-hex-digit windows scaled to [0, 1))."""
    h = hashlib.md5(payload).hexdigest()
    feat = [int(h[8 * i: 8 * i + 8], 16) / 16.0**8 for i in range(FEATURE_DIM)]
    return len(payload), h, feat


def with_binary_payload(df: DataFrame, text_col: str = "text",
                        media_type: str = "text/plain") -> DataFrame:
    """Fixture adapter: materialize an opaque binary column (utf-8 bytes of
    the text) + typed metadata, standing in for real image/audio blobs."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit(media_type)
    )


def extract_features(df: DataFrame, id_col: str = "id",
                     payload_col: str = "payload",
                     media_type_col: str = "media_type",
                     extractor=fake_feature_extractor) -> DataFrame:
    """mapInPandas feature extraction: Arrow record batches in, typed feature
    rows out. The extractor sees raw bytes per item; batch shape and schema
    are independent of the extractor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, hashes, feats = [], [], []
            for payload in pdf[payload_col]:
                n, h, f = extractor(bytes(payload))
                n_bytes.append(n)
                hashes.append(h)
                feats.append(f)
            yield pd.DataFrame({
                "id": pdf[id_col],
                "media_type": pdf[media_type_col],
                "n_bytes": pd.array(n_bytes, dtype="int32"),
                "content_hash": hashes,
                "feat": feats,
            })

    return df.select(id_col, payload_col, media_type_col).mapInPandas(run, FEATURE_SCHEMA)


def extract_features_sql(table_sql: str, id_expr: str = "id",
                         text_expr: str = "text",
                         media_type: str = "text/plain") -> str:
    """DuckDB oracle twin of the fixture pipeline (utf-8 payload + fake
    extractor): identical md5-derived features, computed in SQL."""
    feat_terms = ", ".join(
        f"('0x' || substr(md5({text_expr}), {8 * i + 1}, 8))::BIGINT::DOUBLE / {16.0**8!r}"
        for i in range(FEATURE_DIM)
    )
    return f"""
SELECT {id_expr} AS id, '{media_type}' AS media_type,
       strlen({text_expr})::INT AS n_bytes,
       md5({text_expr}) AS content_hash,
       [{feat_terms}] AS feat
FROM {table_sql}
"""
