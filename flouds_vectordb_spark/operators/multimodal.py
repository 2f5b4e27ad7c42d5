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
    """Real decode hook, import-guarded (VERDICT r6/r7): when Pillow is
    installed, image/* payloads decode for real and return a PIL.Image;
    when soundfile is installed, audio/* payloads decode to a
    (numpy_samples, sample_rate) pair; when av (PyAV) is installed,
    video/* payloads decode to an open av container (streams, frames and
    duration readable lazily — a container, not a frame list, because
    eagerly decoding all frames of a video inside a mapInPandas batch
    would blow executor memory; frame_sample-style operators pull the
    frames they need). Everything else (and every payload when no media
    library exists, as in this container) raises the documented
    NotImplementedError."""
    if media_type.startswith("image/"):
        try:
            import io

            from PIL import Image
        except ImportError:
            pass
        else:
            return Image.open(io.BytesIO(payload))
    if media_type.startswith("audio/"):
        try:
            import io

            import soundfile
        except ImportError:
            pass
        else:
            return soundfile.read(io.BytesIO(payload))
    if media_type.startswith("video/"):
        try:
            import io

            import av
        except ImportError:
            pass
        else:
            return av.open(io.BytesIO(payload))
    raise NotImplementedError(
        f"no decoder available for {media_type!r}; install a media library "
        "and replace decode_media / the extractor passed to extract_features"
    )


def pil_image_extractor(payload: bytes) -> tuple[int, str, list[float]]:
    """Real image extractor with the fake_feature_extractor signature
    (usable only when Pillow is importable): features are
    [width, height, n_channels, mean_luma/255] — cheap, deterministic,
    and library-stable. Demonstrates that swapping the extractor touches
    NOTHING else in the mapInPandas pipeline."""
    img = decode_media(payload, "image/*")
    h = hashlib.md5(payload).hexdigest()
    gray = img.convert("L")
    pixels = list(gray.getdata())
    mean_luma = (sum(pixels) / len(pixels) / 255.0) if pixels else 0.0
    return len(payload), h, [float(img.width), float(img.height),
                             float(len(img.getbands())), mean_luma]


def soundfile_audio_extractor(payload: bytes) -> tuple[int, str, list[float]]:
    """Real audio extractor with the fake_feature_extractor signature
    (usable only when soundfile is importable): features are
    [n_frames, sample_rate, n_channels, rms] — cheap, deterministic, and
    library-stable. Mirrors pil_image_extractor: swapping the extractor
    touches NOTHING else in the mapInPandas pipeline."""
    samples, rate = decode_media(payload, "audio/*")
    h = hashlib.md5(payload).hexdigest()
    if samples.ndim == 1:
        n_frames, n_ch = len(samples), 1
    else:
        n_frames, n_ch = samples.shape[0], samples.shape[1]
    rms = float((samples.astype("float64") ** 2).mean() ** 0.5) if n_frames else 0.0
    return len(payload), h, [float(n_frames), float(rate), float(n_ch), rms]


def av_video_extractor(payload: bytes) -> tuple[int, str, list[float]]:
    """Real video extractor with the fake_feature_extractor signature
    (usable only when av/PyAV is importable): features are
    [duration_sec, n_video_streams, width, height] of the first video
    stream — container metadata only, NO frame decode (a metadata read is
    O(header); decoding frames belongs in a sampling operator). Mirrors
    the image/audio extractors: swapping it in touches NOTHING else in
    the mapInPandas pipeline."""
    container = decode_media(payload, "video/*")
    try:
        vstreams = [s for s in container.streams if s.type == "video"]
        dur = float(container.duration / 1_000_000) if container.duration else 0.0
        w = float(vstreams[0].codec_context.width) if vstreams else 0.0
        h = float(vstreams[0].codec_context.height) if vstreams else 0.0
        md5 = hashlib.md5(payload).hexdigest()
        return len(payload), md5, [dur, float(len(vstreams)), w, h]
    finally:
        container.close()


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


RESIZE_SCHEMA = "id long, media_type string, out_len int, resized_hash string"


def fake_resize(chars: str, out_len: int) -> str:
    """Deterministic nearest-neighbor resample of the payload's character
    sequence to `out_len` — the real resize algorithm applied to the 1-D
    stand-in signal (a decoder would hand pixel rows to the same logic)."""
    n = len(chars)
    if n == 0:
        return ""
    return "".join(chars[(i * n) // out_len] for i in range(out_len))


def resize_media(df: DataFrame, out_len: int = 32, id_col: str = "id",
                 payload_col: str = "payload",
                 media_type_col: str = "media_type") -> DataFrame:
    """mapInPandas resize step: per item, resample the payload to a fixed
    target size and emit (id, media_type, out_len, md5-of-resized). Swap
    `fake_resize` for a real interpolating resizer behind a decoder; the
    Spark-side schema/batching is unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for payload in pdf[payload_col]:
                resized = fake_resize(bytes(payload).decode("utf-8"), out_len)
                hashes.append(hashlib.md5(resized.encode("utf-8")).hexdigest())
            yield pd.DataFrame({
                "id": pdf[id_col],
                "media_type": pdf[media_type_col],
                "out_len": pd.array([out_len] * len(pdf), dtype="int32"),
                "resized_hash": hashes,
            })

    return df.select(id_col, payload_col, media_type_col).mapInPandas(run, RESIZE_SCHEMA)


def resize_media_sql(table_sql: str, out_len: int = 32, id_expr: str = "id",
                     text_expr: str = "text",
                     media_type: str = "text/plain") -> str:
    """DuckDB oracle twin: the same nearest-neighbor character resample.
    length() (CHARACTERS, like the Python side's decoded string) — strlen
    counts BYTES and diverges on any multi-byte UTF-8 payload."""
    return f"""
SELECT {id_expr} AS id, '{media_type}' AS media_type, {out_len}::INT AS out_len,
       md5(array_to_string(list_transform(generate_series(0, {out_len - 1}),
           i -> substr({text_expr}, ((i * length({text_expr})) // {out_len})::INT + 1, 1)), ''))
         AS resized_hash
FROM {table_sql}
"""


FRAME_SCHEMA = "id long, frame_idx int, frame_len int, frame_hash string"


def sample_frames(df: DataFrame, n_frames: int = 4, frame_chars: int = 64,
                  id_col: str = "id", payload_col: str = "payload") -> DataFrame:
    """mapInPandas frame sampling: treat the payload as a sequence of
    fixed-size chunks ("frames") and emit `n_frames` uniformly-spaced ones
    (frame j -> chunk floor(j*n_chunks/n_frames)) — the standard uniform
    temporal sampling a video pipeline runs, over the stand-in signal.
    One input item fans out to n_frames rows (mapInPandas handles the 1->N
    shape natively; no explode of pre-built arrays)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, hashes = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                chars = bytes(payload).decode("utf-8")
                n_chunks = max((len(chars) + frame_chars - 1) // frame_chars, 1)
                for j in range(n_frames):
                    c = (j * n_chunks) // n_frames
                    frame = chars[c * frame_chars:(c + 1) * frame_chars]
                    ids.append(rid)
                    idxs.append(j)
                    lens.append(len(frame))
                    hashes.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
            yield pd.DataFrame({
                "id": ids,
                "frame_idx": pd.array(idxs, dtype="int32"),
                "frame_len": pd.array(lens, dtype="int32"),
                "frame_hash": hashes,
            })

    return df.select(id_col, payload_col).mapInPandas(run, FRAME_SCHEMA)


def sample_frames_sql(table_sql: str, n_frames: int = 4, frame_chars: int = 64,
                      id_expr: str = "id", text_expr: str = "text") -> str:
    """DuckDB oracle twin of sample_frames (length() = CHARACTERS to match
    the Python side's decoded string; strlen counts bytes)."""
    return f"""
SELECT {id_expr} AS id, j::INT AS frame_idx,
       length(substr({text_expr}, (((j * _nc) // {n_frames}) * {frame_chars})::INT + 1,
                     {frame_chars}))::INT AS frame_len,
       md5(substr({text_expr}, (((j * _nc) // {n_frames}) * {frame_chars})::INT + 1,
                  {frame_chars})) AS frame_hash
FROM (SELECT *, greatest((length({text_expr}) + {frame_chars - 1}) // {frame_chars}, 1) AS _nc
      FROM {table_sql}),
     (SELECT unnest(generate_series(0, {n_frames - 1})) AS j)
"""


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
