"""Multimodal queries: binary-column stats (pure built-ins, oracle-backed)
and the mapInPandas decode path (Pandas-UDF plumbing; rows-only check —
the Arrow batch pipeline is not expressible in DuckDB SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import decode_media_batch, extract_features, synthesize_media
from ..sources import load_table
from .registry import register


# ---------------------------------------------------------------------------
# m01 — binary payload statistics via built-ins (JVM-side, oracle-checked)
# ---------------------------------------------------------------------------
@register(
    "m01_binary_payload_stats",
    oracle="""
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS mime,
       count(*) AS n_media,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       min(md5(text)) AS min_digest
FROM documents
GROUP BY 1
ORDER BY mime
""",
    tags=("multimodal", "binary"),
)
def m01_binary_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs)
    return (
        media.groupBy("mime")
        .agg(
            F.count("*").alias("n_media"),
            F.sum(F.octet_length("payload")).cast("long").alias("total_bytes"),
            F.min(F.md5("payload")).alias("min_digest"),
        )
        .orderBy("mime")
    )


# ---------------------------------------------------------------------------
# m02 — Arrow-batched decode via mapInPandas (deterministic fake codec)
# ---------------------------------------------------------------------------
@register(
    "m02_media_decode_features",
    oracle="""
WITH decoded AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS mime,
         -- the decode path treats a null payload as empty bytes
         coalesce(octet_length(encode(text)), 0) AS n_bytes
  FROM documents
)
SELECT mime, count(*) AS n_media,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(min(n_bytes % 640 + 1) AS INT) AS min_width,
       CAST(max(n_bytes % 480 + 1) AS INT) AS max_height
FROM decoded
GROUP BY mime
ORDER BY mime
""",
    tags=("multimodal", "pandas_udf", "mapInPandas"),
    doc="The decode itself runs in Arrow-batched mapInPandas (fake codec "
    "stub); the oracle replays the deterministic width/height formula "
    "to verify the distributed plumbing end-to-end.",
)
def m02_media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_media_batch(synthesize_media(docs), codec="fake")
    return extract_features(decoded)


# ---------------------------------------------------------------------------
# m03 — frame sampling (one-to-many mapInPandas) + resize plumbing
# ---------------------------------------------------------------------------
@register(
    "m03_frame_sampling_stats",
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS mime,
         greatest((octet_length(encode(text)) + 255) // 256, 1) AS n_frames
  FROM documents
)
SELECT mime,
       count(DISTINCT media_id) AS n_media,
       CAST(sum((n_frames - 1) // 4 + 1) AS BIGINT) AS n_sampled_frames,
       CAST(max(n_frames) AS BIGINT) AS max_frames
FROM media
GROUP BY mime
ORDER BY mime
""",
    tags=("multimodal", "mapInPandas", "frame-sampling"),
    doc="Every-4th-frame sampling over 256-byte fake frames; the oracle "
    "recomputes expected sampled-frame counts arithmetically from payload "
    "byte lengths, verifying the one-to-many Arrow plumbing end-to-end.",
)
def m03_frame_sampling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.binaryops import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(synthesize_media(docs), frame_size=256, every_n=4)
    return (
        frames.groupBy("mime")
        .agg(
            F.count_distinct("media_id").alias("n_media"),
            F.count("*").alias("n_sampled_frames"),
            F.max("n_frames").cast("bigint").alias("max_frames"),
        )
        .orderBy("mime")
    )
