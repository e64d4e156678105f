"""Multimodal-column operators (SURVEY §2.13, M6).

Images/audio/video ride through the engine as opaque ``binary``
columns plus typed metadata — the lakehouse pattern for multimodal
training data. The Spark-side plumbing here is real and tested:
binary payload columns, metadata extraction with native functions,
and Arrow-batched ``mapInPandas`` feature extraction with a correct
output schema. The *codec* step is the only stub: real decoders
(PIL/librosa/av) aren't in this container, so ``decode_image`` raises
``NotImplementedError`` naming the dependency, and the oracle-checked
pipeline uses a deterministic byte-level feature extractor instead —
same batch shape, same schema contract, swap the function at deploy.

Scale notes: payloads never shuffle — metadata/features are derived
in-place on the scan partition; only the (narrow) feature rows move.
``spark.sql.files.maxPartitionBytes`` bounds per-task payload memory;
Arrow batch size bounds the pandas-UDF working set.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import fan_out, table
from ..session import tune

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, payload_sha string, "
    "mean_byte double, max_byte int, frame_sample string"
)


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires a codec library absent here."""
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires the 'Pillow' package; this container "
            "ships none of the codec libs — use extract_byte_features "
            "for the deterministic stand-in"
        ) from e


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata (stand-in:
    the utf-8 text bytes play the role of encoded media)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
            F.lit("fake/raw").alias("format"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


def extract_byte_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: the
    deterministic byte-level stand-in for an image featurizer. Shape
    and schema are exactly what a real decoder UDF uses."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(b),
                        "payload_sha": hashlib.sha256(b).hexdigest(),
                        "mean_byte": (sum(b) / len(b)) if b else None,
                        "max_byte": max(b) if b else None,
                        # "frame sample": every 64th byte, first 8, hex
                        "frame_sample": b[::64][:8].hex(),
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_bytes", "payload_sha", "mean_byte", "max_byte", "frame_sample",
            ])

    return payloads.mapInPandas(run, FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → metadata + pandas-UDF byte features, rounded
    for cross-engine hashing (documents are ASCII so byte stats equal
    codepoint stats, which the SQL oracle can reproduce).

    No fan_out: the per-row byte stats are trivial, so scan-split
    parallelism suffices — a 32-way repartition just multiplies Arrow
    batch + Python-worker startup overhead at test scale.
    """
    d = table(tune(spark), sf_dir, "documents")
    feats = extract_byte_features(with_binary_payload(d))
    return feats.select(
        "doc_id",
        "n_bytes",
        "payload_sha",
        F.round("mean_byte", 6).alias("mean_byte"),
        "max_byte",
        "frame_sample",
    )


MULTIMODAL_ORACLE = r"""
WITH b AS (
  SELECT doc_id, text, length(text) AS n
  FROM documents),
stats AS (
  SELECT doc_id, text, n,
         list_transform(range(1, n + 1), i -> ascii(substr(text, CAST(i AS INT), 1))) AS codes
  FROM b)
SELECT doc_id,
       n AS n_bytes,
       sha256(text) AS payload_sha,
       round(CAST(list_reduce(codes, (a, x) -> a + x) AS DOUBLE) / n, 6) AS mean_byte,
       CAST(list_max(codes) AS INT) AS max_byte,
       list_reduce(
           list_transform(range(0, least(CAST(ceil(n / 64.0) AS BIGINT), 8)),
                          i -> printf('%02x', ascii(substr(text, CAST(i AS INT) * 64 + 1, 1)))),
           (a, x) -> a || x) AS frame_sample
FROM stats
"""


def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native-function metadata over binary payloads (no Python):
    size, sha, magic-byte sniff — the cheap pre-filter that runs
    before any decode at scale. Native codegen only — no fan_out."""
    d = table(tune(spark), sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha"),
        F.substring("text", 1, 4).alias("magic"),
        (F.octet_length(payload) > 256).cast("int").alias("passes_min_size"),
    )


MEDIA_META_ORACLE = """
SELECT doc_id,
       CAST(length(text) AS INT) AS n_bytes,
       sha256(text) AS payload_sha,
       substr(text, 1, 4) AS magic,
       CAST(length(text) > 256 AS INT) AS passes_min_size
FROM documents
"""


#: synthetic video geometry: one "frame" per FRAME_BYTES of payload
FRAME_BYTES = 100
#: uniform samples taken per video (stride sampling)
N_STRIDE_SAMPLES = 8


def media_frame_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling SCHEDULE for video-shaped payloads: each
    payload is n_frames = ⌈bytes / FRAME_BYTES⌉ frames; the plan
    emits one row per sampled frame — uniform stride samples plus one
    content-keyed "keyframe" (hash-positioned, the deterministic
    stand-in for a scene-cut detector).  Downstream, each row is an
    independent decode task: exploding the schedule BEFORE decode is
    what lets a 1000-executor cluster parallelize inside single large
    videos instead of per-file.  The decode itself stays behind the
    `decode_image` environment stub; the schedule, schema, and
    explode shape are the real, tested plumbing.

    All row-local arithmetic — fuses into the scan, no shuffle."""
    d = table(tune(spark), sf_dir, "documents")
    n_frames = F.expr(
        f"CAST(ceil(length(text) / {FRAME_BYTES}.0) AS BIGINT)"
    )
    stride = F.expr(
        f"greatest(CAST(n_frames div {N_STRIDE_SAMPLES} AS BIGINT), 1L)"
    )
    base = d.select(
        "doc_id", n_frames.alias("n_frames")
    ).withColumn("stride", stride)
    strided = base.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.expr("sequence(0, n_frames - 1, stride)")
        ).alias("frame_idx"),
    ).withColumn("sample_kind", F.lit("stride"))
    key = base.select(
        "doc_id",
        "n_frames",
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT) % n_frames"
        ).alias("frame_idx"),
    ).withColumn("sample_kind", F.lit("keyframe"))
    return strided.unionByName(key)


MEDIA_FRAME_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         CAST(ceil(length(text) / {FRAME_BYTES}.0) AS BIGINT) AS n_frames
  FROM documents),
geo AS (
  SELECT doc_id, n_frames,
         greatest(n_frames // {N_STRIDE_SAMPLES}, 1) AS stride
  FROM base)
SELECT doc_id, n_frames, CAST(t.f AS BIGINT) AS frame_idx,
       'stride' AS sample_kind
FROM geo, unnest(range(0, n_frames, stride)) t(f)
UNION ALL
SELECT doc_id, n_frames,
       CAST(({{HEX8}}) % n_frames AS BIGINT) AS frame_idx,
       'keyframe' AS sample_kind
FROM base
"""


def _frame_oracle() -> str:
    from .dedup import _hex8_sql

    return MEDIA_FRAME_ORACLE.replace(
        "{HEX8}", _hex8_sql("md5(CAST(doc_id AS VARCHAR))", 1)
    )


def media_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary dedup by content digest, per origin: payload
    count, distinct-payload count, and the byte mass a dedup'd store
    saves — the first pass every image/audio corpus runs (identical
    bytes re-crawled under different ids).  One map-side-combined
    aggregate over (origin, sha); payloads never shuffle — only
    digests move."""
    d = table(tune(spark), sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    per_sha = (
        d.select(
            F.col("source").alias("origin"),
            F.sha2(payload, 256).alias("sha"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        )
        .groupBy("origin", "sha")
        .agg(
            F.count("*").alias("copies"),
            F.first("n_bytes").alias("n_bytes"),
        )
    )
    return per_sha.groupBy("origin").agg(
        F.sum("copies").cast("long").alias("n_payloads"),
        F.count("*").alias("n_distinct"),
        F.sum((F.col("copies") - 1) * F.col("n_bytes"))
        .cast("long")
        .alias("dup_bytes_saved"),
    )


MEDIA_DEDUP_ORACLE = """
WITH per_sha AS (
  SELECT source AS origin, sha256(text) AS sha,
         count(*) AS copies,
         CAST(min(length(text)) AS BIGINT) AS n_bytes
  FROM documents GROUP BY 1, 2)
SELECT origin,
       CAST(sum(copies) AS BIGINT) AS n_payloads,
       count(*) AS n_distinct,
       CAST(sum((copies - 1) * n_bytes) AS BIGINT) AS dup_bytes_saved
FROM per_sha GROUP BY 1
"""


QUERIES = {
    "multimodal_features": multimodal_features,
    "media_metadata": media_metadata,
    "media_frame_schedule": media_frame_schedule,
    "media_dedup_exact": media_dedup_exact,
}

ORACLES = {
    "multimodal_features": MULTIMODAL_ORACLE,
    "media_metadata": MEDIA_META_ORACLE,
    "media_frame_schedule": _frame_oracle(),
    "media_dedup_exact": MEDIA_DEDUP_ORACLE,
}
