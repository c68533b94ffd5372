"""Multimodal column plumbing (training-data pipeline surface).

Images/audio/video are carried as opaque ``binary`` payload columns with a
typed metadata struct — the lakehouse-native layout for multimodal training
data. The container has no image/audio codecs, so the *decode* step is a
deterministic fake behind the real Spark plumbing (schema, Arrow batching,
``mapInPandas`` signature); swapping in PIL/ffmpeg is a one-function change.

The `documents.text` column stands in for the payload (its UTF-8 bytes are
the "media bytes"); `embeddings.embedding` stands in for a decoded feature
vector.

Scale notes: payload processing is mapInPandas over Arrow record batches —
columnar transfer, no per-row Python overhead, no shuffle. Metadata-only
queries never touch payload bytes thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from apache_iceberg_spark.registry import register
from apache_iceberg_spark.tables import load_table


@register(
    "mm1_payload_metadata",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS payload_md5,
               'text/plain' AS media_type,
               CAST(octet_length(encode(text)) // 4096 AS BIGINT) AS chunk_count
        FROM documents
    """,
    doc="Typed metadata over an opaque binary payload column: byte length, "
    "content digest, media type, storage chunk count. Pure expression "
    "tree — payload column pruned away for metadata-only readers.",
    tags=("multimodal", "llm"),
)
def mm1_payload_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
        F.lit("text/plain").alias("media_type"),
        (F.length(payload).cast("long") / F.lit(4096)).cast("long").alias(
            "chunk_count"
        ),
    )


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def _fake_decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for a media decoder.

    A real implementation would do ``PIL.Image.open(io.BytesIO(payload))``
    (or ffmpeg frame sampling) here; the container ships no codecs, so we
    "decode" the payload bytes into intensity statistics. Integer byte sums
    keep the result exactly reproducible (and oracle-checkable).
    """
    import numpy as np

    for pdf in batches:
        payloads = [
            bytes(p) if not isinstance(p, bytes) else p for p in pdf["payload"]
        ]
        n_bytes = np.array([len(p) for p in payloads], dtype="int64")
        byte_sum = np.array(
            [int(np.frombuffer(p, dtype=np.uint8).sum()) for p in payloads],
            dtype="int64",
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": n_bytes,
                "byte_sum": byte_sum,
                # exact: int_sum / int_len in double — engine-independent
                "mean_intensity": byte_sum.astype("float64") / n_bytes,
            }
        )


@register(
    "mm2_decode_features",
    oracle="""
        WITH b AS (
            SELECT doc_id,
                   octet_length(encode(text)) AS n_bytes,
                   lower(hex(encode(text))) AS h
            FROM documents
        ),
        s AS (
            SELECT doc_id, n_bytes,
                   CAST(COALESCE(list_sum([
                       (strpos('0123456789abcdef', h[i]) - 1) * 16
                       + strpos('0123456789abcdef', h[i+1]) - 1
                       for i in generate_series(1, length(h) - 1, 2)]), 0)
                       AS BIGINT) AS byte_sum
            FROM b
        )
        SELECT doc_id, n_bytes, byte_sum,
               CAST(byte_sum AS DOUBLE) / n_bytes AS mean_intensity
        FROM s
    """,
    doc="Payload decode + feature extraction via mapInPandas (Arrow-batched "
    "pandas, the pattern for real image/audio decoding). The decoder here "
    "is a deterministic fake (byte-intensity statistics) since the "
    "container has no codecs; the oracle checks the full plumbing "
    "end-to-end. The oracle sums the payload's UTF-8 *bytes* (hex-pair "
    "decode of encode(text)), matching the Spark side exactly on "
    "non-ASCII payloads too (tests/test_multimodal_nonascii.py proves it "
    "on a multibyte fixture).",
    tags=("multimodal", "llm", "pandas-udf"),
)
def mm2_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    payload_df = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return payload_df.mapInPandas(_fake_decode_batches, schema=_DECODE_SCHEMA)


@register(
    "mm3_frame_sample",
    oracle="""
        SELECT doc_id,
               array_to_string([substr(text, i, 16)
                for i in generate_series(1, greatest(length(text) - 15, 1), 64)],
                chr(31)) AS frames,
               len([substr(text, i, 16)
                    for i in generate_series(1, greatest(length(text) - 15, 1), 64)]) AS n_frames
        FROM documents
    """,
    doc="Frame sampling over a packed media payload: every 64th offset "
    "yields a 16-byte 'frame' (stride sampling — the video-keyframe "
    "pattern). Expression-level array slicing; no UDF, no shuffle. The "
    "frame list is emitted joined on a \\x1f unit separator because the "
    "driver's differential hasher cannot canonicalize array-typed "
    "columns.",
    tags=("multimodal", "llm"),
)
def mm3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    frames = F.expr(
        "transform(sequence(1, greatest(length(text) - 15, 1), 64), "
        "i -> substr(text, i, 16))"
    )
    return d.select(
        "doc_id",
        F.array_join(frames, "\x1f").alias("frames"),
        F.size(frames).alias("n_frames"),
    )


RESIZE_TARGET = 32


@register(
    "mm4_resize",
    oracle=f"""
        SELECT doc_id,
               array_to_string([ascii(substr(text,
                    1 + CAST(floor(k * length(text) / {RESIZE_TARGET}) AS INT), 1))
                for k in generate_series(0, {RESIZE_TARGET - 1})], ',') AS resized,
               length(text) AS src_len
        FROM documents
        WHERE length(text) >= {RESIZE_TARGET}
    """,
    doc=f"Payload resize / downsample: nearest-neighbor resampling of the "
    f"media byte stream to a fixed {RESIZE_TARGET}-sample resolution — the "
    "1-D analog of image resize-to-fixed-resolution (a real image resize "
    "plugs a PIL call into the mm2 mapInPandas decoder instead). Pure "
    "expression tree: sequence → transform → ascii, no UDF, no shuffle; "
    "payloads shorter than the target are filtered (no upsampling). The "
    "resampled vector is emitted comma-joined (scalar digest) because the "
    "driver's differential hasher cannot canonicalize array columns.",
    tags=("multimodal", "llm"),
)
def mm4_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    resized = F.expr(
        f"array_join(transform(sequence(0, {RESIZE_TARGET - 1}), "
        f"k -> cast(ascii(substr(text, "
        f"1 + cast(floor(k * length(text) / {RESIZE_TARGET}) as int), 1)) "
        f"as string)), ',')"
    )
    return d.filter(F.length("text") >= RESIZE_TARGET).select(
        "doc_id", resized.alias("resized"), F.length("text").alias("src_len")
    )


# --- mm9: audio frame features ----------------------------------------------

#: Samples per analysis frame and the bounded fingerprint window (first N
#: samples — production audio fingerprinting analyzes a prefix window, and
#: the bound keeps the expression tree O(docs x window), not O(docs x len²)
#: from the per-sample substr).
MM9_FRAME = 32
MM9_MAX_SAMPLES = 256


@register(
    "mm9_audio_frame_features",
    oracle=f"""
        WITH s AS (
            SELECT doc_id,
                   [CAST(ascii(substr(text, i, 1)) AS BIGINT) - 128
                    for i in generate_series(1,
                        LEAST(length(text), {MM9_MAX_SAMPLES}))] AS cps
            FROM documents
            WHERE length(text) > 0
        ),
        fx AS (
            SELECT doc_id, cps,
                   unnest(generate_series(0,
                       (len(cps) + {MM9_FRAME - 1}) // {MM9_FRAME} - 1))
                       AS f
            FROM s
        ),
        fr AS (
            SELECT doc_id, f,
                   cps[f * {MM9_FRAME} + 1 : f * {MM9_FRAME} + {MM9_FRAME}]
                       AS fr
            FROM fx
        )
        SELECT doc_id, CAST(f AS BIGINT) AS frame_id,
               CAST(len(fr) AS BIGINT) AS n_samples,
               CAST(list_sum([x * x for x in fr]) AS BIGINT) AS energy,
               list_reduce(
                   list_prepend([fr[1], CAST(0 AS BIGINT)],
                                [[x] for x in fr[2:]]),
                   (acc, x) -> [x[1],
                       acc[2] + CASE WHEN (x[1] >= 0) != (acc[1] >= 0)
                                THEN 1 ELSE 0 END]
               )[2] AS zero_crossings,
               CAST(list_max([abs(x) for x in fr]) AS BIGINT) AS peak
        FROM fr
    """,
    doc="AUDIO frame features — completing the modality triple (mm5-mm8 "
    "image, mm8 video, mm9 audio): the payload byte stream is framed "
    f"into {MM9_FRAME}-sample windows over a bounded "
    f"{MM9_MAX_SAMPLES}-sample fingerprint prefix (production audio "
    "fingerprinting analyzes a prefix window; the bound also keeps the "
    "per-sample substr expression O(window) per doc), and each frame "
    "emits the classic silence/voicing descriptors: energy (sum of "
    "squared centered samples), zero-crossing count (a state-carrying "
    "expression fold over [prev_sample, count] pairs), and peak "
    "amplitude — every one an exact BIGINT, no floats anywhere. As "
    "with mm2/mm4, a real codec plugs into the mm2 mapInPandas "
    "decoder; the Spark-side plumbing (frame explode, per-frame folds, "
    "schema) is the real, tested artifact. Map-only: zero shuffles — "
    "scan, explode, fold.",
    tags=("multimodal", "llm", "audio"),
)
def mm9_audio_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cps = (
        f"transform(sequence(1, LEAST(length(text), {MM9_MAX_SAMPLES})), "
        "i -> CAST(ascii(substr(text, i, 1)) AS BIGINT) - 128)"
    )
    frames = (
        f"transform(sequence(0, (size(cps) + {MM9_FRAME - 1}) "
        f"DIV {MM9_FRAME} - 1), "
        f"f -> slice(cps, f * {MM9_FRAME} + 1, {MM9_FRAME}))"
    )
    zc = (
        "element_at(aggregate(slice(fr, 2, size(fr) - 1), "
        "array(element_at(fr, 1), CAST(0 AS BIGINT)), "
        "(acc, s) -> array(s, element_at(acc, 2) "
        "+ IF((s >= 0) != (element_at(acc, 1) >= 0), "
        "CAST(1 AS BIGINT), CAST(0 AS BIGINT)))), 2)"
    )
    return (
        d.filter(F.length("text") > 0)
        .select("doc_id", F.expr(cps).alias("cps"))
        .select(
            "doc_id",
            F.posexplode(F.expr(frames)).alias("frame_id", "fr"),
        )
        .select(
            "doc_id",
            F.col("frame_id").cast("long").alias("frame_id"),
            F.size("fr").cast("long").alias("n_samples"),
            F.expr(
                "aggregate(fr, CAST(0 AS BIGINT), (acc, s) -> acc + s * s)"
            ).alias("energy"),
            F.expr(zc).alias("zero_crossings"),
            F.expr("array_max(transform(fr, s -> abs(s)))").alias("peak"),
        )
    )


# ---------------------------------------------------------------------------
# mm10: multimodal (VLM) sequence packing
# ---------------------------------------------------------------------------

MM10_BUDGET = 512  # context window (tokens per packed sequence)
MM10_PATCH = 64  # patch tokens one image expands to (ViT-style)


@register(
    "mm10_vlm_sequence_packing",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
                        AS BIGINT) AS n_toks,
                   doc_id % 3 AS n_img
            FROM documents
        ),
        c AS (
            SELECT doc_id, n_toks, n_img,
                   n_toks + n_img * {MM10_PATCH} AS eff,
                   CAST(SUM(n_toks + n_img * {MM10_PATCH}) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - (n_toks + n_img * {MM10_PATCH}) AS BIGINT) AS st
            FROM t
        ),
        text_spans AS (
            SELECT doc_id, s.seq_id,
                   LEAST((s.seq_id + 1) * {MM10_BUDGET}, st + n_toks)
                     - GREATEST(s.seq_id * {MM10_BUDGET}, st) AS toks
            FROM c, LATERAL (
                SELECT UNNEST(range(st // {MM10_BUDGET},
                                    (st + n_toks - 1) // {MM10_BUDGET} + 1))
                       AS seq_id
            ) s
            WHERE n_toks > 0
        ),
        img_blocks AS (
            SELECT doc_id,
                   st + n_toks + (i.i - 1) * {MM10_PATCH} AS blo
            FROM c, LATERAL (
                SELECT UNNEST(range(1, CAST(n_img AS BIGINT) + 1)) AS i
            ) i
            WHERE n_img > 0
        ),
        img_spans AS (
            SELECT doc_id, s.seq_id,
                   LEAST((s.seq_id + 1) * {MM10_BUDGET},
                         blo + {MM10_PATCH})
                     - GREATEST(s.seq_id * {MM10_BUDGET}, blo) AS toks,
                   CASE WHEN s.seq_id = blo // {MM10_BUDGET}
                             AND blo // {MM10_BUDGET}
                                 <> (blo + {MM10_PATCH} - 1)
                                     // {MM10_BUDGET}
                        THEN 1 ELSE 0 END AS split_here
            FROM img_blocks, LATERAL (
                SELECT UNNEST(range(blo // {MM10_BUDGET},
                                    (blo + {MM10_PATCH} - 1)
                                        // {MM10_BUDGET} + 1)) AS seq_id
            ) s
        ),
        contrib AS (
            SELECT seq_id, doc_id, toks, CAST(0 AS BIGINT) AS img_toks,
                   CAST(0 AS BIGINT) AS split_here
            FROM text_spans
            UNION ALL
            SELECT seq_id, doc_id, CAST(0 AS BIGINT), toks, split_here
            FROM img_spans
        )
        SELECT CAST(seq_id AS BIGINT) AS seq_id,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS text_toks,
               CAST(SUM(img_toks) AS BIGINT) AS image_toks,
               CAST(SUM(split_here) AS BIGINT) AS split_image_blocks
        FROM contrib
        GROUP BY seq_id
    """,
    doc=f"Multimodal (VLM) sequence packing — pp2's concat-and-chunk "
    "generalized to interleaved modalities, the batch-builder shape a "
    "vision-language training loader needs: each document's effective "
    f"length is text tokens + n_images x {MM10_PATCH} patch tokens "
    "(images as fixed patch-token blocks laid out after the text; "
    "n_images is the mm-family's deterministic fake for the absent "
    "image column — the plumbing is real, the decode is stubbed), "
    "documents concatenate in doc_id order and slice into "
    f"{MM10_BUDGET}-token windows via the SAME two-level distributed "
    "prefix sum as pp2 (two shuffles + a broadcast at any corpus "
    "size, never a global ordered window). Per sequence the report "
    "carries the modality budget split (text vs patch tokens, doc "
    "count) plus split_image_blocks — the count of patch blocks "
    "straddling a boundary, THE diagnostic motivating atomic-image "
    "packing (production bumps a straddling block to the next "
    "sequence with padding, m28's bin-packing shape; the counter "
    "measures exactly how much padding that would cost). All "
    "integer; oracle mirrors with a naive global window + LATERAL "
    "UNNEST spans.",
    tags=("multimodal", "llm", "packing"),
)
def mm10_vlm_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from apache_iceberg_spark.tables import load_table_parallel

    d = load_table_parallel(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    t = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_toks"),
        (F.col("doc_id") % 3).cast("long").alias("n_img"),
        (F.col("doc_id") / 128).cast("long").alias("bucket"),
    ).withColumn(
        "eff", F.col("n_toks") + F.col("n_img") * MM10_PATCH
    )
    # pp2's two-level distributed prefix sum over EFFECTIVE lengths.
    within = F.sum("eff").over(
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_doc = t.withColumn("within_cum", within)
    btot = t.groupBy("bucket").agg(F.sum("eff").alias("btot"))
    bprefix = btot.select(
        "bucket",
        F.coalesce(
            F.sum("btot").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("bprefix"),
    )
    c = per_doc.join(F.broadcast(bprefix), "bucket").select(
        "doc_id",
        "n_toks",
        "n_img",
        (F.col("within_cum") + F.col("bprefix") - F.col("eff")).alias("st"),
    ).persist()  # plan-cache: the prefix-summed frame feeds BOTH modality
    # branches of the union; uncached, the whole two-level prefix sum
    # (two shuffles + broadcast) would run twice

    B, P = MM10_BUDGET, MM10_PATCH
    text_spans = (
        c.filter(F.col("n_toks") > 0)
        .select(
            "doc_id",
            "st",
            "n_toks",
            F.explode(
                F.sequence(
                    F.expr(f"st DIV {B}"),
                    F.expr(f"(st + n_toks - 1) DIV {B}"),
                )
            ).alias("seq_id"),
        )
        .select(
            "seq_id",
            "doc_id",
            (
                F.least(
                    (F.col("seq_id") + 1) * B, F.col("st") + F.col("n_toks")
                )
                - F.greatest(F.col("seq_id") * B, F.col("st"))
            ).alias("toks"),
            F.lit(0).cast("long").alias("img_toks"),
            F.lit(0).cast("long").alias("split_here"),
        )
    )
    img_spans = (
        c.filter(F.col("n_img") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.col("n_img"))).alias("i"),
            (
                F.col("st") + F.col("n_toks") + (F.col("i") - 1) * P
            ).alias("blo"),
        )
        .select(
            "doc_id",
            "blo",
            F.explode(
                F.sequence(
                    F.expr(f"blo DIV {B}"),
                    F.expr(f"(blo + {P} - 1) DIV {B}"),
                )
            ).alias("seq_id"),
        )
        .select(
            "seq_id",
            "doc_id",
            F.lit(0).cast("long").alias("toks"),
            (
                F.least((F.col("seq_id") + 1) * B, F.col("blo") + P)
                - F.greatest(F.col("seq_id") * B, F.col("blo"))
            ).alias("img_toks"),
            F.when(
                (F.col("seq_id") == F.expr(f"blo DIV {B}"))
                & (
                    F.expr(f"blo DIV {B}")
                    != F.expr(f"(blo + {P} - 1) DIV {B}")
                ),
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("split_here"),
        )
    )
    return (
        text_spans.unionByName(img_spans)
        .groupBy("seq_id")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("toks").alias("text_toks"),
            F.sum("img_toks").alias("image_toks"),
            F.sum("split_here").alias("split_image_blocks"),
        )
    )
