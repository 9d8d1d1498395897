"""Multimodal-column operators: opaque binary payloads + typed metadata
(images/audio/video in a 100 TB training pipeline travel exactly like
this — a `binary` column plus a metadata struct, processed by
Arrow-batched Python UDFs).

The container has no image/audio codecs, so the DECODE step is stubbed:
`_decode_payload` tries a real codec import and falls back to a
clearly-marked deterministic fake (SURVEY brief: make the Spark-side
plumbing — schema, partitioning, UDF signature, batch shape — real and
tested; stub only the codec call).  The payloads themselves are
deterministic utf-8 bytes derived from documents.text, so every run —
and the DuckDB oracle — sees identical binary content.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from un_datapipeline_spark.registry import register
from un_datapipeline_spark.tables import load_table


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical multimodal frame: (doc_id, payload binary, meta
    struct<mime,width,height>).  Metadata is derived deterministically
    from content so tests are hermetic."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            (F.pmod(F.xxhash64("text"), F.lit(64)) + 16).cast("int").alias("width"),
            (F.pmod(F.xxhash64("text", F.lit(1)), F.lit(64)) + 16).cast("int").alias("height"),
        ).alias("meta"),
    )


_BINARY_STATS_ORACLE = """
SELECT lang,
       count(*) AS n,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       min(octet_length(encode(text)))                 AS min_bytes,
       max(octet_length(encode(text)))                 AS max_bytes,
       count(DISTINCT sha256(text))                    AS n_unique_payloads
FROM documents
GROUP BY lang
"""


@register("mm_binary_stats", oracle=_BINARY_STATS_ORACLE, tier="T3")
def mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column accounting per lang: byte sizes + distinct payload
    digests — the storage-audit query run before any decode pass.  All
    JVM-side (encode/length/sha2 are Column functions)."""
    m = documents_as_media(spark, sf_dir)
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).cast("long").alias("total_bytes"),
        F.min(F.length("payload")).alias("min_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
        F.countDistinct(F.sha2("payload", 256)).alias("n_unique_payloads"),
    )


def _decode_payload(payload: bytes, width: int, height: int):
    """Decode a media payload to a pixel array.

    STUB: real codecs (PIL / libvips / ffmpeg) are not available in this
    environment.  A production deployment replaces the fallback with the
    real import; the fallback is a deterministic fake that reshapes the
    leading bytes into (height, width) "pixels" so the downstream
    feature math is fully exercised.
    """
    import numpy as np

    try:  # pragma: no cover - codec not present in this container
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode is intentionally not wired up in this "
            "environment; replace _decode_payload's fallback when codecs "
            "are available"
        )
    except ImportError:
        pass
    buf = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    reps = -(-need // max(len(buf), 1))
    return np.tile(buf, reps)[:need].reshape(height, width).astype(np.float64)


@register("mm_decode_features", oracle=None, tier="T3")
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → feature-extract over Arrow batches (mapInPandas): per
    doc, 'image' mean/std 'brightness' and edge-proxy (mean abs
    horizontal diff) from the decoded pixel grid.  Rows-only (the fake
    decoder is engine-local); determinism is pytest-asserted."""
    import numpy as np

    m = documents_as_media(spark, sf_dir)
    schema = "doc_id long, width int, height int, brightness double, contrast double, edges double"

    def extract(batches):
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                w, h = int(meta["width"]), int(meta["height"])
                px = _decode_payload(bytes(payload), w, h)
                out.append(
                    (
                        doc_id,
                        w,
                        h,
                        round(float(px.mean()), 6),
                        round(float(px.std()), 6),
                        round(float(np.abs(np.diff(px, axis=1)).mean()), 6),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "brightness", "contrast", "edges"]
            )

    return m.mapInPandas(extract, schema)


@register("mm_frame_sample", oracle=None, tier="T3")
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Video' frame sampling: split each payload into fixed 64-byte
    frames and keep every 4th — the strided-decode pattern for video
    corpora (bounded output per input row).  Emits one row per sampled
    frame with its digest; rows-only."""
    m = documents_as_media(spark, sf_dir)
    FRAME = 64
    STRIDE = 4

    def sample(batches):
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = max(len(b) // FRAME, 1)
                for idx in range(0, n_frames, STRIDE):
                    chunk = b[idx * FRAME : (idx + 1) * FRAME]
                    rows.append(
                        (doc_id, idx, len(chunk), hashlib.md5(chunk).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame_md5"]
            )

    return m.select("doc_id", "payload").mapInPandas(
        sample, "doc_id long, frame_idx int, frame_bytes int, frame_md5 string"
    )
