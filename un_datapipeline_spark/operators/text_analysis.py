"""Text-analysis operators for training-data curation (beyond SURVEY §2:
language-ID, quality scoring, fingerprinting — the operations a 100 TB
LLM data pipeline layers on top of the relational core).

All scoring is Column-expression math over one scan; the profile-based
language model is a two-pass aggregate (build tiny per-lang profiles,
broadcast them back) — the profile side is vocabulary-bounded, never
corpus-bounded, so the plan is scan + broadcast join at any scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from un_datapipeline_spark.registry import register
from un_datapipeline_spark.tables import load_table

# Fixed stopword list for quality scoring (language-agnostic tiny set —
# a real pipeline plugs a per-language lexicon in here).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

_QUALITY_ORACLE = f"""
SELECT lang,
       count(*) AS n_docs,
       ROUND(avg(n_tokens), 6)       AS avg_tokens,
       ROUND(avg(avg_tok_len), 6)    AS avg_tok_len,
       ROUND(avg(alpha_ratio), 6)    AS avg_alpha_ratio,
       ROUND(avg(stop_ratio), 6)     AS avg_stop_ratio,
       ROUND(avg(quality), 6)        AS avg_quality,
       CAST(sum(CASE WHEN quality >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
FROM (
  SELECT lang,
         len(toks) AS n_tokens,
         CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks) AS avg_tok_len,
         CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
           / length(text) AS alpha_ratio,
         CAST(len(list_filter(toks, t -> list_contains({list(STOPWORDS)}, t))) AS DOUBLE)
           / len(toks) AS stop_ratio
  FROM (SELECT lang, text, string_split(text, ' ') AS toks FROM documents)
)
, LATERAL (SELECT 0.25 * least(n_tokens / 50.0, 1.0)
                + 0.25 * least(avg_tok_len / 5.0, 1.0)
                + 0.25 * alpha_ratio
                + 0.25 * least(stop_ratio * 5.0, 1.0) AS quality)
GROUP BY lang
"""


@register("llm_quality_score", oracle=_QUALITY_ORACLE, tier="T3")
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality score from length / token-shape / alphabetic
    / stopword ratios, combined into a [0,1] keep-score; reported as
    per-language aggregates + keep counts.  Pure per-row Column math —
    one scan, one 5-key shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    avg_tok_len = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
        "double"
    ) / n_tokens
    alpha_ratio = (
        F.length(F.regexp_replace("text", "[^a-zA-Z ]", "")).cast("double")
        / F.length("text")
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
        / n_tokens
    )
    quality = (
        0.25 * F.least(n_tokens / 50.0, F.lit(1.0))
        + 0.25 * F.least(avg_tok_len / 5.0, F.lit(1.0))
        + 0.25 * alpha_ratio
        + 0.25 * F.least(stop_ratio * 5.0, F.lit(1.0))
    )
    scored = d.select(
        "lang",
        n_tokens.alias("n_tokens"),
        avg_tok_len.alias("avg_tok_len"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        F.round(F.avg("avg_tok_len"), 6).alias("avg_tok_len"),
        F.round(F.avg("alpha_ratio"), 6).alias("avg_alpha_ratio"),
        F.round(F.avg("stop_ratio"), 6).alias("avg_stop_ratio"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.sum(F.when(F.col("quality") >= 0.5, 1).otherwise(0))
        .cast("long")
        .alias("n_keep"),
    )


_LANG_ID_ORACLE = """
WITH words AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
  FROM documents
), profile AS (
  SELECT lang AS p_lang, word FROM (
    SELECT lang, word,
           row_number() OVER (PARTITION BY lang
                              ORDER BY count(*) DESC, word) AS rn
    FROM words WHERE word <> '' GROUP BY lang, word
  ) WHERE rn <= 10
), scores AS (
  SELECT w.doc_id, w.lang, p.p_lang, CAST(count(*) AS BIGINT) AS hits
  FROM (SELECT DISTINCT doc_id, lang, word FROM words WHERE word <> '') w
  JOIN profile p USING (word)
  GROUP BY w.doc_id, w.lang, p.p_lang
), best AS (
  SELECT doc_id, lang, p_lang AS predicted
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY hits DESC, p_lang) AS rn
        FROM scores)
  WHERE rn = 1
)
SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
FROM best GROUP BY lang, predicted
"""


@register("llm_lang_id", oracle=_LANG_ID_ORACLE, tier="T3")
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile-based language identification: top-10 words per language
    form each language's profile; every document is classified to the
    profile it shares the most distinct words with (ties → lang name).
    Output is the (true lang × predicted) confusion matrix.

    Scale shape: profiles are 5×10 rows (broadcast); the doc-side join
    touches each distinct (doc, word) once — no quadratic blowup.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    wp = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("word"))
    profile = (
        words.groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= 10)
        .select(F.col("lang").alias("p_lang"), "word")
    )
    doc_words = words.dropDuplicates(["doc_id", "lang", "word"])
    scores = (
        doc_words.join(F.broadcast(profile), "word")
        .groupBy("doc_id", "lang", "p_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    wb = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("p_lang"))
    best = (
        scores.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("lang", F.col("p_lang").alias("predicted"))
    )
    return best.groupBy("lang", "predicted").agg(F.count(F.lit(1)).alias("n"))


_TOKENIZE_ORACLE = """
SELECT lang,
       CAST(sum(len(regexp_extract_all(text,
            '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT) AS bpe_ish_tokens,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT)   AS ws_tokens,
       ROUND(avg(CAST(length(text) AS DOUBLE)
             / len(regexp_extract_all(text,
                   '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))), 6) AS chars_per_token
FROM documents
GROUP BY lang
"""


@register("llm_token_count_bpe", oracle=_TOKENIZE_ORACLE, tier="T3")
def llm_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer regex (letter runs /
    digit runs / single punctuation — the shape GPT-style tokenizers
    split on first) next to plain whitespace counts, plus chars-per-token
    — the standard corpus-sizing statistic."""
    d = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), 0)
    ws = F.split("text", " ")
    return d.groupBy("lang").agg(
        F.sum(F.size(bpe)).cast("long").alias("bpe_ish_tokens"),
        F.sum(F.size(ws)).cast("long").alias("ws_tokens"),
        F.round(F.avg(F.length("text").cast("double") / F.size(bpe)), 6).alias(
            "chars_per_token"
        ),
    )


def _fingerprints(d: DataFrame) -> DataFrame:
    """(doc_id, h) sampled fingerprints: xxhash64 of every 8-char shingle,
    kept when h ≡ 0 (mod 16) — a deterministic content-defined ~6% sample."""
    shingles = F.expr(
        "transform(sequence(1, greatest(length(text) - 7, 1)),"
        " i -> substring(text, i, 8))"
    )
    return (
        d.select("doc_id", F.explode(F.array_distinct(shingles)).alias("sh"))
        .select("doc_id", F.xxhash64("sh").alias("h"))
        .filter(F.pmod("h", F.lit(16)) == 0)
        .dropDuplicates(["doc_id", "h"])
    )


@register("llm_doc_fingerprint", oracle=None, tier="T3")
def llm_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting by hash sampling (winnowing-style): hash
    every 8-char shingle, keep those ≡ 0 (mod 16) — a deterministic ~6%
    content-defined sample that survives local edits.  Output: per-doc
    fingerprint count + the docs sharing every fingerprint with another
    doc (containment candidates).  Rows-only: xxhash64 is not
    reproducible in the oracle; identity invariants live in
    tests/test_llm_invariants.py."""
    d = load_table(spark, sf_dir, "documents")
    fp = _fingerprints(d)
    counts = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    # containment: pairs sharing fingerprints, scored by overlap count
    pairs = (
        fp.alias("x")
        .join(fp.alias("y"), F.col("x.h") == F.col("y.h"))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.join(counts.withColumnRenamed("doc_id", "a"), "a")
        .filter(F.col("shared") == F.col("n_fp"))  # a fully contained in b
        .select("a", "b", "shared")
        .orderBy("a", "b")
    )


# ---------------------------------------------------------------------------
# Type-token ratio (lexical diversity)
# ---------------------------------------------------------------------------

_TTR_ORACLE = """
WITH toked AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       ROUND(CAST(sum(len(list_distinct(toks))) AS BIGINT)
             / CAST(sum(len(toks)) AS BIGINT), 6) AS corpus_ttr,
       ROUND(min(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)), 6)
         AS min_doc_ttr,
       ROUND(max(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)), 6)
         AS max_doc_ttr
FROM toked
GROUP BY lang
"""


@register("llm_type_token_ratio", oracle=_TTR_ORACLE, tier="T3")
def llm_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity screening: per-language type-token ratios
    (distinct words / total words), corpus-level and per-doc extremes —
    low TTR flags keyword-stuffed or template text that repetition rules
    miss.  All ratios are single divisions of exact integer sums.

    Scale shape: distinct-per-doc is per-row array math (array_distinct
    in codegen — no shuffle); only the 5-key language rollup exchanges.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    per_doc = d.select(
        "lang",
        F.size(toks).cast("long").alias("n_toks"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_types"),
    )
    doc_ttr = F.col("n_types").cast("double") / F.col("n_toks")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum("n_types") / F.sum("n_toks").cast("double"), 6
        ).alias("corpus_ttr"),
        F.round(F.min(doc_ttr), 6).alias("min_doc_ttr"),
        F.round(F.max(doc_ttr), 6).alias("max_doc_ttr"),
    )


_WATERMARK_ORACLE = """
WITH planted AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 5 = 0
              THEN substr(text, 1, 10) || chr(8203) || substr(text, 11, 10)
                   || chr(8203) || substr(text, 21)
              ELSE text END AS wm_text
  FROM documents
), audit AS (
  SELECT source,
         CAST(wm_text LIKE '%' || chr(8203) || '%' AS INT) AS has_wm,
         length(wm_text) - length(replace(wm_text, chr(8203), '')) AS n_marks,
         CAST(replace(wm_text, chr(8203), '')
              LIKE '%' || chr(8203) || '%' AS INT) AS still_marked
  FROM planted
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(has_wm) AS BIGINT) AS n_watermarked,
       CAST(sum(n_marks) AS BIGINT) AS n_marks_removed,
       CAST(sum(still_marked) AS BIGINT) AS n_still_marked
FROM audit GROUP BY source
"""


@register("llm_watermark_strip", oracle=_WATERMARK_ORACLE, tier="T2")
def llm_watermark_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-width-character watermark detection and stripping: one in
    five documents gets two U+200B marks planted at fixed offsets, then
    the audit counts marked docs, removes the marks, and proves removal
    left none behind — the invisible-character hygiene pass any LLM
    training corpus needs (zero-width marks survive copy-paste,
    tokenize into garbage, and are a known provenance-tagging channel).
    Pure string expressions per row (narrow map, no shuffle until the
    per-source rollup); the oracle plants the identical marks so the
    strip accounting is hash-verified end to end."""
    zwsp = "\u200b"
    d = load_table(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.substring("text", 1, 10),
                F.lit(zwsp),
                F.substring("text", 11, 10),
                F.lit(zwsp),
                F.expr("substr(text, 21)"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("wm_text"),
    )
    stripped = F.regexp_replace("wm_text", zwsp, "")
    audit = planted.select(
        "source",
        F.col("wm_text").contains(zwsp).cast("int").alias("has_wm"),
        (F.length("wm_text") - F.length(stripped)).alias("n_marks"),
        stripped.contains(zwsp).cast("int").alias("still_marked"),
    )
    return audit.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("has_wm").alias("n_watermarked"),
        F.sum("n_marks").alias("n_marks_removed"),
        F.sum("still_marked").alias("n_still_marked"),
    )
