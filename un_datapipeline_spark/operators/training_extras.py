"""Training-data preparation extras: Kneser–Ney smoothed LM statistics,
fill-in-the-middle (FIM) restructuring, and temperature-based corpus
mixing — three published recipes a pretraining pipeline runs corpus-wide.

Determinism lanes (PARITY.md): Kneser–Ney is rewritten as an
exact-integer scaled rational (the 0.75 discount becomes ×4 scaling);
FIM cut points come from seeded md5-prefix hashes (the
llm_shuffle_deterministic discipline) and the restructured corpus is
certified with an order-independent integer digest; temperature weights
use floor(sqrt·10⁶) scaled integers so the mixture normalizer is an
exact BIGINT sum.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from un_datapipeline_spark.registry import register
from un_datapipeline_spark.tables import (
    load_table,
    winner_document,
    winner_document_sql,
)


def _seed_hash(*cols: F.Column) -> F.Column:
    """First 6 md5 hex chars of the concatenated key as a BIGINT —
    the house seeded-randomness lane (reproducible across engines,
    epochs, and reruns; never rand())."""
    return F.conv(F.substring(F.md5(F.concat(*cols)), 1, 6), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# Kneser–Ney smoothed bigram LM
# ---------------------------------------------------------------------------

# P_KN(w2|w1) = (c12 - D)/c1 + D·(N1+(w1,·)/c1)·(N1+(·,w2)/T)  with D=3/4.
# Multiply through by 4·c1·T:  p·(4·c1·T) = 4·T·c12 - 3·T + 3·n1w1·n1w2
# — every term BIGINT-exact (observed bigrams have c12 ≥ 1 > D, so the
# max(c12-D, 0) clamp never binds).
_KN_ORACLE = """
WITH toked AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), bigrams AS (
  SELECT toks[i] AS w1, toks[i+1] AS w2
  FROM toked, LATERAL (
    SELECT unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i
  )
  WHERE toks[i] <> '' AND toks[i+1] <> ''
), counts AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bigrams GROUP BY w1, w2
), heads AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
         CAST(count(*) AS BIGINT) AS n1w1
  FROM counts GROUP BY w1
), conts AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS n1w2 FROM counts GROUP BY w2
), t AS (SELECT CAST(count(*) AS BIGINT) AS types FROM counts),
top_heads AS (
  SELECT w1, c1, n1w1 FROM heads ORDER BY c1 DESC, w1 ASC LIMIT 20
), scored AS (
  SELECT c.w1, c.w2, c.c12, h.c1,
         4 * t.types * c.c12 - 3 * t.types + 3 * h.n1w1 * co.n1w2 AS num,
         4 * h.c1 * t.types AS den
  FROM counts c
  JOIN top_heads h USING (w1)
  JOIN conts co USING (w2)
  CROSS JOIN t
)
SELECT w1, w2, c12,
       ROUND(CAST(num AS DOUBLE) / den, 6) AS p_kn
FROM scored
QUALIFY row_number() OVER (PARTITION BY w1 ORDER BY num DESC, w2 ASC) <= 3
"""


@register("llm_ngram_lm_kneser_ney", oracle=_KN_ORACLE, tier="T3")
def llm_ngram_lm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser–Ney smoothed bigram probabilities (Kneser & Ney 1995, the
    standard n-gram LM smoothing): absolute discount D=0.75 plus a
    continuation-probability backoff — the LM a perplexity-based
    quality filter actually wants, because raw MLE (llm_ngram_lm)
    assigns zero mass to unseen continuations.  Top-3 smoothed
    continuations for the 20 most frequent heads.

    Determinism lane (scaled rational): the whole formula is multiplied
    through by 4·c1·T so the rank key is an exact BIGINT — the 0.75
    discount never touches a float until the single output division.

    Scale shape: identical to llm_ngram_lm — every shuffle keyed by
    VOCABULARY (w1 / w2 / bigram), never corpus rows; the continuation
    table N1+(·,w2) is one extra vocabulary-sized aggregate, and the
    bigram-type total T is a singleton broadcast."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    pairs = F.filter(
        F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda s: (s["w1"] != "") & (s["w2"] != ""),
    )
    bigrams = d.select(F.explode(pairs).alias("bg")).select("bg.w1", "bg.w2")
    counts = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    heads = counts.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1w1")
    )
    conts = counts.groupBy("w2").agg(F.count(F.lit(1)).alias("n1w2"))
    t = counts.agg(F.count(F.lit(1)).alias("types"))
    top_heads = heads.orderBy(F.desc("c1"), F.asc("w1")).limit(20)
    scored = (
        counts.join(F.broadcast(top_heads), "w1")
        .join(conts, "w2")
        .crossJoin(F.broadcast(t))
        .select(
            "w1",
            "w2",
            "c12",
            (
                F.lit(4) * F.col("types") * F.col("c12")
                - F.lit(3) * F.col("types")
                + F.lit(3) * F.col("n1w1") * F.col("n1w2")
            ).alias("num"),
            (F.lit(4) * F.col("c1") * F.col("types")).alias("den"),
        )
    )
    w = Window.partitionBy("w1").orderBy(F.desc("num"), F.asc("w2"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "w1",
            "w2",
            "c12",
            F.round(F.col("num").cast("double") / F.col("den"), 6).alias("p_kn"),
        )
    )


# ---------------------------------------------------------------------------
# Fill-in-the-middle (FIM) restructuring
# ---------------------------------------------------------------------------

_FIM_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM {winner_document_sql()} documents
), cut AS (
  SELECT doc_id, source, toks, n,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':fim'), 1, 6))
              AS BIGINT) % 100 < 90 AS do_fim,
         1 + CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':c1'), 1, 6))
                  AS BIGINT) % (n - 1) AS h1,
         1 + CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':c2'), 1, 6))
                  AS BIGINT) % (n - 1) AS h2
  FROM toked WHERE n >= 4
), split AS (
  SELECT doc_id, source, n, do_fim,
         least(h1, h2) AS lo, greatest(h1, h2) AS hi
  FROM cut
), built AS (
  SELECT s.doc_id, s.source, s.n, s.do_fim,
         s.lo AS n_prefix, s.hi - s.lo AS n_middle, s.n - s.hi AS n_suffix,
         -- array_to_string(EMPTY, ' ') is NULL in DuckDB and || propagates
         -- it; Spark's concat_ws yields '' — coalesce pins the '' behavior.
         CASE WHEN s.do_fim THEN
           '<PRE>' || coalesce(array_to_string(t.toks[1:s.lo], ' '), '')
           || '<SUF>' || coalesce(array_to_string(t.toks[s.hi+1:s.n], ' '), '')
           || '<MID>' || coalesce(array_to_string(t.toks[s.lo+1:s.hi], ' '), '')
         ELSE array_to_string(t.toks, ' ') END AS out_text
  FROM split s JOIN toked t USING (doc_id)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(do_fim AS BIGINT)) AS BIGINT) AS n_fim,
       CAST(sum(CASE WHEN do_fim THEN n_prefix ELSE 0 END) AS BIGINT) AS prefix_words,
       CAST(sum(CASE WHEN do_fim THEN n_middle ELSE 0 END) AS BIGINT) AS middle_words,
       CAST(sum(CASE WHEN do_fim THEN n_suffix ELSE 0 END) AS BIGINT) AS suffix_words,
       CAST(sum(CAST(('0x' || substr(md5(out_text), 1, 12)) AS BIGINT))
            AS BIGINT) AS corpus_digest
FROM built GROUP BY source ORDER BY source
"""


@register("llm_fim_transform", oracle=_FIM_ORACLE, tier="T3")
def llm_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle restructuring (Bavarian et al. 2022,
    arXiv:2207.14255) in PSM order: for 90% of documents (seeded
    md5 coin, never rand()) two seeded cut points split the token
    stream into prefix/middle/suffix, re-emitted as
    <PRE>prefix<SUF>suffix<MID>middle so an autoregressive model learns
    infilling; the rest pass through untouched (the paper's FIM rate).
    Cut points are 1 + md5(doc_id:c1|c2) mod (n−1), so both cuts land
    in [1, n−1] and a zero-width middle (h1 = h2) is legal, exactly as
    the sampled-cut recipe specifies.

    The transformed corpus is certified byte-exactly: corpus_digest
    sums each output string's md5-prefix as a BIGINT (order-independent
    exact sum), so one flipped sentinel or off-by-one slice flips the
    hash — the llm_chat_template_apply discipline.

    Scale shape: pure per-row column expressions (split/slice/concat) —
    no shuffle until the final per-source aggregate; at 100 TB this is
    a map-only pass that fuses into whatever scan feeds it.

    Duplicate-key contract (round 10, R10_DUPKEYS_PLAN class 2): the
    seeded cuts are functions of doc_id — two texts under one
    re-crawled id get the SAME cut points on different token streams
    and the oracle's doc_id join fans out (probed: corpus digest
    mismatch).  Deterministic per-key winner on both sides."""
    d = winner_document(load_table(spark, sf_dir, "documents"))
    toked = d.select(
        "doc_id", "source", F.split("text", " ").alias("toks")
    ).withColumn("n", F.size("toks")).filter(F.col("n") >= 4)
    did = F.col("doc_id").cast("string")
    cut = toked.select(
        "doc_id",
        "source",
        "toks",
        "n",
        (_seed_hash(did, F.lit(":fim")) % 100 < 90).alias("do_fim"),
        (F.lit(1) + _seed_hash(did, F.lit(":c1")) % (F.col("n") - 1)).alias("h1"),
        (F.lit(1) + _seed_hash(did, F.lit(":c2")) % (F.col("n") - 1)).alias("h2"),
    )
    split = cut.select(
        "doc_id",
        "source",
        "toks",
        "n",
        "do_fim",
        F.least("h1", "h2").alias("lo"),
        F.greatest("h1", "h2").alias("hi"),
    )
    lo, hi, n = F.col("lo"), F.col("hi"), F.col("n")
    join = lambda part: F.concat_ws(" ", part)  # noqa: E731
    out_text = F.when(
        F.col("do_fim"),
        F.concat(
            F.lit("<PRE>"),
            join(F.slice("toks", F.lit(1), lo)),
            F.lit("<SUF>"),
            join(F.slice("toks", hi + 1, n - hi)),
            F.lit("<MID>"),
            join(F.slice("toks", lo + 1, hi - lo)),
        ),
    ).otherwise(join(F.col("toks")))
    built = split.select(
        "source",
        "do_fim",
        lo.alias("n_prefix"),
        (hi - lo).alias("n_middle"),
        (n - hi).alias("n_suffix"),
        out_text.alias("out_text"),
    )
    fim = F.when(F.col("do_fim"), F.lit(1)).otherwise(F.lit(0))
    masked = lambda c: F.when(F.col("do_fim"), F.col(c)).otherwise(F.lit(0))  # noqa: E731
    return (
        built.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(fim).cast("long").alias("n_fim"),
            F.sum(masked("n_prefix")).cast("long").alias("prefix_words"),
            F.sum(masked("n_middle")).cast("long").alias("middle_words"),
            F.sum(masked("n_suffix")).cast("long").alias("suffix_words"),
            F.sum(
                F.conv(F.substring(F.md5("out_text"), 1, 12), 16, 10).cast("long")
            ).cast("long").alias("corpus_digest"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Temperature-based corpus mixing
# ---------------------------------------------------------------------------

_BUDGET = 1_000_000_000  # token budget the mixture is normalized against

_TEMP_ORACLE = f"""
WITH per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS tokens
  FROM documents GROUP BY source
), scaled AS (
  SELECT *, CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS s
  FROM per_src
), norm AS (SELECT CAST(sum(s) AS BIGINT) AS total FROM scaled)
SELECT source, n_docs, tokens, s AS sqrt_scaled,
       ROUND(CAST(s AS DOUBLE) / total, 6) AS weight,
       ROUND(({_BUDGET}.0 * s) / (CAST(total AS DOUBLE) * tokens), 6) AS epochs
FROM scaled CROSS JOIN norm
ORDER BY source
"""


@register("llm_temperature_mixture", oracle=_TEMP_ORACLE, tier="T2")
def llm_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (the multilingual/multi-corpus
    sampling rule, α = 0.5): sampling weight w_i ∝ tokens_i^α, which
    up-samples small sources relative to proportional mixing without
    letting them dominate; `epochs` reports how many passes over each
    source a 10⁹-token budget implies (>1 means the source repeats —
    the practical overfitting check before a training run).

    Determinism lane: tokens_i^0.5 is snapped to the integer grid as
    floor(sqrt(tokens)·10⁶) — sqrt is IEEE exactly-rounded, so both
    engines floor the same double — making the normalizer an exact
    BIGINT sum; weight and epochs are single divisions of identical
    operands.

    Scale shape: one per-source aggregate (grain = #sources) + a
    singleton-normalizer broadcast — the whole mixture table is a few
    hundred rows no matter the corpus size."""
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("tokens"),
    )
    scaled = per_src.withColumn(
        "s",
        F.floor(F.sqrt(F.col("tokens").cast("double")) * 1000000.0).cast("long"),
    )
    norm = scaled.agg(F.sum("s").alias("total"))
    return (
        scaled.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "n_docs",
            "tokens",
            F.col("s").alias("sqrt_scaled"),
            F.round(F.col("s").cast("double") / F.col("total"), 6).alias("weight"),
            F.round(
                (F.lit(float(_BUDGET)) * F.col("s"))
                / (F.col("total").cast("double") * F.col("tokens")),
                6,
            ).alias("epochs"),
        )
        .orderBy("source")
    )
