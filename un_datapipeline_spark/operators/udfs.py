"""UDF / UDAF / UDTF surface (SURVEY.md §2.J) + map construction (§2.H).

These operators exist to exercise the Python-execution boundary itself —
everywhere else in the engine the rule is "stay JVM-side" (SURVEY.md
§4.3).  All Python paths here are Arrow-batched (pandas_udf /
applyInPandas / arrow-optimized UDTF); the one deliberately row-at-a-time
plain UDF is kept on a small aggregate input.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Tuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import StringType

from un_datapipeline_spark.registry import register
from un_datapipeline_spark.tables import cents2_sum_sql, cents_sum_sql, load_table

# The explicit IS NULL branch (round 9, class 4): without it a NULL
# price would fall through every WHEN into ELSE 'XL' — an unpriced order
# is not an extra-large one; its bucket is unknown on both engines.
_PY_SCALAR_ORACLE = """
SELECT CASE WHEN o_totalprice IS NULL  THEN NULL
            WHEN o_totalprice < 50000  THEN 'S'
            WHEN o_totalprice < 150000 THEN 'M'
            WHEN o_totalprice < 300000 THEN 'L'
            ELSE 'XL' END AS bucket,
       count(*) AS n
FROM orders
GROUP BY bucket
"""


@register("udf_python_scalar", oracle=_PY_SCALAR_ORACLE, tier="T3")
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain (row-at-a-time) Python UDF bucketing order totals.  The slow
    path by design — the CASE-expression oracle shows what the engine
    would use in production."""

    def bucket(p: float) -> str:
        # None-total (round 9, class 4): a plain Python UDF receives SQL
        # NULL as None — `None < 50000` is a worker-killing TypeError.
        if p is None:
            return None
        if p < 50000:
            return "S"
        if p < 150000:
            return "M"
        if p < 300000:
            return "L"
        return "XL"

    bucket_udf = F.udf(bucket, StringType())
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(bucket_udf("o_totalprice").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )


_PD_SCALAR_ORACLE = """
SELECT l_returnflag,
       ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS net_rev,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


@register("udf_pandas_scalar", oracle=_PD_SCALAR_ORACLE, tier="T3")
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized net-price via @pandas_udf — Arrow batches in, numpy
    arithmetic, Arrow out (~10-100× the plain-UDF throughput)."""

    @pandas_udf("double")
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn("net", net_price("l_extendedprice", "l_discount"))
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("net"), 4).alias("net_rev"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_GROUPED_MAP_ORACLE = f"""
WITH m AS (
  SELECT event_type,
         count(value) AS n,
         {cents_sum_sql()} AS s,
         {cents2_sum_sql()} AS ss
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       CASE WHEN m.n >= 2 THEN
         -- greatest(0.0, ...): mirror of the Python kernel's max(0.0,
         -- ...) variance clamp — a constant series whose moments pass
         -- 2^53 can leave this float expression slightly NEGATIVE,
         -- where sqrt(negative) is NaN/error here but NULL-via-clamp
         -- on the Spark side (ADVICE r11)
         ROUND((e.value - CAST(m.s AS BIGINT) / (100.0 * m.n))
               / nullif(sqrt(greatest(0.0,
                             (CAST(CAST(m.ss AS VARCHAR) AS DOUBLE)
                              - CAST(CAST(m.s AS BIGINT) AS DOUBLE)
                                * CAST(CAST(m.s AS BIGINT) AS DOUBLE) / m.n)
                             / (m.n - 1))) / 100.0, 0), 6)
       END AS z
-- IS NOT DISTINCT FROM: a NULL event_type is a real group (the --nulls
-- corpus) — plain equality would drop its rows where Spark's groupBy
-- keeps NULL keys (the old window form partitioned them correctly;
-- the join mirror must too)
FROM events e JOIN m ON e.event_type IS NOT DISTINCT FROM m.event_type
"""


@register("udf_grouped_map", oracle=_GROUPED_MAP_ORACLE, tier="T3")
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score per event_type via applyInPandas (grouped-map): each group
    arrives as one pandas DataFrame.  The moments come from EXACT integer
    cents (Python-int arithmetic — arbitrary precision, no silent wrap)
    so mean/std are the same doubles on both engines at ANY surviving
    magnitude; a float .mean()/.std() would drift against the oracle
    once one large measurement survives ingest (magnitude-v2 contract).
    Both sides evaluate the literal same double expression
    sqrt((ss - s*s/n)/(n-1))/100 over identical integer operands."""

    from un_datapipeline_spark.tables import cents_np

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        ok = v.notna()
        n = int(ok.sum())
        if n >= 2:
            # shared correctly-rounded HALF-AWAY cents kernel
            # (tables.cents_np; ADVICE r11): pandas .round() is
            # half-even (12.5 cents would diverge) and floor(abs+0.5)
            # mis-rounds the double just below .5.
            cents = cents_np(v[ok])
            s = int(cents.sum())
            ss = int((cents * cents).sum())
            mu = s / (100.0 * n)
            # max(0): for >2^53 moments the float conversions can leave
            # a tiny NEGATIVE variance on a constant series — Python
            # (-x)**0.5 silently returns a COMPLEX number.
            var = max(0.0, (float(ss) - float(s) * float(s) / n) / (n - 1))
            sd = var**0.5 / 100.0
            pdf["z"] = ((v - mu) / sd).round(6) if sd else float("nan")
        else:
            pdf["z"] = float("nan")
        return pdf[["event_id", "event_type", "z"]]

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return e.groupBy("event_type").applyInPandas(
        zscore, "event_id long, event_type string, z double"
    )


_GROUPED_AGG_ORACLE = """
SELECT l_returnflag,
       ROUND(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price
FROM lineitem
GROUP BY l_returnflag
"""


@register("udaf_grouped_agg", oracle=_GROUPED_AGG_ORACLE, tier="T3")
def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted mean price per returnflag via a GROUPED_AGG
    pandas_udf (one scalar per group).  4dp rounding absorbs summation-
    order noise between numpy pairwise and DuckDB sequential sums."""

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 4).alias("wavg_price")
    )


_UDTF_ORACLE = """
SELECT word, n FROM (
  SELECT word, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> ''
  GROUP BY word
)
ORDER BY n DESC, word
LIMIT 20
"""


@register("udtf_split_words", oracle=_UDTF_ORACLE, tier="T3")
def udtf_split_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF exploding text into words (one input row → many output
    rows), lateral-joined in SQL, feeding a top-20 word count."""

    @udtf(returnType="word: string")
    class SplitWords:
        def eval(self, text: str):
            if text:
                for w in text.split(" "):
                    if w:
                        yield (w,)

    from un_datapipeline_spark.tables import register_temp_views

    register_temp_views(spark, sf_dir)
    spark.udtf.register("split_words", SplitWords)
    return spark.sql(
        """
        SELECT word, count(*) AS n
        FROM documents, LATERAL split_words(text)
        GROUP BY word
        ORDER BY n DESC, word
        LIMIT 20
        """
    )


# coalesce(lang, '<null>') (round 9, class 4 — decision made r08): a
# NULL group key is real data (docs with unknown lang) and Spark cannot
# hold a NULL map key at all (NULL_MAP_KEY), so the unknown-lang bucket
# gets an explicit name on BOTH sides and its count is preserved.
_MAP_ORACLE = """
SELECT source,
       array_to_string(list_sort(list(lang || ':' || CAST(n AS VARCHAR))), '|')
         AS lang_counts,
       array_to_string(list_sort(list(lang)), '|') AS langs
FROM (
  SELECT source, coalesce(lang, '<null>') AS lang, count(*) AS n
  FROM documents
  GROUP BY source, coalesce(lang, '<null>')
)
GROUP BY source
"""


@register("fn_map", oracle=_MAP_ORACLE, tier="T3")
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction per source: lang→count built with
    map_from_entries(collect_list(struct(...))), then re-emitted as
    sorted 'lang:count' entry strings + sorted key list — map iteration
    order is engine-specific, so both sides compare sorted projections
    (SURVEY.md §2.H note), serialized with array_join because the
    driver's canonicalizer cannot hash raw array cells (r1 HARNESS-ERR
    class of failure, caught locally by tests/strict_diff.py)."""
    d = load_table(spark, sf_dir, "documents")
    # unknown-lang bucket named explicitly — see _MAP_ORACLE note
    per = d.groupBy(
        "source", F.coalesce(F.col("lang"), F.lit("<null>")).alias("lang")
    ).agg(F.count(F.lit(1)).alias("n"))
    m = F.map_from_entries(F.collect_list(F.struct("lang", "n")))
    return per.groupBy("source").agg(
        F.array_join(
            F.sort_array(
                F.transform(
                    F.map_entries(m),
                    lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
                )
            ),
            "|",
        ).alias("lang_counts"),
        F.array_join(F.sort_array(F.map_keys(m)), "|").alias("langs"),
    )


_DYNUDTF_ORACLE = """
SELECT o_orderkey,
       o_orderstatus AS status,
       o_orderpriority AS priority,
       strftime(o_orderdate, '%Y-%m-%d') AS odate
FROM orders
"""


@register("udtf_dynamic_schema", oracle=_DYNUDTF_ORACLE, tier="T2")
def udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4 ``analyze`` API): the output
    schema is computed AT ANALYSIS TIME from the literal column-spec
    argument — one output column per spec field — so the same UDTF
    unpacks any delimited payload without a per-layout registration
    (udtf_split_words is the fixed-schema baseline; this is the
    schema-on-read version a log-parsing pipeline needs).  The packed
    string is rebuilt from orders columns, the UDTF splits it back, and
    the oracle takes the fields straight from the source — the hash
    proves the analyze/eval pair is lossless.  Per-row Python, so this
    is §2.J boundary surface, not a hot-path recommendation."""
    from pyspark.sql.functions import udtf as udtf_deco
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf_deco
    class UnpackCols:
        @staticmethod
        def analyze(
            spec: AnalyzeArgument, row: AnalyzeArgument
        ) -> AnalyzeResult:
            names = spec.value.split(",")
            return AnalyzeResult(
                StructType([StructField(n, StringType()) for n in names])
            )

        def eval(self, spec: str, row: str):
            # chr(0) sentinel → None (round 9, class 4): the pack side
            # coalesces NULL fields to NUL so the payload keeps its field
            # COUNT (concat_ws silently drops null args — a NULL priority
            # would shift every later field left and break the arity).
            yield tuple(None if f == "\x00" else f for f in row.split("|"))

    spark.udtf.register("udps_unpack_cols", UnpackCols)
    o = load_table(spark, sf_dir, "orders")
    nul = F.lit("\x00")
    o.select(
        "o_orderkey",
        F.concat_ws(
            "|",
            F.coalesce(F.col("o_orderstatus"), nul),
            F.coalesce(F.col("o_orderpriority"), nul),
            F.coalesce(F.date_format("o_orderdate", "yyyy-MM-dd"), nul),
        ).alias("packed"),
    ).createOrReplaceTempView("udps_packed_orders")
    return spark.sql(
        """
        SELECT t.o_orderkey, s.*
        FROM udps_packed_orders t,
        LATERAL udps_unpack_cols('status,priority,odate', t.packed) s
        """
    )


_ARROW_GROUPED_ORACLE = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
       CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("udf_grouped_arrow", oracle=_ARROW_GROUPED_ORACLE, tier="T2")
def udf_grouped_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped map through the Spark 4 ``applyInArrow`` API — the zero-
    pandas Python boundary: each group arrives as a ``pyarrow.Table``
    and the kernel runs pyarrow.compute directly on Arrow buffers, so
    there is no Arrow→pandas materialization on either side (the copy
    ``applyInPandas`` pays twice per group, and the pitfall: output
    arrays must be explicitly typed — ``pa.array(..., type=...)`` —
    because an untyped Python-list array infers a schema that fails the
    declared-schema check in the worker, probed).  The kernel computes
    exact integer aggregates (cent sums via round-then-cast BIGINT), so
    the DuckDB oracle hash-matches bit-for-bit.  Same scale contract as
    every grouped map: one shuffle on the group key, per-group memory
    bounded by the largest group — for unbounded groups, pre-aggregate
    or use mapInArrow over partitions instead."""
    import pyarrow as pa
    import pyarrow.compute as pc

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )

    def kernel(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"), 100)), pa.int64())
        qty = pc.cast(t.column("l_quantity"), pa.int64())
        return pa.table(
            {
                "l_returnflag": pa.array([t.column("l_returnflag")[0].as_py()], type=pa.string()),
                "n": pa.array([t.num_rows], type=pa.int64()),
                "cents": pa.array([pc.sum(cents).as_py()], type=pa.int64()),
                "max_qty": pa.array([pc.max(qty).as_py()], type=pa.int64()),
            }
        )

    return (
        li.groupBy("l_returnflag")
        .applyInArrow(kernel, "l_returnflag string, n long, cents long, max_qty long")
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# mapInArrow: zero-pandas whole-partition Arrow transform
# ---------------------------------------------------------------------------

_MAP_ARROW_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
       CAST(sum(len(props)) AS BIGINT) AS props_chars
FROM events
GROUP BY event_type ORDER BY event_type
"""


@register("udf_map_arrow", oracle=_MAP_ARROW_ORACLE, tier="T2")
def udf_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the NON-grouped member of the Arrow UDF family
    (udf_grouped_arrow covers applyInArrow, udf_pandas_scalar the pandas
    lane): each partition streams through Python as raw
    pyarrow.RecordBatch objects with zero pandas materialization, the
    kernel computes integer cents and props-length via pyarrow.compute
    (vectorized C++, no per-row Python), and the post-map aggregation
    stays JVM-side.  Output arrays are explicitly typed — the
    applyInArrow lesson (pa.array(..., type=...)) applies here too.

    Scale shape: one Arrow IPC pass per partition, constant-memory
    batch streaming (spark.sql.execution.arrow.maxRecordsPerBatch), no
    shuffle added — the cheapest possible Python escape hatch when a
    kernel genuinely needs Python but not pandas."""
    import pyarrow as pa
    import pyarrow.compute as pc

    e = load_table(spark, sf_dir, "events").select("event_type", "value", "props")

    def kernel(batches):
        for b in batches:
            # round_mode: pyarrow's default is HALF_TO_EVEN, which
            # diverges from Spark F.round / DuckDB round() (both
            # half-away-from-zero) on exact .5 boundaries — the
            # magnitude corpus's -0.125 stripe (= -12.5 cents) was a
            # 16-cent silent group-sum divergence (r12 sweep catch);
            # half_towards_infinity is arrow's half-away mode and is
            # correctly rounded on the actual double (no +0.5 carry).
            cents = pc.round(
                pc.multiply(b.column("value"), 100.0),
                round_mode="half_towards_infinity",
            )
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("event_type"),
                    pa.array(
                        pc.cast(cents, pa.int64()).to_pylist(), type=pa.int64()
                    ),
                    pc.cast(pc.utf8_length(b.column("props")), pa.int64()),
                ],
                names=["event_type", "cents", "props_chars"],
            )

    mapped = e.mapInArrow(
        kernel, "event_type string, cents long, props_chars long"
    )
    return (
        mapped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("long").alias("cents"),
            F.sum("props_chars").cast("long").alias("props_chars"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Iterator-form pandas UDF (expensive-init amortization lane)
# ---------------------------------------------------------------------------

_ITER_UDF_ORACLE = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
         AS disc_units
FROM lineitem GROUP BY l_returnflag
"""


@register("udf_pandas_iter", oracle=_ITER_UDF_ORACLE, tier="T2")
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas UDF (Iterator[Series] → Iterator[Series]) —
    the Arrow lane whose POINT is one-time initialization per worker:
    anything expensive (a model handle, a codec table, a tokenizer)
    loads once in the generator prologue and then serves every Arrow
    batch of the partition, instead of once per batch like the plain
    scalar pandas_udf.  Here the "expensive resource" is a trivial
    rate table so the oracle stays exact: the UDF emits the exact
    integer discounted-revenue units (cents·(100−bp)) per row, and the
    aggregate is a plain BIGINT sum — numerically identical to the
    pure-SQL lane, proving the boundary crossing is lossless."""
    # NB: the Iterator/Tuple names must be MODULE-level imports — under
    # `from __future__ import annotations` pyspark resolves the string
    # hints against function globals, so function-local imports make the
    # signature unrecognizable (UNSUPPORTED_SIGNATURE, probed).
    @pandas_udf("long")
    def disc_units(
        it: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        # one-time per-worker init happens HERE (before the first batch)
        scale = 100  # stand-in for an expensive-to-load resource
        for p, d in it:
            # nullable Int64 (round 9, class 4): SQL NULL arrives as NaN,
            # and numpy .astype("int64") on NaN is a worker crash (or,
            # via to_numpy, a silent INT64_MIN).  The pandas extension
            # dtype carries <NA> through the arithmetic and back to SQL
            # NULL at the Arrow boundary — the row drops out of SUM on
            # both engines.
            cents = (p * scale).round().astype("Int64")
            bp = (d * scale).round().astype("Int64")
            yield cents * (100 - bp)

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            disc_units(F.col("l_extendedprice"), F.col("l_discount")).alias("units"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("units").cast("long").alias("disc_units"),
        )
    )


# ---------------------------------------------------------------------------
# TABLE-argument UDTF (Spark 4 polymorphic table function over a relation)
# ---------------------------------------------------------------------------

_UDTF_TABLE_ORACLE = """
SELECT o_custkey AS custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       min(o_orderdate) AS first_order,
       max(o_orderdate) AS last_order,
       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders GROUP BY o_custkey
"""


@register("udtf_table_arg", oracle=_UDTF_TABLE_ORACLE, tier="T2")
def udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF consuming a TABLE(...) argument with PARTITION BY /
    ORDER BY (Spark 4's polymorphic table functions): the engine
    partitions the relation, streams each partition's rows through
    eval() IN ORDER, and terminate() emits the per-partition summary —
    the surface for per-key sequential logic (sessionizers, legacy
    per-account state machines) that a set-oriented aggregate can't
    host.  Verified against the plain GROUP BY oracle, proving the
    partition-stream plumbing delivers every row exactly once.

    Scale shape: PARTITION BY shuffles once on the key; UDTF state is
    one accumulator per key, never the partition's rows."""

    @udtf(returnType=(
        "custkey long, n_orders long, first_order timestamp, "
        "last_order timestamp, total_cents long"
    ))
    class OrderStats:
        def __init__(self):
            self.key = None
            self.n = 0
            self.first = None
            self.last = None
            # None until the first priced order (round 9, class 4): the
            # SQL SUM of an all-NULL group is NULL, not 0 — seeding 0
            # would diverge for a customer whose every order is unpriced.
            self.cents = None

        def eval(self, row):
            self.key = row["o_custkey"]
            self.n += 1
            d = row["o_orderdate"]
            # rows arrive ordered by o_orderdate: first = first seen
            if self.first is None:
                self.first = d
            self.last = d
            tp = row["o_totalprice"]
            if tp is not None:  # NULL price: no SUM contribution
                self.cents = (self.cents or 0) + int(round(tp * 100))

        def terminate(self):
            if self.key is not None:
                yield self.key, self.n, self.first, self.last, self.cents

    name = "order_stats_udtf"
    spark.udtf.register(name, OrderStats)
    o = load_table(spark, sf_dir, "orders")
    view = "orders_for_udtf"
    o.createOrReplaceTempView(view)
    # NB: multiple ORDER BY expressions in a TABLE argument must be
    # parenthesized — bare `ORDER BY a, b` is a parse error (probed).
    return spark.sql(
        f"SELECT * FROM {name}(TABLE({view}) "
        "PARTITION BY o_custkey ORDER BY (o_orderdate, o_orderkey))"
    )
