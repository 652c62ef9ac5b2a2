"""K-ops: the UDF/UDAF/UDTF escape hatches (SURVEY.md §2 K1–K4).

Engine policy: these exist for semantics the native surface can't
express; every hot path elsewhere stays JVM-side. k1 is the
row-at-a-time anti-pattern kept as a declared-slow reference point;
k2/k3 are the sanctioned Arrow-batched forms; k4 is a Python UDTF
driven through SQL LATERAL.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from json2hbase_spark.io import load, register_views
from json2hbase_spark.registry import query


@query(
    "k1_udf_py",
    oracle="""
    SELECT doc_id,
           CASE WHEN n_chars < 150 THEN 'short'
                WHEN n_chars < 350 THEN 'medium'
                ELSE 'long' END AS size_bucket
    FROM documents
    """,
)
def k1_udf_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise Python UDF (the slow path — one Python round trip per
    row; kept only as the semantics reference for k2's batched form)."""

    @F.udf(returnType=StringType())
    def bucket(n: int) -> str:
        if n is None:
            return None
        if n < 150:
            return "short"
        if n < 350:
            return "medium"
        return "long"

    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", bucket("n_chars").alias("size_bucket"))


@query(
    "k2_udf_pandas",
    oracle="""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           round(list_aggregate(list_transform(range(1,65),
                   i -> CAST(embedding[i] AS DOUBLE) * qe[i]), 'sum'), 4) AS dot_q
    FROM embeddings, q
    """,
)
def k2_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow) pandas UDF: numpy batch dot products against
    a broadcast query vector — the sanctioned Python fast path
    (~10-100× over k1-style row UDFs). round(4): numpy's pairwise
    summation differs from a sequential fold in the last bits."""
    import numpy as np
    import pandas as pd

    def _batch_dot(a, b):
        am = np.asarray(a.tolist(), dtype=np.float64)
        bm = np.asarray(b.tolist(), dtype=np.float64)
        return pd.Series(np.einsum("ij,ij->i", am, bm))

    # explicit wrapper form: `from __future__ import annotations` makes
    # inline type hints strings, which pandas_udf can't introspect
    batch_dot = F.pandas_udf(_batch_dot, DoubleType())

    emb = load(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    return (
        emb.crossJoin(F.broadcast(qvec))
        .select("vec_id", F.round(batch_dot("embedding", "qe"), 4).alias("dot_q"))
    )


@query(
    "k3_udaf_pandas",
    oracle="""
    SELECT lang,
           round(exp(avg(ln(n_chars))), 4) AS geo_mean_chars,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang
    """,
)
def k3_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via applyInPandas (grouped-map): geometric mean
    of doc lengths per language. round(4): numpy mean is pairwise."""
    import numpy as np
    import pandas as pd

    def geo_mean(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "geo_mean_chars": [
                    round(float(np.exp(np.log(pdf["n_chars"].to_numpy(np.float64)).mean())), 4)
                ],
                "n_docs": [len(pdf)],
            }
        )

    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").applyInPandas(
        geo_mean, "lang STRING, geo_mean_chars DOUBLE, n_docs BIGINT"
    )


@query(
    "k4_udtf",
    oracle="""
    SELECT doc_id, i.i AS pos, substr(text, i.i + 1, 8) AS shingle
    FROM documents,
         (SELECT unnest(range(0, (SELECT max(len(text)) FROM documents), 4)) AS i) i
    WHERE doc_id < 30 AND i.i + 8 <= len(text)
    """,
)
def k4_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): doc → strided 8-gram shingle rows,
    invoked through SQL LATERAL — the row-expanding escape hatch."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id BIGINT, pos INT, shingle STRING")
    class Shingler:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            for pos in range(0, len(text) - 7, 4):
                yield doc_id, pos, text[pos : pos + 8]

    spark.udtf.register("shingler", Shingler)
    register_views(spark, sf_dir, only=("documents",))
    return spark.sql(
        """
        SELECT s.doc_id, s.pos, s.shingle
        FROM documents d, LATERAL shingler(d.doc_id, d.text) s
        WHERE d.doc_id < 30
        """
    )


@query(
    "k5_udf_arrow",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[aeiou]')) AS n_vowels,
           len(text) AS n_chars
    FROM documents
    WHERE doc_id < 300
    """,
)
def k5_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 4 ``useArrow=True``): same
    authoring model as k1's row UDF but the exchange is Arrow record
    batches instead of pickled rows — the zero-rewrite upgrade path
    that removes most of the serialization tax while staying a scalar
    Python function (k2's pandas_udf remains the fully vectorized
    form)."""
    import re

    @F.udf(returnType="long", useArrow=True)
    def vowels(s: str) -> int:
        if s is None:
            return None
        return len(re.findall(r"[aeiou]", s.lower()))

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return docs.select(
        "doc_id",
        vowels("text").alias("n_vowels"),
        F.length("text").alias("n_chars"),
    )


@query(
    "k6_map_in_arrow",
    oracle=f"""
    SELECT vec_id, label,
           round(list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'sum'), 4)
             AS l1_norm
    FROM embeddings
    WHERE vec_id < 400
    """,
)
def k6_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow batch transform: the whole partition streams through
    Python as Arrow RecordBatches and pyarrow.compute kernels do the
    math (C++, zero-copy) — the right escape hatch when a per-batch
    library (tokenizers, codecs, ANN libs) wants columnar memory, not
    rows. Here: L1 norm of each embedding via list_flatten +
    grouped sum over the flattened values. Floats: abs-sum folds in
    index order in both engines; round(4) per the exact.py
    convention."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def l1(batches):
        for batch in batches:
            tbl = pa.table(
                {
                    "vec_id": batch.column("vec_id"),
                    "label": batch.column("label"),
                    "emb": batch.column("embedding"),
                }
            )
            flat = pc.abs(pc.cast(pc.list_flatten(tbl["emb"]), pa.float64()))
            lengths = pc.list_value_length(tbl["emb"]).to_numpy(zero_copy_only=False)
            import numpy as np

            idx = np.repeat(np.arange(len(tbl)), lengths)
            sums = np.zeros(len(tbl))
            np.add.at(sums, idx, flat.to_numpy(zero_copy_only=False))
            out = pa.record_batch(
                {
                    "vec_id": tbl["vec_id"].combine_chunks(),
                    "label": tbl["label"].combine_chunks(),
                    "l1_norm": pa.array(sums, pa.float64()),
                }
            )
            yield out

    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400)
    raw = emb.mapInArrow(l1, "vec_id LONG, label INT, l1_norm DOUBLE")
    # round ENGINE-side: numpy's np.round is half-even while Spark and
    # DuckDB round() are half-away-from-zero — rounding must happen in
    # the engine so both sides share tie-breaking semantics
    return raw.select("vec_id", "label", F.round("l1_norm", 4).alias("l1_norm"))


@query(
    "k7_udtf_analyze",
    oracle="""
    WITH cols AS (SELECT unnest(['l_quantity', 'l_discount']) AS col),
    stats AS (
      SELECT 'l_quantity' AS col,
             round(min(l_quantity), 4) AS mn,
             round(max(l_quantity), 4) AS mx,
             COUNT(*) AS n
      FROM lineitem
      UNION ALL
      SELECT 'l_discount',
             round(min(l_discount), 4),
             round(max(l_discount), 4),
             COUNT(*)
      FROM lineitem
    )
    SELECT col, mn, mx, n FROM stats
    """,
)
def k7_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze`` static method):
    the output schema is computed AT PLAN TIME from the call's literal
    arguments — the table-function shape libraries use for
    profile/describe-style helpers whose columns depend on what you
    ask for. Here a stats profiler takes column names as a literal
    and emits one row per requested column; the aggregation itself
    runs in the engine beforehand (the UDTF only reshapes the tiny
    agg row — Python never sees the 600k-row table)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    @udtf
    class ProfileReshaper:
        @staticmethod
        def analyze(*args):
            from pyspark.sql.udtf import AnalyzeResult

            # schema built programmatically: the analyze worker has no
            # active session, so StructType.fromDDL is unavailable here
            schema = StructType(
                [
                    StructField("col", StringType()),
                    StructField("mn", DoubleType()),
                    StructField("mx", DoubleType()),
                    StructField("n", LongType()),
                ]
            )
            return AnalyzeResult(schema=schema)

        def eval(self, *row_vals):
            # row layout: (name1, mn1, mx1, n1, name2, mn2, mx2, n2, ...)
            for i in range(0, len(row_vals), 4):
                yield row_vals[i], row_vals[i + 1], row_vals[i + 2], row_vals[i + 3]

    spark.udtf.register("profile_reshaper", ProfileReshaper)
    li = load(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.round(F.min("l_quantity"), 4).alias("q_mn"),
        F.round(F.max("l_quantity"), 4).alias("q_mx"),
        F.count(F.lit(1)).alias("q_n"),
        F.round(F.min("l_discount"), 4).alias("d_mn"),
        F.round(F.max("l_discount"), 4).alias("d_mx"),
        F.count(F.lit(1)).alias("d_n"),
    )
    # unique view name: two concurrent k7 runs in one session must not
    # clobber each other's staged agg row
    view = f"k7_agg_{uuid.uuid4().hex[:12]}"
    agg.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT s.col, s.mn, s.mx, s.n
        FROM {view} a, LATERAL profile_reshaper(
          'l_quantity', a.q_mn, a.q_mx, a.q_n,
          'l_discount', a.d_mn, a.d_mx, a.d_n) s
        """
    )


@query(
    "k8_cogroup_pandas",
    oracle="""
    SELECT o.o_orderkey, o.o_orderpriority,
           COUNT(l.l_orderkey) AS n_lines,
           CAST(COALESCE(SUM(CAST(l.l_quantity AS BIGINT)), 0) AS BIGINT) AS total_qty
    FROM orders o
    LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey % 100 = 0
    GROUP BY o.o_orderkey, o.o_orderpriority
    """,
)
def k8_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas (the two-sided grouped-map surface,
    completing the K family): orders and lineitem cogrouped per
    orderkey, each Python call receiving BOTH sides' rows for one key
    — the escape hatch for per-key reconciliation logic (matching
    engines, custom conformance checks) that a join+agg can't express
    imperatively. Key slice (1/100th) keeps the Arrow transfer volume
    proportional in the bench while exercising empty-side handling;
    quantities are integral doubles, summed as int64 (exact). At
    100 TB both sides co-shuffle once on the key — same cost shape
    as a shuffled join."""
    import pandas as pd

    def reconcile(key, orders_pdf: pd.DataFrame, lines_pdf: pd.DataFrame) -> pd.DataFrame:
        if orders_pdf.empty:  # lineitem without order: not emitted (left semantics)
            return pd.DataFrame(
                columns=["o_orderkey", "o_orderpriority", "n_lines", "total_qty"]
            )
        return pd.DataFrame(
            {
                "o_orderkey": [int(key[0])],
                "o_orderpriority": [orders_pdf["o_orderpriority"].iloc[0]],
                "n_lines": [len(lines_pdf)],
                "total_qty": [int(lines_pdf["l_quantity"].sum()) if len(lines_pdf) else 0],
            }
        )

    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", "o_orderpriority")
    )
    lines = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select("l_orderkey", "l_quantity")
    )
    return (
        orders.groupBy("o_orderkey")
        .cogroup(lines.groupBy("l_orderkey"))
        .applyInPandas(
            reconcile,
            "o_orderkey BIGINT, o_orderpriority STRING, n_lines BIGINT, total_qty BIGINT",
        )
    )


@query(
    "k9_udtf_table_arg",
    oracle="""
    WITH d AS (
      SELECT lang, n_chars,
             lag(n_chars) OVER (PARTITION BY lang ORDER BY doc_id) AS prev
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN prev IS NOT NULL AND n_chars > prev THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ascents
    FROM d GROUP BY lang
    """,
)
def k9_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF consuming a TABLE ARGUMENT with PARTITION BY /
    ORDER BY (Spark 4) — the per-group ORDERED-ITERATION escape hatch:
    the engine shuffles rows into language partitions, orders each by
    doc_id, and streams the partition through one stateful Python
    instance (``eval`` per row, ``terminate`` emits the group row).
    The demo state machine counts length ascents between consecutive
    docs — a computation that needs ordered traversal — and the
    oracle reproduces it with lag()+agg, proving the partition/order
    contract end-to-end. This is the modern replacement for RDD
    groupByKey+mapValues loops: the shuffle and ordering stay in the
    engine, only the per-group fold is Python. At 100 TB each group
    streams Arrow batches through a worker — group size, not corpus
    size, bounds memory."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="lang string, n_docs bigint, n_ascents bigint")
    class AscentCounter:
        def __init__(self):
            self._lang = None
            self._n = 0
            self._asc = 0
            self._prev = None

        def eval(self, row):
            self._lang = row["lang"]
            self._n += 1
            if self._prev is not None and row["n_chars"] > self._prev:
                self._asc += 1
            self._prev = row["n_chars"]

        def terminate(self):
            if self._n:
                yield self._lang, self._n, self._asc

    spark.udtf.register("k9_ascents", AscentCounter)
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    view = f"k9_docs_{uuid.uuid4().hex[:12]}"
    docs.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT lang, n_docs, n_ascents
        FROM k9_ascents(TABLE({view}) PARTITION BY lang ORDER BY doc_id)
        """
    )
