"""Round-6 curation operators: rule-based quality gating (j80), LSH
parameter calibration (j81), feature-hashed doc vectors (j82),
exact-arithmetic PPS sampling (j83), vocabulary coverage curves (j84),
duplicate-cluster morphology (j85), plus two everyday scalar-function
bundles (h18 regexp, h19 struct ordering).

Design notes shared by the family:

- Ratio-style predicates are integer cross-multiplications
  (``3*nw <= tl`` instead of ``tl/nw >= 3``): no float compare, no
  engine divergence, and Catalyst folds them into the same codegen'd
  comparisons.
- Detection probabilities (j81) are built from repeated squaring only
  (exponents are powers of two), so Spark and DuckDB evaluate the
  identical IEEE multiplication tree — no pow(), whose libm rounding
  is not contractually identical across engines.
- Sampling (j83) is content-addressed (md5 permutation key) and the
  pick arithmetic is pure BIGINT (``(cum*K) div W``), the same
  reproducibility posture as j62/j19: a rerun on any engine emits the
  identical sample.
- All randomness-free: the whole family passes
  tools/determinism_check.py by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from json2hbase_spark.io import load, widen
from json2hbase_spark.materialize import materialize
from json2hbase_spark.operators.prefix import (
    CUMSUM_BUCKETS,
    bucketed_cumsum,
    hex_prefix_bucket,
)
from json2hbase_spark.operators.text import whitespace_tokens
from json2hbase_spark.registry import query

# ---------------------------------------------------------------- j80

GOPHER_STOPWORDS = ("the", "a", "be", "to", "of", "and", "that", "have", "with", "it")
_DUCK_STOPS = "[" + ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS) + "]"


@query(
    "j80_gopher_quality",
    oracle=f"""
    WITH feats AS (
      SELECT
        len(w) AS nw,
        CAST(COALESCE(list_aggregate(list_transform(w, x -> len(x)), 'sum'), 0)
             AS BIGINT) AS tl,
        len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS aw,
        len(list_filter({_DUCK_STOPS}::VARCHAR[],
                        s -> list_contains(list_transform(w, x -> lower(x)), s)))
          AS sw
      FROM (SELECT list_filter(string_split(text, ' '), x -> x != '') AS w
            FROM documents)
    ),
    agg AS (
      SELECT COUNT(*) AS c0,
             CAST(SUM(CASE WHEN nw BETWEEN 20 AND 100000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN nw BETWEEN 20 AND 100000
                       AND 3 * nw <= tl AND tl <= 10 * nw THEN 1 ELSE 0 END)
                  AS BIGINT) AS c2,
             CAST(SUM(CASE WHEN nw BETWEEN 20 AND 100000
                       AND 3 * nw <= tl AND tl <= 10 * nw
                       AND 5 * aw > 4 * nw THEN 1 ELSE 0 END)
                  AS BIGINT) AS c3,
             CAST(SUM(CASE WHEN nw BETWEEN 20 AND 100000
                       AND 3 * nw <= tl AND tl <= 10 * nw
                       AND 5 * aw > 4 * nw
                       AND sw >= 2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c4
      FROM feats
    )
    SELECT '1_word_count' AS stage, c0 AS n_in, c1 AS n_out,
           CAST(c1 AS DOUBLE) / c0 AS keep_frac FROM agg
    UNION ALL
    SELECT '2_mean_word_len', c1, c2, CAST(c2 AS DOUBLE) / c0 FROM agg
    UNION ALL
    SELECT '3_alpha_fraction', c2, c3, CAST(c3 AS DOUBLE) / c0 FROM agg
    UNION ALL
    SELECT '4_stopword_presence', c3, c4, CAST(c4 AS DOUBLE) / c0 FROM agg
    """,
)
def j80_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule funnel (Rae et al. 2021 §A1.1, the quality
    gate every web-corpus pipeline runs before model-based scoring):
    word count ∈ [20, 100k] → mean word length ∈ [3, 10] →
    alphabetic-word fraction > 0.8 → ≥2 distinct stopwords present,
    applied as a FUNNEL with per-stage attrition (n_in → n_out per
    rule plus corpus-relative survivor fraction) so the report shows
    WHICH rule cuts what — the number a curation review actually
    wants, not just the final keep set. Every predicate is integer
    cross-multiplication (mean-length bound as 3·nw ≤ Σlen ≤ 10·nw,
    alpha fraction as 5·aw > 4·nw): no float compares to drift
    cross-engine. Plan: one narrow projection computes all four
    features per doc, one hash agg folds the four cumulative stage
    counts map-side; the funnel rows are a 4-literal explode of that
    single agg row — a 100 TB corpus pays one scan, one exchange of
    five longs."""
    docs = load(spark, sf_dir, "documents")
    w = whitespace_tokens(F.col("text"))
    wl = F.transform(w, lambda x: F.lower(x))
    stops = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    feats = docs.select(
        F.size(w).alias("nw"),
        F.aggregate(
            w, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ).alias("tl"),
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).alias("aw"),
        F.size(F.filter(stops, lambda s: F.array_contains(wl, s))).alias("sw"),
    )
    p1 = F.col("nw").between(20, 100000)
    p2 = p1 & (3 * F.col("nw") <= F.col("tl")) & (F.col("tl") <= 10 * F.col("nw"))
    p3 = p2 & (5 * F.col("aw") > 4 * F.col("nw"))
    p4 = p3 & (F.col("sw") >= 2)
    one = lambda p: F.sum(F.when(p, 1).otherwise(0))  # noqa: E731
    agg = feats.agg(
        F.count("*").alias("c0"),
        one(p1).alias("c1"),
        one(p2).alias("c2"),
        one(p3).alias("c3"),
        one(p4).alias("c4"),
    )
    stagerow = lambda name, i, o: F.struct(  # noqa: E731
        F.lit(name).alias("stage"),
        F.col(i).alias("n_in"),
        F.col(o).alias("n_out"),
        (F.col(o).cast("double") / F.col("c0")).alias("keep_frac"),
    )
    return agg.select(
        F.explode(
            F.array(
                stagerow("1_word_count", "c0", "c1"),
                stagerow("2_mean_word_len", "c1", "c2"),
                stagerow("3_alpha_fraction", "c2", "c3"),
                stagerow("4_stopword_presence", "c3", "c4"),
            )
        ).alias("s")
    ).select("s.stage", "s.n_in", "s.n_out", "s.keep_frac")


# ---------------------------------------------------------------- j81

# (bands, rows-per-band) configurations over a 64-hash signature; all
# exponents are powers of two so detection probabilities evaluate as
# repeated squaring — identical IEEE trees in both engines
BAND_CONFIGS = ((32, 2), (16, 4), (8, 8), (4, 16))
BAND_MIN_JACC = 0.1


def _pow2k_col(e: Column, k: int) -> Column:
    """e^(2^k) by repeated squaring (Spark side)."""
    for _ in range(k):
        e = e * e
    return e


def _pow2k_sql(e: str, k: int) -> str:
    """Textual twin of ``_pow2k_col`` — duplicating the subexpression
    does not change the IEEE result, only the text."""
    for _ in range(k):
        e = f"({e} * {e})"
    return e


def _detect_col(j: Column, bands: int, rows: int) -> Column:
    """P(candidate) = 1 - (1 - j^rows)^bands, powers-of-two only."""
    jr = _pow2k_col(j, rows.bit_length() - 1)
    return F.lit(1.0) - _pow2k_col(F.lit(1.0) - jr, bands.bit_length() - 1)


def _detect_sql(j: str, bands: int, rows: int) -> str:
    jr = _pow2k_sql(j, rows.bit_length() - 1)
    return f"1.0 - {_pow2k_sql(f'(1.0 - {jr})', bands.bit_length() - 1)}"


def _s_star(bands: int, rows: int) -> float:
    """Analytic S-curve threshold (1/b)^(1/r) via nested sqrt — r is a
    power of two, so this is exact repeated square-rooting, identical
    in any IEEE engine (the same constant is emitted as a literal to
    both sides, so it cannot drift anyway)."""
    v = 1.0 / bands
    for _ in range(rows.bit_length() - 1):
        v = v**0.5
    return v


@query(
    "j81_band_tuning",
    oracle="""
    WITH normed AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
      FROM documents
    ),
    sh AS (
      SELECT doc_id, substr(norm, 1, 40) AS block,
             list_distinct(list_transform(range(1, greatest(len(norm) - 7, 0) + 1),
                                          i -> substr(norm, i, 8))) AS shingles
      FROM normed WHERE len(norm) >= 8
    ),
    pairs AS (
      SELECT CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / (len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles))) AS jacc
      FROM sh a JOIN sh b ON a.block = b.block AND a.doc_id < b.doc_id
    ),
    kept AS (SELECT jacc FROM pairs WHERE jacc >= {minj})
    {selects}
    """.replace("{minj}", repr(BAND_MIN_JACC)).replace(
        "{selects}",
        "\n    UNION ALL ".join(
            f"""SELECT {b} AS bands, {r} AS rows_pb,
           CAST({_s_star(b, r)!r} AS DOUBLE) AS s_star,
           COUNT(*) AS n_pairs,
           round(CAST(SUM(CAST(round({_detect_sql('jacc', b, r)}, 12)
                               AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 4)
             AS exp_recall
    FROM kept"""
            for b, r in BAND_CONFIGS
        ),
    ),
)
def j81_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash banding S-curve calibration ON THE CORPUS — the tool
    that picks j2/j48's (bands × rows) dial instead of folklore: for
    each 64-hash split (32×2, 16×4, 8×8, 4×16) it reports the
    analytic threshold s* = (1/b)^(1/r) and the EXPECTED RECALL
    Σ 1-(1-j^r)^b / n over the corpus's own observed near-pair Jaccard
    distribution (block-candidate pairs with j ≥ 0.1 — the population
    banding has to catch). More rows per band shifts s* right (fewer
    false candidates, more misses): this query quantifies that trade
    on real data. Exactness: j^r and (1-j^r)^b are repeated squaring
    (powers of two only — no pow()), per-pair probabilities round(12)
    and sum as DECIMAL so accumulation order cannot drift, one
    division, round(4). Plan: the pair table builds once (same
    40-char-block candidate generation as the j20/j26 dup graph, pair
    count bounded by blocking) and materializes; the four configs are
    four tiny aggregates over it — at 100 TB the calibration runs on
    a corpus sample, the expression tree is unchanged."""
    from json2hbase_spark.io import widen
    from json2hbase_spark.operators.dedup import char_shingles, normalize_text

    docs = load(spark, sf_dir, "documents")
    normed = (
        widen(docs)
        .select("doc_id", normalize_text(F.col("text")).alias("norm"))
        .filter(F.length("norm") >= 8)
    )
    # shingle table materialized so the self-join's two sides share
    # ONE shingling pass (HOF plans defeat ReuseExchange — j2v/_dup_
    # edges convention; without it j81 paid the fold twice: 5.7→~2 s)
    sh = materialize(
        normed.select(
            "doc_id",
            F.substring("norm", 1, 40).alias("block"),
            char_shingles(F.col("norm"), 8).alias("shingles"),
        )
    )
    a = sh.select(
        F.col("block"), F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa")
    )
    b = sh.select(
        F.col("block").alias("block_b"),
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sb"),
    )
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    jacc = inter.cast("double") / (F.size("sa") + F.size("sb") - inter)
    kept = materialize(
        a.join(b, (F.col("block") == F.col("block_b")) & (F.col("doc_a") < F.col("doc_b")))
        .select(jacc.alias("jacc"))
        .filter(F.col("jacc") >= BAND_MIN_JACC)
    )
    parts = []
    for bands, rows in BAND_CONFIGS:
        det = _detect_col(F.col("jacc"), bands, rows)
        parts.append(
            kept.agg(
                F.lit(bands).alias("bands"),
                F.lit(rows).alias("rows_pb"),
                F.lit(_s_star(bands, rows)).alias("s_star"),
                F.count("*").alias("n_pairs"),
                F.round(
                    F.sum(F.round(det, 12).cast("decimal(28,12)")).cast("double")
                    / F.count("*"),
                    4,
                ).alias("exp_recall"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------- j82

FH_DIM = 16  # feature-hash buckets; the dial is dim ∝ target collision
             # rate — 2x dim halves expected sign-collisions per bucket


@query(
    "j82_feature_hash_embed",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS t
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             ('0x' || substr(md5(t), 1, 8))::BIGINT % {FH_DIM} AS b,
             CASE WHEN substr(md5(t), 9, 1) IN
                    ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END AS sgn
      FROM toks
    ),
    v AS (
      SELECT doc_id, COUNT(*) AS n_toks,
             {", ".join(f"SUM(CASE WHEN b = {k} THEN sgn ELSE 0 END) AS v{k}" for k in range(FH_DIM))}
      FROM h GROUP BY doc_id
    ),
    n AS (
      SELECT *, sqrt(CAST({" + ".join(f"v{k} * v{k}" for k in range(FH_DIM))} AS DOUBLE)) AS nrm
      FROM v
    )
    SELECT doc_id, n_toks,
           {", ".join(f"CASE WHEN nrm = 0 THEN 0.0 ELSE v{k} / nrm END AS fh{k}" for k in range(FH_DIM))}
    FROM n
    """,
)
def j82_feature_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (Weinberger et al. 2009): model-free document
    vectors from a signed token hash — bucket = md5(token) mod
    {FH_DIM}, sign = one md5 bit — summed per doc and L2-normalized.
    The classic pre-embedding featurization for dedup/clustering when
    no encoder is in the loop: no vocabulary table to build or ship
    (the hash IS the vocabulary), so the op is a single narrow
    explode + one hash agg — the 100 TB shape, with the wide
    conditional-sum agg combining map-side (FH_DIM longs per doc
    cross the wire, not tokens). Exactness: bucket/sign are md5
    arithmetic, components are exact BIGINT sums; the only float ops
    are one sqrt and one division per coordinate, bit-identical
    cross-engine (zero-vector docs guard to exact 0.0)."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.explode(whitespace_tokens(F.col("text"))).alias("t")
    )
    h = t.select(
        "doc_id",
        (F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long") % FH_DIM).alias("b"),
        F.when(
            F.substring(F.md5("t"), 9, 1).isin(*list("01234567")), F.lit(1)
        ).otherwise(F.lit(-1)).alias("sgn"),
    )
    v = h.groupBy("doc_id").agg(
        F.count("*").alias("n_toks"),
        *[
            F.sum(F.when(F.col("b") == k, F.col("sgn")).otherwise(0)).alias(f"v{k}")
            for k in range(FH_DIM)
        ],
    )
    nrm = F.sqrt(
        sum((F.col(f"v{k}") * F.col(f"v{k}") for k in range(FH_DIM)), F.lit(0)).cast(
            "double"
        )
    )
    n = v.withColumn("nrm", nrm)
    # coordinates surfaced as scalar columns (fh0..fh15), not an
    # array cell — the driver's comparator and the local gate both
    # hash scalar cells; full-vector verification either way
    return n.select(
        "doc_id",
        "n_toks",
        *[
            F.when(F.col("nrm") == 0, F.lit(0.0))
            .otherwise(F.col(f"v{k}") / F.col("nrm"))
            .alias(f"fh{k}")
            for k in range(FH_DIM)
        ],
    )


# ---------------------------------------------------------------- j83

PPS_K = 100  # systematic sample slots


@query(
    "j83_pps_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             md5('pps:' || CAST(doc_id AS VARCHAR)) AS hkey
      FROM documents
    ),
    cum AS (
      SELECT doc_id, n_chars, hkey,
             SUM(n_chars) OVER (ORDER BY hkey, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS c
      FROM keyed
    ),
    tot AS (SELECT SUM(n_chars) AS w FROM documents)
    SELECT doc_id, n_chars,
           CAST((c * {PPS_K}) // w - ((c - n_chars) * {PPS_K}) // w AS BIGINT)
             AS n_picks
    FROM cum, tot
    WHERE (c * {PPS_K}) // w - ((c - n_chars) * {PPS_K}) // w >= 1
    """,
)
def j83_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS (probability-proportional-to-size) sampling:
    docs are laid on a [0, W) line in a content-addressed md5
    permutation order (no RNG — j62's reproducibility contract), each
    occupying its n_chars of length; {PPS_K} equally-spaced sample
    points pick whichever doc they land in. Inclusion probability is
    exactly k·w_i/W (big docs can be hit twice — n_picks reports
    multiplicity), which is the estimator every corpus-stats audit
    wants, and the arithmetic is PURE BIGINT (pick count =
    (cum·K) div W − (lo·K) div W): no float anywhere, so the sampled
    set hash-matches across engines and reruns by construction.
    Plan: the global ordered cumsum runs as a BUCKETED two-pass prefix
    sum (operators/prefix.py) — hkey's hex prefix is a monotone,
    uniform bucket, so the cumsum is one hash exchange on narrow
    metadata with bucket-level parallelism plus a broadcast offsets
    table; NO single-partition window (the r6 plan funneled the whole
    table into one task). Values are identical to the plain ordered
    window, so the oracle is unchanged. Plus a broadcast scalar
    total."""
    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.md5(F.concat(F.lit("pps:"), F.col("doc_id").cast("string"))).alias("hkey"),
    ).withColumn("_bkt", hex_prefix_bucket(F.col("hkey")))
    cum = bucketed_cumsum(
        keyed, "_bkt", ["hkey", "doc_id"], "n_chars", "c"
    ).select("doc_id", "n_chars", "c")
    tot = docs.agg(F.sum("n_chars").alias("w"))
    picks = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_picks",
            F.expr(f"(c * {PPS_K}) div w - ((c - n_chars) * {PPS_K}) div w").cast(
                "bigint"
            ),
        )
        .filter(F.col("n_picks") >= 1)
    )
    return picks.select("doc_id", "n_chars", "n_picks")


# ---------------------------------------------------------------- j84

VOCAB_CUTS = (100, 1000, 10000)


@query(
    "j84_vocab_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS t
      FROM documents
    ),
    c AS (SELECT t, COUNT(*) AS c FROM toks GROUP BY t),
    r AS (SELECT t, c, row_number() OVER (ORDER BY c DESC, t) AS rnk FROM c),
    tot AS (SELECT SUM(c) AS total FROM c),
    cuts AS (SELECT unnest([{", ".join(str(k) for k in VOCAB_CUTS)}]) AS cutoff)
    SELECT cuts.cutoff,
           CAST(SUM(CASE WHEN r.rnk <= cuts.cutoff THEN 1 ELSE 0 END) AS BIGINT)
             AS n_types_covered,
           CAST(SUM(CASE WHEN r.rnk <= cuts.cutoff THEN r.c ELSE 0 END) AS BIGINT)
             AS covered_mass,
           CAST(SUM(CASE WHEN r.rnk <= cuts.cutoff THEN r.c ELSE 0 END) AS DOUBLE)
             / ANY_VALUE(tot.total) AS mass_frac
    FROM r, cuts, tot
    GROUP BY cuts.cutoff
    """,
)
def j84_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of the corpus's token
    MASS the top-{{100, 1k, 10k}} most frequent types cover — the
    Zipf-complement (j37 fits the slope; this reads the integral)
    every tokenizer-vocab and stopword decision is based on. Rank is
    deterministic (count DESC, token) and all masses are exact BIGINT
    sums with one final division per cutoff. Plan: token hash-agg
    (map-side combinable), a window rank over the VOCABULARY (≪
    corpus — the sort is over distinct types, which at 100 TB is
    millions of rows, not billions), then one tiny conditional agg
    per cutoff via a 3-literal explode."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(whitespace_tokens(F.lower(F.col("text")))).alias("t")
    )
    c = toks.groupBy("t").agg(F.count("*").alias("c"))
    r = c.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("t")))
    )
    tot = c.agg(F.sum("c").alias("total"))
    cuts = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in VOCAB_CUTS])).alias("cutoff")
    )
    return (
        r.crossJoin(F.broadcast(cuts))
        .crossJoin(F.broadcast(tot))
        .groupBy("cutoff")
        .agg(
            F.sum(F.when(F.col("rnk") <= F.col("cutoff"), 1).otherwise(0)).alias(
                "n_types_covered"
            ),
            F.sum(
                F.when(F.col("rnk") <= F.col("cutoff"), F.col("c")).otherwise(0)
            )
            .cast("bigint")
            .alias("covered_mass"),
            (
                F.sum(
                    F.when(F.col("rnk") <= F.col("cutoff"), F.col("c")).otherwise(0)
                ).cast("double")
                / F.any_value(F.col("total"))
            ).alias("mass_frac"),
        )
    )


# ---------------------------------------------------------------- j85


def _j85_oracle() -> str:
    from json2hbase_spark.plans.advanced_queries import DUCK_COMP_CTES

    return (
        DUCK_COMP_CTES
        + """
    , sizes AS (SELECT component, COUNT(*) AS sz FROM comp GROUP BY component)
    SELECT sz AS cluster_size,
           COUNT(*) AS n_clusters,
           CAST(sz * COUNT(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY sz
    """
    )


@query("j85_dup_cluster_stats", oracle=_j85_oracle())
def j85_dup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster morphology: the size histogram of the
    near-dup connected components (how many pairs vs long chains vs
    giant blobs) — the number that decides KEEP-ONE vs KEEP-NONE
    policy and flags boilerplate explosions (a giant component is
    almost never real duplication; it is a template). Reuses j20's
    bounded min-label propagation verbatim (same edges, same
    fixpoint — one extra hash agg on top), so the 100 TB posture is
    j20's: banded edge set materialized once, narrow join + min-agg
    per hop, histogram over components (≪ docs)."""
    from json2hbase_spark.plans.advanced_queries import _component_labels

    sizes = (
        _component_labels(spark, sf_dir)
        .groupBy(F.col("label").alias("component"))
        .agg(F.count("*").alias("sz"))
    )
    return sizes.groupBy("sz").agg(
        F.col("sz").alias("cluster_size"),
        F.count("*").alias("n_clusters"),
        (F.col("sz") * F.count("*")).cast("bigint").alias("n_docs"),
    ).select("cluster_size", "n_clusters", "n_docs")


# ---------------------------------------------------------------- h18

H18_KW = "(data|model|learn)"


@query(
    "h18_fn_regexp",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '[0-9]+'))) AS BIGINT)
             AS n_digit_runs,
           CAST(SUM(CASE WHEN regexp_matches(text, '{H18_KW}') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_kw,
           CAST(SUM(CASE WHEN regexp_extract(text, '[0-9]{{1,9}}') = '' THEN 0
                    ELSE CAST(regexp_extract(text, '[0-9]{{1,9}}') AS BIGINT) END)
                AS BIGINT) AS sum_first_num,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]{{7,}}'))) AS BIGINT)
             AS n_long_words,
           CAST(SUM(len(regexp_replace(text, '[0-9]+', '#', 'g'))) AS BIGINT)
             AS len_collapsed
    FROM documents
    GROUP BY lang
    """,
)
def h18_fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar-function bundle (the everyday pattern surface
    h1's string bundle doesn't cover): regexp_extract_all + counting,
    first-match extraction with the empty-match → 0 convention
    (Spark and DuckDB both return '' on no-match; '' casts to NULL in
    Spark but ERRORS in DuckDB, hence the explicit CASE), rlike /
    regexp_matches predicates, and global regexp_replace (Spark
    replaces all by default; DuckDB needs the 'g' flag — pinned
    here so the twins can't drift). First-number extraction caps at 9
    digits ('[0-9]{{1,9}}', greedy prefix — identical semantics both
    engines) so the BIGINT cast cannot overflow on adversarial
    digit runs. All aggregates are exact integer sums; one scan, one
    hash agg."""
    docs = load(spark, sf_dir, "documents")
    first_num = F.regexp_extract(F.col("text"), "[0-9]{1,9}", 0)
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), 0)))
        .cast("bigint")
        .alias("n_digit_runs"),
        F.sum(F.when(F.col("text").rlike(H18_KW), 1).otherwise(0)).alias("n_docs_kw"),
        F.sum(
            F.when(first_num == "", 0).otherwise(first_num.cast("bigint"))
        ).alias("sum_first_num"),
        F.sum(F.size(F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]{7,}"), 0)))
        .cast("bigint")
        .alias("n_long_words"),
        F.sum(F.length(F.regexp_replace(F.col("text"), "[0-9]+", "#")))
        .cast("bigint")
        .alias("len_collapsed"),
    )


# ---------------------------------------------------------------- h19


@query(
    "h19_fn_struct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           struct_extract(max(struct_pack(p := o_totalprice, k := o_orderkey)), 'p')
             AS top_price,
           struct_extract(max(struct_pack(p := o_totalprice, k := o_orderkey)), 'k')
             AS top_key,
           struct_extract(min(struct_pack(p := o_totalprice, k := o_orderkey)), 'p')
             AS bottom_price,
           struct_extract(min(struct_pack(p := o_totalprice, k := o_orderkey)), 'k')
             AS bottom_key
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def h19_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct ordering bundle: MIN/MAX over a composite struct — the
    one-agg argmax/argmin idiom (struct comparison is lexicographic
    by field position in BOTH engines, so (price, orderkey) gives a
    deterministic tie-break for free, no window needed). This is the
    scale-preferred form of d15's argmax: a plain hash aggregate with
    map-side combine — no row_number window, no per-group sort — the
    difference between one exchange and a sort at 100 TB. Field
    extraction via getField/struct_extract round-trips the composite
    back to scalar columns."""
    orders = load(spark, sf_dir, "orders")
    s = F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.max(s)["p"].alias("top_price"),
        F.max(s)["k"].alias("top_key"),
        F.min(s)["p"].alias("bottom_price"),
        F.min(s)["k"].alias("bottom_key"),
    )


# ---------------------------------------------------------------- j86

from json2hbase_spark.operators.text import BPE_TOKEN_RE, bpe_ish_tokens  # noqa: E402


@query(
    "j86_tokenizer_fertility",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang,
             len(list_filter(string_split(text, ' '), x -> x != '')) AS nw,
             len(regexp_extract_all(lower(text), '{BPE_TOKEN_RE}')) AS nb,
             n_chars
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(nw) AS BIGINT) AS n_words,
           CAST(SUM(nb) AS BIGINT) AS n_subtokens,
           round(CAST(SUM(nb) AS DOUBLE) / SUM(nw), 4) AS fertility,
           round(CAST(SUM(n_chars) AS DOUBLE) / SUM(nb), 4) AS chars_per_token
    FROM per_doc
    GROUP BY lang
    """,
)
def j86_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit: subtokens-per-word and
    chars-per-subtoken by language for the BPE-ish regex tokenizer
    (j14's GPT-2-pretoken shape) against whitespace words — the
    number that decides whether a tokenizer punishes a language
    (fertility 2× ⇒ that language pays 2× the context budget per
    word; the standard multilingual-tokenizer fairness metric). All
    counts are exact integers summed map-side; the two ratios are one
    division each, round(4). Plan: one scan, per-doc counts in a
    narrow projection, one hash agg — token EXPLOSION never happens
    (counts come from len(extract_all), not unnest), so the exchange
    carries 3 longs per doc at any corpus size."""
    docs = load(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        F.size(whitespace_tokens(F.col("text"))).alias("nw"),
        F.size(bpe_ish_tokens(F.col("text"))).alias("nb"),
        "n_chars",
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("nw").cast("bigint").alias("n_words"),
        F.sum("nb").cast("bigint").alias("n_subtokens"),
        F.round(F.sum("nb").cast("double") / F.sum("nw"), 4).alias("fertility"),
        F.round(F.sum("n_chars").cast("double") / F.sum("nb"), 4).alias(
            "chars_per_token"
        ),
    )


# ---------------------------------------------------------------- j87


def _j87_oracle() -> str:
    from json2hbase_spark.plans.advanced_queries import DUCK_DUP_EDGES

    return (
        DUCK_DUP_EDGES
        + """
    , bi AS (
      SELECT doc_a AS src FROM edges UNION ALL SELECT doc_b FROM edges
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM bi GROUP BY src)
    SELECT d AS degree,
           COUNT(*) AS n_nodes,
           CAST(MIN(src) AS BIGINT) AS min_node
    FROM deg GROUP BY d
    """
    )


@query("j87_graph_degree_stats", oracle=_j87_oracle())
def j87_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup graph degree distribution: how many neighbors each
    document has in the verified duplicate graph, as a histogram
    (degree → node count) — the early-warning signal j85's component
    histogram confirms: a fat degree tail means template/boilerplate
    contamination BEFORE paying for component propagation, from one
    agg over the edge list (no iteration at all). Reuses j20/j26's
    edge set verbatim. Plan: edges materialize once, the degree count
    and histogram are two hash aggs over 2·|E| rows — at 100 TB this
    is the cheap triage that decides whether j20's iterative pass is
    even needed."""
    from json2hbase_spark.plans.advanced_queries import _dup_edges

    edges = materialize(_dup_edges(spark, sf_dir))
    bi = edges.select(F.col("doc_a").alias("src")).unionByName(
        edges.select(F.col("doc_b").alias("src"))
    )
    deg = bi.groupBy("src").agg(F.count("*").alias("d"))
    return deg.groupBy("d").agg(
        F.col("d").alias("degree"),
        F.count("*").alias("n_nodes"),
        F.min("src").cast("bigint").alias("min_node"),
    ).select("degree", "n_nodes", "min_node")


# ---------------------------------------------------------------- j88


def _j88_oracle() -> str:
    from json2hbase_spark.plans.pipeline_queries import N_SHARDS, SHUFFLE_SEED

    return f"""
    WITH sharded AS (
      SELECT doc_id, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{SHUFFLE_SEED}'),
                                  1, 8))::BIGINT % {N_SHARDS} AS INTEGER) AS shard
      FROM documents
    ),
    tot AS (SELECT SUM(n_chars) AS w FROM documents)
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / ANY_VALUE(w) AS chars_frac
    FROM sharded, tot
    GROUP BY shard
    """


@query("j88_shard_balance", oracle=_j88_oracle())
def j88_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-balance audit for j62's deterministic training shards:
    per-shard doc count, byte mass, and corpus fraction — the check a
    data-parallel trainer runs before an epoch (a skewed shard is a
    straggler every step; md5 sharding keeps the expected imbalance
    ~1/√(n/shards), and this op MEASURES it instead of assuming).
    Same content-addressed shard key as j62 (seed '{SHUFFLE_SEED}'),
    so the audit provably describes the shards j62 emits. One scan,
    one hash agg, broadcast scalar total."""
    from json2hbase_spark.plans.pipeline_queries import N_SHARDS, SHUFFLE_SEED

    docs = load(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{SHUFFLE_SEED}"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % N_SHARDS
    ).cast("int")
    tot = docs.agg(F.sum("n_chars").alias("w"))
    return (
        docs.select(shard.alias("shard"), "n_chars")
        .crossJoin(F.broadcast(tot))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.any_value("w")).alias("chars_frac"),
        )
    )


# ---------------------------------------------------------------- j89


@query(
    "j89_hapax_docs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x != ''))
               AS t
      FROM documents
    ),
    vocab AS (SELECT t, COUNT(*) AS c FROM toks GROUP BY t)
    SELECT doc_id,
           COUNT(*) AS n_toks,
           CAST(SUM(CASE WHEN vocab.c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(SUM(CASE WHEN vocab.c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS hapax_frac
    FROM toks JOIN vocab USING (t)
    GROUP BY doc_id
    """,
)
def j89_hapax_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomena screen: per document, how many of its token
    occurrences are corpus-wide singletons — a high hapax fraction
    flags OCR noise, mojibake, or code/IDs masquerading as text
    (complement of j57's tokenizer-side OOV rate: this one is
    corpus-relative, no external vocab needed). Plan: token explode →
    vocabulary hash agg (map-side combinable) → re-join occurrences
    to counts on the token key → per-doc agg. At 100 TB the
    vocabulary join is the standard explode-join shape every tf-idf
    pipeline (j7) already pays; exact integer counts, one division."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(whitespace_tokens(F.lower(F.col("text")))).alias("t")
    )
    vocab = toks.groupBy("t").agg(F.count("*").alias("c"))
    return (
        toks.join(vocab, "t")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hapax"),
            (
                F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("double")
                / F.count("*")
            ).alias("hapax_frac"),
        )
    )


# ---------------------------------------------------------------- j90

OUTLIER_MULT = 1.5  # distance threshold as a multiple of the label mean


def _j90_oracle() -> str:
    from json2hbase_spark.functions.exact import QCENT_AVG

    sq = (
        "list_aggregate(list_transform(range(1, 65),"
        " i -> (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])"
        " * (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])), 'sum')"
    )
    return f"""
    WITH cent_long AS (
      SELECT label, i.i AS pos,
             {QCENT_AVG.format(v="embedding[i.i + 1]")} AS cv
      FROM embeddings, (SELECT unnest(range(64)) AS i) i
      GROUP BY 1, 2
    ),
    cent AS (SELECT label, list(cv ORDER BY pos) AS centroid FROM cent_long GROUP BY label),
    d AS (
      SELECT e.label, e.vec_id, sqrt({sq}) AS dist
      FROM embeddings e JOIN cent c ON c.label = e.label
    ),
    m AS (
      SELECT label,
             COUNT(*) AS n_vecs,
             CAST(SUM(CAST(round(dist, 12) AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)
               AS mean_dist
      FROM d GROUP BY label
    )
    SELECT d.label, ANY_VALUE(m.n_vecs) AS n_vecs,
           round(ANY_VALUE(m.mean_dist), 4) AS mean_dist,
           CAST(SUM(CASE WHEN d.dist > {OUTLIER_MULT} * m.mean_dist
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d JOIN m ON m.label = d.label
    GROUP BY d.label
    """


@query("j90_embed_outliers", oracle=_j90_oracle())
def j90_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding hygiene: per-label outlier count — vectors whose
    distance to their label centroid exceeds {OUTLIER_MULT}× the
    label's mean distance (mislabeled rows, collapsed/zero vectors,
    encoder glitches surface here before they poison ANN recall or
    contrastive training). Exactness: centroids are j17's
    quantized-integer averages (order-free, engine-exact), distances
    the same sequential sqrt-fold both engines run, the mean uses the
    DECIMAL round(12)-sum so accumulation order can't move the
    threshold, and the outlier compare uses the UNROUNDED mean —
    identical on both sides. Plan: centroid agg (64×|labels| rows)
    broadcasts back; distance is a map-side fold; two hash aggs. The
    label-mean re-join is a broadcast (|labels| rows) — no extra
    shuffle of the corpus."""
    from json2hbase_spark.operators.similarity import ivf_centroids

    emb = load(spark, sf_dir, "embeddings")
    cents = ivf_centroids(emb, "label", "embedding")
    sq = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("centroid"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d = emb.join(F.broadcast(cents), "label").select(
        "label", "vec_id", F.sqrt(sq).alias("dist")
    )
    d = materialize(d)
    m = d.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        (
            F.sum(F.round(F.col("dist"), 12).cast("decimal(28,12)")).cast("double")
            / F.count("*")
        ).alias("mean_dist"),
    )
    return (
        d.join(F.broadcast(m), "label")
        .groupBy("label")
        .agg(
            F.any_value("n_vecs").alias("n_vecs"),
            F.round(F.any_value("mean_dist"), 4).alias("mean_dist"),
            F.sum(
                F.when(F.col("dist") > OUTLIER_MULT * F.col("mean_dist"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------- m8

SHARD_BYTES = 4096  # packing budget per shard (the dial: real shard
                    # size — e.g. 1 GiB tar shards — at deployment)


@query(
    "m8_shard_plan",
    oracle=f"""
    WITH assets AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
    ),
    cum AS (
      SELECT doc_id, n_bytes,
             SUM(n_bytes) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS c
      FROM assets
    )
    SELECT CAST((c - n_bytes) // {SHARD_BYTES} AS BIGINT) AS shard,
           COUNT(*) AS n_assets,
           CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM cum
    GROUP BY 1
    """,
)
def m8_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential media-shard packing plan (the WebDataset/tar-shard
    layout step): assets in a stable order are packed greedily into
    byte-budgeted shards — an asset opens a new shard when the budget
    is crossed, so shards are contiguous doc ranges a reader streams
    without an index lookup per asset. The shard id is pure BIGINT
    arithmetic on the byte cumsum ((start_offset div budget), the
    classic offset→bin map), so the plan is rerun-identical and
    engine-exact. Plan: the ordered byte cumsum over asset METADATA
    (doc_id + byte length only — blob bytes never move) runs as a
    BUCKETED two-pass prefix sum (operators/prefix.py): doc_id is a
    dense integer key, so ``(doc_id · buckets) div (max+1)`` is a
    monotone balanced bucket (max is a 1-row broadcast agg — the only
    SinglePartition in the plan, scalar by construction), one hash
    exchange + broadcast offsets, no single-partition window. Values
    equal the plain ordered window, oracle unchanged. Then one hash
    agg. Byte lengths are utf-8 of the text stand-in, same source as
    a23/m1."""
    docs = load(spark, sf_dir, "documents")
    assets = docs.select(
        "doc_id", F.octet_length(F.col("text")).cast("long").alias("n_bytes")
    )
    n = assets.agg((F.max("doc_id") + F.lit(1)).alias("_n"))
    bucketed = (
        assets.join(F.broadcast(n))
        .withColumn(
            "_bkt", F.expr(f"(doc_id * {CUMSUM_BUCKETS}) div _n").cast("long")
        )
        .drop("_n")
    )
    cum = bucketed_cumsum(bucketed, "_bkt", ["doc_id"], "n_bytes", "c").select(
        "doc_id", "n_bytes", "c"
    )
    return (
        cum.withColumn(
            "shard", F.expr(f"(c - n_bytes) div {SHARD_BYTES}").cast("bigint")
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").cast("bigint").alias("shard_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------- j91

TOKEN_BUDGET = 20_000  # absolute token budget for the selected subset
QUALITY_CEIL = 16.0  # safe upper bound on the j12 score (ln(1+n)·≤1.5)


@query(
    "j91_token_budget_select",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT)
               AS n_tokens,
             round(ln(1 + len(list_filter(string_split(text, ' '), x -> x != '')))
                   * (1.0 - CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                            / greatest(len(text), 1))
                   * (0.5 + CAST(len(list_filter(list_filter(string_split(text, ' '), x -> x != ''),
                            t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t))) AS DOUBLE)
                            / greatest(len(list_filter(string_split(text, ' '), x -> x != '')), 1)), 4)
               AS quality
      FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tokens, quality,
             CAST(SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_tokens
      FROM f
    )
    SELECT doc_id, n_tokens, quality, cum_tokens,
           (cum_tokens <= {TOKEN_BUDGET}) AS selected
    FROM cum
    """,
)
def j91_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection (the FineWeb-Edu-style 'keep the
    best docs until the budget is spent' step): docs are ranked by the
    j12 quality score, the token counts are cumulatively summed in
    (quality DESC, doc_id) order, and a doc is selected iff its
    cumulative total still fits TOKEN_BUDGET — greedy quality-first
    selection under an absolute token budget, rerun-identical because
    rank and score are both deterministic. Plan: the ordered cumsum is
    the j83 bucketed two-pass prefix sum (operators/prefix.py) with a
    VALUE-derived monotone bucket — floor((CEIL−q)·B/CEIL) clamped to
    [0, B−1] never contradicts the (quality DESC) order, so no
    single-partition window; bucket balance follows the quality
    distribution (skew costs parallelism, never correctness). Scoring
    itself is one narrow map pass (j12's expressions)."""
    docs = load(spark, sf_dir, "documents")
    from json2hbase_spark.operators.text import quality_features

    feats = quality_features(F.col("text"))
    quality = F.round(
        F.log(1 + feats["n_tokens"])
        * (1.0 - feats["digit_ratio"])
        * (0.5 + feats["stopword_ratio"]),
        4,
    )
    scored = docs.select(
        "doc_id",
        feats["n_tokens"].cast("bigint").alias("n_tokens"),
        quality.alias("quality"),
    )
    b = F.floor(
        (F.lit(QUALITY_CEIL) - F.col("quality"))
        * CUMSUM_BUCKETS
        / F.lit(QUALITY_CEIL)
    ).cast("long")
    bucketed = scored.withColumn(
        "_bkt", F.least(F.greatest(b, F.lit(0)), F.lit(CUMSUM_BUCKETS - 1))
    )
    cum = bucketed_cumsum(
        bucketed, "_bkt", [F.desc("quality"), F.asc("doc_id")], "n_tokens", "cum_tokens"
    )
    return cum.select(
        "doc_id",
        "n_tokens",
        "quality",
        "cum_tokens",
        (F.col("cum_tokens") <= TOKEN_BUDGET).alias("selected"),
    )


# ---------------------------------------------------------------- j92

SEG_CHARS = 40  # fixed segment width for code-switching detection
SEG_TOP_N = 20  # per-language vote vocabulary (j11's dial)


@query(
    "j92_langid_segments",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split(text, ' '), x -> x != '')) AS token
      FROM documents
    ),
    freq AS (SELECT lang, token, COUNT(*) AS n FROM toks GROUP BY 1, 2),
    top AS (
      SELECT lang AS cand_lang, token FROM (
        SELECT lang, token,
               row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS r
        FROM freq
      ) WHERE r <= {SEG_TOP_N}
    ),
    segs AS (
      SELECT d.doc_id, d.n_chars, i.i,
             substr(d.text, i.i * {SEG_CHARS} + 1, {SEG_CHARS}) AS seg_text
      FROM documents d,
           LATERAL (SELECT unnest(range((d.n_chars - 1) // {SEG_CHARS} + 1)) AS i) i
      WHERE d.n_chars > 0
    ),
    seg_tokens AS (
      SELECT DISTINCT doc_id, n_chars, i,
             unnest(list_filter(string_split(seg_text, ' '), x -> x != '')) AS token
      FROM segs
    ),
    votes AS (
      SELECT doc_id, n_chars, i, cand_lang, COUNT(*) AS hits
      FROM seg_tokens JOIN top USING (token)
      GROUP BY 1, 2, 3, 4
    ),
    pred AS (
      SELECT doc_id, n_chars, i, cand_lang AS pred_lang FROM (
        SELECT doc_id, n_chars, i, cand_lang,
               row_number() OVER (PARTITION BY doc_id, i
                                  ORDER BY hits DESC, cand_lang) AS r
        FROM votes
      ) WHERE r = 1
    ),
    lang_counts AS (
      SELECT doc_id, n_chars, pred_lang, CAST(COUNT(*) AS BIGINT) AS c
      FROM pred GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT doc_id, n_chars, pred_lang, c,
             row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, pred_lang) AS r,
             SUM(c) OVER (PARTITION BY doc_id) AS n_scored,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_langs
      FROM lang_counts
    )
    SELECT doc_id,
           CAST((n_chars - 1) // {SEG_CHARS} + 1 AS BIGINT) AS n_segments,
           CAST(n_scored AS BIGINT) AS n_scored,
           CAST(n_langs AS BIGINT) AS n_langs,
           pred_lang AS majority_lang,
           round(CAST(c AS DOUBLE) / n_scored, 4) AS majority_frac,
           (n_langs >= 2) AS mixed
    FROM ranked WHERE r = 1
    """,
)
def j92_langid_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching / mixed-language detection: j11's corpus-trained
    top-{SEG_TOP_N}-token language vote applied at fixed
    {SEG_CHARS}-char SEGMENT granularity, rolled back up per doc as
    (segments scored, distinct predicted languages, majority language
    + its fraction, mixed flag). A monolingual-corpus trainer wants
    exactly this screen: doc-level langid (j11) happily labels a
    half-English half-German page 'en'; the segment profile exposes
    it. Deterministic: segment boundaries are fixed-width character
    arithmetic, vote ties break (hits DESC, lang), majority ties
    (count DESC, lang). Plan: the vote vocabulary (langs×{SEG_TOP_N}
    rows) BROADCASTS onto the segment-token stream — the corpus side
    is explode → distinct → two bounded hash aggs and one per-doc
    window over ≤n_langs rows; n_segments is carried arithmetically
    from n_chars (functionally doc-keyed), so there is NO corpus-side
    join anywhere."""
    docs = load(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", "lang", F.explode(whitespace_tokens(F.col("text"))).alias("token")
    )
    freq = tokens.groupBy("lang", "token").agg(F.count("*").alias("n"))
    wt = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    top = (
        freq.withColumn("r", F.row_number().over(wt))
        .filter(F.col("r") <= SEG_TOP_N)
        .select(F.col("lang").alias("cand_lang"), "token")
    )
    segs = (
        docs.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "n_chars",
            F.explode(
                F.sequence(F.lit(0), F.expr(f"int((n_chars - 1) div {SEG_CHARS})"))
            ).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            "n_chars",
            "i",
            F.expr(f"substring(text, i * {SEG_CHARS} + 1, {SEG_CHARS})").alias(
                "seg_text"
            ),
        )
    )
    seg_tokens = segs.select(
        "doc_id", "n_chars", "i", F.explode(whitespace_tokens(F.col("seg_text"))).alias("token")
    ).distinct()
    votes = (
        seg_tokens.join(F.broadcast(top), "token")
        .groupBy("doc_id", "n_chars", "i", "cand_lang")
        .agg(F.count("*").alias("hits"))
    )
    wp = Window.partitionBy("doc_id", "i").orderBy(F.desc("hits"), F.asc("cand_lang"))
    pred = (
        votes.withColumn("r", F.row_number().over(wp))
        .filter(F.col("r") == 1)
        .select("doc_id", "n_chars", "i", F.col("cand_lang").alias("pred_lang"))
    )
    lang_counts = pred.groupBy("doc_id", "n_chars", "pred_lang").agg(
        F.count("*").cast("bigint").alias("c")
    )
    wd = Window.partitionBy("doc_id")
    wr = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("pred_lang"))
    ranked = (
        lang_counts.withColumn("r", F.row_number().over(wr))
        .withColumn("n_scored", F.sum("c").over(wd))
        .withColumn("n_langs", F.count("*").over(wd))
    )
    return ranked.filter(F.col("r") == 1).select(
        "doc_id",
        F.expr(f"(n_chars - 1) div {SEG_CHARS} + 1").cast("bigint").alias("n_segments"),
        F.col("n_scored").cast("bigint").alias("n_scored"),
        F.col("n_langs").cast("bigint").alias("n_langs"),
        F.col("pred_lang").alias("majority_lang"),
        F.round(F.col("c").cast("double") / F.col("n_scored"), 4).alias("majority_frac"),
        (F.col("n_langs") >= 2).alias("mixed"),
    )


# ---------------------------------------------------------------- j93

DUP_GRAM = 32  # ExactSubstr gram width: duplicates shorter than this are ignored


@query(
    "j93_dup_substring_ranges",
    oracle=f"""
    WITH pos AS (
      SELECT d.doc_id, d.n_chars, i.i,
             md5(substr(d.text, i.i, {DUP_GRAM})) AS gh
      FROM documents d,
           LATERAL (SELECT unnest(range(1, d.n_chars - {DUP_GRAM} + 2)) AS i) i
      WHERE d.n_chars >= {DUP_GRAM}
    ),
    flagged AS (
      SELECT doc_id, n_chars, i,
             COUNT(*) OVER (PARTITION BY gh) AS cnt
      FROM pos
    ),
    dup AS (
      SELECT doc_id, n_chars, i,
             i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
      FROM flagged WHERE cnt >= 2
    ),
    ranges AS (
      SELECT doc_id, n_chars,
             MIN(i) AS r_start,
             MAX(i) + {DUP_GRAM} - 1 AS r_end
      FROM dup GROUP BY doc_id, n_chars, grp
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_ranges,
           CAST(SUM(r_end - r_start + 1) AS BIGINT) AS dup_chars,
           round(CAST(SUM(r_end - r_start + 1) AS DOUBLE) / n_chars, 4)
             AS dup_frac,
           CAST(MAX(r_end - r_start + 1) AS BIGINT) AS max_range_len
    FROM ranges
    GROUP BY doc_id, n_chars
    """,
)
def j93_dup_substring_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-substring detection (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"):
    a {DUP_GRAM}-char gram is taken at EVERY character offset (not
    stride-aligned like j53's spans), a gram occurring ≥2 times in the
    corpus marks its offset as duplicated, and consecutive duplicated
    offsets merge into MAXIMAL ranges (gaps-and-islands: offset −
    row_number is constant inside an island), reported per doc as
    range count, duplicated chars, duplicated fraction, and the
    longest range — the audit that decides whether span-level removal
    (j58) suffices or real substring cutting is needed. Plan: this is
    the one DELIBERATELY chars-heavy operator — the semantics is "look
    at every offset", so the gram stream is ~n_chars rows of (16-byte
    hash, ids); the duplicate flag is a count-over-window on the gram
    hash (one exchange, map-side nothing to combine by design), the
    island merge is a per-doc window, and everything after is bounded
    aggs. Linear in corpus size with a ~32 B/char shuffle constant —
    the reference implementation pays a suffix array for the same
    reach; a 100 TB deployment runs this on the j62 shard layout,
    per shard group. Within-doc repeats also count (cnt is corpus-
    wide), matching the paper's ≥2-occurrences rule."""
    docs = load(spark, sf_dir, "documents")
    pos = (
        widen(docs.filter(F.col("n_chars") >= DUP_GRAM))
        .select(
            "doc_id",
            "n_chars",
            F.explode(
                F.sequence(F.lit(1), F.col("n_chars").cast("int") - DUP_GRAM + 1)
            ).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            "n_chars",
            "i",
            F.md5(F.expr(f"substring(text, i, {DUP_GRAM})")).alias("gh"),
        )
    )
    flagged = pos.withColumn("cnt", F.count("*").over(Window.partitionBy("gh")))
    dup = flagged.filter(F.col("cnt") >= 2).withColumn(
        "grp", F.col("i") - F.row_number().over(Window.partitionBy("doc_id").orderBy("i"))
    )
    ranges = dup.groupBy("doc_id", "n_chars", "grp").agg(
        F.min("i").alias("r_start"),
        (F.max("i") + DUP_GRAM - 1).alias("r_end"),
    )
    rlen = F.col("r_end") - F.col("r_start") + 1
    return ranges.groupBy("doc_id", "n_chars").agg(
        F.count("*").cast("bigint").alias("n_ranges"),
        F.sum(rlen).cast("bigint").alias("dup_chars"),
        F.round(F.sum(rlen).cast("double") / F.col("n_chars"), 4).alias("dup_frac"),
        F.max(rlen).cast("bigint").alias("max_range_len"),
    ).select("doc_id", "n_ranges", "dup_chars", "dup_frac", "max_range_len")


# ---------------------------------------------------------------- j148

RESERVOIR_K = 50  # sample size
_U48 = 281474976710656.0  # 2^48 — the md5-prefix uniform's denominator


@query(
    "j148_weighted_reservoir",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
                  AS BIGINT) AS n_tokens
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, source, n_tokens,
             ln((('0x' || substr(md5('wres:' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                 + 1) / {_U48}) / n_tokens AS k
      FROM w WHERE n_tokens > 0
    )
    SELECT doc_id, source, n_tokens, round(k, 6) AS skey
    FROM keyed ORDER BY k DESC, doc_id LIMIT {RESERVOIR_K}
    """,
)
def j148_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sample WITHOUT replacement — Efraimidis &
    Spirakis (2006) A-ES: each doc draws u ∈ (0,1] and enters the
    sample iff its key u^(1/w) is among the top {RESERVOIR_K} (w =
    token count, so inclusion tracks token mass without the
    multiplicity j83's systematic PPS allows). The classic one-pass
    distributed sample for "give me K docs ∝ size, each at most
    once" — mixture construction, eval-slice picking, spot-audits.
    u is content-addressed (md5 48-bit prefix, j62's no-RNG
    contract: identical sample on any engine, any rerun, any
    partitioning); keys compare as ln(u)/w (same ordering as
    u^(1/w), no pow() — the family convention), computed on the
    IDENTICAL exact-integer-ratio double in both engines (ln's
    libm rounding is the j31/j44-established cross-engine posture;
    a flip would need two 48-bit-hash keys within 1 ulp).

    Plan: one narrow map pass (hash + ln per doc — no shuffle of
    text) into a global top-K (TakeOrderedAndProject, f3's category:
    per-partition heaps then a K-row merge — no corpus sort, no
    single-partition funnel). At 100 TB: scan-bound, K rows cross
    the wire per partition."""
    docs = load(spark, sf_dir, "documents")
    w = widen(docs).select(
        "doc_id",
        "source",
        F.size(whitespace_tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("wres:"), F.col("doc_id").cast("string"))), 1, 12
        ),
        16,
        10,
    ).cast("long")
    key = F.log((h + 1).cast("double") / F.lit(_U48)) / F.col("n_tokens")
    keyed = w.filter(F.col("n_tokens") > 0).select(
        "doc_id", "source", "n_tokens", key.alias("k")
    )
    return (
        keyed.orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(RESERVOIR_K)
        .select("doc_id", "source", "n_tokens", F.round("k", 6).alias("skey"))
    )


# ---------------------------------------------------------------- j149

UNIMAX_EPOCH_CAP = 4  # max epochs any language may repeat
UNIMAX_BUDGET_PCT = 60  # training budget as % of total corpus tokens


_DUCK_J149_UNIMAX = f"""
    WITH lt AS (
      SELECT lang,
             CAST(SUM(len(list_filter(string_split(text, ' '), x -> x != '')))
                  AS BIGINT) AS tokens
      FROM documents GROUP BY lang
    ),
    caps AS (SELECT lang, tokens, tokens * {UNIMAX_EPOCH_CAP} AS cap FROM lt),
    tt AS (SELECT (SUM(tokens) * {UNIMAX_BUDGET_PCT}) // 100 AS t,
                  CAST(COUNT(*) AS BIGINT) AS nl
           FROM caps),
    ranked AS (
      SELECT a.lang, a.tokens, a.cap,
             CAST(1 + COUNT(b.lang) AS BIGINT) AS rnk,
             CAST(COALESCE(SUM(b.cap), 0) AS BIGINT) AS pre
      FROM caps a LEFT JOIN caps b
        ON b.cap < a.cap OR (b.cap = a.cap AND b.lang < a.lang)
      GROUP BY a.lang, a.tokens, a.cap
    ),
    flagged AS (
      SELECT r.*, (r.cap * (tt.nl - r.rnk + 1) + r.pre <= tt.t) AS capped
      FROM ranked r, tt
    ),
    pool AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN capped THEN cap END), 0) AS BIGINT)
               AS used,
             CAST(SUM(CASE WHEN capped THEN 0 ELSE 1 END) AS BIGINT) AS m
      FROM flagged
    )
    SELECT f.lang, f.tokens, f.cap, f.capped,
           CAST(CASE WHEN f.capped THEN f.cap
                     WHEN p.m = 0 THEN NULL
                     ELSE (tt.t - p.used) // p.m END AS BIGINT) AS allocation,
           CAST(CASE WHEN f.tokens = 0 THEN NULL ELSE
                (CASE WHEN f.capped THEN f.cap
                      WHEN p.m = 0 THEN NULL
                      ELSE (tt.t - p.used) // p.m END) * 10000 // f.tokens
                END AS BIGINT) AS epochs_q
    FROM flagged f, tt, pool p
    """


@query("j149_unimax_allocation", oracle=_DUCK_J149_UNIMAX)
def j149_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNIMAX language-budget allocation (Chung et al. 2023) — the
    mixture planner for multilingual training: spread a total token
    budget (={UNIMAX_BUDGET_PCT}% of the corpus here) as UNIFORMLY as
    possible across languages while capping every language at
    {UNIMAX_EPOCH_CAP} epochs of its own data (the repeat ceiling
    that keeps low-resource languages from memorization-grade
    repetition). Water-filling in closed form: languages sorted by
    cap ascending; language i is capped iff cap_i·(L−i+1)+prefix_i ≤ T
    (the standard threshold — monotone in i, so capped languages are
    exactly a prefix); the uncapped share the remainder equally.
    Output per language: tokens, cap, capped?, integer allocation,
    and epochs_q = floor(allocation·10⁴/tokens) — the repeat factor
    the sampler (j19/j61/j137) realizes.

    Exactness: everything is BIGINT (budget = (Σ·{UNIMAX_BUDGET_PCT})
    div 100, share = floor-division; leftover sub-token remainders
    are deliberately unallocated — integer semantics identical in
    both engines). The rank and prefix sums come from a ≤L²-row
    broadcast theta self-join (j142's pattern — no single-partition
    window). Plan: ONE token-count agg touches the corpus; the
    allocation machinery runs on |langs| rows. At 100 TB: the scan
    the mixture audit already pays, then constants."""
    docs = load(spark, sf_dir, "documents")
    lt = (
        widen(docs)
        .groupBy("lang")
        .agg(
            F.sum(F.size(whitespace_tokens(F.col("text"))))
            .cast("bigint")
            .alias("tokens")
        )
    )
    return _unimax_from_tokens(lt)


def _unimax_from_tokens(lt: DataFrame) -> DataFrame:
    """j149's closed-form water-filling over a (lang, tokens) table —
    shared with the streaming twin i38 (which maintains the tally in
    complete mode and re-derives the allocation at read time)."""
    caps = lt.select(
        "lang", "tokens", (F.col("tokens") * UNIMAX_EPOCH_CAP).alias("cap")
    )
    tt = caps.agg(
        F.expr(f"(sum(tokens) * {UNIMAX_BUDGET_PCT}) div 100").alias("t"),
        F.count("*").cast("bigint").alias("nl"),
    )
    # the b side is column-RENAMED rather than plan-aliased: alias
    # resolution over a self-join breaks when the shared lineage runs
    # through a temp view (i38's memory sink); renames are unambiguous
    b = caps.select(
        F.col("lang").alias("b_lang"), F.col("cap").alias("b_cap")
    )
    ranked = (
        caps.join(
            F.broadcast(b),
            (F.col("b_cap") < F.col("cap"))
            | ((F.col("b_cap") == F.col("cap")) & (F.col("b_lang") < F.col("lang"))),
            "left",
        )
        .groupBy("lang", "tokens", "cap")
        .agg(
            (F.count(F.col("b_lang")) + 1).cast("bigint").alias("rnk"),
            F.coalesce(F.sum(F.col("b_cap")), F.lit(0))
            .cast("bigint")
            .alias("pre"),
        )
    )
    flagged = ranked.crossJoin(F.broadcast(tt)).withColumn(
        "capped",
        F.col("cap") * (F.col("nl") - F.col("rnk") + 1) + F.col("pre")
        <= F.col("t"),
    )
    pool = flagged.agg(
        F.coalesce(F.sum(F.when(F.col("capped"), F.col("cap"))), F.lit(0))
        .cast("bigint")
        .alias("used"),
        F.sum(F.when(F.col("capped"), 0).otherwise(1)).cast("bigint").alias("m"),
    )
    # m = 0 guard (VERDICT r11 ADVICE): if EVERY language is capped the
    # uncapped-share branch would divide by zero. The threshold
    # invariant makes that unreachable on real tallies — all capped
    # implies Σcap ≤ T, i.e. 4×Σtokens ≤ 60%×Σtokens, impossible for a
    # non-empty corpus — but the hazard class was guarded in j136/j137,
    # so mirror the CASE pattern here: the share is NULL when m = 0
    # (there are no uncapped rows to receive it), identically in both
    # engines. Lazy CASE evaluation means capped rows never touch the
    # division either way; the guard makes the plan total.
    share = F.when(F.col("m") > 0, F.expr("(t - used) div m"))
    alloc = F.when(F.col("capped"), F.col("cap")).otherwise(share)
    return (
        flagged.crossJoin(F.broadcast(pool))
        .select(
            "lang",
            "tokens",
            "cap",
            "capped",
            alloc.cast("bigint").alias("allocation"),
            # tokens = 0 guard alongside m = 0: the ONE way every
            # language caps through this function is an all-zero tally
            # (cap 0 ≤ T 0), where epochs of an empty language is
            # undefined — NULL, not a DIVIDE_BY_ZERO (ANSI mode throws,
            # it does not NULL-fill).
            F.expr(
                "CAST(CASE WHEN tokens = 0 THEN NULL ELSE"
                " (CASE WHEN capped THEN cap"
                " WHEN m = 0 THEN NULL"
                " ELSE (t - used) div m END)"
                " * 10000 div tokens END AS BIGINT)"
            ).alias("epochs_q"),
        )
    )


# ---------------------------------------------------------------- j150

C4_LINE_WORDS = 5  # C4: retain lines with >= 5 words
C4_MIN_SENT = 3  # C4: drop pages with < 3 retained sentences
_C4_LOREM = "lorem ipsum dolor sit amet."
_C4_JS = "you must enable javascript to view this page."


def _duck_c4_oracle() -> str:
    wc = "len(list_filter(string_split({l}, ' '), x -> x != ''))"
    kept = (
        f"ends_with({{l}}, '.') AND {wc.format(l='{l}')} >= {C4_LINE_WORDS}"
        f" AND NOT contains({{l}}, 'javascript')"
    )
    return f"""
    WITH base AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x != '') AS w
      FROM documents
    ),
    lined AS (
      SELECT doc_id, source,
             list_concat(
               list_transform(range(0, (len(w) + 7) // 8), ci ->
                 array_to_string(list_slice(w, ci * 8 + 1, ci * 8 + 8), ' ')
                 || CASE WHEN (doc_id + ci) % 5 != 0 THEN '.' ELSE '' END),
               list_filter([
                 CASE WHEN doc_id % 7 = 0 THEN '{_C4_LOREM}' END,
                 CASE WHEN doc_id % 5 = 0 THEN '{_C4_JS}' END,
                 'ok.'], x -> x IS NOT NULL)) AS lines
      FROM base WHERE len(w) >= 1
    ),
    perdoc AS (
      SELECT doc_id, source,
             CAST(len(lines) AS BIGINT) AS lines_total,
             CAST(len(list_filter(lines, l -> {kept.format(l='l')}))
                  AS BIGINT) AS lines_kept,
             CAST(COALESCE(list_aggregate(
                    list_transform(list_filter(lines, l -> {kept.format(l='l')}),
                                   l -> {wc.format(l='l')}), 'sum'), 0)
                  AS BIGINT) AS tok_kept,
             len(list_filter(lines, l -> contains(l, 'lorem ipsum'))) > 0
               AS has_lorem
      FROM lined
    ),
    judged AS (
      SELECT *, (NOT has_lorem AND lines_kept >= {C4_MIN_SENT}) AS doc_kept
      FROM perdoc
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_kept THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_kept,
           CAST(SUM(CASE WHEN has_lorem THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lorem_docs,
           CAST(SUM(CASE WHEN NOT has_lorem AND lines_kept < {C4_MIN_SENT}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_thin_docs,
           CAST(SUM(lines_total) AS BIGINT) AS lines_total,
           CAST(SUM(lines_kept) AS BIGINT) AS lines_kept,
           CAST(SUM(CASE WHEN doc_kept THEN tok_kept ELSE 0 END) AS BIGINT)
             AS tokens_kept
    FROM judged GROUP BY source
    """


@query("j150_c4_line_filters", oracle=_duck_c4_oracle())
def j150_c4_line_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's line-level cleaning rules (Raffel et al. 2020 §2.2) — the
    most-copied filter bundle in corpus building: keep only lines
    that end in terminal punctuation AND have ≥ {C4_LINE_WORDS}
    words AND don't mention 'javascript'; then drop any page
    containing 'lorem ipsum' or left with < {C4_MIN_SENT} retained
    sentences. The fixture text has no line structure, so lines are
    SYNTHESIZED deterministically (the j100/j110 pattern): 8-token
    chunks with a terminal '.' on (doc_id+i) % 5 != 0 — every fifth
    line unterminated, exercising rule 1 — plus planted dirt (a
    lorem-ipsum line on doc_id % 7 = 0 pages, a javascript boiler
    line on doc_id % 5 = 0, and a 1-word 'ok.' everywhere). Output
    per source: doc/line/token survival and the two page-kill
    reasons — the shape a crawl-cleaning report publishes.

    Exactness: pure string/integer predicates (endswith, word count,
    substring containment) — no floats anywhere. Plan: ONE corpus
    scan; lines live as per-row arrays inside codegen'd HOFs (never
    exploded — the line grain stays inside the row, so no
    corpus×lines shuffle), then one source-keyed hash agg. At
    100 TB: scan-bound, map-side combinable."""
    docs = load(spark, sf_dir, "documents")
    w = whitespace_tokens(F.col("text"))
    base = widen(docs).select("doc_id", "source", w.alias("w")).filter(
        F.size("w") >= 1
    )
    chunk = F.transform(
        F.sequence(F.lit(0), F.expr("(size(w) + 7) div 8 - 1")),
        lambda ci: F.concat(
            F.array_join(F.slice(F.col("w"), ci.cast("int") * 8 + 1, 8), " "),
            F.when((F.col("doc_id") + ci) % 5 != 0, F.lit(".")).otherwise(
                F.lit("")
            ),
        ),
    )
    extra = F.filter(
        F.array(
            F.when(F.col("doc_id") % 7 == 0, F.lit(_C4_LOREM)),
            F.when(F.col("doc_id") % 5 == 0, F.lit(_C4_JS)),
            F.lit("ok."),
        ),
        lambda x: x.isNotNull(),
    )
    lined = base.select(
        "doc_id", "source", F.concat(chunk, extra).alias("lines")
    )
    wc = lambda l: F.size(F.filter(F.split(l, " "), lambda t: t != ""))  # noqa: E731
    kept = lambda l: (  # noqa: E731
        l.endswith(".")
        & (wc(l) >= C4_LINE_WORDS)
        & ~l.contains("javascript")
    )
    kept_lines = F.filter(F.col("lines"), kept)
    perdoc = lined.select(
        "doc_id",
        "source",
        F.size("lines").cast("bigint").alias("lines_total"),
        F.size(kept_lines).cast("bigint").alias("lines_kept"),
        F.coalesce(
            F.aggregate(
                F.transform(kept_lines, wc),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("tok_kept"),
        (
            F.size(F.filter(F.col("lines"), lambda l: l.contains("lorem ipsum")))
            > 0
        ).alias("has_lorem"),
    )
    judged = perdoc.withColumn(
        "doc_kept", ~F.col("has_lorem") & (F.col("lines_kept") >= C4_MIN_SENT)
    )
    return judged.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("doc_kept"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_docs_kept"),
        F.sum(F.when(F.col("has_lorem"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_lorem_docs"),
        F.sum(
            F.when(
                ~F.col("has_lorem") & (F.col("lines_kept") < C4_MIN_SENT), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_thin_docs"),
        F.sum("lines_total").cast("bigint").alias("lines_total"),
        F.sum("lines_kept").cast("bigint").alias("lines_kept"),
        F.sum(F.when(F.col("doc_kept"), F.col("tok_kept")).otherwise(0))
        .cast("bigint")
        .alias("tokens_kept"),
    )


# ---------------------------------------------------------------- j151

# Gopher repetition thresholds (Rae et al. 2021, Table A1):
# duplicate-line fraction > 0.30, top-2-gram char fraction > 0.20,
# duplicated-5-gram char fraction > 0.15 — expressed below as integer
# cross-multiplications (the family convention, no float compares).


def _duck_gopher_rep_oracle() -> str:
    from json2hbase_spark.plans.corpus_queries import _duck_ngrams

    return f"""
    WITH base AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x != '') AS w
      FROM documents
    ),
    feats AS (
      SELECT doc_id, source,
             len(array_to_string(w, ' ')) AS tl,
             list_transform(range(0, (len(w) + 7) // 8), ci ->
               array_to_string(list_slice(w, ci * 8 + 1, ci * 8 + 8), ' '))
               AS lines,
             CASE WHEN len(w) >= 2 THEN {_duck_ngrams("w", 2)}
                  ELSE []::VARCHAR[] END AS g2,
             CASE WHEN len(w) >= 5 THEN {_duck_ngrams("w", 5)}
                  ELSE []::VARCHAR[] END AS g5
      FROM base WHERE len(w) >= 1
    ),
    perdoc AS (
      SELECT doc_id, source, tl,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(list_distinct(lines)) AS BIGINT) AS n_dlines,
             CAST(COALESCE(list_aggregate(list_transform(lines, l -> len(l)),
                                          'sum'), 0) AS BIGINT) AS lc,
             CAST(COALESCE(list_aggregate(
                    list_transform(list_distinct(lines), l -> len(l)), 'sum'),
                  0) AS BIGINT) AS dlc,
             CAST(COALESCE(list_max(list_transform(list_distinct(g2), d ->
                    len(list_filter(g2, x -> x = d)) * len(d))), 0)
                  AS BIGINT) AS top2_chars,
             CAST(COALESCE(list_aggregate(
                    list_transform(
                      list_filter(list_distinct(g5),
                                  d -> len(list_filter(g5, x -> x = d)) >= 2),
                      d -> len(list_filter(g5, x -> x = d)) * len(d)),
                    'sum'), 0) AS BIGINT) AS dup5_chars
      FROM feats
    ),
    judged AS (
      SELECT *,
             10 * (n_lines - n_dlines) > 3 * n_lines AS f_dupline,
             5 * top2_chars > tl AS f_top2,
             20 * dup5_chars > 3 * tl AS f_dup5
      FROM perdoc
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN f_dupline THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dupline_flag,
           CAST(SUM(CASE WHEN f_top2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_top2_flag,
           CAST(SUM(CASE WHEN f_dup5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup5_flag,
           CAST(SUM(CASE WHEN NOT (f_dupline OR f_top2 OR f_dup5)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
           CAST(SUM(lc - dlc) AS DOUBLE) / CAST(SUM(lc) AS DOUBLE)
             AS dupline_char_frac,
           CAST(SUM(top2_chars) AS DOUBLE) / CAST(SUM(tl) AS DOUBLE)
             AS top2_char_frac,
           CAST(SUM(dup5_chars) AS DOUBLE) / CAST(SUM(tl) AS DOUBLE)
             AS dup5_char_frac
    FROM judged GROUP BY source
    """


@query("j151_gopher_repetition", oracle=_duck_gopher_rep_oracle())
def j151_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher's REPETITION filter bundle (Rae et al. 2021, Table A1 —
    the other half of j80's quality rules): per doc, the
    duplicate-line fraction (over the synthesized 8-token lines,
    j150's structure without the planted dirt), the character share
    of the single most frequent word 2-gram, and the character share
    of duplicated word 5-grams (occurrence-weighted coverage proxy —
    Gopher's non-overlapping coverage needs positional suppression;
    the proxy upper-bounds it and is documented). Flags at the
    paper's thresholds (0.30 / 0.20 / 0.15) via integer
    cross-multiplications; per source: docs, per-rule flag counts,
    docs clean of all three, and the corpus-level char-fraction
    aggregates as single IEEE divisions of exact integer sums.

    Exactness: every per-doc quantity is an exact integer (counts,
    char sums over in-row arrays); flags are integer inequalities;
    only the three final corpus ratios touch doubles (one division
    each, no rounding). Plan: ONE corpus scan — lines and n-grams
    stay INSIDE the row as arrays (the per-doc O(G²) distinct-count
    walk is doc-length-bounded, never a shuffle) — then one
    source-keyed hash agg. At 100 TB: scan-bound, map-side
    combinable; the famous failure mode (a repetition check that
    explodes grams corpus-wide and self-joins) never appears."""
    docs = load(spark, sf_dir, "documents")
    from json2hbase_spark.plans.corpus_queries import word_ngrams

    w = whitespace_tokens(F.col("text"))
    base = widen(docs).select("doc_id", "source", w.alias("w")).filter(
        F.size("w") >= 1
    )
    lines = F.transform(
        F.sequence(F.lit(0), F.expr("(size(w) + 7) div 8 - 1")),
        lambda ci: F.array_join(F.slice(F.col("w"), ci.cast("int") * 8 + 1, 8), " "),
    )
    empty_s = F.expr("CAST(array() AS ARRAY<STRING>)")
    g2 = F.when(F.size("w") >= 2, word_ngrams(F.col("w"), 2)).otherwise(empty_s)
    g5 = F.when(F.size("w") >= 5, word_ngrams(F.col("w"), 5)).otherwise(empty_s)
    feats = base.select(
        "doc_id",
        "source",
        F.length(F.array_join("w", " ")).cast("bigint").alias("tl"),
        lines.alias("lines"),
        g2.alias("g2"),
        g5.alias("g5"),
    )
    charsum = lambda arr: F.coalesce(  # noqa: E731
        F.aggregate(
            F.transform(arr, F.length),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
        F.lit(0),
    )
    # Spark side runs the SORTED-RUN forms instead of the naive
    # O(G²) nested count walks the oracle keeps: on the ×10 probe the
    # quadratic in-row walk went ×26 (GC-bound on the transient
    # arrays), while these are O(G log G) per doc and probe linear.
    # Values are identical — run-length statistics over the sorted
    # gram array are exactly per-gram occurrence counts.
    #   top2_chars: max over runs of runlen · len(gram)
    #   dup5_chars: Σ over occurrences in runs of length ≥ 2 of len —
    #               an occurrence is in such a run iff it equals its
    #               left or right sorted neighbor.
    feats = feats.select(
        "*",
        F.array_sort("g2").alias("ls2"),
        F.array_sort("g5").alias("ls5"),
    )
    bpos2 = F.expr(
        """CASE WHEN size(ls2) = 0 THEN CAST(array() AS ARRAY<INT>)
        ELSE filter(sequence(1, size(ls2)), i ->
          CASE WHEN i = 1 THEN true
               ELSE element_at(ls2, i) != element_at(ls2, i - 1) END)
        END"""
    )
    top2 = F.expr(
        """CASE WHEN size(_bpos2) = 0 THEN CAST(0 AS BIGINT)
        ELSE CAST(array_max(transform(sequence(1, size(_bpos2)), k ->
          (CASE WHEN k = size(_bpos2) THEN size(ls2) + 1
                ELSE element_at(_bpos2, k + 1) END
           - element_at(_bpos2, k))
          * length(element_at(ls2, element_at(_bpos2, k))))) AS BIGINT)
        END"""
    )
    dup5 = F.expr(
        """CASE WHEN size(ls5) = 0 THEN CAST(0 AS BIGINT)
        ELSE CAST(aggregate(sequence(1, size(ls5)), 0L, (acc, i) ->
          acc + CASE WHEN i > 1
                      AND element_at(ls5, i) = element_at(ls5, i - 1)
                     THEN length(element_at(ls5, i))
                     WHEN i < size(ls5)
                      AND element_at(ls5, i) = element_at(ls5, i + 1)
                     THEN length(element_at(ls5, i))
                     ELSE 0 END) AS BIGINT)
        END"""
    )
    perdoc = feats.withColumn("_bpos2", bpos2).select(
        "doc_id",
        "source",
        "tl",
        F.size("lines").cast("bigint").alias("n_lines"),
        F.size(F.array_distinct("lines")).cast("bigint").alias("n_dlines"),
        charsum(F.col("lines")).cast("bigint").alias("lc"),
        charsum(F.array_distinct("lines")).cast("bigint").alias("dlc"),
        top2.alias("top2_chars"),
        dup5.alias("dup5_chars"),
    )
    judged = perdoc.select(
        "*",
        (10 * (F.col("n_lines") - F.col("n_dlines")) > 3 * F.col("n_lines")).alias(
            "f_dupline"
        ),
        (5 * F.col("top2_chars") > F.col("tl")).alias("f_top2"),
        (20 * F.col("dup5_chars") > 3 * F.col("tl")).alias("f_dup5"),
    )
    return judged.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("f_dupline"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_dupline_flag"),
        F.sum(F.when(F.col("f_top2"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_top2_flag"),
        F.sum(F.when(F.col("f_dup5"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup5_flag"),
        F.sum(
            F.when(
                ~(F.col("f_dupline") | F.col("f_top2") | F.col("f_dup5")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_clean"),
        (
            F.sum(F.col("lc") - F.col("dlc")).cast("double")
            / F.sum("lc").cast("double")
        ).alias("dupline_char_frac"),
        (F.sum("top2_chars").cast("double") / F.sum("tl").cast("double")).alias(
            "top2_char_frac"
        ),
        (F.sum("dup5_chars").cast("double") / F.sum("tl").cast("double")).alias(
            "dup5_char_frac"
        ),
    )


# ---------------------------------------------------------------- j154

# Repeat-value decay for data-constrained training (Muennighoff et al.
# 2023): the paper fits the value of the e-th repeat of a token at
# ~exp(-e/R*) with R* ≈ 15; the engine uses the documented rational
# δ = 9/10 per epoch so every term is EXACT integer arithmetic
# (tokens·9^e div 10^e) identical in both engines. Epoch cap is
# j149's {UNIMAX_EPOCH_CAP}, so powers are bounded literal arrays.
RD_P9 = [9**e for e in range(UNIMAX_EPOCH_CAP + 1)]
RD_P10 = [10**e for e in range(UNIMAX_EPOCH_CAP + 1)]


def _duck_j154() -> str:
    p9 = ", ".join(str(x) for x in RD_P9)
    p10 = ", ".join(str(x) for x in RD_P10)
    return f"""
    WITH alloc AS ({_DUCK_J149_UNIMAX}),
    ep AS (
      SELECT lang, tokens, allocation,
             CASE WHEN tokens = 0 THEN NULL
                  ELSE allocation // tokens END AS epochs_full,
             CASE WHEN tokens = 0 THEN NULL
                  ELSE allocation % tokens END AS rem
      FROM alloc
    )
    SELECT lang, tokens, allocation,
           CAST(epochs_full AS BIGINT) AS epochs_full,
           CAST(CASE WHEN epochs_full IS NULL THEN NULL ELSE
             COALESCE(list_sum(list_transform(range(0, epochs_full),
               e -> (tokens * ([{p9}])[e + 1]) // ([{p10}])[e + 1])), 0)
             + (rem * ([{p9}])[epochs_full + 1]) // ([{p10}])[epochs_full + 1]
           END AS BIGINT) AS effective_tokens,
           CAST(CASE WHEN allocation IS NULL OR allocation = 0 THEN NULL ELSE
             (CASE WHEN epochs_full IS NULL THEN NULL ELSE
               COALESCE(list_sum(list_transform(range(0, epochs_full),
                 e -> (tokens * ([{p9}])[e + 1]) // ([{p10}])[e + 1])), 0)
               + (rem * ([{p9}])[epochs_full + 1]) // ([{p10}])[epochs_full + 1]
             END) * 10000 // allocation
           END AS BIGINT) AS efficiency_q
    FROM ep
    """


@query("j154_repeat_discount_budget", oracle=_duck_j154())
def j154_repeat_discount_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EFFECTIVE-data budget under repeat decay (round 12, Muennighoff
    et al. 2023 "Scaling Data-Constrained Language Models") — the
    audit that prices j149's allocation: UNIMAX hands a language an
    allocation of up to {UNIMAX_EPOCH_CAP} epochs, but repeated
    tokens are worth less each epoch (the paper fits ~exp(-e/R*));
    with the documented rational decay δ = 9/10, a language trained
    for E full epochs plus a partial one contributes
    Σ_{{e=0}}^{{E-1}} ⌊tokens·9^e/10^e⌋ + ⌊rem·9^E/10^E⌋ effective
    tokens. Per language: tokens, allocation, full epochs, effective
    tokens, and efficiency_q = ⌊effective·10⁴/allocation⌋ — the
    number that says WHICH languages' budget is being spent on
    low-value repeats (efficiency 10000 = all-fresh data; a capped
    low-resource language at 4 epochs reads ~8146), directly the
    paper's argument for why UNIMAX caps epochs at all.

    Exactness: j149's closed-form allocation (pure BIGINT), then
    every decay term is one integer multiply by a bounded literal
    power and one floor division — no float ever enters. Plan: the
    ONE corpus token agg j149 already pays; the decay math is a
    per-row HOF over ≤{UNIMAX_EPOCH_CAP} elements on |langs| rows —
    constants at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    lt = (
        widen(docs)
        .groupBy("lang")
        .agg(
            F.sum(F.size(whitespace_tokens(F.col("text"))))
            .cast("bigint")
            .alias("tokens")
        )
    )
    alloc = _unimax_from_tokens(lt).select("lang", "tokens", "allocation")
    p9 = f"array({', '.join(f'{x}L' for x in RD_P9)})"
    p10 = f"array({', '.join(f'{x}L' for x in RD_P10)})"
    ep = alloc.select(
        "lang",
        "tokens",
        "allocation",
        F.expr(
            "CASE WHEN tokens = 0 THEN NULL ELSE allocation div tokens END"
        ).alias("epochs_full"),
        F.expr(
            "CASE WHEN tokens = 0 THEN NULL ELSE allocation % tokens END"
        ).alias("rem"),
    )
    # epochs_full = 0 is its own branch: Spark's sequence(0, -1) counts
    # DOWN (word_ngrams' documented hazard), and the partial term alone
    # is the answer (rem·9⁰/10⁰ = allocation — all-fresh data)
    eff = (
        f"CASE WHEN epochs_full IS NULL THEN NULL "
        f"WHEN epochs_full = 0 THEN rem ELSE "
        f"aggregate(sequence(0, epochs_full - 1), 0L, (acc, e) -> "
        f"acc + (tokens * element_at({p9}, CAST(e + 1 AS INT)))"
        f" div element_at({p10}, CAST(e + 1 AS INT))) "
        f"+ (rem * element_at({p9}, CAST(epochs_full + 1 AS INT)))"
        f" div element_at({p10}, CAST(epochs_full + 1 AS INT)) END"
    )
    return ep.select(
        "lang",
        "tokens",
        "allocation",
        F.col("epochs_full").cast("bigint").alias("epochs_full"),
        F.expr(eff).cast("bigint").alias("effective_tokens"),
        F.expr(
            f"CASE WHEN allocation IS NULL OR allocation = 0 THEN NULL"
            f" ELSE ({eff}) * 10000 div allocation END"
        )
        .cast("bigint")
        .alias("efficiency_q"),
    )
