"""Round-10 vector-space operators (SURVEY.md §2 J-family tail):

- j127_pca_topr        — top-r principal directions by DEFLATED
                         accelerated power iteration over the exact
                         integer covariance (extends j121).
- j128_whiten_rescore  — j121's top component REMOVED from every
                         embedding, with j16's LSH-blocked dup pairs
                         re-scored on the whitened vectors (the
                         detect→apply step j122 stopped short of).
- j129_pq_codebook     — product-quantization codebooks (m=8
                         subspaces × k=8 centroids) trained with the
                         shared bit-exact quantized Lloyd discipline
                         (j21's posture, fanned out per subspace).
- j130_pq_adc_recall   — ADC (asymmetric distance computation) top-k
                         over the PQ codes, with recall@k against the
                         exact scan (j33's harness pattern) — the
                         audit that says whether 64 dims × 4 bytes can
                         ship as 8 one-byte codes at 100 TB.
- j133_residual_energy — the PER-VECTOR grain of j122's corpus-level
                         common-direction energy: each embedding's
                         cos² against the top principal axis — the
                         table that says WHICH vectors are mostly
                         common axis (their similarities are inflated)
                         and which carry real signal.
- j134_ivfpq_recall    — IVF coarse probe (j17's cells) + ADC over
                         j129's PQ codes inside the probed cells only,
                         with recall@k and the measured scanned-
                         candidate count — the FAISS-style IVFADC
                         composition an actual 100 TB vector store
                         runs (probe nprobe/n_lists of the corpus AND
                         read 8 codes instead of 64 floats per
                         candidate).

All four follow the established exactness discipline: quantize floats
to integers FIRST, keep every aggregation an order-free BIGINT (or
DECIMAL(38,0)) sum, divide/round once at the very end — so Spark and
DuckDB hash-match bit-for-bit despite different partitioning and
accumulation order. Oracles unroll every iteration as MATERIALIZED
CTEs (plain CTEs inline in DuckDB and re-evaluate per reference).

No reference file:line citations are possible (the /root/reference
checkout is empty — SURVEY.md §0); the algorithms are public:
Hotelling deflation (power iteration on A(I − vv^T/v^Tv)), Jégou et
al.'s product quantization (2011), and Gram-Schmidt-free subspace
diagnostics per standard texts.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from json2hbase_spark.functions.exact import QCENT_AVG
from json2hbase_spark.io import load, widen
from json2hbase_spark.materialize import materialize
from json2hbase_spark.registry import query
from json2hbase_spark.plans.selection_queries import (
    COV_SCALE,
    MATPOW_SQUARINGS,
    POWER_ITERS,
    _DUCK_COV_S,
    _PI_A,
    _PI_S,
    _accel_matrix,
    _power_eigvec,
    _power_on,
)

# --------------------------------------------------------------- j127

PCA_R = 4  # principal directions reported (r=4 per VERDICT r9 #2)


def _duck_base_matrix_parts() -> list[str]:
    """Covariance construction + MATPOW_SQUARINGS squarings — j121's
    base CTE chain (duplicated from selection_queries._duck_power_parts
    head so the per-component naming below can thread through it)."""
    parts = [
        _DUCK_COV_S,
        f"""a0 AS MATERIALIZED (
      SELECT i, j, n * sxy - sx * sy AS cov FROM s
      UNION ALL
      SELECT j, i, n * sxy - sx * sy FROM s WHERE i != j
    ),
    e0 AS (SELECT greatest(CAST(max(abs(cov)) AS BIGINT) // {_PI_A}, 1) AS d FROM a0),
    m0 AS MATERIALIZED (
      SELECT i, j, CAST(floor(CAST(cov AS DOUBLE) / d) AS BIGINT) AS cov
      FROM a0, e0
    )""",
    ]
    for t in range(1, MATPOW_SQUARINGS + 1):
        parts.append(
            f"""sq{t} AS (
      SELECT x.i AS i, y.j AS j, CAST(SUM(x.cov * y.cov) AS BIGINT) AS cov
      FROM m{t - 1} x JOIN m{t - 1} y ON x.j = y.i GROUP BY x.i, y.j
    ),
    e{t} AS (SELECT greatest(CAST(max(abs(cov)) AS BIGINT) // {_PI_A}, 1) AS d
             FROM sq{t}),
    m{t} AS MATERIALIZED (
      SELECT i, j, CAST(floor(CAST(cov AS DOUBLE) / d) AS BIGINT) AS cov
      FROM sq{t}, e{t}
    )"""
        )
    return parts


def _duck_power_tagged_parts(A: str, c: int) -> list[str]:
    """POWER_ITERS renormalized matvecs + sign fix + signed eigvec
    vs{c} + wmax{c} on matrix CTE ``A`` — the per-component twin of
    selection_queries._duck_power_parts' iteration tail."""
    parts = [
        f"v{c}_0 AS (SELECT DISTINCT i AS dim, CAST({_PI_S} AS BIGINT) AS v FROM {A})"
    ]
    for t in range(1, POWER_ITERS + 1):
        parts.append(
            f"""w{c}_{t} AS (
      SELECT a.i AS dim, CAST(SUM(a.cov * v.v) AS BIGINT) AS w
      FROM {A} a JOIN v{c}_{t - 1} v ON v.dim = a.j GROUP BY a.i
    ),
    d{c}_{t} AS (SELECT greatest(CAST(max(abs(w)) AS BIGINT) // {_PI_S}, 1) AS d
             FROM w{c}_{t}),
    v{c}_{t} AS MATERIALIZED (
      SELECT dim, CAST(floor(CAST(w AS DOUBLE) / d) AS BIGINT) AS v
      FROM w{c}_{t}, d{c}_{t}
    )"""
        )
    last = POWER_ITERS
    parts.append(
        f"""wmax{c} AS (SELECT CAST(max(abs(w)) AS BIGINT) AS w_max FROM w{c}_{last}),
    sgn{c} AS (SELECT CASE WHEN v >= 0 THEN 1 ELSE -1 END AS sg
            FROM v{c}_{last} ORDER BY abs(v) DESC, dim ASC LIMIT 1),
    vs{c} AS MATERIALIZED (
      SELECT dim, CAST(f.v * sgn{c}.sg AS BIGINT) AS v FROM v{c}_{last} f, sgn{c}
    )"""
    )
    return parts


def _duck_deflate_parts(A: str, c: int) -> list[str]:
    """Hotelling projection deflation am{c+1} = rescale(A − (A·v)·vᵀ/vᵀv)
    with the established floor-of-double-division discipline."""
    return [
        f"""wd{c} AS (
      SELECT a.i AS dim, CAST(SUM(a.cov * v.v) AS BIGINT) AS w
      FROM {A} a JOIN vs{c} v ON v.dim = a.j GROUP BY a.i
    ),
    vv{c} AS (SELECT CAST(SUM(v * v) AS BIGINT) AS vv FROM vs{c}),
    ad{c} AS (
      SELECT a.i, a.j,
             a.cov - CAST(floor(CAST(w.w * v.v AS DOUBLE) / t.vv) AS BIGINT) AS cov
      FROM {A} a
      JOIN wd{c} w ON w.dim = a.i
      JOIN vs{c} v ON v.dim = a.j, vv{c} t
    ),
    ed{c} AS (SELECT greatest(CAST(max(abs(cov)) AS BIGINT) // {_PI_A}, 1) AS d
              FROM ad{c}),
    am{c + 1} AS MATERIALIZED (
      SELECT i, j, CAST(floor(CAST(cov AS DOUBLE) / d) AS BIGINT) AS cov
      FROM ad{c}, ed{c}
    )"""
    ]


def _duck_pca_topr_oracle() -> str:
    parts = _duck_base_matrix_parts()
    A = f"m{MATPOW_SQUARINGS}"
    selects = []
    for c in range(PCA_R):
        parts += _duck_power_tagged_parts(A, c)
        selects.append(
            f"SELECT {c} AS component, CAST(f.dim AS INT) AS dim, f.v, wmax{c}.w_max"
            f" FROM vs{c} f, wmax{c}"
        )
        if c < PCA_R - 1:
            parts += _duck_deflate_parts(A, c)
            A = f"am{c + 1}"
    return "WITH " + ",\n    ".join(parts) + "\n    " + "\n    UNION ALL ".join(selects)


def _deflate(a: DataFrame, v_signed: DataFrame) -> DataFrame:
    """Spark twin of _duck_deflate_parts: project the (signed,
    scale-_PI_S) eigvec out of matrix ``a`` and renormalize. All
    bounds inside int64 with margin: |cov| ≤ 2·_PI_A after rescale,
    matvec |w| ≤ 64·2e6·2e3 ≈ 2.6e11, w·v ≤ 5.2e14 (double-exact,
    < 2^53), vᵀv ≥ _PI_S² so the subtracted term ≤ ~5.2e8."""
    from json2hbase_spark.plans.selection_queries import _pi_rescaled

    w = (
        a.join(
            F.broadcast(v_signed.select(F.col("dim").alias("j"), "v")), "j"
        )
        .groupBy(F.col("i").alias("dim"))
        .agg(F.sum(F.col("cov") * F.col("v")).cast("bigint").alias("w"))
    )
    vv = v_signed.agg(F.sum(F.col("v") * F.col("v")).cast("bigint").alias("vv"))
    defl = (
        a.join(F.broadcast(w.select(F.col("dim").alias("i"), "w")), "i")
        .join(
            F.broadcast(
                v_signed.select(F.col("dim").alias("j"), F.col("v").alias("vj"))
            ),
            "j",
        )
        .crossJoin(F.broadcast(vv))
        .select(
            "i",
            "j",
            (
                F.col("cov")
                - F.floor(
                    (F.col("w") * F.col("vj")).cast("double") / F.col("vv")
                ).cast("bigint")
            ).alias("cov"),
        )
    )
    return materialize(_pi_rescaled(defl))


@query("j127_pca_topr", oracle=_duck_pca_topr_oracle())
def j127_pca_topr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PCA_R} principal directions of the corpus embedding cloud
    — the subspace extension of j121 (VERDICT r9 #2): component 0 is
    j121's eigvec exactly; each further component runs the SAME
    accelerated power iteration against the HOTELLING-DEFLATED matrix
    A_(c+1) = rescale(A_c − (A_c·v_c)·v_cᵀ / v_cᵀv_c) — the
    projection deflation that zeroes v_c's invariant subspace
    (B·v = A·v − A·v = 0 up to floor rounding) while leaving every
    other eigvec intact. The output is the r×d table a whitening /
    PCA-projection / anisotropy report consumes: (component, dim,
    eigvec component at scale {_PI_S}, final |A·v|_∞ as the
    per-component eigenvalue proxy in that component's rescaled-matrix
    units — comparable WITHIN a component's iteration, a relative
    spectrum signal ACROSS components).

    Exactness: deflation reuses the established primitives — integer
    matvec (exact BIGINT), floor-of-double-division for the projection
    term (w·v ≤ 5.2e14 < 2^53, so the double is exact; IEEE-identical
    in DuckDB) and the _PI_A rescale between steps. Every iterate is
    bit-identical in both engines; the oracle unrolls all
    {PCA_R}×({POWER_ITERS} matvecs + deflation) as MATERIALIZED CTEs.
    Fixture caveat (documented, not hidden): the spectrum is FLAT
    (λ2/λ1 ≈ 0.93), so 5 matvecs against A^16 leave components
    cross-cosines up to ~0.16 — the subspace is a diagnostic, not an
    orthonormal basis; callers needing strict orthogonality
    Gram-Schmidt the 4×64 output (driver-side free at any corpus
    size).

    Plan: ONE corpus pass builds the covariance (j97's d(d+1)/2-row
    shuffle bound); everything after — squarings, matvecs, deflations
    — is bounded ≤d² rows per step, materialized per step (the
    per-iteration checkpoint cadence). At 100 TB the corpus cost is
    identical to j121's; the extra components cost O(r·(d²·iters))
    — constants."""
    comps = _pca_components(spark, sf_dir, refresh=True)
    out = []
    for c, (v_signed, wmax) in enumerate(comps):
        out.append(
            v_signed.crossJoin(F.broadcast(wmax)).select(
                F.lit(c).alias("component"),
                F.col("dim").cast("int").alias("dim"),
                F.col("v").cast("bigint").alias("v"),
                "w_max",
            )
        )
    return reduce(DataFrame.unionByName, out)


# Session-scoped deflated-components memo (round 13 — one level above
# the _gs_basis memo): j127 (the components DEFINER — "pca_topr" IS
# the top-r component table) and j145's Gram-Schmidt chain both re-ran
# the identical covariance + {MATPOW_SQUARINGS} squarings +
# PCA_R×({POWER_ITERS} matvecs + deflation) chain. The components are
# DIMENSION-bounded (PCA_R × 64 exact-integer rows + one scalar each),
# so the collect→local-relation round-trip is bit-lossless — the same
# payer/consumer split VERDICT r11 #1 directed for j145→j147, applied
# to j127→j145: j127 recomputes (its bench time IS the chain), j145
# rides the components and pays only its own GS + quality columns.
_PCA_COMP_CACHE: dict[tuple, list[tuple[list[tuple[int, int]], int]]] = {}


def _pca_components(spark: SparkSession, sf_dir: str, refresh: bool = False):
    """j127's deflated power-iteration chain: PCA_R (v_signed, wmax)
    pairs as local relations. Memoized per (session, fixture) with
    j127 as the refreshing definer; _gs_basis_compute consumes."""
    from json2hbase_spark.plans.selection_queries import _eig_cache_key

    key = _eig_cache_key(spark, sf_dir)
    stored = None if refresh else _PCA_COMP_CACHE.get(key)
    if stored is None:
        from json2hbase_spark.session import scoped_bounded_chain

        with scoped_bounded_chain(spark):
            a = _accel_matrix(spark, sf_dir)
            stored = []
            for c in range(PCA_R):
                _v_signed, _wmax, vfull = _power_on(a)
                data = vfull.collect()  # one action: vector + w_max
                rows = sorted((int(r["dim"]), int(r["v"])) for r in data)
                wm = int(data[0]["w_max"])
                stored.append((rows, wm))
                if c < PCA_R - 1:
                    # deflate consumes the CHECKPOINT-backed vector
                    # (the local-relation variant measured ~1.2 s
                    # SLOWER per j127 run in an interleaved A/B — the
                    # LocalTableScan broadcast sides lose exchange
                    # reuse in the deflation joins; keep the
                    # materialized table)
                    a = _deflate(a, _v_signed)
        from json2hbase_spark.plans.selection_queries import (
            _EIG_CACHE,
            _evict_stale_sessions,
        )

        _evict_stale_sessions(_PCA_COMP_CACHE, key[0])
        _PCA_COMP_CACHE[key] = stored
        # Cross-seed (ADVICE r13): component 0 IS _power_eigvec's
        # result (same _accel_matrix input, same _power_on chain —
        # bit-identical by construction, pinned by the memo tests), so
        # an eigvec consumer after a j127/j145 warm-up should not
        # re-run the covariance + squaring + matvec chain. setdefault
        # keeps an existing entry (equal values) untouched.
        _EIG_CACHE.setdefault(key, stored[0])
    return [
        (
            spark.createDataFrame(rows, "dim INT, v BIGINT"),
            spark.createDataFrame([(wm,)], "w_max BIGINT"),
        )
        for rows, wm in stored
    ]


# --------------------------------------------------------------- j128

WHITEN_RDIV = 1 << 20  # residual downscale: keeps pair dots inside int64
WHITEN_TAU = 0.35  # j16's dup threshold, applied to the BEFORE cosine


def _duck_whiten_rescore_oracle() -> str:
    from json2hbase_spark.plans.llm_queries import _duck_bucket
    from json2hbase_spark.plans.selection_queries import _duck_power_parts

    last = POWER_ITERS
    parts = _duck_power_parts()
    parts.append(
        f"""evl AS (
      SELECT list(e.v * sgn.sg ORDER BY e.dim) AS v
      FROM v{last} e, sgn GROUP BY sgn.sg
    ),
    vvw AS (SELECT CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT)
              AS vv FROM evl),
    qt AS (
      SELECT vec_id, {_duck_bucket("embedding")} AS bucket,
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * {COV_SCALE})
                                      AS BIGINT)) AS q
      FROM embeddings
    ),
    qvt AS (
      SELECT vec_id, bucket, q,
             CAST(list_sum(list_transform(range(1, 65),
                    i -> q[i] * evl.v[i])) AS BIGINT) AS qv
      FROM qt, evl
    ),
    resid AS MATERIALIZED (
      SELECT vec_id, bucket, q,
             list_transform(range(1, 65),
               i -> CAST(floor(CAST(q[i] * t.vv
                                    - qv * e.v[i] AS DOUBLE)
                               / {WHITEN_RDIV}) AS BIGINT)) AS r
      FROM qvt, evl e, vvw t
    ),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket,
             CAST(list_sum(list_transform(range(1, 65),
                    i -> a.q[i] * b.q[i])) AS BIGINT) AS qd,
             CAST(list_sum(list_transform(a.q, x -> x * x)) AS BIGINT) AS qa2,
             CAST(list_sum(list_transform(b.q, x -> x * x)) AS BIGINT) AS qb2,
             CAST(list_sum(list_transform(range(1, 65),
                    i -> a.r[i] * b.r[i])) AS BIGINT) AS rd,
             CAST(list_sum(list_transform(a.r, x -> x * x)) AS BIGINT) AS ra2,
             CAST(list_sum(list_transform(b.r, x -> x * x)) AS BIGINT) AS rb2
      FROM resid a JOIN resid b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    scored AS (
      SELECT vec_a, vec_b, bucket,
             round(CAST(qd AS DOUBLE)
                   / (sqrt(CAST(qa2 AS DOUBLE)) * sqrt(CAST(qb2 AS DOUBLE))),
                   6) AS sim_before,
             CASE WHEN ra2 = 0 OR rb2 = 0 THEN 0.0
                  ELSE round(CAST(rd AS DOUBLE)
                             / (sqrt(CAST(ra2 AS DOUBLE))
                                * sqrt(CAST(rb2 AS DOUBLE))), 6)
             END AS sim_after
      FROM pairs
    )
    SELECT vec_a, vec_b, bucket, sim_before, sim_after,
           sim_after >= {WHITEN_TAU} AS still_dup
    FROM scored WHERE sim_before >= {WHITEN_TAU}"""
    )
    return "WITH " + ",\n    ".join(parts)


@query("j128_whiten_rescore", oracle=_duck_whiten_rescore_oracle())
def j128_whiten_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-direction removal APPLIED and the dup set re-judged —
    the detect→apply step j122 stops short of (VERDICT r9 #2): every
    embedding is rewritten with j121's top component projected out
    (r = q·vᵀv − (q·v)·v, the standard all-but-the-top anisotropy
    fix), and j16's LSH-blocked candidate dup pairs are scored on
    BOTH versions. A pair whose sim_before ≥ τ but sim_after < τ was
    riding the corpus' common axis — an inflated near-dup the
    whitened space correctly releases; still_dup marks the pairs the
    dedup decision keeps either way.

    Exactness: q (scale {COV_SCALE}) and v (scale {_PI_S}) are the
    established quantized integers; the residual r is computed at the
    vᵀv scale (exact BIGINT, |r_i| ≤ ~5.2e11) then floor-divided by
    {WHITEN_RDIV} so all pair dot products are order-free int64 sums
    (|Σr'ar'b| ≤ 64·(5e5)² ≈ 1.6e13); norms multiply as
    sqrt(double)·sqrt(double) — IEEE-identical in both engines; the
    cosines round once at the end. The floor steps are part of the
    DEFINED transform, so hash-exactness never depends on precision.

    Plan: the eigvec collapses to ONE broadcast 64-element array (the
    j122 shape); residuals are a per-row codegen'd fold over the
    corpus scan, materialized ONCE so the self-join's two sides share
    it; pairs meet only inside j16's LSH bucket (O(n²/2^planes), the
    dedup blocking a 100 TB pass shards on). Cost at scale = j16's
    candidate generation + one corpus-scan rewrite — the rewrite a
    production anisotropy fix pays exactly once, amortized over every
    downstream similarity query."""
    from json2hbase_spark.operators.similarity import lsh_bucket
    from json2hbase_spark.plans.llm_queries import LSH_PLANES

    v_signed, _ = _power_eigvec(spark, sf_dir)
    evl = v_signed.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "v"))), lambda x: x["v"]
        ).alias("v")
    )
    vvw = evl.select(
        F.aggregate(
            F.zip_with("v", "v", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("vv")
    )
    emb = load(spark, sf_dir, "embeddings")
    qt = widen(emb).select(
        "vec_id",
        lsh_bucket(F.col("embedding"), LSH_PLANES).alias("bucket"),
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * COV_SCALE).cast("long")
        ).alias("q"),
    )
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    with_qv = qt.crossJoin(F.broadcast(evl)).crossJoin(F.broadcast(vvw)).select(
        "vec_id",
        "bucket",
        "q",
        "vv",
        "v",
        fold(F.zip_with("q", "v", lambda a, b: a * b)).alias("qv"),
    )
    resid = materialize(
        with_qv.select(
            "vec_id",
            "bucket",
            "q",
            F.zip_with(
                "q",
                "v",
                lambda qi, vi: F.floor(
                    (qi * F.col("vv") - F.col("qv") * vi).cast("double")
                    / F.lit(WHITEN_RDIV)
                ).cast("long"),
            ).alias("r"),
        )
    )
    a = resid.select(
        F.col("vec_id").alias("vec_a"),
        "bucket",
        F.col("q").alias("qa"),
        F.col("r").alias("ra"),
    )
    b = resid.select(
        F.col("vec_id").alias("vec_b"),
        F.col("bucket").alias("bucket_b"),
        F.col("q").alias("qb"),
        F.col("r").alias("rb"),
    )
    pairs = a.join(
        b,
        (F.col("bucket") == F.col("bucket_b")) & (F.col("vec_a") < F.col("vec_b")),
    ).select(
        "vec_a",
        "vec_b",
        "bucket",
        fold(F.zip_with("qa", "qb", lambda x, y: x * y)).alias("qd"),
        fold(F.zip_with("qa", "qa", lambda x, y: x * y)).alias("qa2"),
        fold(F.zip_with("qb", "qb", lambda x, y: x * y)).alias("qb2"),
        fold(F.zip_with("ra", "rb", lambda x, y: x * y)).alias("rd"),
        fold(F.zip_with("ra", "ra", lambda x, y: x * y)).alias("ra2"),
        fold(F.zip_with("rb", "rb", lambda x, y: x * y)).alias("rb2"),
    )
    sim_before = F.round(
        F.col("qd").cast("double")
        / (F.sqrt(F.col("qa2").cast("double")) * F.sqrt(F.col("qb2").cast("double"))),
        6,
    )
    sim_after = F.when(
        (F.col("ra2") == 0) | (F.col("rb2") == 0), F.lit(0.0)
    ).otherwise(
        F.round(
            F.col("rd").cast("double")
            / (
                F.sqrt(F.col("ra2").cast("double"))
                * F.sqrt(F.col("rb2").cast("double"))
            ),
            6,
        )
    )
    return (
        pairs.withColumn("sim_before", sim_before)
        .withColumn("sim_after", sim_after)
        .filter(F.col("sim_before") >= WHITEN_TAU)
        .select(
            "vec_a",
            "vec_b",
            "bucket",
            "sim_before",
            "sim_after",
            (F.col("sim_after") >= WHITEN_TAU).alias("still_dup"),
        )
    )


# --------------------------------------------------------------- j129

PQ_M = 8  # subspaces (64 dims → 8 × 8)
PQ_SUBDIM = 8
PQ_K = 8  # centroids per subspace (3-bit codes; the oracle-pinned k)
PQ_ITERS = 2  # Lloyd rounds, unrolled in the oracle
PQ_DIST_SCALE = 1_000_000_000  # distortion quantizer: floor(d·1e9 + 0.5)


def _duck_pq_sqdist(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(range(1,{PQ_SUBDIM + 1}),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), 'sum')"
    )


_DUCK_PV_EMB = (
    "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve"
    " FROM embeddings"
)


def _duck_pq_parts(
    iters: int = PQ_ITERS, pv_sql: str = _DUCK_PV_EMB, p: str = ""
) -> list[str]:
    """Unrolled per-subspace Lloyd iterations ending in
    ``{p}paf(vec_id, sub, cluster, d)`` + ``{p}pc{iters}(sub, cluster,
    ce)`` — the PQ twin of advanced_queries.kmeans_ctes with the
    subspace id threaded through every stage. ``pv_sql`` defines the
    input vector CTE (vec_id, ve array<double>); ``p`` prefixes every
    CTE name so two chains (raw + whitened, j139) can coexist."""
    q = QCENT_AVG.format(v=f"sv[i.i + 1]")
    parts = [
        f"""{p}pv AS ({pv_sql})""",
        f"""{p}psv AS MATERIALIZED (
      SELECT vec_id, s.s AS sub,
             list_slice(ve, s.s * {PQ_SUBDIM} + 1, s.s * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sv
      FROM {p}pv, (SELECT unnest(range({PQ_M})) AS s) s
    )""",
        f"""{p}pc0 AS (SELECT sub, CAST(vec_id AS INTEGER) AS cluster, sv AS ce
     FROM {p}psv WHERE vec_id < {PQ_K})""",
    ]
    prev = f"{p}pc0"
    for it in range(1, iters + 1):
        parts.append(
            f"""{p}pa{it} AS (
      SELECT vec_id, sub, sv, cluster FROM (
        SELECT p.vec_id, p.sub, p.sv, c.cluster,
               row_number() OVER (PARTITION BY p.vec_id, p.sub
                                  ORDER BY {_duck_pq_sqdist('p.sv', 'c.ce')}, c.cluster) AS rn
        FROM {p}psv p JOIN {prev} c ON c.sub = p.sub) WHERE rn = 1)"""
        )
        parts.append(
            f"""{p}pcl{it} AS (
      SELECT sub, cluster, i.i AS pos, {q} AS cv
      FROM {p}pa{it}, (SELECT unnest(range({PQ_SUBDIM})) AS i) i GROUP BY 1, 2, 3)"""
        )
        parts.append(
            f"""{p}pc{it} AS MATERIALIZED (
      SELECT sub, cluster, list(cv ORDER BY pos) AS ce
      FROM {p}pcl{it} GROUP BY sub, cluster)"""
        )
        prev = f"{p}pc{it}"
    parts.append(
        f"""{p}paf AS MATERIALIZED (
      SELECT vec_id, sub, cluster, d FROM (
        SELECT p.vec_id, p.sub, c.cluster,
               {_duck_pq_sqdist('p.sv', 'c.ce')} AS d,
               row_number() OVER (PARTITION BY p.vec_id, p.sub
                                  ORDER BY {_duck_pq_sqdist('p.sv', 'c.ce')}, c.cluster) AS rn
        FROM {p}psv p JOIN {prev} c ON c.sub = p.sub) WHERE rn = 1)"""
    )
    return parts


def _duck_pq_codebook_oracle() -> str:
    return (
        "WITH "
        + ",\n    ".join(_duck_pq_parts())
        + f"""
    SELECT CAST(sub AS INT) AS sub, CAST(cluster AS INT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_assigned,
           CAST(SUM(CAST(floor(d * {PQ_DIST_SCALE} + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_qdist,
           round(CAST(SUM(CAST(floor(d * {PQ_DIST_SCALE} + 0.5) AS BIGINT)) AS DOUBLE)
                 / (COUNT(*) * {PQ_DIST_SCALE}), 6) AS mean_dist
    FROM paf GROUP BY sub, cluster"""
    )


def _pq_sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_to(subvecs: DataFrame, c: DataFrame) -> DataFrame:
    """One PQ assignment pass: nearest codebook entry per (vec, sub)
    as a map-side-combinable min(struct(d, cluster, sv)) hash agg."""
    return (
        subvecs.join(F.broadcast(c), "sub")
        .groupBy("vec_id", "sub")
        .agg(
            F.min(
                F.struct(
                    _pq_sqdist(F.col("sv"), F.col("ce")).alias("d"),
                    F.col("cluster").alias("cluster"),
                    F.col("sv").alias("sv"),
                )
            ).alias("s")
        )
        .select(
            "vec_id",
            "sub",
            F.col("s.sv").alias("sv"),
            F.col("s.cluster").alias("cluster"),
            F.col("s.d").alias("d"),
        )
    )


# Session-scoped codebook memo (round 13 — the _gs_basis/_power_eigvec
# pattern): five trainer calls (j129, j130, j134, i34, j139's raw leg)
# each re-ran the {PQ_ITERS} Lloyd rounds over the corpus to converge
# the SAME {PQ_M}×{PQ_K} codebook. The codebook is BOUNDED (64 rows of
# 8 doubles, deterministic for a fixture) and doubles round-trip
# bit-exactly through collect/createDataFrame, so consumers ride a
# local relation and pay only their own subvec + final-assign pass.
# j129 (the codebook DEFINER) passes refresh=True — its bench time IS
# the training cost. Keyed like _EIG_CACHE; the ``vectors`` override
# (j139's whitened leg) never touches the memo.
_PQ_CENTS_CACHE: dict[tuple, list[tuple[int, int, list[float]]]] = {}


def _pq_train(
    spark: SparkSession,
    sf_dir: str,
    vectors: DataFrame | None = None,
    refresh: bool = False,
):
    """Shared PQ trainer: returns (subvecs, cents, codes) — the
    materialized (vec_id, sub, sv) table, the final (sub, cluster, ce)
    codebooks and the (vec_id, sub, cluster, d) code assignment. The
    Lloyd discipline is j21's bit-exact kernel fanned out per
    subspace: one grouped plan trains all {PQ_M} codebooks at once
    (sub rides every key), not {PQ_M} sequential jobs. ``vectors``
    (vec_id, embedding) overrides the default embeddings scan —
    j139 trains on the whitened residual table through this hook."""
    from json2hbase_spark.plans.selection_queries import _eig_cache_key

    emb = (
        widen(load(spark, sf_dir, "embeddings")) if vectors is None else vectors
    )
    subvecs = materialize(
        emb.select(
            "vec_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("sub"),
                            F.transform(
                                F.slice("embedding", s * PQ_SUBDIM + 1, PQ_SUBDIM),
                                lambda x: x.cast("double"),
                            ).alias("sv"),
                        )
                        for s in range(PQ_M)
                    ]
                )
            ).alias("ss"),
        ).select("vec_id", "ss.sub", "ss.sv")
    )
    key = None if vectors is not None else _eig_cache_key(spark, sf_dir)
    if key is not None and not refresh:
        hit = _PQ_CENTS_CACHE.get(key)
        if hit is not None:
            cents = spark.createDataFrame(
                hit, "sub INT, cluster INT, ce ARRAY<DOUBLE>"
            )
            codes = materialize(
                assign_to(subvecs, cents).select("vec_id", "sub", "cluster", "d")
            )
            return subvecs, cents, codes

    cents = subvecs.filter(F.col("vec_id") < PQ_K).select(
        "sub", F.col("vec_id").cast("int").alias("cluster"), F.col("sv").alias("ce")
    )

    def assign(c: DataFrame) -> DataFrame:
        return assign_to(subvecs, c)

    # Lloyd rounds CHAIN as one lineage (round 13, the kmeans_assign
    # lesson): each round's centroid subtree is consumed exactly once
    # by the next assign (subvecs is materialized, so the broadcast
    # re-derives only the bounded PQ_M×PQ_K centroid arithmetic) —
    # the per-round localCheckpoint bought nothing but 2 extra driver
    # actions per round. The FINAL cents collects to a local relation
    # (the collect is the chain's one action): it is bounded,
    # multi-consumed (codes here, the ADC LUT in j130/j134/j139), and
    # doubles round-trip bit-exactly — same plan shape on compute and
    # memo paths.
    for it in range(PQ_ITERS):
        cents = (
            assign(cents)
            .select("sub", "cluster", F.posexplode("sv").alias("pos", "val"))
            .groupBy("sub", "cluster", "pos")
            .agg(F.expr(QCENT_AVG.format(v="val")).alias("cv"))
            .groupBy("sub", "cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                    lambda s: s["cv"],
                ).alias("ce")
            )
        )
    rows = sorted(
        (int(r["sub"]), int(r["cluster"]), [float(x) for x in r["ce"]])
        for r in cents.collect()
    )
    if key is not None:
        from json2hbase_spark.plans.selection_queries import _evict_stale_sessions

        _evict_stale_sessions(_PQ_CENTS_CACHE, key[0])
        _PQ_CENTS_CACHE[key] = rows
    cents = spark.createDataFrame(rows, "sub INT, cluster INT, ce ARRAY<DOUBLE>")
    codes = materialize(assign(cents).select("vec_id", "sub", "cluster", "d"))
    return subvecs, cents, codes


@query("j129_pq_codebook", oracle=_duck_pq_codebook_oracle())
def j129_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook training (VERDICT r9 #4) — the
    real 100 TB vector-store compression: the 64-dim embedding splits
    into {PQ_M} contiguous {PQ_SUBDIM}-dim subvectors, each quantized
    against its own {PQ_K}-centroid codebook (Jégou et al. 2011), so
    a vector ships as {PQ_M} small codes instead of 64 floats. This
    op reports the trained codebooks' quality: per (subspace,
    centroid) occupancy and quantization distortion — the table that
    says whether the codebooks are balanced (skewed occupancy = a
    dead code wasting a codepoint) and which subspace carries the
    most quantization error.

    Training is the shared bit-exact Lloyd discipline (j21's kernel
    shape): seed = vec_id<{PQ_K}'s subvectors, assignment = one
    map-side-combinable min(struct(d, cluster)) hash agg per round
    (no sort), centroid update = the QCENT_AVG quantized-integer
    average — all {PQ_M} subspaces train in ONE grouped plan (sub is
    just another key), not {PQ_M} sequential jobs. Distortions cross
    the wire as floor(d·1e9+0.5) BIGINTs so the per-cell sums are
    order-free. The oracle unrolls both Lloyd rounds with the sub key
    threaded through (MATERIALIZED CTEs).

    At 100 TB: each round is one broadcast of {PQ_M}×{PQ_K} centroids
    + one hash agg over (vec, sub) — scan-shaped, no shuffle grows
    with corpus size beyond the {PQ_M}·{PQ_K}·{PQ_SUBDIM}-cell
    centroid table."""
    _, _, codes = _pq_train(spark, sf_dir, refresh=True)
    qd = F.floor(F.col("d") * PQ_DIST_SCALE + 0.5).cast("long")
    return (
        codes.groupBy("sub", "cluster")
        .agg(
            F.count("*").cast("bigint").alias("n_assigned"),
            F.sum(qd).cast("bigint").alias("sum_qdist"),
        )
        .select(
            F.col("sub").cast("int").alias("sub"),
            F.col("cluster").cast("int").alias("cluster"),
            "n_assigned",
            "sum_qdist",
            F.round(
                F.col("sum_qdist").cast("double")
                / (F.col("n_assigned") * PQ_DIST_SCALE),
                6,
            ).alias("mean_dist"),
        )
    )


# --------------------------------------------------------------- j130

PQ_NQ = 10  # query vectors (vec_id < 10 — j17/j18/j33's convention)
PQ_TOPK = 3


def _duck_pq_adc_recall_oracle() -> str:
    full_sqdist = (
        "list_aggregate(list_transform(range(1,65),"
        " i -> (q.qe[i] - c.ve[i]) * (q.qe[i] - c.ve[i])), 'sum')"
    )
    parts = _duck_pq_parts()
    parts.append(
        f"""pq AS (SELECT vec_id AS qid, ve AS qe FROM pv WHERE vec_id < {PQ_NQ}),
    lut AS MATERIALIZED (
      SELECT q.qid, s.sub, s.cluster,
             CAST(floor({_duck_pq_sqdist("list_slice(q.qe, s.sub * %d + 1, s.sub * %d + %d)" % (PQ_SUBDIM, PQ_SUBDIM, PQ_SUBDIM), "s.ce")} * {PQ_DIST_SCALE} + 0.5) AS BIGINT) AS qd
      FROM pq q, pc{PQ_ITERS} s
    ),
    adc AS (
      SELECT l.qid, p.vec_id AS cid, CAST(SUM(l.qd) AS BIGINT) AS adist
      FROM paf p JOIN lut l ON l.sub = p.sub AND l.cluster = p.cluster
      WHERE p.vec_id != l.qid
      GROUP BY l.qid, p.vec_id
    ),
    adc_top AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid ORDER BY adist, cid) AS rnk
        FROM adc) WHERE rnk <= {PQ_TOPK}
    ),
    exact_top AS (
      SELECT qid, cid FROM (
        SELECT q.qid, c.vec_id AS cid,
               row_number() OVER (PARTITION BY q.qid
                                  ORDER BY {full_sqdist}, c.vec_id) AS rnk
        FROM pq q JOIN pv c ON c.vec_id != q.qid) WHERE rnk <= {PQ_TOPK}
    )
    SELECT e.qid,
           CAST(COUNT(a.cid) AS BIGINT) AS n_hits,
           round(CAST(COUNT(a.cid) AS DOUBLE) / {PQ_TOPK}, 4) AS recall
    FROM exact_top e
    LEFT JOIN adc_top a ON a.qid = e.qid AND a.cid = e.cid
    GROUP BY e.qid"""
    )
    return "WITH " + ",\n    ".join(parts)


@query("j130_pq_adc_recall", oracle=_duck_pq_adc_recall_oracle())
def j130_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC retrieval over the PQ codes + recall@{PQ_TOPK} against the
    exact scan — the audit that decides whether j129's compression is
    usable (j33/j38's harness pattern, completing the scalar-quant
    story j79 started): each query precomputes a {PQ_M}×{PQ_K}
    distance lookup table against the codebooks (floor(d·1e9+0.5)
    BIGINTs), every database vector's approximate distance is then
    just the SUM of {PQ_M} table lookups selected by its codes —
    never a float op against the original vectors — and the ADC
    top-{PQ_TOPK} is compared per query against the exact
    64-dim scan.

    Exactness: the LUT entries are quantized BIGINTs, so the ADC
    distance is an order-free integer sum; both rankings tie-break on
    candidate id; the only doubles are the sequential-fold sqdists
    both engines evaluate identically (j21's established
    equivalence). Plan: LUT = {PQ_NQ}·{PQ_M}·{PQ_K} rows, BROADCAST
    into one hash-agg over the code table ({PQ_M} rows per database
    vector — the compressed representation IS the scan); the exact
    side is the j3-style bounded-query crossJoin. At 100 TB the ADC
    scan reads {PQ_M} bytes-ish per vector instead of 256 — the whole
    point of PQ — and the recall table is the evidence the shortcut
    is safe — or, as on THIS fixture, that it is not: the synthetic
    embedding cloud is near-isotropic, so 64-d distances concentrate
    and {PQ_M}×{PQ_K} quantization cells are too coarse to preserve
    top-{PQ_TOPK} order (measured mean recall ≈ 0.1–0.2 at sf0.01;
    k=16 only reaches ≈ 0.23). That low number is the op WORKING:
    it is precisely the evidence that would send a pipeline team to
    k=256 codebooks / OPQ rotation before shipping the compressed
    index, and the planted-structure test proves the machinery
    reports recall 1.0 when the corpus actually clusters."""
    subvecs, cents, codes = _pq_train(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("ve")
    )
    return _pq_adc_recall_table(vecs, cents, codes)


def _pq_adc_recall_table(
    vecs: DataFrame, cents: DataFrame, codes: DataFrame
) -> DataFrame:
    """Shared j130/j139 harness: ADC top-{PQ_TOPK} over ``codes``
    against the {PQ_NQ}-query LUT on ``cents``, compared to the exact
    scan over ``vecs`` (vec_id, ve) — returns (qid, n_hits, recall)."""
    q = vecs.filter(F.col("vec_id") < PQ_NQ).select(
        F.col("vec_id").alias("qid"), F.col("ve").alias("qe")
    )
    lut = materialize(
        q.crossJoin(F.broadcast(cents)).select(
            "qid",
            "sub",
            "cluster",
            F.floor(
                _pq_sqdist(
                    F.slice("qe", F.col("sub") * PQ_SUBDIM + 1, PQ_SUBDIM),
                    F.col("ce"),
                )
                * PQ_DIST_SCALE
                + 0.5
            )
            .cast("long")
            .alias("qd"),
        )
    )
    adc = (
        codes.join(F.broadcast(lut), ["sub", "cluster"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", F.col("vec_id").alias("cid"))
        .agg(F.sum("qd").cast("bigint").alias("adist"))
    )
    w_adc = Window.partitionBy("qid").orderBy("adist", "cid")
    adc_top = adc.withColumn("rnk", F.row_number().over(w_adc)).filter(
        F.col("rnk") <= PQ_TOPK
    )
    full_d = _pq_sqdist(F.col("qe"), F.col("ve"))
    # queries broadcast explicitly: vecs may be a localCheckpoint-backed
    # table AQE cannot size (j139's whitened chain), which would turn
    # the bounded-query cross join into a CartesianProduct
    exact = vecs.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("qid")
    ).select("qid", F.col("vec_id").alias("cid"), full_d.alias("d"))
    w_ex = Window.partitionBy("qid").orderBy("d", "cid")
    exact_top = exact.withColumn("rnk", F.row_number().over(w_ex)).filter(
        F.col("rnk") <= PQ_TOPK
    )
    return (
        exact_top.select("qid", "cid")
        .join(
            # both top-k lists are NQ·TOPK rows at any corpus size —
            # broadcast explicitly (two window outputs give AQE no
            # usable size estimate and it would plan SMJ)
            F.broadcast(adc_top.select("qid", "cid", F.lit(1).alias("hit"))),
            ["qid", "cid"],
            "left",
        )
        .groupBy("qid")
        .agg(
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hits"),
        )
        .select(
            "qid",
            "n_hits",
            F.round(F.col("n_hits").cast("double") / PQ_TOPK, 4).alias("recall"),
        )
    )


# --------------------------------------------------------------- j133

ENERGY_DECILES = 10  # decile bucketing of the per-vector energy share


def _duck_residual_energy_oracle() -> str:
    from json2hbase_spark.plans.selection_queries import _duck_power_parts

    last = POWER_ITERS
    parts = _duck_power_parts()
    parts.append(
        f"""evl AS (
      SELECT list(e.v * sgn.sg ORDER BY e.dim) AS v
      FROM v{last} e, sgn GROUP BY sgn.sg
    ),
    vvw AS (SELECT CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT)
              AS vv FROM evl),
    qt AS (
      SELECT vec_id, label,
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * {COV_SCALE})
                                      AS BIGINT)) AS q
      FROM embeddings
    ),
    dots AS (
      SELECT vec_id, label,
             CAST(list_sum(list_transform(range(1, 65),
                    i -> q[i] * evl.v[i])) AS BIGINT) AS qv,
             CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS qq
      FROM qt, evl
    ),
    en AS (
      SELECT vec_id, label,
             CASE WHEN qq = 0 THEN 0.0
                  ELSE round((CAST(qv AS DOUBLE) * CAST(qv AS DOUBLE))
                             / (CAST(qq AS DOUBLE) * CAST(t.vv AS DOUBLE)), 6)
             END AS energy_frac
      FROM dots, vvw t
    )
    SELECT vec_id, CAST(label AS INT) AS label, energy_frac,
           CAST(least(CAST(floor(energy_frac * {ENERGY_DECILES}) AS BIGINT),
                      {ENERGY_DECILES - 1}) AS INT) AS decile
    FROM en"""
    )
    return "WITH " + ",\n    ".join(parts)


@query("j133_residual_energy", oracle=_duck_residual_energy_oracle())
def j133_residual_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-VECTOR common-axis energy — the vector-grain companion to
    j122's corpus-level energy share and the audit j128's whitening
    rewrite acts on (SURVEY round-10 candidate: "a residual-energy
    per-vector grain"): each embedding's squared cosine against the
    top principal axis, cos²(q, v) = (q·v)² / (|q|²·|v|²) — exactly
    the fraction of THAT vector's energy the whitening projection
    removes. A vector near decile 9 is mostly common axis (every
    cosine it participates in is inflated — j128 will re-score its
    pairs down); a vector near decile 0 is untouched by the rewrite.
    The decile column is the histogram key a fleet-level report
    aggregates on; the per-vector rows are the rewrite-shaped table a
    selection pass filters (e.g. "quarantine docs whose embedding is
    > 80% boilerplate axis").

    Exactness: q (scale {COV_SCALE}) and v (scale _PI_S) are the
    established quantized integers; q·v, |q|², |v|² are exact
    order-free BIGINT folds (|q·v| ≤ 64·4e3·2e3 ≈ 5e8); the ratio is
    computed as (double·double)/(double·double) from EXACTLY
    representable int64s (< 2^53 each) — IEEE-identical in both
    engines — and rounds once. Plan: the eigvec collapses to ONE
    broadcast 64-element array (j122/j128's shape); the energy is a
    per-row codegen'd fold over one corpus scan — at 100 TB this is
    scan-bound with a 1-row broadcast, nothing shuffles but the
    covariance pass j121 already runs."""
    v_signed, _ = _power_eigvec(spark, sf_dir)
    evl = v_signed.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "v"))), lambda x: x["v"]
        ).alias("v")
    )
    vvw = evl.select(
        F.aggregate(
            F.zip_with("v", "v", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("vv")
    )
    emb = load(spark, sf_dir, "embeddings")
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    qt = widen(emb).select(
        "vec_id",
        "label",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * COV_SCALE).cast("long")
        ).alias("q"),
    )
    dots = qt.crossJoin(F.broadcast(evl)).crossJoin(F.broadcast(vvw)).select(
        "vec_id",
        "label",
        fold(F.zip_with("q", "v", lambda a, b: a * b)).alias("qv"),
        fold(F.zip_with("q", "q", lambda a, b: a * b)).alias("qq"),
        "vv",
    )
    energy = F.when(F.col("qq") == 0, F.lit(0.0)).otherwise(
        F.round(
            (F.col("qv").cast("double") * F.col("qv").cast("double"))
            / (F.col("qq").cast("double") * F.col("vv").cast("double")),
            6,
        )
    )
    return dots.select(
        "vec_id",
        F.col("label").cast("int").alias("label"),
        energy.alias("energy_frac"),
        F.least(
            F.floor(energy * ENERGY_DECILES).cast("long"),
            F.lit(ENERGY_DECILES - 1).cast("long"),
        )
        .cast("int")
        .alias("decile"),
    )


# --------------------------------------------------------------- j134

IVFPQ_NPROBE = 2  # coarse cells probed per query (of the 10 label cells)


def _duck_ivfpq_recall_oracle() -> str:
    from json2hbase_spark.functions.exact import QCENT_AVG
    from json2hbase_spark.plans.llm_queries import _duck_dot, _duck_norm

    full_sqdist = (
        "list_aggregate(list_transform(range(1,65),"
        " i -> (q.qe[i] - c.ve[i]) * (q.qe[i] - c.ve[i])), 'sum')"
    )
    qc_avg = QCENT_AVG.format(v="embedding[i.i + 1]")
    parts = _duck_pq_parts()
    parts.append(
        f"""cent_long AS (
      SELECT label, i.i AS pos, {qc_avg} AS cv
      FROM embeddings, (SELECT unnest(range(64)) AS i) i
      GROUP BY 1, 2
    ),
    cent AS (SELECT label, list(cv ORDER BY pos) AS centroid
             FROM cent_long GROUP BY label),
    pq AS (SELECT vec_id AS qid, ve AS qe FROM pv WHERE vec_id < {PQ_NQ}),
    qcs AS (
      SELECT qid, label,
             {_duck_dot("qe", "centroid")}
               / ({_duck_norm("qe")} * {_duck_norm("centroid")}) AS csim
      FROM pq, cent
    ),
    probed AS MATERIALIZED (
      SELECT qid, label FROM (
        SELECT qid, label,
               row_number() OVER (PARTITION BY qid ORDER BY csim DESC, label) AS pr
        FROM qcs
      ) WHERE pr <= {IVFPQ_NPROBE}
    ),
    lut AS MATERIALIZED (
      SELECT q.qid, s.sub, s.cluster,
             CAST(floor({_duck_pq_sqdist("list_slice(q.qe, s.sub * %d + 1, s.sub * %d + %d)" % (PQ_SUBDIM, PQ_SUBDIM, PQ_SUBDIM), "s.ce")} * {PQ_DIST_SCALE} + 0.5) AS BIGINT) AS qd
      FROM pq q, pc{PQ_ITERS} s
    ),
    lbl AS (SELECT vec_id, label FROM embeddings),
    adc AS MATERIALIZED (
      SELECT pr.qid, p.vec_id AS cid, CAST(SUM(l.qd) AS BIGINT) AS adist
      FROM paf p
      JOIN lbl ON lbl.vec_id = p.vec_id
      JOIN probed pr ON pr.label = lbl.label
      JOIN lut l ON l.qid = pr.qid AND l.sub = p.sub AND l.cluster = p.cluster
      WHERE p.vec_id != pr.qid
      GROUP BY pr.qid, p.vec_id
    ),
    scanned AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_scanned
                FROM adc GROUP BY qid),
    adc_top AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid ORDER BY adist, cid) AS rnk
        FROM adc) WHERE rnk <= {PQ_TOPK}
    ),
    exact_top AS (
      SELECT qid, cid FROM (
        SELECT q.qid, c.vec_id AS cid,
               row_number() OVER (PARTITION BY q.qid
                                  ORDER BY {full_sqdist}, c.vec_id) AS rnk
        FROM pq q JOIN pv c ON c.vec_id != q.qid) WHERE rnk <= {PQ_TOPK}
    )
    SELECT e.qid, s.n_scanned,
           CAST(COUNT(a.cid) AS BIGINT) AS n_hits,
           round(CAST(COUNT(a.cid) AS DOUBLE) / {PQ_TOPK}, 4) AS recall
    FROM exact_top e
    JOIN scanned s ON s.qid = e.qid
    LEFT JOIN adc_top a ON a.qid = e.qid AND a.cid = e.cid
    GROUP BY e.qid, s.n_scanned"""
    )
    return "WITH " + ",\n    ".join(parts)


@query("j134_ivfpq_recall", oracle=_duck_ivfpq_recall_oracle())
def j134_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ composed — the FAISS-style IVFADC index an actual
    100 TB vector store runs (Jégou et al. 2011 §V), closing the
    family j17 (coarse probe only) and j130 (ADC over the FULL code
    table) built up to: each query probes its {IVFPQ_NPROBE} nearest
    coarse cells (j17's per-label centroids, cosine + deterministic
    tie-break), and ONLY the codes of vectors in probed cells are ADC-
    scored against the query's {PQ_M}×{PQ_K} lookup table. The report
    per query: how many candidates the index actually touched
    (n_scanned — the measured scan-fraction evidence) and recall@
    {PQ_TOPK} vs the exact 64-dim scan. Compression and pruning
    multiply: at 100 TB the scan cost is (nprobe/n_lists) of the
    corpus × {PQ_M} bytes per vector — the two knobs this table lets a
    pipeline team trade against the recall they can tolerate (on this
    near-isotropic fixture recall reads LOW, consistent with j130 —
    the honest answer; the planted-cluster test reads 1.0).

    Exactness: the coarse-probe ranking reuses j17's established
    IEEE-identical cosine; LUT entries are floor(d·1e9+0.5) BIGINTs so
    ADC distances are order-free integer sums; both rankings tie-break
    on candidate id. Plan: centroid table and probed set are tiny
    broadcasts; the ADC join is label-pruned BEFORE the code lookup
    (codes join lbl → semi-filter on probed cells → broadcast LUT →
    hash agg) — the corpus-sized table is touched once, by cell, the
    physical layout an IVF store partitions on."""
    subvecs, cents, codes = _pq_train(spark, sf_dir)
    from json2hbase_spark.operators.similarity import cosine, ivf_centroids

    emb = load(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("ve")
    )
    q = vecs.filter(F.col("vec_id") < PQ_NQ).select(
        F.col("vec_id").alias("qid"), F.col("ve").alias("qe")
    )
    cents_ivf = ivf_centroids(widen(emb))
    qcs = q.crossJoin(F.broadcast(cents_ivf)).select(
        "qid", "qe", "label", cosine(F.col("qe"), F.col("centroid")).alias("csim")
    )
    wp = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("label"))
    probed = materialize(
        qcs.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= IVFPQ_NPROBE)
        .select("qid", "label")
    )
    lut = materialize(
        q.crossJoin(F.broadcast(cents)).select(
            "qid",
            "sub",
            "cluster",
            F.floor(
                _pq_sqdist(
                    F.slice("qe", F.col("sub") * PQ_SUBDIM + 1, PQ_SUBDIM),
                    F.col("ce"),
                )
                * PQ_DIST_SCALE
                + 0.5
            )
            .cast("long")
            .alias("qd"),
        )
    )
    lbl = emb.select("vec_id", "label")
    adc = (
        codes.join(lbl, "vec_id")
        .join(F.broadcast(probed), "label")
        .filter(F.col("vec_id") != F.col("qid"))
        .join(F.broadcast(lut), ["qid", "sub", "cluster"])
        .groupBy("qid", F.col("vec_id").alias("cid"))
        .agg(F.sum("qd").cast("bigint").alias("adist"))
    )
    adc = materialize(adc)
    scanned = adc.groupBy("qid").agg(F.count("*").cast("bigint").alias("n_scanned"))
    w_adc = Window.partitionBy("qid").orderBy("adist", "cid")
    adc_top = adc.withColumn("rnk", F.row_number().over(w_adc)).filter(
        F.col("rnk") <= PQ_TOPK
    )
    full_d = _pq_sqdist(F.col("qe"), F.col("ve"))
    exact = q.crossJoin(vecs).filter(F.col("vec_id") != F.col("qid")).select(
        "qid", F.col("vec_id").alias("cid"), full_d.alias("d")
    )
    w_ex = Window.partitionBy("qid").orderBy("d", "cid")
    exact_top = exact.withColumn("rnk", F.row_number().over(w_ex)).filter(
        F.col("rnk") <= PQ_TOPK
    )
    return (
        exact_top.select("qid", "cid")
        .join(F.broadcast(scanned), "qid")
        .join(
            F.broadcast(adc_top.select("qid", "cid", F.lit(1).alias("hit"))),
            ["qid", "cid"],
            "left",
        )
        .groupBy("qid", "n_scanned")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hits"))
        .select(
            "qid",
            "n_scanned",
            "n_hits",
            F.round(F.col("n_hits").cast("double") / PQ_TOPK, 4).alias("recall"),
        )
    )


# --------------------------------------------------------------- j139

WHITEN_PQ_DIV = float(WHITEN_RDIV)  # 2^20: exact binary rescale to O(1)


def _duck_adc_parts(p: str) -> list[str]:
    """ADC recall CTE chain against the ``{p}``-prefixed PQ chain:
    {p}pq/{p}lut/{p}adc/{p}adc_top/{p}exact_top/{p}rec — j130's
    harness as reusable parts (two instances coexist in j139)."""
    full_sqdist = (
        "list_aggregate(list_transform(range(1,65),"
        " i -> (q.qe[i] - c.ve[i]) * (q.qe[i] - c.ve[i])), 'sum')"
    )
    sub_slice = "list_slice(q.qe, s.sub * %d + 1, s.sub * %d + %d)" % (
        PQ_SUBDIM,
        PQ_SUBDIM,
        PQ_SUBDIM,
    )
    return [
        f"""{p}pq AS (SELECT vec_id AS qid, ve AS qe FROM {p}pv WHERE vec_id < {PQ_NQ}),
    {p}lut AS MATERIALIZED (
      SELECT q.qid, s.sub, s.cluster,
             CAST(floor({_duck_pq_sqdist(sub_slice, "s.ce")} * {PQ_DIST_SCALE} + 0.5) AS BIGINT) AS qd
      FROM {p}pq q, {p}pc{PQ_ITERS} s
    ),
    {p}adc AS (
      SELECT l.qid, c.vec_id AS cid, CAST(SUM(l.qd) AS BIGINT) AS adist
      FROM {p}paf c JOIN {p}lut l ON l.sub = c.sub AND l.cluster = c.cluster
      WHERE c.vec_id != l.qid
      GROUP BY l.qid, c.vec_id
    ),
    {p}adc_top AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid ORDER BY adist, cid) AS rnk
        FROM {p}adc) WHERE rnk <= {PQ_TOPK}
    ),
    {p}exact_top AS (
      SELECT qid, cid FROM (
        SELECT q.qid, c.vec_id AS cid,
               row_number() OVER (PARTITION BY q.qid
                                  ORDER BY {full_sqdist}, c.vec_id) AS rnk
        FROM {p}pq q JOIN {p}pv c ON c.vec_id != q.qid) WHERE rnk <= {PQ_TOPK}
    ),
    {p}rec AS (
      SELECT e.qid, CAST(COUNT(a.cid) AS BIGINT) AS n_hits
      FROM {p}exact_top e
      LEFT JOIN {p}adc_top a ON a.qid = e.qid AND a.cid = e.cid
      GROUP BY e.qid
    )"""
    ]


def _duck_whiten_pq_oracle() -> str:
    from json2hbase_spark.plans.selection_queries import _duck_power_parts

    last = POWER_ITERS
    parts = _duck_power_parts()
    parts.append(
        f"""evl AS (
      SELECT list(e.v * sgn.sg ORDER BY e.dim) AS v
      FROM v{last} e, sgn GROUP BY sgn.sg
    ),
    vvw AS (SELECT CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT)
              AS vv FROM evl),
    qtw AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * {COV_SCALE})
                                      AS BIGINT)) AS q
      FROM embeddings
    ),
    qvw AS (
      SELECT vec_id, q,
             CAST(list_sum(list_transform(range(1, 65),
                    i -> q[i] * evl.v[i])) AS BIGINT) AS qv
      FROM qtw, evl
    ),
    residw AS MATERIALIZED (
      SELECT vec_id,
             list_transform(range(1, 65),
               i -> CAST(floor(CAST(q[i] * t.vv
                                    - qv * e.v[i] AS DOUBLE)
                               / {WHITEN_RDIV}) AS BIGINT)) AS r
      FROM qvw, evl e, vvw t
    )"""
    )
    parts += _duck_pq_parts()
    parts += _duck_pq_parts(
        pv_sql=(
            "SELECT vec_id, list_transform(r, x -> CAST(x AS DOUBLE)"
            f" / {WHITEN_PQ_DIV}) AS ve FROM residw"
        ),
        p="w",
    )
    parts += _duck_adc_parts("")
    parts += _duck_adc_parts("w")
    parts.append(
        f"""final AS (
      SELECT r.qid,
             round(CAST(r.n_hits AS DOUBLE) / {PQ_TOPK}, 4) AS recall_raw,
             round(CAST(w.n_hits AS DOUBLE) / {PQ_TOPK}, 4) AS recall_white
      FROM rec r JOIN wrec w ON w.qid = r.qid
    )
    SELECT qid, recall_raw, recall_white,
           round(recall_white - recall_raw, 4) AS delta
    FROM final"""
    )
    return "WITH " + ",\n    ".join(parts)


@query("j139_whiten_pq_recall", oracle=_duck_whiten_pq_oracle())
def j139_whiten_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitening × quantization interaction — the OPQ-lite audit that
    closes this round's vector-compression chain (detect j121/j122 →
    apply j128 → per-vector grain j133 → quantize j129/j130 → index
    j134): PQ codebooks are trained and ADC recall@{PQ_TOPK} measured
    TWICE, once on the raw embeddings (≡ j130) and once on the
    whitened residuals (j128's exact transform, rescaled by the
    binary-exact 2^20 so the values sit in the same numeric envelope
    as raw embeddings), each against the exact scan IN ITS OWN space.
    delta > 0 = removing the common axis lets the {PQ_M}×{PQ_K} cells
    spend their resolution on the residual structure (the reason OPQ
    rotates before quantizing); delta ≈ 0 on an already-isotropic
    corpus = the rotation is not worth its cost — either answer is
    the evidence a pipeline team needs BEFORE burning a 100 TB
    re-encode.

    Exactness: the residual is j128's defined integer transform; the
    2^20 rescale is a power-of-two binary division (exact in both
    engines); both PQ chains are the shared bit-exact Lloyd kernel;
    LUT distances quantize to BIGINTs; both rankings tie-break on
    candidate id. Plan: one covariance pass + one residual scan
    (materialized), then two j129-shaped training plans (broadcast
    centroids + hash-agg argmin per round) and two j130-shaped
    recall harnesses (LUT broadcast, bounded-query exact side) — at
    100 TB everything corpus-sized is scan-shaped, run twice."""
    from json2hbase_spark.plans.selection_queries import _pi_rescaled  # noqa: F401

    v_signed, _ = _power_eigvec(spark, sf_dir)
    evl = v_signed.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "v"))), lambda x: x["v"]
        ).alias("v")
    )
    vvw = evl.select(
        F.aggregate(
            F.zip_with("v", "v", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("vv")
    )
    emb = load(spark, sf_dir, "embeddings")
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    qt = widen(emb).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * COV_SCALE).cast("long")
        ).alias("q"),
    )
    with_qv = qt.crossJoin(F.broadcast(evl)).crossJoin(F.broadcast(vvw)).select(
        "vec_id",
        "q",
        "vv",
        "v",
        fold(F.zip_with("q", "v", lambda a, b: a * b)).alias("qv"),
    )
    resid = materialize(
        with_qv.select(
            "vec_id",
            F.zip_with(
                "q",
                "v",
                lambda qi, vi: F.floor(
                    (qi * F.col("vv") - F.col("qv") * vi).cast("double")
                    / F.lit(WHITEN_RDIV)
                ).cast("long"),
            ).alias("r"),
        )
    )
    rv = resid.select(
        "vec_id",
        F.transform(
            "r", lambda x: x.cast("double") / F.lit(WHITEN_PQ_DIV)
        ).alias("embedding"),
    )
    # raw chain (≡ j130)
    _, cents_r, codes_r = _pq_train(spark, sf_dir)
    raw_vecs = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("ve")
    )
    rec_r = _pq_adc_recall_table(raw_vecs, cents_r, codes_r).select(
        "qid", F.col("recall").alias("recall_raw")
    )
    # whitened chain
    _, cents_w, codes_w = _pq_train(spark, sf_dir, vectors=rv)
    white_vecs = rv.select("vec_id", F.col("embedding").alias("ve"))
    rec_w = _pq_adc_recall_table(white_vecs, cents_w, codes_w).select(
        "qid", F.col("recall").alias("recall_white")
    )
    # both sides are NQ-row recall tables behind window outputs AQE
    # cannot size — broadcast one explicitly (the j130 lesson)
    return rec_r.join(F.broadcast(rec_w), "qid").select(
        "qid",
        "recall_raw",
        "recall_white",
        F.round(F.col("recall_white") - F.col("recall_raw"), 4).alias("delta"),
    )


# ---------------------------------------------------------------- j144

INC_COV_CUT = 400  # vec_id < CUT = persisted base corpus; >= CUT =
# the incoming delta batch (j24/j132's incremental convention on the
# embeddings axis)


def _duck_inc_cov_oracle() -> str:
    terms = """
      SELECT i, j,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(qi * qj) AS BIGINT) AS sxy,
             CAST(SUM(qi) AS BIGINT) AS sx,
             CAST(SUM(qj) AS BIGINT) AS sy
      FROM p WHERE {pred} GROUP BY i, j"""
    return f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * {COV_SCALE})
                                      AS BIGINT)) AS q
      FROM embeddings
    ),
    p AS (
      SELECT vec_id, i.i AS i, j.j AS j,
             q.q[i.i + 1] AS qi, q.q[j.j + 1] AS qj
      FROM q,
           LATERAL (SELECT unnest(range(len(q.q))) AS i) i,
           LATERAL (SELECT unnest(range(len(q.q))) AS j) j
      WHERE j.j >= i.i
    ),
    base AS ({terms.format(pred=f"vec_id < {INC_COV_CUT}")}),
    delta AS ({terms.format(pred=f"vec_id >= {INC_COV_CUT}")}),
    oneshot AS ({terms.format(pred="TRUE")}),
    merged AS (
      SELECT COALESCE(b.i, d.i) AS i, COALESCE(b.j, d.j) AS j,
             COALESCE(b.n, 0) AS n_base, COALESCE(d.n, 0) AS n_delta,
             COALESCE(b.n, 0) + COALESCE(d.n, 0) AS n,
             COALESCE(b.sxy, 0) + COALESCE(d.sxy, 0) AS sxy,
             COALESCE(b.sx, 0) + COALESCE(d.sx, 0) AS sx,
             COALESCE(b.sy, 0) + COALESCE(d.sy, 0) AS sy
      FROM base b FULL JOIN delta d ON d.i = b.i AND d.j = b.j
    )
    SELECT CAST(m.i AS INT) AS i, CAST(m.j AS INT) AS j,
           CAST(m.n_base AS BIGINT) AS n_base,
           CAST(m.n_delta AS BIGINT) AS n_delta,
           m.n * m.sxy - m.sx * m.sy AS cov_num,
           round(CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
                 / (CAST(m.n AS DOUBLE) * m.n * {COV_SCALE} * {COV_SCALE}), 6)
             AS cov,
           (m.n * m.sxy - m.sx * m.sy)
             = (o.n * o.sxy - o.sx * o.sy) AS matches_oneshot
    FROM merged m JOIN oneshot o ON o.i = m.i AND o.j = m.j
    """


@query("j144_incremental_covariance", oracle=_duck_inc_cov_oracle())
def j144_incremental_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL covariance maintenance (VERDICT r10 #8) — the
    delta-batch merge that completes the whitening chain's streaming
    story: j97's covariance terms (n, Σqiqj, Σqi, Σqj per dimension
    pair) are plain additive BIGINTs, so a persisted base artifact
    (vec_id < {INC_COV_CUT}) merges with an incoming batch's terms
    (vec_id ≥ {INC_COV_CUT}) by COLUMN ADDITION — no corpus rescan —
    and the merged covariance is BIT-IDENTICAL to the one-shot
    recompute. The op emits the merged matrix (the artifact
    j121/j127/j122/j128 consume) plus a per-cell matches_oneshot
    proof column: the one-shot leg re-aggregates the full corpus
    in-plan and every cell must read true (pinned by test; at 100 TB
    the proof leg is dropped and the base terms are the persisted
    d(d+1)/2-row table — only the delta batch ever scans, j24/j132's
    incremental posture applied to vectors).

    Exactness: term merging is integer addition; cov_num = n·Σxy −
    Σx·Σy on the merged BIGINTs; the float cov divides/rounds once
    (j97's convention, same int64 tripwire on the merged magnitudes).
    Plan: two slice-filtered pair-explode hash aggs (each shuffle
    ≤ d(d+1)/2 partial rows per partition, corpus-size-independent) +
    one full-corpus agg for the proof leg; the merge is a d(d+1)/2-row
    full-outer join (zero-filled for empty slices) and the proof join
    is equi on (i, j) — everything after the scans is
    dimension-bounded (2,080 rows at d=64)."""
    from json2hbase_spark.plans.selection_queries import _cov_terms, _cov_terms_of

    emb = widen(load(spark, sf_dir, "embeddings"))
    base = _cov_terms_of(emb.filter(F.col("vec_id") < INC_COV_CUT))
    delta = _cov_terms_of(emb.filter(F.col("vec_id") >= INC_COV_CUT))
    b = base.select(
        "i", "j", F.col("n").alias("n_b"), F.col("sxy").alias("sxy_b"),
        F.col("sx").alias("sx_b"), F.col("sy").alias("sy_b"),
        F.col("_qmax").alias("qmax_b"),
    )
    d = delta.select(
        F.col("i").alias("i_d"), F.col("j").alias("j_d"),
        F.col("n").alias("n_d"), F.col("sxy").alias("sxy_d"),
        F.col("sx").alias("sx_d"), F.col("sy").alias("sy_d"),
        F.col("_qmax").alias("qmax_d"),
    )
    merged = (
        b.join(d, (F.col("i") == F.col("i_d")) & (F.col("j") == F.col("j_d")), "full")
        .select(
            F.coalesce("i", "i_d").alias("i"),
            F.coalesce("j", "j_d").alias("j"),
            F.coalesce("n_b", F.lit(0)).alias("n_base"),
            F.coalesce("n_d", F.lit(0)).alias("n_delta"),
            (F.coalesce("sxy_b", F.lit(0)) + F.coalesce("sxy_d", F.lit(0))).alias("sxy"),
            (F.coalesce("sx_b", F.lit(0)) + F.coalesce("sx_d", F.lit(0))).alias("sx"),
            (F.coalesce("sy_b", F.lit(0)) + F.coalesce("sy_d", F.lit(0))).alias("sy"),
            F.greatest(
                F.coalesce("qmax_b", F.lit(0)), F.coalesce("qmax_d", F.lit(0))
            ).alias("_qmax"),
        )
        .withColumn("n", F.col("n_base") + F.col("n_delta"))
    )
    # j97's int64 tripwire on the MERGED magnitudes
    guard = (
        F.pow(F.col("n").cast("double"), 2) * F.pow(F.col("_qmax").cast("double"), 2)
        < F.lit(4.5e18)
    )
    merged = merged.where(
        F.assert_true(
            guard, F.lit("j144: n²·qmax² near int64 — use the two-pass centered form")
        ).isNull()
    )
    oneshot = _cov_terms(spark, sf_dir).select(
        F.col("i").alias("i_o"),
        F.col("j").alias("j_o"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("cov_num_o"),
    )
    cov_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        merged.join(
            F.broadcast(oneshot),  # d(d+1)/2 rows at any corpus size
            (F.col("i") == F.col("i_o")) & (F.col("j") == F.col("j_o")),
        )
        .select(
            F.col("i").cast("int").alias("i"),
            F.col("j").cast("int").alias("j"),
            F.col("n_base").cast("bigint").alias("n_base"),
            F.col("n_delta").cast("bigint").alias("n_delta"),
            cov_num.alias("cov_num"),
            F.round(
                cov_num.cast("double")
                / (F.col("n").cast("double") * F.col("n") * COV_SCALE * COV_SCALE),
                6,
            ).alias("cov"),
            (cov_num == F.col("cov_num_o")).alias("matches_oneshot"),
        )
    )


# ---------------------------------------------------------------- j145


def _duck_pca_ortho_oracle() -> str:
    parts = _duck_base_matrix_parts()
    A = f"m{MATPOW_SQUARINGS}"
    for c in range(PCA_R):
        parts += _duck_power_tagged_parts(A, c)
        if c < PCA_R - 1:
            parts += _duck_deflate_parts(A, c)
            A = f"am{c + 1}"
    # Gram-Schmidt chain: gu0 = vs0; gu{c} = vs{c} with gu0..gu{c-1}
    # projected out (multiply-through form u·nn − vu·u_k, no division)
    # + the _PI_S floor-rescale between projection steps.
    parts.append("gu0 AS (SELECT dim, v AS u FROM vs0)")
    for c in range(1, PCA_R):
        parts.append(f"t{c}_0 AS (SELECT dim, v AS u FROM vs{c})")
        for k in range(c):
            parts.append(
                f"""pj{c}_{k} AS (
      SELECT t.dim,
             t.u * (SELECT CAST(SUM(u * u) AS BIGINT) FROM gu{k})
             - (SELECT CAST(SUM(t2.u * g2.u) AS BIGINT)
                FROM t{c}_{k} t2 JOIN gu{k} g2 ON g2.dim = t2.dim) * g.u AS u
      FROM t{c}_{k} t JOIN gu{k} g ON g.dim = t.dim
    ),
    te{c}_{k} AS (SELECT greatest(CAST(max(abs(u)) AS BIGINT) // {_PI_S}, 1)
                    AS e FROM pj{c}_{k}),
    t{c}_{k + 1} AS MATERIALIZED (
      SELECT dim, CAST(floor(CAST(u AS DOUBLE) / e) AS BIGINT) AS u
      FROM pj{c}_{k}, te{c}_{k}
    )"""
            )
        parts.append(f"gu{c} AS (SELECT dim, u FROM t{c}_{c})")
    for k in range(PCA_R):
        parts.append(
            f"onn{k} AS (SELECT CAST(SUM(u * u) AS BIGINT) AS nn FROM gu{k})"
        )
    selects = [
        "SELECT 0 AS component, CAST(dim AS INT) AS dim,"
        " CAST(u AS BIGINT) AS u, CAST(0 AS BIGINT) AS cross_q FROM gu0"
    ]
    for c in range(1, PCA_R):
        for k in range(c):
            parts.append(
                f"""xt{c}_{k} AS (
      SELECT CAST(SUM(a.u * b.u) AS BIGINT) AS dt
      FROM gu{c} a JOIN gu{k} b ON b.dim = a.dim
    )"""
            )
        terms = [
            f"floor((CAST(x{k}.dt * x{k}.dt AS DOUBLE)"
            f" / CAST(n{k}.nn * nc.nn AS DOUBLE)) * 1000000.0)"
            for k in range(c)
        ]
        froms = ", ".join(
            [f"xt{c}_{k} AS x{k}" for k in range(c)]
            + [f"onn{k} AS n{k}" for k in range(c)]
            + [f"onn{c} AS nc"]
        )
        body = terms[0] if c == 1 else f"greatest({', '.join(terms)})"
        parts.append(
            f"cq{c} AS (SELECT CAST({body} AS BIGINT) AS cross_q FROM {froms})"
        )
        selects.append(
            f"SELECT {c} AS component, CAST(dim AS INT) AS dim,"
            f" CAST(u AS BIGINT) AS u, cq{c}.cross_q FROM gu{c}, cq{c}"
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + "\n    "
        + "\n    UNION ALL ".join(selects)
    )


@query("j145_pca_orthobasis", oracle=_duck_pca_ortho_oracle())
def j145_pca_orthobasis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORTHONORMALIZED principal subspace (VERDICT r10 #4) — j127's
    documented caveat closed in-plan: the flat fixture spectrum
    leaves j127's deflated components with cross-cosines up to ~0.16,
    so consumers needing a true basis (multi-axis whitening à la
    j128, subspace projection for j139-style OPQ) got a diagnostic,
    not an orthonormal frame. This variant runs j127's exact chain
    and then GRAM-SCHMIDTs the r×{64}-vector output with the same
    integer disciplines: each projection step is the multiply-through
    form u·(u_kᵀu_k) − (uᵀu_k)·u_k (division-free, exact BIGINT —
    bounds: |u| < 2·{_PI_S} after rescale, so u·nn ≤ ~5.1e11 and the
    difference stays far inside int64 and 2^53), followed by the
    established _PI_S floor-rescale. Output per component: the
    orthogonalized vector plus cross_q = max over earlier components
    of floor(cos²·10⁶) — the tripwire column: j127's raw subspace
    reads cross_q up to ~26,000; this basis reads single digits
    (residual = floor-rescale rounding only; pinned by test).

    Exactness: identical j127 iterates (bit-exact in both engines),
    then 6 projection steps of integer arithmetic + the shared
    floor-of-double-division rescale; cross_q divides two exact
    int64 products as doubles (same IEEE ops both engines) and
    floors once. Plan: corpus cost identical to j127 (ONE covariance
    pass); GS adds 6 × (two 64-row joins + 1-row broadcasts) and the
    quality columns are six 64-row dot products — all
    dimension-bounded, nothing touches the corpus again. As the basis
    DEFINER, j145 always recomputes the chain and refreshes the
    session memo consumers (j147) ride — see _gs_basis."""
    us = _gs_basis(spark, sf_dir, refresh=True)
    # Round 14 (VERDICT r13 #5): the quality columns were ~20 tiny
    # plan fragments — 4 single-partition norm aggs + 6 pairwise-dot
    # aggs, each crossJoined back as its own 1-row broadcast — pure
    # stage/driver overhead over 64-row local relations. Long-form
    # fusion computes the identical values in THREE bounded
    # aggregations: nn per component, every k<c dot in ONE self-join
    # agg, and the per-component max term. Bit-identical: the integer
    # products/sums are exact BIGINTs (order-free), the term is the
    # same (dt²→double / (nnₖ·nn_c)→double)·1e6 IEEE expression
    # floored once, and max-over-group equals greatest() on exact
    # longs.
    basis_long = reduce(
        DataFrame.unionByName,
        [
            us[k].select(F.lit(k).alias("component"), "dim", "u")
            for k in range(PCA_R)
        ],
    )
    nn = basis_long.groupBy("component").agg(
        F.sum(F.col("u") * F.col("u")).cast("bigint").alias("nn")
    )
    pa = basis_long.select(
        F.col("component").alias("c"), "dim", F.col("u").alias("uc")
    )
    pb = basis_long.select(
        F.col("component").alias("k"), "dim", F.col("u").alias("uk")
    )
    dt = (
        pa.join(F.broadcast(pb), "dim")
        .filter(F.col("k") < F.col("c"))
        .groupBy("c", "k")
        .agg(F.sum(F.col("uc") * F.col("uk")).cast("bigint").alias("dt"))
    )
    cross = (
        dt.join(
            F.broadcast(nn.select(F.col("component").alias("k"), F.col("nn").alias("nnk"))),
            "k",
        )
        .join(
            F.broadcast(nn.select(F.col("component").alias("c"), F.col("nn").alias("nnc"))),
            "c",
        )
        .groupBy("c")
        .agg(
            F.max(
                F.floor(
                    (F.col("dt") * F.col("dt")).cast("double")
                    / (F.col("nnk") * F.col("nnc")).cast("double")
                    * F.lit(1000000.0)
                )
            )
            .cast("bigint")
            .alias("cross_q")
        )
    )
    return (
        basis_long.join(F.broadcast(cross), basis_long["component"] == cross["c"], "left")
        .select(
            "component",
            F.col("dim").cast("int").alias("dim"),
            F.col("u").cast("bigint").alias("u"),
            F.coalesce(F.col("cross_q"), F.lit(0).cast("bigint")).alias("cross_q"),
        )
    )


# Session-scoped basis memo (VERDICT r11 #1): j145 and j147 EACH ran
# the full deflated-power-iteration + Gram-Schmidt chain (~20 s of
# fixed small-job iteration overhead apiece — the suite's top-2
# costs). The basis is DIMENSION-bounded (PCA_R × 64 integer rows,
# deterministic for a given fixture), so it is a legitimate driver-side
# artifact — the same posture as k-means centroids or the |langs|-row
# mixture tallies. The first caller in a session pays the chain; every
# later caller rebuilds the 4×64-row tables as local relations (which
# broadcast even better than the localCheckpoint-backed originals:
# AQE can size a LocalTableScan). Keyed by (applicationId, fixture
# path, embeddings-parquet mtime+size) so fresh driver sessions,
# different fixtures, AND a rewritten fixture at the SAME path (e.g.
# a regenerated scaled-embeddings dir reused by scale_probe) never
# share a stale basis (ADVICE r12 #3).
_GS_BASIS_CACHE: dict[tuple, list[list[tuple[int, int]]]] = {}


def _emb_content_marker(sf_dir: str) -> tuple[int, int]:
    import os as _os

    try:
        st = _os.stat(_os.path.join(sf_dir, "embeddings.parquet"))
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return (0, 0)


def _gs_basis(spark: SparkSession, sf_dir: str, refresh: bool = False) -> list:
    """j145's Gram-Schmidt chain: j127's deflated power-iteration
    components orthogonalized with the division-free multiply-through
    projection + _PI_S floor-rescale. Returns PCA_R materialized
    64-row (dim, u) tables — the orthonormal-direction basis j147's
    subspace energy consumes. Memoized per (session, fixture): the
    chain's iterates are exact integers, so the collect→local-relation
    round-trip is bit-lossless.

    ``refresh`` is the payer/consumer split that keeps bench numbers
    honest: j145 (the basis DEFINER) passes refresh=True and always
    recomputes — its bench time IS the chain cost, stable across
    reruns; j147 (a consumer) rides the memo — its bench time is the
    marginal per-vector fold. A consumer in a fresh session computes
    once and memoizes (documented first-touch, the codegen-warm
    category)."""
    import os as _os

    real_dir = _os.path.realpath(sf_dir)
    key = (
        spark.sparkContext.applicationId,
        real_dir,
        _emb_content_marker(real_dir),
    )
    if not refresh:
        cached = _GS_BASIS_CACHE.get(key)
        if cached is not None:
            return [
                spark.createDataFrame(rows, "dim int, u bigint")
                for rows in cached
            ]
    us = _gs_basis_compute(spark, sf_dir)
    from json2hbase_spark.plans.selection_queries import _evict_stale_sessions

    _evict_stale_sessions(_GS_BASIS_CACHE, key[0])
    _GS_BASIS_CACHE[key] = [
        sorted((int(r["dim"]), int(r["u"])) for r in t.collect()) for t in us
    ]
    return [
        spark.createDataFrame(rows, "dim int, u bigint")
        for rows in _GS_BASIS_CACHE[key]
    ]


def _gs_basis_compute(spark: SparkSession, sf_dir: str) -> list:
    # round 13: the raw deflated components come from j127's memo
    # (j127 is their definer; first touch in a fresh session computes
    # and stores) — j145 pays only the Gram-Schmidt chain below.
    vs = [v for v, _ in _pca_components(spark, sf_dir)]
    from json2hbase_spark.session import scoped_bounded_chain

    # Round 13 (the _power_on chaining lesson): each projection step's
    # three scalars — nn = uₖᵀuₖ, vu = tᵀuₖ, and the rescale bound —
    # were scalar aggs crossJoined back, so every step needed its own
    # localCheckpoint to stop subtree doubling (6 checkpoint jobs for
    # PCA_R=4). Single-partition windows over the joined 64-row pass
    # compute the identical values (the join on dim is 1:1-complete —
    # both sides carry exactly the 64 dims — so sum(uk·uk) over the
    # joined rows IS uₖᵀuₖ), each step's subtree occurs once, and the
    # whole component chains under ONE materialize (kept because later
    # components, j145's quality columns and the _gs_basis memo all
    # re-consume uₖ). Bit-identical integer arithmetic throughout.
    us = [vs[0].select("dim", F.col("v").alias("u"))]
    with scoped_bounded_chain(spark):
        for c in range(1, PCA_R):
            t = vs[c].select("dim", F.col("v").alias("u"))
            for k in range(c):
                uk = us[k].select("dim", F.col("u").alias("uk"))
                # 64-row sides: broadcast explicitly — AQE cannot size
                # localCheckpoint-backed scans and would plan SMJ
                proj = t.join(F.broadcast(uk), "dim").select(
                    "dim",
                    (
                        F.col("u") * F.expr("sum(uk * uk) OVER ()")
                        - F.expr("sum(u * uk) OVER ()") * F.col("uk")
                    ).alias("u"),
                )
                t = proj.select(
                    "dim",
                    F.floor(
                        F.col("u").cast("double")
                        / F.greatest(
                            F.expr(f"max(abs(u)) OVER () DIV {_PI_S}"),
                            F.lit(1).cast("long"),
                        )
                    )
                    .cast("bigint")
                    .alias("u"),
                )
            us.append(materialize(t))
    return us


# ---------------------------------------------------------------- j147


def _duck_subspace_energy_oracle() -> str:
    # j145's full chain up to the orthobasis gu{c} tables + norms
    parts = _duck_base_matrix_parts()
    A = f"m{MATPOW_SQUARINGS}"
    for c in range(PCA_R):
        parts += _duck_power_tagged_parts(A, c)
        if c < PCA_R - 1:
            parts += _duck_deflate_parts(A, c)
            A = f"am{c + 1}"
    parts.append("gu0 AS (SELECT dim, v AS u FROM vs0)")
    for c in range(1, PCA_R):
        parts.append(f"t{c}_0 AS (SELECT dim, v AS u FROM vs{c})")
        for k in range(c):
            parts.append(
                f"""pj{c}_{k} AS (
      SELECT t.dim,
             t.u * (SELECT CAST(SUM(u * u) AS BIGINT) FROM gu{k})
             - (SELECT CAST(SUM(t2.u * g2.u) AS BIGINT)
                FROM t{c}_{k} t2 JOIN gu{k} g2 ON g2.dim = t2.dim) * g.u AS u
      FROM t{c}_{k} t JOIN gu{k} g ON g.dim = t.dim
    ),
    te{c}_{k} AS (SELECT greatest(CAST(max(abs(u)) AS BIGINT) // {_PI_S}, 1)
                    AS e FROM pj{c}_{k}),
    t{c}_{k + 1} AS MATERIALIZED (
      SELECT dim, CAST(floor(CAST(u AS DOUBLE) / e) AS BIGINT) AS u
      FROM pj{c}_{k}, te{c}_{k}
    )"""
            )
        parts.append(f"gu{c} AS (SELECT dim, u FROM t{c}_{c})")
    for k in range(PCA_R):
        parts.append(
            f"gul{k} AS (SELECT list(u ORDER BY dim) AS u,"
            f" CAST(SUM(u * u) AS BIGINT) AS nn FROM gu{k})"
        )
    parts.append(
        f"""qt AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * {COV_SCALE})
                                      AS BIGINT)) AS q
      FROM embeddings
    ),
    dots AS (
      SELECT vec_id,
             CAST(list_sum(list_transform(range(1, 65), i -> q[i] * q[i]))
                  AS BIGINT) AS qq,
             {", ".join(
                 f'''CAST(list_sum(list_transform(range(1, 65),
                        i -> q[i] * g{k}.u[i])) AS BIGINT) AS qu{k},
             g{k}.nn AS nn{k}''' for k in range(PCA_R)
             )}
      FROM qt, {", ".join(f"gul{k} g{k}" for k in range(PCA_R))}
    ),
    es AS (
      SELECT vec_id,
             {", ".join(
                 f'''CASE WHEN qq = 0 THEN 0.0
                  ELSE CAST(qu{k} * qu{k} AS DOUBLE)
                       / CAST(qq * nn{k} AS DOUBLE) END AS e{k}'''
                 for k in range(PCA_R)
             )}
      FROM dots
    )"""
    )
    esum = "((e0 + e1) + e2) + e3"
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT vec_id,
           CASE WHEN e0 >= e1 AND e0 >= e2 AND e0 >= e3 THEN 0
                WHEN e1 >= e2 AND e1 >= e3 THEN 1
                WHEN e2 >= e3 THEN 2
                ELSE 3 END AS dom_component,
           CAST(floor(({esum}) * 1000000) AS BIGINT) AS energy4_q
    FROM es"""
    )


@query("j147_subspace_energy", oracle=_duck_subspace_energy_oracle())
def j147_subspace_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-r SUBSPACE energy per vector — the op that makes j145's
    orthonormality pay: because the Gram-Schmidt basis is (near-)
    orthogonal, per-component energies cos²(q, u_c) ADD, so each
    embedding's total share of variance inside the top-{PCA_R}
    principal subspace is just the 4-term sum — the rank-r
    generalization of j133's single-axis energy. Per vector:
    the dominant component (WHICH principal direction carries it —
    the cheap topic-ish label a curriculum/mixture can key on) and
    the quantized total subspace energy (vectors near 10⁶ live
    entirely in 4 dimensions — their 64-dim similarity scores carry
    ~4 dims of signal; near 0 = the subspace doesn't describe them,
    the anisotropy fix doesn't apply). With j127's RAW subspace this
    sum would double-count the overlapping directions (cross-cosines
    to 0.16) — exactly why VERDICT r10 #4 wanted the basis
    orthogonalized before consumers compose components.

    Exactness: all dots are exact int64 (|q·u| ≤ 64·10³·2·10³); each
    energy term is one IEEE division of exact integers, the 4-term
    sum adds in fixed order, floor·10⁶ quantizes once; dominant
    component ties break to the lower index via the CASE chain (both
    engines evaluate the identical doubles). Plan: j145's chain (ONE
    corpus covariance pass + dimension-bounded GS), the basis
    collapses to ONE broadcast row of 4 arrays + norms, and the
    per-vector pass is a stateless codegen'd HOF fold — scan-shaped
    at 100 TB. As a basis CONSUMER, j147 rides the session memo j145
    populates (VERDICT r11 #1 — the two stopped each paying the full
    ~20 s chain); a fresh session computes it once (first-touch, the
    codegen-warm category). Memo values are bit-equal to a recompute
    (exact integers; pinned by test)."""
    us = _gs_basis(spark, sf_dir)
    row = None
    for k in range(PCA_R):
        gul = us[k].agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "u"))), lambda x: x["u"]
            ).alias(f"u{k}"),
            F.sum(F.col("u") * F.col("u")).cast("bigint").alias(f"nn{k}"),
        )
        row = gul if row is None else row.crossJoin(F.broadcast(gul))
    emb = load(spark, sf_dir, "embeddings")
    q = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * COV_SCALE).cast("long")
    )
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    dots = (
        widen(emb)
        .select("vec_id", q.alias("q"))
        .crossJoin(F.broadcast(row))
        .select(
            "vec_id",
            fold(F.zip_with("q", "q", lambda a, b: a * b)).alias("qq"),
            *[
                c
                for k in range(PCA_R)
                for c in (
                    fold(
                        F.zip_with("q", f"u{k}", lambda a, b: a * b)
                    ).alias(f"qu{k}"),
                    F.col(f"nn{k}"),
                )
            ],
        )
    )
    es = dots.select(
        "vec_id",
        *[
            F.when(F.col("qq") == 0, F.lit(0.0))
            .otherwise(
                (F.col(f"qu{k}") * F.col(f"qu{k}")).cast("double")
                / (F.col("qq") * F.col(f"nn{k}")).cast("double")
            )
            .alias(f"e{k}")
            for k in range(PCA_R)
        ],
    )
    esum = ((F.col("e0") + F.col("e1")) + F.col("e2")) + F.col("e3")
    dom = (
        F.when(
            (F.col("e0") >= F.col("e1"))
            & (F.col("e0") >= F.col("e2"))
            & (F.col("e0") >= F.col("e3")),
            F.lit(0),
        )
        .when((F.col("e1") >= F.col("e2")) & (F.col("e1") >= F.col("e3")), F.lit(1))
        .when(F.col("e2") >= F.col("e3"), F.lit(2))
        .otherwise(F.lit(3))
    )
    return es.select(
        "vec_id",
        dom.alias("dom_component"),
        F.floor(esum * 1000000).cast("bigint").alias("energy4_q"),
    )


# ---------------------------------------------------------------- j157

MRL_PREFIXES = (8, 16, 32, 64)  # nested representation sizes audited
MRL_SELF_NUM, MRL_SELF_DEN = 9, 10  # "self-contained" = >= 90% energy


@query(
    "j157_matryoshka_energy",
    oracle=f"""
    WITH qt AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {COV_SCALE}) AS BIGINT)) AS q
      FROM embeddings
    ),
    ss AS (
      SELECT vec_id, label, p.p,
             CAST(list_sum(list_transform(range(1, p.p + 1),
                  i -> q[i] * q[i])) AS BIGINT) AS pss,
             -- total-sum range derives from the ACTUAL array length
             -- (not a hard-coded 64) so a non-64-dim fixture matches
             -- the Spark side's whole-array fold instead of silently
             -- diverging (ADVICE r12 #4)
             CAST(list_sum(list_transform(range(1, len(q) + 1),
                  i -> q[i] * q[i])) AS BIGINT) AS tss
      FROM qt, (SELECT unnest([{", ".join(str(p) for p in MRL_PREFIXES)}]) AS p) p
    )
    SELECT label, p,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CASE WHEN SUM(tss) = 0 THEN NULL
                ELSE CAST(SUM(pss) AS DOUBLE) / CAST(SUM(tss) AS DOUBLE)
           END AS energy_frac,
           CAST(SUM(CASE WHEN {MRL_SELF_DEN} * pss >= {MRL_SELF_NUM} * tss
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_selfcontained
    FROM ss GROUP BY label, p
    """,
)
def j157_matryoshka_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRYOSHKA prefix-dimension energy audit (round 12, Kusupati
    et al. 2022) — the question a vector store asks before shipping
    truncated embeddings: how much of each vector's energy lives in
    its first {MRL_PREFIXES} dimensions? MRL-trained encoders front-
    load information so a 64-dim vector can serve 8/16/32-dim callers
    by truncation; a NON-front-loaded embedding (this fixture's — PCA
    j127/j145 exists precisely to rotate it) truncates badly, and
    this table is the evidence. Per (label, prefix): vectors, the
    corpus energy fraction inside the prefix (ONE IEEE division of
    two exact int64 sums), and how many vectors are individually
    ≥{MRL_SELF_NUM * 10}% self-contained at that prefix (integer
    cross-multiplication, no division).

    Exactness: j97's fixed-point quantizer (floor ×{COV_SCALE}),
    order-free BIGINT sums, one final division. Plan: ONE scan,
    per-row HOF folds (prefix sums ride the same q array, never
    re-read), a (label, p)-keyed hash agg over a ×{len(MRL_PREFIXES)}
    literal fan-out — map-side combinable, scan-shaped at 100 TB."""
    emb = load(spark, sf_dir, "embeddings")
    q = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * COV_SCALE).cast("long")
    )
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    qt = widen(emb).select("vec_id", "label", q.alias("q"))
    ps = spark.createDataFrame([(p,) for p in MRL_PREFIXES], "p int")
    ss = qt.crossJoin(F.broadcast(ps)).select(
        "label",
        "p",
        fold(
            F.transform(
                F.slice("q", 1, F.col("p")), lambda x: x * x
            )
        ).alias("pss"),
        fold(F.transform("q", lambda x: x * x)).alias("tss"),
    )
    return ss.groupBy("label", "p").agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        # an all-zero label group (unreachable on real embeddings)
        # would make this 0/0 = NaN in both engines — NULL instead,
        # mirroring the j136/j137/j149 degenerate-denominator pattern
        F.when(F.sum("tss") == 0, F.lit(None))
        .otherwise(F.sum("pss").cast("double") / F.sum("tss").cast("double"))
        .alias("energy_frac"),
        F.sum(
            F.when(
                MRL_SELF_DEN * F.col("pss") >= MRL_SELF_NUM * F.col("tss"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_selfcontained"),
    )


# ---------------------------------------------------------------- j159

GRAPH_M = 6  # neighbor-list size per node before symmetrization
GRAPH_BEAM = 4  # beam width kept per hop
GRAPH_HOPS = 3  # fixed hop count (unrolled in the oracle)
GRAPH_K = 3  # recall@k audited vs exact brute force (j38's k)
GRAPH_NQ = 10  # query set = vec_id < 10 (the j17/j18/j38 convention)


def _duck_graph_d(a: str, b: str) -> str:
    """Exact integer squared-L2 between two quantized BIGINT lists —
    the walk's comparison metric in BOTH engines. Range derives from
    the actual array length (the j157 lesson, ADVICE r12 #4)."""
    return (
        f"CAST(list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
    )


def _duck_graph_ann_oracle() -> str:
    d = _duck_graph_d
    parts = [
        f"""qt AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {COV_SCALE}) AS BIGINT)) AS q
      FROM embeddings
    ),
    topm AS (
      SELECT src, dst FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {d("a.q", "b.q")}, b.vec_id) AS rn
        FROM qt a JOIN qt b ON a.label = b.label AND a.vec_id != b.vec_id
      ) WHERE rn <= {GRAPH_M}
    ),
    edges AS (SELECT src, dst FROM topm UNION SELECT dst, src FROM topm),
    cent_long AS (
      SELECT label, i.i AS pos,
             {QCENT_AVG.format(v="embedding[i.i + 1]")} AS cv
      FROM embeddings, (SELECT unnest(range(64)) AS i) i
      GROUP BY 1, 2
    ),
    cq AS (
      SELECT label,
             list(CAST(floor(cv * {COV_SCALE}) AS BIGINT) ORDER BY pos) AS cq
      FROM cent_long GROUP BY label
    ),
    qs AS (SELECT vec_id AS qid, q AS qq FROM qt WHERE vec_id < {GRAPH_NQ}),
    assigned AS (
      SELECT qid, qq, label FROM (
        SELECT qs.qid, qs.qq, cq.label,
               row_number() OVER (PARTITION BY qs.qid
                                  ORDER BY {d("qs.qq", "cq.cq")}, cq.label) AS pr
        FROM qs, cq
      ) WHERE pr = 1
    ),
    cellmin AS (SELECT label, min(vec_id) AS cid FROM qt GROUP BY label),
    v0 AS (
      SELECT a.qid, cm.cid, {d("a.qq", "nq.q")} AS dd
      FROM assigned a
      JOIN cellmin cm ON cm.label = a.label
      JOIN qt nq ON nq.vec_id = cm.cid
    )"""
    ]
    prev = "v0"
    for h in range(1, GRAPH_HOPS + 1):
        parts.append(
            f"""f{h} AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid ORDER BY dd, cid) AS rn
        FROM {prev}
      ) WHERE rn <= {GRAPH_BEAM}
    ),
    c{h} AS (SELECT DISTINCT f.qid, e.dst AS cid
             FROM f{h} f JOIN edges e ON e.src = f.cid),
    v{h} AS (
      SELECT qid, cid, dd FROM {prev}
      UNION
      SELECT c.qid, c.cid, {d("qs.qq", "nq.q")} AS dd
      FROM c{h} c JOIN qs ON qs.qid = c.qid JOIN qt nq ON nq.vec_id = c.cid
    )"""
        )
        prev = f"v{h}"
    parts.append(
        f"""res AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid ORDER BY dd, cid) AS rn
        FROM {prev} WHERE cid != qid
      ) WHERE rn <= {GRAPH_K}
    ),
    ex AS (
      SELECT qid, cid FROM (
        SELECT qs.qid, c.vec_id AS cid,
               row_number() OVER (PARTITION BY qs.qid
                                  ORDER BY {d("qs.qq", "c.q")}, c.vec_id) AS rn
        FROM qt c, qs WHERE c.vec_id != qs.qid
      ) WHERE rn <= {GRAPH_K}
    ),
    nv AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_visited
           FROM {prev} GROUP BY qid)
    SELECT ex.qid, nv.n_visited,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(res.cid) AS BIGINT) AS n_hit,
           CAST(COUNT(res.cid) AS DOUBLE) / COUNT(*) AS recall
    FROM ex
    LEFT JOIN res ON res.qid = ex.qid AND res.cid = ex.cid
    JOIN nv ON nv.qid = ex.qid
    GROUP BY ex.qid, nv.n_visited"""
    )
    return "WITH " + ",\n    ".join(parts)


@query("j159_graph_ann", oracle=_duck_graph_ann_oracle())
def j159_graph_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAPH ANN (round 13, VERDICT r12 #4): the NSW/HNSW family rung
    (Malkov & Yashunin 2016) the ANN ladder lacked. Single-layer NSW
    with IVF-cell entry points standing in for the hierarchy's
    top-layer descent: per-cell M-NN neighbor lists (candidate pairs
    are CELL-bounded, j43's O(Σ cell²) budget — never all-pairs),
    symmetrized for connectivity, then a fixed-hop greedy beam search
    (beam {GRAPH_BEAM}, {GRAPH_HOPS} hops) from the query's
    nearest-centroid cell's min-id node, recall@{GRAPH_K}-audited
    against exact brute force the way j33/j38/j130 audit their index
    families.

    Exactness: every comparison the walk makes is an exact BIGINT
    squared-L2 over {COV_SCALE}-quantized vectors (j97's fixed-point
    convention), ties broken by vec_id — so edge lists, entry cells,
    every hop's beam, and the final recall are bit-identical to the
    unrolled DuckDB CTE replay. 100 TB: construction = one cell-keyed
    pair stage + per-src top-M window (the j43 cost class); the edge
    table is n·M rows bucketed by src (a16's layout), so each search
    hop is a partition-pruned point lookup joined against a ≤
    NQ·{GRAPH_BEAM}-row broadcast frontier — the scan never repeats
    per hop on a cluster. The walk's frontier/visited state is
    driver-resident (round 14, _nsw_walk_visited): bounded by the
    query set, never the corpus, with each hop exactly two flat
    broadcast lookups — the round-13 chained-DataFrame walk doubled
    the visited subtree per hop (2^hops copies) and its orchestration
    made the op slower on 32 cores than 8. The quantized node table
    materializes ONCE (round 13): edge construction (both self-join
    sides), the entry lookup, every hop's probe and the exact audit
    side ride it instead of re-deriving the scan+quantize subtree
    eight times."""
    emb = load(spark, sf_dir, "embeddings")
    qt = materialize(emb.select("vec_id", "label", _graph_qcol().alias("q")))
    dist = _graph_dist
    # entry assignment for EXTERNAL-query semantics: nearest quantized
    # cell centroid (the IVF descent standing in for HNSW's top layer)
    from json2hbase_spark.operators.similarity import ivf_centroids

    cq = ivf_centroids(emb).select(
        "label",
        F.transform(
            "centroid", lambda x: F.floor(x * COV_SCALE).cast("long")
        ).alias("cq"),
    )
    qs = qt.filter(F.col("vec_id") < GRAPH_NQ).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq")
    )
    wq = Window.partitionBy("qid").orderBy("dcell", "label")
    assigned = (
        qs.crossJoin(F.broadcast(cq))
        .withColumn("dcell", dist(F.col("qq"), F.col("cq")))
        .withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") == 1)
        .select("qid", "qq", "label")
    )
    return _nsw_recall_audit(qt, qs, assigned)


def _graph_qcol():
    return F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * COV_SCALE).cast("long")
    )


GRAPH_DIMS = 64  # asserted per row — a non-64-dim fixture errors loudly


def _graph_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _graph_dist_unrolled(a, b):
    """Exact integer squared-L2, unrolled to a 64-term codegen sum:
    bit-identical to _graph_dist's aggregate(zip_with(...)) fold —
    BIGINT addition is associative, so term order is free — at ~2.3×
    the throughput (HOF lambdas evaluate interpreted and allocate a
    64-element array per pair). Used ONLY in the FLAT hot plan (the
    ~n·cell-row edge stage): unrolling the walk's per-hop distances
    instead multiplied the ~700-node expression through the chained
    hop lineage and blew up Catalyst planning time ~4× (measured
    round 13 — j159 8.6→36 s, planning-bound) — the compact HOF stays
    in deep plans. The dimension is ASSERTED, not assumed (the j157
    oracle lesson): callers wrap each INPUT array in _graph_guard_dims
    — guarding the array column per node row, not the sum per pair:
    wrapping this 700-node sum in CASE WHEN(assert…) forced it out of
    whole-stage codegen into interpreted eval (measured: the edge
    stage went 1.75 → 18.6 s)."""
    terms = [
        (F.element_at(a, i) - F.element_at(b, i))
        * (F.element_at(a, i) - F.element_at(b, i))
        for i in range(1, GRAPH_DIMS + 1)
    ]
    return reduce(lambda x, y: x + y, terms)


def _graph_guard_dims(col):
    """Dimension tripwire for the unrolled distance: errors loudly on
    a non-{GRAPH_DIMS}-dim embedding (which would otherwise silently
    diverge from the length-driven DuckDB oracle). Wraps the cheap
    array column — one assert per node row, outside the hot sum."""
    return F.when(
        F.assert_true(
            F.size(col) == GRAPH_DIMS,
            F.lit(f"graph dist: embedding dimension != {GRAPH_DIMS}"),
        ).isNull(),
        col,
    )


def graph_ann_plan(spark: SparkSession, sf_dir: str, k: int | None = None) -> DataFrame:
    """Deployable graph ANN with the volume-adaptive cell dial (j43's
    pattern): cells come from k-means with k ∝ n (auto_kmeans_k), so
    cell sizes stay ≈TARGET_CELL and the M-NN construction budget
    Σ C(cell,2) grows LINEARLY with the corpus — the registered j159
    pins the fixture's label cells for bit-exact oracle parity, which
    (like j43's pinned k=10) has the ×16-per-×4 fixed-cell envelope
    this dial exists to avoid (tripwired in test_scale_tripwire).
    Queries here are corpus members, so entry assignment is each
    query's OWN cluster (external queries would descend via the
    nearest centroid exactly as j159 does)."""
    from json2hbase_spark.operators.scaling import auto_kmeans_k
    from json2hbase_spark.plans.advanced_queries import kmeans_assign

    emb = load(spark, sf_dir, "embeddings")
    if k is None:
        k = auto_kmeans_k(emb.count())
    asg = materialize(
        kmeans_assign(spark, sf_dir, iters=3, k=k).select("vec_id", "cluster")
    )
    qt = materialize(
        emb.join(asg, "vec_id")
        .select("vec_id", F.col("cluster").alias("label"), _graph_qcol().alias("q"))
    )
    qs = qt.filter(F.col("vec_id") < GRAPH_NQ).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq")
    )
    assigned = qt.filter(F.col("vec_id") < GRAPH_NQ).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq"), "label"
    )
    return _nsw_recall_audit(qt, qs, assigned)


def _nsw_edges(qt: DataFrame) -> DataFrame:
    """Per-cell M-NN construction, symmetrized and materialized —
    candidate pairs are cell-bounded (never all-pairs); the result is
    ≤ 2·n·GRAPH_M rows. The pair stage is the family's hot loop
    (~n·cell distance evaluations in one flat plan) — it uses the
    unrolled codegen distance (round 13, see _graph_dist_unrolled)."""
    dist = _graph_dist_unrolled
    ea = qt.select(
        "label",
        F.col("vec_id").alias("src"),
        _graph_guard_dims(F.col("q")).alias("qa"),
    )
    eb = qt.select(
        F.col("label").alias("lb"),
        F.col("vec_id").alias("dst"),
        _graph_guard_dims(F.col("q")).alias("qb"),
    )
    cand = ea.join(eb, (ea.label == eb.lb) & (ea.src != eb.dst)).select(
        "src", "dst", dist(F.col("qa"), F.col("qb")).alias("dd")
    )
    wsrc = Window.partitionBy("src").orderBy("dd", "dst")
    topm = (
        cand.withColumn("rn", F.row_number().over(wsrc))
        .filter(F.col("rn") <= GRAPH_M)
        .select("src", "dst")
    )
    return materialize(
        topm.unionByName(
            topm.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    )


def _nsw_exact(qs: DataFrame, nodes: DataFrame) -> DataFrame:
    """Brute-force exact top-{GRAPH_K} per query — the audit's ground
    truth: bounded-query broadcast crossJoin (j130's category), per-qid
    window over candidate-bounded partitions. Flat NQ·n-row plan —
    uses the unrolled codegen distance (see _graph_dist_unrolled)."""
    dist = _graph_dist_unrolled
    wbeam = Window.partitionBy("qid").orderBy("dd", "cid")
    return (
        nodes.select(F.col("nid"), _graph_guard_dims(F.col("nq")).alias("nq"))
        .crossJoin(F.broadcast(qs))
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid",
            F.col("nid").alias("cid"),
            dist(F.col("qq"), F.col("nq")).alias("dd"),
        )
        .withColumn("rn", F.row_number().over(wbeam))
        .filter(F.col("rn") <= GRAPH_K)
        .select("qid", "cid")
    )


def _nsw_walk_visited(
    nodes: DataFrame,
    qs: DataFrame,
    edges: DataFrame,
    entry: DataFrame,
    beams: tuple[int, ...],
) -> dict[tuple[int, int], dict[int, int]]:
    """Fixed-hop beam walk with a DRIVER-RESIDENT working set
    (round 14, VERDICT r13 #1). The walk's state is bounded by the
    QUERY set, never the corpus: ≤ NQ·(1 + GRAPH_HOPS·beam·GRAPH_M)
    (qid, cid, dd) rows (≤ ~750 at the widest sweep width) — the
    canonical graph-ANN serving shape, where the search frontier lives
    with the client and each hop is a point lookup into the index.
    The round-13 all-DataFrame walk re-referenced `visited` twice per
    hop (once in the union, once under the frontier window's
    broadcast), doubling the subtree per hop — 2^GRAPH_HOPS copies of
    the base plan, ~9 jobs and 6 tiny 32-partition shuffles whose
    task fan-out made the bench's most expensive query run FASTER on
    8 cores than 32 (driver BENCH_r13: 17.6 s, scaling 0.52).

    Here every hop is exactly ONE distributed action (measured round
    14: per-action fixed overhead — planning, AQE stage round-trips,
    broadcast builds — is ~0.4 s locally regardless of data size, so
    job COUNT is the walk's cost driver): the broadcast frontier
    probes the src-bucketed edge table (at 100 TB a partition-pruned
    point lookup — the layout j159's docstring promises), the
    candidates probe the node table, and the new (beam, qid, cid, dd)
    rows come back in one collect. No shuffle, window, distinct or
    lineage growth anywhere in the loop. A node reachable from two
    frontier members (or two beam widths) is scored per row — dd is
    deterministic, duplicates are bounded by Σbeam·M per query and
    collapse in the driver-side set union, exactly as the round-13
    per-hop union-DISTINCT collapsed them.

    Bit-exactness: distances are computed in the JVM by the SAME
    ``_graph_dist`` BIGINT fold as before and round-trip to Python
    ints losslessly; frontier selection (top-``beam`` by (dd, cid))
    and the visited-set union are exact integer sorts/set ops —
    pinned end to end by test_j159_graph_ann_python_truth. Every
    fresh invocation recomputes from the parquet inputs (nothing
    memoized across calls).

    Returns {(beam, qid): {cid: dd}} after GRAPH_HOPS hops.
    """
    spark = nodes.sparkSession
    dist = _graph_dist
    entry_rows = (
        nodes.join(F.broadcast(entry), F.col("cid") == F.col("nid"))
        .select("qid", "cid", dist(F.col("qq"), F.col("nq")).alias("dd"))
        .collect()
    )
    visited: dict[tuple[int, int], dict[int, int]] = {
        (b, r.qid): {r.cid: r.dd} for b in beams for r in entry_rows
    }
    for _ in range(GRAPH_HOPS):
        # frontier per (beam, qid): the top-`beam` visited by (dd, cid)
        frows = [
            (b, qid, c)
            for (b, qid), m in sorted(visited.items())
            for _dd, c in sorted((dd, c) for c, dd in m.items())[:b]
        ]
        fdf = spark.createDataFrame(frows, "beam INT, qid BIGINT, fcid BIGINT")
        cand = edges.join(F.broadcast(fdf), F.col("src") == F.col("fcid")).select(
            "beam", "qid", F.col("dst").alias("cid")
        )
        got = (
            nodes.join(F.broadcast(cand), F.col("cid") == F.col("nid"))
            .join(F.broadcast(qs), "qid")
            .select("beam", "qid", "cid", dist(F.col("qq"), F.col("nq")).alias("dd"))
            .collect()
        )
        for r in got:
            visited[(r.beam, r.qid)].setdefault(r.cid, r.dd)
    return visited


def _nsw_local_results(
    visited: dict[tuple[int, int], dict[int, int]],
) -> tuple[list[tuple[int, int, int]], list[tuple[int, int, int]]]:
    """(res, nv) rows from a walked visited set — exact integer
    sorts, deterministic (dd, cid) tie-break, identical to the former
    row_number-over-window/count pair. res = (beam, qid, cid) of the
    top-GRAPH_K visited (cid != qid); nv = (beam, qid, n_visited)."""
    res_rows: list[tuple[int, int, int]] = []
    nv_rows: list[tuple[int, int, int]] = []
    for (b, qid), m in sorted(visited.items()):
        nv_rows.append((b, qid, len(m)))
        top = sorted((dd, c) for c, dd in m.items() if c != qid)[:GRAPH_K]
        res_rows.extend((b, qid, c) for _dd, c in top)
    return res_rows, nv_rows


def _nsw_recall_audit(
    qt: DataFrame,
    qs: DataFrame,
    assigned: DataFrame,
    edges: DataFrame | None = None,
    beam: int = GRAPH_BEAM,
    exact: DataFrame | None = None,
    cellmin: DataFrame | None = None,
) -> DataFrame:
    """Shared NSW body: per-cell M-NN construction (symmetrized),
    fixed-hop beam walk from the assigned cell's min-id node, recall@K
    audit vs exact. ``qt`` = (vec_id, label, q); ``qs`` = (qid, qq);
    ``assigned`` = (qid, qq, label) — the entry-cell choice is the
    caller's (centroid descent for j159, own-cluster for
    graph_ann_plan).

    Round 14: the walk runs driver-resident over its bounded working
    set (see _nsw_walk_visited — the round-13 chained-DataFrame walk
    doubled the visited subtree per hop and was orchestration-bound);
    the corpus-sized work (construction pair stage, exact brute-force
    audit) stays fully distributed, and the final audit joins the
    walk's ≤ NQ·GRAPH_K-row result as a broadcast local relation."""
    if edges is None:
        edges = _nsw_edges(qt)
    if cellmin is None:
        cellmin = qt.groupBy("label").agg(F.min("vec_id").alias("cid"))

    spark = qt.sparkSession
    nodes = qt.select(F.col("vec_id").alias("nid"), F.col("q").alias("nq"))
    entry = assigned.join(F.broadcast(cellmin), "label")
    visited = _nsw_walk_visited(nodes, qs, edges, entry, (beam,))
    res_rows, nv_rows = _nsw_local_results(visited)
    res = spark.createDataFrame(
        [(qid, cid) for _b, qid, cid in res_rows], "aqid BIGINT, acid BIGINT"
    )
    nv = spark.createDataFrame(
        [(qid, n) for _b, qid, n in nv_rows], "qid BIGINT, n_visited BIGINT"
    )

    # --- recall audit vs exact brute force (j38 shape) --------------
    if exact is None:
        exact = _nsw_exact(qs, nodes)
    hit = exact.join(
        F.broadcast(res),
        (F.col("qid") == F.col("aqid")) & (F.col("cid") == F.col("acid")),
        "left",
    )
    return (
        hit.groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.count("acid").cast("bigint").alias("n_hit"),
            (F.count("acid").cast("double") / F.count(F.lit(1))).alias("recall"),
        )
        .join(F.broadcast(nv), "qid")
        .select("qid", "n_visited", "n_exact", "n_hit", "recall")
    )


def _nsw_sweep_audit(
    qt: DataFrame,
    qs: DataFrame,
    assigned: DataFrame,
    edges: DataFrame,
    exact: DataFrame,
    cellmin: DataFrame,
    beams: tuple[int, ...],
) -> DataFrame:
    """All swept beam widths walk as ONE driver-resident loop
    (round 14 — _nsw_walk_visited, which keys its working set by
    (beam, qid) natively): per hop the adjacency and distance lookups
    are shared across every swept width (distances depend only on
    (qid, cid) and are cached), so each extra beam adds only its own
    frontier rows — exactly the marginal cost the sweep is pricing.
    The round-13 keyed-lineage walk collapsed the three per-beam
    chains into one but still doubled the visited subtree per hop and
    paid per-hop window + union-DISTINCT exchanges. Output identical
    to the per-beam _nsw_recall_audit union (the unrolled per-beam
    DuckDB oracle is unchanged and hash-checks it)."""
    spark = qt.sparkSession
    bdf = F.broadcast(
        # one row per swept width; the audit fans exact out per beam
        spark.createDataFrame([(b,) for b in beams], "beam INT")
    )
    nodes = qt.select(F.col("vec_id").alias("nid"), F.col("q").alias("nq"))
    entry = assigned.join(F.broadcast(cellmin), "label")
    visited = _nsw_walk_visited(nodes, qs, edges, entry, beams)
    res_rows, nv_rows = _nsw_local_results(visited)
    res = spark.createDataFrame(
        res_rows, "abeam INT, aqid BIGINT, acid BIGINT"
    )
    nv = spark.createDataFrame(nv_rows, "beam INT, qid BIGINT, n_visited BIGINT")
    hit = exact.crossJoin(bdf).join(
        F.broadcast(res),
        (F.col("beam") == F.col("abeam"))
        & (F.col("qid") == F.col("aqid"))
        & (F.col("cid") == F.col("acid")),
        "left",
    )
    return (
        hit.groupBy("beam", "qid")
        .agg(
            F.count("acid").cast("bigint").alias("n_hit"),
            (F.count("acid").cast("double") / F.count(F.lit(1))).alias("recall"),
        )
        .join(F.broadcast(nv), ["beam", "qid"])
        .select(
            F.col("beam").cast("int").alias("beam"),
            "qid",
            "n_visited",
            "n_hit",
            "recall",
        )
    )


# ---------------------------------------------------------------- j161

GRAPH_SWEEP_BEAMS = (1, 2, 4)  # beam widths swept; GRAPH_BEAM is the middle point


def _duck_graph_beam_sweep_oracle() -> str:
    """Shared construction/entry CTEs (identical to j159's), then one
    unrolled hop chain PER swept beam width, finals UNION ALL'd with
    the beam literal attached."""
    d = _duck_graph_d
    base = _duck_graph_ann_oracle()
    # reuse j159's prefix verbatim up to and including v0
    prefix = base.split(",\n    f1 AS")[0]
    parts = [prefix]
    for b in GRAPH_SWEEP_BEAMS:
        prev = "v0"
        for h in range(1, GRAPH_HOPS + 1):
            parts.append(
                f"""f{h}b{b} AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid ORDER BY dd, cid) AS rn
        FROM {prev}
      ) WHERE rn <= {b}
    ),
    c{h}b{b} AS (SELECT DISTINCT f.qid, e.dst AS cid
             FROM f{h}b{b} f JOIN edges e ON e.src = f.cid),
    v{h}b{b} AS (
      SELECT qid, cid, dd FROM {prev}
      UNION
      SELECT c.qid, c.cid, {d("qs.qq", "nq.q")} AS dd
      FROM c{h}b{b} c JOIN qs ON qs.qid = c.qid JOIN qt nq ON nq.vec_id = c.cid
    )"""
            )
            prev = f"v{h}b{b}"
        parts.append(
            f"""resb{b} AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid ORDER BY dd, cid) AS rn
        FROM {prev} WHERE cid != qid
      ) WHERE rn <= {GRAPH_K}
    ),
    nvb{b} AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_visited
           FROM {prev} GROUP BY qid)"""
        )
    parts.append(
        f"""ex AS (
      SELECT qid, cid FROM (
        SELECT qs.qid, c.vec_id AS cid,
               row_number() OVER (PARTITION BY qs.qid
                                  ORDER BY {d("qs.qq", "c.q")}, c.vec_id) AS rn
        FROM qt c, qs WHERE c.vec_id != qs.qid
      ) WHERE rn <= {GRAPH_K}
    )
    """
        + "\n    UNION ALL\n    ".join(
            f"""SELECT * FROM (
      SELECT CAST({b} AS INT) AS beam, ex.qid, nvb{b}.n_visited,
             CAST(COUNT(resb{b}.cid) AS BIGINT) AS n_hit,
             CAST(COUNT(resb{b}.cid) AS DOUBLE) / COUNT(*) AS recall
      FROM ex
      LEFT JOIN resb{b} ON resb{b}.qid = ex.qid AND resb{b}.cid = ex.cid
      JOIN nvb{b} ON nvb{b}.qid = ex.qid
      GROUP BY ex.qid, nvb{b}.n_visited)"""
            for b in GRAPH_SWEEP_BEAMS
        )
    )
    return ",\n    ".join(parts)


@query("j161_graph_beam_sweep", oracle=_duck_graph_beam_sweep_oracle())
def j161_graph_beam_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEAM-width/recall sweep over j159's NSW walk (round 13 —
    j141's param-sweep discipline applied to the graph index): the
    same graph, entry points, and hop budget walked at beam widths
    {GRAPH_SWEEP_BEAMS}, reporting per (beam, qid) the visited-set
    size (the COST axis) and recall@{GRAPH_K} (the QUALITY axis).
    This is the table an operator reads to pick the ef_search dial —
    HNSW's central tradeoff — before committing a cluster-wide
    setting. EVERYTHING beam-independent is paid ONCE (round 13): the
    quantized node table, the symmetrized edge table, the entry table
    and the exact brute-force audit side all materialize a single
    time and every beam's walk rides them — the exact side was
    recomputed per swept beam before, tripling the sweep's single
    largest cost. Each extra beam adds only its frontier joins, which
    is exactly the marginal cost the sweep is pricing. Bit-exact both
    engines for the same reason j159 is (all comparisons integer,
    ties by id)."""
    emb = load(spark, sf_dir, "embeddings")
    qt = materialize(emb.select("vec_id", "label", _graph_qcol().alias("q")))
    dist = _graph_dist
    from json2hbase_spark.operators.similarity import ivf_centroids

    cq = ivf_centroids(emb).select(
        "label",
        F.transform(
            "centroid", lambda x: F.floor(x * COV_SCALE).cast("long")
        ).alias("cq"),
    )
    qs = qt.filter(F.col("vec_id") < GRAPH_NQ).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq")
    )
    wq = Window.partitionBy("qid").orderBy("dcell", "label")
    assigned = (
        qs.crossJoin(F.broadcast(cq))
        .withColumn("dcell", dist(F.col("qq"), F.col("cq")))
        .withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") == 1)
        .select("qid", "qq", "label")
    )
    edges = _nsw_edges(qt)
    cellmin = qt.groupBy("label").agg(F.min("vec_id").alias("cid"))
    # exact is consumed exactly ONCE by the final audit plan now that
    # the walk is driver-resident (round 14) — no materialize barrier
    exact = _nsw_exact(
        qs, qt.select(F.col("vec_id").alias("nid"), F.col("q").alias("nq"))
    )
    return _nsw_sweep_audit(
        qt, qs, assigned, edges, exact, cellmin, GRAPH_SWEEP_BEAMS
    )
