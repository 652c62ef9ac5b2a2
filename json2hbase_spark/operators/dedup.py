"""Deduplication operators for LLM training-data pipelines
(SURVEY.md §2 J1/J2/J9; PAPERS.md similarity corpus).

Exact dedup is a hash group-by. Near-dup is the classic
shingle → MinHash → LSH-banding pipeline, built ENTIRELY from native
Catalyst expressions (higher-order functions + xxhash64) — no Python
UDFs, so the hot path stays in whole-stage codegen.

Scale analysis (the reason this shape wins at 100 TB):
- signatures: narrow map, O(docs × shingles × hashes) CPU, no shuffle
- banding: explode to bands (×B rows), shuffle on (band, band_hash) —
  O(n·B) shuffled rows instead of the O(n²) crossJoin a naive
  similarity join needs
- candidate pairs: only docs sharing a band bucket meet; verification
  (exact Jaccard on shingle sets) touches candidates only.
Skewed buckets (boilerplate docs) are handled by AQE skew-join splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from json2hbase_spark.materialize import materialize


def normalize_text(col: Column) -> Column:
    """j1 normalization: casefold + whitespace collapse."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def char_shingles(col: Column, k: int = 8) -> Column:
    """Distinct k-char shingles of a string (empty if len < k).

    ``col`` is let-bound through a single-element ``transform`` so the
    (possibly expensive) input expression — e.g. ``normalize_text`` —
    evaluates ONCE per row, not once per generated shingle. Without the
    binding, Catalyst inlines the input expression into the lambda body
    and re-evaluates it per array element (measured 13.6s → 0.7s for
    5000 docs at sf0.1)."""

    def shingles_of(c: Column) -> Column:
        n = F.length(c) - (k - 1)
        return F.when(
            n >= 1,
            F.array_distinct(
                F.transform(F.sequence(F.lit(1), n), lambda i: c.substr(i, F.lit(k)))
            ),
        ).otherwise(F.expr("CAST(array() AS array<string>)"))

    return F.get(F.transform(F.array(col), shingles_of), 0)


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """j9: MinHash signature as array<bigint> — element h is
    min(xxhash64(h, shingle)) over the shingle set. Seed-mixing via the
    leading literal gives ``num_hashes`` independent hash families.

    The shingle input is let-bound (single-element ``transform``, see
    ``char_shingles``) so a computed shingle expression evaluates once
    per row rather than once per hash family. CAUTION: higher-order
    functions run interpreted, not in codegen — fully materialized
    this form costs ~2.5x the explode+min-agg path
    (``minhash_signatures_agg``), which is the hot-path default;
    count()-style probes under-measure this form because pruning
    skips most of the work."""

    def from_sh(s: Column) -> Column:
        return F.array(
            *[
                F.array_min(F.transform(s, lambda x: F.xxhash64(F.lit(h), x)))
                for h in range(num_hashes)
            ]
        )

    return F.get(F.transform(F.array(shingles), from_sh), 0)


def minhash_signatures_agg(
    df: DataFrame,
    id_col: str,
    shingle_col: str,
    num_hashes: int = 64,
    chunk: int = 32,
) -> DataFrame:
    """Aggregation-form MinHash: explode shingles once, then take
    ``num_hashes`` min-aggregates per doc (map-side combine before the
    shuffle). This is the hot-path default: all expressions compile in
    whole-stage codegen, unlike the higher-order projection form
    (``minhash_signature``) which runs interpreted and costs ~2.5x
    when fully materialized. Returns (id_col, sig array<bigint>).

    The agg is split into ``chunk``-column stages joined on ``id_col``:
    one 64-column aggregate generates a method large enough to hit JIT
    compile cliffs, and its whole-stage-codegen compile dominates a
    single-run benchmark. Each half aggregates the same exploded input
    and the join is exchange-free (both sides come out of their own
    groupBy hash-partitioned by ``id_col``), so the only added cost is
    a second pass over the exploded shingles — map-side, no extra
    shuffled bytes."""
    exploded = df.select(F.col(id_col), F.explode(F.col(shingle_col)).alias("_s"))
    parts = []
    for start in range(0, num_hashes, chunk):
        hs = range(start, min(start + chunk, num_hashes))
        parts.append(
            exploded.groupBy(id_col).agg(
                *[
                    F.min(F.xxhash64(F.lit(h), F.col("_s"))).alias(f"_h{h}")
                    for h in hs
                ]
            )
        )
    mins = parts[0]
    for p in parts[1:]:
        mins = mins.join(p, id_col)
    return mins.select(
        F.col(id_col), F.array(*[F.col(f"_h{h}") for h in range(num_hashes)]).alias("sig")
    )


def lsh_bands(sig: Column, bands: int, rows: int) -> Column:
    """Split a signature into ``bands`` buckets of ``rows`` values and
    hash each band: array<struct<band int, bh bigint>>.

    Deliberately NOT let-bound: slice/xxhash64/array/struct all
    compile in whole-stage codegen, and wrapping them in a
    higher-order ``transform`` binding forces interpreted evaluation
    (measured 2.1s → 9.0s for the banding stage at sf0.1). Callers
    must instead materialize a computed ``sig`` behind an exchange
    before banding — see ``near_dup_pairs``."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.slice(sig, b * rows + 1, rows)).alias("bh"),
            )
            for b in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two string sets."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 8,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """j2: candidate pairs via MinHash-LSH banding, verified with exact
    shingle Jaccard >= threshold. Returns (doc_a, doc_b, jaccard).

    With 16 bands × 4 rows, P(candidate) = 1-(1-J^4)^16: ~0.04 at
    J=0.4, ~0.93 at J=0.8 — the usual S-curve for near-dup mining.
    r must stay ≥ 4 here: a 16×2 layout (knee 0.25) admits J≈0.1
    pairs as candidates at ~15% probability, which on a corpus with
    shared templates turns the verification join quadratic (measured
    7.4 s → 74 s at sf0.1 before reverting). Codegen cost of the wide
    min-agg is addressed by splitting it into two half-width
    aggregates instead — see ``minhash_signatures_agg``.
    """
    rows = num_hashes // bands
    shingle_tbl = df.select(
        F.col(id_col).alias("_id"),
        char_shingles(normalize_text(F.col(text_col)), shingle_k).alias("_sh"),
    ).filter(F.size("_sh") > 0)

    # aggregation-form signatures: the let-bound projection form looks
    # faster under count() but that is column-pruning artifact — fully
    # materialized, the interpreted 64-family HOF expression costs
    # ~9s at sf0.1 vs ~3.5s for the explode + min-agg (which runs in
    # codegen and combines map-side). The agg's exchange also hands the
    # self-join below a shared materialization point.
    sigs = minhash_signatures_agg(shingle_tbl, "_id", "_sh", num_hashes)
    # materialize: the self-join below would otherwise run the whole
    # signature aggregation once per side (ReuseExchange cannot match
    # the HOF-lambda shingle subtree; see also simhash_near_pairs)
    banded = sigs.select(
        "_id", F.explode(lsh_bands(F.col("sig"), bands, rows)).alias("_b")
    ).select("_id", "_b.band", "_b.bh")
    banded = materialize(banded)

    # candidate ids only through the band join (no shingle arrays in the
    # shuffle); shingles re-attach for verification afterwards
    left = banded.select(
        F.col("band").alias("l_band"), F.col("bh").alias("l_bh"), F.col("_id").alias("doc_a")
    )
    right = banded.select(
        F.col("band").alias("r_band"), F.col("bh").alias("r_bh"), F.col("_id").alias("doc_b")
    )
    # materialize the (small) candidate set once: it feeds the id
    # pruning below and the final pair join, and it cuts the LSH
    # pipeline out of every downstream subtree
    cands = (
        left.join(
            right,
            (left.l_band == right.r_band)
            & (left.l_bh == right.r_bh)
            & (left.doc_a < right.doc_b),
        )
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    cands = materialize(cands)
    # verification cost must scale with CANDIDATES, not corpus: semi-
    # join-prune the docs to candidate ids first, then shingle that
    # sliver only. At sf0.1 this measures ~1s SLOWER than shingling
    # the full corpus on both verify sides (the checkpoint job costs
    # more than 2x 5000-doc shingle passes), but at 100 TB the two
    # full-corpus passes are the difference between rescanning
    # everything and touching ~|candidates| rows — the right default
    # for the scale this engine targets.
    cand_ids = cands.select(
        F.explode(F.array("doc_a", "doc_b")).alias("_id")
    ).distinct()
    ver_sh = (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
        .join(F.broadcast(cand_ids), "_id", "left_semi")
        .select(
            "_id", char_shingles(normalize_text(F.col("_t")), shingle_k).alias("_sh")
        )
    )
    sh_a = ver_sh.select(F.col("_id").alias("doc_a"), F.col("_sh").alias("sh_a"))
    sh_b = ver_sh.select(F.col("_id").alias("doc_b"), F.col("_sh").alias("sh_b"))
    return (
        cands.join(F.broadcast(sh_a), "doc_a")
        .join(F.broadcast(sh_b), "doc_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash64(tokens: Column) -> Column:
    """SimHash over a token array: sign-sum of per-token xxhash64 bits,
    built from native expressions (64 bit-vote aggregates folded into a
    single BIGINT). Expression form — use ``simhash_agg`` in hot paths
    (this form re-walks the token array once per bit)."""
    def bit_vote(bit: int) -> Column:
        # +1 when the token hash has ``bit`` set, else -1; majority wins
        votes = F.aggregate(
            tokens,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.shiftright(F.xxhash64(t), bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        return F.when(votes > 0, F.lit(2 ** bit if bit < 63 else -(2 ** 63))).otherwise(F.lit(0))

    out = F.lit(0).cast("long")
    for b in range(64):
        out = out + bit_vote(b)
    return out


def simhash_agg(df: DataFrame, id_col: str, token_col: str) -> DataFrame:
    """Per-row SimHash: hash every token ONCE into a let-bound array,
    then fold 64 per-bit majority votes over it — a single projection,
    no explode, no shuffle (unlike MinHash, SimHash needs no cross-row
    state, so the narrow-map form is strictly better at 100 TB).
    Measured 7.3s → 0.3s steady-state at sf0.1 vs a 64-column
    explode/groupBy formulation. Returns (id_col, sh BIGINT)."""

    def from_hashes(hs: Column) -> Column:
        def bit_vote(bit: int) -> Column:
            votes = F.aggregate(
                hs,
                F.lit(0),
                lambda acc, h: acc
                + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
            )
            return F.when(
                votes > 0, F.lit(2 ** bit if bit < 63 else -(2 ** 63))
            ).otherwise(F.lit(0))

        out = F.lit(0).cast("long")
        for b in range(64):
            out = out + bit_vote(b)
        return out

    hashed = F.transform(F.col(token_col), lambda t: F.xxhash64(t))
    sh = F.get(F.transform(F.array(hashed), from_hashes), 0)
    return df.select(F.col(id_col), sh.alias("sh"))


def simhash_bands(sh: Column, bands: int = 4) -> Column:
    """Split a 64-bit SimHash into ``bands`` equal bit-slices for
    Hamming blocking: array<struct<band int, bv bigint>>. Docs within
    Hamming distance < bands share at least one band (pigeonhole)."""
    width = 64 // bands
    mask = (1 << width) - 1
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(sh, i * width).bitwiseAND(F.lit(mask)).alias("bv"),
            )
            for i in range(bands)
        ]
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    token_col: str,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup mining: banded blocking (only docs sharing a
    16-bit band slice meet in the join) + exact Hamming verification
    via ``bit_count(xor)``. Returns (doc_a, doc_b, hamming). The band
    join shuffles only (band, slice, id) — 20 bytes/row at 100 TB."""
    sh = simhash_agg(df, id_col, token_col)
    banded = sh.select(
        F.col(id_col).alias("_id"),
        F.col("sh"),
        F.explode(simhash_bands(F.col("sh"), bands)).alias("_b"),
    ).select("_id", "sh", "_b.band", "_b.bv")
    # materialize so the self-join's two sides share one signature
    # computation (ReuseExchange does not fire across HOF lambda
    # plans — see near_dup_pairs)
    banded = materialize(banded)
    left = banded.select(
        F.col("band").alias("l_band"), F.col("bv").alias("l_bv"),
        F.col("_id").alias("doc_a"), F.col("sh").alias("sh_a"),
    )
    right = banded.select(
        F.col("band").alias("r_band"), F.col("bv").alias("r_bv"),
        F.col("_id").alias("doc_b"), F.col("sh").alias("sh_b"),
    )
    return (
        left.join(
            right,
            (left.l_band == right.r_band)
            & (left.l_bv == right.r_bv)
            & (left.doc_a < right.doc_b),
        )
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
