"""Quadratic-blowup tripwire for the dedup family's blocking
structure (SCALE.md promoted into CI, round-4 verdict item).

SCALE.md's ×10 volume probe showed the whole dedup/text family
sub-linear-to-linear (worst ratios: j40 ×3.3, j53 ×3.1, j48 ×2.9 at
×10 data). Those numbers only protect the 100 TB story if a
regression to the BLOCKING structure (losing the band join, a span
key turning into a doc-pair comparison, an accidental cartesian)
fails CI rather than quietly re-appearing as a markdown delta. This
test re-runs the probe's construction at a CI-sized base (sf0.01,
×10 disjoint alphabet-rotated shards — duplicate density constant,
volume ×10) for the three worst-ratio operators and asserts the
wall-clock ratio stays far below quadratic: a linear operator shows
≈×10 minus amortized fixed costs (measured ×2–4 here), a quadratic
pair stage shows ≈×100. The ×12 tripwire leaves headroom for timing
noise while still catching any O(n²) regression by an order of
magnitude.
"""

from __future__ import annotations

import string
import time

import pytest
from pyspark.sql import functions as F

# Whole module = x4-volume linearity reruns (~5 min of the suite):
# `slow` per the round-14 test split (pytest.ini) — covered by the
# full-suite invocation each round, not the driver's default gate.
pytestmark = pytest.mark.slow

TRIPWIRE_QUERIES = [
    "j40_ngram_jaccard",
    "j53_span_dedup",
    "j48_dedup_near_md5",
    # round-6 (VERDICT r5 #6): iterative/pair-heavy ops — linear by
    # design because their edge/candidate sets come from banding (j47
    # pagerank + j20 components iterate over banded near-dup edges,
    # j49's recall harness reuses the banded candidates, j72 is a
    # gram-keyed agg); a lost band join would blow the ratio here.
    "j47_pagerank",
    "j20_dup_components",
    "j49_dedup_recall",
    "j72_source_overlap",
    # round-7 (VERDICT r6 #5): the round-6 curation ops — j81's banded
    # candidate-pair table (j43's category: a lost block key goes
    # quadratic), j82's explode into ONE wide conditional agg (token
    # rows scale linearly, FH_DIM stays fixed), j89's explode → vocab
    # agg → equi re-join (j7's shape), and the two bucketed two-pass
    # prefix sums (j83/m8 — a regression back to the single-partition
    # window shows up as the lost-parallelism wall, not quadratic, but
    # the ratio bound still catches a serialized fold at ×10).
    "j81_band_tuning",
    "j82_feature_hash_embed",
    "j89_hapax_docs",
    "j83_pps_sample",
    "m8_shard_plan",
    # round-7 new ops: j91 rides the same bucketed prefix sum (value-
    # derived bucket), j92 is a segment explode into broadcast-vote
    # aggs, j93 is the deliberately chars-heavy ExactSubstr gram sweep
    # (count-over-window on the gram hash) — all designed linear.
    "j91_token_budget_select",
    "j92_langid_segments",
    "j93_dup_substring_ranges",
    # round-7 selection family: j94's grouped bucketed prefix sum (a
    # regression to a per-source single-partition window shows as the
    # lost-parallelism wall), j95/j96/j98's map-pass + bounded-agg
    # shapes. j97 is embeddings-based (this harness scales documents
    # only); its fixed-d² shuffle is pinned by test_selection_ops.
    "j94_source_budget_select",
    "j95_blockword_gate",
    "j96_prefix_cluster",
    "j98_url_canonical_dedup",
    # second round-7 batch: j99's winnowing sweep is the chars-heavy
    # gram stream + per-doc sliding min (a lost per-doc partition key
    # or an accidental pair join would blow the ratio), j100 is a
    # map pass + bounded agg. b12/a26 are orders/IO-based — out of
    # this documents-scaling harness's scope.
    "j99_winnow_fingerprint",
    "j100_text_normalize",
    "j101_source_dup_matrix",
    "j102_chunk_dedup",
    "j103_winnow_pairs",
    "j104_segment_filter",
    "j105_curriculum_order",
    "d16_weighted_median",
    "j106_heaps_law",
    "j107_cluster_safe_split",
    # round-8: j108's pair stage is j103's (FP_MAX_DF-capped) and its
    # label propagation touches only the pair set — a cap loss or a
    # corpus-sized label join blows the ratio; j109 rides j106's
    # shared cumulative curve into a 10-row band agg.
    "j108_winnow_clusters",
    "j109_heaps_checkpoints",
    "j110_code_detect",
    "j111_contamination_span",
    "j112_source_unigram_kl",
    "j113_quality_threshold_sweep",
    "j114_quality_disagreement",
    "j115_packing_waste",
    "j116_contamination_redact",
    # round-9: j117 composes the two probed pair shapes (j48's banded
    # candidates + j108's converged propagation — a lost band key or a
    # broken early-exit both land here); j118 is one applyInPandas per
    # lang over linear rows; j119 is a map pass into a |langs| agg.
    "j117_cross_source_clusters",
    "j118_pack_ffd",
    "j119_nfc_normalize",
]
MULT = 10
MAX_RATIO = 12.0


@pytest.fixture(scope="module")
def scaled_docs_dir(spark, tmp_path_factory):
    """×MULT disjoint shards of the sf0.01 documents table, each with a
    distinct alphabet rotation so cross-shard text shares no shingles
    (tools/scale_probe.py's construction)."""
    from json2hbase_spark.io import load

    base = "/root/testdata/sf0.01"
    out = str(tmp_path_factory.mktemp("scale10"))
    docs = load(spark, base, "documents")
    lower = string.ascii_lowercase
    big = None
    for k in range(MULT):
        rot = lower[k:] + lower[:k]
        shard = docs.select(
            (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
            F.translate("text", lower, rot).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        big = shard if big is None else big.unionByName(shard)
    big.repartition(8).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def _best_of_two(spark, name: str, sf_dir: str) -> float:
    """Min of two runs — the tripwire compares ALGORITHMIC scaling, so
    first-touch costs (codegen, parquet footers) must not masquerade
    as data-size terms (scale_probe.py's convention)."""
    from json2hbase_spark import registry
    from json2hbase_spark.materialize import cleanup_materialized

    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cleanup_materialized()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return best


@pytest.mark.parametrize("name", TRIPWIRE_QUERIES)
def test_dedup_blocking_stays_linear(spark, scaled_docs_dir, name):
    from json2hbase_spark import registry

    registry.load_all_query_modules()
    base = _best_of_two(spark, name, "/root/testdata/sf0.01")
    scaled = _best_of_two(spark, name, scaled_docs_dir)
    ratio = scaled / max(base, 1e-6)
    assert ratio < MAX_RATIO, (
        f"{name}: ×{MULT} volume took ×{ratio:.1f} wall-clock "
        f"({base:.2f}s → {scaled:.2f}s) — blocking structure may have "
        f"regressed toward a pairwise stage (linear ≈ ×{MULT}, quadratic ≈ ×{MULT**2})"
    )


@pytest.fixture(scope="module")
def scaled_emb_dir(spark, tmp_path_factory):
    """×4 disjoint shards of the sf0.01 embeddings table, vectors
    cyclically rotated per shard (norms preserved, cross-shard cosines
    scrambled) — scale_probe.py's embeddings construction."""
    from json2hbase_spark.io import load

    base = "/root/testdata/sf0.01"
    out = str(tmp_path_factory.mktemp("scale4emb"))
    emb = load(spark, base, "embeddings")
    big = None
    for k in range(4):
        rot = (
            F.concat(F.slice("embedding", k + 1, 64 - k), F.slice("embedding", 1, k))
            if k
            else F.col("embedding")
        )
        shard = emb.select(
            (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
            rot.alias("embedding"),
            "label",
        )
        big = shard if big is None else big.unionByName(shard)
    big.repartition(8).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    load(spark, base, "documents").write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    return out


def test_auto_dials_keep_pair_budget_linear():
    """The volume-adaptive dials (operators/scaling) must keep the
    EXPECTED candidate-pair budget linear in n: k ∝ n for SemDeDup
    cells (budget ≈ n·TARGET_CELL/2), ⌈log₂(n/bucket)⌉ planes for LSH
    (+2 per ×4 volume; budget ≈ n·TARGET_BUCKET/2). Pure math — no
    Spark — so a dial formula regression fails in milliseconds."""
    from json2hbase_spark.operators.scaling import (
        TARGET_BUCKET,
        TARGET_CELL,
        auto_kmeans_k,
        auto_lsh_planes,
        expected_pair_budget_kmeans,
        expected_pair_budget_lsh,
    )

    for n in (500, 2_000, 8_000, 10**6, 10**8, 10**10):
        k = auto_kmeans_k(n)
        assert expected_pair_budget_kmeans(n, k) <= n * TARGET_CELL, n
        p = auto_lsh_planes(n)
        assert expected_pair_budget_lsh(n, p) <= n * TARGET_BUCKET, n
    # the "+2 planes per ×4 volume" contract, everywhere above the floor
    for n in (10_000, 10**6, 10**9):
        assert auto_lsh_planes(4 * n) == auto_lsh_planes(n) + 2, n


def test_semdedup_auto_k_pairs_stay_linear(spark, scaled_emb_dir):
    """VERDICT r5 #5's done-criterion: SemDeDup at ×4 volume with the
    AUTO-chosen k stays inside the linear envelope. This measures the
    designed quantity directly — the within-cell candidate-pair count
    Σ C(cell,2) from the real k-means assignment — rather than
    wall-clock, so cluster skew (not timing noise) is what can fail
    it. Measured ratio ≈ 4.06 at ×4 (k 10→40, max cell 58→63);
    a fixed k=10 would give ≈ ×16. The ×8 bound is 2× headroom over
    measured while still failing any fixed-k regression."""
    from json2hbase_spark.io import load
    from json2hbase_spark.operators.scaling import auto_kmeans_k
    from json2hbase_spark.plans.advanced_queries import kmeans_assign

    def pair_budget(sf_dir):
        n = load(spark, sf_dir, "embeddings").count()
        sizes = (
            kmeans_assign(spark, sf_dir, iters=3, k=auto_kmeans_k(n))
            .groupBy("cluster")
            .count()
            .collect()
        )
        return sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)

    base_pairs = pair_budget("/root/testdata/sf0.01")
    scaled_pairs = pair_budget(scaled_emb_dir)
    ratio = scaled_pairs / max(base_pairs, 1)
    assert ratio < 8.0, (
        f"semdedup auto-k pair budget grew ×{ratio:.1f} at ×4 volume "
        f"({base_pairs} → {scaled_pairs} candidate pairs) — the k dial "
        f"is no longer tracking corpus size (linear ≈ ×4, fixed-k ≈ ×16)"
    )


def test_embed_dedup_blocking_stays_bucketed(spark, scaled_emb_dir):
    """j16's LSH-hyperplane blocking at FIXED plane count: ×4 volume
    grows within-bucket pairs ≤×16 by design (SCALE.md's envelope),
    but measured wall-clock stays ≤×2-3 because fixed costs dominate
    at this size. Losing the bucket join (accidental all-pairs) would
    jump past ×8 immediately — that is what this tripwire catches."""
    base = _best_of_two(spark, "j16_dedup_embed", "/root/testdata/sf0.01")
    scaled = _best_of_two(spark, "j16_dedup_embed", scaled_emb_dir)
    ratio = scaled / max(base, 1e-6)
    assert ratio < 8.0, (
        f"j16_dedup_embed: ×4 volume took ×{ratio:.1f} wall-clock "
        f"({base:.2f}s → {scaled:.2f}s) — the bucket join may have "
        f"degenerated to all-pairs (designed envelope ≤×16 pairs, measured ≤×2.3 time)"
    )


# Round-9 (VERDICT r8 #8): the streaming curation family probed at ×10
# volume. Two properties per op: (a) wall-clock stays far below
# quadratic (same MAX_RATIO bound as the batch family — the per-batch
# work is map + bounded agg, so a blowup means a stream-side pair
# stage appeared), and (b) for the complete-mode monitors the OUTPUT
# DOMAIN — which equals the streaming state row count for a
# complete-mode aggregate — must not grow with corpus volume (state
# bounded by the source/lang/threshold domain, never by docs).
STREAM_TRIPWIRE = [
    ("i24_stream_model_filter", False),
    ("i25_stream_corpus_digest", False),
    ("i26_stream_chunk_dedup", False),
    ("i28_stream_contamination_gate", True),
    ("i29_stream_mixture_monitor", True),
    ("i30_stream_threshold_sweep", True),
    ("i33_stream_neardup_gate", True),
]


@pytest.mark.parametrize("name,domain_bounded", STREAM_TRIPWIRE)
def test_streaming_family_stays_linear(spark, scaled_docs_dir, name, domain_bounded):
    from json2hbase_spark import registry

    registry.load_all_query_modules()
    base = _best_of_two(spark, name, "/root/testdata/sf0.01")
    scaled = _best_of_two(spark, name, scaled_docs_dir)
    ratio = scaled / max(base, 1e-6)
    assert ratio < MAX_RATIO, (
        f"{name}: ×{MULT} stream volume took ×{ratio:.1f} wall-clock "
        f"({base:.2f}s → {scaled:.2f}s) — per-batch work may have "
        f"acquired a corpus-sized stage (linear ≈ ×{MULT})"
    )
    if domain_bounded:
        n1 = registry.QUERIES[name](spark, "/root/testdata/sf0.01").count()
        n10 = registry.QUERIES[name](spark, scaled_docs_dir).count()
        assert n10 <= max(n1, 1) * 2, (
            f"{name}: complete-mode output rows grew {n1} → {n10} at ×{MULT} "
            "volume — streaming state is no longer domain-bounded"
        )


def test_graph_ann_auto_cells_edge_budget_stays_linear(spark, scaled_emb_dir):
    """j159's deployable dial (graph_ann_plan): NSW cells come from
    auto-k k-means, so the M-NN construction's candidate-pair budget
    Σ C(cell,2) stays in the linear envelope at ×4 volume — the same
    designed quantity j43's tripwire measures (fixed label cells, the
    registered j159's oracle pin, would read ≈×16). The edge-table
    bound is structural (symmetrized top-M ≤ 2·n·GRAPH_M rows) and
    checked on the scaled corpus."""
    from json2hbase_spark.io import load
    from json2hbase_spark.operators.scaling import auto_kmeans_k
    from json2hbase_spark.plans.advanced_queries import kmeans_assign
    from json2hbase_spark.plans.vector_queries import GRAPH_M

    def pair_budget_and_n(sf_dir):
        n = load(spark, sf_dir, "embeddings").count()
        sizes = (
            kmeans_assign(spark, sf_dir, iters=3, k=auto_kmeans_k(n))
            .groupBy("cluster")
            .count()
            .collect()
        )
        return sum(r["count"] * (r["count"] - 1) // 2 for r in sizes), n

    base_pairs, n_base = pair_budget_and_n("/root/testdata/sf0.01")
    scaled_pairs, n_scaled = pair_budget_and_n(scaled_emb_dir)
    ratio = scaled_pairs / max(base_pairs, 1)
    assert ratio < 8.0, (
        f"graph-ANN auto-cell pair budget grew ×{ratio:.1f} at ×4 volume "
        f"({base_pairs} → {scaled_pairs}) — the cell dial is no longer "
        f"tracking corpus size (linear ≈ ×4, fixed cells ≈ ×16)"
    )
    # edge bound is structural: top-M per src, symmetrized — count the
    # ACTUAL scaled edge table against 2·n·M
    from json2hbase_spark.io import load as _load
    from json2hbase_spark.operators.scaling import auto_kmeans_k as _ak
    from pyspark.sql import Window

    emb = _load(spark, scaled_emb_dir, "embeddings")
    from json2hbase_spark.plans.vector_queries import _graph_dist, _graph_qcol

    asg = kmeans_assign(
        spark, scaled_emb_dir, iters=3, k=_ak(n_scaled)
    ).select("vec_id", "cluster")
    qt = emb.join(asg, "vec_id").select(
        "vec_id", F.col("cluster").alias("label"), _graph_qcol().alias("q")
    )
    ea = qt.select("label", F.col("vec_id").alias("src"), F.col("q").alias("qa"))
    eb = qt.select(
        F.col("label").alias("lb"), F.col("vec_id").alias("dst"), F.col("q").alias("qb")
    )
    cand = ea.join(eb, (ea.label == eb.lb) & (ea.src != eb.dst)).select(
        "src", "dst", _graph_dist(F.col("qa"), F.col("qb")).alias("dd")
    )
    w = Window.partitionBy("src").orderBy("dd", "dst")
    topm = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= GRAPH_M)
        .select("src", "dst")
    )
    n_edges = (
        topm.unionByName(
            topm.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .count()
    )
    assert n_edges <= 2 * n_scaled * GRAPH_M


def test_graph_ann_plan_runs_and_recalls_on_auto_cells(spark):
    """graph_ann_plan at sf0.001: runs end-to-end on auto-k cells and
    every query's recall is within [0, 1] with n_hit <= n_exact;
    own-cluster entry means the walk starts inside the query's cell,
    so each query must at least visit its entry."""
    from json2hbase_spark.plans.vector_queries import graph_ann_plan

    out = graph_ann_plan(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        assert 0.0 <= r.recall <= 1.0
        assert r.n_hit <= r.n_exact
        assert r.n_visited >= 1
