"""Round-4c training-prep operator tests: global-shuffle permutation
properties, known-entropy fixtures, DSIR importance direction, and
plan pins for all three (shard exchange count, partial combines,
broadcast ratio join)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from json2hbase_spark import registry
from json2hbase_spark.plans import pipeline_queries  # noqa: F401 (registers)
from json2hbase_spark.plans.pipeline_queries import N_SHARDS


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs_fixture(spark, rows):
    """rows: (doc_id, text, lang, source) — writes a documents.parquet
    with the derived n_chars column, returns the dir."""
    df = spark.createDataFrame(
        [(i, t, la, s, len(t)) for i, t, la, s in rows],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    d = tempfile.mkdtemp(prefix="pipeline_fixture_")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


# ---------------------------------------------------------------- j62


def test_j62_is_permutation(spark, sf_dir):
    """Every doc appears exactly once; shards are in [0, N_SHARDS);
    in-shard positions are contiguous 1..count(shard)."""
    out = registry.QUERIES["j62_global_shuffle"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    bad_shard = out.filter((F.col("shard") < 0) | (F.col("shard") >= N_SHARDS))
    assert bad_shard.count() == 0
    per_shard = out.groupBy("shard").agg(
        F.count("*").alias("n"), F.min("pos").alias("lo"), F.max("pos").alias("hi")
    )
    broken = per_shard.filter((F.col("lo") != 1) | (F.col("hi") != F.col("n")))
    assert broken.count() == 0


def test_j62_single_shard_exchange(spark, sf_dir):
    """The whole shuffle is ONE hash exchange on shard feeding the
    in-shard sort+rank — never a global ORDER BY (range exchange /
    single partition funnel)."""
    plan = _physical_plan(registry.QUERIES["j62_global_shuffle"](spark, sf_dir))
    assert plan.count("Exchange") == 1, plan
    assert "Exchange hashpartitioning(shard" in plan, plan
    assert "rangepartitioning" not in plan and "SinglePartition" not in plan, plan


# ---------------------------------------------------------------- j63


def test_j63_known_entropies(spark):
    """Hand-checkable Shannon entropies: a one-char run is 0 bits, a
    two-char alternation is exactly 1 bit, four equiprobable chars are
    exactly 2 bits; keep only when both entropy and length clear the
    gates."""
    d = _docs_fixture(
        spark,
        [
            (1, "a" * 120, "en", "s"),          # 0 bits, long enough
            (2, "ab" * 60, "en", "s"),          # 1 bit
            (3, "abcd" * 30, "en", "s"),        # 2 bits
            (4, "abcdefghijklmnop" * 8, "en", "s"),  # 4 bits -> keep
            (5, "abcdefghijklmnop", "en", "s"),  # 4 bits but too short
        ],
    )
    rows = {
        r.doc_id: r
        for r in registry.QUERIES["j63_entropy_filter"](spark, d).collect()
    }
    assert rows[1].entropy == 0.0 and not rows[1].keep
    assert rows[2].entropy == 1.0 and not rows[2].keep
    assert rows[3].entropy == 2.0 and not rows[3].keep
    assert rows[4].entropy == 4.0 and rows[4].keep
    assert rows[5].entropy == 4.0 and not rows[5].keep  # length gate
    assert rows[4].n_distinct_chars == 16 and rows[4].n_chars == 128


def test_j63_aggs_partially_combine(spark, sf_dir):
    """Both aggregations ((doc,char) counts, per-doc entropy) must
    partially aggregate map-side so the shuffled payload is bounded by
    the alphabet, not the text length; no join anywhere."""
    plan = _physical_plan(registry.QUERIES["j63_entropy_filter"](spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") == 4, plan  # 2 aggs x partial+final
    assert plan.count("Exchange hashpartitioning") == 2, plan


# ---------------------------------------------------------------- j64


def test_j64_target_lookalikes_score_higher(spark):
    """Docs sharing the target language's token distribution must
    outscore docs that don't, regardless of their own lang label."""
    d = _docs_fixture(
        spark,
        [(i, "alpha beta gamma", "en", "s") for i in range(4)]
        + [(10 + i, "omega psi chi", "de", "s") for i in range(4)]
        # a de-labeled doc written in target-like tokens: must score
        # with the en group (DSIR keys on content, not labels)
        + [(99, "alpha beta gamma", "de", "s")],
    )
    rows = registry.QUERIES["j64_dsir_importance"](spark, d).collect()
    score = {r.doc_id: r.importance for r in rows}
    en_like = [score[i] for i in range(4)] + [score[99]]
    de_like = [score[10 + i] for i in range(4)]
    assert min(en_like) > max(de_like)
    assert len(set(en_like)) == 1  # identical content -> identical score


def test_j64_ratio_join_is_broadcast(spark, sf_dir):
    """Everything downstream reduces from the materialized
    per-(doc,bucket) table: the ratio join is a broadcast (never a
    sort-merge of tokens vs ratios) and the only wide exchanges are
    the per-doc score agg and the 64-row-bounded histogram agg on b —
    in particular the corpus explode must NOT reappear (one corpus
    pass, not five)."""
    from json2hbase_spark.plans.pipeline_queries import dsir_scored_plan

    plan = _physical_plan(dsir_scored_plan(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Exchange hashpartitioning(doc_id" in plan, plan
    # doc-score agg + the b-keyed hist reductions (re-derived for the
    # totals, but from the materialized docs×64 table, not the corpus)
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    assert "Generate explode" not in plan, plan  # explode happened pre-cut
    # the final flag over the materialized scores: TakeOrdered top-K +
    # broadcast threshold compare — never a global rank window
    flag = _physical_plan(registry.QUERIES["j64_dsir_importance"](spark, sf_dir))
    assert "TakeOrderedAndProject" in flag, flag
    assert "Window" not in flag, flag


# ---------------------------------------------------------------- j65


def test_j65_no_false_negatives_and_exact_confirm(spark, sf_dir):
    """A Bloom filter may over-approximate but NEVER under-approximate:
    per lang, candidates >= confirmed, false_pos = candidates -
    confirmed, and confirmed must equal an independently computed
    exact incoming-vs-corpus block join."""
    out = {
        r.lang: r
        for r in registry.QUERIES["j65_bloom_dedup"](spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    block = F.substring(
        F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), 1, 40
    ).alias("block")
    normed = docs.select("doc_id", "lang", block)
    inc = normed.filter(F.col("doc_id") % 5 == 0)
    cor = normed.filter(F.col("doc_id") % 5 != 0).select("block").distinct()
    exact = {
        r.lang: r.n
        for r in inc.join(cor, "block", "left_semi")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert out, "no output rows"
    for lang, r in out.items():
        assert r.n_candidates >= r.n_confirmed >= 0
        assert r.n_false_pos == r.n_candidates - r.n_confirmed
        assert r.n_confirmed == exact.get(lang, 0)


def test_j65_planted_dup_is_found(spark):
    """Planted: incoming doc 0 duplicates corpus doc 1; incoming doc 5
    is unique. The dup must be confirmed; the unique doc may only ever
    appear as a (counted) false positive, never confirmed."""
    text_dup = "the quick brown fox jumps over the lazy dog " * 3
    d = _docs_fixture(
        spark,
        [
            (0, text_dup, "en", "s"),          # incoming (0 % 5 == 0)
            (5, "completely novel content never seen before x", "en", "s"),
            (1, text_dup, "en", "s"),          # corpus twin
            (2, "some other corpus doc entirely", "en", "s"),
        ],
    )
    r = {x.lang: x for x in registry.QUERIES["j65_bloom_dedup"](spark, d).collect()}
    en = r["en"]
    assert en.n_incoming == 2
    assert en.n_confirmed == 1
    assert en.n_candidates >= 1


def test_j66_cms_error_is_one_sided(spark, sf_dir):
    """Count-Min can only overestimate: est >= exact on every row,
    overestimate is their difference, and exactly TOPK rows emerge."""
    from json2hbase_spark.plans.pipeline_queries import CMS_TOPK

    rows = registry.QUERIES["j66_cms_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == CMS_TOPK
    for r in rows:
        assert r.est_cnt >= r.exact_cnt, r
        assert r.overestimate == r.est_cnt - r.exact_cnt, r


def test_j66_exact_top_is_takeordered(spark, sf_dir):
    """The exact top-K must come from TakeOrderedAndProject (partial
    per-partition top-K), never a global sort; the sketch probe join
    must be broadcast."""
    plan = _physical_plan(registry.QUERIES["j66_cms_heavy_hitters"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_j67_kmv_bounds(spark, sf_dir):
    """Per-lang KMV estimate lands within the ~1/sqrt(k) error regime
    (assert a loose 4-sigma band) and never degenerates silently."""
    from json2hbase_spark.plans.pipeline_queries import KMV_K

    rows = registry.QUERIES["j67_kmv_distinct"](spark, sf_dir).collect()
    assert rows
    tol = 4.0 / (KMV_K ** 0.5)
    for r in rows:
        assert abs(r.est_distinct - r.exact_distinct) <= max(
            5, tol * r.exact_distinct
        ), r


def test_j67_degenerate_small_group_is_exact(spark):
    """A group with fewer than k distinct values must report the exact
    distinct count (the KMV degenerate path)."""
    d = _docs_fixture(
        spark,
        [(i, "alpha beta gamma delta", "en", "s") for i in range(3)],
    )
    rows = registry.QUERIES["j67_kmv_distinct"](spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.exact_distinct == 3  # 3 distinct bigrams
    assert r.est_distinct == r.exact_distinct


def test_j68_digest_is_order_and_partition_free(spark, sf_dir):
    """The content digest must be identical regardless of partitioning
    (sum is commutative): recompute at 1 and 16 partitions and
    compare; and a single changed character must change the digest."""
    out = {
        r.source: r.content_digest
        for r in registry.QUERIES["j68_corpus_digest"](spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    import tempfile

    d = tempfile.mkdtemp(prefix="j68_repart_")
    docs.repartition(16).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out16 = {
        r.source: r.content_digest
        for r in registry.QUERIES["j68_corpus_digest"](spark, d).collect()
    }
    assert out == out16

    d2 = tempfile.mkdtemp(prefix="j68_mut_")
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == docs.limit(1).collect()[0].doc_id,
               F.concat(F.col("text"), F.lit("X"))).otherwise(F.col("text")),
    )
    mutated.write.mode("overwrite").parquet(f"{d2}/documents.parquet")
    out_mut = {
        r.source: r.content_digest
        for r in registry.QUERIES["j68_corpus_digest"](spark, d2).collect()
    }
    assert out != out_mut
    # exactly one source's digest moved; counts unchanged
    assert sum(1 for s in out if out[s] != out_mut[s]) == 1


def test_j68_digest_agg_partially_combines(spark, sf_dir):
    """The digest is a plain partial+final hash agg — mergeable by
    construction; no join, no window, one exchange."""
    plan = _physical_plan(registry.QUERIES["j68_corpus_digest"](spark, sf_dir))
    assert "Join" not in plan and "Window" not in plan, plan
    assert plan.count("HashAggregate") == 2, plan
    assert plan.count("Exchange") == 1, plan


def test_j69_planted_novelty(spark):
    """Doc 1 introduces both bigrams (novel); doc 2 repeats them
    (zero novel): per-lang novelty_rate = 2 novel / 4 occurrences."""
    d = _docs_fixture(
        spark,
        [(1, "a b c", "en", "s"), (2, "a b c", "en", "s")],
    )
    rows = registry.QUERIES["j69_ngram_novelty"](spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_docs, r.n_grams, r.n_novel) == (2, 4, 2)
    assert r.novelty_rate == 0.5


def test_j69_no_pairwise_stage(spark, sf_dir):
    """Novelty is gram-keyed aggregation + equi join only — a
    cartesian/BNLJ means someone reintroduced doc-pair comparison;
    novelty_rate must lie in (0, 1]."""
    df = registry.QUERIES["j69_ngram_novelty"](spark, sf_dir)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # 0.0 is legitimate (first_seen is global across langs: a lang
    # whose grams all first appeared under another lang's doc_ids)
    bad = df.filter(
        (F.col("novelty_rate") < 0) | (F.col("novelty_rate") > 1)
    ).count()
    assert bad == 0


def test_j70_small_groups_exact_and_bands(spark, sf_dir):
    """A group whose population fits inside the sample (n_sample ==
    population) must estimate EXACTLY; sampled groups stay within a
    generous relative band (k=128 ⇒ ~9% standard error at p50)."""
    from json2hbase_spark.plans.pipeline_queries import QSK_K

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pop = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    rows = registry.QUERIES["j70_quantile_sketch"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_sample == min(pop[r.lang], QSK_K)
        if pop[r.lang] <= QSK_K:
            assert (r.est_p50, r.est_p90) == (r.exact_p50, r.exact_p90), r
        else:
            assert abs(r.est_p50 - r.exact_p50) <= 0.5 * r.exact_p50 + 5, r
            assert abs(r.est_p90 - r.exact_p90) <= 0.5 * r.exact_p90 + 5, r


def test_j71_group_split_never_leaks(spark, sf_dir):
    """Group-keyed assignment must report zero straddling groups on
    any corpus; the naive doc-keyed comparison column is >= it; split
    totals partition the corpus."""
    rows = registry.QUERIES["j71_leakage_safe_split"](spark, sf_dir).collect()
    assert rows
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert {r.split for r in rows} <= {"train", "val", "test"}
    for r in rows:
        assert r.leaky_blocks_grouped == 0
        assert r.leaky_blocks_naive >= r.leaky_blocks_grouped


def test_j71_planted_dups_travel_together(spark):
    """Two near-identical docs (same 40-char prefix) must land in the
    same split regardless of their doc_ids; with enough planted pairs
    the naive doc-keyed split must demonstrably leak at least one."""
    shared = "this shared forty character prefix padding out "  # > 40 chars
    rows = []
    for i in range(40):  # 40 dup pairs, ids far apart
        rows.append((i, shared + f"variant a {i}", "en", "s"))
        rows.append((1000 + i, shared + f"variant b {i}", "en", "s"))
    d = _docs_fixture(spark, rows)
    out = registry.QUERIES["j71_leakage_safe_split"](spark, d).collect()
    assert all(r.leaky_blocks_grouped == 0 for r in out)
    # all 40 pairs share ONE block (same prefix) -> one group; the
    # naive split leaks it unless all 80 u_doc draws agree (2/3^79..)
    assert out[0].leaky_blocks_naive >= 1


def test_j72_planted_mirror_sources_rank_first(spark):
    """Two sources with identical content must score jacc == 1.0 and
    rank first; a disjoint source pairs at 0 or below the mirror."""
    text = "alpha beta gamma delta epsilon zeta"
    d = _docs_fixture(
        spark,
        [(1, text, "en", "mirror_a"), (2, text, "en", "mirror_b"),
         (3, "totally different words entirely here now", "en", "other")],
    )
    rows = registry.QUERIES["j72_source_overlap"](spark, d).collect()
    top = rows[0]
    assert (top.src_a, top.src_b, top.jacc) == ("mirror_a", "mirror_b", 1.0)
    for r in rows:
        assert 0.0 <= r.jacc <= 1.0
        assert r.n_inter <= min(r.n_a, r.n_b)


def test_j72_pair_join_is_gram_keyed(spark, sf_dir):
    """The pair stage must be an equi join on the gram — a cartesian/
    BNLJ means source-pair enumeration went quadratic-unblocked; the
    top-K must come from TakeOrderedAndProject, not a global sort."""
    plan = _physical_plan(registry.QUERIES["j72_source_overlap"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_j71_dupless_corpus_reports_zero_not_null(spark):
    """With no multi-doc blocks at all, both leak counters must be 0
    (Spark's sum over the empty filtered set yields NULL without the
    coalesce — fixtures regenerate between rounds, so never depend on
    dups existing)."""
    d = _docs_fixture(
        spark,
        [(i, f"completely unique document number {i} with its own text", "en", "s")
         for i in range(6)],
    )
    out = registry.QUERIES["j71_leakage_safe_split"](spark, d).collect()
    assert out
    for r in out:
        assert r.leaky_blocks_grouped == 0 and r.leaky_blocks_naive == 0


def test_a24_write_verifies_and_tamper_detected(spark, sf_dir):
    """The clean write verifies every partition; a tampered read-back
    (one doc dropped, one doc's text mutated) flips exactly those
    partitions' `verified` to False."""
    from json2hbase_spark.plans import etl_queries
    from json2hbase_spark.plans.etl_queries import verify_manifest

    out = registry.QUERIES["a24_manifest_write"](spark, sf_dir).collect()
    assert out and all(r.verified for r in out)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    victim = docs.orderBy("doc_id").limit(2).collect()
    dropped, mutated = victim[0], victim[1]
    tampered = docs.filter(F.col("doc_id") != dropped.doc_id).withColumn(
        "text",
        F.when(F.col("doc_id") == mutated.doc_id, F.concat("text", F.lit("!")))
        .otherwise(F.col("text")),
    )
    rows = {r.lang: r.verified for r in verify_manifest(tampered, docs).collect()}
    bad_langs = {dropped.lang, mutated.lang}
    for lang, ok in rows.items():
        assert ok == (lang not in bad_langs), (lang, ok, bad_langs)


def test_i25_stream_digest_equals_batch(spark, sf_dir):
    """The streaming digest's final complete-mode state must equal the
    batch digest row-for-row — the additive-sum property doing real
    work: micro-batch arrival order cannot matter."""
    from json2hbase_spark.plans import streaming_queries  # noqa: F401

    batch = {
        r.source: (r.n_docs, r.n_chars, r.content_digest)
        for r in registry.QUERIES["j68_corpus_digest"](spark, sf_dir).collect()
    }
    stream = {
        r.source: (r.n_docs, r.n_chars, r.content_digest)
        for r in registry.QUERIES["i25_stream_corpus_digest"](spark, sf_dir).collect()
    }
    assert batch == stream


def test_j65_bitmap_probe_stays_broadcast(spark, sf_dir):
    """The corpus must never shuffle: the bitmap is built by an
    idempotent bit_or agg (no corpus distinct), the probe and the
    confirm are broadcast joins — a SortMergeJoin anywhere means the
    big side got exchanged."""
    plan = _physical_plan(registry.QUERIES["j65_bloom_dedup"](spark, sf_dir))
    assert "SortMergeJoin" not in plan, plan
    # the bitmap-probe join sits behind the eager materialize cut; the
    # confirm + summary joins must still both be broadcast
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "Exchange hashpartitioning(block" not in plan, plan  # no corpus distinct


def test_j131_audit_chain_tracks_planted_attrition(spark, tmp_path):
    """A planted corpus where each stage must cut exactly one known
    doc: a low-quality doc (3 tokens) dies at the quality gate, an
    exact copy dies at exact dedup, a near-copy dies at near dedup, a
    benchmark-leaking doc dies at decontamination — and the audit
    digests change at exactly those boundaries."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from json2hbase_spark import registry

    registry.load_all_query_modules()
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    stop_pad = "the a be to of and that have with it"  # stopwords + alpha
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa " + stop_pad)
    bench = "secret eval question one two three four five six seven eight nine"
    rows = [
        (0, bench, "en", "bench", 0),  # the eval suite (doc_id < 10)
        (10, base + " unique tail one", "en", "s0", 0),
        (11, "too short", "en", "s0", 0),  # dies at quality (3 < 20 words)
        (12, base + " unique tail one", "en", "s0", 0),  # exact copy of 10
        (13, base + " unique tail one extra", "en", "s0", 0),  # near-copy of 10
        (14, stop_pad + " clean totally distinct wording quince wobble eagle "
             "rocket tunnel yonder umbrella indigo ocean pepper anchor sunset "
             "dolphin forest garden harbor", "en", "s0", 0),
        (15, stop_pad + " leaked " + bench + " padded alongside wordage "
             "extra1 extra2 extra3 extra4 padding5 padding6",
         "en", "s0", 0),  # dies at decontamination
    ]
    d = str(tmp_path / "capfix")
    spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, t, l, s, _ in rows], schema
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {
        r.stage: r
        for r in registry.QUERIES["j131_corpus_pipeline"](spark, d).collect()
    }
    assert out["1_ingest_normalize"].n_docs == 6  # bench doc excluded
    assert out["2_quality_gate"].n_docs == 5  # doc 11 cut
    assert out["3_dedup_exact"].n_docs == 4  # doc 12 cut
    assert out["4_dedup_near"].n_docs == 3  # doc 13 cut
    assert out["5_decontaminated"].n_docs == 2  # doc 15 cut
    assert out["6_pack_manifest"].n_docs >= 1  # packs exist
    # digests change at every cutting boundary (the chain is an audit)
    digs = [out[s].set_digest for s in (
        "1_ingest_normalize", "2_quality_gate", "3_dedup_exact",
        "4_dedup_near", "5_decontaminated")]
    assert len(set(digs)) == 5


# ---------------------------------------------------------------- j143


def test_j143_gate_order_divergence_on_planted_cluster(spark):
    """Planted near-dup pair where the LOWER id fails the quality gate
    (zero stopwords) and the higher id passes: filter_first keeps the
    passing twin; dedup_first drops the twin as a near-dup of the kept
    low-quality representative, then drops the representative at the
    quality stage — the content vanishes. A control doc in another
    lang survives both orders with identical digests."""
    base = " ".join(
        f"alpha{i} bravo{i} charl{i} delta{i} orbit{i}" for i in range(5)
    )  # 25 alpha tokens, 0 stopwords → fails sw>=2 only
    twin = base + " the of and"  # +3 stopwords → passes the gate
    ctrl = (
        " ".join(f"zulu{i} metro{i} quart{i} vival{i} nimbu{i}" for i in range(5))
        + " the of"
    )
    rows = [
        (3, "below the bench cut " * 10, "en", "s0"),  # excluded by doc_id < 10
        (10, base, "en", "s0"),
        (11, twin, "en", "s0"),
        (12, ctrl, "fr", "s0"),
    ]
    d = _docs_fixture(spark, rows)
    out = registry.QUERIES["j143_gate_order_audit"](spark, d).collect()
    ff = {(r.stage, r.lang): r for r in out if r.ordering == "filter_first"}
    df_ = {(r.stage, r.lang): r for r in out if r.ordering == "dedup_first"}

    # filter_first/en: base fails quality, twin survives everything
    assert ff[("1_quality", "en")].n_docs == 1
    assert ff[("3_dedup_near", "en")].n_docs == 1
    n_twin = len([t for t in twin.split(" ") if t])
    n_base = len([t for t in base.split(" ") if t])
    assert ff[("1_quality", "en")].n_tokens == n_twin
    assert ff[("1_quality", "en")].tokens_dropped == n_base

    # dedup_first/en: exact keeps both, near drops the twin (higher id),
    # quality then drops the representative — no en row at stage 3
    assert df_[("1_dedup_exact", "en")].n_docs == 2
    assert df_[("2_dedup_near", "en")].n_docs == 1
    assert df_[("2_dedup_near", "en")].n_tokens == n_base
    assert ("3_quality", "en") not in df_

    # control lang: both orders end with the same single doc
    assert ff[("3_dedup_near", "fr")].n_docs == 1
    assert df_[("3_quality", "fr")].n_docs == 1
    assert (
        ff[("3_dedup_near", "fr")].set_digest == df_[("3_quality", "fr")].set_digest
    )
    # telescoping: per (ordering, lang), drops sum to tokens0 - final
    assert ff[("3_dedup_near", "fr")].tokens_dropped == 0


def test_a28_commit_log_time_travel_and_overwrite(spark, tmp_path):
    """Planted commits: every snapshot verifies against its source
    state, and snapshot 2 still serves the pre-overwrite en rows after
    commit 3 logically removed them (time travel over a logical
    delete)."""
    from json2hbase_spark import registry

    registry.load_all_query_modules()
    rows = [
        (i, f"text-{i}", "en" if i % 2 == 0 else "de", "s", 6) for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    fx = str(tmp_path / "a28fix")
    df.write.mode("overwrite").parquet(f"{fx}/documents.parquet")
    out = {(r.version, r.lang): r for r in registry.QUERIES["a28_commit_log"](spark, fx).collect()}
    assert all(r.verified for r in out.values())
    # v1 = doc_id%3==0 -> {0,3,6,9}: en {0,6}, de {3,9}
    assert out[(1, "en")].n_rows == 2 and out[(1, "de")].n_rows == 2
    # v2 adds doc_id%3==1 -> {1,4,7,10}: en {4,10}, de {1,7}
    assert out[(2, "en")].n_rows == 4 and out[(2, "de")].n_rows == 4
    # v3 overwrites en with even doc_ids of the v2 en slice -> all 4
    # v2 en ids {0,4,6,10} are even -> then filtered by doc_id%2==0 keeps all
    assert out[(3, "en")].n_rows == 4
    assert out[(3, "de")].n_rows == 4
    # digests: de untouched by the overwrite, en rewritten in place
    assert out[(2, "de")].content_digest == out[(3, "de")].content_digest
    assert out[(2, "en")].content_digest == out[(3, "en")].content_digest


def test_a28_overwrite_actually_removes(spark, tmp_path):
    """With odd en doc_ids present in v2, the v3 overwrite drops them:
    snapshot 2 keeps serving them (time travel), snapshot 3 does not."""
    from json2hbase_spark import registry

    registry.load_all_query_modules()
    # en docs at ids 1,3 (odd, %3<=1) get removed by the v3 rewrite
    rows = [
        (0, "a", "en", "s", 1),
        (1, "b", "en", "s", 1),
        (3, "c", "en", "s", 1),
        (4, "d", "en", "s", 1),
        (6, "e", "de", "s", 1),
        (7, "f", "de", "s", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    fx = str(tmp_path / "a28fix2")
    df.write.mode("overwrite").parquet(f"{fx}/documents.parquet")
    out = {(r.version, r.lang): r for r in registry.QUERIES["a28_commit_log"](spark, fx).collect()}
    assert all(r.verified for r in out.values())
    # v2 en = {0,1,3,4}; v3 en = evens only {0,4}
    assert out[(2, "en")].n_rows == 4
    assert out[(3, "en")].n_rows == 2
    assert out[(2, "en")].content_digest != out[(3, "en")].content_digest
