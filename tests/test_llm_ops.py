"""LLM-operator tests: MinHash accuracy vs exact Jaccard, cosine
anchors, LSH recall on planted near-dups, multimodal plumbing
(FIXTURES.md §3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from json2hbase_spark.operators.dedup import (
    char_shingles,
    jaccard,
    minhash_signature,
    near_dup_pairs,
    normalize_text,
    simhash64,
)
from json2hbase_spark.operators.similarity import (
    ann_topk_lsh,
    cosine,
    cosine_topk,
    l2_norm,
    l2_normalize,
)


def test_minhash_estimates_jaccard(spark):
    """Signature agreement rate estimates Jaccard within ±0.15 at 64
    hashes for anchor pairs at J ≈ {0, ~0.5, 1}."""
    base = "abcdefghij" * 6
    half = base[:30] + "XYZ" + base[33:]  # most shingles shared
    disjoint = "0123456789" * 6
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, half), (4, disjoint)], "id INT, t STRING"
    )
    sh = df.select("id", char_shingles(F.col("t"), 8).alias("sh"))
    sig = sh.withColumn("sig", minhash_signature(F.col("sh"), 64))
    rows = {r.id: (set(r.sh), r.sig) for r in sig.collect()}

    def est(a, b):
        return sum(x == y for x, y in zip(rows[a][1], rows[b][1])) / 64

    def exact(a, b):
        sa, sb = rows[a][0], rows[b][0]
        return len(sa & sb) / len(sa | sb)

    for a, b in [(1, 2), (1, 3), (1, 4)]:
        assert abs(est(a, b) - exact(a, b)) <= 0.15, (a, b, est(a, b), exact(a, b))
    assert est(1, 2) == 1.0 and exact(1, 4) == 0.0


def test_near_dup_pairs_finds_planted_dups(spark):
    docs = [(1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and AGAIN"),
            (3, "completely different text with nothing shared at all here!!")]
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    pairs = near_dup_pairs(df, "doc_id", "text", threshold=0.5).collect()
    assert [(p.doc_a, p.doc_b) for p in pairs] == [(1, 2)]
    assert pairs[0].jaccard > 0.8


def test_cosine_anchors(spark):
    import math

    e1 = [1.0] + [0.0] * 63
    e2 = [0.0, 1.0] + [0.0] * 62
    mix = [1 / math.sqrt(2), 1 / math.sqrt(2)] + [0.0] * 62
    neg = [-1.0] + [0.0] * 63
    df = spark.createDataFrame(
        [(1, e1, e2), (2, e1, mix), (3, e1, neg), (4, e1, e1)],
        "id INT, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
    )
    out = {r.id: r.c for r in df.select("id", cosine(F.col("a"), F.col("b")).alias("c")).collect()}
    assert out[1] == 0.0
    assert abs(out[2] - 1 / math.sqrt(2)) < 1e-12
    assert out[3] == -1.0 and out[4] == 1.0


def test_l2_normalize_unit_norm(spark, sf_dir):
    from json2hbase_spark.io import load

    emb = load(spark, sf_dir, "embeddings").limit(50)
    normed = emb.select(l2_norm(l2_normalize(F.col("embedding"))).alias("n"))
    for r in normed.collect():
        assert abs(r.n - 1.0) < 1e-9


def test_ann_lsh_subset_of_exact_topk(spark, sf_dir):
    """LSH ANN results must be true cosine scores; for each query the
    approximate neighbors are a subset of the exact top-50."""
    import random

    from json2hbase_spark.io import load

    rng = random.Random(7)
    planes = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(4)]
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    exact = {
        (r.qid, r.cid): r.sim for r in cosine_topk(q, c, 50).collect()
    }
    approx = ann_topk_lsh(q, c, 5, planes).collect()
    assert len(approx) > 0
    for r in approx:
        if (r.qid, r.cid) in exact:
            assert abs(exact[(r.qid, r.cid)] - r.sim) < 1e-12


def test_simhash_similar_docs_close(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c", "d", "e"]), (2, ["a", "b", "c", "d", "f"]), (3, ["x", "y", "z", "w", "v"])],
        "id INT, toks ARRAY<STRING>",
    )
    out = {r.id: r.h for r in df.select("id", simhash64(F.col("toks")).alias("h")).collect()}

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(out[1], out[2]) < hamming(out[1], out[3])


def test_multimodal_metadata_and_stub(spark):
    import pytest

    from json2hbase_spark.operators import multimodal

    df = spark.createDataFrame([(1, bytearray(b"hello world")), (2, bytearray(b""))],
                               "doc_id LONG, data BINARY")
    meta = {r.doc_id: r for r in multimodal.extract_metadata(df).collect()}
    assert meta[1].n_bytes == 11 and meta[1].header_hex == b"hello wo".hex().upper()
    assert meta[2].n_bytes == 0 and meta[2].header_hex == ""
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_jaccard_empty_sets(spark):
    df = spark.createDataFrame([(1,)], "id INT").select(
        jaccard(
            F.expr("CAST(array() AS array<string>)"), F.expr("CAST(array() AS array<string>)")
        ).alias("j"),
        jaccard(F.array(F.lit("x")), F.expr("CAST(array() AS array<string>)")).alias("j2"),
    )
    row = df.first()
    assert row.j == 0.0 and row.j2 == 0.0


def test_normalize_text(spark):
    df = spark.createDataFrame([("  Hello   WORLD\t\nfoo  ",)], "t STRING")
    assert df.select(normalize_text(F.col("t")).alias("n")).first().n == "hello world foo"


def test_simhash_agg_matches_expression_form(spark):
    from json2hbase_spark.operators.dedup import simhash_agg

    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["a", "b", "c"]), (3, ["q", "r", "s", "t"])],
        "id INT, toks ARRAY<STRING>",
    )
    agg = {r.id: r.sh for r in simhash_agg(df, "id", "toks").collect()}
    expr = {
        r.id: r.sh
        for r in df.select("id", simhash64(F.col("toks")).alias("sh")).collect()
    }
    assert agg == expr
    assert agg[1] == agg[2]  # identical token sets -> identical simhash


def test_simhash_near_pairs_finds_planted_dup(spark):
    from json2hbase_spark.operators.dedup import simhash_near_pairs

    # NOTE: a single-token edit on a SHORT doc flips ~7/64 bits (vote
    # margins scale with sqrt(doc length)), so banding at Hamming<=3 is
    # only guaranteed for true near-identical docs — test exactly that.
    base = [f"tok{i}" for i in range(40)]
    rows = [
        (1, base),
        (2, list(base)),  # exact token-multiset duplicate -> Hamming 0
        (3, [f"other{i}" for i in range(40)]),
    ]
    df = spark.createDataFrame(rows, "id INT, toks ARRAY<STRING>")
    got = {(r.doc_a, r.doc_b): r.hamming for r in simhash_near_pairs(df, "id", "toks").collect()}
    assert got == {(1, 2): 0}


def test_ivf_centroids_and_ann(spark):
    from json2hbase_spark.operators.similarity import ann_topk_ivf, ivf_centroids

    rows = [
        (0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0), (2, [0.95, 0.05], 0),
        (3, [0.0, 1.0], 1), (4, [0.1, 0.9], 1), (5, [0.05, 0.95], 1),
    ]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    cents = {r.label: r.centroid for r in ivf_centroids(emb).collect()}
    assert len(cents) == 2 and len(cents[0]) == 2
    assert cents[0][0] > cents[0][1]  # label-0 centroid points along x

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    got = ann_topk_ivf(q, emb, k=2, nprobe=1).collect()
    # query 0 lands in list 0 and must only see its own list's members
    assert {r.cid for r in got} == {1, 2}


def test_ann_lsh_same_bucket_only(spark):
    from json2hbase_spark.operators.similarity import ann_topk_lsh

    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.2]), (2, [-1.0, 0.1])]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    planes = [[1.0, 0.0]]  # one plane splitting on the sign of x
    got = ann_topk_lsh(q, c, k=5, planes=planes).collect()
    assert {r.cid for r in got} == {1}  # vec 2 is in the other half-space


def test_bpe_ish_tokens(spark):
    from json2hbase_spark.operators.text import bpe_ish_tokens

    df = spark.createDataFrame([("Ab2c, d-e 42",)], "t STRING")
    toks = df.select(bpe_ish_tokens(F.col("t")).alias("tk")).first().tk
    assert toks == ["ab", "2", "c", ",", "d", "-", "e", "42"]


def test_j31_uniform_tokens_score_is_log_inv_vocab(spark):
    """With every token equally frequent, avg log p = ln(1/V) exactly."""
    import math

    from json2hbase_spark.plans import llm_queries  # noqa: F401 (registers)
    from json2hbase_spark.registry import QUERIES

    # 4 docs x 3 distinct tokens, each token appears 4 times -> p = 1/3
    rows = [(i, "en", "aa bb cc") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING, text STRING")
    import tempfile

    d = tempfile.mkdtemp(prefix="j31_fixture_")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = QUERIES["j31_unigram_logprob"](spark, d).collect()
    assert len(out) == 4
    for r in out:
        assert r.n_toks == 3
        assert abs(r.lm_score - round(math.log(1 / 3), 4)) < 1e-9


def test_j32_repetition_bounds(spark, sf_dir):
    """rep_ratio in [0,1); a fully repeated doc scores high, distinct
    trigram docs score 0; n_uniq <= n_tri always."""
    from json2hbase_spark.registry import QUERIES
    from json2hbase_spark.plans import llm_queries  # noqa: F401

    out = QUERIES["j32_repetition"](spark, sf_dir)
    bad = out.filter(
        (F.col("rep_ratio") < 0)
        | (F.col("rep_ratio") >= 1)
        | (F.col("n_uniq") > F.col("n_tri"))
    )
    assert bad.count() == 0
    assert out.count() > 0


def test_h12_bitmap_matches_count_distinct(spark):
    """Bitmap popcount-sum equals count(distinct) on random ids."""
    import random

    rnd = random.Random(7)
    rows = [(rnd.randint(0, 3), rnd.randint(1, 500)) for _ in range(3000)]
    df = spark.createDataFrame(rows, "g INT, uid LONG")
    per = (
        df.select(
            "g",
            F.bitmap_bucket_number("uid").alias("bkt"),
            F.bitmap_bit_position("uid").alias("pos"),
        )
        .groupBy("g", "bkt")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )
    got = {
        r.g: r.n
        for r in per.groupBy("g").agg(F.sum(F.bitmap_count("bm")).alias("n")).collect()
    }
    want = {
        r.g: r.n
        for r in df.groupBy("g").agg(F.countDistinct("uid").alias("n")).collect()
    }
    assert got == want


def test_minhash_wide_signature_families_are_fresh(spark):
    """num_hashes > 64 must derive per-block base hashes: signature
    slots 64..127 are NOT copies of 0..63 (rotations of one base pair
    only span 64 independent mixes)."""
    from json2hbase_spark.operators.dedup import minhash_from_stream

    rows = [(1, f"s{i:03d}") for i in range(200)]
    stream = spark.createDataFrame(rows, "id INT, _s STRING")
    sig = minhash_from_stream(stream, "id", "_s", num_hashes=128).collect()[0].sig
    assert len(sig) == 128
    assert sig[64:] != sig[:64]
    # lower half identical to a plain 64-hash signature (block-0 bases
    # are the unseeded pair — narrow signatures unchanged)
    sig64 = minhash_from_stream(stream, "id", "_s", num_hashes=64).collect()[0].sig
    assert sig[:64] == sig64


def test_j124_manifest_reconciles_with_j27_and_hashes_fill_order(spark, sf_dir):
    """The manifest's per-pack tallies equal j27's packing exactly;
    end offsets telescope to the per-language token totals; docs_md5
    equals a python recompute of the fill-order member list."""
    import hashlib

    from json2hbase_spark import registry
    from json2hbase_spark.io import load
    from json2hbase_spark.operators.text import whitespace_tokens
    from json2hbase_spark.plans.llm_queries import PACK_BUDGET

    registry.load_all_query_modules()
    man = {
        (r.lang, r.pack_id): r
        for r in registry.QUERIES["j124_pack_manifest"](spark, sf_dir).collect()
    }
    j27 = {
        (r.lang, r.pack_id): r
        for r in registry.QUERIES["j27_pack_sequences"](spark, sf_dir).collect()
    }
    assert set(man) == set(j27)
    for k, r in man.items():
        assert (r.n_docs, r.pack_tokens) == (j27[k].n_docs, j27[k].pack_tokens)
    toks = (
        load(spark, sf_dir, "documents")
        .select("lang", "doc_id", F.size(whitespace_tokens(F.col("text"))).alias("t"))
        .collect()
    )
    bylang: dict[str, list] = {}
    for r in toks:
        bylang.setdefault(r.lang, []).append((r.t, r.doc_id))
    for lang, lst in bylang.items():
        lst.sort(key=lambda x: (-x[0], x[1]))
        running, members = 0, {}
        for t, did in lst:
            running += t
            pack = -(-running // PACK_BUDGET)
            members.setdefault(pack, []).append(did)
        total = running
        assert max(r.end_offset for k, r in man.items() if k[0] == lang) == total
        for pack, ids in members.items():
            want = hashlib.md5(",".join(str(i) for i in ids).encode()).hexdigest()
            assert man[(lang, pack)].docs_md5 == want, (lang, pack)
