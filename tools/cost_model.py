"""Shuffle cost model — turns "would this survive 100 TB" from prose
into arithmetic (VERDICT r6 #9).

    python tools/cost_model.py [--sf /root/testdata/sf0.1]

For one exemplar query per operator family, runs the query at sf0.1
with the noop sink and reads the REAL executed-plan metrics from the
SQL status store: bytes scanned ("size of files read"), shuffle
records/bytes written, spill. The 100 TB projection is the measured
shuffle:input byte ratio times 100 TB for linear-shuffle families;
families whose shuffle payload is bounded (groups, vocabulary, sketch
words, bucket totals) are projected as their bound, because their
absolute shuffle volume stops tracking corpus size. The per-record
payload width is reported so "id-only shuffle" claims are checkable
numbers, not adjectives.

plan_audit.py embeds this section into PLANS.md when --costs is given.
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from json2hbase_spark import registry  # noqa: E402
from json2hbase_spark.materialize import cleanup_materialized  # noqa: E402
from json2hbase_spark.session import get_spark  # noqa: E402

registry.load_all_query_modules()

# (query, family, scaling class, why)
# class "bounded": shuffle payload bounded by groups/vocab/sketch/
#   buckets — absolute volume stops tracking corpus size.
# class "linear": shuffle ∝ input, but the payload is narrow metadata
#   (ids, hashes, counts) — the ratio column IS the 100 TB multiplier.
# class "corpus": the semantics is a full-corpus shuffle (global
#   reshuffle) — ratio ≈ 1 is the point, not a defect.
EXEMPLARS = [
    ("d1_agg_hash", "hash aggregation (d*)", "bounded",
     "map-side combine ships one row per group per task"),
    ("c1_join_broadcast", "broadcast dim join (c1/c8/c16)", "bounded",
     "dim broadcasts; the fact side never exchanges"),
    ("j51_dataset_diff", "big-big sort-merge join (c2/b5/j51)", "linear",
     "full-outer snapshot diff: both sides shuffle once, 16-byte keys"),
    ("j1_dedup_exact", "exact dedup (j1/j48/m7)", "linear",
     "content hashes + ids shuffle, never text/blobs"),
    ("j2_dedup_near", "MinHash-LSH near-dup (j2/j9/j15)", "linear",
     "band keys + ids shuffle; banding caps candidate pairs"),
    ("j43_semdedup", "embedding dedup, cell-blocked (j16/j43)", "linear",
     "cell-keyed pair join; pair budget linear via the k dial"),
    ("j62_global_shuffle", "global reshuffle (j62/j71)", "corpus",
     "a content-addressed permutation of the corpus IS the output"),
    ("j64_dsir_importance", "explode → bounded agg (j63/j64/j80)", "linear",
     "per-(doc,bucket) counts shuffle: ≤64 rows per doc, never tokens"),
    ("j82_feature_hash_embed", "feature hashing (j82)", "linear",
     "FH_DIM conditional sums per doc cross the wire, not tokens"),
    ("j89_hapax_docs", "vocab equi re-join (j7/j30/j89)", "linear",
     "token occurrences shuffle on the term key; width = term + id"),
    ("j83_pps_sample", "bucketed prefix sum (j83)", "linear",
     "two-pass cumsum: narrow (id, weight, bucket) metadata only"),
    ("m8_shard_plan", "shard packing (m8/j27)", "linear",
     "byte-count metadata cumsum; blob bytes never enter the plan"),
    ("j66_cms_heavy_hitters", "mergeable sketches (j65-j70)", "bounded",
     "sketch partials (d×w words / bitmap words) are the payload"),
    ("i22_hypertable_rollup", "time rollup (i22/i23)", "bounded",
     "hour level consumes minute partials; payload = time buckets"),
    ("f3_topk_global", "global top-k (f3/j3/j60)", "bounded",
     "TakeOrdered ships k rows per partition, then k total"),
    ("j94_source_budget_select", "grouped bucketed prefix sum (j91/j94)", "linear",
     "narrow (id, tokens, source, bucket) metadata; offsets broadcast"),
    ("j97_embed_covariance", "pair-explode covariance (j97)", "bounded",
     "≤ d(d+1)/2 partial rows per partition regardless of corpus size"),
    ("j99_winnow_fingerprint", "winnowing fingerprints (j99/j103)", "linear",
     "only the DISTINCT fingerprint table (~2/(W+1) of grams) shuffles"),
    ("j105_curriculum_order", "compound-bucket global rank (j105/j62)", "linear",
     "one hash exchange of (id, band, 16-byte key); offsets broadcast"),
    ("j108_winnow_clusters", "converged label propagation (j108/j20)", "linear",
     "pair-set edges + label tables shuffle per round — pairs ∝ duplication density × corpus (FP_MAX_DF-capped), never corpus²"),
    ("j111_contamination_span", "benchmark-flagged islands (j111/j23)", "linear",
     "benchmark grams broadcast; only FLAGGED positions shuffle into the island window"),
]

_UNIT = {"B": 1, "KiB": 2**10, "MiB": 2**20, "GiB": 2**30, "TiB": 2**40}


def _parse_metric(s: str) -> float:
    """SQLMetrics stringValue → number. Handles '60,000', '1002.0 B',
    'total (min, med, max ...)\\n96.0 MiB (...)' (first line total)."""
    first = s.strip().splitlines()[0]
    m = re.match(r"([\d,.]+)\s*(B|KiB|MiB|GiB|TiB)?", first.replace("total", "").strip())
    if not m:
        return 0.0
    num = float(m.group(1).replace(",", ""))
    return num * _UNIT.get(m.group(2) or "", 1)


def _fmt_bytes(b: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB", "PiB"):
        if b < 1024 or unit == "PiB":
            return f"{b:.1f} {unit}" if unit != "B" else f"{b:.0f} B"
        b /= 1024
    return f"{b:.1f} PiB"


WANTED = ("shuffle records written", "shuffle bytes written",
          "size of files read", "spill size")


def measure(spark, name: str, sf: str) -> dict[str, float]:
    """Run `name` with the noop sink; sum the WANTED metrics over every
    SQL execution the query triggered (materialize() included), each
    accumulator counted once. Also records the final plan's join
    strategy mix (BHJ/SMJ counts) so strategy drift in an exemplar is
    a quantified diff next regeneration, not just a fingerprint
    mismatch (VERDICT r7 #8)."""
    store = spark._jsparkSession.sharedState().statusStore()
    before = store.executionsList().size()
    df = registry.QUERIES[name](spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    df.write.format("noop").mode("overwrite").save()
    cleanup_materialized()
    execs = store.executionsList()
    agg = dict.fromkeys(WANTED, 0.0)
    seen: set[int] = set()
    for e in range(before, execs.size()):
        ex = execs.apply(e)
        vals = store.executionMetrics(ex.executionId())
        ms = ex.metrics()
        for i in range(ms.size()):
            m = ms.apply(i)
            nm, aid = m.name(), m.accumulatorId()
            if nm not in agg or aid in seen or not vals.contains(aid):
                continue
            seen.add(aid)
            agg[nm] += _parse_metric(vals.apply(aid))
    agg["bhj"] = float(plan.count("BroadcastHashJoin"))
    agg["smj"] = float(plan.count("SortMergeJoin"))
    return agg


TARGET = 100e12  # the design point: 100 TB of input


def section(spark, sf: str) -> list[str]:
    rows = []
    spills = []
    for name, family, klass, why in EXEMPLARS:
        m = measure(spark, name, sf)
        inp = m["size of files read"]
        sb, srec = m["shuffle bytes written"], m["shuffle records written"]
        if m["spill size"] > 0:
            spills.append((name, m["spill size"]))
        ratio = sb / inp if inp else 0.0
        width = sb / srec if srec else 0.0
        if klass == "bounded":
            proj = f"≈{_fmt_bytes(sb)} (bounded)"
        elif klass == "corpus":
            proj = "≈100 TB (semantics)"
        else:
            proj = _fmt_bytes(ratio * TARGET)
        joins = f"{int(m['bhj'])}/{int(m['smj'])}"
        rows.append(
            f"| {name} | {family} | {_fmt_bytes(inp)} | {int(srec):,} | "
            f"{_fmt_bytes(sb)} | {width:.0f} B | {ratio:.2f} | {joins} | {proj} | {why} |"
        )
    out = [
        "## Shuffle cost model (measured at sf0.1, projected to 100 TB)",
        "",
        "Real executed-plan metrics (SQL status store), one exemplar per",
        "operator family: input bytes scanned, shuffle records/bytes",
        "written, per-record payload width, and the shuffle:input byte",
        "ratio. The 100 TB column is ratio × 100 TB for linear-shuffle",
        "families; families whose payload is BOUNDED (groups, vocabulary,",
        "sketch words, bucket totals, top-k) are projected as their",
        "measured bound — their shuffle volume stops tracking corpus",
        "size, which is the design. Both sides are as Spark reports",
        "them: parquet-compressed input vs shuffle-compressed writes,",
        "so a ratio slightly over 1 (j1: hex hashes of compressed",
        "text) is honest, not quadratic. Rule of thumb for a 1000-executor",
        "cluster at 128 MiB shuffle partitions: a projected volume of",
        "X TiB needs X·8192 partitions — anything in the GiB range is a",
        "non-event, and only the declared corpus-shuffle ops reach the",
        "same order as the input.",
        "",
        "The BHJ/SMJ column is the exemplar's join-strategy mix in the",
        "executed plan (broadcast vs sort-merge counts) — a broadcast",
        "flipping to sort-merge between regenerations shows up here as a",
        "quantified diff, alongside the fingerprint CI gate.",
        "",
        "| exemplar | family | input read | shuf rows | shuf bytes | B/row | shuf:input | BHJ/SMJ | @100 TB | why the payload is what it is |",
        "| --- | --- | --- | --- | --- | --- | --- | --- | --- | --- |",
        *rows,
        "",
    ]
    if spills:
        out += ["**Spill observed (investigate):** " +
                ", ".join(f"{n} {_fmt_bytes(s)}" for n, s in spills), ""]
    else:
        out += ["No spill in any exemplar at sf0.1.", ""]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = get_spark("cost_model")
    spark.sparkContext.setLogLevel("ERROR")
    print("\n".join(section(spark, args.sf)))


if __name__ == "__main__":
    main()
