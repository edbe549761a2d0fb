"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full computation, no
driver collect, no disk write) — the fair way to time a distributed plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stockpy_spark.registry import QUERIES
from stockpy_spark.session import get_spark

# Representative, scale-sensitive subset: scan+filter, hash agg, shuffle
# join, window, dedup, sessionize, top-k, and (when present) the extension
# headliners.
HEADLINE = [
    "flagship_event_enrichment",
    "a1_group_agg",
    "q5_multi_join",
    "q3_top_unshipped",
    "j3_inner_join_agg",
    "j2_agg_backjoin",
    "a4_dedup_first",
    "w4_running_sum",
    "w5_sessionize",
    "o1_topk",
    "a9_cube",
    "q7_volume_shipping",
    "q18_large_orders",
    # the deepest join trees in the corpus — underrepresented before:
    # q9 two fact-fact shuffles + broadcast part/nation, q16
    # count-distinct after join (expand + two-phase agg), q20 nested
    # agg feeding a semi-join
    "q9_product_profit",
    "q16_supplier_variety",
    "q20_heavy_shippers",
    # the scale-path dedup op (linear assignment). The pair-enumeration
    # variant (dedup_minhash_lsh) stays in the oracle gate but is
    # data-dependent-quadratic, so it is not a headline timing.
    "dedup_minhash_assign",
    "sim_cosine_topk",
    # multi-probe LSH ANN (hash-equi-join candidates) — in the headline
    # set so a regression back to a nested-loop probe shows in timings
    "sim_ann_lsh",
    "text_quality_score",
    "asof_purchase_view",
    # round-5 family: bucketed range join (interval explode + hash
    # equi-join) and the 6h continuous aggregate
    "rj2_event_windows",
    "ts_bucket_rollup",
    # the composed corpus-cleaning pipeline (quality gate -> exact dedup
    # -> minhash near-dup removal) — the end-to-end training-data path
    "pipeline_clean_corpus",
    # transitive dedup via LSH star edges + connected components — the
    # iterative-algorithm scale path (BASELINE.md §4 star-edge finding)
    "pipeline_dedup_cc",
    # round-6 family: incremental ingestion dedup (batch screened
    # against a standing corpus — bounded bucket joins only) and the
    # chunk explode (high-fan-out narrow op over every document)
    "dedup_incremental",
    "chunk_documents",
    # round-6 second wave: deterministic k-means (broadcast codebook +
    # one-scan assignment passes), BM25 retrieval (token explode + tf/df
    # aggregates), and per-group exact-percentile cleaning — three more
    # distinct plan shapes under the timing gate
    "emb_kmeans_assign",
    "text_bm25_topk",
    "quality_robust_clip",
    # LM-pipeline flagships: corpus-trained bigram perplexity scoring
    # (train + score in one pass, bigram-keyed shuffle join) and 5-gram
    # eval decontamination (distinct shingle equi-join)
    "text_lm_perplexity",
    "decontaminate_eval",
    # round-6 third wave: corpus-state boilerplate removal (explode ->
    # corpus doc-frequency -> semi-join -> in-order reassembly), the
    # distributed 2-D skyline (bucketed prefix-min, no global sort),
    # and the rolling z-score anomaly window (decomposable partials).
    # er_fuzzy_match is deliberately NOT a headline: the synthetic part
    # names share a ~90-word prefix vocabulary, so block sizes grow
    # linearly with SF and candidate pairs quadratically — an honest
    # property of blocked ER on low-entropy keys, recorded in
    # BASELINE.md §4 instead of timed here.
    "corpus_line_dedup",
    "pareto_frontier",
    "ts_anomaly_zscore",
    # round-6 fourth wave: drift screens (PSI census+groupBy; KS over
    # the bucketed distributed ECDF), the one-scan correlation matrix,
    # and CUSUM via the Lindley closed form (one key-shuffle of
    # windows). setsim_jaccard_join is deliberately NOT a headline:
    # the synthetic corpus's tiny vocabulary makes candidate volume
    # quasi-quadratic (23 s at sf0.1) — an honest property of prefix
    # filtering on low-entropy token sets, recorded in BASELINE.md §4.
    "drift_psi_value",
    "drift_ks_value",
    "stats_corr_matrix",
    "ts_cusum_alarm",
    # fifth wave: Welch t-test (two moment aggs + 1-row cross) and the
    # melt-once entropy profile
    "stats_welch_ttest",
    "profile_entropy",
    # round 7: the re-shaped sweep-line concurrency (bucketed prefix
    # aggregate), the capped basket miner (top-m Apriori working set,
    # no item-frame broadcast), cluster-blocked semantic dedup (Arrow
    # cosine kernels; k-means blocks bound the pair quadratic), and the
    # multi-frame codec path (pure-Python LZW + compositing per frame —
    # the Arrow-batched per-row-CPU plan shape, absent from the
    # headline until now)
    "ev_concurrency",
    "basket_rules",
    "semdedup_prune",
    "mm_gif_frames",
    # round 10: the Lee-et-al substring-duplication meter — gram-start
    # explode (shingle-volume), corpus gram count (map-side combined),
    # semi-join, one per-doc window union. The most shuffle-intensive
    # new family of r9/r10; in the headline for the drift-immune
    # shuffle-byte row.
    "text_dup_spans",
    # round 10 second wave: DSIR importance weights — bigram explode
    # feeding both distribution estimates through one conditional
    # aggregate, broadcast log-ratio table, doc-keyed weight sum
    # (5.3x/100x, BASELINE.md §4) — and the Gopher repetition battery,
    # the heaviest pure array-HOF per-doc CPU plan in the corpus
    # (~8 ms/doc; the query repartitions small single-split inputs so
    # the narrow map actually parallelizes — BASELINE.md §4).
    "sample_dsir_weights",
    "text_gopher_repetition",
    # round 11: the joint-census Spearman — the round's headline
    # re-plan (one map-side-combined groupBy collapses the fact to
    # value combinations; ranks, bucketed prefix-sums, and weighted
    # moments all combo-scale; 1.8x/100x vs 9.6x for the join-back
    # plan, BASELINE.md §4) — in the headline so the shuffle-byte row
    # tracks the census plan from now on.
    "stats_spearman",
    # r14 SERIES BREAK (r13 judge item #8): the 49-query headline
    # predates the r13 capstone era. Two additions so bench tracks
    # what the repo now is: the 14-stage release pipeline (the
    # composed end-to-end curation DAG) and the second kerneled
    # perplexity scorer (lm was already a member). Totals from r14 on
    # are a 51-query series — BASELINE.md records the break and the
    # same-run old-series subtotal for continuity.
    "pipeline_data_release",
    "text_kn_perplexity",
]


def calibrate(spark) -> float:
    """Fixed synthetic CPU+shuffle micro-workload, timed: 120M-row
    range with per-row arithmetic, a 100k-key hash aggregate (one
    shuffle), and a top-k. Independent of SF and of the engine's own
    operators, so its wall-clock measures the HOST (cpu + memory +
    JVM), not the code under test. Cross-round bench comparisons
    divide by this to normalize out host drift — the r05->r06 1.38x
    wall-clock scare was pure host drift and cost a page of
    BASELINE.md to argue; this constant settles it numerically.
    MEDIAN of 3, not best-of-2: a min over samples tracks the host's
    best moment, the median its typical one, which is what the
    queries actually experience. REWORKED in r11 (judge item #6):
    three same-code r10 runs read calibration 1.657/1.977/2.014 — a
    ±11% spread on identical plans, because a ~2 s pure-arithmetic
    workload samples scheduler jitter and memory-bandwidth contention
    as much as host speed. Now 120M rows of JVM-side md5 (per-row
    CPU-bound, the steadiest thing a host can be measured by) plus
    the same 100k-key aggregate and top-k, ~10 s per sample.
    Normalized totals are therefore a NEW series from r11 (divide by
    a ~5x larger constant); the r11<->r10 conversion ratio and the
    restated noise band live in BASELINE.md §5.

    r13 (judge item #4): the FIRST sample is a cold-JIT outlier —
    measured structure on a quiet host: 10.67, then 6.93/6.69/6.29/
    6.25/6.47/6.42/6.60 — the md5 codegen path JITs during sample 1
    and never again. One discarded warmup sample before the median
    of 3 removes that structural bias; the steady-state constant
    (~6.3-6.9 quiet) is what the driver's 6.835 actually was — the
    r12 "calibration spread postmortem" conclusion is that the 8-11
    solo readings were builder-side host load, not driver anomaly."""
    from pyspark.sql import functions as F

    samples = []
    for i in range(4):
        t0 = time.time()
        (
            spark.range(120_000_000)
            .select(
                (F.col("id") % 100_000).alias("k"),
                F.md5(F.col("id").cast("string")).alias("h"),
            )
            .groupBy("k")
            .agg(F.count("*").alias("n"), F.max("h").alias("m"))
            .orderBy(F.col("n").desc())
            .limit(10)
            .write.format("noop").mode("overwrite").save()
        )
        if i > 0:  # sample 0 is the cold-JIT warmup, discarded
            samples.append(time.time() - t0)
    return round(sorted(samples)[1], 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # the shuffle ledger sums stage metrics from the AppStatusStore,
    # which EVICTS stages past spark.ui.retainedStages (default 1000).
    # The r14 51-query headline crosses that limit (the 14-stage
    # release pipeline alone adds dozens of stages x 2 runs), at which
    # point the cumulative counters go BACKWARDS and per-query deltas
    # turn negative. Retain enough stages for the whole run.
    spark = get_spark(
        "stockpy_spark_bench",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    names = [n for n in HEADLINE if n in QUERIES]

    # warm the JVM/catalyst once (not timed): a lineitem action plus the
    # events first-touch (which resolves the nanos-timestamp fallback)
    QUERIES["a2_count_star"](spark, sf_dir).collect()
    from stockpy_spark.sources.testdata import read_events

    read_events(spark, sf_dir).count()

    # host-speed constant (after warmup, before the timed queries)
    calibration = calibrate(spark)

    def shuffle_totals() -> tuple[int, int]:
        """Cumulative (shuffle_write_bytes, spilled_bytes) across all
        stages so far, from the in-process AppStatusStore (the store
        behind the UI/REST API — works with the UI disabled). Per-query
        DELTAS of these are the drift-immune plan metric wall-clock is
        not: shuffle volume is a property of the PLAN, identical across
        reruns and hosts, so a cross-round diff flags a lost broadcast
        or lost partial aggregate directly, with no calibration
        division. Scala default args are fetched explicitly (py4j has
        no default-arg support).

        r16 measurement fix (declared in OPTIMIZATION_r16.md): the
        AppStatusStore is fed ASYNCHRONOUSLY by the listener bus, so a
        query's final stage metrics can post after the next bracketing
        read — measured at r16 start as pipeline_dedup_cc's ledger
        entry reading 1.21-1.22 MB in the full bench (late posts from
        its own first, untimed run landing in the timed run's window)
        vs a byte-identical 1.192 MB x4 in isolation, flagged by
        ledger_diff as drift on an untouched query. Draining the bus
        before each read makes the per-query attribution exact; plan
        bytes themselves are unchanged."""
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
        store = spark.sparkContext._jsc.sc().statusStore()
        empty = spark.sparkContext._jvm.java.util.ArrayList()
        stages = store.stageList(
            empty,
            *[getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
        )
        write = spill = 0
        for i in range(stages.size()):
            sd = stages.apply(i)
            write += sd.shuffleWriteBytes()
            spill += sd.memoryBytesSpilled() + sd.diskBytesSpilled()
        return write, spill

    # best-of-2 per query: the first execution pays one-off plan
    # compilation and scheduler warmup that a long-running cluster
    # amortizes away; the min is the steady-state per-query cost. Each
    # run is still end-to-end (fresh plan, full computation, noop sink).
    # Shuffle/spill deltas are taken over the LAST run only — the plan
    # is the same both runs, so the bytes are too.
    timings: dict[str, float] = {}
    shuffle_mb: dict[str, float] = {}
    spill_mb: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            w0, s0 = shuffle_totals()
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            w1, s1 = shuffle_totals()
        timings[name] = round(best, 3)
        shuffle_mb[name] = round((w1 - w0) / 1e6, 2)
        spill_mb[name] = round((s1 - s0) / 1e6, 2)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    # The OFFICIAL drift-immune signal (r13 judge item #5): persist the
    # FULL per-query shuffle/spill ledger to the repo, because the
    # driver's BENCH_r{N}.json keeps only a 2000-char line tail (the
    # r13 ledger arrived front-truncated) while wall-clock readings
    # span +-30% under host load. The committed ledger survives intact
    # round over round; tools/ledger_diff.py compares two of them and
    # fails on any byte change for a query whose code did not change.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_LEDGER.json"), "w"
    ) as fh:
        json.dump(
            {
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "shuffle_write_mb": dict(sorted(shuffle_mb.items())),
                "spill_mb": dict(sorted(spill_mb.items())),
            },
            fh,
            indent=1,
            sort_keys=True,
        )
        fh.write("\n")
    # Per-query plan-byte DETAIL goes on its own EARLIER line, nonzero
    # entries only: the r9 artifact lost its headline numbers because
    # the single JSON line (45 queries x 2 mostly-zero maps) outgrew the
    # driver's 2000-char tail capture, which then kept the END of the
    # line and truncated away value/queries/calibration_sec. The final
    # line below is the compact contract object and must stay last.
    print(
        json.dumps(
            {
                "detail": "per_query_plan_bytes",
                "shuffle_write_mb": {k: v for k, v in shuffle_mb.items() if v},
                "spill_mb": {k: v for k, v in spill_mb.items() if v},
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # host-speed micro-workload (see calibrate()): divide
                # `value` by `calibration_sec` across rounds to compare
                # plans net of host drift; `normalized_total` is that
                # ratio precomputed (dimensionless, higher = slower
                # relative to what this host can do)
                "calibration_sec": calibration,
                "normalized_total": round(total / calibration, 2),
                # drift-immune plan totals (see shuffle_totals):
                # cross-round deltas here mean the PLAN changed, not
                # the host; per-query detail is on the previous line
                "total_shuffle_write_mb": round(sum(shuffle_mb.values()), 1),
                "total_spill_mb": round(sum(spill_mb.values()), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
