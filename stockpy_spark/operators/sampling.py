"""Deterministic sampling, splitting, and sequence packing for
training-data pipelines.

Random sampling (``df.sample``/``sampleBy``) is seed- and
partitioning-dependent: rerunning after a repartition yields a different
corpus, and no other engine can reproduce the choice. At training-data
scale the standard practice is HASH sampling — a pure function of a
stable row id — which is reproducible across reruns, engines, and
cluster layouts, and trivially auditable (the row's fate is decidable
from the row alone). All operators here derive a bucket in [0, 10000)
from md5(id) (same derivation as the minhash lanes in
``operators.dedup``, so the DuckDB oracle replicates it bit-for-bit)
and never shuffle: sampling and splitting are narrow maps; packing
shuffles once on the shard key.

Reference has no sampling surface (SURVEY.md §2.6 O2 is a bare
``limit``); these are extension operators from the 100 TB north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from stockpy_spark.operators.pinning import pin, pin_literal

_BUCKETS = 10_000


def _hash_bucket(id_col: Column, salt: str) -> Column:
    """Deterministic bucket in [0, 10000): md5 of the salted id, first
    15 hex chars as a BIGINT (60 bits — fits int64 in any engine)."""
    h = F.md5(F.concat(F.lit(salt + "|"), id_col.cast("string")))
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % F.lit(_BUCKETS)
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows: bucket(id) <
    fraction * 10000. Narrow (no shuffle), reproducible across reruns
    and engines, stable under repartitioning — unlike ``df.sample``."""
    return df.filter(
        _hash_bucket(F.col(id_col), salt) < F.lit(int(round(fraction * _BUCKETS)))
    )


def train_test_split(
    df: DataFrame, id_col: str, test_fraction: float, salt: str = "split"
) -> DataFrame:
    """Add a deterministic ``split`` column ('test' for ~test_fraction
    of rows, else 'train'). A row's assignment is a pure function of its
    id — no leakage across reruns, append-only ingest keeps old
    assignments."""
    thresh = int(round(test_fraction * _BUCKETS))
    return df.withColumn(
        "split",
        F.when(
            _hash_bucket(F.col(id_col), salt) < F.lit(thresh), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Assign documents to fixed-token-budget bins (context-window
    packing for LLM pretraining). Returns the input plus ``shard``,
    ``bin`` — consumers concatenate a bin's documents into one training
    sequence.

    Scale shape: documents are hash-sharded (deterministic, skew-free),
    then packed WITHIN each shard by a running token sum over the
    deterministic id order — one hash shuffle + per-shard sort, no
    global ordering. bin = floor(start_offset / budget) where
    start_offset is the tokens preceding the document in its shard's
    stream: documents stay whole, a document that crosses a budget
    boundary belongs to the bin where it starts, and oversize documents
    occupy their own bin(s) rather than being dropped.
    """
    shard = (_hash_bucket(F.col(id_col), salt) % F.lit(n_shards)).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("shard", shard).withColumn(
        "__cum", F.sum(F.col(token_col)).over(w)
    )
    return out.withColumn(
        "bin",
        ((F.col("__cum") - F.col(token_col)) / F.lit(budget)).cast("bigint"),
    ).drop("__cum")


def pack_boundaries(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Per-sequence DOCUMENT BOUNDARY arrays for :func:`pack_sequences`
    output — the loss-mask / attention-mask metadata every LLM trainer
    needs next to a packed corpus (the EOD-boundary convention): with
    multiple documents concatenated into one context window, the
    trainer must reset attention (block-diagonal mask) and loss at
    each document start, so the packed table has to carry WHERE the
    documents begin inside each sequence.

    Returns one row per (shard, bin) that has at least one document
    STARTING in it: ``(shard, bin, n_docs, doc_starts, doc_ids,
    lead_in_tokens, spill_tokens)`` where

    - ``doc_starts[i]`` is the token offset WITHIN the bin's fixed
      ``budget``-token window (``start_offset - bin * budget``) of the
      i-th starting document, ascending;
    - ``doc_ids[i]`` is that document's id (same order);
    - ``lead_in_tokens = doc_starts[0]`` — tokens at the head of the
      window still belonging to the PREVIOUS bin's spilling document
      (mask them against the carried-over doc, or treat as padding);
    - ``spill_tokens`` — tokens of the LAST document extending past
      the window's end. Only the last doc can spill: any document
      after a spilling one would start past the budget and therefore
      in a later bin (the invariant the hand-computed tests pin). A
      document longer than ``budget`` spans whole windows by itself;
      those interior bins emit NO row here (they contain no document
      start — the trainer sees them via the previous row's spill).

    Boundaries are a PURE FUNCTION of the deterministic packing
    (hash shard + id-order running sum), so the table replays
    bit-identically cross-engine — same contract as pack_sequences.
    Scale shape: identical to pack_sequences (one hash shuffle, one
    per-shard window) plus a (shard, bin) groupBy whose per-group
    state is bounded by the docs that fit a ``budget``-token window
    — collect_list here can never exceed ~budget/min_doc_tokens
    entries, the same bounded-bin argument as pack_materialize.
    Ties (zero-token documents share their successor's start offset)
    order by (offset, id) via the struct sort, total and replayable.
    """
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("long")
    rows = (
        df.withColumn(
            "shard",
            (_hash_bucket(F.col(id_col), salt) % F.lit(n_shards)).cast("long"),
        )
        .withColumn("__start", start)
        .withColumn(
            "bin", F.floor(F.col("__start") / F.lit(budget)).cast("long")
        )
        .withColumn(
            "__off", (F.col("__start") - F.col("bin") * F.lit(budget)).cast("long")
        )
    )
    sorted_docs = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("__off").alias("off"),
                F.col(id_col).cast("long").alias("doc"),
                F.col(token_col).cast("long").alias("n"),
            )
        )
    )
    last = F.element_at(F.col("__docs"), -1)
    return (
        rows.groupBy("shard", "bin")
        .agg(sorted_docs.alias("__docs"))
        .select(
            "shard",
            "bin",
            F.size("__docs").alias("n_docs"),
            F.transform(F.col("__docs"), lambda s: s["off"]).alias(
                "doc_starts"
            ),
            F.transform(F.col("__docs"), lambda s: s["doc"]).alias("doc_ids"),
            F.element_at(F.col("__docs"), 1)["off"].alias("lead_in_tokens"),
            F.greatest(
                F.lit(0).cast("long"),
                (last["off"] + last["n"] - F.lit(budget)).cast("long"),
            ).alias("spill_tokens"),
        )
    )


def pack_chunks_ordered(
    df: DataFrame,
    doc_col: str,
    chunk_col: str,
    token_col: str,
    budget: int,
    n_buckets: int = 256,
) -> DataFrame:
    """Greedy IN-ORDER packing of document chunks into fixed
    token-budget training sequences — the stage between
    chunk_documents and the trainer when chunk LOCALITY matters
    (adjacent chunks of one document land in the same or adjacent
    sequences, preserving long-range context across sequence
    boundaries), where pack_sequences' hash-sharding deliberately
    scatters documents for skew-freedom.

    bin = floor(start_offset / budget) with start_offset the total
    tokens strictly before the chunk in the GLOBAL (doc, chunk) order;
    chunks stay whole, a chunk crossing a boundary belongs to the bin
    where it starts, and a chunk longer than ``budget`` pushes the
    next chunk past the bins it spans (occupying them alone).
    ``seq_start`` (the offset itself) is also returned so a
    materializer can slice exactly. (doc, chunk) must be unique.

    Scale shape: the global ordered running sum is the bucketed
    prefix-sum idiom (operators/bucketing.py — the 7th member):
    equal-frequency quantile edges over the doc axis range-bucket the
    rows (all chunks of a doc share a bucket: the bucket id is a
    function of the doc value), each bucket cumsums locally in
    parallel, and per-bucket token totals close into global offsets
    through an n_buckets-row window. No single-task corpus sort; the
    edges census is localCheckpoint-pinned per the bucketing.py
    determinism rule.
    """
    from stockpy_spark.operators.bucketing import (
        freq_edges,
        with_freq_bucket,
    )

    # r17: a global agg is ONE row by construction — literal-pin it
    # (pinning.pin_literal) so the edges embed in the plan instead of
    # riding a broadcast-build job + checkpoint leaf scan per run;
    # same single-materialization determinism, one less job.
    census = df.agg(
        freq_edges(F.col(doc_col), n_buckets).alias("__edges")
    ).transform(lambda d: pin_literal(d, 1))
    b = with_freq_bucket(
        df.crossJoin(F.broadcast(census)),
        F.col(doc_col),
        F.col("__edges"),
        n_buckets,
        "__bkt",
    ).drop("__edges")
    wloc = (
        Window.partitionBy("__bkt")
        .orderBy(doc_col, chunk_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn(
        "__st_loc", F.coalesce(F.sum(token_col).over(wloc), F.lit(0))
    )
    woff = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        b.groupBy("__bkt")
        .agg(F.sum(token_col).alias("__bt"))
        .select(
            "__bkt",
            F.coalesce(F.sum("__bt").over(woff), F.lit(0)).alias("__off"),
        )
    )
    start = F.col("__off") + F.col("__st_loc")
    return local.join(F.broadcast(offsets), "__bkt").select(
        *df.columns,
        start.cast("long").alias("seq_start"),
        F.floor(start / F.lit(float(budget))).cast("long").alias("bin"),
    )


def stratified_sample_exact(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    salt: str = "strata",
) -> DataFrame:
    """Exactly min(k, group size) rows per group, deterministically.

    The selection order within each group is the md5 of (salt, id) — a
    uniform pseudo-random permutation that is reproducible across
    reruns, engines, and repartitioning, with the salt switching to an
    independent draw. One window shuffle on ``group_col``; the md5
    tiebreak on id makes the order total, so the picked set is unique
    (``df.sampleBy`` gives only approximate per-stratum fractions and
    changes under repartitioning — useless for training-corpus class
    balancing, where reproducibility is the requirement).

    Skew note: a window over a hot group funnels that group through one
    task. For top-k-per-group with SMALL k that is still the right
    plan (the task streams the partition, keeping k rows); if a single
    group exceeds what one task should scan, pre-filter with
    hash_sample to ~10x the target k first, then apply this exactly.
    """
    order = F.md5(F.concat_ws("\x1f", F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(order, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def temperature_resample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.5,
    salt: str = "temper",
) -> DataFrame:
    """Deterministic domain-temperature downsampling: flatten a skewed
    group (domain/language/source) distribution toward uniform by
    keeping each row of group g with probability
    ``(c_g / c_min) ** (alpha - 1)`` — the per-group keep-rate that
    makes retained counts proportional to ``c_g ** alpha`` (the
    "temperature" mixing rule used for multilingual / multi-domain
    pretraining corpora). ``alpha=1`` keeps everything (natural
    distribution), ``alpha=0`` equalizes groups to ~the smallest
    group's size; no group is ever upsampled (keep-rate caps at 1 for
    the smallest group, so the op needs no row replication).

    The keep/drop draw is the same md5-bucket pure function of the row
    id as every sampler here (rerun-, engine-, and layout-stable); the
    keep-rate is rounded to 9 decimals before the comparison so the
    boundary is the same literal double in any engine.

    Scale shape: one tiny groupBy for the census (|groups| rows),
    broadcast back onto the stream, then a narrow filter. No
    corpus-sized shuffle, no window.
    """
    census = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__cg"))
    c_min = census.agg(F.min("__cg").alias("__cmin"))
    rates = census.crossJoin(F.broadcast(c_min)).select(
        group_col,
        F.round(
            F.pow(F.col("__cg") / F.col("__cmin"), F.lit(alpha - 1.0)), 9
        ).alias("__keep_rate"),
    )
    u = _hash_bucket(F.col(id_col), salt) / F.lit(float(_BUCKETS))
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(u < F.col("__keep_rate"))
        .drop("__keep_rate")
    )


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row draws a uniform u from md5(salt, id) and
    scores key = u^(1/w); the k largest keys are the sample. Inclusion
    probability is proportional to weight, the draw is a pure function
    of the row id (rerun- and engine-stable, like every sampler here),
    and the plan is one narrow scan + a TakeOrderedAndProject top-k —
    no shuffle of the full data, no per-partition reservoir state.
    Rows with non-positive or null weights are excluded (a weight of 0
    must never be sampled; A-ES's key is undefined there).

    Returns the sampled rows with their ``__wkey`` (rounded, for
    auditability); ties (md5-improbable) break by id for determinism.
    """
    # 13 hex digits = 52 bits: exactly representable as a double on any
    # engine, so u is bit-identical cross-engine (15+ digits would round)
    u = (
        F.conv(F.substring(F.md5(
            F.concat_ws("\x1f", F.lit(salt), F.col(id_col).cast("string"))
        ), 1, 13), 16, 10).cast("double")
        / F.lit(float(16 ** 13))
    )
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (
        df.where(F.col(weight_col).cast("double") > 0)
        .withColumn("__wkey", F.round(key, 12))
        .orderBy(F.col("__wkey").desc(), F.col(id_col))
        .limit(k)
    )


def negative_pair_sample(
    df: DataFrame,
    id_col: str,
    k: int,
    salt: str = "negpair",
    n_shards: int = 256,
) -> DataFrame:
    """Deterministic in-batch negative pairs for contrastive training:
    each anchor row is paired with the next ``k`` rows of its
    md5-ordered hash shard — the distributed version of "shuffle the
    batch, take your neighbors as negatives". The md5 order is
    independent of content, so neighbors are an unbiased pseudo-random
    draw, yet the whole pairing is a pure function of (salt, ids):
    rerun-stable, engine-reproducible (oracle-able), and free of the
    coordination a true random permutation needs.

    Shape: one shuffle into ``n_shards`` hash shards, a lead(1..k)
    window cascade inside each shard (one sort, per-row state), no
    self-join, no global permutation index. The last rows of a shard
    have fewer than k successors and emit fewer pairs (no wraparound —
    the loss is at most k(k+1)/2 pairs per shard — exactly that when
    the shard has more than k rows — negligible at corpus scale and
    exactly reproduced by the oracle).

    Returns (anchor_id, negative_id, neg_rank) with neg_rank 1..k.
    """
    h = F.md5(
        F.concat_ws("\x1f", F.lit(salt), F.col(id_col).cast("string"))
    )
    base = df.select(
        F.col(id_col).alias("anchor_id"),
        h.alias("__h"),
        (
            F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
            % F.lit(n_shards)
        ).alias("__shard"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("__shard").orderBy("__h", "anchor_id")
    leads = base.select(
        "anchor_id",
        *[
            F.lead("anchor_id", i).over(w).alias(f"__n{i}")
            for i in range(1, k + 1)
        ],
    )
    stacked = leads.select(
        "anchor_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("neg_rank"),
                        F.col(f"__n{i}").alias("negative_id"),
                    )
                    for i in range(1, k + 1)
                ]
            )
        ).alias("p"),
    )
    return stacked.select(
        "anchor_id", F.col("p.negative_id").alias("negative_id"), F.col("p.neg_rank").alias("neg_rank")
    ).filter(F.col("negative_id").isNotNull())


def matched_controls(
    eval_df: DataFrame,
    pool_df: DataFrame,
    id_col: str,
    match_col: str,
    tolerance: float,
    n_sub_buckets: int = 32,
) -> DataFrame:
    """Matched-control selection: for every evaluation row, the pool
    row with the LARGEST ``match_col`` value <= the eval row's value
    and within ``tolerance`` — nearest-below matching on a covariate
    (document length, activity count, spend), the cheap propensity-
    matching idiom behind "compare against a similar-sized control".

    The global nearest-below is an as-of join with no equi key; the
    textbook window formulation sorts EVERYTHING in one task. Instead
    the covariate axis is bucketed at ``tolerance`` width and every
    pool row is replicated into its own and the NEXT bucket: any pool
    value within [v - tolerance, v] of an eval value v then shares the
    eval row's bucket, so a per-bucket (value, side, id)-ordered window
    with last(pool_struct, ignoreNulls) finds the true winner — exact,
    one shuffle, 2x pool replication, no single-task sort. A pool row
    FARTHER than tolerance is deliberately no match (honest matching
    needs a caliper; it is also what bounds the search).

    The tolerance buckets are SEMANTIC (the caliper), so a dense
    cluster inside one tolerance width — most of a corpus at similar
    document lengths — used to funnel through one window task: the
    same value-concentration degeneration the r11 verdict flagged for
    the equal-width prefix-sum family (r12 audit item). Each tolerance
    bucket is therefore SUB-bucketed on per-bucket equal-frequency
    edges (operators/bucketing.py): the running last-pool-struct is
    associative, so each (bkt, sub) runs it locally and a per-sub
    carry-in — the latest pool struct of all earlier sub-buckets,
    max_by (v, pid) over a bkt-x-sub-sized frame — closes the global
    scan. Rows with EQUAL v always share a sub-bucket (the bucket id
    is a function of the value alone), so the (v, is_eval, pid)
    tie-break order survives the concatenation exactly.

    Ties: equal pool values resolve to the largest pool id; a pool row
    equal to the eval value IS eligible (<=). Eval rows with no
    in-tolerance pool row are kept with NULL control columns — the
    unmatched set is a first-class output of any matching step.

    Returns (eval_id, eval_val, control_id, control_val, gap).
    """
    from pyspark.sql.window import Window

    tol = float(tolerance)
    v_e = F.col(match_col).cast("double")
    # pool ids keep their NATIVE type (string/UUID ids survive; a long
    # cast would NULL them silently and break the tie-break); the
    # "largest pid" tie-break is the type's own ordering — numeric for
    # ints, lexicographic for strings
    pid_type = pool_df.schema[id_col].dataType
    ev = eval_df.select(
        F.col(id_col).alias("eval_id"),
        v_e.alias("v"),
        F.floor(v_e / tol).cast("long").alias("bkt"),
        F.lit(1).alias("is_eval"),
        F.lit(None).cast(pid_type).alias("pid"),
    )
    pool = (
        pool_df.select(
            F.col(id_col).alias("pid"),
            F.col(match_col).cast("double").alias("v"),
        )
        .select(
            F.lit(None).cast(eval_df.schema[id_col].dataType).alias("eval_id"),
            "v",
            F.explode(
                F.array(
                    F.floor(F.col("v") / tol).cast("long"),
                    F.floor(F.col("v") / tol).cast("long") + 1,
                )
            ).alias("bkt"),
            F.lit(0).alias("is_eval"),
            "pid",
        )
    )
    tagged = ev.unionByName(pool)
    from stockpy_spark.operators.bucketing import (
        freq_edges,
        with_freq_bucket,
    )

    # eager checkpoint (bkt-cardinality rows): the bucketing.py
    # determinism rule — percentile_approx varies per materialization
    # and the census feeds both the local-scan and carry-in branches
    census = tagged.groupBy("bkt").agg(
        freq_edges("v", n_sub_buckets).alias("__edges")
    ).transform(pin)
    sub = with_freq_bucket(
        tagged.join(census, "bkt"),
        F.col("v"),
        F.col("__edges"),
        n_sub_buckets,
        "__sub",
    ).drop("__edges")
    # pin the data-sized scan to (bkt, sub) tasks — a bkt-partitioned
    # census-join output satisfies the window's clustering requirement
    # on the bkt subset and would serialize each tolerance bucket
    # through one task (the interval_concurrency lesson)
    sub = sub.repartition("bkt", "__sub")
    pool_struct = F.when(
        F.col("is_eval") == 0,
        F.struct(F.col("pid").alias("cid"), F.col("v").alias("cv")),
    )
    w = Window.partitionBy("bkt", "__sub").orderBy(
        F.col("v").asc(), F.col("is_eval").asc(), F.col("pid").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = sub.withColumn(
        "ctl_loc", F.last(pool_struct, ignorenulls=True).over(w)
    )
    # bkt-x-sub-sized frame: latest pool struct per sub-bucket, then
    # the exclusive running latest over earlier sub-buckets = carry-in.
    # Grouped over ALL rows (not just pool rows) so eval-only
    # sub-buckets still get a carry row; the NULL ordering key makes
    # max_by skip eval rows, leaving last_pool NULL where a sub-bucket
    # has no pool row.
    per_sub = sub.groupBy("bkt", "__sub").agg(
        F.max_by(
            pool_struct,
            F.when(
                F.col("is_eval") == 0, F.struct(F.col("v"), F.col("pid"))
            ),
        ).alias("last_pool")
    )
    w_carry = (
        Window.partitionBy("bkt")
        .orderBy("__sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = per_sub.select(
        "bkt",
        "__sub",
        F.last("last_pool", ignorenulls=True).over(w_carry).alias("carry"),
    )
    carried = local.join(carry, ["bkt", "__sub"], "left").withColumn(
        "ctl", F.coalesce(F.col("ctl_loc"), F.col("carry"))
    )
    return (
        carried.filter(F.col("is_eval") == 1)
        .select(
            "eval_id",
            F.col("v").alias("eval_val"),
            F.when(
                F.col("v") - F.col("ctl.cv") <= tol, F.col("ctl.cid")
            ).alias("control_id"),
            F.when(
                F.col("v") - F.col("ctl.cv") <= tol, F.col("ctl.cv")
            ).alias("control_val"),
            F.when(
                F.col("v") - F.col("ctl.cv") <= tol,
                F.col("v") - F.col("ctl.cv"),
            ).alias("gap"),
        )
    )


def mixture_plan(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    budget_tokens: float,
    size_col: str,
    dp: int = 6,
) -> DataFrame:
    """Training-mixture planner: given the measured per-domain token
    inventory and a TARGET mixture (domain -> weight), compute each
    domain's sampling rate toward a ``budget_tokens`` corpus and flag
    domains whose inventory cannot fill their quota (rate capped at
    1.0 — the planner reports the shortfall rather than silently
    re-normalizing, because fixing a deficit is a data-sourcing
    decision, not an arithmetic one).

    One census aggregate (per-domain sum of ``size_col``) joined to a
    broadcast literal weight table. Domains present in the data but
    absent from ``weights`` get weight 0 (rate 0 — excluded by plan);
    weighted domains missing from the data appear with zero inventory
    and capped=true. Returns (domain, available_tokens, target_share,
    quota_tokens, rate, expected_tokens, capped).
    """
    spark = df.sparkSession
    wtab = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(weights.items())],
        ["domain", "target_share"],
    )
    inv = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(F.col(size_col).cast("double")).alias("available_tokens")
    )
    grid = inv.join(F.broadcast(wtab), "domain", "full").select(
        "domain",
        F.coalesce("available_tokens", F.lit(0.0)).alias("available_tokens"),
        F.coalesce("target_share", F.lit(0.0)).alias("target_share"),
    )
    quota = F.col("target_share") * F.lit(float(budget_tokens))
    rate = F.when(F.col("available_tokens") > 0, 
        F.least(F.lit(1.0), quota / F.col("available_tokens"))
    ).otherwise(F.lit(0.0))
    return grid.select(
        "domain",
        F.round("available_tokens", dp).alias("available_tokens"),
        F.round("target_share", dp).alias("target_share"),
        F.round(quota, dp).alias("quota_tokens"),
        F.round(rate, dp).alias("rate"),
        F.round(rate * F.col("available_tokens"), dp).alias("expected_tokens"),
        (quota > F.col("available_tokens")).alias("capped"),
    )


def group_train_test_split(
    df: DataFrame,
    id_col: str,
    group_col: str,
    test_fraction: float,
    salt: str = "gsplit",
) -> DataFrame:
    """Leakage-guarded split: every row of a GROUP lands in the SAME
    split. ``train_test_split`` hashes the row id, which is correct for
    independent rows but leaks when the corpus contains near-duplicate
    clusters, same-domain pages, or same-author documents — a test doc
    whose twin sits in train inflates eval. Here the assignment is a
    pure function of the group's canonical representative (its MIN id),
    so a cluster can never straddle the boundary, reruns and
    append-only ingest keep old assignments, and the test fraction
    converges on the GROUP distribution (the honest unit when groups
    are the leakage unit).

    Scale shape: one aggregate for the representative frame (one row
    per group) + one equi-join back — no forced broadcast (group
    cardinality is data-sized, the q3 fact-in-disguise lesson); AQE
    broadcasts the group frame while it fits. Returns df + ``split``.

    NULL group keys are a real group, not dropped rows: the back-join
    is null-safe (``<=>`` is still a hash-join key, so the plan shape
    is unchanged), so output row count always equals input row count —
    the same every-row-gets-a-split contract as ``train_test_split``.
    All NULL-keyed rows share one group (they are indistinguishable to
    the leakage rule, so they must land on one side together).
    """
    thresh = int(round(test_fraction * _BUCKETS))
    rep = (
        df.groupBy(group_col)
        .agg(F.min(id_col).alias("__rep"))
        .select(
            F.col(group_col).alias("__grp"),
            F.when(
                _hash_bucket(F.col("__rep"), salt) < F.lit(thresh),
                F.lit("test"),
            )
            .otherwise(F.lit("train"))
            .alias("split"),
        )
    )
    return df.join(rep, F.col(group_col).eqNullSafe(F.col("__grp"))).drop("__grp")


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    n_folds: int = 5,
    smoothing: float = 10.0,
    salt: str = "tenc",
    dp: int = 6,
) -> DataFrame:
    """Leak-proof target encoding (the CatBoost/Kaggle standard for
    high-cardinality categoricals): each row's category is replaced by
    the target mean computed WITHOUT the row's own fold — train-time
    leakage control as an operator, the supervised sibling of
    group_train_test_split's guard. Folds are the md5 draw of the row
    id (pure function of (salt, id): rerun- and engine-stable);
    encoding = (cat_sum - fold_sum + m * global_mean) /
    (cat_cnt - fold_cnt + m), the m-smoothed out-of-fold mean, so a
    category seen ONLY in the row's own fold falls back to the global
    prior rather than leaking itself.

    Scale shape: one map-side-combined aggregate to (fold, category)
    cells — output is folds x categories rows regardless of data
    size. The LUT join back is deliberately UNHINTED: this op exists
    for high-cardinality categoricals, so the LUT is category-sized —
    a fact in disguise when the category is user-id-like (the q3/
    basket-miner lesson; the group_train_test_split precedent 20
    lines up). AQE broadcasts while the LUT fits
    spark.sql.autoBroadcastJoinThreshold and sort-merges on __cat
    when it doesn't; only the 1-row global-mean census is a forced
    broadcast. Rows with NULL target still get an encoding (they
    contribute nothing to the sums); NULL categories encode as their
    own '<NULL>' category — missingness is usually informative."""
    fold = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f", F.lit(salt), F.col(id_col).cast("string")
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(n_folds)
    )
    base = df.select(
        "*",
        fold.alias("__fold"),
        F.coalesce(F.col(cat_col).cast("string"), F.lit("<NULL>")).alias("__cat"),
    )
    # eager checkpoint: the r11 criterion (checkpoint a shared frame
    # only when its computation DOMINATES) — this corpus-scale hash
    # aggregate is consumed by FOUR branches (the lut's cells join,
    # cat_tot, and the two glob broadcasts), each of which Spark plans
    # as an independent recomputation of the fact scan + agg; the r12
    # attribution profile read ~5 fact aggregates per run (25
    # exchanges) and the sf10 spot halved with the pin. Output is
    # folds x categories rows — for a user-id-like category that is
    # data-sized state, but materializing it ONCE is strictly cheaper
    # than the 4x fact-aggregate recompute it replaces (and it is the
    # LUT the op ships to the join anyway).
    cells = base.groupBy("__cat", "__fold").agg(
        F.sum(F.when(F.col(target_col).isNotNull(), F.col(target_col)).otherwise(0.0)).alias("__s"),
        F.sum(F.when(F.col(target_col).isNotNull(), 1).otherwise(0)).alias("__n"),
    ).transform(pin)
    cat_tot = cells.groupBy("__cat").agg(
        F.sum("__s").alias("__cs"), F.sum("__n").alias("__cn")
    )
    glob = cat_tot.agg(
        (F.sum("__cs") / F.sum("__cn")).alias("__gmean")
    )
    lut = (
        cells.join(cat_tot, "__cat")
        .crossJoin(F.broadcast(glob))
        .select(
            "__cat",
            "__fold",
            (
                (
                    F.col("__cs")
                    - F.col("__s")
                    + F.lit(smoothing) * F.col("__gmean")
                )
                / (F.col("__cn") - F.col("__n") + F.lit(smoothing))
            ).alias("__enc"),
        )
    )
    return (
        base.join(lut, ["__cat", "__fold"], "left")
        .crossJoin(F.broadcast(glob))
        .select(
            *[F.col(c) for c in df.columns],
            F.col("__fold").cast("int").alias("fold"),
            F.round(
                F.coalesce("__enc", F.col("__gmean")), dp
            ).alias(f"{cat_col}_enc"),
        )
    )


def shuffle_shard_plan(
    df: DataFrame,
    id_col: str,
    n_shards: int = 1024,
    salt: str = "shard",
    n_buckets: int = 4096,
) -> DataFrame:
    """Deterministic corpus shuffle into balanced training shards —
    the global order-randomization step between curation and the
    training loader: every row gets a ``shard`` in [0, n_shards) and a
    1-based ``position`` within its shard, both pure functions of
    (salt, id), so reruns and every engine reproduce the exact same
    training order (the determinism-over-CSPRNG trade all samplers
    here make). Shards are md5-uniform, so sizes balance to ~corpus /
    n_shards with no census; the order WITHIN a shard is the md5 draw,
    i.e. a full reshuffle of whatever upstream ordering (source,
    domain, time) the curation pipeline left behind — exactly what
    SGD's iid assumption wants from a data loader. Positions are
    assigned against a frozen snapshot: appending rows later shifts
    them (re-plan per corpus version; incremental ingestion keeps its
    own admit order).

    Plan — the domain_diversity_cap bucketed rank, not a per-shard
    window sort: ``row_number().over(partitionBy(shard))`` would sort
    each shard in ONE task (~100 GB per task at 100 TB / 1024 shards
    — the one-task-sort disease). The draw's leading hex chars slice
    every shard into ``n_buckets`` draw ranges (equal-width over the
    md5 space IS equal-frequency — the axis is uniform by
    construction, no quantile census needed); per-(shard, bucket)
    counts close into exclusive offsets via a window over n_buckets
    count rows per shard, and position = offset + local rank within
    the (shard, bucket) slice, a task of ~1/(n_shards*n_buckets) of
    the corpus. The draw is the md5 hex STRING, so lexicographic
    order within a bucket agrees with the bucket-prefix order and the
    result is IDENTICAL to the single-window formulation (the DuckDB
    oracle replays exactly that, so the equivalence is hash-checked,
    not argued).

    ``n_buckets`` is realized as a count of leading hex chars, so the
    effective bucket count is the next power of 16 AT OR ABOVE the
    request (r12 advisor: ``round`` silently gave 256 for 1000 —
    ~4x less parallelism than the docstring promised; ``ceil``
    guarantees at least the requested slicing; positions are
    identical either way, only task granularity moves).
    """
    import math

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    draw = F.md5(
        F.concat_ws("\x1f", F.lit(salt), F.col(id_col).cast("string"))
    )
    chars = max(1, int(math.ceil(round(math.log(n_buckets, 16), 9))))
    base = df.select(
        "*",
        draw.alias("__draw"),
        (
            F.conv(F.substring(draw, 1, 13), 16, 10).cast("long")
            % F.lit(n_shards)
        ).cast("int").alias("__shard"),
        F.conv(F.substring(draw, 1, chars), 16, 10).cast("int").alias("__bkt"),
    )
    counts = base.groupBy("__shard", "__bkt").agg(F.count(F.lit(1)).alias("__c"))
    woff = (
        Window.partitionBy("__shard")
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        F.col("__shard").alias("__shard_o"),
        F.col("__bkt").alias("__bkt_o"),
        F.coalesce(F.sum("__c").over(woff), F.lit(0)).alias("__off"),
    )
    rk = F.row_number().over(
        Window.partitionBy("__shard", "__bkt").orderBy("__draw", F.col(id_col))
    )
    return (
        base.join(
            offsets,
            (F.col("__shard") == F.col("__shard_o"))
            & (F.col("__bkt") == F.col("__bkt_o")),
            "left",
        )
        .select(
            *df.columns,
            F.col("__shard").alias("shard"),
            (F.col("__off") + rk).cast("long").alias("position"),
        )
    )


def pack_efficiency_report(
    packed: DataFrame,
    token_col: str,
    budget: int,
    bin_cols: tuple[str, ...] = ("shard", "bin"),
    dp: int = 6,
) -> DataFrame:
    """Packing-efficiency audit for :func:`pack_sequences` /
    :func:`pack_chunks_ordered` output — the metric you actually tune
    a packer with: how much of every training sequence's token budget
    is real data and how much is the padding the trainer will burn
    FLOPs on. One row: (n_bins, total_tokens, mean_fill_rate,
    p50_fill, p95_fill, min_fill, waste_tokens, pct_bins_ge_90).

    Fill is measured against ``budget`` per bin; a bin holding an
    oversize document fills past 1.0 deliberately (the trainer splits
    it — capping here would hide that the packer emitted it).
    Percentiles are EXACT over the bins frame (bins-sized, tiny
    relative to the corpus: corpus_tokens / budget rows).

    Scale shape: one (bin-key) aggregate of the packed frame —
    map-side combined, output bins-sized — then one global aggregate
    of the bins frame. Nothing rescans the corpus.
    """
    fills = packed.groupBy(*[F.col(c) for c in bin_cols]).agg(
        F.sum(F.col(token_col)).alias("__fill")
    )
    rate = F.col("__fill") / F.lit(float(budget))
    b = F.lit(float(budget))
    return fills.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum("__fill").cast("bigint").alias("total_tokens"),
        F.round(F.avg(rate), dp).alias("mean_fill_rate"),
        F.round(F.expr("percentile(__fill, 0.5)") / b, dp).alias("p50_fill"),
        F.round(F.expr("percentile(__fill, 0.95)") / b, dp).alias("p95_fill"),
        F.round(F.min(rate), dp).alias("min_fill"),
        F.sum(
            F.greatest(b - F.col("__fill"), F.lit(0.0))
        ).cast("bigint").alias("waste_tokens"),
        F.round(
            F.avg(F.when(rate >= 0.9, 1.0).otherwise(0.0)), dp
        ).alias("pct_bins_ge_90"),
    )


def calibrate_scores_by_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    dp: int = 6,
) -> DataFrame:
    """Per-source score calibration — the fix for the classifier-
    threshold trap: a quality score's ABSOLUTE value means different
    things across crawls/sources (one crawl's 0.6 is another's 0.9
    because their score distributions differ), so a single global
    threshold over- or under-prunes per source. Replaces each score
    with its within-group percentile (exact ``percent_rank``, ties
    share a rank; deterministic tie-break on the id for the rank
    column), so "keep the top 30%" means the same thing in every
    source.

    Returns the input plus (group_rank, calibrated) where calibrated
    in [0, 1] is the within-group percent_rank of the score. A
    one-row group calibrates to 0.0 (percent_rank's convention) — the
    honest value when there is nothing to compare against.

    Scale shape: ONE window partitioned by the group (source/crawl
    cardinality, each partition sorted independently — the natural
    parallel unit; a hot source is bounded by that source's share of
    the corpus, the same exposure every per-source statistic has).
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    # percent_rank must see score-only ordering for tie sharing; the
    # id enters only the row_number tiebreak
    wp = Window.partitionBy(group_col).orderBy(F.col(score_col).asc())
    return df.select(
        "*",
        F.row_number().over(w).cast("bigint").alias("group_rank"),
        F.round(F.percent_rank().over(wp), dp).alias("calibrated"),
    )
