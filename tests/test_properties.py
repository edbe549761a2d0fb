"""Property-based tests (SURVEY.md §5.2): hypothesis-generated frames
checking the algebraic invariants the engine's scale story relies on.

Each property is the distributed-correctness contract behind an
operator family:

- aggregation must not care how rows are partitioned (map-side combine
  + shuffle reduce is only correct for commutative-associative aggs);
- dedup must be idempotent (a second pass is a no-op);
- fuzzy schema alignment must undo a header-drift rename exactly;
- salting must be a pure physical rewrite (identical result set to the
  plain join on any skew).

Examples are capped small: each draw runs real Spark jobs, and the
invariants are about structure, not input magnitude. ``deadline=None``
because JVM warm-up makes the first example slow; the session-scoped
``spark`` fixture is intentional (one JVM for the whole suite), so the
function-scoped-fixture health check is suppressed.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stockpy_spark.operators import (
    align_to_columns,
    group_summary,
    rename_columns,
)
from stockpy_spark.operators.dedup import exact_dedup
from stockpy_spark.operators.joins import salted_join

PROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, value) rows: few keys so groups collide, values spanning sign
# and zero to catch sum/avg edge cases
kv_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-1000, 1000)),
    min_size=1,
    max_size=60,
)


@PROP
@given(rows=kv_rows, n_parts=st.integers(1, 7))
def test_grouped_agg_insensitive_to_partitioning(spark, rows, n_parts):
    """sum/count/min/max per key must be identical under any
    repartitioning — the invariant that makes map-side partial
    aggregation legal at all."""
    df = spark.createDataFrame(rows, "k int, v int")
    aggs = {
        "s": F.sum("v").cast("long"),
        "n": F.count(F.lit(1)),
        "lo": F.min("v"),
        "hi": F.max("v"),
    }
    base = group_summary(df, ["k"], aggs)
    shuffled = group_summary(df.repartition(n_parts, "v"), ["k"], aggs)
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, shuffled.collect())
    )


doc_rows = st.lists(
    st.tuples(st.integers(0, 100), st.sampled_from(["a", "b", "ab", "c", ""])),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],  # doc ids unique, texts collide heavily
)


@PROP
@given(rows=doc_rows)
def test_exact_dedup_idempotent(spark, rows):
    """dedup(dedup(df)) == dedup(df), every surviving text is unique,
    and the survivor of each text group is its minimum id — rerunning
    a dedup stage (checkpoint replay, retried job) must be a no-op."""
    df = spark.createDataFrame(rows, "doc_id int, text string")
    once = exact_dedup(df, "text", "doc_id")
    twice = exact_dedup(once, "text", "doc_id")
    got_once = sorted(map(tuple, once.collect()))
    assert got_once == sorted(map(tuple, twice.collect()))
    texts = [t for _, t in got_once]
    assert len(texts) == len(set(texts))
    want = {}
    for i, t in rows:
        want[t] = min(want.get(t, i), i)
    assert {t: i for i, t in got_once} == want


_DRIFT = st.sampled_from(["{}", " {}", "{} ", "{}_", "X_{}"])


@PROP
@given(
    base=st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta"]),
        min_size=1,
        max_size=4,
        unique=True,
    ),
    drifts=st.lists(_DRIFT, min_size=4, max_size=4),
)
def test_align_undoes_header_drift(spark, base, drifts):
    """rename columns into drifted headers (case/whitespace/underscore
    noise), then align back to the expected schema: every original
    column must land on its own value, none NULL-filled or swapped."""
    n = len(base)
    df = spark.createDataFrame(
        [tuple(range(n))], ", ".join(f"{c} int" for c in base)
    )
    drifted = rename_columns(
        df, {c: d.format(c.upper()) for c, d in zip(base, drifts[:n])}
    )
    back = align_to_columns(drifted, {c: T.IntegerType() for c in base})
    assert back.columns == base
    assert tuple(back.collect()[0]) == tuple(range(n))


@PROP
@given(
    # skewed left side: ~half the rows pile onto key 0
    left=st.lists(
        st.tuples(
            st.one_of(st.just(0), st.integers(0, 4)), st.integers(-100, 100)
        ),
        min_size=1,
        max_size=60,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 4), st.integers(-100, 100)),
        min_size=0,
        max_size=10,
    ),
    how=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
    buckets=st.integers(2, 6),
)
def test_salted_join_equals_plain_join_under_skew(
    spark, left, right, how, buckets
):
    """salted_join is a physical rewrite only: for every supported join
    mode, any skew profile, and any bucket count, the result multiset
    equals the plain join's."""
    l = spark.createDataFrame(left, "k int, lv int")
    r = (
        spark.createDataFrame(right, "k int, rv int")
        if right
        else spark.createDataFrame([], "k int, rv int")
    )
    got = salted_join(l, r, "k", how=how, salt_buckets=buckets)
    want = l.join(r, "k", how)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


# intervals as (lo, span>=0) so hi >= lo mostly, plus occasional
# inverted pairs to exercise the empty-interval filter; facts include
# exact boundary values
iv_rows = st.lists(
    st.tuples(
        st.integers(-50, 50),
        st.integers(-5, 30),  # negative span -> empty interval
    ),
    min_size=0,
    max_size=12,
)
fact_vals = st.lists(st.integers(-60, 80), min_size=0, max_size=25)


@PROP
@given(ivs=iv_rows, vals=fact_vals, width=st.sampled_from([1.0, 3.0, 7.5, 100.0]))
def test_bucketed_range_join_equals_naive_on_random_inputs(
    spark, ivs, vals, width
):
    """The bucket decomposition is a pure physical rewrite: pair set ==
    the naive inequality join's on ANY intervals (overlapping, nested,
    empty, negative) and any bucket width."""
    from stockpy_spark.operators.rangejoin import bucketed_range_join

    intervals = spark.createDataFrame(
        [(i, float(lo), float(lo + span)) for i, (lo, span) in enumerate(ivs)]
        or [(0, 1.0, 0.0)],
        "iv_id long, lo double, hi double",
    )
    facts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)] or [(0, 0.5)],
        "f_id long, v double",
    )
    naive = facts.join(
        intervals,
        (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")),
        "inner",
    )
    want = sorted((r.f_id, r.iv_id) for r in naive.collect())
    got = sorted(
        (r.f_id, r.iv_id)
        for r in bucketed_range_join(
            facts, intervals, "v", "lo", "hi", bucket_width=width
        ).collect()
    )
    assert got == want


@PROP
@given(
    groups=st.lists(st.integers(0, 3), min_size=0, max_size=30),
    k=st.integers(1, 5),
)
def test_stratified_sample_exact_k_and_deterministic(spark, groups, k):
    """Exactly min(k, group size) per group; the picked ID set is a
    pure function of (ids, salt) — independent of partitioning."""
    from stockpy_spark.operators.sampling import stratified_sample_exact

    rows = [(i, f"g{g}") for i, g in enumerate(groups)]
    if not rows:
        rows = [(0, "g0")]
    df = spark.createDataFrame(rows, "id long, grp string")
    out1 = stratified_sample_exact(df, "grp", "id", k)
    picked1 = sorted((r.grp, r.id) for r in out1.collect())
    sizes: dict[str, int] = {}
    for _, g in rows:
        sizes[g] = sizes.get(g, 0) + 1
    from collections import Counter

    per_group = Counter(g for g, _ in picked1)
    for g, n in sizes.items():
        assert per_group[g] == min(k, n), (g, n, k)
    out2 = stratified_sample_exact(df.repartition(7), "grp", "id", k)
    assert sorted((r.grp, r.id) for r in out2.collect()) == picked1


# documents as token lists: tokens are simple words, docs vary from
# empty to longer than several chunks
chunk_docs = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=40),
    min_size=1,
    max_size=12,
)


@PROP
@given(docs=chunk_docs, chunk=st.sampled_from([4, 8]), overlap=st.sampled_from([0, 2, 3]))
def test_chunking_covers_and_reconstructs(spark, docs, chunk, overlap):
    """Invariants of the overlapping-window grid for any document:
    (1) every token position is covered by at least one chunk;
    (2) chunk texts are exact slices of the source at their offsets;
    (3) concatenating each chunk's non-overlapping prefix (plus the
        final chunk's tail) reconstructs the document."""
    from stockpy_spark.operators.chunking import chunk_documents

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, "text", "doc_id", chunk_tokens=chunk, overlap=overlap)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    step = chunk - overlap
    for i, toks in enumerate(docs):
        chunks = sorted(by_doc.get(i, []), key=lambda r: r.chunk_id)
        if not toks:
            assert chunks == []
            continue
        # (1) coverage: starts step by `step`, last start < n
        starts = [c.start_tok for c in chunks]
        assert starts == list(range(0, len(toks), step))[: len(starts)]
        assert starts[-1] + chunks[-1].n_tok == len(toks)
        # (2) exact slices
        for c in chunks:
            assert c.chunk_text.split() == toks[c.start_tok : c.start_tok + chunk]
            assert c.n_tok == len(toks[c.start_tok : c.start_tok + chunk])
        # (3) reconstruction from non-overlap prefixes
        rebuilt: list[str] = []
        for c in chunks[:-1]:
            rebuilt.extend(c.chunk_text.split()[:step])
        rebuilt.extend(chunks[-1].chunk_text.split())
        assert rebuilt == toks


# intervals as (key, start_sec, duration): few keys, durations spanning
# zero-length and exact-boundary-touch cases
conc_rows = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.integers(0, 30),
        st.integers(0, 12),
    ),
    min_size=1,
    max_size=25,
)


@PROP
@given(rows=conc_rows)
def test_interval_concurrency_matches_brute_force(spark, rows):
    """Sweep-line levels equal the brute-force definition at every
    boundary instant: |{intervals i : start_i <= t < end_i}| — including
    zero-length intervals (start == end contributes nothing) and
    exact-boundary touches (half-open)."""
    from datetime import datetime, timedelta

    from stockpy_spark.operators.timeseries import interval_concurrency

    base = datetime(2024, 1, 1)
    data = [
        (str(k), base + timedelta(seconds=s), base + timedelta(seconds=s + d))
        for k, s, d in rows
    ]
    df = spark.createDataFrame(data, "k string, s timestamp, e timestamp")
    out = interval_concurrency(df, "s", "e", ["k"])
    for r in out.collect():
        t = r.at_ts
        expected = sum(
            1 for k, s, e in data if k == r.k and s <= t < e
        )
        assert r.concurrent == expected, (r.k, t, r.concurrent, expected)


@PROP
@given(
    weights=st.lists(st.integers(1, 50), min_size=5, max_size=40),
    k=st.sampled_from([1, 3, 10]),
)
def test_weighted_sample_matches_reference_aes(spark, weights, k):
    """The distributed A-ES top-k must equal a local reference
    implementation of the same md5-derived keys — the determinism that
    makes the sampler rerun-stable and oracle-checkable."""
    import hashlib

    from stockpy_spark.operators.sampling import weighted_sample_topk

    df = spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate(weights)], "id long, w double"
    )
    got = sorted(
        r.id for r in weighted_sample_topk(df, "id", "w", k=k).collect()
    )

    def u(i: int) -> float:
        h = hashlib.md5(f"wsample\x1f{i}".encode()).hexdigest()
        return int(h[:13], 16) / float(16**13)

    keyed = sorted(
        ((round(u(i) ** (1.0 / w), 12), -i), i)
        for i, w in enumerate(weights)
    )
    expected = sorted(i for _, i in keyed[-min(k, len(weights)):])
    assert got == expected


# random word-soup docs: tiny vocabulary so repetition actually occurs
_words = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
_docs = st.lists(
    st.lists(_words, min_size=0, max_size=25).map(" ".join),
    min_size=1,
    max_size=8,
)


@PROP
@given(texts=_docs)
def test_gopher_fractions_bounded_and_nested(spark, texts):
    """Invariants of the repetition battery on random docs: every
    fraction sits in [0, 1], and dup10 coverage is a SUBSET of dup5
    coverage (a duplicated 10-gram's 5-gram sub-grams are duplicated
    too), so dup10_char_frac <= dup5_char_frac on every doc."""
    from stockpy_spark.operators.gopher import gopher_repetition_profile

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    for r in gopher_repetition_profile(df, "text", "doc_id").collect():
        for c in ("top2_char_frac", "top3_char_frac", "top4_char_frac",
                  "dup5_char_frac", "dup10_char_frac"):
            assert 0.0 <= r[c] <= 1.0, (c, r)
        assert r["dup10_char_frac"] <= r["dup5_char_frac"] + 1e-9


@PROP
@given(keys=st.lists(st.integers(0, 30), min_size=1, max_size=80))
def test_cm_sketch_never_undercounts(spark, keys):
    """Count-Min's one-sided error on random multisets: the estimate
    is >= the exact count for EVERY key, at a width small enough that
    collisions really happen."""
    from stockpy_spark.operators.sketches import cm_sketch_estimates

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    for r in cm_sketch_estimates(df, "k", depth=3, width=8).collect():
        assert r["cm_estimate"] >= r["exact_count"]


@PROP
@given(
    vecs=st.lists(
        st.tuples(st.floats(-8, 8, allow_nan=False, width=32),
                  st.floats(-8, 8, allow_nan=False, width=32)),
        min_size=4,
        max_size=12,
        unique=True,
    )
)
def test_kcenter_selection_distances_non_increasing(spark, vecs):
    """Greedy k-center on random 2-D points: each round's selection
    distance is <= the previous round's (the farthest remaining point
    can only get closer as the chosen set grows)."""
    from stockpy_spark.operators.similarity import kcenter_coreset

    df = spark.createDataFrame(
        [(i, [a, b]) for i, (a, b) in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    rows = sorted(
        kcenter_coreset(df, "embedding", "vec_id", k=min(4, len(vecs))).collect(),
        key=lambda r: r["sel_round"],
    )
    dists = [r["dist"] for r in rows[1:]]
    assert all(a >= b - 1e-9 for a, b in zip(dists, dists[1:]))


@PROP
@given(
    corpus=st.lists(st.text("abcdef", min_size=1, max_size=6),
                    min_size=1, max_size=40),
    probes=st.lists(st.text("abcdef", min_size=1, max_size=6),
                    min_size=1, max_size=20),
)
def test_bloom_screen_complete_on_random_keys(spark, corpus, probes):
    """Bloom completeness on random key sets: every probe that IS in
    the corpus screens as maybe-present, whatever the collisions."""
    from stockpy_spark.operators.sketches import bloom_build, bloom_screen

    cdf = spark.createDataFrame([(c,) for c in corpus], "fp string")
    bloom = bloom_build(cdf, "fp", m_bits=128, k_hashes=3)
    pdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(probes)], "id long, fp string"
    )
    out = bloom_screen(pdf, "fp", bloom, m_bits=128, k_hashes=3)
    member = set(corpus)
    for r in out.collect():
        if r["fp"] in member:
            assert r["bloom_maybe"] == 1


@PROP
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 40), st.booleans()),
        min_size=1,
        max_size=50,
        unique_by=lambda r: r[1],
    ),
    cap=st.integers(1, 5),
)
def test_domain_cap_bucketed_rank_equals_single_window(spark, rows, cap):
    """Round-11 re-plan invariant: the bucketed-rank domain cap must
    keep the IDENTICAL set as the straightforward single-window
    formulation (row_number over (domain, blocked) ordered by (draw,
    id)) on any input — the rewrite is a physical change only. The
    reference is computed in-test with the old window plan."""
    from pyspark.sql import Window

    from stockpy_spark.operators.webfilter import domain_diversity_cap

    df = spark.createDataFrame(
        [
            (doc_id, f"https://site{d}.com/p{doc_id}", f"site{d}.com",
             f"site{d}.com", int(blocked))
            for d, doc_id, blocked in rows
        ],
        "doc_id long, url string, host string, domain string, blocked int",
    )
    got = {
        r["doc_id"]
        for r in domain_diversity_cap(df, "doc_id", cap).collect()
        if r["kept"] == 1
    }
    draw = F.md5(
        F.concat_ws("\x1f", F.lit("domcap"), F.col("doc_id").cast("string"))
    )
    rk = F.row_number().over(
        Window.partitionBy("domain", "blocked").orderBy(draw, F.col("doc_id"))
    )
    ref = {
        r["doc_id"]
        for r in df.select(
            "doc_id",
            ((F.col("blocked") == 0) & (rk <= cap)).cast("int").alias("kept"),
        ).collect()
        if r["kept"] == 1
    }
    assert got == ref


@PROP
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2),           # user
            st.integers(0, 100),         # ts offset (collisions likely)
            st.sampled_from(["view", "click", "purchase", "other"]),
        ),
        min_size=1,
        max_size=40,
    ),
    lookback=st.integers(1, 30),
    dual=st.booleans(),
)
def test_last_touch_locf_equals_join_argmax_reference(
    spark, events, lookback, dual
):
    """Round-11 re-plan invariant: the as-of/LOCF attribution must
    produce IDENTICAL rows to the old conv x touch join + per-
    conversion argmax formulation (computed in-test as the reference)
    on any event stream — including same-timestamp touch/conversion
    collisions (strictly-before), larger-id tie-breaks, and the DUAL
    case where the conversion type is itself a touch type (a purchase
    is a touch for LATER conversions but never for itself — the
    self-attribution-at-lag-0 seam this test caught in round 11)."""
    from pyspark.sql import Window

    from stockpy_spark.operators.behavior import last_touch_attribution

    rows = [
        (i, u, 1_600_000_000 + dt, et)
        for i, (u, dt, et) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, es long, event_type string"
    ).select(
        "event_id", "user_id",
        F.timestamp_seconds("es").alias("ts"), "event_type",
    )
    touch_types = ["view", "click", "purchase"] if dual else ["view", "click"]
    got = {
        tuple(r)
        for r in last_touch_attribution(
            df, touch_types, "purchase", lookback
        ).collect()
    }

    sec = F.col("ts").cast("long")
    base = df.select(
        F.col("user_id").alias("u"), F.col("event_id").alias("eid"),
        F.col("event_type").alias("etype"), sec.alias("es"),
    )
    conv = base.where(F.col("etype") == "purchase").select(
        "u", F.col("eid").alias("conv_id"), F.col("es").alias("conv_s")
    )
    touch = base.where(F.col("etype").isin(*touch_types)).select(
        "u", F.col("eid").alias("touch_id"),
        F.col("etype").alias("touch_type"), F.col("es").alias("touch_s"),
    )
    cand = conv.join(touch, "u").where(
        (F.col("touch_s") < F.col("conv_s"))
        & (F.col("touch_s") >= F.col("conv_s") - F.lit(lookback))
    )
    rn = F.row_number().over(
        Window.partitionBy("conv_id").orderBy(
            F.col("touch_s").desc(), F.col("touch_id").desc()
        )
    )
    best = cand.withColumn("rn", rn).where(F.col("rn") == 1)
    ref = {
        tuple(r)
        for r in conv.join(
            best.select("conv_id", "touch_type", "touch_s", "touch_id"),
            "conv_id", "left",
        )
        .select(
            F.col("conv_id").alias("conversion_id"),
            F.col("u").alias("user_id"),
            F.col("conv_s").alias("conversion_epoch"),
            "touch_type",
            F.col("touch_s").alias("touch_epoch"),
            (F.col("conv_s") - F.col("touch_s")).alias("touch_lag_sec"),
        )
        .collect()
    }
    assert got == ref


@PROP
@given(
    rows=st.lists(
        st.tuples(
            st.integers(-5, 5),
            st.sampled_from([0.0, 1.0, 1.5, 2.0, 7.25]),
        ),
        min_size=3,
        max_size=40,
    )
)
def test_spearman_census_equals_bruteforce_ranks(spark, rows):
    """Round-11 re-plan invariant: the joint-census Spearman must
    equal a brute-force Python computation (textbook average ranks +
    Pearson over ranks) on any frame with heavy ties — the census/
    bucket machinery is a physical rewrite only."""
    import math

    from stockpy_spark.operators.stats import spearman_corr_pairs

    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in rows], "a double, b double"
    )
    out = spearman_corr_pairs(df, ["a", "b"]).collect()

    def ranks(vals):
        order = sorted(vals)
        return [
            (sum(1 for w in vals if w < v))
            + (sum(1 for w in vals if w == v) + 1) / 2.0
            for v in vals
        ]

    xs = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    rx, ry = ranks(xs), ranks(ys)
    n = len(rows)
    sx, sy = sum(rx), sum(ry)
    num = sum(a * b for a, b in zip(rx, ry)) - sx * sy / n
    vx = sum(a * a for a in rx) - sx * sx / n
    vy = sum(b * b for b in ry) - sy * sy / n
    assert len(out) == 1
    if vx == 0 or vy == 0:
        # constant column: zero rank variance, correlation undefined
        # — the operator surfaces NULL (try_divide), never an ANSI
        # divide-by-zero error
        assert out[0]["spearman"] is None
        return
    expect = round(num / math.sqrt(vx * vy), 6)
    assert abs(out[0]["spearman"] - expect) <= 1e-6
