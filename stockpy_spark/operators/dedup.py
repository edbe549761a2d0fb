"""Deduplication operators for LLM training-data pipelines.

Four tiers, all distributed, none driver-side:

1. Exact: hash-groupBy on a normalized-text fingerprint (md5 — engine
   portable, unlike murmur3 F.hash).
2. Word-set Jaccard: exact pairwise similarity via token inverted index
   (explode distinct tokens -> self-join on token -> count intersections).
   O(sum over tokens of df(token)^2) pairs — correct but quadratic in
   document frequency; use as the *verify* stage after LSH candidates at
   scale, not as the discovery stage.
3. MinHash + LSH banding: the 100 TB discovery path. Deterministic
   md5-based minhash (portable across engines so the DuckDB oracle can
   replicate it bit-for-bit), banded into buckets; only same-bucket pairs
   are candidates. Shuffle cost ~ H x tokens, candidate count bounded by
   band collisions instead of n^2.
4. SimHash: 32-bit fingerprints + hamming-distance pairs (bit_count of
   xor). Cheapest per-doc state of the lot.

All outputs are deterministic (min-doc-id keeper, d1<d2 pair ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stockpy_spark.functions.text import fingerprint_md5, tokenize
from stockpy_spark.operators.pinning import pin, pin_literal


def exact_dedup_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-fingerprint dup stats: fingerprint, surviving (min) id, count."""
    return (
        df.select(F.col(id_col), fingerprint_md5(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Drop exact (normalized) duplicates, keeping the lowest id per
    fingerprint. Window-free formulation: min-id per fingerprint is an
    aggregate, then a semi-join keeps the winners — two map-side-combined
    shuffles on fp, no full row_number sort."""
    with_fp = df.withColumn("__fp", fingerprint_md5(text_col))
    keepers = with_fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return with_fp.join(keepers, ["__fp", id_col], "left_semi").drop("__fp")


def _distinct_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Case-normalized distinct token set per document ('The' and 'the'
    are the same evidence for near-dup purposes)."""
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(tokenize(F.lower(F.col(text_col))))).alias("tok"),
    )


#: word_jaccard_pairs is verify-tier: its token self-join is quadratic
#: in hot-token document frequency. The guard makes accidentally
#: pointing it at a corpus a loud error instead of a cluster-melter.
WORD_JACCARD_MAX_DOCS = 200_000


def word_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    max_docs: int | None = WORD_JACCARD_MAX_DOCS,
) -> DataFrame:
    """Exact pairwise Jaccard over distinct word sets via inverted index.

    Returns (d1, d2, jaccard) with d1 < d2 and jaccard >= threshold,
    jaccard rounded to 6 decimals. VERIFY-TIER, not a scale path: the
    token self-join explodes on hot tokens (stopwords everywhere ->
    df(token)=n -> n^2 rows). At scale run this only on LSH candidates
    (see minhash_lsh_pairs) or use the linear star-edge/assignment
    paths; to make that boundary enforceable rather than advisory, the
    call raises ValueError when the input exceeds ``max_docs`` rows
    (pass ``max_docs=None`` to opt out — e.g. when the input is
    already a bounded candidate set).
    """
    if max_docs is not None:
        n = df.count()
        if n > max_docs:
            raise ValueError(
                f"word_jaccard_pairs is verify-tier (quadratic in hot-token "
                f"document frequency): got {n} docs > max_docs={max_docs}. "
                "Use minhash_lsh_star_edges / minhash_dedup_assign at corpus "
                "scale, or pass max_docs=None for a bounded candidate set."
            )
    # r17 (guide §2.3/§3.2 applied to the self-join): EXACT prefix
    # filtering (Bayardo et al. 2007 "Scaling Up All Pairs Similarity
    # Search"; Chaudhuri et al. 2006) replaces the full inverted-index
    # self-join. Under any global token order, J(A,B) >= t implies
    # |A ∩ B| >= ceil(t*|A|), so A and B must share a token among each
    # set's FIRST |X| - ceil(t*|X|) + 1 tokens — candidate pairs come
    # from joining only those prefix tokens, and ordering tokens by
    # ascending document frequency puts the RAREST tokens in the
    # prefix: the df(stopword)^2 blowup of the old full self-join
    # (every pair of docs sharing "the" was a join row) is gone while
    # the result stays exact — candidates are verified with the true
    # intersection of the full distinct-token sets (array_intersect of
    # the same element sets the old per-token count aggregated), and
    # the final jaccard/round/filter is unchanged. Because the output
    # filter admits round(j, 6) >= threshold (a raw j up to 5e-7 BELOW
    # t), pruning uses t_eff = t - 1e-6: strictly longer prefixes and
    # a looser size bound, i.e. a candidate SUPERSET. Still quadratic
    # in genuine near-dup cluster size (those pairs ARE the output) —
    # verify-tier, but no longer quadratic in stopword frequency.
    tok_sets = df.select(
        F.col(id_col).alias("doc"),
        F.array_sort(
            F.array_distinct(tokenize(F.lower(F.col(text_col))))
        ).alias("ts"),
    ).filter(F.size("ts") > 0)
    toks = tok_sets.select(
        "doc", F.size("ts").alias("sz"), F.explode("ts").alias("tok")
    )
    t_eff = max(0.0, float(threshold) - 1e-6)
    # global rarity order: (document frequency asc, token asc) — total
    # and deterministic; no broadcast hint on the df table (vocabulary
    # grows with the corpus; AQE broadcasts while it fits)
    tdf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__df"))
    ranked = toks.join(tdf, "tok").withColumn(
        "__r",
        F.row_number().over(
            Window.partitionBy("doc").orderBy(F.asc("__df"), F.asc("tok"))
        ),
    )
    prefix = ranked.filter(
        F.col("__r")
        <= F.col("sz") - F.ceil(F.lit(t_eff) * F.col("sz")) + 1
    ).select("doc", "sz", "tok")
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc") < F.col("b.doc"))
            & (
                F.least(F.col("a.sz"), F.col("b.sz"))
                >= F.lit(t_eff) * F.greatest(F.col("a.sz"), F.col("b.sz"))
            ),
        )
        .select(F.col("a.doc").alias("d1"), F.col("b.doc").alias("d2"))
        .distinct()
    )
    sa = tok_sets.select(F.col("doc").alias("d1"), F.col("ts").alias("__ta"))
    sb = tok_sets.select(F.col("doc").alias("d2"), F.col("ts").alias("__tb"))
    verified = (
        cand.join(sa, "d1")
        .join(sb, "d2")
        .select(
            "d1",
            "d2",
            F.size(F.array_intersect("__ta", "__tb")).alias("inter"),
            F.size("__ta").alias("sz1"),
            F.size("__tb").alias("sz2"),
        )
    )
    return (
        verified.withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


# modulus for double-hashed minhash lanes: small prime so lane
# arithmetic (h1 + i*h2) never overflows 64-bit in any engine
_MINHASH_P = 1_000_000_007


def _hash_kernel(hash_fn: str):
    """The minhash family's hash kernel, selected once and plumbed
    through signatures -> bands -> admission keys -> the streaming
    admitter (round-12 task; the r11 measured finding: the per-token
    double hash IS the narrow-stage wall of the flagship dedup family,
    and xxhash64 runs it ~3x faster than md5 at sf1).

    Returns (token_base, band_sig, text_fp):
    - token_base(prefix, tok) -> BIGINT lane base in [0, _MINHASH_P)
    - band_sig(concat_str)    -> STRING band signature
    - text_fp(col)            -> STRING exact fingerprint

    ``md5`` stays the default everywhere — the DuckDB oracles replay
    it bit-for-bit. ``xxhash64`` is the production kernel for a real
    100 TB run: identical LSH structure, same key-set schema (the
    64-bit hash casts to STRING so parquet state and joins are
    type-stable across kernels), different hash draws — so an index
    seeded with one kernel must be screened with the same kernel
    (document the choice in the ingestion service's config, like a
    salt). Collision note: band signatures compress to 64 bits under
    xxhash64 vs md5's 128 — at 2^32 distinct band keys the birthday
    collision odds are ~50% for ONE colliding PAIR across the whole
    index, which costs one spurious rejection, acceptable for dedup
    screening (not for exact fingerprints of adversarial input).
    """
    if hash_fn == "md5":
        def base(prefix: str, t: F.Column) -> F.Column:
            return (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(prefix), t)), 1, 15),
                    16,
                    10,
                ).cast("long")
                % _MINHASH_P
            )

        return base, F.md5, F.md5
    if hash_fn == "xxhash64":
        def base(prefix: str, t: F.Column) -> F.Column:
            return F.pmod(
                F.xxhash64(F.concat(F.lit(prefix), t)), F.lit(_MINHASH_P)
            )

        def bsig(c: F.Column) -> F.Column:
            return F.xxhash64(c).cast("string")

        def fp(c) -> F.Column:
            return F.xxhash64(c).cast("string")

        return base, bsig, fp
    raise ValueError(f"unknown hash_fn {hash_fn!r}: use 'md5' or 'xxhash64'")


def _minhash_wide(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    hash_fn: str = "md5",
) -> DataFrame:
    """(doc, mh0..mh{H-1}): minhash signature, one BIGINT column per
    hash lane. Double-hashing (Kirsch-Mitzenmacher): two md5-derived
    base hashes per token, lane i = (h1 + i*h2) mod P — H lanes for the
    price of 2 hash computations instead of H.

    ZERO-shuffle formulation: the token set never leaves its row. The
    distinct tokens are an array column, the two base hashes a
    `transform` over it, and every lane an `array_min` over another
    `transform` — all narrow, map-side, whole-row operations, so
    signature computation costs no exchange at any corpus size; the
    first shuffle in any minhash pipeline is the (tiny, n_docs-sized)
    band bucket join downstream. The md5→hex→bigint derivation is
    engine-portable (DuckDB reproduces every lane bit-for-bit); at
    100 TB pass ``hash_fn="xxhash64"`` (_hash_kernel) — MEASURED r11:
    the signature pass runs ~3x faster (0.61 s -> 0.20 s at sf1,
    same-session A/B) because here the per-token double hash IS the
    narrow-stage wall — unlike dsir's bucket pass, where the explode
    dominates and the same swap moves nothing. The LSH structure is
    unchanged either way; the md5 path stays default for the
    bit-exact oracle.
    """
    base, _, _ = _hash_kernel(hash_fn)

    # filter on the token array, NOT the hashed array: predicate pushdown
    # substitutes the filtered alias's defining expression into the
    # condition, so filtering on __hs would re-run the md5 transform per
    # row just to test emptiness. size(NULL array) = -1, size(no tokens)
    # = 0 — both match the oracle's "doc absent when tokenless".
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(tokenize(F.lower(F.col(text_col)))).alias("__toks"),
    ).filter(F.size(F.col("__toks")) > 0)
    hashed = F.transform(
        F.col("__toks"),
        lambda t: F.struct(base("1|", t).alias("h1"), base("2|", t).alias("h2")),
    )
    sigs = toks.select("doc", hashed.alias("__hs"))
    return sigs.select(
        "doc",
        *[
            F.array_min(
                F.transform(
                    F.col("__hs"),
                    lambda s: (s["h1"] + F.lit(h) * s["h2"]) % _MINHASH_P,
                )
            ).alias(f"mh{h}")
            for h in range(num_hashes)
        ],
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, n: int, threshold: float
) -> DataFrame:
    """Exact pairwise Jaccard over distinct character n-gram (shingle)
    sets — the character-level twin of word_jaccard_pairs, robust to
    tokenization differences (no-space scripts, punctuation-glued
    words). Same inverted-index shape and the same scale caveat: use as
    the verify stage on LSH candidates, not for discovery."""
    from stockpy_spark.functions.text import char_ngrams

    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(char_ngrams(F.col(text_col), n))).alias("tok"),
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("d1"), F.col("b.doc").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # no broadcast hints: sizes has one row per doc and grows with the
    # corpus; AQE broadcasts it while small, shuffles at scale
    sa = sizes.select(F.col("doc").alias("d1"), F.col("sz").alias("sz1"))
    sb = sizes.select(F.col("doc").alias("d2"), F.col("sz").alias("sz2"))
    return (
        inter.join(sa, "d1")
        .join(sb, "d2")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 12,
    hash_fn: str = "md5",
) -> DataFrame:
    """(doc, h, mh): long-form minhash signature (see _minhash_wide).
    The explode happens AFTER the aggregate, so it is n_docs x H rows,
    not n_tokens x H."""
    wide = _minhash_wide(df, text_col, id_col, num_hashes, hash_fn)
    pairs = F.array(
        *[
            F.struct(F.lit(h).cast("int").alias("h"), F.col(f"mh{h}").alias("mh"))
            for h in range(num_hashes)
        ]
    )
    return wide.select("doc", F.explode(pairs).alias("kv")).select(
        "doc", F.col("kv.h").alias("h"), F.col("kv.mh").alias("mh")
    )


def _band_signatures(
    wide: DataFrame, num_hashes: int, bands: int, hash_fn: str = "md5"
) -> DataFrame:
    """(doc, band, bsig) from a wide minhash frame. Band signature =
    the kernel's hash of the band's minhashes in h order, each prefixed
    with a zero-padded h (identical string to sorting 'hhhh:mh' entries
    lexicographically — the oracle's formulation). Columnar explode of
    the aggregate — no extra shuffle."""
    _, bsig_fn, _ = _hash_kernel(hash_fn)
    rows = num_hashes // bands
    band_structs = [
        F.struct(
            F.lit(b).cast("int").alias("band"),
            bsig_fn(
                F.concat_ws(
                    ",",
                    *[
                        F.concat(F.lit(f"{h:04d}:"), F.col(f"mh{h}").cast("string"))
                        for h in range(b * rows, (b + 1) * rows)
                    ],
                )
            ).alias("bsig"),
        )
        for b in range(bands)
    ]
    return wide.select("doc", F.explode(F.array(*band_structs)).alias("kb")).select(
        "doc", F.col("kb.band").alias("band"), F.col("kb.bsig").alias("bsig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 12,
    bands: int = 6,
    hash_fn: str = "md5",
) -> DataFrame:
    """Candidate near-dup pairs via MinHash + LSH banding, with the
    minhash-estimated Jaccard attached.

    Pipeline: minhash signatures -> band signature per (doc, band) =
    md5 of the band's ordered minhashes -> bucket-join docs sharing a
    band signature -> distinct candidate pairs -> estimated jaccard =
    fraction of the full signature agreeing.

    Scale behavior: ONE token shuffle (the groupBy(doc) minhash
    aggregate, map-side combined); band signatures and the per-doc
    signature array are columnar derivations of that single aggregate —
    no further shuffles until the bounded bucket-join. Skewed buckets
    (boilerplate docs) are the one hazard — AQE skew-join handles
    moderate skew; severe boilerplate should be exact-deduped (cheap)
    before LSH.
    """
    wide = _minhash_wide(df, text_col, id_col, num_hashes, hash_fn)
    band_sigs = _band_signatures(wide, num_hashes, bands, hash_fn)
    a, b = band_sigs.alias("a"), band_sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("d1"), F.col("b.doc").alias("d2"))
        .distinct()
    )
    # estimated jaccard via per-doc signature ARRAYS: one row per doc,
    # one zip_with per candidate pair — instead of re-joining H minhash
    # rows per pair side (H x pairs rows through the shuffle)
    sig_arr = wide.select(
        "doc", F.array(*[F.col(f"mh{h}") for h in range(num_hashes)]).alias("sig")
    )
    s1 = sig_arr.select(F.col("doc").alias("d1"), F.col("sig").alias("sig1"))
    s2 = sig_arr.select(F.col("doc").alias("d2"), F.col("sig").alias("sig2"))
    agree = F.aggregate(
        F.zip_with(
            F.col("sig1"),
            F.col("sig2"),
            lambda a, b: F.when(a == b, 1.0).otherwise(0.0),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # no broadcast hint: the signature table is one row per doc and
    # grows with the corpus — AQE broadcasts it while it fits, falls
    # back to a shuffle join beyond that
    return (
        cand.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1", "d2", F.round(agree / F.lit(float(num_hashes)), 6).alias("est_jaccard")
        )
    )


def minhash_dedup_assign(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 12,
    bands: int = 6,
    iterations: int = 1,
    hash_fn: str = "md5",
    bounded_docs: int | None = None,
) -> DataFrame:
    """(doc_id, keeper_id, is_dup): map every document to a cluster
    representative via LSH buckets — WITHOUT enumerating pairs.

    ``bounded_docs``: callers that KNOW ``df`` is bounded (e.g. the
    release pipeline dedups a ``limit(128)``-derived admitted set)
    pass the bound so the band-signature key frame pins as a
    driver-literal LocalRelation (pinning.pin_literal) instead of a
    checkpoint — the bucket-min/join-back plan then broadcasts
    statically with no leaf-scan stages. Falls back to the checkpoint
    pin if the bound is ever exceeded; default None keeps the
    corpus-scale checkpoint path.

    This is the 100 TB dedup path. Pair enumeration (minhash_lsh_pairs)
    is quadratic in duplicate-cluster size: a 1M-doc boilerplate cluster
    is 5*10^11 pairs, all generated in the single join task that owns the
    hot bucket key. Assignment is linear and skew-free: per bucket take
    min(label) (a map-side-combined aggregate — hot buckets reduce on the
    map side), then per doc take min over its buckets' minima. One
    iteration = "keeper is the smallest doc sharing a bucket with me";
    more iterations propagate labels across chained buckets toward
    connected components (each iteration is 2 bounded hash shuffles).
    """
    wide = _minhash_wide(df, text_col, id_col, num_hashes, hash_fn)
    # r16 (guide §2.4, duplicate subtrees): band_sigs feeds BOTH the
    # bucket-min aggregate and the assignment join-back, and the join
    # side carries no exchange for ReuseExchange to share (the
    # bucket-min side partial-aggregates before its shuffle; the join
    # side ships raw rows or broadcasts), so unpinned the
    # tokenize+minhash CPU ran twice per iteration — the plan showed
    # two full parquet scans. The pinned frame is the (doc, band,
    # bsig) KEY set — the thing the module docstring says a 100 TB
    # deployment indexes and materializes anyway (keys are a few
    # percent of text bytes; reliable pin mode IS that durable write).
    band_sigs = _band_signatures(wide, num_hashes, bands, hash_fn).transform(
        (lambda d: pin_literal(d, bounded_docs * bands))
        if bounded_docs is not None
        else pin
    )
    labeled = band_sigs.withColumn("label", F.col("doc"))
    labels = None
    for _ in range(iterations):
        bucket_min = labeled.groupBy("band", "bsig").agg(F.min("label").alias("bmin"))
        labels = (
            labeled.join(bucket_min, ["band", "bsig"])
            .groupBy("doc")
            .agg(F.min("bmin").alias("label"))
        )
        labeled = band_sigs.join(labels, "doc")
    return labels.select(
        F.col("doc").alias(id_col),
        F.col("label").alias("keeper_id"),
        (F.col("label") != F.col("doc")).alias("is_dup"),
    )


def simhash_fingerprints(
    df: DataFrame, text_col: str, id_col: str, bits: int = 32
) -> DataFrame:
    """(id, simhash): 32-bit SimHash over distinct tokens.

    Token hash = first 8 hex chars of md5 (portable); fingerprint bit b
    is the sign of sum over tokens of (+1 if token-hash bit b else -1).
    """
    toks = _distinct_tokens(df, text_col, id_col)
    th = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    toks = toks.withColumn("th", th)
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy("doc").agg(*bit_sums)
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return agg.select(F.col("doc").alias(id_col), fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Blocked self-join: docs are bucketed by each of 4 simhash bytes; a
    pair within hamming<=3 of a 32-bit hash must agree on >=1 of the 4
    bytes (pigeonhole), so the join only compares same-byte-block pairs
    instead of n^2.
    """
    fps = simhash_fingerprints(df, text_col, id_col)
    blocks = fps.select(
        F.col(id_col).alias("doc"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright(F.col("simhash"), i * 8).bitwiseAND(F.lit(255)).alias("bv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("kb"),
    ).select("doc", "simhash", F.col("kb.blk").alias("blk"), F.col("kb.bv").alias("bv"))
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("d1"),
            F.col("b.doc").alias("d2"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash64_fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, sim_hi, sim_lo): 64-bit SimHash carried as two non-negative
    32-bit halves (lo = bits 0-31 from md5 hex chars 1-8 of each token,
    hi = bits 32-63 from chars 9-16).

    Why halves instead of one long: the sign bit of a 64-bit value
    needs two's-complement arithmetic that SQL engines check/overflow
    differently, while two 32-bit halves are portable everywhere —
    equality, XOR and bit_count compose identically. Why 64-bit at
    all: a 2^32 fingerprint space saturates at large corpus scales
    (birthday collisions flood the hamming<=3 blocks past ~10^5 docs);
    2^64 keeps block buckets cold at 100 TB.
    """
    toks = _distinct_tokens(df, text_col, id_col)
    toks = toks.withColumn(
        "tlo", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    ).withColumn(
        "thi", F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("long")
    )
    sums = []
    for half in ("lo", "hi"):
        for b in range(32):
            sums.append(
                F.sum(
                    F.when(
                        F.shiftright(F.col(f"t{half}"), b).bitwiseAND(F.lit(1)) == 1, 1
                    ).otherwise(-1)
                ).alias(f"{half}{b}")
            )
    agg = toks.groupBy("doc").agg(*sums)

    def fold(half: str) -> F.Column:
        fp = F.lit(0).cast("long")
        for b in range(32):
            fp = fp + F.when(
                F.col(f"{half}{b}") > 0, F.lit(2**b).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return fp

    return agg.select(
        F.col("doc").alias(id_col), fold("hi").alias("sim_hi"), fold("lo").alias("sim_lo")
    )


def simhash64_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash hamming distance <= max_hamming.

    8-byte-block pigeonhole: <= 3 flipped bits damage <= 3 of the 8
    byte blocks, so any qualifying pair agrees on >= 5 blocks and is
    found by single-block equality blocking — lossless vs the
    brute-force scan, same argument as the 32-bit variant, at 2^64
    fingerprint sparsity.
    """
    fps = simhash64_fingerprints(df, text_col, id_col)
    block_structs = [
        F.struct(
            F.lit(i + 4 * h).alias("blk"),
            F.shiftright(F.col(col), i * 8).bitwiseAND(F.lit(255)).alias("bv"),
        )
        for h, col in enumerate(("sim_lo", "sim_hi"))
        for i in range(4)
    ]
    blocks = fps.select(
        F.col(id_col).alias("doc"),
        "sim_hi",
        "sim_lo",
        F.explode(F.array(*block_structs)).alias("kb"),
    ).select("doc", "sim_hi", "sim_lo", F.col("kb.blk").alias("blk"), F.col("kb.bv").alias("bv"))
    a, b = blocks.alias("a"), blocks.alias("b")
    hamming = F.bit_count(
        F.col("a.sim_hi").bitwiseXOR(F.col("b.sim_hi"))
    ) + F.bit_count(F.col("a.sim_lo").bitwiseXOR(F.col("b.sim_lo")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("d1"),
            F.col("b.doc").alias("d2"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_neardup_lsh(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    dim: int,
    n_planes: int = 12,
    bands: int = 3,
) -> DataFrame:
    """Embedding near-dup at scale: hyperplane-LSH blocking + exact
    cosine verify within blocks. Returns (id1, id2, cosine), id1 < id2,
    cosine >= threshold.

    The n_planes-bit signature is split into ``bands`` sub-signatures;
    vectors sharing ANY band sub-signature become a candidate pair
    (same banding logic as MinHash-LSH, hyperplanes instead of
    minhashes). One linear scan computes signatures; the self-join is
    per-band on small keys; exact cosine runs only on candidates —
    O(n^2) never materializes unless the data really is one cluster.
    High-cosine pairs agree on most hyperplane signs, so P(all bands
    differ) decays geometrically with bands.
    """
    from stockpy_spark.functions.text import cosine_similarity
    from stockpy_spark.operators.similarity import _hyperplane_signature

    width = n_planes // bands
    sig = _hyperplane_signature(F.col(vec_col), dim, n_planes)
    tagged = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), sig.alias("sig")
    )
    bexpr = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("sig"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("bsig"),
                )
                for b in range(bands)
            ]
        )
    )
    blocks = tagged.select("id", "v", bexpr.alias("kb")).select(
        "id", "v", F.col("kb.band").alias("band"), F.col("kb.bsig").alias("bsig")
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.col("a.v").alias("v1"),
            F.col("b.v").alias("v2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    return (
        cand.withColumn("cosine", F.round(cosine_similarity("v1", "v2"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def embedding_cosine_pairs(
    df: DataFrame, vec_col: str, id_col: str, threshold: float
) -> DataFrame:
    """Embedding near-dup: pairs with cosine >= threshold (d1 < d2).

    Brute-force O(n^2/2) pair scan — exact, fine to ~10^5 vectors per
    executor-broadcast block. The scale path is embedding_neardup_lsh
    (hyperplane blocking, exact verify within blocks).
    """
    from stockpy_spark.functions.text import cosine_similarity

    a = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    b = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("cosine", F.round(cosine_similarity(F.col("v1"), F.col("v2")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def minhash_lsh_star_edges(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 12,
    bands: int = 6,
) -> DataFrame:
    """(d1, d2) edges for connected-components clustering — LINEAR in
    corpus size, unlike :func:`minhash_lsh_pairs`.

    Every LSH bucket is a clique in the candidate graph, and a clique's
    connectivity is preserved by a STAR: connect each member to the
    bucket's min doc instead of enumerating all pairs. Edge count is
    O(docs x bands) where all-pairs is O(sum cluster^2) — at a synthetic
    sf1 the same corpus yields 224M pairs but only ~n_docs star edges.
    groupBy min is map-side combined, so hot boilerplate buckets reduce
    before the shuffle; the transitive closure over shared buckets
    (graph.connected_components) is identical to the all-pairs graph's.
    """
    band_sigs = _band_signatures(
        _minhash_wide(df, text_col, id_col, num_hashes), num_hashes, bands
    )
    bucket_min = band_sigs.groupBy("band", "bsig").agg(
        F.min("doc").alias("d1")
    )
    return (
        band_sigs.join(bucket_min, ["band", "bsig"])
        .where(F.col("doc") != F.col("d1"))
        .select("d1", F.col("doc").alias("d2"))
        .distinct()
    )


def incremental_dedup_admit(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 12,
    bands: int = 2,
    hash_fn: str = "md5",
) -> DataFrame:
    """Admission filter for incremental corpus ingestion: which rows of
    a NEW ``batch`` may enter an EXISTING ``corpus``. The production
    shape every continuously-ingesting training pipeline runs — the
    corpus is never re-clustered; only the batch is screened, in three
    stages, each a bounded hash join (no pair enumeration anywhere):

    1. **Exact vs corpus + within batch**: md5(text) fingerprint
       anti-join against the corpus, then keep the min-id row per
       fingerprint within the batch.
    2. **Near-dup vs corpus**: a batch doc sharing ANY LSH band bucket
       with a corpus doc is rejected (bucket semi-join against the
       corpus's distinct bucket keys — the corpus side reduces to its
       bucket-key set, which an ingestion service would keep
       materialized; at 100 TB that set is what you index, not the
       text).
    3. **Near-dup within batch**: linear LSH assignment over the
       survivors (bucket-min label per doc, minhash_dedup_assign's
       semantics) — only bucket-min keepers are admitted.

    Token-less rows (empty text) have no LSH signature; they pass the
    near-dup stages and are screened by stage 1 alone.

    Returns the admitted batch rows (all original columns).
    """
    corpus_fps, corp_keys = corpus_dedup_keys(
        corpus, text_col, id_col, num_hashes, bands, hash_fn
    )
    return incremental_dedup_admit_keys(
        batch,
        corpus_fps,
        corp_keys,
        text_col,
        id_col,
        num_hashes,
        bands,
        hash_fn,
    )


def corpus_dedup_keys(
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 12,
    bands: int = 2,
    hash_fn: str = "md5",
) -> tuple[DataFrame, DataFrame]:
    """The standing corpus's ADMISSION INDEX — the only thing an
    ingestion service keeps materialized (at 100 TB you index these
    sets, not the text): the distinct md5 fingerprint set (``__fp``)
    and the distinct LSH band-bucket key set (``band``, ``bsig``).
    Both are pure functions of the corpus text AND the chosen
    ``hash_fn`` (an index built with one kernel must be screened with
    the same one — treat the choice like a salt), so incremental
    maintenance is append-of-the-admitted-rows'-keys (what the
    streaming admitter does per micro-batch)."""
    _, _, fp_fn = _hash_kernel(hash_fn)
    fps = corpus.select(fp_fn(F.col(text_col)).alias("__fp")).distinct()
    keys = _band_signatures(
        _minhash_wide(corpus, text_col, id_col, num_hashes, hash_fn),
        num_hashes,
        bands,
        hash_fn,
    ).select("band", "bsig").distinct()
    return fps, keys


def incremental_dedup_admit_keys(
    batch: DataFrame,
    corpus_fps: DataFrame,
    corpus_band_keys: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 12,
    bands: int = 2,
    hash_fn: str = "md5",
    band_sigs: DataFrame | None = None,
) -> DataFrame:
    """`incremental_dedup_admit` against a MATERIALIZED admission
    index (see corpus_dedup_keys) instead of the corpus text — the
    shape the streaming admitter and any real ingestion service run,
    where the standing corpus's key sets persist between arrivals and
    the text is never re-scanned. Stages and semantics are identical
    to incremental_dedup_admit (which now delegates here).

    ``band_sigs`` (r15 spine fusion): per-doc (doc, band, bsig)
    signatures of the FULL batch, computed once by the caller (pinned,
    so the minhash pass runs exactly once per batch instead of once
    per consumer). Must be exactly ``_band_signatures(_minhash_wide(
    batch, ...))`` with the same num_hashes/bands/hash_fn. A superset
    of the stage-1 survivors' signatures is correct by construction:
    every downstream use is restricted through s1/s2 id joins —
    near_corpus_docs may contain stage-1-rejected ids, but those are
    absent from s1, so the anti-join ignores them; bs2 semi-joins s2
    ids, so bucket-min sees survivor rows only."""
    _, _, fp_fn = _hash_kernel(hash_fn)
    fp = fp_fn(F.col(text_col))
    w_fp = Window.partitionBy("__fp")
    s1 = (
        batch.withColumn("__fp", fp)
        .join(corpus_fps, "__fp", "anti")
        .withColumn("__minid", F.min(id_col).over(w_fp))
        .where(F.col(id_col) == F.col("__minid"))
        .drop("__fp", "__minid")
    )

    corp_keys = corpus_band_keys.select("band", "bsig").distinct()
    if band_sigs is not None:
        bs_b = band_sigs
    else:
        # Batch path (no caller-computed signature frame): ``s1`` fans
        # out into the signature pass plus three downstream joins, and
        # the signature frame into two more — without a materialization
        # boundary the physical plan replays the fingerprint-screen and
        # per-token minhash subtrees once PER CONSUMER (r16 measured:
        # pinning both cut dedup_incremental ~15% at sf0.1, 3.9 -> 3.3 s
        # min). Both frames are batch-scale (micro-batch-bounded in any
        # real ingestion run), so pinning is the same bounded
        # materialization the streaming admitter already does for its
        # fused signature pass and admitted set.
        from stockpy_spark.operators.pinning import pin

        s1 = pin(s1)
        bs_b = pin(
            _band_signatures(
                _minhash_wide(s1, text_col, id_col, num_hashes, hash_fn),
                num_hashes,
                bands,
                hash_fn,
            )
        )
    near_corpus_docs = bs_b.join(corp_keys, ["band", "bsig"], "semi").select(
        F.col("doc").alias(id_col)
    ).distinct()
    s2 = s1.join(near_corpus_docs, id_col, "anti")

    bs2 = bs_b.join(
        s2.select(F.col(id_col).alias("doc")), "doc", "semi"
    )
    bucket_min = bs2.groupBy("band", "bsig").agg(F.min("doc").alias("bmin"))
    keeper = (
        bs2.join(bucket_min, ["band", "bsig"])
        .groupBy("doc")
        .agg(F.min("bmin").alias("__keeper"))
    )
    return (
        s2.join(
            keeper.select(F.col("doc").alias(id_col), "__keeper"),
            id_col,
            "left",
        )
        .where(
            F.col("__keeper").isNull() | (F.col("__keeper") == F.col(id_col))
        )
        .drop("__keeper")
    )


def shingle_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    shingle_words: int = 3,
    max_docs: int | None = WORD_JACCARD_MAX_DOCS,
) -> DataFrame:
    """ASYMMETRIC near-duplication: containment(A in B) =
    |S(A) & S(B)| / |S(A)| over distinct ``shingle_words``-word
    shingles. Jaccard misses the quote/aggregator case — a short
    document wholly copied into a long one scores low Jaccard but
    containment ~1 — which is why substring-level dedup (RefinedWeb,
    Lee et al. "Deduplicating Training Data Makes Language Models
    Better") is its own pipeline stage, not a Jaccard re-run.

    Returns (src, dst, containment) for ordered pairs src != dst with
    containment(src in dst) >= threshold, rounded to 6. Word shingles
    (not single tokens) so the overlap evidence is contiguous spans.

    VERIFY-TIER like word_jaccard_pairs (the shingle inverted-index
    self-join is quadratic in hot-shingle document frequency) and
    guarded by the same ``max_docs`` ValueError; at corpus scale feed
    it LSH candidates (minhash bucket join) with ``max_docs=None``.
    Shingles are far rarer than tokens (a 3-word shingle's document
    frequency is near 1 in organic text), so the practical wall is
    boilerplate shingles — remove_frequent_lines upstream exists for
    exactly that.
    """
    if max_docs is not None:
        n = df.count()
        if n > max_docs:
            raise ValueError(
                f"shingle_containment_pairs is verify-tier: got {n} docs > "
                f"max_docs={max_docs}. Feed LSH candidates (max_docs=None) "
                "at corpus scale."
            )
    toks = tokenize(F.lower(F.col(text_col)))
    k = shingle_words
    n_sh = F.size(toks) - F.lit(k - 1)
    # guard: sequence(1, 0) DESCENDS in Spark, so a doc shorter than k
    # tokens must yield an empty shingle array, not a broken slice
    shingle_arr = F.when(
        n_sh >= 1,
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.array_join(F.slice(toks, i, F.lit(k)), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    shingles = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(shingle_arr)).alias("sh"),
    )
    sizes = shingles.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a, b = shingles.alias("a"), shingles.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") != F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("src"), F.col("b.doc").alias("dst"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ssz = sizes.select(F.col("doc").alias("src"), F.col("sz").alias("src_sz"))
    return (
        inter.join(ssz, "src")
        .withColumn(
            "containment", F.round(F.col("inter") / F.col("src_sz"), 6)
        )
        .filter(F.col("containment") >= threshold)
        .select("src", "dst", "containment")
    )


def temporal_dedup_first(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    tolerance_seconds: int,
    tiebreak_col: str,
) -> DataFrame:
    """Burst dedup: keep only the FIRST event of each per-key burst,
    where an event belongs to its predecessor's burst when it arrives
    within ``tolerance_seconds`` of it — the telemetry double-fire /
    retry-storm cleaner (a user double-clicking "purchase" three times
    in two seconds is one intent). Distinct from exact_dedup (identical
    payloads) and dedup_within_watermark (streaming keyed dedup): here
    the duplicates are near-in-TIME, not equal-in-value.

    Chained semantics (each event compares to its immediate
    predecessor, so an hour-long burst of 2-second-spaced events stays
    ONE burst — the retry-storm case; a fixed-window rule would
    resurrect it every ``tolerance``). Survivor = any event farther
    than ``tolerance`` from its predecessor. One lag window per key
    (single shuffle, streaming frame); gap arithmetic on integral
    epoch seconds so an SQL engine replays the exact boundary;
    ``tiebreak_col`` pins same-instant ordering.

    Returns the surviving rows (all original columns).
    """
    sec = F.col(ts_col).cast("timestamp").cast("long")
    w = Window.partitionBy(*keys).orderBy(sec.asc(), F.col(tiebreak_col).asc())
    prev = F.lag(sec).over(w)
    return (
        df.withColumn("__prev_s", prev)
        .withColumn("__cur_s", sec)
        .filter(
            F.col("__prev_s").isNull()
            | (F.col("__cur_s") - F.col("__prev_s") > tolerance_seconds)
        )
        .drop("__prev_s", "__cur_s")
    )


def duplicated_span_coverage(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    dp: int = 6,
) -> DataFrame:
    """Substring-level duplication coverage — the measurement behind
    "dedup exact substrings, not just documents" (Lee et al. 2021,
    Deduplicating Training Data Makes Language Models Better): for each
    document, the fraction of its tokens covered by some ``n``-token
    gram that occurs MORE THAN ONCE in the corpus. Document-level dedup
    misses boilerplate, quotes, and templated spans shared across
    otherwise-distinct pages; this is the per-document meter that finds
    them (a near-1.0 score on a "unique" doc means it is stitched from
    repeated material).

    Plan: tokenize -> explode gram START positions (one row per token,
    same volume as MinHash shingling) -> corpus-wide gram count keeps
    grams with count > 1 (map-side combined) -> semi-join marks each
    duplicated occurrence as the span [s, s+n) -> per-document interval
    UNION via one (id)-partitioned window (contribution = span end
    minus the running max end of earlier spans, clipped at 0) so
    overlapping spans never double-count. Per-doc state is one sorted
    span list inside a window — no document ever needs more than its
    own spans in memory; the gram aggregate is the only corpus-wide
    shuffle, the same shape every shingle op here carries.

    Returns (id, n_tokens, covered_tokens, dup_coverage) for EVERY
    input document (no-dup and shorter-than-n docs score 0.0).
    """
    from pyspark.sql.window import Window

    from stockpy_spark.functions.text import tokenize

    base = df.select(
        F.col(id_col).alias("__id"), tokenize(text_col).alias("__t")
    ).withColumn("__nt", F.size("__t"))
    grams = base.where(F.col("__nt") >= n).select(
        "__id",
        F.explode(F.sequence(F.lit(0), F.col("__nt") - n)).alias("s"),
        F.col("__t").alias("__t"),
    ).select(
        "__id",
        "s",
        F.concat_ws(" ", F.slice("__t", F.col("s") + 1, n)).alias("gram"),
    )
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") > 1)
        .select("gram")
    )
    occ = grams.join(dup_grams, "gram", "left_semi").select(
        "__id", "s", (F.col("s") + n).alias("e")
    )
    w = (
        Window.partitionBy("__id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    covered = (
        occ.withColumn("__pmax", F.max("e").over(w))
        .select(
            "__id",
            F.greatest(
                F.lit(0),
                F.col("e")
                - F.greatest(F.col("s"), F.coalesce("__pmax", F.col("s"))),
            ).alias("__add"),
        )
        .groupBy("__id")
        .agg(F.sum("__add").alias("covered_tokens"))
    )
    return base.join(covered, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.col("__nt").cast("long").alias("n_tokens"),
        F.coalesce("covered_tokens", F.lit(0)).cast("long").alias(
            "covered_tokens"
        ),
        F.round(
            F.when(F.col("__nt") == 0, F.lit(0.0)).otherwise(
                F.coalesce("covered_tokens", F.lit(0))
                / F.col("__nt").cast("double")
            ),
            dp,
        ).alias("dup_coverage"),
    )


def remove_duplicated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
) -> DataFrame:
    """The INTERVENTION behind :func:`duplicated_span_coverage` (Lee et
    al. 2021's ExactSubstr dedup, token-granular): cut every span of
    tokens covered by an ``n``-gram occurring more than once in the
    corpus out of each document and reassemble the survivors in order.
    Document-level dedup deletes whole near-twins; this deletes the
    boilerplate, quoted, and templated SPANS that remain inside
    otherwise-unique documents — the operation, not just the meter.

    Plan: the meter's gram machinery verbatim (tokenize -> gram-start
    explode -> corpus count > 1, map-side combined -> semi-join marks
    occurrences [s, s+n)) -> merge overlapping/adjacent spans per doc
    with the classic two-window pass (running max end marks
    merge-group starts; a running sum numbers the groups; group
    min/max are the merged intervals) -> ONE builtin ``aggregate``
    expression walks each doc's sorted merged intervals and
    concatenates the uncovered slices (gap before each interval, tail
    after the last) — no per-token explode, no Python in the loop. A
    doc is one row end-to-end after the gram aggregate; per-doc state
    is its own merged-interval list, document-sized.

    Returns (id, n_tokens, kept_tokens, removed_tokens, text_kept) for
    EVERY input document; docs with nothing duplicated pass through
    with their (whitespace-normalized) token stream intact.
    """
    from pyspark.sql.window import Window

    from stockpy_spark.functions.text import tokenize

    base = df.select(
        F.col(id_col).alias("__id"), tokenize(text_col).alias("__t")
    ).withColumn("__nt", F.size("__t"))
    grams = base.where(F.col("__nt") >= n).select(
        "__id",
        F.explode(F.sequence(F.lit(0), F.col("__nt") - n)).alias("s"),
        F.col("__t").alias("__t"),
    ).select(
        "__id",
        "s",
        F.concat_ws(" ", F.slice("__t", F.col("s") + 1, n)).alias("gram"),
    )
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") > 1)
        .select("gram")
    )
    occ = grams.join(dup_grams, "gram", "left_semi").select(
        "__id", "s", (F.col("s") + n).alias("e")
    )
    w_prev = (
        Window.partitionBy("__id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("__id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = (
        occ.withColumn("__pmax", F.max("e").over(w_prev))
        .withColumn(
            "__new",
            F.when(
                F.col("__pmax").isNull() | (F.col("s") > F.col("__pmax")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("__grp", F.sum("__new").over(w_run))
        .groupBy("__id", "__grp")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
        .groupBy("__id")
        .agg(
            F.sort_array(F.collect_list(F.struct("ms", "me"))).alias("__spans")
        )
    )
    acc0 = F.struct(
        F.lit(0).alias("prev"), F.array().cast("array<string>").alias("keep")
    )
    kept = base.join(merged, "__id", "left").select(
        "__id",
        "__nt",
        F.aggregate(
            F.coalesce("__spans", F.array().cast("array<struct<ms:int,me:int>>")),
            acc0,
            lambda acc, sp: F.struct(
                sp["me"].alias("prev"),
                F.concat(
                    acc["keep"],
                    F.slice(
                        "__t", acc["prev"] + 1, sp["ms"] - acc["prev"]
                    ),
                ).alias("keep"),
            ),
            lambda acc: F.concat(
                acc["keep"],
                F.slice("__t", acc["prev"] + 1, F.col("__nt") - acc["prev"]),
            ),
        ).alias("__keep"),
    )
    return kept.select(
        F.col("__id").alias(id_col),
        F.col("__nt").cast("long").alias("n_tokens"),
        F.size("__keep").cast("long").alias("kept_tokens"),
        (F.col("__nt") - F.size("__keep")).cast("long").alias("removed_tokens"),
        F.concat_ws(" ", "__keep").alias("text_kept"),
    )
