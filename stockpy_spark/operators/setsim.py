"""Exact set-similarity self-join with prefix filtering — the EXACT
counterpart of the MinHash/LSH near-dup path (operators/dedup.py).

LSH answers "probably similar" with tunable recall; a curation pipeline
that must certify *exact* Jaccard >= t (contracts, eval-set hygiene,
legal dedup) needs the all-pairs-equivalent join without the all-pairs
cost. The standard solution is prefix filtering (Chaudhuri et al.,
"A Primitive Operator for Similarity Joins", ICDE 2006; Xiao et al.,
"Efficient Similarity Joins for Near Duplicate Detection", WWW 2008 —
PPJoin): order every record's token set by a GLOBAL total order
(ascending document frequency, so prefixes hold the rarest tokens),
keep only the first p = s - ceil(t*s) + 1 tokens, and observe that two
sets with Jaccard >= t MUST share at least one prefix token. Candidate
generation becomes an equi-join on prefix tokens; exact verification
runs only on candidates.

Spark-first shape (vs the papers' single-node inverted index):

1. explode distinct tokens, one groupBy for document frequency;
2. the global order needs NO global rank — the (df, token) pair itself
   is the sort key, and each record sorts ITS OWN tokens with
   ``sort_array`` (document-sized state, no unpartitioned window over
   the vocabulary);
3. prefix explode -> self equi-join on the token, ``id_a < id_b`` to
   emit each unordered pair once, plus the length filter
   (t*s_a <= s_b AND t*s_b <= s_a — a pair violating it cannot reach
   Jaccard t) -> distinct candidate pairs;
4. verification joins the two full (sorted, distinct) token arrays
   back by id and computes exact |A∩B| via ``array_intersect`` —
   per-pair work linear in the set sizes, never a nested loop.

Shuffles: df groupBy, per-doc sort groupBy, prefix self-join, pair
distinct, two id joins — all hash equi-exchanges on bounded keys. The
quadratic blowup of all-pairs never materializes; candidate volume is
bounded by prefix-token document frequencies (rarest-first ordering
minimizes exactly that, the papers' core insight).

Float safety: the prefix length uses ceil over a double product, which
can land one off the exact rational ceil when t*s is integral; a +1
slack token makes the prefix a superset of the provably-complete one
under any <1-ulp slip (extra candidates only — verification keeps the
join exact). Jaccard itself is a single bigint/bigint double division,
bit-identical on any IEEE engine, so the >= t comparison and the
rounded output replay exactly.

The reference has no similarity join of any kind; this is the exact
tier of the LLM-pipeline dedup brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stockpy_spark.functions.text import tokenize


def jaccard_similarity_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    dp: int = 6,
) -> DataFrame:
    """All unordered pairs (id_a < id_b) of documents whose DISTINCT
    lowercase-token sets have exact Jaccard >= ``threshold``.

    Returns (id_a, id_b, n_inter, n_union, jaccard) with jaccard
    rounded to ``dp`` (the comparison runs on the unrounded exact
    double). Empty documents never pair.

    At corpus scale the candidate count is governed by the prefix
    tokens' document frequencies: on organic text the rarest ~(1-t)*s
    tokens of a document are near-unique and candidates stay close to
    the true result size. A low-entropy corpus (tiny vocabulary — e.g.
    the synthetic test tables) degrades toward more candidates, which
    costs time, never correctness.
    """
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(tokenize(F.lower(F.col(text_col))))
        ).alias("w"),
    )
    dfreq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("dfq"))
    # per-record token array in global (dfq, w) order; carries the full
    # sorted set so verification can join it back without re-tokenizing
    ordered = (
        tok.join(dfreq, "w")
        .groupBy("id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dfq", "w"))),
                lambda s: s["w"],
            ).alias("toks")
        )
        .withColumn("s", F.size("toks"))
    )
    # prefix length: provably complete at s - ceil(t*s) + 1; +1 slack
    # absorbs any float-ceil slip on integral t*s (see module doc)
    p = F.least(
        F.col("s"),
        (
            F.col("s")
            - F.ceil(F.lit(threshold) * F.col("s")).cast("int")
            + F.lit(2)
        ),
    )
    pref = ordered.select(
        "id", "s", F.explode(F.slice("toks", 1, p)).alias("w")
    )
    a, b = pref.alias("a"), pref.alias("b")
    t = F.lit(threshold)
    cand = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.id") < F.col("b.id"))
            & (t * F.col("a.s") <= F.col("b.s"))
            & (t * F.col("b.s") <= F.col("a.s")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sets = ordered.select("id", "toks", "s")
    ver = (
        cand.join(
            sets.select(
                F.col("id").alias("id_a"),
                F.col("toks").alias("ta"),
                F.col("s").alias("sa"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col("id").alias("id_b"),
                F.col("toks").alias("tb"),
                F.col("s").alias("sb"),
            ),
            "id_b",
        )
        .withColumn("n_inter", F.size(F.array_intersect("ta", "tb")))
        .withColumn("n_union", F.col("sa") + F.col("sb") - F.col("n_inter"))
        .withColumn("jac", F.col("n_inter") / F.col("n_union"))
        .filter(F.col("jac") >= t)
    )
    return ver.select(
        "id_a",
        "id_b",
        F.col("n_inter").cast("long").alias("n_inter"),
        F.col("n_union").cast("long").alias("n_union"),
        F.round("jac", dp).alias("jaccard"),
    )
