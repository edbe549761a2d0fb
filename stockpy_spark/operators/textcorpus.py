"""Corpus-level text cleaning that needs CROSS-document state.

The ops in ``functions/text.py`` and ``operators/textstats.py`` score a
document from its own content; web-corpus curation also needs stages
where a document's fate depends on the whole corpus. The canonical one
is frequent-line removal (C4's "three-sentence" rule, RefinedWeb's
line-wise filter): a line that recurs across many distinct pages is
boilerplate (nav bars, cookie banners, license footers) and is deleted
from every document, preserving the rest of each document in order.

Reference repo has no corpus-state surface (its text path is per-row
pandas transforms, scripts/transform_news_job.py); this is an extension
from the 100 TB training-pipeline north star.

Scale shape (the whole point of the op): one wide groupBy on the line
itself to get corpus document-frequency, then an aggregate-filtered
join back. Both sides of that join are partitioned by ``line`` by the
groupBy that produced them, so AQE plans a shuffle the exploded frame
already paid for; nothing is ever collected. The rebuilt document is
an in-order concat per doc — document-sized state, never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_lines(
    df: DataFrame, id_col: str, text_col: str, sep: str = "\n"
) -> DataFrame:
    """One row per (doc, position, line), line order preserved via
    ``pos``. Narrow (generator expand, no shuffle).

    NULL text coalesces to '' FIRST: ``posexplode(split(NULL))``
    yields zero rows, which would silently delete the document from
    every downstream grouped rebuild — breaking the "returns EVERY
    input document" contract of :func:`boilerplate_line_screen` and
    :func:`dedup_lines_within_doc` (r12 advisor finding). A NULL-text
    doc is one empty line, same as an empty-string doc.
    """
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), sep)
        ).alias("pos", "line"),
    )


def remove_frequent_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    max_doc_freq: int = 1,
    keep_empty_docs: bool = False,
) -> DataFrame:
    """Delete every line that occurs in more than ``max_doc_freq``
    DISTINCT documents; return (id, cleaned text) with surviving lines
    re-joined in their original order.

    Three relational stages:

    1. explode: (doc, pos, line) — narrow.
    2. doc-frequency: groupBy(line) -> count(DISTINCT doc). Partial
       (map-side) aggregation absorbs within-document repeats before
       the shuffle, so a page that repeats its own banner 1000x still
       ships one (line, doc) pair per partition.
    3. filter-join + rebuild: lines left-semi-join the under-threshold
       frequency set on ``line`` (both sides exit stage 2 partitioned
       by line — AQE reuses the exchange rather than re-shuffling),
       then groupBy(doc) re-concats in ``pos`` order via an array_sort
       over (pos, line) structs — collect_list order is not
       deterministic, the sort makes it so.

    Documents whose every line was boilerplate vanish from the output
    (C4 drops them too) unless ``keep_empty_docs``, which left-joins
    the survivors back onto the input ids with an empty-string text.

    100 TB note: the doc-frequency frame is corpus-sized and must NOT
    be broadcast (a Zipf head is small but the threshold set here is
    the *tail*, which is huge); the semi-join on the already-hashed
    line key is the scalable shape. State per task is one document's
    lines (array_sort), never the corpus.
    """
    lines = explode_lines(df, id_col, text_col, sep)
    keep = (
        lines.groupBy("line")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .filter(F.col("__df") <= max_doc_freq)
        .select("line")
    )
    kept = lines.join(keep, "line", "left_semi")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias(text_col)
    )
    if keep_empty_docs:
        rebuilt = (
            df.select(id_col)
            .join(rebuilt, id_col, "left")
            .withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
        )
    return rebuilt


def boilerplate_line_screen(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    min_tokens: int = 4,
    min_stop: float = 0.05,
    long_line: int = 30,
    carry: list | None = None,
) -> DataFrame:
    """Per-line boilerplate removal — the jusText-style HEURISTIC
    sibling of :func:`remove_frequent_lines`: that rule needs corpus
    state (a line is boilerplate because MANY pages share it); this one
    drops lines whose own shape says navigation chrome, and the two
    compose — frequency catches the site-wide banner, shape catches
    the one-off "Home | About | Contact" a single page invented.

    A line is boilerplate when:

    - it has fewer than ``min_tokens`` tokens (breadcrumbs, buttons,
      bare dates), or
    - its stopword ratio is below ``min_stop`` AND it is shorter than
      ``long_line`` tokens (menu/keyword soup reads as function-word-
      free; LONG low-stopword lines are kept — code and tables are a
      quality-gate judgment, not chrome).

    Returns EVERY input document: (id, text with surviving lines
    re-joined in order, n_lines, n_kept, boiler_ratio). A fully-
    boilerplate document keeps an empty text (its ratio says why) —
    dropping documents is the caller's policy, this op is a transform
    plus the report that justifies it.

    Scale shape: ZERO shuffles. Every rule reads one line in
    isolation, so the whole screen is a higher-order ``filter`` over
    the doc's own split-line array — the document never leaves its
    scan partition. (Until r16 this was posexplode + a doc-keyed
    rebuild aggregate: one full shuffle of the corpus TEXT just to
    re-concatenate lines a narrow ``filter`` keeps in place — at
    100 TB that exchange is the entire corpus crossing the network
    for nothing. Guide §2.4; r16 measured the clean-chain pin of
    pipeline_data_release dropping with the exchange.)
    """
    from stockpy_spark.functions.text import ENGLISH_STOPWORDS, tokenize

    def _keep(line):
        toks = tokenize(line)
        n = F.size(toks)
        stop_hits = F.size(
            F.filter(toks, lambda t: F.lower(t).isin(*ENGLISH_STOPWORDS))
        )
        ratio = stop_hits / F.greatest(n, F.lit(1)).cast("double")
        return (n >= min_tokens) & ~((ratio < min_stop) & (n < long_line))

    # df[text_col] (bound attribute), NOT F.col(text_col): the select
    # below aliases its rebuilt text AS text_col, and Spark 3.4+
    # lateral column alias resolution would re-bind an unbound name in
    # the LATER select items to that alias — the counts would then be
    # computed over the already-screened text (caught by test_r6c_ops
    # when this was first written with F.col).
    arr = F.split(F.coalesce(df[text_col], F.lit("")), sep)
    kept = F.filter(arr, _keep)
    n_lines = F.size(arr).cast("bigint")
    n_kept = F.size(kept).cast("bigint")
    return df.select(
        F.col(id_col),
        # r17 ``carry``: pass-through columns, so callers cleaning a
        # frame that carries metadata (the release pipeline's
        # ``source``) need no re-attach self-join afterwards
        *[F.col(c) for c in (carry or [])],
        F.array_join(kept, sep).alias(text_col),
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept"),
        F.round(
            1.0 - n_kept / n_lines.cast("double"), 6
        ).alias("boiler_ratio"),
    )


def dedup_lines_within_doc(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    carry: list | None = None,
) -> DataFrame:
    """Intra-document repeated-line removal — the WITHIN-doc member of
    the line-cleaning trio (corpus frequency rule, per-line shape
    screen, and this): scraped pages repeat their own header/footer/nav
    block once per template include, and a repeated line inside ONE
    document is boilerplate evidence that needs no corpus state at
    all. Keeps each distinct line's FIRST occurrence (document order
    preserved), drops the repeats, and reports how many lines the doc
    lost.

    Returns every input document: (id, text, n_lines, n_dropped).
    Blank lines are treated like any other line (a run of blanks
    collapses to one — the common template artifact).

    Scale shape: ZERO shuffles. "Keep each line's first occurrence"
    depends only on the document's OWN line array, so it is a
    higher-order ``filter`` keeping position ``i`` exactly when
    ``array_position`` (first index of that line) equals ``i`` — the
    document never leaves its scan partition. (Until r16 this was
    posexplode + a (doc, line) min-pos aggregate + a doc-keyed
    rebuild: TWO full shuffles of the corpus text to recompute an
    intra-row property — guide §2.4. ``array_position`` makes the
    filter O(lines²) per doc on line COUNT, not bytes; web documents
    have tens-to-hundreds of lines, and the quadratic term would need
    ~10⁵ lines in ONE document to rival the per-byte cost the removed
    exchanges paid on every document.)
    """
    # df[text_col] (bound attribute), NOT F.col(text_col): see the
    # lateral-column-alias note in boilerplate_line_screen.
    arr = F.split(F.coalesce(df[text_col], F.lit("")), sep)
    kept = F.filter(
        arr, lambda x, i: F.array_position(arr, x) == (i + F.lit(1))
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (carry or [])],  # r17: see boilerplate_line_screen
        F.array_join(kept, sep).alias(text_col),
        F.size(kept).cast("bigint").alias("n_lines"),
        (F.size(arr) - F.size(kept)).cast("bigint").alias("n_dropped"),
    )
