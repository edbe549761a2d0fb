"""Gopher-style within-document repetition battery (Rae et al. 2021,
"Scaling Language Models: ... Gopher", Appendix A quality filters).

The corpus-level span family (``dedup.duplicated_span_coverage`` /
``remove_duplicated_spans``) finds text repeated ACROSS documents; the
Gopher repetition rules score text a document repeats WITHIN itself —
the listing-spam / keyword-stuffing / template-loop signal used to
filter web corpora before training. The two char-weighted families
here are the ones the shelf lacked:

- ``top{n}_char_frac`` (n = 2, 3, 4): fraction of the document's
  characters covered by occurrences of its single MOST FREQUENT word
  n-gram (ties broken to the lexicographically smallest gram, so the
  statistic is deterministic);
- ``dup{n}_char_frac`` (n = 5, 10): fraction of characters covered by
  word n-grams occurring MORE THAN ONCE in the document.

Character accounting follows the paper's "taking care not to count
characters twice": overlapping occurrences are interval-UNIONED over
token positions, and a covered position contributes its token's
length. "Characters" are token characters (inter-token whitespace
excluded) of the lowercased whitespace tokenization — an exact,
engine-portable definition.

Scale shape: every statistic is a pure array-expression computation on
the document's own token array — transform / filter / aggregate
higher-order functions. ZERO shuffle, zero explode, zero Python: the
operator is a narrow map over the corpus, so at 100 TB it scales with
scan bandwidth and never re-keys the data (the per-doc groupBy
alternative would shuffle the entire corpus by doc_id for state the
size of one document).

Evaluation-cost design note (the first draft's lesson): Catalyst does
NOT common-subexpression-eliminate inside higher-order-function
lambdas, so an expression like ``array_min(filter(distinct, g ->
count_of(g) == max_cnt))`` re-evaluates the O(nt^2) ``max_cnt`` tree
for EVERY lambda element — O(nt^3) per document, which turned a
500-doc sf0.01 run into minutes. The fix is structural: each
intermediate (gram array, per-position count array, max count, best
gram, occurrence starts) is materialized as a named column in its own
chained ``select``, so Spark evaluates it once per row and later
lambdas reference the row value. CollapseProject will not inline a
non-cheap producer referenced more than once, so the stages stay
one-pass; per-doc cost is bounded O(nt^2) (the count pass) —
document-sized, independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _grams(toks: Column, nt: Column, n: int) -> Column:
    """Array of the document's word n-grams (space-joined), empty when
    the doc has fewer than n tokens."""
    return F.when(nt < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), nt - F.lit(n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + F.lit(j)) for j in range(n)]
            ),
        )
    )


def _union_char_coverage(starts: Column, lens: Column, n: int) -> Column:
    """Characters covered by the union of fixed-length-``n`` token
    intervals starting at ``starts`` (0-based, ASSUMED SORTED
    ascending — sequence/filter preserve order). Each interval
    [s, s+n) contributes the lengths of its tokens not already covered
    by an earlier interval: the running-max accumulator walks the
    sorted starts once, summing slice(lens) over the uncovered tail of
    each interval — the same interval-union arithmetic as
    ``dedup.duplicated_span_coverage``, char-weighted."""
    return F.aggregate(
        starts,
        F.struct(F.lit(0).alias("prev"), F.lit(0).cast("long").alias("chars")),
        lambda acc, s: F.struct(
            F.greatest(acc["prev"], s + F.lit(n)).alias("prev"),
            (
                acc["chars"]
                + F.coalesce(
                    F.aggregate(
                        F.slice(
                            lens,
                            F.greatest(s, acc["prev"]) + 1,
                            F.greatest(
                                F.lit(0),
                                s + F.lit(n) - F.greatest(s, acc["prev"]),
                            ),
                        ),
                        F.lit(0).cast("long"),
                        lambda a, x: a + x,
                    ),
                    F.lit(0).cast("long"),
                )
            ).alias("chars"),
        ),
        lambda acc: acc["chars"],
    )


def gopher_repetition_profile(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
    dp: int = 6,
) -> DataFrame:
    """Per-document Gopher repetition statistics (module docstring):
    (id, n_tokens, total_chars, top{n}_char_frac ..., dup{n}_char_frac
    ...) for EVERY input row; docs too short for a given n (or empty)
    score 0.0 on that statistic."""
    toks = F.when(
        F.col(text_col).isNull() | (F.trim(text_col) == ""),
        F.array().cast("array<string>"),
    ).otherwise(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))

    base = df.select(
        F.col(id_col).alias("__id"), toks.alias("__t")
    ).select(
        "__id",
        "__t",
        F.size("__t").alias("__nt"),
        F.transform("__t", lambda x: F.length(x).cast("long")).alias("__lens"),
    ).select(
        "*",
        F.aggregate(
            "__lens", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("__tot"),
    )

    nt = F.col("__nt")
    all_ns = sorted(set(top_ns) | set(dup_ns))

    # Stage 1: materialize each gram array once per row.
    stage = base.select(
        "*",
        *[
            _grams(F.col("__t"), nt, n).alias(f"__g{n}")
            for n in all_ns
        ],
    )

    # Stage 2: per-position occurrence counts — the one O(nt^2) pass.
    def _counts(n: int) -> Column:
        g = F.col(f"__g{n}")
        return F.transform(g, lambda x: F.size(F.filter(g, lambda y: y == x)))

    stage = stage.select(
        "*", *[_counts(n).alias(f"__c{n}") for n in all_ns]
    )

    # Stage 3: for the top-gram family, materialize the winning gram
    # (count DESC, gram ASC — when() without otherwise yields NULLs
    # that array_min skips, so the min runs over max-count grams only;
    # array_max re-evaluates per element but over the MATERIALIZED
    # count array, so this stage is O(nt^2) worst-case, not O(nt^3)).
    def _best(n: int) -> Column:
        c = F.col(f"__c{n}")
        return F.array_min(
            F.zip_with(
                f"__g{n}", f"__c{n}",
                lambda g, cnt: F.when(cnt == F.array_max(c), g),
            )
        )

    stage = stage.select(
        "*", *[_best(n).alias(f"__best{n}") for n in top_ns]
    )

    # Stage 4: occurrence-start arrays (0-based starts into the token
    # stream), guarded so short docs never index past the gram array.
    def _top_starts(n: int) -> Column:
        g = F.col(f"__g{n}")
        return F.when(nt < n, F.array().cast("array<int>")).otherwise(
            F.filter(
                F.sequence(F.lit(0), nt - F.lit(n)),
                lambda s: F.element_at(g, s + 1) == F.col(f"__best{n}"),
            )
        )

    def _dup_starts(n: int) -> Column:
        c = F.col(f"__c{n}")
        return F.when(nt < n, F.array().cast("array<int>")).otherwise(
            F.filter(
                F.sequence(F.lit(0), nt - F.lit(n)),
                lambda s: F.element_at(c, s + 1) > 1,
            )
        )

    stage = stage.select(
        "*",
        *[_top_starts(n).alias(f"__ts{n}") for n in top_ns],
        *[_dup_starts(n).alias(f"__ds{n}") for n in dup_ns],
    )

    # Stage 5: interval-union char coverage -> fractions.
    tot = F.col("__tot")

    def _frac(starts_col: str, n: int) -> Column:
        return F.when((nt < n) | (tot == 0), F.lit(0.0)).otherwise(
            _union_char_coverage(
                F.col(starts_col), F.col("__lens"), n
            ).cast("double")
            / tot.cast("double")
        )

    cols = [
        F.col("__id").alias(id_col),
        nt.cast("long").alias("n_tokens"),
        tot.alias("total_chars"),
    ]
    for n in top_ns:
        cols.append(F.round(_frac(f"__ts{n}", n), dp).alias(f"top{n}_char_frac"))
    for n in dup_ns:
        cols.append(F.round(_frac(f"__ds{n}", n), dp).alias(f"dup{n}_char_frac"))

    return stage.select(*cols)


# The 8 words Gopher's "required stopwords" rule checks for (Rae et al.
# 2021, App. A: a document must contain at least 2 of these).
GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_rules(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    max_symbol_ratio: float = 0.1,
    min_stop_hits: int = 2,
    dp: int = 6,
) -> DataFrame:
    """The Gopher document-quality rule battery (Rae et al. 2021 App. A
    — the line- and word-shape gates, complementing the repetition
    battery above and the token-ratio features in functions/text.py):

    - ``bullet_line_frac``: lines starting with a bullet ("- "/"• ");
    - ``ellipsis_line_frac``: lines ending with "...";
    - ``alpha_word_frac``: words containing >= 1 ASCII letter;
    - ``symbol_word_ratio``: ('#' chars + non-overlapping "..."
      occurrences) / words;
    - ``mean_word_len``; ``stop_hits`` = how many of the paper's 8
      required stopwords appear; and ``keep`` (int 0/1) = all gates at
      the paper's default thresholds.

    Same scale shape as :func:`gopher_repetition_profile`: zero
    shuffle, zero explode, one narrow pass; intermediates (lines,
    words) are materialized per select stage so no lambda re-derives
    them per element. Lines are ``\\n``-separated; words are the
    whitespace tokens of the raw text (newlines included in ``\\s``).
    Every input row gets an output row; empty/NULL docs score 0 on
    every fraction and fail ``keep`` on the min-words gate."""
    feats, keep = _gopher_gate(
        df.select(F.col(id_col).alias("__id"), F.col(text_col)),
        text_col,
        ["__id"],
        min_words, max_words, min_mean_word_len, max_mean_word_len,
        max_bullet_frac, max_ellipsis_frac, min_alpha_frac,
        max_symbol_ratio, min_stop_hits, dp,
    )
    return feats.select(
        F.col("__id").alias(id_col),
        "n_lines",
        "n_words",
        "bullet_line_frac",
        "ellipsis_line_frac",
        "alpha_word_frac",
        "symbol_word_ratio",
        "mean_word_len",
        "stop_hits",
        keep.cast("int").alias("keep"),
    )


def gopher_keep_filter(
    df: DataFrame,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    max_symbol_ratio: float = 0.1,
    min_stop_hits: int = 2,
    dp: int = 6,
) -> DataFrame:
    """``df`` filtered to the rows :func:`gopher_quality_rules` would
    flag ``keep == 1`` — same gates, built by the SAME expression
    builder (bit-identical by construction), applied as a narrow
    filter instead of computing a (id, keep) frame and equi-joining it
    back onto the very frame it came from. The rule battery is
    zero-shuffle, so for the "keep the survivors of this frame" use
    (the release pipeline's Gopher stage) the join formulation pays
    two data-sized exchanges for nothing (guide §2.4). Caller columns
    must not collide with the gate's internals (``__txt``/``__lines``/
    ``__words`` and the feature names); column order is preserved."""
    feats, keep = _gopher_gate(
        df, text_col, list(df.columns),
        min_words, max_words, min_mean_word_len, max_mean_word_len,
        max_bullet_frac, max_ellipsis_frac, min_alpha_frac,
        max_symbol_ratio, min_stop_hits, dp,
    )
    return feats.where(keep).select(*df.columns)


def _gopher_gate(
    df: DataFrame,
    text_col: str,
    carry: list,
    min_words: int,
    max_words: int,
    min_mean_word_len: float,
    max_mean_word_len: float,
    max_bullet_frac: float,
    max_ellipsis_frac: float,
    min_alpha_frac: float,
    max_symbol_ratio: float,
    min_stop_hits: int,
    dp: int,
) -> tuple:
    """Shared staged builder for the Gopher gate: returns ``(feats,
    keep)`` where ``feats`` carries the ``carry`` columns plus the
    eight feature columns and ``keep`` is the boolean gate over them.
    Both public entry points above delegate here so the filter and
    the feature-frame forms can never drift apart."""
    base = df.select(
        *[F.col(c) for c in carry],
        F.coalesce(F.col(text_col), F.lit("")).alias("__txt"),
    ).select(
        *[F.col(c) for c in carry],
        "__txt",
        F.when(
            F.trim("__txt") == "", F.array().cast("array<string>")
        ).otherwise(F.split("__txt", "\n")).alias("__lines"),
        F.when(
            F.trim("__txt") == "", F.array().cast("array<string>")
        ).otherwise(F.split(F.trim("__txt"), r"\s+")).alias("__words"),
    )

    nl, nw = F.size("__lines"), F.size("__words")
    safe_nl = F.greatest(nl, F.lit(1)).cast("double")
    safe_nw = F.greatest(nw, F.lit(1)).cast("double")
    txt = F.col("__txt")

    bullet = F.size(
        F.filter(
            "__lines",
            lambda l: l.startswith("- ") | l.startswith("• "),
        )
    )
    ellips = F.size(F.filter("__lines", lambda l: l.endswith("...")))
    alpha = F.size(F.filter("__words", lambda w: w.rlike("[a-zA-Z]")))
    hash_chars = F.length(txt) - F.length(F.regexp_replace(txt, "#", ""))
    dots3 = (
        F.length(txt) - F.length(F.replace(txt, F.lit("...")))
    ) / F.lit(3)
    word_chars = F.aggregate(
        F.transform("__words", lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    stop_hits = sum(
        F.when(F.array_contains("__words", s), 1).otherwise(0)
        for s in GOPHER_REQUIRED_STOPWORDS
    )

    feats = base.select(
        *[F.col(c) for c in carry],
        nl.cast("long").alias("n_lines"),
        nw.cast("long").alias("n_words"),
        F.round(bullet / safe_nl, dp).alias("bullet_line_frac"),
        F.round(ellips / safe_nl, dp).alias("ellipsis_line_frac"),
        F.round(alpha / safe_nw, dp).alias("alpha_word_frac"),
        F.round((hash_chars + dots3) / safe_nw, dp).alias("symbol_word_ratio"),
        F.round(word_chars / safe_nw, dp).alias("mean_word_len"),
        stop_hits.cast("int").alias("stop_hits"),
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("bullet_line_frac") <= max_bullet_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_frac)
        & (F.col("alpha_word_frac") >= min_alpha_frac)
        & (F.col("symbol_word_ratio") <= max_symbol_ratio)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return feats, keep


def gopher_repetition_profile_kernel(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
    dp: int = 6,
) -> DataFrame:
    """Arrow-batched twin of :func:`gopher_repetition_profile` —
    identical output, different execution. The expression path's
    per-position count pass is O(nt^2) per document AND every HOF is
    CodegenFallback (interpreted per element — this operator has been
    the corpus-worst CPU query since r11); the kernel computes the
    same statistics per document in plain Python with a Counter
    (O(nt) counting) inside one ``mapInPandas`` pass — Arrow-batched,
    still a ZERO-shuffle narrow map with document-sized state.

    Parity is exact by construction, not approximate: every
    intermediate is integer arithmetic (token lengths, interval
    unions, counts) and the final division is the same two exact
    longs, rounded HALF_UP at ``dp`` via Decimal — bit-for-bit the
    `BigDecimal.setScale(dp, HALF_UP)` Spark's ``round`` applies
    (pinned by tests/test_r6c_ops.py's kernel-parity case over the
    real corpus and the hand fixtures)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    id_type = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("n_tokens", LongType()),
            StructField("total_chars", LongType()),
        ]
        + [StructField(f"top{n}_char_frac", DoubleType()) for n in top_ns]
        + [StructField(f"dup{n}_char_frac", DoubleType()) for n in dup_ns]
    )
    cols = [f.name for f in out_schema.fields]
    all_ns = sorted(set(top_ns) | set(dup_ns))

    def gen(batches):
        import re
        from collections import Counter
        from decimal import ROUND_HALF_UP, Decimal

        import pandas as pd

        quantum = Decimal(1).scaleb(-dp)
        # Java-regex \s is ASCII-only ([ \t\n\x0b\f\r]) and Spark's
        # trim strips ONLY ASCII space (0x20) — Python's .strip()/
        # .split() are Unicode-whitespace (NBSP, thin space, \x1c-\x1f
        # as separators) and would tokenize web text differently.
        # After a space-only trim, leading/trailing \t etc. produce
        # empty edge tokens under split's limit=-1 — exactly as the
        # expression path counts them.
        ws = re.compile(r"[ \t\n\x0b\f\r]+")

        def tokens(text):
            if not isinstance(text, str):
                return []
            if text.strip(" ") == "":
                return []  # the expression path's trim(col)=='' branch
            return ws.split(text.lower().strip(" "))

        def rnd(x: float) -> float:
            # Spark round() goes through BigDecimal.valueOf(double) =
            # the SHORTEST decimal repr (Double.toString); Decimal(x)
            # on the raw float is the exact binary expansion, which
            # disagrees HALF_UP at dp-digit ties (1/3200 = 0.0003125
            # shortest, 0.000312499999...98 exact). repr() is Python's
            # shortest round-trip repr — the BigDecimal.valueOf twin.
            return float(
                Decimal(repr(x)).quantize(quantum, rounding=ROUND_HALF_UP)
            )

        def coverage(starts, lens, n):
            prev = 0
            chars = 0
            for s in starts:  # starts ascending by construction
                lo = max(s, prev)
                hi = s + n
                if hi > lo:
                    chars += sum(lens[lo:hi])
                    prev = hi
            return chars

        for pdf in batches:
            out = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = tokens(text)
                nt = len(toks)
                lens = [len(t) for t in toks]
                tot = sum(lens)
                row = [did, nt, tot]
                grams = {}
                counts = {}
                for n in all_ns:
                    g = (
                        [" ".join(toks[i : i + n]) for i in range(nt - n + 1)]
                        if nt >= n
                        else []
                    )
                    grams[n] = g
                    counts[n] = Counter(g)
                for n in top_ns:
                    if nt < n or tot == 0:
                        row.append(0.0)
                        continue
                    mx = max(counts[n].values())
                    best = min(g for g, c in counts[n].items() if c == mx)
                    starts = [i for i, g in enumerate(grams[n]) if g == best]
                    row.append(rnd(coverage(starts, lens, n) / tot))
                for n in dup_ns:
                    if nt < n or tot == 0:
                        row.append(0.0)
                        continue
                    cn = counts[n]
                    starts = [
                        i for i, g in enumerate(grams[n]) if cn[g] > 1
                    ]
                    row.append(rnd(coverage(starts, lens, n) / tot))
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return df.select(id_col, text_col).mapInPandas(gen, out_schema)
