"""URL / domain-level corpus filtering — the stage every web-scale
pretraining pipeline runs BEFORE content-level quality (RefinedWeb,
C4, Gopher all do URL filtering first: it is the cheapest signal and
needs no document decode).

Three pieces:

- :func:`extract_host` / :func:`registrable_domain` — parse the host
  out of a URL and reduce it to its registrable domain (last two
  labels — the public-suffix list is a lookup TABLE in production;
  the two-label fallback is the standard no-PSL approximation and is
  what the oracle replays);
- :func:`blocklist_screen` — broadcast anti-screen against a host
  blocklist (UT1-style). The list is KB-to-MB sized at 100 TB, so it
  broadcasts; the screen is a narrow map, never a shuffle;
- :func:`domain_diversity_cap` — keep at most ``max_per_domain`` docs
  per registrable domain, chosen by a DETERMINISTIC md5 shuffle (the
  same seeded-draw trade every sampler here makes), so one mega-site
  cannot dominate the corpus — C4's and RefinedWeb's per-domain cap.

Scale shape: parsing and screening are zero-shuffle narrow maps (the
blocklist is broadcast). The cap is ONE hash-partitioned window per
registrable domain — unavoidable (the cap is per-domain state), and
the window's state is a single counter per partition key. Skewed mega-
domains are exactly the rows the cap discards, so the skew self-heals:
the window scans the heavy partition once and emits at most
``max_per_domain`` keepers from it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def extract_host(url: Column | str) -> Column:
    """Lowercased host of an http(s) URL ('' when unparseable)."""
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(u, r"^https?://([^/:?#]+)", 1))


def registrable_domain(host: Column) -> Column:
    """Last two dot-labels of the host (the no-PSL approximation:
    'a.b.example.com' -> 'example.com'; a bare label passes through)."""
    return F.when(
        host.contains("."),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1),
    ).otherwise(host)


def blocklist_screen(
    df: DataFrame, url_col: str, blocklist: list[str]
) -> DataFrame:
    """Adds ``host``, ``domain``, and ``blocked`` (int 0/1: host OR its
    registrable domain appears in ``blocklist``). A literal isin keeps
    the screen a narrow map; swap for a broadcast semi-join when the
    list outgrows literals (semantics identical)."""
    host = extract_host(url_col)
    dom = registrable_domain(host)
    blocked = host.isin(*blocklist) | dom.isin(*blocklist)
    return df.select(
        "*",
        host.alias("host"),
        dom.alias("domain"),
        blocked.cast("int").alias("blocked"),
    )


def domain_diversity_cap(
    df: DataFrame,
    id_col: str,
    max_per_domain: int,
    salt: str = "domcap",
    n_buckets: int = 4096,
) -> DataFrame:
    """Adds ``kept`` (int 0/1): unblocked rows ranked within their
    registrable domain by the md5 draw (ties by id), keep rank <=
    ``max_per_domain``. Blocked rows are never kept and do not consume
    domain quota. Expects the ``blocklist_screen`` columns.

    Plan — bucketed rank, NOT a per-domain window sort: a plain
    ``row_number().over(partitionBy(domain))`` makes WindowExec SORT
    each domain in one task, so a mega-domain holding 1% of a 100 TB
    crawl pushes ~1 TB through a single sorter before the cap
    discards anything (the Gini/KS one-task-sort disease). Instead
    the draw's leading hex chars split every domain into
    ``n_buckets`` (rounded to a power of 16) draw-range slices: per-(domain, bucket) unblocked
    counts (map-side combined, KB state per domain) close into
    per-domain EXCLUSIVE prefix offsets via a window over at most
    n_buckets count rows per domain, and each row's exact global rank
    is its local rank within the (domain, bucket) slice — a task of
    ~1/n_buckets of the domain — plus the bucket offset. The draw is
    an md5 hex string, so lexicographic order within a bucket agrees
    with the bucket-prefix order and the kept set is IDENTICAL to the
    single-sort formulation."""
    draw = F.md5(
        F.concat_ws("\x1f", F.lit(salt), F.col(id_col).cast("string"))
    )
    import math

    chars = max(1, int(round(math.log(n_buckets, 16))))
    base = df.select(
        "*",
        draw.alias("__draw"),
        F.conv(F.substring(draw, 1, chars), 16, 10)
        .cast("int")
        .alias("__bkt"),
    )
    counts = (
        base.where(F.col("blocked") == 0)
        .groupBy("domain", "__bkt")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    woff = (
        Window.partitionBy("domain")
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "domain",
        "__bkt",
        F.coalesce(F.sum("__c").over(woff), F.lit(0)).alias("__off"),
    )
    # local rank within the (domain, bucket, blocked) slice: blocked
    # rows rank only among themselves and never read __off, so they
    # cannot consume unblocked quota
    rk_loc = F.row_number().over(
        Window.partitionBy("domain", "__bkt", "blocked").orderBy(
            "__draw", F.col(id_col)
        )
    )
    kept = (F.col("blocked") == 0) & (
        F.coalesce(F.col("__off"), F.lit(0)) + rk_loc <= max_per_domain
    )
    # eqNullSafe on domain (r11 advisor): a plain equi-join never
    # matches a NULL domain key, so a NULL-domain group (NULL url
    # reaching a caller that supplies the columns directly) would see
    # __off=0 in EVERY bucket and keep up to n_buckets*max_per_domain
    # rows; null-safe equality gives it the same one offset frame —
    # and the same cap — as any other group. Window partitioning
    # already groups NULLs together, so the join was the only seam.
    off = offsets.select(
        F.col("domain").alias("__dom_o"),
        F.col("__bkt").alias("__bkt_o"),
        "__off",
    )
    return (
        base.join(
            off,
            F.col("domain").eqNullSafe(F.col("__dom_o"))
            & (F.col("__bkt") == F.col("__bkt_o")),
            "left",
        )
        .select(*df.columns, kept.cast("int").alias("kept"))
    )


def url_canonicalize(
    df: DataFrame,
    url_col: str,
    tracking_params: tuple[str, ...] = ("fbclid", "gclid", "ref", "mc_eid"),
    out_col: str = "canonical_url",
) -> DataFrame:
    """URL canonicalization — the normalize-before-dedup stage every
    web corpus runs BEFORE fetching or fingerprinting content: the
    same page arrives as ``HTTPS://Site.COM:443/p/1/?b=2&a=1&utm_
    source=feed#top`` and ``https://site.com/p/1?a=1&b=2``, and a
    corpus that treats those as two URLs fetches (and near-dups) the
    page twice. Appends ``out_col`` built by the standard rules:

    - scheme and host lowercased; the scheme's default port stripped
      (``:80`` for http, ``:443`` for https — other ports kept);
    - fragment dropped (client-side only, never reaches the server);
    - trailing slashes stripped from the path (root stays ``/``; an
      empty path becomes ``/`` so ``site.com`` == ``site.com/``);
    - query parameters: tracking params dropped (any ``utm_*`` prefix
      plus the exact names in ``tracking_params``), the survivors
      sorted byte-wise and re-joined — parameter order never changes
      the resource, so it must not change the fingerprint. An emptied
      query drops its ``?``.

    Everything is builtin string/array expressions (one narrow map, no
    shuffle, no UDF); the param sort is ``sort_array`` over the split
    pairs, bounded by the query-string length. Dedup-by-canonical is
    the caller's one groupBy/window on the new column.

    Edge rules (r12 advisor): an input WITHOUT ``scheme://`` (relative
    path, bare host, garbage) passes through verbatim — every extract
    above keys off the scheme, so rewriting would emit ``:///...``;
    callers that need those resolved do it against a base URL
    upstream. An empty ``tracking_params`` means "drop only utm_*"
    (``Column.isin()`` with zero values raises at plan build, so the
    name test is skipped entirely).
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[^:/?#]+://([^/?#]*)", 1))
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).otherwise(hostport)
    raw_path = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    stripped = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    if tracking_params:
        _named = lambda p: F.element_at(F.split(p, "="), 1).isin(
            *tracking_params
        )
    else:
        _named = lambda p: F.lit(False)
    keep = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.startswith("utm_") & ~_named(p),
    )
    qjoined = F.array_join(F.sort_array(keep), "&")
    canonical = F.when(scheme == "", u).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(qjoined == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), qjoined)
            ),
        )
    )
    return df.withColumn(out_col, canonical)
