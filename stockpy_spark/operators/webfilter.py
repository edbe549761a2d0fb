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
) -> DataFrame:
    """Adds ``kept`` (int 0/1): unblocked rows ranked within their
    registrable domain by the md5 draw (ties by id), keep rank <=
    ``max_per_domain``. Blocked rows are never kept and do not consume
    domain quota. Expects the ``blocklist_screen`` columns."""
    draw = F.md5(
        F.concat_ws("\x1f", F.lit(salt), F.col(id_col).cast("string"))
    )
    rk = F.row_number().over(
        Window.partitionBy("domain", "blocked").orderBy(draw, F.col(id_col))
    )
    kept = (F.col("blocked") == 0) & (rk <= max_per_domain)
    return df.select("*", kept.cast("int").alias("kept"))
