"""Privacy-preserving release operators.

The Laplace mechanism over grouped counts — the standard differential-
privacy release for histograms (Dwork et al., "Calibrating Noise to
Sensitivity in Private Data Analysis", TCC 2006): a count query has
sensitivity 1, so adding Laplace(1/epsilon) noise to each group's count
gives epsilon-DP per release.

The noise here is REPRODUCIBLE by design: the Laplace draw is derived
from the md5 of (salt, group key) through the inverse CDF, so the same
release re-run on the same data produces the same table — what a
training-data pipeline needs for auditable, replayable releases and
what puts the operator under an exact cross-engine oracle. The
trade-off is stated plainly: a hash of the group key is NOT a secret
random seed, so this variant provides the *calibrated-noise shape* for
pipeline plumbing, testing, and utility measurement; a production
privacy release must swap the seeded uniform for a real CSPRNG draw
(one-line change at ``_hash_uniform``), accepting non-reproducibility.

Scale shape: noise is a per-group scalar expression on top of the
grouped count — map-side combined aggregate plus narrow arithmetic,
nothing new shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GRAIN = 1_000_000


def _hash_uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform in (0, 1): md5 of the salted key, first 15
    hex chars (60 bits) modulo a 1e6 grid, offset to the cell midpoint
    so 0 and 1 are unreachable (ln(0) below stays finite). Same formula
    family as sampling._hash_bucket, so SQL replays it exactly."""
    h = F.md5(F.concat(F.lit(salt + "|"), key.cast("string")))
    v = F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % F.lit(_GRAIN)
    return (v.cast("double") + F.lit(0.5)) / F.lit(float(_GRAIN))


def laplace_noise(key: Column, scale: float, salt: str) -> Column:
    """Laplace(scale) via the inverse CDF at a hash-seeded uniform:
    ``-b * sgn(u - 1/2) * ln(1 - 2|u - 1/2|)``."""
    u = _hash_uniform(key, salt)
    centered = u - F.lit(0.5)
    sign = F.when(centered >= 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    return (
        F.lit(-float(scale))
        * sign
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float,
    salt: str = "dp",
    dp: int = 6,
) -> DataFrame:
    """Epsilon-DP histogram release (Laplace mechanism, sensitivity 1):
    per-group exact count plus Laplace(1/epsilon) noise seeded from the
    group key (see module docstring for the reproducibility trade-off).
    Emits both the noisy release and the noise-free count so utility
    (absolute error vs epsilon) is measurable in the same frame —
    drop ``n_true`` before an actual release.

    Noise and the noisy count round to ``dp`` digits BEFORE release so
    both engines gate on the same literals (ln differs in the last ulp
    across libm implementations).

    Returns (group_cols..., n_true, noise, n_noisy).
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive, got {epsilon}")
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in group_cols])
    noise = F.round(laplace_noise(key, 1.0 / float(epsilon), salt), dp)
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n_true"))
        .select(
            *group_cols,
            "n_true",
            noise.alias("noise"),
            F.round(F.col("n_true") + noise, dp).alias("n_noisy"),
        )
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    generalize: dict[str, Column] | None = None,
) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) — the release-gate check run
    before sharing any per-row extract: every row is annotated with the
    size of its anonymity set (rows sharing its full quasi-identifier
    combination) and a ``violates_k`` flag for sets smaller than ``k``
    — those rows are re-identifiable by joining the quasi-identifiers
    against an external table, the attack the audit exists to catch.
    ``generalize`` optionally REPLACES a quasi-column with a coarsened
    expression (bucketed age, truncated zip) so the audit evaluates
    the generalization that would actually be released; NULLs form
    their own anonymity set (standard: NULL is an observable value).

    Scale shape: one map-side-combined count over the quasi-identifier
    combinations (output = distinct combinations, not rows) joined
    back UNHINTED: the regime this audit exists for — fine-grained
    quasi-identifiers, many near-unique rows — is exactly when the
    combination frame approaches fact size, so forcing a broadcast is
    the q3 fact-in-disguise failure. AQE broadcasts while the sizes
    frame fits the threshold and sort-merges on the (null-safe) quasi
    keys when it doesn't — ``<=>`` stays a hash-join key either way.
    The audit frame (combination, set size) is also the
    released-table generalization ledger."""
    gen = generalize or {}
    exprs = [
        (gen[c] if c in gen else F.col(c)).alias(f"__q_{c}")
        for c in quasi_cols
    ]
    base = df.select("*", *exprs)
    qcols = [f"__q_{c}" for c in quasi_cols]
    sizes = base.groupBy(*qcols).agg(
        F.count(F.lit(1)).alias("anonymity_set")
    ).select(
        *[F.col(q).alias(f"__s_{q}") for q in qcols], "anonymity_set"
    )
    # eqNullSafe: NULL quasi values form a real anonymity set and must
    # join back to their rows — a plain equi-join would silently drop
    # every row with a NULL quasi-identifier (the group_train_test_
    # split lesson from round 9's advice)
    cond = None
    for q in qcols:
        c = F.col(q).eqNullSafe(F.col(f"__s_{q}"))
        cond = c if cond is None else (cond & c)
    return (
        base.join(sizes, cond)
        .select(
            *[F.col(c) for c in df.columns],
            *[F.col(f"__q_{c}").alias(f"{c}_released") for c in quasi_cols],
            F.col("anonymity_set").cast("long").alias("anonymity_set"),
            (F.col("anonymity_set") < k).cast("int").alias("violates_k"),
        )
    )
