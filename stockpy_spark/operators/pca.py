"""Distributed PCA over an embedding column.

The whitening/compression step between embedding extraction and
similarity indexing (the IVF/PQ stages in operators/similarity.py
benefit directly: PCA-rotated vectors quantize better). Classic
two-phase distributed PCA:

1. **Moment pass** (distributed): each Arrow batch reduces to
   (n, sum_x, sum of outer products X^T X) with one numpy GEMM —
   d + d*d doubles per batch, the textbook sufficient statistics.
   Summing partials across batches is elementwise aggregation; the
   driver receives ONE (1 + d + d*d)-double vector (d = 64 -> ~33 KB),
   the same driver-state budget as the IVF codebook
   (similarity.py:244).
2. **Eigen step** (driver): covariance from the moments, ``numpy
   eigh`` (symmetric, deterministic), top-k eigenvectors.
3. **Projection** (distributed): (X - mean) @ components^T as one GEMM
   per Arrow batch — the components ship as a closure constant,
   KB-sized.

Correctness is self-certifying and hash-gated the way the ANN/IVF
families are: the per-component VARIANCE of the projected data must
equal the component's eigenvalue (that equality is the definition of
PCA — it fails if the moments, the eigendecomposition, or the
projection disagree), and the component matrix must be orthonormal.
The gate emits those checks as booleans; no SQL engine can replay an
eigendecomposition, so the oracle pins the expected gate rows.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _moment_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """One row per Arrow batch: (n, sum vector, flattened X^T X)."""
    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("xtx", T.ArrayType(T.DoubleType())),
        ]
    )

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "xtx": [(X.T @ X).ravel().tolist()],
                }
            )

    return df.select(vec_col).mapInPandas(part, schema)


def pca_fit(df: DataFrame, vec_col: str, k: int) -> dict:
    """Fit top-``k`` principal components; returns {mean, components
    (k x d), eigenvalues (k), n} as plain numpy/python — KB-sized
    driver state. Sample covariance (n-1 denominator)."""
    parts = _moment_partials(df, vec_col)
    # elementwise array sums via posexplode -> groupBy pos (the array
    # lengths differ between s and xtx, so sum each independently)
    n = parts.agg(F.sum("n")).collect()[0][0]
    if not n:
        raise ValueError("pca_fit: empty input")

    def arr_sum(col: str) -> np.ndarray:
        rows = (
            parts.select(F.posexplode(col).alias("i", "v"))
            .groupBy("i")
            .agg(F.sum("v").alias("s"))
            .orderBy("i")
            .collect()
        )
        return np.array([r.s for r in rows])

    s = arr_sum("s")
    d = len(s)
    xtx = arr_sum("xtx").reshape(d, d)
    mean = s / n
    cov = (xtx - np.outer(s, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    return {
        "mean": mean,
        "components": evecs[:, order].T.copy(),  # k x d
        "eigenvalues": evals[order].copy(),
        "n": int(n),
    }


def pca_project(
    df: DataFrame, vec_col: str, id_col: str, model: dict, dp: int = 6
) -> DataFrame:
    """(X - mean) @ components^T per Arrow batch. Returns
    (id, proj: array<double> length k), rounded to ``dp``."""
    mean = model["mean"]
    comps = model["components"]
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("proj", T.ArrayType(T.DoubleType())),
        ]
    )

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            P = np.round((X - mean) @ comps.T, dp)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "proj": [row.tolist() for row in P],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(proj, schema)


def pca_gate(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    rel_tol: float = 1e-6,
) -> DataFrame:
    """Self-certifying PCA check, one row per component:
    (component, var_match_ok, ortho_ok) — var_match_ok iff the
    projected data's sample variance equals the eigenvalue within
    ``rel_tol`` relative error; ortho_ok iff the component matrix is
    orthonormal (driver-side check, constant per run)."""
    model = pca_fit(df, vec_col, k)
    comps = model["components"]
    gram = comps @ comps.T
    ortho_ok = bool(np.allclose(gram, np.eye(k), atol=1e-8))
    # unrounded projection for the variance identity
    proj = pca_project(df, vec_col, id_col, model, dp=12)
    stats = proj.select(
        *[
            F.element_at("proj", i + 1).alias(f"p{i}")
            for i in range(k)
        ]
    ).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.col(f"p{i}")).alias(f"s{i}") for i in range(k)],
        *[
            F.sum(F.col(f"p{i}") * F.col(f"p{i}")).alias(f"ss{i}")
            for i in range(k)
        ],
    ).collect()[0]
    n = stats["n"]
    rows = []
    for i in range(k):
        var = (stats[f"ss{i}"] - stats[f"s{i}"] ** 2 / n) / (n - 1)
        ev = model["eigenvalues"][i]
        ok = bool(abs(var - ev) <= rel_tol * max(abs(ev), 1e-12))
        rows.append((i + 1, ok, ortho_ok))
    spark = df.sparkSession
    return spark.createDataFrame(
        rows, "component INT, var_match_ok BOOLEAN, ortho_ok BOOLEAN"
    )
