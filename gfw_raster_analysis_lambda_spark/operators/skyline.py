"""Distributed Pareto skyline — multi-objective curation selection.

A training-data pipeline constantly trades objectives off against each
other: highest quality at lowest length, freshest at highest score,
sharpest image at smallest payload. The SKYLINE (Börzsönyi et al. 2001,
"The Skyline Operator") is the exact answer set: every row not
DOMINATED by another (dominated = no better in any objective, strictly
worse in at least one). Downstream pickers then choose from the
frontier instead of a single weighted score that hides the trade-off.

Scale shape (the block-nested-loop insight made relational): the
skyline operator is MERGEABLE — ``skyline(A ∪ B) = skyline(skyline(A)
∪ skyline(B))`` because any row dominated within a partition is
dominated globally by the same witness. So:

- **Phase 1 (one scan, no shuffle)**: every Arrow batch reduces to its
  local per-group frontier via the O(n log n) sort-scan. Uniform data
  keeps a local 2-D frontier at O(log n) expected rows, so the shuffle
  that follows carries frontier candidates, not the corpus.
- **Phase 2 (one grouped shuffle)**: exact frontier of the candidate
  union per group, same kernel.

Only comparisons touch the objective values (no arithmetic), so any
totally ordered column type works and a DuckDB NOT-EXISTS twin is
hash-exact on doubles.

Reference scope note: the reference engine (wri/gfw-raster-analysis-
lambda) has no multi-objective surface; this module is part of the
beyond-reference curation toolkit, like operators/sampling.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _frontier(pdf: pd.DataFrame, min_col: str, max_col: str) -> pd.DataFrame:
    """Exact 2-D skyline of one frame: minimize ``min_col``, maximize
    ``max_col``. Sort (min asc, max desc), keep a row iff its max
    strictly exceeds the best max seen at any strictly smaller min —
    ties on both objectives are mutually non-dominating and all kept."""
    if len(pdf) == 0:
        return pdf
    s = pdf.sort_values(
        [min_col, max_col], ascending=[True, False], kind="mergesort"
    )
    x = s[min_col].to_numpy()
    y = s[max_col].to_numpy()
    keep = np.zeros(len(s), dtype=bool)
    best = None  # best max among rows with strictly smaller min
    i = 0
    n = len(s)
    while i < n:
        j = i
        while j < n and x[j] == x[i]:
            j += 1
        # within an equal-min block, rows are dominated unless they tie
        # the block's top max; vs earlier blocks they need max > best
        top = y[i]
        for k in range(i, j):
            if y[k] == top and (best is None or y[k] > best):
                keep[k] = True
        if best is None or top > best:
            best = top
        i = j
    return s[keep]


def skyline_2d(
    df: DataFrame,
    group_cols: "list[str]",
    min_col: str,
    max_col: str,
) -> DataFrame:
    """Per-group 2-D Pareto frontier (minimize ``min_col``, maximize
    ``max_col``), two-phase: per-batch local frontiers in one Arrow
    scan (no shuffle — the only full-data pass), then one grouped
    shuffle of the O(frontier) candidates with the exact kernel on
    top. Rows with NULL in either objective are excluded (NULL has no
    place in a dominance order). Returns the input columns unchanged."""
    cols = df.columns
    schema = df.schema
    work = df.dropna(subset=[min_col, max_col])

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            parts = [
                _frontier(sub, min_col, max_col)
                for _, sub in pdf.groupby(group_cols, sort=False, dropna=False)
            ]
            yield pd.concat(parts)[cols] if parts else pdf[cols]

    cand = work.mapInPandas(local, schema)

    def exact(pdf: pd.DataFrame) -> pd.DataFrame:
        return _frontier(pdf, min_col, max_col)[cols]

    return cand.groupBy(*group_cols).applyInPandas(exact, schema)
