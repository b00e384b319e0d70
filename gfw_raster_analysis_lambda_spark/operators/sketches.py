"""Mergeable-summary (sketch) operators for corpus-scale frequency work.

A 100-TB training-data pipeline constantly asks "which keys dominate?"
— domains to frequency-cap, users to rate-limit, boilerplate shingles
to drop — over key spaces far too large to groupBy in full. The
classic answer is a MERGEABLE SUMMARY: each partition builds a small
deterministic digest, digests merge associatively, and an exact
refinement pass pins the final answer so no approximation error ever
reaches the caller.

``heavy_hitters`` implements the Misra–Gries (1982) frequent-items
summary this way:

- **Phase 1 (one scan, no key shuffle)**: every partition streams its
  Arrow batches through an MG(summary_size) summary — at most
  ``summary_size`` (key, count) pairs, undercounting any key by at most
  n_partition/(summary_size+1). Each partition also emits its row
  count. Only O(partitions x summary_size) rows leave the scan, vs the
  full key space for a groupBy.
- **Merge**: summed per key (MG summaries merge by addition, the
  Agarwal et al. 2013 mergeable-summaries result), giving every true
  heavy hitter (freq * k > N) a merged estimate strictly above
  ``N/k - N/(summary_size+1)`` — with ``summary_size >= k`` no true
  hitter can be missed. The merged frame is tiny and collected.
- **Phase 2 (one scan, candidate-pruned)**: exact counts for the
  candidate set only (broadcast semi-join; map-side partial aggregation
  makes the shuffle O(partitions x candidates)), filtered to the exact
  integer predicate ``freq * k > N``.

The output is therefore EXACT — the sketch only prunes — which is what
lets a DuckDB twin verify it with plain GROUP BY/HAVING. Determinism
does not depend on partitioning: any partition layout yields the same
final rows (pytest re-runs under several layouts to pin this).

Reference scope note: the reference engine (wri/gfw-raster-analysis-
lambda) has no frequency-sketch surface; this module is part of the
beyond-reference LLM-pipeline toolkit, like operators/dedup.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _mg_update(summary: dict, counts: "dict", size: int) -> None:
    """Merge a batch's value counts into an MG summary in place,
    shrinking back to ``size`` keys by the batched decrement rule
    (subtract the smallest count from all, drop zeros — each decrement
    unit hits > size keys at once, preserving the n/(size+1) bound)."""
    for k, c in counts.items():
        summary[k] = summary.get(k, 0) + int(c)
    while len(summary) > size:
        d = min(summary.values())
        for k in list(summary):
            nv = summary[k] - d
            if nv <= 0:
                del summary[k]
            else:
                summary[k] = nv


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int,
    summary_size: int | None = None,
) -> DataFrame:
    """Exact phi=1/k heavy hitters of ``key_col``: every key whose
    frequency satisfies ``freq * k > N`` (N = total rows), as
    (key, freq) — sketch-pruned but exact, see the module docstring.

    ``summary_size`` (default ``4 * k``) trades candidate-set size
    against summary memory; any value >= k is correct (no false
    negatives), larger values admit fewer false candidates into the
    exact pass.

    NULL keys form one group, exactly as GROUP BY/HAVING would keep
    them: their count is tracked exactly in phase 1 (one counter per
    partition — no sketch involved) and the NULL row is emitted when it
    qualifies."""
    if k < 2:
        raise ValueError("k must be >= 2 (phi = 1/k < 1)")
    size = int(summary_size) if summary_size is not None else 4 * k
    if size < k:
        raise ValueError(f"summary_size {size} < k {k} loses true hitters")

    keyed = df.select(F.col(key_col).alias("__key"))

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict = {}
        n_part = 0
        n_null = 0  # NULL keys form one exact group (no sketch needed)
        for pdf in batches:
            n_part += len(pdf)
            n_null += int(pdf["__key"].isna().sum())
            _mg_update(summary, pdf["__key"].value_counts().to_dict(), size)
        out = pd.DataFrame(
            {"__key": list(summary), "cnt": list(summary.values())}
        )
        out["tot"] = 0
        out["nulls"] = 0
        total = pd.DataFrame(
            {"__key": [None], "cnt": [0], "tot": [n_part], "nulls": [n_null]}
        )
        yield pd.concat([out, total], ignore_index=True)

    field = keyed.schema["__key"]
    digests = keyed.mapInPandas(
        summarize,
        f"__key {field.dataType.simpleString()}, cnt long, tot long, nulls long",
    )
    merged = (
        digests.groupBy("__key")
        .agg(F.sum("cnt").alias("est"), F.sum("tot").alias("tot"),
             F.sum("nulls").alias("nulls"))
        .collect()
    )  # <= partitions * summary_size + partitions rows, by construction
    n_total = sum(r["tot"] for r in merged if r["__key"] is None)
    n_null = sum(r["nulls"] for r in merged if r["__key"] is None)
    out_schema = f"{key_col} {field.dataType.simpleString()}, freq long"
    spark = df.sparkSession
    if n_total == 0:
        return spark.createDataFrame([], out_schema)
    # value_counts drops nulls, so the NULL group never reaches the MG
    # summary; its exact count comes from phase 1 — emit it directly so
    # the contract matches GROUP BY/HAVING (which keeps a NULL group)
    null_row = (
        spark.createDataFrame([(None, n_null)], out_schema)
        if n_null * k > n_total else spark.createDataFrame([], out_schema)
    )
    # MG bound: est >= freq - N/(size+1); true hitters have freq > N/k,
    # so est > N/k - N/(size+1) (real-valued). est is an integer, so
    # est > floor(...) is the tightest cut that cannot lose one —
    # computed as an exact rational floor (the two-floor difference
    # N//k - N//(size+1) can exceed it and WOULD drop true hitters).
    floor_est = (n_total * (size + 1 - k)) // (k * (size + 1))
    cand = [r["__key"] for r in merged
            if r["__key"] is not None and r["est"] > floor_est]
    cand_df = spark.createDataFrame(
        [(c,) for c in cand], f"__key {field.dataType.simpleString()}"
    )
    return (
        keyed.join(F.broadcast(cand_df), "__key")
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * F.lit(int(k)) > F.lit(int(n_total)))
        .select(F.col("__key").alias(key_col), "freq")
        .unionByName(null_row)
    )


# ---------------------------------------------------------------------------
# HyperLogLog approximate distinct
# ---------------------------------------------------------------------------

_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_bits(b: int) -> tuple[int, int, int]:
    """(m, wbits, shift) for a 60-bit md5-derived hash split into a
    ``b``-bit bucket index and a ``wbits``-bit pattern word; ``shift``
    is the register scale exponent (rho ranges 1..wbits+1, so the
    integer denominator term for register M is ``2^(shift - M)``)."""
    m = 1 << b
    wbits = 60 - b
    return m, wbits, wbits + 1


def hll_small_range_sql(b: int, v_col: str, raw_col: str) -> str:
    """The HLL small-range (linear-counting) correction as a CASE over
    the empty-bucket count, with every ``m*ln(m/V)`` value baked in as
    a decimal literal. Shared verbatim by the Spark expression and the
    DuckDB twin: both engines parse the same shortest-round-trip
    literals to the same doubles, so no cross-engine ``ln`` call can
    disagree in the last ulp."""
    import math

    m = 1 << b
    branches = " ".join(
        f"WHEN {v} THEN CAST({m * math.log(m / v)!r} AS DOUBLE)"
        for v in range(1, m + 1)
    )
    return (
        f"CASE WHEN {v_col} > 0 AND {raw_col} <= {2.5 * m!r} "
        f"THEN (CASE {v_col} {branches} END) ELSE {raw_col} END"
    )


def hll_numerator(b: int) -> float:
    """``alpha_m * m^2 * 2^shift`` precomputed in Python — the only
    float constant in the estimator. Embedding the product (rather than
    multiplying engine-side) keeps the estimate a single literal-over-
    integer division, identical on any engine."""
    m, _, shift = _hll_bits(b)
    return _HLL_ALPHA[m] * m * m * float(1 << shift)


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_by: list[str],
    b: int = 6,
) -> DataFrame:
    """Approximate COUNT DISTINCT per group via a HyperLogLog sketch
    (Flajolet et al. 2007) held entirely in RELATIONAL state — no UDF,
    no driver collect, every stage whole-stage-codegen:

    - hash: first 15 hex chars of ``md5(key)`` as a 60-bit integer
      (portable: any engine computes the identical value);
    - registers: ``groupBy(group, hash % m) -> MAX(rho)`` where
      ``rho = leading zeros of the remaining 54-bit word + 1`` via
      ``bin()`` string length — one shuffle of O(groups x m) rows, with
      map-side partial MAX, regardless of corpus size. The register
      frame IS the mergeable sketch state: persist it, union new data,
      re-MAX to fold days together.
    - estimate: the denominator is accumulated as the EXACT integer
      ``sum(2^(55-M)) + V*2^55`` (sum of dyadic rationals scaled to
      int64 — float summation here would be partition-order-dependent),
      so the one float division and the baked-in small-range table are
      the only non-integer steps. Same rows -> bit-identical estimate
      on any engine and any partitioning.

    Returns one row per group: ``(group..., v_empty, reg_sum, n_hll)``
    with ``n_hll`` the rounded estimate and (v_empty, reg_sum) the
    exact integer sketch state (standard error ~1.04/sqrt(m): b=6 gives
    ~13%, for corpus-scale "roughly how many distinct" questions —
    exact distinct of a 100-TB key column is a full-key shuffle, this
    is one scan + a 64-row-per-group reduce).
    """
    m, wbits, shift = _hll_bits(b)
    if m not in _HLL_ALPHA:
        raise ValueError("b must be 4, 5, or 6")
    if not group_by:
        raise ValueError("group_by must name at least one column")
    h = (
        f"cast(conv(substring(md5(cast({key_col} as string)), 1, 15), "
        f"16, 10) as bigint)"
    )
    w = f"shiftright({h}, {b})"
    rho = (
        f"CASE WHEN {w} = 0 THEN {shift} "
        f"ELSE {shift} - length(bin({w})) END"
    )
    regs = (
        df.filter(F.col(key_col).isNotNull())
        .withColumn("__bucket", F.expr(f"{h} % {m}"))
        .withColumn("__rho", F.expr(rho))
        .groupBy(*group_by, "__bucket")
        .agg(F.max("__rho").alias("__M"))
    )
    agg = regs.groupBy(*group_by).agg(
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("v_empty"),
        (
            F.sum(F.expr(f"shiftleft(1L, cast({shift} - __M as int))"))
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << shift)
        ).cast("long").alias("reg_sum"),
    )
    raw = f"CAST({hll_numerator(b)!r} AS DOUBLE) / reg_sum"
    est = hll_small_range_sql(b, "v_empty", f"({raw})")
    return agg.select(
        *group_by, "v_empty", "reg_sum",
        F.round(F.expr(est), 6).alias("n_hll"),
    )


def histogram_quantiles(
    df: DataFrame,
    value_cents_col: str,
    group_cols: "list[str]",
    lo_cents: int,
    hi_cents: int,
    n_bins: int = 256,
    qs: "tuple[float, ...]" = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Mergeable equi-width histogram quantiles — the deterministic
    fixed-state quantile sketch (the shape t-digest/KLL fill for
    arbitrary domains, restricted to a known [lo, hi] so every step is
    integer-exact and therefore hash-gateable; the zonal engine's exact
    percentiles cover the uint8 pixel domain, this covers wide numeric
    relational columns at O(n_bins) state per group).

    Values arrive as INTEGER cents (callers round once); bin =
    (v - lo) * n_bins div (hi - lo + 1), clamped. The per-group bin
    count vector IS the sketch: merging partitions is the ordinary
    partial/final SUM, so accuracy is independent of data layout. The
    q-quantile estimate is the LOWER BOUNDARY of the first bin whose
    cumulative count reaches ceil(q * n) — error bounded by one bin
    width, deterministic, order-independent.

    One shuffle (groupBy group+bin), one windowed cumsum over ≤ n_bins
    rows per group. Returns (group..., q, est_cents, n)."""
    span = int(hi_cents) - int(lo_cents) + 1
    if span <= 0 or n_bins < 1:
        raise ValueError("need hi_cents >= lo_cents and n_bins >= 1")
    v = F.col(value_cents_col).cast("long")
    clamped = F.greatest(
        F.lit(int(lo_cents)), F.least(v, F.lit(int(hi_cents)))
    )
    binned = df.select(*group_cols, clamped.alias("__v")).select(
        *group_cols,
        F.expr(
            f"((__v - {int(lo_cents)}L) * {int(n_bins)}L) div {span}L"
        ).alias("__bin"),
    )
    counts = binned.groupBy(*group_cols, "__bin").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = Window.partitionBy(*group_cols).orderBy("__bin")
    cum = counts.select(
        *group_cols,
        "__bin",
        F.sum("__c").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("__cum"),
        F.sum("__c").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    out = None
    for q in qs:
        need = F.expr(f"CAST(ceil({float(q)!r} * n) AS BIGINT)")
        hit = (
            cum.filter(F.col("__cum") >= need)
            .groupBy(*group_cols, "n")
            .agg(F.min("__bin").alias("__bin"))
            .select(
                *group_cols,
                F.lit(float(q)).alias("q"),
                (
                    F.lit(int(lo_cents))
                    + F.expr(f"__bin * {span}L div {int(n_bins)}L")
                ).cast("long").alias("est_cents"),
                F.col("n"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

def _cm_hash_sql(key_col: str, row: int, w: int) -> str:
    """Row-``row``'s bucket for ``key_col``: the first 15 hex chars of
    ``md5('row:key')`` as a 60-bit integer, mod ``w``. Same portable
    md5 idiom as the HLL sketch — any engine computes the identical
    bucket, so the DuckDB twin re-derives the whole register table."""
    return (
        f"cast(conv(substring(md5(concat('{row}:', "
        f"cast({key_col} as string))), 1, 15), 16, 10) as bigint) % {w}"
    )


def count_min(
    df: DataFrame,
    key_col: str,
    w: int = 256,
    d: int = 3,
) -> DataFrame:
    """Count-Min register table over ``key_col``: ``d`` hash rows of
    ``w`` counters, as one relational pass — ``stack`` fans each input
    row into its ``d`` (row, col) register hits, then a groupBy COUNT
    with map-side partial aggregation reduces every partition to at
    most ``d*w`` rows before the (only) shuffle. The register frame IS
    the mergeable sketch: persist it, build tomorrow's over new data,
    and SUM matching (row, col) cells to fold days together —
    point-query error stays bounded by n/w with probability
    ``1 - (1/2)^d`` and the estimate NEVER undercounts.

    State is O(d*w) per sketch regardless of corpus size — the whole
    reason to prefer it over an exact groupBy on a 100-TB key column.

    Returns ``(row int, col long, cnt long)``."""
    if w < 2 or d < 1:
        raise ValueError("need w >= 2 and d >= 1")
    pairs = ", ".join(
        f"{i}, ({_cm_hash_sql(key_col, i, w)})" for i in range(d)
    )
    hits = df.filter(F.col(key_col).isNotNull()).selectExpr(
        f"stack({d}, {pairs}) AS (row, col)"
    )
    return hits.groupBy("row", "col").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def count_min_estimate(
    registers: DataFrame,
    probes: DataFrame,
    key_col: str,
    w: int,
    d: int,
) -> DataFrame:
    """Point-query a Count-Min register table for every probe key:
    ``min`` over the key's ``d`` registers. The register frame is at
    most ``d*w`` rows, so Catalyst broadcasts it and the probe side
    never shuffles — estimating a billion keys is a broadcast join plus
    one partial/final MIN.

    Returns ``probes.columns + [n_cm long]`` (upper bound on the true
    count; equality when no collision hit the key's minimal row)."""
    probe_hits = probes.selectExpr(
        "*",
        f"stack({d}, "
        + ", ".join(f"{i}, ({_cm_hash_sql(key_col, i, w)})" for i in range(d))
        + ") AS (row, col)",
    )
    joined = probe_hits.join(
        F.broadcast(registers), on=["row", "col"], how="left"
    ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    return (
        joined.groupBy(*probes.columns)
        .agg(F.min("cnt").cast("long").alias("n_cm"))
    )


# ---------------------------------------------------------------------------
# Bloom-filter runtime pruning (Bloom 1970)
# ---------------------------------------------------------------------------

def bloom_words(
    dim: DataFrame,
    key_col: str,
    m: int = 2048,
    k: int = 3,
) -> DataFrame:
    """Build-side Bloom filter over ``dim.key_col`` packed into 32-bit
    words (bit ``b`` lives in word ``b div 32``; 32-bit words keep every
    value positive in int64 on any engine — no sign-bit edge case):
    each key sets ``k`` md5-derived bits, ``bit_or`` folds them into at
    most ``m/32`` rows. That frame is the whole filter state —
    mergeable across builds by another ``bit_or``, broadcastable at any
    ``m`` a real pipeline would use (2^27 bits = 4 MB of words).

    Returns ``(word_idx long, word long)``."""
    if m % 32 != 0 or m < 32 or k < 1:
        raise ValueError("need m a positive multiple of 32 and k >= 1")
    bits = dim.filter(F.col(key_col).isNotNull()).selectExpr(
        f"stack({k}, "
        + ", ".join(f"{i}, ({_cm_hash_sql(key_col, i, m)})" for i in range(k))
        + ") AS (row, bit)"
    )
    return (
        bits.select(
            F.expr("bit div 32").alias("word_idx"),
            F.expr("shiftleft(1L, cast(bit % 32 as int))").alias("w1"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(w1)").alias("word"))
    )


def bloom_pass_col(
    fact: DataFrame,
    key_col: str,
    words: DataFrame,
    m: int,
    k: int,
) -> DataFrame:
    """Append ``bloom_pass`` (boolean) to ``fact``: true iff all ``k``
    bits of ``key_col`` are set in the filter. One broadcast join per
    hash row against the tiny word frame — the fact table NEVER
    shuffles, which is the point: at 100 TB this is the runtime filter
    you apply on the scan side to kill non-matching rows before the
    join Exchange, exactly what engines' automatic runtime filters do
    for equi-joins, but explicit, persistable, and mergeable. False
    positives (rate ~ (1 - e^(-k*n/m))^k) only cost wasted shuffle
    rows; the subsequent exact join removes them, so composition with
    any join is sound."""
    out = fact
    for i in range(k):
        wtab = words.selectExpr(
            f"word_idx AS __wi{i}", f"word AS __w{i}"
        )
        out = out.withColumn(
            f"__b{i}", F.expr(_cm_hash_sql(key_col, i, m))
        ).join(
            F.broadcast(wtab),
            F.expr(f"cast(__b{i} / 32 as bigint) = __wi{i}"),
            "left",
        )
    cond = None
    for i in range(k):
        c = F.expr(
            f"coalesce(__w{i}, 0L) & shiftleft(1L, cast(__b{i} % 32 as int))"
        ) != 0
        cond = c if cond is None else (cond & c)
    drop = [c for i in range(k) for c in (f"__b{i}", f"__wi{i}", f"__w{i}")]
    return out.withColumn("bloom_pass", cond).drop(*drop)
