"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (no Python in the hot path): language-ID by
stopword-marker counting, quality scoring from length/punctuation/stopword
ratios, whitespace + BPE-ish token counting, and md5 document
fingerprinting. Every operator has an exact ANSI-SQL twin (the DuckDB
oracle in ``__spark_entry__.py``) because it is deterministic integer/
string arithmetic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker stopwords per language for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
}

# BPE-ish token regex: words, numbers, or single punctuation marks
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish tokens (JVM-side). ``regexp_count`` counts the
    same non-overlapping matches as ``size(regexp_extract_all(...))``
    without materializing the match array (guide §1.2 step 2 — per-task
    work): one regex scan, zero allocations per match."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE)).cast("int")


def marker_count(text: Column, word: str) -> Column:
    """Occurrences of a word with word boundaries."""
    return F.regexp_count(F.lower(text), F.lit(rf"\b{word}\b")).cast("int")


def _lang_score(text: Column, words: "list[str]") -> Column:
    """Summed marker counts for one language in ONE regex scan: the
    markers are disjoint whole words, so the count of the alternation
    ``\\b(w1|w2|w3)\\b`` equals the sum of the per-word counts — 1 scan
    of the text instead of len(words)."""
    alt = "|".join(words)
    return F.regexp_count(F.lower(text), F.lit(rf"\b(?:{alt})\b")).cast("int")


def lang_id(text: Column) -> Column:
    """Argmax of marker-stopword counts; deterministic tie-break by the
    fixed language order; 'und' (undetermined) when no marker hits."""
    scores = [_lang_score(text, words) for _, words in LANG_MARKERS.items()]
    best = F.greatest(*scores)
    out = F.lit("und")
    # reversed so the FIRST language wins ties (nested CASE evaluation)
    for (lang, _), score in zip(reversed(LANG_MARKERS.items()),
                                reversed(scores)):
        out = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def quality_score(text: Column) -> Column:
    """Deterministic [0, 1] quality heuristic:
    0.4 * length_score + 0.3 * alpha_ratio + 0.3 * (1 - punct_ratio),
    where length_score saturates at 1000 chars. Rounded to 6 decimals so
    cross-engine float comparison is exact. Character-class counts via
    ``regexp_count`` (== length of the regexp_replace complement, minus
    the intermediate string build)."""
    n = F.length(text).cast("double")
    alpha = F.regexp_count(text, F.lit(r"[A-Za-z]")).cast("double")
    punct = F.regexp_count(text, F.lit(r"[.,!?;:]")).cast("double")
    length_score = F.least(n / F.lit(1000.0), F.lit(1.0))
    alpha_ratio = alpha / F.greatest(n, F.lit(1.0))
    punct_ratio = punct / F.greatest(n, F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_score + F.lit(0.3) * alpha_ratio + F.lit(0.3) * (F.lit(1.0) - punct_ratio),
        6,
    )


def fingerprint64(text: Column) -> Column:
    """64-bit-ish (60-bit) document fingerprint: md5 of the
    whitespace-normalized lowercase text, first 15 hex digits as int64.
    Identical formula runs in DuckDB (hex-cast parity verified)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("long")


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per document with every text statistic — the composed
    text-analysis operator. The input is spread across cores first
    (:func:`..dedup.spread_input`): the projection is regex-bound, and a
    one-file compressed corpus otherwise evaluates it in a single scan
    task."""
    from .dedup import spread_input

    t = F.col(text_col)
    return spread_input(df).select(
        F.col(id_col),
        whitespace_token_count(t).alias("n_tokens_ws"),
        bpe_token_count(t).alias("n_tokens_bpe"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        fingerprint64(t).alias("fingerprint"),
    )


def bm25_scores(
    df: DataFrame,
    terms: "list[str]",
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 relevance scoring (Robertson & Walker 1994) of every
    document against a fixed query-term set — the retrieval/quality
    scorer a training-data pipeline uses to rank corpus slices against
    a topic probe. ``terms`` are plain lowercase words (matched with
    ASCII ``\\b`` boundaries, case-folded).

    Plan: two corpus scans, zero wide shuffles. Pass 1 folds the GLOBAL
    statistics into ONE codegen aggregate row (N, total token length,
    per-term document frequency); pass 2 re-scans, broadcast-joins that
    single row, and evaluates the score in ONE codegen projection. The
    per-term contributions are added in the FIXED term order (float
    addition is order-dependent — a groupBy-sum over exploded terms
    would not be engine-reproducible), which is what lets the DuckDB
    contract twin hash-match: both engines build the identical
    float-expression tree over exact integer inputs.

    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the non-negative
    "plus one" variant, standard in Lucene). Returns
    (id, dl, n_terms_hit, score) with score rounded to 6.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    t = F.lower(F.col(text_col))
    tf_int = [
        F.regexp_count(t, F.lit(rf"\b{term.lower()}\b")).cast("long")
        for term in terms
    ]
    dl = whitespace_token_count(F.col(text_col)).cast("long")
    stats = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(dl).alias("__dl_sum"),
        *[
            F.sum((tf > F.lit(0)).cast("long")).alias(f"__df_{i}")
            for i, tf in enumerate(tf_int)
        ],
    )
    scored = df.select(
        F.col(id_col), dl.alias("dl"),
        *[tf.alias(f"__tf_{i}") for i, tf in enumerate(tf_int)],
    ).crossJoin(F.broadcast(stats))
    avgdl = F.col("__dl_sum").cast("double") / F.col("__n").cast("double")
    contribs = []
    for i in range(len(terms)):
        tf = F.col(f"__tf_{i}").cast("double")
        dfreq = F.col(f"__df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n").cast("double") - dfreq + F.lit(0.5))
            / (dfreq + F.lit(0.5))
        )
        denom = tf + F.lit(float(k1)) * (
            F.lit(1.0 - float(b))
            + (F.lit(float(b)) * F.col("dl").cast("double")) / avgdl
        )
        contribs.append(idf * ((tf * F.lit(float(k1) + 1.0)) / denom))
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    n_hit = None
    for i in range(len(terms)):
        h = (F.col(f"__tf_{i}") > 0).cast("int")
        n_hit = h if n_hit is None else n_hit + h
    return scored.select(
        id_col, "dl",
        n_hit.cast("int").alias("n_terms_hit"),
        F.round(score, 6).alias("score"),
    )


def bpe_pair_counts(
    df: DataFrame,
    min_count: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Adjacent symbol-pair frequencies within whitespace-pretokenized
    words — the statistic one BPE merge round consumes (Sennrich et al.
    2016 trains by repeatedly taking this table's argmax). Exposed as
    its own operator because the pair table IS the expensive distributed
    step; the merge loop (:func:`bpe_train`) is O(vocab) per round once
    this exists.

    Pure codegen: split -> explode words -> explode the length-1 slide
    (``transform(sequence(...))``) -> one groupBy(pair) count. Character
    (not byte) pairs, case-folded. Returns (pair, n) with n >= min_count.
    """
    words = df.select(
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= int(min_count))
    )


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> "tuple[list[tuple[str, str]], DataFrame]":
    """Distributed BPE tokenizer training (Sennrich et al. 2016): learn
    ``n_merges`` merge rules over the corpus' word-frequency table.

    The corpus collapses to its UNIQUE words + counts first (the
    classical formulation — at 100 TB the word table is a few orders of
    magnitude smaller than the corpus and is the only state the loop
    touches). Each round: adjacent-pair frequencies weighted by word
    count (one small groupBy), argmax with a deterministic
    (count DESC, pair ASC) tie-break — a 1-row collect, the loop's only
    driver traffic — then the merge applied in an Arrow batch kernel.
    ``localCheckpoint`` per round truncates the lineage (the word table
    is referenced twice per round; see the bigram-LM lesson — deep
    iterative lineage explodes Catalyst analysis time).

    Returns (merge rules in order, final word table
    (word, n, symbols array)). Word boundaries never merge across (the
    standard word-internal BPE), symbols start as single characters.
    """
    spark = df.sparkSession
    words = (
        df.select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w")
        )
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("w", "n", F.split("w", "").alias("symbols"))
        .localCheckpoint(eager=True)
    )
    merges: "list[tuple[str, str]]" = []
    for _ in range(int(n_merges)):
        pair_counts = (
            words.select(
                "n",
                F.explode(
                    # sequence(1, 0) DESCENDS in Spark — guard 1-symbol
                    # words with an empty array instead
                    F.expr(
                        "CASE WHEN size(symbols) >= 2 THEN "
                        "transform(sequence(1, size(symbols) - 1), "
                        "i -> struct(symbols[i - 1] AS a, symbols[i] AS b)) "
                        "ELSE array() END"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
        )
        top = pair_counts.orderBy(
            F.desc("cnt"), F.asc("a"), F.asc("b")
        ).limit(1).collect()
        if not top or top[0]["cnt"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))

        def merge_batch(it, a=a, b=b):
            for pdf in it:
                out = []
                for syms in pdf["symbols"]:
                    syms = list(syms)
                    j, merged = 0, []
                    while j < len(syms):
                        if (
                            j + 1 < len(syms)
                            and syms[j] == a
                            and syms[j + 1] == b
                        ):
                            merged.append(a + b)
                            j += 2
                        else:
                            merged.append(syms[j])
                            j += 1
                    out.append(merged)
                pdf = pdf.copy()
                pdf["symbols"] = out
                yield pdf

        words = words.mapInPandas(
            merge_batch, "w string, n bigint, symbols array<string>"
        ).localCheckpoint(eager=True)
    return merges, words


def benchmark_contamination(
    docs: DataFrame,
    bench: DataFrame,
    *,
    doc_id: str = "doc_id",
    text_col: str = "text",
    bench_id: str = "bench_id",
    bench_text: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark decontamination: flag (document, benchmark item) pairs
    where the document covers at least ``threshold`` of the benchmark
    item's distinct word ``n``-gram shingles — the standard n-gram-overlap
    contamination check run before training on a scraped corpus.

    Scale shape: the benchmark side is SMALL (thousands of eval items)
    while the corpus is the 100-TB side, so the benchmark shingle table is
    **broadcast** and the corpus shingles stream map-side against it —
    no shuffle of corpus rows at all; only matched (doc, bench) hits enter
    the aggregation, which is bounded by true overlaps. The overlap
    denominator is the benchmark item's shingle count (coverage of the
    EVAL item, not of the document), so long documents cannot dilute a
    verbatim-embedded benchmark question.

    Returns ``(doc_id, bench_id, n_overlap, n_bench_shingles,
    overlap_frac)`` for pairs at/above ``threshold``.
    """
    from .dedup import shingles

    d_sh = shingles(docs, doc_id, text_col, n).withColumnRenamed("id", "__doc")
    b_sh = shingles(bench, bench_id, bench_text, n).withColumnRenamed("id", "__bench")
    b_sz = b_sh.groupBy("__bench").agg(F.count(F.lit(1)).alias("n_bench_shingles"))
    hits = (
        d_sh.join(F.broadcast(b_sh), "shingle")
        .groupBy("__doc", "__bench")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        hits.join(F.broadcast(b_sz), "__bench")
        .withColumn(
            "overlap_frac",
            F.round(F.col("n_overlap") / F.col("n_bench_shingles").cast("double"), 6),
        )
        .filter(F.col("overlap_frac") >= F.lit(float(threshold)))
        .select(
            F.col("__doc").alias(doc_id),
            F.col("__bench").alias(bench_id),
            "n_overlap",
            "n_bench_shingles",
            "overlap_frac",
        )
    )


def contaminated_doc_ids(
    docs: DataFrame,
    bench: DataFrame,
    *,
    doc_id: str = "doc_id",
    text_col: str = "text",
    bench_id: str = "bench_id",
    bench_text: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """O(docs)-output variant: one row per contaminated document with its
    worst (max) benchmark coverage and the number of benchmark items hit —
    the production drop-list for a corpus rebuild."""
    pairs = benchmark_contamination(
        docs, bench, doc_id=doc_id, text_col=text_col,
        bench_id=bench_id, bench_text=bench_text, n=n, threshold=threshold,
    )
    return pairs.groupBy(doc_id).agg(
        F.count(F.lit(1)).cast("long").alias("n_bench_hits"),
        F.round(F.max("overlap_frac"), 6).alias("max_overlap_frac"),
    )


def salted_grouped_topk(
    df: DataFrame,
    group_cols: "list[str]",
    order_cols: "list[Column]",
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact top-k per group, skew-safe for LOW-cardinality groups.

    A plain ``row_number() OVER (PARTITION BY group)`` funnels every row
    of a group through ONE task — with a handful of strata over a 100-TB
    corpus that is a single-machine bottleneck. Two phases instead:

    1. local top-k per (group, input-partition): the window is salted
       with ``spark_partition_id()``, so the first exchange spreads each
       group over all partitions and no task sees more than its share;
    2. global top-k over the surviving ``<= k * n_partitions`` rows per
       group — a trivially small window.

    Any global top-k row is in its partition's top-k, so the salted
    pre-filter is lossless; ``order_cols`` must be a TOTAL order (add an
    id tie-break) for a deterministic result."""
    from pyspark.sql import Window

    w_local = Window.partitionBy(*group_cols, F.spark_partition_id()).orderBy(*order_cols)
    w_global = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
        .drop("__lr")
        .withColumn(rank_col, F.row_number().over(w_global))
        .filter(F.col(rank_col) <= k)
    )


def quality_quota(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep the k highest-quality documents per stratum (quota-based
    curation for a balanced training mix). Deterministic: quality ties
    break to the smallest id. Skew-safe via :func:`salted_grouped_topk`
    (strata counts are tiny; corpus is not)."""
    scored = df.withColumn("quality", quality_score(F.col(text_col)))
    out = salted_grouped_topk(
        scored,
        [strata_col],
        [F.col("quality").desc(), F.col(id_col).asc()],
        k,
    )
    return out.select(id_col, strata_col, "quality", "rank")


def pack_token_bins(
    df: DataFrame,
    budget: int,
    n_shards: int | str = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Sequence packing for training batches: assign each document to a
    token-budget bin. Documents are processed in deterministic id order
    within ``n_shards`` independent shards (``id % n_shards``), and a
    document goes to bin ``floor(tokens_before_it / budget)`` — the
    cumulative-chunking rule, so a rebuild reproduces identical bins.

    Scale shape: a GLOBAL packing order would be one sequential scan (a
    single window task over the corpus); sharding bounds every window
    partition at corpus/n_shards rows and packs all shards in parallel —
    the standard practice, since training only needs *some* deterministic
    grouping near the budget, not one global sequence. Each bin's total
    may overshoot ``budget`` by at most its last document's tokens
    (documents are never split).

    ``n_shards`` defaults to the CONSTANT 64, because the shard count is
    part of the packing's deterministic identity — a bit-identical
    rebuild must not depend on how the corpus happened to be partitioned
    or read. Pass ``n_shards="auto"`` to scale shards with the input's
    scan partition count (floor 64) instead: each shard's window IS one
    task over ~corpus/n_shards rows, so at 100 TB "auto" (or an explicit
    large pin — ``jobs/curate_submit.py`` pins 1024) keeps per-task work
    at roughly one input split, at the documented cost of
    cluster-dependent (shard, bin) assignments.

    Returns ``(id, shard, bin, n_tokens)``; ``(shard, bin)`` is the
    packing key. Pass ``tokens_col`` to reuse an already-computed token
    count (e.g. text_profile's ``n_tokens_ws``) instead of re-tokenizing
    the corpus."""
    from pyspark.sql import Window

    if n_shards == "auto":
        n_shards = max(64, df.rdd.getNumPartitions())
    elif not isinstance(n_shards, int) or n_shards < 1:
        raise ValueError(f"n_shards must be a positive int or 'auto', got {n_shards!r}")
    toks = (
        F.col(tokens_col) if tokens_col
        else whitespace_token_count(F.col(text_col))
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(
            F.col(id_col),
            (F.col(id_col) % F.lit(int(n_shards))).cast("int").alias("shard"),
            toks.cast("long").alias("n_tokens"),
        )
        .withColumn(
            "bin",
            F.floor(
                F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / F.lit(int(budget))
            ).cast("long"),
        )
        .select(id_col, "shard", "bin", "n_tokens")
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals, one row per document:
    duplicate-line fraction, duplicate-word fraction, and the fraction
    of word-bigram occurrences taken by the most frequent bigram — the
    standard boilerplate/spam indicators a pretraining quality filter
    thresholds on (high values = navigation chrome, keyword stuffing,
    generated spam).

    Scale shape: everything is PER-ROW — line/word fractions are pure
    Catalyst array expressions (split / array_distinct / size, zero
    shuffle, whole-stage codegen) and the top-bigram fraction is one
    Arrow-batched pandas UDF (Counter per doc, O(words) — NOT the
    O(words^2) higher-order-function form, and NOT an explode +
    groupBy(doc, bigram), which would shuffle the whole corpus). The
    operator never exchanges corpus rows, so it composes map-side with
    any downstream filter.

    Fractions round to 6 decimals with the identical IEEE expression on
    both engines, so the DuckDB twin (``text_repetition`` oracle) is
    hash-exact.
    """

    @F.pandas_udf("double")
    def _top_bigram_frac(texts: pd.Series) -> pd.Series:
        import re
        from collections import Counter

        out = []
        for t in texts:
            words = [w for w in re.split(r"\s+", t or "") if w]
            if len(words) < 2:
                out.append(0.0)
                continue
            counts = Counter(zip(words, words[1:]))
            out.append(max(counts.values()) / float(len(words) - 1))
        return pd.Series(out, dtype="float64")

    t = F.col(text_col)
    lines = F.split(t, "\n")
    words = F.filter(F.split(t, r"\s+"), lambda x: x != F.lit(""))
    n_lines = F.size(lines)
    n_words = F.size(words)
    dup_line = F.when(
        n_lines > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    dup_word = F.when(
        n_words > 0,
        F.lit(1.0) - F.size(F.array_distinct(words)).cast("double") / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    from .dedup import spread_input

    return spread_input(df).select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        n_words.alias("n_words"),
        F.round(dup_line, 6).alias("dup_line_frac"),
        F.round(dup_word, 6).alias("dup_word_frac"),
        F.round(_top_bigram_frac(t), 6).alias("top_bigram_frac"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Slice every document into fixed-token training chunks with
    overlap: chunk ``i`` covers whitespace tokens
    ``[i*stride, i*stride + chunk_tokens)`` and the last chunk may be
    short; ``stride < chunk_tokens`` gives the standard overlapping
    context windows of a pretraining tokenizer pipeline. Empty documents
    emit no chunks. Returns ``(<id_col>, chunk_id, n_tokens,
    chunk_text)`` — the id column keeps its input name.

    Scale shape: pure Catalyst — tokenize / sequence / explode / slice /
    concat_ws, all whole-stage codegen inside one narrow projection; the
    corpus never shuffles and output rows stream straight into the
    downstream sink. (An explode multiplies rows ~len/stride x, which is
    the intended output, not blowup.)
    """
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
    n = F.size(toks)
    n_chunks = F.when(
        n > 0,
        F.greatest(
            F.ceil((n - F.lit(chunk_tokens)).cast("double") / F.lit(stride)), F.lit(0)
        ).cast("int") + F.lit(1),
    ).otherwise(F.lit(0))
    return (
        df.select(F.col(id_col), toks.alias("__toks"), n_chunks.alias("__nc"))
        .filter(F.col("__nc") > 0)
        .select(
            id_col, "__toks",
            F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.least(
                F.lit(chunk_tokens),
                F.size("__toks") - F.col("chunk_id") * F.lit(stride),
            ).cast("int").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.slice("__toks", F.col("chunk_id") * F.lit(stride) + 1, F.lit(chunk_tokens)),
            ).alias("chunk_text"),
        )
    )


def dup_ngram_stats(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicated-n-gram exposure per document (the doc-level
    signal behind substring-level training-data dedup a la Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"):
    for every document, the count and fraction of its word n-gram
    POSITIONS whose n-gram occurs more than once in the whole corpus
    (counting within-document repeats too). High fractions flag
    boilerplate documents whose text is mostly shared spans.

    Spark shape: tokenize + slide the n-gram window in ONE codegen
    projection (split / sequence / transform / slice — no Python),
    explode to (doc, gram) once, count occurrences per gram with a
    map-side-combined groupBy, and mark duplicated positions with ONE
    self-equi-join on the gram before re-aggregating per document. Two
    shuffles total, both keyed on the gram / the doc id — no pair
    explosion, no window over the corpus. At 100 TB the join key would
    be ``xxhash64(gram)`` (8 bytes instead of the span text; collisions
    only ever over-mark a position as duplicated) — the gate keeps the
    raw gram so the DuckDB twin is string-identical.

    Documents shorter than ``n`` tokens report 0 n-grams, 0 duplicated
    and fraction 0.0 (kept via the final left join back to the corpus).
    """
    if n < 2:
        raise ValueError("dup_ngram_stats needs n >= 2")
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
    m = F.size(toks) - F.lit(n - 1)  # n-gram positions (may be <= 0)
    grams_arr = F.when(
        m > 0,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda k: F.concat_ws(" ", F.slice(toks, k, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = df.select(F.col(id_col), F.explode(grams_arr).alias("gram"))
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("__gc"))
    per_doc = (
        grams.join(counts, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum((F.col("__gc") >= 2).cast("long")).alias("dup_ngrams"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("dup_ngrams", F.lit(0)).cast("long").alias("dup_ngrams"),
            F.when(
                F.coalesce("n_ngrams", F.lit(0)) > 0,
                F.round(
                    F.col("dup_ngrams").cast("double")
                    / F.col("n_ngrams").cast("double"),
                    6,
                ),
            ).otherwise(F.lit(0.0)).alias("dup_frac"),
        )
    )


PII_PATTERNS = {
    # deliberately conservative, locale-light patterns; production swaps
    # in a vetted library list. Keys are the replacement tags. Every
    # pattern must behave identically under Java regex (Spark) and RE2
    # (the DuckDB oracle twin): ASCII \b, leftmost-first alternation.
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # three alternatives, tried in order: separated NANP-style with
    # OPTIONAL country code (so "(555) 123-4567" matches), international
    # E.164 (+ and 7-15 digits), and the unseparated 10-digit form
    # (\b-anchored so an 11+-digit number is not partially redacted)
    "PHONE": (
        r"(?:\+?[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"
        r"|\+[0-9]{7,15}"
        r"|\b[0-9]{10}\b"
    ),
    "IPV4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "SSN": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: "dict[str, str] | None" = None,
) -> DataFrame:
    """PII redaction for training corpora: replace matches of each
    pattern with ``[TAG]`` and report per-document match counts — the
    standard pre-training scrub (emails, phones, IPv4, SSNs by default).

    Pure Catalyst: one ``regexp_count`` + one ``regexp_replace`` per
    pattern chained in a single codegen projection — zero shuffle, zero
    Python, linear scan. Patterns apply in a FIXED order (dict order)
    and counts are measured against the ORIGINAL text, so a phone number
    inside an already-scrubbed email cannot double-count. Returns
    (id, scrubbed text, one ``n_<tag>`` count per pattern, n_pii total).
    """
    pats = patterns or PII_PATTERNS
    t = F.col(text_col)
    counts = [
        F.regexp_count(t, F.lit(rx)).cast("long").alias(f"n_{tag.lower()}")
        for tag, rx in pats.items()
    ]
    scrubbed = t
    for tag, rx in pats.items():
        scrubbed = F.regexp_replace(scrubbed, rx, f"[{tag}]")
    total = None
    for tag in pats:
        c = F.col(f"n_{tag.lower()}")
        total = c if total is None else total + c
    return df.select(
        F.col(id_col), scrubbed.alias(text_col), *counts
    ).withColumn("n_pii", total.cast("long"))


def compile_bpe_aliases(
    merges: "list[tuple[str, str]]",
    alias_base: int = 0xE000,
) -> "list[tuple[str, str]]":
    """Compile BPE merge rules into literal string-replace steps.

    The GPT-2-style single-character trick: every merged symbol gets a
    private-use-area character alias, so applying merge i is ONE literal
    2-chars -> 1-char replace. Because each pattern is two contiguous
    non-space characters, leftmost non-overlapping ``replace`` semantics
    (identical in Spark and DuckDB) reproduce the canonical left-to-right
    single-pass merge, and a pattern can never straddle a word boundary
    (spaces are never inside a symbol). Returns [(pattern, alias), ...]
    in merge order; token count after the chain = character count.

    Validates the BPE invariant that every merge operand is either a
    single character or the product of an earlier merge.
    """
    alias: "dict[str, str]" = {}
    steps: "list[tuple[str, str]]" = []
    for i, (a, b) in enumerate(merges):
        ra = a if len(a) == 1 else alias.get(a)
        rb = b if len(b) == 1 else alias.get(b)
        if ra is None or rb is None:
            raise ValueError(
                f"merge {i} ({a!r},{b!r}) references a symbol no earlier "
                "merge produced — merges must be in training order"
            )
        out = chr(alias_base + i)
        alias[a + b] = out
        steps.append((ra + rb, out))
    return steps


def bpe_normalize(text: Column) -> Column:
    """The tokenizer's canonical pre-tokenization: case-fold, strip
    everything outside [a-z0-9 ], collapse runs of whitespace to one
    space, trim. Mirrored verbatim in the DuckDB twins."""
    t = F.regexp_replace(F.lower(text), "[^a-z0-9 ]+", "")
    return F.trim(F.regexp_replace(t, " +", " "))


def bpe_encode(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained BPE merge list (:func:`bpe_train`'s output) to a
    corpus — the INFERENCE half of the tokenizer, the step that actually
    runs over all 100 TB when a training corpus is tokenized.

    Entirely codegen: the merge list compiles to a chain of literal
    ``replace`` calls (:func:`compile_bpe_aliases`) inside one Catalyst
    projection — no Python, no shuffle, no explode; cost is a linear
    scan exactly like the PII scrub. Per document returns the word,
    character, and token counts plus tokens-per-word — the numbers a
    token-budget planner (:func:`pack_token_bins`) consumes.
    """
    steps = compile_bpe_aliases(merges)
    norm = bpe_normalize(F.col(text_col))
    enc = norm
    for pat, out in steps:
        enc = F.replace(enc, F.lit(pat), F.lit(out))
    n_chars = F.length(F.replace(norm, F.lit(" "), F.lit("")))
    n_tokens = F.length(F.replace(enc, F.lit(" "), F.lit("")))
    n_words = F.when(norm == "", F.lit(0)).otherwise(
        F.size(F.split(norm, " "))
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.when(n_words > 0, F.round(n_tokens / n_words, 6))
        .otherwise(F.lit(0.0))
        .alias("tokens_per_word"),
    )


def quality_classifier_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    salt: str = "qc",
) -> DataFrame:
    """Hashed linear text classifier — fastText-style bag-of-words
    scoring (Joulin et al. 2016), the standard cheap quality filter in
    front of an LLM data pipeline (e.g. CCNet/LLaMA's linear classifier
    pass). ``weights`` is a (bucket int, w_milli long) model table:
    token -> md5 hash -> bucket -> integer milliweight; document score =
    sum of its tokens' milliweights.

    Scale shape: the model table rides ONE broadcast as a map literal
    (map_from_entries over collect_list — model tables are KB-to-MB),
    and scoring is a Catalyst higher-order ``aggregate`` over the token
    array — zero shuffle, zero Python, zero explode; the corpus is
    scanned once. INTEGER milliweights make the sum order-independent,
    so the DuckDB twin (explode + join + SUM) is bit-exact even though
    it visits tokens in a different order.
    """
    wmap = weights.groupBy().agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col("bucket").cast("int").alias("k"),
                    F.col("w_milli").cast("long").alias("v"),
                )
            )
        ).alias("__wmap")
    )
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda t: t != F.lit(""),
    )

    def bucket(t: Column) -> Column:
        h = F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(salt), t)), 1, 12), 16, 10
        ).cast("long")
        return (h % n_buckets).cast("int")

    score_milli = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.coalesce(F.element_at(F.col("__wmap"), bucket(t)), F.lit(0).cast("long")),
    )
    return df.crossJoin(F.broadcast(wmap)).select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        score_milli.alias("score_milli"),
        F.round(score_milli / F.lit(1000.0), 6).alias("score"),
    )


def bigram_lm_scores(
    df: DataFrame,
    train: DataFrame | None = None,
    k_smooth: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bigrams, avg_nll): per-document average negative
    log2-likelihood under an add-k-smoothed bigram language model — the
    CCNet quality-filter shape (Wenzek et al. 2020: score every document
    with an LM trained on a trusted corpus, bucket by perplexity). This
    is the n-gram stand-in for KenLM: same pipeline role, and unlike a
    binary model artifact it is fully relational, so the DuckDB twin
    re-derives the ENTIRE model — counts, smoothing, vocabulary — not
    just the scores.

    ``train`` is the LM corpus (defaults to ``df`` itself — self-
    perplexity, the repetition/boilerplate signal). P(w2 | w1) =
    (c(w1,w2) + k) / (c(w1) + k*V) with V = |train vocabulary|; bigrams
    whose w1 is out-of-vocabulary use c(w1) = 0 (pure smoothing mass).
    avg_nll is rounded half-up to 6 after the sum, so a <=1-ulp libm
    difference per log term (~1e-14 total) can never flip the hash.

    Scale shape: the model IS a DataFrame — bigram counts shuffle once
    on (w1, w2) at training, scoring is two hash joins (bigram, then
    unigram) + one agg; nothing is collected, the model can be as large
    as the corpus' bigram set. Documents with < 2 tokens score NULL
    avg_nll with n_bigrams = 0 (kept, flaggable downstream)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != F.lit(""),
    )

    def bigrams(frame):
        return (
            frame.select(F.col(id_col), toks.alias("__t"))
            .select(
                id_col,
                F.explode(
                    # slice-then-transform: short docs yield an empty
                    # struct array (sequence(1, 0) would count DOWN)
                    F.expr(
                        "transform(slice(__t, 1, greatest(size(__t) - 1, 0)),"
                        " (w, i) -> struct(w AS w1, __t[i + 1] AS w2))"
                    )
                ).alias("bg"),
            )
            .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        )

    lm_src = bigrams(train if train is not None else df)
    big = lm_src.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = lm_src.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = lm_src.select(
        F.explode(F.array("w1", "w2")).alias("w")
    ).agg(F.countDistinct("w").alias("v"))

    scored = (
        bigrams(df)
        .join(big, ["w1", "w2"], "left")
        .join(uni, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            (
                -F.log2(
                    (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(float(k_smooth)))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(k_smooth)) * F.col("v"))
                )
            ).alias("nll"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.floor(F.avg("nll") * 1e6 + F.lit(0.5)) / 1e6).alias("avg_nll"),
        )
    )
    return (
        df.select(id_col).join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "avg_nll",
        )
    )


def perplexity_buckets(
    scored: DataFrame,
    n_buckets: int = 3,
    id_col: str = "doc_id",
    nll_col: str = "avg_nll",
) -> DataFrame:
    """CCNet head/middle/tail: NTILE(n) over (avg_nll, doc_id) — lowest
    perplexity = bucket 1 ("head"). Unscored documents (< 2 tokens) sort
    last by the NULLS LAST order, landing in the tail bucket, which is
    the conservative call for a quality filter.

    Scale note: NTILE over an unpartitioned window is a single-reducer
    sort of the (id, score) frame — exact and twin-matchable, fine into
    the billions of 3-column rows, but at the 10^12 design point assign
    buckets by percentile THRESHOLDS instead (one tiny collect of n-1
    boundaries from the percentile machinery, broadcast compare): same
    buckets except at exact boundary ties, no global sort."""
    from pyspark.sql import Window

    w = Window.orderBy(
        F.col(nll_col).asc_nulls_last(), F.col(id_col).asc()
    )
    return scored.select(
        id_col, "n_bigrams", nll_col,
        F.ntile(n_buckets).over(w).alias("bucket"),
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """C4-style EXACT PARAGRAPH dedup (Raffel et al. 2020 used
    three-sentence spans; the unit here is the ``sep``-delimited
    paragraph): corpus-wide, only the FIRST occurrence of each distinct
    paragraph survives — first = lowest (doc id, position) — and every
    document is reassembled from its surviving paragraphs in original
    order. Returns (id, text, n_paragraphs, n_dropped); a document whose
    every paragraph was seen before comes back with empty text and the
    counts to prove it (drop/keep policy belongs to the caller).

    Paragraphs shorter than ``min_chars`` pass through untouched (blank
    separators and stray whitespace are structure, not content).

    Scale shape: one posexplode (rows = paragraphs), ONE shuffle keyed
    by the paragraph (the window that picks the first occurrence; at
    100 TB key on ``xxhash64(para)`` instead of the raw string to keep
    shuffle rows narrow — same plan), one groupBy(id) to reassemble.
    Exactly the plan of the exact-dedup family, at paragraph grain."""
    from pyspark.sql import Window

    # F.split takes a Java REGEX but array_join reassembles with the
    # LITERAL separator — quote the pattern (Pattern.quote algorithm) so
    # metacharacter separators ('||', '.', ...) split literally too.
    sep_rx = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_rx)).alias("__pos", "__para"),
    )
    target = paras.filter(F.length("__para") >= min_chars)
    passthrough = paras.filter(F.length("__para") < min_chars)
    w = Window.partitionBy("__para").orderBy(id_col, "__pos")
    kept = (
        target.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1).drop("__rn")
        .unionByName(passthrough)
    )
    stats = paras.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_paragraphs"))
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__para"))),
                    lambda x: x["__para"],
                ),
                sep,
            ).alias(text_col),
            F.count(F.lit(1)).alias("__n_kept"),
        )
    )
    return (
        df.select(id_col).join(rebuilt, id_col, "left")
        .join(stats, id_col)
        .select(
            id_col,
            F.coalesce(text_col, F.lit("")).alias(text_col),
            "n_paragraphs",
            (F.col("n_paragraphs") - F.coalesce("__n_kept", F.lit(0)))
            .alias("n_dropped"),
        )
    )


def exact_substring_spans(
    df: DataFrame,
    min_len: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_on_hash: bool = False,
) -> DataFrame:
    """ExactSubstr duplicated-span detection at CHARACTER grain (the Lee
    et al. 2022 "Deduplicating Training Data Makes Language Models
    Better" semantics): every maximal span whose every ``min_len``-char
    window occurs at least twice in the corpus is reported, EXCEPT at
    the globally first occurrence of each window — first = lowest
    (doc id, position) — so exactly one copy of every duplicated string
    survives a downstream cut.

    Returns one row per maximal removable span: (id, span_start 1-based,
    span_end exclusive, span_len). Two removable windows whose starts
    differ by at most ``min_len`` merge into one span (overlapping or
    exactly adjacent coverage is one contiguous duplicated region).

    Scale shape (the suffix-array replacement): one in-row transform
    expands each doc into its L-char window starts (rows = chars, no
    text replication — the window string is materialized per row), ONE
    shuffle keyed by the window to rank occurrences, one narrow
    per-doc window pass to merge positions into maximal spans. At
    100 TB pass ``key_on_hash=True``: the occurrence ranking keys on
    ``xxhash64(window)`` (8-byte shuffle key instead of L chars; a
    collision can only cause an over-removal and is ~2^-64 per pair),
    which is also the published trick for suffix-array-free ExactSubstr
    in relational engines. The fixture gate runs with raw keys so the
    DuckDB twin is definitionally exact.
    """
    from pyspark.sql import Window

    L = int(min_len)
    if L < 2:
        raise ValueError("min_len must be >= 2")
    m = F.length(F.col(text_col)) - F.lit(L - 1)
    win_t = "array<struct<pos:int,gram:string>>"
    occ = (
        df.select(
            F.col(id_col),
            F.explode(
                F.when(
                    m > 0,
                    F.transform(
                        F.sequence(F.lit(1), m),
                        lambda p: F.struct(
                            p.cast("int").alias("pos"),
                            F.col(text_col).substr(p, F.lit(L)).alias("gram"),
                        ),
                    ),
                ).otherwise(F.lit(None).cast(win_t))
            ).alias("o"),
        )
        .select(F.col(id_col), F.col("o.pos").alias("pos"), F.col("o.gram").alias("gram"))
    )
    key = F.xxhash64("gram").alias("k") if key_on_hash else F.col("gram").alias("k")
    occ = occ.select(id_col, "pos", key)
    wg = Window.partitionBy("k").orderBy(id_col, "pos")
    wc = Window.partitionBy("k")
    removable = (
        occ.withColumn("__rn", F.row_number().over(wg))
        .withColumn("__cnt", F.count(F.lit(1)).over(wc))
        .filter((F.col("__cnt") >= 2) & (F.col("__rn") > 1))
        .select(id_col, "pos")
    )
    wd = Window.partitionBy(id_col).orderBy("pos")
    isl = (
        removable.withColumn("__prev", F.lag("pos").over(wd))
        .withColumn(
            "__new",
            F.when(
                F.col("__prev").isNull() | (F.col("pos") - F.col("__prev") > L), 1
            ).otherwise(0),
        )
        .withColumn(
            "__island",
            F.sum("__new").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        isl.groupBy(id_col, "__island")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + F.lit(L)).cast("int").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_len"),
        )
    )


def exact_substring_dedup(
    df: DataFrame,
    min_len: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_on_hash: bool = False,
) -> DataFrame:
    """Cut every removable span found by :func:`exact_substring_spans`
    out of its document, keeping the globally-first occurrence of every
    duplicated string — the full ExactSubstr dedup pass. Returns
    (id, text_clean, n_chars, removed_chars, n_spans); documents with
    nothing duplicated pass through byte-identical.

    The cut itself is one Catalyst projection: the per-doc span list
    (already maximal and non-overlapping by construction) folds over the
    original text with ``F.aggregate``, concatenating the kept segments
    between spans — no Python, no second pass over the corpus.
    """
    spans = exact_substring_spans(
        df, min_len=min_len, id_col=id_col, text_col=text_col,
        key_on_hash=key_on_hash,
    )
    per_doc = spans.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("__spans"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_len").alias("removed_chars"),
    )
    joined = df.join(per_doc, id_col, "left")
    txt = F.col(text_col)
    acc_t = "struct<txt:string,nxt:int>"
    init = F.struct(F.lit("").alias("txt"), F.lit(1).cast("int").alias("nxt"))
    folded = F.aggregate(
        F.coalesce("__spans", F.array().cast("array<struct<span_start:int,span_end:int>>")),
        init.cast(acc_t),
        lambda acc, s: F.struct(
            F.concat(
                acc["txt"],
                txt.substr(acc["nxt"], F.greatest(s["span_start"] - acc["nxt"], F.lit(0))),
            ).alias("txt"),
            s["span_end"].alias("nxt"),
        ),
        lambda acc: F.concat(
            acc["txt"],
            txt.substr(
                acc["nxt"], F.greatest(F.length(txt) - acc["nxt"] + 1, F.lit(0))
            ),
        ),
    )
    return joined.select(
        F.col(id_col),
        folded.alias("text_clean"),
        F.length(txt).cast("long").alias("n_chars"),
        F.coalesce("removed_chars", F.lit(0)).cast("long").alias("removed_chars"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
    )


def _suffix_rank_tables(
    df: DataFrame,
    max_prefix: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Internal prefix-doubling core: returns ``(final, tables)`` —
    the final rank frame plus the rank-by-s-prefix table for every
    power-of-two cap s (the doubling tables the LCP computation in
    :func:`repeated_substring_stats` walks). Public surface:
    :func:`suffix_ranks`.

    Distributed suffix-array construction by PREFIX DOUBLING
    (Manber–Myers 1990), capped at ``max_prefix`` characters: computes
    (id, pos 1-based, rank) where ``rank`` is the 1-based DENSE rank of
    every corpus suffix under lexicographic order of its first
    ``max_prefix`` chars — the index structure behind suffix-array
    ExactSubstr dedup, longest-repeated-substring mining, and BWT.

    Round k upgrades 2^k-prefix ranks to 2^(k+1)-prefix ranks with ONE
    equi-join (each suffix fetches the rank of the suffix 2^k ahead in
    the SAME document; a missing continuation — suffix shorter than the
    window — sorts first via a -1 sentinel, exactly the
    shorter-string-is-a-prefix rule) and ONE global dense rank, which
    runs distributed (range-partitioned local ranks + O(partitions)
    offsets, :func:`..functions.ranking.distributed_dense_rank`) — never
    a single-partition window. ceil(log2(max_prefix)) rounds total, with
    an early exit once every suffix holds a distinct rank (the corpus'
    duplicated-prefix depth, usually << the cap). Rows shuffled per
    round are (id, pos, rank, rank2) — narrow and O(corpus chars).

    The cap makes the result independently verifiable: rank ==
    DENSE_RANK() OVER (ORDER BY substr(text, pos, max_prefix)) — the
    DuckDB twin — while uncapped construction continues the same loop
    to log(longest doc) rounds.
    """
    from ..functions.ranking import distributed_dense_rank

    p = int(max_prefix)
    if p < 2 or (p & (p - 1)) != 0:
        raise ValueError("max_prefix must be a power of two >= 2")
    t = F.col(text_col)
    # sequence(1, 0) is DESCENDING in Spark — an empty doc must yield no
    # suffixes, not positions [1, 0]
    occ = df.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.length(t) > 0,
                F.transform(
                    F.sequence(F.lit(1), F.length(t)),
                    lambda q: F.struct(
                        q.cast("int").alias("pos"),
                        F.ascii(t.substr(q, F.lit(1))).cast("long").alias("r"),
                    ),
                ),
            ).otherwise(F.lit(None).cast("array<struct<pos:int,r:long>>"))
        ).alias("o"),
    ).select(F.col(id_col), F.col("o.pos").alias("pos"), F.col("o.r").alias("r"))
    total = occ.count()
    step = 1
    tables: "dict[int, DataFrame]" = {1: occ}
    while step < p:
        nxt = occ.select(
            F.col(id_col), (F.col("pos") - step).alias("pos"),
            F.col("r").alias("r2"),
        ).filter(F.col("pos") >= 1)
        j = (
            occ.join(nxt, [id_col, "pos"], "left")
            .withColumn("r2", F.coalesce("r2", F.lit(-1)).cast("long"))
        )
        occ = distributed_dense_rank(j, ["r", "r2"], out="__nr").select(
            id_col, "pos", F.col("__nr").alias("r")
        )
        step *= 2
        occ = occ.localCheckpoint(eager=True)  # truncate join lineage
        tables[step] = occ
        if step < p and occ.agg(F.max("r")).collect()[0][0] == total:
            break  # all suffixes distinct: further rounds are no-ops
    # an early exit leaves the higher caps unmaterialized; all-distinct
    # ranks are equivalent for every larger cap (equality is always
    # false there), so the exit table stands in for them
    sfill = step
    while sfill < p:
        sfill *= 2
        tables[sfill] = occ
    return occ, tables


def suffix_ranks(
    df: DataFrame,
    max_prefix: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Capped suffix-array ranks: (id, pos 1-based, rank) — see
    :func:`_suffix_rank_tables` for the distributed prefix-doubling
    construction and its verification contract (rank ==
    ``DENSE_RANK() OVER (ORDER BY substr(text, pos, max_prefix))``)."""
    final, _ = _suffix_rank_tables(
        df, max_prefix=max_prefix, id_col=id_col, text_col=text_col
    )
    return final.select(id_col, "pos", F.col("r").alias("rank"))


def repeated_substring_stats(
    df: DataFrame,
    max_prefix: int = 64,
    min_len: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Longest-repeated-substring mining via the suffix array — per
    document: ``max_rep`` = length of its longest substring that occurs
    at least twice in the corpus (capped at ``max_prefix``), and
    ``n_rep`` = how many of its suffixes start a repeat of length >=
    ``min_len``. The suffix-array route to the ExactSubstr signal: a doc
    has a >=L duplicated span exactly when max_rep >= L.

    Classic SA/LCP decomposition, all distributed: suffixes sharing a
    capped rank (tie groups) repeat for >= max_prefix chars by
    construction; for adjacent DISTINCT ranks the LCP of one
    representative pair per rank boundary is walked down the
    prefix-doubling tables (Manber-Myers: for s = cap/2..1, if the
    rank-by-s tables agree at offset lcp, lcp += s) — log(cap) rounds of
    two O(ranks)-row equi-joins, never a string comparison. A suffix's
    repeat length is max(LCP to its SA predecessor, LCP to its SA
    successor), which group-level adjacency computes exactly (tie
    members hit the cap; group leaders see the neighboring group's
    shared prefix).
    """
    p = int(max_prefix)
    final, tables = _suffix_rank_tables(
        df, max_prefix=p, id_col=id_col, text_col=text_col
    )
    grp = final.groupBy("r").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__rep"),
        F.count(F.lit(1)).alias("__sz"),
    )
    reps = grp.select(
        F.col("r"),
        F.col("__rep")[id_col].alias("__ida"),
        F.col("__rep")["pos"].alias("__posa"),
        "__sz",
    ).localCheckpoint(eager=True)
    # pair rank r with rank r-1's representative
    pairs = reps.select("r", "__ida", "__posa").join(
        reps.select(
            (F.col("r") + 1).alias("r"),
            F.col("__ida").alias("__idb"),
            F.col("__posa").alias("__posb"),
        ),
        "r",
    ).withColumn("__lcp", F.lit(0))
    s = p // 2
    while s >= 1:
        tab = tables[s]
        ta = tab.select(
            F.col(id_col).alias("__ida"), F.col("pos").alias("__pa"),
            F.col("r").alias("__ra"),
        )
        tb = tab.select(
            F.col(id_col).alias("__idb"), F.col("pos").alias("__pb"),
            F.col("r").alias("__rb"),
        )
        pairs = (
            pairs.withColumn("__pa", F.col("__posa") + F.col("__lcp"))
            .withColumn("__pb", F.col("__posb") + F.col("__lcp"))
            .join(ta, ["__ida", "__pa"], "left")
            .join(tb, ["__idb", "__pb"], "left")
            .withColumn(
                "__lcp",
                F.col("__lcp")
                + F.when(
                    F.col("__ra").isNotNull()
                    & (F.col("__ra") == F.col("__rb")),
                    F.lit(s),
                ).otherwise(F.lit(0)),
            )
            .drop("__pa", "__pb", "__ra", "__rb")
        )
        pairs = pairs.localCheckpoint(eager=True)
        s //= 2
    # lcp_prev for rank r; lcp_next for rank r is pairs at r+1
    lcp_prev = pairs.select("r", F.col("__lcp").alias("__lp"))
    lcp_next = pairs.select((F.col("r") - 1).alias("r"), F.col("__lcp").alias("__ln"))
    # a tie group proves its members share their whole CAPPED prefix —
    # which is the full (shorter-than-cap) suffix when the doc ends
    # early, so the repeat length is min(cap, remaining chars), not cap
    lens = df.select(F.col(id_col), F.length(F.col(text_col)).alias("__len"))
    per_suffix = (
        final.join(F.broadcast(grp.select("r", "__sz")), "r")
        .join(lcp_prev, "r", "left")
        .join(lcp_next, "r", "left")
        .join(lens, id_col)
        .select(
            F.col(id_col),
            F.greatest(
                F.when(
                    F.col("__sz") >= 2,
                    F.least(F.lit(p), F.col("__len") - F.col("pos") + 1),
                ).otherwise(F.lit(0)),
                F.coalesce("__lp", F.lit(0)),
                F.coalesce("__ln", F.lit(0)),
            ).alias("__rep"),
        )
    )
    agg = per_suffix.groupBy(id_col).agg(
        F.max("__rep").cast("int").alias("max_rep"),
        F.sum((F.col("__rep") >= min_len).cast("long")).alias("n_rep"),
    )
    return (
        df.select(id_col).join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("max_rep", F.lit(0)).cast("int").alias("max_rep"),
            F.coalesce("n_rep", F.lit(0)).cast("long").alias("n_rep"),
        )
    )


def _dsir_bucket(t: Column, n_buckets: int, salt: str) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), t)), 1, 12), 16, 10
    ).cast("long")
    return (h % n_buckets).cast("int")


def _dsir_features(text_col: str):
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                "", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    text_col: str = "text",
    salt: str = "dsir",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hashed unigram+bigram
    features, per-bucket log-likelihood ratio between the TARGET
    distribution (the small trusted corpus you want more of) and the
    RAW distribution (the pile you are selecting from), add-1 smoothed:

        w(b) = ln( (ct[b]+1)*(Nq+B) / ((cq[b]+1)*(Nt+B)) )

    quantized to integer MICRO-nats (one ln of an exact int64 rational,
    one multiply, one half-away round -- the identical double sequence
    in the DuckDB twin), so document scores are order-independent
    integer sums. Returns (bucket, w_micro). Both count aggregations are
    plain explode+groupBy over O(corpus tokens) narrow rows; the weight
    table is O(n_buckets) -- a broadcastable model like the
    fastText-style classifier's (:func:`quality_classifier_score`)."""
    feats = _dsir_features(text_col)

    def counts(df: DataFrame) -> DataFrame:
        # one corpus scan: explode -> hash -> groupBy; repartition first
        # so the md5-heavy projection parallelizes even off a one-file
        # read. The O(n_buckets) result is checkpointed — totals and the
        # ratio read IT, never the corpus again.
        par = df.sparkSession.sparkContext.defaultParallelism
        return (
            df.repartition(par)
            .select(F.explode(feats).alias("__f"))
            .select(_dsir_bucket(F.col("__f"), n_buckets, salt).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint(eager=True)
        )
    ct, cq = counts(target), counts(raw)
    nt = ct.agg(F.sum("c")).collect()[0][0] or 0
    nq = cq.agg(F.sum("c")).collect()[0][0] or 0
    b = int(n_buckets)
    joined = (
        ct.withColumnRenamed("c", "ct")
        .join(cq.withColumnRenamed("c", "cq"), "bucket", "full")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cq", F.lit(0)).alias("cq"),
        )
    )
    ratio = (
        (F.col("ct") + 1).cast("double") * F.lit(float(nq + b))
    ) / ((F.col("cq") + 1).cast("double") * F.lit(float(nt + b)))
    return joined.select(
        "bucket",
        F.round(F.log(ratio) * F.lit(1e6)).cast("long").alias("w_micro"),
    )


def dsir_scores(
    df: DataFrame,
    weights: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir",
) -> DataFrame:
    """Score every document under a DSIR weight table: score = sum of
    w_micro over its hashed unigram+bigram features -- documents shaped
    like the target corpus score high, generic pile text scores ~0,
    anti-target text negative. One broadcast map literal + one Catalyst
    higher-order aggregate per doc: zero shuffle, zero Python, the
    corpus scanned once (same plan as the hashed classifier). Returns
    (id, n_feats, score_micro, score); integer micro-nat sums make the
    result bit-identical however the corpus is partitioned."""
    feats = _dsir_features(text_col)
    wmap = weights.groupBy().agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col("bucket").cast("int").alias("k"),
                    F.col("w_micro").cast("long").alias("v"),
                )
            )
        ).alias("__wmap")
    )
    score = F.aggregate(
        feats,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.coalesce(
            F.element_at(F.col("__wmap"), _dsir_bucket(t, n_buckets, salt)),
            F.lit(0).cast("long"),
        ),
    )
    return df.crossJoin(F.broadcast(wmap)).select(
        F.col(id_col),
        F.size(feats).cast("long").alias("n_feats"),
        score.alias("score_micro"),
        F.round(score / F.lit(1e6), 6).alias("score"),
    )
