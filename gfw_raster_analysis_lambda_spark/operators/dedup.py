"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design rules for 100-TB scale:
- everything is relational (explode -> hash -> groupBy/join) so Catalyst
  gets partial aggregation and AQE everywhere; no Python UDFs at all —
  token hashing is ``conv(substr(md5(...)))`` which is verified to produce
  bit-identical int64 in DuckDB, making every operator oracle-checkable;
- candidate generation is always *bucketed* (LSH bands / simhash equality
  / shared shingles) so the pair space never goes quadratic; exact
  verification (Jaccard / cosine) runs only on candidates;
- pairs are emitted with ``a < b`` ordering for determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared primitives
# ---------------------------------------------------------------------------

def spread_input(df: DataFrame) -> DataFrame:
    """Round-robin the input across the cluster when the scan is
    narrower than the core count (guide §2.5, input skew): a small
    COMPRESSED parquet table (one file, one row group) arrives as ONE
    scan task, which serializes every explode/regex/kernel pipeline
    built on it — the few-MB shuffle is orders of magnitude cheaper
    than the serial stage it prevents. No-op whenever the source is
    already at least core-parallel (a 100-TB scan has thousands of
    splits, so this never fires at scale)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        # only storage-backed inputs have the narrow-scan problem; a
        # driver-local relation (tests, tiny literals) keeps its plan
        # untouched so shuffle-free operator contracts stay assertable
        if "LocalRelation" in df._jdf.queryExecution().optimizedPlan().toString():
            return df
        nparts = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if nparts < target else df


def token_hash(seed: Column, token: Column) -> Column:
    """Deterministic 60-bit hash of (seed, token) via md5 — identical in
    Spark and DuckDB."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", seed.cast("string"), token)), 1, 15), 16, 10
    ).cast("long")


def tokens(df: DataFrame, id_col: str, text_col: str, distinct: bool = True) -> DataFrame:
    """(id, token) pairs, lowercased whitespace tokens. ``distinct=False``
    skips the dedup shuffle for consumers whose aggregate is
    duplicate-insensitive (MIN for minhash)."""
    arr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    if distinct:
        # per-document dedup inside the array expression: (id, token)
        # distinct == array_distinct within the doc, so the global
        # distinct's full shuffle of every token row disappears (guide
        # §2.4 — remove shuffles outright)
        arr = F.array_distinct(arr)
    return (
        spread_input(df)
        .select(F.col(id_col).alias("id"), F.explode(arr).alias("tok"))
        .filter(F.col("tok") != "")
    )


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (positional window over
    the token array, JVM-side). Per-document distinctness is established
    INSIDE the array expression (``array_distinct``) — bit-identical to a
    global (id, shingle) ``.distinct()`` since the id rides every row,
    but with zero shuffle (guide §2.4): the old global distinct
    re-shuffled every shingle of the corpus before any consumer saw it."""
    arr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return (
        spread_input(df)
        .select(F.col(id_col).alias("id"), arr.alias("toks"))
        .select(
            "id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), F.greatest(F.size("toks") - n, F.lit(0))),
                        lambda i: F.concat_ws(" ", F.slice("toks", i + 1, n)),
                    )
                )
            ).alias("shingle"),
        )
        .filter(F.length("shingle") > 0)
    )


# ---------------------------------------------------------------------------
# 1. exact dedup (hash group-by)
# ---------------------------------------------------------------------------

def _exact_text_key(text: Column) -> Column:
    """THE normalization exact dedup keys on — one definition so callers
    (e.g. the curation job's loser expansion) can never silently diverge
    from :func:`exact_duplicates`."""
    return F.md5(F.trim(text))


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (after trim) texts: (text_md5, n_dups,
    keeper) for groups with more than one member. The keeper is the min id
    (deterministic survivor policy)."""
    return (
        df.select(F.col(id_col).alias("id"), _exact_text_key(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("id").alias("keeper"))
        .filter(F.col("n_dups") > 1)
    )


def exact_dedup_losers(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id) rows of every NON-keeper member of an exact-duplicate group —
    the drop list a curation pipeline anti-joins against. Shares the key
    normalization with :func:`exact_duplicates` by construction."""
    groups = exact_duplicates(df, id_col=id_col, text_col=text_col)
    return (
        df.select(F.col(id_col), _exact_text_key(F.col(text_col)).alias("__md5"))
        .join(groups.select(F.col("text_md5").alias("__md5"), "keeper"), "__md5")
        .filter(F.col(id_col) != F.col("keeper"))
        .select(id_col)
    )


# ---------------------------------------------------------------------------
# 2. MinHash + LSH banding
# ---------------------------------------------------------------------------

# Fixed permutation constants (odd, < 2^31): h_i = (A[i]*h + B[i]) mod M31.
# Hardcoded (seeded-LCG generated once) so Spark and the DuckDB oracle can
# both inline them as literals; all intermediates stay < 2^62 (no int64
# overflow in either engine).
MINHASH_A = [1301949169, 1273339599, 1171922645, 1289066979, 272379225, 672768791,
             654743421, 189409131, 488080961, 1523276767, 660032165, 1218608499,
             720674217, 2026705191, 695918669, 1256858619]
MINHASH_B = [1783782289, 92637935, 733642869, 1473585923, 332277753, 322441527,
             748802845, 1044906635, 218884833, 1473014783, 170328133, 1751108243,
             203295817, 2115429191, 55750637, 2113536795]
M31 = 2147483647  # 2^31 - 1


def minhash_signatures(df: DataFrame, id_col: str, text_col: str, n_hashes: int = 8) -> DataFrame:
    """(id, mh0..mh{n-1}): n permutations of the token set. Each token is
    string-hashed ONCE (md5 -> int64), then the n permutations are integer
    LCG remixes — n_hashes mins computed in a single groupBy. No per-seed
    explode (the shuffle carries |tokens| rows, not n_hashes x |tokens|)
    and no token-dedup shuffle (MIN is duplicate-insensitive)."""
    t = tokens(df, id_col, text_col, distinct=False)
    h31 = token_hash(F.lit(0), F.col("tok")) % F.lit(2147483648)
    aggs = [
        F.min((F.lit(MINHASH_A[i]) * h31 + F.lit(MINHASH_B[i])) % F.lit(M31)).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return t.groupBy("id").agg(*aggs)


def _band_keys(bands: int, rows_per_band: int) -> list:
    """Band-key columns over a minhash signature row (mh0..mh{n-1}).

    The band IDENTITY is "the tuple of the band's minhashes"; any
    injective encoding of that tuple yields the same bucket equalities.
    With ``rows_per_band <= 2`` the two sub-2^31 mins pack exactly into
    one int64 (``mh_a << 31 | mh_b``) — a collision-FREE key that joins
    and compares as a single long instead of a 32-char md5 string (the
    md5 form is kept for wider bands, and stays the DuckDB oracle's
    formulation either way — equal tuples, equal keys, in both)."""
    if rows_per_band == 1:
        return [F.col(f"mh{b}").alias(f"bk{b}") for b in range(bands)]
    if rows_per_band == 2:
        return [
            (F.shiftleft(F.col(f"mh{2 * b}"), 31) + F.col(f"mh{2 * b + 1}")).alias(f"bk{b}")
            for b in range(bands)
        ]
    return [
        F.md5(F.concat_ws(",", *[
            F.col(f"mh{b * rows_per_band + j}").cast("string")
            for j in range(rows_per_band)
        ])).alias(f"bk{b}")
        for b in range(bands)
    ]


def minhash_lsh_candidates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_hashes: int = 8, bands: int = 4, max_pairs: int | None = None,
    salts: int = 32,
) -> DataFrame:
    """Candidate pairs (a < b) sharing at least one LSH band.

    Each pair is emitted EXACTLY ONCE — at its first matching band — by a
    join-side filter over the full band-key vector (both sides carry all
    band keys; a pair matching at band b is suppressed when any earlier
    band also matched). That is a codegen filter instead of the obvious
    ``.distinct()``, which at near-dup-heavy corpora re-shuffles the
    entire O(pairs) output (measured 73% of this query's wall time at
    sf0.1: 9.8M pair rows).

    Physical shape (r6): the signature frame is computed ONCE and
    localCheckpoint-ed (a self-join would otherwise re-run the whole
    tokenize+minhash lineage on both sides), band keys are packed int64s
    when ``n_hashes/bands <= 2`` (see :func:`_band_keys`), and the
    self-join is SALTED: the right side carries ``pmod(xxhash64(id),
    salts)``, the left side replicates each row ``salts`` ways, and the
    salt joins as a third equi-key. A duplicate-saturated bucket of B
    docs (sf1 corpus: B = 31k in one band bucket, ~2.1e9 combos) is one
    sort-merge key group — ONE task — without the salt; with it the
    bucket's combo space splits into ``salts`` even slices (AQE skew
    handling cannot split a single key, guide §2.5, so the salt is the
    only lever). Replication cost is O(docs x bands x salts) tiny rows.

    The output is inherently O(pairs): a duplicate-saturated corpus
    materializes B(B-1)/2 rows per hot bucket. This operator is the
    DIAGNOSTIC path — production dedup goes through the O(docs)
    :func:`minhash_dedup_keepers` / cluster closure. ``max_pairs``
    is the un-OOM-able guard for the diagnostic path: before any pair is
    materialized, one cheap bucket-size aggregation (O(docs x bands)
    rows) upper-bounds the pair count as sum nb*(nb-1)/2 over buckets
    (an upper bound — cross-band duplicate pairs are suppressed in the
    real output), and past the bound the call fails fast with the probe
    numbers instead of shuffling an unbounded pair set."""
    rows_per_band = n_hashes // bands
    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sig = minhash_signatures(df, id_col, text_col, n_hashes)
    # round-robin BEFORE the checkpoint: AQE coalesces the signature
    # groupBy's output to ~1 partition (50k rows is byte-tiny), and a
    # 1-partition checkpoint would serialize both of the join's map
    # stages; explicit repartition is exempt from AQE coalescing
    keyed = sig.select("id", *_band_keys(bands, rows_per_band)).repartition(
        n_part
    ).localCheckpoint(eager=True)
    band_structs = [
        F.struct(F.lit(b).alias("band"), F.col(f"bk{b}").alias("band_key"))
        for b in range(bands)
    ]
    banded = keyed.select(
        "id", *[f"bk{b}" for b in range(bands)],
        F.explode(F.array(*band_structs)).alias("bk"),
    ).select(
        "id", *[f"bk{b}" for b in range(bands)],
        F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"),
    )
    if max_pairs is not None:
        probe = (
            banded.groupBy("band", "band_key")
            .agg(F.count(F.lit(1)).alias("nb"))
            .agg(F.coalesce(
                F.sum(F.col("nb") * (F.col("nb") - 1) / 2), F.lit(0.0)
            ).cast("long").alias("ub"))
            .collect()[0]["ub"]
        )
        if probe > max_pairs:
            raise ValueError(
                f"minhash_lsh_candidates would materialize up to {probe} "
                f"candidate pairs (> max_pairs={max_pairs}); use the O(docs) "
                "minhash_dedup_keepers / minhash_dedup_clusters paths for "
                "duplicate-saturated corpora, or raise max_pairs"
            )
    s = int(salts)
    # explicit hash repartition on the 3 equi-keys: it satisfies the
    # join's distribution requirement (no second Exchange) and — being
    # user-specified — is exempt from AQE partition coalescing, which
    # would otherwise merge the byte-tiny map outputs into a couple of
    # reduce partitions and serialize the O(pairs) join output (the
    # join's input bytes say nothing about its output rows)
    # 4x the shuffle-partition count: the hot (band, bucket, salt) work
    # units number bands x salts (128 at the defaults) and hash-collide
    # at 1x — finer granularity keeps the pair-heavy groups one-per-task
    # (scale-adaptive: follows spark.sql.shuffle.partitions, no constant)
    join_parts = 4 * n_part
    left = banded.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(s - 1)))
    ).repartition(join_parts, "band", "band_key", "salt").alias("l")
    right = banded.withColumn(
        "salt", F.pmod(F.xxhash64("id"), F.lit(s)).cast("int")
    ).repartition(join_parts, "band", "band_key", "salt").alias("r")
    cond = (
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.band_key") == F.col("r.band_key"))
        & (F.col("l.salt") == F.col("r.salt"))
        & (F.col("l.id") < F.col("r.id"))
    )
    for b in range(bands - 1):
        # first-match-only: at band B, every earlier band's keys must differ
        cond = cond & (
            (F.col("l.band") <= F.lit(b)) | (F.col(f"l.bk{b}") != F.col(f"r.bk{b}"))
        )
    return left.join(right, cond).select(
        F.col("l.id").alias("a"), F.col("r.id").alias("b")
    )


def minhash_dedup_keepers(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_hashes: int = 8, bands: int = 4,
) -> DataFrame:
    """Scale path for near-dup-heavy corpora: (id, keeper) assignments
    instead of candidate pairs. A hot LSH bucket of B near-identical
    documents yields B-1 assignment rows here versus B(B-1)/2 pair rows
    from minhash_lsh_candidates — output stays O(docs) no matter how
    duplicated the corpus is. keeper = min id over the doc's buckets (one
    union-find hop; iterate for full transitive closure if needed)."""
    banded = _banded_checkpointed(df, id_col, text_col, n_hashes, bands)
    buckets = (
        banded.groupBy("band", "band_key")
        .agg(F.min("id").alias("keeper"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    return (
        banded.join(buckets, ["band", "band_key"])
        .groupBy("id")
        .agg(F.min("keeper").alias("keeper"))
        .filter(F.col("id") != F.col("keeper"))
    )


def _banded_checkpointed(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int, bands: int,
) -> DataFrame:
    """(id, band, band_key) with the signature stage localCheckpoint-ed:
    keepers/clusters consume the banded frame on BOTH sides of a
    join (bucket aggregate + member join), and without the checkpoint
    each side re-executes the whole tokenize+minhash lineage (guide §5:
    cut lineage when an intermediate is reused). O(docs) rows, eager."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes)
    keys = _band_keys(bands, rows_per_band)
    keyed = sig.select("id", *keys).localCheckpoint(eager=True)
    band_structs = [
        F.struct(F.lit(b).alias("band"), F.col(f"bk{b}").alias("band_key"))
        for b in range(bands)
    ]
    return keyed.select("id", F.explode(F.array(*band_structs)).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


# ---------------------------------------------------------------------------
# 2b. perceptual-hash near-dup (image axis)
# ---------------------------------------------------------------------------

def phash_near_duplicates(
    images: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate IMAGE pairs (a, b, hamming) by 64-bit perceptual
    hash: Manku-style bit-banding (the simhash-dedup construction from
    Manku et al., WWW'07) — split the hash into ``bands`` chunks, bucket
    on (band, chunk) equality, verify candidates with
    ``bit_count(a XOR b) <= max_hamming``.

    Pigeonhole guarantee: a pair within ``max_hamming <= bands - 1``
    differing bits must agree on at least one whole band, so recall is
    EXACT for that regime (beyond it the banding is probabilistic and a
    wider band count should be used). Candidate generation is bucketed —
    never an all-pairs join — and each pair is emitted exactly once at its
    first matching band via the same join-side filter as
    :func:`minhash_lsh_candidates` (no O(pairs) distinct re-shuffle).
    """
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs bands >= {max_hamming + 1} "
            "for exact recall (pigeonhole over differing bits)"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    keys = [
        (F.shiftrightunsigned(F.col(phash_col), b * width).bitwiseAND(F.lit(mask))).alias(f"bk{b}")
        for b in range(bands)
    ]
    keyed = images.select(F.col(id_col).alias("id"), F.col(phash_col).alias("ph"), *keys)
    band_structs = [
        F.struct(F.lit(b).alias("band"), F.col(f"bk{b}").alias("band_key"))
        for b in range(bands)
    ]
    banded = keyed.select(
        "id", "ph", *[f"bk{b}" for b in range(bands)],
        F.explode(F.array(*band_structs)).alias("bk"),
    ).select(
        "id", "ph", *[f"bk{b}" for b in range(bands)],
        F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"),
    )
    left, right = banded.alias("l"), banded.alias("r")
    cond = (
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.band_key") == F.col("r.band_key"))
        & (F.col("l.id") < F.col("r.id"))
    )
    for b in range(bands - 1):
        cond = cond & (
            (F.col("l.band") <= F.lit(b)) | (F.col(f"l.bk{b}") != F.col(f"r.bk{b}"))
        )
    return (
        left.join(right, cond)
        .withColumn("hamming", F.bit_count(F.col("l.ph").bitwiseXOR(F.col("r.ph"))))
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"), "hamming")
    )


def cross_modal_dups(
    images: DataFrame,  # (id, phash, caption)
    id_col: str = "image_id",
    phash_col: str = "phash",
    caption_col: str = "caption",
    max_hamming: int = 3,
    bands: int = 4,
    min_caption_jaccard: float = 0.5,
) -> DataFrame:
    """Consensus near-duplicates over the image+caption corpus:
    (a, b, hamming, caption_jaccard) pairs that are near-dups in BOTH
    modalities — phash hamming <= max_hamming AND caption token-set
    jaccard >= min_caption_jaccard. The web-crawl dedup rule of thumb:
    a visual match with a disagreeing caption is often a template/frame
    collision, and a caption match with a differing image is a re-crop;
    requiring both slashes false positives.

    Scale shape: candidates come ONLY from the bucketed phash banding
    (pigeonhole-exact recall, never an all-pairs or text self-join);
    caption verification joins token sets against the candidate pairs,
    so the text-side work is O(candidate pairs x caption tokens), not
    O(corpus^2)."""
    pairs = phash_near_duplicates(
        images.select(id_col, phash_col), id_col, phash_col, max_hamming, bands
    )
    t = tokens(images, id_col, caption_col, distinct=True)
    sizes = t.groupBy("id").agg(F.count("*").alias("n"))
    ta = t.select(F.col("id").alias("a"), "tok")
    tb = t.select(F.col("id").alias("b"), "tok")
    inter = (
        pairs.select("a", "b")
        .join(ta, "a")
        .join(tb, ["b", "tok"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("id").alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("id").alias("b"), F.col("n").alias("nb"))
    union = F.col("na") + F.col("nb") - F.col("inter")
    return (
        pairs.join(inter, ["a", "b"], "left")
        .join(na, "a", "left").join(nb, "b", "left")
        # empty/whitespace captions have no token rows: coalesce to 0 so
        # the pair survives with jaccard 0 (two captionless images carry
        # no text evidence -> 0, conservative) instead of being silently
        # dropped by an inner join
        .na.fill({"inter": 0, "na": 0, "nb": 0})
        .withColumn(
            "caption_jaccard",
            F.when(union > 0, F.round(F.col("inter") / union, 6)).otherwise(F.lit(0.0)),
        )
        .filter(F.col("caption_jaccard") >= F.lit(float(min_caption_jaccard)))
        .select("a", "b", "hamming", "caption_jaccard")
    )


def cross_modal_dedup_clusters(
    images: DataFrame,  # (id, phash, caption)
    id_col: str = "image_id",
    phash_col: str = "phash",
    caption_col: str = "caption",
    max_hamming: int = 3,
    bands: int = 4,
    min_caption_jaccard: float = 0.5,
    max_iter: int = 30,
) -> DataFrame:
    """FULL transitive clusters over the CONSENSUS near-dup graph:
    (id, cluster) where cluster is the minimum image id reachable through
    chains of :func:`cross_modal_dups` pairs (near-dup in BOTH modalities
    at every hop). The keeper-assignment composition a user deduping an
    image+caption corpus actually wants: A~B and B~C consensus pairs land
    A, B, C in ONE cluster even when A and C never share a phash band.

    Same composition as :func:`minhash_dedup_clusters`: the pair set is
    already bucket-bounded (phash banding generates candidates, caption
    jaccard verifies — never all-pairs), and :func:`components.hash_to_min`
    pointer-jumps the closure over the STRING image ids natively in
    O(log diameter) rounds. Only images in at least one consensus pair
    appear; singletons are their own (absent) cluster."""
    from .components import hash_to_min

    pairs = cross_modal_dups(
        images, id_col, phash_col, caption_col,
        max_hamming, bands, min_caption_jaccard,
    )
    edges = pairs.select("a", "b").unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    nodes = edges.select(F.col("a").alias("id")).distinct()
    out = hash_to_min(nodes, edges, max_iter=max_iter)
    return out.select("id", F.col("component").alias("cluster"))


def phash_dedup_keepers(
    images: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Scale path for image near-dup: (id, keeper) assignments, O(images)
    output. Synthetic and web image corpora are EXTREMELY duplicate-heavy
    (our own bench corpus: 9216 tiles, 556 distinct phashes, one hash
    shared by 4608 tiles — 43M pair rows if emitted pairwise), so the
    pipeline collapses identical hashes to one representative FIRST, runs
    the banded candidate join over distinct hash values only, and expands
    back to per-image keeper rows at the end. keeper = min id over the
    image's hash group and its banded near-neighbor groups (one
    union-find hop, same policy as :func:`minhash_dedup_keepers`)."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs bands >= {max_hamming + 1} "
            "for exact recall (pigeonhole over differing bits)"
        )
    groups = (
        images.groupBy(F.col(phash_col).alias("ph"))
        .agg(F.min(F.col(id_col)).alias("rep"))
    )
    pairs = phash_near_duplicates(
        groups, id_col="rep", phash_col="ph", max_hamming=max_hamming, bands=bands
    )
    # min-id over each rep's neighborhood (both directions + itself)
    neigh = (
        pairs.select(F.col("a").alias("rep"), F.col("b").alias("other"))
        .unionByName(pairs.select(F.col("b").alias("rep"), F.col("a").alias("other")))
        .groupBy("rep")
        .agg(F.min("other").alias("min_other"))
    )
    rep_keeper = groups.join(neigh, "rep", "left").select(
        "ph", F.least(F.col("rep"), F.coalesce(F.col("min_other"), F.col("rep"))).alias("keeper")
    )
    return (
        images.select(F.col(id_col).alias("id"), F.col(phash_col).alias("ph"))
        .join(rep_keeper, "ph")
        .filter(F.col("id") != F.col("keeper"))
        .select("id", "keeper")
    )


# ---------------------------------------------------------------------------
# 3. n-gram Jaccard verification (on candidates or directly on small sets)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, threshold: float = 0.5,
    candidates: DataFrame | None = None,
    df_cap: int | None = None,
) -> DataFrame:
    """Pairs (a, b, jaccard) with word-n-gram Jaccard >= threshold.
    With ``candidates`` given, verifies only those pairs (the LSH path);
    otherwise generates pairs through shared shingles (never a cross
    join — documents sharing zero shingles never meet).

    ``df_cap`` drops shingles whose DOCUMENT FREQUENCY exceeds the cap
    before anything else (standard stop-shingle removal). Without it the
    shared-shingle self-join is quadratic in the hottest shingle's df — one
    boilerplate phrase shared by millions of web documents explodes the
    join. Jaccard is then computed over the capped vocabulary (both the
    intersection and the set sizes), which keeps the statistic internally
    consistent and oracle-expressible; pairs that share ONLY near-universal
    shingles are the ones the LSH candidate path already covers."""
    stats = _ngram_pair_stats(df, id_col, text_col, n, candidates, df_cap)
    ja = (
        stats.withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return ja


def _ngram_pair_stats(
    df: DataFrame, id_col: str, text_col: str, n: int,
    candidates: DataFrame | None, df_cap: int | None,
) -> DataFrame:
    """(a, b, common, sz_a, sz_b) over shared-shingle pairs — the shared
    machinery behind :func:`ngram_jaccard_pairs` and
    :func:`ngram_containment_pairs`."""
    sh = shingles(df, id_col, text_col, n)
    if df_cap is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= df_cap)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    if candidates is not None:
        common = common.join(F.broadcast(candidates), ["a", "b"], "left_semi")
    return (
        common.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "sz_b"), "b")
    )


def ngram_containment_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, threshold: float = 0.7,
    candidates: DataFrame | None = None,
    df_cap: int | None = None,
) -> DataFrame:
    """Pairs where the SMALLER document's n-gram set is mostly contained
    in the other's: ``containment = common / min(|A|, |B|) >= threshold``.

    Containment catches the subset-duplication Jaccard misses: a post
    quoted wholesale inside a longer page has Jaccard |A|/|B| (tiny for a
    long B) but containment ~1. The standard second filter in exact-dedup
    pipelines after the symmetric near-dup pass. Same shared-shingle join
    and ``df_cap`` stop-shingle bound as :func:`ngram_jaccard_pairs` —
    never a cross join; emits (a, b, containment, jaccard) so callers can
    distinguish symmetric near-dups (both high) from strict containment
    (containment high, jaccard low)."""
    stats = _ngram_pair_stats(df, id_col, text_col, n, candidates, df_cap)
    return (
        stats.withColumn(
            "containment",
            F.round(F.col("common") / F.least("sz_a", "sz_b"), 6),
        )
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("a", "b", "containment", "jaccard")
    )


# ---------------------------------------------------------------------------
# 4. SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16) -> DataFrame:
    """(id, simhash): per-bit majority vote of token hashes, fully
    relational: tokens x bits -> sign sum -> weighted bit assembly."""
    t = tokens(df, id_col, text_col).select("id", token_hash(F.lit(0), F.col("tok")).alias("h"))
    # shift by a column: exact integer div/mul by pow(2, b) (2^b <= 2^62 is
    # exactly representable, and the SQL shift functions take literal shifts only)
    per_bit = (
        t.select("id", "h", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"))
        .withColumn("sign", F.expr("(h div cast(pow(2, b) as bigint)) % 2") * 2 - 1)
        .groupBy("id", "b")
        .agg(F.sum("sign").alias("s"))
    )
    return per_bit.groupBy("id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("cast(pow(2, b) as bigint)")).otherwise(F.lit(0))
        ).alias("simhash")
    )


def simhash_duplicate_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """Documents sharing an identical simhash (near-dup buckets)."""
    return (
        simhash(df, id_col, text_col, bits)
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n"), F.min("id").alias("keeper"))
        .filter(F.col("n") > 1)
    )


# ---------------------------------------------------------------------------
# 5. embedding-cosine near-dup
# ---------------------------------------------------------------------------

def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def embedding_near_dups(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95, bucket_col: str | None = None,
) -> DataFrame:
    """Pairs (a, b, cosine) with cosine >= threshold. ``bucket_col``
    (e.g. an LSH bucket or a label) bounds the pair space; without it the
    operator is brute-force and should only run on bounded inputs."""
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if bucket_col:
        cols.append(F.col(bucket_col).alias("bk"))
    e = emb.select(*cols)
    a, b = e.alias("a"), e.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if bucket_col:
        cond = cond & (F.col("a.bk") == F.col("b.bk"))
    return (
        a.join(b, cond)
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("a.v"), F.col("b.v"))
                / (_norm(F.col("a.v")) * _norm(F.col("b.v"))),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"), "cosine")
    )


def minhash_dedup_clusters(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_hashes: int = 8, bands: int = 4, max_iter: int = 30,
) -> DataFrame:
    """FULL transitive near-dup clusters: (id, cluster) where cluster is
    the minimum doc id reachable through the MinHash-LSH candidate graph
    — the closure :func:`minhash_dedup_keepers` approximates with one
    union-find hop (A~B and B~C land A, B, C in ONE cluster here even
    when A and C never share a band).

    Composition, not new machinery: the banded candidate PAIRS never
    materialize — documents sharing a band bucket link through the
    bucket's min member (O(docs x bands) edges, not O(pairs); a hot
    bucket of B near-identical docs contributes B edges, not B²/2), and
    :func:`components.hash_to_min` pointer-jumps the closure in
    O(log diameter) rounds. Only docs that share at least one bucket
    appear; singletons are their own (absent) cluster."""
    from .components import hash_to_min

    banded = _banded_checkpointed(df, id_col, text_col, n_hashes, bands)
    hubs = (
        banded.groupBy("band", "band_key")
        .agg(F.min("id").alias("hub"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    # star attachments bucket-member -> bucket-min (hub)
    star = (
        banded.join(hubs, ["band", "band_key"])
        .select("id", "hub")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Closure over the HUB graph only (r6): two hubs are connected iff a
    # doc sits in both buckets, and because every hub is the MIN id of
    # its bucket, the min id reachable in a component equals the min HUB
    # id — so the iterative hash_to_min loop runs over O(buckets) hub
    # nodes (hundreds) instead of O(docs) member nodes, with identical
    # labels. Docs then inherit their hubs' component in one join. The
    # member graph's label for doc d was min-reachable-id(d); every hub
    # of d is in the same component, so min over its hubs' components is
    # exactly that label.
    # NOTE: identity rows (id == hub) stay in the join input — a hub can
    # itself be the shared member linking its own bucket to another
    hub_edges = (
        star.alias("x").join(star.alias("y"), "id")
        .select(F.col("x.hub").alias("a"), F.col("y.hub").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    hub_nodes = star.select(F.col("hub").alias("id")).distinct()
    comp = hash_to_min(hub_nodes, hub_edges, max_iter=max_iter)
    out = (
        star.join(comp.withColumnRenamed("id", "hub"), "hub")
        .groupBy("id")
        .agg(F.min("component").alias("cluster"))
    )
    # singleton-bucket members never appear (hubs require n > 1), and
    # hubs themselves carry their own star row (id == hub), so the node
    # set matches the member-graph closure exactly
    return out.select("id", "cluster")


def phash_dedup_clusters(
    images: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 3,
    bands: int = 4,
    max_iter: int = 30,
) -> DataFrame:
    """FULL transitive near-dup clusters for images (the phash twin of
    :func:`minhash_dedup_clusters`): cluster = min image id reachable
    through chains of <= ``max_hamming`` phash steps. The closure runs
    over DISTINCT-HASH representatives (duplicate-heavy corpora collapse
    thousands of identical tiles to one node), so the component graph is
    O(distinct hashes); every image then inherits its hash's label.

    The closure runs DIRECTLY on the string rep ids (:func:`hash_to_min`
    is id-type-generic): no rep->int64 hashing step exists, so there is
    no 64-bit-collision mode that could silently merge unrelated clusters
    at the 1e9+-distinct-hash scale — correctness never depends on a hash
    being injective. The cluster label is the component's min rep id,
    produced by the closure itself."""
    from .components import hash_to_min

    groups = (
        images.groupBy(F.col(phash_col).alias("ph"))
        .agg(F.min(F.col(id_col)).alias("rep"))
    )
    pairs = phash_near_duplicates(
        groups, id_col="rep", phash_col="ph", max_hamming=max_hamming, bands=bands
    )
    e2 = pairs.select("a", "b").unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    comp = hash_to_min(
        groups.select(F.col("rep").alias("id")), e2, max_iter=max_iter
    )
    rep_cluster = comp.select(
        F.col("id").alias("rep"), F.col("component").alias("cluster")
    )
    return (
        images.select(F.col(id_col).alias("id"), F.col(phash_col).alias("ph"))
        .join(groups, "ph")
        .join(rep_cluster, "rep")
        .select("id", "cluster")
    )


def semantic_dedup_keepers(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.92,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup keeper set — DEFAULT entry point. Since r6 this
    delegates to :func:`semantic_dedup_keepers_fast` (one numpy Gram
    matmul per bucket; ~20-58x cheaper at datascale sf1 and bit-identical
    — asserted by ``test_semantic_dedup_fast_matches_relational`` and the
    shared DuckDB gate). The per-pair relational formulation survives as
    :func:`semantic_dedup_keepers_rel`, the DuckDB-shaped oracle twin."""
    return semantic_dedup_keepers_fast(
        emb, id_col=id_col, vec_col=vec_col, n_clusters=n_clusters,
        threshold=threshold, centroids=centroids,
    )


def semantic_dedup_keepers_rel(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.92,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): bucket
    every vector by its nearest coarse centroid, find within-bucket pairs
    with cosine >= ``threshold``, and keep only vectors with no
    smaller-id near-duplicate in their bucket. Returns
    ``(id, centroid_id)`` for the keepers.

    Unlike :func:`embedding_near_dups` alone (brute force) or the LSH
    route (random planes), the candidate space here is the semantic
    cluster — the shape the SemDeDup paper showed prunes web-scale
    corpora with near-zero quality loss.

    Scale shape: assignment is the zero-shuffle Arrow matmul
    (`similarity.ivf_assign_fast`); the only exchange is the within-
    bucket self-join, whose pair space is bounded by the largest cluster
    (pick ``n_clusters`` ~ corpus/target_bucket so buckets stay
    task-sized; at 10^12 vectors that is the same partition-count knob
    as the IVF index build, and the join can reuse a centroid-partitioned
    persisted index — `similarity.write_ivf_index` — to skip both the
    assignment and the shuffle entirely). Keeper output is O(vectors).

    ``centroids`` defaults to the ``n_clusters`` lowest-id vectors (the
    deterministic seed quantizer the oracle replicates); pass
    `similarity.kmeans_centroids(...)` output for a Lloyd-refined
    production quantizer.
    """
    from .similarity import ivf_assign_fast

    if centroids is None:
        centroids = (
            emb.select(F.col(id_col), F.col(vec_col))
            .orderBy(F.col(id_col).asc())
            .limit(int(n_clusters))
            .select(
                F.col(id_col).cast("long").alias("centroid_id"),
                F.col(vec_col),
            )
        )
    assigned = ivf_assign_fast(
        emb, centroids, id_col=id_col, vec_col=vec_col, carry_vec=True
    )
    pairs = embedding_near_dups(
        assigned, id_col="id", vec_col="v",
        threshold=threshold, bucket_col="centroid_id",
    )
    losers = pairs.select(F.col("b").alias("id")).distinct()
    return (
        assigned.select("id", "centroid_id")
        .join(losers, "id", "left_anti")
        .select("id", "centroid_id")
    )


def semantic_dedup_keepers_fast(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.92,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """PRODUCTION twin of :func:`semantic_dedup_keepers` — identical
    keeper set (asserted bit-identical by
    ``test_semantic_dedup_fast_matches_relational`` and the shared
    DuckDB gate), but the within-bucket cosine work is ONE numpy matmul
    per bucket (``B x B`` Gram matrix inside ``applyInPandas``) instead
    of a per-pair Catalyst higher-order-function dot product. Measured
    ~20x cheaper at datascale sf1: interpreted HOF lambdas cost ~25 us
    per pair while the matmul amortizes to nanoseconds (the same lesson
    as `lsh_buckets_fast` / `ivf_assign_fast` — see repo memory notes on
    HOF costs).

    Scale shape: one shuffle (groupBy centroid). Per-task memory is
    O(B^2) doubles for the bucket's Gram matrix — the ``n_clusters``
    knob (corpus/target_bucket) bounds B exactly like it bounds the
    relational pair space; B=4096 is a 128 MB matrix, so keep buckets at
    or below that.

    Cosines round HALF_UP to 6 decimals before the threshold compare,
    matching F.round/DuckDB ROUND bit-for-bit.
    """
    import numpy as np
    import pandas as pd

    from .similarity import ivf_assign_fast

    if centroids is None:
        centroids = (
            emb.select(F.col(id_col), F.col(vec_col))
            .orderBy(F.col(id_col).asc())
            .limit(int(n_clusters))
            .select(
                F.col(id_col).cast("long").alias("centroid_id"),
                F.col(vec_col),
            )
        )
    assigned = ivf_assign_fast(
        emb, centroids, id_col=id_col, vec_col=vec_col, carry_vec=True
    )
    id_type = dict(emb.dtypes)[id_col]
    thr = float(threshold)

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame({"id": [], "centroid_id": []})
        order = np.argsort(pdf["id"].to_numpy(), kind="stable")
        ids = pdf["id"].to_numpy()[order]
        vecs = np.stack(pdf["v"].to_numpy())[order].astype(np.float64)
        norms = np.sqrt((vecs * vecs).sum(axis=1))
        cos = (vecs @ vecs.T) / np.outer(norms, norms)
        # HALF_UP to 6, matching F.round / DuckDB ROUND (np.round is
        # banker's half-even and diverges on exact .5 ties)
        cos = np.copysign(np.floor(np.abs(cos) * 1e6 + 0.5), cos) / 1e6
        hit = np.triu(cos >= thr, k=1)  # strictly-smaller-id dominators
        keep = ~hit.any(axis=0)
        return pd.DataFrame(
            {"id": ids[keep], "centroid_id": pdf["centroid_id"].iloc[0]}
        )

    return (
        assigned.groupBy("centroid_id")
        .applyInPandas(per_bucket, f"id {id_type}, centroid_id long")
        .select("id", "centroid_id")
    )


def semantic_contamination(
    emb: DataFrame,
    bench: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "bench_id",
    round_to: int = 6,
    max_bench: int = 100_000,
) -> DataFrame:
    """(id, bench_id, cosine): corpus vectors whose best rounded cosine
    against ANY benchmark embedding reaches ``threshold`` — the
    embedding-space analog of n-gram benchmark decontamination
    (operators/text.py:benchmark_contamination): a paraphrased or
    reformatted eval item shares no 3-grams with its leak but its
    embedding stays close. One row per contaminated corpus vector (its
    best-matching benchmark item; ties at the rounded maximum go to the
    lowest bench_id).

    Scale shape: benchmark suites are small BY DEFINITION (guarded by
    ``max_bench``), so the bench matrix rides every kernel closure and
    the scan is ONE zero-shuffle Arrow matmul over the corpus — no
    crossJoin rows materialize, nothing shuffles, output is O(flagged).
    The corpus-side anti-join lives in :func:`semantic_decontaminate`."""
    import numpy as np
    import pandas as pd

    if bench.limit(max_bench + 1).count() > max_bench:
        raise ValueError(
            f"benchmark side exceeds max_bench={max_bench}; embedding "
            "decontamination broadcasts the benchmark matrix — a 'benchmark' "
            "this large is a corpus join, not a decontamination pass"
        )
    rows = sorted(
        bench.select(bench_id_col, vec_col).collect(), key=lambda r: int(r[0])
    )
    if not rows:
        raise ValueError("empty benchmark side")
    bids = np.asarray([int(r[0]) for r in rows], dtype=np.int64)
    bmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    bnorm = np.sqrt((bmat * bmat).sum(axis=1))
    id_type = dict(emb.dtypes)[id_col]
    thr = float(threshold)
    mul = 10.0 ** round_to

    def scan(batches):
        from ..functions.expressions import round_half_up

        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vnorm = np.sqrt((v * v).sum(axis=1))
            cos = round_half_up(
                (v @ bmat.T) / (vnorm[:, None] * bnorm[None, :]), round_to
            )
            best = cos.argmax(axis=1)  # first max = lowest bench_id (sorted)
            bc = cos[np.arange(len(v)), best]
            keep = bc >= thr - 0.5 / mul  # rounded compare, exact at 6dp
            yield pd.DataFrame({
                "id": pdf[id_col][keep],
                "bench_id": bids[best[keep]],
                "cosine": bc[keep],
            })

    return emb.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        scan, f"id {id_type}, bench_id long, cosine double"
    )


def semantic_decontaminate(
    emb: DataFrame,
    bench: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """The kept corpus: rows NOT flagged by
    :func:`semantic_contamination` (one anti-join against the O(flagged)
    output; the corpus itself never shuffles)."""
    flagged = semantic_contamination(
        emb, bench, threshold, id_col, vec_col, bench_id_col
    ).select(F.col("id").alias(id_col)).distinct()
    return emb.join(flagged, id_col, "left_anti")


def video_temporal_pairs(
    frames: DataFrame,
    k: int = 3,
    threshold: float = 0.2,
    df_cap: int = 64,
    id_col: str = "media_id",
    frame_col: str = "frame",
    hash_col: str = "phash",
) -> DataFrame:
    """Near-duplicate VIDEOS by temporal signature — the content-ID
    shape: shingle ``k`` consecutive frame perceptual hashes (ordered by
    frame index), candidate videos share at least one shingle, verified
    pairs reach shingle-set jaccard >= ``threshold``. Output
    (a, b, shared, jaccard) with a < b, jaccard rounded half-up to 6.

    Position-free by construction: a trimmed or offset copy shares its
    interior shingles, so re-cuts and re-encodes that preserve per-frame
    phash still match; a corrupted frame only poisons the k shingles
    that cover it. Everything is Catalyst (window LEAD + string shingle
    keys + two hash joins) — no UDF, no pair explosion beyond truly
    shared shingles, and ``df_cap`` drops degenerate shingles shared by
    more than that many videos (black frames, static intros) exactly
    like the text n-gram guard (:func:`ngram_jaccard_pairs`).

    Scale: shingle build is one window per video (narrow, sorted by the
    natural frame order); the candidate join is keyed by shingle whose
    fan-out df_cap bounds; output is O(true pairs). Composes directly with
    :func:`operators.multimodal.video_frame_sample` + a phash pass."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(frame_col)
    leads = frames.select(id_col, frame_col, hash_col).select(
        id_col,
        *[
            F.lead(hash_col, i).over(w).alias(f"__h{i}") if i
            else F.col(hash_col).alias("__h0")
            for i in range(k)
        ],
    )
    sh = (
        leads.filter(F.col(f"__h{k - 1}").isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.concat_ws(
                "_", *[F.col(f"__h{i}").cast("string") for i in range(k)]
            ).alias("sh"),
        )
        .distinct()
    )
    common = (
        sh.groupBy("sh").agg(F.countDistinct("id").alias("__df"))
        .filter((F.col("__df") > 1) & (F.col("__df") <= df_cap))
        .select("sh")
    )
    sh_c = sh.join(common, "sh")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    pairs = (
        sh_c.alias("a").join(sh_c.alias("b"), "sh")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .join(sizes.select(F.col("id").alias("a"), F.col("n_sh").alias("na")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("n_sh").alias("nb")), "b")
    )
    jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (
        pairs.withColumn(
            "jaccard", F.floor(jac * 1e6 + F.lit(0.5)) / 1e6
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "shared", "jaccard")
    )
