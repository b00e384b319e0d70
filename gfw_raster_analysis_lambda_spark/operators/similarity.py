"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``  brute-force exact top-k: one scan of the corpus serves
  all queries (broadcast), dot products in Catalyst higher-order
  functions (``zip_with``/``aggregate`` — JVM, no Python), windowed
  top-k per query. The correctness baseline.
- ``lsh_buckets`` / ``ann_lsh``  random-hyperplane LSH: deterministic
  md5-seeded sign planes, bucket = sign-bit string of plane dots;
  candidates = bucket collisions, exact cosine rerank. The scale path —
  at 10^12 rows the bucketed join prunes the scan to colliding buckets
  (and the bucket id is a partition key for the Iceberg layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,  # (query_id, embedding)
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_kernel_queries: int = 10_000,
) -> DataFrame:
    """Exact top-k by cosine per query (ties broken on id).

    The raw scores come from ONE Arrow kernel pass over the corpus
    (queries ride the closure): per batch, a strict left-to-right
    accumulation over the vector components — the IDENTICAL IEEE-754
    operation order as the Catalyst ``aggregate(zip_with(...))`` HOF it
    replaces, so every double is bit-for-bit the same — while the ~25
    us/row interpreted-lambda overhead of the HOF path disappears
    (guide §4.2: batch the Python boundary, vectorize inside). Rounding
    (F.round) and the windowed top-k stay in Spark, unchanged. Falls
    back to the relational crossJoin when the query set exceeds
    ``max_kernel_queries`` (closure-shipping bound, same role as the
    broadcast bound it had before)."""
    import numpy as np
    import pandas as pd

    qrows = queries.select(F.col("query_id"), F.col(vec_col).alias("qv")).limit(
        max_kernel_queries + 1
    ).collect()
    if len(qrows) > max_kernel_queries:
        q = F.broadcast(
            queries.select(F.col("query_id"), F.col(vec_col).alias("qv"))
        )
        scored = (
            emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .crossJoin(q)
            .withColumn(
                "cosine",
                F.round(
                    _dot(F.col("v"), F.col("qv"))
                    / (_norm(F.col("v")) * _norm(F.col("qv"))), 6
                ),
            )
        )
    else:
        qids = [r["query_id"] for r in qrows]
        qmat = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in qrows]) \
            if qrows else np.zeros((0, 0))
        id_type = dict(emb.dtypes)[id_col]
        qid_type = dict(queries.dtypes)["query_id"]

        def _ltr_dot(a: "np.ndarray", b: "np.ndarray") -> "np.ndarray":
            # strict left-to-right accumulation per row: bit-identical to
            # aggregate(zip_with(a, b, x*y), 0.0, acc + v)
            acc = np.zeros(a.shape[0], dtype=np.float64)
            for i in range(a.shape[1]):
                acc += a[:, i] * b[i]
            return acc

        def scan(batches):
            qn = np.zeros(len(qids), dtype=np.float64)
            for t in range(len(qids)):
                qn[t] = np.sqrt(_ltr_dot(qmat[t:t + 1], qmat[t])[0])
            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                vn = np.zeros(v.shape[0], dtype=np.float64)
                acc = np.zeros(v.shape[0], dtype=np.float64)
                for i in range(v.shape[1]):
                    acc += v[:, i] * v[:, i]
                vn = np.sqrt(acc)
                n = v.shape[0]
                out_id = np.repeat(np.arange(n), len(qids))
                frames = {
                    "id": pdf[id_col].to_numpy()[out_id],
                    "query_id": np.tile(np.asarray(qids), n),
                    "raw": np.empty(n * len(qids), dtype=np.float64),
                }
                raw = frames["raw"].reshape(n, len(qids))
                for t in range(len(qids)):
                    raw[:, t] = _ltr_dot(v, qmat[t]) / (vn * qn[t])
                yield pd.DataFrame(frames)

        scored = emb.select(F.col(id_col), F.col(vec_col)).mapInPandas(
            scan, f"id {id_type}, query_id {qid_type}, raw double"
        ).withColumn("cosine", F.round(F.col("raw"), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "cosine", "rank")
    )


def _plane_sign(plane: Column, comp: Column) -> Column:
    """Deterministic pseudo-random +-1 for (plane, component) — md5 parity
    of the pair; identical formula in the DuckDB oracle."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("_", plane.cast("string"), comp.cast("string"))), 1, 4),
        16,
        10,
    ).cast("long")
    return (h % 2) * 2 - 1


def lsh_buckets(
    emb: DataFrame, n_planes: int = 8, id_col: str = "vec_id", vec_col: str = "embedding",
    plane_offset: int = 0,
) -> DataFrame:
    """(id, bucket): sign-bit bucket of each vector under n_planes
    md5-seeded hyperplanes. Fully relational: posexplode components ->
    per-plane conditional sums in ONE groupBy -> bit pack. The sign
    matrix is (plane, component)-indexed CONSTANTS, so it is computed
    once at PLAN TIME and embedded as literal arrays (``element_at`` on
    the exploded component index) instead of an md5 expression per
    (row, plane, component) — and folding the per-plane explode into n
    aggregate expressions removes one full Exchange and shrinks the
    remaining one from N x dims x planes rows to N x dims (guide §2.3/
    §2.4). ``plane_offset`` selects an independent plane set (probe
    table t uses planes ``t*n_planes .. (t+1)*n_planes - 1``)."""
    import hashlib

    head = emb.agg(F.max(F.size(F.col(vec_col))).alias("d")).first()
    if head is None or head["d"] is None:
        return (
            emb.select(F.col(id_col).alias("id"), F.lit(0).cast("long").alias("bucket"))
            .filter(F.lit(False))
        )
    dims = int(head["d"])
    comp = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("c", "x"),
    )
    dots = []
    for p in range(n_planes):
        signs = [
            float((int(hashlib.md5(
                f"{p + plane_offset}_{c}".encode()
            ).hexdigest()[:4], 16) % 2) * 2 - 1)
            for c in range(dims)
        ]
        dots.append(
            F.sum(
                F.col("x").cast("double")
                * F.element_at(F.array(*[F.lit(s) for s in signs]), F.col("c") + 1)
            ).alias(f"dot{p}")
        )
    agg = comp.groupBy("id").agg(*dots)
    bucket = None
    for p in range(n_planes):
        term = F.when(
            F.col(f"dot{p}") > 0, F.lit(int(1 << p)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        bucket = term if bucket is None else bucket + term
    return agg.select("id", bucket.cast("long").alias("bucket"))


def lsh_buckets_fast(
    emb: DataFrame, n_planes: int = 8, id_col: str = "vec_id", vec_col: str = "embedding",
    plane_offset: int = 0,
) -> DataFrame:
    """(id, bucket) — PRODUCTION builder for :func:`lsh_buckets`.

    Same md5-derived sign matrix, same buckets bit-for-bit (asserted by
    test_lsh_bucket_builders_agree), but computed as ONE Arrow-batched
    matmul per partition: vectors (rows x dims) @ signs.T (dims x planes),
    zero shuffles. The relational twin explodes N x dims x planes rows
    through two shuffles — fine as a DuckDB-checkable oracle, impossible
    at 10^12 x 64-dim x 8-plane scale (5e14 shuffle rows); this path's
    cost is a single pass over the vectors."""
    import hashlib

    import numpy as np
    import pandas as pd

    id_type = dict(emb.dtypes)[id_col]

    def run(batches):
        signs = None
        for pdf in batches:
            if not len(pdf):
                continue
            dims = len(pdf[vec_col].iloc[0])
            if signs is None or signs.shape[1] != dims:
                signs = np.empty((n_planes, dims), dtype=np.float64)
                for p in range(n_planes):
                    for c in range(dims):
                        h = int(hashlib.md5(f"{p + plane_offset}_{c}".encode()).hexdigest()[:4], 16)
                        signs[p, c] = (h % 2) * 2 - 1
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            dots = vecs @ signs.T  # rows x planes
            buckets = ((dots > 0) << np.arange(n_planes, dtype=np.int64)).sum(axis=1)
            yield pd.DataFrame({"id": pdf[id_col], "bucket": buckets.astype(np.int64)})

    return emb.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        run, f"id {id_type}, bucket long"
    )


def ann_lsh(
    emb: DataFrame,
    queries: DataFrame,  # (query_id, embedding)
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_builder=None,
) -> DataFrame:
    """Approximate top-k: exact rerank within LSH bucket collisions.
    Recall < 1 by construction; pair with multiple plane sets (probe
    tables) when recall matters more than cost. Buckets come from
    :func:`lsh_buckets_fast` (one matmul pass) unless ``bucket_builder``
    overrides — the relational :func:`lsh_buckets` produces identical ids
    and exists as the oracle twin."""
    build = bucket_builder or lsh_buckets_fast
    eb = build(emb, n_planes, id_col, vec_col)
    qb = build(queries, n_planes, "query_id", vec_col).withColumnRenamed("id", "query_id")
    corpus = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).join(eb, "id")
    qs = queries.select("query_id", F.col(vec_col).alias("qv")).join(F.broadcast(qb), "query_id")
    cand = corpus.join(F.broadcast(qs), "bucket")
    scored = cand.withColumn(
        "cosine",
        F.round(_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv"))), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "cosine", "rank")
    )


def ivf_assign(
    emb: DataFrame, centroids: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id): nearest coarse centroid by cosine — the IVF
    index build. One broadcast pass over the corpus; at 100 TB this is the
    write-side job whose output is stored as a partition column so bucket
    probes become partition-pruned scans."""
    c = F.broadcast(
        centroids.select("centroid_id", F.col(vec_col).alias("cv"))
    )
    scored = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .crossJoin(c)
        .withColumn("cos", _dot(F.col("v"), F.col("cv")) / (_norm(F.col("v")) * _norm(F.col("cv"))))
    )
    w = Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", "centroid_id")
    )


def ivf_assign_fast(
    emb: DataFrame, centroids: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    round_to: int | None = None,
    carry_vec: bool = False,
) -> DataFrame:
    """(id, centroid_id) — PRODUCTION twin of :func:`ivf_assign`.

    Same nearest-centroid-by-cosine assignment (ties -> lowest
    centroid_id; asserted bit-identical by test_ivf_assigners_agree), but
    computed as one Arrow-batched matmul per partition against the
    driver-collected centroid matrix: ZERO shuffles, zero joins. The
    relational twin crossJoins the corpus with k centroids then runs a
    row_number window partitioned by id — a full shuffle of N x k rows
    per call (1.6e13 shuffled rows per Lloyd iteration at 10^12 x 16) for
    a per-row argmax that needs none; it stays as the DuckDB-checkable
    oracle. ``round_to`` mirrors the relational F.round(cos, n) used by
    the kmeans loop; ``carry_vec`` passes the vector column through so
    the re-center aggregate needs no join back."""
    import numpy as np
    import pandas as pd

    rows = sorted(
        ((int(r["centroid_id"]), np.asarray(r[vec_col], dtype=np.float64))
         for r in centroids.select("centroid_id", F.col(vec_col)).collect()),
        key=lambda t: t[0],
    )
    if not rows:
        # match the relational twin: empty quantizer -> empty assignment
        out = emb.select(
            F.col(id_col).alias("id"),
            F.lit(None).cast("long").alias("centroid_id"),
            *([F.col(vec_col).alias("v")] if carry_vec else []),
        )
        return out.filter(F.lit(False))
    cids = np.array([t[0] for t in rows], dtype=np.int64)
    cmat = np.stack([t[1] for t in rows])                      # k x dims
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))

    id_type = dict(emb.dtypes)[id_col]
    vec_type = dict(emb.dtypes)[vec_col]
    schema = f"id {id_type}, centroid_id long" + (f", v {vec_type}" if carry_vec else "")

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vnorm = np.sqrt((vecs * vecs).sum(axis=1))
            cos = (vecs @ cmat.T) / np.outer(vnorm, cnorm)     # rows x k
            if round_to is not None:
                # HALF_UP (away from zero), matching Spark F.round /
                # DuckDB ROUND — np.round is banker's half-even and
                # diverges on exact .5 ties at the round_to-th decimal
                s = 10.0 ** round_to
                cos = np.copysign(np.floor(np.abs(cos) * s + 0.5), cos) / s
            # argmax returns the FIRST max; centroids are sorted by id, so
            # ties break to the lowest centroid_id, same as the window
            best = cids[np.argmax(cos, axis=1)]
            out = {"id": pdf[id_col], "centroid_id": best}
            if carry_vec:
                out["v"] = pdf[vec_col]
            yield pd.DataFrame(out)

    return emb.select(F.col(id_col), F.col(vec_col)).mapInPandas(run, schema)


def kmeans_centroids(
    emb: DataFrame,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_fraction: float | None = None,
) -> DataFrame:
    """Deterministic Lloyd refinement of the coarse IVF quantizer:
    seeds = the ``k`` lowest-id vectors, then ``iters`` rounds of
    (assign to nearest centroid by cosine, re-center on the member mean).

    Fully relational and DETERMINISTIC (cosine rounded to 6 before the
    argmin, ties broken on centroid_id), so one or two iterations are
    DuckDB-expressible and the refined-IVF search is oracle-checkable.
    Each iteration is one broadcast pass over the corpus plus an
    O(k x dims)-row aggregate — the standard distributed Lloyd shape; at
    100 TB this is the write-side index-build job. Empty clusters keep
    their previous centroid.

    ``train_fraction`` trains the quantizer on a DETERMINISTIC hash
    sample of the corpus (operators.sampling.deterministic_sample, salt
    ``"kmeans"``) — the standard IVF practice at scale: quantizer
    quality needs thousands of vectors per centroid, not the whole
    corpus, so at 10^12 vectors a 1e-6 fraction turns each Lloyd
    iteration from a corpus pass into a sample pass. Reproducible (no
    rand()); the full-corpus assignment still happens once, in
    :func:`ivf_assign_fast`, at index-build time."""
    if train_fraction is not None:
        from .sampling import deterministic_sample

        emb = deterministic_sample(emb, float(train_fraction), id_col, salt="kmeans")
    centroids = (
        emb.orderBy(F.asc(id_col)).limit(k)
        .select(F.col(id_col).cast("long").alias("centroid_id"), F.col(vec_col).alias("cv"))
    )
    corpus = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    for _ in range(int(iters)):
        # zero-shuffle argmax (ivf_assign_fast, round-6 like the relational
        # twin); carry_vec feeds the re-center aggregate without a join back
        assign = ivf_assign_fast(
            corpus, centroids.select("centroid_id", F.col("cv").alias("v")),
            id_col="id", vec_col="v", round_to=6, carry_vec=True,
        )
        comp_means = (
            assign.select("centroid_id", F.posexplode("v").alias("i", "x"))
            .groupBy("centroid_id", "i")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
        )
        updated = comp_means.groupBy("centroid_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s["m"]
            ).alias("cv")
        )
        # empty clusters keep their previous centroid (left join fallback)
        centroids = (
            centroids.select("centroid_id", F.col("cv").alias("cv_prev"))
            .join(updated, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("cv"), F.col("cv_prev").cast("array<double>")).alias("cv"),
            )
        )
    return centroids.select("centroid_id", F.col("cv").alias(vec_col))


def ann_ivf(
    emb: DataFrame,
    queries: DataFrame,  # (query_id, embedding)
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    assigner=None,
) -> DataFrame:
    """IVF-Flat approximate top-k: the scale path for embedding search.

    Coarse quantizer = the ``n_centroids`` lowest-id vectors (deterministic
    and oracle-expressible), or pass ``centroids=kmeans_centroids(...)``
    for the Lloyd-refined quantizer (also deterministic/oracle-checkable).
    Every vector is assigned to its nearest centroid once; each query
    probes its ``n_probe`` nearest centroids and brute-forces ONLY those
    buckets — cost scales with n_probe/n_centroids of the corpus instead
    of all of it. Recall < 1 by construction. Corpus assignment uses the
    zero-shuffle :func:`ivf_assign_fast` (pass ``assigner=ivf_assign``
    for the relational DuckDB twin); the query-side probe ranking keeps
    the relational window — queries are the broadcast-small side."""
    if centroids is None:
        centroids = (
            emb.orderBy(F.asc(id_col)).limit(n_centroids)
            .select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
        )
    else:
        centroids = centroids.select("centroid_id", F.col(vec_col))
    assign = (assigner or ivf_assign_fast)(emb, centroids, id_col, vec_col)

    qc = F.broadcast(centroids.select("centroid_id", F.col(vec_col).alias("cv")))
    qscored = (
        queries.select("query_id", F.col(vec_col).alias("qv"))
        .crossJoin(qc)
        .withColumn("cos", _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("centroid_id"))
    probes = (
        qscored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "centroid_id")
    )

    corpus = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).join(assign, "id")
    cand = corpus.join(F.broadcast(probes), "centroid_id")
    scored = cand.withColumn(
        "cosine",
        F.round(_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv"))), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "cosine", "rank")
    )


def write_ivf_index(
    emb: DataFrame,
    path: str,
    centroids: DataFrame | None = None,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index on disk: vectors PARTITIONED by their
    centroid assignment (``<path>/vectors/centroid_id=N/``) plus the
    quantizer itself (``<path>/centroids``). This is the write-side job
    :func:`ann_ivf` re-derives per query; once stored, a probe touches
    only its ``n_probe`` partition directories — the scan never opens the
    other ``1 - n_probe/n_centroids`` of a 100-TB corpus (Catalyst
    partition pruning, visible as ``PartitionFilters`` in the plan)."""
    if centroids is None:
        centroids = (
            emb.orderBy(F.asc(id_col)).limit(n_centroids)
            .select(F.col(id_col).cast("long").alias("centroid_id"), F.col(vec_col))
        )
    centroids = centroids.select("centroid_id", F.col(vec_col))
    assign = ivf_assign_fast(emb, centroids, id_col, vec_col)
    (
        emb.join(assign.withColumnRenamed("id", id_col), id_col)
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(f"{path}/vectors")
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def ann_ivf_indexed(
    spark,
    path: str,
    queries: DataFrame,  # (query_id, embedding)
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat search over a :func:`write_ivf_index` store. The probed
    centroid ids are resolved first (tiny: queries x n_probe) and pushed
    into the vectors scan as a partition predicate, so only the probed
    partition directories are read. Identical results to :func:`ann_ivf`
    with the same quantizer."""
    centroids = spark.read.parquet(f"{path}/centroids")
    qc = F.broadcast(centroids.select("centroid_id", F.col(vec_col).alias("cv")))
    qscored = (
        queries.select("query_id", F.col(vec_col).alias("qv"))
        .crossJoin(qc)
        .withColumn("cos", _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("centroid_id"))
    probes = (
        qscored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "centroid_id")
    )
    probed = sorted({int(r["centroid_id"]) for r in probes.select("centroid_id").distinct().collect()})
    vecs = spark.read.parquet(f"{path}/vectors").filter(F.col("centroid_id").isin(probed))
    cand = vecs.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "centroid_id"
    ).join(F.broadcast(probes), "centroid_id")
    scored = cand.withColumn(
        "cosine",
        F.round(_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv"))), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "cosine", "rank")
    )


def lsh_buckets_multi(
    emb: DataFrame,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, t, bucket) for every probe table in ONE Arrow pass: one
    (n_tables*n_planes x dims) sign matmul per batch, bit-packed per
    table. Table t's planes are the absolute indices t*n_planes..,
    identical to ``lsh_buckets_fast(plane_offset=t*n_planes)``."""
    import hashlib

    import numpy as np
    import pandas as pd

    id_type = dict(emb.dtypes)[id_col]
    total = n_planes * n_tables

    def run(batches):
        signs = None
        for pdf in batches:
            if not len(pdf):
                continue
            dims = len(pdf[vec_col].iloc[0])
            if signs is None or signs.shape[1] != dims:
                signs = np.empty((total, dims), dtype=np.float64)
                for p in range(total):
                    for c in range(dims):
                        h = int(hashlib.md5(f"{p}_{c}".encode()).hexdigest()[:4], 16)
                        signs[p, c] = (h % 2) * 2 - 1
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (vecs @ signs.T) > 0  # rows x (tables*planes)
            out = []
            for t in range(n_tables):
                blk = bits[:, t * n_planes:(t + 1) * n_planes]
                bucket = (blk << np.arange(n_planes, dtype=np.int64)).sum(axis=1)
                out.append(pd.DataFrame({
                    "id": pdf[id_col],
                    "t": np.int32(t),
                    "bucket": bucket.astype(np.int64),
                }))
            yield pd.concat(out, ignore_index=True)

    return emb.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        run, f"id {id_type}, t int, bucket long"
    )


def ann_lsh_multiprobe(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table LSH ANN: ``n_tables`` independent plane sets (probe
    tables), candidates = union of per-table bucket collisions, exact
    cosine rerank once over the deduplicated candidate set. The standard
    recall lever for hyperplane LSH — each extra table multiplies the
    chance a true neighbor collides in at least one table while the
    rerank cost grows only with the (deduped) candidate union."""
    corpus = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    qs = queries.select("query_id", F.col(vec_col).alias("qv"))
    # ONE corpus pass computes every table's bucket (a single
    # (n_tables*n_planes x dims) sign matmul), not n_tables scans
    eb = lsh_buckets_multi(emb, n_planes, n_tables, id_col, vec_col)
    qb = lsh_buckets_multi(
        queries, n_planes, n_tables, "query_id", vec_col
    ).withColumnRenamed("id", "query_id")
    cand = (
        eb.join(F.broadcast(qb), ["t", "bucket"])
        .select("id", "query_id")
        .dropDuplicates(["id", "query_id"])
    )
    scored = (
        cand.join(corpus, "id")
        .join(F.broadcast(qs), "query_id")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv"))), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "cosine", "rank")
    )


def recall_at_k(exact: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """(query_id, recall): |approx top-k ∩ exact top-k| / k per query —
    the standard ANN evaluation metric, computed relationally so it runs
    over full query logs. Feed the outputs of :func:`cosine_topk` (exact)
    and any ANN variant."""
    e = exact.filter(F.col("rank") <= k).select("query_id", "id")
    a = approx.filter(F.col("rank") <= k).select("query_id", "id")
    hits = e.join(a, ["query_id", "id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    # denominator = the per-query EXACT result size, not k: a corpus
    # smaller than k caps the exact top-k, and a perfect approximation
    # must still score 1.0
    denom = e.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        denom.join(hits, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact")).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): compress vectors to m sub-space codes, search
# with asymmetric distance computation (ADC). The memory-scale ANN path:
# a 64-dim float vector (256 B) becomes m=8 one-byte codes — at 10^12
# vectors the index drops from ~256 TB to ~8 TB, and the ADC scan reads
# codes + a broadcast (m x ksub) lookup table instead of raw vectors.
# ---------------------------------------------------------------------------

def pq_init_codebooks(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic PQ codebook seed: the ``ksub`` lowest-id vectors,
    split into ``m`` equal sub-vectors — same seeding rule as
    :func:`kmeans_centroids`, so the init-codebook search path is fully
    DuckDB-expressible. Returns a numpy array (m, ksub, dsub); the
    codebook is tiny (m*ksub*dsub doubles) and rides the closure like
    the IVF centroid matrix."""
    import numpy as np

    rows = sorted(
        emb.orderBy(F.asc(id_col)).limit(ksub).select(id_col, vec_col).collect(),
        key=lambda r: r[0],
    )
    if len(rows) < ksub:
        raise ValueError(f"need at least ksub={ksub} vectors to seed PQ")
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])  # ksub x d
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dims {d} not divisible by m={m}")
    dsub = d // m
    # (m, ksub, dsub): codebook s holds the ksub seeds' s-th sub-vector
    return np.transpose(mat.reshape(ksub, m, dsub), (1, 0, 2)).copy()


def _round_half_up(a, decimals: int):
    from ..functions.expressions import round_half_up

    return round_half_up(a, decimals)


def pq_encode(
    emb: DataFrame,
    codebooks,  # numpy (m, ksub, dsub)
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """(id, codes array<int>) — one Arrow batch matmul per partition
    against the broadcast codebooks, ZERO shuffle (the same shape as
    :func:`ivf_assign_fast`, once per sub-space in a single kernel).
    Per sub-space argmin of squared L2, distances rounded HALF_UP to
    ``round_to`` first and ties to the LOWEST code so the DuckDB twin
    reproduces codes exactly."""
    import numpy as np
    import pandas as pd

    cb = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    id_type = dict(emb.dtypes)[id_col]
    schema = f"id {id_type}, codes array<int>"

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sub = vecs.reshape(len(vecs), m, dsub)             # n x m x dsub
            # n x m x ksub squared-L2 to every code center
            diff = sub[:, :, None, :] - cb[None, :, :, :]
            dist = (diff * diff).sum(axis=-1)
            if round_to is not None:
                dist = _round_half_up(dist, round_to)
            codes = dist.argmin(axis=2).astype(np.int32)       # first min = lowest code
            yield pd.DataFrame({"id": pdf[id_col], "codes": list(codes)})

    return emb.select(F.col(id_col), F.col(vec_col)).mapInPandas(run, schema)


def pq_train(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_fraction: float | None = None,
):
    """Lloyd-refined PQ codebooks (numpy (m, ksub, dsub)). Each iteration
    is one zero-shuffle encode pass over the (optionally hash-sampled)
    training set plus an O(m*ksub*dsub)-row aggregate — all m sub-space
    kmeans problems advance in the SAME pass, not m sequential jobs.
    Deterministic end to end (seeded init, rounded argmin, no rand());
    empty codes keep their previous center."""
    import numpy as np

    if train_fraction is not None:
        from .sampling import deterministic_sample

        emb = deterministic_sample(emb, float(train_fraction), id_col, salt="pq")
    cb = pq_init_codebooks(emb, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col)
    _, _, dsub = cb.shape
    for _ in range(int(iters)):
        enc = pq_encode(emb.select(id_col, vec_col), cb, id_col=id_col, vec_col=vec_col)
        joined = enc.join(
            emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "id"
        )
        # (subspace, code, dim, component) -> mean; tiny output
        means = (
            joined.select(
                F.posexplode("codes").alias("s", "code"),
                F.col("v"),
            )
            .select(
                "s", "code",
                F.posexplode(
                    F.slice(F.col("v"), F.col("s") * dsub + 1, dsub)
                ).alias("i", "x"),
            )
            .groupBy("s", "code", "i")
            .agg(F.avg(F.col("x").cast("double")).alias("mu"))
            .collect()
        )
        nxt = cb.copy()
        for r in means:
            nxt[r["s"], r["code"], r["i"]] = r["mu"]
        cb = nxt
    return cb


def pq_adc_topk(
    codes_df: DataFrame,  # (id, codes) from pq_encode
    codebooks,            # numpy (m, ksub, dsub)
    queries,              # list[(query_id, vector)] or DataFrame (query_id, embedding)
    k: int = 10,
    round_to: int | None = 6,
) -> DataFrame:
    """Approximate top-k by asymmetric distance: per query, a (m x ksub)
    table of sub-space squared-L2 terms rides the closure, and every
    row's score is ``sum_s lut[s][codes[s]]`` — one vectorized LUT gather
    per Arrow batch over the CODES column (vectors are never re-read, no
    joins, zero shuffle). All queries score in the same pass, and each
    batch keeps only its local top-k per query (lossless: any global
    top-k row is in its batch's top-k), so only ~k * n_batches *
    n_queries rows reach the single final Exchange — at 10^12 rows the
    full-corpus shuffle this avoids IS the job's cost. Returns
    (query_id, id, adc_dist, rank): SMALLEST distance first, ties to the
    lowest id. Scores are rounded half-up to ``round_to`` like every
    other cross-engine-checked distance in this module."""
    import numpy as np
    import pandas as pd

    cb = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    if hasattr(queries, "collect"):
        queries = [(r[0], r[1]) for r in queries.collect()]
    if not queries:
        raise ValueError("pq_adc_topk needs at least one query")

    # normalize qids up front: the output schema is inferred from them,
    # and a numpy integer is not a python int (isinstance check would
    # pick the string schema while the values serialize as int64)
    # one GLOBAL qid type: a mixed int/str list must not declare a string
    # schema while some pandas values stay raw ints (Arrow serialization
    # in the executor would fail or coerce inconsistently) — if ANY qid
    # is non-integral, stringify them ALL so values match the schema
    if all(isinstance(q[0], (int, np.integer)) for q in queries):
        qids = [int(q[0]) for q in queries]
    else:
        qids = [str(q[0]) for q in queries]
    luts = []
    for _, qv in queries:
        q = np.asarray(qv, dtype=np.float64).reshape(m, 1, dsub)
        lut = ((q - cb) ** 2).sum(axis=-1)                     # m x ksub
        if round_to is not None:
            lut = _round_half_up(lut, round_to)
        luts.append(lut)
    flat = np.stack(luts).reshape(len(qids), m * ksub)         # Q x (m*ksub)
    offs = (np.arange(m) * ksub)[None, :]                      # 1 x m

    id_type = dict(codes_df.dtypes)["id"]
    qid_type = "long" if isinstance(qids[0], int) else "string"
    schema = f"query_id {qid_type}, id {id_type}, adc_dist double"

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # n x m
            idx = offs + codes                                  # n x m
            sc = flat[:, idx].sum(axis=-1)                      # Q x n
            if round_to is not None:
                sc = _round_half_up(sc, round_to)
            n = len(pdf)
            kk = min(k, n)
            ids = pdf["id"].to_numpy()
            out_q, out_i, out_s = [], [], []
            for qi in range(len(qids)):
                row = sc[qi]
                # lossless local top-k: smallest distance, ties -> lowest id
                # (lexsort keys are last-key-primary)
                sel = np.lexsort((ids, row))[:kk]
                out_q.extend([qids[qi]] * len(sel))
                out_i.extend(ids[sel])
                out_s.extend(row[sel])
            yield pd.DataFrame(
                {"query_id": out_q, "id": out_i, "adc_dist": out_s}
            )

    pruned = codes_df.select("id", "codes").mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("id").asc()
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "adc_dist", "rank")
    )


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8) — the second production quantization family
# next to PQ: 4x memory (float32 -> int8 codes) with near-exact ranking,
# trivially mergeable (per-dim min/max), and INTEGER-EXACT distances.
# ---------------------------------------------------------------------------

def sq8_stats(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", dim: int = 64
):
    """Per-dimension corpus (min, max) — one JVM-side agg pass (2*dim
    columns in a single whole-stage-codegen aggregate), returned as two
    Python lists. These are the WHOLE index state of SQ8 (vs PQ's
    codebooks), which is why SQ is the standard first rung of the
    quantization ladder."""
    aggs = []
    for d in range(dim):
        e = F.element_at(F.col(vec_col), d + 1).cast("double")
        aggs.append(F.min(e).alias(f"mn{d}"))
        aggs.append(F.max(e).alias(f"mx{d}"))
    row = emb.agg(*aggs).collect()[0]
    return [row[f"mn{d}"] for d in range(dim)], [row[f"mx{d}"] for d in range(dim)]


def sq8_encode(
    emb: DataFrame,
    mins,
    maxs,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — uniform per-dim quantization to [0, 255]:
    ``code = clamp(floor((v - min) / (max - min) * 255 + 0.5), 0, 255)``
    (half-up rounding, the engine-exact kind), constant dims encode 0.
    One Arrow batch pass, zero shuffle, mirroring :func:`pq_encode`."""
    import numpy as np
    import pandas as pd

    mn = np.asarray(mins, dtype=np.float64)
    scale = np.asarray(maxs, dtype=np.float64) - mn
    inv = np.where(scale > 0, 255.0 / np.where(scale > 0, scale, 1.0), 0.0)
    id_type = dict(emb.dtypes)[id_col]

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.clip(np.floor((vecs - mn) * inv + 0.5), 0, 255).astype(np.int32)
            yield pd.DataFrame({"id": pdf[id_col], "codes": list(codes)})

    return emb.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        run, f"id {id_type}, codes array<int>"
    )


def sq8_topk(
    encoded: DataFrame,  # (id, codes) from sq8_encode
    query_codes: "list[tuple]",  # [(query_id, codes list[int])]
    k: int = 10,
) -> DataFrame:
    """Top-k by INTEGER squared-L2 in code space — sum((a-b)^2) over
    int16 deltas is exact in int64, so ranking (and the DuckDB twin's
    hash) never touches a float. Same single-pass vectorized scan +
    in-batch lossless top-k prune as :func:`pq_adc_topk`; ties break on
    (distance, id)."""
    import numpy as np
    import pandas as pd

    if not query_codes:
        raise ValueError("sq8_topk needs at least one query")
    qids = [q[0] for q in query_codes]
    qmat = np.asarray([q[1] for q in query_codes], dtype=np.int64)  # Q x dim
    qid_type = "long" if isinstance(qids[0], int) else "string"
    id_type = dict(encoded.dtypes)["id"]
    schema = f"query_id {qid_type}, id {id_type}, sq_dist long"

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # B x dim
            ids = pdf["id"].to_numpy()
            out_q, out_i, out_d = [], [], []
            for qi in range(len(qids)):
                d = codes - qmat[qi]
                dist = (d * d).sum(axis=1)                     # exact int64
                if len(dist) > k:
                    # keep EVERY row at or below the k-th smallest distance:
                    # integer code-space distances make exact ties realistic,
                    # and an argpartition[:k+1] prune keeps an arbitrary
                    # tied subset — dropping a tied row with a smaller id
                    # and breaking the documented (distance, id) order
                    sel = np.flatnonzero(dist <= np.partition(dist, k)[k])
                else:
                    sel = np.arange(len(dist))
                out_q.extend([qids[qi]] * len(sel))
                out_i.extend(ids[sel])
                out_d.extend(dist[sel])
            yield pd.DataFrame(
                {"query_id": out_q, "id": out_i, "sq_dist": out_d}
            )

    scored = encoded.mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(F.asc("sq_dist"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "sq_dist", F.col("rank").cast("int").alias("rank"))
    )


def mrl_topk(
    emb: DataFrame,
    queries: DataFrame,  # (query_id, embedding)
    d: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style retrieval: rank by cosine over only the FIRST
    ``d`` dimensions (MRL embeddings front-load information, so a d/64
    prefix preserves most ranking quality at d/64 the compute and a
    d/64-narrower scan). Pure plan composition: one ``slice`` projection
    feeding :func:`cosine_topk` — the renormalization is implicit in
    cosine. The standard coarse stage of a prefix-rerank cascade (full-d
    :func:`cosine_topk` over the survivors)."""
    if d < 1:
        raise ValueError("prefix dimension must be >= 1")
    e2 = emb.withColumn(vec_col, F.slice(F.col(vec_col), 1, d))
    q2 = queries.withColumn(vec_col, F.slice(F.col(vec_col), 1, d))
    return cosine_topk(e2, q2, k, id_col=id_col, vec_col=vec_col)


def mrl_rerank_topk(
    emb: DataFrame,
    queries: DataFrame,  # (query_id, embedding)
    d: int,
    k_coarse: int = 50,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The full prefix-rerank cascade: :func:`mrl_topk` over the first
    ``d`` dims nominates ``k_coarse`` candidates per query (narrow scan),
    then ONLY those (query, candidate) pairs are re-scored with the
    full-width cosine and the final top-k selected. The expensive
    full-width math runs on O(queries x k_coarse) rows instead of
    O(queries x corpus) — the standard two-stage ANN serving shape.
    Returns (query_id, id, cosine, rank) ranked by the FULL cosine."""
    coarse = mrl_topk(emb, queries, d, k_coarse, id_col=id_col, vec_col=vec_col)
    cand = coarse.select("query_id", "id")
    pairs = (
        cand.join(
            emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "id"
        )
        .join(
            F.broadcast(queries.select("query_id", F.col(vec_col).alias("qv"))),
            "query_id",
        )
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (_norm(F.col("v")) * _norm(F.col("qv"))), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "cosine", "rank")
    )


def ivf_pq_topk(
    emb: DataFrame,
    queries: DataFrame,  # (query_id, embedding)
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    round_to: int | None = 6,
    max_closure_queries: int = 10_000,
) -> DataFrame:
    """IVF-PQ: the production ANN composition — IVF coarse pruning picks
    WHICH vectors to score (n_probe/n_centroids of the corpus) and PQ
    asymmetric distance decides HOW cheaply (one LUT gather per 8-byte
    code row; raw vectors are never re-read at query time). Composes the
    two existing index builds verbatim (:func:`ivf_assign_fast` coarse
    assignment, :func:`pq_init_codebooks` + :func:`pq_encode` codes);
    query-time cost is O(candidate pairs), with the per-query LUTs riding
    the kernel closure exactly like :func:`pq_adc_topk`.

    Plan: probes (tiny, broadcast) equi-join the assignment to form
    (query_id, id) candidates, one join attaches codes, one Arrow pass
    scores, one windowed top-k. Ranking = rounded ADC distance, ties to
    the lowest id — identical to the DuckDB twin that re-derives
    assignment, codes, and LUTs relationally.

    Query batches up to ``max_closure_queries`` precompute all LUTs on
    the driver and ship them in the kernel closure (LUT reuse across a
    query's whole candidate list — the fast path, plan unchanged). PAST
    the bound nothing is collected: the query vector rides the candidate
    join instead, and the kernel builds each batch's LUTs from the
    unique query vectors it actually sees (codebook in the closure is
    m*ksub*dsub floats, constant) — driver memory stays flat no matter
    how many queries the log holds, at the cost of re-deriving a query's
    LUT once per Arrow batch that touches it. Both paths score the
    identical rounded ADC distance."""
    import numpy as np
    import pandas as pd

    if centroids is None:
        centroids = (
            emb.orderBy(F.asc(id_col)).limit(n_centroids)
            .select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
        )
    assign = ivf_assign_fast(emb, centroids, id_col, vec_col)
    qc = F.broadcast(centroids.select("centroid_id", F.col(vec_col).alias("cv")))
    qscored = (
        queries.select("query_id", F.col(vec_col).alias("qv"))
        .crossJoin(qc)
        .withColumn(
            "cos", _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("centroid_id"))
    probes = (
        qscored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "centroid_id")
    )

    cb = pq_init_codebooks(emb, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col)
    enc = pq_encode(emb, cb, id_col=id_col, vec_col=vec_col)
    pairs = (
        assign.join(F.broadcast(probes), "centroid_id")
        .select("query_id", "id")
        .join(enc, "id")
    )

    cbn = np.asarray(cb, dtype=np.float64)
    mm, kk_, dsub = cbn.shape
    offs = np.arange(mm) * kk_
    id_type = dict(emb.dtypes)[id_col]

    def _lut(qv: np.ndarray) -> np.ndarray:
        lut = ((qv.reshape(mm, 1, dsub) - cbn) ** 2).sum(axis=-1)
        return _round_half_up(lut, round_to) if round_to is not None else lut

    n_queries = queries.limit(max_closure_queries + 1).count()
    if n_queries == 0:
        raise ValueError("ivf_pq_topk needs at least one query")
    if n_queries <= max_closure_queries:
        # closure path: all LUTs precomputed once on the driver
        qlist = [(int(r[0]), r[1]) for r in queries.select("query_id", vec_col).collect()]
        flat = np.stack([
            _lut(np.asarray(qv, dtype=np.float64)) for _, qv in qlist
        ]).reshape(len(qlist), mm * kk_)
        qidx = {qid: i for i, (qid, _) in enumerate(qlist)}

        def score(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
                rows = np.asarray([qidx[int(q)] for q in pdf["query_id"]])
                sc = flat[rows[:, None], offs[None, :] + codes].sum(axis=1)
                if round_to is not None:
                    sc = _round_half_up(sc, round_to)
                yield pd.DataFrame({
                    "query_id": pdf["query_id"], "id": pdf["id"], "adc_dist": sc,
                })

        scored = pairs.mapInPandas(
            score, f"query_id long, id {id_type}, adc_dist double"
        )
    else:
        # distributed path: qv rides the candidate join; LUTs built per
        # Arrow batch from the unique query vectors present in it
        pairs_q = pairs.join(
            queries.select("query_id", F.col(vec_col).alias("__qv")), "query_id"
        )

        def score_dist(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
                qids = pdf["query_id"].to_numpy()
                uq, inv = np.unique(qids, return_inverse=True)
                first = {int(q): i for i, q in reversed(list(enumerate(qids)))}
                flat = np.stack([
                    _lut(np.asarray(pdf["__qv"].iloc[first[int(q)]], dtype=np.float64))
                    for q in uq
                ]).reshape(len(uq), mm * kk_)
                sc = flat[inv[:, None], offs[None, :] + codes].sum(axis=1)
                if round_to is not None:
                    sc = _round_half_up(sc, round_to)
                yield pd.DataFrame({
                    "query_id": pdf["query_id"], "id": pdf["id"], "adc_dist": sc,
                })

        scored = pairs_q.mapInPandas(
            score_dist, f"query_id long, id {id_type}, adc_dist double"
        )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "adc_dist", "rank")
    )


def ivf_pq_residual_topk(
    emb: DataFrame,
    queries: DataFrame,  # (query_id, embedding)
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    round_to: int | None = 6,
    max_closure_queries: int = 10_000,
) -> DataFrame:
    """IVFADC with RESIDUAL encoding — the production refinement of
    :func:`ivf_pq_topk` (Jégou, Douze, Schmid, "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011, §IV): PQ codes quantize
    ``x - centroid(x)`` instead of ``x``, so the 8 bytes of code budget
    only have to span each coarse cell's residual cloud rather than the
    whole corpus — finer quantization at identical storage, which is why
    every FAISS ``IVFx,PQy`` index defaults to it.

    Cost shape is identical to :func:`ivf_pq_topk` (the residual join is
    one broadcast hash join against the tiny centroid table, folded into
    the zero-shuffle encode pass), EXCEPT the query LUT is per (query,
    probed centroid) instead of per query — n_probe LUT builds per query,
    still O(m*ksub*dsub) floats each. Vectors are cast to double BEFORE
    the residual subtraction so the arithmetic is exactly the DuckDB
    twin's ``CAST(... AS DOUBLE) - CAST(... AS DOUBLE)``.

    Query batches up to ``max_closure_queries`` precompute all
    (query x centroid) LUTs driver-side; past the bound the query vector
    rides the candidate join (centroid vectors are always closure-tiny)
    and LUTs are rebuilt per Arrow batch — flat driver memory, identical
    rounded ADC scores. Ranking = (rounded ADC distance, lowest id)."""
    import numpy as np
    import pandas as pd

    if centroids is None:
        centroids = (
            emb.orderBy(F.asc(id_col)).limit(n_centroids)
            .select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
        )
    assign = ivf_assign_fast(emb, centroids, id_col, vec_col)
    cent = F.broadcast(
        centroids.select(
            "centroid_id", F.col(vec_col).cast("array<double>").alias("cv")
        )
    )
    # residual vectors: double-cast BEFORE subtraction (twin parity)
    resid = (
        emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("xv"))
        .join(assign.withColumnRenamed("id", id_col), id_col)
        .join(cent, "centroid_id")
        .select(
            F.col(id_col),
            F.col("centroid_id"),
            F.zip_with("xv", "cv", lambda a, b: a - b).alias(vec_col),
        )
    )
    # Seed the residual codebook from the lowest-id NON-CENTROID rows: a
    # centroid row's residual is identically zero (it is its own nearest
    # centroid), and with ksub <= n_centroids the naive lowest-id seeding
    # would produce an all-zero codebook — every code collapses to 0 and
    # ADC degenerates to the bucket distance. Excluding centroid rows
    # seeds from the actual residual cloud.
    cent_ids = [int(r[0]) for r in centroids.select("centroid_id").collect()]
    seed_pool = resid.filter(~F.col(id_col).isin(cent_ids))
    cb = pq_init_codebooks(seed_pool, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col)
    enc = pq_encode(resid, cb, id_col=id_col, vec_col=vec_col, round_to=round_to)

    qc = F.broadcast(centroids.select("centroid_id", F.col(vec_col).alias("cv0")))
    qscored = (
        queries.select("query_id", F.col(vec_col).alias("qv"))
        .crossJoin(qc)
        .withColumn(
            "cos", _dot(F.col("qv"), F.col("cv0")) / (_norm(F.col("qv")) * _norm(F.col("cv0")))
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("centroid_id"))
    probes = (
        qscored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "centroid_id")
    )
    pairs = (
        assign.join(F.broadcast(probes), "centroid_id")
        .select("query_id", "centroid_id", "id")
        .join(enc, "id")
    )

    cbn = np.asarray(cb, dtype=np.float64)
    mm, kk_, dsub = cbn.shape
    offs = np.arange(mm) * kk_
    id_type = dict(emb.dtypes)[id_col]
    cvecs = {
        int(r[0]): np.asarray(r[1], dtype=np.float64)
        for r in centroids.select("centroid_id", vec_col).collect()
    }

    def _lut(qv: np.ndarray, cid: int) -> np.ndarray:
        rq = qv - cvecs[cid]
        lut = ((rq.reshape(mm, 1, dsub) - cbn) ** 2).sum(axis=-1)
        return _round_half_up(lut, round_to) if round_to is not None else lut

    n_queries = queries.limit(max_closure_queries + 1).count()
    if n_queries == 0:
        raise ValueError("ivf_pq_residual_topk needs at least one query")
    if n_queries <= max_closure_queries:
        # closure path: all (query x centroid) LUTs precomputed driver-side
        qlist = [(int(r[0]), np.asarray(r[1], dtype=np.float64))
                 for r in queries.select("query_id", vec_col).collect()]
        cids = sorted(cvecs)
        flat = np.stack([
            np.stack([_lut(qv, c) for c in cids]) for _, qv in qlist
        ]).reshape(len(qlist), len(cids), mm * kk_)
        qidx = {qid: i for i, (qid, _) in enumerate(qlist)}
        cidx = {c: i for i, c in enumerate(cids)}

        def score(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
                qi = np.asarray([qidx[int(q)] for q in pdf["query_id"]])
                ci = np.asarray([cidx[int(c)] for c in pdf["centroid_id"]])
                sc = flat[qi[:, None], ci[:, None], offs[None, :] + codes].sum(axis=1)
                if round_to is not None:
                    sc = _round_half_up(sc, round_to)
                yield pd.DataFrame({
                    "query_id": pdf["query_id"], "id": pdf["id"], "adc_dist": sc,
                })

        scored = pairs.mapInPandas(
            score, f"query_id long, id {id_type}, adc_dist double"
        )
    else:
        # distributed path: qv rides the candidate join; centroids stay in
        # the closure; per-batch LUTs for the (query, centroid) pairs seen
        pairs_q = pairs.join(
            queries.select("query_id", F.col(vec_col).alias("__qv")), "query_id"
        )

        def score_dist(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
                qids = pdf["query_id"].to_numpy()
                cids_b = pdf["centroid_id"].to_numpy()
                first = {int(q): i for i, q in reversed(list(enumerate(qids)))}
                luts: dict = {}
                sc = np.zeros(len(pdf))
                for r_i in range(len(pdf)):
                    key = (int(qids[r_i]), int(cids_b[r_i]))
                    if key not in luts:
                        qv = np.asarray(pdf["__qv"].iloc[first[key[0]]], dtype=np.float64)
                        luts[key] = _lut(qv, key[1]).reshape(mm * kk_)
                    sc[r_i] = luts[key][offs + codes[r_i]].sum()
                if round_to is not None:
                    sc = _round_half_up(sc, round_to)
                yield pd.DataFrame({
                    "query_id": pdf["query_id"], "id": pdf["id"], "adc_dist": sc,
                })

        scored = pairs_q.mapInPandas(
            score_dist, f"query_id long, id {id_type}, adc_dist double"
        )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "adc_dist", "rank")
    )
