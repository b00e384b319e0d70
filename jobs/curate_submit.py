#!/usr/bin/env python
"""spark-submit entry point for corpus curation — the training-data
pipeline composed end to end as ONE job:

    profile -> repetition filter -> decontaminate
            [-> paragraph dedup] -> dedup [-> LM perplexity filter]
            -> stratified sample -> source mix
            -> per-stratum quality quota -> leakage-safe split
            -> token-budget packing [-> chunked companion output]

Every stage is one of the engine's deterministic operators (no rand()
anywhere), so a re-run over the same inputs reproduces the same curated
corpus bit for bit — the property a corpus rebuild needs. Ships as:

    python tools/build_dist.py
    spark-submit --master <url> \\
        --py-files dist/gfw_raster_analysis_lambda_spark.zip \\
        jobs/curate_submit.py \\
        --documents /data/documents_parquet --output /data/curated \\
        [--benchmark /data/benchmark_parquet --contamination-threshold 0.5] \\
        [--near-dup] [--strata-fractions '{"en": 0.5, "fr": 1.0}'] \\
        [--mix-targets '{"src1": 0.6, "src2": 0.4}'] \\
        [--quota-k 100000] [--pack-budget 2048] [--pack-shards 1024] \\
        [--max-dup-line-frac 0.3] [--max-top-bigram-frac 0.2] \\
        [--split-weights '{"train": 0.9, "val": 0.1}'] \\
        [--chunks-output /data/curated_chunks --chunk-tokens 2048]

Stage order matters: decontamination and dedup run BEFORE sampling (a
contaminated or duplicated document must not survive by being sampled
around), quota runs after the mix (quality selection within the final
distribution), packing runs last over the final membership. A JSON
manifest with per-stage surviving counts is written next to the output
for observability.
"""

from __future__ import annotations

import argparse
import json


def _persist_stage(docs, manifest: dict, name: str, prev=None):
    """Pin a drop stage's result before counting it: the manifest counts
    would otherwise re-execute every prior stage per count (roughly
    quadratic in stage count on a 100-TB input), and the final write
    would recompute the whole lineage once more. Once this stage is
    materialized the PREVIOUS stage's cache is released — only one
    stage's frame stays pinned at a time."""
    docs = docs.persist()
    manifest[name] = docs.count()
    if prev is not None:
        prev.unpersist()
    return docs


def _write_manifest(spark, output: str, manifest: dict) -> None:
    """Write the manifest THROUGH the output's filesystem (Hadoop FS API)
    — a local open() would fail for hdfs:///s3:// outputs after the whole
    job had already run."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(output, "_curation_manifest.json")
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.create(path, True)
    try:
        stream.write(bytearray(json.dumps(manifest, indent=1), "utf-8"))
    finally:
        stream.close()


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--benchmark", default=None,
                    help="parquet of (bench_id, text) eval items to decontaminate against")
    ap.add_argument("--contamination-threshold", type=float, default=0.5)
    ap.add_argument("--contamination-ngram", type=int, default=8)
    ap.add_argument("--near-dup", action="store_true",
                    help="also drop MinHash near-duplicates (keepers path)")
    ap.add_argument("--near-dup-hashes", type=int, default=8)
    ap.add_argument("--near-dup-bands", type=int, default=4,
                    help="fewer bands (more rows per band) = stricter matches")
    ap.add_argument("--strata-col", default="lang")
    ap.add_argument("--strata-fractions", default=None,
                    help='JSON dict stratum -> keep fraction, e.g. {"en": 0.5}')
    ap.add_argument("--strata-default-fraction", type=float, default=1.0)
    ap.add_argument("--mix-targets", default=None,
                    help='JSON dict source -> target weight, e.g. {"src1": 0.6}')
    ap.add_argument("--mix-source-col", default="source")
    ap.add_argument("--quota-k", type=int, default=None,
                    help="keep only the k highest-quality docs per stratum")
    ap.add_argument("--pack-budget", type=int, default=2048)
    ap.add_argument("--pack-shards", type=int, default=1024)
    ap.add_argument("--paragraph-dedup", action="store_true",
                    help="C4-style exact paragraph dedup before document "
                         "dedup: only the first corpus occurrence of each "
                         "paragraph survives; documents reassemble in order")
    ap.add_argument("--paragraph-sep", default="\n")
    ap.add_argument("--lm-buckets", type=int, default=None,
                    help="CCNet-style bigram-LM perplexity buckets; keeps "
                         "buckets <= --lm-keep-max (lowest perplexity first)")
    ap.add_argument("--lm-keep-max", type=int, default=2)
    ap.add_argument("--max-dup-line-frac", type=float, default=None,
                    help="drop docs whose duplicate-line fraction exceeds this")
    ap.add_argument("--max-top-bigram-frac", type=float, default=None,
                    help="drop docs whose top-bigram occurrence fraction exceeds this")
    ap.add_argument("--split-weights", default=None,
                    help='JSON dict split -> weight, e.g. {"train": 0.9, "val": 0.1}; '
                         "assignment is leakage-safe (keyed on the near-dup cluster "
                         "label when --near-dup ran, else on the doc id)")
    ap.add_argument("--chunks-output", default=None,
                    help="also write fixed-token training chunks of the curated corpus here")
    ap.add_argument("--chunk-tokens", type=int, default=2048)
    ap.add_argument("--chunk-stride", type=int, default=2048)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from gfw_raster_analysis_lambda_spark.operators import dedup, sampling, text

    spark = SparkSession.builder.appName("curate_submit").getOrCreate()
    docs = spark.read.parquet(args.documents)
    idc, txt = args.id_col, args.text_col
    prev = None
    manifest: dict = {"input": docs.count()}

    # 1. profile (quality + lang prediction ride along to the output)
    prof = text.text_profile(docs, text_col=txt, id_col=idc)
    docs = docs.join(prof.select(idc, "quality", "lang_pred", "n_tokens_ws"), idc)

    # 1b. repetition filter (Gopher-style boilerplate/spam gate) —
    # per-row signals, no corpus shuffle
    if args.max_dup_line_frac is not None or args.max_top_bigram_frac is not None:
        sig = text.repetition_signals(docs, text_col=txt, id_col=idc)
        cond = F.lit(True)
        if args.max_dup_line_frac is not None:
            cond = cond & (F.col("dup_line_frac") <= F.lit(args.max_dup_line_frac))
        if args.max_top_bigram_frac is not None:
            cond = cond & (F.col("top_bigram_frac") <= F.lit(args.max_top_bigram_frac))
        keep = sig.filter(cond).select(idc)
        docs = docs.join(keep, idc, "left_semi")
        docs = prev = _persist_stage(docs, manifest, "after_repetition_filter")

    # 2. decontaminate against the benchmark set (broadcast side)
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        drop = text.contaminated_doc_ids(
            docs, bench, doc_id=idc, text_col=txt,
            n=args.contamination_ngram, threshold=args.contamination_threshold,
        ).select(idc)
        docs = docs.join(drop, idc, "left_anti")
        docs = prev = _persist_stage(docs, manifest, "after_decontaminate", prev)

    # 2b. C4-style exact paragraph dedup (before document-level dedup:
    # removing shared boilerplate paragraphs first makes the remaining
    # document text the content-bearing part). Rebuilt text REPLACES the
    # text column; docs whose every paragraph was seen before become
    # empty and fall to the downstream quality/repetition filters.
    if args.paragraph_dedup:
        rebuilt = text.paragraph_dedup(
            docs, id_col=idc, text_col=txt, sep=args.paragraph_sep,
        ).localCheckpoint(eager=True)  # 4 self-references: cut the lineage
        docs = docs.drop(txt).join(
            rebuilt.select(idc, txt, "n_dropped"), idc
        ).withColumnRenamed("n_dropped", "n_paras_dropped")
        docs = prev = _persist_stage(docs, manifest, "after_paragraph_dedup", prev)

    # 3. exact dedup: keep the lowest-id doc of every byte-identical group
    # (loser list from the shared helper — same key normalization as
    # exact_duplicates by construction)
    docs = docs.join(
        dedup.exact_dedup_losers(docs, id_col=idc, text_col=txt), idc, "left_anti"
    )
    docs = prev = _persist_stage(docs, manifest, "after_exact_dedup", prev)

    # 3b. optional near-dup drop (MinHash LSH keepers path: the output is
    # the LOSER list — (id, keeper) rows with id != keeper — so unique
    # documents, which never appear in it, all survive the anti-join)
    if args.near_dup:
        losers = dedup.minhash_dedup_keepers(
            docs, id_col=idc, text_col=txt,
            n_hashes=args.near_dup_hashes, bands=args.near_dup_bands,
        )
        docs = docs.join(
            losers.select(F.col("id").alias(idc)), idc, "left_anti"
        )
        docs = prev = _persist_stage(docs, manifest, "after_near_dedup", prev)

    # 3c. CCNet-style LM perplexity filter (after dedup so duplicate
    # boilerplate cannot bias the self-trained LM): score every doc
    # under the add-1 bigram LM, bucket by perplexity, keep the head.
    # bigram_lm_scores references its input FOUR times (training
    # bigrams, scoring bigrams, vocabulary, id frame); stacked on the
    # pipeline's already-deep lineage that multiplies the whole logical
    # plan per reference and Catalyst analysis blows up exponentially —
    # so the stage scores a lineage-TRUNCATED (id, text) snapshot and
    # only the tiny keep-list joins back.
    if args.lm_buckets:
        lm_src = docs.select(idc, txt).localCheckpoint(eager=True)
        scored = text.perplexity_buckets(
            text.bigram_lm_scores(lm_src, id_col=idc, text_col=txt),
            n_buckets=args.lm_buckets, id_col=idc,
        )
        keep = scored.filter(
            F.col("bucket") <= args.lm_keep_max
        ).select(idc).localCheckpoint(eager=True)
        docs = docs.join(keep, idc, "left_semi")
        docs = prev = _persist_stage(docs, manifest, "after_lm_filter", prev)

    # 4. stratified sampling (rebalance skewed strata)
    if args.strata_fractions:
        fr = json.loads(args.strata_fractions)
        docs = sampling.stratified_sample(
            docs, fr, strata_col=args.strata_col, id_col=idc,
            default_fraction=args.strata_default_fraction,
        )
        docs = prev = _persist_stage(docs, manifest, "after_stratified_sample", prev)

    # 5. mix sources to target proportions
    if args.mix_targets:
        docs = sampling.mix_sources(
            docs, json.loads(args.mix_targets),
            source_col=args.mix_source_col, id_col=idc,
        )
        docs = prev = _persist_stage(docs, manifest, "after_mix", prev)

    # 6. per-stratum quality quota (skew-safe salted top-k)
    if args.quota_k:
        kept = text.salted_grouped_topk(
            docs, [args.strata_col],
            [F.col("quality").desc(), F.col(idc).asc()],
            args.quota_k,
        ).drop("rank")
        docs = prev = _persist_stage(kept, manifest, "after_quota", prev)

    # 6b. leakage-safe split assignment (adds a column, drops nothing):
    # keyed on the near-dup cluster label so near-duplicates never
    # straddle an eval boundary; plain id-keyed split without --near-dup
    if args.split_weights:
        weights = json.loads(args.split_weights)
        if args.near_dup:
            clusters = dedup.minhash_dedup_clusters(
                docs, id_col=idc, text_col=txt,
                n_hashes=args.near_dup_hashes, bands=args.near_dup_bands,
            )
            docs = sampling.leakage_safe_split(docs, clusters, weights, id_col=idc)
        else:
            docs = sampling.split_assign(docs, weights, id_col=idc)

    # 7. token-budget packing over the final membership
    bins = text.pack_token_bins(
        docs, budget=args.pack_budget, n_shards=args.pack_shards,
        id_col=idc, text_col=txt, tokens_col="n_tokens_ws",
    )
    out = docs.join(bins.select(idc, "shard", "bin", "n_tokens"), idc)
    out.write.mode("overwrite").parquet(args.output)
    manifest["output"] = spark.read.parquet(args.output).count()

    # 7b. chunked companion output (training windows of the final corpus)
    if args.chunks_output:
        chunks = text.chunk_documents(
            spark.read.parquet(args.output),
            chunk_tokens=args.chunk_tokens, stride=args.chunk_stride,
            text_col=txt, id_col=idc,
        )
        chunks.write.mode("overwrite").parquet(args.chunks_output)
        manifest["chunks"] = spark.read.parquet(args.chunks_output).count()

    _write_manifest(spark, args.output, manifest)
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
