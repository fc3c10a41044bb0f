#!/usr/bin/env python
"""spark-submit entry point for the corpus-cleaning pipeline
(normalize → Gopher quality gate → exact dedup → MinHash near-dedup):

    spark-submit --master <cluster> --py-files dist/cerberus_spark.zip \
        jobs/corpus_job.py --input <docs parquet> --sink <out dir>

Writes ``<sink>/kept`` (surviving docs, normalized text),
``<sink>/dropped`` (id, stage, reason) and ``<sink>/report``
(stage, reason, n_docs), and prints one JSON status line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="parquet dir of documents")
    p.add_argument("--sink", required=True, help="output dir (kept/dropped/report)")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--no-normalize", action="store_true",
                   help="skip unicode NFC normalization")
    p.add_argument("--min-tokens", type=int, default=50)
    p.add_argument("--max-dup-word-milli", type=int, default=300,
                   help="repetition gates are tuned for natural text; "
                   "raise on synthetic/templated corpora")
    p.add_argument("--max-top-word-milli", type=int, default=200)
    p.add_argument("--min-quality-milli", type=int, default=500)
    p.add_argument("--bucket-cap", type=int, default=200,
                   help="LSH band-bucket cap (degenerate-corpus guard)")
    p.add_argument("--substring-removal", action="store_true",
                   help="also cut shared verbatim runs >= --min-run chars "
                   "from the later duplicate (winnowing + span removal)")
    p.add_argument("--min-run", type=int, default=50)
    p.add_argument("--lm-filter", action="store_true",
                   help="append the CCNet LM-quality stage after dedup: "
                   "score survivors with the corpus-fit unigram LM, bucket "
                   "by per-group type-1 score quantiles, drop buckets not "
                   "in --lm-keep")
    p.add_argument("--lm-keep", default="head,middle",
                   help="comma-separated buckets to keep (head/middle/tail)")
    p.add_argument("--lm-group-col", default=None,
                   help="bucket within this column's groups (e.g. lang); "
                   "default: global thresholds")
    p.add_argument("--lm-vocab-size", type=int, default=None,
                   help="cap the LM's broadcast frequency table")
    p.add_argument("--lm-model", default="unigram",
                   choices=("unigram", "bigram"),
                   help="bigram = context-aware interpolated score")
    p.add_argument("--lm-bigram-size", type=int, default=None,
                   help="cap the bigram model's broadcast pair table "
                   "(bigram model only; uncapped the distinct-pair set "
                   "is roughly corpus-sized)")
    p.add_argument("--incremental", action="store_true",
                   help="stream --input via availableNow: per-doc stages run "
                   "per micro-batch into --work-dir, corpus stages run once "
                   "at compaction (same results as batch mode — tested)")
    p.add_argument("--work-dir", default=None,
                   help="incremental-mode work tables (default <sink>/_work)")
    p.add_argument("--max-files-per-trigger", type=int, default=None,
                   help="incremental-mode micro-batch size in input files")
    p.add_argument("--parallelism", type=int, default=None, help="local[..] only")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from cerberus_spark.session import get_spark

        spark = get_spark(parallelism=args.parallelism, app_name="cerberus_corpus")

    from cerberus_spark.corpus import clean_corpus

    docs = spark.read.parquet(args.input)
    quality_kwargs = {
        "min_tokens": args.min_tokens,
        "max_dup_word_milli": args.max_dup_word_milli,
        "max_top_word_milli": args.max_top_word_milli,
        "min_quality_milli": args.min_quality_milli,
    }
    lm_filter = None
    if args.lm_filter:
        lm_filter = {
            "keep_buckets": tuple(args.lm_keep.split(",")),
            "group_col": args.lm_group_col,
            "vocab_size": args.lm_vocab_size,
            "model": args.lm_model,
        }
        if args.lm_bigram_size is not None:
            lm_filter["bigram_size"] = args.lm_bigram_size
    if args.incremental:
        if args.substring_removal:
            p.error("--substring-removal is batch-mode only")
        if lm_filter is not None:
            p.error("--lm-filter is batch-mode only (corpus-level LM fit)")
        from cerberus_spark.corpus import compact_corpus, ingest_corpus_increment

        work = args.work_dir or f"{args.sink}/_work"
        reader = spark.readStream.schema(docs.schema)
        if args.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", args.max_files_per_trigger)
        q = (
            reader.parquet(args.input)
            .writeStream.foreachBatch(
                lambda b, _bid: ingest_corpus_increment(
                    b, work,
                    text_col=args.text_col, id_col=args.id_col,
                    normalize=not args.no_normalize,
                    quality_kwargs=quality_kwargs,
                )
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        outs = compact_corpus(
            spark, work,
            text_col=args.text_col, id_col=args.id_col,
            bucket_cap=args.bucket_cap,
        )
    else:
        outs = clean_corpus(
            docs,
            text_col=args.text_col,
            id_col=args.id_col,
            normalize=not args.no_normalize,
            quality_kwargs=quality_kwargs,
            bucket_cap=args.bucket_cap,
            substring_removal=args.substring_removal,
            min_run=args.min_run,
            lm_filter=lm_filter,
        )
    outs["kept"].write.mode("overwrite").parquet(f"{args.sink}/kept")
    outs["dropped"].write.mode("overwrite").parquet(f"{args.sink}/dropped")
    outs["report"].write.mode("overwrite").parquet(f"{args.sink}/report")

    n_in = docs.count()
    n_kept = spark.read.parquet(f"{args.sink}/kept").count()
    print(json.dumps({"status": "ok", "n_input": n_in, "n_kept": n_kept,
                      "n_dropped": n_in - n_kept}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
