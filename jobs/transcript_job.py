#!/usr/bin/env python
"""spark-submit entry point for the transcript-cleaning pipeline
(conversation health gate → conversation near-dedup survivorship):

    spark-submit --master <cluster> --py-files dist/cerberus_spark.zip \
        jobs/transcript_job.py --input <turns parquet> --sink <out dir> \
        --grammar grammar.json --conv-col conv_id --order-cols turn_idx \
        --state-col role --ts-col ts

``--grammar`` is a JSON file describing the sequence contract::

    {"allowed": [["user", "assistant"], ["assistant", "user"]],
     "allowed_first": ["user", "system"]}

(``allowed_first`` optional — omit to accept any opening state).

Writes ``<sink>/kept`` (surviving turns, all input columns),
``<sink>/dropped`` (conv, stage, reason) and ``<sink>/report``
(stage, reason, n_convs — self-accounting: distinct unhealthy +
cluster losers + kept survivors = |conversations|), and prints one
JSON status line with the conversation-level tallies.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _load_grammar(path: str) -> tuple[set[tuple[str, str]], set[str] | None]:
    with open(path) as fh:
        g = json.load(fh)
    try:
        allowed = {(str(a), str(b)) for a, b in g["allowed"]}
    except (KeyError, TypeError, ValueError) as exc:
        raise SystemExit(
            f"--grammar {path}: 'allowed' must be a list of [from, to] pairs: {exc}"
        )
    first = g.get("allowed_first")
    return allowed, (None if first is None else {str(s) for s in first})


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="parquet dir of transcript turns")
    p.add_argument("--sink", required=True, help="output dir (kept/dropped/report)")
    p.add_argument("--grammar", required=True,
                   help="JSON file: {allowed: [[from, to], ...], allowed_first: [...]}")
    p.add_argument("--conv-col", default="conv_id")
    p.add_argument("--order-cols", default="turn_idx",
                   help="comma-separated within-conversation sort keys")
    p.add_argument("--state-col", default="role",
                   help="column the transition grammar runs over")
    p.add_argument("--ts-col", default="ts",
                   help="timestamp column for the monotonicity rule")
    p.add_argument("--token-col", default=None,
                   help="column the near-dup shingles hash (default: state col)")
    p.add_argument("--num-hashes", type=int, default=16)
    p.add_argument("--shingle-k", type=int, default=2,
                   help="turn-level shingle size (1 = order-insensitive bag)")
    p.add_argument("--bands", type=int, default=4)
    p.add_argument("--rows-per-band", type=int, default=4)
    p.add_argument("--bucket-cap", type=int, default=200,
                   help="LSH band-bucket cap (degenerate-corpus guard; capped "
                   "buckets drop whole — visible in candidate counts, never silent)")
    p.add_argument("--threshold", type=float, default=0.5,
                   help="exact-Jaccard verify threshold (must be > 0)")
    p.add_argument("--survivor-policy", default="min_id",
                   choices=("min_id", "longest"),
                   help="which cluster member keeps: positional min "
                   "conversation key, or the conversation with the most turns")
    p.add_argument("--incremental", action="store_true",
                   help="stream --input via availableNow into --work-dir "
                   "(append-only turn ingest), then run the conversation "
                   "stages once at compaction (same results as batch mode "
                   "— tested; no per-turn state is precomputed, so "
                   "micro-batch boundaries cannot leak into decisions)")
    p.add_argument("--work-dir", default=None,
                   help="incremental-mode turn store (default <sink>/_work)")
    p.add_argument("--max-files-per-trigger", type=int, default=None,
                   help="incremental-mode micro-batch size in input files")
    p.add_argument("--parallelism", type=int, default=None, help="local[..] only")
    args = p.parse_args(argv)

    allowed, allowed_first = _load_grammar(args.grammar)

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from cerberus_spark.session import get_spark

        spark = get_spark(parallelism=args.parallelism, app_name="cerberus_transcripts")

    from cerberus_spark.corpus import clean_transcripts

    turns = spark.read.parquet(args.input)
    clean_kwargs = dict(
        token_col=args.token_col,
        num_hashes=args.num_hashes,
        shingle_k=args.shingle_k,
        bands=args.bands,
        rows_per_band=args.rows_per_band,
        bucket_cap=args.bucket_cap,
        threshold=args.threshold,
        survivor_policy=args.survivor_policy,
    )
    order_cols = [c for c in args.order_cols.split(",") if c]
    if args.incremental:
        from cerberus_spark.corpus import (
            compact_transcripts,
            ingest_transcript_increment,
        )

        work = args.work_dir or f"{args.sink}/_work"
        reader = spark.readStream.schema(turns.schema)
        if args.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", args.max_files_per_trigger)
        # checkpoint in the work dir: a re-run (scheduled snapshot mode
        # or post-crash) resumes from the source offsets instead of
        # re-ingesting every input file; per-batch batch_id directories
        # make a foreachBatch RETRY overwrite instead of duplicate —
        # duplicated turns would quarantine every conversation via
        # manufactured self-transitions
        q = (
            reader.parquet(args.input)
            .writeStream.foreachBatch(
                lambda b, bid: ingest_transcript_increment(b, work, bid)
            )
            .option("checkpointLocation", f"{work}/_checkpoint")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        outs = compact_transcripts(
            spark, work, args.conv_col, order_cols,
            args.state_col, args.ts_col, allowed, allowed_first,
            **clean_kwargs,
        )
    else:
        outs = clean_transcripts(
            turns,
            args.conv_col,
            order_cols,
            args.state_col,
            args.ts_col,
            allowed,
            allowed_first,
            **clean_kwargs,
        )
    outs["kept"].write.mode("overwrite").parquet(f"{args.sink}/kept")
    outs["dropped"].write.mode("overwrite").parquet(f"{args.sink}/dropped")
    outs["report"].write.mode("overwrite").parquet(f"{args.sink}/report")

    from pyspark.sql import functions as F

    rep = spark.read.parquet(f"{args.sink}/report")
    tallies = {
        f"{r.stage}:{r.reason}": r.n_convs
        for r in rep.orderBy("stage", "reason").collect()
    }
    # incremental mode compacts the ACCUMULATED work dir (this run's
    # --input plus every earlier ingest), so the self-accounting count
    # must cover the same conversations the report covers
    if args.incremental:
        counted = spark.read.parquet(f"{work}/turns")
    else:
        counted = turns
    n_convs = counted.select(F.col(args.conv_col)).distinct().count()
    print(json.dumps({"status": "ok", "n_convs": n_convs, "report": tallies}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
