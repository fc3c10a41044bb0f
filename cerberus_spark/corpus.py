"""Corpus cleaning pipeline: the training-data counterpart of
``pipeline.run_full_validation`` — normalize → quality-gate → exact
dedup → near-dedup → keep/drop report, each stage an already
oracle-gated operator from this repo, composed lazily (nothing runs
until the caller writes/collects).

Stage shapes at 100 TB (all documented on the underlying operators):
normalization + the Gopher gate are ONE projection pass; exact dedup is
one md5-fingerprint shuffle; MinHash signatures are Arrow map-side;
LSH candidates shuffle once on capped band buckets; clustering moves
only candidate edges.  Documents never fan out — the only
corpus-sized shuffles are the two dedup group-bys.

Scan count: the staged lineage branches ~4 ways (gate, exact
self-join, signatures, final anti-join); by default the post-gate
survivors are localCheckpointed so the expensive normalize+gate pass
runs ONCE (measured 4.4x on a 1M-doc corpus).  Set
``checkpoint_stages=False`` when the gated corpus exceeds cluster
storage and re-scanning parquet is the cheaper trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
    quality_kwargs: dict | None = None,
    minhash_kwargs: dict | None = None,
    bands: int = 4,
    rows_per_band: int = 4,
    bucket_cap: int | None = 200,
    substring_removal: bool = False,
    winnow_g: int = 24,
    winnow_w: int = 8,
    min_run: int = 50,
    checkpoint_stages: bool = True,
    arrow_gate: bool = True,
    survivor_policy: str = "min_id",
    lm_filter: dict | None = None,
) -> dict[str, DataFrame]:
    """Returns lazy DataFrames:

    - ``kept``: surviving documents (normalized ``text_col``) — passed
      the quality gate, not an exact dup, not a near-dup cluster loser;
    - ``dropped``: (id, stage, reason) one row per dropped document;
    - ``report``: (stage, reason, n_docs) aggregate drop causes.

    ``lm_filter`` (optional, default off) appends the CCNet-style LM
    quality stage AFTER dedup (and substring removal, so scores see
    final text): documents are scored with the corpus-fit unigram LM
    (:func:`unigram_logprob_scores`), bucketed by per-group type-1
    score quantiles (:func:`quantile_buckets`), and dropped unless
    their bucket is in ``keep_buckets`` — stage ``lm_quality``, reason
    ``bucket_<name>``.  Keys: ``group_col`` (e.g. ``"lang"``; None =
    global thresholds), ``keep_buckets`` (default ``("head",
    "middle")``), ``cuts_permille`` / ``labels`` (default thirds),
    ``vocab_size`` (caps the LM's broadcast unigram table),
    ``bigram_size`` (caps the broadcast bigram table — REQUIRED for
    web-scale bigram runs: the distinct-bigram set is roughly
    corpus-sized uncapped), ``model`` (``"unigram"`` default, or
    ``"bigram"`` for the context-aware
    interpolated score).  Documents the LM
    cannot score (no tokens) are KEPT — drops require positive
    evidence.  Runs only on dedup survivors: two capped count shuffles
    + broadcast joins, never a data-sized window.

    ``survivor_policy`` picks which member of every NEAR-dup cluster
    keeps: ``"min_id"`` (default — positional, same as
    ``dedup_clusters``' flag; exact-dup groups always keep min id, the
    members are byte-identical) or ``"longest"`` — the least-truncated
    copy wins (max post-normalization ``length(text_col)``, ties to
    min id), via :func:`cluster_representatives`; one extra
    partial-aggregable groupBy over the |clustered docs| slice.

    ``arrow_gate`` (default True): serve the quality gate from the
    single-pass Arrow twin (functions/text.py:gopher_report_arrow,
    bit-parity-locked vs the columnar gate) — the gate is the one
    projection paid on the FULL corpus, and the columnar fold family
    re-inlines tokenization per signal at interpreter speed.  Set False
    to run the pure-Catalyst gate (the oracle-gated composition).
    """
    from cerberus_spark.functions.text import gopher_filter_report, normalize_unicode
    from cerberus_spark.operators.dedup import (
        md5_i64,
        minhash_dup_candidates,
        minhash_signatures,
        normalize_text,
    )
    from cerberus_spark.operators.graph import dedup_clusters

    base = docs
    if normalize:
        base = base.withColumn(text_col, normalize_unicode(text_col))

    # --- stage 1: quality gate (one projection / one Arrow pass) -----
    if arrow_gate:
        from cerberus_spark.functions.text import gopher_report_arrow

        gated = gopher_report_arrow(base, text_col, **(quality_kwargs or {}))
        gated = gated.withColumn(
            "_gate",
            F.struct(F.col("keep").alias("keep"), F.col("reasons").alias("reasons")),
        ).drop("keep", "reasons")
    else:
        gated = base.withColumn(
            "_gate", gopher_filter_report(F.col(text_col), **(quality_kwargs or {}))
        )
    if checkpoint_stages:
        # the lineage BRANCHES below (kept vs quality_drops, then the
        # exact-dedup self-join, signatures, and the final anti-join):
        # without a checkpoint the normalize+gate expressions re-execute
        # once per branch (~4 scans — measured 200s -> 45.6s, 4.4x, on a
        # 1M-doc corpus at local[32]).  Same localCheckpoint pattern as
        # connected_components' edge cache; disable when the gated
        # corpus exceeds cluster storage and re-scanning parquet is the
        # cheaper trade.
        gated = gated.localCheckpoint(eager=False)
    quality_drops = gated.filter(~F.col("_gate.keep")).select(
        F.col(id_col).alias("id"),
        F.lit("quality").alias("stage"),
        F.explode("_gate.reasons").alias("reason"),
    )
    survivors = gated.filter(F.col("_gate.keep")).drop("_gate")

    # --- stage 2: exact dedup (one fingerprint shuffle) --------------
    fp = md5_i64(normalize_text(F.col(text_col)))
    with_fp = survivors.withColumn("_fp", fp)
    keepers = with_fp.groupBy("_fp").agg(F.min(id_col).alias("_keep_id"))
    exact_tagged = with_fp.join(keepers, "_fp")
    exact_drops = exact_tagged.filter(F.col(id_col) != F.col("_keep_id")).select(
        F.col(id_col).alias("id"),
        F.lit("exact_dup").alias("stage"),
        F.concat(F.lit("dup_of_"), F.col("_keep_id").cast("string")).alias("reason"),
    )
    exact_kept = exact_tagged.filter(F.col(id_col) == F.col("_keep_id")).drop(
        "_fp", "_keep_id"
    )

    # --- stage 3: near-dedup (MinHash -> LSH -> clusters) ------------
    sigs = minhash_signatures(
        exact_kept, text_col, id_col, **(minhash_kwargs or {"num_hashes": 16, "shingle_k": 3})
    )
    cand = minhash_dup_candidates(
        sigs, id_col, bands=bands, rows_per_band=rows_per_band, bucket_cap=bucket_cap
    )
    clusters = dedup_clusters(cand)
    if checkpoint_stages:
        # clusters is |clustered docs|-sized and feeds BOTH the final
        # anti-join and the drop report — checkpoint so the whole
        # signature+LSH chain doesn't re-run per consumer
        clusters = clusters.localCheckpoint(eager=False)
    if survivor_policy == "longest":
        from cerberus_spark.operators.graph import cluster_representatives

        reps = cluster_representatives(
            clusters.select("id", "cluster_id"),
            exact_kept.select(
                F.col(id_col), F.length(F.col(text_col)).alias("__q")
            ),
            id_col,
            "__q",
        )
        loser_rows = clusters.join(
            reps.select("cluster_id", "rep_id"), "cluster_id"
        ).filter(F.col("id") != F.col("rep_id"))
    elif survivor_policy == "min_id":
        loser_rows = clusters.filter(~F.col("keep"))
    else:
        raise ValueError(f"unknown survivor_policy: {survivor_policy!r}")
    losers = loser_rows.select(
        F.col("id"),
        F.lit("near_dup").alias("stage"),
        F.concat(F.lit("cluster_"), F.col("cluster_id").cast("string")).alias("reason"),
    )
    kept = exact_kept.join(
        losers.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )

    # --- stage 4 (optional): substring span removal ------------------
    # (Lee et al. 2022's substring pass: docs that SURVIVED doc-level
    # dedup may still share long verbatim runs — cut them from the
    # higher id; winnowing guarantees any shared run ≥ g+w−1 chars
    # produces a candidate pair)
    if substring_removal:
        from cerberus_spark.operators.winnow import (
            remove_shared_spans,
            winnow_candidates,
            winnow_fingerprints,
        )

        fps = winnow_fingerprints(kept, text_col, id_col, g=winnow_g, w=winnow_w)
        span_pairs = winnow_candidates(fps, id_col, bucket_cap=bucket_cap)
        kept = remove_shared_spans(kept, span_pairs, text_col, id_col, min_run=min_run)

    # --- stage 5 (optional): CCNet LM-quality bucket filter ----------
    lm_drops = None
    if lm_filter is not None:
        from cerberus_spark.functions.text import unigram_logprob_scores
        from cerberus_spark.operators.sample import quantile_buckets

        lf = dict(lm_filter)
        group_col = lf.pop("group_col", None)
        keep_buckets = tuple(lf.pop("keep_buckets", ("head", "middle")))
        cuts = tuple(lf.pop("cuts_permille", (333, 667)))
        labels = tuple(lf.pop("labels", ("head", "middle", "tail")))
        vocab_size = lf.pop("vocab_size", None)
        bigram_size = lf.pop("bigram_size", None)
        model = lf.pop("model", "unigram")
        if model != "bigram" and bigram_size is not None:
            raise ValueError("lm_filter bigram_size requires model='bigram'")
        if lf:
            raise ValueError(f"unknown lm_filter keys: {sorted(lf)}")
        if not set(keep_buckets) <= set(labels):
            raise ValueError(f"keep_buckets {keep_buckets} not all in labels {labels}")
        if checkpoint_stages:
            # kept feeds BOTH the LM count passes and the final output
            kept = kept.localCheckpoint(eager=False)
        if model == "unigram":
            scores = unigram_logprob_scores(
                kept, text_col, id_col, vocab_size=vocab_size
            )
            score_col = "unigram_nll"
        elif model == "bigram":
            # context-aware: separates prose from shuffled word salad
            # the order-blind unigram score cannot see
            from cerberus_spark.functions.text import bigram_logprob_scores

            scores = bigram_logprob_scores(
                kept, text_col, id_col,
                vocab_size=vocab_size, bigram_size=bigram_size,
            )
            score_col = "bigram_nll"
        else:
            raise ValueError(f"unknown lm_filter model: {model!r}")
        if group_col is not None:
            scores = scores.join(kept.select(id_col, group_col), id_col)
        buckets = quantile_buckets(
            scores, score_col, group_col=group_col,
            cuts_permille=cuts, labels=labels,
        )
        lm_drops = buckets.filter(~F.col("bucket").isin(*keep_buckets)).select(
            F.col(id_col).alias("id"),
            F.lit("lm_quality").alias("stage"),
            F.concat(F.lit("bucket_"), F.col("bucket")).alias("reason"),
        )
        kept = kept.join(
            lm_drops.select(F.col("id").alias(id_col)), id_col, "left_anti"
        )

    dropped = quality_drops.unionByName(exact_drops).unionByName(losers)
    if lm_drops is not None:
        dropped = dropped.unionByName(lm_drops)
    report = dropped.groupBy("stage", "reason").agg(F.count(F.lit(1)).alias("n_docs"))
    return {"kept": kept, "dropped": dropped, "report": report}


def ingest_corpus_increment(
    batch: DataFrame,
    work_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
    quality_kwargs: dict | None = None,
    minhash_kwargs: dict | None = None,
) -> None:
    """Incremental-ingest half of the pipeline: run the PER-DOCUMENT
    stages (normalize + quality gate + exact-dedup fingerprint + MinHash
    signature — all embarrassingly incremental, no corpus-level state)
    on one micro-batch and append the results to the work tables under
    ``work_dir`` (``gated/``, ``sigs/``, ``quality_drops/``).

    Designed as a ``foreachBatch`` sink:

        stream.writeStream.foreachBatch(
            lambda df, bid: ingest_corpus_increment(df, work_dir)
        ).trigger(availableNow=True).start()

    The corpus-LEVEL stages (exact-dup group-by, LSH banding,
    clustering) run over the ACCUMULATED tables in
    :func:`compact_corpus` — splitting the corpus across micro-batches
    therefore loses no duplicate pairs (test:
    ``test_incremental_corpus_matches_batch``).  foreachBatch is
    at-least-once on retry; production appends should be keyed by
    batchId (idempotent overwrite of a batch partition) — plumbing the
    driver's restart semantics is sink policy, not pipeline logic.
    """
    import os

    from cerberus_spark.functions.text import gopher_report_arrow, normalize_unicode
    from cerberus_spark.operators.dedup import (
        md5_i64,
        minhash_signatures,
        normalize_text,
    )

    base = batch
    if normalize:
        base = base.withColumn(text_col, normalize_unicode(text_col))
    # same Arrow gate as clean_corpus(arrow_gate=True) — parity-locked

    gated = (
        gopher_report_arrow(base, text_col, **(quality_kwargs or {}))
        .withColumn(
            "_gate",
            F.struct(F.col("keep").alias("keep"), F.col("reasons").alias("reasons")),
        )
        .drop("keep", "reasons")
        .localCheckpoint(eager=False)
    )

    gated.filter(~F.col("_gate.keep")).select(
        F.col(id_col).alias("id"),
        F.lit("quality").alias("stage"),
        F.explode("_gate.reasons").alias("reason"),
    ).write.mode("append").parquet(os.path.join(work_dir, "quality_drops"))

    survivors = (
        gated.filter(F.col("_gate.keep"))
        .drop("_gate")
        .withColumn("_fp", md5_i64(normalize_text(F.col(text_col))))
        .localCheckpoint(eager=False)
    )
    survivors.write.mode("append").parquet(os.path.join(work_dir, "gated"))
    minhash_signatures(
        survivors,
        text_col,
        id_col,
        **(minhash_kwargs or {"num_hashes": 16, "shingle_k": 3}),
    ).write.mode("append").parquet(os.path.join(work_dir, "sigs"))


def compact_corpus(
    spark,
    work_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 4,
    bucket_cap: int | None = 200,
) -> dict[str, DataFrame]:
    """Corpus-level half of the incremental pipeline: exact dedup +
    LSH near-dedup + clustering over the work tables accumulated by
    :func:`ingest_corpus_increment`.  Returns the same
    ``{kept, dropped, report}`` dict as :func:`clean_corpus` and, for
    the same total input, the same rows — signatures and fingerprints
    are per-document, so WHEN they were computed cannot change the
    group-bys they feed.  Run after ingest completes (availableNow) or
    periodically on a schedule (kept/dropped are snapshots of the
    corpus ingested so far).
    """
    import os

    from cerberus_spark.operators.dedup import minhash_dup_candidates
    from cerberus_spark.operators.graph import dedup_clusters

    gated = spark.read.parquet(os.path.join(work_dir, "gated"))
    quality_drops = spark.read.parquet(os.path.join(work_dir, "quality_drops"))

    keepers = gated.groupBy("_fp").agg(F.min(id_col).alias("_keep_id"))
    exact_tagged = gated.join(keepers, "_fp")
    exact_drops = exact_tagged.filter(F.col(id_col) != F.col("_keep_id")).select(
        F.col(id_col).alias("id"),
        F.lit("exact_dup").alias("stage"),
        F.concat(F.lit("dup_of_"), F.col("_keep_id").cast("string")).alias("reason"),
    )
    exact_kept = exact_tagged.filter(F.col(id_col) == F.col("_keep_id")).drop(
        "_fp", "_keep_id"
    )

    sigs = spark.read.parquet(os.path.join(work_dir, "sigs")).join(
        exact_kept.select(id_col), id_col, "left_semi"
    )
    cand = minhash_dup_candidates(
        sigs, id_col, bands=bands, rows_per_band=rows_per_band, bucket_cap=bucket_cap
    )
    clusters = dedup_clusters(cand).localCheckpoint(eager=False)
    losers = clusters.filter(~F.col("keep")).select(
        F.col("id"),
        F.lit("near_dup").alias("stage"),
        F.concat(F.lit("cluster_"), F.col("cluster_id").cast("string")).alias("reason"),
    )
    kept = exact_kept.join(
        losers.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )
    dropped = quality_drops.unionByName(exact_drops).unionByName(losers)
    report = dropped.groupBy("stage", "reason").agg(F.count(F.lit(1)).alias("n_docs"))
    return {"kept": kept, "dropped": dropped, "report": report}


def clean_transcripts(
    turns: DataFrame,
    conv_col: str,
    order_cols: list[str],
    state_col: str,
    ts_col: str,
    allowed: set[tuple[str, str]],
    allowed_first: set[str] | None = None,
    token_col: str | None = None,
    num_hashes: int = 16,
    shingle_k: int = 2,
    bands: int = 4,
    rows_per_band: int = 4,
    bucket_cap: int | None = 200,
    threshold: float = 0.5,
    checkpoint_stages: bool = True,
    survivor_policy: str = "min_id",
) -> dict[str, DataFrame]:
    """Transcript twin of :func:`clean_corpus`, at CONVERSATION
    granularity: health-gate -> conversation near-dedup -> keep/drop
    report, every stage an already oracle-gated operator.

    ``survivor_policy`` picks which member of every near-dup cluster
    keeps, mirroring :func:`clean_corpus`: ``"min_id"`` (default —
    positional min conversation key, ``dedup_clusters``' flag) or
    ``"longest"`` (the conversation with the MOST TURNS survives, ties
    to min key — via :func:`cluster_representatives`; costs one extra
    per-conversation turn count, a map-side-combined |convs|-row
    shuffle, only on this path).

    - stage 1 **health**: conversations with ANY sequence-structure
      violation (``checks.sequence.sequence_violations`` — transition
      grammar, NULL states, timestamp regressions, first-state; one
      window pass) are quarantined whole — the conversation-level
      analog of the corpus quality gate.
    - stage 2 **near_dup**: among HEALTHY conversations (dedup must not
      let a quarantined conversation steal survivorship), verified
      near-dup clusters (``sequence_neardup_pairs`` -> Jaccard >=
      ``threshold`` -> ``dedup_clusters``) keep their min-key member;
      every other member drops as ``cluster_loser``.  Exact sequence
      duplicates are a subcase (identical sequences share all bands and
      have Jaccard 1), so no separate exact stage is needed.

    Returns lazy DataFrames:

    - ``kept``: surviving TURNS (all input columns);
    - ``dropped``: (conv, stage, reason) — one row per (conversation,
      violated rule) for health, one per cluster loser for near_dup;
    - ``report``: (stage, reason, n_convs) — drop causes PLUS a
      ('kept', 'survivor', n) row, so the report is self-accounting:
      n_unhealthy + n_losers + n_kept = |convs| (health counts one
      conv under EVERY rule it violates, so sum the distinct-conv
      stage totals, not the per-reason rows).

    NULL conversation keys: the verdict anti-joins use plain (not
    NULL-safe) equality, so a NULL-keyed turn can never be quarantined
    or deduped — it always survives to ``kept`` and counts as one
    survivor conversation.  Validate/repair NULL keys upstream (the
    rule compiler's ``required`` does exactly this) if that is not the
    intent.

    Scale shape: ONE window pass over the corpus (health), one
    |turns|-keyed distinct for the conversation census, the capped
    near-dup chain over the healthy slice, and |convs|-sized joins for
    the verdicts; ``checkpoint_stages`` localCheckpoints the
    |violations|-sized health-drop frame because the lineage below
    branches FOUR ways (healthy filter, dropped rows, report counts,
    kept-conv census) — checkpointing at the drop rows (rather than
    the distinct-conv set derived from them) means every branch,
    including the ``dropped``/``report`` outputs, reads the single
    materialized window result instead of re-running the corpus sort
    per consumer.
    """
    from cerberus_spark.checks.sequence import sequence_violations
    from cerberus_spark.operators.dedup import sequence_neardup_pairs
    from cerberus_spark.operators.graph import dedup_clusters

    token_col = token_col or state_col
    conv = F.col(conv_col).alias("conv")

    # --- stage 1: conversation health gate (one window pass) ---------
    vio = sequence_violations(
        turns, conv_col, state_col, ts_col, order_cols, allowed, allowed_first
    )
    dropped_health = vio.select(conv, "rule").distinct().select(
        "conv", F.lit("health").alias("stage"), F.col("rule").alias("reason")
    )
    if checkpoint_stages:
        dropped_health = dropped_health.localCheckpoint(eager=False)
    unhealthy = dropped_health.select("conv").distinct()
    healthy_turns = turns.join(
        unhealthy, turns[conv_col] == unhealthy["conv"], "left_anti"
    )

    # --- stage 2: near-dup survivorship among healthy conversations --
    pairs = sequence_neardup_pairs(
        healthy_turns, conv_col, order_cols, token_col,
        num_hashes, shingle_k, bands, rows_per_band, bucket_cap, threshold,
        share_shingles=checkpoint_stages,
    )
    clusters = dedup_clusters(pairs)
    if survivor_policy == "longest":
        from cerberus_spark.operators.graph import cluster_representatives

        sizes = healthy_turns.groupBy(F.col(conv_col)).agg(
            F.count(F.lit(1)).alias("__q")
        )
        reps = cluster_representatives(
            clusters.select("id", "cluster_id"), sizes, conv_col, "__q"
        )
        loser_rows = clusters.join(
            reps.select("cluster_id", "rep_id"), "cluster_id"
        ).filter(F.col("id") != F.col("rep_id"))
    elif survivor_policy == "min_id":
        loser_rows = clusters.filter(~F.col("keep"))
    else:
        raise ValueError(f"unknown survivor_policy: {survivor_policy!r}")
    losers = loser_rows.select(F.col("id").alias("conv"))
    if checkpoint_stages:
        losers = losers.localCheckpoint(eager=False)
    dropped_dup = losers.select(
        "conv", F.lit("near_dup").alias("stage"), F.lit("cluster_loser").alias("reason")
    )

    kept = healthy_turns.join(
        losers, healthy_turns[conv_col] == losers["conv"], "left_anti"
    )
    dropped = dropped_health.unionByName(dropped_dup)

    kept_convs = (
        turns.select(conv).distinct()
        .join(unhealthy, "conv", "left_anti")
        .join(losers, "conv", "left_anti")
    )
    report = (
        dropped.groupBy("stage", "reason")
        .agg(F.count(F.lit(1)).alias("n_convs"))
        .unionByName(
            kept_convs.agg(F.count(F.lit(1)).alias("n_convs")).select(
                F.lit("kept").alias("stage"),
                F.lit("survivor").alias("reason"),
                "n_convs",
            )
        )
    )
    return {"kept": kept, "dropped": dropped, "report": report}


def ingest_transcript_increment(
    batch: DataFrame, work_dir: str, batch_id: int | None = None
) -> None:
    """Incremental-ingest half of the transcript pipeline: store one
    micro-batch of turns under ``<work_dir>/turns``.

    With ``batch_id`` (pass foreachBatch's second argument), the batch
    lands in its own ``batch_id=<n>`` partition directory with
    OVERWRITE semantics — a foreachBatch retry (at-least-once on
    failure) rewrites the same directory instead of appending a
    duplicate copy, so ingest is idempotent per batch.  Unlike the
    document pipeline (whose exact-dedup stage absorbs duplicated
    docs), duplicated TURNS corrupt the health gate — two copies of
    every turn manufacture self-transitions no grammar allows and
    quarantine every conversation — so transcript ingest must be
    idempotent, not merely at-least-once.  Without ``batch_id`` the
    batch appends flat (caller manages retries).
    :func:`compact_transcripts` drops the ``batch_id`` partition
    column it induces.

    Deliberately storage-only — unlike :func:`ingest_corpus_increment`
    (whose normalize / quality-gate / fingerprint / signature stages
    are all PER-DOCUMENT and therefore safely incremental), every
    transcript-cleaning stage is CONVERSATION-level and a conversation
    can span micro-batches: a turn's bigram shingle needs its ordered
    neighbor (which may arrive in a later batch), the health gate
    judges whole sequences, and survivorship needs the full
    conversation census.  Precomputing any of those per batch would
    bake in batch boundaries and break the replay ≡ batch guarantee,
    so the conversation stages all run in :func:`compact_transcripts`.

    Cross-RUN idempotency (not re-ingesting already-seen input files
    on the next scheduled run) is the stream's checkpoint's job — pass
    ``checkpointLocation`` on the writeStream (the CLI job pins it to
    ``<work_dir>/_checkpoint``).
    """
    import os

    turns = os.path.join(work_dir, "turns")
    if batch_id is None:
        batch.write.mode("append").parquet(turns)
    else:
        batch.write.mode("overwrite").parquet(
            os.path.join(turns, f"batch_id={int(batch_id)}")
        )


def compact_transcripts(
    spark,
    work_dir: str,
    conv_col: str,
    order_cols: list[str],
    state_col: str,
    ts_col: str,
    allowed: set[tuple[str, str]],
    allowed_first: set[str] | None = None,
    **clean_kwargs,
) -> dict[str, DataFrame]:
    """Conversation-level half of the incremental transcript pipeline:
    :func:`clean_transcripts` over the turns accumulated by
    :func:`ingest_transcript_increment`.  Same ``{kept, dropped,
    report}`` contract; for the same total input the same rows — no
    per-turn state was precomputed at ingest, so micro-batch slicing
    cannot influence any conversation-level decision (test:
    ``test_incremental_transcripts_match_batch``).  Run after ingest
    completes (availableNow) or on a schedule (outputs are snapshots
    of the corpus ingested so far).  The ``batch_id`` partition column
    induced by per-batch ingest directories is dropped — it is ingest
    bookkeeping, not an input column."""
    import os

    turns = spark.read.parquet(os.path.join(work_dir, "turns"))
    if "batch_id" in turns.columns:
        turns = turns.drop("batch_id")
    return clean_transcripts(
        turns, conv_col, order_cols, state_col, ts_col,
        allowed, allowed_first, **clean_kwargs,
    )
