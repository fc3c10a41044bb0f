"""Deduplication operators: first-occurrence, exact, MinHash+LSH,
SimHash, n-gram Jaccard.

First-occurrence dedup is the reference's SeenPatterns semantics
(internal/monitor/monitor.go:370-395: emit a pattern only the first
time a device exhibits it).  The rest are the training-data-pipeline
near-dup family, built entirely from deterministic md5-derived hashes
so results are engine-independent (the DuckDB oracle reproduces them
bit-for-bit; Spark's xxhash64/hash are seeded differently from other
engines, so we never use them for cross-engine-checked results).

Scale notes:
- shingling/minhashing is per-row columnar work (higher-order array
  functions -> codegen), no shuffle;
- LSH banding turns O(n²) pair generation into a groupBy on band
  signatures — one shuffle whose key cardinality is ~n·bands/row;
- candidate verification joins only within buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# deterministic cross-engine hashing
# ---------------------------------------------------------------------------

def md5_i64(col: Column, seed: int = 0) -> Column:
    """Stable 63-bit positive int from md5 — reproducible in any engine
    with md5 + hex parse (DuckDB: ('0x'||substr(md5(x),1,15))::BIGINT)."""
    src = F.concat(col, F.lit(f"#{seed}")) if seed else col
    return F.conv(F.substring(F.md5(src), 1, 15), 16, 10).cast("long")


def normalize_text(col: Column) -> Column:
    """Canonical text form for fingerprinting: lowercase, collapse
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """Exact-dup document fingerprint: md5 of normalized text."""
    return F.md5(normalize_text(col))


# ---------------------------------------------------------------------------
# first-occurrence / exact
# ---------------------------------------------------------------------------

def first_occurrence(
    df: DataFrame, keys: list[str], order_by: list[str]
) -> DataFrame:
    """Keep only the first row per key under a deterministic order —
    the batch analog of SeenPatterns first-sighting alerts
    (monitor.go:370-395), made deterministic (the reference's in-memory
    set is arrival-order dependent)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of exact duplicates by normalized-text fingerprint:
    (fp, n_docs, keep_id) where keep_id is the smallest id (the
    canonical survivor).  One shuffle on the 128-bit fingerprint."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------

def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of normalized text (array<string>).

    Built with higher-order array functions only — evaluated inside
    codegen, no Python.
    """
    words = F.split(normalize_text(col), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx,
        lambda i: F.array_join(F.slice(words, i + 1, k), " "),
    )
    return F.array_distinct(F.when(n >= k, sh).otherwise(F.array()))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

#: Mersenne prime 2^31−1: a*h+b stays < 2^62, so the arithmetic is
#: overflow-free int64 in EVERY engine (DuckDB raises on bigint
#: overflow; Java silently wraps — we must never rely on either).
MINHASH_P = 2_147_483_647


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) pairs for the universal hash family
    h_j(x) = (a_j·x + b_j) mod P — fixed constants, identical in the
    Spark plan and the oracle SQL."""
    out = []
    for j in range(num_hashes):
        a = (2_654_435_761 * (j + 1)) % MINHASH_P or 1
        b = (40_503 * (j + 1) + 17) % MINHASH_P
        out.append((a, b))
    return out


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_k: int = 3,
    impl: str = "arrow",
) -> DataFrame:
    """(id, sig: array<long>) — sig[j] = min over shingles of
    (a_j·md5_i64(shingle) + b_j) mod P.

    One md5 per shingle (the expensive op), then ``num_hashes`` cheap
    multiply-add derivations — the classic universal-hash MinHash
    construction.  Deterministic across engines (md5-derived; never
    Spark-seeded hash/xxhash64), and BIT-IDENTICAL between the two
    impls (tests/test_dedup.py asserts it):

    - ``impl="arrow"`` (default): Arrow-batched ``mapInPandas`` —
      shingling + hashlib.md5 in vectorized Python.  ~15x faster than
      the columnar form because Catalyst evaluates higher-order array
      functions interpreted, not codegen'd.
    - ``impl="columnar"``: pure Catalyst expressions (zero Python), for
      plans that must stay whole-JVM (e.g. inside a larger codegen'd
      select).  A repartition barrier between the shingle-hash array
      and the per-seed minima stops CollapseProject from inlining the
      md5 work ``num_hashes`` times.
    """
    if impl == "arrow":
        return _minhash_signatures_arrow(df, text_col, id_col, num_hashes, shingle_k)
    sh = word_shingles(F.col(text_col), shingle_k).alias("sh")
    hs = F.transform(
        F.col("sh"),
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
            F.lit(MINHASH_P),
        ),
    ).alias("hs")

    def deriver(a: int, b: int):
        # factory (not default-arg lambda): F.transform inspects the
        # callable's arity, so the lambda must take exactly one param
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(MINHASH_P))

    sig_cols = [
        F.array_min(F.transform(F.col("hs"), deriver(a, b))).alias(f"h{j}")
        for j, (a, b) in enumerate(minhash_coeffs(num_hashes))
    ]
    base = df.select(F.col(id_col), sh).filter(F.size("sh") > 0).select(F.col(id_col), hs)
    # shuffle barrier: materializes hs ONCE (CollapseProject would
    # otherwise substitute the md5-transform into all num_hashes
    # array_min expressions, multiplying the md5 work by num_hashes)
    barrier = base.repartition(df.sparkSession.sparkContext.defaultParallelism * 2)
    return barrier.select(F.col(id_col), F.array(*sig_cols).alias("sig"))


def _minhash_signatures_arrow(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int, shingle_k: int
) -> DataFrame:
    """Arrow-batched twin of the columnar MinHash (same normalize/
    shingle/md5 pipeline, numpy for the (a·h+b) mod P minima)."""
    import hashlib
    import re as _re

    import numpy as np
    import pandas as pd

    coeffs = minhash_coeffs(num_hashes)
    a_vec = np.array([a for a, _ in coeffs], dtype=np.int64)
    b_vec = np.array([b for _, b in coeffs], dtype=np.int64)
    k = shingle_k
    ws_re = _re.compile(r"\s+")
    id_field = df.schema[id_col]

    def compute(batches):
        for pdf in batches:
            ids, sigs = [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                words = ws_re.sub(" ", text.lower()).strip().split(" ")
                if len(words) < k:
                    continue
                shingles = {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}
                hs = np.fromiter(
                    (
                        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P
                        for s in shingles
                    ),
                    dtype=np.int64,
                    count=len(shingles),
                )
                sigs.append(((hs[:, None] * a_vec + b_vec) % MINHASH_P).min(axis=0).tolist())
                ids.append(rid)
            if ids:  # empty frames infer float64 cols -> Arrow cast error
                yield pd.DataFrame(
                    {id_col: pd.Series(ids, dtype=object), "sig": pd.Series(sigs, dtype=object)}
                )

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [id_field, T.StructField("sig", T.ArrayType(T.LongType()), False)]
    )
    from cerberus_spark.sources.tables import spread

    return spread(df.select(id_col, text_col)).mapInPandas(compute, schema=out_schema)


def minhash_dup_candidates(
    sigs: DataFrame,
    id_col: str,
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: ids sharing any full band of their signature.

    explode bands -> groupBy (band_idx, band_sig) -> emit candidate
    pairs (a<b).  Output: (id_a, id_b, n_bands_shared).  The groupBy
    key is the band signature string — one shuffle, bucket-local pair
    generation (never a global cross join).
    """
    band_structs = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.array_join(
                F.transform(
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                    lambda x: x.cast("string"),
                ),
                "_",
            ).alias("band_sig"),
        )
        for b in range(bands)
    ]
    exploded = sigs.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("b")
    ).select(id_col, "b.band_idx", "b.band_sig")
    buckets = (
        exploded.groupBy("band_idx", "band_sig")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    # pair generation inside each bucket via nested transform+flatten
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.size("ids") - 2),
                    lambda i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size("ids")),
                        lambda y: F.struct(
                            F.element_at(F.col("ids"), i + 1).alias("id_a"),
                            y.alias("id_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    return pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_bands_shared"))


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

def shingle_hash_rows(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Exploded (id, n_sh, shingle) rows with shingle = 63-bit md5 —
    Arrow-batched (same normalize/shingle/md5 as the columnar path;
    Catalyst's interpreted higher-order functions lose to vectorized
    Python by ~10x on shingling, and this runs the subtree once even
    when consumed twice by a self-join)."""
    import hashlib
    import re as _re

    import pandas as pd

    ws_re = _re.compile(r"\s+")
    id_field = df.schema[id_col]

    def compute(batches):
        for pdf in batches:
            ids, ns, hs = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                words = ws_re.sub(" ", text.lower()).strip().split(" ")
                if len(words) < k:
                    continue
                shingles = {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}
                for s in shingles:
                    ids.append(rid)
                    ns.append(len(shingles))
                    hs.append(int(hashlib.md5(s.encode()).hexdigest()[:15], 16))
            if ids:
                yield pd.DataFrame(
                    {
                        "id": pd.Series(ids, dtype=object),
                        "n_sh": pd.Series(ns, dtype="int32"),
                        "shingle": pd.Series(hs, dtype="int64"),
                    }
                )

    from pyspark.sql import types as T

    from cerberus_spark.sources.tables import spread

    out_schema = T.StructType(
        [
            T.StructField("id", id_field.dataType, id_field.nullable),
            T.StructField("n_sh", T.IntegerType(), False),
            T.StructField("shingle", T.LongType(), False),
        ]
    )
    return spread(df.select(id_col, text_col)).mapInPandas(compute, schema=out_schema)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.8,
    impl: str = "arrow",
) -> DataFrame:
    """Exact Jaccard over k-word shingles for all pairs sharing ≥1
    shingle: (id_a, id_b, jaccard).

    explode shingles -> self-equi-join on shingle -> count shared ->
    |A∪B| = |A|+|B|−shared.  The join key is the 63-bit md5 of the
    shingle, not the string — ~3x less shuffle volume, same pairs (and
    any astronomically-unlikely collision is reproduced identically by
    the oracle, which joins on the same hash).  Only documents with
    overlap ever meet; at 100 TB add a document-frequency cap on
    shingles (stop-shingle removal) to bound the hottest keys.
    """
    if impl == "arrow":
        # n_sh rides along on every exploded row, so the sizes join
        # disappears: one self-join + one aggregation total
        ex = shingle_hash_rows(df, text_col, id_col, k)
    else:
        base = df.select(
            F.col(id_col).alias("id"), word_shingles(F.col(text_col), k).alias("sh")
        ).filter(F.size("sh") > 0)
        ex = base.select(
            "id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle_s")
        ).select("id", "n_sh", md5_i64(F.col("shingle_s")).alias("shingle"))
    a = ex.alias("a")
    b = ex.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.withColumn(
            "jaccard",
            F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(col: Column, shingle_k: int = 2, n_bits: int = 60) -> Column:
    """SimHash (60-bit by default, fits md5_i64's range) over word
    shingles, pure columnar.

    For each bit b: result bit b = 1 iff
    Σ_shingles (bit b of md5_i64(shingle) ? +1 : −1) > 0.
    aggregate() over the shingle array accumulates an n_bits-long
    counter array against a LITERAL bitmask array (bit tests are
    Column-vs-Column bitwiseAND — no per-bit shift-by-column, which
    Spark lacks), then zip_with folds counters back into one long.
    Deterministic, engine-portable (md5-based).
    """
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(n_bits)])
    sh = word_shingles(col, shingle_k)
    hashes = F.transform(sh, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"))
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), n_bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                masks,
                lambda m: F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)).cast("long"),
            ),
            lambda a, d: a + d,
        ),
    )
    bits = F.zip_with(
        counts, masks, lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x))


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash64 values."""
    return F.bit_count(a.bitwiseXOR(b))
