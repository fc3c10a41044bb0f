"""Substring-level exact-duplicate detection via winnowing fingerprints
(the MOSS scheme; the Spark re-expression of Lee et al. 2022's
"Deduplicating Training Data Makes Language Models Better" substring
pass).

Character-level semantics the word-shingle family can't give: two
documents sharing ANY verbatim character run of at least
``g + w - 1`` characters are GUARANTEED to share a fingerprint —
inside such a run both documents contain ``w`` consecutive identical
g-gram hashes, so at least one full winnowing window has identical
content in both, and its minimum is the same value.  (Value-only
winnowing: we keep the distinct window-minimum VALUES, not their
positions — positions differ between the two documents, values don't,
and candidate generation only needs values.)

Scale shape:
- fingerprint extraction is Arrow `mapInPandas` — rolling hashes and
  sliding-window minima are vectorized NumPy per batch, no shuffle;
- a document's fingerprint count is ~``n_chars / ((w + 1) / 2)``
  distinct values at most — corpus blowup is bounded well below the
  raw gram count;
- candidate generation is the SAME capped-bucket shape as the LSH
  band join (`dedup.py:minhash_dup_candidates`): one shuffle on the
  fingerprint, bucket-local pair explosion, buckets over
  ``bucket_cap`` dropped whole BEFORE pair generation.

Two hash methods, one winnowing implementation:
- ``poly``  — the engine path: Karp-Rabin polynomial rolling hash in
  uint64 wraparound arithmetic, O(g) vectorized passes per batch;
- ``md5``   — the cross-engine path (63-bit md5 prefix per gram,
  `md5_i64` convention) so DuckDB can replay fingerprints exactly;
  slower, used by the oracle gate and available for audits.
The correctness of the guarantee itself is hypothesis-property-tested
(planted shared runs must collide, disjoint alphabets must not).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Karp-Rabin base (odd, large; arithmetic wraps mod 2^64)
_B = 1099511628211


def _codepoints(text: str):
    import numpy as np

    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)


def _poly_gram_hashes(text: str, g: int):
    """uint64 rolling hashes of every g-char gram — O(g) vectorized
    adds over the codepoint array, wraparound multiply."""
    import numpy as np

    c = _codepoints(text)
    n = len(c)
    if n < g:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        acc = np.zeros(n - g + 1, dtype=np.uint64)
        b = np.uint64(_B)
        for j in range(g):  # acc = Σ_j c[i+j] · B^(g-1-j)
            acc = acc * b + c[j : j + n - g + 1]
    return acc


def _md5_gram_hashes(text: str, g: int):
    """63-bit md5-prefix hash per gram (md5_i64 convention — DuckDB:
    ('0x'||substr(md5(substr(text,i,g)),1,15))::BIGINT)."""
    import hashlib

    import numpy as np

    n = len(text)
    if n < g:
        return np.empty(0, dtype=np.int64)
    return np.fromiter(
        (
            int(hashlib.md5(text[i : i + g].encode("utf-8")).hexdigest()[:15], 16)
            for i in range(n - g + 1)
        ),
        dtype=np.int64,
        count=n - g + 1,
    )


def _winnow_values(h, w: int):
    """Distinct window-minimum values.  Fewer grams than one window →
    the single minimum of what exists (mirrored by the clamped
    list_slice in the SQL twin)."""
    import numpy as np

    if len(h) == 0:
        return h
    if len(h) < w:
        return np.asarray([h.min()], dtype=h.dtype)
    from numpy.lib.stride_tricks import sliding_window_view

    return np.unique(sliding_window_view(h, w).min(axis=1))


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    g: int = 24,
    w: int = 8,
    method: str = "poly",
) -> DataFrame:
    """Distinct (id, fp) winnowing fingerprints per document.  Two
    documents sharing a verbatim run of ≥ ``g + w - 1`` chars share at
    least one ``fp``.  Documents shorter than ``g`` emit nothing."""
    import pandas as pd

    hash_fn = _poly_gram_hashes if method == "poly" else _md5_gram_hashes

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue  # empty pandas yields break the Arrow cast
            import numpy as np

            ids, fps = [], []
            for did, text in zip(b[id_col], b[text_col]):
                if text is None:
                    continue
                vals = _winnow_values(hash_fn(text, g), w)
                if vals.dtype == np.uint64:
                    # bit-reinterpret: poly hashes use the full 64 bits
                    vals = vals.view(np.int64)
                ids.extend([did] * len(vals))
                fps.extend(int(v) for v in vals)
            if not ids:
                continue
            yield pd.DataFrame({id_col: ids, "fp": pd.array(fps, dtype="int64")})

    id_t = docs.schema[id_col].dataType.simpleString()
    from cerberus_spark.sources.tables import spread

    return spread(docs.select(id_col, text_col)).mapInPandas(
        compute, schema=f"{id_col} {id_t}, fp long"
    )


def winnow_candidates(
    fps: DataFrame,
    id_col: str,
    bucket_cap: int | None = None,
) -> DataFrame:
    """(id_a, id_b, n_shared_fp) for documents sharing any winnowing
    fingerprint — one shuffle on ``fp``, bucket-local pair generation,
    buckets above ``bucket_cap`` dropped whole before pair explosion
    (the LSH df_cap trade: quadratic-skew protection for recall on
    that fingerprint only)."""
    buckets = (
        fps.groupBy("fp")
        .agg(F.sort_array(F.collect_set(F.col(id_col))).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if bucket_cap is not None:
        buckets = buckets.filter(F.size("ids") <= bucket_cap)
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
    return pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_shared_fp"))
