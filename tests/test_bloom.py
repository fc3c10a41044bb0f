"""Bloom membership: no false negatives, FP bound, partition-layout
independence, exact semi-join equivalence."""

from __future__ import annotations

import pytest

from cerberus_spark.operators.bloom import (
    _params,
    bloom_filter_rows,
    bloom_semi_join,
    build_bloom,
)


@pytest.fixture(scope="module")
def keyset(spark):
    return spark.createDataFrame(
        [(f"key_{i}",) for i in range(0, 2000, 2)], "k string"  # evens
    )


@pytest.fixture(scope="module")
def bloom(keyset):
    return build_bloom(keyset, "k", capacity=1000, fp_rate=0.01)


def test_no_false_negatives(spark, keyset, bloom):
    members = spark.createDataFrame([(f"key_{i}",) for i in range(0, 2000, 2)], "k string")
    assert bloom_filter_rows(members, "k", bloom).count() == 1000


def test_false_positive_rate_bounded(spark, bloom):
    # 10k keys NOT in the filter (odds + out-of-range): expect ~1% FP,
    # assert a generous 3x envelope so the test never flakes
    non = spark.createDataFrame(
        [(f"key_{i}",) for i in range(1, 2000, 2)]
        + [(f"other_{i}",) for i in range(9000)],
        "k string",
    )
    fp = bloom_filter_rows(non, "k", bloom).count()
    assert fp / 10000 < 0.03


def test_partition_layout_independence(spark, keyset):
    b1 = build_bloom(keyset.repartition(1), "k", capacity=1000)
    b8 = build_bloom(keyset.repartition(8), "k", capacity=1000)
    assert b1 == b8  # OR is associative/commutative — same bits


def test_nulls_never_enter_or_match(spark, keyset):
    with_null = spark.createDataFrame([("key_0",), (None,)], "k string")
    bloom = build_bloom(with_null, "k", capacity=64)
    got = bloom_filter_rows(with_null, "k", bloom).collect()
    assert [r.k for r in got] == ["key_0"]


def test_bloom_semi_join_is_exact(spark, keyset):
    big = spark.createDataFrame(
        [(i, f"key_{i % 3000}") for i in range(6000)], "id long, k string"
    )
    got = bloom_semi_join(big, keyset, "k", capacity=1000)
    want = big.join(keyset, on="k", how="left_semi")
    assert sorted(r.id for r in got.collect()) == sorted(r.id for r in want.collect())


def test_params_sane():
    m, k = _params(1000, 0.01)
    assert m % 64 == 0 and m >= 9000  # ~9.6 bits/key at 1%
    assert 5 <= k <= 10


def test_blob_header_carries_geometry(spark, keyset):
    """Probe geometry comes from the blob — a filter built with ANY
    capacity/fp_rate probes correctly with no params to mismatch."""
    from cerberus_spark.operators.bloom import _unpack

    small = build_bloom(keyset, "k", capacity=100, fp_rate=0.2)
    m, k, bits = _unpack(small)
    assert m == len(bits) * 64 and k >= 1
    members = spark.createDataFrame([(f"key_{i}",) for i in range(0, 2000, 2)], "k string")
    assert bloom_filter_rows(members, "k", small).count() == 1000  # still no FNs
