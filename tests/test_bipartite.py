"""Bipartite projection + butterfly counting vs brute-force ground truth."""

import itertools

import numpy as np
import pytest

from minigraph_spark.operators.bipartite import butterfly_count, cooccurrence


def _random_bip(n_left=40, n_right=25, n_edges=300, seed=7):
    rng = np.random.default_rng(seed)
    pairs = {
        (int(rng.integers(0, n_left)), int(rng.integers(0, n_right)))
        for _ in range(n_edges)
    }
    return sorted(pairs)


def _brute_cooc(pairs):
    right_of = {}
    for l, r in pairs:
        right_of.setdefault(l, set()).add(r)
    out = {}
    for a, b in itertools.combinations(sorted(right_of), 2):
        c = len(right_of[a] & right_of[b])
        if c:
            out[(a, b)] = c
    return out


def _spark_bip(spark, pairs):
    return spark.createDataFrame(pairs, "u long, it long")


def test_cooccurrence_matches_brute(spark):
    pairs = _random_bip()
    want = _brute_cooc(pairs)
    got = {
        (r["a"], r["b"]): r["shared"]
        for r in cooccurrence(_spark_bip(spark, pairs), "u", "it").collect()
    }
    assert got == want


def test_cooccurrence_min_shared_and_buckets(spark):
    pairs = _random_bip(seed=11)
    want = {k: v for k, v in _brute_cooc(pairs).items() if v >= 3}
    got = {
        (r["a"], r["b"]): r["shared"]
        for r in cooccurrence(
            _spark_bip(spark, pairs), "u", "it", min_shared=3, center_buckets=3
        ).collect()
    }
    assert got == want


def test_cooccurrence_hub_cap_drops_hub_centers(spark):
    # a hub right-vertex adjacent to every left vertex; capping below its
    # degree removes exactly its wedge contribution
    pairs = [(l, 0) for l in range(10)] + [(0, 1), (1, 1), (2, 2), (3, 2)]
    want = _brute_cooc([p for p in pairs if p[1] != 0])
    got = {
        (r["a"], r["b"]): r["shared"]
        for r in cooccurrence(
            _spark_bip(spark, pairs), "u", "it", max_center_degree=5
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("center", ["auto", "left", "right"])
def test_butterfly_count_matches_brute(spark, center):
    pairs = _random_bip(seed=13)
    cooc = _brute_cooc(pairs)
    want = sum(c * (c - 1) // 2 for c in cooc.values())
    got = butterfly_count(
        _spark_bip(spark, pairs), "u", "it", center=center
    ).collect()[0]["num_butterflies"]
    assert got == want


def test_butterfly_count_bucketed_and_dedup(spark):
    pairs = _random_bip(seed=17)
    want = sum(
        c * (c - 1) // 2 for c in _brute_cooc(pairs).values()
    )
    dup = pairs + pairs[: len(pairs) // 2]  # duplicates must not double-count
    got = butterfly_count(
        _spark_bip(spark, dup), "u", "it", center_buckets=2
    ).collect()[0]["num_butterflies"]
    assert got == want


def test_butterfly_count_empty_and_no_butterflies(spark):
    assert (
        butterfly_count(
            spark.createDataFrame([], "u long, it long"), "u", "it"
        ).collect()[0]["num_butterflies"]
        == 0
    )
    # a star has wedges but no K_{2,2}
    star = [(l, 0) for l in range(5)]
    assert (
        butterfly_count(_spark_bip(spark, star), "u", "it").collect()[0][
            "num_butterflies"
        ]
        == 0
    )


def test_cooccurrence_jaccard_matches_brute(spark):
    pairs = _random_bip(seed=13)
    right_of = {}
    for l, r in pairs:
        right_of.setdefault(l, set()).add(r)
    want = {
        (a, b): len(right_of[a] & right_of[b])
        / len(right_of[a] | right_of[b])
        for a, b in itertools.combinations(sorted(right_of), 2)
        if right_of[a] & right_of[b]
    }
    rows = cooccurrence(
        _spark_bip(spark, pairs), "u", "it", normalize="jaccard"
    ).collect()
    got = {(r["a"], r["b"]): r["jaccard"] for r in rows}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k
    # shared column still present and consistent with jaccard's numerator
    for r in rows:
        assert r["shared"] == len(right_of[r["a"]] & right_of[r["b"]])


def test_cooccurrence_normalize_validates(spark):
    with pytest.raises(ValueError):
        cooccurrence(_spark_bip(spark, [(1, 2)]), "u", "it", normalize="x")
