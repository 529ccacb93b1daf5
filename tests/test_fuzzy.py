"""Deletion-neighborhood fuzzy matching: exactness for distance <= 1,
edge cases, and the bucket cap."""

import itertools

from hiero_spark.functions.fuzzy import fuzzy_pairs_d1


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_exact_for_distance_one(spark):
    keys = [
        "cat", "cot", "cart", "ca", "cat", "dog", "dig", "dogs",
        "", "a", "ab", "ba", "xyz",
    ]
    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, ["kid", "key"])
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_pairs_d1(df, "key", "kid").collect()
    }
    want = {
        (i, j): _lev(a, b)
        for (i, a), (j, b) in itertools.combinations(enumerate(keys), 2)
        if _lev(a, b) <= 1
    }
    assert got == want
    # sanity: the plant includes every edit kind
    assert want[(0, 1)] == 1   # substitution cat/cot
    assert want[(0, 2)] == 1   # insertion cat/cart
    assert want[(0, 3)] == 1   # deletion cat/ca
    assert want[(0, 4)] == 0   # exact dup
    assert want[(8, 9)] == 1   # empty vs one char


def test_bucket_cap_drops_degenerate_variants(spark):
    # 30 keys one deletion from "aa" — with max_bucket=5 the hot variant
    # buckets are dropped and few/no pairs survive; with the default cap
    # all 435 pairs appear
    rows = [(i, "aa") for i in range(30)]
    df = spark.createDataFrame(rows, ["kid", "key"])
    assert fuzzy_pairs_d1(df, "key", "kid").count() == 435
    assert fuzzy_pairs_d1(df, "key", "kid", max_bucket=5).count() == 0
