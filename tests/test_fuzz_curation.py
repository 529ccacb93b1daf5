"""Differential fuzzing for the round-6 curation operators, against
independent PYTHON reference implementations (not the DuckDB mirrors —
a mirrored formula can mirror a bug; a second implementation in a
different paradigm cannot share the same mistake by accident).

Covers: fuzzy edit-distance-1 pairs (exactness), keep-first line dedup
(keep-exactly-once + first-occurrence), char entropy (value + bounds),
and ExactSubstr span removal (full output equality vs a reference)."""

import math

from hypothesis import HealthCheck, example, given, settings, strategies as st
from pyspark.sql import functions as F

from hiero_spark.functions.entropy import char_entropy
from hiero_spark.functions.fuzzy import fuzzy_pairs_d1
from hiero_spark.functions.paragraphs import dedup_lines_keep_first
from hiero_spark.functions.spans import remove_repeated_spans

_FUZZ = dict(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(**_FUZZ)
@given(keys=st.lists(st.text(alphabet="abc", min_size=0, max_size=6), min_size=2, max_size=10))
@example(keys=["", "a", "aa", "ab", "ba", "ab"])
def test_fuzzy_pairs_exact_for_d1(spark, keys):
    df = spark.createDataFrame(list(enumerate(keys)), ["kid", "key"])
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_pairs_d1(df, "key", "kid").collect()
    }
    want = {
        (i, j): _lev(keys[i], keys[j])
        for i in range(len(keys))
        for j in range(i + 1, len(keys))
        if _lev(keys[i], keys[j]) <= 1
    }
    assert got == want


@settings(**_FUZZ)
@given(
    docs=st.lists(
        st.text(alphabet="xy\nz", min_size=0, max_size=20), min_size=1, max_size=6
    )
)
@example(docs=["a\nb\na", "b\nc", "c"])
def test_line_dedup_reference(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["new_text"], r["n_kept"])
        for r in dedup_lines_keep_first(df, "text", "doc_id").collect()
    }
    # python reference: first (doc, pos) occurrence of each line survives
    seen, want = set(), {}
    for i, d in enumerate(docs):
        kept = []
        for line in d.split("\n"):
            if line not in seen:
                seen.add(line)
                kept.append(line)
        if kept:
            want[i] = ("\n".join(kept), len(kept))
    assert got == want


@settings(**_FUZZ)
@given(texts=st.lists(st.text(alphabet="ab 中\t", max_size=40), min_size=1, max_size=5))
@example(texts=["", "aaaa", "ab", "abca"])
def test_char_entropy_reference(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["i", "t"])
    got = {
        r["i"]: r["h"]
        for r in df.select("i", char_entropy(F.col("t")).alias("h")).collect()
    }
    for i, t in enumerate(texts):
        if not t:
            assert got[i] == 0.0
            continue
        counts = {}
        for ch in t:
            counts[ch] = counts.get(ch, 0) + 1
        n = len(t)
        want = -sum((c / n) * math.log2(c / n) for c in counts.values())
        assert abs(got[i] - want) < 1e-6
        assert 0.0 <= got[i] <= math.log2(len(counts)) + 1e-6


@settings(**_FUZZ)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["u", "v", "w"]), min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=5,
    )
)
@example(docs=["u v u v u", "v u v", "w"])
def test_span_removal_reference(spark, docs):
    k = 3
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_repeated_spans(df, "text", "doc_id", k=k).collect()
    }
    # reference: global first-occurrence per k-gram; later occurrences
    # mark their k token positions covered
    # Spark's split(trim(''), '\s+') yields [''] — mirror that
    tok_docs = []
    for d in docs:
        t = d.strip().lower()
        tok_docs.append(t.split() if t else [""])
    first = {}
    covered = {i: set() for i in range(len(docs))}
    for i, toks in enumerate(tok_docs):
        for p in range(len(toks) - k + 1):
            g = " ".join(toks[p : p + k])
            if g not in first:
                first[g] = (i, p)
            elif first[g] != (i, p):
                covered[i].update(range(p, p + k))
    for i, toks in enumerate(tok_docs):
        keep = [t for p, t in enumerate(toks) if p not in covered[i]]
        assert got[i] == (" ".join(keep), len(covered[i])), (i, docs)
