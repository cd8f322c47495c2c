"""Property-based tests (hypothesis) — the reference's tolerance/property
test style (SURVEY.md §5.1) applied to our operators: invariants that
must hold for ANY input, not just the fixtures."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dask_cuml_spark.operators.merge import merge_upsert
from dask_cuml_spark.operators.preprocessing import train_test_split


# One shared moderate example budget: each example spins Spark jobs.
SETTINGS = settings(max_examples=10, deadline=None)


@st.composite
def id_value_rows(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    ids = draw(
        st.lists(
            st.integers(min_value=0, max_value=100),
            min_size=n,
            max_size=n,
            unique=True,
        )
    )
    vals = draw(
        st.lists(
            st.floats(
                min_value=-1e6, max_value=1e6, allow_nan=False, width=64
            ),
            min_size=n,
            max_size=n,
        )
    )
    return list(zip(ids, vals))


@SETTINGS
@given(target=id_value_rows(), updates=id_value_rows())
def test_merge_upsert_properties(spark, target, updates):
    t = spark.createDataFrame(target, ["k", "v"])
    u = spark.createDataFrame(updates, ["k", "v"])
    out = {r["k"]: r["v"] for r in merge_upsert(t, u, "k", ["v"]).collect()}
    t_map, u_map = dict(target), dict(updates)
    # key set = union; updates win on collision; others unchanged
    assert set(out) == set(t_map) | set(u_map)
    for k, v in out.items():
        expect = u_map.get(k, t_map.get(k))
        assert (v == expect) or (math.isnan(v) and math.isnan(expect)), (k, v, expect)


@SETTINGS
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=50,
        unique=True,
    ),
    frac=st.floats(min_value=0.1, max_value=0.9),
)
def test_train_test_split_partition_property(spark, ids, frac):
    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    train, test = train_test_split(df, "id", frac, seed=7)
    tr = {r["id"] for r in train.collect()}
    te = {r["id"] for r in test.collect()}
    # exact partition: disjoint and covering, for any id set and fraction
    assert tr | te == set(ids)
    assert tr & te == set()


@SETTINGS
@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_gemm_threshold_keeps_all_qualifying_pairs(spark, vecs):
    """pairwise_similarity_above must agree with a numpy reference on
    arbitrary vectors (not just unit-norm fixtures)."""
    from dask_cuml_spark.operators.gemm import pairwise_similarity_above

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        (r["id_a"], r["id_b"])
        for r in pairwise_similarity_above(df, threshold=1.0).collect()
    }
    M = np.array([v for _, v in rows], dtype=np.float64)
    sims = M @ M.T
    expect = {
        (i, j)
        for i in range(len(vecs))
        for j in range(i + 1, len(vecs))
        if sims[i, j] >= 1.0
    }
    assert got == expect


def test_gemm_filter_sliced_equals_unsliced():
    """The A-row slicing that bounds the dense sims buffer (64 MB cap;
    the first 100× q77 run OOM-killed the JVM without it) must not
    change results. Production slice size is far above any test block,
    so force slicing by shrinking the cap below the block size."""
    import dask_cuml_spark.operators.gemm as g

    rng = np.random.default_rng(7)
    a_ids = np.arange(37, dtype=np.int64)
    b_ids = np.arange(20, 73, dtype=np.int64)  # overlap for triangle mask
    A = rng.standard_normal((37, 8))
    B = rng.standard_normal((53, 8))
    for tri in (False, True):
        whole = g._gemm_filter(a_ids, A, b_ids, B, 0.5, tri)
        saved = g._GEMM_SLICE_ELEMS
        g._GEMM_SLICE_ELEMS = 5 * len(b_ids)  # 5 A-rows per slice
        try:
            sliced = g._gemm_filter(a_ids, A, b_ids, B, 0.5, tri)
        finally:
            g._GEMM_SLICE_ELEMS = saved
        key = ["id_a", "id_b"]
        w = whole.sort_values(key).reset_index(drop=True)
        s = sliced.sort_values(key).reset_index(drop=True)
        # ids exact; sims to BLAS summation-order tolerance (the module
        # docstring's documented ~1e-12 relative error contract)
        assert w[key].equals(s[key])
        assert np.allclose(w["sim"], s["sim"], rtol=1e-12, atol=1e-12)


@SETTINGS
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta eps zeta kappa mu nu xi".split()),
            min_size=1,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_simhash_swar_matches_naive_bit_votes(spark, docs):
    """The SWAR-packed 16-lane aggregation must reproduce the naive
    per-bit ±1 majority vote for ANY token multiset (the packing is the
    subtle part: lane extraction, tie handling via 2c>n, bit-63 sign)."""
    import pandas as pd

    from dask_cuml_spark.operators.dedup import simhash

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.simhash for r in simhash(df).collect()}

    # naive reference using Spark's own xxhash64 for the token hashes
    tok = (
        df.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .withColumn("h", F.xxhash64("t"))
        .toPandas()
    )
    for doc_id, grp in tok.groupby("doc_id"):
        hs = grp["h"].to_numpy().astype(np.uint64)
        sig = 0
        n = len(hs)
        for bit in range(64):
            ones = int(((hs >> np.uint64(bit)) & np.uint64(1)).sum())
            if 2 * ones > n:  # vote = 2*ones - n > 0
                sig |= 1 << bit
        # to signed 64-bit
        if sig >= 1 << 63:
            sig -= 1 << 64
        assert got[doc_id] == sig, (doc_id, got[doc_id], sig)


@given(
    texts=st.lists(
        st.text(
            alphabet="ab xyz",  # spaces included → multi-word shapes
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(min_value=2, max_value=4),
)
@settings(deadline=None, max_examples=25)
def test_char_ngrams_matches_python_reference(spark, texts, n):
    """The index-explode n-gram formulation must emit exactly the
    overlapping substrings, with multiplicity, in any alphabet —
    including texts shorter than n (no rows) and runs of spaces
    (n-grams span word boundaries by design: Cavnar-Trenkle profiles
    keep boundary grams)."""
    from dask_cuml_spark.operators.langid import char_ngrams

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r.doc_id, r.ngram)
        for r in char_ngrams(df, "text", n=n).collect()
    )
    want = sorted(
        (i, t[j : j + n])
        for i, t in rows
        for j in range(max(len(t) - n + 1, 0))
    )
    assert got == want


@given(
    texts=st.lists(
        st.text(alphabet="abc xy", min_size=3, max_size=24),
        min_size=2,
        max_size=8,
    )
)
@settings(deadline=None, max_examples=15)
def test_langid_pivot_equals_join_strategy(spark, texts):
    """classify's two physical strategies (driver-collected INSET pivot
    vs broadcast-join + argmax window) must agree on every prediction
    and score for ANY corpus, including all-tie and no-hit documents."""
    from dask_cuml_spark.operators.langid import (
        build_profiles,
        char_ngrams,
        classify,
    )

    rows = [(i, t, "l" + str(i % 2)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    tri = char_ngrams(df, "text", n=3, keep_cols=("doc_id", "lang"))
    prof = build_profiles(tri, "lang", topk=5)
    a = sorted(map(tuple, classify(tri, prof, strategy="join").collect()))
    b = sorted(map(tuple, classify(tri, prof, strategy="pivot").collect()))
    assert a == b


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("aa b ccc dd e ff".split()),
            min_size=1,
            max_size=12,
        ),
        min_size=2,
        max_size=6,
    ),
    n=st.integers(min_value=2, max_value=4),
)
@settings(deadline=None, max_examples=20)
def test_hashed_shingles_jaccard_property(spark, docs, n):
    """For ANY corpus and shingle width, the codegen hashed-shingle sets
    must induce the same pairwise Jaccard as the string shingle sets —
    the whole MinHash verify stage rests on this equivalence."""
    from itertools import combinations

    from dask_cuml_spark.operators.dedup import hashed_shingles, shingles

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def pairwise(frame):
        sets = {r.doc_id: frozenset(r.shingles) for r in frame.collect()}
        return {
            (i, j): len(sets[i] & sets[j]) / len(sets[i] | sets[j])
            for i, j in combinations(sorted(sets), 2)
        }

    assert pairwise(
        shingles(df, "text", n).select("doc_id", "shingles")
    ) == pairwise(
        hashed_shingles(df, "text", n).select("doc_id", "shingles")
    )


def test_binhash_pack_roundtrip_property():
    """pack_bits is a bijection on bit matrices: unpacking the packed
    int64 words (little-endian bit order) reproduces every bit, for
    arbitrary widths that are multiples of 64."""
    import numpy as np

    from dask_cuml_spark.operators.binhash import pack_bits

    rng = np.random.default_rng(11)
    for nbits in (64, 128, 256):
        bits = rng.integers(0, 2, size=(37, nbits)).astype(bool)
        packed = pack_bits(bits)
        assert packed.shape == (37, nbits // 64)
        unpacked = np.unpackbits(
            packed.view(np.uint8), axis=1, bitorder="little"
        ).astype(bool)
        assert (unpacked == bits).all()


def test_stratified_split_proportion_property(spark):
    """For arbitrary stratum sizes, every stratum contributes exactly
    (num·n) div den train rows — the exact-proportion contract, under
    several rationals."""
    from pyspark.sql import functions as F

    from dask_cuml_spark.operators.preprocessing import (
        stratified_split_labels,
    )

    rows = []
    sizes = {"a": 1, "b": 2, "c": 5, "d": 17, "e": 64}
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    df = spark.createDataFrame(rows, "id long, grp string")
    for num, den in ((4, 5), (1, 2), (9, 10), (1, 3)):
        lab = stratified_split_labels(df, "id", "grp", num, den)
        per = {
            (r.grp, r.split): r.c
            for r in lab.groupBy("grp", "split")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        for g, n in sizes.items():
            assert per.get((g, "train"), 0) == (num * n) // den, (g, num, den)
            assert per.get((g, "test"), 0) == n - (num * n) // den
