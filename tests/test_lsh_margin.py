"""LSH recall-margin tripwire (round-4 verdict task 2).

q78/q105's oracles recompute exact all-pairs Jaccard, so their
hash-match demands 100% LSH recall on the fixture. Banding cannot
guarantee recall for pairs near the similarity threshold — it only
guarantees it (to p>=0.99) above the S-curve knee. This test recomputes
the EXACT true-pair Jaccard distribution on the fixtures (pure Python,
inverted shingle index — no Spark) and asserts every true pair sits
comfortably above the knee of the banding the queries actually use.

If a driver fixture regeneration introduces a borderline pair, this
test goes red at build time — loudly, with the offending pair printed —
instead of the correctness gate flipping red silently (the round-3
events-re-encoding failure class).
"""

from __future__ import annotations

import inspect
import os
from collections import defaultdict
from itertools import combinations

import pyarrow.parquet as pq
import pytest

from dask_cuml_spark.operators.dedup import (
    minhash_lsh_candidates,
    minhash_near_dup,
)

# The weakest oracle threshold across q78 (0.5) and q105 (0.6): any
# exact pair at-or-above it must be recalled by the banded join.
ORACLE_THRESHOLD = 0.5
# "Comfortably above the knee": require this much headroom so a regen
# that nudges similarities slightly still cannot reach the fragile zone.
MARGIN = 0.05


def _defaults(fn):
    return {
        k: p.default
        for k, p in inspect.signature(fn).parameters.items()
        if p.default is not inspect.Parameter.empty
    }


def banding() -> tuple[int, int]:
    """(bands, rows_per_band) as the pipeline defaults define them."""
    b = _defaults(minhash_lsh_candidates)["bands"]
    r = _defaults(minhash_lsh_candidates)["rows_per_band"]
    # the pipeline derives r = num_hashes // bands — keep them consistent
    nh = _defaults(minhash_near_dup)["num_hashes"]
    nb = _defaults(minhash_near_dup)["bands"]
    assert (nb, nh // nb) == (b, r), "pipeline/banding defaults diverged"
    return b, r


def recall_knee(bands: int, rows: int, p: float = 0.99) -> float:
    """Smallest J with bucket probability >= p: 1-(1-J^r)^b = p."""
    return (1.0 - (1.0 - p) ** (1.0 / bands)) ** (1.0 / rows)


def shingle_set(text: str, n: int = 3) -> frozenset:
    toks = text.split(" ")
    m = max(len(toks) - n, 0)
    return frozenset(" ".join(toks[i : i + n]) for i in range(m + 1))


def true_pairs(sf_dir: str, threshold: float) -> list[tuple[float, int, int]]:
    """Exact (jaccard, id_a, id_b) for every pair >= threshold.

    Inverted index on shingles: only pairs sharing >=1 shingle are
    scored, so this is ~|docs|*|shingles| work, not all-pairs."""
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pydict()
    ids, sh = t["doc_id"], [shingle_set(x) for x in t["text"]]
    index = defaultdict(list)
    for i, s in enumerate(sh):
        for g in s:
            index[g].append(i)
    inter: dict[tuple[int, int], int] = defaultdict(int)
    for docs in index.values():
        if len(docs) > 1:
            for i, j in combinations(docs, 2):
                inter[(i, j)] += 1
    out = []
    for (i, j), c in inter.items():
        jac = c / (len(sh[i]) + len(sh[j]) - c)
        if jac >= threshold:
            out.append((jac, ids[i], ids[j]))
    return sorted(out)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_fixture_pairs_sit_above_recall_knee(sf_dir):
    b, r = banding()
    knee = recall_knee(b, r)
    pairs = true_pairs(sf_dir, ORACLE_THRESHOLD)
    assert pairs, f"fixture at {sf_dir} has no true pairs — regenerate?"
    weakest = pairs[0]
    assert weakest[0] >= knee + MARGIN, (
        f"true pair {weakest[1:]} has exact Jaccard {weakest[0]:.3f}, "
        f"inside the fragile zone of the b={b} r={r} banding "
        f"(p=0.99 knee at J={knee:.3f} + margin {MARGIN}). LSH recall on "
        f"this fixture is now luck — retune bands/rows before the "
        f"correctness gate flips red."
    )


def test_knee_solver_matches_scurve():
    # sanity-pin the algebra the margin rests on
    b, r = 12, 3
    knee = recall_knee(b, r)
    p = 1.0 - (1.0 - knee**r) ** b
    assert abs(p - 0.99) < 1e-9
    # and the round-5 defaults do cover the fixture's J=0.8 weakest pair
    assert 1.0 - (1.0 - 0.8**r) ** b > 0.999
