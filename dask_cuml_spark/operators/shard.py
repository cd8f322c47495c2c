"""Deterministic corpus shuffle + sharding (q153's operator, factored
out in round 15 with the Feistel key promoted to the production
default — the r14 verdict's task 5).

The training-data "shuffle and shard" step is a STATELESS KEYED
PERMUTATION (tf.data/Grain-style reshufflable epochs): shuffle_key =
π(id) for a bijective π, so the order is reproducible from ids alone,
needs no stored RNG state, and any engine recomputes it identically.

Two key modes, one plan shape (one narrow projection → ONE hash
exchange on shard → per-shard row_number):

``mode='feistel'`` (default — the production key): a 4-round balanced
Feistel network over the full 64-bit id space. Round function is the
public-domain ``lowbias32`` integer hash (Wellons 2018, "Prospecting
for Hash Functions" — the xorshift-multiply constant 0x45d9f3b) of
the right half XOR a fixed odd round key. Bijective on ALL 2^64 bit
patterns by Feistel construction (no id bound at all — negative ids
included), and every intermediate stays under 2^59 so the arithmetic
is int64-exact even under ANSI overflow checking: the multiplier is
deliberately < 2^27 so (2^32−1)·0x45d9f3b < 2^59. Unlike minstd,
consecutive ids diverge through 8 multiply-xor-shift mixes — pos
within a shard is safe to use as a training order.

``mode='minstd'`` (the oracle-shared mode q153 pins): the Park–Miller
affine permutation k = (id · 48271) mod (2^31 − 1), bijective on
[0, 2^31−1) with the bound ENFORCED in-plan (raise_error). One
multiply — SQL-expressible in any engine, which is why the DuckDB
full-value oracle shares it. Known limit, documented since r14: an
LCG is a WEAK shuffle (sequential ids land exactly 48271 apart mod P)
— fine for shard balancing and locality breaking, not for a
within-shard training order. That caveat's shipped answer is the
feistel default above.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MINSTD_A = 48271
MINSTD_P = 2147483647  # 2^31 − 1 (prime; Park–Miller modulus)

_M32 = 0xFFFFFFFF
_LOWBIAS_C = 0x45D9F3B  # < 2^27: keeps every product < 2^59
# fixed odd 32-bit round keys (first 32 hex digits of π scrambled by
# the golden-ratio constant — nothing up the sleeve, just distinct
# odd constants)
_ROUND_KEYS = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F)


def minstd_key(col: Column) -> Column:
    """(id · 48271) mod (2^31−1), bound enforced in-plan: ids at or
    past the modulus would collide keys and silently break the
    permutation (the q151 raise_error guard pattern)."""
    return F.when(
        (col >= 0) & (col < F.lit(MINSTD_P)),
        (col * F.lit(MINSTD_A)) % F.lit(MINSTD_P),
    ).otherwise(
        F.raise_error(
            F.lit(
                f"minstd permutation needs 0 <= id < {MINSTD_P} — use "
                "mode='feistel' (64-bit, unbounded) past that"
            )
        )
    )


def with_feistel_key(
    df: DataFrame, id_col: str, out_col: str = "k", rounds: int = 4
) -> DataFrame:
    """df + ``out_col`` = 4-round balanced Feistel over the 64-bit id:
    bijective on every int64 bit pattern (Feistel networks are
    bijective for ANY round function — decryption just replays the
    keys backwards), no id bound, no RNG state.

    Built as STAGED withColumn attributes, not one nested Column: the
    xorshift steps reference their input twice, and Catalyst COPIES
    subtrees on every reference — a single-expression formulation is
    ~33^rounds nodes and breaks whole-stage codegen (measured: a
    count_distinct over it threw IllegalAccessError from a generated
    nested class). Attributes keep the tree linear, and
    CollapseProject will not re-inline a non-cheap expression that is
    referenced more than once, so the staging survives optimization."""
    l_c, r_c, x_c = "_fst_l", "_fst_r", "_fst_x"
    for c in (l_c, r_c, x_c):
        if c in df.columns or out_col in df.columns:
            raise ValueError(f"column {c}/{out_col} already present")
    m32 = F.lit(_M32)
    col = F.col(id_col)
    df = df.withColumn(
        l_c, F.shiftright(col, 32).bitwiseAND(m32)
    ).withColumn(r_c, col.bitwiseAND(m32))
    for ki in _ROUND_KEYS[:rounds]:
        # x = lowbias32((R ^ ki) & M32), one attribute per step (every
        # step re-masks so products stay < 2^59: int64-exact under
        # ANSI overflow checking)
        x = F.col(x_c)
        df = df.withColumn(
            x_c, F.col(r_c).bitwiseXOR(F.lit(ki)).bitwiseAND(m32)
        )
        df = df.withColumn(x_c, x.bitwiseXOR(F.shiftright(x, 16)))
        df = df.withColumn(
            x_c, (x * F.lit(_LOWBIAS_C)).bitwiseAND(m32)
        )
        df = df.withColumn(x_c, x.bitwiseXOR(F.shiftright(x, 16)))
        df = df.withColumn(
            x_c, (x * F.lit(_LOWBIAS_C)).bitwiseAND(m32)
        )
        df = df.withColumn(x_c, x.bitwiseXOR(F.shiftright(x, 16)))
        # L, R = R, L ^ f(R, ki)
        df = df.withColumn("_fst_t", F.col(r_c)).withColumn(
            r_c, F.col(l_c).bitwiseXOR(x)
        ).withColumn(l_c, F.col("_fst_t")).drop("_fst_t")
    return df.withColumn(
        out_col, F.shiftleft(F.col(l_c), 32).bitwiseOR(F.col(r_c))
    ).drop(l_c, r_c, x_c)


def feistel_key_py(ids, rounds: int = 4):
    """numpy mirror of with_feistel_key (uint64 wraparound semantics
    match the masked int64 arithmetic exactly) — the pytest
    cross-check that the Spark expression computes the documented
    network, not merely *a* bijection."""
    import numpy as np

    v = np.asarray(ids, dtype=np.int64).astype(np.uint64)
    left = (v >> np.uint64(32)) & np.uint64(_M32)
    right = v & np.uint64(_M32)
    for ki in _ROUND_KEYS[:rounds]:
        x = (right ^ np.uint64(ki)) & np.uint64(_M32)
        x = x ^ (x >> np.uint64(16))
        x = (x * np.uint64(_LOWBIAS_C)) & np.uint64(_M32)
        x = x ^ (x >> np.uint64(16))
        x = (x * np.uint64(_LOWBIAS_C)) & np.uint64(_M32)
        x = x ^ (x >> np.uint64(16))
        left, right = right, left ^ x
    return ((left << np.uint64(32)) | right).view(np.int64)


def shuffle_shard(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
    mode: str = "feistel",
) -> DataFrame:
    """(id, shard, pos): deterministic shuffle into ``n_shards``
    balanced training files. Plan shape (pinned by q153's test): one
    narrow projection (key, shard = key mod S) → ONE hash exchange on
    shard → per-shard row_number ordered by (key, id). The window
    partition is a SHARD (corpus/S rows) — exactly the unit a shard
    writer sorts locally before emitting one training file. No global
    sort, no SinglePartition."""
    if mode == "minstd":
        keyed = df.select(id_col).select(
            id_col, minstd_key(F.col(id_col)).alias("k")
        )
    elif mode == "feistel":
        keyed = with_feistel_key(df.select(id_col), id_col, "k")
    else:
        raise ValueError("mode must be 'minstd' or 'feistel'")
    keyed = keyed.withColumn(
        "shard", F.pmod("k", F.lit(n_shards)).cast("long")
    )
    w = Window.partitionBy("shard").orderBy("k", id_col)
    return keyed.select(
        id_col,
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    )
