"""Vectorized portable gram-key fold — the q149 oracle-parity hash as
an Arrow kernel instead of interpreted higher-order lambdas.

q149's ORACLE mode needs a gram key both engines can compute
bit-for-bit, so it folds characters: per token
``a = (a*31 + codepoint) % CHAR_MOD``, then per gram
``g = (g*10007 + token_fold) % GRAM_MOD``. As Spark expressions that
is a nested ``aggregate(transform(split(...)))`` — CodegenFallback
interpreted lambda evals per CHARACTER, measured ~5 s per 10M
elements at 100x (PLANS.md; the whole portable mode sat at 62.3 s).

The recurrence looks sequential but each step is elementwise over the
batch, so the kernel runs it as NUMPY COLUMN SWEEPS: pad the batch's
tokens into an (n_tokens, max_len) codepoint matrix (a zero-copy
``np.unicode_`` view — codepoints, exactly ``F.ascii`` semantics for
ASCII and BMP input), then loop over the ≤max_len CHAR POSITIONS (not
the strings) doing one vectorized multiply-add-mod per position; same
trick over the ≤max_tokens token positions for the outer fold.
Products stay exact in int64: CHAR_MOD=1000003 < 2^20 so a*31+c <
2^26; GRAM_MOD=999999937 < 2^30 so g*10007+t < 2^44.

The kernel is size-gated by the caller (the quantize.py GATE_BYTES
convention — expr path below the gate so the oracle-mirroring
expression stays the common proof path; kernel above it) and
bit-parity is pytest-pinned via ``gram_keys_of``, the driver-side
twin both the kernel and the replay test call.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

CHAR_MUL = 31
TOK_MUL = 10007


def _token_folds(tokens: np.ndarray, char_mod: int) -> np.ndarray:
    """Per-token char fold a=(a*31+cp)%char_mod over a 1-D object
    array of token strings — one vectorized sweep per char position.

    NUL guard: the padded-codepoint-matrix trick cannot distinguish a
    literal U+0000 INSIDE a token from its own zero padding (lens
    would undercount and positions shift), so tokens containing NUL
    take the exact per-string ord() fold instead — same integers, the
    vectorized path just doesn't apply. Vanishingly rare in real text;
    correctness must not depend on that."""
    if len(tokens) == 0:
        return np.zeros(0, dtype=np.int64)
    acc = np.zeros(len(tokens), dtype=np.int64)
    u = np.array(tokens.tolist(), dtype=np.str_)
    if u.dtype.itemsize == 0:  # every token empty
        return acc
    mat = (
        u.view(np.uint32)
        .reshape(len(tokens), -1)
        .astype(np.int64, copy=False)
    )
    lens = (mat > 0).sum(axis=1)
    # NUL detection stays vectorized (a per-token Python containment
    # scan would tax the hot path the kernel exists to avoid): a row
    # whose padding-derived length disagrees with its true character
    # count hides an interior U+0000 — only those rows take the exact
    # per-string fold
    true_len = np.char.str_len(u)
    nul = lens != true_len
    if nul.any():
        for i in np.flatnonzero(nul):
            a = 0
            for ch in tokens[i]:
                a = (a * CHAR_MUL + ord(ch)) % char_mod
            acc[i] = a
        if nul.all():
            return acc
    sub = np.zeros(len(tokens), dtype=np.int64)
    for j in range(mat.shape[1]):
        live = j < lens
        if not live.any():
            break
        step = (sub * CHAR_MUL + mat[:, j]) % char_mod
        sub = np.where(live, step, sub)
    clean = ~nul
    acc[clean] = sub[clean]
    return acc


def gram_keys_of(
    grams, char_mod: int, gram_mod: int
) -> np.ndarray:
    """Portable gram keys of a batch of space-joined gram strings —
    the driver-side twin (kernel batches and pytest replays call this
    same function, the binhash.signatures_of convention)."""
    s = pd.Series(grams, dtype=object)
    if s.empty:
        return np.zeros(0, dtype=np.int64)
    toks = s.str.split(" ")
    counts = toks.str.len().to_numpy(dtype=np.int64)
    flat = np.concatenate(
        [np.asarray(t, dtype=object) for t in toks.to_numpy()]
    )
    tf = _token_folds(flat, char_mod)
    offsets = np.zeros(len(s), dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    g = np.zeros(len(s), dtype=np.int64)
    for k in range(int(counts.max())):
        live = k < counts
        if not live.any():
            break
        idx = offsets + np.minimum(k, counts - 1)
        step = (g * TOK_MUL + tf[idx]) % gram_mod
        g = np.where(live, step, g)
    return g


def fold_gram_keys(
    df: DataFrame,
    str_col: str,
    out_col: str,
    char_mod: int,
    gram_mod: int,
) -> DataFrame:
    """df + an ``out_col`` bigint column holding the portable fold of
    ``str_col``, via mapInPandas (Arrow batches; all other columns
    pass through). Null strings propagate as null keys — the
    quantize.py dirty-input convention."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} bigint"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            null_mask = pdf[str_col].isna()
            keys = pd.array(
                np.zeros(len(pdf), dtype=np.int64), dtype="Int64"
            )
            if (~null_mask).any():
                keys[(~null_mask).to_numpy()] = gram_keys_of(
                    pdf.loc[~null_mask, str_col].to_numpy(),
                    char_mod,
                    gram_mod,
                )
            keys[null_mask.to_numpy()] = pd.NA
            pdf = pdf.copy()
            pdf[out_col] = keys
            yield pdf

    return df.mapInPandas(batches, out_schema)
