"""Upsert / merge-into (north-star pipeline sink pattern: apply a batch
of updates onto a dimension snapshot — CDC merge without a table format).

Without Delta/Iceberg the merge is a full-outer join + coalesce:
  - matched keys take the update's values,
  - unmatched-right rows are inserts,
  - unmatched-left rows pass through.
One shuffle on the key; at 100 TB both sides hash-partition on the merge
key and the join is the only wide stage. Deterministic: pure relational.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    update_cols: list[str],
) -> DataFrame:
    """Return target with `updates` applied: row-per-key, updates win on
    collision, new keys appended. Non-updated columns keep target values
    (NULL for pure inserts).

    NULL-update semantics (CDC): a matched update row fully wins on its
    update_cols — an explicit NULL in the update OVERWRITES the target's
    value (match on the update KEY, not coalesce on the value, so
    null-out fields propagate)."""
    t = target.alias("t")
    u = updates.alias("u")
    joined = t.join(u, F.col(f"t.{key}") == F.col(f"u.{key}"), "full_outer")
    matched = F.col(f"u.{key}").isNotNull()
    out_cols = [
        F.coalesce(F.col(f"t.{key}"), F.col(f"u.{key}")).alias(key)
    ]
    for c in target.columns:
        if c == key:
            continue
        if c in update_cols and c in updates.columns:
            out_cols.append(
                F.when(matched, F.col(f"u.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
            )
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    return joined.select(*out_cols)
