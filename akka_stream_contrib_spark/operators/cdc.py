"""Change-data-capture between table snapshots.

`snapshot_diff` computes the (added / removed / changed) delta between two
versions of a keyed table — the operation behind incremental ingestion,
audit trails, and downstream cache invalidation when a 100 TB upstream
re-publishes. Companion to `operators/scd2.py` (which tracks history once
changes are KNOWN; this derives the changes).

Scale shape: one full outer join on the key — both sides hash-shuffle once
on the same uniform key (co-partitioned join, AQE handles skew); the
column comparison is a codegen expression. Never a collect, never a
row-by-row diff.

Reference anchor: none (BASELINE.json extension — the reference has no
table surface).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: Sequence[str],
                  compare_cols: Sequence[str]) -> DataFrame:
    """Delta between snapshots: one row per key that was added, removed, or
    changed (any ``compare_cols`` differs, null-safe), with the old and new
    values of every compared column. Unchanged keys are dropped — the
    output is the (usually tiny) changeset, not the table."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    o = old.select(*key_cols,
                   *[F.col(c).alias(f"old_{c}") for c in compare_cols])
    n = new.select(*key_cols,
                   *[F.col(c).alias(f"new_{c}") for c in compare_cols])
    # presence flags: null in a side-specific value slot could mean a null
    # VALUE, so join on dedicated marker columns instead
    o = o.withColumn("_in_old", F.lit(1))
    n = n.withColumn("_in_new", F.lit(1))
    # NULL-SAFE key match: a USING join never matches NULL keys, so an
    # unchanged NULL-key row would be reported as phantom removed+added
    # churn every CDC cycle (and apply_changes would delete-and-reinsert)
    n = n.select(*[F.col(k).alias(f"_nk_{i}")
                   for i, k in enumerate(key_cols)],
                 *[f"new_{c}" for c in compare_cols], "_in_new")
    cond = None
    for i, k in enumerate(key_cols):
        c = o[k].eqNullSafe(F.col(f"_nk_{i}"))
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    keys_out = [F.coalesce(o[k], F.col(f"_nk_{i}")).alias(k)
                for i, k in enumerate(key_cols)]
    differs = None
    for c in compare_cols:
        d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
    )
    return (j.withColumn("change_type", change)
            .filter(F.col("change_type").isNotNull())
            .select(*keys_out, "change_type",
                    *[f"old_{c}" for c in compare_cols],
                    *[f"new_{c}" for c in compare_cols]))


def apply_changes(snapshot: DataFrame, changes: DataFrame,
                  key_cols: Sequence[str], op_col: str = "op",
                  broadcast_changes: bool = True) -> DataFrame:
    """Apply a changeset to a snapshot — the MERGE/upsert half of the CDC
    loop (``snapshot_diff`` derives changes; this replays them). ``changes``
    carries ``op_col`` ∈ {'upsert', 'delete'}: upserts replace or insert
    their key's row, deletes remove it, untouched keys pass through.

    Scale shape: ONE left anti join of the snapshot against the (usually
    tiny, broadcastable) changeset's keys plus a union with the upsert
    rows — the snapshot is never sorted and shuffles at most once; with a
    broadcastable changeset it doesn't shuffle at all. Duplicate keys
    within one changeset are an upstream bug — resolve with a last-writer
    window before calling (documented, not silently masked).

    Reference anchor: none (BASELINE.json table-surface extension,
    companion to snapshot_diff/scd2).
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    touched = changes.select(*key_cols).distinct()
    if broadcast_changes:  # set False when the changeset rivals the snapshot
        touched = F.broadcast(touched)
    kept = snapshot.join(touched, list(key_cols), "left_anti")
    upserts = (changes.filter(F.col(op_col) == "upsert")
               .select(*snapshot.columns))
    return kept.unionByName(upserts)
