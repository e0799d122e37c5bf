"""Merge / upsert — incremental-refresh semantics without a table
format.

The reference's load step is always full-replace
(``to_sql(if_exists="replace")``, dags/etl_grammy_spotify.py:374);
at 100 TB a refresh must be incremental: apply a (much smaller) batch
of upserts to the base table. Without Delta/Iceberg in the runtime,
MERGE is expressed as pure DataFrame algebra:

    kept     = base ANTI JOIN updates ON keys   (rows not touched)
    result   = kept UNION BY NAME updates       (updated + inserted)

One shuffle-free pass when ``updates`` is broadcastable (the common
case: daily delta vs full history); the anti join prunes the base by
key without materializing a full outer join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _check_on_null_key(on_null_key: str, ctx: str) -> None:
    if on_null_key not in ("error", "insert"):
        raise ValueError(
            f"{ctx}: on_null_key must be 'error' or 'insert', got "
            f"{on_null_key!r}"
        )


def _keys_checked_not_null(df: DataFrame, keys: list[str], ctx: str) -> DataFrame:
    """Execution-time NULL-key guard (no extra validation pass, same
    raise_error-in-plan pattern as the op-code check): a NULL merge
    key never equality-matches, so without the guard a NULL-key
    upsert would silently DUPLICATE (the anti join keeps the base
    row, the union adds the update) and a NULL-key delete would
    silently no-op — the feed corrupts the table without a sound.

    This is a deliberate divergence from ANSI MERGE (where a NULL key
    matches nothing and falls through to WHEN NOT MATCHED → insert):
    the silent-corruption shape above is what a CDC feed with broken
    keys actually produces, so the engine defaults to failing loudly.
    Feeds that LEGITIMATELY carry NULL keys expecting insert-only
    treatment opt back into MERGE semantics with
    ``on_null_key='insert'`` at each public entry point."""
    out = df
    for k in keys:
        out = out.withColumn(
            k,
            F.when(F.col(k).isNotNull(), F.col(k)).otherwise(
                F.raise_error(
                    F.lit(
                        f"{ctx}: NULL merge key {k!r} — NULL never "
                        "equality-matches, so the change row would "
                        "silently duplicate or no-op instead of "
                        "upserting/deleting; clean the feed's keys"
                    )
                )
            ),
        )
    return out


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    on_null_key: str = "error",
) -> DataFrame:
    """Last-writer-wins merge: rows in ``updates`` replace base rows
    with the same key; unmatched update rows are inserts. Schemas
    must agree by name (``unionByName`` enforces it). NULL keys in
    ``updates`` fail the job loudly by default (see
    ``_keys_checked_not_null``); ``on_null_key='insert'`` opts into
    ANSI MERGE semantics instead — a NULL key matches nothing, so the
    row lands as a plain insert."""
    if not keys:
        raise ValueError("merge_upsert requires at least one key column")
    _check_on_null_key(on_null_key, "merge_upsert")
    if on_null_key == "error":
        updates = _keys_checked_not_null(updates, keys, "merge_upsert")
    cond = [base[k] == updates[k] for k in keys]
    kept = base.join(F.broadcast(updates.select(*keys)), cond, "left_anti")
    return kept.unionByName(updates)


def merge_upsert_large(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    on_null_key: str = "error",
) -> DataFrame:
    """Same semantics when ``updates`` is too big to broadcast: both
    sides shuffle by key once (sort-merge anti join). Prefer writing
    base AND updates bucketed by the key (sources/bucketing.py) so
    even this shuffle disappears."""
    if not keys:
        raise ValueError("merge_upsert_large requires at least one key column")
    _check_on_null_key(on_null_key, "merge_upsert_large")
    if on_null_key == "error":
        updates = _keys_checked_not_null(updates, keys, "merge_upsert_large")
    cond = [base[k] == updates[k] for k in keys]
    return base.join(updates.select(*keys), cond, "left_anti").unionByName(updates)


def merge_apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    on_null_key: str = "error",
) -> DataFrame:
    """Apply a CDC-style change feed: rows with ``op='u'`` upsert
    (last-writer-wins, like merge_upsert), rows with ``op='d'``
    delete the matching base key. ``changes`` must hold at most one
    row per key (pre-compact a multi-op feed by sequence number
    first); the op column is dropped from the result.

    Same shuffle shape as merge_upsert: one broadcast anti join on
    the change keys (touched rows leave the base) plus a union of the
    surviving upserts — deletes cost nothing beyond the anti join.

    Unknown op codes FAIL the job (execution-time raise_error inside
    the plan — no extra validation pass): the anti join removes the
    base row for every change key, so silently ignoring an
    unrecognized op (an uppercase 'U', a Debezium 'c') would turn it
    into a delete and lose the feed's data without a sound.

    ``on_null_key='insert'`` opts NULL-key rows into ANSI MERGE
    semantics instead of the default loud failure: a NULL key matches
    no base row, so a NULL-key 'u' lands as a plain insert and a
    NULL-key 'd' deletes nothing (both fall out of the same
    anti-join + union algebra with the guard lifted).
    """
    if not keys:
        raise ValueError("merge_apply_changes requires at least one key column")
    _check_on_null_key(on_null_key, "merge_apply_changes")
    if on_null_key == "error":
        changes = _keys_checked_not_null(changes, keys, "merge_apply_changes")
    checked_op = F.when(F.col(op_col).isin("u", "d"), F.col(op_col)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("merge_apply_changes: unknown op (expected 'u'/'d'): "),
                F.coalesce(F.col(op_col), F.lit("NULL")),
            )
        )
    )
    changes = changes.withColumn(op_col, checked_op)
    cond = [base[k] == changes[k] for k in keys]
    kept = base.join(F.broadcast(changes.select(*keys)), cond, "left_anti")
    upserts = changes.filter(F.col(op_col) == "u").drop(op_col)
    return kept.unionByName(upserts)
