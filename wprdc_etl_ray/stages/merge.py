"""LSM-style last-writer-wins upsert merge (SURVEY.md §2.3 X5/X6).

The reference's heart is ``CKANDatastoreLoader.load`` →
``datastore_upsert(method='upsert')`` — a keyed merge on ``key_fields``
(wprdc-etl pipeline/loaders.py). Here that merge is a **vectorized
arg-max** over Arrow tables: sort the group by
``(conv_id, turn_idx, ts, offset)`` and keep the last row per key —
last-writer-wins on ``ts``, ties broken by ``offset`` (a deterministic
total order, so retried tasks and replayed segments produce identical
bytes). ``delete`` events become tombstones (``_deleted=true``) that are
*kept* in the snapshot so a late-arriving older update cannot resurrect
a deleted key; public reads filter them out.

No Python row loop anywhere: the per-key "last" selection is a numpy
boundary mask over dictionary-encoded keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def lww_merge(events: pa.Table) -> pa.Table:
    """Arg-max merge of change events for one group.

    Input: change-schema rows (op, conv_id, turn_idx, payload…, ts,
    offset) — any mix of inserts/updates/deletes/duplicates, any order.
    Output: one row per key — the (ts, offset)-max event — sorted by
    (conv_id, turn_idx), with ``_deleted`` = (winning op == 'delete')
    and ``_offset`` = winning offset. Payload columns of tombstones are
    null. Deterministic and idempotent: the same multiset of events
    yields byte-identical output regardless of delivery order or
    duplication (SURVEY.md §2.3 X9).

    Implementation detail that matters at scale: the arg-max is a numpy
    ``lexsort`` over the narrow key/order columns only, and the wide
    payload (``text``) is touched exactly once — a single ``take`` of
    the winning row per key — instead of fully sorting the wide table
    and discarding the losers.
    """
    t = events.combine_chunks()
    if t.num_rows == 0:
        return _empty_like(t)

    conv = t.column("conv_id")
    codes_arr = pc.dictionary_encode(conv)
    if isinstance(codes_arr, pa.ChunkedArray):
        codes_arr = codes_arr.combine_chunks()
    # dictionary codes are per-dictionary order, not value order: map to
    # rank-of-sorted-value so lexsort groups AND orders by conv_id
    dict_vals = codes_arr.dictionary
    rank = pc.array_sort_indices(pc.array_sort_indices(dict_vals))
    conv_rank = pc.take(rank, codes_arr.indices).to_numpy(zero_copy_only=False)

    turn = t.column("turn_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    offset = t.column("offset").to_numpy(zero_copy_only=False)

    order = np.lexsort((offset, ts, turn, conv_rank))
    # key boundaries by comparing conv_rank and turn SEPARATELY — a
    # packed (rank << k) | turn key would silently collide distinct keys
    # for turn_idx >= 2^k or negative (turn_idx is int64 post-widening)
    cs, tu = conv_rank[order].astype(np.int64), turn[order]
    last = np.empty(len(order), dtype=bool)
    last[-1] = True
    last[:-1] = (cs[1:] != cs[:-1]) | (tu[1:] != tu[:-1])
    winners = order[last]  # in (conv_id, turn_idx) order already

    t = t.take(pa.array(winners))
    deleted = pc.equal(t.column("op"), "delete")
    out = t.drop_columns(["op", "offset"])
    out = out.append_column("_offset", t.column("offset").cast(pa.int64()))
    out = out.append_column("_deleted", deleted.combine_chunks() if isinstance(deleted, pa.ChunkedArray) else deleted)
    return out


def winner_indices(
    t: pa.Table, outer: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray | None]:
    """Row indices of the (ts, offset)-max event per key, in
    (outer, conv_id, turn_idx) order — one narrow-column lexsort over the
    whole (possibly multi-group) table, no wide data touched.

    ``outer`` is an optional outermost grouping array (e.g. the exchange
    gid) so ONE sort serves many groups. Returns (winner_row_indices,
    outer_value_per_winner)."""
    conv = t.column("conv_id")
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    codes_arr = pc.dictionary_encode(conv)
    if isinstance(codes_arr, pa.ChunkedArray):
        codes_arr = codes_arr.combine_chunks()
    dict_vals = codes_arr.dictionary
    rank = pc.array_sort_indices(pc.array_sort_indices(dict_vals))
    conv_rank = pc.take(rank, codes_arr.indices).to_numpy(zero_copy_only=False).astype(np.int64)
    turn = t.column("turn_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    offset = t.column("offset").to_numpy(zero_copy_only=False)
    if outer is None:
        order = np.lexsort((offset, ts, turn, conv_rank))
        okey = None
    else:
        order = np.lexsort((offset, ts, turn, conv_rank, outer))
        okey = outer[order]
    cs, tu = conv_rank[order], turn[order]
    last = np.empty(len(order), dtype=bool)
    last[-1] = True
    diff = (cs[1:] != cs[:-1]) | (tu[1:] != tu[:-1])
    if okey is not None:
        diff |= okey[1:] != okey[:-1]
    last[:-1] = diff
    winners = order[last]
    return winners, (okey[last] if okey is not None else None)


def snapshot_form(winner_table: pa.Table) -> pa.Table:
    """Convert an already-deduplicated, key-ordered winner table from
    event form (op/offset) to snapshot form (_offset/_deleted) — the
    tail of :func:`lww_merge` without re-sorting."""
    t = winner_table
    deleted = pc.equal(t.column("op"), "delete")
    out = t.drop_columns(["op", "offset"])
    out = out.append_column("_offset", t.column("offset").cast(pa.int64()))
    out = out.append_column(
        "_deleted",
        deleted.combine_chunks() if isinstance(deleted, pa.ChunkedArray) else deleted,
    )
    return out


def _empty_like(t: pa.Table) -> pa.Table:
    out = t.drop_columns(["op", "offset"])
    out = out.append_column("_offset", pa.nulls(0, pa.int64()))
    out = out.append_column("_deleted", pa.nulls(0, pa.bool_()))
    return out


def snapshot_as_events(snapshot: pa.Table) -> pa.Table:
    """Re-express committed snapshot rows as pseudo-events so an
    incremental epoch can merge them with new events on equal footing.

    ``_deleted`` tombstones become op='delete'; live rows op='insert';
    ``_offset`` becomes the event offset (so LWW tie-breaks still hold
    across epochs)."""
    op = pc.if_else(
        snapshot.column("_deleted"),
        pa.scalar("delete"),
        pa.scalar("insert"),
    )
    t = snapshot.drop_columns(["_deleted"])
    t = t.rename_columns(
        ["offset" if c == "_offset" else c for c in t.schema.names]
    )
    return t.append_column("op", op)


def merge_with_snapshot(events: pa.Table, snapshot: pa.Table | None) -> pa.Table:
    """Merge new events with the prior snapshot of the same partition."""
    if snapshot is not None and snapshot.num_rows:
        prior = snapshot_as_events(snapshot)
        # normalize column order/presence differences (schema evolution
        # across epochs): promote both to the union schema
        from ..schema import normalize_batch, unify_schemas

        target = unify_schemas([prior.schema, events.schema])
        events = pa.concat_tables(
            [normalize_batch(prior, target), normalize_batch(events, target)]
        )
    return lww_merge(events)
