"""Vectorized LWW merge unit tests on hand-built Arrow tables
(SURVEY.md §5.2 item 1: LWW, ts tie → offset, tombstone, duplicate
idempotence, permutation determinism)."""

import pyarrow as pa
import pyarrow.compute as pc

from wprdc_etl_ray.stages.merge import lww_merge, merge_with_snapshot, snapshot_as_events
from wprdc_etl_ray.stages.partition import add_partition_cols, partition_of

TS = 1_700_000_000_000_000


def ev(offset, op, conv, turn, text, ts):
    return {
        "offset": offset,
        "op": op,
        "conv_id": conv,
        "turn_idx": turn,
        "role": None if op == "delete" else "user",
        "text": None if op == "delete" else text,
        "tool": None,
        "ts": ts,
    }


def tbl(events):
    cols = {k: [e[k] for e in events] for k in events[0]}
    return pa.table(
        {
            "offset": pa.array(cols["offset"], pa.int64()),
            "op": pa.array(cols["op"], pa.string()),
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int64()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        }
    )


def live_texts(merged):
    m = merged.filter(pc.equal(merged.column("_deleted"), False))
    return list(zip(m.column("conv_id").to_pylist(), m.column("turn_idx").to_pylist(), m.column("text").to_pylist()))


def test_lww_basic_update_wins():
    t = tbl([
        ev(0, "insert", "c1", 0, "v0", TS),
        ev(1, "update", "c1", 0, "v1", TS + 10),
    ])
    assert live_texts(lww_merge(t)) == [("c1", 0, "v1")]


def test_lww_late_older_update_loses():
    t = tbl([
        ev(0, "insert", "c1", 0, "v0", TS + 100),
        ev(1, "update", "c1", 0, "stale", TS + 50),  # later offset, older ts
    ])
    assert live_texts(lww_merge(t)) == [("c1", 0, "v0")]


def test_ts_tie_broken_by_offset():
    t = tbl([
        ev(0, "insert", "c1", 0, "a", TS),
        ev(1, "update", "c1", 0, "b", TS),  # same ts, higher offset wins
    ])
    assert live_texts(lww_merge(t)) == [("c1", 0, "b")]


def test_tombstone_removes_key_and_survives():
    t = tbl([
        ev(0, "insert", "c1", 0, "a", TS),
        ev(1, "delete", "c1", 0, None, TS + 10),
    ])
    m = lww_merge(t)
    assert live_texts(m) == []
    assert m.num_rows == 1  # tombstone retained in snapshot
    assert m.column("_deleted").to_pylist() == [True]


def test_delete_loses_to_newer_update():
    t = tbl([
        ev(0, "insert", "c1", 0, "a", TS),
        ev(1, "delete", "c1", 0, None, TS + 10),
        ev(2, "update", "c1", 0, "back", TS + 20),
    ])
    assert live_texts(lww_merge(t)) == [("c1", 0, "back")]


def test_duplicate_delivery_idempotent():
    base = [
        ev(0, "insert", "c1", 0, "a", TS),
        ev(1, "update", "c1", 0, "b", TS + 10),
    ]
    dup = base + [ev(2, "update", "c1", 0, "b", TS + 10)]  # re-delivery, new offset
    assert live_texts(lww_merge(tbl(dup))) == live_texts(lww_merge(tbl(base)))


def test_permutation_determinism():
    events = [
        ev(0, "insert", "c1", 0, "a", TS),
        ev(1, "insert", "c2", 0, "x", TS + 1),
        ev(2, "update", "c1", 0, "b", TS + 5),
        ev(3, "delete", "c2", 0, None, TS + 9),
        ev(4, "update", "c1", 0, "c", TS + 3),
    ]
    import itertools

    ref = lww_merge(tbl(events))
    for perm in itertools.permutations(events):
        assert lww_merge(tbl(list(perm))).equals(ref)


def test_merge_with_snapshot_tombstone_blocks_resurrection():
    # epoch 1: insert + delete -> tombstone in snapshot
    snap = lww_merge(tbl([
        ev(0, "insert", "c1", 0, "a", TS),
        ev(1, "delete", "c1", 0, None, TS + 100),
    ]))
    # epoch 2: a late update with ts OLDER than the tombstone must not resurrect
    out = merge_with_snapshot(tbl([ev(2, "update", "c1", 0, "zombie", TS + 50)]), snap)
    assert live_texts(out) == []
    # but a genuinely newer update does
    out2 = merge_with_snapshot(tbl([ev(3, "update", "c1", 0, "fresh", TS + 200)]), snap)
    assert live_texts(out2) == [("c1", 0, "fresh")]


def test_snapshot_as_events_roundtrip():
    snap = lww_merge(tbl([ev(0, "insert", "c1", 0, "a", TS)]))
    back = snapshot_as_events(snap)
    assert back.column("op").to_pylist() == ["insert"]
    assert back.column("offset").to_pylist() == [0]


def test_partitioning_deterministic_and_bounded():
    t = tbl([ev(i, "insert", f"c{i%7}", i, "x", TS + i) for i in range(50)])
    out = add_partition_cols(t, 8, salt=4)
    parts = out.column("part").to_pylist()
    salts = out.column("salt").to_pylist()
    assert all(0 <= p < 8 for p in parts)
    assert all(0 <= s < 4 for s in salts)
    # same conv -> same part, across separate calls (process-stable hash)
    out2 = add_partition_cols(t, 8, salt=4)
    assert out2.column("part").to_pylist() == parts
    import numpy as np

    p1 = partition_of(np.array(["convA", "convB"], dtype=object), 1024)
    p2 = partition_of(np.array(["convA", "convB"], dtype=object), 1024)
    assert list(p1) == list(p2)
