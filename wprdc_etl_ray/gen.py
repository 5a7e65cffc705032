"""Deterministic synthetic CDC stream generator (FIXTURES.md §A4).

Generates the ``transcript_changes`` WAL for the transcripts table shape
given by ``BASELINE.json::input_hint``. Pure numpy/pandas/pyarrow — no
Ray. Same parameters ⇒ byte-identical segments (seeded rng, no
wall-clock).

The reference has no generator; its inputs are municipal CSV files. This
module plays the role of the reference's ``test/mock/`` fixture files
(wprdc-etl test/mock/*.csv), scaled and parameterized.

Event rules:
- inserts create ``(conv_id, turn_idx)`` in turn order per conversation;
- updates rewrite ``text`` (suffix ``" [rev k]"``) with a later position;
- deletes emit key + ts only (payload columns null);
- hot conversations (zipf-ranked) receive a disproportionate share of
  updates/deletes — the skew salted sub-keys must handle;
- duplicates re-deliver an earlier event with a NEW offset but identical
  payload + ts (at-least-once delivery);
- out-of-order events carry a ts earlier than previously-emitted events
  for the same key;
- from ``evolve_at`` (fraction of the log) onward, segments use the v2
  schema (added tool_call_id/tool_args columns, turn_idx widened to
  int64) — snapped to a segment boundary.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import CHANGE_SCHEMA_V1, CHANGE_SCHEMA_V2

BASE_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds
STEP_US = 1_000_000  # nominal 1 event/second of event time

_TOOLS = np.array(["search", "code", "browser", "sql"])
VALID_OPS_ORDER = ("insert", "update", "delete")

# 64 deterministic filler sentences (~90-160 chars each) for transcript text.
_VOCAB_WORDS = (
    "stream batch merge upsert offset shard replay lake arrow parquet "
    "schema evolve commit manifest watermark salt bucket actor block "
    "shuffle spill vector kernel window group sort join scan filter map"
).split()


def _build_vocab(n: int = 64) -> list[str]:
    out = []
    for i in range(n):
        words = [_VOCAB_WORDS[(i * 7 + j * 3) % len(_VOCAB_WORDS)] for j in range(12 + i % 9)]
        out.append(" ".join(words))
    return out


_VOCAB = _build_vocab()


def generate_change_log(
    n_events: int,
    seed: int = 42,
    zipf_s: float = 1.2,
    mean_turns: int = 12,
    p_update: float = 0.25,
    p_delete: float = 0.05,
    p_dup: float = 0.02,
    p_ooo: float = 0.10,
) -> pa.Table:
    """Return the full change log as one Arrow table in offset order.

    Columns follow CHANGE_SCHEMA_V2 (superset); segment writing decides
    which prefix of the log is exported with the v1 schema.
    """
    rng = np.random.default_rng(seed)
    n_dup = int(n_events * p_dup)
    n_base = n_events - n_dup
    n_upd = int(n_base * p_update)
    n_del = int(n_base * p_delete)
    n_ins = n_base - n_upd - n_del
    if n_ins <= 0:
        raise ValueError("n_events too small for the configured rates")

    # --- conversations: geometric turn counts until we cover n_ins turns
    est_convs = max(4, int(n_ins / mean_turns * 1.3) + 4)
    turns = rng.geometric(1.0 / mean_turns, size=est_convs).astype(np.int64)
    while turns.sum() < n_ins:
        turns = np.concatenate([turns, rng.geometric(1.0 / mean_turns, size=est_convs)])
    cum = np.cumsum(turns)
    n_convs = int(np.searchsorted(cum, n_ins)) + 1
    turns = turns[:n_convs].copy()
    turns[-1] -= cum[n_convs - 1] - n_ins  # trim so total == n_ins
    if turns[-1] <= 0:
        turns[-1] = 1
        n_ins = int(turns.sum())
        n_base = n_ins + n_upd + n_del

    starts = np.concatenate([[0], np.cumsum(turns)[:-1]])
    ins_conv = np.repeat(np.arange(n_convs, dtype=np.int64), turns)
    ins_turn = np.arange(n_ins, dtype=np.int64) - np.repeat(starts, turns)

    # --- zipf popularity over conversations (hot-key skew for updates/deletes)
    rank = rng.permutation(n_convs)
    conv_w = 1.0 / np.power(rank + 1.0, zipf_s)
    row_w = conv_w[ins_conv]
    row_p = row_w / row_w.sum()

    cdf = np.cumsum(row_p)
    cdf[-1] = 1.0
    upd_target = np.searchsorted(cdf, rng.random(n_upd), side="right")
    del_target = np.searchsorted(cdf, rng.random(n_del), side="right")

    # --- positions define the total offset order; a mutation is placed
    # uniformly after its target insert.
    ins_pos = (np.arange(n_ins) + 0.5) / n_ins
    upd_pos = rng.uniform(ins_pos[upd_target], 1.0)
    del_pos = rng.uniform(ins_pos[del_target], 1.0)

    import pyarrow.compute as pc

    op_code = np.concatenate(
        [
            np.zeros(n_ins, dtype=np.int8),
            np.ones(n_upd, dtype=np.int8),
            np.full(n_del, 2, dtype=np.int8),
        ]
    )
    conv = np.concatenate([ins_conv, ins_conv[upd_target], ins_conv[del_target]])
    turn = np.concatenate([ins_turn, ins_turn[upd_target], ins_turn[del_target]])
    pos = np.concatenate([ins_pos, upd_pos, del_pos])

    # rev number per update: occurrence index among updates of the same key,
    # ordered by position (so "[rev k]" counts revisions in log order).
    rev = np.zeros(n_base, dtype=np.int64)
    if n_upd:
        key = ins_conv[upd_target] * (2**32) + ins_turn[upd_target]
        order = np.lexsort((upd_pos, key))  # by key, then position
        sk = key[order]
        run_start = np.concatenate([[True], sk[1:] != sk[:-1]])
        start_idx = np.flatnonzero(run_start)
        counts = np.diff(np.concatenate([start_idx, [n_upd]]))
        cumcount = np.arange(n_upd) - np.repeat(start_idx, counts) + 1
        rev_upd = np.empty(n_upd, dtype=np.int64)
        rev_upd[order] = cumcount
        rev[n_ins : n_ins + n_upd] = rev_upd

    # --- event time: increases with position, ±0.5 step jitter; an
    # out-of-order fraction of mutations is pushed 5–100 steps earlier.
    ts = (
        BASE_EPOCH_US
        + (pos * n_base * STEP_US).astype(np.int64)
        + rng.integers(-STEP_US // 2, STEP_US // 2, size=n_base)
    )
    n_mut = n_upd + n_del
    if n_mut and p_ooo > 0:
        mut_idx = np.arange(n_ins, n_base)
        late = rng.random(n_mut) < p_ooo
        ts[mut_idx[late]] -= rng.integers(5, 100, size=int(late.sum())) * STEP_US

    # --- payload (all vectorized: integer codes + Arrow string kernels;
    # scalar literals broadcast inside binary_join_element_wise).
    # Text is built in SLICES and kept as a chunked array: a single
    # Arrow `string` array is limited to 2 GiB of offsets, which a
    # 10^7-event log's text column exceeds.
    is_del = op_code == 2
    conv_names = np.array([f"conv-{i:08d}" for i in range(n_convs)])  # one per conv
    conv_id_arr = pa.array(conv_names[conv])
    vocab_idx = (conv * 131 + turn * 7) % len(_VOCAB)

    _SLICE = 4_000_000

    def _text_slice(lo: int, hi: int) -> pa.Array:
        txt = pc.binary_join_element_wise(
            pa.array(conv_names[conv[lo:hi]]),
            " turn ",
            pc.cast(pa.array(turn[lo:hi]), pa.string()),
            ": ",
            pc.take(pa.array(_VOCAB), pa.array(vocab_idx[lo:hi])),
            "",
        )
        if n_upd:
            r = rev[lo:hi]
            has_rev = r > 0
            if has_rev.any():
                txt = pc.if_else(
                    pa.array(has_rev),
                    pc.binary_join_element_wise(
                        txt, " [rev ", pc.cast(pa.array(r), pa.string()), "]", ""
                    ),
                    txt,
                )
        return pc.if_else(
            pa.array(is_del[lo:hi]), pa.nulls(hi - lo, pa.string()), txt
        )

    text_arr = pa.chunked_array(
        [_text_slice(i, min(i + _SLICE, n_base)) for i in range(0, n_base, _SLICE)]
    )

    tool_mask = ((conv * 13 + turn) % 11 == 0) & ~is_del
    role_code = np.where(turn == 0, np.where(conv % 7 == 0, 2, 0), turn % 2)
    role_code = np.where(tool_mask, 3, role_code).astype(np.int64)
    ROLE_ARR = pa.array(["user", "assistant", "system", "tool"])
    role_arr = pc.take(ROLE_ARR, pa.array(role_code, mask=is_del))
    tool_code = (conv + turn) % len(_TOOLS)
    tool_arr = pc.take(
        pa.array(list(_TOOLS)), pa.array(tool_code, mask=~tool_mask)
    )
    op_arr = pc.take(pa.array(list(VALID_OPS_ORDER)), pa.array(op_code.astype(np.int64)))
    ts_arr = pa.array(ts, pa.timestamp("us"))
    turn_arr = pa.array(turn, pa.int64())

    # --- duplicate delivery: copy payload+ts of an earlier event, new
    # offset strictly after the source.
    def _cat(a, b):
        chunks = []
        for x in (a, b):
            chunks.extend(x.chunks if isinstance(x, pa.ChunkedArray) else [x])
        return pa.chunked_array(chunks)

    def _gather_chunked(carr, idx: np.ndarray, slice_rows: int = 2_000_000):
        """take() for chunked string arrays whose TOTAL size exceeds the
        2 GiB single-array limit: pyarrow's take concatenates the input
        first, so gather per chunk instead and restore order per slice."""
        if isinstance(carr, pa.Array):
            return pa.chunked_array(
                [
                    pc.take(carr, pa.array(idx[i : i + slice_rows]))
                    for i in range(0, len(idx), slice_rows)
                ]
            )
        lens = np.array([len(c) for c in carr.chunks], dtype=np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        out = []
        for st in range(0, len(idx), slice_rows):
            sub = idx[st : st + slice_rows]
            cid = np.searchsorted(offs, sub, side="right") - 1
            local = sub - offs[cid]
            grouped_parts = []
            order_by_chunk = np.argsort(cid, kind="stable")
            for c in np.unique(cid):
                m = cid == c
                g = carr.chunk(int(c)).take(pa.array(local[m]))
                grouped_parts.append(
                    g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
                )
            grouped = (
                pa.concat_arrays(grouped_parts)
                if len(grouped_parts) > 1
                else grouped_parts[0]
            )
            perm = np.empty(len(cid), dtype=np.int64)
            perm[order_by_chunk] = np.arange(len(cid))
            out.append(grouped.take(pa.array(perm)))
        return pa.chunked_array(out)

    if n_dup:
        src = rng.integers(0, n_base, size=n_dup)
        src_arr = pa.array(src)
        op_arr = _cat(op_arr, pc.take(op_arr, src_arr))
        conv_id_arr = _cat(conv_id_arr, pc.take(conv_id_arr, src_arr))
        turn_arr = _cat(turn_arr, pc.take(turn_arr, src_arr))
        role_arr = _cat(role_arr, pc.take(role_arr, src_arr))
        text_arr = pa.chunked_array(
            list(text_arr.chunks) + list(_gather_chunked(text_arr, src).chunks)
        )
        tool_arr = _cat(tool_arr, pc.take(tool_arr, src_arr))
        ts_arr = _cat(ts_arr, pc.take(ts_arr, src_arr))
        pos = np.concatenate([pos, rng.uniform(pos[src], 1.0)])
        tool_mask = np.concatenate([tool_mask, tool_mask[src]])

    # --- total order by position -> offsets
    n = len(pos)
    order = np.argsort(pos, kind="stable")
    order_arr = pa.array(order)
    offsets = np.arange(n, dtype=np.int64)

    op_arr = pc.take(op_arr, order_arr)
    conv_id_arr = pc.take(conv_id_arr, order_arr)
    turn_arr = pc.take(turn_arr, order_arr)
    role_arr = pc.take(role_arr, order_arr)
    text_arr = _gather_chunked(text_arr, order)
    tool_arr = pc.take(tool_arr, order_arr)
    ts_arr = pc.take(ts_arr, order_arr)
    has_tool = tool_mask[order]

    # --- v2 columns (null until the evolution point; the writer decides
    # which segments expose them)
    tcid_all = pc.binary_join_element_wise(
        "call-", pa.array(np.char.zfill(offsets.astype("U12"), 12)), ""
    )
    targs_all = pc.binary_join_element_wise(
        '{"q": "step-', pc.cast(pa.array(offsets % 97), pa.string()), '"}', ""
    )
    null_str = pa.nulls(n, pa.string())
    has_tool_arr = pa.array(has_tool)
    tcid = pc.if_else(has_tool_arr, tcid_all, null_str)
    targs = pc.if_else(has_tool_arr, targs_all, null_str)

    return pa.table(
        {
            "offset": pa.array(offsets),
            "op": op_arr,
            "conv_id": conv_id_arr,
            "turn_idx": turn_arr,
            "role": role_arr,
            "text": text_arr,
            "tool": tool_arr,
            "ts": ts_arr,
            "tool_call_id": tcid,
            "tool_args": targs,
        }
    )



def write_wal(
    out_dir: str,
    log: pa.Table,
    segment_rows: int = 100_000,
    evolve_at: float | None = None,
) -> list[str]:
    """Write the log as WAL segment files ``wal/seg-{first_offset:012d}.parquet``.

    Segments whose first offset is below ``evolve_at * len(log)`` use the
    v1 schema (v2 columns dropped, turn_idx narrowed to int32); later
    segments use v2. ``evolve_at=None`` ⇒ all v1.
    """
    wal = os.path.join(out_dir, "wal")
    os.makedirs(wal, exist_ok=True)
    n = log.num_rows
    evolve_off = int(evolve_at * n) if evolve_at is not None else n + 1
    paths = []
    for start in range(0, n, segment_rows):
        seg = log.slice(start, segment_rows)
        first = seg.column("offset")[0].as_py()
        if first < evolve_off:
            seg = seg.drop_columns(["tool_call_id", "tool_args"])
            seg = seg.set_column(
                seg.schema.get_field_index("turn_idx"),
                pa.field("turn_idx", pa.int32(), nullable=False),
                seg.column("turn_idx").cast(pa.int32()),
            )
            seg = seg.cast(CHANGE_SCHEMA_V1)
        else:
            seg = seg.cast(CHANGE_SCHEMA_V2)
        path = os.path.join(wal, f"seg-{first:012d}.parquet")
        # several row groups per segment so read tasks can split a
        # segment (row-group stats still prune at the watermark)
        pq.write_table(seg, path, row_group_size=max(4096, segment_rows // 8))
        paths.append(path)
    return paths


def generate_wal(
    out_dir: str,
    n_events: int,
    seed: int = 42,
    segment_rows: int = 100_000,
    evolve_at: float | None = None,
    **kwargs,
) -> list[str]:
    """Generate + write in one call; returns segment paths."""
    log = generate_change_log(n_events, seed=seed, **kwargs)
    return write_wal(out_dir, log, segment_rows=segment_rows, evolve_at=evolve_at)


# --- test oracle -------------------------------------------------------------


def replay_oracle_pandas(log: pa.Table) -> pa.Table:
    """Sequential reference replay (SURVEY.md §2.3 X11): apply events one
    by one in offset order with last-writer-wins on (ts, offset); deletes
    tombstone the key when they win. Python loop — test-scale only."""
    df = log.to_pandas().sort_values("offset", kind="stable")
    state: dict[tuple, dict] = {}
    for row in df.itertuples(index=False):
        key = (row.conv_id, int(row.turn_idx))
        cur = state.get(key)
        stamp = (row.ts, row.offset)
        if cur is not None and stamp < (cur["ts"], cur["offset"]):
            continue  # a newer writer already holds the key
        state[key] = {
            "conv_id": row.conv_id,
            "turn_idx": int(row.turn_idx),
            "role": None if row.op == "delete" else row.role,
            "text": None if row.op == "delete" else row.text,
            "tool": None if row.op == "delete" else row.tool,
            "ts": row.ts,
            "offset": row.offset,
            "deleted": row.op == "delete",
        }
    rows = [v for v in state.values() if not v["deleted"]]
    rows.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    out = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return pa.table(
        {
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "turn_idx": pa.array(out["turn_idx"].astype("int64")),
            "role": pa.array(out["role"], pa.string()),
            "text": pa.array(out["text"], pa.string()),
            "tool": pa.array(out["tool"], pa.string()),
            "ts": pa.array(out["ts"]).cast(pa.timestamp("us")),
        }
    )


ORACLE_SQL = """
WITH ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx
      ORDER BY ts DESC, "offset" DESC) AS rn
  FROM {changes}
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role, text, tool, ts
FROM ranked WHERE rn = 1 AND op <> 'delete'
ORDER BY conv_id, turn_idx
"""
