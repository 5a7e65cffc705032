"""Streaming tumbling-window aggregation with event-time watermarks —
the continuous-query companion to the batch window ops
(functions/relational: event_windows / sliding windows).

Semantics (the standard streaming contract):

- events carry an event-time column; windows are fixed-width tumbling
  buckets of it (``floor(ts / width)``);
- the WATERMARK trails the maximum event time seen by
  ``allowed_lateness``: a window FINALIZES (emits once, immutably) when
  the watermark passes its end;
- events older than the watermark whose window already finalized are
  counted in ``late_dropped`` (never silently lost, never mutate an
  emitted result) — with ``allowed_lateness`` ≥ the stream's true
  disorder no event is ever late and the finalized stream equals the
  batch GROUP BY exactly (the oracle property).

Scale shape: state is sharded over an actor pool by key hash — each
actor holds only ITS keys' OPEN windows (O(keys/actor × open windows),
independent of stream length); batches route once (the tail exchange
pattern); the watermark is computed per wave on the driver (one max)
and broadcast with the feed call. Finalized rows stream out of the
actors as tiny tables; nothing re-reads history.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


@ray.remote(num_cpus=0)
class _WindowShardActor:
    """Open-window state for one key shard: (key, window_start) →
    (count, sum). ``feed`` folds a pre-aggregated partial table and
    finalizes every window whose end ≤ the watermark."""

    def __init__(self, width_us: int):
        self.width = int(width_us)
        self.open: dict = {}  # (key, wstart) -> [n, s]
        self.late_dropped = 0
        self.finalized_upto: int = -(2**62)  # window starts below are sealed

    def feed(self, partial: pa.Table, watermark_us: int) -> pa.Table:
        keys = partial.column("key").to_pylist()
        ws = partial.column("wstart").to_numpy(zero_copy_only=False)
        ns = partial.column("n").to_numpy(zero_copy_only=False)
        ss = partial.column("s").to_numpy(zero_copy_only=False)
        for k, w, n, s in zip(keys, ws, ns, ss):
            w = int(w)
            if w < self.finalized_upto:
                self.late_dropped += int(n)
                continue
            st = self.open.setdefault((k, w), [0, 0])
            st[0] += int(n)
            st[1] += int(s)
        # finalize: window [w, w+width) is complete once watermark >= end
        seal_below = (
            (int(watermark_us) - self.width) // self.width + 1
        ) * self.width  # first wstart whose end > watermark
        out_rows = [
            (k, w, st[0], st[1])
            for (k, w), st in self.open.items()
            if w + self.width <= int(watermark_us)
        ]
        for k, w, _, _ in out_rows:
            del self.open[(k, w)]
        self.finalized_upto = max(self.finalized_upto, seal_below)
        out_rows.sort()
        return pa.table(
            {
                "key": pa.array([r[0] for r in out_rows], pa.string()),
                "wstart": pa.array([r[1] for r in out_rows], pa.int64()),
                "n": pa.array([r[2] for r in out_rows], pa.int64()),
                "s": pa.array([r[3] for r in out_rows], pa.int64()),
            }
        )

    def drain(self) -> pa.Table:
        """Close every remaining open window (end of stream)."""
        rows = sorted((k, w, st[0], st[1]) for (k, w), st in self.open.items())
        self.open.clear()
        return pa.table(
            {
                "key": pa.array([r[0] for r in rows], pa.string()),
                "wstart": pa.array([r[1] for r in rows], pa.int64()),
                "n": pa.array([r[2] for r in rows], pa.int64()),
                "s": pa.array([r[3] for r in rows], pa.int64()),
            }
        )

    def stats(self) -> dict:
        return {"open_windows": len(self.open), "late_dropped": self.late_dropped}

    def dump_state(self):
        rows = sorted((k, w, st[0], st[1]) for (k, w), st in self.open.items())
        t = pa.table(
            {
                "key": pa.array([r[0] for r in rows], pa.string()),
                "wstart": pa.array([r[1] for r in rows], pa.int64()),
                "n": pa.array([r[2] for r in rows], pa.int64()),
                "s": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
        return t, {"late_dropped": self.late_dropped, "finalized_upto": self.finalized_upto}

    def load_state(self, t: pa.Table, meta: dict) -> bool:
        self.open = {}
        for k, w, n, s in zip(
            t.column("key").to_pylist(),
            t.column("wstart").to_pylist(),
            t.column("n").to_pylist(),
            t.column("s").to_pylist(),
        ):
            self.open[(k, int(w))] = [int(n), int(s)]
        self.late_dropped = int(meta["late_dropped"])
        self.finalized_upto = int(meta["finalized_upto"])
        return True


@ray.remote(num_cpus=0)
class _SessionShardActor:
    """Open gap-sessions for one key shard: per key a sorted list of
    [start, end, n] intervals. Each feed merges the wave's per-key
    mini-sessions in (bridging events can FUSE two open sessions — the
    interval merge handles it) and finalizes sessions no on-time event
    can ever extend: ``end + gap < watermark`` (an on-time event has
    ts ≥ watermark, which is > end + gap, so it would start a new
    session, never touch this one)."""

    def __init__(self, gap_us: int):
        self.gap = int(gap_us)
        self.open: dict = {}  # key -> list[[start, end, n]] sorted by start
        self.late_dropped = 0
        self.sealed_wm = -(2**62)  # watermark of the LAST finalize pass

    def feed(self, mini: pa.Table, watermark_us: int) -> pa.Table:
        keys = mini.column("key").to_pylist()
        starts = mini.column("start").to_numpy(zero_copy_only=False)
        ends = mini.column("end").to_numpy(zero_copy_only=False)
        ns = mini.column("n").to_numpy(zero_copy_only=False)
        by_key: dict = {}
        for k, st, en, n in zip(keys, starts, ends, ns):
            # POLICY: a mini-session wholly behind the PREVIOUS finalize
            # line (end + gap < sealed_wm) can only belong to sealed
            # territory — dropped and counted; sealed sessions stay
            # immutable. With lateness ≥ true disorder nothing ever
            # falls behind the line (the exactness theorem the tests pin).
            if int(en) + self.gap < self.sealed_wm:
                self.late_dropped += int(n)
                continue
            by_key.setdefault(k, []).append([int(st), int(en), int(n)])
        for k, newly in by_key.items():
            merged = sorted(self.open.get(k, []) + newly)
            out: list = []
            for st, en, n in merged:
                if out and st <= out[-1][1] + self.gap:
                    out[-1][1] = max(out[-1][1], en)
                    out[-1][2] += n
                else:
                    out.append([st, en, n])
            self.open[k] = out
        # finalize sealed sessions
        wm = int(watermark_us)
        rows = []
        for k in list(self.open):
            still = []
            for st, en, n in self.open[k]:
                if en + self.gap < wm:
                    rows.append((k, st, en, n))
                else:
                    still.append([st, en, n])
            if still:
                self.open[k] = still
            else:
                del self.open[k]
        self.sealed_wm = max(self.sealed_wm, wm)
        rows.sort()
        return pa.table(
            {
                "key": pa.array([r[0] for r in rows], pa.string()),
                "session_start": pa.array([r[1] for r in rows], pa.int64()),
                "session_end": pa.array([r[2] for r in rows], pa.int64()),
                "n": pa.array([r[3] for r in rows], pa.int64()),
            }
        )

    def drain(self) -> pa.Table:
        rows = sorted(
            (k, st, en, n) for k, ses in self.open.items() for st, en, n in ses
        )
        self.open.clear()
        return pa.table(
            {
                "key": pa.array([r[0] for r in rows], pa.string()),
                "session_start": pa.array([r[1] for r in rows], pa.int64()),
                "session_end": pa.array([r[2] for r in rows], pa.int64()),
                "n": pa.array([r[3] for r in rows], pa.int64()),
            }
        )

    def stats(self) -> dict:
        return {
            "open_sessions": sum(len(s) for s in self.open.values()),
            "late_dropped": self.late_dropped,
        }

    def dump_state(self):
        rows = sorted(
            (k, st, en, n) for k, ses in self.open.items() for st, en, n in ses
        )
        t = pa.table(
            {
                "key": pa.array([r[0] for r in rows], pa.string()),
                "start": pa.array([r[1] for r in rows], pa.int64()),
                "end": pa.array([r[2] for r in rows], pa.int64()),
                "n": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
        return t, {"late_dropped": self.late_dropped, "sealed_wm": self.sealed_wm}

    def load_state(self, t: pa.Table, meta: dict) -> bool:
        self.open = {}
        for k, st, en, n in zip(
            t.column("key").to_pylist(),
            t.column("start").to_pylist(),
            t.column("end").to_pylist(),
            t.column("n").to_pylist(),
        ):
            self.open.setdefault(k, []).append([int(st), int(en), int(n)])
        for k in self.open:
            self.open[k].sort()
        self.late_dropped = int(meta["late_dropped"])
        self.sealed_wm = int(meta["sealed_wm"])
        return True


class StreamingSessionizer:
    """Continuous gap-based sessionization: per wave, events reduce to
    per-key mini-sessions (vectorized sort + diff — the batch sessionize
    kernel applied wave-locally), which route to shard actors whose
    interval merge handles bridging and out-of-order arrival inside the
    lateness bound; sessions emit exactly once when the watermark passes
    ``end + gap``. With ``allowed_lateness`` ≥ the stream's disorder the
    emitted session multiset equals batch sessionization of the whole
    log."""

    def __init__(
        self,
        key_col: str,
        ts_col: str,
        gap_us: int,
        allowed_lateness_us: int = 0,
        num_shards: int = 8,
    ):
        self.key_col, self.ts_col = key_col, ts_col
        self.gap = int(gap_us)
        self.lateness = int(allowed_lateness_us)
        self.num_shards = num_shards
        self.actors = [_SessionShardActor.remote(self.gap) for _ in range(num_shards)]
        self.max_ts = -(2**62)

    def feed(self, batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "key": batch.column(self.key_col).to_pandas().astype(str),
                "ts": batch.column(self.ts_col)
                .cast(pa.timestamp("us"))
                .cast(pa.int64())
                .to_pandas(),
            }
        )
        if len(df):
            self.max_ts = max(self.max_ts, int(df["ts"].max()))
        watermark = self.max_ts - self.lateness
        # lateness is judged in the ACTORS against their previous
        # finalize line (intra-wave events must never be compared to the
        # watermark this same wave advances)
        s = df.sort_values(["key", "ts"], kind="mergesort").reset_index(drop=True)
        brk = (s["key"] != s["key"].shift()) | (s["ts"].diff() > self.gap)
        sid = brk.cumsum()
        mini = (
            s.groupby(sid, sort=False)
            .agg(key=("key", "first"), start=("ts", "min"), end=("ts", "max"), n=("ts", "size"))
            .reset_index(drop=True)
        )
        from ..stages.partition import hash_strings

        shard = (
            hash_strings(pa.array(mini["key"].to_numpy(object), pa.string()))
            % np.uint64(self.num_shards)
        ).astype(np.int64)
        refs = []
        for a in range(self.num_shards):
            part = mini[shard == a]
            t = pa.table(
                {
                    "key": pa.array(part["key"].to_numpy(object), pa.string()),
                    "start": pa.array(part["start"].to_numpy(np.int64), pa.int64()),
                    "end": pa.array(part["end"].to_numpy(np.int64), pa.int64()),
                    "n": pa.array(part["n"].to_numpy(np.int64), pa.int64()),
                }
            )
            refs.append(self.actors[a].feed.remote(t, watermark))
        outs = [t for t in ray.get(refs) if t.num_rows]
        return pa.concat_tables(outs) if outs else self._empty()

    def feed_dataset(self, ds: ray.data.Dataset) -> pa.Table:
        """Distributed wave (the feed_dataset contract of
        StreamingWindowSession, session flavor): each task builds its
        batch's mini-sessions and routes them shard-wise with the
        NEVER-finalize watermark; the driver sees only one max-ts row
        per task and runs a single finalize round. Task batch
        boundaries simply produce more mini-sessions — the actors'
        interval merge fuses them, so the result equals feed() of the
        same rows."""
        key_col, ts_col, gap = self.key_col, self.ts_col, self.gap
        num_shards, actors = self.num_shards, self.actors
        NEG = -(2**62)

        def route(batch: pa.Table) -> pa.Table:
            from ..stages.partition import hash_strings

            df = pd.DataFrame(
                {
                    "key": batch.column(key_col).to_pandas().astype(str),
                    "ts": batch.column(ts_col)
                    .cast(pa.timestamp("us"))
                    .cast(pa.int64())
                    .to_pandas(),
                }
            )
            s = df.sort_values(["key", "ts"], kind="mergesort").reset_index(drop=True)
            brk = (s["key"] != s["key"].shift()) | (s["ts"].diff() > gap)
            mini = (
                s.groupby(brk.cumsum(), sort=False)
                .agg(key=("key", "first"), start=("ts", "min"), end=("ts", "max"), n=("ts", "size"))
                .reset_index(drop=True)
            )
            shard = (
                hash_strings(pa.array(mini["key"].to_numpy(object), pa.string()))
                % np.uint64(num_shards)
            ).astype(np.int64)
            refs = []
            for a in range(num_shards):
                part = mini[shard == a]
                t = pa.table(
                    {
                        "key": pa.array(part["key"].to_numpy(object), pa.string()),
                        "start": pa.array(part["start"].to_numpy(np.int64), pa.int64()),
                        "end": pa.array(part["end"].to_numpy(np.int64), pa.int64()),
                        "n": pa.array(part["n"].to_numpy(np.int64), pa.int64()),
                    }
                )
                refs.append(actors[a].feed.remote(t, NEG))
            ray.get(refs)
            mx = int(df["ts"].max()) if len(df) else NEG
            return pa.table({"mx": pa.array([mx], pa.int64())})

        maxes = ds.map_batches(route, batch_format="pyarrow", max_retries=0).to_pandas()
        if len(maxes):
            self.max_ts = max(self.max_ts, int(maxes["mx"].max()))
        watermark = self.max_ts - self.lateness
        empty_mini = pa.table(
            {
                "key": pa.array([], pa.string()),
                "start": pa.array([], pa.int64()),
                "end": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        outs = [
            t
            for t in ray.get(
                [a.feed.remote(empty_mini, watermark) for a in self.actors]
            )
            if t.num_rows
        ]
        return pa.concat_tables(outs) if outs else self._empty()

    @staticmethod
    def _empty() -> pa.Table:
        return pa.table(
            {
                "key": pa.array([], pa.string()),
                "session_start": pa.array([], pa.int64()),
                "session_end": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )

    def drain(self) -> pa.Table:
        outs = [t for t in ray.get([a.drain.remote() for a in self.actors]) if t.num_rows]
        return pa.concat_tables(outs) if outs else self._empty()

    def stats(self) -> dict:
        per = ray.get([a.stats.remote() for a in self.actors])
        return {
            "open_sessions": sum(p["open_sessions"] for p in per),
            "late_dropped": sum(p["late_dropped"] for p in per),
        }

    def checkpoint(self, ckpt_dir: str) -> dict:
        """Persist open sessions + the watermark clock (same contract
        as StreamingWindowSession.checkpoint)."""
        import json as _json
        import os as _os

        import pyarrow.parquet as _pq

        _os.makedirs(ckpt_dir, exist_ok=True)
        states = ray.get([a.dump_state.remote() for a in self.actors])
        metas = []
        for i, (t, meta) in enumerate(states):
            path = _os.path.join(ckpt_dir, f"shard-{i:03d}.parquet")
            tmp = f"{path}.tmp"
            _pq.write_table(t, tmp)
            _os.replace(tmp, path)
            metas.append(meta)
        m = {
            "kind": "sessions",
            "gap_us": self.gap,
            "lateness_us": self.lateness,
            "num_shards": self.num_shards,
            "max_ts": self.max_ts,
            "shards": metas,
        }
        tmp = _os.path.join(ckpt_dir, ".meta.tmp")
        with open(tmp, "w") as f:
            _json.dump(m, f)
            f.flush()
            _os.fsync(f.fileno())
        _os.replace(tmp, _os.path.join(ckpt_dir, "meta.json"))
        return {"shards": self.num_shards, "open_sessions": sum(s.num_rows for s, _ in states)}

    @classmethod
    def restore(cls, ckpt_dir: str, key_col: str, ts_col: str):
        import json as _json
        import os as _os

        import pyarrow.parquet as _pq

        with open(_os.path.join(ckpt_dir, "meta.json")) as f:
            m = _json.load(f)
        sess = cls(
            key_col,
            ts_col,
            gap_us=m["gap_us"],
            allowed_lateness_us=m["lateness_us"],
            num_shards=m["num_shards"],
        )
        sess.max_ts = int(m["max_ts"])
        refs = []
        for i, meta in enumerate(m["shards"]):
            t = _pq.read_table(_os.path.join(ckpt_dir, f"shard-{i:03d}.parquet"))
            refs.append(sess.actors[i].load_state.remote(t, meta))
        ray.get(refs)
        return sess

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []


class StreamingWindowSession:
    """Continuous tumbling-window count+sum per key over an arriving
    stream of Arrow batches.

    ``feed(batch)`` pre-aggregates the batch to (key, window) partials
    (vectorized — the exchange ships per-batch partials, never rows),
    routes each shard's slice to its actor with the advanced watermark,
    and returns any windows finalized by this wave. ``drain()`` closes
    the rest. Exactly-once per window: a (key, wstart) row is emitted
    by precisely one feed/drain call."""

    def __init__(
        self,
        key_col: str,
        ts_col: str,
        value_col: str,
        width_us: int,
        allowed_lateness_us: int = 0,
        num_shards: int = 8,
    ):
        self.key_col, self.ts_col, self.value_col = key_col, ts_col, value_col
        self.width = int(width_us)
        self.lateness = int(allowed_lateness_us)
        self.num_shards = num_shards
        self.actors = [_WindowShardActor.remote(self.width) for _ in range(num_shards)]
        self.max_ts = -(2**62)

    def _partials(self, batch: pa.Table) -> tuple[pd.DataFrame, int]:
        df = pd.DataFrame(
            {
                "key": batch.column(self.key_col).to_pandas().astype(str),
                "ts": batch.column(self.ts_col)
                .cast(pa.timestamp("us"))
                .cast(pa.int64())
                .to_pandas(),
                "v": batch.column(self.value_col).to_pandas().astype("int64"),
            }
        )
        df["wstart"] = (df["ts"] // self.width) * self.width
        g = (
            df.groupby(["key", "wstart"], as_index=False)
            .agg(n=("v", "size"), s=("v", "sum"))
            .astype({"n": "int64", "s": "int64"})
        )
        return g, int(df["ts"].max()) if len(df) else self.max_ts

    def feed(self, batch: pa.Table) -> pa.Table:
        g, mx = self._partials(batch)
        self.max_ts = max(self.max_ts, mx)
        watermark = self.max_ts - self.lateness
        from ..stages.partition import hash_strings

        shard = (
            hash_strings(pa.array(g["key"].to_numpy(object), pa.string()))
            % np.uint64(self.num_shards)
        ).astype(np.int64)
        refs = []
        for a in range(self.num_shards):
            part = g[shard == a]
            t = pa.table(
                {
                    "key": pa.array(part["key"].to_numpy(object), pa.string()),
                    "wstart": pa.array(part["wstart"].to_numpy(np.int64), pa.int64()),
                    "n": pa.array(part["n"].to_numpy(np.int64), pa.int64()),
                    "s": pa.array(part["s"].to_numpy(np.int64), pa.int64()),
                }
            )
            refs.append(self.actors[a].feed.remote(t, watermark))
        outs = [t for t in ray.get(refs) if t.num_rows]
        return (
            pa.concat_tables(outs)
            if outs
            else pa.table(
                {
                    "key": pa.array([], pa.string()),
                    "wstart": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        )

    def feed_dataset(self, ds: ray.data.Dataset) -> pa.Table:
        """Distributed wave: partials are computed INSIDE map_batches
        tasks and routed straight to the shard actors; only one max-ts
        marker row per task returns to the driver, which then advances
        the watermark in a single finalize round. Identical result to
        feeding the same rows through ``feed()`` — finalization happens
        once per wave after every partial has landed, so intra-wave
        order is irrelevant. Routing runs with ``max_retries=0`` (a
        retried route would double-apply partials to stateful actors);
        callers retry the whole wave, whose sealed output is
        exactly-once either way."""
        key_col, ts_col, value_col = self.key_col, self.ts_col, self.value_col
        width, num_shards, actors = self.width, self.num_shards, self.actors
        NEG = -(2**62)

        def route(batch: pa.Table) -> pa.Table:
            from ..stages.partition import hash_strings

            df = pd.DataFrame(
                {
                    "key": batch.column(key_col).to_pandas().astype(str),
                    "ts": batch.column(ts_col)
                    .cast(pa.timestamp("us"))
                    .cast(pa.int64())
                    .to_pandas(),
                    "v": batch.column(value_col).to_pandas().astype("int64"),
                }
            )
            df["wstart"] = (df["ts"] // width) * width
            g = (
                df.groupby(["key", "wstart"], as_index=False)
                .agg(n=("v", "size"), s=("v", "sum"))
                .astype({"n": "int64", "s": "int64"})
            )
            shard = (
                hash_strings(pa.array(g["key"].to_numpy(object), pa.string()))
                % np.uint64(num_shards)
            ).astype(np.int64)
            refs = []
            for a in range(num_shards):
                part = g[shard == a]
                t = pa.table(
                    {
                        "key": pa.array(part["key"].to_numpy(object), pa.string()),
                        "wstart": pa.array(part["wstart"].to_numpy(np.int64), pa.int64()),
                        "n": pa.array(part["n"].to_numpy(np.int64), pa.int64()),
                        "s": pa.array(part["s"].to_numpy(np.int64), pa.int64()),
                    }
                )
                # watermark NEG: apply only, never finalize mid-wave
                refs.append(actors[a].feed.remote(t, NEG))
            ray.get(refs)  # ack = backpressure
            mx = int(df["ts"].max()) if len(df) else NEG
            return pa.table({"mx": pa.array([mx], pa.int64())})

        maxes = ds.map_batches(route, batch_format="pyarrow", max_retries=0).to_pandas()
        if len(maxes):
            self.max_ts = max(self.max_ts, int(maxes["mx"].max()))
        watermark = self.max_ts - self.lateness
        empty = pa.table(
            {
                "key": pa.array([], pa.string()),
                "wstart": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            }
        )
        outs = [
            t
            for t in ray.get([a.feed.remote(empty, watermark) for a in self.actors])
            if t.num_rows
        ]
        return pa.concat_tables(outs) if outs else empty

    def drain(self) -> pa.Table:
        outs = [t for t in ray.get([a.drain.remote() for a in self.actors]) if t.num_rows]
        if not outs:
            return pa.table(
                {
                    "key": pa.array([], pa.string()),
                    "wstart": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(outs)

    def stats(self) -> dict:
        per = ray.get([a.stats.remote() for a in self.actors])
        return {
            "open_windows": sum(p["open_windows"] for p in per),
            "late_dropped": sum(p["late_dropped"] for p in per),
        }

    def checkpoint(self, ckpt_dir: str) -> dict:
        """Persist all open-window state + the watermark clock to
        ``ckpt_dir`` (one parquet per shard + meta.json, temp+rename —
        a crash mid-checkpoint leaves the previous checkpoint intact).
        Call between waves; a restored session continues exactly where
        this one stopped (the streaming fault-tolerance contract the
        CDC tail gets from its manifest)."""
        import json as _json
        import os as _os

        import pyarrow.parquet as _pq

        _os.makedirs(ckpt_dir, exist_ok=True)
        states = ray.get([a.dump_state.remote() for a in self.actors])
        metas = []
        for i, (t, meta) in enumerate(states):
            path = _os.path.join(ckpt_dir, f"shard-{i:03d}.parquet")
            tmp = f"{path}.tmp"
            _pq.write_table(t, tmp)
            _os.replace(tmp, path)
            metas.append(meta)
        m = {
            "kind": "window",
            "width_us": self.width,
            "lateness_us": self.lateness,
            "num_shards": self.num_shards,
            "max_ts": self.max_ts,
            "shards": metas,
        }
        tmp = _os.path.join(ckpt_dir, ".meta.tmp")
        with open(tmp, "w") as f:
            _json.dump(m, f)
            f.flush()
            _os.fsync(f.fileno())
        _os.replace(tmp, _os.path.join(ckpt_dir, "meta.json"))
        return {"shards": self.num_shards, "open_windows": sum(s.num_rows for s, _ in states)}

    @classmethod
    def restore(cls, ckpt_dir: str, key_col: str, ts_col: str, value_col: str):
        """Rebuild a session from :meth:`checkpoint` output."""
        import json as _json
        import os as _os

        import pyarrow.parquet as _pq

        with open(_os.path.join(ckpt_dir, "meta.json")) as f:
            m = _json.load(f)
        sess = cls(
            key_col,
            ts_col,
            value_col,
            width_us=m["width_us"],
            allowed_lateness_us=m["lateness_us"],
            num_shards=m["num_shards"],
        )
        sess.max_ts = int(m["max_ts"])
        refs = []
        for i, meta in enumerate(m["shards"]):
            t = _pq.read_table(_os.path.join(ckpt_dir, f"shard-{i:03d}.parquet"))
            refs.append(sess.actors[i].load_state.remote(t, meta))
        ray.get(refs)
        return sess

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
