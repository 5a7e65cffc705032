"""Distributed ordered prefix sum (global scan) and sequence packing.

Reference analog: none — wprdc-etl (SURVEY.md §2.1) has no ordered
aggregate of any kind. These are the "concat-then-chunk" packing
primitives a training-data pipeline needs: concatenate a corpus in a
deterministic document order and split it into fixed token-budget
chunks (bins), so each bin can become one training sequence.

The hard part at 100 TB is the ORDERED global cumulative sum — a naive
implementation sorts the whole corpus and scans it on one machine. The
scalable shape used here is the classic three-phase distributed scan:

1. **Range boundaries** — a deterministic hash-sample of the order key
   (a few thousand values on the driver, O(num_ranges) retained) gives
   quantile cut points; every row maps to a contiguous key range with
   one vectorized ``np.searchsorted`` per batch. No shuffle.
2. **Per-range totals** — ``grouped_agg`` partial pre-aggregation: each
   batch collapses to at most ``num_ranges`` partial rows before the
   tiny shuffle; the driver holds ONE int per range and computes the
   exclusive range offsets.
3. **Per-range scan** — one bucketed exchange co-locates each range,
   the in-bucket kernel sorts its range by the order key and emits
   ``offset[range] + local cumulative sum``. Each task touches
   O(N / num_ranges) rows; nothing materializes globally.

Determinism: the order column must be a UNIQUE key (e.g. ``doc_id``) —
ties would make "the" prefix sum ambiguous in any engine. Membership
and boundaries derive from md5 hashes, so re-runs, repartitioning and
the DuckDB oracle (``SUM(...) OVER (ORDER BY key)``) all agree exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .relational import _planned_rows, bucketed_group_map, grouped_agg

__all__ = [
    "range_boundaries",
    "ordered_prefix_sum",
    "seq_pack",
    "shuffle_rank",
    "exact_quantiles",
    "chunk_docs",
]


def range_boundaries(
    ds: ray.data.Dataset,
    order_col: str,
    num_ranges: int,
    planned_rows: int | None = None,
    sample_target: int | None = None,
) -> list:
    """Quantile cut points for ``order_col`` from a deterministic
    strided systematic sample (``num_ranges - 1`` values kept on the
    driver; every batch contributes ~evenly, no hashing in the scan).

    Boundary QUALITY only affects balance, never correctness — ranges
    are disjoint key intervals whatever the cuts are, so the scan's
    result is boundary-independent (property-tested)."""
    if num_ranges < 2:
        return []
    n = planned_rows if planned_rows is not None else _planned_rows(ds)
    if n is None:
        n = ds.count()
    target = sample_target or max(num_ranges * 64, 4096)
    stride = max(1, int(n) // target)

    def sample(batch: pa.Table) -> pa.Table:
        keys = batch.column(order_col).to_numpy(zero_copy_only=False)
        return pa.table({order_col: pa.array(keys[::stride])})

    picked = (
        ds.select_columns([order_col])
        .map_batches(sample, batch_format="pyarrow")
        .take_all()
    )
    vals = sorted(r[order_col] for r in picked)
    if not vals:
        return []
    cuts = []
    for i in range(1, num_ranges):
        c = vals[min(i * len(vals) // num_ranges, len(vals) - 1)]
        if not cuts or c > cuts[-1]:
            cuts.append(c)
    return cuts


def ordered_prefix_sum(
    ds: ray.data.Dataset,
    order_col: str,
    value_col: str,
    num_ranges: int = 64,
    num_buckets: int = 64,
    planned_rows: int | None = None,
    keep_cols: list[str] | None = None,
    cache: bool = True,
) -> ray.data.Dataset:
    """Exclusive global prefix sum of ``value_col`` in ``order_col``
    order: emits ``(order_col, value_col, pre_sum)`` (plus any
    ``keep_cols`` passed through) where ``pre_sum`` is the sum of
    ``value_col`` over all rows strictly before this row in ascending
    unique-key order. Three-phase distributed scan — see the module
    docstring for the scale shape.

    ``cache=True`` materializes the NARROW projection once in the
    (spillable) object store: the scan inherently consumes its input
    three times (boundary sample, range totals, routed scan), and Ray
    Datasets are lazy — without the cache the whole upstream plan
    (reads, groupbys, hashing) re-executes per consumption (measured
    3.9× on the quantile query). The cached footprint is only the
    projected scan columns, not the caller's full table."""
    keep_cols = keep_cols or []
    narrow = ds.select_columns([order_col, value_col] + keep_cols)
    if cache:
        narrow = narrow.materialize()
    cuts = range_boundaries(narrow, order_col, num_ranges, planned_rows)

    def add_range(batch: pa.Table) -> pa.Table:
        keys = batch.column(order_col).to_numpy(zero_copy_only=False)
        if cuts:
            if np.issubdtype(keys.dtype, np.number):
                rng = np.searchsorted(np.asarray(cuts), keys, side="right")
            else:
                try:
                    # fixed-width byte strings: vectorized C memcmp
                    # ordering, identical to Python/SQL lexicographic
                    # order for ASCII keys
                    kb = keys.astype("S")
                    cb = np.asarray(cuts, dtype="S")
                    width = max(kb.dtype.itemsize, cb.dtype.itemsize)
                    rng = np.searchsorted(
                        cb.astype(f"S{width}"), kb.astype(f"S{width}"), side="right"
                    )
                except (UnicodeEncodeError, TypeError):
                    rng = np.searchsorted(
                        np.asarray(cuts, dtype=object), keys, side="right"
                    )
        else:
            rng = np.zeros(len(keys), dtype=np.int64)
        return batch.append_column("_range", pa.array(rng, pa.int64()))

    ranged = narrow.map_batches(add_range, batch_format="pyarrow")

    # phase 2: per-range totals (partial pre-agg; driver holds one
    # int64 per range — O(num_ranges), never O(rows))
    totals = grouped_agg(ranged, ["_range"], [(value_col, "sum", "_total")]).to_pandas()
    totals = totals.sort_values("_range")
    offsets = dict(
        zip(
            totals["_range"].to_numpy(),
            np.concatenate([[0], np.cumsum(totals["_total"].to_numpy())[:-1]]),
        )
    )

    # phase 3: co-locate each range, sort it, scan it
    def scan(bucket: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for rng, g in bucket.groupby("_range", sort=False):
            g = g.sort_values(order_col, kind="mergesort")
            v = g[value_col].to_numpy(dtype=np.int64)
            pre = int(offsets.get(rng, 0)) + (np.cumsum(v) - v)
            cols = {
                order_col: g[order_col].to_numpy(),
                value_col: v,
                "pre_sum": pre,
            }
            for c in keep_cols:
                cols[c] = g[c].to_numpy()
            outs.append(pd.DataFrame(cols))
        if not outs:
            empty = {order_col: [], value_col: [], "pre_sum": []}
            empty.update({c: [] for c in keep_cols})
            return pd.DataFrame(empty).astype(
                {value_col: np.int64, "pre_sum": np.int64}
            )
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_map(
        ranged,
        ["_range"],
        scan,
        num_buckets=num_buckets,
        planned_rows=planned_rows,
    )


def seq_pack(
    ds: ray.data.Dataset,
    budget: int,
    order_col: str = "doc_id",
    num_ranges: int = 64,
    planned_rows: int | None = None,
) -> ray.data.Dataset:
    """Concat-then-chunk sequence packing: lay the corpus out in
    ``order_col`` order and assign each document to the fixed
    token-budget bin its first token falls in —
    ``bin = pre_tokens // budget`` over the whitespace token count.
    Emits ``(doc_id, n_tokens, pre_tokens, bin)``; a downstream writer
    can group by ``bin`` to emit one training sequence per bin.

    Documents straddling a bin boundary belong to the bin where they
    START (the splitter duplicates the tail into the next sequence or
    truncates — a policy choice outside this operator). The whole
    assignment is one distributed scan; no stage holds more than
    O(N / num_ranges) rows or O(num_ranges) driver state."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from .text import token_stats

    counted = ds.map_batches(token_stats, batch_format="pyarrow").select_columns(
        [order_col, "n_tokens"]
    )
    ps = ordered_prefix_sum(
        counted, order_col, "n_tokens", num_ranges=num_ranges, planned_rows=planned_rows
    )

    def binned(batch: pa.Table) -> pa.Table:
        pre = batch.column("pre_sum").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                order_col: batch.column(order_col),
                "n_tokens": batch.column("n_tokens"),
                "pre_tokens": batch.column("pre_sum"),
                "bin": pa.array(pre // budget, pa.int64()),
            }
        )

    return ps.map_batches(binned, batch_format="pyarrow")


def shuffle_rank(
    ds: ray.data.Dataset,
    key_col: str = "doc_id",
    num_ranges: int = 64,
    planned_rows: int | None = None,
) -> ray.data.Dataset:
    """Deterministic global shuffle POSITION for training order: every
    row gets ``pos`` = its rank under the md5 hash of its key — a
    reproducible full-corpus permutation with no RNG and no seed state
    (the training-data "shuffle the corpus" staple, expressed so that
    re-runs, resumed jobs and the SQL oracle all agree row-for-row).

    Emits ``(key_col, pos)``. A writer can then range-partition on
    ``pos`` to lay shuffled shards on disk. Cost: one distributed scan
    (rank = prefix COUNT ordered by the hash) — no global sort of the
    payload; only (key, 8-byte hash) rows move. Collisions: two keys
    sharing a 64-bit md5 prefix would make the rank ambiguous
    (probability ~n²/2^65 — negligible below ~10^8 rows; above that,
    widen the hash)."""
    from .hashing import md5_word_hashes

    def add_hash(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = md5_word_hashes(np.asarray([str(k) for k in keys], dtype=object))
        return pa.table(
            {
                key_col: batch.column(key_col),
                "_h": pa.array(h, pa.uint64()),
                "_one": pa.array(np.ones(len(keys), np.int64)),
            }
        )

    hashed = ds.select_columns([key_col]).map_batches(
        add_hash, batch_format="pyarrow"
    )
    ps = ordered_prefix_sum(
        hashed,
        "_h",
        "_one",
        num_ranges=num_ranges,
        planned_rows=planned_rows,
        keep_cols=[key_col],
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch.column(key_col),
                "pos": batch.column("pre_sum"),
            }
        )

    return ps.map_batches(finish, batch_format="pyarrow")


def exact_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: list[float],
    num_ranges: int = 64,
    planned_rows: int | None = None,
) -> pa.Table:
    """EXACT global quantiles of a column at any scale — no sketch, no
    sampling error, no single-node sort. Shape: per-batch value counts
    collapse the corpus to its DISTINCT values (partial pre-agg), the
    distributed scan ranks them, and each requested quantile selects
    the unique value whose cumulative-count interval contains its
    target rank ``max(0, ceil(q*n) - 1)`` (DuckDB ``quantile_disc``
    convention, probed empirically). Data moved ≈ O(distinct values);
    driver holds only the len(qs)-row result.

    ``qs`` should be exact binary fractions (0.5, 0.25, 0.875, …) so
    ``ceil(q*n)`` is float-exact in every engine. Returns a small
    ``pa.Table (q: float64, value: int64)`` sorted by q."""
    import math

    # distinct-value counts through the warm DIRECT exchange with a
    # count-sum combiner: near-unique value domains make Ray's
    # sort-based groupby the bottleneck (measured 13.2 s vs 4.5 s at
    # 600 k rows / ~500 k distinct), and the pre_reduce keeps receiver
    # memory O(distinct/actor)
    def partial_counts(batch: pa.Table) -> pa.Table:
        g = batch.select([col]).group_by([col]).aggregate([([], "count_all")])
        return g.rename_columns([col, "_cnt"])

    def sum_counts(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(col, as_index=False, sort=False)["_cnt"].sum()

    partials = ds.map_batches(partial_counts, batch_format="pyarrow")
    counts = bucketed_group_map(
        partials, [col], sum_counts, num_buckets=32, pre_reduce=sum_counts
    ).materialize()
    # n from the materialized counts — ds.count() would re-execute the
    # caller's whole upstream plan a second time
    n = planned_rows if planned_rows is not None else int(counts.sum("_cnt"))
    targets = [(float(q), max(0, math.ceil(q * n) - 1)) for q in qs]
    ps = ordered_prefix_sum(
        counts, col, "_cnt", num_ranges=num_ranges, planned_rows=None
    )

    def pick(batch: pa.Table) -> pa.Table:
        pre = batch.column("pre_sum").to_numpy(zero_copy_only=False)
        cnt = batch.column("_cnt").to_numpy(zero_copy_only=False)
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        out_q, out_v = [], []
        for q, t in targets:  # len(qs) is tiny
            hit = np.flatnonzero((pre <= t) & (t < pre + cnt))
            if hit.size:
                out_q.append(q)
                out_v.append(vals[hit[0]])
        return pa.table(
            {
                "q": pa.array(out_q, pa.float64()),
                "value": pa.array(np.asarray(out_v, np.int64), pa.int64()),
            }
        )

    rows = ps.map_batches(pick, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["q"])
    return pa.table(
        {
            "q": pa.array([r["q"] for r in rows], pa.float64()),
            "value": pa.array([r["value"] for r in rows], pa.int64()),
        }
    )


def approx_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: list[float],
    k_per_block: int = 256,
    num_ranges: int = 64,
) -> pa.Table:
    """Approximate quantiles with a ONE-LEVEL mergeable summary and a
    provable rank bound — the regime :func:`exact_quantiles` cannot
    cover: continuous/near-unique value domains where distinct ≈ N
    makes its O(distinct) exchange O(N).

    Each block reduces to ≤ ``k_per_block`` weighted points — its own
    exact strided quantiles at run midpoints, each carrying weight
    n_block/k — so a block's weighted CDF deviates from its true CDF by
    at most n_block/(2k) ranks everywhere, and the UNION of summaries
    (a flat merge, no compaction chain, so errors add once, never
    compound) deviates by at most Σ n_i/(2k) = N/(2k). The value picked
    for q therefore has true rank within q·N ± N/k (conservative; the
    property test asserts this bound across partitionings). Data moved:
    blocks·k rows; the fold reuses the distributed prefix-sum scan.

    Returns ``pa.Table (q: float64, value: float64)`` sorted by q."""
    import pyarrow.compute as _pc

    def summarize(t: pa.Table) -> pa.Table:
        arr = t.column(col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        arr = arr.drop_null().cast(pa.float64())
        v = np.sort(arr.to_numpy(zero_copy_only=False))
        n = len(v)
        if n == 0:
            return pa.table(
                {"v": pa.array([], pa.float64()), "w": pa.array([], pa.float64())}
            )
        k = min(k_per_block, n)
        idx = np.minimum(((np.arange(k) + 0.5) * n / k).astype(np.int64), n - 1)
        return pa.table(
            {
                "v": pa.array(v[idx]),
                "w": pa.array(np.full(k, n / k, np.float64)),
            }
        )

    summary = ds.map_batches(summarize, batch_format="pyarrow")

    # distinct-v weight fold (duplicate v across blocks merge here) so
    # the prefix-sum scan sees a unique ascending key
    def fold(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("v", as_index=False, sort=False)["w"].sum()

    counts = bucketed_group_map(
        summary, ["v"], fold, num_buckets=32, pre_reduce=fold
    ).materialize()
    total = float(counts.sum("w"))
    if total == 0:
        return pa.table({"q": pa.array([], pa.float64()), "value": pa.array([], pa.float64())})
    targets = [(float(q), min(q * total, total)) for q in qs]

    ps = ordered_prefix_sum(counts, "v", "w", num_ranges=num_ranges)

    def pick(batch: pa.Table) -> pa.Table:
        pre = batch.column("pre_sum").to_numpy(zero_copy_only=False)
        w = batch.column("w").to_numpy(zero_copy_only=False)
        vals = batch.column("v").to_numpy(zero_copy_only=False)
        out_q, out_v = [], []
        for q, t in targets:  # len(qs) is tiny
            hit = np.flatnonzero((pre <= t) & (t < pre + w))
            if hit.size:
                out_q.append(q)
                out_v.append(float(vals[hit[0]]))
        return pa.table(
            {
                "q": pa.array(out_q, pa.float64()),
                "value": pa.array(out_v, pa.float64()),
            }
        )

    rows = ps.map_batches(pick, batch_format="pyarrow").take_all()
    got = {r["q"]: r["value"] for r in rows}
    # q=1.0 (t == total) falls past every half-open interval: it is the
    # summary's max value by definition
    for q, t in targets:
        if q not in got and t >= total:
            got[q] = float(counts.max("v"))
    out = sorted(got.items())
    return pa.table(
        {
            "q": pa.array([q for q, _ in out], pa.float64()),
            "value": pa.array([v for _, v in out], pa.float64()),
        }
    )


def chunk_docs(
    ds: ray.data.Dataset,
    max_tokens: int = 32,
    overlap: int = 8,
) -> ray.data.Dataset:
    """Split documents into fixed-token training chunks with overlap —
    the standard long-document → context-window preparation. Chunk i of
    a doc covers tokens ``[i·stride, i·stride + max_tokens)`` with
    ``stride = max_tokens − overlap``; every token position starts a
    chunk while it is a valid start (``i·stride < n_tokens``), the last
    chunk may be short, zero-token docs emit no chunks. Output rows:
    (doc_id, chunk_idx, chunk_text, n_chunk_tokens) with chunk text
    single-space-joined (separator-normalized, matching the oracle's
    ``array_to_string(t[a:b], ' ')``).

    Purely batch-local (a flat_map shape — no shuffle, output rows ≈
    input tokens / stride). The offset arithmetic is fully vectorized;
    the only per-CHUNK work is one C substring copy from the doc's
    space-joined text, computed from cumulative word-length tables."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap

    def chunks(batch: pd.DataFrame) -> pd.DataFrame:
        return chunk_batch(batch, max_tokens, stride)

    return ds.map_batches(chunks, batch_format="pandas")


def chunk_batch(batch: pd.DataFrame, max_tokens: int, stride: int) -> pd.DataFrame:
    """The pure per-batch chunking kernel behind ``chunk_docs``
    (exported for direct property testing)."""
    from .hashing import split_flat

    flat, lens = split_flat(batch["text"])
    D = len(batch)
    n = lens.astype(np.int64)
    m = np.where(n > 0, (n - 1) // stride + 1, 0)  # chunks per doc
    total = int(m.sum())
    if total == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "chunk_idx": pd.Series([], dtype="int64"),
                "chunk_text": pd.Series([], dtype=object),
                "n_chunk_tokens": pd.Series([], dtype="int64"),
            }
        )
    # per-word char start within each doc's single-space join:
    # P[word] = cumulative (len + 1) within the doc
    wl = pd.Series(flat, dtype=object).str.len().to_numpy(dtype=np.int64)
    doc_starts = np.concatenate([[0], np.cumsum(n)[:-1]])
    gcum = np.concatenate([[0], np.cumsum(wl + 1)])  # global, incl sep
    # char offset of word w within its doc = gcum[w] - gcum[doc_start]
    doc_of = np.repeat(np.arange(D), m)
    first = np.concatenate([[0], np.cumsum(m)[:-1]])
    ci = np.arange(total) - first[doc_of]  # chunk_idx
    ws = ci * stride  # first word (doc-relative)
    we = np.minimum(ws + max_tokens, n[doc_of])  # one past last word
    gs = doc_starts[doc_of] + ws  # global word indices
    ge = doc_starts[doc_of] + we
    cs = gcum[gs] - gcum[doc_starts[doc_of]]
    ce = gcum[ge] - gcum[doc_starts[doc_of]] - 1  # drop trailing sep
    joined = [" ".join(w) for w in batch["text"].fillna("").str.split()]
    texts = [joined[d][a:b] for d, a, b in zip(doc_of, cs, ce)]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"].to_numpy()[doc_of],
            "chunk_idx": ci,
            "chunk_text": texts,
            "n_chunk_tokens": (we - ws).astype(np.int64),
        }
    )


def seq_pack_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    token_col: str,
    budget: int,
) -> ray.data.Dataset:
    """Per-group sequence packing: ``bin = exclusive-prefix(tokens
    within key, by order) // budget`` — packing PER SOURCE/DOMAIN, the
    shard layout that keeps a training mixture's domains separable
    (global packing is :func:`seq_pack`). One bucketed exchange on the
    key; inside a bucket the cumsum is one sort + one grouped
    ``cumsum`` (C-implemented), no per-key Python."""
    from .relational import bucketed_group_map

    def per_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values([key_col, order_col], kind="mergesort")
        csum = g.groupby(key_col, sort=False)[token_col].cumsum()
        excl = csum - g[token_col]
        out = g[[key_col, order_col]].copy()
        out["bin"] = (excl // budget).astype("int64")
        return out

    return bucketed_group_map(ds, [key_col], per_bucket)
