"""Distributed connected components over an edge list — the cluster
step of a dedup pipeline (near-dup PAIRS → duplicate CLUSTERS → one
canonical doc per cluster).

Algorithm: iterative **hash-to-min** label propagation with pointer
jumping. Every node starts labeled with itself; each round a node's
label drops to the min label among itself, its neighbors, and its
label's label (path halving). Rounds needed ≈ O(log diameter) thanks to
the pointer-jumping step; every round is a constant number of
hash-bucket exchanges over the (node, label) table — nothing is
materialized on the driver except the per-round change counter.

Scale shape: edges and labels shuffle by node id via the direct hash
exchange (functions/relational.py); per-round memory is O(nodes/bucket)
per task. The driver loop carries only iteration control.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .relational import bucketed_group_map


def _min_label_per_node(parts: list[ray.data.Dataset], num_buckets: int) -> ray.data.Dataset:
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.union(p)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("node", sort=False)["lbl"].min().reset_index()
        return g

    return bucketed_group_map(allc, ["node"], per_bucket, num_buckets=num_buckets)


def connected_components(
    edges: ray.data.Dataset,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    num_buckets: int = 16,
    max_rounds: int = 64,
    broadcast: bool = True,
) -> ray.data.Dataset:
    """Components of the undirected graph given by (a_col, b_col) edge
    rows. Returns (node, comp) with comp = min node id in the component,
    one row per node that appears in any edge.

    ``broadcast=True`` ships the per-round label table via ``ray.put``
    — right when the node set is small relative to the corpus (the
    dedup-cluster case: nodes = documents that have at least one
    near-duplicate). ``broadcast=False`` replaces every label lookup
    with a partitioned ``Dataset.join`` — fully distributed, no
    driver-side label materialization, for graphs whose node set is
    itself at scale."""
    if not broadcast:
        return _cc_join_path(edges, a_col, b_col, num_buckets, max_rounds)

    def to_nodes(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate(
                    [batch[a_col].to_numpy(), batch[b_col].to_numpy()]
                ).astype("int64")
            }
        )

    def init_lbl(b: pd.DataFrame) -> pd.DataFrame:
        g = b.drop_duplicates("node").reset_index(drop=True)
        g["lbl"] = g["node"]
        return g

    labels = bucketed_group_map(
        edges.map_batches(to_nodes, batch_format="pandas"),
        ["node"],
        init_lbl,
        num_buckets=num_buckets,
    )

    def edge_long(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch[a_col].to_numpy().astype("int64")
        b = batch[b_col].to_numpy().astype("int64")
        return pd.DataFrame(
            {"src": np.concatenate([a, b]), "dst": np.concatenate([b, a])}
        )

    directed = edges.map_batches(edge_long, batch_format="pandas")

    for _ in range(max_rounds):
        lbl_ref = ray.put(labels.to_pandas())  # (nodes, 2) ints — small per round
        # neighbor candidates: for edge src->dst, dst receives lbl(src)
        # (vectorized map through the broadcast label table)

        def nbr(batch: pd.DataFrame) -> pd.DataFrame:
            import ray as _ray

            lt = _ray.get(lbl_ref)
            m = batch.merge(lt, left_on="src", right_on="node")
            return pd.DataFrame({"node": m["dst"], "lbl": m["lbl"]})

        cand_n = directed.map_batches(nbr, batch_format="pandas")

        # pointer jumping: node adopts its label's label (path halving)
        def jump(batch: pd.DataFrame) -> pd.DataFrame:
            import ray as _ray

            lt = _ray.get(lbl_ref)
            m = batch.merge(
                lt.rename(columns={"node": "lbl", "lbl": "lbl2"}), on="lbl"
            )
            return pd.DataFrame({"node": m["node"], "lbl": m["lbl2"]})

        cand_j = labels.map_batches(jump, batch_format="pandas")

        new_labels = _min_label_per_node([labels, cand_n, cand_j], num_buckets)

        # convergence check: any label changed this round?
        def diff(batch: pd.DataFrame) -> pd.DataFrame:
            import ray as _ray

            lt = _ray.get(lbl_ref)
            m = batch.merge(lt, on="node", suffixes=("", "_old"))
            return pd.DataFrame({"c": [int((m["lbl"] != m["lbl_old"]).sum())]})

        changed = sum(r["c"] for r in new_labels.map_batches(diff, batch_format="pandas").take_all())
        labels = new_labels
        if changed == 0:
            break

    def rename(b: pd.DataFrame) -> pd.DataFrame:
        return b.rename(columns={"lbl": "comp"})

    return labels.map_batches(rename, batch_format="pandas")


def _cc_join_path(
    edges: ray.data.Dataset,
    a_col: str,
    b_col: str,
    num_buckets: int,
    max_rounds: int,
) -> ray.data.Dataset:
    """Fully distributed hash-to-min: label lookups are partitioned hash
    joins (Dataset.join); only the per-round change COUNT reaches the
    driver.

    Sizing note: each ``Dataset.join`` spawns ``num_partitions``
    aggregator actors that need CPU slots — keep ``num_buckets`` below
    the cluster's free CPUs or the round deadlocks waiting for slots."""
    from .relational import hash_join

    def to_nodes(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate(
                    [batch[a_col].to_numpy(), batch[b_col].to_numpy()]
                ).astype("int64")
            }
        )

    def init_lbl(b: pd.DataFrame) -> pd.DataFrame:
        g = b.drop_duplicates("node").reset_index(drop=True)
        g["lbl"] = g["node"]
        return g

    labels = bucketed_group_map(
        edges.map_batches(to_nodes, batch_format="pandas"),
        ["node"],
        init_lbl,
        num_buckets=num_buckets,
    )

    def edge_long(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch[a_col].to_numpy().astype("int64")
        b = batch[b_col].to_numpy().astype("int64")
        return pd.DataFrame(
            {"src": np.concatenate([a, b]), "dst": np.concatenate([b, a])}
        )

    directed = edges.map_batches(edge_long, batch_format="pandas").materialize()

    for _ in range(max_rounds):
        # dst receives lbl(src): one partitioned join edges ⋈ labels
        nbr = hash_join(
            directed, labels, on="src", right_on="node", num_partitions=num_buckets
        ).select_columns(["dst", "lbl"])

        def as_node(b: pd.DataFrame) -> pd.DataFrame:
            return b.rename(columns={"dst": "node"})

        cand_n = nbr.map_batches(as_node, batch_format="pandas")

        # pointer jumping: labels ⋈ labels on lbl = node
        def lbl_as_key(b: pd.DataFrame) -> pd.DataFrame:
            return b.rename(columns={"node": "jnode", "lbl": "jlbl"})

        jump = hash_join(
            labels,
            labels.map_batches(lbl_as_key, batch_format="pandas"),
            on="lbl",
            right_on="jnode",
            num_partitions=num_buckets,
        ).select_columns(["node", "jlbl"])

        def as_lbl(b: pd.DataFrame) -> pd.DataFrame:
            return b.rename(columns={"jlbl": "lbl"})

        cand_j = jump.map_batches(as_lbl, batch_format="pandas")

        new_labels = _min_label_per_node([labels, cand_n, cand_j], num_buckets)

        joined = hash_join(
            new_labels,
            labels.map_batches(
                lambda b: b.rename(columns={"lbl": "lbl_old"}), batch_format="pandas"
            ),
            on="node",
            num_partitions=num_buckets,
        )

        def ndiff(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"c": [int((b["lbl"] != b["lbl_old"]).sum())]})

        changed = sum(
            r["c"] for r in joined.map_batches(ndiff, batch_format="pandas").take_all()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels.map_batches(
        lambda b: b.rename(columns={"lbl": "comp"}), batch_format="pandas"
    )


def pagerank(
    pairs: ray.data.Dataset,
    node_ids: "np.ndarray",
    n_iter: int = 2,
    scale: int = 1_000_000,
    damping_pct: int = 85,
    a_col: str = "vec_a",
    b_col: str = "vec_b",
    id_out: str = "vec_id",
    mode: str = "broadcast",
):
    """PageRank over an undirected pair list (e.g. the near-dup graph) in
    EXACT integer micro-units — floor-division arithmetic that numpy and
    SQL reproduce bit-for-bit, so ranks are oracle-checkable.

    r0 = scale // n for every node; each iteration every node sends
    r // deg to each neighbor and receives
    t + (damping_pct · Σ incoming) // 100, with teleport
    t = (100−damping_pct)·scale//100 // n. Isolated nodes hold t.

    Two scale shapes (same algebra, bit-identical results):

    - ``mode="broadcast"`` (default, returns a pa.Table): the edge list
      stays a Dataset — each iteration is one ``map_batches`` pass
      emitting per-batch (dst, partial-sum) rows plus a combiner
      groupby; the rank/degree vectors are the broadcast small side
      (O(nodes) ints, the kmeans-centroid pattern writ larger). Right
      when nodes ≪ edges (the near-dup-graph case).
    - ``mode="join"`` (returns a Dataset): the (node, deg, rank) state
      is itself a Dataset; each iteration is one partitioned
      ``hash_join`` edges ⋈ state, a per-batch partial sum by dst, a
      bucketed exchange for the totals, and one left join back onto the
      node spine. Nothing O(nodes) touches the driver or any single
      task — the _cc_join_path pattern applied to rank propagation,
      for graphs whose node set is itself at scale."""
    import numpy as np

    from .relational import grouped_agg

    ids = np.sort(np.asarray(node_ids, np.int64))
    n = len(ids)
    t = ((100 - damping_pct) * scale // 100) // n
    rank = np.full(n, scale // n, np.int64)

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).cast(pa.int64())
        b = batch.column(b_col).cast(pa.int64())
        return pa.table(
            {
                "src": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a,
                                          b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b]),
                "dst": pa.concat_arrays([b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b,
                                          a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a]),
            }
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()

    if mode == "join":
        return _pagerank_join(
            edges, ids, n_iter, scale, damping_pct, id_out, t
        )

    deg_rows = grouped_agg(edges, ["src"], [("dst", "count", "d")]).take_all()
    deg = np.zeros(n, np.int64)
    for r in deg_rows:
        deg[np.searchsorted(ids, r["src"])] = r["d"]

    for _ in range(n_iter):
        state = ray.put((ids, rank, deg))

        def contrib(batch: pa.Table) -> pa.Table:
            ids_, rank_, deg_ = ray.get(state)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            si = np.searchsorted(ids_, src)
            di = np.searchsorted(ids_, dst)
            c = rank_[si] // deg_[si]
            s = np.bincount(di, weights=c.astype(np.float64), minlength=len(ids_))
            live = np.flatnonzero(s)
            return pa.table(
                {
                    "v": pa.array(ids_[live], pa.int64()),
                    "s": pa.array(s[live].astype(np.int64), pa.int64()),
                }
            )

        rows = grouped_agg(
            edges.map_batches(contrib, batch_format="pyarrow"), ["v"], [("s", "sum", "s")]
        ).take_all()
        s = np.zeros(n, np.int64)
        for r in rows:
            s[np.searchsorted(ids, r["v"])] = r["s"]
        rank = t + (damping_pct * s) // 100

    return pa.table(
        {id_out: pa.array(ids, pa.int64()), "rank_micro": pa.array(rank, pa.int64())}
    )


def _pagerank_join(
    edges: ray.data.Dataset,
    ids: "np.ndarray",
    n_iter: int,
    scale: int,
    damping_pct: int,
    id_out: str,
    t: int,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Fully distributed PageRank iteration: the (node, deg, rank) state
    is a Dataset; per iteration one edges ⋈ state hash join, a per-batch
    partial dst-sum (combiner), one bucketed exchange for the totals,
    and one left join back onto the spine. Only iteration control lives
    on the driver; per-task memory is O(bucket), never O(nodes).

    State is materialized once per iteration — without it, Ray's lazy
    re-execution re-runs every prior round's joins each time the next
    round consumes the state (the ordered_prefix_sum lesson)."""
    from .relational import bucketed_group_map, grouped_agg, hash_join

    n = len(ids)
    r0 = scale // n
    spine = ray.data.from_arrow(pa.table({"node": pa.array(ids, pa.int64())}))
    deg = grouped_agg(edges, ["src"], [("dst", "count", "d")])

    def init(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": b["node"].astype("int64"),
                "deg": b["d"].fillna(0).astype("int64"),
                "rank": np.full(len(b), r0, np.int64),
            }
        )

    state = hash_join(
        spine, deg, on="node", right_on="src", join_type="left_outer"
    ).map_batches(init, batch_format="pandas").materialize()

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b["rank"].to_numpy(np.int64) // np.maximum(b["deg"].to_numpy(np.int64), 1)
        return (
            pd.DataFrame({"v": b["dst"].to_numpy(np.int64), "s": c})
            .groupby("v", as_index=False)["s"]
            .sum()
        )

    def resum(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("v", as_index=False)["s"].sum()

    def update(b: pd.DataFrame) -> pd.DataFrame:
        s = b["s"].fillna(0).to_numpy(np.int64)
        return pd.DataFrame(
            {
                "node": b["node"].astype("int64"),
                "deg": b["deg"].astype("int64"),
                "rank": (t + (damping_pct * s) // 100).astype(np.int64),
            }
        )

    for _ in range(n_iter):
        j = hash_join(
            edges, state, on="src", right_on="node", num_partitions=num_partitions
        )
        sums = bucketed_group_map(
            j.map_batches(partial, batch_format="pandas"),
            ["v"],
            resum,
            num_buckets=num_partitions,
            pre_reduce=resum,
        )
        state = (
            hash_join(
                state,
                sums,
                on="node",
                right_on="v",
                join_type="left_outer",
                num_partitions=num_partitions,
            )
            .map_batches(update, batch_format="pandas")
            .materialize()
        )

    def rename(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_out: b["node"].astype("int64"), "rank_micro": b["rank"].astype("int64")}
        )

    return state.map_batches(rename, batch_format="pandas")
