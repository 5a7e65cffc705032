"""Hash partitioning + salted sub-keys (SURVEY.md §2.3 X4).

``part = hash64(conv_id) % num_partitions`` decides which output
partition (and manifest entry) a key belongs to. The hash is
``pandas.util.hash_array`` (SipHash with a fixed key) — deterministic
across processes, runs and machines, unlike Python's randomized
``hash()``. One partitioning key, reused across every stage.

Hot conversations are split by an additional ``salt`` column derived
from ``turn_idx`` — all events of one *key* ``(conv_id, turn_idx)``
still share a salt, so a per-(part, salt) merge is complete per key and
needs no second merge pass; the salt only spreads a hot conversation's
turns across workers. (A de-salt pass is still needed to co-locate a
partition before writing — SURVEY.md §2.3 X6.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def hash_strings(arr: pa.ChunkedArray | pa.Array | np.ndarray) -> np.ndarray:
    """Deterministic uint64 hash of a string column (vectorized).

    For Arrow input the column is dictionary-encoded first and only the
    DISTINCT values are SipHashed, then scattered back through the
    indices — conversation ids repeat ~turns-per-conv times, so this
    cuts the per-row object-hash cost by that factor.

    Caveat (audited): pandas' C siphash NUL-truncates, so strings
    differing only past an embedded NUL collide. Every use of this hash
    is collision-TOLERANT — partitioning/bucketing only co-locates more
    rows, and exact_dedup re-verifies colliding hashes on the actual
    text — so correctness is unaffected; kernels that need NUL-faithful
    hashing use functions/hashing.py::md5_word_hashes instead."""
    import pyarrow.compute as pc

    if isinstance(arr, (pa.ChunkedArray, pa.Array)):
        enc = pc.dictionary_encode(arr)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        uniq = enc.dictionary.to_numpy(zero_copy_only=False)
        h_uniq = pd.util.hash_array(np.asarray(uniq, dtype=object))
        idx = enc.indices.to_numpy(zero_copy_only=False)
        return h_uniq[idx]
    return pd.util.hash_array(np.asarray(arr, dtype=object), categorize=True)


def partition_of(conv_id, num_partitions: int) -> np.ndarray:
    """Partition ids for a conv_id column."""
    return (hash_strings(conv_id) % np.uint64(num_partitions)).astype(np.int32)


def add_partition_cols(
    batch: pa.Table, num_partitions: int, salt: int = 1
) -> pa.Table:
    """Append ``part`` (and ``salt`` when salt>1) columns to a change batch.

    Runs inside ``map_batches(batch_format="pyarrow")`` — vectorized,
    no Python row loop.
    """
    part = partition_of(batch.column("conv_id"), num_partitions)
    batch = batch.append_column("part", pa.array(part, pa.int32()))
    if salt > 1:
        turn = batch.column("turn_idx").to_numpy(zero_copy_only=False)
        s = (turn.astype(np.int64) % salt).astype(np.int32)
        batch = batch.append_column("salt", pa.array(s, pa.int32()))
    return batch
