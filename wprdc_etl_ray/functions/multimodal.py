"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by actor-pool ``map_batches`` stages.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (deterministic fake features / NotImplementedError
for real codecs) — but the Ray-side plumbing is real and tested:
binary columns stay in ``batch_format="pyarrow"`` end-to-end (pandas
object-dtype round-trips are the documented pitfall for large binary),
batch sizes are small because payload rows are wide, and the actor
signature (decode state in ``__init__``) is exactly what a real
decoder would use.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def attach_payload(batch: pa.Table, source_col: str = "text") -> pa.Table:
    """Materialize an opaque binary payload column (UTF-8 bytes of the
    source text — a deterministic stand-in for image/audio bytes)."""
    payload = batch.column(source_col).cast(pa.binary())
    return batch.append_column("payload", payload)


class DecodeStub:
    """Actor-pool decode stage.

    Real decoders (PIL/libsndfile/ffmpeg) are NOT in this container;
    ``mode='fake'`` emits deterministic pseudo-features (byte length +
    md5 content address — the content-addressing step every multimodal
    pipeline needs), ``mode='real'`` raises NotImplementedError to mark
    exactly where the codec plugs in."""

    def __init__(self, mode: str = "fake"):
        self.mode = mode
        if mode not in ("fake", "real"):
            raise ValueError(mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "real codec decode (PIL/ffmpeg) not available in this environment; "
                "plug the decoder here — the surrounding plumbing is complete"
            )
        payload = batch.column("payload")
        n_bytes = pc.binary_length(payload).cast(pa.int64())
        # content address: md5 per payload (inherently a per-row digest;
        # hashlib releases the GIL). Digests read the Arrow value buffer
        # through zero-copy memoryview slices — no to_pylist() copy of
        # every payload into Python bytes objects.
        arr = payload.combine_chunks() if isinstance(payload, pa.ChunkedArray) else payload
        if arr.null_count:
            arr = arr.fill_null(b"")
        offs = arr.buffers()[1]
        data = arr.buffers()[2]
        off = memoryview(offs).cast("i" if arr.type == pa.binary() else "q")
        mv = memoryview(data) if data is not None else memoryview(b"")
        base = arr.offset
        digests = pa.array(
            [
                hashlib.md5(mv[off[base + i] : off[base + i + 1]]).hexdigest()
                for i in range(len(arr))
            ],
            pa.string(),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bytes": n_bytes,
                "content_md5": digests,
            }
        )


def multimodal_features(
    ds: ray.data.Dataset, concurrency: int = 4, batch_size: int = 512
) -> ray.data.Dataset:
    """payload attach (stateless) → decode (actor pool, small batches
    because payload rows are wide)."""
    with_payload = ds.map_batches(attach_payload, batch_format="pyarrow")
    return with_payload.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"mode": "fake"},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
