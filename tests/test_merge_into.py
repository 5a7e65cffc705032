"""MERGE INTO semantics (pipelines/cdc.py::merge_into): conditional
upsert/delete of an arbitrary source Dataset in one atomic epoch —
matched upserts replace, matched-live deletes tombstone, unmatched
upserts insert, unmatched deletes no-op; duplicate source keys raise;
new source columns widen the schema; merged rows lose LWW ties to
later WAL events (offset tie-break); multi-run (MOR) priors merge
first."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from wprdc_etl_ray.errors import SchemaValidationError
from wprdc_etl_ray.gen import generate_change_log, write_wal
from wprdc_etl_ray.pipelines.cdc import (
    CDCConfig,
    merge_into,
    read_transcripts_arrow,
    run_ingest,
)

N = 4000


@pytest.fixture(scope="module")
def log():
    return generate_change_log(N, seed=11)


def base_table(tmp_path, log, **cfg):
    write_wal(str(tmp_path), log, segment_rows=1000)
    root = str(tmp_path / "t")
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=8, **cfg))
    return root


def mk_source(before, convs, ts):
    n = len(convs)
    return rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array(list(convs) * 3),
                "turn_idx": pa.array([0] * n + [1] * n + [99999] * n, pa.int64()),
                "role": pa.array(["merged"] * (3 * n)),
                "text": pa.array(["MERGED"] * (3 * n)),
                "tool": pa.array([None] * (3 * n), pa.string()),
                "ts": pa.array([ts] * (3 * n), pa.timestamp("us")),
                "_action": pa.array(
                    ["upsert"] * n + ["delete"] * n + ["upsert"] * n
                ),
            }
        )
    )


def test_merge_semantics(ray_session, tmp_path, log):
    root = base_table(tmp_path, log, salt=2)
    before = read_transcripts_arrow(root).to_pandas()
    convs = sorted(before["conv_id"].unique())[:40]
    res = merge_into(root, mk_source(before, convs, before["ts"].iloc[0]))
    assert res.partitions_updated >= 1
    after = read_transcripts_arrow(root).to_pandas()
    a = after.set_index(["conv_id", "turn_idx"])
    for c in convs:
        if (c, 0) in before.set_index(["conv_id", "turn_idx"]).index:
            assert a.loc[(c, 0), "text"] == "MERGED"  # matched upsert
        assert a.loc[(c, 99999), "text"] == "MERGED"  # unmatched insert
        assert (c, 1) not in a.index  # matched delete
    # untouched rows preserved (values; turn_idx widens int32→int64)
    touched = before.conv_id.isin(convs) & before.turn_idx.isin([0, 1, 99999])
    bo = before[~touched].reset_index(drop=True)
    ao = after[
        ~(after.conv_id.isin(convs) & after.turn_idx.isin([0, 1, 99999]))
    ].reset_index(drop=True)
    assert len(bo) == len(ao)
    for col in bo.columns:
        assert (
            bo[col].astype(ao[col].dtype).equals(ao[col])
        ), f"column {col} changed for untouched rows"
    # watermark untouched, epoch advanced
    assert res.global_watermark == N - 1
    assert res.epoch == 2


def test_merge_duplicate_source_keys_raise(ray_session, tmp_path, log):
    root = base_table(tmp_path, log)
    before = read_transcripts_arrow(root).to_pandas()
    conv = before["conv_id"].iloc[0]
    src = rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([conv, conv]),
                "turn_idx": pa.array([0, 0], pa.int64()),
                "text": pa.array(["a", "b"]),
                "ts": pa.array([before["ts"].iloc[0]] * 2, pa.timestamp("us")),
            }
        )
    )
    with pytest.raises(Exception) as ei:
        merge_into(root, src)
    assert "duplicate source keys" in str(ei.value)


def test_merge_schema_evolution(ray_session, tmp_path, log):
    """A source column the table has never seen widens the schema;
    untouched rows surface it as NULL."""
    root = base_table(tmp_path, log)
    before = read_transcripts_arrow(root).to_pandas()
    conv = before["conv_id"].iloc[0]
    src = rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([conv]),
                "turn_idx": pa.array([0], pa.int64()),
                "text": pa.array(["evolved"]),
                "review_score": pa.array([5], pa.int64()),
                "ts": pa.array([before["ts"].iloc[0]], pa.timestamp("us")),
            }
        )
    )
    merge_into(root, src)
    after = read_transcripts_arrow(root).to_pandas()
    assert "review_score" in after.columns
    hit = after[(after.conv_id == conv) & (after.turn_idx == 0)]
    assert hit["review_score"].iloc[0] == 5
    assert after["review_score"].notna().sum() == 1


def test_merge_then_wal_event_wins_tie(ray_session, tmp_path, log):
    """A merged row carries _offset = watermark, so a later WAL event
    with the SAME ts (higher offset) wins the LWW tie-break."""
    import os

    root = base_table(tmp_path, log)
    before = read_transcripts_arrow(root).to_pandas()
    conv = before["conv_id"].iloc[0]
    ts0 = before[(before.conv_id == conv) & (before.turn_idx == 0)]["ts"].iloc[0]
    src = rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([conv]),
                "turn_idx": pa.array([0], pa.int64()),
                "role": pa.array(["merged"]),
                "text": pa.array(["MERGED"]),
                "tool": pa.array([None], pa.string()),
                "ts": pa.array([ts0], pa.timestamp("us")),
            }
        )
    )
    merge_into(root, src)
    # WAL event: same key, same ts, offset = N (above the watermark)
    import pyarrow.parquet as pq

    seg = pa.table(
        {
            "offset": pa.array([N], pa.int64()),
            "op": pa.array(["update"]),
            "conv_id": pa.array([conv]),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"]),
            "text": pa.array(["WAL-WINS"]),
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([ts0], pa.timestamp("us")),
        }
    )
    wal2 = str(tmp_path / "wal2")
    os.makedirs(wal2)
    pq.write_table(seg, os.path.join(wal2, f"seg-{N:012d}.parquet"))
    run_ingest(wal2, root, CDCConfig(num_partitions=8))
    after = read_transcripts_arrow(root).to_pandas()
    hit = after[(after.conv_id == conv) & (after.turn_idx == 0)]
    assert hit["text"].iloc[0] == "WAL-WINS"


def test_merge_into_mor_table(ray_session, tmp_path, log):
    """MERGE over a table whose slots hold several MOR delta runs: the
    prior collapses to its LWW view before matching."""
    import glob
    import os

    write_wal(str(tmp_path), log, segment_rows=500)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    w1 = str(tmp_path / "w1")
    os.makedirs(w1)
    for s in segs[: len(segs) // 2]:
        os.link(s, os.path.join(w1, os.path.basename(s)))
    root = str(tmp_path / "t")
    run_ingest(w1, root, CDCConfig(num_partitions=8, write_mode="mor"))
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=8, write_mode="mor"))
    before = read_transcripts_arrow(root).to_pandas()
    convs = sorted(before["conv_id"].unique())[:20]
    merge_into(root, mk_source(before, convs, before["ts"].iloc[0]))
    after = read_transcripts_arrow(root).to_pandas()
    a = after.set_index(["conv_id", "turn_idx"])
    for c in convs:
        assert a.loc[(c, 99999), "text"] == "MERGED"
        assert (c, 1) not in a.index
    # no duplicated keys anywhere (the MOR collapse worked)
    assert not after.duplicated(subset=["conv_id", "turn_idx"]).any()


def test_merge_whole_row_semantics(ray_session, tmp_path, log):
    """An upsert REPLACES the whole row: payload columns the source
    omits become NULL (documented MERGE contract here — not a partial
    column update)."""
    root = base_table(tmp_path, log)
    before = read_transcripts_arrow(root).to_pandas()
    hit = before[before["tool"].notna()].iloc[0]
    src = rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([hit["conv_id"]]),
                "turn_idx": pa.array([int(hit["turn_idx"])], pa.int64()),
                "text": pa.array(["replaced"]),
                "ts": pa.array([hit["ts"]], pa.timestamp("us")),
            }
        )
    )
    merge_into(root, src)
    after = read_transcripts_arrow(root).to_pandas()
    row = after[
        (after.conv_id == hit["conv_id"]) & (after.turn_idx == hit["turn_idx"])
    ].iloc[0]
    assert row["text"] == "replaced"
    assert row["tool"] is None or (isinstance(row["tool"], float) and np.isnan(row["tool"]))
    assert row["role"] is None or (isinstance(row["role"], float) and np.isnan(row["role"]))


def test_merge_partial_update_cols(ray_session, tmp_path, log):
    """update_cols = the UPDATE SET clause: matched rows replace only
    the listed columns, keeping prior values elsewhere; unmatched rows
    insert the source as-is."""
    root = base_table(tmp_path, log)
    before = read_transcripts_arrow(root).to_pandas()
    hit = before[before["tool"].notna() & (before["turn_idx"] == 0)].iloc[0]
    src = rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([hit["conv_id"], hit["conv_id"]]),
                "turn_idx": pa.array([0, 88888], pa.int64()),
                "text": pa.array(["patched", "new-row"]),
                "ts": pa.array([hit["ts"]] * 2, pa.timestamp("us")),
            }
        )
    )
    merge_into(root, src, update_cols=["text"])
    after = read_transcripts_arrow(root).to_pandas()
    row = after[(after.conv_id == hit["conv_id"]) & (after.turn_idx == 0)].iloc[0]
    assert row["text"] == "patched"
    assert row["tool"] == hit["tool"]          # prior value KEPT
    assert row["role"] == hit["role"]          # prior value KEPT
    new = after[(after.conv_id == hit["conv_id"]) & (after.turn_idx == 88888)].iloc[0]
    assert new["text"] == "new-row"
    assert new["tool"] is None or (isinstance(new["tool"], float))


def test_delete_where_and_update_where(ray_session, tmp_path, log):
    import pyarrow.compute as pc

    from wprdc_etl_ray.pipelines.cdc import delete_where, update_where

    root = base_table(tmp_path, log)
    before = read_transcripts_arrow(root).to_pandas()
    n_tool = before["tool"].notna().sum()
    assert n_tool > 0

    res = delete_where(root, lambda b: pc.is_valid(b.column("tool")))
    assert not res.skipped
    after = read_transcripts_arrow(root).to_pandas()
    assert after["tool"].notna().sum() == 0
    assert len(after) == len(before) - n_tool

    res2 = update_where(
        root,
        lambda b: pc.equal(b.column("turn_idx"), 0),
        lambda hit: pa.table({"text": pa.array(["T0"] * hit.num_rows)}),
        set_cols=["text"],
    )
    assert not res2.skipped
    final = read_transcripts_arrow(root).to_pandas()
    zero = final[final.turn_idx == 0]
    assert (zero["text"] == "T0").all()
    # other columns of updated rows kept (partial update)
    prev = after[after.turn_idx == 0].sort_values(["conv_id"]).reset_index(drop=True)
    now = zero.sort_values(["conv_id"]).reset_index(drop=True)
    assert now["role"].fillna("").tolist() == prev["role"].fillna("").tolist()
    # non-matching rows untouched
    rest_a = after[after.turn_idx != 0].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    rest_b = final[final.turn_idx != 0].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert rest_a["text"].fillna("").tolist() == rest_b["text"].fillna("").tolist()


def test_merge_source_missing_keys_raises(ray_session, tmp_path, log):
    from wprdc_etl_ray.errors import InvalidConfigError

    root = base_table(tmp_path, log)
    src = rd.from_arrow(pa.table({"conv_id": pa.array(["x"]), "text": pa.array(["y"])}))
    with pytest.raises(InvalidConfigError) as ei:
        merge_into(root, src)
    assert "key column" in str(ei.value)
