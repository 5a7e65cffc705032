"""CLI entry points (reference parity: ``manage.py``, wprdc-etl repo
root — bootstrap + maintenance commands; SURVEY.md §2.1 C7).

Commands:
  init     <table_root>                   create table root + empty manifest
  gen      <out_dir> --events N [...]     write a deterministic CDC WAL
  ingest   <wal_dir> <table_root> [...]   batch-apply new segments (one epoch)
  compact  <table_root>                   fold per-epoch runs; optional tombstone GC
  tail     <wal_dir> <table_root> [...]   poll+commit loop (stateful actors)
  show     <table_root>                   manifest summary (epoch, watermark, lineage)
  read     <table_root> [--limit N]       print committed rows
  check    <table_root> <wal_dir>         verify table == replay oracle (DuckDB)
  query    <name> [--sf-dir D]            run any operator pipeline ('list' to enumerate)
  clone    <src_root> <dst_root> [--epoch E]  shallow clone (hardlinked, zero-copy)
  repartition <table_root> --partitions B [--salt S]  hash-layout migration
  index    build|refresh|lookup <table_root> <column> [--value V]  secondary index
  maintain <table_root> [--max-runs N] [--keep-epochs K]  compact-if-needed + vacuum pass
  tag      <table_root> <name> [--epoch E]  name a committed version
  restore  <table_root> --epoch E | --tag NAME  rewind state + watermark
  changes  <table_root> --from E [...]    change-data-feed between epochs
  vacuum   <table_root> [--keep-epochs N] reclaim unreferenced data files

Owns its Ray session (guarded init) — the ONLY library-adjacent place
allowed to call ray.init besides bench.py and the test fixture.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_init(args):
    from .state.manifest import commit_manifest
    from .schema import TRANSCRIPT_SCHEMA, snapshot_schema

    os.makedirs(args.table_root, exist_ok=True)
    m = commit_manifest(
        args.table_root,
        None,
        table=args.name,
        num_partitions=args.partitions,
        schema=snapshot_schema(TRANSCRIPT_SCHEMA),
        new_watermark=-1,
        updated_partitions={},
        metrics={"salt": args.salt},
    )
    print(json.dumps({"table_root": args.table_root, "epoch": m["epoch"]}))


def cmd_gen(args):
    from .gen import generate_wal

    paths = generate_wal(
        args.out_dir,
        n_events=args.events,
        seed=args.seed,
        segment_rows=args.segment_rows,
        evolve_at=args.evolve_at,
    )
    print(json.dumps({"segments": len(paths), "wal": os.path.join(args.out_dir, "wal")}))


def cmd_ingest(args):
    _ray()
    from .pipelines.cdc import CDCConfig, run_ingest

    res = run_ingest(
        args.wal_dir,
        args.table_root,
        CDCConfig(
            num_partitions=args.partitions,
            salt=args.salt,
            mode=args.mode,
            write_mode=args.write_mode,
        ),
    )
    print(
        json.dumps(
            {
                "epoch": res.epoch,
                "watermark": res.global_watermark,
                "events": res.events_read,
                "partitions_updated": res.partitions_updated,
                "skipped": res.skipped,
            }
        )
    )


def cmd_tail(args):
    import time

    _ray()
    from .pipelines.cdc import CDCConfig
    from .pipelines.tail import TailSession

    sess = TailSession(
        args.wal_dir,
        args.table_root,
        CDCConfig(num_partitions=args.partitions),
        num_actors=args.actors,
    )
    try:
        for _ in range(args.polls) if args.polls else iter(int, 1):
            n = sess.poll()
            if n:
                res = sess.commit()
                print(
                    json.dumps(
                        {"epoch": res.epoch, "events": n, "watermark": res.global_watermark}
                    ),
                    flush=True,
                )
            time.sleep(args.interval)
    except KeyboardInterrupt:
        pass
    finally:
        sess.shutdown()


def cmd_compact(args):
    _ray()
    from .pipelines.cdc import compact

    res = compact(
        args.table_root,
        drop_tombstones=args.drop_tombstones,
        to_salt=args.to_salt,
    )
    print(
        json.dumps(
            {
                "epoch": res.epoch,
                "partitions": res.partitions_updated,
                "skipped": res.skipped,
            }
        )
    )


def cmd_query(args):
    """Run any operator pipeline from the driver-harness registry over a
    testdata directory (the user-facing runner for SURVEY.md §2 ops)."""
    _ray()
    import ray.data as rd

    from .pipelines.queries import queries

    reg = queries()
    if args.name == "list" or args.name not in reg:
        print(json.dumps({"queries": sorted(reg)}, indent=1))
        sys.exit(0 if args.name == "list" else 1)
    out = reg[args.name](args.sf_dir)
    if isinstance(out, rd.Dataset):
        out = out.to_pandas()
    elif not hasattr(out, "head"):
        out = out.to_pandas()
    print(out.head(args.limit).to_string(index=False))
    print(json.dumps({"query": args.name, "rows": len(out)}))


def cmd_show(args):
    from .state.manifest import load_manifest

    m = load_manifest(args.table_root)
    if m is None:
        print(json.dumps({"error": "no manifest"}))
        sys.exit(1)
    print(
        json.dumps(
            {
                "table": m["table"],
                "epoch": m["epoch"],
                "global_watermark": m["global_watermark"],
                "num_partitions": m["num_partitions"],
                "partitions": len(m["partitions"]),
                "rows": sum(e["rows"] for e in m["partitions"].values()),
                "live_rows": sum(e["live_rows"] for e in m["partitions"].values()),
                "tombstones": sum(e["tombstones"] for e in m["partitions"].values()),
                "metrics": m.get("metrics", {}),
            },
            indent=1,
        )
    )


def cmd_read(args):
    _ray()
    if args.conv:
        # point lookup: only the owning partition's files are read
        from .pipelines.cdc import read_conversation

        t = read_conversation(args.table_root, args.conv)
        for row in t.to_pylist()[: args.limit]:
            print(json.dumps(row, default=str))
        return
    from .pipelines.cdc import read_transcripts

    ds = read_transcripts(args.table_root)
    for row in ds.limit(args.limit).take_all():
        print(json.dumps(row, default=str))


def cmd_vacuum(args):
    from .pipelines.cdc import vacuum

    print(json.dumps(vacuum(args.table_root, keep_epochs=args.keep_epochs)))


def cmd_repartition(args):
    _ray()
    from .pipelines.cdc import repartition_table

    res = repartition_table(
        args.table_root, new_partitions=args.partitions, new_salt=args.salt
    )
    print(json.dumps({"epoch": res.epoch, "partitions": res.partitions_updated}))


def cmd_clone(args):
    from .pipelines.cdc import clone_table

    m = clone_table(args.src_root, args.dst_root, epoch=args.epoch)
    print(json.dumps({"dst": args.dst_root, "epoch": m["epoch"],
                      "partitions": len(m["partitions"])}))


def cmd_restore(args):
    from .pipelines.cdc import restore_table

    res = restore_table(args.table_root, epoch=args.epoch, tag=args.tag)
    print(json.dumps({"epoch": res.epoch, "watermark": res.global_watermark}))


def cmd_tag(args):
    from .state.manifest import tag_epoch

    print(json.dumps(tag_epoch(args.table_root, args.name, epoch=args.epoch)))


def cmd_maintain(args):
    _ray()
    from .pipelines.cdc import maintain

    print(
        json.dumps(
            maintain(
                args.table_root,
                max_runs_per_slot=args.max_runs,
                keep_epochs=args.keep_epochs,
                drop_tombstones=args.drop_tombstones,
            )
        )
    )


def cmd_index(args):
    _ray()
    from .pipelines.index import build_index, index_lookup, refresh_index

    if args.action == "build":
        print(json.dumps(build_index(args.table_root, args.column)))
    elif args.action == "refresh":
        print(json.dumps(refresh_index(args.table_root, args.column)))
    else:  # lookup
        if args.value is None:
            print(json.dumps({"error": "--value required for lookup"}))
            sys.exit(1)
        print(json.dumps(index_lookup(args.table_root, args.column, args.value)))


def cmd_cluster(args):
    """Range-cluster (1 column) or Z-order (2 columns) a parquet input
    into a zone-mapped layout; `plan` shows which files a predicate
    interval touches."""
    _ray()
    import ray.data as _rd

    from .functions.layout import (
        cluster_plan,
        cluster_write,
        zorder_plan,
        zorder_write,
    )

    if args.action == "write":
        ds = _rd.read_parquet(args.input)
        cols = args.columns.split(",")
        if len(cols) == 1:
            print(json.dumps(cluster_write(ds, args.out, cols[0], num_files=args.files)))
        elif len(cols) == 2:
            print(
                json.dumps(
                    zorder_write(ds, args.out, cols[0], cols[1], num_files=args.files)
                )
            )
        else:
            print(json.dumps({"error": "1 (range) or 2 (z-order) columns"}))
            sys.exit(1)
    else:  # plan
        import os as _os

        with open(_os.path.join(args.out, "_CLUSTER.json")) as f:
            meta = json.load(f)
        if "zorder" in meta:
            files = zorder_plan(args.out, args.lo, args.hi, args.b_lo, args.b_hi)
        else:
            files = cluster_plan(args.out, args.lo, args.hi)
        print(json.dumps({"files": [_os.path.basename(f) for f in files]}))


def cmd_changes(args):
    """Change feed between two committed epochs as JSON lines."""
    _ray()
    from .pipelines.cdc import table_changes

    ds = table_changes(args.table_root, args.from_epoch, args.to_epoch)
    n = 0
    for row in ds.iter_rows():
        if args.limit and n >= args.limit:
            break
        print(json.dumps(row, default=str))
        n += 1


def cmd_check(args):
    import duckdb

    _ray()
    from .gen import ORACLE_SQL
    from .pipelines.cdc import read_transcripts_arrow

    got = read_transcripts_arrow(args.table_root)
    con = duckdb.connect()
    sql = ORACLE_SQL.format(
        changes=f"read_parquet('{os.path.join(args.wal_dir, 'seg-*.parquet')}')"
    )
    want = con.execute(sql).arrow()
    got_cmp = got.select([c for c in want.schema.names]).cast(
        want.schema
    )
    ok = got_cmp.equals(want)
    print(json.dumps({"rows": got.num_rows, "oracle_rows": want.num_rows, "equal": ok}))
    sys.exit(0 if ok else 1)


def main(argv=None):
    p = argparse.ArgumentParser(prog="wprdc_etl_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("init")
    sp.add_argument("table_root")
    sp.add_argument("--name", default="transcripts")
    sp.add_argument("--partitions", type=int, default=64)
    sp.add_argument("--salt", type=int, default=1)
    sp.set_defaults(fn=cmd_init)

    sp = sub.add_parser("gen")
    sp.add_argument("out_dir")
    sp.add_argument("--events", type=int, default=100_000)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--segment-rows", type=int, default=100_000)
    sp.add_argument("--evolve-at", type=float, default=None)
    sp.set_defaults(fn=cmd_gen)

    sp = sub.add_parser("ingest")
    sp.add_argument("wal_dir")
    sp.add_argument("table_root")
    sp.add_argument("--partitions", type=int, default=64)
    sp.add_argument("--salt", type=int, default=1)
    sp.add_argument("--mode", choices=["upsert", "refresh"], default="upsert")
    sp.add_argument(
        "--write-mode", choices=["cow", "mor"], default="cow",
        help="cow = rewrite touched slots fully merged; mor = append delta runs",
    )
    sp.set_defaults(fn=cmd_ingest)

    sp = sub.add_parser("tail")
    sp.add_argument("wal_dir")
    sp.add_argument("table_root")
    sp.add_argument("--partitions", type=int, default=64)
    sp.add_argument("--actors", type=int, default=8)
    sp.add_argument("--interval", type=float, default=2.0)
    sp.add_argument("--polls", type=int, default=0, help="0 = loop forever")
    sp.set_defaults(fn=cmd_tail)

    sp = sub.add_parser("compact")
    sp.add_argument("table_root")
    sp.add_argument("--drop-tombstones", action="store_true")
    sp.add_argument(
        "--to-salt", type=int, default=None,
        help="re-salt the table (hot-key layout migration)",
    )
    sp.set_defaults(fn=cmd_compact)

    sp = sub.add_parser("query")
    sp.add_argument("name", help="'list' to enumerate")
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sp.add_argument("--limit", type=int, default=20)
    sp.set_defaults(fn=cmd_query)

    sp = sub.add_parser("show")
    sp.add_argument("table_root")
    sp.set_defaults(fn=cmd_show)

    sp = sub.add_parser("read")
    sp.add_argument("table_root")
    sp.add_argument("--limit", type=int, default=20)
    sp.add_argument("--conv", default=None, help="point-read one conversation")
    sp.set_defaults(fn=cmd_read)

    sp = sub.add_parser("vacuum")
    sp.add_argument("table_root")
    sp.add_argument("--keep-epochs", type=int, default=2)
    sp.set_defaults(fn=cmd_vacuum)

    sp = sub.add_parser("repartition")
    sp.add_argument("table_root")
    sp.add_argument("--partitions", type=int, required=True)
    sp.add_argument("--salt", type=int, default=None)
    sp.set_defaults(fn=cmd_repartition)

    sp = sub.add_parser("clone")
    sp.add_argument("src_root")
    sp.add_argument("dst_root")
    sp.add_argument("--epoch", type=int, default=None)
    sp.set_defaults(fn=cmd_clone)

    sp = sub.add_parser("restore")
    sp.add_argument("table_root")
    sp.add_argument("--epoch", type=int, default=None)
    sp.add_argument("--tag", default=None)
    sp.set_defaults(fn=cmd_restore)

    sp = sub.add_parser("tag")
    sp.add_argument("table_root")
    sp.add_argument("name")
    sp.add_argument("--epoch", type=int, default=None)
    sp.set_defaults(fn=cmd_tag)

    sp = sub.add_parser("maintain")
    sp.add_argument("table_root")
    sp.add_argument("--max-runs", type=int, default=8)
    sp.add_argument("--keep-epochs", type=int, default=4)
    sp.add_argument("--drop-tombstones", action="store_true")
    sp.set_defaults(fn=cmd_maintain)

    sp = sub.add_parser("index")
    sp.add_argument("action", choices=["build", "refresh", "lookup"])
    sp.add_argument("table_root")
    sp.add_argument("column")
    sp.add_argument("--value", default=None)
    sp.set_defaults(fn=cmd_index)

    sp = sub.add_parser("cluster")
    sp.add_argument("action", choices=["write", "plan"])
    sp.add_argument("out")
    sp.add_argument("--input")
    sp.add_argument("--columns", default="")
    sp.add_argument("--files", type=int, default=16)
    sp.add_argument("--lo", type=int, default=None)
    sp.add_argument("--hi", type=int, default=None)
    sp.add_argument("--b-lo", dest="b_lo", type=int, default=None)
    sp.add_argument("--b-hi", dest="b_hi", type=int, default=None)
    sp.set_defaults(fn=cmd_cluster)

    sp = sub.add_parser("changes")
    sp.add_argument("table_root")
    sp.add_argument("--from", dest="from_epoch", type=int, required=True)
    sp.add_argument("--to", dest="to_epoch", type=int, default=None)
    sp.add_argument("--limit", type=int, default=0)
    sp.set_defaults(fn=cmd_changes)

    sp = sub.add_parser("check")
    sp.add_argument("table_root")
    sp.add_argument("wal_dir")
    sp.set_defaults(fn=cmd_check)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
