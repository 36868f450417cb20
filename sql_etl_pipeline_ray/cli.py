"""Command-line entry points (reference CLI parity, ``main.py:24-66``:
run / incremental / status / setup → ours: gen-data / replay /
replay --resume / validate / status / analytics).

The CLI owns its Ray session (guarded init); library code never calls
``ray.init`` (driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import os

    import ray

    if not ray.is_initialized():
        # Under `ray job submit` the job runtime sets RAY_ADDRESS and this
        # connects to the cluster; standalone (and in this sandbox, where
        # RAY_ADDRESS=local is preset) it starts a local session.
        kwargs = {
            "address": os.environ.get("RAY_ADDRESS", "local"),
            "include_dashboard": False,
            "logging_level": "ERROR",
        }
        if num_cpus and kwargs["address"] == "local":
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="sql_etl_pipeline_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-data", help="write a seeded synthetic change log")
    g.add_argument("out_dir")
    g.add_argument("--events", type=int, default=100_000)
    g.add_argument("--keys", type=int, default=10_000)
    g.add_argument("--buckets", type=int, default=8)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--evolve-after", type=float, default=None)
    g.add_argument("--processes", type=int, default=1)

    r = sub.add_parser("replay", help="replay a change log into the lake")
    r.add_argument("log_dir")
    r.add_argument("lake_dir")
    r.add_argument("--resume", action="store_true")
    r.add_argument("--partitions", type=int, default=None)
    r.add_argument("--exchange", choices=["late", "actor"], default="late")
    r.add_argument(
        "--quarantine-dir", default=None,
        help="dead-letter sink: capture rejected events (full row + "
        "_reject_reason) as Parquet under this directory",
    )
    r.add_argument(
        "--strict", action="store_true",
        help="raise on invalid events before any commit instead of "
        "dropping them (drop_invalid=False)",
    )
    r.add_argument(
        "--cluster-by-key", action="store_true",
        help="sort partition files by (repo, path) at commit so filtered "
        "readers can prune row groups (pay-at-write)",
    )
    r.add_argument(
        "--keep-epochs", type=int, default=1,
        help="epochs of data files retained through commits (2 = grace "
        "window for readers concurrent with a tail loop)",
    )
    r.add_argument(
        "--merge-on-read", action="store_true",
        help="resume commits the increment as a delta file chained onto "
        "each touched partition instead of rewriting it (write "
        "amplification ∝ increment; readers fold; `compact` restores "
        "plain files)",
    )
    r.add_argument(
        "--max-delta-files", type=int, default=8,
        help="chain bound for --merge-on-read: a partition exceeding it "
        "compacts inline at commit",
    )

    tx = sub.add_parser(
        "replay-txn",
        help="transaction-consistent multi-table replay: demux a "
        "multiplexed WAL (tbl/txn columns) per table, replay each lake, "
        "publish one atomic cross-table snapshot (re-entrant; a crash "
        "leaves readers on the previous snapshot)",
    )
    tx.add_argument("log_dir")
    tx.add_argument("out_root")
    tx.add_argument("--partitions", type=int, default=None)
    tx.add_argument(
        "--sealed", action="store_true",
        help="the producer closed the log cleanly: publish the final "
        "transaction too (default holds it back — the one-txn WAL lag)",
    )
    tx.add_argument("--keep-epochs", type=int, default=2)

    ag = sub.add_parser(
        "replay-agg",
        help="aggregate-state ingest: replay an int64-delta metrics log "
        "into a keyed rollup lake (per-key SUM/MIN/MAX/COUNT, op='D' "
        "resets; exactly-once)",
    )
    ag.add_argument("log_dir")
    ag.add_argument("lake_dir")
    ag.add_argument("--value-cols", required=True,
                    help="comma-separated int64 delta columns")
    ag.add_argument("--resume", action="store_true")
    ag.add_argument("--partitions", type=int, default=None)
    ag.add_argument(
        "--merge-on-read", action="store_true",
        help="resume commits the increment's partial aggregates as a "
        "chained delta instead of rewriting partitions",
    )
    ag.add_argument(
        "--reset-free", action="store_true",
        help="declare the feed carries no op='D' resets (enforced: the "
        "router raises on one) — unlocks full per-key pre-aggregation "
        "in the hot-key memory valve",
    )
    ag.add_argument(
        "--compact-threshold", type=int, default=16_000_000,
        help="exchange-actor buffered-row threshold that engages the "
        "hot-key valve (per partition)",
    )

    cp = sub.add_parser(
        "compact",
        help="fold merge-on-read delta chains back into single base files "
        "(one Ray task per chained partition, exactly-once commits); "
        "dispatches on the lake kind — LWW fold for document/derived "
        "lakes, ⊕ state-merge for aggregate lakes",
    )
    cp.add_argument("lake_dir")
    cp.add_argument(
        "--min-chain", type=int, default=2,
        help="only partitions with at least this many chained files",
    )
    cp.add_argument("--keep-epochs", type=int, default=1)
    cp.add_argument(
        "--kind", choices=("auto", "document", "aggregate"), default="auto",
        help="override the manifest-stats lake-kind detection",
    )

    cl = sub.add_parser(
        "compact-log",
        help="rewrite a change log keeping only each key's winning event "
        "(Kafka-compacted-topic bootstrap bound; replays to the same lake)",
    )
    cl.add_argument("log_dir")
    cl.add_argument("out_dir")
    cl.add_argument("--drop-tombstones", action="store_true",
                    help="omit delete winners (fresh-bootstrap consumers only)")
    cl.add_argument("--partitions", type=int, default=None)
    cl.add_argument("--overwrite", action="store_true",
                    help="replace a non-empty output dir (re-runs must "
                    "not append)")

    fl = sub.add_parser(
        "fsck-log",
        help="audit a side-store log: every meta row claiming content "
        "must resolve in its lsn-sorted sibling",
    )
    fl.add_argument("log_dir")

    cs = sub.add_parser(
        "convert-sidestore",
        help="convert an inline log IN PLACE to the content side-store "
        "layout (meta files + lsn-sorted content siblings; idempotent)",
    )
    cs.add_argument("log_dir")

    b = sub.add_parser(
        "bootstrap",
        help="bulk-load an initial snapshot into an EMPTY lake at a "
        "watermark; follow with `replay --resume` for the log suffix",
    )
    b.add_argument("snapshot", help="Parquet path of the consistent snapshot")
    b.add_argument("lake_dir")
    b.add_argument(
        "--snapshot-lsn", type=int, required=True,
        help="log position the snapshot was taken at (everything at/below "
        "is in the snapshot; the following replay applies only above it)",
    )
    b.add_argument("--partitions", type=int, default=16)

    t = sub.add_parser(
        "tail", help="micro-batch streaming: poll the log, resume-replay new buckets"
    )
    t.add_argument("log_dir")
    t.add_argument("lake_dir")
    t.add_argument("--poll-interval", type=float, default=2.0)
    t.add_argument("--max-polls", type=int, default=None)
    t.add_argument("--stop-after-idle", type=int, default=3)

    c = sub.add_parser(
        "convert",
        help="convert CSV/JSONL change-log buckets to Parquet staging "
        "(then replay the staging dir as usual)",
    )
    c.add_argument("src_dir")
    c.add_argument("staging_dir")

    e = sub.add_parser(
        "export",
        help="export the committed lake to CSV or JSONL (streaming, one "
        "file per block — the reverse of 'convert')",
    )
    e.add_argument("lake_dir")
    e.add_argument("out_dir")
    e.add_argument("--format", choices=["csv", "jsonl"], default="csv")
    e.add_argument("--columns", nargs="*", default=None)
    e.add_argument(
        "--with-pending",
        metavar="LOG_DIR",
        default=None,
        help="merge the un-replayed tail of LOG_DIR on read (freshness "
        "view; nothing commits)",
    )

    a = sub.add_parser(
        "analytics", help="run named analytics queries, save CSV results"
    )
    a.add_argument("sf_dir")
    a.add_argument("out_dir")
    a.add_argument("--queries", nargs="*", default=None,
                   help="names from the registry (default: all)")

    v = sub.add_parser("validate", help="audit a change log against the ruleset")
    v.add_argument("log_dir")

    dfp = sub.add_parser(
        "diff",
        help="changefeed between two lake snapshots: write the I/U/D "
        "events that turn --from-epoch into --to-epoch (default current)",
    )
    dfp.add_argument("lake_dir")
    dfp.add_argument("out_dir")
    dfp.add_argument("--from-epoch", type=int, required=True)
    dfp.add_argument("--to-epoch", type=int, default=None)
    dfp.add_argument(
        "--include-before", action="store_true",
        help="before/after-image feed: add prev_* columns with the "
        "from-epoch values (what incremental view maintenance consumes)",
    )

    rs = sub.add_parser(
        "rescale",
        help="rewrite a committed lake to a new partition count "
        "(compaction for the whole-partition-epoch sink; resumable after)",
    )
    rs.add_argument("src_lake")
    rs.add_argument("dst_lake")
    rs.add_argument("--partitions", type=int, required=True)
    rs.add_argument("--keep-epochs", type=int, default=1)

    rp = sub.add_parser(
        "repair",
        help="rebuild ONE partition from the full change log (the fix "
        "for what fsck --deep finds) without re-replaying the rest",
    )
    rp.add_argument("log_dir")
    rp.add_argument("lake_dir")
    rp.add_argument("--part", type=int, required=True)
    rp.add_argument("--keep-epochs", type=int, default=1)

    sd = sub.add_parser(
        "schema-diff",
        help="schema drift between two lake epochs from manifest "
        "fingerprints (no data read)",
    )
    sd.add_argument("lake_dir")
    sd.add_argument("--from-epoch", type=int, required=True)
    sd.add_argument("--to-epoch", type=int, default=None)

    g = sub.add_parser(
        "get",
        help="point read: the live row for one (repo, path) key — routes "
        "to its hash partition from manifests, reads only that partition "
        "with the key filter pushed into the scan",
    )
    g.add_argument("lake_dir")
    g.add_argument("repo")
    g.add_argument("path")
    g.add_argument("--asof-epoch", type=int, default=None)
    g.add_argument(
        "--columns", default=None,
        help="comma-separated projection (default: all columns)",
    )

    s = sub.add_parser("status", help="lake state from manifests (no data read)")
    s.add_argument("lake_dir")
    s.add_argument(
        "--log-dir",
        default=None,
        help="also report replication lag vs this change log (footer "
        "stats only — still no data read)",
    )

    fk = sub.add_parser(
        "fsck",
        help="lake integrity audit: manifests vs files/footers (shallow); "
        "--deep re-reads data and re-derives digests, sha256 rows, "
        "key routing and LSN watermarks (one Ray task per partition)",
    )
    fk.add_argument("lake_dir")
    fk.add_argument("--deep", action="store_true")

    vc = sub.add_parser(
        "vacuum",
        help="standalone GC: drop temp files, losing-writer orphans and "
        "beyond-retention epochs no retained manifest references",
    )
    vc.add_argument("lake_dir")
    vc.add_argument("--keep-epochs", type=int, default=1)

    args = p.parse_args(argv)

    if args.cmd == "gen-data":
        from .sources.datagen import ChangeLogSpec, write_change_log

        spec = ChangeLogSpec(
            n_keys=args.keys,
            n_events=args.events,
            seed=args.seed,
            num_buckets=args.buckets,
            evolve_after_frac=args.evolve_after,
        )
        paths = write_change_log(spec, args.out_dir, processes=args.processes)
        print(json.dumps({"files": len(paths), "events": args.events}))
        return 0

    if args.cmd == "status":
        from .state import manifest as mf

        manifests = mf.read_all_manifests(args.lake_dir)
        ck = mf.checkpoints(manifests)
        rep = {
            "partitions": len(manifests),
            "rows": sum(m["rows"] for m in manifests.values()),
            "max_lsn": max(ck.values(), default=-1),
            "min_checkpoint_lsn": min(ck.values(), default=-1),
            "epochs": {str(p): m["epoch"] for p, m in sorted(manifests.items())},
        }
        if args.log_dir is not None:
            from .pipelines.replay import lake_lag

            rep["lag"] = lake_lag(args.log_dir, args.lake_dir)
        print(json.dumps(rep))
        return 0

    if args.cmd == "vacuum":
        from .state import manifest as mf

        print(json.dumps(mf.vacuum(args.lake_dir, keep_epochs=args.keep_epochs)))
        return 0

    if args.cmd == "schema-diff":  # manifest metadata only — no Ray
        from .pipelines.replay import lake_schema_diff

        print(
            json.dumps(
                lake_schema_diff(args.lake_dir, args.from_epoch, args.to_epoch)
            )
        )
        return 0

    if args.cmd == "fsck" and not args.deep:
        # shallow audit reads only manifests + parquet footers — no Ray
        from .pipelines.replay import fsck_lake

        rep = fsck_lake(args.lake_dir, deep=False)
        print(json.dumps(rep))
        return 0 if rep["ok"] else 1

    _ray_session(args.num_cpus)
    import ray

    try:
        if args.cmd == "replay":
            from .config import ReplayConfig, SinkConfig
            from .pipelines.replay import replay

            res = replay(
                args.log_dir,
                args.lake_dir,
                ReplayConfig(
                    num_partitions=args.partitions,
                    exchange=args.exchange,
                    quarantine_dir=args.quarantine_dir,
                    drop_invalid=not args.strict,
                ),
                sink=SinkConfig(
                    out_dir=args.lake_dir,
                    cluster_by_key=args.cluster_by_key,
                    keep_epochs=args.keep_epochs,
                    merge_on_read=args.merge_on_read,
                    max_delta_files=args.max_delta_files,
                ),
                resume=args.resume,
            )
            print(json.dumps(res.summary))
        elif args.cmd == "replay-txn":
            from .config import ReplayConfig
            from .pipelines.txn import replay_txn

            res = replay_txn(
                args.log_dir,
                args.out_root,
                ReplayConfig(num_partitions=args.partitions),
                sealed=args.sealed,
                keep_epochs=args.keep_epochs,
            )
            print(json.dumps({
                "snapshot": res["snapshot"],
                "demux": res["demux"],
                "tables": sorted(res["replays"]),
            }))
        elif args.cmd == "replay-agg":
            from .config import SinkConfig
            from .pipelines.aggregate import replay_aggregate

            res = replay_aggregate(
                args.log_dir,
                args.lake_dir,
                [c.strip() for c in args.value_cols.split(",") if c.strip()],
                num_partitions=args.partitions,
                resume=args.resume,
                sink=SinkConfig(
                    out_dir=args.lake_dir,
                    merge_on_read=args.merge_on_read,
                ),
                reset_free=args.reset_free,
                compact_threshold_rows=args.compact_threshold,
            )
            print(json.dumps(res.summary))
        elif args.cmd == "compact":
            from .state import manifest as _mf

            kind = args.kind
            if kind == "auto":
                kind = _mf.lake_kind(_mf.read_all_manifests(args.lake_dir))
            if kind == "aggregate":
                from .pipelines.aggregate import compact_aggregate_lake

                res = compact_aggregate_lake(
                    args.lake_dir,
                    min_chain=args.min_chain,
                    keep_epochs=args.keep_epochs,
                )
            else:
                from .pipelines.replay import compact_lake

                res = {
                    **compact_lake(
                        args.lake_dir,
                        min_chain=args.min_chain,
                        keep_epochs=args.keep_epochs,
                    ),
                    "lake_kind": "document",
                }
            print(json.dumps(res))
        elif args.cmd == "compact-log":
            from .pipelines.logtools import compact_change_log

            print(json.dumps(compact_change_log(
                args.log_dir, args.out_dir,
                keep_tombstones=not args.drop_tombstones,
                num_partitions=args.partitions,
                overwrite=args.overwrite,
            )))
        elif args.cmd == "fsck-log":
            from .pipelines.logtools import fsck_sidestore_log

            rep = fsck_sidestore_log(args.log_dir)
            print(json.dumps(rep))
            return 0 if rep["ok"] else 1
        elif args.cmd == "convert-sidestore":
            from .pipelines.logtools import convert_log_to_sidestore

            print(json.dumps(convert_log_to_sidestore(args.log_dir)))
        elif args.cmd == "bootstrap":
            from .pipelines.bootstrap import bootstrap_snapshot

            res = bootstrap_snapshot(
                args.snapshot, args.lake_dir, args.snapshot_lsn,
                num_partitions=args.partitions,
            )
            print(json.dumps(res.summary))
        elif args.cmd == "convert":
            from .sources.textlog import convert_text_log

            print(json.dumps(convert_text_log(args.src_dir, args.staging_dir)))
        elif args.cmd == "repair":
            from .pipelines.replay import fsck_lake, repair_partition

            rep = repair_partition(
                args.log_dir, args.lake_dir, args.part,
                keep_epochs=args.keep_epochs,
            )
            rep["fsck_ok_after"] = fsck_lake(args.lake_dir)["ok"]
            print(json.dumps(rep))
            return 0 if rep["fsck_ok_after"] else 1
        elif args.cmd == "get":
            from .pipelines.replay import lake_get, plan_point_read

            key = (args.repo, args.path)
            cols = args.columns.split(",") if args.columns else None
            plan = plan_point_read(
                args.lake_dir, [key], asof_epoch=args.asof_epoch
            )
            tbl = lake_get(
                args.lake_dir, [key], columns=cols, asof_epoch=args.asof_epoch
            )
            print(
                json.dumps(
                    {
                        "found": len(tbl) > 0,
                        "partition_probed": plan["parts"],
                        "partitions_total": plan["total_partitions"],
                        "rows": tbl.to_pylist(),
                    },
                    default=str,
                )
            )
            return 0 if len(tbl) else 3
        elif args.cmd == "fsck":  # --deep (shallow returned above)
            from .pipelines.replay import fsck_lake

            rep = fsck_lake(args.lake_dir, deep=True)
            print(json.dumps(rep))
            return 0 if rep["ok"] else 1
        elif args.cmd == "diff":
            from .pipelines.replay import lake_diff

            # a changefeed is bounded by the number of CHANGED rows, so a
            # driver-side materialize for the count is proportionate
            ds = lake_diff(
                args.lake_dir, args.from_epoch, args.to_epoch,
                include_before=args.include_before,
            ).materialize()
            n = ds.count()
            if n:
                ds.write_parquet(args.out_dir)
            ops = (
                ds.groupby("op").count().to_pandas().set_index("op")["count()"]
                if n
                else {}
            )
            print(
                json.dumps(
                    {
                        "events": n,
                        "by_op": {k: int(v) for k, v in dict(ops).items()},
                    }
                )
            )

        elif args.cmd == "rescale":
            from .pipelines.replay import rescale_lake

            summary = rescale_lake(
                args.src_lake,
                args.dst_lake,
                args.partitions,
                keep_epochs=args.keep_epochs,
            )
            print(json.dumps(summary))

        elif args.cmd == "export":
            from .pipelines.replay import read_lake, read_lake_with_pending

            if args.with_pending is not None:
                ds = read_lake_with_pending(args.with_pending, args.lake_dir)
                if args.columns:
                    ds = ds.select_columns(args.columns)
            else:
                ds = read_lake(args.lake_dir, columns=args.columns)
            n = ds.count()
            # streaming writers: one file per block, never a driver collect
            if args.format == "csv":
                ds.write_csv(args.out_dir)
            else:
                ds.write_json(args.out_dir)
            print(json.dumps({"rows": n, "format": args.format, "out_dir": args.out_dir}))
        elif args.cmd == "tail":
            from .pipelines.replay import tail_change_log

            summaries = tail_change_log(
                args.log_dir,
                args.lake_dir,
                poll_interval_s=args.poll_interval,
                max_polls=args.max_polls,
                stop_after_idle=args.stop_after_idle,
            )
            print(json.dumps({"polls": len(summaries), "last": summaries[-1]}))
        elif args.cmd == "analytics":
            import importlib
            import os as _os

            import pandas as _pd
            import ray.data as _rd

            # __ray_entry__ lives at the repo root (one level above this
            # package) — resolvable regardless of the caller's cwd
            repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
            if repo_root not in sys.path:
                sys.path.insert(0, repo_root)
            E = importlib.import_module("__ray_entry__")
            qs = E.queries()
            unknown = sorted(set(args.queries or []) - set(qs))
            if unknown:
                print(
                    json.dumps(
                        {"error": f"unknown queries: {unknown}", "valid": sorted(qs)}
                    ),
                    file=sys.stderr,
                )
                return 2
            names = args.queries or sorted(qs)
            _os.makedirs(args.out_dir, exist_ok=True)
            report = {}
            for name in names:
                out = qs[name](args.sf_dir)
                if isinstance(out, _rd.Dataset):
                    df = out.to_pandas()
                elif isinstance(out, _pd.DataFrame):
                    df = out
                else:
                    df = out.to_pandas()
                path = _os.path.join(args.out_dir, f"{name}.csv")
                df.to_csv(path, index=False)
                report[name] = len(df)
            print(json.dumps(report))
        elif args.cmd == "validate":
            from .sources.change_log import read_change_log, scan_change_log
            from .stages.validate import null_quality_gate, validate_events

            scan = scan_change_log(args.log_dir)
            ds = read_change_log(scan)
            report = validate_events(ds).to_pandas().to_dict(orient="records")
            nulls = null_quality_gate(ds).to_pandas().to_dict(orient="records")
            print(json.dumps({"rules": report, "null_gate": nulls}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
