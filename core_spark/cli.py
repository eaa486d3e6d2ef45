"""engine CLI — the gazctl analog (cmd/gazctl): batch bridge onto
journals and the catalog.

Commands (each wraps a batch DataFrame job):
  journals read     — read a journal [offset range / mod-time] to
                      stdout-JSON or a parquet dir
                      (gazctl journals read, journals_read.go:17-35)
  journals append   — append a parquet/csv/json input as one fragment
                      (journals_append.go:20-34)
  journals fragments— list the fragment index, optional time range
                      (journals_fragments.go:20-70)
  journals scan-audit— per-fragment pruning verdicts for a
                      prospective read (no scan, no Spark session)
  fragments bloom-probe — row-group verdicts from a fragment file's
                      writer-native bloom filters (SBBF / ORC
                      BLOOM_FILTER_UTF8), the tier below scan-audit
  journals prune    — retention by mod-time horizon
                      (journals_prune.go)
  journals list     — resolve a label selector over the catalog
                      (gazctl journals list -l ...)
  attach-uuids      — stamp v1 UUIDs onto an input for exactly-once
                      ingest (attach_uuids.go:13-50)
  journals sql      — run a SQL statement with journals mounted as
                      views — the batch face of the reference's
                      query-API pattern (word-count's prefix-count
                      RPC, word_count.go:222-278; bike-share's SQL
                      over materialized state, examples/bike-share/
                      api.go): materialized journals ARE the state,
                      Spark SQL is the query surface
  journals reset-head — trim the manifest to the durable contiguous
                      fragment prefix and resume appends after store
                      data loss (journals_reset_head.go)
  journals store-health — active write/read/remove store probe
                      (journals_store_health.go; the gateway's
                      /healthz as a batch command)
"""

from __future__ import annotations

import argparse
import json
import sys

from core_spark.session import get_spark


def _read_input(spark, path: str, fmt: str):
    reader = {"parquet": spark.read.parquet,
              "json": lambda p: spark.read.json(p),
              "csv": lambda p: spark.read.option("header", True).csv(p)}[fmt]
    return reader(path)


def _emit(df, output: str | None) -> None:
    """Write to parquet when --output is given, else stream NDJSON to
    stdout driver-boundedly."""
    if output:
        df.write.mode("overwrite").parquet(output)
    else:
        for row in df.toLocalIterator():
            print(json.dumps(row.asDict(), default=str))


def cmd_read(args) -> int:
    from core_spark.sources.journal import Journal, parse_where

    spark = get_spark("engine-cli")
    j = Journal(args.root, args.journal)
    try:
        where = parse_where(args.where)
    except ValueError as e:
        raise SystemExit(str(e)) from e
    if args.block:
        # Blocking tail (gazctl `journals read -block`; ReadRequest.
        # block, protocol.proto:420-439): poll the manifest — the
        # cross-process commit signal — until data past --offset
        # commits or the deadline lapses. Deadline-bounded rather
        # than forever so a scripted caller can't hang unbounded;
        # on timeout: no rows, exit 0, a status line on stderr (the
        # OFFSET_NOT_YET_AVAILABLE analog — re-run to keep tailing).
        if args.at_version is not None:
            raise SystemExit(
                "--block with --at-version is contradictory: a pinned "
                "snapshot never grows"
            )
        import sys
        import time as _t

        want = args.offset if args.offset is not None else 0
        t_end = _t.monotonic() + max(0.0, args.block_deadline)
        while j.manifest().next_offset <= want:
            if _t.monotonic() >= t_end:
                print(
                    json.dumps(
                        {"blocked": True, "resume_offset": want,
                         "timeout_s": args.block_deadline}
                    ),
                    file=sys.stderr,
                )
                return 0
            _t.sleep(min(0.1, max(0.0, t_end - _t.monotonic())))
    df = j.read(
        spark,
        begin=args.offset,
        end=args.end_offset,
        begin_mod_time=args.begin_mod_time,
        at_version=args.at_version,
        where=where,
        merge_schema=args.merge_schema,
    )
    _emit(df if args.output else df.orderBy("_offset"), args.output)
    return 0


def cmd_append(args) -> int:
    from core_spark.sources.journal import Journal

    spark = get_spark("engine-cli")
    df = _read_input(spark, args.input, args.framing)
    frag = Journal(args.root, args.journal).append(df)
    print(json.dumps({"begin": frag.begin, "end": frag.end,
                      "n_records": frag.n_records, "path": frag.path}))
    return 0


def cmd_fragments(args) -> int:
    from core_spark.sources.journal import Journal

    spark = get_spark("engine-cli")
    df = Journal(args.root, args.journal).fragments_df(spark)
    if args.from_time is not None:
        df = df.filter(df.mod_time >= args.from_time)
    if args.to_time is not None:
        df = df.filter(df.mod_time < args.to_time)
    for row in df.orderBy("begin_off").collect():
        print(json.dumps(row.asDict(), default=str))
    return 0


def cmd_scan_audit(args) -> int:
    """Per-fragment pruning decision table for a prospective read
    (Journal.scan_audit): covering / zone-map / bloom verdicts and
    the conjunction read() would execute — one JSON line per
    fragment, no scan, no Spark session (manifest arithmetic
    only)."""
    from core_spark.sources.journal import Journal, parse_where

    audit = Journal(args.root, args.journal).scan_audit(
        begin=args.offset,
        end=args.end_offset,
        begin_mod_time=args.begin_mod_time,
        where=parse_where(args.where),
        at_version=args.at_version,
    )
    for row in audit:
        print(json.dumps(row, default=str))
    return 0


def cmd_bloom_probe(args) -> int:
    """Row-group point-lookup verdicts from a fragment FILE's
    writer-native bloom filters (parquet split-block SBBF via
    from-spec XXH64 / ORC BLOOM_FILTER_UTF8 via Murmur3-64) — one
    JSON line per file: the sub-fragment tier below
    journals-scan-audit's manifest blooms, answering "which row
    groups inside this fragment could hold value X" with two ranged
    metadata reads and no Spark session. Values parse like --where
    literals: quote to force a string ('0123'), bare numerics probe
    typed maps."""
    import glob as _glob
    import os as _os

    from core_spark.sources.journal import parse_where

    ((col, op, value),) = [parse_where([f"{args.column}={args.value}"])[0]]
    if op != "=":
        raise SystemExit("bloom probes are equality-only")
    paths = []
    for pat in ("*.parquet", "*.orc"):
        paths += _glob.glob(_os.path.join(args.path, pat))
    if _os.path.isfile(args.path):
        paths = [args.path]
    if not paths:
        print(json.dumps({"error": f"no data files under {args.path}"}))
        return 1
    for path in sorted(paths):
        raw = open(path, "rb").read()
        if path.endswith(".orc"):
            from core_spark.functions.orcfile import orc_bloom_may_contain

            verdicts = [
                x for s_ in orc_bloom_may_contain(raw, col, value)
                for x in s_
            ]
        else:
            from core_spark.functions.parquetfile import (
                parquet_bloom_may_contain,
            )

            verdicts = parquet_bloom_may_contain(raw, col, value)
        print(
            json.dumps(
                {
                    "file": path,
                    "column": col,
                    "value": value,
                    "row_groups": verdicts,
                    "may_contain": any(v for v in verdicts if v),
                    "no_filter": all(v is None for v in verdicts),
                }
            )
        )
    return 0


def cmd_prune(args) -> int:
    from core_spark.sources.journal import Journal

    n = Journal(args.root, args.journal).prune(args.keep_after)
    print(json.dumps({"pruned": n}))
    return 0


def cmd_vacuum(args) -> int:
    from core_spark.sources.journal import Journal

    n = Journal(args.root, args.journal).vacuum(
        grace_seconds=args.grace_seconds,
        from_version=args.from_version,
    )
    print(json.dumps({"vacuumed": n}))
    return 0


def cmd_reset_head(args) -> int:
    """gazctl `journals reset-head`: trim the manifest to the
    longest contiguous durable fragment prefix and reset the append
    head there (recovery after store data loss)."""
    from core_spark.sources.journal import Journal

    print(json.dumps(Journal(args.root, args.journal).reset_head()))
    return 0


def cmd_store_health(args) -> int:
    """gazctl `journals store-health`: active write/read/remove
    probe under the store root (the gateway's /healthz check, as a
    batch command)."""
    from core_spark.sources.stores import probe_store

    health = probe_store(args.root)
    print(json.dumps(health))
    return 0 if health["ok"] else 1


def cmd_shards_stat(args) -> int:
    """Stat: per-shard committed batch, fence, and read-through
    offsets, parsed from the output journal's registers — the Stat
    RPC surface (consumer/shard_api.go:24-51) without a server."""
    from collections import defaultdict

    from core_spark.sources.journal import Journal

    m = Journal(args.root, args.journal).manifest()
    shards: dict = defaultdict(lambda: {"fence": None, "batch": None, "read_through": {}})
    for k, v in m.registers.items():
        if k.startswith("fence:"):
            shards[k[6:]]["fence"] = int(v)
        elif k.startswith("batch:"):
            shards[k[6:]]["batch"] = int(v)
        elif k.startswith("rt:"):
            _, shard, src = k.split(":", 2)
            shards[shard]["read_through"][src] = int(v)
    for shard in sorted(shards):
        print(json.dumps({"shard": shard, **shards[shard]}))
    return 0


def cmd_shards_await(args) -> int:
    """Block until the shard's committed progress covers a source
    offset (read-your-writes barrier over the Stat registers)."""
    from core_spark.streaming.shard import await_offset

    rt = await_offset(
        args.root,
        args.journal,
        args.shard,
        args.source,
        args.offset,
        timeout=args.timeout,
    )
    print(json.dumps({"read_through": rt}))
    return 0


def cmd_compact(args) -> int:
    from core_spark.sources.journal import Journal

    spark = get_spark("engine-cli")
    n = Journal(args.root, args.journal).compact(
        spark,
        target_records=args.target_records,
        cluster_by=args.cluster_by,
    )
    print(json.dumps({"compacted": n}))
    return 0


def cmd_list(args) -> int:
    from core_spark.catalog import LabelSelector, resolve

    spark = get_spark("engine-cli")
    include: dict[str, tuple[str, ...]] = {}
    exclude: dict[str, tuple[str, ...]] = {}
    for spec in args.selector or []:
        neg = spec.startswith("!")
        body = spec[1:] if neg else spec
        name, _, vals = body.partition("=")
        target = exclude if neg else include
        target[name] = tuple(v for v in vals.split(",") if v)
    for row in resolve(spark, LabelSelector(include=include, exclude=exclude)).collect():
        print(row.name)
    return 0


def cmd_apply(args) -> int:
    """journals apply (gazctl journals apply / ApplyJournals RPC):
    upsert/delete JournalSpecs in one catalog CAS. Specs are JSON
    (inline or @file) in the catalog's own serialization; validation
    failures and lost CAS races exit 1 with the reason — no Spark
    session needed (DDL is metadata-only)."""
    from core_spark.catalog import (
        ApplyConflict,
        CatalogStore,
        JournalSpec,
        SpecValidation,
    )

    specs = []
    for raw in args.spec or []:
        if raw.startswith("@"):
            with open(raw[1:]) as fh:
                raw = fh.read()
        specs.append(JournalSpec.from_dict(json.loads(raw)))
    try:
        v = CatalogStore(args.root).apply(
            upserts=tuple(specs),
            deletions=tuple(args.delete or []),
            expect_version=args.expect_version,
        )
    except (SpecValidation, ApplyConflict) as e:
        print(json.dumps({"error": str(e)}))
        return 1
    print(json.dumps({"version": v}))
    return 0


def cmd_specs(args) -> int:
    """Dump the catalog's current JournalSpecs as JSON lines."""
    from dataclasses import asdict

    from core_spark.catalog import CatalogStore

    for s in CatalogStore(args.root).specs():
        d = asdict(s)
        d["labels"] = [[lb["name"], lb["value"]] for lb in d["labels"]]
        print(json.dumps(d))
    return 0


def cmd_shards_apply(args) -> int:
    """shards apply: upsert/delete ShardSpecs with a version CAS —
    the consumer Apply RPC's DDL face (specs are the declarative
    half; the transform is app code resolved at start)."""
    from core_spark.catalog import (
        ApplyConflict,
        ShardCatalog,
        ShardSpec,
        SpecValidation,
    )

    specs = []
    for raw in args.spec or []:
        if raw.startswith("@"):
            with open(raw[1:]) as fh:
                raw = fh.read()
        specs.append(ShardSpec.from_dict(json.loads(raw)))
    try:
        v = ShardCatalog(args.root).apply(
            upserts=tuple(specs),
            deletions=tuple(args.delete or []),
            expect_version=args.expect_version,
        )
    except (SpecValidation, ApplyConflict) as e:
        print(json.dumps({"error": str(e)}))
        return 1
    print(json.dumps({"version": v}))
    return 0


def cmd_shards_specs(args) -> int:
    from dataclasses import asdict

    from core_spark.catalog import ShardCatalog

    for s in ShardCatalog(args.root).specs():
        d = asdict(s)
        d["labels"] = [[lb["name"], lb["value"]] for lb in d["labels"]]
        print(json.dumps(d))
    return 0


def cmd_serve(args) -> int:
    """serve: run the HTTP gateway as a process (the `gazette serve`
    face). --keys enables KeyedAuth (base64, comma/space separated;
    first signs, any verifies, `AA==` allows missing during rollout);
    omitted = open gateway. Blocks until interrupted; prints one JSON
    line with the bound address first so wrappers can scrape it."""
    import binascii

    from core_spark.auth import KeyedAuth
    from core_spark.gateway import JournalGateway

    try:
        auth = KeyedAuth(args.keys) if args.keys else None
    except (ValueError, binascii.Error) as e:
        print(json.dumps({"error": f"bad --keys: {e}"}))
        return 1
    spark = get_spark("engine-gateway")
    gw = JournalGateway(
        spark,
        args.root,
        host=args.host,
        port=args.port,
        auth=auth,
    )
    host, port = gw.start()
    print(json.dumps({"host": host, "port": port, "root": args.root}),
          flush=True)
    import threading

    stop = threading.Event()
    try:
        stop.wait()  # serve until interrupted
    except KeyboardInterrupt:
        pass
    finally:
        gw.stop()
    return 0


def cmd_registers(args) -> int:
    """journals registers: dump and/or update a journal's registers
    (the zero-content register-op Append). No Spark session —
    registers are manifest metadata."""
    from core_spark.sources.journal import Journal, RegisterMismatch

    def kv(items):
        out = {}
        for e in items or []:
            k, _, v = e.partition("=")
            out[k] = v
        return out

    j = Journal(args.root, args.journal)
    if args.set or args.clear or args.check:
        try:
            regs = j.update_registers(
                check_registers=kv(args.check) or None,
                set_registers=kv(args.set) or None,
                clear_registers=tuple(args.clear or []),
            )
        except RegisterMismatch as e:
            print(json.dumps({"error": str(e)}))
            return 1
    else:
        regs = j.manifest().registers
    print(json.dumps(regs, sort_keys=True))
    return 0


def cmd_attach_uuids(args) -> int:
    from core_spark.streaming.publisher import attach_uuids
    from pyspark.sql import functions as F

    spark = get_spark("engine-cli")
    df = _read_input(spark, args.input, args.framing)
    stamped = attach_uuids(
        df.withColumn("_ord", F.monotonically_increasing_id()),
        producer_seed=F.lit(args.producer_seed),
        order=F.col("_ord"),
    ).drop("_ord")
    stamped.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"rows": stamped.count(), "output": args.output}))
    return 0


def cmd_sql(args) -> int:
    from core_spark.sources.journal import Journal

    spark = get_spark("engine-cli")
    mounted: dict[str, str] = {}
    for mount in args.view or []:
        view, _, name = mount.partition("=")
        if not name:
            # bare journal name: view name = last path segment
            view, name = mount.rsplit("/", 1)[-1], mount
        if view in mounted:
            # fail loudly — a silent createOrReplaceTempView would run
            # the query over whichever mount came last
            print(
                f"view {view!r} mounted twice ({mounted[view]!r} and "
                f"{name!r}); use view=journal/name to disambiguate",
                file=sys.stderr,
            )
            return 2
        mounted[view] = name
        Journal(args.root, name).read(spark).createOrReplaceTempView(view)
    _emit(spark.sql(args.query), args.output)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="engine", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    jr = sub.add_parser("journals-read")
    jr.add_argument("--root", required=True)
    jr.add_argument("--journal", required=True)
    jr.add_argument("--offset", type=int, default=None)
    jr.add_argument("--end-offset", type=int, default=None)
    jr.add_argument("--begin-mod-time", type=float, default=None)
    # time travel: read AS OF a past manifest version (CAS history)
    jr.add_argument("--at-version", type=int, default=None)
    # repeatable col<op>value predicate: applied exactly AND pruned
    # against manifest zone maps / bloom filters before listing
    jr.add_argument("--where", action="append", default=[])
    # schema-on-read for journals whose producers evolved columns
    jr.add_argument("--merge-schema", action="store_true")
    # blocking tail: wait for data past --offset (gazctl -block)
    jr.add_argument("--block", action="store_true")
    jr.add_argument("--block-deadline", type=float, default=10.0)
    jr.add_argument("--output", default=None)
    jr.set_defaults(fn=cmd_read)

    ja = sub.add_parser("journals-append")
    ja.add_argument("--root", required=True)
    ja.add_argument("--journal", required=True)
    ja.add_argument("--input", required=True)
    ja.add_argument("--framing", choices=["parquet", "json", "csv"],
                    default="parquet")
    ja.set_defaults(fn=cmd_append)

    jf = sub.add_parser("journals-fragments")
    jf.add_argument("--root", required=True)
    jf.add_argument("--journal", required=True)
    jf.add_argument("--from-time", type=float, default=None)
    jf.add_argument("--to-time", type=float, default=None)
    jf.set_defaults(fn=cmd_fragments)

    jsa = sub.add_parser("journals-scan-audit")
    jsa.add_argument("--root", required=True)
    jsa.add_argument("--journal", required=True)
    jsa.add_argument("--offset", type=int, default=None)
    jsa.add_argument("--end-offset", type=int, default=None)
    jsa.add_argument("--begin-mod-time", type=float, default=None)
    jsa.add_argument("--at-version", type=int, default=None)
    jsa.add_argument("--where", action="append", default=[])
    jsa.set_defaults(fn=cmd_scan_audit)

    jbp = sub.add_parser("fragments-bloom-probe")
    jbp.add_argument("--path", required=True,
                     help="fragment dir or a single parquet/orc file")
    jbp.add_argument("--column", required=True)
    jbp.add_argument("--value", required=True)
    jbp.set_defaults(fn=cmd_bloom_probe)

    jp = sub.add_parser("journals-prune")
    jp.add_argument("--root", required=True)
    jp.add_argument("--journal", required=True)
    jp.add_argument("--keep-after", type=float, required=True)
    jp.set_defaults(fn=cmd_prune)

    jrh = sub.add_parser("journals-reset-head")
    jrh.add_argument("--root", required=True)
    jrh.add_argument("--journal", required=True)
    jrh.set_defaults(fn=cmd_reset_head)

    jsh = sub.add_parser("journals-store-health")
    jsh.add_argument("--root", required=True)
    jsh.set_defaults(fn=cmd_store_health)

    jv = sub.add_parser("journals-vacuum")
    jv.add_argument("--root", required=True)
    jv.add_argument("--journal", required=True)
    jv.add_argument(
        "--grace-seconds", type=float, default=86400.0,
        help="only unreferenced dirs older than this are removed "
             "(protects in-flight appends)",
    )
    jv.add_argument(
        "--from-version", type=int, default=None,
        help="scope the referenced set to manifest versions >= this: "
             "fragments held only by older history (reset-head drops) "
             "become reclaimable; time travel below it breaks",
    )
    jv.set_defaults(fn=cmd_vacuum)

    jc = sub.add_parser("journals-compact")
    jc.add_argument("--root", required=True)
    jc.add_argument("--journal", required=True)
    jc.add_argument("--target-records", type=int, default=512_000)
    jc.add_argument(
        "--cluster-by", action="append",
        help="sort merged fragments by this column (repeatable) — "
             "the OPTIMIZE ZORDER analog; offsets are preserved",
    )
    jc.set_defaults(fn=cmd_compact)

    st = sub.add_parser("shards-stat")
    st.add_argument("--root", required=True)
    st.add_argument("--journal", required=True, help="the shard's OUTPUT journal")
    st.set_defaults(fn=cmd_shards_stat)

    sa = sub.add_parser("shards-await")
    sa.add_argument("--root", required=True)
    sa.add_argument("--journal", required=True, help="the shard's OUTPUT journal")
    sa.add_argument("--shard", required=True)
    sa.add_argument("--source", required=True, help="source journal name")
    sa.add_argument("--offset", type=int, required=True)
    sa.add_argument("--timeout", type=float, default=30.0)
    sa.set_defaults(fn=cmd_shards_await)

    jl = sub.add_parser("journals-list")
    jl.add_argument(
        "-l", "--selector", action="append",
        help="label selector: name=v1,v2 or !name=v (repeatable)",
    )
    jl.set_defaults(fn=cmd_list)

    jap = sub.add_parser("journals-apply")
    jap.add_argument("--root", required=True)
    jap.add_argument(
        "--spec", action="append",
        help="JournalSpec JSON, inline or @file (repeatable upsert)",
    )
    jap.add_argument("--delete", action="append",
                     help="journal name to delete (repeatable)")
    jap.add_argument("--expect-version", type=int, default=None)
    jap.set_defaults(fn=cmd_apply)

    jsp = sub.add_parser("journals-specs")
    jsp.add_argument("--root", required=True)
    jsp.set_defaults(fn=cmd_specs)

    sap = sub.add_parser("shards-apply")
    sap.add_argument("--root", required=True)
    sap.add_argument("--spec", action="append",
                     help="ShardSpec JSON, inline or @file (repeatable)")
    sap.add_argument("--delete", action="append",
                     help="shard id to delete (repeatable)")
    sap.add_argument("--expect-version", type=int, default=None)
    sap.set_defaults(fn=cmd_shards_apply)

    ssp = sub.add_parser("shards-specs")
    ssp.add_argument("--root", required=True)
    ssp.set_defaults(fn=cmd_shards_specs)

    sv = sub.add_parser("serve")
    sv.add_argument("--root", required=True)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=0)
    sv.add_argument("--keys", default=None,
                    help="base64 pre-shared keys for KeyedAuth; "
                         "omit for an open gateway")
    sv.set_defaults(fn=cmd_serve)

    jrg = sub.add_parser("journals-registers")
    jrg.add_argument("--root", required=True)
    jrg.add_argument("--journal", required=True)
    jrg.add_argument("--set", action="append", help="k=v (repeatable)")
    jrg.add_argument("--clear", action="append", help="key (repeatable)")
    jrg.add_argument("--check", action="append",
                     help="k=v precondition (repeatable)")
    jrg.set_defaults(fn=cmd_registers)

    js = sub.add_parser("journals-sql")
    js.add_argument("--root", required=True)
    js.add_argument(
        "-v", "--view", action="append",
        help="mount a journal as a view: view=journal/name, or a bare "
             "journal name (view = last path segment); repeatable",
    )
    js.add_argument("--query", required=True)
    js.add_argument("--output", default=None)
    js.set_defaults(fn=cmd_sql)

    au = sub.add_parser("attach-uuids")
    au.add_argument("--input", required=True)
    au.add_argument("--output", required=True)
    au.add_argument("--framing", choices=["parquet", "json", "csv"],
                    default="csv")
    au.add_argument("--producer-seed", default="cli")
    au.set_defaults(fn=cmd_attach_uuids)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
