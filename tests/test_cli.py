"""CLI: in-process drives of each subcommand (the gazctl batch
bridge). The spark session is shared via getOrCreate."""

import json

from core_spark.cli import main


def test_append_fragments_read_prune(spark, tmp_path, capsys):
    root = str(tmp_path / "j")

    assert main([
        "journals-append", "--root", root, "--journal", "demo/n",
        "--input", "/root/testdata/sf0.001/nation.parquet",
    ]) == 0
    frag = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (frag["begin"], frag["end"]) == (0, 25)

    assert main([
        "journals-fragments", "--root", root, "--journal", "demo/n",
    ]) == 0
    frags = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(frags) == 1 and frags[0]["n_records"] == 25

    assert main([
        "journals-read", "--root", root, "--journal", "demo/n",
        "--offset", "5", "--end-offset", "8",
    ]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [r["_offset"] for r in rows] == [5, 6, 7]

    assert main([
        "journals-prune", "--root", root, "--journal", "demo/n",
        "--keep-after", "0",
    ]) == 0
    assert json.loads(capsys.readouterr().out.strip())["pruned"] == 0


def test_selector_list(spark, capsys):
    assert main([
        "journals-list",
        "-l", "message-type=bike_share.Ride",
        "-l", "!region=eu-west1",
    ]) == 0
    names = capsys.readouterr().out.strip().splitlines()
    assert names == ["examples/bike-share/rides/part-000"]


def test_attach_uuids(spark, tmp_path, capsys):
    src = tmp_path / "in.csv"
    src.write_text("a,b\n1,x\n2,y\n")
    out = str(tmp_path / "out.pq")
    assert main([
        "attach-uuids", "--input", str(src), "--output", out,
        "--framing", "csv",
    ]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rows"] == 2
    df = spark.read.parquet(out)
    assert df.select("uuid").distinct().count() == 2  # distinct clocks

def test_journals_sql(spark, tmp_path, capsys):
    """SQL over mounted journal views — the word-count prefix-query /
    bike-share SQL-API pattern as a batch command."""
    import json as _json

    from pyspark.sql import functions as F

    from core_spark.cli import main
    from core_spark.sources.journal import Journal

    root = str(tmp_path / "journals")
    j = Journal(root, "apps/counts")
    j.append(
        spark.createDataFrame(
            [("the", 5), ("then", 3), ("dog", 9)], "ngram string, cnt long"
        )
    )
    rc = main([
        "journals-sql", "--root", root,
        "-v", "counts=apps/counts",
        "--query",
        "SELECT ngram, cnt FROM counts WHERE ngram LIKE 'the%' "
        "ORDER BY ngram",
    ])
    assert rc == 0
    rows = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert rows == [{"ngram": "the", "cnt": 5}, {"ngram": "then", "cnt": 3}]


def test_shards_stat_and_await(spark, tmp_path, capsys):
    """shards-stat surfaces fence/batch/read-through registers; the
    await wrapper gates on a covered offset (Stat RPC surface)."""
    import json as _json

    from core_spark.cli import main
    from core_spark.sources.journal import Journal

    root = str(tmp_path)
    j = Journal(root, "out/j")
    j.append(
        spark.range(3).withColumnRenamed("id", "v"),
        set_registers={
            "fence:s1": "2",
            "batch:s1": "7",
            "rt:s1:src/a": "120",
        },
    )
    assert main(["shards-stat", "--root", root, "--journal", "out/j"]) == 0
    row = _json.loads(capsys.readouterr().out.strip())
    assert row == {
        "shard": "s1",
        "fence": 2,
        "batch": 7,
        "read_through": {"src/a": 120},
    }

    assert (
        main([
            "shards-await", "--root", root, "--journal", "out/j",
            "--shard", "s1", "--source", "src/a", "--offset", "100",
        ])
        == 0
    )
    assert _json.loads(capsys.readouterr().out.strip()) == {"read_through": 120}

    import pytest as _pt

    with _pt.raises(TimeoutError):
        main([
            "shards-await", "--root", root, "--journal", "out/j",
            "--shard", "s1", "--source", "src/a", "--offset", "999",
            "--timeout", "0.3",
        ])


def test_read_where_predicates(spark, tmp_path, capsys):
    """--where predicates apply exactly and ride the manifest pruning
    path (zone maps for numerics, blooms for spec-listed strings)."""
    from core_spark.catalog import CatalogStore, JournalSpec
    from core_spark.sources.journal import Journal

    root = str(tmp_path / "j")
    CatalogStore(root).apply(
        upserts=(JournalSpec(name="demo/w", bloom_columns=("n_name",)),)
    )
    j = Journal(root, "demo/w")
    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    j.append(df.filter("n_regionkey <= 2"))
    j.append(df.filter("n_regionkey > 2"))

    assert main([
        "journals-read", "--root", root, "--journal", "demo/w",
        "--where", "n_regionkey>=3", "--where", "n_name=NATION_4",
    ]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [r["n_name"] for r in rows] == ["NATION_4"]

    import pytest

    with pytest.raises(SystemExit):
        main([
            "journals-read", "--root", root, "--journal", "demo/w",
            "--where", "garbage",
        ])


def test_apply_and_specs(spark, tmp_path, capsys):
    """journals-apply / journals-specs: the gazctl DDL face — CAS'd
    upserts with validation, no Spark session involved."""
    root = str(tmp_path / "cat")
    assert main([
        "journals-apply", "--root", root,
        "--spec", json.dumps({
            "name": "topic/p0",
            "labels": [["app", "demo"]],
            "bloom_columns": ["lang"],
            # Generous cap: the rate must be PRESENT (the append below
            # proves the applied spec drives the writer) but not
            # binding — at 1024 B/s the parquet fragment's token-bucket
            # debt made this test sleep ~17 MINUTES (r14: it was 47% of
            # the whole suite's wall time and the reason the driver's
            # pytest gate timed out). Throttle math is pinned by
            # test_flow_control.py with synthetic clocks.
            "max_append_rate": 1 << 30,
        }),
    ]) == 0
    assert json.loads(capsys.readouterr().out.strip())["version"] == 1

    assert main(["journals-specs", "--root", root]) == 0
    specs = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [s["name"] for s in specs] == ["topic/p0"]
    assert specs[0]["bloom_columns"] == ["lang"]
    assert specs[0]["labels"] == [["app", "demo"]]

    # invalid spec -> exit 1 with the reason, catalog unchanged
    assert main([
        "journals-apply", "--root", root,
        "--spec", json.dumps({"name": "bad//name"}),
    ]) == 1
    assert "error" in json.loads(capsys.readouterr().out.strip())

    # CAS: stale expected version loses
    assert main([
        "journals-apply", "--root", root, "--delete", "topic/p0",
        "--expect-version", "0",
    ]) == 1

    # the applied spec DRIVES appends: bloom index + rate policy live
    from core_spark.sources.journal import Journal

    j = Journal(root, "topic/p0")
    j.append(spark.createDataFrame([(1, "en")], "v long, lang string"))
    assert "lang" in j.manifest().fragments[0].blooms


def test_registers_roundtrip(spark, tmp_path, capsys):
    """journals-registers: zero-content register ops — set/check/clear
    ride a manifest CAS with no fragment written."""
    from core_spark.sources.journal import Journal

    root = str(tmp_path / "jr")
    j = Journal(root, "reg/j0")
    j.append(spark.range(3).withColumnRenamed("id", "v"))
    n_frags = len(j.manifest().fragments)

    assert main([
        "journals-registers", "--root", root, "--journal", "reg/j0",
        "--set", "owner=w1", "--set", "epoch=5",
    ]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {
        "owner": "w1", "epoch": "5"
    }

    # failed precondition: exit 1, registers unchanged
    assert main([
        "journals-registers", "--root", root, "--journal", "reg/j0",
        "--check", "owner=w2", "--set", "owner=w3",
    ]) == 1
    capsys.readouterr()

    # passing precondition + clear
    assert main([
        "journals-registers", "--root", root, "--journal", "reg/j0",
        "--check", "owner=w1", "--clear", "epoch",
    ]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {"owner": "w1"}

    m = j.manifest()
    assert len(m.fragments) == n_frags  # no fragment was written
    assert m.registers == {"owner": "w1"}
    # offsets untouched: data reads unaffected
    assert j.read(spark).count() == 3


def test_serve_subprocess_healthz_and_auth(tmp_path):
    """`serve` runs the gateway as a real process: bound address on
    stdout, /healthz open, data verbs gated by --keys."""
    import base64
    import signal
    import subprocess
    import sys
    import urllib.error
    import urllib.request

    key = base64.b64encode(b"serve-test-key").decode()
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "core_spark.cli", "serve",
            "--root", str(tmp_path / "j"), "--keys", key,
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd="/root/repo",
    )
    try:
        addr = json.loads(proc.stdout.readline())
        base = f"http://{addr['host']}:{addr['port']}"
        with urllib.request.urlopen(f"{base}/healthz", timeout=10) as r:
            assert json.loads(r.read())["ok"] is True
        try:
            urllib.request.urlopen(f"{base}/journals", timeout=10)
            raise AssertionError("unauthenticated /journals must 401")
        except urllib.error.HTTPError as e:
            assert e.code == 401
        from core_spark.auth import LIST, KeyedAuth

        tok = KeyedAuth(key).authorize(LIST)
        req = urllib.request.Request(
            f"{base}/journals", headers={"Authorization": f"Bearer {tok}"}
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.status == 200
    finally:
        proc.send_signal(signal.SIGINT)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_read_at_version(spark, tmp_path, capsys):
    from core_spark.sources.journal import Journal

    root = str(tmp_path / "tt")
    j = Journal(root, "t/j0")
    j.append(spark.range(2).withColumnRenamed("id", "v"))
    v1 = j.manifest().version
    j.append(spark.range(2, 5).withColumnRenamed("id", "v"))

    assert main([
        "journals-read", "--root", root, "--journal", "t/j0",
        "--at-version", str(v1),
    ]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [r["v"] for r in rows] == [0, 1]


def test_read_block_wakes_on_concurrent_append(spark, tmp_path, capsys):
    """gazctl `journals read -block` parity: a blocked read returns
    rows once a concurrent appender commits past --offset, and a
    deadline lapse with no data exits 0 with no rows (the
    OFFSET_NOT_YET_AVAILABLE analog)."""
    import threading
    import time

    root = str(tmp_path / "jb")
    assert main([
        "journals-append", "--root", root, "--journal", "demo/b",
        "--input", "/root/testdata/sf0.001/nation.parquet",
    ]) == 0
    capsys.readouterr()

    # deadline lapse: offset 25 not yet available -> no rows, exit 0
    t0 = time.monotonic()
    assert main([
        "journals-read", "--root", root, "--journal", "demo/b",
        "--offset", "25", "--block", "--block-deadline", "0.5",
    ]) == 0
    out = capsys.readouterr()
    assert out.out.strip() == ""
    assert json.loads(out.err.strip())["resume_offset"] == 25
    assert time.monotonic() - t0 >= 0.5

    # concurrent append wakes the blocked read within the deadline
    def appender():
        time.sleep(0.6)
        main([
            "journals-append", "--root", root, "--journal", "demo/b",
            "--input", "/root/testdata/sf0.001/region.parquet",
        ])

    th = threading.Thread(target=appender)
    th.start()
    assert main([
        "journals-read", "--root", root, "--journal", "demo/b",
        "--offset", "25", "--block", "--block-deadline", "15",
    ]) == 0
    th.join()
    text = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(l) for l in text if l.startswith("{")]
    offs = [r["_offset"] for r in rows if "_offset" in r]
    assert offs and min(offs) == 25  # the second append's rows

    # --block with --at-version is contradictory
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="contradictory"):
        main([
            "journals-read", "--root", root, "--journal", "demo/b",
            "--block", "--at-version", "1",
        ])


def test_scan_audit_verb(spark, tmp_path, capsys):
    """journals-scan-audit prints one pruning-verdict line per
    fragment, with the same where-predicate syntax as journals-read,
    and touches no data (works without building a session)."""
    root = str(tmp_path / "j")
    assert main([
        "journals-append", "--root", root, "--journal", "demo/n",
        "--input", "/root/testdata/sf0.001/nation.parquet",
    ]) == 0
    capsys.readouterr()
    assert main([
        "journals-scan-audit", "--root", root, "--journal", "demo/n",
        "--offset", "5", "--where", "n_regionkey<2",
    ]) == 0
    rows = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
    ]
    assert len(rows) == 1
    r = rows[0]
    assert r["covering"] is True and r["read"] is True
    assert r["stats_ok"] is True and r["bloom_ok"] is True
    # a provably-empty predicate flips the zone-map verdict
    assert main([
        "journals-scan-audit", "--root", root, "--journal", "demo/n",
        "--where", "n_regionkey>99",
    ]) == 0
    r2 = json.loads(capsys.readouterr().out.strip())
    assert r2["stats_ok"] is False and r2["read"] is False


def test_fragments_bloom_probe(spark, tmp_path, capsys):
    """fragments-bloom-probe: row-group verdicts off a fragment
    file's writer-native blooms — present values may-contain,
    absent values prune, no-filter files say so."""
    from core_spark.catalog import CatalogStore, JournalSpec
    from core_spark.sources.journal import Journal

    root = str(tmp_path / "jb")
    CatalogStore(root).apply(
        upserts=(JournalSpec(name="demo/b", bloom_columns=("k",)),)
    )
    j = Journal(root, "demo/b")
    j.append(spark.range(0, 2000).selectExpr("id AS k"))
    frag_dir = str(tmp_path / "jb" / "demo" / "b")
    import os as _os

    m = j.manifest()
    path = _os.path.join(str(j.root), m.fragments[0].path)

    assert main([
        "fragments-bloom-probe", "--path", path,
        "--column", "k", "--value", "7",
    ]) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["may_contain"] is True and row["no_filter"] is False

    hits = 0
    for v in range(900000, 900020):
        assert main([
            "fragments-bloom-probe", "--path", path,
            "--column", "k", "--value", str(v),
        ]) == 0
        row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        hits += row["may_contain"]
    assert hits <= 1  # absent values overwhelmingly prune
