"""Append-path rate policy (broker/append_flow_control.go:11-43): a
JournalSpec max_append_rate throttles Journal.append — and therefore
gateway PUTs, which funnel through it — while uncapped journals are
untouched."""

import json
import time
import urllib.request

from pyspark.sql import functions as F

from core_spark.catalog import CatalogStore, JournalSpec, SpecValidation
from core_spark.gateway import JournalGateway
from core_spark.sources.flow_control import TokenBucket, bucket_for
from core_spark.sources.journal import Journal


def test_token_bucket_debt_model():
    clock = [0.0]
    slept = []

    def sleep(s):
        slept.append(s)
        clock[0] += s

    b = TokenBucket(rate=100, clock=lambda: clock[0], sleep=sleep)
    # one second of burst credit: the first 100 bytes are free
    assert b.throttle(100) == 0.0
    # 50 more bytes at zero balance: half a second of debt
    assert abs(b.throttle(50) - 0.5) < 1e-9
    # idle time banks credit (up to the 10x cap)
    clock[0] += 2.0
    assert b.throttle(150) == 0.0  # 2s idle = 200 banked, 150 spent
    # the bank is capped at 10x rate
    clock[0] += 1000.0
    assert b.throttle(1000) == 0.0  # capacity 1000, fully banked
    assert abs(b.throttle(100) - 1.0) < 1e-9  # and no more than that
    assert sum(slept) > 0


def test_bucket_registry_tracks_rate_changes(tmp_path):
    p = str(tmp_path / "j")
    a = bucket_for(p, 100)
    assert bucket_for(p, 100) is a  # shared per journal
    b = bucket_for(p, 200)
    assert b is not a and b.rate == 200.0  # spec change => new bucket


def test_spec_validation_rejects_negative_rate():
    import pytest

    with pytest.raises(SpecValidation, match="max_append_rate"):
        from core_spark.catalog import validate_spec

        validate_spec(JournalSpec(name="a/b", max_append_rate=-1))


def _elapsed_appends(spark, root, name, n=3):
    j = Journal(root, name)
    t0 = time.monotonic()
    frags = [
        j.append(spark.range(i * 10, i * 10 + 10).withColumnRenamed("id", "k"))
        for i in range(n)
    ]
    return time.monotonic() - t0, j, frags


def test_capped_journal_throttles_uncapped_does_not(spark, tmp_path):
    """Wall-clock lower bound on a capped journal's appends, derived
    from the REAL bytes written; the uncapped journal takes no
    sleeps (its elapsed is pure Spark write time)."""
    root = str(tmp_path / "journals")
    rate = 768  # small parquet fragments are ~800B each
    CatalogStore(root).apply(
        upserts=(JournalSpec(name="fc/capped", max_append_rate=rate),)
    )

    _elapsed_appends(spark, root, "fc/warmup", n=1)  # absorb JVM warm-up
    t_uncapped, _, _ = _elapsed_appends(spark, root, "fc/uncapped")
    t_capped, j, _ = _elapsed_appends(spark, root, "fc/capped")

    import os

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _d, files in os.walk(os.path.join(j.root, "fragments"))
        for f in files
    )
    # burst credit is one second of rate; the rest must be slept off
    expect = max(0.0, (total - rate) / rate)
    assert expect > 0.5, f"fragments too small to exercise the cap ({total}B)"
    assert t_capped >= expect * 0.8
    # the uncapped journal never sleeps; allow full write time but it
    # must land under the capped journal's throttle floor
    assert t_uncapped < expect * 0.8 or t_uncapped < t_capped
    # rows all landed despite throttling
    assert Journal(root, "fc/capped").read(spark).count() == 30


def test_gateway_put_inherits_journal_cap(spark, tmp_path):
    """The gateway append path funnels through Journal.append, so a
    capped journal throttles PUTs with no gateway-side code."""
    root = str(tmp_path / "journals")
    CatalogStore(root).apply(
        upserts=(JournalSpec(name="api/capped", max_append_rate=512),)
    )
    g = JournalGateway(spark, root)
    host, port = g.start()
    base = f"http://{host}:{port}"
    body = "\n".join(json.dumps({"k": i}) for i in range(50)).encode()

    def put(name):
        req = urllib.request.Request(
            f"{base}/jnl/{name}", data=body, method="PUT"
        )
        t0 = time.monotonic()
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
        return time.monotonic() - t0

    try:
        put("api/warmup")  # absorb first-write JVM/parquet warm-up
        t_free = put("api/uncapped")
        t1 = put("api/capped")  # burst credit may cover the first
        t2 = put("api/capped")  # the second must pay the debt
        assert t2 >= 0.4
        assert t2 > t_free
        _ = t1
    finally:
        g.stop()
