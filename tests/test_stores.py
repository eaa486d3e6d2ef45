"""Manifest-store CAS contract: contended appends and fence
acquisition serialize on conditional create, for both the filesystem
(O_EXCL) and object-store (conditional-PUT model) drivers —
broker/stores/* persist contract + consumer/store_sql.go fence CAS."""

import threading

import pytest

from core_spark.sources.journal import AppendConflict, Journal, Manifest
from core_spark.sources.stores import FSManifestStore, MemoryCASStore


@pytest.fixture(params=["fs", "mem"])
def make_store(request, tmp_path):
    if request.param == "fs":
        return lambda: FSManifestStore(str(tmp_path / "m"))
    shared = MemoryCASStore()
    return lambda: shared


def test_put_if_absent_admits_exactly_one(make_store):
    store = make_store()
    assert store.put_if_absent(1, '{"a": 1}')
    assert not store.put_if_absent(1, '{"a": 2}')
    assert store.read(1) == '{"a": 1}'
    assert store.list_versions() == [1]


def test_contended_append_one_winner(spark, tmp_path, make_store):
    """Two appenders over the SAME store race a manifest version: the
    CAS admits exactly one; the loser raises AppendConflict, rolls its
    fragment back, and a retry lands with serialized offsets."""
    store = make_store()
    a = Journal(str(tmp_path / "j"), "race/j1", store=store)
    b = Journal(str(tmp_path / "j"), "race/j1", store=store)
    df = spark.range(0, 10).withColumnRenamed("id", "v")

    a.append(df)  # version 1, offsets [0, 10)

    # both read the same manifest (version 1) before either commits:
    # simulate by committing an intervening manifest between b's read
    # and commit via a's append
    m_b = b.manifest()
    a.append(df)  # version 2 lands first
    with pytest.raises(AppendConflict):
        b._commit_manifest(
            Manifest(
                version=m_b.version + 1,
                next_offset=m_b.next_offset + 10,
                fragments=m_b.fragments,
                registers=m_b.registers,
            )
        )
    # loser retries from the fresh manifest and wins
    frag = b.append(df)
    assert frag.begin == 20 and frag.end == 30
    assert a.read(spark).count() == 30


def test_fence_acquisition_unique_under_threads(tmp_path, make_store):
    """N concurrent incarnations each get a distinct, increasing
    fence — uniqueness is store-assigned via the manifest CAS, never
    assumed (the split-brain the fence exists to prevent)."""
    store = make_store()
    j = Journal(str(tmp_path / "j"), "race/fence", store=store)
    fences: list[int] = []
    lock = threading.Lock()

    def acquire():
        f = Journal(str(tmp_path / "j"), "race/fence", store=store).acquire_fence(
            "s0"
        )
        with lock:
            fences.append(f)

    threads = [threading.Thread(target=acquire) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert sorted(fences) == list(range(1, 9))  # unique, dense, increasing
    assert int(j.manifest().registers["fence:s0"]) == 8
