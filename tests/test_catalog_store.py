"""CatalogStore: Apply (DDL) with CAS, validation, persisted selector
resolution."""

import pytest

from core_spark.catalog import (
    ApplyConflict,
    CatalogStore,
    JournalSpec,
    Label,
    LabelSelector,
    SpecValidation,
)


def _spec(name, **kw):
    return JournalSpec(name=name, labels=(Label("app", "demo"),), **kw)


def test_apply_upsert_delete_resolve(spark, tmp_path):
    cs = CatalogStore(str(tmp_path))
    v1 = cs.apply(upserts=(_spec("demo/a"), _spec("demo/b")))
    assert v1 == 1 and {s.name for s in cs.specs()} == {"demo/a", "demo/b"}

    # update one, delete one, CAS on the right version
    v2 = cs.apply(
        upserts=(JournalSpec("demo/a", (Label("app", "demo2"),)),),
        deletions=("demo/b",),
        expect_version=v1,
    )
    assert v2 == 2
    specs = cs.specs()
    assert [s.name for s in specs] == ["demo/a"]
    assert specs[0].labels[0].value == "demo2"

    got = {
        r.name
        for r in cs.resolve(
            spark, LabelSelector(include={"app": ("demo2",)})
        ).collect()
    }
    assert got == {"demo/a"}


def test_apply_cas_conflict(tmp_path):
    cs = CatalogStore(str(tmp_path))
    cs.apply(upserts=(_spec("demo/a"),))
    with pytest.raises(ApplyConflict):
        cs.apply(upserts=(_spec("demo/b"),), expect_version=0)
    # a racing writer taking the next version slot
    other = CatalogStore(str(tmp_path))
    other.apply(upserts=(_spec("demo/c"),))
    assert {s.name for s in cs.specs()} == {"demo/a", "demo/c"}


def test_validation(tmp_path):
    cs = CatalogStore(str(tmp_path))
    with pytest.raises(SpecValidation, match="fragment_length"):
        cs.apply(upserts=(_spec("demo/x", fragment_length=100),))
    with pytest.raises(SpecValidation, match="codec"):
        cs.apply(upserts=(_spec("demo/x", codec="LZ4"),))
    with pytest.raises(SpecValidation, match="name"):
        cs.apply(upserts=(_spec(""),))
