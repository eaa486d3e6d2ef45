"""Every registered query with an oracle must hash-match DuckDB — the
local twin of the driver's t2 gate, run at sf0.001 for speed."""

import pytest

from core_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE
from tests.oracle_check import compare

NAMES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.mark.parametrize("name", NAMES)
def test_oracle(spark, name):
    compare(spark, name, SF_SMOKE)


def test_chunk_cdc_unicode_matches_oracle(spark, tmp_path):
    """The CDC kernel's non-ASCII branch (code-point ord() hashing +
    code-point slicing, matching SQL substr/ascii semantics) against
    DuckDB on a unicode documents table — the synthetic corpus is
    ASCII-only, so the parametrized sweep never exercises this path."""
    import shutil

    import duckdb

    src = "/root/testdata/sf0.001"
    sf = tmp_path / "uni"
    sf.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        shutil.copy(f"{src}/{t}.parquet", sf / f"{t}.parquet")
    texts = [
        "naïve café résumé — déjà vu über alles, straße größer",
        "日本語のテキストです。重複検出のためのチャンク分割。",
        "mixed ascii and ünïcode tökens repeated tökens repeated",
        "mixed ascii and ünïcode tökens repeated tökens repeated",
        "ασδφ γηξκλ ζχψω βνμ ασδφ γηξκλ encore une fois",
        "short",
        "",
    ]
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "xx",
            "source": "srcU",
            "n_chars": [len(t) for t in texts],
        }
    )
    con = duckdb.connect()
    con.register("unidocs", docs)
    out = str(sf / "documents.parquet")
    con.execute(
        "COPY (SELECT doc_id, text, lang, source,"
        " CAST(n_chars AS BIGINT) AS n_chars FROM unidocs)"
        f" TO '{out}' (FORMAT parquet)"
    )
    con.close()
    compare(spark, "q_chunk_cdc", str(sf))
