"""Skew mitigation: salted join for hot keys.

DESIGN.md §2's playbook made concrete. AQE's skew-join splitting
(enabled by default in `session.py`) handles most skew at runtime by
splitting oversized partitions; `salted_join` is the explicit form for
the pathological case AQE can't fix — a single key so hot that *one*
join task would still see it all (the reference's analog: a journal
too hot for one broker → you partition the topic, routines.go modulo
mapping).

Mechanics: the big (skewed) side gets a uniform salt in [0, n); the
small side is replicated n times with every salt value; the join key
becomes (key, salt), spreading the hot key across n tasks. Replication
multiplies the small side n-fold — use only when the small side fits
n-fold in the shuffle (else fall back to AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big` ⋈ `small` on `key`, salted across `n_salts`
    tasks per key. Result equals `big.join(small, key, how)` for
    inner and left joins only: right/full-outer would replicate each
    unmatched small-side row once per salt (the small side is
    cross-joined with every salt value), so those modes are rejected.

    The salt is drawn from monotonically_increasing_id and is NOT
    stable across task retries — row-to-salt assignment may differ
    between attempts. That changes only which task processes a row,
    never the join result, because every salt of a key joins the same
    replicated small side.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r}: outer "
            "small-side rows would be duplicated once per salt"
        )
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts)),
    )
    salted_small = small.join(
        F.broadcast(
            small.sparkSession.range(n_salts).select(
                F.col("id").cast("int").alias("_salt")
            )
        )
    )
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")
