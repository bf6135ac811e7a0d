"""Skew-mitigation join: explicit key salting.

AQE's skew-join split (enabled in session.py) handles moderate skew by
splitting oversized shuffle partitions, but it only acts on post-
shuffle partition sizes. When ONE key dominates (a null-ish default
key, a boilerplate bucket id, a celebrity user), the classic explicit
fix is salting: append a salt ∈ [0, n) to the fact side so the hot
key's rows spread across n reducers, and replicate the dim side n
times so every (key, salt) pair still finds its match. Cost: dim side
×n (fine when dim ≪ fact); correctness unchanged for inner/left joins
with the fact on the left.

At 100 TB you'd salt only the detected hot keys (two-pass: frequency
sketch → salt the heavy hitters, plain join for the rest); this
operator salts uniformly, which is the right shape when the dim side
is small enough that ×n replication is cheap."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_expr: Column | None = None,
) -> DataFrame:
    """Join ``fact`` (big, possibly skewed) with ``dim`` (small) on
    ``on``, spreading each fact key over ``n_salts`` reducers. The salt
    only affects row distribution, never the result; the default uses
    a per-row id so consecutive rows of a hot key round-robin across
    salts."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    for side, name in ((fact, "fact"), (dim, "dim")):
        if _SALT in side.columns:
            raise ValueError(
                f"salted_join: {name} already has a column named {_SALT!r}; "
                "it would be clobbered and dropped — rename it first"
            )
    keys = [on] if isinstance(on, str) else list(on)
    salt = (
        salt_expr
        if salt_expr is not None
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    f = fact.withColumn(_SALT, salt.cast("int"))
    d = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return f.join(d, keys + [_SALT], how).drop(_SALT)
