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


def salted_join_hot_keys(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    hot_frac: float = 0.05,
    how: str = "inner",
) -> DataFrame:
    """The production two-pass variant of :func:`salted_join`: detect
    the heavy-hitter keys first, then salt ONLY those — cold keys join
    un-replicated, so the dim-side blowup is |dim| + |hot|·(n_salts-1)
    rows instead of |dim|·n_salts.

    Pass 1 (detection): an exact map-side-combinable frequency count
    per join key; keys holding more than ``hot_frac`` of the fact are
    hot. The hot set is mathematically bounded by 1/hot_frac rows
    (at most that many keys can each exceed that fraction), so it
    broadcasts at ANY data scale — the detection output is small by
    construction, not by assumption. At 100 TB with an unbounded key
    domain where even the |keys|-row count frame is too wide, swap the
    exact count for a count-min sketch pass (agg_countmin_portable has
    the portable sketch); the salting stage is unchanged.

    Pass 2 (salting): fact rows carrying a hot key round-robin over
    ``n_salts`` salts; cold rows take salt 0. Dim rows replicate across
    all salts only for hot keys. Join on keys + salt as in
    :func:`salted_join`; result identity for inner/left with the fact
    on the left (property-tested in tests/test_skew.py)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join_hot_keys supports inner/left joins, got {how!r}"
        )
    if not 0 < hot_frac < 1:
        raise ValueError(f"hot_frac must be in (0,1), got {hot_frac}")
    keys = [on] if isinstance(on, str) else list(on)
    reserved = {_SALT, "_kcnt", "_ktot", "_hot"}
    for side, name in ((fact, "fact"), (dim, "dim")):
        clash = reserved & set(side.columns)
        if clash:
            raise ValueError(
                f"salted_join_hot_keys: {name} columns collide with "
                f"internal names {sorted(clash)} — rename them first"
            )
    freq = fact.groupBy(*keys).agg(F.count(F.lit(1)).alias("_kcnt"))
    total = fact.agg(F.count(F.lit(1)).cast("double").alias("_ktot"))
    hot = (
        freq.crossJoin(F.broadcast(total))
        .filter(F.col("_kcnt").cast("double") > F.col("_ktot") * F.lit(hot_frac))
        .select(*keys, F.lit(1).alias("_hot"))
    )
    f = fact.join(F.broadcast(hot), keys, "left").withColumn(
        _SALT,
        F.when(
            F.col("_hot") == 1,
            F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    ).drop("_hot")
    d = dim.join(F.broadcast(hot), keys, "left").withColumn(
        _SALT,
        F.explode(
            F.sequence(
                F.lit(0),
                F.when(F.col("_hot") == 1, F.lit(n_salts - 1)).otherwise(
                    F.lit(0)
                ),
            ).cast("array<int>")
        ),
    ).drop("_hot")
    return f.join(d, keys + [_SALT], how).drop(_SALT)
