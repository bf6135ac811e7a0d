"""Property tests from SURVEY.md §5: merge idempotence (applying a
merge twice ≡ once), last-wins dedup stability, chunker coverage
invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_agent_graphdb_spark import catalog
from sales_agent_graphdb_spark.operators.chunker import chunk_documents
from sales_agent_graphdb_spark.operators.merge import merge_create_only, merge_overwrite
from tests.conftest import SF_SMALL


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_create_only_idempotent(spark):
    part = catalog.load_table(spark, SF_SMALL, "part").select(
        F.col("p_partkey").alias("id"), F.col("p_retailprice").alias("price")
    )
    new = part.filter(F.col("id") < 50).select("id", F.lit(1.0).alias("price"))
    once = merge_create_only(part, new, "id")
    twice = merge_create_only(once, new, "id")
    assert _rows(once) == _rows(twice)


def test_merge_overwrite_idempotent(spark):
    part = catalog.load_table(spark, SF_SMALL, "part").select(
        F.col("p_partkey").alias("id"), F.col("p_retailprice").alias("price")
    )
    new = part.filter(F.col("id") < 50).select("id", F.lit(-1.0).alias("price"))
    once = merge_overwrite(part, new, "id")
    twice = merge_overwrite(once, new, "id")
    assert _rows(once) == _rows(twice)
    # and new values actually won
    assert all(
        r.price == -1.0 for r in once.filter(F.col("id") < 50).collect()
    )


def test_scd2_apply_branches_and_chaining(spark):
    """scd2_apply — one batch exercises change / no-op / insert; a
    second batch chains: versions close at the new effective date,
    exactly one open row per live key, closed history never touched."""
    from sales_agent_graphdb_spark.operators.scd import scd2_apply

    hist = spark.createDataFrame(
        [
            (1, "a", 1.0, "2023-01-01", "2024-01-01"),  # closed history
            (1, "a2", 1.5, "2024-01-01", None),
            (2, "b", 2.0, "2024-01-01", None),
        ],
        "k long, seg string, bal double, valid_from string, valid_to string",
    )
    upd = spark.createDataFrame(
        [(1, "a3", 9.0), (2, "b", 2.0), (3, "c", 3.0)],
        "k long, seg string, bal double",
    )
    out1 = scd2_apply(hist, upd, "k", ["seg", "bal"], "2025-06-01")
    rows = {(r.k, r.seg, r.bal, r.valid_from, r.valid_to) for r in out1.collect()}
    assert rows == {
        (1, "a", 1.0, "2023-01-01", "2024-01-01"),   # untouched closed row
        (1, "a2", 1.5, "2024-01-01", "2025-06-01"),  # closed by the change
        (1, "a3", 9.0, "2025-06-01", None),          # new version
        (2, "b", 2.0, "2024-01-01", None),           # no-op: same interval
        (3, "c", 3.0, "2025-06-01", None),           # insert
    }
    # second batch: change k=3, no-op k=1
    upd2 = spark.createDataFrame(
        [(3, "c2", 4.0), (1, "a3", 9.0)], "k long, seg string, bal double"
    )
    out2 = scd2_apply(out1, upd2, "k", ["seg", "bal"], "2026-01-01")
    rows2 = {(r.k, r.seg, r.bal, r.valid_from, r.valid_to) for r in out2.collect()}
    assert (3, "c", 3.0, "2025-06-01", "2026-01-01") in rows2
    assert (3, "c2", 4.0, "2026-01-01", None) in rows2
    assert (1, "a3", 9.0, "2025-06-01", None) in rows2  # no-op kept open
    # exactly one open row per key, always
    from collections import Counter

    opens = Counter(k for (k, _, _, _, vt) in rows2 if vt is None)
    assert opens == {1: 1, 2: 1, 3: 1}


def test_scd2_null_safe_change_detection(spark):
    """scd2_apply — NULL attribute transitions count as changes in both
    directions (null→value and value→null), and null==null is a no-op;
    empty attr_cols fails loudly."""
    import pytest as _pytest

    from sales_agent_graphdb_spark.operators.scd import scd2_apply

    hist = spark.createDataFrame(
        [(1, None, "2024-01-01", None), (2, "x", "2024-01-01", None),
         (3, None, "2024-01-01", None)],
        "k long, seg string, valid_from string, valid_to string",
    )
    upd = spark.createDataFrame(
        [(1, "now-set"), (2, None), (3, None)], "k long, seg string"
    )
    out = scd2_apply(hist, upd, "k", ["seg"], "2025-01-01")
    rows = {(r.k, r.seg, r.valid_from, r.valid_to) for r in out.collect()}
    assert (1, None, "2024-01-01", "2025-01-01") in rows
    assert (1, "now-set", "2025-01-01", None) in rows
    assert (2, "x", "2024-01-01", "2025-01-01") in rows
    assert (2, None, "2025-01-01", None) in rows
    assert (3, None, "2024-01-01", None) in rows  # null==null: no-op
    assert len([r for r in rows if r[0] == 3]) == 1
    with _pytest.raises(ValueError, match="attr_cols"):
        scd2_apply(hist, upd, "k", [], "2025-01-01")


def test_table_diff_classification_and_null_safety(spark):
    """table_diff — added/removed/changed classification with null-safe
    column compares (null→value and value→null are changes, null==null
    is unchanged); unchanged keys absent; empty compare_cols rejected."""
    import pytest as _pytest

    from sales_agent_graphdb_spark.operators.merge import table_diff

    a = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, None, 3.0), (4, None, 4.0)],
        "k long, s string, v double",
    )
    b = spark.createDataFrame(
        [(1, "x", 1.0), (3, "now", 3.0), (4, None, 4.0), (5, "new", 5.0)],
        "k long, s string, v double",
    )
    rows = {r.k: r for r in table_diff(a, b, "k", ["s", "v"]).collect()}
    assert set(rows) == {2, 3, 5}  # 1 and 4 unchanged (4: null==null)
    assert rows[2].change == "removed" and rows[2].s_new is None
    assert rows[3].change == "changed" and (rows[3].s_old, rows[3].s_new) == (None, "now")
    assert rows[5].change == "added" and rows[5].v_new == 5.0
    with _pytest.raises(ValueError, match="compare_cols"):
        table_diff(a, b, "k", [])


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=6),          # key
                st.sampled_from(["a", "b", "c", None]),          # seg
            ),
            min_size=1,
            max_size=6,
            unique_by=lambda t: t[0],                            # one row per key
        ),
        min_size=1,
        max_size=4,
    )
)
def test_scd2_apply_matches_reference_model(spark, batches):
    """scd2_apply — for ANY sequence of update batches (unique keys per
    batch, the documented contract), the chained history equals a
    driver-side reference model: per key, versions carry consecutive
    effective dates, exactly the changed transitions appear, and the
    single open row holds the latest value."""
    from sales_agent_graphdb_spark.operators.scd import scd2_apply

    hist = spark.createDataFrame(
        [(1, "init", "d0", None)],
        "k long, seg string, valid_from string, valid_to string",
    )
    model = {1: [("init", "d0", None)]}  # key -> [(seg, from, to)]
    for i, batch in enumerate(batches, start=1):
        eff = f"d{i}"
        upd = spark.createDataFrame(batch, "k long, seg string")
        # Materialize between batches (the documented chaining
        # contract, scd2_apply docstring): each apply references its
        # history input ~6 times, so an unbroken k-batch lineage is a
        # ~6^k-path tree for Catalyst — this exact test hung the suite
        # for 27 CPU-minutes inside TreeNode traversal before the
        # checkpoint was added. Production never hits this: each
        # nightly run WRITES the history table, truncating lineage.
        hist = scd2_apply(hist, upd, "k", ["seg"], eff).localCheckpoint(eager=True)
        for k, seg in batch:
            versions = model.setdefault(k, [])
            if not versions:
                versions.append((seg, eff, None))
                continue
            cur_seg, cur_from, _ = versions[-1]
            if cur_seg != seg:  # null-safe: None == None is a no-op
                versions[-1] = (cur_seg, cur_from, eff)
                versions.append((seg, eff, None))
    got = {
        (r.k, r.seg, r.valid_from, r.valid_to) for r in hist.collect()
    }
    want = {
        (k, seg, vf, vt)
        for k, versions in model.items()
        for (seg, vf, vt) in versions
    }
    assert got == want


def test_table_diff_null_key_rows(spark):
    """table_diff — a NULL business key matched by the null-safe join is
    classified like any other key (unchanged dropped, changed labeled
    'changed'), never misread as 'added'."""
    from sales_agent_graphdb_spark.operators.merge import table_diff

    a = spark.createDataFrame([(None, "x"), (1, "y")], "k long, s string")
    b_same = spark.createDataFrame([(None, "x"), (1, "y")], "k long, s string")
    assert table_diff(a, b_same, "k", ["s"]).count() == 0
    b_chg = spark.createDataFrame([(None, "z"), (1, "y")], "k long, s string")
    rows = table_diff(a, b_chg, "k", ["s"]).collect()
    assert len(rows) == 1
    assert rows[0].k is None and rows[0].change == "changed"
    assert (rows[0].s_old, rows[0].s_new) == ("x", "z")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(
        st.tuples(st.integers(1, 8), st.floats(0, 100, allow_nan=False)),
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    log=st.lists(
        st.tuples(
            st.integers(1, 8),                      # key
            st.integers(1, 5),                      # seq
            st.sampled_from(["I", "U", "D"]),       # op
            st.floats(0, 100, allow_nan=False),     # price
        ),
        max_size=10,
        unique_by=lambda t: (t[0], t[1]),           # one op per (key, seq)
    ),
)
def test_cdc_apply_matches_reference_model(spark, base, log):
    """CDC apply (the m8 shape, exercised as a pure operator here) —
    for ANY base table and op log, the set-oriented apply equals a
    dict-replay reference model: latest op per key wins; D drops, I/U
    upserts; keys without ops pass through untouched."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    base_df = spark.createDataFrame(
        base or [(999, 0.0)], "k long, price double"
    )
    if not base:
        base_df = base_df.filter(F.col("k") < 0)
    log_df = spark.createDataFrame(
        log or [(999, 1, "I", 0.0)], "k long, seq int, op string, price double"
    )
    if not log:
        log_df = log_df.filter(F.col("k") < 0)

    rn = F.row_number().over(W.partitionBy("k").orderBy(F.col("seq").desc()))
    latest = (
        log_df.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("k", "op", F.col("price").alias("l_price"))
    )
    survivors = (
        base_df.join(latest, "k", "left")
        .filter(F.col("op").isNull() | (F.col("op") != "D"))
        .select("k", F.coalesce(F.col("l_price"), F.col("price")).alias("price"))
    )
    inserts = (
        latest.filter(F.col("op").isin("I", "U"))
        .join(base_df.select("k"), "k", "left_anti")
        .select("k", F.col("l_price").alias("price"))
    )
    got = {(r.k, r.price) for r in survivors.unionByName(inserts).collect()}

    # reference model: dict replay
    table = {k: p for k, p in base}
    last_op: dict[int, tuple[int, str, float]] = {}
    for k, seq, op, price in log:
        if k not in last_op or seq > last_op[k][0]:
            last_op[k] = (seq, op, price)
    for k, (_, op, price) in last_op.items():
        if op == "D":
            table.pop(k, None)
        else:
            table[k] = price
    want = set(table.items())
    assert got == want
