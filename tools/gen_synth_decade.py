#!/usr/bin/env python
"""Generate the SYNTHETIC ~10x-of-sf0.1 decade used by
tools/scaling_curve.py --decade2 (VERDICT r07 #7): the sf0.01->sf0.1
curve is overhead-dominated, so the linearity claims get one more
decade from a seeded, deterministic slice under .scratch (gitignored),
shaped to match the driver testdata's measured distributions:

- lineitem  6,000,000 rows — 1.5M orders, lines/order ~ 1+Poisson(3.075)
  (measured sf0.1 mean 4.075), partkey uniform over 200k parts (the
  driver scales parts with SF: 20k at sf0.1). Only the k-core inputs
  (l_orderkey, l_partkey) plus schema-compatible fillers.
- documents 50,000 rows — text from the EXACT 31-word vocabulary the
  driver uses (extracted from sf0.1), uniform 10..100 words/doc
  (measured avg 54.1): shingle-collision density, the containment/
  minhash cost driver, scales like the real corpus.
- embeddings 20,000 rows — 64-dim float32, labels uniform 0..9,
  vec_id 0 is the query vector (perf decade only; recall pins live in
  pytest at the driver SFs).
- events 1,000,000 rows over 300 DAYS (not 30): promos derive as
  3/day, so the interval-join's honest scale axis is calendar growth;
  10x days -> 10x intervals -> ~10x candidate pairs. 15k users,
  5 uniform event types, value U[0,560), props {"k": int}.

Deterministic: numpy PCG64(42); a _SYNTH_STAMP file records the
generator VERSION + row counts, and regeneration is skipped when it
matches. Do NOT use for correctness oracles — perf decade only.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VERSION = 2  # v2: + region/nation/customer/supplier/part/orders dims
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "sfsynth1.0",
)

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

N_ORDERS = 1_500_000
N_PARTS = 200_000
N_DOCS = 50_000
N_VECS = 20_000
N_EVENTS = 1_000_000
N_USERS = 15_000
N_DAYS = 300
EVENT_TYPES = ["signup", "click", "purchase", "error", "view"]


def _stamp_path() -> str:
    return os.path.join(OUT, "_SYNTH_STAMP")


def is_fresh() -> bool:
    try:
        s = json.load(open(_stamp_path()))
    except (OSError, ValueError):
        return False
    return s.get("version") == VERSION


def generate() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(42)

    # --- lineitem ---------------------------------------------------
    lines_per_order = 1 + rng.poisson(3.075, N_ORDERS)
    okey = np.repeat(np.arange(N_ORDERS, dtype=np.int64), lines_per_order)
    n = len(okey)
    linenumber = _linenumbers(lines_per_order)
    tbl = pa.table({
        "l_orderkey": okey,
        "l_partkey": rng.integers(0, N_PARTS, n, dtype=np.int64),
        "l_suppkey": rng.integers(0, N_PARTS // 10, n, dtype=np.int64),
        "l_linenumber": linenumber,
        "l_quantity": rng.integers(1, 51, n).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, n), 2),
        "l_discount": np.round(rng.uniform(0.0, 0.1, n), 2),
        "l_tax": np.round(rng.uniform(0.0, 0.08, n), 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n)]
        ),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n)]),
        "l_shipdate": pa.array(
            (np.datetime64("2024-01-01")
             + rng.integers(0, N_DAYS * 86400, n).astype("timedelta64[s]")
             ).astype("datetime64[us]")
        ),
    })
    pq.write_table(tbl, os.path.join(OUT, "lineitem.parquet"))

    # --- documents --------------------------------------------------
    words_per_doc = rng.integers(10, 101, N_DOCS)
    flat = rng.integers(0, len(VOCAB), int(words_per_doc.sum()))
    vocab_arr = np.array(VOCAB)
    texts = []
    pos = 0
    for w in words_per_doc:
        texts.append(" ".join(vocab_arr[flat[pos:pos + w]]))
        pos += w
    tbl = pa.table({
        "doc_id": np.arange(N_DOCS, dtype=np.int64),
        "text": texts,
        "lang": ["en"] * N_DOCS,
        "source": [f"src{i % 20}" for i in range(N_DOCS)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })
    pq.write_table(tbl, os.path.join(OUT, "documents.parquet"))

    # --- embeddings -------------------------------------------------
    vecs = rng.standard_normal((N_VECS, 64)).astype(np.float32)
    tbl = pa.table({
        "vec_id": np.arange(N_VECS, dtype=np.int64),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": rng.integers(0, 10, N_VECS, dtype=np.int32),
    })
    pq.write_table(tbl, os.path.join(OUT, "embeddings.parquet"))

    # --- events -----------------------------------------------------
    ts = (np.datetime64("2024-01-01")
          + rng.integers(0, N_DAYS * 86400, N_EVENTS).astype("timedelta64[s]")
          ).astype("datetime64[us]")
    ts.sort()
    tbl = pa.table({
        "event_id": np.arange(N_EVENTS, dtype=np.int64),
        "ts": pa.array(ts),
        "user_id": rng.integers(0, N_USERS, N_EVENTS, dtype=np.int64),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, N_EVENTS)]
        ),
        "value": np.round(rng.uniform(0.0, 560.0, N_EVENTS), 2),
        "props": [
            '{"k": %d}' % k for k in rng.integers(0, 100, N_EVENTS)
        ],
    })
    pq.write_table(tbl, os.path.join(OUT, "events.parquet"))

    # --- dims (so any registered query can run at this decade) ------
    pq.write_table(pa.table({
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": [f"REGION{i}" for i in range(5)],
    }), os.path.join(OUT, "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32),
    }), os.path.join(OUT, "nation.parquet"))
    n_cust = 150_000
    pq.write_table(pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust, dtype=np.int32),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": pa.array(np.array(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
        )[rng.integers(0, 5, n_cust)]),
    }), os.path.join(OUT, "customer.parquet"))
    n_supp = 10_000
    pq.write_table(pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp, dtype=np.int32),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }), os.path.join(OUT, "supplier.parquet"))
    brands = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
    types = [f"TYPE {i}" for i in range(25)]
    pq.write_table(pa.table({
        "p_partkey": np.arange(N_PARTS, dtype=np.int64),
        "p_name": [f"part name {i}" for i in range(N_PARTS)],
        "p_brand": pa.array(np.array(brands)[rng.integers(0, len(brands), N_PARTS)]),
        "p_type": pa.array(np.array(types)[rng.integers(0, len(types), N_PARTS)]),
        "p_size": rng.integers(1, 51, N_PARTS).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900.0, 2000.0, N_PARTS), 2),
    }), os.path.join(OUT, "part.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": np.arange(N_ORDERS, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, N_ORDERS, dtype=np.int64),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.integers(0, 3, N_ORDERS)]
        ),
        "o_totalprice": np.round(rng.uniform(850.0, 560000.0, N_ORDERS), 2),
        "o_orderdate": pa.array(
            (np.datetime64("2024-01-01")
             + rng.integers(0, N_DAYS * 86400, N_ORDERS).astype("timedelta64[s]")
             ).astype("datetime64[us]")
        ),
        "o_orderpriority": pa.array(np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        )[rng.integers(0, 5, N_ORDERS)]),
    }), os.path.join(OUT, "orders.parquet"))

    json.dump(
        {"version": VERSION, "lineitem": n, "documents": N_DOCS,
         "embeddings": N_VECS, "events": N_EVENTS, "customer": n_cust,
         "orders": N_ORDERS, "seed": 42},
        open(_stamp_path(), "w"),
    )


def _linenumbers(counts: np.ndarray) -> np.ndarray:
    """Vectorized 1..c per group (avoids a 1.5M-iteration Python loop)."""
    total = int(counts.sum())
    idx = np.arange(total, dtype=np.int64)
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    return (idx - starts + 1).astype(np.int32)


def ensure() -> str:
    """Generate if missing/stale; return the directory path."""
    if not is_fresh():
        print(f"generating synthetic decade under {OUT} ...", file=sys.stderr)
        generate()
    return OUT


# --------------------------------------------------------------------------
# Third decade for the GRAPH family (VERDICT r10 #4): 10x the synthetic
# decade's fact AND 10x the brand vocabulary, so the shared projection
# itself widens (|brand| 25 -> 250, projected edge space 300 -> 31,125
# undirected pairs). Only the projection's two inputs are generated
# (lineitem keys + part brand map) — this variant exists solely to
# measure _order_brand_pairs and its consumers; nothing else reads it.
# --------------------------------------------------------------------------

VERSION3 = 1
OUT3 = os.path.join(os.path.dirname(OUT), "sfsynth10.b250")
N_ORDERS3 = 15_000_000   # 10x the decade-2 orders; lines/order unchanged
N_PARTS3 = 2_000_000     # parts keep scaling with SF (driver convention)
N_BRANDS3 = 250          # 10x the TPC-H-fixed 25 brands


def ensure_decade3() -> str:
    stamp3 = os.path.join(OUT3, "_SYNTH_STAMP")
    try:
        if json.load(open(stamp3)).get("version") == VERSION3:
            return OUT3
    except (OSError, ValueError):
        pass
    print(f"generating graph decade-3 under {OUT3} ...", file=sys.stderr)
    os.makedirs(OUT3, exist_ok=True)
    rng = np.random.default_rng(43)
    lines_per_order = 1 + rng.poisson(3.075, N_ORDERS3)
    okey = np.repeat(np.arange(N_ORDERS3, dtype=np.int64), lines_per_order)
    n = len(okey)
    pq.write_table(
        pa.table({
            "l_orderkey": okey,
            "l_partkey": rng.integers(0, N_PARTS3, n, dtype=np.int64),
            "l_quantity": rng.integers(1, 51, n).astype(np.float64),
        }),
        os.path.join(OUT3, "lineitem.parquet"),
    )
    brands = pa.array(
        np.array([f"Brand#{i}" for i in range(1, N_BRANDS3 + 1)])[
            rng.integers(0, N_BRANDS3, N_PARTS3)
        ]
    )
    pq.write_table(
        pa.table({
            "p_partkey": np.arange(N_PARTS3, dtype=np.int64),
            "p_brand": brands,
        }),
        os.path.join(OUT3, "part.parquet"),
    )
    with open(stamp3, "w") as fh:
        json.dump({"version": VERSION3, "lineitem_rows": int(n)}, fh)
    return OUT3


if __name__ == "__main__":
    ensure()
    print(OUT)
