"""Synthesize a larger-SF copy of the driver's test tables for scale
rehearsal (round-3 verdict item 5: "synthesize an sf1.0 (~6M lineitem)
directory with the existing generator conventions").

NOT a bit-for-bit reproduction of the driver's generator (its RNG recipe is
unknown); a distribution-faithful one: same schemas and column types, same
value ranges, same category sets and proportions, same join fan-ins
(orders/customer, lineitem/orders ≈ 4.08, events/user), same document
vocabulary and length profile, unit-norm clustered embeddings — everything
bench timings and plan shapes depend on. Correctness oracles stay on the
driver's own sf dirs; this data exists to extend the measured scaling curve.

Usage: python tools/gen_sf.py 1.0 /root/repo/.localdata/sf1.0
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["red", "blue", "hot", "cold", "old", "new", "small", "large"]
NOUNS = ["gear", "gizmo", "widget", "ring", "plate", "anvil", "bolt", "rod"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "de", "es", "fr", "zh"]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
EMB_DIM = 64
N_LABELS = 10

EPOCH = dt.datetime(1970, 1, 1)


def _days_ts(days: np.ndarray, base: str) -> pa.Array:
    base_us = int((dt.datetime.fromisoformat(base) - EPOCH).total_seconds() * 1e6)
    return pa.array(base_us + days.astype("int64") * 86_400_000_000, pa.timestamp("us"))


_WRITE_ONLY: set | None = None  # when set, _write skips other tables


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    if _WRITE_ONLY is not None and name not in _WRITE_ONLY:
        print(f"  {name}: skipped (--only)")
        return
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def generate(sf: float, out_dir: str, seed: int = 42, heaps: bool = False) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = max(500, int(50_000 * sf))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(MKTSEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    }))

    adj = np.array(ADJS)[rng.integers(0, len(ADJS), n_part)]
    noun = np.array(NOUNS)[rng.integers(0, len(NOUNS), n_part)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array(np.char.add(np.char.add(adj, " "), noun)),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(0, 25, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))

    # orders: orderdate uniform over 1995-01-01 .. 2001-08-01 (2404 days)
    odays = rng.integers(0, 2404, n_ord)
    o_custkey = rng.integers(0, n_cust, n_ord)
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(o_custkey, pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _days_ts(odays, "1995-01-01"),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: 1..7 lines/order (mean ≈ 4), shipdate = orderdate + 1..95d
    lines_per = rng.integers(1, 8, n_ord)
    l_orderkey = np.repeat(np.arange(n_ord), lines_per)
    n_line = len(l_orderkey)
    l_linenumber = _linenumbers(lines_per)
    qty = rng.integers(1, 51, n_line).astype("float64")
    ship_days = np.repeat(odays, lines_per) + rng.integers(1, 96, n_line)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_line), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_line), pa.int64()),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2100, n_line), 2),
        "l_discount": np.round(rng.integers(0, 11, n_line) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_line) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["N", "A", "R"])[rng.integers(0, 3, n_line)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_line)]),
        "l_shipdate": _days_ts(ship_days, "1995-01-01"),
    }))

    # events: 30 days of Jan 2024, users = n_cust/10 (driver convention:
    # 1500 users at sf0.1)
    n_users = max(1, n_cust // 10)
    base_us = int((dt.datetime(2024, 1, 1) - EPOCH).total_seconds() * 1e6)
    evt_us = base_us + rng.integers(0, 30 * 86_400_000_000, n_evt)
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt), pa.int64()),
        "ts": pa.array(evt_us, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_evt), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)]),
        "value": np.round(np.minimum(rng.exponential(50.0, n_evt), 600.0), 2),
        "props": pa.array([json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_evt)]),
    }))

    # documents: 10..100 words from the 31-word vocab; ~0.2% exact dups;
    # lang en-heavy (41% / 15% others); 20 sources
    #
    # heaps=True swaps the driver-faithful fixed vocabulary for a
    # Heaps-law one (V ≈ 2.2·√total_words synthetic types, Zipf(1.0)
    # rank frequencies) — the regime REAL text lives in, where posting
    # density stays flat as the corpus grows. The fixed-vocab default is
    # the adversarial dense regime (posting df grows linearly with the
    # corpus); both matter for the near-dup scaling story, so both are
    # generatable (SCALE.md "sf10 rehearsal").
    lens = rng.integers(10, 101, n_doc)
    if heaps:
        total_words = int(lens.sum())
        v_n = max(31, int(2.2 * total_words ** 0.5))
        vocab = np.array([f"w{i}" for i in range(v_n)])
        p = 1.0 / np.arange(1, v_n + 1, dtype="float64")
        p /= p.sum()
        texts = [" ".join(vocab[rng.choice(v_n, k, p=p)]) for k in lens]
    else:
        vocab = np.array(VOCAB)
        texts = [" ".join(vocab[rng.integers(0, len(vocab), k)]) for k in lens]
    n_dup = max(1, n_doc // 500)
    for j in rng.integers(n_doc // 2, n_doc, n_dup):
        texts[j] = texts[int(j) // 2]
    lang_p = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=lang_p)]),
        "source": pa.array([f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))

    # embeddings: measured against the driver's data these are PURE random
    # unit vectors (intra-label mean cosine == inter-label == 0.0, both
    # p(cos>=0.4) ~ 4.6e-4 — the d=64 random-sphere value) with uniform
    # random labels, and the table scales SUB-linearly: 500 at sf<=0.01,
    # 2000 at sf0.1 → max(500, 20000·sf). Deliberate: exact all-pairs
    # similarity output is O(N²·4.6e-4), so the driver bounds N.
    n_emb = max(500, int(20_000 * sf))
    labels = rng.integers(0, N_LABELS, n_emb)
    vecs = rng.standard_normal((n_emb, EMB_DIM))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype("float32")
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


def _linenumbers(lines_per: np.ndarray) -> np.ndarray:
    """Vectorized 1..k per order (a concatenate of aranges is slow at 1.5M
    orders): global index minus each row's group start, plus one."""
    idx = np.arange(int(lines_per.sum()))
    starts = np.repeat(np.concatenate([[0], np.cumsum(lines_per)[:-1]]), lines_per)
    return (idx - starts + 1).astype("int32")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    sf = float(args[0]) if args else 1.0
    out = args[1] if len(args) > 1 else f"/root/repo/.localdata/sf{sf}"
    heaps = "--heaps" in flags
    only = {f.split("=", 1)[1] for f in flags if f.startswith("--only=")}
    if only:
        # skipped tables still consume their rng draws (and generation
        # CPU) so the written tables are bit-identical to a full run
        _WRITE_ONLY = set()
        for spec in only:
            _WRITE_ONLY |= set(spec.split(","))
        globals()["_WRITE_ONLY"] = _WRITE_ONLY
    print(f"generating sf={sf} → {out} (heaps={heaps})")
    generate(sf, out, heaps=heaps)
    print("done")
