"""Deterministic synthetic-testdata generator for CI checkouts.

The engine's tests, oracle sweep, and bench read driver-generated parquet
from ``$SEQUILA_TESTDATA`` (default ``/root/testdata``) — directories
``sf0.001 / sf0.01 / sf0.1`` holding the TPC-H-ish star schema plus
``events / documents / embeddings``. That data exists pre-baked in the
build sandbox but not in a fresh checkout; this script regenerates tables
with the SAME SCHEMAS, key relationships, and value shapes (not
bit-identical values — correctness checks compare Spark vs DuckDB on
whatever files are present, so any schema-faithful instance works).

Usage::

    python tools/gen_testdata.py OUT_DIR [sf ...]   # default: 0.001 0.01

Writes ``OUT_DIR/sf{sf}/{table}.parquet``. Pure numpy+pyarrow (no Spark),
seeded — same command, same bytes.

Row-count laws (measured from the reference driver data):
lineitem 6M·sf, orders 1.5M·sf, customer 150k·sf, part 200k·sf,
supplier 10k·sf, events 1M·sf, users 15k·sf, documents max(500, 50k·sf),
embeddings max(500, 20k·sf), nation 25, region 5.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
LANGS = ["en", "de", "fr", "es", "zh"]
PART_ADJ = ["small", "large", "cold", "hot", "dim", "bright"]
PART_NOUN = ["widget", "bolt", "gear", "spring", "plate", "cap"]
PART_TYPES = ["ECONOMY", "STANDARD", "PROMO", "PREMIUM"]
# the doc vocabulary: small on purpose so shingle/minhash collisions and
# near-duplicates arise naturally, as in the driver corpus
DOC_VOCAB = (
    "the a spark table scan join sort merge hash window filter group agg "
    "row column key value data stream batch query order part line customer "
    "small big fast slow vector dup index bucket shuffle plan stage task "
).split()

DAY_US = 86_400_000_000


def _ts_us(rng, n, start_day, span_days):
    base = np.datetime64(start_day, "us").astype(np.int64)
    return base + (rng.random(n) * span_days * DAY_US).astype(np.int64)


def _ts_col(vals):
    return pa.array(vals, type=pa.timestamp("us"))


def gen_sf(out_dir: str, sf: float, seed: int = 42) -> None:
    rng = np.random.default_rng(int(seed + round(sf * 1_000_000)))
    os.makedirs(out_dir, exist_ok=True)
    n_li = int(6_000_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = max(1, int(10_000 * sf))
    n_ev = int(1_000_000 * sf)
    n_users = max(1, int(15_000 * sf))
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    def write(name, table):
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    write("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)],
    }))
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))
    write("part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{PART_ADJ[i % 6]} {PART_NOUN[(i // 6) % 6]}"
                   for i in range(n_part)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [PART_TYPES[i] for i in rng.integers(0, 4, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2),
    }))

    o_status = np.array(["F", "O", "P"])[
        rng.choice(3, n_ord, p=[0.48, 0.48, 0.04])]
    write("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": o_status,
        "o_totalprice": np.round(rng.uniform(1300, 500_000, n_ord), 2),
        "o_orderdate": _ts_col(_ts_us(rng, n_ord, "1995-01-01", 2400)),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)],
    }))

    qty = rng.integers(1, 51, n_li).astype(np.float64)
    price = np.round(rng.uniform(900, 2100, n_li) * qty, 2)
    write("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": price,
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": _ts_col(_ts_us(rng, n_li, "1995-01-01", 2500)),
    }))

    write("events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": _ts_col(np.sort(_ts_us(rng, n_ev, "2024-01-01", 30))),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[
            rng.choice(5, n_ev, p=[0.45, 0.3, 0.05, 0.1, 0.1])],
        "value": np.round(np.exp(rng.normal(1.5, 1.2, n_ev)), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: bag-of-words over a small vocab, plus DELIBERATE near-dup
    # structure matching the driver corpus (measured at sf0.001: ~28 pairs
    # with 5-shingle Jaccard >= 0.5, max 0.989, and the two MinHash
    # families agree on ~all of them — so the dups sit HIGH in the Jaccard
    # band): ~6% of docs are near-copies of an earlier doc with at most
    # ~5% of words replaced, plus ~0.15% exact duplicates above the floor
    # scale. Heavier mutation (tried: up to 20%) creates marginal
    # 0.5-0.8-Jaccard pairs where LSH families legitimately disagree,
    # which breaks the family-agreement recall pins.
    lens = rng.integers(10, 101, n_doc)
    vocab = np.array(DOC_VOCAB)
    words = [list(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens]
    for i in rng.choice(np.arange(n_doc // 10, n_doc),
                        size=max(4, int(0.06 * n_doc)), replace=False):
        src = list(words[rng.integers(0, n_doc // 10)])
        n_mut = int(rng.integers(0, max(2, len(src) // 20)))
        for _ in range(n_mut):
            src[rng.integers(0, len(src))] = vocab[rng.integers(0, len(vocab))]
        words[i] = src
    texts = [" ".join(w) for w in words]
    n_dup = int(0.0015 * n_doc) if n_doc > 500 else 0
    for i in range(n_dup):
        texts[n_doc - 1 - i] = texts[rng.integers(0, n_doc // 2)]
    write("documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.choice(
            5, n_doc, p=[0.5, 0.15, 0.15, 0.1, 0.1])],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 64-dim float32, ISOTROPIC gaussian — measured on the
    # driver data: no label clustering (intra-label cos ≈ inter ≈ 0) and
    # no near-dup pairs (max pairwise cos ≈ 0.5); label is an independent
    # attribute. ANN recall pins were measured against this geometry.
    vecs = rng.normal(0, 1, (n_emb, 64)).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))

    # Provenance marker: lets the schema-contract test tell a
    # generator-produced instance apart from the pre-baked driver data,
    # so it doesn't "verify" the generator against itself (advisor, r11).
    with open(os.path.join(out_dir, ".sequila_generated"), "w") as fh:
        fh.write(f"gen_testdata.py sf={sf} seed={seed}\n")


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    root = argv[0]
    sfs = [float(s) for s in (argv[1:] or ["0.001", "0.01"])]
    for sf in sfs:
        out = os.path.join(root, f"sf{sf:g}")
        gen_sf(out, sf)
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
