"""Synthesize a deterministic sf1 (10x sf0.1) for the scale spot-check.

Only the three tables the slowest queries touch (documents, embeddings,
events) — written to .localdata/sf1/ (gitignored; /root/testdata is
read-only). Construction preserves LINEAR output scaling so wall-time
ratios measure the engine, not a blown-up result set:

- events: 10 replicas with user_id/event_id offsets — per-user behavior
  (sessions, SCD2 history, HLL days) is identical per replica, so state
  and outputs scale exactly 10x.
- documents: 10 replicas with doc_id offsets; replicas > 0 get their words
  deterministically shuffled (seed = doc_id) so a replica is NOT a
  shingle/minhash near-dup of its original — near-dup pair counts stay
  ~10x instead of exploding combinatorially.
- embeddings: the 2000 originals plus 18000 fresh vectors drawn from a
  seeded normal fitted to the originals' per-component moments — random
  pairs stay below the 0.42 near-dup threshold, so ANN candidate/output
  sizes scale ~linearly.
- TPC-H tables (customer/supplier/part/orders/lineitem): 10 replicas
  with EVERY key offset consistently (custkey on customer AND orders,
  orderkey on orders AND lineitem, part/supp keys on part/supplier AND
  lineitem) — each replica is an independent copy of the world, so every
  join resolves within its replica and join/aggregate outputs scale
  exactly 10x (or keep constant rows with 10x counts for
  nation/date-keyed groupings). nation/region are dimension constants
  and are copied verbatim — replicating them would break name-filter
  semantics (q5/q7) rather than scale them.
"""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".localdata", "sf1")
REPLICAS = 10


def scale_events(SRC: str = SRC, DST: str = DST, REPLICAS: int = REPLICAS) -> None:
    t = pq.read_table(f"{SRC}/events.parquet")
    n = t.num_rows
    uid = t.column("user_id").to_numpy()
    eid = t.column("event_id").to_numpy()
    uoff = int(uid.max()) + 1
    eoff = int(eid.max()) + 1
    parts = []
    for i in range(REPLICAS):
        parts.append(
            t.set_column(0, "event_id", pa.array(eid + i * eoff, pa.int64()))
            .set_column(2, "user_id", pa.array(uid + i * uoff, pa.int64()))
        )
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/events.parquet")
    print("events:", n, "->", out.num_rows)


def scale_documents(SRC: str = SRC, DST: str = DST, REPLICAS: int = REPLICAS) -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    n = t.num_rows
    did = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    doff = int(did.max()) + 1
    parts = [t]
    for i in range(1, REPLICAS):
        shuffled = []
        for d, txt in zip(did, texts):
            words = txt.split(" ")
            random.Random(int(d) * REPLICAS + i).shuffle(words)
            shuffled.append(" ".join(words))
        parts.append(
            t.set_column(0, "doc_id", pa.array(did + i * doff, pa.int64()))
            .set_column(1, "text", pa.array(shuffled, pa.string()))
        )
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/documents.parquet")
    print("documents:", n, "->", out.num_rows)


def scale_embeddings(SRC: str = SRC, DST: str = DST, REPLICAS: int = REPLICAS) -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    n = t.num_rows
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    labels = t.column("label").to_numpy()
    rng = np.random.RandomState(20260814)
    extra = rng.normal(
        vecs.mean(axis=0), vecs.std(axis=0), size=((REPLICAS - 1) * n, vecs.shape[1])
    ).astype(np.float32)
    all_vecs = np.vstack([vecs, extra])
    all_ids = np.arange(all_vecs.shape[0], dtype=np.int64)
    all_labels = np.concatenate(
        [labels, rng.randint(labels.min(), labels.max() + 1, extra.shape[0])]
    ).astype(np.int32)
    out = pa.table(
        {
            "vec_id": pa.array(all_ids, pa.int64()),
            "embedding": pa.array(all_vecs.tolist(), pa.list_(pa.float32())),
            "label": pa.array(all_labels, pa.int32()),
        }
    )
    pq.write_table(out, f"{DST}/embeddings.parquet")
    print("embeddings:", n, "->", out.num_rows)


def _offset_columns(t: pa.Table, offsets: dict[str, int], i: int) -> pa.Table:
    for col, off in offsets.items():
        idx = t.schema.get_field_index(col)
        vals = t.column(col).to_numpy()
        t = t.set_column(idx, col, pa.array(vals + i * off, t.schema.field(col).type))
    return t


def scale_tpch(SRC: str = SRC, DST: str = DST, REPLICAS: int = REPLICAS) -> None:
    tables = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    }
    # One offset per KEY FAMILY (custkey, orderkey, ...), shared by every
    # table referencing it, so foreign keys stay consistent per replica.
    fam_max: dict[str, int] = {}
    loaded = {}
    for name, keys in tables.items():
        t = pq.read_table(f"{SRC}/{name}.parquet")
        loaded[name] = t
        for k in keys:
            fam = k.split("_", 1)[1]  # c_custkey / o_custkey -> custkey
            fam_max[fam] = max(
                fam_max.get(fam, 0), int(t.column(k).to_numpy().max())
            )
    fam_off = {f: m + 1 for f, m in fam_max.items()}
    for name, keys in tables.items():
        t = loaded[name]
        offsets = {k: fam_off[k.split("_", 1)[1]] for k in keys}
        parts = [_offset_columns(t, offsets, i) for i in range(REPLICAS)]
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{DST}/{name}.parquet")
        print(f"{name}:", t.num_rows, "->", out.num_rows)
    for name in ("nation", "region"):
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"), f"{DST}/{name}.parquet")
        print(f"{name}: copied verbatim (dimension constants)")


if __name__ == "__main__":
    os.makedirs(DST, exist_ok=True)
    scale_events()
    scale_documents()
    scale_embeddings()
    scale_tpch()
