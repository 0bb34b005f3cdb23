#!/usr/bin/env python3
"""Scale-factor multiplier for the bench crossover measurement (dev tool).

Usage: python3 tools/scale_up.py <src_sf_dir> <dst_dir> <replicas> [clique_mod]

clique_mod (default 0 = off): if > 0, documents whose ORIGINAL doc_id
is ≡ 0 (mod clique_mod) keep their text untagged across replicas —
i.e. they form byte-identical exact-duplicate families of depth
`replicas`. This is the CLIQUE fixture for the exact-collapse dedup
forms (mm_dedup_collapsed): the r13 verdict hypothesized the default
replica protocol produces such cliques, but it does not (the word
tagging makes every replica's text distinct — measured r14: x10 from
sf0.1 has 49 840 singleton contents + 80 pairs, max band bucket 12),
so the clique shape must be planted deliberately to measure the
O(N·dup²) → O(U·near-dup-rate) claim.

Builds an N-times-larger copy of a driver-generated sf directory by
key-shifted replication, preserving every join relationship and the
events table's timestamp[ns] physical type (pyarrow passthrough —
DuckDB 1.0 cannot write ns):

- dimensions (region/nation/supplier/part) copy verbatim — fact replicas
  keep referencing them, exactly how dims behave at real scale;
- customer/orders/lineitem/events shift their keys per replica with
  disjoint offsets (user_id tracks c_custkey so event→customer joins
  keep their match rate);
- documents TAG every 2nd word with a per-replica suffix (w -> w_rI),
  so replicas of one doc are NOT near-duplicates of each other: every
  word 2-gram/3-gram and every 40-char window contains a tagged
  position, so cross-replica shingle overlap is ~0 and cross-replica
  edit distance is ~len/2 >> PassJoin's maxEd, while token COUNT and
  within-replica dup structure are preserved. Duplicate-FAMILY size
  stays constant while the corpus grows — a real 100x corpus has 100x
  more families, not the same families 100x deeper. (The first version
  only appended a suffix; replicas then formed one big near-dup family
  per doc and pair-generating queries did C(replicas,2) work —
  quadratic in the replica count. At x100 that inflated every dedup
  query ~100x over its true linear growth.);
- embeddings get a per-replica constant added so replicas are NOT
  near-identical vectors (keeps cosine-pair outputs scale-proportional
  instead of quadratic).
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

K_CUST = 10_000_000
K_ORDER = 100_000_000
K_EVENT = 100_000_000
K_DOC = 10_000_000

COPY = ["region", "nation", "supplier", "part"]
SHIFT = {
    "customer": {"c_custkey": K_CUST},
    "orders": {"o_orderkey": K_ORDER, "o_custkey": K_CUST},
    "lineitem": {"l_orderkey": K_ORDER},
    "events": {"event_id": K_EVENT, "user_id": K_CUST},
    "documents": {"doc_id": K_DOC},
    "embeddings": {"vec_id": K_DOC},
}


def replicate(table: pa.Table, name: str, i: int, clique_mod: int = 0,
              ids: "list | None" = None) -> pa.Table:
    if i == 0:
        return table
    cols = {}
    for field in table.schema:
        col = table.column(field.name)
        shift = SHIFT.get(name, {}).get(field.name)
        if shift is not None:
            col = pa.chunked_array(
                [pa.compute.add(c, shift * i) for c in col.chunks])
        elif name == "documents" and field.name == "text":
            # tag every 2nd word with the replica id so cross-replica
            # shingle overlap and edit-distance links break while token
            # count and within-replica dup structure are preserved; see
            # module docstring. With clique_mod > 0, docs at original
            # doc_id % clique_mod == 0 SKIP the tag — they stay
            # byte-identical across replicas (the planted exact-dup
            # clique fixture).
            tag = f"_r{i}"
            # ids is hoisted to the caller (one full-column python
            # conversion per table, not per replica); only materialized
            # when the clique knob is on
            if ids is None and clique_mod > 0:
                ids = table.column("doc_id").to_pylist()
            out = []
            k = 0
            for c in col.chunks:
                vals = []
                for s in c.cast(pa.string()).to_pylist():
                    k += 1
                    if s is None:
                        vals.append(None)
                        continue
                    # a null doc_id can never join a planted clique
                    if (ids is not None and ids[k - 1] is not None
                            and ids[k - 1] % clique_mod == 0):
                        vals.append(s)
                        continue
                    w = s.split(" ")
                    for j in range(1, len(w), 2):
                        w[j] = w[j] + tag
                    vals.append(" ".join(w))
                out.append(pa.array(vals, type=pa.string()))
            col = pa.chunked_array(out)
        elif name == "embeddings" and field.name == "embedding":
            # add a per-replica constant: changes direction, so replica
            # vectors are not near-duplicates of the original
            chunks = []
            for c in col.chunks:
                flat = pa.compute.add(c.values, np.float32(0.1 * i))
                chunks.append(pa.ListArray.from_arrays(c.offsets, flat))
            col = pa.chunked_array(chunks)
        cols[field.name] = col
    return pa.table(cols, schema=None)


def main() -> None:
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    clique_mod = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    import os
    os.makedirs(dst, exist_ok=True)
    for name in COPY + sorted(SHIFT):
        t = pq.read_table(f"{src}/{name}.parquet")
        if name in COPY:
            out = t
        else:
            ids = (t.column("doc_id").to_pylist()
                   if clique_mod > 0 and name == "documents" else None)
            out = pa.concat_tables(
                [replicate(t, name, i, clique_mod, ids) for i in range(n)])
        pq.write_table(out, f"{dst}/{name}.parquet",
                       store_schema=True, use_deprecated_int96_timestamps=False,
                       coerce_timestamps=None)
        print(f"{name}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
