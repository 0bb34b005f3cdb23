#!/usr/bin/env python3
"""Scale-factor multiplier for the bench crossover measurement (dev tool).

Usage: python3 tools/scale_up.py <src_sf_dir> <dst_dir> <replicas>

Builds an N-times-larger copy of a driver-generated sf directory by
key-shifted replication, preserving every join relationship and the
events table's timestamp[ns] physical type (pyarrow passthrough —
DuckDB 1.0 cannot write ns):

- dimensions (region/nation/supplier/part) copy verbatim — fact replicas
  keep referencing them, exactly how dims behave at real scale;
- customer/orders/lineitem/events shift their keys per replica with
  disjoint offsets (user_id tracks c_custkey so event→customer joins
  keep their match rate);
- documents get a per-replica token appended so replicas are NEAR
  duplicates (exercises minhash/jaccard realistically instead of
  exploding exact-dup groups);
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


def replicate(table: pa.Table, name: str, i: int) -> pa.Table:
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
            col = pa.chunked_array([
                pa.compute.binary_join_element_wise(
                    c.cast(pa.string()), f" r{i}", "")
                for c in col.chunks])
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
    import os
    os.makedirs(dst, exist_ok=True)
    for name in COPY + sorted(SHIFT):
        t = pq.read_table(f"{src}/{name}.parquet")
        if name in COPY:
            out = t
        else:
            out = pa.concat_tables(
                [replicate(t, name, i) for i in range(n)])
        pq.write_table(out, f"{dst}/{name}.parquet",
                       store_schema=True, use_deprecated_int96_timestamps=False,
                       coerce_timestamps=None)
        print(f"{name}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
