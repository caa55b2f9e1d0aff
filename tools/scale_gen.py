#!/usr/bin/env python3
"""Scale-up generator for the driver's synthetic testdata.

Builds sfX = R independent replicas of a source SF directory (default
R=10: sf0.1 -> sf1-equivalent volume), for the SCALING sweep of the
heavy-tail queries. Each replica is an independent "shard of days":

- every key column is shifted by a per-replica offset, so joins and
  graph structure replicate without cross-replica edges;
- document text (replica r > 0) is passed through a deterministic
  per-replica character bijection (codepoint + r*0x400 for non-
  whitespace chars, identity where the shift would leave the BMP, hit
  a surrogate, or change whitespace-class membership). Within a
  replica every gram relationship of the original corpus is preserved
  EXACTLY (same chars map the same way everywhere), while cross-replica
  gram/vocabulary overlap collapses to ~zero — so dedup candidate
  volume scales LINEARLY in replicas, the honest production shape
  (independent shards), not an exact-duplicate flood (which would be a
  quadratic adversarial benchmark, a different experiment);
- embeddings get a tiny deterministic per-replica jitter so vector
  near-neighbour structure also replicates instead of stacking exact
  duplicates.

Replica 0 is byte-identical to the source rows. Deterministic: no RNG
anywhere, every transform is a pure function of (value, replica).

Usage: python3 tools/scale_gen.py [src_dir] [out_dir] [replicas]
"""
import sys
import unicodedata

import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
import numpy as np

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata-sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

DOC_OFF = 1_000_000  # doc_id / vec_id / all TPC-H keys / user_id
EVT_OFF = 10_000_000  # event_id

WS = set("\t\n\x0b\f\r")


def shiftable(ch: str, r: int) -> bool:
    if ch in WS or unicodedata.category(ch).startswith("Z"):
        return False  # whitespace-class chars anchor token/gram splits
    o = ord(ch) + r * 0x400
    if o >= 0xFFFF or 0xD800 <= o <= 0xDFFF:
        return False
    out = chr(o)
    if out in WS or unicodedata.category(out).startswith("Z"):
        return False
    return True


def text_tables(table: pa.Table, col: str, r: int) -> pa.Table:
    """Per-replica character bijection over a string column."""
    if r == 0:
        return table
    texts = table.column(col).to_pylist()
    alphabet = set()
    for t in texts:
        if t:
            alphabet.update(t)
    trans = {
        ord(c): ord(c) + r * 0x400 for c in alphabet if shiftable(c, r)
    }
    shifted = [t.translate(trans) if t else t for t in texts]
    idx = table.schema.get_field_index(col)
    return table.set_column(idx, col, pa.array(shifted, pa.string()))


def shift(table: pa.Table, col: str, off: int) -> pa.Table:
    idx = table.schema.get_field_index(col)
    typ = table.schema.field(col).type
    return table.set_column(
        idx, col, pc.cast(pc.add(table.column(col), off), typ))


def replicate(name: str, keys: dict, text_col: str = None,
              jitter_vec: bool = False) -> None:
    src = pq.read_table(f"{SRC}/{name}.parquet")
    out = []
    for r in range(R):
        t = src
        for col, unit in keys.items():
            if r > 0:
                t = shift(t, col, r * unit)
        if text_col is not None:
            t = text_tables(t, text_col, r)
        if jitter_vec and r > 0:
            vecs = t.column("embedding").to_pylist()
            ids = t.column("vec_id").to_pylist()
            out_vecs = []
            for vid, v in zip(ids, vecs):
                a = np.asarray(v, dtype=np.float32)
                d = np.arange(len(a))
                jit = (((vid * 31 + d * 7 + r * 13) % 1000) / 1.0e6
                       ).astype(np.float32)
                out_vecs.append((a + jit).tolist())
            idx = t.schema.get_field_index("embedding")
            t = t.set_column(idx, "embedding",
                             pa.array(out_vecs, t.schema.field(idx).type))
        out.append(t)
    # one file per replica inside a directory-table: a 10x single-file
    # table would scan as ONE split (maxPartitionBytes) and serialize
    # every non-fanned-out explode into a single task — a layout
    # artifact, not a scaling property; real tables at this volume are
    # many files (guide SS6), and per-replica files are the natural
    # "independent shards" physical shape
    import os
    d = f"{OUT}/{name}.parquet"
    os.makedirs(d, exist_ok=True)
    total = 0
    for r, t in enumerate(out):
        pq.write_table(t, f"{d}/part-{r:02d}.parquet")
        total += t.num_rows
    print(f"{name}: {src.num_rows} -> {total} ({len(out)} files)")


def main() -> None:
    import os
    os.makedirs(OUT, exist_ok=True)
    replicate("documents", {"doc_id": DOC_OFF}, text_col="text")
    replicate("embeddings", {"vec_id": DOC_OFF}, jitter_vec=True)
    replicate("events", {"event_id": EVT_OFF, "user_id": DOC_OFF})
    replicate("customer", {"c_custkey": DOC_OFF})
    replicate("orders", {"o_orderkey": DOC_OFF, "o_custkey": DOC_OFF})
    replicate("lineitem", {"l_orderkey": DOC_OFF, "l_partkey": DOC_OFF,
                           "l_suppkey": DOC_OFF})
    replicate("part", {"p_partkey": DOC_OFF})
    replicate("supplier", {"s_suppkey": DOC_OFF})
    for dim in ("nation", "region"):
        pq.write_table(pq.read_table(f"{SRC}/{dim}.parquet"),
                       f"{OUT}/{dim}.parquet")
        print(f"{dim}: copied")


if __name__ == "__main__":
    main()
