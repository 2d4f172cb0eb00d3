#!/usr/bin/env python
"""Synthesize a larger perf-measurement dataset from the driver's sf0.1.

NOT part of any query or measurement contract — this exists only so
optimization work can be validated at ~sf1.0 scale (the driver's round-end
measurement SF) without access to the driver's generator. The output lives
OUTSIDE /root/testdata (which is read-only driver data).

Scaling model (factor K, deterministic):
  - fact tables (orders/lineitem/events): K copies with key offsets;
    foreign keys offset consistently with their dimension copies, so join
    fan-out per key stays constant while key cardinality grows Kx (the way
    a real scale factor grows).
  - customer/part/supplier: K copies, offset keys.
  - documents: K copies; copy 0 verbatim, copies >0 remap every word with
    a per-copy suffix (w -> w + str(c)). Intra-copy structure — shingle
    frequency distribution, near-dup pairs, repetition ratios — is
    preserved EXACTLY per copy while cross-copy shingle overlap is zero,
    so distinct shingles and near-dup pairs grow linearly with K, the way
    a naturally 10x-bigger corpus behaves (verbatim copies would grow
    near-dup pairs quadratically; per-doc word shuffles concentrate the
    trigram space of the 31-word vocabulary and explode the inverted
    index).
  - embeddings: K copies; copies >0 get a per-copy deterministic dimension
    permutation (norms exact, cross-copy cosine similarity destroyed so
    near-dup pairs grow ~linearly).
  - nation/region: unchanged (true dimensions).

Usage: python BENCH/upscale_sf.py <outdir> [K]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("KUSS_UPSCALE_SRC", "/root/testdata/sf0.1")

N_CUST, N_ORD, N_EVT, N_DOC, N_VEC = 15_000, 150_000, 100_000, 5_000, 2_000
N_PART, N_SUPP = 20_000, 1_000


def main() -> None:
    outdir = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(outdir, exist_ok=True)
    con = duckdb.connect()

    def rd(t):
        return con.sql(f"select * from '{SRC}/{t}.parquet'").arrow()

    def wr(t, tbl):
        # write big tables as multi-file directories so Spark's scan
        # actually parallelizes (a small single-row-group file is one split
        # no matter what maxPartitionBytes says); Spark reads the directory
        # transparently under the same f"{dir}/{t}.parquet" path
        n = tbl.num_rows
        files = min(32, max(1, n // 12_500))
        if files == 1:
            pq.write_table(tbl, f"{outdir}/{t}.parquet", compression="zstd")
        else:
            d = f"{outdir}/{t}.parquet"
            os.makedirs(d, exist_ok=True)
            step = (n + files - 1) // files
            for i in range(files):
                pq.write_table(
                    tbl.slice(i * step, step),
                    f"{d}/part-{i:05d}.parquet",
                    compression="zstd",
                    row_group_size=65536,
                )
        print(t, n, f"({files} files)")

    for t in ("nation", "region"):
        wr(t, rd(t))

    def offset_copies(tbl: pa.Table, offsets: dict[str, int]) -> pa.Table:
        outs = []
        for c in range(k):
            cols = []
            for name in tbl.column_names:
                col = tbl.column(name)
                if name in offsets and c > 0:
                    col = pa.chunked_array(
                        [pc.add(ch, offsets[name] * c) for ch in col.chunks]
                    )
                cols.append(col)
            outs.append(pa.table(cols, names=tbl.column_names))
        return pa.concat_tables(outs)

    wr("customer", offset_copies(rd("customer"), {"c_custkey": N_CUST}))
    wr("part", offset_copies(rd("part"), {"p_partkey": N_PART}))
    wr("supplier", offset_copies(rd("supplier"), {"s_suppkey": N_SUPP}))
    wr("orders", offset_copies(rd("orders"), {"o_orderkey": N_ORD, "o_custkey": N_CUST}))
    wr(
        "lineitem",
        offset_copies(
            rd("lineitem"),
            {"l_orderkey": N_ORD, "l_partkey": N_PART, "l_suppkey": N_SUPP},
        ),
    )
    wr("events", offset_copies(rd("events"), {"event_id": N_EVT, "user_id": N_CUST // 10}))

    # documents: per-copy word-suffix remap in copies > 0 (see module doc)
    docs = rd("documents").to_pydict()
    out = {kk: [] for kk in docs}
    for c in range(k):
        for i in range(len(docs["doc_id"])):
            did = docs["doc_id"][i]
            text = docs["text"][i]
            if c > 0:
                text = " ".join(w + str(c) for w in text.split(" "))
            out["doc_id"].append(did + c * N_DOC)
            out["text"].append(text)
            out["lang"].append(docs["lang"][i])
            out["source"].append(docs["source"][i])
            out["n_chars"].append(len(text))
    wr("documents", pa.table(out))

    # embeddings: per-copy dimension permutation in copies > 0
    emb = rd("embeddings").to_pydict()
    dim = len(emb["embedding"][0])
    out = {kk: [] for kk in emb}
    for c in range(k):
        perm = np.random.default_rng(1000 + c).permutation(dim) if c > 0 else np.arange(dim)
        for i in range(len(emb["vec_id"])):
            v = np.asarray(emb["embedding"][i], dtype=np.float32)
            out["vec_id"].append(emb["vec_id"][i] + c * N_VEC)
            out["embedding"].append(v[perm].tolist())
            out["label"].append(emb["label"][i])
    schema = pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())), ("label", pa.int32())]
    )
    wr("embeddings", pa.table(out, schema=schema))
    open(f"{outdir}/_DONE", "w").close()


if __name__ == "__main__":
    main()
