#!/usr/bin/env python3
"""Scale a graft testdata dir by an integer factor (default 10): sf0.1 ->
sf1-equivalent, preserving parquet schemas exactly (incl. timestamp[ns]
events.ts, which Spark cannot write back itself).

Replication is STRUCTURE-PRESERVING, not naive: each copy k gets a
transform that keeps within-copy relationships identical while making
cross-copy rows unrelated, so duplicate/near-duplicate cluster SIZES stay
constant and only their COUNT scales -- the proportional-growth setting a
10x corpus actually has. Naive row duplication would grow every dup
cluster 10x and near-dup pair work 100x, turning a linear-scaling check
into a quadratic one by construction.

- events:     id-stride remap (event_id, user_id); per-lightcurve series
              byte-identical per copy => per-object analysis work scales
              in #objects.
- documents:  doc_id stride; for k>0 every whitespace token gets a
              1-char copy tag suffix -- a token bijection, so within-copy
              shingle/fingerprint relations (exact-dup, Jaccard, MinHash)
              are EXACTLY preserved while cross-copy overlap drops to ~0.
              n_chars recomputed. (Text BYTES grow ~1.15x beyond the 10x
              rows -- compare char-proportional queries against bytes.)
- embeddings: vec_id stride; embedding dims cyclically rotated by
              k*(dim//factor) -- preserves norms and all within-copy
              cosines exactly, decorrelates copies. label gets a stride
              too: label is a BLOCKING key (embed near-dup), and a
              10x corpus has 10x blocks of the same size, not the same
              blocks 10x larger (which would square the pair work).
- lineitem:   key strides, measures untouched (q1_agg groups globally).
- tiny dims (region/nation/...): copied verbatim.

Usage: python3 tools/gen_scale.py SRC_DIR OUT_DIR [FACTOR]
"""
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

STRIDE = 1_000_000_000


def scale_events(src, out, factor):
    t = pq.read_table(src)
    parts = []
    for k in range(factor):
        c = t
        c = c.set_column(c.schema.get_field_index("event_id"), "event_id",
                         pa.compute.add(c.column("event_id"), k * 10 * STRIDE))
        c = c.set_column(c.schema.get_field_index("user_id"), "user_id",
                         pa.compute.add(c.column("user_id"), k * STRIDE))
        parts.append(c)
    pq.write_table(pa.concat_tables(parts), out)


def scale_documents(src, out, factor):
    t = pq.read_table(src)
    texts = t.column("text").to_pylist()
    parts = []
    for k in range(factor):
        c = t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                         pa.compute.add(t.column("doc_id"), k * STRIDE))
        if k > 0:
            tag = f"{k}"
            tagged = [None if s is None
                      else re.sub(r"\S+", lambda m: m.group(0) + tag, s)
                      for s in texts]
            c = c.set_column(c.schema.get_field_index("text"), "text",
                             pa.array(tagged, type=pa.string()))
            c = c.set_column(
                c.schema.get_field_index("n_chars"), "n_chars",
                pa.array([None if s is None else len(s) for s in tagged],
                         type=pa.int64()))
        parts.append(c)
    pq.write_table(pa.concat_tables(parts), out)


def scale_embeddings(src, out, factor):
    t = pq.read_table(src)
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    dim = mat.shape[1]
    # factor > dim would make k*(dim//factor) == 0 for every k: all
    # copies byte-identical to the original, growing near-dup clusters
    # by the factor — exactly the quadratic-by-construction artifact
    # this decorrelating roll exists to avoid.
    assert factor <= dim, (
        f"scale factor {factor} > embedding dim {dim}: per-copy roll "
        "would be 0 and copies would be byte-identical")
    parts = []
    for k in range(factor):
        c = t.set_column(t.schema.get_field_index("vec_id"), "vec_id",
                         pa.compute.add(t.column("vec_id"), k * STRIDE))
        c = c.set_column(
            c.schema.get_field_index("label"), "label",
            pa.compute.add(c.column("label"),
                           pa.scalar(k * 100000, type=pa.int32())))
        if k > 0:
            rolled = np.roll(mat, k * (dim // factor), axis=1)
            c = c.set_column(
                c.schema.get_field_index("embedding"), "embedding",
                pa.array(list(rolled), type=pa.list_(pa.float32())))
        parts.append(c)
    pq.write_table(pa.concat_tables(parts), out)


def scale_lineitem(src, out, factor):
    t = pq.read_table(src)
    parts = []
    for k in range(factor):
        c = t
        for key in ("l_orderkey", "l_partkey", "l_suppkey"):
            c = c.set_column(c.schema.get_field_index(key), key,
                             pa.compute.add(c.column(key), k * 10 * STRIDE))
        parts.append(c)
    pq.write_table(pa.concat_tables(parts), out)


def main():
    src_dir, out_dir = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    import shutil
    os.makedirs(out_dir, exist_ok=True)
    scale_events(f"{src_dir}/events.parquet",
                 f"{out_dir}/events.parquet", factor)
    scale_documents(f"{src_dir}/documents.parquet",
                    f"{out_dir}/documents.parquet", factor)
    scale_embeddings(f"{src_dir}/embeddings.parquet",
                     f"{out_dir}/embeddings.parquet", factor)
    scale_lineitem(f"{src_dir}/lineitem.parquet",
                   f"{out_dir}/lineitem.parquet", factor)
    for tiny in ("region", "nation", "customer", "supplier", "part",
                 "orders"):
        shutil.copyfile(f"{src_dir}/{tiny}.parquet",
                        f"{out_dir}/{tiny}.parquet")
    for name in ("events", "documents", "embeddings", "lineitem"):
        f = pq.ParquetFile(f"{out_dir}/{name}.parquet")
        print(name, f.metadata.num_rows, "rows")


if __name__ == "__main__":
    main()
