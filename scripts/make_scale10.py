#!/usr/bin/env python3
"""Build a one-off 10x corpus for the empirical scale proof (r14 #5).

Replicates sf0.1's documents (5k -> 50k rows) and embeddings (2k ->
20k) ten times with perturbed ids and lightly perturbed content —
linear-scaling input, NOT pure duplication (10 exact copies per doc
would make every near-dup bucket 10x denser and Sigma-bucket-squared
100x, which measures data degeneracy, not operator scaling). The other
eight tables are copied verbatim (the five flagship composites read
documents/embeddings as their fact side).

Output: /tmp/scale10/*.parquet
"""
import os, shutil, struct
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale10"
REPL = 10


def perturb_documents():
    t = pq.read_table(f"{SRC}/documents.parquet")
    n = t.num_rows
    max_id = max(t.column("doc_id").to_pylist())
    cols = {name: t.column(name).to_pylist() for name in t.schema.names}
    out = {name: [] for name in t.schema.names}
    for k in range(REPL):
        for i in range(n):
            out["doc_id"].append(cols["doc_id"][i] + k * (max_id + 1))
            # replica-specific suffix: near-dup (not exact-dup) content,
            # so dedup workloads scale with corpus size, not corpus^2
            txt = cols["text"][i]
            out["text"].append(txt if k == 0 else f"{txt} r{k}")
            out["lang"].append(cols["lang"][i])
            out["source"].append(cols["source"][i])
            out["n_chars"].append(
                cols["n_chars"][i] + (0 if k == 0 else len(f" r{k}")))
    schema = pa.schema([(f.name, f.type) for f in t.schema])
    pq.write_table(pa.table(out, schema=schema),
                   f"{DST}/documents.parquet")
    print(f"documents: {n} -> {n * REPL}")


def perturb_embeddings():
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    n = t.num_rows
    max_id = max(t.column("vec_id").to_pylist())
    vecs = t.column("embedding").to_pylist()
    labels = t.column("label").to_pylist()
    ids = t.column("vec_id").to_pylist()
    out_id, out_vec, out_lab = [], [], []
    for k in range(REPL):
        eps = k * 1e-3
        for i in range(n):
            out_id.append(ids[i] + k * (max_id + 1))
            v = vecs[i]
            if k == 0:
                out_vec.append(v)
            else:
                # deterministic tiny rotation-ish perturbation: shifts
                # vectors off their replica-0 positions without moving
                # them across coarse cluster boundaries
                out_vec.append([struct.unpack(
                    "f", struct.pack("f", x + eps * ((j % 7) - 3)))[0]
                    for j, x in enumerate(v)])
            out_lab.append(labels[i])
    schema = pa.schema([(f.name, f.type) for f in t.schema])
    pq.write_table(pa.table(
        {"vec_id": out_id, "embedding": out_vec, "label": out_lab},
        schema=schema), f"{DST}/embeddings.parquet")
    print(f"embeddings: {n} -> {n * REPL}")


def main():
    os.makedirs(DST, exist_ok=True)
    for f in sorted(os.listdir(SRC)):
        if f.endswith(".parquet") and f not in (
                "documents.parquet", "embeddings.parquet"):
            shutil.copy(f"{SRC}/{f}", f"{DST}/{f}")
    perturb_documents()
    perturb_embeddings()
    print("wrote", DST)


if __name__ == "__main__":
    main()
