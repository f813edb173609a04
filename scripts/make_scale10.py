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
# SCALE_DST/SCALE_REPL env overrides: the r16 verdict's 30x spot-proof
# (q235 density) reuses this script at REPL=30 -> /tmp/scale30
DST = os.environ.get("SCALE_DST", "/tmp/scale10")
REPL = int(os.environ.get("SCALE_REPL", "10"))


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


def perturb_events():
    """10x events with SHIFTED time windows and entity ids (r15 verdict
    #3): replica k moves ts forward by k*(span+1h) and user_id/event_id
    into fresh ranges. Time-bucketed aggregates and interval joins then
    scale linearly in buckets/windows — verbatim replication would
    instead make every time window 10x denser (interval-join candidate
    pairs 100x), which measures data degeneracy, not operator scaling;
    same rationale as the documents near-dup treatment above."""
    t = pq.read_table(f"{SRC}/events.parquet")
    n = t.num_rows
    ids = t.column("event_id").to_pylist()
    ts = t.column("ts").to_pylist()
    users = t.column("user_id").to_pylist()
    etypes = t.column("event_type").to_pylist()
    values = t.column("value").to_pylist()
    props = t.column("props").to_pylist()
    max_id = max(ids)
    max_user = max(users)
    import datetime
    span = max(ts) - min(ts) + datetime.timedelta(hours=1)
    out = {k: [] for k in t.schema.names}
    for k in range(REPL):
        shift = k * span
        for i in range(n):
            out["event_id"].append(ids[i] + k * (max_id + 1))
            out["ts"].append(ts[i] + shift)
            out["user_id"].append(users[i] + k * (max_user + 1))
            out["event_type"].append(etypes[i])
            out["value"].append(values[i])
            out["props"].append(props[i])
    schema = pa.schema([(f.name, f.type) for f in t.schema])
    pq.write_table(pa.table(out, schema=schema), f"{DST}/events.parquet")
    print(f"events: {n} -> {n * REPL}")


def perturb_customer():
    """10x customer with shifted c_custkey ranges (r15 verdict #3 —
    the q235_dbscan fact side is CUSTOMER, not events). The DBSCAN
    lattice derives (x,y) from c_custkey modulo a FIXED 36000x18000
    box, so 10x points means 10x density at constant area: candidate
    pairs grow ~density^2 per epsilon-cell. That is the honest hard
    case for a density clusterer (the area-growing case is the
    documents-style shifted treatment, which the id->lattice mapping
    cannot express) — the proof judgment is then pairs-bound growth
    with grid partitioning holding per-task memory flat."""
    import pyarrow.compute as pc
    t = pq.read_table(f"{SRC}/customer.parquet")
    n = t.num_rows
    max_id = pc.max(t.column("c_custkey")).as_py()
    parts = []
    for k in range(REPL):
        if k == 0:
            parts.append(t)
        else:
            shifted = t.set_column(
                t.schema.get_field_index("c_custkey"), "c_custkey",
                pc.add(t.column("c_custkey"), k * (max_id + 1)))
            parts.append(shifted)
    pq.write_table(pa.concat_tables(parts), f"{DST}/customer.parquet")
    print(f"customer: {n} -> {n * REPL}")


def main():
    os.makedirs(DST, exist_ok=True)
    for f in sorted(os.listdir(SRC)):
        if f.endswith(".parquet") and f not in (
                "documents.parquet", "embeddings.parquet",
                "events.parquet", "customer.parquet"):
            shutil.copy(f"{SRC}/{f}", f"{DST}/{f}")
    perturb_customer()
    perturb_documents()
    perturb_embeddings()
    perturb_events()
    print("wrote", DST)


if __name__ == "__main__":
    main()
