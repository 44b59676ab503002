"""Boundary-recall measurement for dedup_embedding_lsh at scale.

The auto table count (`similarity.lsh_tables_for_recall`) is sized from SRP
collision theory to keep recall for a pair AT the cosine threshold >= 0.95;
the unit tests pin the curve at 2k-20k vectors. This tool validates the
policy at the sf100 decade (2M vectors, auto planes ~17 where the bucket
occupancy target bites hardest):

1. read SCALE_DIR/embeddings.parquet (the gen_corpus_scale output),
2. plant ``n_pairs`` boundary partners per rung — for base vector u, the
   partner is ``c*u + sqrt(1-c^2)*w`` with w a random unit vector in u's
   orthogonal complement, so cos(u, partner) == c exactly (Gram-Schmidt);
   rungs sit at threshold+1e-4 (the boundary) and threshold+0.01 (near),
3. run dedup_embedding_lsh over the union at the default auto planes/tables,
4. report per-rung recall (found planted pairs / planted pairs) + wall.

Random 64-dim normal pairs concentrate at cos ~ N(0, 1/64), so nothing
un-planted sits near a 0.95 threshold — recall attribution is clean.

Usage:
    python tools/lsh_scale_recall.py SCALE_DIR [n_pairs] [threshold]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

PLANT_BASE = 10_000_000  # planted partner ids start here: disjoint from data


def plant_boundary_pairs(scale_dir: str, out_path: str, n_pairs: int, rungs):
    """Write a parquet of planted partners; returns {rung_cos: [(a, b)]}."""
    pf = pq.ParquetFile(os.path.join(scale_dir, "embeddings.parquet"))
    n = pf.metadata.num_rows
    rng = np.random.default_rng(7)
    # spread base ids across the corpus (avoid the generator's own planted
    # near-dups at the head/tail)
    stride = max(1, (n - 20) // (n_pairs * len(rungs) + 1))
    base_ids = [10 + i * stride for i in range(n_pairs * len(rungs))]
    want = set(base_ids)
    base_vecs: dict = {}
    # one footer-ordered scan picks the base vectors out
    start = 0
    for rg in range(pf.num_row_groups):
        tbl = pf.read_row_group(rg, columns=["vec_id", "embedding"])
        ids = tbl.column("vec_id").to_numpy()
        hit = [j for j, i in enumerate(ids) if int(i) in want]
        if hit:
            embs = tbl.column("embedding")
            for j in hit:
                base_vecs[int(ids[j])] = np.asarray(
                    embs[j].as_py(), dtype="float64"
                )
        start += len(ids)
    planted = {c: [] for c in rungs}
    out_ids, out_vecs = [], []
    k = 0
    for r, c in enumerate(rungs):
        for i in range(n_pairs):
            bid = base_ids[r * n_pairs + i]
            u = base_vecs[bid]
            u = u / np.linalg.norm(u)
            g = rng.standard_normal(len(u))
            w = g - (g @ u) * u
            w = w / np.linalg.norm(w)
            v = c * u + math.sqrt(1.0 - c * c) * w
            pid = PLANT_BASE + k
            k += 1
            out_ids.append(pid)
            out_vecs.append(v.astype("float32").tolist())
            planted[c].append((bid, pid))
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(out_ids, pa.int64()),
                "embedding": pa.array(out_vecs, pa.list_(pa.float32())),
                "label": pa.array([0] * len(out_ids), pa.int32()),
            },
            schema=schema,
        ),
        out_path,
        row_group_size=65_536,
    )
    return planted


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    scale_dir = sys.argv[1]
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 0.95
    rungs = [round(threshold + 1e-4, 6), round(threshold + 0.01, 6)]

    stage = os.path.join("/tmp", "lsh_recall_stage")
    os.makedirs(stage, exist_ok=True)
    for f in os.listdir(stage):
        os.remove(os.path.join(stage, f))
    # the union dir: symlink the corpus file + write the planted file
    os.symlink(
        os.path.join(scale_dir, "embeddings.parquet"),
        os.path.join(stage, "part-corpus.parquet"),
    )
    planted = plant_boundary_pairs(
        scale_dir, os.path.join(stage, "part-planted.parquet"), n_pairs, rungs
    )

    from ffn_polars_spark.operators.similarity import (
        dedup_embedding_lsh,
        lsh_tables_for_recall,
    )
    from ffn_polars_spark.sources import get_spark

    spark = get_spark(app_name="lsh-scale-recall")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(stage)
    n = df.count()
    planes = max(12, math.ceil(math.log2(max(n, 1) / 16 or 1)))
    tables = lsh_tables_for_recall(planes, threshold)

    t0 = time.time()
    pairs = dedup_embedding_lsh(df, threshold=threshold)
    found = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in pairs.where(
            (pairs.id_a >= PLANT_BASE) | (pairs.id_b >= PLANT_BASE)
        ).collect()
    }
    wall = round(time.time() - t0, 1)

    out = {
        "n_vectors": n,
        "threshold": threshold,
        "auto_planes": planes,
        "auto_tables": tables,
        "wall_sec": wall,
        "recall": {},
    }
    for c, ps in planted.items():
        hits = sum(
            1 for a, b in ps if (min(a, b), max(a, b)) in found
        )
        out["recall"][str(c)] = round(hits / len(ps), 4)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
