"""Chunked documents/embeddings generator for LARGE scale factors.

``gen_testdata.py`` materializes every table in memory and builds each
document with a per-token Python loop — right for sf <= 10, hopeless for the
sf100 corpus (5M docs) the third scale decade needs. This tool generates
ONLY the two corpus tables, streamed in chunks through a ParquetWriter with
realistic (64k-row) row groups:

- ``documents``: each text is ``PHRASES_PER_DOC`` random draws from a
  100k-phrase pool (phrases are ~9 random vocab words). The combination
  space is astronomically larger than the corpus, so accidental exact
  duplicates don't exist; shingles repeat only within a phrase (pool hit
  rate ~ n_doc*PPD/len(pool)), which exercises the hot-shingle caps without
  manufacturing a pathological key. The last third are planted near-dup
  variants (case/whitespace/appended-tail) of earlier docs, matching
  gen_testdata's dedup ground-truth scheme.
- ``embeddings``: 64-wide float32 standard normals, with near-duplicates of
  ids 0..4 planted at the end (gen_testdata's scheme), chunked.

Usage:
    python tools/gen_corpus_scale.py OUTDIR SF [seed]

sf units follow gen_testdata: n_doc = 50_000*sf, n_emb = 20_000*sf.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["en", "de", "fr", "es", "it"]
SOURCES = ["web", "books", "wiki", "code", "news"]
PHRASES_PER_DOC = 6
CHUNK = 100_000
ROW_GROUP = 65_536


def _phrase_pool(rng: np.random.Generator, n_phrases: int = 100_000):
    vocab = np.array([f"word{i:04d}" for i in range(5000)])
    lens = rng.integers(7, 12, n_phrases)
    return [
        " ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens
    ]


def gen_documents(outdir: str, n_doc: int, rng: np.random.Generator) -> None:
    pool = _phrase_pool(rng)
    n_base = max(1, n_doc * 2 // 3)
    # base texts needed later as near-dup sources: keep only a bounded
    # reservoir of them (the variants draw from the first BASE_KEEP)
    BASE_KEEP = min(n_base, 500_000)
    kept: list = []
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    writer = pq.ParquetWriter(os.path.join(outdir, "documents.parquet"), schema)
    for start in range(0, n_doc, CHUNK):
        end = min(start + CHUNK, n_doc)
        texts = []
        for i in range(start, end):
            if i < n_base:
                idx = rng.integers(0, len(pool), PHRASES_PER_DOC)
                t = " ".join(pool[j] for j in idx)
                if i < BASE_KEEP:
                    kept.append(t)
            else:
                src = kept[int(rng.integers(0, len(kept)))]
                mode = i % 3
                t = (
                    src.upper()
                    if mode == 0
                    else (f"  {src} " if mode == 1 else src + f" tail{i}")
                )
            texts.append(t)
        ids = list(range(start, end))
        writer.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": texts,
                    "lang": [LANGS[i % 5] for i in ids],
                    "source": [SOURCES[i % 5] for i in ids],
                    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                },
                schema=schema,
            ),
            row_group_size=ROW_GROUP,
        )
    writer.close()


def gen_embeddings(outdir: str, n_emb: int, rng: np.random.Generator) -> None:
    dim = 64
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    writer = pq.ParquetWriter(os.path.join(outdir, "embeddings.parquet"), schema)
    first5 = rng.standard_normal((5, dim)).astype("float32")
    for start in range(0, n_emb, CHUNK):
        end = min(start + CHUNK, n_emb)
        vecs = rng.standard_normal((end - start, dim)).astype("float32")
        if start == 0:
            vecs[: min(5, len(vecs))] = first5[: min(5, len(vecs))]
        # plant near-dups of ids 0..4 at the very end (gen_testdata scheme)
        for j in range(5):
            pos = n_emb - 1 - j
            if start <= pos < end:
                vecs[pos - start] = first5[j] + 0.01 * rng.standard_normal(
                    dim
                ).astype("float32")
        writer.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(start, end), pa.int64()),
                    "embedding": pa.array(
                        [v.tolist() for v in vecs], pa.list_(pa.float32())
                    ),
                    "label": pa.array(
                        rng.integers(0, 10, end - start), pa.int32()
                    ),
                },
                schema=schema,
            ),
            row_group_size=ROW_GROUP,
        )
    writer.close()


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    outdir, sf = sys.argv[1], float(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    os.makedirs(outdir, exist_ok=False)
    rng = np.random.default_rng(seed)
    gen_documents(outdir, max(500, int(50_000 * sf)), rng)
    gen_embeddings(outdir, max(500, int(20_000 * sf)), rng)
    print(f"wrote {outdir} (documents + embeddings at sf{sf:g})")


if __name__ == "__main__":
    main()
