#!/usr/bin/env python3
"""Generate the 10x headroom corpus used by SCALE.md's scaling table.

Fresh 50k-row documents + embeddings tables drawn from the SAME
empirical distributions as the sf0.1 testdata (token frequencies,
doc token-length histogram, lang/source marginals, per-dimension
embedding marginals). Fresh samples — duplicating rows would inflate
near-dup density and fake a quadratic output.

Usage: gen_headroom.py <sf0.1_dir> <out_dir> [n_docs]
(builder-local tooling, python driver-side only — the engine under
test never uses python)
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

def main(src: str, out: str, n: int = 50000) -> None:
    rng = np.random.default_rng(1234)
    docs = pq.read_table(f"{src}/documents.parquet").to_pydict()

    toks = [t for text in docs["text"] for t in text.split()]
    vocab, counts = np.unique(toks, return_counts=True)
    tok_p = counts / counts.sum()
    doc_lens = np.array([len(t.split()) for t in docs["text"]])
    langs, lang_c = np.unique(docs["lang"], return_counts=True)
    srcs, src_c = np.unique(docs["source"], return_counts=True)

    lens = rng.choice(doc_lens, size=n)
    flat = rng.choice(vocab, size=int(lens.sum()), p=tok_p)
    texts, pos = [], 0
    for L in lens:
        texts.append(" ".join(flat[pos:pos + L]))
        pos += L
    table = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(rng.choice(langs, size=n, p=lang_c / lang_c.sum())),
        "source": pa.array(rng.choice(srcs, size=n, p=src_c / src_c.sum())),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(table, f"{out}/documents.parquet")

    emb = pq.read_table(f"{src}/embeddings.parquet").to_pydict()
    mat = np.array(emb["embedding"], dtype=np.float32)  # rows x dims
    labels, lab_c = np.unique(emb["label"], return_counts=True)
    # per-dimension empirical marginals, sampled independently
    cols = [rng.choice(mat[:, d], size=n) for d in range(mat.shape[1])]
    vecs = np.stack(cols, axis=1)
    etable = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.choice(labels, size=n, p=lab_c / lab_c.sum())),
    })
    pq.write_table(etable, f"{out}/embeddings.parquet")
    print(f"wrote {n} docs + {n} vectors to {out}")

if __name__ == "__main__":
    import os
    os.makedirs(sys.argv[2], exist_ok=True)
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 50000)
