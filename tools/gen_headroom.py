#!/usr/bin/env python3
"""Generate the 10x headroom corpora used by SCALE.md's scaling tables.

Fresh tables drawn from the SAME empirical distributions as the sf0.1
testdata — fresh samples, because duplicating rows would inflate
near-dup density and fake a quadratic output:

  documents   token frequencies, doc token-length histogram, lang/source
              marginals (or a Zipf vocabulary with --zipf, see below)
  embeddings  per-dimension embedding marginals, label marginal
  events      per-user activity histogram (10x the USERS, same
              activity-per-user — the way a product actually grows),
              event-type/value/props marginals, timestamps resampled
              from the empirical distribution with +-30 min jitter so
              the diurnal shape and the TIME SPAN are preserved: with a
              fixed span and 10x users, per-(user, window) temporal
              density stays flat, which is what makes linear the right
              null hypothesis for sessionize/funnel/range-join scaling.
  customer    copied from sf0.1 (the q90 stream-static dim; synthetic
              user ids beyond the sf0.1 range simply don't match, which
              only thins the broadcast-join output).

--zipf replaces the empirical token distribution for documents with a
Zipf(s=1.05) law over a 50k-term synthetic vocabulary. The sf0.1
documents table has a ~31-term vocabulary with df 75-80% — EVERY term
is a stop term, the adversarial worst case for term-at-a-time
retrieval. A Zipf vocabulary is the published shape real corpora have
(df concentrated in few head terms, a long rare tail), and is the
regime the BM25/trigram/phrase df stop cut is designed for.

Usage: gen_headroom.py <sf0.1_dir> <out_dir> [n_docs] [--zipf]
                       [--events-factor K]
(builder-local tooling, python driver-side only — the engine under
test never uses python)
"""
import shutil
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def gen_documents(src: str, out: str, rng, n: int, zipf: bool) -> None:
    docs = pq.read_table(f"{src}/documents.parquet").to_pydict()
    doc_lens = np.array([len(t.split()) for t in docs["text"]])
    langs, lang_c = np.unique(docs["lang"], return_counts=True)
    srcs, src_c = np.unique(docs["source"], return_counts=True)

    if zipf:
        vsize = 50_000
        vocab = np.array([f"w{i}" for i in range(vsize)])
        ranks = np.arange(1, vsize + 1, dtype=np.float64)
        tok_p = (1.0 / ranks ** 1.05)
        tok_p /= tok_p.sum()
    else:
        toks = [t for text in docs["text"] for t in text.split()]
        vocab, counts = np.unique(toks, return_counts=True)
        tok_p = counts / counts.sum()

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


def gen_embeddings(src: str, out: str, rng, n: int,
                   zipf_labels: bool = False, clusters: int = 0) -> None:
    emb = pq.read_table(f"{src}/embeddings.parquet").to_pydict()
    mat = np.array(emb["embedding"], dtype=np.float32)  # rows x dims
    labels, lab_c = np.unique(emb["label"], return_counts=True)
    if clusters > 0:
        # CLUSTERED regime (round-15 verdict item 4): the default path
        # samples dimensions independently — the structure-free worst
        # case NN-Descent's autoK/autoIters were calibrated on. Real
        # embedding corpora are mixtures: K centers (each drawn from the
        # per-dim empirical marginals, so scale/offset match the default
        # corpus) + per-dim Gaussian noise at half the empirical std.
        # Zipf(1.1) cluster sizes — real topic clusters are not uniform.
        dims = mat.shape[1]
        centers = np.stack(
            [rng.choice(mat[:, d], size=clusters) for d in range(dims)], axis=1)
        stds = mat.std(axis=0)
        ranks = np.arange(1, clusters + 1, dtype=np.float64)
        cl_p = 1.0 / ranks ** 1.1
        cl_p /= cl_p.sum()
        assign = rng.choice(np.arange(clusters), size=n, p=cl_p)
        vecs = (centers[assign]
                + rng.normal(0.0, 0.5, size=(n, dims)).astype(np.float32) * stds)
    else:
        # per-dimension empirical marginals, sampled independently
        cols = [rng.choice(mat[:, d], size=n) for d in range(mat.shape[1])]
        vecs = np.stack(cols, axis=1)
    if zipf_labels:
        # Rare-label regime for the q179 filtered-ANN revisit trigger
        # (SCALE.md keep-IVF decision names sub-1% labels): 20 labels with
        # Zipf(s=1.5) frequencies — labels 12..19 each land below 1% of
        # the corpus. The testdata's own marginal is uniform 10 x ~10%,
        # which can never exercise the trigger. The 10 q179 query vectors
        # (vec_id < 10) are pinned to the EVEN label ranks 0,2,..,18 so
        # every frequency band — head, mid, and sub-1% tail — gets
        # queried; everything else about the corpus matches the default
        # path (same vectors, same ids).
        n_lab = 20
        ranks = np.arange(1, n_lab + 1, dtype=np.float64)
        lab_p = 1.0 / ranks ** 1.5
        lab_p /= lab_p.sum()
        lab_col = rng.choice(np.arange(n_lab, dtype=np.int64), size=n, p=lab_p)
        lab_col[:10] = np.arange(10, dtype=np.int64) * 2
        lab_arr = pa.array(lab_col, pa.int64())
    else:
        lab_arr = pa.array(rng.choice(labels, size=n, p=lab_c / lab_c.sum()))
    etable = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": lab_arr,
    })
    pq.write_table(etable, f"{out}/embeddings.parquet")


def gen_events(src: str, out: str, rng, factor: int) -> None:
    ev = pq.read_table(f"{src}/events.parquet")
    ts_us = ev.column("ts").cast(pa.int64()).to_numpy()  # epoch micros
    d = ev.to_pydict()
    _, ucounts = np.unique(d["user_id"], return_counts=True)
    types, tcounts = np.unique(d["event_type"], return_counts=True)
    vals = np.asarray(d["value"])
    props = np.asarray(d["props"])

    n_users = len(ucounts) * factor
    per_user = rng.choice(ucounts, size=n_users)
    n = int(per_user.sum())
    user_col = np.repeat(np.arange(n_users, dtype=np.int64), per_user)
    ts_col = rng.choice(ts_us, size=n) + rng.integers(
        -1_800_000_000, 1_800_000_000, size=n)  # +-30 min, micros
    order = np.argsort(ts_col, kind="stable")  # log files arrive time-ordered
    table = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts_col[order]).cast(pa.timestamp("us")),
        "user_id": pa.array(user_col[order]),
        "event_type": pa.array(rng.choice(types, size=n,
                                          p=tcounts / tcounts.sum())),
        "value": pa.array(rng.choice(vals, size=n), pa.float64()),
        "props": pa.array(rng.choice(props, size=n), pa.string()),
    })
    pq.write_table(table, f"{out}/events.parquet")
    shutil.copy(f"{src}/customer.parquet", f"{out}/customer.parquet")
    print(f"wrote {n} events over {n_users} users (+ customer dim) to {out}")


def main(src: str, out: str, n: int, zipf: bool, events_factor: int,
         zipf_labels: bool = False, clusters: int = 0) -> None:
    rng = np.random.default_rng(1234)
    gen_documents(src, out, rng, n, zipf)
    gen_embeddings(src, out, rng, n, zipf_labels, clusters)
    print(f"wrote {n} docs + {n} vectors to {out}"
          + (" [zipf vocab]" if zipf else "")
          + (" [zipf labels]" if zipf_labels else "")
          + (f" [{clusters} gaussian clusters]" if clusters else ""))
    if events_factor > 0:
        gen_events(src, out, rng, events_factor)


if __name__ == "__main__":
    import argparse
    import os
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("out")
    p.add_argument("n_docs", nargs="?", type=int, default=50000)
    p.add_argument("--zipf", action="store_true")
    p.add_argument("--zipf-labels", action="store_true",
                   help="Zipf(1.5) label marginal over 20 labels "
                        "(labels 12+ are sub-1%% — the q179 rare-label regime)")
    p.add_argument("--events-factor", type=int, default=10,
                   help="events users multiplier; 0 skips events")
    p.add_argument("--clusters", type=int, default=0,
                   help="mixture-of-Gaussians embeddings with K Zipf-sized "
                        "clusters (0 = independent-dimension default)")
    a = p.parse_args()
    os.makedirs(a.out, exist_ok=True)
    main(a.src, a.out, a.n_docs, a.zipf, a.events_factor, a.zipf_labels,
         a.clusters)
