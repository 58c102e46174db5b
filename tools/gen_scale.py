#!/usr/bin/env python3
"""Generate a DECADE-LARGER documents/embeddings pair for the composed-chain
slope experiment (round-11 verdict item: one more scaling decade for
p9/p10/p12/g3/g4/d16 beyond the sf0.01->sf0.1 gate).

/root/testdata is read-only and tops out at sf0.1 (5,000 docs / 2,000
vectors), so this script synthesizes sf1-equivalent tables under
scaledata/sf1 by SAMPLING THE EMPIRICAL DISTRIBUTIONS of sf0.1 (measured in
this script, not guessed): the 31-word vocabulary with its near-uniform
frequencies, the 10..100 uniform token-length band, the 20-source uniform
layout, the lang mix, the exact-duplicate rate, and a ~1% near-duplicate
injection so the dedup stages keep differentiating mass. Embeddings follow
sf0.1's actual recipe — random UNIT vectors in 64 dims (measured: norms
1.0, labels uncorrelated with cosine, pairs>=0.35 are the 2.8-sigma random
tail at density ~0.21%) — which makes the true >=0.35 pair count QUADRATIC
in n BY CONSTRUCTION. That is a fixture property the slope experiment must
account for (the d16 chain's output itself grows ~100x per vector decade),
not a plan defect; tools/scale_slope.py separates the two.

Deterministic (seed 4242). Output: scaledata/sf1/{documents,embeddings}.parquet
(plus nothing else — the composed chains read only these two tables).
"""
import collections
import os
import random

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
# Default: the sf1-equivalent decade. `gen_scale.py sf10` (round 14)
# generates a THIRD document decade — 500k docs — for the doc-chain slope
# experiment only; embeddings stay at 20k (the emb chains' honest cost is
# output-quadratic by fixture construction, so a 200k-vector decade would
# burn hours re-measuring a known fixture property — the sf10 run excludes
# them and scale_slope_decade.py judges doc chains alone).
_TIER = (os.sys.argv[1] if len(os.sys.argv) > 1 else "sf1")
_TIERS = {"sf1": (50_000, 20_000), "sf10": (500_000, 20_000)}
OUT = os.path.join(REPO, "scaledata", _TIER)
N_DOCS, N_VECS = _TIERS[_TIER]
SEED = 4242 if _TIER == "sf1" else 42420


def main():
    os.makedirs(OUT, exist_ok=True)
    rnd = random.Random(SEED)
    nprnd = np.random.default_rng(SEED)

    rows = duckdb.sql(
        f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet'"
    ).fetchall()
    vocab = collections.Counter()
    lens = []
    for _, t, _, _ in rows:
        ws = t.split()
        vocab.update(ws)
        lens.append(len(ws))
    words = sorted(vocab)
    wfreq = np.array([vocab[w] for w in words], dtype=float)
    wfreq /= wfreq.sum()
    langs = collections.Counter(r[2] for r in rows)
    lnames = sorted(langs)
    lfreq = np.array([langs[l] for l in lnames], dtype=float)
    lfreq /= lfreq.sum()
    lens = np.array(lens)

    n_sources = 20
    doc_ids, texts, lang_col, src_col = [], [], [], []
    for i in range(N_DOCS):
        n = int(nprnd.choice(lens))  # empirical length distribution
        ws = nprnd.choice(words, size=n, p=wfreq)
        doc_ids.append(i)
        texts.append(" ".join(ws))
        lang_col.append(lnames[int(nprnd.choice(len(lnames), p=lfreq))])
        src_col.append(f"src{i % n_sources}")
    # exact duplicates at sf0.1's measured rate (8/5000)
    n_exact = int(N_DOCS * 8 / 5000)
    for _ in range(n_exact):
        a, b = rnd.randrange(N_DOCS), rnd.randrange(N_DOCS)
        texts[b] = texts[a]
    # near-duplicates (~1%): copy + perturb a few tokens, so MinHash/Jaccard
    # stages keep real work at scale
    n_near = N_DOCS // 100
    for _ in range(n_near):
        a, b = rnd.randrange(N_DOCS), rnd.randrange(N_DOCS)
        ws = texts[a].split()
        for _ in range(max(1, len(ws) // 20)):
            ws[rnd.randrange(len(ws))] = words[rnd.randrange(len(words))]
        texts[b] = " ".join(ws)
    docs = pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang_col, pa.string()),
        "source": pa.array(src_col, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(docs, os.path.join(OUT, "documents.parquet"))

    X = nprnd.standard_normal((N_VECS, 64))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    emb = pa.table({
        "vec_id": pa.array(range(N_VECS), pa.int64()),
        "embedding": pa.array([r.astype(np.float32) for r in X],
                              pa.list_(pa.float32())),
        "label": pa.array((np.arange(N_VECS) % 10).astype(np.int32), pa.int32()),
    })
    pq.write_table(emb, os.path.join(OUT, "embeddings.parquet"))
    print(f"[gen_scale] wrote {N_DOCS} docs + {N_VECS} vecs to {OUT}")


if __name__ == "__main__":
    main()
