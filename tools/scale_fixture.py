"""Seeded large-scale fixture generator for the ANN / dedup crossover
benchmarks (r06 verdict ask #4).

The driver testdata caps documents/embeddings at 500–5,000 rows —
enough to verify correctness, far too small to show WHERE the
bucketed algorithms (LSH / IVF / banded MinHash) overtake their exact
baselines. This module materializes deterministic parquet fixtures at
100k–1M rows so the crossover is measured, not argued from plan shape.

Layout (outside the read-only driver testdata):
    $SPARK_GRAFT_SCALE_DIR (default /tmp/w2e_scale_fixture)/
        emb_<n>_<dim>.parquet        # vec_id, embedding, label
        docs_<n>.parquet             # doc_id, text, lang, source, n_chars

Schemas mirror /root/testdata/sf*/{embeddings,documents}.parquet, so
every registry kernel runs on them unchanged.

Determinism: numpy default_rng with a fixed seed per (table, n) —
identical bytes across runs and machines; generation is skipped when
the file already exists (size-stamped name).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/w2e_scale_fixture")

#: embedding clusters — gives IVF/LSH real structure to exploit, like
#: an encoder's output manifold (cluster count scales with corpus in
#: production; fixed here so recall is comparable across sizes)
_N_CLUSTERS = 32

_VOCAB = [
    f"w{i:03d}" for i in range(220)
]  # synthetic vocabulary; shingles are word-level 3-grams


def embeddings_path(n: int, dim: int = 64) -> str:
    return os.path.join(SCALE_DIR, f"emb_{n}_{dim}.parquet")


def documents_path(n: int) -> str:
    return os.path.join(SCALE_DIR, f"docs_{n}.parquet")


def ensure_embeddings(n: int, dim: int = 64) -> str:
    """n clustered unit-ish vectors: cluster center + noise. Returns
    the parquet path; generation is idempotent."""
    path = embeddings_path(n, dim)
    if os.path.exists(path):
        return path
    os.makedirs(SCALE_DIR, exist_ok=True)
    rng = np.random.default_rng(20_240_100 + n)
    centers = rng.normal(size=(_N_CLUSTERS, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, _N_CLUSTERS, size=n)
    # per-coordinate σ sized so the TOTAL noise norm ≈ 0.5 relative to
    # the unit center (E‖σg‖² = σ²·dim = 0.25): cluster-mates land at
    # cosine ≈ 0.8, like a real encoder's neighborhood structure. A
    # dimension-independent σ would put ‖noise‖ ≈ σ·√dim ≈ 2 and
    # dissolve the clusters entirely (measured: LSH recall 0.02).
    sigma = 0.5 / np.sqrt(dim)
    vecs = centers[labels] + sigma * rng.normal(size=(n, dim))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    pq.write_table(tbl, path + ".tmp", compression="zstd")
    os.replace(path + ".tmp", path)
    return path


def documents_lex_path(n: int) -> str:
    return os.path.join(SCALE_DIR, f"docs_lex_{n}.parquet")


def ensure_documents_lex(n: int, vocab_size: int = 50_000) -> str:
    """n synthetic documents over a ``vocab_size``-term ZIPFIAN
    vocabulary — the lexical-retrieval fixture. ``ensure_documents``'
    220-word vocabulary is right for the shingle/MinHash studies but
    wrong for BM25 probes: with 220 words every query term occurs in
    nearly every document, so term-IN-list scan pruning has nothing
    to skip and candidate sets are corpus-sized. A realistic corpus
    has a heavy-tailed vocabulary orders of magnitude larger than any
    query — Zipf(1.3) over 50k terms reproduces that selectivity
    (most terms are rare; a probe's IN-list prunes hard). Idempotent,
    seeded, vectorized generation (one draw for all tokens)."""
    path = documents_lex_path(n)
    if os.path.exists(path):
        return path
    os.makedirs(SCALE_DIR, exist_ok=True)
    rng = np.random.default_rng(20_240_300 + n)
    lengths = rng.integers(60, 160, size=n)
    total = int(lengths.sum())
    # heavy-tailed ranks via the inverse-CDF of a power law (pmf ∝
    # rank^(1/a - 1); a=4 → ∝ rank^-0.75, Zipf-like head + long
    # tail), clipped to the vocabulary; rank 0 is the most common
    u = rng.random(total)
    ranks = np.minimum(
        (vocab_size * u ** 4.0).astype(np.int64), vocab_size - 1
    )
    words = np.char.add("t", ranks.astype("U7"))
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    texts = [
        " ".join(words[offsets[i]:offsets[i + 1]]) for i in range(n)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array([f"src{i % 5}" for i in range(n)]),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )
    pq.write_table(tbl, path + ".tmp", compression="zstd")
    os.replace(path + ".tmp", path)
    return path


def ensure_documents(n: int, near_dup_frac: float = 0.1) -> str:
    """n synthetic documents of 60–160 words; ``near_dup_frac`` of
    them are near-duplicates of an earlier doc (≈5% of words swapped)
    so MinHash-LSH has true positives to find. Idempotent."""
    path = documents_path(n)
    if os.path.exists(path):
        return path
    os.makedirs(SCALE_DIR, exist_ok=True)
    rng = np.random.default_rng(20_240_200 + n)
    vocab = np.array(_VOCAB)
    lengths = rng.integers(60, 160, size=n)
    texts: list[str] = []
    for i in range(n):
        if i > 0 and rng.random() < near_dup_frac:
            src = int(rng.integers(0, i))
            words = texts[src].split()
            n_swap = max(1, len(words) // 20)
            pos = rng.integers(0, len(words), size=n_swap)
            for p in pos:
                words[int(p)] = str(vocab[int(rng.integers(0, len(vocab)))])
            texts.append(" ".join(words))
        else:
            idx = rng.integers(0, len(vocab), size=int(lengths[i]))
            texts.append(" ".join(vocab[idx]))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array([f"src{i % 5}" for i in range(n)]),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )
    pq.write_table(tbl, path + ".tmp", compression="zstd")
    os.replace(path + ".tmp", path)
    return path
