"""Vectorized deterministic corpus generator for the scaling benchmark.

Same statistical shape as lucene_spark.fixtures.make_pages (seed=42,
Zipf(1.1) over the 5000-stem vocabulary, ~40% stopwords, LogNormal doc
lengths) but generated with whole-corpus numpy ops so 10^5..10^6 docs
are feasible; no external data.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.fixtures import SEED, STOPWORDS_33, VOCAB_SIZE, vocab


def generate(n_docs: int, seed: int = SEED):
    """Returns (urls list[str], texts list[str]) for n_docs rows."""
    rng = np.random.default_rng(seed)
    words = np.array(vocab(), dtype=object)
    stops = np.array(STOPWORDS_33, dtype=object)
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    zipf_p = ranks ** (-1.1)
    zipf_p /= zipf_p.sum()

    lengths = np.clip(
        rng.lognormal(mean=5.0, sigma=1.0, size=n_docs), 8, 2000
    ).astype(np.int64)
    total = int(lengths.sum())
    toks = rng.choice(words, size=total, p=zipf_p)
    sw_mask = rng.random(total) < 0.40
    sw_choice = rng.choice(stops, size=total)
    toks = np.where(sw_mask, sw_choice, toks)
    bounds = np.concatenate(([0], np.cumsum(lengths)))
    texts = [" ".join(toks[bounds[i] : bounds[i + 1]].tolist()) for i in range(n_docs)]
    urls = [f"https://site{i % 100000}.example/p/{i}" for i in range(n_docs)]
    return urls, texts


def write_parquet(path: str, n_docs: int, seed: int = SEED) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    urls, texts = generate(n_docs, seed)
    tbl = pa.table({"url": pa.array(urls, pa.string()), "text": pa.array(texts, pa.string())})
    # many row groups -> Spark can split the single file across tasks
    pq.write_table(tbl, path, row_group_size=max(1024, n_docs // 256))


if __name__ == "__main__":
    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 120_000
    write_parquet(out, n)
    print(f"wrote {n} docs to {out}")
