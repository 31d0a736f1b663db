#!/usr/bin/env python
"""Generate an ORGANIC embedding corpus at scale (VERDICT r9 task 2).

The key-shifted replica upscales in gen_scale_data.py are correct for
wall/scan-fraction curves but CANNOT test ANN recall: each query's
jittered copies are its true top-k at cosine ~0.9999, so every index
family saturates >= 0.9 recall at sf1+ (measured in
BENCH_ann_recall_curve.json r8). The IVF-vs-LSH frontier needs a corpus
whose neighbor structure matches the driver's organic sf0.1 data.

Measured sf0.1 geometry this generator reproduces (by construction, not
by copying rows):
  - 64-dim, unit-norm vectors (norm 1.0 +- 0.000);
  - near-isotropic covariance (top/median eigenvalue 1.35 — no dominant
    subspace);
  - WEAK cluster signal: per-label centroid norm ~0.07 against
    within-cluster spread ~1.0;
  - nearest-neighbor cosine ~0.41 (p10 0.37 / p90 0.455) — the
    random-geometry regime where approximate indexes do real work.

Process: n = 2000*k vectors; clusters GROW with the corpus (10*k topics
of ~200 docs each — a bigger crawl has more topics, not bigger ones);
vector = 0.07 * cluster_direction + N(0, I_64), normalized. Everything
is seeded and deterministic. Writes ONLY embeddings.parquet — the ANN
recall bench reads nothing else from a scale dir.

Usage: python scripts/gen_organic_embeddings.py <out_dir> <k>
  e.g.  python scripts/gen_organic_embeddings.py scaledata/sf1_organic 10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_N = 2000  # sf0.1 corpus size
DIM = 64
CLUSTERS_PER_COPY = 10
CENTER_NORM = 0.07


def generate(k: int, seed: int = 1729) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed + k)
    n = BASE_N * k
    n_clusters = CLUSTERS_PER_COPY * k
    centers = rng.standard_normal((n_clusters, DIM))
    centers *= CENTER_NORM / np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, n_clusters, n)
    x = centers[labels] + rng.standard_normal((n, DIM))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32), labels


def main() -> int:
    out_dir, k = sys.argv[1], int(sys.argv[2])
    os.makedirs(out_dir, exist_ok=True)
    x, labels = generate(k)
    n = len(x)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
            "label": pa.array((labels % 10).astype(np.int32)),
        }
    )
    path = os.path.join(out_dir, "embeddings.parquet")
    pq.write_table(table, path)
    nn_sample = x[:200] @ x.T
    np.fill_diagonal(nn_sample[:, :200], -1)
    print(
        f"wrote {n} vectors to {path}; sample NN cosine "
        f"mean={nn_sample.max(axis=1).mean():.3f}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
