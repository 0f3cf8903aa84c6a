"""numpy replication of the LSH family for table-ladder design (round 12).

Measures, at scaleprobe's x50 embedding corpus shape (100k gaussian
dim-64 vectors, ~3% planted near-dups), the two quantities the
OR-construction trade is about:

- **planted-pair recall**: fraction of a 30-pair planted-near-dup
  sample whose two vectors share a bucket in >=1 table (exactly q38's
  candidate-generation event);
- **candidate volume** = sum over tables of Sigma occ^2 per bucket
  (the number of per-table join pairs), against the uniform ideal
  T * N^2 / 2^p.

Configs compared: the round-11 shape (2 tables x auto planes) vs the
ladder's coupled trades (each table-doubling adds one plane, so the
uniform-ideal volume T * N^2 / 2^p is INVARIANT across rows — the
trade buys recall with bucket-computation CPU, not candidate pairs).

Run:  python -m eventsgateway_spark.tools.lsh_ladder_probe [--n 100000]
"""

from __future__ import annotations

import argparse
import json
import random

import numpy as np

from eventsgateway_spark.functions.vectors import _LSH_P, _plane_coeffs

DIM = 64
NEAR_DUP_PCT = 0.03
SEED = 11  # scaleprobe.gen_embeddings's seed — same corpus law


def gen_vectors(n: int, seed: int = SEED):
    """REPLICATES scaleprobe.gen_embeddings' corpus law (same seed,
    same RNG-consumption order, same constants — keep the two in sync
    when the law changes; gen_embeddings needs pyarrow+disk while this
    probe wants an in-memory matrix, hence the copy), returning
    (matrix, planted_pairs). Values go through float32 exactly as the
    parquet storage does, so projections match what q38 actually
    reads (a float64 probe can flip the sign of near-zero
    projections relative to the real input)."""
    rng = random.Random(seed)
    vecs: list[list[float]] = []
    planted: list[tuple[int, int]] = []
    for i in range(n):
        if i > 0 and rng.random() < NEAR_DUP_PCT:
            j = rng.randrange(i)
            base = vecs[j]
            vecs.append([x + rng.gauss(0, 0.01) for x in base])
            planted.append((j, i))
        else:
            vecs.append([rng.gauss(0, 1) for _ in range(DIM)])
    m = np.array(vecs, dtype=np.float32).astype(np.float64)
    return m, planted


def plane_matrix(j0: int, j1: int, dim: int = DIM) -> np.ndarray:
    """Weights of planes j0..j1-1 as a (j1-j0) x dim matrix — literal
    replication of functions.vectors.hyperplane_weight (d is 1-based,
    the formula uses d+1)."""
    d1 = np.arange(2, dim + 2, dtype=np.int64)  # (d+1) for d = 1..dim
    rows = []
    for j in range(j0, j1):
        c1, c2 = _plane_coeffs(j)
        rows.append((c1 * d1 + c2 * d1 * d1) % _LSH_P - 510)
    return np.array(rows, dtype=np.float64)


def buckets(X: np.ndarray, n_planes: int, table_id: int) -> np.ndarray:
    W = plane_matrix(table_id * n_planes, (table_id + 1) * n_planes)
    bits = (X @ W.T) >= 0  # N x planes
    return bits @ (1 << np.arange(n_planes, dtype=np.int64))


BANDS = (0.80, 0.90, 0.95, 0.99)
BAND_PAIRS = 30


def banded_pairs(X: np.ndarray, seed: int = 99):
    """Append BAND_PAIRS planted near-dups per similarity band to the
    corpus: for target cosine c, perturb with per-coordinate sigma =
    sqrt(1/c^2 - 1) (unit-variance coords => E[cos] = 1/sqrt(1+s^2)).
    Returns (X_extended, {band: [(i, j), ...]})."""
    rng = np.random.default_rng(seed)
    n = len(X)
    rows, pairs = [], {}
    nxt = n
    for c in BANDS:
        sigma = float(np.sqrt(1.0 / (c * c) - 1.0))
        idxs = rng.choice(n, size=BAND_PAIRS, replace=False)
        pairs[c] = []
        for i in idxs:
            rows.append(X[i] + rng.normal(0, sigma, size=X.shape[1]))
            pairs[c].append((int(i), nxt))
            nxt += 1
    ext = np.array(rows, dtype=np.float32).astype(np.float64)  # parquet law
    return np.vstack([X, ext]), pairs


def probe_config(X: np.ndarray, planted, band_map, n_tables: int,
                 n_planes: int, sample: int = 30) -> dict:
    n = len(X)
    rng = random.Random(99)
    pairs = rng.sample(planted, min(sample, len(planted)))
    hit = np.zeros(len(pairs), dtype=bool)
    band_hit = {c: np.zeros(len(ps), dtype=bool) for c, ps in band_map.items()}
    occ_sq_total = 0
    max_over_mean = []
    for t in range(n_tables):
        b = buckets(X, n_planes, t)
        _, counts = np.unique(b, return_counts=True)
        occ_sq_total += int((counts.astype(np.int64) ** 2).sum())
        max_over_mean.append(round(float(counts.max() / counts.mean()), 1))
        for idx, (i, j) in enumerate(pairs):
            if b[i] == b[j]:
                hit[idx] = True
        for c, ps in band_map.items():
            for idx, (i, j) in enumerate(ps):
                if b[i] == b[j]:
                    band_hit[c][idx] = True
    ideal = n_tables * n * n / (1 << n_planes)
    return {
        "tables": n_tables,
        "planes": n_planes,
        "recall": f"{int(hit.sum())}/{len(pairs)}",
        "band_recall": {
            f"cos{c}": f"{int(h.sum())}/{len(h)}" for c, h in band_hit.items()
        },
        "occ_sq": occ_sq_total,
        "ideal": int(ideal),
        "vs_ideal": round(occ_sq_total / ideal, 2),
        "max_over_mean": max_over_mean,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--configs", default="2x11,4x12,8x13",
                    help="comma list of TABLESxPLANES")
    args = ap.parse_args()
    X, planted = gen_vectors(args.n)
    X, band_map = banded_pairs(X)
    print(f"n={args.n} planted_pairs={len(planted)}", flush=True)
    report = {}
    for cfg in args.configs.split(","):
        t, p = (int(v) for v in cfg.split("x"))
        row = probe_config(X, planted, band_map, t, p)
        report[cfg] = row
        print(f"{cfg}: {row}", flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
