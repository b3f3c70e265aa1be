"""Spectral refinement of over-merged entity components — the
canonicalization stage named by BASELINE.json's north_star ("LSH graph
-> spectral clustering -> connected-components merge").

Connected components alone is transitively greedy: ONE noisy alias
bridging two distinct entities merges them permanently. This stage
rebuilds the reference's spectral-clustering chain
(`SimKitProcedures.java:739-862`: affinity -> sym Laplacian ->
eigendecomposition -> eigengap k -> k-means) on each suspicious
component's *mention similarity subgraph* and splits it when — and only
when — the spectrum says the component is really k>=2 weakly-coupled
clusters.

Split acceptance is two-gated, so clean alias clusters are never
shattered:

  1. eigengap (descending eigenvalues of D^-1/2 A D^-1/2,
     `EigenCalculation.java:289,305` convention; a dense clique has
     lambda_2 << 1 so the largest gap sits at k=1 -> no split);
  2. normalized cut of the proposed partition (mean_c cut(c)/vol(c)
     <= ncut_max) — a partition that severs real similarity mass is
     rejected even if the eigengap voted to split.

Scale shape: components arrive from the CC merge and are *small*
relative to the corpus (a component is one entity's alias cluster, or a
few entities glued by noise), so each splits densely in numpy inside
one task — the distributed path groups the component-tagged edge list
by component id and runs this kernel under applyInPandas, one task per
oversized component; components above ``max_members`` pass through
unsplit (logged via the returned flag) rather than OOM a task. The
driver-local linking path calls the same kernel directly, so both paths
share identical split semantics.
"""

from __future__ import annotations

import numpy as np

# Components smaller than this are never examined (an entity's alias
# cluster in the reference corpus is ~3-5 surfaces).
DEFAULT_MIN_SIZE = 5
# Accept a split only if the mean normalized cut over the proposed
# sub-clusters is below this (0 = perfectly separable).
DEFAULT_NCUT_MAX = 0.30
DEFAULT_MAX_K = 8


def _kmeans_np(x: np.ndarray, k: int, max_iter: int = 50) -> np.ndarray:
    """Deterministic k-means on rows of x: farthest-first init from row
    0 (callers pass rows in ascending-surface_id order, so the seeding
    is partitioning-independent), argmin assignment with ties to the
    lowest cluster index — the same update rules as operators.kmeans."""
    chosen = [x[0]]
    for _ in range(k - 1):
        d = np.min(
            np.stack([np.linalg.norm(x - c, axis=1) for c in chosen]), axis=0
        )
        chosen.append(x[int(np.argmax(d))])
    cents = np.array(chosen)
    labels = np.zeros(len(x), dtype=int)
    for _ in range(max_iter):
        d = np.stack([np.linalg.norm(x - c, axis=1) for c in cents])
        new_labels = np.argmin(d, axis=0)
        if np.array_equal(new_labels, labels) and _ > 0:
            break
        labels = new_labels
        for c in range(k):
            m = x[labels == c]
            if len(m):
                cents[c] = m.mean(0)
    return labels


def spectral_split(
    ids: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    min_size: int = DEFAULT_MIN_SIZE,
    ncut_max: float = DEFAULT_NCUT_MAX,
    max_k: int = DEFAULT_MAX_K,
) -> np.ndarray:
    """Split one component. ids = member surface_ids (any order); src /
    dst = edge endpoints as surface_ids; weight = similarity in [0, 1].
    Returns per-member sub-cluster labels aligned with ``ids`` (all
    zeros = no split).

    The operator is the normalized affinity S = D^-1/2 A D^-1/2 (the
    "sym Laplacian" the reference eigendecomposes,
    `MatrixCalculation.java` semantics, SURVEY.md §2.5); its top
    eigenvalue is 1 and the count of eigenvalues near 1 equals the
    number of weakly-coupled clusters.
    """
    n = len(ids)
    if n < min_size or len(src) == 0:
        return np.zeros(n, dtype=int)
    order = np.argsort(ids)
    ids_sorted = ids[order]
    pos = {int(i): p for p, i in enumerate(ids_sorted)}
    a = np.zeros((n, n))
    si = np.array([pos[int(s)] for s in src])
    di = np.array([pos[int(d)] for d in dst])
    a[si, di] = weight
    a[di, si] = weight
    deg = a.sum(1)
    with np.errstate(divide="ignore"):
        dis = np.where(deg > 0, 1.0 / np.sqrt(deg), 0.0)
    s = a * dis[:, None] * dis[None, :]
    lam, vec = np.linalg.eigh(s)  # ascending
    top = lam[::-1][: min(max_k, n)]  # descending
    gaps = top[:-1] - top[1:]
    if gaps.size == 0:
        return np.zeros(n, dtype=int)
    k = int(np.argmax(gaps)) + 1
    if k < 2:
        return np.zeros(n, dtype=int)
    # spectral embedding: top-k eigenvectors, row-normalized (the
    # standard NJW step; the reference's k-means runs on the raw
    # eigenmap, experiments_simkit-0.1.2.py:125-134 — row norm only
    # stabilizes the split decision, membership is identical on the
    # well-separated cases both handle)
    x = vec[:, -k:]
    nrm = np.linalg.norm(x, axis=1, keepdims=True)
    x = np.where(nrm > 0, x / nrm, x)
    labels_sorted = _kmeans_np(x, k)
    # reject degenerate partitions (empty cluster)
    if len(np.unique(labels_sorted)) < 2:
        return np.zeros(n, dtype=int)
    # normalized-cut acceptance gate
    ncuts = []
    for c in np.unique(labels_sorted):
        inc = labels_sorted == c
        vol = a[inc].sum()
        if vol <= 0:
            return np.zeros(n, dtype=int)
        cut = a[inc][:, ~inc].sum()
        ncuts.append(cut / vol)
    if float(np.mean(ncuts)) > ncut_max:
        return np.zeros(n, dtype=int)
    # map back to the caller's id order
    out = np.zeros(n, dtype=int)
    out[order] = labels_sorted
    return out


def refine_component_rows(
    ids: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    min_size: int = DEFAULT_MIN_SIZE,
    ncut_max: float = DEFAULT_NCUT_MAX,
    max_k: int = DEFAULT_MAX_K,
    max_members: int = 100_000,
) -> list[tuple[int, int]]:
    """(surface_id, entity_id) assignments for one component after
    refinement; entity_id = min surface_id within the refined
    sub-cluster (the same id rule the unrefined CC merge uses, so
    un-split components keep their ids bit-for-bit)."""
    if len(ids) > max_members:
        ent = int(ids.min())
        return [(int(i), ent) for i in ids]
    labels = spectral_split(ids, src, dst, weight, min_size, ncut_max, max_k)
    out = []
    for c in np.unique(labels):
        members = ids[labels == c]
        ent = int(members.min())
        out.extend((int(i), ent) for i in members)
    return out
