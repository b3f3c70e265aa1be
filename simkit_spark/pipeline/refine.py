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


# Components up to this many members use the dense eigh path; larger
# ones use sparse edge-list orthogonal iteration (eigh is O(n^3) —
# a 20k-member noise-glued component would take hours dense and runs
# in seconds sparse).
DENSE_LIMIT = 2000


def _topk_eigen_sparse(
    si: np.ndarray,
    di: np.ndarray,
    w_norm: np.ndarray,
    n: int,
    k: int,
    sweeps: int = 80,
    seed: int = 7,
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k (signed-largest) eigenpairs of the symmetric normalized
    affinity given as an edge list — orthogonal iteration with an
    edge-list matvec (np.add.at, O(E) per sweep) and a +1 diagonal
    shift (S has spectrum in [-1, 1], so S + I is PSD and dominant
    eigenpairs are the signed-largest of S). Returns (eigenvalues
    descending, X[n, k])."""
    rng = np.random.RandomState(seed)
    v = rng.randn(n, k)
    for _ in range(sweeps):
        y = v.copy()  # shift: (S + I) @ v
        np.add.at(y, si, w_norm[:, None] * v[di])
        np.add.at(y, di, w_norm[:, None] * v[si])
        v, _ = np.linalg.qr(y)
    y = v.copy()
    np.add.at(y, si, w_norm[:, None] * v[di])
    np.add.at(y, di, w_norm[:, None] * v[si])
    b = v.T @ y
    b = (b + b.T) / 2.0
    lam, rot = np.linalg.eigh(b)  # ascending of S + I
    x = v @ rot
    return (lam - 1.0)[::-1], x[:, ::-1]  # descending of S


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
    number of weakly-coupled clusters. Dense eigh up to DENSE_LIMIT
    members, sparse edge-list orthogonal iteration beyond.
    """
    n = len(ids)
    if n < min_size or len(src) == 0:
        return np.zeros(n, dtype=int)
    order = np.argsort(ids)
    ids_sorted = ids[order]
    pos = {int(i): p for p, i in enumerate(ids_sorted)}
    si = np.array([pos[int(s)] for s in src])
    di = np.array([pos[int(d)] for d in dst])
    w = np.asarray(weight, dtype=np.float64)
    deg = np.zeros(n)
    np.add.at(deg, si, w)
    np.add.at(deg, di, w)
    with np.errstate(divide="ignore"):
        dis = np.where(deg > 0, 1.0 / np.sqrt(deg), 0.0)
    w_norm = w * dis[si] * dis[di]
    kk = min(max_k, n)
    if n <= DENSE_LIMIT:
        a = np.zeros((n, n))
        a[si, di] = w_norm
        a[di, si] = w_norm
        lam, vec = np.linalg.eigh(a)  # ascending
        top = lam[::-1][:kk]
        x_all = vec[:, ::-1][:, :kk]
    else:
        top, x_all = _topk_eigen_sparse(si, di, w_norm, n, kk)
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
    x = x_all[:, :k]
    nrm = np.linalg.norm(x, axis=1, keepdims=True)
    x = np.where(nrm > 0, x / nrm, x)
    labels_sorted = _kmeans_np(x, k)
    # reject degenerate partitions (empty cluster)
    if len(np.unique(labels_sorted)) < 2:
        return np.zeros(n, dtype=int)
    # normalized-cut acceptance gate (edge-list form: cut = weight
    # crossing the partition, vol = degree mass of the cluster)
    ncuts = []
    crossing = labels_sorted[si] != labels_sorted[di]
    for c in np.unique(labels_sorted):
        inc = labels_sorted == c
        vol = deg[inc].sum()
        if vol <= 0:
            return np.zeros(n, dtype=int)
        cut = w[crossing & (inc[si] | inc[di])].sum()
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
    max_members: int = 2_000_000,
    max_depth: int = 16,
) -> list[tuple[int, int]]:
    """(surface_id, entity_id) assignments for one component after
    RECURSIVE refinement; entity_id = min surface_id within the final
    sub-cluster (the same id rule the unrefined CC merge uses, so
    un-split components keep their ids bit-for-bit).

    Recursion is essential at scale: one eigengap split carves at most
    ``max_k`` pieces, but a noise-glued component can contain THOUSANDS
    of entities — each accepted split's sub-clusters are re-examined
    (with their induced edge subsets) until the eigengap/ncut gates
    stop splitting or ``max_depth`` is reached. Total work is
    O(E * depth) via the sparse path, so even a corpus-sized blob
    terminates."""
    if len(ids) > max_members:
        ent = int(ids.min())
        return [(int(i), ent) for i in ids]
    src = np.asarray(src)
    dst = np.asarray(dst)
    weight = np.asarray(weight, dtype=np.float64)
    out: list[tuple[int, int]] = []
    stack = [(ids, src, dst, weight, 0)]
    while stack:
        cids, cs, cd, cw, depth = stack.pop()
        labels = (
            spectral_split(cids, cs, cd, cw, min_size, ncut_max, max_k)
            if depth < max_depth
            else np.zeros(len(cids), dtype=int)
        )
        uniq = np.unique(labels)
        if len(uniq) < 2:
            ent = int(cids.min())
            out.extend((int(i), ent) for i in cids)
            continue
        lab_of = {int(i): int(l) for i, l in zip(cids, labels)}
        es_lab = np.array([lab_of[int(s)] for s in cs])
        ed_lab = np.array([lab_of[int(d)] for d in cd])
        for c in uniq:
            members = cids[labels == c]
            keep = (es_lab == c) & (ed_lab == c)
            stack.append((members, cs[keep], cd[keep], cw[keep], depth + 1))
    return out
