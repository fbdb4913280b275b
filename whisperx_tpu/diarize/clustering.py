"""Agglomerative speaker clustering over embedding vectors.

Host-side (tiny data: one embedding per ~2 s window), numpy-only —
replaces the clustering stage inside pyannote's diarization pipeline with
average-linkage cosine AHC supporting num/min/max speaker constraints.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def cosine_distance_matrix(x: np.ndarray) -> np.ndarray:
    normed = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-9)
    return 1.0 - normed @ normed.T


def agglomerative_cluster(
    embeddings: np.ndarray,
    *,
    num_clusters: Optional[int] = None,
    min_clusters: int = 1,
    max_clusters: Optional[int] = None,
    threshold: float = 0.35,
) -> np.ndarray:
    """Average-linkage AHC on cosine distance. Returns labels [N].

    Stops at ``num_clusters`` if given; otherwise merges while the closest
    pair is under ``threshold``, clamped to [min_clusters, max_clusters].
    """
    n = len(embeddings)
    if n == 0:
        return np.zeros(0, np.int32)
    if n == 1:
        return np.zeros(1, np.int32)

    dist = cosine_distance_matrix(embeddings)
    np.fill_diagonal(dist, np.inf)
    clusters = {i: [i] for i in range(n)}
    # cluster-level distance matrix (average linkage), updated in place
    cd = dist.copy()
    active = set(range(n))

    def target_reached() -> bool:
        k = len(active)
        if num_clusters is not None:
            return k <= num_clusters
        if k <= min_clusters:
            return True
        return False

    while len(active) > 1 and not target_reached():
        ids = sorted(active)
        sub = cd[np.ix_(ids, ids)]
        i_loc, j_loc = np.unravel_index(np.argmin(sub), sub.shape)
        best = sub[i_loc, j_loc]
        a, b = ids[i_loc], ids[j_loc]
        must_merge = (
            (num_clusters is not None and len(active) > num_clusters)
            or (max_clusters is not None and len(active) > max_clusters)
        )
        if not must_merge and best > threshold:
            break
        # merge b into a (average linkage over member pairs)
        clusters[a].extend(clusters[b])
        active.discard(b)
        for c in active:
            if c == a:
                continue
            pair = dist[np.ix_(clusters[a], clusters[c])]
            cd[a, c] = cd[c, a] = pair.mean()
        cd[b, :] = cd[:, b] = np.inf

    labels = np.zeros(n, np.int32)
    for new_id, cid in enumerate(sorted(active)):
        labels[clusters[cid]] = new_id
    return labels
