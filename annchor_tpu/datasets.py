"""Benchmark datasets (reference annchor/datasets.py:7-183).

Each loader returns {'X', 'y', 'neighbor_graph'} where neighbor_graph
is the exact 100-NN (indices, distances) ground truth.

Unlike the reference, datasets are not vendored: the digit set is
regenerated from sklearn (identical to the reference bundle — same UCI
test split, same 8x8-grid euclidean cost matrix), the graph data from a
seeded random geometric construction, and ground-truth graphs are
computed once with this package's own exact kernels and cached under
ANNCHOR_TPU_CACHE (default: <package>/data).  One binary artifact IS
vendored: data/digits_large_gt.npz, the exact-EMD 100-NN ground truth
for the regenerated digits_large stand-in (~25 min to recompute), with
a hash of the images it was computed from for staleness detection.  When the original
reference data directory is available (env ANNCHOR_TPU_REFDATA), its
string set and precomputed graphs are used directly, which is what the
parity tests/benchmarks do.
"""

from __future__ import annotations

import os

import numpy as np

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def _cache_dir():
    d = os.environ.get("ANNCHOR_TPU_CACHE", os.path.join(_PKG_DIR, "data"))
    os.makedirs(d, exist_ok=True)
    return d


def _refdata_dir():
    d = os.environ.get("ANNCHOR_TPU_REFDATA", "/root/reference/annchor/data")
    return d if os.path.isdir(d) else None


def grid_cost_matrix(h: int = 8, w: int = 8) -> np.ndarray:
    """Euclidean ground metric between pixel positions of an h x w
    image grid — the Wasserstein cost matrix for the digit sets."""
    xy = np.stack(
        np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), -1
    ).reshape(h * w, 2)
    return np.linalg.norm(
        xy[:, None, :] - xy[None, :, :], axis=-1
    ).astype(np.float64)


def _digest(X: np.ndarray) -> str:
    """Stable content hash of a float array (staleness check for
    cached ground truth keyed to regenerated data)."""
    import hashlib

    return hashlib.sha256(
        np.ascontiguousarray(X, dtype=np.float64).tobytes()
    ).hexdigest()


def _knn_from_dense(D: np.ndarray, k: int = 100):
    idx = np.argsort(D, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(D, idx, axis=1)


def exact_levenshtein_graph(strings, k: int = 100) -> tuple:
    """Exact k-NN graph under edit distance (oracle: the
    python-Levenshtein C extension when present, else the native C++
    DP).  Used to (re)generate ground truth for the string sets."""
    n = len(strings)
    iu = np.triu_indices(n, k=1)
    try:
        import Levenshtein as lev

        dists = np.fromiter(
            (lev.distance(strings[i], strings[j]) for i, j in zip(*iu)),
            dtype=np.float64,
            count=len(iu[0]),
        )
    except ImportError:
        from annchor_tpu import native
        from annchor_tpu.ops.levenshtein import encode_strings

        codes, lengths = encode_strings(list(strings))
        dists = native.lev_batch(codes, lengths, iu[0], iu[1]).astype(
            np.float64
        )
    D = np.zeros((n, n))
    D[iu] = dists
    D += D.T
    return _knn_from_dense(D, k)


def make_strings(
    n: int = 1600,
    n_clusters: int = 8,
    length: int = 500,
    mutation_rate: float = 0.25,
    alphabet: str = "ACGT",
    seed: int = 42,
    evolve: bool = False,
):
    """Synthetic clustered string set with the reference set's shape
    (1600 strings, ~500 chars, 8 clusters): random seed strings per
    cluster, members derived by substitutions/indels.

    evolve=False (default) mutates every member directly from the
    cluster seed — a star topology where all intra-cluster distances
    concentrate in one tight band.  evolve=True grows each cluster as
    a mutation *tree* (each new member mutates a uniformly chosen
    existing member by `mutation_rate`), which yields the graded
    phylogenetic distance structure of real string corpora: a point's
    true nearest neighbours are its parent/children/siblings, at a
    fraction of the cluster diameter.  Star clusters make large-n
    k-NN benchmarks degenerate (ranking inside the flat band needs
    near-exhaustive evaluation); trees are the realistic regime."""
    rng = np.random.default_rng(seed)
    chars = np.array(list(alphabet))
    X, y = [], []
    # distribute the remainder so exactly n strings come back
    sizes = np.full(n_clusters, n // n_clusters)
    sizes[: n % n_clusters] += 1

    def mutate(parent):
        s = parent.copy()
        nmut = rng.binomial(len(s), mutation_rate)
        pos = rng.integers(0, len(s), size=nmut)
        s[pos] = rng.choice(chars, size=nmut)
        ndel = rng.binomial(len(s), mutation_rate / 5)
        if ndel:
            keep = np.ones(len(s), dtype=bool)
            keep[rng.integers(0, len(s), size=ndel)] = False
            s = s[keep]
        return s

    for c in range(n_clusters):
        seed_len = int(length * rng.uniform(0.85, 1.15))
        seed_str = rng.choice(chars, size=seed_len)
        if evolve:
            members = [mutate(seed_str)]
            for _ in range(int(sizes[c]) - 1):
                parent = members[rng.integers(0, len(members))]
                members.append(mutate(parent))
        else:
            members = [mutate(seed_str) for _ in range(int(sizes[c]))]
        for s in members:
            X.append("".join(s))
            y.append(c)
    return np.array(X), np.array(y)


def load_strings(k: int = 100):
    """The 1600-string Levenshtein benchmark set.

    Strings come from the reference data directory when mounted
    (edit_data.npz; the reference's strings_data.npz ground truth is a
    missing LFS blob, so the 100-NN graph is regenerated here with an
    exact oracle and cached), otherwise a synthetic set with the same
    shape is generated.
    """
    ref = _refdata_dir()
    if ref is not None and os.path.exists(os.path.join(ref, "edit_data.npz")):
        data = np.load(os.path.join(ref, "edit_data.npz"), allow_pickle=True)
        X, y = data["x"], data["y"]
        cache = os.path.join(_cache_dir(), "strings_gt_ref.npz")
    else:
        X, y = make_strings()
        cache = os.path.join(_cache_dir(), "strings_gt_synth.npz")

    if os.path.exists(cache):
        g = np.load(cache)
        ng = (g["ngi"], g["ngd"])
    else:
        ng = exact_levenshtein_graph(list(X), k=k)
        np.savez_compressed(cache, ngi=ng[0], ngd=ng[1])
    return {"X": X, "y": y, "neighbor_graph": ng}


def load_digits():
    """UCI OCR digits test set (1797 8x8 images) with the exact
    Wasserstein 100-NN ground truth and the grid cost matrix."""
    from sklearn.datasets import load_digits as _skl

    skl = _skl()
    X = skl.data.astype(np.float64)
    y = skl.target.astype(np.int64)
    M = grid_cost_matrix()

    ref = _refdata_dir()
    cache = os.path.join(_cache_dir(), "digits_gt.npz")
    if ref is not None and os.path.exists(
        os.path.join(ref, "digits_data.npz")
    ):
        d = np.load(os.path.join(ref, "digits_data.npz"))
        ng = (d["neighbor_graph"][0], d["neighbor_graph"][1])
    elif os.path.exists(cache):
        g = np.load(cache)
        ng = (g["ngi"], g["ngd"])
    else:  # exact regeneration with the native EMD solver (slow: ~30min)
        from annchor_tpu import native

        n = X.shape[0]
        iu = np.triu_indices(n, k=1)
        dists = native.emd_batch(X, X, M, iu[0], iu[1])
        D = np.zeros((n, n))
        D[iu] = dists
        D += D.T
        ng = _knn_from_dense(D, 100)
        np.savez_compressed(cache, ngi=ng[0], ngd=ng[1])
    return {"X": X, "y": y, "neighbor_graph": ng, "cost_matrix": M}


def make_digits_large(n: int = 5620, seed: int = 0):
    """Deterministic stand-in for the full UCI OCR digits set
    (reference datasets.py:49-119: 5620 8x8 images = 3823 train +
    1797 test).  Only the 1797-image test split is redistributable
    (sklearn); the extra images are label-preserving augmentations of
    it — sub-pixel shifts and small rotations resampled bilinearly on
    the 8x8 grid, re-quantised to the 0..16 intensity range — so the
    histogram structure the Wasserstein workload exercises (mass
    ~200-300, grid support, per-class modes) matches the original
    set's.  Seeded and fully reproducible."""
    from scipy.ndimage import map_coordinates
    from sklearn.datasets import load_digits as _skl

    skl = _skl()
    base = skl.data.astype(np.float64).reshape(-1, 8, 8)
    yb = skl.target.astype(np.int64)
    nb = base.shape[0]
    if n <= nb:
        return skl.data[:n].astype(np.float64), yb[:n]

    rng = np.random.default_rng(seed)
    extra = n - nb
    src = rng.integers(0, nb, size=extra)
    theta = rng.uniform(-0.15, 0.15, size=extra)  # ~±8.6 degrees
    dx = rng.uniform(-0.7, 0.7, size=extra)
    dy = rng.uniform(-0.7, 0.7, size=extra)
    gy, gx = np.mgrid[0:8, 0:8].astype(np.float64)
    cy = cx = 3.5
    out = np.empty((extra, 8, 8))
    for t in range(extra):
        c, s = np.cos(theta[t]), np.sin(theta[t])
        # inverse map: output pixel -> source coordinate
        sy = cy + c * (gy - cy) + s * (gx - cx) - dy[t]
        sx = cx - s * (gy - cy) + c * (gx - cx) - dx[t]
        out[t] = map_coordinates(
            base[src[t]], [sy, sx], order=1, mode="constant"
        )
    out = np.clip(np.rint(out), 0, 16)
    X = np.concatenate([base.reshape(nb, 64), out.reshape(extra, 64)])
    y = np.concatenate([yb, yb[src]])
    return X, y


def load_digits_large(k: int = 100):
    """Full-scale digits workload (5620 8x8 images) with exact
    Wasserstein 100-NN ground truth (reference datasets.py:49-119).

    The reference bundles the real train+test UCI set as a git-LFS
    blob; when that blob is reachable it is used verbatim.  Otherwise
    the set is regenerated at the same scale by ``make_digits_large``
    (augmented test split — documented stand-in, not the original
    images) and the ground truth is computed once with the native
    exact-EMD solver and cached under ANNCHOR_TPU_CACHE (~25 min on
    first call)."""
    ref = _refdata_dir()
    path = ref and os.path.join(ref, "digits_data_large.npz")
    M = grid_cost_matrix()
    if path and os.path.exists(path):
        d = np.load(path)
        return {
            "X": d["X"],
            "y": d["y"],
            "neighbor_graph": (
                d["neighbor_graph"][0][:, :k],
                d["neighbor_graph"][1][:, :k],
            ),
            "cost_matrix": M,
        }
    X, y = make_digits_large()
    xh = _digest(X)
    cache = os.path.join(_cache_dir(), "digits_large_gt.npz")
    stale = False
    if os.path.exists(cache):
        g = np.load(cache)
        # numpy does not guarantee Generator bit-stream stability across
        # versions: verify the cached GT still matches the regenerated
        # images, else silently-wrong benchmark error counts would follow
        stale = "xhash" not in g or str(g["xhash"]) != xh
        if not stale:
            ng = (g["ngi"][:, :k], g["ngd"][:, :k])
    if stale or not os.path.exists(cache):
        print(
            "load_digits_large: reference LFS blob unavailable; "
            "regenerating a synthetic 5620-image stand-in and its "
            "exact-EMD ground truth (one-off, ~25 min)..."
            + (" [cached GT was stale: image hash mismatch]" if stale else "")
        )
        from annchor_tpu import native

        n = X.shape[0]
        iu = np.triu_indices(n, k=1)
        dists = native.emd_batch(X, X, M, iu[0], iu[1])
        D = np.zeros((n, n))
        D[iu] = dists
        D += D.T
        ng = _knn_from_dense(D, 100)
        np.savez_compressed(cache, ngi=ng[0], ngd=ng[1], xhash=xh)
        ng = (ng[0][:, :k], ng[1][:, :k])
    return {"X": X, "y": y, "neighbor_graph": ng, "cost_matrix": M}


def make_graph(
    n_vertices: int = 800,
    n_clusters: int = 10,
    p_intra: float = 0.05,
    p_inter: float = 0.002,
    seed: int = 42,
):
    """Seeded random clustered weighted graph with the reference
    graph_sp set's shape (800 vertices, ~4700 edges, 10 clusters)."""
    rng = np.random.default_rng(seed)
    y = np.repeat(np.arange(n_clusters), n_vertices // n_clusters)
    rows, cols, weights = [], [], []
    for i in range(n_vertices):
        same = y == y[i]
        p = np.where(same, p_intra, p_inter)
        p[: i + 1] = 0
        edges = np.nonzero(rng.random(n_vertices) < p)[0]
        for j in edges:
            rows.append(i)
            cols.append(j)
            weights.append(
                rng.uniform(0.1, 1.0)
                if y[i] == y[j]
                else rng.uniform(1.0, 3.0)
            )
    edges = np.stack([rows, cols], axis=1).astype(np.int64)
    return edges, np.array(weights), y


def _sp_ground_truth(n, edges, weights, k=100):
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import dijkstra

    A = coo_matrix(
        (
            np.concatenate([weights, weights]),
            (
                np.concatenate([edges[:, 0], edges[:, 1]]),
                np.concatenate([edges[:, 1], edges[:, 0]]),
            ),
        ),
        shape=(n, n),
    ).tocsr()
    D = dijkstra(A, directed=False)
    return _knn_from_dense(D, k), A


def load_graph_sp(k: int = 100):
    """Weighted-graph shortest-path set: X are vertex indices, the
    metric is dijkstra distance on the bundled graph (reference
    datasets.py:122-183).  Returns a networkx graph 'G' plus a fast
    scipy CSR adjacency 'A' and a metric closure 'sp_dist'."""
    ref = _refdata_dir()
    if ref is not None and os.path.exists(os.path.join(ref, "graph.npz")):
        gdata = np.load(os.path.join(ref, "graph.npz"))
        edges, weights = gdata["edges"], gdata["weights"]
        sdata = np.load(os.path.join(ref, "graph_sp_data.npz"))
        X, y = sdata["X"], sdata["y"]
        ng = (sdata["neighbor_graph"][0], sdata["neighbor_graph"][1])
        n = len(X)
        _, A = _sp_ground_truth(n, edges, weights, k)
    else:
        edges, weights, y = make_graph()
        n = len(y)
        X = np.arange(n)
        ng, A = _sp_ground_truth(n, edges, weights, k)

    try:
        import networkx as nkx

        edge_list = [
            "%d %d %s" % (i, j, w)
            for (i, j), w in zip(edges, weights)
        ]
        G = nkx.readwrite.edgelist.parse_edgelist(
            edge_list, nodetype=int, data=(("w", float),)
        )
    except ImportError:
        G = None

    return {
        "X": X,
        "y": y,
        "neighbor_graph": ng,
        "G": G,
        "A": A,
        "edges": edges,
        "weights": weights,
    }
