"""Metric resolution and batched pairwise evaluation.

This is the TPU re-design of the reference's L2 "metric-evaluation /
parallelisation backend" (reference annchor/utils.py:62-271).  The
reference fans scalar metric calls out over joblib worker processes or
numba thread teams; here every built-in metric has a *batched engine*
that evaluates whole pair blocks on the TPU (or, for the inherently
sequential exact optimal transport, in native C++ on the host), and
arbitrary user Python metrics fall back to a host loop — preserving the
reference's `get_exact_ijs(f, X, IJ)` plug-in contract
(reference annchor/annchor.py:77-82, doc/parallelisation.rst:14-32).
"""

from __future__ import annotations

import numpy as np

from annchor_tpu.ops import levenshtein as _lev_ops

__all__ = [
    "Metric",
    "get_function_from_input",
    "make_get_exact_ijs",
    "make_get_exact_query_ijs",
    "test_parallelisation",
]


class Metric:
    """A metric plus (optionally) a batched pairwise engine.

    scalar: f(x, y) -> float, the user-visible metric
    batch:  optional fn(X, Z, IJ) -> float64 (m,) evaluating
            [f(X[i], Z[j]) for i, j in IJ] as one batch.  Z is X for
            in-sample pairs.  Engines may cache per-dataset encodings.
    is_metric: whether the triangle inequality is trusted
        (reference annchor.py:73-76).
    """

    def __init__(self, scalar, batch=None, name="custom", is_metric=True):
        self.scalar = scalar
        self.batch = batch
        self.name = name
        self.is_metric = is_metric

    def __call__(self, x, y):
        return self.scalar(x, y)


# ---------------------------------------------------------------------------
# built-in metrics


def _euclidean_scalar(x, y):
    return float(np.linalg.norm(np.asarray(x) - np.asarray(y)))


def _cosine_scalar(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    nx = np.linalg.norm(x)
    ny = np.linalg.norm(y)
    if nx == 0 or ny == 0:
        return 0.0
    return float(1.0 - np.dot(x, y) / (nx * ny))


class _DenseBatchEngine:
    """Batched vector-metric engine (euclidean / cosine / sqeuclidean).

    Gathers pair rows on device and reduces — replaces the reference's
    numba prange loop (utils.py:144-150).
    """

    def __init__(self, kind: str, chunk: int = 1 << 20):
        self.kind = kind
        self.chunk = chunk
        self._jit = None

    def _kernel(self):
        if self._jit is None:
            import jax
            import jax.numpy as jnp

            kind = self.kind

            @jax.jit
            def kern(X, Z, I, J):
                a = jnp.take(X, I, axis=0)
                b = jnp.take(Z, J, axis=0)
                if kind == "euclidean":
                    return jnp.sqrt(jnp.sum((a - b) ** 2, axis=1))
                if kind == "sqeuclidean":
                    return jnp.sum((a - b) ** 2, axis=1)
                if kind == "cosine":
                    num = jnp.sum(a * b, axis=1)
                    den = jnp.linalg.norm(a, axis=1) * jnp.linalg.norm(
                        b, axis=1
                    )
                    return 1.0 - num / jnp.maximum(den, 1e-30)
                raise ValueError(kind)

            self._jit = kern
        return self._jit

    def __call__(self, X, Z, IJ):
        import jax.numpy as jnp

        IJ = np.asarray(IJ, dtype=np.int64)
        if IJ.shape[0] == 0:
            return np.zeros(0, dtype=np.float64)
        Xd = jnp.asarray(np.asarray(X), dtype=jnp.float32)
        Zd = Xd if Z is X else jnp.asarray(np.asarray(Z), dtype=jnp.float32)
        kern = self._kernel()
        outs = []
        for s in range(0, IJ.shape[0], self.chunk):
            blk = IJ[s : s + self.chunk]
            outs.append(
                np.asarray(
                    kern(Xd, Zd, jnp.asarray(blk[:, 0]), jnp.asarray(blk[:, 1]))
                )
            )
        return np.concatenate(outs).astype(np.float64)


class _LevenshteinEngine:
    """Batched TPU edit distance with per-dataset encoding cache."""

    def __init__(self, block_size: int = 8192):
        self.block_size = block_size
        self._cache = {}

    def _encode(self, X):
        key = id(X)
        enc = self._cache.get(key)
        if enc is None:
            seq = list(X)
            if len(seq) and not isinstance(seq[0], str):
                enc = _lev_ops.encode_sequences(seq)
            else:
                enc = _lev_ops.encode_strings(seq)
            self._cache = {key: enc}  # hold one dataset at a time
        return enc

    def __call__(self, X, Z, IJ):
        IJ = np.asarray(IJ, dtype=np.int64)
        if IJ.shape[0] == 0:
            return np.zeros(0, dtype=np.float64)
        if Z is X:
            codes, lengths = self._encode(X)
            d = _lev_ops.levenshtein_pairs(
                codes, lengths, IJ[:, 0], IJ[:, 1], self.block_size
            )
            return d.astype(np.float64)
        # query path: concatenate X and Z into one encoding space
        seq = list(X) + list(Z)
        if len(seq) and not isinstance(seq[0], str):
            codes, lengths = _lev_ops.encode_sequences(seq)
        else:
            codes, lengths = _lev_ops.encode_strings(seq)
        d = _lev_ops.levenshtein_pairs(
            codes, lengths, IJ[:, 0], IJ[:, 1] + len(X), self.block_size
        )
        return d.astype(np.float64)


class _EMDEngine:
    """Exact 1-Wasserstein via the native C++ solver (host).

    Network-simplex-style pivoting is inherently sequential, so exact
    EMD stays host-side (as in the reference, where pynndescent's
    numba kantorovich runs on CPU, utils.py:82-86).  The TPU-friendly
    approximation is the 'wasserstein_sinkhorn' metric.
    """

    def __init__(self, cost_matrix):
        self.cost_matrix = np.ascontiguousarray(cost_matrix, np.float64)

    def __call__(self, X, Z, IJ):
        from annchor_tpu import native

        IJ = np.asarray(IJ, dtype=np.int64)
        if IJ.shape[0] == 0:
            return np.zeros(0, dtype=np.float64)
        X = np.ascontiguousarray(X, dtype=np.float64)
        Zc = X if Z is X else np.ascontiguousarray(Z, dtype=np.float64)
        return native.emd_batch(X, Zc, self.cost_matrix, IJ[:, 0], IJ[:, 1])


def _make_emd_scalar(cost_matrix):
    M = np.ascontiguousarray(cost_matrix, np.float64)

    def wasserstein(x, y):
        from annchor_tpu import native

        return native.emd_single(
            np.asarray(x, np.float64), np.asarray(y, np.float64), M
        )

    return wasserstein


def _make_sinkhorn(cost_matrix, **kw):
    from annchor_tpu.ops.wasserstein import SinkhornEngine

    eng = SinkhornEngine(cost_matrix, **kw)

    def scalar(x, y):
        return float(
            eng(
                np.asarray(x)[None, :],
                np.asarray(y)[None, :],
                np.array([[0, 0]]),
            )[0]
        )

    return scalar, eng


def get_function_from_input(func, func_kwargs=None):
    """Resolve a metric spec to a Metric (reference utils.py:62-107).

    Accepts: a Metric; a string in {euclidean, sqeuclidean, cosine,
    levenshtein, wasserstein, wasserstein_sinkhorn}; or any callable
    f(x, y) (optionally with kwargs bound).
    """
    if isinstance(func, Metric):
        return func

    if isinstance(func, str):
        kw = dict(func_kwargs or {})
        if func in ("euclidean", "sqeuclidean", "cosine"):
            scalar = {
                "euclidean": _euclidean_scalar,
                "sqeuclidean": lambda x, y: float(
                    np.sum((np.asarray(x) - np.asarray(y)) ** 2)
                ),
                "cosine": _cosine_scalar,
            }[func]
            return Metric(scalar, _DenseBatchEngine(func), name=func)
        if func == "levenshtein":
            return Metric(
                lambda x, y: float(_lev_ops.levenshtein_scalar(x, y)),
                _LevenshteinEngine(**kw),
                name="levenshtein",
            )
        if func == "wasserstein":
            assert func_kwargs and "cost_matrix" in func_kwargs, (
                "Error: wasserstein metric requires cost_matrix kwarg"
            )
            M = func_kwargs["cost_matrix"]
            return Metric(
                _make_emd_scalar(M), _EMDEngine(M), name="wasserstein"
            )
        if func == "wasserstein_sinkhorn":
            assert func_kwargs and "cost_matrix" in func_kwargs, (
                "Error: wasserstein_sinkhorn metric requires cost_matrix"
            )
            kw.pop("cost_matrix")
            scalar, eng = _make_sinkhorn(func_kwargs["cost_matrix"], **kw)
            # entropic regularisation can violate the triangle inequality
            return Metric(
                scalar, eng, name="wasserstein_sinkhorn", is_metric=False
            )
        raise AssertionError(
            "Error: The string must be one of "
            "{euclidean, sqeuclidean, cosine, levenshtein, wasserstein, "
            "wasserstein_sinkhorn}"
        )

    # arbitrary callable, with optional kwargs binding
    if func_kwargs is None:
        return Metric(func)

    def bound(x, y):
        return func(x, y, **func_kwargs)

    return Metric(bound)


# ---------------------------------------------------------------------------
# pairwise evaluation dispatch


def make_get_exact_ijs(metric: Metric, verbose: bool = False):
    """Default in-sample pairwise evaluator for a Metric.

    Returns get_exact_ijs(f, X, IJ) -> float64 (m,), preserving the
    reference plug-in contract.  The `f` argument is accepted for
    compatibility; the batched engine (if any) takes precedence.
    """

    def get_exact(f, X, IJ):
        IJ = np.asarray(IJ)
        if metric.batch is not None:
            return metric.batch(X, X, IJ)
        return np.array([f(X[i], X[j]) for i, j in IJ], dtype=np.float64)

    return get_exact


def make_get_exact_query_ijs(metric: Metric, verbose: bool = False):
    """Query-side evaluator: pairs (X[i], Z[j])
    (reference utils.py:180-245)."""

    def get_exact(f, X, Z, IJ):
        IJ = np.asarray(IJ)
        if metric.batch is not None:
            return metric.batch(X, Z, IJ)
        return np.array([f(X[i], Z[j]) for i, j in IJ], dtype=np.float64)

    return get_exact


def test_parallelisation(get_exact_ijs, f, X, nx, s=20, seed=42):
    """Construction-time smoke test (reference utils.py:248-271): run a
    few real metric calls so backend problems surface immediately with
    an actionable error."""
    rng = np.random.default_rng(seed)
    IJ = rng.integers(nx, size=(s, 2))
    try:
        out = get_exact_ijs(f, X, IJ)
    except Exception as err:
        raise RuntimeError(
            "Metric backend smoke test failed. If you supplied a custom "
            "get_exact_ijs, check it returns np.array([f(X[i],X[j]) for "
            "i,j in IJ]); for built-in metrics check the dataset dtype "
            f"matches the metric. Original error: {err!r}"
        ) from err
    out = np.asarray(out)
    if out.shape != (s,):
        raise RuntimeError(
            "get_exact_ijs smoke test returned shape "
            f"{out.shape}, expected ({s},)"
        )
    return out
