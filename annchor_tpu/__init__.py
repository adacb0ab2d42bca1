"""annchor_tpu: TPU-native approximate k-NN graphs for slow metrics.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the
ANNchor algorithm family (anchor-based k-NN graph construction that
minimises calls to an expensive metric), plus TPU-first extras:
batched device metric kernels, exact native optimal transport, and
multi-chip sharding of the pair pipeline.
"""

# Persistent XLA compile cache: this jax build IGNORES the
# JAX_COMPILATION_CACHE_DIR env var (config.compilation_cache_dir
# stays None — measured round 5; every bench script's setdefault was a
# no-op and the 500k first visit paid 49 min of compiles), so wire the
# env var into the config explicitly before any compilation.  Opt out
# by setting it empty.
import os as _os

_cache_dir = _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/annchor_tpu_xla_cache"
)
# CPU-pinned processes (hermetic tests, virtual-mesh runs) skip the
# cache: XLA:CPU AOT entries written under different pseudo-feature
# flags reload with "machine type doesn't match" SIGILL warnings, and
# CPU compiles are cheap anyway.  The remote-TPU compiles are the ones
# worth persisting.
if _cache_dir and "cpu" not in _os.environ.get(
    "JAX_PLATFORMS", ""
).lower():
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # cache every program over 100 ms: remote-TPU compiles are the
    # scale-path warm-up wall, and even small programs cost a relay
    # round trip to compile
    _jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", 0.1
    )

from annchor_tpu.annchor import Annchor, BruteForce, compare_neighbor_graphs
from annchor_tpu.error_predictors import SimpleStratifiedErrorRegression
from annchor_tpu.exact import exact_knn, exact_query_rows, exact_rows
from annchor_tpu.graph_sp import GraphShortestPathMetric
from annchor_tpu.metrics import Metric, get_function_from_input
from annchor_tpu.pickers import (
    ExternalAnchorPicker,
    MaxMinAnchorPicker,
    RandomAnchorPicker,
    SelectedAnchorPicker,
)
from annchor_tpu.regressors import SimpleStratifiedLinearRegression
from annchor_tpu.samplers import (
    ClusterSampler,
    NothingToSample,
    Sampler,
    SimpleStratifiedSampler,
)

__version__ = "0.1.0"

__all__ = [
    "Annchor",
    "BruteForce",
    "compare_neighbor_graphs",
    "Metric",
    "get_function_from_input",
    "GraphShortestPathMetric",
    "MaxMinAnchorPicker",
    "RandomAnchorPicker",
    "SelectedAnchorPicker",
    "ExternalAnchorPicker",
    "Sampler",
    "SimpleStratifiedSampler",
    "ClusterSampler",
    "NothingToSample",
    "SimpleStratifiedLinearRegression",
    "SimpleStratifiedErrorRegression",
    "exact_knn",
    "exact_rows",
    "exact_query_rows",
]
