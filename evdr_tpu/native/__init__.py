"""Native (C++) host-runtime components, loaded via ctypes.

The compute path is JAX/Pallas on TPU; these cover hot HOST paths around it —
currently the retrieval-metrics engine driving the training loop's periodic
eval. Every native entry point has a pure-Python/numpy fallback, so the
package works without a toolchain; `python -m evdr_tpu.native.build` (or first
use) compiles the shared library with g++.
"""

from evdr_tpu.native.build import load_library, build_library
from evdr_tpu.native.fast_metrics import (
    build_fast_qrels,
    compute_metrics_from_scores,
    native_available,
    tie_rank_from_docids,
)
