"""TPU-native hierarchical graph-based video segmentation framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the
Grundmann et al. CVPR'10 streaming hierarchical video segmentation system:

- ``ops``: device kernels — color conversion, smoothing, spatio-temporal edge
  weights, data-parallel connected components, histograms, TV-L1 optical flow.
- ``core``: the segmentation engine — over-segmentation solver, streaming
  dense driver, hierarchical agglomeration, chunk-set streaming.
- ``dataio``: wire-compatible protobuf emission and the chunked ``.pb``
  container, video decode, flow caching.
- ``segment_util``: host-side result utilities (hierarchies, rendering,
  boundaries, vectorization).
- ``parallel``: device-mesh sharding of the compute path.
- ``runtime``: the host streaming pipeline and telemetry.
"""

__version__ = "0.1.0"

import os as _os


def _configure_jax():
    """Persistent compilation cache: solver programs are large and their
    XLA compiles are expensive; cache them across processes."""
    cache = _os.environ.get(
        "VST_JAX_CACHE",
        _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                      "..", ".jax_cache"))
    if cache and cache != "0":
        try:
            import jax
            jax.config.update("jax_compilation_cache_dir",
                              _os.path.abspath(cache))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        except Exception:
            pass


_configure_jax()
