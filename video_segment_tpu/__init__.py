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
