"""minhash_ray — a Ray-Data-native near-duplicate detection and clustering engine.

Built from scratch (not a port) with the MinHash sketch semantics of the
reference C library ``federicamontes/minhash``:

* pairwise hash family ``((a*x mod M) + b) mod M`` and k-wise polynomial
  family over ``M = 2^31 - 1`` (reference: src/utils/hash.c:6-25),
* elementwise-min insert/merge (reference: src/utils/utils.c:3-46),
* fraction-of-equal-slots Jaccard estimation
  (reference: src/serial/minhash-serial.c:16-26),

re-expressed as vectorized numpy kernels inside ``ray.data.Dataset``
``map_batches`` stages (actor pools for stateful stages), with LSH band
grouping, union-find clustering, per-stage checkpoints and lineage metadata.
"""

from minhash_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
