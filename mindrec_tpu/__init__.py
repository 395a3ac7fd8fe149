"""mindrec_tpu — a TPU-native recommender-systems framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
mindspore-lab/mindrec (reference public API surface:
``mindspore_rec/__init__.py:18-21`` exports ``RecModel`` and
``HashEmbeddingLookup``): TB-scale sharded/cached embedding tables, hash
dynamic features with admission/eviction, dual sparse optimizers
(FTRL/LazyAdam), a CTR model zoo (Wide&Deep, DeepFM, DCN, multitable
Wide&Deep) and online (streaming) learning.

Compute path is JAX (jit/pjit/shard_map + Pallas kernels); host-side
runtime pieces (hash store, hierarchical cache) are native C++.
"""

from mindrec_tpu.version import __version__
from mindrec_tpu.train.rec_model import RecModel
from mindrec_tpu.ops.embedding import (
    EmbeddingLookup,
    HashEmbeddingLookup,
    EmbeddingTableSpec,
)

__all__ = [
    "__version__",
    "RecModel",
    "EmbeddingLookup",
    "HashEmbeddingLookup",
    "EmbeddingTableSpec",
]
