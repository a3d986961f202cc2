"""TPU-native sparse voxel engine.

Replaces the reference's external `sparseconvnet` C++/CUDA engine
(hash-based voxelization, rulebook construction, submanifold/strided
convolution, pooling/unpooling — see SURVEY.md §2.2) with static-shaped
XLA/Pallas programs:

- ``coords``      integer coordinate keys, lexicographic sort, binary-search
                  hash-free lookup
- ``voxelize``    points -> deduplicated voxels (InputLayer mode=4 parity)
                  and voxel -> point devoxelization (OutputLayer parity)
- ``plan``        per-level coordinate systems + rulebooks for a whole
                  encoder, built once per forward (SCN "metadata" parity)
- ``sparse_conv`` gather-GEMM-scatter convolution applications
- ``segment``     segment mean/sum (per-scene pooling, vote accumulation)
"""

from tdwss.ops.coords import (  # noqa: F401
    COORD_BITS,
    INVALID_KEY,
    kernel_offsets,
    lookup_sorted,
    make_keys,
)
from tdwss.ops.voxelize import SparseGrid, devoxelize, voxelize  # noqa: F401
from tdwss.ops.plan import GridLevel, LevelPlans, build_plans  # noqa: F401
from tdwss.ops.sparse_conv import (  # noqa: F401
    deconv_apply,
    gather_neighbors,
    max_pool,
    strided_conv_apply,
    subm_conv_apply,
    unpool,
)
from tdwss.ops.segment import segment_mean_by_batch, segment_sum_by_batch  # noqa: F401
