"""tdwss — TPU-native weakly-supervised 3D semantic segmentation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
`timsu1104/3D-Weakly-Supervised-Semantic-Segmentation` (the reference, a
PyTorch + SparseConvNet CUDA stack): ScanNetV2 point-cloud segmentation
trained from scene-level multi-label tags, optional text contrastive
supervision, and a pseudo-label self-training loop.

Package layout
--------------
- ``tdwss.ops``      sparse voxel engine: voxelization, rulebooks,
                     submanifold / strided sparse convolution, pooling
                     (TPU-native replacement for the `sparseconvnet` C++/CUDA
                     engine, cf. reference models/SparseConvNet.py)
- ``tdwss.models``   flax encoders + meta-architectures + text transformer
- ``tdwss.data``     offline prep, augmentation, fixed-shape collation
- ``tdwss.engine``   train / eval / pseudo-label drivers
- ``tdwss.parallel`` device-mesh data parallelism (pjit / shard_map)
- ``tdwss.utils``    metrics, losses, checkpointing, registry, config
"""

__version__ = "0.1.0"

NUM_CLASSES = 20  # ScanNetV2 benchmark classes (reference dataset/data.py:7)
