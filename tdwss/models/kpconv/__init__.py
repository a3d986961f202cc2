"""KPConv alternative backbone (reference models/KPConv/, SURVEY.md §2.3).

The reference ships KPFCNN registered-but-unwired; here it is a first-class
second backbone: pure-jax kernel-point convolution ops, flax blocks and the
KPFCNN encoder/decoder, deterministic kernel-point dispositions, and a
host-side static-shape input pyramid backed by the native C++ grid
subsampling / radius neighbor queries.
"""

from tdwss.models.kpconv.architectures import (  # noqa: F401
    KPFCNN,
    deform_param_labels,
    kpfcnn_loss,
)
from tdwss.models.kpconv.blocks import KPBatch  # noqa: F401
from tdwss.models.kpconv.config import SCANNET_ARCHITECTURE, KPConvConfig  # noqa: F401
from tdwss.models.kpconv.kernel_points import load_kernels  # noqa: F401
from tdwss.models.kpconv.pyramid import (  # noqa: F401
    calibrate_neighbors,
    segmentation_inputs,
)
