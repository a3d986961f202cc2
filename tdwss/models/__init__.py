"""Model zoo: sparse-conv encoders, text transformer, meta-architectures.

Importing this package registers every model in ``MODEL_REGISTRY`` (the
reference relied on the same side effect, ``models/__init__.py:1``).
"""

from tdwss.models import layers  # noqa: F401
from tdwss.models import sparse_encoders  # noqa: F401
from tdwss.models import transformer  # noqa: F401
from tdwss.models import meta_arch  # noqa: F401
from tdwss.models import kpconv  # noqa: F401

from tdwss.models.sparse_encoders import (  # noqa: F401
    SparseConvUNet,
    SparseConvFCNet,
    SparseConvFCNetNarrow,
    SparseConvFCNetDirectUpPool,
    SparseConvFCNetDirectUpPoolLight,
)
from tdwss.models.meta_arch import (  # noqa: F401
    FullySupervised,
    MultiLabel,
    MultiLabelContrastive,
    build_model,
)
from tdwss.models.transformer import TextTransformer  # noqa: F401
