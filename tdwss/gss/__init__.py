from tdwss.gss.search import (  # noqa: F401
    SimilarityMask,
    generate_proposals,
    hierarchical_segmentation,
    nms_3d,
)
