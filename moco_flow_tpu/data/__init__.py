from .correspondence import (
    CorrespondenceTable,
    build_correspondence_table,
    sample_correspondences,
)
from .dataset import (
    FrameTable,
    MoCoFlowDataset,
    NoFDataset,
    get_dataset,
    sample_train_rays,
)

__all__ = [
    "CorrespondenceTable", "build_correspondence_table",
    "sample_correspondences",
    "FrameTable", "MoCoFlowDataset", "NoFDataset", "get_dataset",
    "sample_train_rays",
]
