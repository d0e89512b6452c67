from .sampling import stratified_zvals, sample_pdf
from .volume import (
    EmbeddingSpec,
    ModelStatics,
    RenderConfig,
    embed_padded,
    nof_warp,
    nerf_inference,
    composite,
    render_rays,
)

__all__ = [
    "stratified_zvals", "sample_pdf",
    "EmbeddingSpec", "ModelStatics", "RenderConfig",
    "embed_padded", "nof_warp", "nerf_inference", "composite", "render_rays",
]
