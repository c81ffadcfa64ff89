from .stencil import (
    Stencil,
    apply_stencil,
    reindex_stencil,
    stencil_domain,
    stencil_from_lists,
    stencil_from_padded,
)

__all__ = [
    "Stencil",
    "apply_stencil",
    "reindex_stencil",
    "stencil_domain",
    "stencil_from_lists",
    "stencil_from_padded",
]
