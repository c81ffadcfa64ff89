from .fas import fas
from .fas_euler import FasEuler
from .mgrid import Multigrid, coarsener_and_prolongator, multigrid_levels
from .multigrid_domain import DomainHierarchy, multigrid
from .point_implicit import (
    Linearization,
    PIPreconditioner,
    hutchinson_block_diagonal,
    linearize,
    solve,
)

__all__ = [
    "fas", "FasEuler",
    "Multigrid", "coarsener_and_prolongator", "multigrid_levels",
    "DomainHierarchy", "multigrid",
    "Linearization", "PIPreconditioner", "hutchinson_block_diagonal",
    "linearize", "solve",
]
