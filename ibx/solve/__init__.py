from .fas import fas
from .fas_euler import FasEuler
from .point_implicit_euler import point_implicit_step
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
    "fas", "FasEuler", "point_implicit_step",
    "Multigrid", "coarsener_and_prolongator", "multigrid_levels",
    "DomainHierarchy", "multigrid",
    "Linearization", "PIPreconditioner", "hutchinson_block_diagonal",
    "linearize", "solve",
]
