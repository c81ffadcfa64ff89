from .pytree import pytree_dataclass

__all__ = ["pytree_dataclass"]
from .monitor import ResidualMonitor, profile_trace

__all__ = ["pytree_dataclass", "ResidualMonitor", "profile_trace"]
