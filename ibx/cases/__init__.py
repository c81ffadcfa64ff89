from .rae2822 import Rae2822Case, build_rae2822, force_coefficients, wall_cp

__all__ = ["Rae2822Case", "build_rae2822", "force_coefficients", "wall_cp"]
