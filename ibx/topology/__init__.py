from .interp import idw_weights, interpolator, linear_weights

__all__ = ["interpolator", "linear_weights", "idw_weights"]
