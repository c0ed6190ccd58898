from .interpolation import linear_interpolating_matrix
from .state import EquationOfState

__all__ = ["EquationOfState", "linear_interpolating_matrix"]
