"""Core TPU-native proximal-gradient solver."""

from zfista_tpu.core.result import SolveResult
from zfista_tpu.core.solver import minimize_proximal_gradient

__all__ = ["minimize_proximal_gradient", "SolveResult"]
