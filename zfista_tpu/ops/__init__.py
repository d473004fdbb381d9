"""TPU-native proximal operators and fused kernels."""

from zfista_tpu.ops.prox import (
    make_wsum_shifted_l1_box_prox,
    prox_group_lasso,
    project_box,
    project_simplex,
    prox_l1,
    prox_shifted_l1,
    soft_threshold,
)

__all__ = [
    "soft_threshold",
    "prox_l1",
    "prox_shifted_l1",
    "project_box",
    "project_simplex",
    "make_wsum_shifted_l1_box_prox",
    "prox_group_lasso",
]
