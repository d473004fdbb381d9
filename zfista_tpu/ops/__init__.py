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
from zfista_tpu.ops.tv import prox_tv, tv2d, tv_dual_gap

__all__ = [
    "prox_tv",
    "tv2d",
    "tv_dual_gap",
    "soft_threshold",
    "prox_l1",
    "prox_shifted_l1",
    "project_box",
    "project_simplex",
    "make_wsum_shifted_l1_box_prox",
    "prox_group_lasso",
]
