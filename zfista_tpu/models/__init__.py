"""Test-problem zoo: multiobjective composite problems F_i = f_i + g_i."""

from zfista_tpu.models.base import Problem
from zfista_tpu.models.zoo import (
    FDS,
    JOS1,
    SD,
    TOI4,
    TRIDIA,
    ZDT1,
    LinearFunctionRank1,
)

__all__ = [
    "Problem",
    "JOS1",
    "SD",
    "FDS",
    "ZDT1",
    "TOI4",
    "TRIDIA",
    "LinearFunctionRank1",
]
