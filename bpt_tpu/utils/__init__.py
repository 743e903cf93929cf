"""Config dataclasses, transform helpers and profiling utilities."""

from bpt_tpu.utils.transforms import trs_matrix, invert_rigid, compose
