"""Inverse rendering: gradient estimators and optimization harnesses.

Discrete sampling decisions are detached (stop_gradient) inside
bpt_tpu.integrator.radiance; this package adds parameter-gradient helpers
and finite-difference validation utilities.
"""
