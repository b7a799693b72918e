"""Precision handling.

The reference supports `prec` in {16, 32, 64} for both continuous (float) and
discrete (int) data (reference: src/misc.jl:47-62 `get_precision_type`).  On TPU
the native compute type is float32 (MXU accumulates f32); float64 is used only
for CPU-side parity testing and requires jax x64 mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_FLOAT = {16: jnp.float16, 32: jnp.float32, 64: jnp.float64}
_INT = {16: jnp.int16, 32: jnp.int32, 64: jnp.int64}


def enable_x64() -> None:
    jax.config.update("jax_enable_x64", True)


def float_dtype(prec: int = 32):
    if prec not in _FLOAT:
        raise ValueError(f"'{prec}' not a valid precision")
    if prec == 64:
        enable_x64()
    return _FLOAT[prec]


def int_dtype(prec: int = 32):
    if prec not in _INT:
        raise ValueError(f"'{prec}' not a valid precision")
    if prec == 64:
        enable_x64()
    return _INT[prec]


def np_float_dtype(prec: int = 32):
    return {16: np.float16, 32: np.float32, 64: np.float64}[prec]


def np_int_dtype(prec: int = 32):
    return {16: np.int16, 32: np.int32, 64: np.int64}[prec]


def statistics_dtype():
    """dtype used for test statistics/p-values on the current backend.

    float64 when x64 is enabled (CPU parity mode), else float32 (TPU).
    """
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
