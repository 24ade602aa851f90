"""Miscellaneous shared helpers (numeric type tuples, file utilities)."""

from slmsuite_tpu.misc.math import (  # noqa: F401
    INTEGER_TYPES,
    FLOAT_TYPES,
    REAL_TYPES,
    SCALAR_TYPES,
    iseven,
)
