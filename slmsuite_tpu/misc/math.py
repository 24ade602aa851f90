"""
Numeric type tuples used for isinstance-based argument parsing.

Parity: reference ``slmsuite/misc/math.py:7-26``.
"""

import numpy as np

#: Integer scalar types (python + numpy).
INTEGER_TYPES = (int, np.integer)

#: Floating scalar types (python + numpy).
FLOAT_TYPES = (float, np.floating)

#: Real scalar types.
REAL_TYPES = INTEGER_TYPES + FLOAT_TYPES

#: All scalar types including complex.
SCALAR_TYPES = REAL_TYPES + (complex, np.complexfloating)


def iseven(x):
    """Return ``True`` if the integer ``x`` is even."""
    return int(x) % 2 == 0
