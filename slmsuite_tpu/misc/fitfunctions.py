"""
Backwards-compatible re-export shim matching the reference's
``slmsuite/misc/fitfunctions.py``; canonical home is
:mod:`slmsuite_tpu.holography.analysis.fitfunctions`.
"""

from slmsuite_tpu.holography.analysis.fitfunctions import *  # noqa: F401,F403
