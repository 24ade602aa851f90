"""Computational holography: algorithms, toolbox, and analysis."""
