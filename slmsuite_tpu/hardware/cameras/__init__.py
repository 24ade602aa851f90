"""Camera hardware abstraction and drivers."""
