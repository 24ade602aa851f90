"""Spatial light modulator hardware abstraction and drivers."""
