"""Device-mesh construction helpers."""

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(axis_sizes=None, axis_names=("data",), devices=None):
    """
    Build a :class:`jax.sharding.Mesh`.

    Parameters
    ----------
    axis_sizes : tuple of int OR None
        Size per axis; ``None`` puts all devices on the first axis.
    axis_names : tuple of str
        Mesh axis names (default a single ``"data"`` axis).
    devices : list OR None
        Devices to use (default all).

    Returns
    -------
    jax.sharding.Mesh
    """
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),) + (1,) * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != len(devices):
        raise ValueError(
            f"Mesh axes {axis_sizes} do not multiply to device count {len(devices)}."
        )
    return Mesh(np.asarray(devices).reshape(axis_sizes), axis_names)
