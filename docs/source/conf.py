"""Sphinx configuration for slmsuite-tpu (build requires `pip install sphinx furo`)."""

project = "slmsuite-tpu"
author = "slmsuite-tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.intersphinx",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
]

autosummary_generate = True
napoleon_numpy_docstring = True
autodoc_member_order = "bysource"
autodoc_mock_imports = [
    "cv2", "h5py", "scipy", "matplotlib", "jax", "jaxlib", "optax",
    "pyglet", "hid", "PySpin", "pypylon", "vmbpy", "thorlabs_tsi_sdk",
    "imagingcontrol4", "mvsdk", "pylablib", "instrumental", "pymmcore",
    "holoeye", "tqdm",
]

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
    "jax": ("https://docs.jax.dev/en/latest/", None),
}

html_theme = "furo"
