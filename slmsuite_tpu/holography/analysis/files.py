"""
File I/O re-exports for API parity with the reference's
``slmsuite/holography/analysis/files.py``; the implementations live in
:mod:`slmsuite_tpu.misc.files`.
"""

from slmsuite_tpu.misc.files import (  # noqa: F401
    _gray2rgb,
    _load_image,
    generate_path,
    latest_path,
    load_h5,
    read_h5,
    save_h5,
    save_image,
    write_h5,
)

__all__ = ["generate_path", "latest_path", "load_h5", "read_h5", "save_h5", "save_image", "write_h5"]
