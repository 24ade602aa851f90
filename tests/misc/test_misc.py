"""Tests for slmsuite_tpu.misc (mirrors reference tests/misc)."""

import numpy as np
import pytest

from slmsuite_tpu.misc import math as mmath
from slmsuite_tpu.misc import files as mfiles


class TestMath:
    def test_types(self):
        assert isinstance(1, mmath.INTEGER_TYPES)
        assert isinstance(np.int32(1), mmath.INTEGER_TYPES)
        assert isinstance(1.5, mmath.FLOAT_TYPES)
        assert isinstance(np.float32(1.5), mmath.REAL_TYPES)
        assert isinstance(1j, mmath.SCALAR_TYPES)
        assert not isinstance(1j, mmath.REAL_TYPES)

    def test_iseven(self):
        assert mmath.iseven(2) and not mmath.iseven(3)


class TestPaths:
    def test_generate_and_latest(self, tmp_path):
        p1 = mfiles.generate_path(str(tmp_path), "data", extension="h5")
        open(p1, "w").close()
        p2 = mfiles.generate_path(str(tmp_path), "data", extension="h5")
        assert p1 != p2
        assert p1.endswith("data_00000.h5")
        assert p2.endswith("data_00001.h5")
        open(p2, "w").close()
        assert mfiles.latest_path(str(tmp_path), "data", extension="h5") == p2

    def test_latest_none(self, tmp_path):
        assert mfiles.latest_path(str(tmp_path), "nothing") is None

    def test_dir_kind(self, tmp_path):
        d = mfiles.generate_path(str(tmp_path), "run", kind="dir")
        import os

        assert os.path.isdir(d)

    def test_path_count(self, tmp_path):
        paths = mfiles.generate_path(str(tmp_path), "multi", extension="txt", path_count=3)
        assert len(paths) == 3
        assert paths[0] != paths[2]


class TestH5:
    def test_roundtrip(self, tmp_path):
        data = {
            "array": np.arange(12).reshape(3, 4),
            "scalar": 3.5,
            "string": "hello",
            "none": None,
            "nested": {"inner": np.ones((2, 2)), "name": "world"},
        }
        path = str(tmp_path / "test.h5")
        mfiles.save_h5(path, data)
        loaded = mfiles.load_h5(path)
        assert np.array_equal(loaded["array"], data["array"])
        assert loaded["scalar"] == 3.5
        assert loaded["string"] == "hello"
        assert loaded["none"] == False  # noqa: E712  (None stored as False)
        assert np.array_equal(loaded["nested"]["inner"], np.ones((2, 2)))
        assert loaded["nested"]["name"] == "world"

    def test_string_array(self, tmp_path):
        path = str(tmp_path / "strs.h5")
        mfiles.save_h5(path, {"names": np.array(["a", "bc"])})
        loaded = mfiles.load_h5(path)
        assert list(loaded["names"]) == ["a", "bc"]

    def test_staggered_raises(self, tmp_path):
        path = str(tmp_path / "bad.h5")
        with pytest.raises(ValueError):
            mfiles.save_h5(path, {"bad": [np.zeros(2), np.zeros(3)]})


class TestProfile:
    def test_time_scan(self):
        import jax.numpy as jnp

        from slmsuite_tpu.misc.profile import time_scan

        rate = time_scan(lambda x: x * 1.0001 + 1e-6, jnp.ones((64, 64)), n_iterations=20)
        assert rate > 0

    def test_bytes_accessed(self):
        import jax.numpy as jnp

        from slmsuite_tpu.misc.profile import bytes_accessed

        n = bytes_accessed(lambda x: x * 2.0, jnp.ones((128, 128)))
        assert n is None or n >= 128 * 128 * 4

    def test_trace(self, tmp_path):
        import jax.numpy as jnp
        import jax

        from slmsuite_tpu.misc.profile import trace

        with trace(str(tmp_path)):
            jnp.sum(jnp.ones((32, 32))).block_until_ready()
        # A trace directory should have been produced.
        assert any(tmp_path.iterdir())
