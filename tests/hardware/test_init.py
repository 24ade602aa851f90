"""Tests for _Picklable (mirrors reference tests/hardware/test_init.py)."""

import numpy as np

from slmsuite_tpu.hardware import _Picklable
from slmsuite_tpu.misc.files import load_h5


class Widget(_Picklable):
    _pickle = ["name", "value"]
    _pickle_data = ["data"]

    def __init__(self):
        self.name = "widget"
        self.value = 3.5
        self.data = np.arange(6).reshape(2, 3)


class Nested(_Picklable):
    _pickle = ["name", "child"]

    def __init__(self):
        self.name = "nested"
        self.child = Widget()


class TestPicklable:
    def test_baseline(self):
        p = Widget().pickle(attributes=False, metadata=False)
        assert p["name"] == "widget"
        assert p["value"] == 3.5
        assert "data" not in p

    def test_heavy(self):
        p = Widget().pickle(attributes=True, metadata=False)
        assert np.array_equal(p["data"], np.arange(6).reshape(2, 3))

    def test_metadata(self):
        p = Widget().pickle()
        assert "__version__" in p and "__timestamp__" in p
        assert p["__meta__"]["name"] == "widget"

    def test_nested(self):
        p = Nested().pickle(metadata=False)
        assert p["child"]["name"] == "widget"

    def test_explicit_keys(self):
        p = Widget().pickle(attributes=["value"], metadata=False)
        assert list(p.keys()) == ["__class__", "value"]

    def test_missing_warns(self, recwarn):
        w = Widget()
        w._pickle = ["name", "bogus"]
        w.pickle(metadata=False)
        assert any("bogus" in str(r.message) for r in recwarn.list)

    def test_save(self, tmp_path):
        path = Widget().save(str(tmp_path))
        data = load_h5(path)
        assert data["__meta__"]["name"] == "widget"
