"""Tests for the TCP remote hardware transport (localhost loop)."""

import threading

import numpy as np
import pytest

from slmsuite_tpu.hardware.remote import Server, _Client, _NpEncoder, _recurse_decompress
from slmsuite_tpu.hardware.slms.simulated import SimulatedSLM

PORT = 5812


class TestCodec:
    def test_array_roundtrip(self, rng):
        import json

        arr = rng.standard_normal((16, 24)).astype(np.float32)
        encoded = json.dumps({"x": arr, "n": np.int64(3), "f": np.float32(2.5)}, cls=_NpEncoder)
        decoded = _recurse_decompress(json.loads(encoded))
        assert np.array_equal(decoded["x"], arr)
        assert decoded["n"] == 3

    def test_dtype_roundtrip(self):
        import json

        encoded = json.dumps({"d": np.dtype(np.uint16)}, cls=_NpEncoder)
        decoded = _recurse_decompress(json.loads(encoded))
        assert decoded["d"] == np.dtype(np.uint16)


class TestServer:
    def test_requires_name_and_kind(self):
        class Nameless:
            pass

        with pytest.raises(ValueError):
            Server([Nameless()])

    def test_duplicate_names(self):
        a = SimulatedSLM((32, 32), name="same")
        b = SimulatedSLM((32, 32), name="same")
        with pytest.raises(ValueError):
            Server([a, b])

    def test_identify(self):
        slm = SimulatedSLM((32, 32))
        assert Server.identify_hardware(slm) == "slm"
        assert Server.identify_hardware(object()) is None

    def test_handle_dispatch(self):
        slm = SimulatedSLM((32, 32), name="test-slm")
        server = Server([slm], port=PORT)

        ok, kinds = server._handle({"command": "ping"})
        assert ok and kinds == {"test-slm": "slm"}

        ok, msg = server._handle({"name": "bogus", "command": "pickle"})
        assert not ok and "bogus" in msg

        ok, msg = server._handle({"name": "test-slm", "command": "close"})
        assert not ok  # Not in the allowlist.

        ok, result = server._handle(
            {"name": "test-slm", "command": "pickle", "kwargs": {"metadata": True}}
        )
        assert ok and "__version__" in result


class TestLoopback:
    def test_remote_slm_over_localhost(self):
        slm = SimulatedSLM((32, 24), name="loop-slm", wav_um=0.78)
        received = {}
        original = slm._set_phase_hw

        def recording(display, **kwargs):
            received["display"] = np.copy(display)
            return original(display, **kwargs)

        slm._set_phase_hw = recording
        server = Server([slm], port=PORT)

        thread = threading.Thread(
            target=server.listen, kwargs=dict(verbose=False, max_requests=4), daemon=True
        )
        thread.start()

        try:
            from slmsuite_tpu.hardware.slms.remote import RemoteSLM

            # Wait for the server socket to bind.
            import time

            remote = None
            for _ in range(50):
                try:
                    remote = RemoteSLM("loop-slm", port=PORT)
                    break
                except ValueError:
                    time.sleep(0.1)
            assert remote is not None, "server never came up"
            assert remote.shape == (24, 32)
            assert remote.wav_um == 0.78
            assert remote.latency_s > 0

            # A remote write crosses the wire to the served hardware.
            phase = np.random.uniform(0, 2 * np.pi, remote.shape)
            remote.set_phase(phase, phase_correct=False)
            assert np.array_equal(received["display"], remote.display)
        finally:
            thread.join(timeout=5)

    def test_info_no_server(self):
        with pytest.raises((TimeoutError, ValueError)):
            _Client.info(port=PORT + 1, timeout=0.2, verbose=False)
