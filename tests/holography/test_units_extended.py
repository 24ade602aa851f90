"""
Extended unit-conversion and imprint coverage mirroring the reference's
behavior matrix (ref ``tests/holography/test_toolbox.py:14-330``):
convert_vector identities, aliases, angle/hardware/knm conversions and
round trips, and imprint operation/window variants.
"""

import numpy as np
import pytest

from slmsuite_tpu.holography import toolbox
from slmsuite_tpu.holography.toolbox import convert_vector


@pytest.fixture()
def slm():
    from slmsuite_tpu.hardware.slms.simulated import SimulatedSLM

    return SimulatedSLM(resolution=(128, 96), pitch_um=(8, 8), wav_um=0.78)


VEC = np.array([[0.1], [-0.2]])


class TestConvertVector:
    @pytest.mark.parametrize("unit", ["norm", "kxy", "rad", "mrad", "deg"])
    def test_identity_no_hardware(self, unit):
        np.testing.assert_allclose(
            convert_vector(VEC, from_units=unit, to_units=unit), VEC
        )

    def test_bad_units_raise(self):
        with pytest.raises(ValueError):
            convert_vector((0, 0), from_units="bogus", to_units="norm")
        with pytest.raises(ValueError):
            convert_vector((0, 0), from_units="norm", to_units="bogus")

    @pytest.mark.parametrize(
        "inp", [(1, 2), [1, 2], np.array([1.0, 2.0])]
    )
    def test_input_forms(self, inp):
        np.testing.assert_allclose(
            convert_vector(inp), np.array([[1.0], [2.0]])
        )

    def test_norm_kxy_rad_aliases(self):
        v = np.array([[0.05], [-0.03]])
        for a, b in [("norm", "kxy"), ("kxy", "rad"), ("rad", "norm")]:
            np.testing.assert_allclose(convert_vector(v, a, b), v)

    def test_mrad_and_deg(self):
        np.testing.assert_allclose(
            convert_vector(VEC, "norm", "mrad"), VEC * 1000
        )
        np.testing.assert_allclose(
            convert_vector(VEC * 1000, "mrad", "norm"), VEC
        )
        np.testing.assert_allclose(
            convert_vector(VEC, "norm", "deg"), VEC * 180 / np.pi
        )

    def test_freq_and_lpmm_roundtrip(self, slm):
        pitch_um = toolbox.format_2vectors(slm.pitch_um)
        freq = convert_vector(VEC, "norm", "freq", hardware=slm)
        np.testing.assert_allclose(freq, VEC * pitch_um / slm.wav_um)
        np.testing.assert_allclose(
            convert_vector(freq, "freq", "norm", hardware=slm), VEC
        )
        lpmm = convert_vector(VEC, "norm", "lpmm", hardware=slm)
        np.testing.assert_allclose(lpmm, VEC * 1000 / slm.wav_um)
        np.testing.assert_allclose(
            convert_vector(lpmm, "lpmm", "norm", hardware=slm), VEC
        )

    def test_knm_centering_and_roundtrip(self, slm):
        shape = (512, 512)
        knm = convert_vector(
            VEC, "norm", "knm", hardware=slm, shape=shape
        )
        # Zero frequency maps to the grid center.
        zero = convert_vector(
            np.zeros((2, 1)), "norm", "knm", hardware=slm, shape=shape
        )
        np.testing.assert_allclose(np.ravel(zero), [256, 256])
        back = convert_vector(knm, "knm", "norm", hardware=slm, shape=shape)
        np.testing.assert_allclose(back, VEC, atol=1e-9)

    def test_zernike_roundtrip(self, slm):
        z = convert_vector(VEC, "norm", "zernike", hardware=slm)
        back = convert_vector(z, "zernike", "norm", hardware=slm)
        np.testing.assert_allclose(back, VEC, atol=1e-9)

    def test_hardware_required_units_warn_without(self):
        import warnings as _w

        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            out = convert_vector(VEC, "norm", "freq")
        assert any("SLM is required" in str(w.message) for w in caught)
        assert np.isnan(np.asarray(out)).all()


class TestImprintExtended:
    @pytest.fixture()
    def grid(self):
        x = np.arange(64) - 32.0
        return np.meshgrid(x, x)

    def test_add_then_replace(self, grid):
        canvas = np.zeros((64, 64))
        toolbox.imprint(
            canvas, (10, 16, 10, 16), 1.5, grid=grid,
            imprint_operation="add",
        )
        assert canvas[12, 12] == pytest.approx(1.5)
        toolbox.imprint(
            canvas, (10, 16, 10, 16), 2.0, grid=grid,
            imprint_operation="replace",
        )
        assert canvas[12, 12] == pytest.approx(2.0)
        assert canvas[5, 5] == 0.0

    def test_circular_window(self, grid):
        canvas = np.zeros((64, 64))
        toolbox.imprint(
            canvas, (32, 20, 32, 20), 1.0, grid=grid,
            centered=True, circular=True,
        )
        filled = canvas > 0
        area = filled.sum()
        assert abs(area - np.pi * 10 * 10) < 0.15 * np.pi * 100
        # Corners of the bounding box stay empty.
        assert canvas[23, 23] == 0.0

    def test_function_receives_shifted_grid(self, grid):
        canvas = np.zeros((64, 64))

        def f(g):
            return g[0] * 0 + 7.0

        toolbox.imprint(canvas, (0, 8, 0, 8), f, grid=grid)
        assert canvas[4, 4] == pytest.approx(7.0)

    def test_clip_truncates_to_bounds(self, grid):
        canvas = np.zeros((64, 64))
        toolbox.imprint(canvas, (60, 16, 60, 16), 3.0, grid=grid, clip=True)
        # The in-bounds corner is written; nothing wrapped around.
        assert canvas[0, 0] == 0.0 and canvas[62, 62] == pytest.approx(3.0)

    def test_bad_operation_raises(self, grid):
        canvas = np.zeros((64, 64))
        with pytest.raises(ValueError):
            toolbox.imprint(
                canvas, (0, 8, 0, 8), 1.0, grid=grid,
                imprint_operation="multiply",
            )
