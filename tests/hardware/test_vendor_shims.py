"""
Import sweep and logic tests for vendor hardware drivers.

SDKs are absent in CI, so constructors must raise clean ImportErrors —
but every module must import, and SDK-independent logic (PLM phase
quantization/electrode packing, Meadowlark DLL search) is testable.
"""

import importlib

import numpy as np
import pytest

VENDOR_MODULES = [
    "slmsuite_tpu.hardware._pyglet",
    "slmsuite_tpu.hardware.slms.template",
    "slmsuite_tpu.hardware.slms.screenmirrored",
    "slmsuite_tpu.hardware.slms.meadowlark",
    "slmsuite_tpu.hardware.slms.santec",
    "slmsuite_tpu.hardware.slms.hamamatsu",
    "slmsuite_tpu.hardware.slms.holoeye",
    "slmsuite_tpu.hardware.slms.texasinstruments",
    "slmsuite_tpu.hardware.slms.thorlabs",
    "slmsuite_tpu.hardware.cameras.template",
    "slmsuite_tpu.hardware.cameras.webcam",
    "slmsuite_tpu.hardware.cameras.flir",
    "slmsuite_tpu.hardware.cameras.basler",
    "slmsuite_tpu.hardware.cameras.alliedvision",
    "slmsuite_tpu.hardware.cameras.thorlabs",
    "slmsuite_tpu.hardware.cameras.xenics",
    "slmsuite_tpu.hardware.cameras.imagingsource",
    "slmsuite_tpu.hardware.cameras.mindvision",
    "slmsuite_tpu.hardware.cameras.pylablib",
    "slmsuite_tpu.hardware.cameras.instrumental",
    "slmsuite_tpu.hardware.cameras.mmcore",
    "slmsuite_tpu.hardware.cameras._viewer",
]


@pytest.mark.parametrize("module", VENDOR_MODULES)
def test_vendor_module_imports(module):
    importlib.import_module(module)


def test_thorlabs_slm_is_screenmirrored():
    from slmsuite_tpu.hardware.slms.screenmirrored import ScreenMirrored
    from slmsuite_tpu.hardware.slms.thorlabs import Thorlabs

    assert Thorlabs is ScreenMirrored


def test_screenmirrored_requires_pyglet():
    from slmsuite_tpu.hardware import _pyglet
    from slmsuite_tpu.hardware.slms.screenmirrored import ScreenMirrored

    if _pyglet.pyglet is None:
        with pytest.raises(ImportError):
            ScreenMirrored(0)


class TestPLMLogic:
    """SDK-independent PLM phase pipeline."""

    def _make_plm(self, model="p67", wav_um=0.633, wav_design_um=None):
        """Build a PLM shell without any hardware/video."""
        from slmsuite_tpu.hardware.slms import texasinstruments as ti

        plm = object.__new__(ti.PLM)
        plm.model = ti.PLM_MODELS[model]
        plm.plm_shape = tuple(plm.model["shape"])
        plm._init_quantize_lut(wav_um, wav_design_um or wav_um)
        return plm

    def test_quantize_lut_endpoints(self):
        plm = self._make_plm()
        memory_lut = np.asarray(plm.model["memory_lut"])
        # Gray level 0 is phase 0 -> state 0; the top gray levels wrap
        # toward 2pi, whose nearest state is 15 (ratio 1.0) or 0.
        assert plm._gray_to_code.shape == (256,)
        assert plm._gray_to_code[0] == memory_lut[0]
        assert plm._gray_to_code[255] in (memory_lut[0], memory_lut[15])
        # All codes are 4-bit.
        assert plm._gray_to_code.max() <= 15

    def test_quantize_lut_monotone_states(self):
        """Mid-range phases hit intermediate states."""
        plm = self._make_plm()
        memory_lut = list(plm.model["memory_lut"])
        states = [memory_lut.index(code) for code in plm._gray_to_code]
        # States (height indices) are non-decreasing except at the wrap.
        diffs = np.diff(states)
        assert np.sum(diffs < 0) <= 1

    def test_electrode_map_layout(self):
        plm = self._make_plm()
        codes = np.zeros((2, 2), dtype=np.uint8)
        codes[0, 0] = 0b1010  # Bits 1 and 3 set.
        bitmap = plm._electrode_map(codes)
        assert bitmap.shape == (4, 4)
        assert set(np.unique(bitmap)) <= {0, 255}

        # Undo flips to inspect the raw 2x2 block for pixel (0, 0).
        flip_y, flip_x = plm.model["data_flip"]
        raw = bitmap[::-1] if flip_y else bitmap
        raw = raw[:, ::-1] if flip_x else raw
        layout = plm.model["electrode_layout"]
        block = raw[0:2, 0:2]
        for dy in range(2):
            for dx in range(2):
                bit = layout[dy][dx]
                expected = 255 * ((0b1010 >> bit) & 1)
                assert block[dy, dx] == expected

    def test_electrode_map_counts(self):
        """Each set bit lights exactly one electrode per pixel."""
        plm = self._make_plm(model="p47")
        rng = np.random.default_rng(0)
        codes = rng.integers(0, 16, size=(8, 8)).astype(np.uint8)
        bitmap = plm._electrode_map(codes)
        popcount = np.array([bin(c).count("1") for c in codes.ravel()])
        assert bitmap.sum() // 255 == popcount.sum()

    def test_wavelength_scaling(self):
        """Longer wavelengths compress the available phase range."""
        from slmsuite_tpu.hardware.slms import texasinstruments as ti

        plm_matched = self._make_plm(wav_um=0.633, wav_design_um=0.633)
        plm_long = self._make_plm(wav_um=1.266, wav_design_um=0.633)
        # At 2x the design wavelength, full stroke reaches only pi, so
        # gray levels near pi should map to the topmost state.
        memory_lut = list(ti.PLM_MODELS["p67"]["memory_lut"])
        state_at_pi = memory_lut.index(plm_long._gray_to_code[128])
        assert state_at_pi == 15

    def test_dlpc900_requires_hid(self):
        from slmsuite_tpu.hardware.slms import texasinstruments as ti

        if ti.hid is None:
            with pytest.raises(ImportError):
                ti.DLPC900()


class TestMeadowlarkLogic:
    def test_find_dll_missing(self, tmp_path):
        from slmsuite_tpu.hardware.slms.meadowlark import _find_dll

        with pytest.raises(FileNotFoundError):
            _find_dll(str(tmp_path))

    def test_find_dll_search(self, tmp_path):
        from slmsuite_tpu.hardware.slms.meadowlark import _find_dll

        nested = tmp_path / "SDK" / "sub"
        nested.mkdir(parents=True)
        (nested / "Blink_C_wrapper.dll").write_bytes(b"")
        assert _find_dll(str(tmp_path)) == str(nested / "Blink_C_wrapper.dll")

    def test_find_dll_skips_cal_kit(self, tmp_path):
        from slmsuite_tpu.hardware.slms.meadowlark import _find_dll

        kit = tmp_path / "Cal Kit"
        sdk = tmp_path / "SDK"
        kit.mkdir()
        sdk.mkdir()
        (kit / "Blink_C_wrapper.dll").write_bytes(b"")
        (sdk / "Blink_C_wrapper.dll").write_bytes(b"")
        assert _find_dll(str(tmp_path)) == str(sdk / "Blink_C_wrapper.dll")

    @pytest.mark.parametrize(
        "create_sig, write_sig, expect",
        [
            ("void Create_SDK()",
             "void Write_image(unsigned char* data, unsigned int is8)",
             "hdmi"),
            ("void Create_SDK(unsigned int python)",
             "void Write_image(unsigned char* d, unsigned int is8)",
             "hdmi"),
            ("void Create_SDK(unsigned int* n, int* ok)",
             "int Write_image(int board, unsigned char* d, unsigned int timeout)",
             "pcie_modern_3"),
            ("void Create_SDK(unsigned int* n, int* ok)",
             "int Write_image(int b, unsigned char* d, bool wt, bool fi, bool op, unsigned int t)",
             "pcie_modern_6"),
            ("void Create_SDK(unsigned int* n, int* ok)",
             "int Write_image(int b, unsigned char* d, unsigned int sz, bool wt, bool fi, bool op, bool orf, unsigned int t)",
             "pcie_modern_8"),
            ("void Create_SDK(unsigned int bd, unsigned int* n, bool* ok, bool nem, bool ram, bool gpu, unsigned int mt, int lut)",
             "int Write_image(int b, unsigned char* d, unsigned int sz, bool wt, bool fi, bool op, bool orf, unsigned int t)",
             "pcie_legacy"),
        ],
    )
    def test_header_trace_detection(self, tmp_path, create_sig, write_sig, expect):
        """The SDK generation is fingerprinted from the argument counts
        of Create_SDK/Write_image in the vendor header (the arities
        changed with each Blink SDK revision)."""
        from slmsuite_tpu.hardware.slms import meadowlark as ml

        dll = tmp_path / "Blink_C_wrapper.dll"
        dll.write_bytes(b"")
        header = create_sig if "Create_SDK(" in create_sig else ""
        (tmp_path / "Blink_C_wrapper.h").write_text(
            header + ";\n" + write_sig + ";\n"
        )
        trace = ml._parse_sdk_header(str(dll))
        assert trace is not None
        assert ml._detect_variant(str(dll), lib=object()) == expect

    def test_header_absent_symbol_fallback(self, tmp_path):
        from slmsuite_tpu.hardware.slms import meadowlark as ml

        dll = tmp_path / "Blink_C_wrapper.dll"
        dll.write_bytes(b"")

        class HdmiLib:
            Get_Width = staticmethod(lambda: 1920)

        class ModernLib:
            Get_image_width = staticmethod(lambda b: 1920)
            Get_last_error_message = staticmethod(lambda: b"")

        assert ml._detect_variant(str(dll), HdmiLib()) == "hdmi"
        assert ml._detect_variant(str(dll), ModernLib()) == "pcie_modern_6"

    @pytest.mark.parametrize("variant, n_args", [
        ("pcie_modern_3", 3), ("pcie_modern_6", 6), ("pcie_modern_8", 8),
        ("pcie_legacy", 8), ("hdmi", 2),
    ])
    def test_write_dispatch_arity(self, variant, n_args):
        """_set_phase_hw issues the Write_image call with the arity the
        detected SDK generation expects."""
        import numpy as np
        from slmsuite_tpu.hardware.slms.meadowlark import Meadowlark

        calls = {}

        class FakeLib:
            def Write_image(self, *args):
                calls["write"] = len(args)
                return 1

            def ImageWriteComplete(self, *args):
                calls["complete"] = len(args)
                return 1

        slm = Meadowlark.__new__(Meadowlark)
        slm.sdk_variant = variant
        slm.sdk_interface = "hdmi" if variant == "hdmi" else "pcie"
        slm.slm_number = 1
        slm.slm_lib = FakeLib()
        slm.bitdepth = 8
        Meadowlark._set_phase_hw(slm, np.zeros((4, 4), np.uint8))
        assert calls["write"] == n_args
        if variant != "hdmi":
            assert calls["complete"] == 2

    def test_hdmi_three_arg_write(self):
        """The (0, 3) HDMI header trace switches to the board-first
        3-argument Write_image revision."""
        import numpy as np
        from slmsuite_tpu.hardware.slms.meadowlark import Meadowlark

        calls = {}

        class FakeLib:
            def Write_image(self, *args):
                calls["write"] = len(args)

        slm = Meadowlark.__new__(Meadowlark)
        slm.sdk_variant = "hdmi"
        slm.sdk_interface = "hdmi"
        slm.slm_number = 1
        slm.slm_lib = FakeLib()
        slm.bitdepth = 8
        prior = dict(Meadowlark._trace)
        Meadowlark._trace["hdmi"] = (0, 3)
        try:
            Meadowlark._set_phase_hw(slm, np.zeros((4, 4), np.uint8))
        finally:
            Meadowlark._trace = prior
        assert calls["write"] == 3

    def test_close_refcounts_shared_sdk(self):
        """Two boards share one SDK handle; Delete_SDK only runs when
        the LAST board closes."""
        from slmsuite_tpu.hardware.slms.meadowlark import Meadowlark

        calls = []

        class FakeLib:
            def Delete_SDK(self):
                calls.append("delete")

        lib = FakeLib()
        variant = "pcie_modern_6"
        prior = (dict(Meadowlark._lib_cache), dict(Meadowlark._refcount),
                 dict(Meadowlark._board_count))
        Meadowlark._lib_cache[variant] = lib
        Meadowlark._refcount[variant] = 2
        try:
            boards = []
            for n in (1, 2):
                slm = Meadowlark.__new__(Meadowlark)
                slm.sdk_variant = variant
                slm.slm_lib = lib
                boards.append(slm)
            boards[0].close()
            assert calls == []  # Sibling still open.
            assert Meadowlark._refcount[variant] == 1
            boards[1].close()
            assert calls == ["delete"]
            assert variant not in Meadowlark._lib_cache
            boards[1].close()  # Idempotent.
            assert calls == ["delete"]
        finally:
            (Meadowlark._lib_cache, Meadowlark._refcount,
             Meadowlark._board_count) = prior

    def test_sdk_variant_table_complete(self):
        """Every variant names its geometry/telemetry calls and a write
        style; every header trace maps to exactly one variant."""
        from slmsuite_tpu.hardware.slms.meadowlark import SDK_VARIANTS

        seen = {}
        for name, spec in SDK_VARIANTS.items():
            for key in ("width", "height", "depth", "serial",
                        "temperature", "coverglass"):
                fn, takes_board = spec[key]
                assert fn is None or isinstance(fn, str)
                assert isinstance(takes_board, bool)
            assert spec["write"] in ("hdmi", "pcie_3", "pcie_6", "pcie_8")
            for trace in spec["traces"]:
                assert trace not in seen, f"{trace} in both {seen.get(trace)} and {name}"
                seen[trace] = name

    def _bare(self, variant, lib):
        from slmsuite_tpu.hardware.slms.meadowlark import Meadowlark

        slm = Meadowlark.__new__(Meadowlark)
        slm.sdk_variant = variant
        slm.sdk_interface = "hdmi" if variant == "hdmi" else "pcie"
        slm.slm_number = 1
        slm.slm_lib = lib
        return slm

    def test_legacy_telemetry_not_implemented(self):
        """The legacy HSP SDK has no temperature/coverglass exports; the
        driver raises NotImplementedError like the reference
        (meadowlark.py:496-499,527-530) instead of a ctypes
        AttributeError."""
        slm = self._bare("pcie_legacy", object())
        with pytest.raises(NotImplementedError):
            slm.get_temperature()
        with pytest.raises(NotImplementedError):
            slm.get_coverglass_voltage()

    def test_modern3_coverglass_uses_get_cover_voltage(self):
        """All modern PCIe generations (incl. 3-argument) read the
        coverglass via Get_cover_voltage (ref meadowlark.py:515-527) —
        Read_coverglass_voltage does not exist in those DLLs."""
        import ctypes

        calls = []

        # ctypes functions take restype assignment; emulate with a
        # plain callable carrying a writable restype attribute.
        def fn(board):
            calls.append(int(board.value))
            return 3.5

        fn.restype = None
        lib = type("L", (), {"Get_cover_voltage": staticmethod(fn)})
        slm = self._bare("pcie_modern_3", lib)
        assert slm.get_coverglass_voltage() == 3.5
        assert calls == [1]
        assert fn.restype is ctypes.c_double

    def test_output_trigger_on_refresh_gating(self):
        """on_refresh is only honored on the modern 8-argument SDK;
        pcie_legacy shares the write arity but warns and ignores."""
        slm8 = self._bare("pcie_modern_8", object())
        slm8._output_pulse_refresh = False
        slm8.set_output_trigger(on=True, on_refresh=True)
        assert slm8._output_pulse_refresh is True

        legacy = self._bare("pcie_legacy", object())
        legacy._output_pulse_refresh = False
        with pytest.warns(UserWarning, match="on_refresh"):
            legacy.set_output_trigger(on=True, on_refresh=True)
        assert legacy._output_pulse_refresh is False


class TestHamamatsuLogic:
    def _fake_lib(self, start_mode=1):
        import ctypes

        class FakeLib:
            def __init__(self):
                self.mode = start_mode
                self.calls = []
                self.frames = {}
                self.displayed = None

            def Open_Dev(self, ids_ref, size):
                ids_ref._obj[0] = 7
                return 1

            def Close_Dev(self, ids_ref, size):
                self.calls.append("close")
                return 1

            def Check_HeadSerial(self, bid, serial_ref, size):
                serial_ref._obj.value = 12345
                return 1

            def Mode_Check(self, bid, mode_ref):
                mode_ref._obj.value = self.mode
                return 1

            def Mode_Select(self, bid, mode):
                self.mode = mode.value
                self.calls.append(("mode", mode.value))
                return 1

            def Reboot(self, bid):
                self.calls.append("reboot")
                return 1

            def Write_FMemArray(self, bid, ptr, size, w, h, slot):
                self.frames[slot.value] = (w.value, h.value, size.value)
                return 1

            def Change_DispSlot(self, bid, slot):
                self.displayed = slot.value
                return 1

        return FakeLib()

    def _make(self, monkeypatch, lib):
        from slmsuite_tpu.hardware.slms import hamamatsu as hm

        monkeypatch.setattr(hm, "_load_dll", lambda dll_path=None: lib)
        return hm.Hamamatsu(resolution=(64, 32), verbose=False)

    def test_init_usb_mode_writes_frame(self, monkeypatch):
        lib = self._fake_lib(start_mode=1)
        slm = self._make(monkeypatch, lib)
        assert slm.serial == 12345
        assert "reboot" not in lib.calls
        # set_phase(None) in init uploaded a zero frame to slot 0.
        assert lib.frames[0] == (64, 32, 64 * 32)
        assert lib.displayed == 0

    def test_init_dvi_mode_switches_and_reboots(self, monkeypatch):
        lib = self._fake_lib(start_mode=0)
        slm = self._make(monkeypatch, lib)
        assert ("mode", 1) in lib.calls
        assert "reboot" in lib.calls
        assert slm.get_mode() == 1

    def test_set_mode_validates(self, monkeypatch):
        lib = self._fake_lib()
        slm = self._make(monkeypatch, lib)
        with pytest.raises(ValueError):
            slm.set_mode(3)

    def test_slot_select(self, monkeypatch):
        import numpy as np

        lib = self._fake_lib()
        slm = self._make(monkeypatch, lib)
        slm._set_phase_hw(np.zeros((32, 64), np.uint8), slot_number=2)
        assert 2 in lib.frames and lib.displayed == 2


class TestPLMBitpack:
    def test_bitpack_8(self):
        from slmsuite_tpu.hardware.slms.texasinstruments import PLM

        rng = np.random.default_rng(0)
        maps = [rng.integers(0, 2, (16, 16), dtype=np.uint8) for _ in range(8)]
        packed = PLM.bitpack(maps)
        assert packed.shape == (1, 16, 16) and packed.dtype == np.uint8
        # Each source bitmap is recoverable from its bit plane.
        for k, bm in enumerate(maps):
            np.testing.assert_array_equal((packed[0] >> k) & 1, bm)

    def test_bitpack_24(self):
        from slmsuite_tpu.hardware.slms.texasinstruments import PLM

        rng = np.random.default_rng(1)
        maps = [rng.integers(0, 2, (8, 8), dtype=np.uint8) for _ in range(24)]
        packed = PLM.bitpack(maps)
        assert packed.shape == (3, 8, 8)
        for k, bm in enumerate(maps):
            np.testing.assert_array_equal((packed[k // 8] >> (k % 8)) & 1, bm)

    def test_bitpack_bad_count(self):
        from slmsuite_tpu.hardware.slms.texasinstruments import PLM

        with pytest.raises(ValueError):
            PLM.bitpack([np.zeros((4, 4), np.uint8)] * 7)

    def test_load_model_config(self):
        from slmsuite_tpu.hardware.slms.texasinstruments import PLM

        config = PLM.load_model_config(PLM.get_model_list()[0])
        assert isinstance(config, dict)
        with pytest.raises(ValueError):
            PLM.load_model_config("not-a-model")


class TestSantecStatus:
    def test_parse_ok(self):
        from slmsuite_tpu.hardware.slms.santec import Santec

        assert Santec._parse_status(0) == (0, "SLM_OK", "All good!")

    def test_parse_error_raises(self):
        from slmsuite_tpu.hardware.slms.santec import Santec

        with pytest.raises(RuntimeError, match="SLM_BS"):
            Santec._parse_status(2)

    def test_parse_error_warns(self):
        from slmsuite_tpu.hardware.slms.santec import Santec

        with pytest.warns(UserWarning, match="USB"):
            status, name, _ = Santec._parse_status(-200, raise_error=False)
        assert (status, name) == (-200, "SLM_NOT_OPEN_USB")

    def test_parse_unknown(self):
        from slmsuite_tpu.hardware.slms.santec import Santec

        with pytest.raises(ValueError):
            Santec._parse_status(42424)


def _fake_gl_stack(gl_version):
    """Fake pyglet + gl modules recording calls, for headless GL smoke."""
    import ctypes
    import types

    calls = []

    def record(name):
        def fn(*args, **kwargs):
            calls.append(name)
        return fn

    class GLuint(ctypes.c_uint32):
        pass

    gl = types.SimpleNamespace(
        GLuint=GLuint,
        GLubyte=ctypes.c_ubyte,
        GLfloat=ctypes.c_float,
        gl_info=types.SimpleNamespace(
            have_version=lambda major, minor=0: (major, minor) <= gl_version
        ),
    )
    for name in (
        "glGenTextures", "glBindTexture", "glTexParameteri", "glTexImage2D",
        "glTexSubImage2D", "glEnable", "glFlush", "glActiveTexture",
        "glPushClientAttrib", "glInterleavedArrays", "glDrawArrays",
        "glPopClientAttrib",
    ):
        setattr(gl, name, record(name))
    for const in (
        "GL_TEXTURE_2D", "GL_TEXTURE_MAG_FILTER", "GL_TEXTURE_MIN_FILTER",
        "GL_NEAREST", "GL_RGBA8", "GL_RGBA", "GL_UNSIGNED_BYTE",
        "GL_TRIANGLE_STRIP", "GL_TEXTURE0", "GL_CLIENT_VERTEX_ARRAY_BIT",
        "GL_T4F_V4F", "GL_QUADS",
    ):
        setattr(gl, const, 0)

    class FakeWindow:
        WINDOW_STYLE_BORDERLESS = "borderless"

        def __init__(self, width, height, screen=None, caption="", style=None,
                     vsync=True, visible=True):
            self.width, self.height = width, height
            self.handlers = {}
            self.closed = False

        def set_location(self, x, y): pass
        def set_mouse_visible(self, visible): pass
        def push_handlers(self, **kwargs): self.handlers.update(kwargs)
        def switch_to(self): calls.append("switch_to")
        def flip(self): calls.append("flip")
        def dispatch_events(self): pass
        def close(self): self.closed = True

    class FakeShader:
        def use(self): calls.append("shader.use")

        def vertex_list(self, count, mode, **kwargs):
            calls.append("vertex_list")
            return types.SimpleNamespace(draw=record("vertex_list.draw"))

    class FakeProjection2D:
        def set(self, *args): calls.append("projection2d.set")

    pyglet = types.SimpleNamespace(
        window=types.SimpleNamespace(
            Window=FakeWindow, Projection2D=FakeProjection2D
        ),
        graphics=types.SimpleNamespace(
            get_default_blit_shader=lambda: FakeShader()
        ),
    )
    screen = types.SimpleNamespace(x=0, y=0, width=64, height=64)
    return pyglet, gl, screen, calls


@pytest.mark.parametrize("gl_version,mode", [((4, 6), "modern"), ((2, 1), "legacy")])
def test_slm_window_headless_smoke(monkeypatch, gl_version, mode):
    """Both GL pipelines execute end-to-end against a fake GL stack."""
    from slmsuite_tpu.hardware import _pyglet as P

    fake_pyglet, fake_gl, screen, calls = _fake_gl_stack(gl_version)
    monkeypatch.setattr(P, "pyglet", fake_pyglet)
    monkeypatch.setattr(P, "gl", fake_gl)

    window = P.SLMWindow((32, 48), screen)
    assert window.gl_mode == mode

    display = (np.arange(32 * 48) % 256).astype(np.uint8).reshape(32, 48)
    window.render(display)
    # The staging buffer holds the grayscale data in the RGB planes with
    # opaque alpha, and the persistent texture was re-uploaded.
    np.testing.assert_array_equal(window.buffer[..., 0], display)
    np.testing.assert_array_equal(window.buffer[..., 3], 255)
    assert calls.count("glTexSubImage2D") >= 2  # Initial draw + render.
    assert "flip" in calls
    if mode == "modern":
        assert "vertex_list.draw" in calls
    else:
        assert "glDrawArrays" in calls and "glInterleavedArrays" in calls
        # Orientation parity with the modern path: GL's ortho is
        # bottom-up, so buffer row 0 (texture v = 0) must land on the
        # window TOP (vertex y = h) — a v=0-at-y=0 quad displays the SLM
        # phase vertically flipped.
        quad = np.array(window._quad, np.float32).reshape(4, 8)
        h = float(window.shape[0])
        vb = window._tex_ratio[0]
        for u, v, _, _, x, y, _, _ in quad:
            if y == 0.0:
                assert v == np.float32(vb)
            if y == h:
                assert v == 0.0

    with pytest.raises(ValueError):
        window.render(np.zeros((8, 8), np.uint8))
    window.close()
    assert window.window.closed


def test_window_manager_multi_window(monkeypatch):
    """Two windows coexist on separate render threads; shutdown reaps both."""
    from slmsuite_tpu.hardware import _pyglet as P

    fake_pyglet, fake_gl, screen, _ = _fake_gl_stack((4, 6))
    monkeypatch.setattr(P, "pyglet", fake_pyglet)
    monkeypatch.setattr(P, "gl", fake_gl)

    manager = P.WindowManager()
    a = manager.create_window((16, 16), screen, caption="A")
    b = manager.create_window((16, 16), screen, caption="B")
    assert a is not b and a.window is not None and b.window is not None

    # Renders execute on each window's own thread.
    a.render(np.full((16, 16), 7, np.uint8))
    b.render(np.full((16, 16), 9, np.uint8))
    assert int(a.window.buffer[0, 0, 0]) == 7
    assert int(b.window.buffer[0, 0, 0]) == 9

    manager.shutdown()
    import time

    for _ in range(100):
        if not manager._threads and a.window.window.closed and b.window.window.closed:
            break
        time.sleep(0.01)
    assert not manager._threads


class TestVendorDataTables:
    """Package-data vendor tables match the reference's files
    (ref slms/texas_instruments.yaml, slms/meadowlark.csv)."""

    def test_plm_model_db_matches_reference(self):
        import os

        import yaml

        from slmsuite_tpu.hardware.slms.texasinstruments import PLM_MODELS

        ref_path = "/root/reference/slmsuite/hardware/slms/texas_instruments.yaml"
        if not os.path.isfile(ref_path):
            pytest.skip("reference checkout not mounted")
        with open(ref_path) as f:
            ref_db = yaml.safe_load(f)

        assert set(PLM_MODELS) == set(ref_db)
        for key, ref_spec in ref_db.items():
            ours = PLM_MODELS[key]
            assert ours["name"] == ref_spec["name"]
            assert ours["shape"] == tuple(ref_spec["shape"])
            # Reference stores pitch in meters; ours in micrometers.
            np.testing.assert_allclose(
                np.asarray(ours["pitch_um"]) * 1e-6, ref_spec["pitch"]
            )
            np.testing.assert_allclose(
                ours["displacement_ratios"], ref_spec["displacement_ratios"]
            )
            assert ours["memory_lut"] == tuple(ref_spec["memory_lut"])
            assert ours["electrode_layout"] == tuple(
                tuple(row) for row in ref_spec["electrode_layout"]
            )
            assert ours["data_flip"] == tuple(
                bool(v) for v in ref_spec["data_flip"]
            )

    def test_plm_driver_uses_db(self):
        from slmsuite_tpu.hardware.slms import texasinstruments as ti

        # Every listed model is loadable through the public lookup.
        for model in ti.PLM.get_model_list():
            spec = ti.PLM.load_model_config(model)
            assert len(spec["displacement_ratios"]) == 16
            assert sorted(spec["memory_lut"]) == list(range(16))

    def test_meadowlark_sdk_table(self):
        from slmsuite_tpu.hardware.slms.meadowlark import sdk_feature_table

        table = sdk_feature_table()
        assert table["get_temperature"] == {
            "hdmi": True, "pcie": True, "legacy_pcie": False
        }
        assert table["multiple_slms_via_slm_number"]["hdmi"] is False
        assert table["multiple_slms_via_slm_number"]["pcie"] is True
        assert "1024 x 1024" in table["supported_resolutions"]["pcie"]
        assert table["blink_version"]["legacy_pcie"] == "<=1.1.4.867"


class TestMeadowlarkLutLocator:
    def test_single_file(self, tmp_path):
        from slmsuite_tpu.hardware.slms.meadowlark import Meadowlark

        (tmp_path / "a.lut").write_text("x")
        assert Meadowlark._locate_lut_file(tmp_path).endswith("a.lut")

    def test_prefers_matching_dimensions(self, tmp_path):
        """Meadowlark ships per-device LUTs named like slm5758_at532;
        with several candidates, the one carrying this SLM's dimensions
        wins (ref meadowlark.py:968-1018)."""
        from slmsuite_tpu.hardware.slms.meadowlark import Meadowlark

        (tmp_path / "slm1234_at532_1920x1152.lut").write_text("x")
        (tmp_path / "slm5678_at532_1024x1024.lut").write_text("x")
        chosen = Meadowlark._locate_lut_file(tmp_path, slm_shape=(1152, 1920))
        assert "1920x1152" in chosen

    def test_multiple_falls_back_most_recent(self, tmp_path):
        import time as _t

        from slmsuite_tpu.hardware.slms.meadowlark import Meadowlark

        (tmp_path / "old.lut").write_text("x")
        _t.sleep(0.05)
        (tmp_path / "new.lut").write_text("x")
        with pytest.warns(UserWarning, match="most recent"):
            chosen = Meadowlark._locate_lut_file(tmp_path)
        assert chosen.endswith("new.lut")

    def test_searches_recursively(self, tmp_path):
        from slmsuite_tpu.hardware.slms.meadowlark import Meadowlark

        sub = tmp_path / "LUT"
        sub.mkdir()
        (sub / "slm9_at780.lut").write_text("x")
        assert Meadowlark._locate_lut_file(tmp_path).endswith("slm9_at780.lut")

    def test_empty_raises(self, tmp_path):
        from slmsuite_tpu.hardware.slms.meadowlark import Meadowlark

        with pytest.raises(FileNotFoundError):
            Meadowlark._locate_lut_file(tmp_path)


class TestNativePLMPack:
    """The fused C electrode-packing kernel is bit-identical to the
    numpy passes across models (layouts/flips) and random frames."""

    @pytest.mark.parametrize("model", ["p47", "p67"])
    def test_electrode_map_native_matches_numpy(self, model):
        from slmsuite_tpu.hardware.slms.texasinstruments import PLM_MODELS
        from slmsuite_tpu.native import plm_electrode_map_native

        spec = PLM_MODELS[model]
        layout = spec["electrode_layout"]
        flip_y, flip_x = spec["data_flip"]
        rng = np.random.default_rng(hash(model) % 2**31)
        lut = rng.integers(0, 16, 256).astype(np.uint8)
        display = rng.integers(0, 256, (24, 40)).astype(np.uint8)

        # Numpy reference (the _electrode_map passes, inlined).
        codes = lut[display]
        expected = np.zeros((48, 80), np.uint8)
        for dy in range(2):
            for dx in range(2):
                expected[dy::2, dx::2] = ((codes >> layout[dy][dx]) & 1) * 255
        if flip_y:
            expected = expected[::-1, :]
        if flip_x:
            expected = expected[:, ::-1]

        out = np.empty((48, 80), np.uint8)
        ok = plm_electrode_map_native(
            display, out,
            lut, [layout[dy][dx] for dy in range(2) for dx in range(2)],
            flip_y, flip_x,
        )
        if not ok:
            pytest.skip("no C compiler available")
        np.testing.assert_array_equal(out, expected)

    def test_bitpack8_native_matches_numpy(self):
        from slmsuite_tpu.native import plm_bitpack8_native

        rng = np.random.default_rng(7)
        maps = rng.integers(0, 2, (8, 16, 24)).astype(np.uint8)
        out = np.empty((16, 24), np.uint8)
        ok = plm_bitpack8_native(np.ascontiguousarray(maps), out)
        if not ok:
            pytest.skip("no C compiler available")
        shifts = np.arange(8, dtype=np.uint8)[:, None, None]
        expected = np.bitwise_or.reduce(
            np.left_shift(maps & 1, shifts), axis=0
        )
        np.testing.assert_array_equal(out, expected)

    def test_pack_frame_through_driver(self):
        """_pack_frame (native or fallback) matches _electrode_map."""
        from slmsuite_tpu.hardware.slms.texasinstruments import PLM

        plm = PLM.__new__(PLM)  # No hardware: exercise the pure helpers.
        plm.model = dict(PLM.load_model_config("p67"))
        rng = np.random.default_rng(2)
        delta = None  # _init unused; build the LUT directly.
        plm._gray_to_code = rng.integers(0, 16, 256).astype(np.uint8)
        display = rng.integers(0, 256, (32, 56)).astype(np.uint8)
        fused = plm._pack_frame(display)
        manual = plm._electrode_map(plm._gray_to_code[display])
        np.testing.assert_array_equal(fused, manual)
