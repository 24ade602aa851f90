"""
Windowing backend for :class:`~slmsuite_tpu.hardware.slms.screenmirrored.ScreenMirrored`.

OpenGL contexts are thread-affine, so each SLM window lives on a dedicated
render thread (:class:`WindowThread`) that owns the :mod:`pyglet` window and
services a submit queue; callers hand it work and receive
:class:`concurrent.futures.Future` handles. :class:`WindowManager` is the
process-wide registry that creates/destroys these threads and tears them
down at interpreter exit.

Parity: reference ``slmsuite/hardware/_pyglet.py`` (``_Window``,
``_WindowThread``, ``_WindowManager``, ``get_pyglet_display``).

:mod:`pyglet` is imported lazily and guarded — this module imports cleanly
on headless machines without it; instantiating a window raises a clear
error instead.
"""

import atexit
import queue
import threading
from concurrent.futures import Future

import numpy as np

try:
    import pyglet
    import pyglet.gl as gl
except ImportError:
    pyglet = None
    gl = None


def require_pyglet():
    """Raise a helpful error if :mod:`pyglet` is unavailable."""
    if pyglet is None:
        raise ImportError(
            "pyglet is required for screen-mirrored SLM display. "
            "Install it with `pip install pyglet`."
        )


def get_display():
    """
    Return the default pyglet display, across pyglet API generations
    (``pyglet.display`` in 2.x, ``pyglet.canvas`` in 1.x).
    """
    require_pyglet()
    if hasattr(pyglet, "display") and hasattr(pyglet.display, "get_display"):
        return pyglet.display.get_display()
    return pyglet.canvas.get_display()


def get_screens():
    """Return the list of physical screens attached to the default display."""
    return get_display().get_screens()


class SLMWindow:
    """
    Borderless window covering one screen, displaying integer phase data.

    The window swallows all user input (an SLM "monitor" must never react
    to stray clicks or keystrokes) and redraws the last-written frame on
    expose. 8-bit data is uploaded as a single-channel texture each write.

    Must only be used from the thread that created it (GL thread affinity);
    :class:`WindowThread` enforces this.
    """

    def __init__(self, shape, screen, caption="SLM"):
        require_pyglet()
        self.shape = tuple(shape)  # (height, width)

        self.window = pyglet.window.Window(
            width=screen.width,
            height=screen.height,
            screen=screen,
            caption=caption,
            style=getattr(
                pyglet.window.Window, "WINDOW_STYLE_BORDERLESS", "borderless"
            ),
            vsync=False,
            visible=True,
        )
        self.window.set_location(screen.x, screen.y)
        self.window.set_mouse_visible(False)

        # Swallow every input event so the OS never routes interaction
        # (focus changes, accidental close) to the SLM surface.
        for event in (
            "on_mouse_press", "on_mouse_release", "on_mouse_motion",
            "on_mouse_drag", "on_key_press", "on_key_release", "on_close",
        ):
            self.window.push_handlers(**{event: self._swallow})
        self.window.push_handlers(on_expose=self._on_expose)

        self._image = None
        self._buffer = np.zeros(self.shape, dtype=np.uint8)
        self.render(self._buffer)

    @staticmethod
    def _swallow(*args, **kwargs):
        return True  # pyglet.event.EVENT_HANDLED

    def _on_expose(self):
        self._blit()
        return True

    def render(self, display):
        """Upload ``display`` (uint8, :attr:`shape`) and flip the buffer."""
        display = np.ascontiguousarray(display, dtype=np.uint8)
        if display.shape != self.shape:
            raise ValueError(
                f"Display shape {display.shape} != window data shape {self.shape}."
            )
        self._buffer = display
        h, w = self.shape
        # Grayscale -> RGB expansion; single-channel ('R') textures render
        # red-only on common drivers. 16-bit support would pack into RG here.
        rgb = np.repeat(display[::-1, :, None], 3, axis=2)  # GL is bottom-up.
        self._image = pyglet.image.ImageData(w, h, "RGB", rgb.tobytes())
        self._blit()

    def _blit(self):
        if self._image is None:
            return
        self.window.switch_to()
        self.window.clear()
        # Nearest-neighbor: phase pixels must map 1:1, never interpolated.
        gl.glTexParameteri(gl.GL_TEXTURE_2D, gl.GL_TEXTURE_MAG_FILTER, gl.GL_NEAREST)
        self._image.blit(0, 0, width=self.window.width, height=self.window.height)
        self.window.flip()

    def close(self):
        self.window.close()


class WindowThread(threading.Thread):
    """
    Dedicated render thread owning one :class:`SLMWindow`.

    Work is submitted with :meth:`submit` and returns a
    :class:`~concurrent.futures.Future`; the loop alternates between
    servicing the queue and dispatching pyglet events.
    """

    _POLL_S = 0.005

    def __init__(self, shape, screen, caption="SLM", manager=None):
        super().__init__(daemon=True, name=f"slm-window-{caption}")
        self._args = (shape, screen, caption)
        self._queue = queue.Queue()
        self._manager = manager
        self._ready = threading.Event()
        self._startup_error = None
        self.window = None
        self._closing = False

        self.start()
        self._ready.wait()
        if self._startup_error is not None:
            raise self._startup_error

    def run(self):
        try:
            self.window = SLMWindow(*self._args)
        except Exception as err:  # Surface construction errors to the caller.
            self._startup_error = err
            self._ready.set()
            return
        self._ready.set()

        while not self._closing:
            try:
                future, func, args, kwargs = self._queue.get(timeout=self._POLL_S)
            except queue.Empty:
                self.window.window.dispatch_events()
                continue
            if not future.set_running_or_notify_cancel():
                continue
            try:
                future.set_result(func(*args, **kwargs))
            except Exception as err:
                future.set_exception(err)

        self.window.close()
        if self._manager is not None:
            self._manager.remove_thread(self)

    def submit(self, func, *args, **kwargs):
        """Schedule ``func(*args, **kwargs)`` on the render thread."""
        future = Future()
        self._queue.put((future, func, args, kwargs))
        return future

    def render(self, display, block=True):
        """Render ``display`` on the window; optionally wait for the flip."""
        future = self.submit(lambda: self.window.render(display))
        if block:
            future.result()
        return future

    def close(self):
        self._closing = True
        if threading.current_thread() is not self:
            self.join(timeout=2)


class WindowManager:
    """Process-wide registry of :class:`WindowThread` instances."""

    _instance = None
    _lock = threading.Lock()

    @classmethod
    def get_instance(cls):
        with cls._lock:
            if cls._instance is None:
                cls._instance = cls()
                atexit.register(cls._instance.shutdown)
            return cls._instance

    def __init__(self):
        self._threads = []

    def create_window(self, shape, screen, caption="SLM"):
        thread = WindowThread(shape, screen, caption, manager=self)
        self._threads.append(thread)
        return thread

    def remove_thread(self, thread):
        if thread in self._threads:
            self._threads.remove(thread)

    def shutdown(self):
        for thread in list(self._threads):
            thread.close()
        self._threads = []
