"""
Remote hardware: serve SLMs and cameras over TCP, drive them remotely.

Starts a :class:`~slmsuite_tpu.hardware.remote.Server` hosting a
simulated SLM + camera (in a thread here; normally on the lab machine),
then connects :class:`RemoteSLM` / :class:`RemoteCamera` clients and
runs a write-phase / grab-image round trip over the wire. (Reference
surface: ``slmsuite/hardware/remote.py`` — the protocol is
wire-compatible, so either side's server works with either side's
clients; see ``tests/test_reference_differential.py``.)
"""

import threading
import time

import numpy as np

from _rig import save_figure

from slmsuite_tpu.hardware.cameras.remote import RemoteCamera
from slmsuite_tpu.hardware.cameras.simulated import SimulatedCamera
from slmsuite_tpu.hardware.remote import Server
from slmsuite_tpu.hardware.slms.remote import RemoteSLM
from slmsuite_tpu.hardware.slms.simulated import SimulatedSLM
from slmsuite_tpu.holography.toolbox.phase import blaze


def _free_port():
    import socket

    sock = socket.socket()
    sock.bind(("", 0))
    port = sock.getsockname()[1]
    sock.close()
    return port


def main():
    # --- 1. The "lab machine": simulated rig behind a TCP server. --------
    slm = SimulatedSLM((256, 256), pitch_um=(8, 8), wav_um=0.78)
    slm.name = "demo-slm"
    cam = SimulatedCamera(slm, (256, 256), pitch_um=(4, 4))
    cam.name = "demo-cam"
    cam.set_exposure(1.0)

    port = _free_port()
    server = Server([slm, cam], port=port)
    thread = threading.Thread(
        target=server.listen, kwargs={"verbose": False}, daemon=True
    )
    thread.start()
    time.sleep(0.5)
    print(f"server listening on localhost:{port} (slm + camera)")

    # --- 2. The "control machine": remote proxies over the wire. ---------
    rslm = RemoteSLM("demo-slm", host="localhost", port=port)
    rcam = RemoteCamera("demo-cam", host="localhost", port=port)
    print(f"connected: RemoteSLM {rslm.shape}, RemoteCamera {rcam.shape}")

    # Write a blaze through the proxy; the far-field spot moves.
    rslm.set_phase(blaze(grid=rslm, vector=(0.01, 0.005)))
    img = np.asarray(rcam.get_image())
    peak = np.unravel_index(np.argmax(img), img.shape)
    print(f"image over the wire: shape {img.shape}, peak at {peak}")
    assert peak != (img.shape[0] // 2, img.shape[1] // 2)  # Spot deflected.

    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    axes[0].imshow(np.asarray(rslm.phase), cmap="twilight")
    axes[0].set_title("phase written via RemoteSLM")
    axes[1].imshow(img, cmap="magma")
    axes[1].set_title("image read via RemoteCamera")
    for ax in axes:
        ax.set_xticks([]), ax.set_yticks([])
    del fig
    save_figure("remote_hardware.png")

    # --- 3. Latency probe (protocol ping). --------------------------------
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        rcam.flush()
    dt = (time.perf_counter() - t0) / n
    print(f"mean round-trip latency (flush): {1e3 * dt:.2f} ms over loopback")


if __name__ == "__main__":
    main()
