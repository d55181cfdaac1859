"""HTTP live-preview server (the reference's GLFW progressive display
analog — include/Renderer.hpp:316-356 re-uploads the framebuffer every
frame; here a browser polls /frame.png while the render runs)."""

import urllib.error
import urllib.request

import numpy as np

from simplepathtracer_tpu import io as sptio
from simplepathtracer_tpu.preview import PreviewServer


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, r.read()


def test_preview_server_serves_frames():
    srv = PreviewServer(port=0, host="127.0.0.1")
    try:
        status, body = _get(srv.port, "/")
        assert status == 200 and b"simplepathtracer_tpu" in body

        # No frame yet -> 404.
        try:
            status, _ = _get(srv.port, "/frame.png")
            assert False, "expected 404 before first frame"
        except urllib.error.HTTPError as e:
            assert e.code == 404

        img = np.linspace(0, 1, 8 * 6 * 3, dtype=np.float32).reshape(6, 8, 3)
        srv.update(img, status="3/8 spp")
        status, png = _get(srv.port, "/frame.png")
        assert status == 200 and png.startswith(b"\x89PNG")
        assert png == sptio.encode_png(img)
        status, st = _get(srv.port, "/status")
        assert st == b"3/8 spp"
    finally:
        srv.close()


def test_cli_http_preview_flag():
    from simplepathtracer_tpu.cli import main

    rc = main([
        "render", "--preset", "simple", "--width", "16", "--height", "8",
        "--spp", "4", "--max-depth", "2", "--no-pallas",
        "--http-preview", "--snapshot-every", "2",
        "-o", "/tmp/preview_cli_test.png", "-q",
    ])
    assert rc == 0
