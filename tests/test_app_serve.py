"""The dependency-free demo server (app.serve): upload → depth round trip.

The gradio UI (reference ``app.py:62-147``) cannot run in this image; the
stdlib fallback shares ``process_video`` and must serve the full flow:
form page, multipart upload + processing, and rendered video retrieval.
"""

import os
import socket
import threading
import urllib.request

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_serve_upload_roundtrip(tmp_path, rng):
    import app
    from video_depth_anything_tpu.io.video import save_video

    src = str(tmp_path / "clip.mp4")
    frames = (rng.rand(8, 48, 64, 3) * 255).astype(np.uint8)
    save_video(frames, src, fps=8)

    port = _free_port()
    srv = app.serve("127.0.0.1", port)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(base + "/", timeout=10) as r:
            page = r.read().decode()
        assert "Generate depth" in page

        boundary = "----vdaboundary"
        with open(src, "rb") as f:
            payload = f.read()
        parts = []
        for name, val in (
            ("encoder", "vits"), ("max_len", "6"), ("target_fps", "-1"),
            ("max_res", "1280"), ("input_size", "28"),
        ):
            parts.append(
                f"--{boundary}\r\nContent-Disposition: form-data; "
                f'name="{name}"\r\n\r\n{val}\r\n'.encode()
            )
        parts.append(
            f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="video"; filename="clip.mp4"\r\n'
            f"Content-Type: video/mp4\r\n\r\n".encode()
            + payload + b"\r\n"
        )
        body = b"".join(parts) + f"--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            base + "/process",
            data=body,
            headers={
                "Content-Type": f"multipart/form-data; boundary={boundary}"
            },
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            html = r.read().decode()
        assert "/files/" in html and "_depth.mp4" in html

        depth_name = html.split('src="/files/')[2].split('"')[0]
        with urllib.request.urlopen(
            base + "/files/" + depth_name, timeout=10
        ) as r:
            data = r.read()
            assert r.headers["Content-Type"] == "video/mp4"
        assert len(data) > 1000
    finally:
        srv.shutdown()
        srv.server_close()
    assert os.path.exists(src)
