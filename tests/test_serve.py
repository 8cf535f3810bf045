"""HTTP API tests: contract of POST /interpolate, GET /, /health, /model-info.

Exercises the real server over a live socket (the reference has no API tests
at all; its own N=1 request path 500s — SURVEY.md §8.9 — which is covered
here as a must-succeed case).
"""

import io
import json
import os
import urllib.request

import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.config import ModelConfig, ServeConfig
from ai_based_frame_interpolation_tpu.infer.engine import InterpolationEngine
from ai_based_frame_interpolation_tpu.serve.server import (
    HTTPError, Part, Server, parse_multipart, validate_image_part)


def encode_png(shape=(64, 64), value=128):
    import cv2

    img = np.full(shape, value, np.uint8)
    ok, buf = cv2.imencode(".png", img)
    assert ok
    return buf.tobytes()


def multipart_body(fields):
    boundary = "testboundary123"
    out = io.BytesIO()
    for name, value in fields.items():
        out.write(f"--{boundary}\r\n".encode())
        if isinstance(value, tuple):
            fname, ctype, data = value
            out.write(f'Content-Disposition: form-data; name="{name}"; '
                      f'filename="{fname}"\r\n'.encode())
            out.write(f"Content-Type: {ctype}\r\n\r\n".encode())
            out.write(data)
        else:
            out.write(f'Content-Disposition: form-data; name="{name}"'
                      '\r\n\r\n'.encode())
            out.write(str(value).encode())
        out.write(b"\r\n")
    out.write(f"--{boundary}--\r\n".encode())
    return out.getvalue(), f"multipart/form-data; boundary={boundary}"


@pytest.fixture(scope="module")
def server():
    engine = InterpolationEngine.random_init(ModelConfig(base_width=4))
    srv = Server(engine, ServeConfig(host="127.0.0.1", port=0),
                 resolution=(64, 64))
    srv.start_background()
    yield srv
    srv.shutdown()


def request(server, path, method="GET", body=None, ctype=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}", data=body, method=method)
    if ctype:
        req.add_header("Content-Type", ctype)
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def test_index_catalog(server):
    status, _, body = request(server, "/")
    assert status == 200
    data = json.loads(body)
    assert "POST /interpolate" in data["endpoints"]


def test_health(server):
    status, _, body = request(server, "/health")
    assert status == 200
    assert json.loads(body)["status"] == "healthy"


def test_model_info(server):
    status, _, body = request(server, "/model-info")
    data = json.loads(body)
    assert status == 200
    assert data["parameters"] > 0
    assert data["config"]["channels"] == 1


def test_interpolate_returns_mp4(server):
    body, ctype = multipart_body({
        "frame1": ("a.png", "image/png", encode_png(value=50)),
        "frame2": ("b.png", "image/png", encode_png(value=200)),
        "num_intermediate": 3, "fps": 30})
    status, headers, blob = request(server, "/interpolate", "POST", body, ctype)
    assert status == 200, blob
    assert headers["Content-Type"] == "video/mp4"
    assert "3inter_30fps" in headers["Content-Disposition"]
    assert len(blob) > 100
    # decodable mp4 with 2 + 3 frames
    import tempfile, os, cv2

    with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as f:
        f.write(blob)
    cap = cv2.VideoCapture(f.name)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
    os.unlink(f.name)


def test_interpolate_n1_succeeds(server):
    # the reference 500s on num_intermediate=1 (SURVEY.md §8.9)
    body, ctype = multipart_body({
        "frame1": ("a.png", "image/png", encode_png()),
        "frame2": ("b.png", "image/png", encode_png()),
        "num_intermediate": 1, "fps": 30})
    status, headers, blob = request(server, "/interpolate", "POST", body, ctype)
    assert status == 200
    assert headers["Content-Type"] == "video/mp4"


@pytest.mark.parametrize("field,value,detail_part", [
    ("num_intermediate", 0, "num_intermediate"),
    ("num_intermediate", 11, "num_intermediate"),
    ("fps", 5, "fps"),
    ("fps", 61, "fps"),
])
def test_interpolate_param_validation(server, field, value, detail_part):
    fields = {"frame1": ("a.png", "image/png", encode_png()),
              "frame2": ("b.png", "image/png", encode_png()),
              "num_intermediate": 3, "fps": 30}
    fields[field] = value
    body, ctype = multipart_body(fields)
    status, _, blob = request(server, "/interpolate", "POST", body, ctype)
    assert status == 400
    assert detail_part in json.loads(blob)["detail"]


def test_interpolate_missing_file(server):
    body, ctype = multipart_body({
        "frame1": ("a.png", "image/png", encode_png())})
    status, _, blob = request(server, "/interpolate", "POST", body, ctype)
    assert status == 400
    assert "frame2" in json.loads(blob)["detail"]


def test_interpolate_bad_image_rejected(server):
    body, ctype = multipart_body({
        "frame1": ("a.txt", "text/plain", b"not an image"),
        "frame2": ("b.png", "image/png", encode_png())})
    status, _, blob = request(server, "/interpolate", "POST", body, ctype)
    assert status == 400


def test_interpolate_corrupt_image_rejected(server):
    body, ctype = multipart_body({
        "frame1": ("a.png", "image/png", b"\x89PNG garbage"),
        "frame2": ("b.png", "image/png", encode_png())})
    status, _, blob = request(server, "/interpolate", "POST", body, ctype)
    assert status == 400
    assert "decode" in json.loads(blob)["detail"]


def test_unknown_route_404(server):
    status, _, _ = request(server, "/nope")
    assert status == 404


def test_non_multipart_post_400(server):
    status, _, blob = request(server, "/interpolate", "POST", b"{}",
                              "application/json")
    assert status == 400


# ---------------------------------------------------------------------------
# Unit tests of the multipart parser / validators
# ---------------------------------------------------------------------------

def test_parse_multipart_roundtrip():
    body, ctype = multipart_body({
        "a": ("f.png", "image/png", b"\x01\x02"),
        "b": "hello"})
    parts = parse_multipart(body, ctype)
    assert parts["a"].filename == "f.png"
    assert parts["a"].data == b"\x01\x02"
    assert parts["b"].data == b"hello"
    assert parts["b"].filename is None


def test_parse_multipart_no_boundary():
    with pytest.raises(HTTPError):
        parse_multipart(b"x", "multipart/form-data")


def test_validate_size_cap():
    part = Part("frame1", "a.png", "image/png", b"x" * 100)
    with pytest.raises(HTTPError) as e:
        validate_image_part(part, "frame1", max_bytes=10)
    assert "limit" in e.value.detail


def test_interpolate_frames_endpoint(server):
    import base64

    body, ctype = multipart_body({
        "frame1": ("a.png", "image/png", encode_png(value=40)),
        "frame2": ("b.png", "image/png", encode_png(value=220)),
        "num_intermediate": 2})
    status, _, blob = request(server, "/interpolate-frames", "POST", body,
                              ctype)
    assert status == 200, blob
    data = json.loads(blob)
    assert len(data["frames"]) == 2
    import cv2

    png = base64.b64decode(data["frames"][0])
    img = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_GRAYSCALE)
    assert img.shape == (64, 64)


def test_evaluate_interpolation_endpoint(server):
    body, ctype = multipart_body({
        "frame1": ("a.png", "image/png", encode_png(value=40)),
        "ground_truth": ("g.png", "image/png", encode_png(value=130)),
        "frame2": ("b.png", "image/png", encode_png(value=220))})
    status, _, blob = request(server, "/evaluate-interpolation", "POST",
                              body, ctype)
    assert status == 200, blob
    metrics = json.loads(blob)["metrics_by_method"]
    assert set(metrics) == {"unet", "linear", "optical_flow"}
    # linear blend of 40 and 220 IS the 130 ground truth, so near-perfect
    assert metrics["linear"]["psnr"] > 40


def test_concurrent_interpolate_requests(server):
    import concurrent.futures

    body, ctype = multipart_body({
        "frame1": ("a.png", "image/png", encode_png(value=10)),
        "frame2": ("b.png", "image/png", encode_png(value=200)),
        "num_intermediate": 1, "fps": 30})

    def one(_):
        return request(server, "/interpolate", "POST", body, ctype)[0]

    with concurrent.futures.ThreadPoolExecutor(4) as pool:
        codes = list(pool.map(one, range(4)))
    assert codes == [200] * 4


def _tiny_video_bytes(num_frames=4, size=64):
    """A small grayscale-content mp4 (written as BGR) of a moving square."""
    import tempfile

    import cv2

    from ai_based_frame_interpolation_tpu.data.video import VideoWriter

    path = tempfile.mktemp(suffix=".mp4")
    with VideoWriter(path, fps=10.0) as w:
        for i in range(num_frames):
            img = np.zeros((size, size, 1), np.uint8)
            img[20:40, 8 * i:8 * i + 20] = 255
            w.write(img)
    with open(path, "rb") as f:
        blob = f.read()
    os.unlink(path)
    return blob


def test_interpolate_video_endpoint(server):
    """README-promised /interpolate-video (reference README.md:130-139,
    never implemented there): upload a clip -> 2x-fps MP4 back."""
    blob_in = _tiny_video_bytes(num_frames=4)
    body, ctype = multipart_body({
        "video": ("clip.mp4", "video/mp4", blob_in), "factor": 2})
    status, headers, blob = request(server, "/interpolate-video", "POST",
                                    body, ctype)
    assert status == 200, blob
    assert headers["Content-Type"] == "video/mp4"
    assert "interpolated_2x" in headers["Content-Disposition"]
    import tempfile

    import cv2

    with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as f:
        f.write(blob)
    cap = cv2.VideoCapture(f.name)
    # 4 in -> 2x = originals + 3 midpoints = 7 out, at 2x the input fps
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 7
    assert abs(cap.get(cv2.CAP_PROP_FPS) - 20.0) < 0.5
    cap.release()
    os.unlink(f.name)


def test_interpolate_video_validation(server):
    # bad factor (any integer 2-8 is now valid — 9 is out of contract)
    body, ctype = multipart_body({
        "video": ("clip.mp4", "video/mp4", _tiny_video_bytes(2)),
        "factor": 9})
    status, _, blob = request(server, "/interpolate-video", "POST", body, ctype)
    assert status == 400 and b"factor" in blob
    # missing file
    body, ctype = multipart_body({"factor": 2})
    status, _, blob = request(server, "/interpolate-video", "POST", body, ctype)
    assert status == 400 and b"video" in blob
    # non-video upload rejected
    body, ctype = multipart_body({
        "video": ("a.png", "image/png", encode_png()), "factor": 2})
    status, _, blob = request(server, "/interpolate-video", "POST", body, ctype)
    assert status == 400 and b"must be a video" in blob
    # corrupt video payload -> 400, not 500
    body, ctype = multipart_body({
        "video": ("clip.mp4", "video/mp4", b"not-a-video"), "factor": 2})
    status, _, blob = request(server, "/interpolate-video", "POST", body, ctype)
    assert status == 400


def test_interpolate_video_target_fps_requires_exact_time(server):
    # the module server runs a bisection unet -> clear 400, not a 500
    body, ctype = multipart_body({
        "video": ("clip.mp4", "video/mp4", _tiny_video_bytes(2)),
        "target_fps": 25})
    status, _, blob = request(server, "/interpolate-video", "POST", body, ctype)
    assert status == 400 and b"exact-time" in blob


def test_interpolate_video_retime_with_flow_model():
    """A flow-family server retimes 10 fps -> 25 fps (rate 2.5)."""
    eng = InterpolationEngine.random_init(
        ModelConfig(arch="flow", base_width=4))
    srv = Server(eng, ServeConfig(host="127.0.0.1", port=0),
                 resolution=(64, 64))
    srv.start_background()
    try:
        body, ctype = multipart_body({
            "video": ("clip.mp4", "video/mp4", _tiny_video_bytes(5)),
            "target_fps": 25})
        status, headers, blob = request(srv, "/interpolate-video", "POST",
                                        body, ctype)
        assert status == 200, blob
        assert "retimed_25fps" in headers["Content-Disposition"]
        import tempfile

        import cv2

        with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as f:
            f.write(blob)
        cap = cv2.VideoCapture(f.name)
        # 5 frames @10fps -> floor(4 * 2.5) + 1 = 11 frames @25fps
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 11
        assert abs(cap.get(cv2.CAP_PROP_FPS) - 25.0) < 0.5
        cap.release()
        os.unlink(f.name)
    finally:
        srv.shutdown()


def test_interpolate_frames_times_requires_exact_time(server):
    body, ctype = multipart_body({
        "frame1": ("a.png", "image/png", encode_png(value=40)),
        "frame2": ("b.png", "image/png", encode_png(value=220)),
        "times": "0.25,0.75"})
    status, _, blob = request(server, "/interpolate-frames", "POST",
                              body, ctype)
    assert status == 400 and b"exact-time" in blob


def test_interpolate_frames_exact_times_with_flow_model():
    eng = InterpolationEngine.random_init(
        ModelConfig(arch="flow", base_width=4))
    srv = Server(eng, ServeConfig(host="127.0.0.1", port=0),
                 resolution=(64, 64))
    srv.start_background()
    try:
        body, ctype = multipart_body({
            "frame1": ("a.png", "image/png", encode_png(value=40)),
            "frame2": ("b.png", "image/png", encode_png(value=220)),
            "times": "0.25,0.4,0.9"})
        status, _, blob = request(srv, "/interpolate-frames", "POST",
                                  body, ctype)
        assert status == 200, blob
        data = json.loads(blob)
        assert data["times"] == [0.25, 0.4, 0.9]
        assert len(data["frames"]) == 3
        # bad values rejected
        for bad in ("0,0.5", "0.5,1.0", "x,y", ""):
            body, ctype = multipart_body({
                "frame1": ("a.png", "image/png", encode_png(value=40)),
                "frame2": ("b.png", "image/png", encode_png(value=220)),
                "times": bad})
            status, _, _ = request(srv, "/interpolate-frames", "POST",
                                   body, ctype)
            assert status == 400, bad
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# round-2 hardening: streaming uploads, backpressure, deadlines
# ---------------------------------------------------------------------------

def test_parse_multipart_stream_spools_large_files(tmp_path):
    from ai_based_frame_interpolation_tpu.serve.server import (
        parse_multipart_stream)

    payload = bytes(range(256)) * 8192          # 2 MB, non-trivial content
    body, ctype = multipart_body({
        "video": ("clip.mp4", "video/mp4", payload),
        "factor": 2})
    parts = parse_multipart_stream(io.BytesIO(body).read, len(body), ctype,
                                   spool_dir=str(tmp_path),
                                   spool_threshold=64 * 1024)
    # the big file part went to disk; the form field stayed in RAM
    assert parts["video"].path is not None
    assert parts["video"].path.startswith(str(tmp_path))
    assert parts["video"].size == len(payload)
    assert parts["video"].data == payload       # lazy read-back matches
    assert parts["factor"].path is None
    assert parts["factor"].data == b"2"
    # save_to materializes the spooled part without loss
    dest = str(tmp_path / "copy.bin")
    parts["video"].save_to(dest)
    with open(dest, "rb") as f:
        assert f.read() == payload


def test_parse_multipart_stream_matches_in_memory_parser():
    body, ctype = multipart_body({
        "frame1": ("a.png", "image/png", encode_png(value=10)),
        "frame2": ("b.png", "image/png", encode_png(value=200)),
        "num_intermediate": 4})
    from ai_based_frame_interpolation_tpu.serve.server import (
        parse_multipart, parse_multipart_stream)

    a = parse_multipart(body, ctype)
    b = parse_multipart_stream(io.BytesIO(body).read, len(body), ctype)
    assert set(a) == set(b)
    for k in a:
        assert a[k].data == b[k].data
        assert a[k].filename == b[k].filename


def test_spooled_video_upload_end_to_end():
    """With a tiny spool threshold the video upload streams to disk and the
    endpoint still works (the save_to path, not part.data)."""
    eng = InterpolationEngine.random_init(ModelConfig(base_width=4))
    srv = Server(eng, ServeConfig(host="127.0.0.1", port=0,
                                  spool_threshold_bytes=1024),
                 resolution=(64, 64))
    srv.start_background()
    try:
        body, ctype = multipart_body({
            "video": ("clip.mp4", "video/mp4", _tiny_video_bytes(3)),
            "factor": 2})
        status, headers, blob = request(srv, "/interpolate-video", "POST",
                                        body, ctype)
        assert status == 200, blob
        assert len(blob) > 0
    finally:
        srv.shutdown()


def test_video_queue_backpressure_503():
    """Jobs beyond max_video_queue are rejected with 503 + Retry-After."""
    import threading
    import time as _time

    eng = InterpolationEngine.random_init(ModelConfig(base_width=4))
    srv = Server(eng, ServeConfig(host="127.0.0.1", port=0,
                                  max_video_queue=1, request_timeout_s=60),
                 resolution=(64, 64))
    srv.start_background()
    service = srv.service
    body, ctype = multipart_body({
        "video": ("clip.mp4", "video/mp4", _tiny_video_bytes(3)),
        "factor": 2})
    try:
        service._video_lock.acquire()       # simulate a long-running job
        results = {}

        def first():
            results["first"] = request(srv, "/interpolate-video", "POST",
                                       body, ctype)

        t = threading.Thread(target=first)
        t.start()
        deadline = _time.time() + 10
        while service._video_jobs < 1 and _time.time() < deadline:
            _time.sleep(0.02)
        assert service._video_jobs == 1     # one job waiting for the device
        # queue is at capacity -> immediate 503 with Retry-After
        status, headers, blob = request(srv, "/interpolate-video", "POST",
                                        body, ctype)
        assert status == 503, blob
        assert "Retry-After" in headers
        assert json.loads(blob)["detail"].startswith("server busy")
        service._video_lock.release()       # let the queued job run
        t.join(timeout=60)
        assert results["first"][0] == 200
        status, _, blob = request(srv, "/health")
        assert json.loads(blob)["requests_rejected"] >= 1
    finally:
        if service._video_lock.locked():
            try:
                service._video_lock.release()
            except RuntimeError:
                pass
        srv.shutdown()


def test_video_request_deadline_enforced():
    """An expired request_timeout_s aborts the video job (503 while queued
    or 504 mid-stream — never an unbounded run)."""
    eng = InterpolationEngine.random_init(ModelConfig(base_width=4))
    srv = Server(eng, ServeConfig(host="127.0.0.1", port=0,
                                  request_timeout_s=0.001),
                 resolution=(64, 64))
    srv.start_background()
    try:
        body, ctype = multipart_body({
            "video": ("clip.mp4", "video/mp4", _tiny_video_bytes(4)),
            "factor": 2})
        status, _, blob = request(srv, "/interpolate-video", "POST",
                                  body, ctype)
        assert status in (503, 504), (status, blob)
        assert b"time" in blob.lower() or b"busy" in blob.lower()
    finally:
        srv.shutdown()


def test_oversized_request_rejected_without_reading_body(server):
    """A Content-Length over the cap is refused up front (413) — the server
    never reads (or buffers) the oversized body."""
    import socket

    huge = server.service.cfg.max_upload_bytes * 3 + 65537
    with socket.create_connection(("127.0.0.1", server.port),
                                  timeout=30) as s:
        s.sendall(
            b"POST /interpolate HTTP/1.1\r\n"
            b"Host: localhost\r\n"
            b"Content-Type: multipart/form-data; boundary=x\r\n"
            + f"Content-Length: {huge}\r\n\r\n".encode())
        # body intentionally NOT sent; response must arrive anyway
        s.settimeout(30)
        resp = s.recv(4096)
    assert b"413" in resp.split(b"\r\n", 1)[0]


def test_video_response_streams_from_disk_constant_rss():
    """A large output MP4 is streamed to the socket from disk — process RSS
    stays flat instead of growing by the response size (round-2 VERDICT
    weak-6: the whole clip was read into one RAM blob before writing)."""
    import threading

    eng = InterpolationEngine.random_init(ModelConfig(base_width=4))
    srv = Server(eng, ServeConfig(host="127.0.0.1", port=0),
                 resolution=(64, 64))
    srv.start_background()

    big = 130 * 1024 * 1024      # > 100 MB synthetic output

    def fake_video_job(in_path, out_path, factor=2, fps=None, deadline=None):
        with open(out_path, "wb") as f:
            f.write(b"\0" * (1 << 20))
            f.seek(big - 1)
            f.write(b"\0")
        return {"output_frames": 8}

    srv.service.engine.interpolate_video_file = fake_video_job

    def rss_mb():
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
        return 0.0

    body, ctype = multipart_body({
        "video": ("clip.mp4", "video/mp4", b"not-really-decoded"),
        "factor": 2})
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/interpolate-video", data=body,
        method="POST")
    req.add_header("Content-Type", ctype)
    try:
        rss_before = rss_mb()
        peak = [rss_before]

        def sampler(stop):
            while not stop.is_set():
                peak[0] = max(peak[0], rss_mb())
                stop.wait(0.01)

        stop = threading.Event()
        t = threading.Thread(target=sampler, args=(stop,))
        t.start()
        total = 0
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.status == 200
            assert int(resp.headers["Content-Length"]) == big
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                total += len(chunk)
        stop.set()
        t.join()
        assert total == big
        # server + client share this process; allow slack for the page cache
        # of the sparse file and interpreter noise, but nothing near 130 MB
        assert peak[0] - rss_before < 60, (rss_before, peak[0])
    finally:
        srv.shutdown()


def test_stat_counters_exact_under_concurrency():
    """requests_served is incremented under a lock — N concurrent requests
    count exactly N (round-2 VERDICT weak-5: unlocked += on worker threads)."""
    import concurrent.futures

    eng = InterpolationEngine.random_init(ModelConfig(base_width=4))
    srv = Server(eng, ServeConfig(host="127.0.0.1", port=0),
                 resolution=(64, 64))
    srv.start_background()
    try:
        body, ctype = multipart_body({
            "frame1": ("a.png", "image/png", encode_png(value=10)),
            "frame2": ("b.png", "image/png", encode_png(value=200)),
            "num_intermediate": 1, "fps": 30})

        def one(_):
            return request(srv, "/interpolate", "POST", body, ctype)[0]

        n = 12
        with concurrent.futures.ThreadPoolExecutor(6) as pool:
            codes = list(pool.map(one, range(n)))
        assert codes == [200] * n
        assert srv.service.requests_served == n
    finally:
        srv.shutdown()
