"""API surface tests: the full serving stack (our HTTP server + routes +
task runner + fake engine) driven over real sockets, checking
byte-compatibility with the reference's responses (SURVEY.md §2.2)."""

import base64
import hashlib
import json
import os
import socket
import struct
import threading
import time

import numpy as np
import pytest
import requests

from clearconverse_tpu.audio.wav import write_wav
from clearconverse_tpu.config import Config, TPUConfig
from clearconverse_tpu.pipeline.engine import TranscriptionEngine
from clearconverse_tpu.serve.app import create_app
from clearconverse_tpu.serve.pdf import generate_transcript_pdf

from fakes import SR, FakeModels, synth_conversation


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("srv")
    out_dir, temp_dir = str(root / "processed"), str(root / "uploads")

    def engine_factory():
        return TranscriptionEngine(Config(noise_reduction_amount=0.0),
                                   TPUConfig(), models=FakeModels())

    app = create_app(out_dir, temp_dir, engine_factory, start_cleanup=False)

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    import asyncio
    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        try:
            loop.run_until_complete(app.serve("127.0.0.1", port))
        except RuntimeError:
            pass  # loop stopped at teardown

    t = threading.Thread(target=run, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    for _ in range(100):
        try:
            requests.get(base + "/health", timeout=1)
            break
        except requests.exceptions.ConnectionError:
            time.sleep(0.05)
    yield {"base": base, "out": out_dir, "temp": temp_dir, "port": port}
    loop.call_soon_threadsafe(loop.stop)


def _upload(server, name="conv.wav"):
    audio = synth_conversation()
    path = os.path.join(server["temp"], "src.wav")
    write_wav(path, audio, SR)
    with open(path, "rb") as fh:
        r = requests.post(server["base"] + "/upload-file",
                          files={"file": (name, fh, "audio/wav")})
    assert r.status_code == 200, r.text
    return r.json()


def _wait_complete(server, task_id, timeout=60):
    deadline = time.time() + timeout
    while time.time() < deadline:
        st = requests.get(f"{server['base']}/task/{task_id}/status").json()
        if st.get("status") in ("completed", "error", "cancelled"):
            return st
        time.sleep(0.3)
    raise TimeoutError("task did not finish")


def test_health(server):
    r = requests.get(server["base"] + "/health")
    assert r.status_code == 200 and r.json() == {"status": "ok"}


def test_upload_validates_extension(server):
    r = requests.post(server["base"] + "/upload-file",
                      files={"file": ("x.txt", b"hi", "text/plain")})
    assert r.status_code == 400
    assert r.json()["detail"] == "Invalid file type provided."


def test_upload_size_cap_says_10mb(server):
    big = b"\0" * (26 * 1024 * 1024)
    r = requests.post(server["base"] + "/upload-file",
                      files={"file": ("big.wav", big, "audio/wav")})
    assert r.status_code == 413
    # Reference quirk: 25 MB cap, "10MB" message (back/api.py:1777).
    assert "10MB" in r.json()["detail"]


def test_upload_and_preview(server):
    up = _upload(server)
    assert "task_id" in up and up["preview_url"].startswith("/preview/")
    r = requests.get(server["base"] + up["preview_url"])
    assert r.status_code == 200 and r.content[:4] == b"RIFF"


def test_transcribe_lifecycle(server):
    up = _upload(server, "meeting.wav")
    tid = up["task_id"]
    r = requests.post(f"{server['base']}/transcribe/{tid}")
    assert r.status_code == 200 and r.json()["task_id"] == tid

    st = _wait_complete(server, tid)
    assert st["status"] == "completed", st
    assert st["download_url"] == f"/download/{tid}/transcript.txt"

    # Idempotency marker (back/api.py:2006-2016).
    r = requests.post(f"{server['base']}/transcribe/{tid}")
    assert r.json()["status"] == "already_completed"

    # Transcript download + JSON payload.
    r = requests.get(server["base"] + st["download_url"])
    assert r.status_code == 200
    assert r.text.startswith("[SPEAKER_")
    r = requests.get(f"{server['base']}/transcription/{tid}")
    body = r.json()
    assert body["task_id"] == tid and "[SPEAKER_" in body["transcription"]

    # PDF export.
    r = requests.get(f"{server['base']}/download-pdf/{tid}")
    assert r.status_code == 200
    assert r.content.startswith(b"%PDF-1.4")
    assert "meeting-Transcript.pdf" in r.headers.get("Content-Disposition", "")


def test_unknown_task_status(server):
    st = requests.get(f"{server['base']}/task/nope/status").json()
    assert st == {"status": "not_found"}
    r = requests.get(f"{server['base']}/transcription/nope")
    assert r.status_code == 404
    r = requests.post(f"{server['base']}/transcribe/nope")
    assert r.status_code == 404
    assert "detail" in r.json()


def test_cancel_flow(server):
    up = _upload(server)
    tid = up["task_id"]
    r = requests.post(f"{server['base']}/cancel/{tid}")
    assert r.json()["status"] == "cancelled"
    # Reference parity: cancel touches DISK only for an ACTIVE task
    # (back/api.py:2112-2123); this task never started, so no output dir
    # exists and status reads not_found (api.py:2147-2148). The cancelled
    # acknowledgement lives in result_store (/transcription → 202).
    st = requests.get(f"{server['base']}/task/{tid}/status").json()
    assert st["status"] == "not_found"
    # No cancelled.txt on disk; result_store has the cancel → the
    # reference's /transcription answers 404 with the result-store detail
    # (back/api.py:2278-2283), not 202.
    r = requests.get(f"{server['base']}/transcription/{tid}")
    assert r.status_code == 404
    assert "may have been deleted or the task was cancelled" in \
        r.json()["detail"]
    # Upload preserved → can re-transcribe.
    assert requests.post(f"{server['base']}/transcribe/{tid}").status_code in (200,)
    _wait_complete(server, tid)


def test_cancel_does_not_destroy_completed_transcript(server):
    """A stale tab's /cancel after completion (e.g. sendBeacon on unload)
    must not delete the finished transcript or fabricate cancelled state —
    the reference only mutates disk for tasks in active_processes."""
    up = _upload(server)
    tid = up["task_id"]
    requests.post(f"{server['base']}/transcribe/{tid}")
    st = _wait_complete(server, tid)
    assert st["status"] == "completed"
    r = requests.post(f"{server['base']}/cancel/{tid}")
    assert r.json()["status"] == "cancelled"      # acknowledged, like ref
    st = requests.get(f"{server['base']}/task/{tid}/status").json()
    assert st["status"] == "completed"            # transcript survives
    assert requests.get(server["base"] + st["download_url"]).status_code == 200


def test_cancel_unknown_task_creates_no_state(server):
    requests.post(f"{server['base']}/cancel/this-never-existed")
    st = requests.get(
        f"{server['base']}/task/this-never-existed/status").json()
    assert st["status"] == "not_found"


def test_model_loading_status_exists(server):
    r = requests.get(server["base"] + "/model-loading-status")
    assert r.status_code == 200 and "progress" in r.json()


def test_model_loading_status_reports_staged_progress(tmp_path):
    """VERDICT r1 #7: /model-loading-status mirrors the loader's REAL staged
    percentages (10/40/70/100), not a hardcoded number."""
    from clearconverse_tpu.serve.tasks import TaskRunner

    seen = []

    class SlowLoadEngine:
        def __init__(self, runner_holder):
            self.runner_holder = runner_holder
            self._loaded = False

        def models_are_loaded(self):
            return self._loaded

        def load_models_with_progress(self, cb=None):
            for pct, msg in [(10, "sep"), (40, "whisper"),
                             (70, "speakers"), (100, "Models loaded")]:
                if cb:
                    cb(pct, msg)
                seen.append(dict(self.runner_holder[0].model_loading))
            self._loaded = True
            return True

    holder = []
    runner = TaskRunner(str(tmp_path), lambda: SlowLoadEngine(holder))
    holder.append(runner)
    assert runner.model_loading == {"progress": 0,
                                    "message": "Models not loaded"}
    runner.engine().load_models_with_progress()
    assert [s["progress"] for s in seen] == [10, 40, 70, 100]
    assert runner.model_loading["progress"] == 100


def test_result_endpoint(server):
    r = requests.get(f"{server['base']}/task/ghost/result")
    assert r.status_code == 404


def test_cleanup_endpoint(server):
    up = _upload(server)
    tid = up["task_id"]
    r = requests.delete(f"{server['base']}/cleanup/{tid}")
    body = r.json()
    assert body["status"] == "success"
    assert body["details"]["preserved_uploads"] is False
    # Upload is gone → transcribe 404s.
    assert requests.post(f"{server['base']}/transcribe/{tid}").status_code == 404


def test_websocket_progress(server):
    up = _upload(server)
    tid = up["task_id"]
    requests.post(f"{server['base']}/transcribe/{tid}")

    # Minimal RFC6455 client.
    sock = socket.create_connection(("127.0.0.1", server["port"]), timeout=30)
    key = base64.b64encode(os.urandom(16)).decode()
    sock.sendall((f"GET /ws/progress/{tid} HTTP/1.1\r\n"
                  f"Host: localhost\r\nUpgrade: websocket\r\n"
                  f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
                  f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
    buf = b""
    while b"\r\n\r\n" not in buf:
        buf += sock.recv(4096)
    head, _, rest = buf.partition(b"\r\n\r\n")
    assert b"101" in head.split(b"\r\n")[0]
    expect = base64.b64encode(hashlib.sha1(
        (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()).digest()).decode()
    assert expect.encode() in head

    def read_frame(buf):
        while len(buf) < 2:
            buf += sock.recv(4096)
        n = buf[1] & 0x7F
        off = 2
        if n == 126:
            while len(buf) < 4:
                buf += sock.recv(4096)
            n = struct.unpack(">H", buf[2:4])[0]
            off = 4
        while len(buf) < off + n:
            buf += sock.recv(4096)
        return buf[off:off + n], buf[off + n:]

    messages = []
    deadline = time.time() + 60
    buf = rest
    while time.time() < deadline:
        payload, buf = read_frame(buf)
        msg = json.loads(payload)
        messages.append(msg)
        if msg.get("progress") == 100:
            break
    sock.close()
    assert messages, "no WS messages received"
    assert messages[-1]["progress"] == 100
    assert "complete" in messages[-1]["message"].lower()


def test_websocket_progress_drains_client_frames(server):
    """ADVICE r4 #4: the progress handler is write-only at the app level,
    so client frames (pongs, stray texts) used to sit unread in the
    receive buffer for the task's lifetime. The background drain must
    consume them — and answer client pings. Uses an uploaded-but-never-
    started task so the handler deterministically sits in its poll loop
    (a dev-model task completes before the socket even connects, taking
    the drain-free early-return path)."""
    up = _upload(server)
    tid = up["task_id"]

    sock = socket.create_connection(("127.0.0.1", server["port"]), timeout=30)
    key = base64.b64encode(os.urandom(16)).decode()
    sock.sendall((f"GET /ws/progress/{tid} HTTP/1.1\r\n"
                  f"Host: localhost\r\nUpgrade: websocket\r\n"
                  f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
                  f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
    buf = b""
    while b"\r\n\r\n" not in buf:
        buf += sock.recv(4096)
    head, _, rest = buf.partition(b"\r\n\r\n")
    assert b"101" in head.split(b"\r\n")[0]

    def client_frame(opcode, payload):
        mask = os.urandom(4)
        body = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
        return bytes([0x80 | opcode, 0x80 | len(payload)]) + mask + body

    # Chatty client: a ping the server must answer (receive_text replies
    # 0x8A), then unsolicited pongs and texts the drain must discard.
    sock.sendall(client_frame(0x9, b"hi"))            # ping -> expect pong
    for _ in range(3):
        sock.sendall(client_frame(0xA, b""))          # pong
        sock.sendall(client_frame(0x1, b"chatter"))   # text

    def read_frame(buf):
        while len(buf) < 2:
            buf += sock.recv(4096)
        op = buf[0] & 0x0F
        n = buf[1] & 0x7F
        off = 2
        if n == 126:
            while len(buf) < 4:
                buf += sock.recv(4096)
            n = struct.unpack(">H", buf[2:4])[0]
            off = 4
        while len(buf) < off + n:
            buf += sock.recv(4096)
        return op, buf[off:off + n], buf[off + n:]

    saw_pong = False
    saw_progress = False
    deadline = time.time() + 30
    buf = rest
    while time.time() < deadline and not (saw_pong and saw_progress):
        op, payload, buf = read_frame(buf)
        if op == 0xA:
            saw_pong = True
            assert payload == b"hi"
        elif op == 0x1:
            saw_progress = "progress" in json.loads(payload)
    sock.close()
    assert saw_pong, "server never answered the client ping"
    assert saw_progress


def test_pdf_generator_structure(tmp_path):
    text = ("[SPEAKER_A] 0.00s - 3.00s\nhello there\n\n"
            "[SPEAKER_B] 3.50s - 6.00s\nhow are you " * 40)
    out = tmp_path / "t.pdf"
    generate_transcript_pdf(text, str(out), "call.wav")
    data = out.read_bytes()
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    assert b"/Type /Page" in data
    assert data.count(b"/Type /Page ") >= 2 or b"/Count 2" in data or b"/Count 3" in data
    assert b"Speaker A:" in data
    assert rb"\(0.00s - 3.00s\)" in data  # parens are PDF-escaped
    assert b"[call.wav] Transcript" in data


def test_task_runner_error_marker(tmp_path):
    """Failure detection parity (back/api.py:1742-1754): a crashing engine
    produces error.txt + a final 100% error progress, and clears
    in_progress.txt."""
    import threading
    from clearconverse_tpu.serve.tasks import TaskRunner

    class Boom:
        def run(self, *a, **k):
            raise RuntimeError("synthetic failure")

    runner = TaskRunner(str(tmp_path), lambda: Boom())
    task_dir = tmp_path / "t1"
    task_dir.mkdir()
    (task_dir / "in_progress.txt").write_text("x")
    runner._run_task("t1", "whatever.wav", threading.Event())

    assert (task_dir / "error.txt").exists()
    assert "synthetic failure" in (task_dir / "error.txt").read_text()
    assert not (task_dir / "in_progress.txt").exists()
    import json as _json
    prog = _json.loads((task_dir / "progress.json").read_text())
    assert prog["progress"] == 100 and "Error" in prog["message"]


def test_task_runner_cancel_cooperative(tmp_path):
    """Cancellation: the cancel event aborts at the next progress callback;
    no completed/error markers are written after cancel."""
    import threading, time as _time
    from clearconverse_tpu.serve.tasks import TaskRunner

    started = threading.Event()

    class Slow:
        def run(self, f, output_dir, debug_mode, progress_callback):
            progress_callback(30, "working")
            started.set()
            for _ in range(100):
                _time.sleep(0.05)
                progress_callback(31, "still working")  # raises on cancel
            return f, "text", "p"

    runner = TaskRunner(str(tmp_path), lambda: Slow())
    runner.start("t2", "x.wav")
    assert started.wait(5)
    runner.cancel("t2")
    for _ in range(100):
        if not runner.active_tasks:
            break
        _time.sleep(0.05)
    _time.sleep(0.3)  # let the dispatcher notice the cancel
    task_dir = tmp_path / "t2"
    assert (task_dir / "cancelled.txt").exists()
    assert not (task_dir / "completed.txt").exists()
    assert not (task_dir / "error.txt").exists()


def test_cancel_restart_orphaned_task_reaches_terminal_state(tmp_path):
    """A task dir left mid-run by a dead process (in_progress.txt still
    present, no terminal marker, not in active_tasks) must still reach a
    terminal state on cancel — otherwise a reconnected WS progress loop
    spins forever. in_progress.txt is the required evidence the dir was
    produced by this server mid-run (ADVICE r4 #2): dirs without it, like
    terminal dirs and unknown IDs, stay untouched."""
    import json as _json
    from clearconverse_tpu.serve.tasks import TaskRunner

    runner = TaskRunner(str(tmp_path), lambda: None)
    orphan = tmp_path / "orphan"
    orphan.mkdir()
    (orphan / "in_progress.txt").write_text("x")
    (orphan / "progress.json").write_text(
        _json.dumps({"progress": 40, "message": "working"}))
    runner.cancel("orphan")
    assert (orphan / "cancelled.txt").exists()
    assert (orphan / "progress.json").exists()     # no dir wipe
    # The rescue clears in_progress.txt too, so /transcribe can re-run
    # the task instead of answering already_in_progress forever.
    assert not (orphan / "in_progress.txt").exists()

    # A non-active dir WITHOUT in_progress.txt is not provably ours
    # mid-run — cancel leaves it alone.
    foreign = tmp_path / "foreign"
    foreign.mkdir()
    (foreign / "progress.json").write_text(
        _json.dumps({"progress": 40, "message": "working"}))
    runner.cancel("foreign")
    assert not (foreign / "cancelled.txt").exists()

    done = tmp_path / "done"
    done.mkdir()
    (done / "completed.txt").write_text("ok")
    (done / "transcript.txt").write_text("text")
    runner.cancel("done")
    assert not (done / "cancelled.txt").exists()   # terminal dir untouched
    assert (done / "transcript.txt").read_text() == "text"

    runner.cancel("never-existed")
    assert not (tmp_path / "never-existed").exists()


def test_retranscribe_after_cancel_clears_stale_markers(server):
    """PARITY.md #16: a re-run after cancel must not report 'cancelled'
    forever — /transcribe clears stale terminal markers before starting
    (the reference leaves them and its own re-transcription feature is
    dead as a result)."""
    up = _upload(server, "rerun.wav")
    tid = up["task_id"]
    task_dir = os.path.join(server["out"], tid)
    os.makedirs(task_dir, exist_ok=True)
    with open(os.path.join(task_dir, "cancelled.txt"), "w") as fh:
        fh.write("Transcription was cancelled")
    st = requests.get(f"{server['base']}/task/{tid}/status").json()
    assert st["status"] == "cancelled"
    requests.post(f"{server['base']}/transcribe/{tid}")
    st = _wait_complete(server, tid)
    assert st["status"] == "completed", st
    assert not os.path.exists(os.path.join(task_dir, "cancelled.txt"))


def test_cancel_completed_task_preserves_result_store(server):
    """Extension of PARITY.md #14: a late /cancel (stale tab sendBeacon)
    of a COMPLETED task acknowledges but must not clobber the completed
    result_store entry — /task/{id}/result keeps serving the download."""
    up = _upload(server, "late-cancel.wav")
    tid = up["task_id"]
    requests.post(f"{server['base']}/transcribe/{tid}")
    st = _wait_complete(server, tid)
    assert st["status"] == "completed", st
    r = requests.post(f"{server['base']}/cancel/{tid}")
    assert r.status_code == 200
    res = requests.get(f"{server['base']}/task/{tid}/result").json()
    assert res.get("status") == "completed", res
    assert "download_url" in res


def test_file_response_sanitizes_filename_header():
    """CR/LF/quote in a (client-controlled) filename must not split the
    response head or break the Content-Disposition quoted-string
    (header-injection guard, review r5)."""
    import tempfile
    from clearconverse_tpu.serve.http import file_response

    with tempfile.NamedTemporaryFile(delete=False) as fh:
        fh.write(b"x")
        p = fh.name
    resp = file_response(p, "audio/mpeg",
                         'a\r\nSet-Cookie: evil=1\n"b.mp3')
    cd = resp.headers["Content-Disposition"]
    assert "\r" not in cd and "\n" not in cd
    assert cd == 'attachment; filename="aSet-Cookie: evil=1b.mp3"'
    os.unlink(p)


def test_idle_connection_times_out(server, monkeypatch):
    """A socket that connects and sends nothing must be dropped by the
    keep-alive idle bound, not held forever (slowloris guard)."""
    from clearconverse_tpu.serve import http as httpmod

    monkeypatch.setattr(httpmod, "KEEPALIVE_TIMEOUT_S", 1.0)
    sock = socket.create_connection(("127.0.0.1", server["port"]),
                                    timeout=10)
    sock.settimeout(8)
    try:
        data = sock.recv(1)   # server closes -> b""
    except (ConnectionResetError, socket.timeout) as exc:
        assert not isinstance(exc, socket.timeout), \
            "idle socket was not dropped"
        data = b""
    assert data == b""
    sock.close()


def test_oversized_header_line_gets_431(server):
    """A single header line beyond the StreamReader limit surfaces as
    ValueError from readline — the server must answer 431, not die with
    an unretrieved task exception (review r5)."""
    sock = socket.create_connection(("127.0.0.1", server["port"]),
                                    timeout=10)
    sock.settimeout(10)
    sock.sendall(b"GET /health HTTP/1.1\r\nX-Big: " + b"a" * (80 * 1024)
                 + b"\r\n\r\n")
    buf = b""
    try:
        while b"\r\n\r\n" not in buf:
            chunk = sock.recv(4096)
            if not chunk:
                break
            buf += chunk
    except ConnectionResetError:
        pass
    sock.close()
    assert b"431" in buf.split(b"\r\n", 1)[0], buf[:100]


def test_upload_url_drive_flow_preview_and_pdf_name(server, monkeypatch):
    """/upload-url parity (back/api.py:1806-1999): the original filename
    is the URL path's basename recorded BEFORE download (here the Drive
    quirk value 'view'), preview_url carries the pre-conversion
    {task_id}.mp3 name, and the PDF download is named
    '{orig-stem}-Transcript.pdf' — not a uuid (review r5)."""
    from clearconverse_tpu.serve import urls as urlmod

    calls = {}

    def fake_drive(file_id, output_path=None, max_bytes=None):
        calls["file_id"] = file_id
        write_wav(output_path, synth_conversation(), SR)
        return output_path

    monkeypatch.setattr(urlmod, "download_file_from_google_drive",
                        fake_drive)
    url = "https://drive.google.com/file/d/FILE123/view"
    r = requests.post(server["base"] + "/upload-url", data={"url": url})
    assert r.status_code == 200, r.text
    body = r.json()
    tid = body["task_id"]
    assert calls["file_id"] == "FILE123"
    # Drive URLs have no usable extension -> .mp3 default; preview uses
    # the PRE-conversion filename.
    assert body["preview_url"] == f"/preview/{tid}.mp3"

    requests.post(f"{server['base']}/transcribe/{tid}")
    st = _wait_complete(server, tid)
    assert st["status"] == "completed", st
    pdf = requests.get(f"{server['base']}/download-pdf/{tid}")
    assert pdf.status_code == 200
    assert "view-Transcript.pdf" in pdf.headers.get("Content-Disposition",
                                                    "")


def test_upload_url_size_cap_wraps_413_into_400(server, monkeypatch):
    """Reference quirk reproduced byte-for-byte (back/api.py:1988-1990):
    the route's outer except catches its own 413 and re-raises 400 with
    the 413 text embedded in the detail."""
    from clearconverse_tpu.serve import urls as urlmod

    def fake_drive(file_id, output_path=None, max_bytes=None):
        raise urlmod._size_cap_413(12 * 1024 * 1024)

    monkeypatch.setattr(urlmod, "download_file_from_google_drive",
                        fake_drive)
    url = "https://drive.google.com/file/d/FILE123/view"
    r = requests.post(server["base"] + "/upload-url", data={"url": url})
    assert r.status_code == 400, r.text
    assert r.json()["detail"] == (
        "Failed to download file: 413: File size exceeds the maximum "
        "limit of 10MB. File size: 12.00MB")


def test_download_url_cap_unlinks_partial_file(tmp_path, monkeypatch):
    """A capped in-flight download must not leave a partial file behind
    (the reference unlinks its temp file on every error path,
    back/api.py:1899-1920)."""
    from clearconverse_tpu.serve import urls as urlmod
    from clearconverse_tpu.serve.http import HTTPException as HE

    class FakeResp:
        headers = {"Content-Type": "audio/mpeg"}
        status_code = 200
        cookies = {}

        def raise_for_status(self):
            pass

        def iter_content(self, chunk_size):
            while True:
                yield b"x" * chunk_size

    class FakeSession:
        def get(self, *a, **k):
            return FakeResp()

    class FakeReq:
        exceptions = urlmod.requests.exceptions
        Session = FakeSession

        @staticmethod
        def get(*a, **k):
            return FakeResp()

        @staticmethod
        def head(*a, **k):
            return type("H", (), {"headers": {}})()  # no Content-Length

    monkeypatch.setattr(urlmod, "requests", FakeReq)
    out = tmp_path / "dl.mp3"
    with pytest.raises(HE) as ei:
        urlmod.download_file_from_url("http://x.example/y.mp3", str(out),
                                      max_bytes=4096)
    assert ei.value.status_code == 413
    assert "File size:" in ei.value.detail
    assert not out.exists(), "partial download left on disk"

    # A LOCAL failure (unwritable path -> OSError) wraps to the same
    # reference-exact 400 text as request errors (back/api.py:1976) in
    # BOTH downloaders, instead of escaping raw or mapping to 500.
    bad = tmp_path / "no-such-dir" / "dl.mp3"
    with pytest.raises(HE) as ei:
        urlmod.download_file_from_url("http://x.example/y.mp3", str(bad))
    assert ei.value.status_code == 400
    assert ei.value.detail.startswith("Failed to download file: ")
    with pytest.raises(HE) as ei:
        urlmod.download_file_from_google_drive("FILE123", str(bad))
    assert ei.value.status_code == 400
    assert ei.value.detail.startswith("Failed to download file: ")


def test_finish_ok_marker_order_survives_crash_window(tmp_path, monkeypatch):
    """_finish_ok must write completed.txt BEFORE removing
    in_progress.txt: a server killed between the two steps then leaves a
    dir every reader resolves as completed. The old remove-then-write
    order could strand a dir with NEITHER marker — unrescuable by the
    in_progress-gated orphan cancel, so a WS observer would poll it
    forever (review r5)."""
    import os as _os
    import threading
    from clearconverse_tpu.serve import tasks as tasks_mod
    from clearconverse_tpu.serve.tasks import TaskRunner

    runner = TaskRunner(str(tmp_path), lambda: None)
    task_dir = tmp_path / "t9"
    task_dir.mkdir()
    (task_dir / "in_progress.txt").write_text("x")

    completed_at_removal = []
    real_remove = _os.remove

    def spying_remove(path):
        if _os.path.basename(str(path)) == "in_progress.txt":
            completed_at_removal.append(
                (task_dir / "completed.txt").exists())
        real_remove(path)

    monkeypatch.setattr(tasks_mod.os, "remove", spying_remove)
    cb = runner._make_progress_cb("t9", str(task_dir), threading.Event(),
                                  raise_on_cancel=False)
    runner._finish_ok("t9", str(task_dir), cb)
    assert completed_at_removal == [True]
    assert (task_dir / "completed.txt").exists()
    assert not (task_dir / "in_progress.txt").exists()


def test_ws_mid_frame_disconnect_reads_as_clean_close():
    """A client that resets mid-frame (header sent, payload truncated)
    must read as a clean close (None), not raise IncompleteReadError out
    of the handler's background drain task (review r5)."""
    import asyncio
    from clearconverse_tpu.serve.http import WebSocket

    async def scenario():
        reader = asyncio.StreamReader()
        # Masked text frame claiming 20 payload bytes; deliver only the
        # mask + 3 bytes, then EOF (connection reset mid-frame).
        reader.feed_data(bytes([0x81, 0x80 | 20]) + b"\x00\x00\x00\x00abc")
        reader.feed_eof()

        class _W:  # writer never used on the read path
            def write(self, *_):
                raise AssertionError("no writes expected")

            async def drain(self):
                pass

        ws = WebSocket(reader, _W(), {})
        return await ws.receive_text(), ws.closed

    got, closed = asyncio.run(scenario())
    assert got is None and closed


def test_concurrent_transcribe_requests(server):
    """Two simultaneous tasks both complete (the in-process executor
    serializes device work; the benign progress.json read/write race is
    guarded like the reference's, back/api.py:2570-2571)."""
    ups = [_upload(server, f"c{i}.wav") for i in range(2)]
    for up in ups:
        requests.post(f"{server['base']}/transcribe/{up['task_id']}")
    for up in ups:
        st = _wait_complete(server, up["task_id"])
        assert st["status"] == "completed", st


def test_grouped_task_execution(tmp_path):
    """_run_group: several queued tasks execute as one engine.run_many call
    with full marker/result parity per task."""
    import threading
    from clearconverse_tpu.audio.wav import write_wav
    from clearconverse_tpu.config import Config, TPUConfig
    from clearconverse_tpu.pipeline.engine import TranscriptionEngine
    from clearconverse_tpu.serve.tasks import TaskRunner

    audio = synth_conversation()
    paths = []
    for i in range(2):
        p = tmp_path / f"g{i}.wav"
        write_wav(str(p), audio, SR)
        paths.append(str(p))

    fake = FakeModels()
    runner = TaskRunner(str(tmp_path / "out"),
                        lambda: TranscriptionEngine(
                            Config(noise_reduction_amount=0.0),
                            TPUConfig(), models=fake))
    group = [(f"t{i}", paths[i], threading.Event(), threading.Event())
             for i in range(2)]
    for tid, _, _, _ in group:
        (tmp_path / "out" / tid).mkdir(parents=True, exist_ok=True)
        (tmp_path / "out" / tid / "in_progress.txt").write_text("x")
    runner._run_group(group)

    for tid, _, _, _ in group:
        tdir = tmp_path / "out" / tid
        assert (tdir / "completed.txt").exists()
        assert not (tdir / "in_progress.txt").exists()
        assert (tdir / "transcript.txt").read_text().startswith("[SPEAKER_")
        assert runner.result_store[tid]["status"] == "completed"
    # Transcription batches were shared (one gen-0 call covers both files).
    first_call_rows = len(fake.transcribe_calls[0])
    assert first_call_rows >= 8  # both files' generation-0 items together


def test_task_runner_stress_concurrent_cancels(tmp_path):
    """Race-handling stress (SURVEY §5.2): many tasks started concurrently
    with cancels landing mid-flight. Invariants: the dispatcher drains (no
    deadlock), every task reaches a terminal marker, cancellation never
    manufactures error.txt, and completed tasks have a transcript +
    result_store entry. Cancel/completion may genuinely race — both
    markers together is legal — but a task with NEITHER is a lost task."""
    import threading
    import time as _time
    from clearconverse_tpu.audio.wav import write_wav
    from clearconverse_tpu.config import Config, TPUConfig
    from clearconverse_tpu.pipeline.engine import TranscriptionEngine
    from clearconverse_tpu.serve.tasks import TaskRunner

    wav = tmp_path / "s.wav"
    write_wav(str(wav), synth_conversation(), SR)
    runner = TaskRunner(str(tmp_path / "out"),
                        lambda: TranscriptionEngine(
                            Config(noise_reduction_amount=0.0),
                            TPUConfig(), models=FakeModels()))
    N = 10
    tids = [f"s{i}" for i in range(N)]
    for t in tids:
        runner.start(t, str(wav))
    _time.sleep(0.05)
    for t in tids[1::2]:            # cancel half, racing the dispatcher
        runner.cancel(t)

    # Drain = every non-cancelled task's done event fires and the queue
    # empties. active_tasks entries deliberately LINGER after completion —
    # the reference keeps active_processes until cleanup/cancel too
    # (back/api.py:2052 vs :1592).
    deadline = _time.time() + 30
    def drained():
        live = [i for t, i in runner.active_tasks.items()
                if not i["done"].is_set() and not i["cancel"].is_set()]
        return not live and not runner._queue
    while not drained() and _time.time() < deadline:
        _time.sleep(0.05)
    assert drained()                                       # no hang

    for t in tids:
        tdir = tmp_path / "out" / t
        cancelled = (tdir / "cancelled.txt").exists()
        completed = (tdir / "completed.txt").exists()
        assert cancelled or completed, f"{t} lost (no terminal marker)"
        assert not (tdir / "error.txt").exists()
        assert not (tdir / "in_progress.txt").exists()
        if completed:
            assert (tdir / "transcript.txt").read_text().startswith("[")
            assert runner.result_store[t]["status"] == "completed"
    # The even (never-cancelled) tasks must all have completed.
    for t in tids[0::2]:
        assert (tmp_path / "out" / t / "completed.txt").exists()


def test_startup_warm_hook(monkeypatch, tmp_path):
    """CC_TPU_STARTUP_WARM=1 registers a startup hook that loads models and
    drives warm_decode_shapes IN-PROCESS (executable install is per-process
    on the tunnel platform, so only an in-process warm spares the server's
    own first requests)."""
    import asyncio

    import clearconverse_tpu.serve.warmup as wmod

    called = threading.Event()
    seen = {}

    def fake_warm(engine, drive):
        seen["engine"] = engine
        drive("decode long-window rows=1 prompt=none", lambda: None)
        called.set()

    monkeypatch.setattr(wmod, "warm_decode_shapes", fake_warm)
    monkeypatch.setenv("CC_TPU_STARTUP_WARM", "1")

    def engine_factory():
        return TranscriptionEngine(Config(noise_reduction_amount=0.0),
                                   TPUConfig(), models=FakeModels())

    app = create_app(str(tmp_path / "o"), str(tmp_path / "u"),
                     engine_factory, start_cleanup=False)

    async def run():
        for cb in app.on_startup:
            await cb()

    asyncio.run(run())
    assert called.wait(10)
    assert isinstance(seen["engine"], TranscriptionEngine)
    assert seen["engine"].models_are_loaded()


def test_max_group_env_override(tmp_path, monkeypatch):
    """CC_TPU_MAX_GROUP tunes grouped-batch size; malformed/invalid values
    fall back to the default."""
    from clearconverse_tpu.serve.tasks import MAX_GROUP, TaskRunner

    monkeypatch.setenv("CC_TPU_MAX_GROUP", "8")
    assert TaskRunner(str(tmp_path), lambda: None).max_group == 8
    monkeypatch.setenv("CC_TPU_MAX_GROUP", "nope")
    assert TaskRunner(str(tmp_path), lambda: None).max_group == MAX_GROUP
    monkeypatch.setenv("CC_TPU_MAX_GROUP", "0")
    assert TaskRunner(str(tmp_path), lambda: None).max_group == MAX_GROUP
    monkeypatch.delenv("CC_TPU_MAX_GROUP")
    assert TaskRunner(str(tmp_path), lambda: None,
                      max_group=2).max_group == 2
