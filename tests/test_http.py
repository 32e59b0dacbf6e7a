"""Unit tests for the first-party HTTP/WS framework internals
(serve/http.py): multipart parsing, route compilation, WebSocket frame
codec, duplicate-route rule."""

import asyncio
import json
import struct

import pytest

from clearconverse_tpu.serve.http import (
    App, WebSocket, _compile_path, json_response, parse_multipart)


# ---------------------------------------------------------------- multipart

def _mp_body(boundary: str, parts):
    out = b""
    for headers, content in parts:
        out += f"--{boundary}\r\n".encode() + headers + b"\r\n\r\n" + content + b"\r\n"
    return out + f"--{boundary}--\r\n".encode()


def test_parse_multipart_fields_and_files():
    b = "XBOUNDARYX"
    body = _mp_body(b, [
        (b'Content-Disposition: form-data; name="url"', b"http://x/y.mp3"),
        (b'Content-Disposition: form-data; name="file"; filename="a.wav"\r\n'
         b"Content-Type: audio/wav", b"RIFF\x00\x01binary\r\ndata"),
    ])
    fields, files = parse_multipart(body, f'multipart/form-data; boundary={b}')
    assert fields == {"url": "http://x/y.mp3"}
    assert files["file"].filename == "a.wav"
    assert files["file"].content_type == "audio/wav"
    assert files["file"].content == b"RIFF\x00\x01binary\r\ndata"


def test_parse_multipart_binary_trailing_crlf_bytes():
    """ADVICE r1 (high): trailing 0x0D/0x0A bytes in binary payloads must
    survive parsing — the old strip(b"\\r\\n") silently truncated them."""
    b = "XBOUNDARYX"
    for tail in (b"\r\n", b"\n\n\r\r", b"\x0d", b"\x0a" * 5):
        payload = b"\x00\x01RIFFdata" + tail
        body = _mp_body(b, [
            (b'Content-Disposition: form-data; name="file"; filename="a.wav"\r\n'
             b"Content-Type: audio/wav", payload),
        ])
        _, files = parse_multipart(body, f"multipart/form-data; boundary={b}")
        assert files["file"].content == payload, tail


def test_parse_multipart_leading_crlf_and_empty_part():
    b = "bnd"
    payload = b"\r\n\r\nmiddle\r\n"
    body = _mp_body(b, [
        (b'Content-Disposition: form-data; name="f"; filename="x"', payload),
        (b'Content-Disposition: form-data; name="empty"; filename="e"', b""),
    ])
    _, files = parse_multipart(body, f"multipart/form-data; boundary={b}")
    assert files["f"].content == payload
    assert files["empty"].content == b""


def test_parse_multipart_preamble_and_no_trailing_crlf():
    """First delimiter without leading CRLF; preamble text before it when
    present; closing delimiter without the trailing CRLF."""
    b = "bb1"
    direct = (f"--{b}\r\n".encode()
              + b'Content-Disposition: form-data; name="k"\r\n\r\nv\r\n'
              + f"--{b}--".encode())
    fields, _ = parse_multipart(direct, f"multipart/form-data; boundary={b}")
    assert fields == {"k": "v"}

    with_preamble = b"ignored preamble\r\n" + direct
    fields, _ = parse_multipart(with_preamble,
                                f"multipart/form-data; boundary={b}")
    assert fields == {"k": "v"}


def test_parse_multipart_quoted_boundary():
    b = "qq123"
    body = _mp_body(b, [(b'Content-Disposition: form-data; name="k"', b"v")])
    fields, _ = parse_multipart(body, f'multipart/form-data; boundary="{b}"')
    assert fields == {"k": "v"}


# ------------------------------------------------------------------ routing

def test_compile_path_params():
    pat = _compile_path("/task/{task_id}/status")
    m = pat.match("/task/abc-123/status")
    assert m and m.group("task_id") == "abc-123"
    assert not pat.match("/task/a/b/status")

    pat = _compile_path("/download/{file_path:path}")
    m = pat.match("/download/tid/transcript.txt")
    assert m and m.group("file_path") == "tid/transcript.txt"


def test_duplicate_route_first_wins():
    app = App()

    @app.get("/x/{i}")
    async def first(req):
        return {"v": 1}

    @app.get("/x/{i}")
    async def second(req):
        return {"v": 2}

    handlers = [fn for m, p, fn in app._routes if m == "GET"]
    assert len(handlers) == 1 and handlers[0] is first


def test_json_response():
    r = json_response({"a": 1}, 202)
    assert r.status == 202
    assert json.loads(r.body) == {"a": 1}
    assert r.content_type == "application/json"


# ------------------------------------------------------------ chunked body

def test_chunked_transfer_encoding_request():
    """A chunked client must get a parsed body, not a hang (VERDICT r1)."""
    app = App()

    @app.post("/echo")
    async def echo(req):
        return {"n": len(req.body), "text": req.body.decode()}

    class _W:
        data = b""

        def write(self, b):
            self.data += b

        async def drain(self):
            pass

        def close(self):
            pass

    async def run():
        reader = asyncio.StreamReader()
        writer = _W()
        body = (b"POST /echo HTTP/1.1\r\nTransfer-Encoding: chunked\r\n"
                b"Connection: close\r\n\r\n"
                b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n")
        reader.feed_data(body)
        reader.feed_eof()
        await app._handle(reader, writer)
        head, _, payload = writer.data.partition(b"\r\n\r\n")
        assert b"200" in head.split(b"\r\n")[0]
        assert json.loads(payload) == {"n": 11, "text": "hello world"}

    asyncio.run(run())


def test_chunked_body_over_cap_rejected():
    from clearconverse_tpu.serve import http as hmod

    app = App()

    @app.post("/x")
    async def x(req):
        return {}

    class _W:
        data = b""

        def write(self, b):
            self.data += b

        async def drain(self):
            pass

        def close(self):
            pass

    async def run():
        reader = asyncio.StreamReader()
        writer = _W()
        reader.feed_data(b"POST /x HTTP/1.1\r\nTransfer-Encoding: chunked\r\n\r\n")
        # One chunk claiming to exceed MAX_BODY: rejected before reading it.
        reader.feed_data(hex(hmod.MAX_BODY + 1)[2:].encode() + b"\r\n")
        reader.feed_eof()
        await app._handle(reader, writer)
        assert b"413" in writer.data.split(b"\r\n")[0]

    asyncio.run(run())


def _drive_raw(raw: bytes) -> bytes:
    """Feed raw bytes to App._handle on a fresh app with one POST route;
    return everything written back."""
    app = App()

    @app.post("/x")
    async def x(req):
        return {"n": len(req.body)}

    class _W:
        data = b""

        def write(self, b):
            self.data += b

        async def drain(self):
            pass

        def close(self):
            pass

    async def run():
        reader = asyncio.StreamReader()
        writer = _W()
        reader.feed_data(raw)
        reader.feed_eof()
        await app._handle(reader, writer)
        return writer.data

    return asyncio.run(run())


def test_malformed_content_length_gets_400():
    """A non-numeric or negative Content-Length must answer 400 — it
    previously escaped _handle as an unhandled ValueError, killing the
    connection with no response at all."""
    for bad in (b"abc", b"-5", b"1e3"):
        out = _drive_raw(b"POST /x HTTP/1.1\r\nContent-Length: " + bad
                         + b"\r\n\r\n")
        assert b"400" in out.split(b"\r\n")[0], (bad, out[:60])
        assert b"malformed content-length" in out


def test_malformed_chunk_size_gets_400():
    """A garbage chunk-size line must answer 400, not die mid-read."""
    out = _drive_raw(b"POST /x HTTP/1.1\r\nTransfer-Encoding: chunked\r\n"
                     b"\r\nzz\r\nhello\r\n0\r\n\r\n")
    assert b"400" in out.split(b"\r\n")[0]
    assert b"malformed chunked body" in out


def test_unbounded_headers_get_431():
    """Header bytes past MAX_HEADER_BYTES answer 431 instead of growing
    server memory without limit."""
    from clearconverse_tpu.serve import http as hmod
    filler = b"x-pad: " + b"a" * 1000 + b"\r\n"
    n = hmod.MAX_HEADER_BYTES // len(filler) + 2
    out = _drive_raw(b"POST /x HTTP/1.1\r\n" + filler * n
                     + b"Content-Length: 0\r\n\r\n")
    assert b"431" in out.split(b"\r\n")[0]


def test_ws_oversized_frame_fails_connection():
    """A client frame claiming > MAX_WS_FRAME bytes closes with 1009
    instead of buffering it into memory."""
    import struct as _struct
    from clearconverse_tpu.serve import http as hmod
    from clearconverse_tpu.serve.http import WebSocket

    async def run():
        reader = asyncio.StreamReader()
        writer = _Writer()
        ws = WebSocket(reader, writer, {})
        # masked text frame, 64-bit length far over the cap
        reader.feed_data(bytes([0x81, 0x80 | 127])
                         + _struct.pack(">Q", hmod.MAX_WS_FRAME + 1)
                         + b"\x00\x00\x00\x00")
        reader.feed_eof()
        assert await ws.receive_text() is None
        assert ws.closed
        assert writer.data[:2] == bytes([0x88, 2])        # close frame
        assert _struct.unpack(">H", writer.data[2:4])[0] == 1009

    asyncio.run(run())


def test_ws_oversized_ping_pong_clamped():
    """Pong payloads clamp to the RFC 6455 125-byte control-frame cap —
    echoing more would set the mask bit in the length byte."""
    from clearconverse_tpu.serve.http import WebSocket

    async def run():
        reader = asyncio.StreamReader()
        writer = _Writer()
        ws = WebSocket(reader, writer, {})
        payload = b"p" * 200
        mask = b"\x01\x02\x03\x04"
        reader.feed_data(bytes([0x89, 0x80 | 126]) + (200).to_bytes(2, "big")
                         + mask + _mask(payload, mask))
        # follow with a real text frame so receive_text returns
        text = b"hi"
        reader.feed_data(bytes([0x81, 0x80 | len(text)]) + mask
                         + _mask(text, mask))
        reader.feed_eof()
        assert await ws.receive_text() == "hi"
        assert writer.data[0] == 0x8A and writer.data[1] == 125
        assert writer.data[2:127] == b"p" * 125

    asyncio.run(run())


# --------------------------------------------------------------- websocket

class _Writer:
    def __init__(self):
        self.data = b""

    def write(self, b):
        self.data += b

    async def drain(self):
        pass


def _mask(payload: bytes, mask: bytes) -> bytes:
    return bytes(c ^ mask[i % 4] for i, c in enumerate(payload))


def test_ws_send_and_receive_roundtrip():
    async def run():
        reader = asyncio.StreamReader()
        writer = _Writer()
        ws = WebSocket(reader, writer, {})

        await ws.send_json({"progress": 42, "message": "hi"})
        frame = writer.data
        assert frame[0] == 0x81                      # FIN + text
        n = frame[1] & 0x7F
        assert json.loads(frame[2 : 2 + n]) == {"progress": 42, "message": "hi"}

        # Client→server masked text frame.
        payload = b'{"x":1}'
        mask = b"\x01\x02\x03\x04"
        reader.feed_data(bytes([0x81, 0x80 | len(payload)]) + mask
                         + _mask(payload, mask))
        # Ping: transparently answered with a pong.
        reader.feed_data(bytes([0x89, 0x80 | 2]) + mask + _mask(b"pi", mask))
        reader.feed_data(bytes([0x81, 0x80 | 2]) + mask + _mask(b"{}", mask))

        writer.data = b""
        assert await ws.receive_text() == '{"x":1}'
        assert await ws.receive_text() == "{}"
        assert writer.data[0] == 0x8A                # pong emitted

        # Close frame → None.
        reader.feed_data(bytes([0x88, 0x80]) + mask)
        assert await ws.receive_text() is None
        assert ws.closed

    asyncio.run(run())


def test_ws_extended_length_frames():
    async def run():
        reader = asyncio.StreamReader()
        writer = _Writer()
        ws = WebSocket(reader, writer, {})
        payload = ("x" * 300).encode()
        await ws.send_text(payload.decode())
        assert writer.data[1] == 126
        assert struct.unpack(">H", writer.data[2:4])[0] == 300

        mask = b"\xaa\xbb\xcc\xdd"
        reader.feed_data(bytes([0x81, 0x80 | 126]) + struct.pack(">H", 300)
                         + mask + _mask(payload, mask))
        assert await ws.receive_text() == payload.decode()

    asyncio.run(run())


def test_chunked_eof_mid_body_is_not_a_complete_request():
    """A connection dropped at a chunk boundary must NOT be processed as a
    complete (truncated) body — EOF is a dropped connection, not a
    terminating zero chunk."""
    app = App()
    seen = []

    @app.post("/echo")
    async def echo(req):
        seen.append(req.body)
        return {"n": len(req.body)}

    class _W:
        data = b""

        def write(self, b):
            self.data += b

        async def drain(self):
            pass

        def close(self):
            pass

    async def run():
        reader = asyncio.StreamReader()
        writer = _W()
        reader.feed_data(b"POST /echo HTTP/1.1\r\n"
                         b"Transfer-Encoding: chunked\r\n\r\n"
                         b"5\r\nhello\r\n")   # connection dies here
        reader.feed_eof()
        await app._handle(reader, writer)
        assert seen == []                      # handler never ran
        assert b"200" not in writer.data.split(b"\r\n")[0:1][0] \
            if writer.data else True

    asyncio.run(run())
