"""S1 TCP seed source: reference process_input_buff parity over a real
socket (split-on-[\\n\\r], 1-char-line drop, scheme gate, EOF-flush quirk,
cross-recv reassembly). Reference: crawler.cc:1281-1332, :679-704."""
import socket
import time

from mycelium_ray.sources.tcpseed import (TcpSeedListener, _ConnState,
                                          _flush, _split_lines)


def _drain(listener, expect_n, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if listener.stats.n_accepted + listener.stats.n_rejected >= expect_n:
            return
        time.sleep(0.02)


def test_split_semantics_unit():
    st = _ConnState()
    # separator runs produce no empties; 1-char line "x" is dropped
    # (hare > tortoise+1 guard, crawler.cc:1289)
    lines = _split_lines(st, "http://a.com/\r\nx\nhttp://b.com/\n")
    assert lines == ["http://a.com/", "http://b.com/"]
    assert st.buf == ""
    # partial line buffers across calls
    lines = _split_lines(st, "http://c.co")
    assert lines == [] and st.buf == "http://c.co"
    lines = _split_lines(st, "m/page\n")
    assert lines == ["http://c.com/page"] and st.buf == ""
    # flush returns the unterminated tail
    _split_lines(st, "ftp://tail.example/")
    assert _flush(st) == "ftp://tail.example/"
    assert _flush(st) is None


def test_tcp_ingest_end_to_end():
    with TcpSeedListener() as src:
        c = socket.create_connection((src.host, src.port))
        c.sendall(b"http://ok.example/a\r\n")
        c.sendall(b"https://rejected.example/\n")    # non-http mid-stream
        c.sendall(b"notaurl^^\n")                    # parse error
        # URL split across TCP writes reassembles
        c.sendall(b"http://split.example/lo")
        time.sleep(0.05)
        c.sendall(b"ng/path\n")
        c.close()
        _drain(src, 4)
        urls = sorted(u.get() for u in src.urls())
        assert urls == ["http://ok.example/a",
                        "http://split.example/long/path"]
        assert src.stats.n_rejected == 2
        assert src.stats.n_connections == 1


def test_eof_flush_quirk_accepts_schemeless():
    # the reference flush path (crawler.cc:1310-1323) pushes the parsed
    # tail WITHOUT the absolute/http gate: an ftp tail is accepted at EOF
    # where the same line mid-stream is rejected
    with TcpSeedListener() as src:
        c = socket.create_connection((src.host, src.port))
        c.sendall(b"ftp://mid.example/\nftp://tail.example/")
        c.close()
        _drain(src, 2)
        urls = sorted(u.get() for u in src.urls())
        assert urls == ["ftp://tail.example/"]
        assert src.stats.n_rejected == 1


def test_multiple_connections_and_dataset(ray_session):
    with TcpSeedListener() as src:
        for i in range(3):
            c = socket.create_connection((src.host, src.port))
            c.sendall(f"http://host{i}.example/\n".encode())
            c.close()
        _drain(src, 3)
        assert src.stats.n_connections == 3
        ds = src.to_dataset()
        got = sorted(r["url"] for r in ds.take_all())
        assert got == [f"http://host{i}.example/" for i in range(3)]
