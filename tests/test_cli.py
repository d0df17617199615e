"""CLI entry point (mycelium_ray/cli.py) — the crawler-binary analog:
sharded crawl to parquet, TCP seed ingest, query runner. Runs in-process
against the session Ray fixture (the CLI's guarded init must NOT tear
down a session it didn't start)."""
import json
import socket
import threading
import time

import pyarrow.parquet as pq
import pytest

from mycelium_ray.cli import main


def test_cli_crawl_sharded(ray_session, tmp_path, capsys):
    out = str(tmp_path / "rows")
    rc = main(["crawl", "--corpus", "sf0.001", "--out", out,
               "--shards", "2", "--parallel", "16"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["mode"] == "sharded"
    assert stats["n_seen"] == 1297 and stats["n_saved"] == 1297
    tbl = pq.read_table(out)
    assert tbl.num_rows == 1297
    assert {"url", "content", "decode_ok"} <= set(tbl.schema.names)
    import ray
    assert ray.is_initialized()  # session fixture must survive the CLI


def test_cli_seed_file_and_listen(ray_session, tmp_path, capsys):
    """Seeds from BOTH a file and a live TCP window are merged; the file
    seed set is tiny so the crawl proves the CLI used them."""
    seeds = tmp_path / "seeds.txt"
    seeds.write_text("http://host000.test/img/0.png\n"
                     "http://host001.test/img/0.png\n")

    def client(port_holder):
        # wait for the CLI's listener banner on stderr → we can't read it
        # here, so poll-connect the advertised fixed port instead
        for _ in range(100):
            try:
                s = socket.create_connection(("127.0.0.1",
                                              port_holder["port"]), 0.2)
                s.sendall(b"http://host002.test/img/0.png\n")
                s.close()
                return
            except OSError:
                time.sleep(0.05)

    port = 38741  # fixed test port (OS-assigned would race the client)
    t = threading.Thread(target=client, args=({"port": port},), daemon=True)
    t.start()
    rc = main(["crawl", "--corpus", "sf0.001", "--seeds", str(seeds),
               "--listen-port", str(port), "--listen-seconds", "1.0",
               "--shards", "2", "--parallel", "8"])
    t.join(timeout=5)
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_seeds"] == 3
    assert stats["n_seen"] == 3


def test_cli_query_runner(ray_session, tmp_path, capsys, monkeypatch):
    monkeypatch.chdir("/root/repo")
    out = str(tmp_path / "tc.parquet")
    rc = main(["query", "token_count",
               "--sf-dir", "/root/testdata/sf0.001", "--out", out])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["query"] == "token_count"
    assert pq.read_table(out).num_rows == 500


def test_cli_query_unknown(ray_session, capsys, monkeypatch):
    monkeypatch.chdir("/root/repo")
    assert main(["query", "no_such_op"]) == 2


def test_cli_sweep_resumable(ray_session, tmp_path, capsys, monkeypatch):
    monkeypatch.chdir("/root/repo")
    root = str(tmp_path / "sweep")
    only = "token_count,doc_length_histogram"
    rc = main(["sweep", "--out-root", root, "--only", only,
               "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[-1]["sweep"] == {"done": 2, "skipped": 0, "errors": 0,
                                  "total": 2}
    tc = pq.read_table(f"{root}/token_count")
    assert tc.num_rows == 500
    assert (tmp_path / "sweep/token_count/_SUCCESS").exists()

    # delete ONE sentinel: the re-run must recompute only that query
    (tmp_path / "sweep/doc_length_histogram/_SUCCESS").unlink()
    rc = main(["sweep", "--out-root", root, "--only", only,
               "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    statuses = {l["query"]: l["status"] for l in lines if "query" in l}
    assert statuses == {"token_count": "skipped",
                        "doc_length_histogram": "done"}


def test_cli_sweep_no_duplicate_rows_after_partial_failure(
        ray_session, tmp_path, capsys, monkeypatch):
    """A killed attempt leaves data files but no sentinel; the re-run
    must OVERWRITE them (Ray write_parquet appends by default), and a
    sentinel from a different sf_dir must not be treated as done."""
    monkeypatch.chdir("/root/repo")
    root = str(tmp_path / "sweep")
    rc = main(["sweep", "--out-root", root, "--only", "token_count",
               "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    capsys.readouterr()
    # simulate the kill: sentinel gone, stale data files remain
    (tmp_path / "sweep/token_count/_SUCCESS").unlink()
    rc = main(["sweep", "--out-root", root, "--only", "token_count",
               "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    capsys.readouterr()
    assert pq.read_table(f"{root}/token_count").num_rows == 500  # not 1000

    # stale-scale sentinel: requesting another sf_dir must recompute
    rc = main(["sweep", "--out-root", root, "--only", "token_count",
               "--sf-dir", "/root/testdata/sf0.01"])
    assert rc == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    statuses = {l["query"]: l["status"] for l in lines if "query" in l}
    assert statuses == {"token_count": "done"}


def test_cli_crawl_tls(ray_session, tmp_path, capsys):
    """--serve --tls: the https corpus over a real-TLS listener, decoded
    rows written out; seen-count matches the https-gate expectation (the
    http count plus the secure.test seed the https gate now admits as a
    resolve-fail row)."""
    out = str(tmp_path / "rows")
    rc = main(["crawl", "--corpus", "sf0.001", "--serve", "--tls",
               "--out", out, "--parallel", "16"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["mode"] == "tls"
    assert stats["n_seen"] == 1298
    tbl = pq.read_table(out)
    assert tbl.num_rows == 1298
    assert {"url", "content", "decode_ok"} <= set(tbl.schema.names)
    urls = tbl.column("url").to_pylist()
    assert urls and all(u.startswith("https://") for u in urls)
