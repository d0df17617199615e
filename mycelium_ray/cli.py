"""Command-line entry point — the rebuild's analog of the reference's
``build/release/crawler/crawler`` binary (crawler.cc main, :1390-1440):
seeds in (file / stdin / live TCP port, S1), crawl with robots +
politeness + URL-seen dedup, image rows out (parquet), one JSON stats
line to stdout. This module OWNS its Ray session (guarded init) — the
library never calls ray.init().

Usage (see ``--help``):

    # deterministic synthetic corpus, sharded in-process crawl
    python -m mycelium_ray.cli crawl --corpus sf0.001 --out /tmp/out

    # the same corpus served over REAL TCP (http.client fetch path)
    python -m mycelium_ray.cli crawl --corpus sf0.001 --serve --out /tmp/out

    # seeds from a file / stdin, discovery mode, resumable checkpoints
    python -m mycelium_ray.cli crawl --corpus sf0.01 --seeds seeds.txt \
        --follow-links --dedup cuckoo --store-root /tmp/ckpt \
        --checkpoint-every 2 [--resume]

    # live TCP seed ingest (reference S1): clients write URL lines
    python -m mycelium_ray.cli crawl --corpus sf0.001 \
        --listen-port 0 --listen-seconds 5

    # interactive control (reference S7): qlen/status/dumpq/quit on stdin
    python -m mycelium_ray.cli crawl --corpus sf0.01 --control

    # run any queries() operator over a testdata dir
    python -m mycelium_ray.cli query token_count --sf-dir /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# crawl-corpus scale tiers (the bench protocol's sizes)
_SCALES = {
    "sf0.001": dict(n_hosts=48, pages_per_host=18),
    "sf0.01": dict(n_hosts=160, pages_per_host=55),
    "sf0.1": dict(n_hosts=512, pages_per_host=170),
}


def _ray_init(num_cpus: int | None) -> bool:
    """Guarded init; returns True when THIS call started the session (the
    CLI only shuts down a session it owns — embedding in a larger program
    or the test fixture leaves the outer session alone)."""
    import os

    import ray
    if ray.is_initialized():
        return False
    # Under `ray job submit` the job driver must JOIN the running cluster
    # (RAY_ADDRESS is set by the job runtime, e.g. "auto"); standalone it
    # starts a local session. num_cpus only applies to a session we start.
    address = os.environ.get("RAY_ADDRESS", "local")
    kwargs = dict(address=address, include_dashboard=False,
                  logging_level="ERROR")
    if num_cpus and address == "local":
        kwargs["num_cpus"] = num_cpus
    ray.init(**kwargs)
    return True


def _read_seed_file(path: str) -> list[str]:
    fh = sys.stdin if path == "-" else open(path)
    try:
        return [ln.strip() for ln in fh if ln.strip()]
    finally:
        if fh is not sys.stdin:
            fh.close()


def _listen_seeds(port: int, seconds: float) -> list[str]:
    """Reference-S1 live ingest: accept URL lines over TCP for a window."""
    from .sources.tcpseed import TcpSeedListener
    src = TcpSeedListener(port=port)
    print(json.dumps({"listening": {"host": src.host, "port": src.port,
                                    "seconds": seconds}}),
          file=sys.stderr, flush=True)
    time.sleep(seconds)
    src.close()
    return [u.normalize().get() for u in src.urls()]


def _decode_and_write(crawler, args) -> None:
    """Shared post-run tail for the RayCrawler modes: fetched rows →
    DecodeValidate → parquet (--out) or count."""
    from .stages.decode import DecodeValidate
    ds = crawler.fetched_dataset()
    ds = ds.map_batches(DecodeValidate(), batch_format="pyarrow",
                        batch_size=256)
    if args.out:
        ds.write_parquet(args.out)
    else:
        ds.count()


def _run_daemon_with_listener(crawler, args):
    """Reference daemon mode: crawl and ingest live TCP seeds
    CONCURRENTLY (no wave barrier); the listener closes after
    --listen-seconds and the crawl drains what remains."""
    import threading

    from .sources.tcpseed import TcpSeedListener
    src = TcpSeedListener(port=args.listen_port or 0)
    print(json.dumps({"daemon_listening": {
        "host": src.host, "port": src.port,
        "seconds": args.listen_seconds}}), file=sys.stderr, flush=True)
    timer = threading.Timer(args.listen_seconds, src.close)
    timer.daemon = True
    timer.start()
    try:
        return crawler.run_daemon(seed_poll=src.poll_lines)
    finally:
        timer.cancel()
        src.close()


def cmd_crawl(args) -> int:
    from .corpus import generate_corpus

    scale = _SCALES.get(args.corpus, _SCALES["sf0.001"])
    _images, site, corpus_seeds = generate_corpus(seed=42,
                                                  hot_host_factor=8, **scale)
    if getattr(args, "control", False) and args.seeds == "-":
        print("--control and --seeds - both read stdin; pass seeds as a "
              "file to use the control channel", file=sys.stderr)
        return 2
    seeds: list[str] = []
    if args.seeds:
        seeds.extend(_read_seed_file(args.seeds))
    if args.listen_port is not None and not args.daemon:
        # two-phase mode: listen for a window, then crawl. --daemon
        # instead keeps the channel open DURING the crawl (below).
        seeds.extend(_listen_seeds(args.listen_port, args.listen_seconds))
    if not seeds:
        seeds = corpus_seeds
    if args.follow_links:
        # discovery mode wants sparse entry points, not the full list
        seeds = seeds[:: args.seed_stride] if args.seed_stride > 1 else seeds

    owns_ray = _ray_init(args.num_cpus)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray

    t0 = time.perf_counter()
    server = None
    try:
        if args.serve:
            # real-TCP path: serve the corpus and fetch over http.client
            from .httpfixture import FixtureHTTPServer
            from .pipelines import crawl as crawl_mod
            server_ctx = ca_pem = None
            schemes = ("http",)
            if args.tls:
                # real-TLS path: https corpus, self-signed loopback root,
                # full verification in every fetcher actor
                from .corpus import to_https
                from .tlscert import (make_self_signed_cert,
                                      make_server_context)
                site, seeds = to_https(site, seeds)
                from .tlscert import tls_san_hosts
                ca_pem, key_pem = make_self_signed_cert(
                    hosts=tls_san_hosts(site, seeds))
                server_ctx = make_server_context(ca_pem, key_pem)
                schemes = ("https",)
            server = FixtureHTTPServer(site,
                                       tls_context=server_ctx).__enter__()
            dns_addr = None
            if args.dns:
                from .dnsfixture import FixtureDNSServer, zone_from_site
                dns_server = FixtureDNSServer(
                    zone_from_site(site)).__enter__()
                dns_addr = dns_server.addr
            crawler = crawl_mod.RayCrawler(
                site, parallel=args.parallel,
                n_fetchers=max(2, args.shards), dedup=args.dedup,
                checkpoint_every=args.checkpoint_every,
                follow_links=args.follow_links,
                transport_addr=server.addr,
                transport_ca=ca_pem, transport_dns=dns_addr,
                schemes=schemes)
            crawler.feed(seeds)
            result = (_run_daemon_with_listener(crawler, args)
                      if args.daemon else crawler.run())
            _decode_and_write(crawler, args)
            stats = {"mode": ("tls" if args.tls else "socket")
                             + ("+daemon" if args.daemon else ""),
                     "addr": list(server.addr),
                     "n_seen": len(result.url_seen),
                     "n_saved": len(result.saved),
                     "n_live_seeds": crawler.metrics.get("n_live_seeds", 0),
                     "n_rounds": None}
        elif args.daemon:
            # daemon over the in-process fixture transport: same event
            # loop, no TCP fetch path — the live-INGEST channel is still
            # real TCP
            from .pipelines import crawl as crawl_mod
            crawler = crawl_mod.RayCrawler(
                site, parallel=args.parallel,
                n_fetchers=max(2, args.shards), dedup=args.dedup,
                checkpoint_every=args.checkpoint_every,
                follow_links=args.follow_links)
            crawler.feed(seeds)
            result = _run_daemon_with_listener(crawler, args)
            _decode_and_write(crawler, args)
            stats = {"mode": "daemon",
                     "n_seen": len(result.url_seen),
                     "n_saved": len(result.saved),
                     "n_live_seeds": crawler.metrics.get("n_live_seeds", 0),
                     "n_rounds": None}
        else:
            from .pipelines.crawl_sharded import run_crawl_sharded
            sstats, ds = run_crawl_sharded(
                site, seeds, parallel=args.parallel,
                n_shards=args.shards, dedup=args.dedup,
                out_dir=args.out, follow_links=args.follow_links,
                store_root=args.store_root,
                checkpoint_every=args.checkpoint_every,
                resume=args.resume,
                # S7 interactive control: qlen/status/dumpq/quit on stdin,
                # JSON replies on stderr (stdout carries the stats line)
                control_stream=sys.stdin if args.control else None)
            stats = {"mode": "sharded", "n_seen": sstats["n_seen"],
                     "n_saved": sstats["n_saved"],
                     "n_rounds": sstats["n_rounds"]}
        sec = time.perf_counter() - t0
        stats.update({"corpus": args.corpus, "n_seeds": len(seeds),
                      "sec": round(sec, 3),
                      "urls_per_sec": round(stats["n_seen"] / sec, 1),
                      "out": args.out})
        print(json.dumps(stats), flush=True)
        return 0
    finally:
        if server is not None:
            server.__exit__()
        if owns_ray:
            ray.shutdown()


def _load_queries():
    """Import the driver-contract module from the repo root; None if not
    runnable from here."""
    if "." not in sys.path:
        sys.path.insert(0, ".")
    try:
        import __ray_entry__ as entrymod
        return entrymod.queries()
    except ModuleNotFoundError:
        print("run from the repo root (needs __ray_entry__.py)",
              file=sys.stderr)
        return None


def _write_result(res, path: str):
    """Write a Dataset / pa.Table / DataFrame result as a parquet
    DIRECTORY, overwriting any previous contents (Ray's write_parquet
    APPENDS by default — leftover files from an earlier run would ride
    along as duplicated rows). Returns the row count when known without
    consuming the Dataset. Refuses to clobber a path that doesn't look
    like prior query output — `--out .` must never delete the user's
    working tree."""
    import os
    import shutil
    if os.path.isfile(path):
        # previous single-file output format (or an unrelated file):
        # replace the file, never rmtree around it
        os.remove(path)
    elif os.path.isdir(path):
        entries = os.listdir(path)
        # prior output = empty, or nothing but parquet parts + markers
        looks_like_output = all(
            e in ("_SUCCESS", "_metadata", "_common_metadata")
            or e.endswith(".parquet") or e.endswith(".crc")
            for e in entries)
        if not looks_like_output:
            raise SystemExit(
                f"--out {path!r} exists and doesn't look like prior query "
                "output (no _SUCCESS / part-*.parquet); refusing to delete "
                "it — pick an empty or new directory")
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    if hasattr(res, "write_parquet"):
        res.write_parquet(path)
        return None
    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
    pq.write_table(tbl, os.path.join(path, "part-0.parquet"))
    return tbl.num_rows


def cmd_query(args) -> int:
    owns_ray = _ray_init(args.num_cpus)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray
    qs = _load_queries()
    if qs is None:
        return 2
    if args.name not in qs:
        print(f"unknown query {args.name!r}; available: "
              + " ".join(sorted(qs)), file=sys.stderr)
        return 2
    t0 = time.perf_counter()
    res = qs[args.name](args.sf_dir)
    if args.out:
        n = _write_result(res, args.out)
    else:
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        n = len(df)
        with __import__("pandas").option_context("display.max_rows", 20):
            print(df)
    if getattr(args, "stats", False) and hasattr(res, "stats"):
        # Ray Data's per-stage execution profile (wall time, rows,
        # memory per operator) — the EXPLAIN ANALYZE surface; printed
        # after the result so the JSON line below stays last
        print(res.stats(), file=sys.stderr)
    print(json.dumps({"query": args.name, "sf_dir": args.sf_dir,
                      "rows": n, "sec": round(time.perf_counter() - t0, 3),
                      "out": args.out}), flush=True)
    if owns_ray:
        ray.shutdown()
    return 0


def cmd_sweep(args) -> int:
    """Materialize queries() results as partitioned parquet with per-query
    _SUCCESS sentinels — the resumable-output discipline at suite level: a
    killed sweep re-run skips every finished query directory and recomputes
    only what is missing."""
    import json as _json
    import os

    owns_ray = _ray_init(args.num_cpus)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray
    qs = _load_queries()
    if qs is None:
        return 2
    names = (sorted(qs) if not args.only
             else [n.strip() for n in args.only.split(",") if n.strip()])
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    n_done = n_skip = n_err = 0
    for name in names:
        outdir = os.path.join(args.out_root, name)
        sentinel = os.path.join(outdir, "_SUCCESS")
        if os.path.exists(sentinel):
            # a sentinel from a DIFFERENT sf_dir is stale, not done —
            # skipping it would silently hand back wrong-scale results;
            # an unreadable sentinel (killed mid-write) is also stale
            try:
                with open(sentinel) as f:
                    meta = _json.load(f)
            except (ValueError, OSError):
                meta = {}
            if meta.get("sf_dir") == args.sf_dir:
                n_skip += 1
                print(_json.dumps({"query": name, "status": "skipped"}),
                      flush=True)
                continue
        t0 = time.perf_counter()
        try:
            res = qs[name](args.sf_dir)
            n_rows = _write_result(res, outdir)  # overwrites leftovers
            # the sentinel is written LAST: its presence proves the
            # partition's data files are complete
            with open(sentinel, "w") as f:
                f.write(_json.dumps({"query": name, "rows": n_rows,
                                     "sf_dir": args.sf_dir}))
            n_done += 1
            print(_json.dumps({"query": name, "status": "done",
                               "rows": n_rows,
                               "sec": round(time.perf_counter() - t0, 3)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must keep going
            n_err += 1
            print(_json.dumps({"query": name, "status": "error",
                               "err": repr(e)[:300]}), flush=True)
    print(_json.dumps({"sweep": {"done": n_done, "skipped": n_skip,
                                 "errors": n_err, "total": len(names)}}),
          flush=True)
    if owns_ray:
        ray.shutdown()
    return 1 if n_err else 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mycelium_ray",
                                description=__doc__.split("\n\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the crawl pipeline")
    c.add_argument("--corpus", default="sf0.001", choices=sorted(_SCALES),
                   help="deterministic synthetic corpus tier")
    c.add_argument("--seeds", help="seed URL file ('-' = stdin); "
                                   "default: the corpus seed list")
    c.add_argument("--listen-port", type=int, default=None,
                   help="ALSO accept seed lines over TCP on this port "
                        "(0 = OS-assigned; reference S1 ingest)")
    c.add_argument("--listen-seconds", type=float, default=5.0)
    c.add_argument("--daemon", action="store_true",
                   help="continuous event-loop crawl: live TCP seed "
                        "ingest DURING fetching, no wave barrier (the "
                        "reference's long-running mode); keeps the "
                        "--listen-port channel open for "
                        "--listen-seconds while crawling, then drains")
    c.add_argument("--dns", action="store_true",
                   help="with --serve: resolve every host over a real "
                        "RFC 1035 UDP exchange against a fixture DNS "
                        "server (per-actor resolver caches)")
    c.add_argument("--tls", action="store_true",
                   help="with --serve: https corpus over a real-TLS "
                        "listener (self-signed loopback root, fully "
                        "verified in every fetcher)")
    c.add_argument("--serve", action="store_true",
                   help="serve the corpus over real TCP and fetch via "
                        "http.client (production transport shape)")
    c.add_argument("--follow-links", action="store_true",
                   help="discovery mode: frontier grows through outlinks")
    c.add_argument("--seed-stride", type=int, default=16,
                   help="discovery mode keeps every Nth seed")
    c.add_argument("--dedup", default="cuckoo",
                   choices=["reference", "cuckoo"])
    c.add_argument("--shards", type=int, default=4)
    c.add_argument("--parallel", type=int, default=64)
    c.add_argument("--out", help="decoded image-row parquet directory")
    c.add_argument("--store-root", help="checkpoint/lineage store root "
                                        "(enables resume)")
    c.add_argument("--checkpoint-every", type=int, default=0)
    c.add_argument("--resume", action="store_true",
                   help="resume from --store-root checkpoints")
    c.add_argument("--control", action="store_true",
                   help="serve qlen/status/dumpq/reschedule/quit commands "
                        "from stdin during the crawl (reference S7); "
                        "JSON replies go to stderr")
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_crawl)

    q = sub.add_parser("query", help="run a queries() operator")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--stats", action="store_true",
                   help="print the Ray Data per-stage execution profile "
                        "(EXPLAIN ANALYZE) to stderr after the result")
    q.add_argument("--out", help="write result parquet here instead of "
                                 "printing")
    q.add_argument("--num-cpus", type=int, default=None)
    q.set_defaults(fn=cmd_query)

    w = sub.add_parser("sweep", help="materialize MANY queries() results "
                                     "to parquet, resumable via per-query "
                                     "_SUCCESS sentinels")
    w.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    w.add_argument("--out-root", required=True)
    w.add_argument("--only", help="comma-separated query names "
                                  "(default: all)")
    w.add_argument("--num-cpus", type=int, default=None)
    w.set_defaults(fn=cmd_sweep)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
