"""Sharded crawl: per-host order parity with the serial oracle + seen-set
equality + decode integrity."""
import ray

from mycelium_ray.corpus import generate_corpus
from mycelium_ray.pipelines.crawl_sharded import partition_seeds, run_crawl_sharded
from mycelium_ray.simulator import simulate


def test_partition_seeds_host_affinity():
    _, site, seeds = generate_corpus(n_hosts=6, pages_per_host=3, seed=42)
    parts = partition_seeds(seeds, 3)
    assert sum(len(p) for p in parts) == len([s for s in seeds if s.strip()])
    # every raw host lands in exactly one shard
    seen_host_shard = {}
    from mycelium_ray.urlcanon import Url, UrlParseError
    for i, p in enumerate(parts):
        for line in p:
            try:
                h = Url(line.strip()).host
            except Exception:
                continue
            assert seen_host_shard.setdefault(h, i) == i


def test_sharded_crawl_seen_set_and_per_host_order(ray_session):
    _, site, seeds = generate_corpus(n_hosts=8, pages_per_host=4, seed=42)
    stats, ds = run_crawl_sharded(site, seeds, parallel=8, collect_url_seen=True, n_shards=2)

    # seen set matches the serial reference (membership is N-invariant)
    ref = simulate(site, seeds, parallel=8)
    assert stats["url_seen"] == ref.url_seen

    # single-shard mode reproduces the global reference order exactly
    stats1, _ = run_crawl_sharded(site, seeds, parallel=8, collect_url_seen=True, n_shards=1)
    assert stats1["url_seen"] == ref.url_seen

    # decoded dataset covers the fetched images
    import pyarrow as pa
    tbl = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    ok = tbl.to_pandas()
    assert (ok[ok["decode_ok"]]["fmt_sniffed"]
            .isin(["png", "jpeg", "webp"]).all())
    assert stats["n_saved"] == len(ok)


def test_sharded_cuckoo_dedup(ray_session):
    _, site, seeds = generate_corpus(n_hosts=8, pages_per_host=4, seed=42)
    stats, _ = run_crawl_sharded(site, seeds, parallel=8, collect_url_seen=True, n_shards=2,
                                 dedup="cuckoo")
    # with per-shard cuckoo filters no canonical url is fetched twice
    ref = simulate(site, seeds, parallel=8)
    assert stats["n_saved"] <= len(ref.url_seen) + 2  # ties only via aliases


def test_shard_status_control_channel(ray_session):
    """S7 analog: qlen/status/dumpq introspection on a live shard."""
    import pickle
    import ray as _ray
    from mycelium_ray.corpus import Response, SiteGraph
    from mycelium_ray.pipelines.crawl_sharded import PlannerShard
    site = SiteGraph()
    site.hosts = ["s1.test", "s2.test"]
    for h in site.hosts:
        site.robots[h] = None
        for i in range(3):
            site.responses[f"http://{h}/img/{i}.png"] = Response(
                status=200, content=b"\x89PNG", content_type="image/png")
    shard = PlannerShard.remote(0, parallel=2)
    _ray.get(shard.load_site.remote(pickle.dumps(site, protocol=5)))
    seeds = [f"http://{h}/img/{i}.png" for h in site.hosts for i in range(3)]
    _ray.get(shard.feed.remote(seeds))
    st = _ray.get(shard.status.remote())
    assert st["frontier_size"] == 6
    assert sum(st["qlens"]) + st["qlen_top"] == 6
    dump = _ray.get(shard.dump_frontier.remote())
    assert len(dump) == 6
    assert {r["host"] for r in dump} == {"s1.test", "s2.test"}
    _ray.get(shard.run.remote())
    st2 = _ray.get(shard.status.remote())
    assert st2["frontier_size"] == 0 and st2["n_saved"] == 6
    _ray.kill(shard)


def test_n_seen_counter_equals_union_with_aliases(ray_session):
    """Default (no collect_url_seen) n_seen must equal the true distinct
    canonical-URL count even when case-alias seeds exist: aliases of one
    host co-locate (lowercased routing), so per-shard counts sum exactly."""
    from mycelium_ray.corpus import Response, SiteGraph
    site = SiteGraph()
    for h in ("al.test", "bl.test"):
        site.hosts.append(h)
        site.robots[h] = None
        for i in range(4):
            site.responses[f"http://{h}/img/{i}.png"] = Response(
                status=200, content=b"\x89PNG", content_type="image/png")
    seeds = [f"http://{h}/img/{i}.png" for h in site.hosts for i in range(4)]
    seeds += [s.replace("al.test", "AL.Test") for s in seeds
              if "al.test" in s]  # case aliases of every al.test seed
    stats, _ = run_crawl_sharded(site, seeds, parallel=8, n_shards=2)
    ref_stats, _ = run_crawl_sharded(site, seeds, parallel=8,
                                     collect_url_seen=True, n_shards=2)
    assert stats["n_seen"] == len(ref_stats["url_seen"]) == 8


def test_planner_pool_reuse_and_self_heal(ray_session):
    """The session-level planner pool is reused across crawl jobs (same
    actors, same results), and recreates itself if a pooled actor dies."""
    from mycelium_ray.pipelines import crawl_sharded as cs
    _, site, seeds = generate_corpus(n_hosts=8, pages_per_host=4, seed=42)
    stats1, _ = run_crawl_sharded(site, seeds, parallel=8,
                                  collect_url_seen=True, n_shards=2)
    pool1 = list(cs._POOL["actors"])
    stats2, _ = run_crawl_sharded(site, seeds, parallel=8,
                                  collect_url_seen=True, n_shards=2)
    assert cs._POOL["actors"] == pool1  # reused, not respawned
    assert stats2["url_seen"] == stats1["url_seen"]
    # kill one pooled actor: the next job must self-heal and still agree
    ray.kill(pool1[0])
    stats3, _ = run_crawl_sharded(site, seeds, parallel=8,
                                  collect_url_seen=True, n_shards=2)
    assert cs._POOL["actors"] != pool1
    assert stats3["url_seen"] == stats1["url_seen"]


def test_planner_pool_parks_between_jobs(ray_session):
    """Idle pooled actors park at nice 19 when a job ends (idle Ray
    workers busy-poll on some hosts — a live 30-actor pool taxes every
    later stage), and un-park to nice 0 when the pool is reused."""
    import ray as _ray

    from mycelium_ray.pipelines import crawl_sharded as cs
    _, site, seeds = generate_corpus(n_hosts=8, pages_per_host=4, seed=42)
    run_crawl_sharded(site, seeds, parallel=8, n_shards=2)
    assert _ray.get([a.set_nice.remote(None)  # read-only probe
                     for a in cs._POOL["actors"]]) == [19, 19]
    # the reuse path restores priority before the job runs, then the job
    # parks the pool again at completion — probe both by un-parking one
    # actor manually and letting a job re-run
    _ray.get(cs._POOL["actors"][0].set_nice.remote(0))
    run_crawl_sharded(site, seeds, parallel=8, n_shards=2)
    assert _ray.get([a.set_nice.remote(None)
                     for a in cs._POOL["actors"]]) == [19, 19]
