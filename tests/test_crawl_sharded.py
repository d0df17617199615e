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
