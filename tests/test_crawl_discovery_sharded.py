"""Multi-round sharded crawl with outlink discovery: cross-shard link
routing, convergence, metrics + lineage tables."""
import pyarrow as pa

from mycelium_ray.corpus import generate_corpus
from mycelium_ray.pipelines.crawl_sharded import run_crawl_sharded
from mycelium_ray.simulator import ReferenceSimulator
from mycelium_ray.state.store import TableStore


def test_sharded_discovery_matches_serial(ray_session, tmp_path):
    _, site, _ = generate_corpus(n_hosts=6, pages_per_host=3, seed=11)
    seeds = [u for u in sorted(site.responses) if u.endswith("/img/0.png")]

    # serial oracle with discovery
    sim = ReferenceSimulator(site, parallel=4, dedup="cuckoo",
                             follow_links=True)
    sim.feed(seeds)
    serial = sim.run()

    store = TableStore(str(tmp_path))
    stats, ds = run_crawl_sharded(site, seeds, parallel=8, collect_url_seen=True, n_shards=2,
                                  dedup="cuckoo", follow_links=True,
                                  store=store)
    # discovery converges and covers the same url set as the serial engine
    assert stats["url_seen"] == serial.url_seen
    assert stats["n_rounds"] >= 1
    # no duplicate fetches across shards
    assert stats["n_saved"] == len(stats["url_seen"])

    # metrics and lineage tables published
    m = store.read("metrics")
    assert m.num_rows == 2  # one row per shard
    assert sum(m.column("n_discovered").to_pylist()) > 0
    ln = store.read("lineage")
    assert ln.num_rows >= 1
    assert sum(ln.column("rows").to_pylist()) == stats["n_saved"]
