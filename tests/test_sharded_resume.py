"""Sharded crawl checkpoint/resume: a preempted run restores per-shard
state and produces byte-identical output (north-rule resume contract)."""
import os
import pickle

import pyarrow as pa
import pytest
import ray

from mycelium_ray.corpus import generate_corpus
import mycelium_ray.pipelines.crawl_sharded as cs
from mycelium_ray.state.store import TableStore

N_SHARDS = 2
PARALLEL = 8


def _shard_table(root: str, shard: int) -> pa.Table:
    st = TableStore(os.path.join(root, f"shard={shard:03d}"))
    vs = st.versions("fetched_raw")
    assert vs, f"no fetched_raw versions for shard {shard}"
    return pa.concat_tables([st.read("fetched_raw", v) for v in vs]) \
        .sort_by("seq")


def test_sharded_preempt_resume_byte_identical(ray_session, tmp_path):
    _, site, seeds = generate_corpus(n_hosts=8, pages_per_host=4, seed=42)
    root_a = str(tmp_path / "a")
    root_b = str(tmp_path / "b")

    # uninterrupted run, checkpointing along the way
    stats_a, _ = cs.run_crawl_sharded(site, seeds, parallel=PARALLEL, collect_url_seen=True,
                                      n_shards=N_SHARDS,
                                      store_root=root_a, checkpoint_every=4)

    # interrupted run: same partitioning, stop every shard after 6 waves
    parts, h2s = cs.partition_seeds_balanced(seeds, N_SHARDS)
    shard_hosts = [set() for _ in range(N_SHARDS)]
    for h, sh in h2s.items():
        shard_hosts[sh].add(h)
    refs = [ray.put(pickle.dumps(cs.slice_site(site, hs), protocol=5))
            for hs in shard_hosts]
    shards = [cs.PlannerShard.remote(i, PARALLEL // N_SHARDS,
                                     n_shards=N_SHARDS)
              for i in range(N_SHARDS)]
    ray.get([s.load_site.remote(r, h2s, root_b, 4) for s, r in zip(shards, refs)])
    ray.get([s.feed.remote(p) for s, p in zip(shards, parts)])
    partial = ray.get([s.run.remote(None, 1, 6) for s in shards])  # preempt
    assert all(r["n_saved"] > 0 for r in partial)
    for s in shards:
        ray.kill(s)  # the "killed ray job"

    # resume from the checkpoints and run to completion
    stats_b, _ = cs.run_crawl_sharded(site, seeds, parallel=PARALLEL, collect_url_seen=True,
                                      n_shards=N_SHARDS,
                                      store_root=root_b, checkpoint_every=4,
                                      resume=True)

    assert stats_b["url_seen"] == stats_a["url_seen"]
    for shard in range(N_SHARDS):
        ta = _shard_table(root_a, shard)
        tb = _shard_table(root_b, shard)
        assert ta.num_rows == tb.num_rows, f"shard {shard} row count"
        assert ta.equals(tb), f"shard {shard} not byte-identical"
