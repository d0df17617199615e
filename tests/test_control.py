"""S7 interactive control channel (reference crawler.cc:604-625,
1375-1395: stdin qlen/dumpq/reschedule/status/quit while crawling)."""

import io
import json
import time

from mycelium_ray.corpus import generate_corpus
from mycelium_ray.pipelines.crawl_sharded import run_crawl_sharded


def _replies(out: io.StringIO, n: int, timeout: float = 10.0) -> list[dict]:
    t0 = time.time()
    while out.getvalue().count("\n") < n and time.time() - t0 < timeout:
        time.sleep(0.05)
    return [json.loads(ln) for ln in out.getvalue().splitlines()]


def test_control_channel_commands(ray_session):
    _, site, seeds = generate_corpus(n_hosts=12, pages_per_host=6, seed=42)
    cmds = io.StringIO("qlen\nstatus\ndumpq 8\nreschedule\nbogus\nhelp\n")
    out = io.StringIO()
    stats, _ = run_crawl_sharded(site, seeds, parallel=8, n_shards=2,
                                 control_stream=cmds, control_out=out)
    assert stats["n_saved"] > 0  # crawl itself unaffected
    replies = _replies(out, 6)
    by_key = {k: r for r in replies for k in r}
    assert "qlen" in by_key and isinstance(by_key["qlen"]["qlen"], int)
    assert len(by_key["qlen"]["per_shard"]) == 2
    assert "status" in by_key and len(by_key["status"]["status"]) == 2
    assert "dumpq" in by_key and len(by_key["dumpq"]["dumpq"]) <= 8
    assert "reschedule" in by_key
    assert "commands" in by_key                       # help
    assert any("error" in r for r in replies)         # bogus command
    # qlen/status answered from the control concurrency group — shard ids
    # cover both shards even though the crawl owned the default group
    assert {s["shard"] for s in by_key["status"]["status"]} == {0, 1}


def test_control_quit_stops_at_round_barrier(ray_session):
    _, site, seeds = generate_corpus(n_hosts=24, pages_per_host=8, seed=42)
    sparse = seeds[::24]  # 3 discovery rounds on this corpus (measured)
    full, _ = run_crawl_sharded(site, sparse, parallel=8, n_shards=2,
                                dedup="cuckoo", follow_links=True)
    if full["n_rounds"] < 2:  # corpus must need multiple rounds to observe
        import pytest
        pytest.skip("discovery finished in one round on this corpus")
    cmds = io.StringIO("quit\n")
    out = io.StringIO()
    stopped, _ = run_crawl_sharded(site, sparse, parallel=8, n_shards=2,
                                   dedup="cuckoo", follow_links=True,
                                   control_stream=cmds, control_out=out)
    assert stopped["n_rounds"] < full["n_rounds"]
    assert stopped["n_saved"] <= full["n_saved"]
    assert any("quit" in r for r in _replies(out, 1))
