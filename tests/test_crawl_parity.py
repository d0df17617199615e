"""Distributed-crawl parity vs the serial reference simulator, plus
decode validation and checkpoint/resume byte-identity (FIXTURES.md §6/§8).
"""
import numpy as np
import pyarrow.compute as pc
import pytest

from mycelium_ray.corpus import generate_corpus
from mycelium_ray.imaging import decode_image, psnr, LOSSLESS_FMTS
from mycelium_ray.pipelines.crawl import RayCrawler, run_crawl
from mycelium_ray.simulator import simulate
from mycelium_ray.state.store import TableStore

PARALLEL = 4


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(n_hosts=8, pages_per_host=4, seed=42)


@pytest.fixture(scope="module")
def oracle(corpus):
    _, site, seeds = corpus
    return simulate(site, seeds, parallel=PARALLEL)


def test_crawl_order_and_seen_parity(ray_session, corpus, oracle):
    _, site, seeds = corpus
    result, _ = run_crawl(site, seeds, parallel=PARALLEL, n_fetchers=3)
    # exact crawl order: the full save log matches the serial reference
    got = [(d.seq, d.tick, d.handle, d.url, d.http_code, d.curl_code)
           for d in result.saved]
    want = [(d.seq, d.tick, d.handle, d.url, d.http_code, d.curl_code)
            for d in oracle.saved]
    assert got == want
    # URL-seen membership identical
    assert result.url_seen == oracle.url_seen
    assert result.url_seen_hashes == oracle.url_seen_hashes
    # robots decisions identical
    assert result.robots_decisions == oracle.robots_decisions


def test_fetched_content_parity(ray_session, corpus, oracle):
    _, site, seeds = corpus
    result, _ = run_crawl(site, seeds, parallel=PARALLEL, n_fetchers=2)
    want = {d.seq: d for d in oracle.saved}
    for d in result.saved:
        o = want[d.seq]
        assert d.content == o.content
        assert d.eff_url == o.eff_url
        assert d.headers == o.headers


def test_decode_validation_invariant(ray_session, corpus):
    """Per-row invariant from BASELINE.json input_hint: decoded pixels
    PSNR≥40dB (lossy) / exact (lossless) + caption equality vs corpus."""
    images, site, seeds = corpus
    result, ds = run_crawl(site, seeds, parallel=PARALLEL, n_fetchers=2)
    import pyarrow as pa
    import ray
    tbl = pa.concat_tables(ray.get(ds.to_arrow_refs()))  # small test corpus
    by_url = {r["image_id"]: r for r in images.to_pylist()}
    decoded_ok = tbl.filter(pc.equal(tbl["decode_ok"], True)).to_pylist()
    assert len(decoded_ok) >= len(by_url) * 0.9
    checked = 0
    for row in decoded_ok:
        ref = by_url.get(row["url"])
        if ref is None:
            continue
        got_px, got_fmt = decode_image(row["content"])
        ref_px, ref_fmt = decode_image(ref["bytes"])
        assert got_fmt == ref_fmt == ref["fmt"]
        assert row["w"] == ref["w"] and row["h"] == ref["h"]
        if ref_fmt in LOSSLESS_FMTS:
            assert (got_px == ref_px).all()
            # lossless: pipeline phash over decoded pixels == corpus phash
            assert row["phash"] == ref["phash"]
        else:
            assert psnr(got_px, ref_px) == float("inf")  # same encoded bytes
            # lossy: corpus phash is over PRE-encode pixels; decoded pixels
            # are quantized → phash must be hamming-close, not equal
            from mycelium_ray.imaging import hamming64
            assert hamming64(row["phash"], ref["phash"]) <= 6
        # caption parity: the fixture caption travels via the images table
        assert by_url[row["url"]]["caption"] == ref["caption"]
        checked += 1
    assert checked > 20
    # garbage bodies must be flagged, not crash
    garbage = [r for r in tbl.to_pylist()
               if r["url"].endswith("garbage.png") and r["http_code"] == 200]
    assert garbage and all(not r["decode_ok"] for r in garbage)


def test_checkpoint_resume_byte_identical(ray_session, corpus, tmp_path):
    _, site, seeds = corpus
    # uninterrupted run
    store_a = TableStore(str(tmp_path / "a"))
    ca = RayCrawler(site, parallel=PARALLEL, n_fetchers=2, store=store_a,
                    flush_rows=64)
    ca.feed(seeds)
    ra = ca.run()

    # interrupted run: checkpoint every 5 waves, kill after ~15, restore
    store_b = TableStore(str(tmp_path / "b"))
    cb = RayCrawler(site, parallel=PARALLEL, n_fetchers=2, store=store_b,
                    flush_rows=64, checkpoint_every=5)
    cb.feed(seeds)
    for h in cb.handles:
        if h.state == 0 and h.inflight is None:
            cb._reschedule(h)
    waves = 0
    while cb._run_wave():
        waves += 1
        cb._maybe_flush()
        if waves % 5 == 0:
            cb.checkpoint(waves)
        if waves >= 15:
            break  # simulated kill (post-checkpoint state is on disk)
    assert store_b.blob_versions("crawl_ckpt"), "no checkpoint written"

    cc = RayCrawler.restore(site, store_b, n_fetchers=2)
    rc = cc.run()

    # final outputs byte-identical: store versions concatenated == full log
    import pyarrow as pa
    full_a = pa.concat_tables([store_a.read("fetched_raw", v)
                               for v in store_a.versions("fetched_raw")])
    full_b = pa.concat_tables([store_b.read("fetched_raw", v)
                               for v in store_b.versions("fetched_raw")])
    assert full_a.num_rows == full_b.num_rows
    assert full_a.sort_by("seq").equals(full_b.sort_by("seq"))
    assert rc.url_seen == ra.url_seen


def test_cuckoo_dedup_mode(ray_session, corpus):
    """North-star mode: bloom/cuckoo URL-seen drops duplicate seeds at
    ingest, so every canonical URL is fetched at most once."""
    _, site, seeds = corpus
    crawler = RayCrawler(site, parallel=PARALLEL, n_fetchers=2, dedup="cuckoo")
    crawler.feed(seeds)
    r = crawler.run()
    urls = [d.url for d in r.saved]
    assert len(urls) == len(set(urls)), "cuckoo dedup must prevent refetches"
    # same coverage as reference mode (set-wise)
    ref = simulate(site, seeds, parallel=PARALLEL)
    assert set(urls) <= ref.url_seen
    assert len(set(urls)) >= len(ref.url_seen) * 0.95


def test_parity_at_reference_default_parallel(ray_session, corpus):
    """Same check at the reference's default politeness budget
    (PARALLEL_DEFAULT = 20, crawler.cc:66)."""
    _, site, seeds = corpus
    oracle20 = simulate(site, seeds, parallel=20)
    result, _ = run_crawl(site, seeds, parallel=20, n_fetchers=3)
    got = [(d.seq, d.tick, d.handle, d.url) for d in result.saved]
    want = [(d.seq, d.tick, d.handle, d.url) for d in oracle20.saved]
    assert got == want
    assert result.url_seen == oracle20.url_seen
