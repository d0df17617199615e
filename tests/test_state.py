"""Bloom / cuckoo / url-seen shard / table-store tests."""
import numpy as np
import pyarrow as pa
import pytest

from mycelium_ray.hashing import url_hash64, url_hash64_many, shard_of, splitmix64
from mycelium_ray.state.bloom import BloomFilter
from mycelium_ray.state.cuckoo import CuckooFilter
from mycelium_ray.state.urlseen import UrlSeen, UrlSeenShard
from mycelium_ray.state.store import TableStore


def test_hashing_stable():
    # pinned values: stability across runs/processes is the whole point
    assert url_hash64("http://example.com/") == int.from_bytes(
        __import__("hashlib").sha1(b"http://example.com/").digest()[:8], "big")
    arr = url_hash64_many(["a", "b", "a"])
    assert arr[0] == arr[2] != arr[1]
    assert splitmix64(0) == 16294208416658607535  # known splitmix64(0) value
    sh = shard_of(arr, 4)
    assert ((0 <= sh) & (sh < 4)).all()


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(42)
    keys = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    b = BloomFilter.sized_for(5000, fp_rate=0.01)
    b.add_many(keys)
    assert b.contains_many(keys).all()
    # false-positive rate sane on fresh keys
    fresh = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    fresh = np.setdiff1d(fresh, keys)
    fp = b.contains_many(fresh).mean()
    assert fp < 0.05


def test_bloom_roundtrip():
    b = BloomFilter(n_bits=1 << 12, k=3, seed=7)
    b.add_many(np.arange(100, dtype=np.uint64))
    b2 = BloomFilter.from_bytes(b.to_bytes(), b.n_bits, b.k, b.seed)
    assert (b2.words == b.words).all()
    assert b2.contains_many(np.arange(100, dtype=np.uint64)).all()


def test_cuckoo_membership_and_load():
    rng = np.random.default_rng(1)
    keys = np.unique(rng.integers(1, 2**63, size=20000, dtype=np.uint64))
    c = CuckooFilter.sized_for(len(keys))
    c.add_many(keys)
    assert c.contains_many(keys).all()  # no false negatives
    fresh = np.setdiff1d(
        rng.integers(1, 2**63, size=20000, dtype=np.uint64), keys)
    assert c.contains_many(fresh).mean() < 0.01  # fp ~ 2^-13 * 8
    assert c.load_factor < 0.96


def test_cuckoo_roundtrip():
    keys = np.arange(1, 500, dtype=np.uint64)
    c = CuckooFilter(n_buckets=1 << 9)
    c.add_many(keys)
    c2 = CuckooFilter.from_bytes(c.to_bytes(), c.n_buckets, c.seed,
                                 c.count, c._rng_state)
    assert (c2.table == c.table).all()
    assert c2.contains_many(keys).all()


def test_urlseen_shard_semantics():
    s = UrlSeenShard(0, capacity=1 << 12)
    keys = np.array([10, 11, 12, 10, 11], dtype=np.uint64)
    novel = s.check_and_insert(keys)
    # within-batch dups: only first occurrence novel
    assert novel.tolist() == [True, True, True, False, False]
    again = s.check_and_insert(np.array([10, 13], dtype=np.uint64))
    assert again.tolist() == [False, True]
    assert s.n_seen == 4
    assert s.contains(np.array([10, 99], dtype=np.uint64)).tolist() == [True, False]


def test_urlseen_shard_checkpoint():
    s = UrlSeenShard(2, capacity=1 << 12)
    s.check_and_insert(np.arange(100, dtype=np.uint64))
    s2 = UrlSeenShard.from_state(s.to_state())
    assert s2.n_seen == s.n_seen
    # same decisions post-restore
    res = s2.check_and_insert(np.array([5, 1000], dtype=np.uint64))
    assert res.tolist() == [False, True]


def test_urlseen_facade_exact_parity():
    urls = [f"http://h{i % 23}.com/p{i}" for i in range(3000)]
    urls += urls[:500]  # 500 dups
    seen = UrlSeen(n_shards=4, capacity_per_shard=1 << 12)
    novel = seen.check_and_insert_urls(urls)
    assert novel.sum() == 3000
    assert not novel[3000:].any()
    assert seen.n_seen == 3000
    # compare against python-set ground truth
    truth_seen = set()
    expect = []
    for u in urls:
        h = url_hash64(u)
        expect.append(h not in truth_seen)
        truth_seen.add(h)
    assert novel.tolist() == expect


def test_table_store(tmp_path):
    st = TableStore(str(tmp_path))
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    st.write("frontier", t, 1)
    st.write("frontier", t.slice(0, 1), 2)
    assert st.versions("frontier") == [1, 2]
    assert st.read("frontier", 1).num_rows == 3
    assert st.read("frontier").num_rows == 1  # latest
    # idempotent re-publish keeps original
    st.write("frontier", t, 2)
    assert st.read("frontier", 2).num_rows == 1
    with pytest.raises(FileNotFoundError):
        st.read("nope")
    # blobs
    st.write_blob("seen", 1, {"x": b"123"})
    assert st.read_blob("seen", 1) == {"x": b"123"}
    assert st.blob_versions("seen") == [1]


def test_lance_branch(tmp_path, monkeypatch):
    """The Lance write/read branch, exercised through a minimal fake
    ``lance`` module (the container has no real lance): version layout,
    publish marker, read-at-version, and MIXED-format stores (a parquet
    version and a lance version in one table, auto-detected per version —
    the cross-environment resume contract)."""
    import os
    import sys
    import types

    import pyarrow as pa
    import pyarrow.parquet as _pq

    fake = types.ModuleType("lance")

    def write_dataset(table, uri, mode="create"):
        assert mode == "create"
        os.makedirs(uri, exist_ok=True)
        _pq.write_table(table, os.path.join(uri, "payload.lancebin"))

    class _FakeDataset:
        def __init__(self, uri):
            self.uri = uri

        def to_table(self):
            return _pq.read_table(os.path.join(self.uri, "payload.lancebin"))

    fake.write_dataset = write_dataset
    fake.dataset = _FakeDataset
    monkeypatch.setitem(sys.modules, "lance", fake)
    import mycelium_ray.state.store as store_mod
    monkeypatch.setattr(store_mod, "HAVE_LANCE", True)

    st = store_mod.TableStore(str(tmp_path / "s"), format="auto")
    assert st.format == "lance"
    t1 = pa.table({"a": [1, 2, 3]})
    st.write("tbl", t1, 1)
    assert (tmp_path / "s" / "tbl" / "v000001" / "data.lance").is_dir()
    assert (tmp_path / "s" / "tbl" / "v000001" / "_OK").exists()
    assert st.read("tbl", 1).equals(t1)
    assert st.versions("tbl") == [1]
    # idempotent republish
    st.write("tbl", pa.table({"a": [9]}), 1)
    assert st.read("tbl", 1).equals(t1)
    # mixed-format: v2 written as parquet, read back through the same
    # store via per-version auto-detect
    t2 = pa.table({"a": [4, 5]})
    store_mod.TableStore(str(tmp_path / "s"), format="parquet").write(
        "tbl", t2, 2)
    assert st.read("tbl", 2).equals(t2)
    assert st.read("tbl").equals(t2)  # latest
    assert st.versions("tbl") == [1, 2]


def test_lance_format_requires_module(tmp_path):
    import mycelium_ray.state.store as store_mod
    if store_mod.HAVE_LANCE:  # pragma: no cover
        return
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        store_mod.TableStore(str(tmp_path), format="lance")


def test_store_vacuum_keeps_latest_and_blobs(tmp_path):
    """vacuum drops old published versions + their blobs, keeps the
    newest keep_last, never touches a mid-publish tmp dir, and the
    resume path (read latest) still works."""
    import os

    import pyarrow as pa
    import pytest

    from mycelium_ray.state.store import TableStore
    st = TableStore(str(tmp_path / "store"))
    for v in range(1, 6):
        st.write("frontier", pa.table({"v": [v]}), v)
        st.write_blob("frontier", v, {"v": v})
    # a writer mid-publish: unpublished tmp dir must survive
    os.makedirs(st._vdir("frontier", 6) + ".tmp")
    dropped = st.vacuum("frontier", keep_last=2)
    assert dropped == [1, 2, 3]
    assert st.versions("frontier") == [4, 5]
    assert st.read("frontier")["v"].to_pylist() == [5]
    assert st.blob_versions("frontier") == [4, 5]
    assert os.path.isdir(st._vdir("frontier", 6) + ".tmp")
    assert st.vacuum("frontier", keep_last=2) == []  # idempotent
    with pytest.raises(ValueError):
        st.vacuum("frontier", keep_last=0)


def test_store_vacuum_blobs(tmp_path):
    from mycelium_ray.state.store import TableStore
    st = TableStore(str(tmp_path / "store"))
    for v in range(1, 5):
        st.write_blob("crawl_ckpt", v, {"v": v})
    assert st.vacuum_blobs("crawl_ckpt", keep_last=2) == [1, 2]
    assert st.blob_versions("crawl_ckpt") == [3, 4]
    assert st.read_blob("crawl_ckpt", 4) == {"v": 4}


def test_store_compact_merges_parts(tmp_path, ray_session):
    import pyarrow as pa

    import ray.data as rd
    from mycelium_ray.state.store import TableStore

    st = TableStore(str(tmp_path / "store"))
    ds = rd.range(10_000).map_batches(
        lambda t: pa.table({"k": t["id"], "v": t["id"].to_numpy() * 3}),
        batch_format="pyarrow").repartition(16)
    st.publish_dataset("fetched", ds, 1)
    assert len(st.version_files("fetched", 1)) == 16

    vdir, n_out = st.compact("fetched")
    assert st.versions("fetched") == [1, 2]
    assert len(st.version_files("fetched", 2)) < 16
    # source version untouched, content multiset preserved
    a = st.read("fetched", 1).to_pandas().sort_values("k").reset_index(drop=True)
    b = st.read("fetched", 2).to_pandas().sort_values("k").reset_index(drop=True)
    assert a.equals(b)
    # vacuum reclaims the fragmented version afterwards
    assert st.vacuum("fetched", keep_last=1) == [1]
    assert st.read("fetched")["k"].to_pylist()[:1]  # still readable
