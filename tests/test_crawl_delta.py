"""Versioned-store distributed publish + incremental-crawl diff tests."""

import os
import shutil

import pyarrow as pa
import pytest

from mycelium_ray.state.store import TableStore

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def store(tmp_path):
    return TableStore(str(tmp_path / "store"))


def test_publish_dataset_atomic_and_idempotent(store, ray_session):
    import ray.data as rd

    ds = rd.from_items([{"k": i, "v": i * i} for i in range(100)])
    p1 = store.publish_dataset("t", ds, 1)
    assert os.path.exists(os.path.join(p1, "_OK"))
    files = store.version_files("t", 1)
    assert files and all(f.endswith(".parquet") for f in files)
    # idempotent: a re-publish must not rewrite anything
    mtimes = {f: os.stat(f).st_mtime_ns for f in files}
    store.publish_dataset("t", rd.from_items([{"k": -1, "v": 0}]), 1)
    assert {f: os.stat(f).st_mtime_ns
            for f in store.version_files("t", 1)} == mtimes
    got = store.read("t", 1).sort_by("k")
    assert got["k"].to_pylist() == list(range(100))


def test_version_files_requires_publish(store):
    with pytest.raises(FileNotFoundError):
        store.version_files("nope", 1)


def test_crawl_delta_statuses(ray_session):
    """All four delta classes present and consistent with the snapshot
    membership/hash rules, recomputed serially from the store."""
    from mycelium_ray.pipelines.urlops import crawl_delta

    root = "/tmp/mycelium_delta_sf0.001"
    shutil.rmtree(root, ignore_errors=True)
    out = crawl_delta(SF).to_pandas()
    counts = out["status"].value_counts().to_dict()
    assert set(counts) == {"new", "gone", "changed", "same"}
    assert min(counts.values()) > 0

    store = TableStore(root)
    v1 = store.read("fetched", 1).to_pandas().set_index("doc_id")
    v2 = store.read("fetched", 2).to_pandas().set_index("doc_id")
    for _, row in out.iterrows():
        d, s = int(row["doc_id"]), row["status"]
        in1, in2 = d in v1.index, d in v2.index
        if s == "new":
            assert not in1 and in2
        elif s == "gone":
            assert in1 and not in2
        elif s == "changed":
            assert in1 and in2 and (v1.loc[d, "content_hash"]
                                    != v2.loc[d, "content_hash"])
        else:
            assert in1 and in2 and (v1.loc[d, "content_hash"]
                                    == v2.loc[d, "content_hash"])
    # every doc present in either snapshot appears exactly once
    assert len(out) == len(set(v1.index) | set(v2.index))
    assert out["doc_id"].is_unique
    shutil.rmtree(root, ignore_errors=True)
