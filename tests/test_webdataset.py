"""WebDataset shard source (sources/webdataset.py): write→read identity,
resume semantics, and tolerance for incomplete sample pairs."""

import io
import os
import tarfile

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from mycelium_ray.sources.webdataset import (read_webdataset,
                                             write_webdataset)


def _rows_table(n: int) -> pa.Table:
    rng = np.random.default_rng(3)
    from mycelium_ray.imaging import encode_image
    content = [encode_image(
        rng.integers(0, 256, (8, 8, 3), dtype=np.uint8), "png")
        for _ in range(n)]
    return pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "content": pa.array(content, pa.binary()),
        "fmt": pa.array(["png"] * n, pa.string()),
        "caption": pa.array([f"cap {i}" for i in range(n)], pa.string()),
    })


def test_write_read_identity(ray_session, tmp_path):
    t = _rows_table(10)
    paths = write_webdataset(rd.from_arrow(t), str(tmp_path), 4)
    assert len(paths) == 4
    assert all(os.path.basename(p).startswith("shard-") for p in paths)
    back = read_webdataset(str(tmp_path)).to_pandas()
    assert len(back) == 10
    back = back.sort_values("key").reset_index(drop=True)
    for i in range(10):
        assert int(back["key"][i]) == i
        assert back["fmt"][i] == "png"
        assert back["caption"][i] == f"cap {i}"
        assert bytes(back["image"][i]) == t["content"][i].as_py()
        assert back["shard"][i] == f"shard-{i % 4:05d}.tar"


def test_resume_skips_existing_shard(ray_session, tmp_path):
    t = _rows_table(8)
    write_webdataset(rd.from_arrow(t), str(tmp_path), 2)
    marker = os.path.join(str(tmp_path), "shard-00000.tar")
    mtime0 = os.path.getmtime(marker)
    # second run must not rewrite published shards
    write_webdataset(rd.from_arrow(t), str(tmp_path), 2)
    assert os.path.getmtime(marker) == mtime0


def test_deterministic_bytes(ray_session, tmp_path):
    t = _rows_table(6)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset(rd.from_arrow(t), d1, 2)
    write_webdataset(rd.from_arrow(t), d2, 2)
    for s in ("shard-00000.tar", "shard-00001.tar"):
        assert (open(os.path.join(d1, s), "rb").read()
                == open(os.path.join(d2, s), "rb").read())


def test_incomplete_pairs_tolerated(ray_session, tmp_path):
    """A sample missing its .txt (or its image) member still yields a
    row with the absent part defaulted — a 100-TB corpus always has a
    few ragged shards."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in (("000000000000.png", b"imgbytes"),
                           ("000000000001.txt", "orphan cap".encode())):
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    p = tmp_path / "shard-00000.tar"
    p.write_bytes(buf.getvalue())
    back = read_webdataset(str(tmp_path)).to_pandas() \
        .sort_values("key").reset_index(drop=True)
    assert len(back) == 2
    assert bytes(back["image"][0]) == b"imgbytes" and back["caption"][0] == ""
    assert back["image"][1] == b"" and back["caption"][1] == "orphan cap"
