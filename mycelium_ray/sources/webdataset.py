"""WebDataset shard source: the READ path for tar-sharded image+caption
corpora (the write path lives in pipelines/flagship.pack_tar).

WebDataset layout (the de-facto standard for feeding large multimodal
corpora to training jobs): a directory of POSIX tars, each holding
member pairs ``{key}.{fmt}`` + ``{key}.txt``; all members sharing a
basename stem form one sample.

Scale story: shards are the unit of parallelism — `read_binary_files`
streams one tar per row (WebDataset shards are conventionally ≲1 GB, a
comfortable object-store block), and the untar fan-out runs inside
`map_batches`, so a 100-TB corpus is just more shard files across the
cluster; nothing crosses the driver. The writer emits one tar per
map_groups task with tmp+rename publish and skip-if-present resume, so
a failed packing run re-does only missing shards (pack_tar bytes are
deterministic, so a re-pack is byte-identical).

Reference analog: none (larroy/mycelium stores pages in its own table
files); this is the build brief's training-data I/O surface.
"""

from __future__ import annotations

import io
import os
import tarfile

import pyarrow as pa

import ray.data as rd


def write_webdataset(ds, out_dir: str, n_shards: int) -> list[str]:
    """Materialize a Dataset of (doc_id, content, fmt, caption) rows as
    ``out_dir/shard-{i:05d}.tar`` WebDataset shards, routed by
    ``doc_id % n_shards``. Returns the shard paths (consumes the
    pipeline; each shard is packed and published by its own task)."""
    from ..pipelines.flagship import pack_tar

    os.makedirs(out_dir, exist_ok=True)

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        shard = pc.cast(
            pc.subtract(t["doc_id"],
                        pc.multiply(pc.divide(t["doc_id"], n_shards),
                                    n_shards)), pa.int64())
        return t.append_column("shard", shard)

    def pack_and_publish(g) -> pa.Table:
        s = int(g["shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{s:05d}.tar")
        if not os.path.exists(path):          # resume: skip finished shards
            rows = list(zip(g["doc_id"].tolist(), g["fmt"].tolist(),
                            g["content"].tolist(), g["caption"].tolist()))
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(pack_tar(rows))
            os.replace(tmp, path)             # atomic publish
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_samples": pa.array([len(g)], pa.int64())})

    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("shard").map_groups(pack_and_publish,
                                     batch_format="pandas")
    return sorted(r["path"] for r in out.take_all())


def _unpack_batch(batch: pa.Table) -> pa.Table:
    """One input row per tar shard → one output row per sample."""
    out = {"key": [], "fmt": [], "image": [], "caption": [], "shard": []}
    for path, blob in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
        shard = os.path.basename(path)
        samples: dict[str, dict] = {}
        with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
            for m in tf.getmembers():
                if not m.isfile():
                    continue
                stem, ext = os.path.splitext(m.name)
                data = tf.extractfile(m).read()
                rec = samples.setdefault(stem, {})
                if ext == ".txt":
                    rec["caption"] = data.decode("utf-8")
                else:
                    rec["image"] = data
                    rec["fmt"] = ext.lstrip(".")
        for key in sorted(samples):
            rec = samples[key]
            out["key"].append(key)
            out["fmt"].append(rec.get("fmt", ""))
            out["image"].append(rec.get("image", b""))
            out["caption"].append(rec.get("caption", ""))
            out["shard"].append(shard)
    return pa.table({
        "key": pa.array(out["key"], pa.string()),
        "fmt": pa.array(out["fmt"], pa.string()),
        "image": pa.array(out["image"], pa.binary()),
        "caption": pa.array(out["caption"], pa.string()),
        "shard": pa.array(out["shard"], pa.string()),
    })


def read_webdataset(shard_dir: str):
    """Directory of WebDataset tars → Dataset of (key, fmt, image,
    caption, shard) sample rows. One tar per block at the read; untar
    inside map_batches (batch_size=1 keeps peak memory ∝ one shard)."""
    files = rd.read_binary_files(shard_dir, include_paths=True,
                                 file_extensions=["tar"])
    return files.map_batches(_unpack_batch, batch_format="pyarrow",
                             batch_size=1)
