"""WARC archive pipeline ops: pack the crawl corpus into .warc.gz
shards, read them back, and build a CDX random-access index.

This is the archive-file surface of the crawl output (the portable dual
of the reference's MongoDB page store — crawler.cc persists fetched
pages into collections; a Ray-Data crawl at 100 TB lands them as WARC
shards instead, the Common-Crawl layout downstream tooling expects).

Scale story: shards are the unit of parallelism and of resume — routing
is ``doc_id % N_WARC_SHARDS``, each shard is packed and published
(tmp+rename, skip-if-present) by its own ``map_groups`` task, and shard
bytes are a pure function of their rows (see warc.py's determinism
contract), so a killed packing run re-does only missing shards and a
repack is byte-identical. The read path streams one shard per block and
parses inside ``map_batches``; nothing crosses the driver. CDX rows are
(offset, member-length) slices into the one-gzip-member-per-record
stream, so random access to any record needs one ranged read + one
inflate — the property the pytest suite proves by re-slicing.
"""

from __future__ import annotations

import hashlib
import io
import os

import pyarrow as pa

import ray.data as rd

from ..warc import (build_record, gzip_member, payload_digest, read_warc_gz,
                    record_id, warc_date)

N_WARC_SHARDS = 16

# deterministic fetch-date base: epoch + doc_id seconds (no wall clock)
_DATE_BASE = 800_000_000


def _derive_warc_rows(batch: pa.Table) -> pa.Table:
    """documents rows → (doc_id, shard, canon_url, date, fmt, image,
    caption). URL rule shared with pipelines/urlops (canonical form of
    the derived crawl URL); image bytes via the flagship synth path."""
    from .flagship import synth_image_row

    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    sources = batch["source"].to_pylist()
    payloads = [synth_image_row(d, t) for d, t in zip(ids, texts)]
    urls = [f"http://src{s[3:]}.example.com/d/{d}/asset.png"
            for d, s in zip(ids, sources)]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "shard": pa.array([d % N_WARC_SHARDS for d in ids], pa.int64()),
        "canon_url": pa.array(urls, pa.string()),
        "date": pa.array([warc_date(_DATE_BASE + d) for d in ids],
                         pa.string()),
        "fmt": pa.array([p[3] for p in payloads], pa.string()),
        "image": pa.array([p[0] for p in payloads], pa.binary()),
        "caption": batch["text"],
    })


def pack_warc_shard(rows: list[tuple]) -> bytes:
    """Deterministic .warc.gz stream for (doc_id, canon_url, date, fmt,
    image, caption) rows: a warcinfo member, then per doc (sorted by
    doc_id) a ``resource`` member (image payload) and a ``metadata``
    member (caption payload, WARC-Concurrent-To the image record)."""
    rows = sorted(rows)
    info = ("software: mycelium-ray\r\n"
            "format: WARC File Format 1.1\r\n"
            f"n-documents: {len(rows)}\r\n").encode("utf-8")
    out = [gzip_member(build_record(
        "warcinfo", info, date=warc_date(_DATE_BASE),
        content_type="application/warc-fields"))]
    for doc_id, url, date, fmt, image, caption in rows:
        img_rec = build_record(
            "resource", bytes(image), target_uri=url, date=date,
            content_type=f"image/{fmt}")
        # the image record id line, for WARC-Concurrent-To linkage
        rid = next(line.split(": ", 1)[1]
                   for line in img_rec.split(b"\r\n\r\n")[0]
                   .decode("utf-8").splitlines()
                   if line.startswith("WARC-Record-ID: "))
        cap_rec = build_record(
            "metadata", (caption or "").encode("utf-8"), target_uri=url,
            date=date, content_type="text/plain; charset=utf-8",
            extra=[("WARC-Concurrent-To", rid)])
        out.append(gzip_member(img_rec))
        out.append(gzip_member(cap_rec))
    return b"".join(out)


def write_warc(ds, out_dir: str) -> None:
    """Materialize derived rows as ``out_dir/shard-{i:05d}.warc.gz``
    (one task per shard; atomic publish; skip-if-present resume)."""
    os.makedirs(out_dir, exist_ok=True)

    def pack_and_publish(g) -> pa.Table:
        s = int(g["shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{s:05d}.warc.gz")
        if not os.path.exists(path):
            rows = list(zip(g["doc_id"].tolist(), g["canon_url"].tolist(),
                            g["date"].tolist(), g["fmt"].tolist(),
                            g["image"].tolist(), g["caption"].tolist()))
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(pack_warc_shard(rows))
            os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_docs": pa.array([len(g)], pa.int64())})

    ds.groupby("shard").map_groups(
        pack_and_publish, batch_format="pandas").materialize()


def _derived(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    return ds.map_batches(_derive_warc_rows, batch_format="pyarrow",
                          batch_size=256)


def _warc_dir(sf_dir: str) -> str:
    return ("/tmp/mycelium_warc_"
            + os.path.basename(os.path.normpath(sf_dir)))


def _ensure_written(sf_dir: str) -> str:
    out_dir = _warc_dir(sf_dir)
    done = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(done):
        write_warc(_derived(sf_dir), out_dir)
        with open(done, "w") as f:
            f.write("ok\n")
    return out_dir


def _read_raw_shards(out_dir: str):
    """Shard files as RAW bytes, one per block. ``read_binary_files``
    transparently gunzips ``.gz`` paths (extension-inferred, not
    overridable); CDX offsets index the COMPRESSED member stream, so
    instead the driver fans out ONLY the path list (16 strings) and each
    task reads its own shard — the read_parquet_bulk pattern
    crawl_sharded uses for spill files."""
    paths = sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir)
        if f.endswith(".warc.gz"))

    def load(batch: pa.Table) -> pa.Table:
        blobs = []
        for p in batch["path"].to_pylist():
            with open(p, "rb") as f:
                blobs.append(f.read())
        return pa.table({"path": batch["path"],
                         "bytes": pa.array(blobs, pa.binary())})

    return rd.from_items(
        [{"path": p} for p in paths],
        override_num_blocks=len(paths),
    ).map_batches(load, batch_format="pyarrow", batch_size=1)


def _doc_id_of(uri: str) -> int:
    # http://srcK.example.com/d/{doc_id}/asset.png
    return int(uri.rsplit("/", 2)[-2])


def warc_roundtrip(sf_dir: str):
    """Full WARC I/O loop, oracle-checked per document: pack the corpus
    into .warc.gz shards on disk, stream the shards BACK through the
    from-scratch reader (which verifies version framing, Content-Length
    and WARC-Payload-Digest on every record — a digest mismatch raises),
    and emit one row per doc: (doc_id, n_records, caption_bytes,
    caption_sha256, image_ct_ok). The SQL oracle pins all five from the
    source table, transitively checking writer → gzip members → reader →
    record pairing. Pixel-exactness of the image payload is pinned by
    pytest (byte equality vs the synth path), not SQL."""
    out_dir = _ensure_written(sf_dir)

    def parse_shard(batch: pa.Table) -> pa.Table:
        docs: dict[int, dict] = {}
        for blob in batch["bytes"].to_pylist():
            for _off, _rlen, headers, payload in read_warc_gz(bytes(blob)):
                t = headers["WARC-Type"]
                if t == "warcinfo":
                    continue
                d = docs.setdefault(
                    _doc_id_of(headers["WARC-Target-URI"]),
                    {"n": 0, "cap_sha": "", "cap_bytes": 0, "ct_ok": False})
                d["n"] += 1
                if t == "metadata":
                    d["cap_sha"] = hashlib.sha256(payload).hexdigest()
                    d["cap_bytes"] = len(payload)
                elif t == "resource":
                    d["ct_ok"] = headers["Content-Type"].startswith("image/")
        ids = sorted(docs)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_records": pa.array([docs[i]["n"] for i in ids], pa.int64()),
            "caption_bytes": pa.array([docs[i]["cap_bytes"] for i in ids],
                                      pa.int64()),
            "caption_sha256": pa.array([docs[i]["cap_sha"] for i in ids],
                                       pa.string()),
            "image_ct_ok": pa.array([docs[i]["ct_ok"] for i in ids],
                                    pa.bool_()),
        })

    files = _read_raw_shards(out_dir)
    return files.map_batches(parse_shard, batch_format="pyarrow",
                             batch_size=1)


WARC_ROUNDTRIP_SQL = """
SELECT doc_id,
       CAST(2 AS BIGINT) AS n_records,
       CAST(strlen(text) AS BIGINT) AS caption_bytes,
       sha256(text) AS caption_sha256,
       true AS image_ct_ok
FROM documents
"""


def surt(url: str) -> str:
    """Sort-friendly URI Reordering Transform of a canonical http URL —
    the CDX key convention (host labels reversed, comma-joined)."""
    rest = url.split("://", 1)[1]
    host, _, path = rest.partition("/")
    host = host.rsplit(":", 1)[0] if ":" in host else host
    return ",".join(reversed(host.split("."))) + ")/" + path


def warc_cdx(sf_dir: str):
    """CDX index build over the packed WARC shards: one row per non-info
    record with (surt, rec_type, doc_id) — the SQL-pinnable identity
    columns. The full CDX tuple (shard file, byte offset, member length,
    digest) is exercised by pytest's random-access re-slice test; offsets
    aren't SQL-derivable by construction (they price the gzip encoding).

    Shape: one parse task per shard emits its index rows; the result is
    the index table itself (size ∝ records, never joined back against
    payload bytes)."""
    out_dir = _ensure_written(sf_dir)

    def index_shard(batch: pa.Table) -> pa.Table:
        surts, types, ids = [], [], []
        for blob in batch["bytes"].to_pylist():
            for _off, _rlen, headers, _payload in read_warc_gz(bytes(blob)):
                t = headers["WARC-Type"]
                if t == "warcinfo":
                    continue
                uri = headers["WARC-Target-URI"]
                surts.append(surt(uri))
                types.append(t)
                ids.append(_doc_id_of(uri))
        return pa.table({
            "surt": pa.array(surts, pa.string()),
            "rec_type": pa.array(types, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
        })

    files = _read_raw_shards(out_dir)
    return files.map_batches(index_shard, batch_format="pyarrow",
                             batch_size=1)


WARC_CDX_SQL = """
WITH u AS (
  SELECT doc_id,
         'com,example,src' || substr(source, 4) || ')/d/'
           || CAST(doc_id AS VARCHAR) || '/asset.png' AS surt
  FROM documents
)
SELECT surt, rec_type, doc_id
FROM u, (VALUES ('resource'), ('metadata')) AS t(rec_type)
"""


# --------------------------------------------------------------------------
# WARC revisit dedup (ISO 28500 / WARC 1.1 revisit records,
# identical-payload-digest profile) — archive-level dedup: the first
# occurrence of each payload digest is stored as a full ``resource``
# record; every later occurrence becomes a payload-less ``revisit``
# record pointing at it (WARC-Refers-To* headers). At 100 TB this is the
# storage story for a recrawl archive: duplicates cost ~300 bytes, not
# an image.
# --------------------------------------------------------------------------
_REVISIT_PROFILE = "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"


def _derive_dedup_rows(batch: pa.Table) -> pa.Table:
    t = _derive_warc_rows(batch)
    digests = [payload_digest(v.as_py()) for v in t["image"]]
    return t.append_column("digest", pa.array(digests, pa.string()))


def write_warc_dedup(sf_dir: str, out_dir: str) -> None:
    """Pack with dedup: groupby payload DIGEST (true content identity,
    one dedup-shaped shuffle — the dedup_exact pattern) attaches each
    row's original (min doc_id of its digest group, plus that row's
    url/date for the Refers-To headers); then groupby shard packs
    members, originals full, duplicates as revisit records."""
    os.makedirs(out_dir, exist_ok=True)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    ds = ds.map_batches(_derive_dedup_rows, batch_format="pyarrow",
                        batch_size=256)

    def attach_orig(g):
        i = g["doc_id"].idxmin()
        g = g.assign(orig_doc=int(g["doc_id"].min()),
                     orig_url=g["canon_url"][i],
                     orig_date=g["date"][i])
        return g

    ds = ds.groupby("digest").map_groups(attach_orig, batch_format="pandas")

    def pack_and_publish(g) -> pa.Table:
        s = int(g["shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{s:05d}.warc.gz")
        if not os.path.exists(path):
            g = g.sort_values("doc_id")
            out = [gzip_member(build_record(
                "warcinfo",
                (f"software: mycelium-ray\r\nformat: WARC File Format "
                 f"1.1\r\nn-documents: {len(g)}\r\n").encode(),
                date=warc_date(_DATE_BASE),
                content_type="application/warc-fields"))]
            for r in g.itertuples(index=False):
                if r.doc_id == r.orig_doc:
                    img_rec = build_record(
                        "resource", bytes(r.image), target_uri=r.canon_url,
                        date=r.date, content_type=f"image/{r.fmt}")
                else:
                    orig_rid = record_id("resource", r.orig_url, r.digest)
                    img_rec = build_record(
                        "revisit", b"", target_uri=r.canon_url,
                        date=r.date, digest=r.digest,
                        content_type="application/octet-stream",
                        extra=[("WARC-Profile", _REVISIT_PROFILE),
                               ("WARC-Refers-To", f"<{orig_rid}>"),
                               ("WARC-Refers-To-Target-URI", r.orig_url),
                               ("WARC-Refers-To-Date", r.orig_date)])
                cap_rec = build_record(
                    "metadata", (r.caption or "").encode("utf-8"),
                    target_uri=r.canon_url, date=r.date,
                    content_type="text/plain; charset=utf-8")
                out.append(gzip_member(img_rec))
                out.append(gzip_member(cap_rec))
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(b"".join(out))
            os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string())})

    ds.groupby("shard").map_groups(pack_and_publish,
                                   batch_format="pandas").materialize()


def _warc_dedup_dir(sf_dir: str) -> str:
    return ("/tmp/mycelium_warc_dedup_"
            + os.path.basename(os.path.normpath(sf_dir)))


def _ensure_dedup_written(sf_dir: str) -> str:
    out_dir = _warc_dedup_dir(sf_dir)
    done = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(done):
        write_warc_dedup(sf_dir, out_dir)
        with open(done, "w") as f:
            f.write("ok\n")
    return out_dir


def warc_revisit(sf_dir: str):
    """(doc_id, rec_type, refers_to_doc, digest_ok, stored_bytes_zero) —
    pack the corpus with revisit dedup, read the shards BACK through the
    verifying parser, and check the dedup graph end-to-end: every
    duplicate row is a revisit record whose Refers-To-Target-URI names
    the group's first document; a digest join original↔revisit (payload
    digests only, no image bytes) verifies the identical-payload-digest
    contract. The oracle recomputes rec_type and refers_to_doc from the
    corpus's content-identity rule (planted dup groups + exact-text
    duplicates — the same rule every phash/dedup oracle uses)."""
    out_dir = _ensure_dedup_written(sf_dir)

    def parse_shard(batch: pa.Table) -> pa.Table:
        ids, types, refs, digs, zeros = [], [], [], [], []
        for blob in batch["bytes"].to_pylist():
            for _o, _l, headers, payload in read_warc_gz(bytes(blob)):
                t = headers["WARC-Type"]
                if t not in ("resource", "revisit"):
                    continue
                d = _doc_id_of(headers["WARC-Target-URI"])
                ids.append(d)
                types.append(t)
                refs.append(_doc_id_of(headers["WARC-Refers-To-Target-URI"])
                            if t == "revisit" else d)
                digs.append(headers["WARC-Payload-Digest"])
                zeros.append(len(payload) == 0 if t == "revisit" else True)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "rec_type": pa.array(types, pa.string()),
            "refers_to_doc": pa.array(refs, pa.int64()),
            "digest": pa.array(digs, pa.string()),
            "stored_bytes_zero": pa.array(zeros, pa.bool_()),
        })

    parsed = _read_raw_shards(out_dir).map_batches(
        parse_shard, batch_format="pyarrow", batch_size=1)

    def check_group(g):
        orig = g[g["doc_id"] == g["refers_to_doc"]]
        odig = orig["digest"].iloc[0] if len(orig) else None
        return g.assign(digest_ok=(g["digest"] == odig)
                        if odig is not None else False)

    out = parsed.groupby("refers_to_doc").map_groups(
        check_group, batch_format="pandas")
    return out.drop_columns(["digest"])


def _warc_revisit_sql() -> str:
    from .flagship import DUP_EVERY, DUP_GROUPS
    return f"""
WITH g AS (
  SELECT doc_id,
         CASE WHEN doc_id % {DUP_EVERY} = 0
              THEN 'dup:' || CAST(doc_id % {DUP_GROUPS} AS VARCHAR)
              ELSE 'txt:' || coalesce(text, '') END AS ckey
  FROM documents),
m AS (SELECT ckey, min(doc_id) AS orig FROM g GROUP BY ckey)
SELECT g.doc_id,
       CASE WHEN g.doc_id = m.orig THEN 'resource'
            ELSE 'revisit' END AS rec_type,
       m.orig AS refers_to_doc,
       TRUE AS digest_ok,
       TRUE AS stored_bytes_zero
FROM g JOIN m USING (ckey)
"""


WARC_REVISIT_SQL = _warc_revisit_sql()
