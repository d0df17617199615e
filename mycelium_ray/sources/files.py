"""Local-indexer pipeline (reference entry point §3.2 rebuilt).

Reference: ``dist/local_indexer.py`` / ``src/local_indexer/local_indexer.cc``
— walk a directory, gate by extension, build a normalized ``file://`` URL,
convert content (pdftotext subprocess there; image decode here, per the
graft), save a Doc with http_code 200 on success / 415 on conversion
failure (local_indexer.cc:124-130, dist/local_indexer.py:88-97).

Ray Data shape: ``read_binary_files(include_paths=True)`` replaces the
fork-per-file walker (local_indexer.cc:150-166); conversion is a stateless
``map_batches``; the fork-pool parallelism (``forkfun.py``) comes free from
the streaming executor.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

from ..functions.pdftext import PdfError, pdf_to_text
from ..hashing import url_hash64_many
from ..imaging import ImageDecodeError, decode_image, phash64
from ..urlcanon import Url

KNOWN_EXTENSIONS = (".png", ".jpeg", ".jpg", ".webp", ".pdf")


def filter_ascii_control(s: str) -> str:
    """Port of dist/local_indexer.py:36-37 (M21): keep TAB..CR and
    printable, drop other controls and DEL."""
    return "".join(c for c in s
                   if ("\x09" < c < "\x0e") or (c > "\x1f" and c != "\x7f"))


def file_url(path: str) -> str:
    """file:// URL via the real canonicalizer (dist/local_indexer.py:75-78)."""
    u = Url("file://" + os.path.realpath(path))
    return u.normalize().get()


def index_batch(batch: pa.Table) -> pa.Table:
    """(path, bytes) → indexed doc rows (url, http_code 200/415, image
    cols; pdf rows carry extracted text — the reference's pdftotext
    conversion, reimplemented from the spec in functions/pdftext.py)."""
    paths = batch["path"].to_pylist()
    contents = batch["bytes"].to_pylist()
    n = len(paths)
    url = [""] * n
    code = [0] * n
    err = [""] * n
    w = [0] * n
    h = [0] * n
    ph = [0] * n
    fmt = [""] * n
    text = [""] * n
    keep = [False] * n
    for i, (p, data) in enumerate(zip(paths, contents)):
        ext = os.path.splitext(p)[1].lower()
        if ext not in KNOWN_EXTENSIONS:
            continue
        keep[i] = True
        url[i] = file_url(p)
        if ext == ".pdf":
            try:
                text[i] = filter_ascii_control(pdf_to_text(data))
                code[i] = 200
                fmt[i] = "pdf"
            except PdfError as e:
                code[i] = 415
                err[i] = f'error indexing "{p}" reason: "{e}"'
            continue
        try:
            px, f = decode_image(data)
            code[i] = 200
            fmt[i] = f
            h[i], w[i] = px.shape[0], px.shape[1]
            ph[i] = phash64(px)
        except ImageDecodeError as e:
            code[i] = 415  # Unsupported Media Type, the reference's
            #               conversion-failure stub (local_indexer.cc:124-130)
            err[i] = f'error indexing "{p}" reason: "{e}"'
    t = pa.table({
        "path": pa.array(paths, pa.string()),
        "url": pa.array(url, pa.string()),
        "http_code": pa.array(code, pa.int32()),
        "error": pa.array(err, pa.string()),
        "w": pa.array(w, pa.int32()),
        "h": pa.array(h, pa.int32()),
        "phash": pa.array(ph, pa.int64()),
        "fmt": pa.array(fmt, pa.string()),
        "text": pa.array(text, pa.string()),
        "keep": pa.array(keep),
        "url_hash": pa.array(url_hash64_many(url), pa.uint64()),
    })
    import pyarrow.compute as pc
    return t.filter(pc.equal(t["keep"], True)).drop_columns(["keep"])


def index_directory(directory: str, out_dir: str | None = None):
    """read_binary_files → index map_batches → (optional) parquet sink."""
    ds = rd.read_binary_files(directory, include_paths=True)
    ds = ds.map_batches(index_batch, batch_format="pyarrow", batch_size=64)
    if out_dir is not None:
        ds.write_parquet(out_dir)
        ds = rd.read_parquet(out_dir)
    return ds
