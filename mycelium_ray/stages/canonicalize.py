"""Ingest canonicalization stage (operators M1-M6 of SURVEY.md §2.2).

A stateless ``map_batches`` transform: raw URL lines in, canonical rows out.
Mirrors process_input_buff's accept rule (absolute ``http`` only,
/root/reference/src/crawler/crawler.cc:1297-1302) and Url::normalize
(/root/reference/src/common/Url.cc:372-379).

Batch format is pyarrow end-to-end; the canonicalizer itself is per-string
Python (URL grammar is not expressible as an Arrow kernel) but compiled
regexes + slot classes keep it ~µs/url; at 32 cores the stage sustains
hundreds of thousands of URLs/sec, far above any fetch stage's appetite.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import url_hash64_many
from ..urlcanon import Url, UrlParseError


def canonicalize_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Adds columns: canon_url, host, raw_host, ok (+ url_hash uint64).

    ``raw_host`` is the pre-normalization host — the frontier routing key
    (the reference classifier enqueues BEFORE normalize, crawler.cc:1311).
    ``ok`` = parsed and absolute-http.
    """
    urls = batch[url_col].to_pylist()
    n = len(urls)
    canon = [""] * n
    host = [""] * n
    raw_host = [""] * n
    ok = np.zeros(n, dtype=bool)
    for i, s in enumerate(urls):
        if s is None:
            continue
        s = s.strip()
        if not s:
            continue
        try:
            u = Url(s)
        except UrlParseError:
            continue
        except Exception:
            continue
        if not (u.absolute and u.scheme == "http"):
            continue
        raw_host[i] = u.host
        u.normalize()
        canon[i] = u.get()
        host[i] = u.host
        ok[i] = True
    hashes = url_hash64_many(canon)
    return batch.append_column("canon_url", pa.array(canon, pa.string())) \
                .append_column("host", pa.array(host, pa.string())) \
                .append_column("raw_host", pa.array(raw_host, pa.string())) \
                .append_column("ok", pa.array(ok)) \
                .append_column("url_hash", pa.array(hashes, pa.uint64()))


def canonicalize_dataset(ds, url_col: str = "url", keep_rejects: bool = False):
    """Dataset-level wrapper: canonicalize then (optionally) filter rejects."""
    import pyarrow.compute as pc
    out = ds.map_batches(lambda t: canonicalize_batch(t, url_col),
                         batch_format="pyarrow")
    if not keep_rejects:
        out = out.map_batches(lambda t: t.filter(pc.equal(t["ok"], True)),
                              batch_format="pyarrow")
    return out
