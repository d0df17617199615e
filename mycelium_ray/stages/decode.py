"""Decode / validate stage for fetched image rows (graft analog of M18/M19
transcoding + M22 extraction; SURVEY.md §2.2).

Actor-pool ``map_batches`` stage: takes ``fetched`` rows
(url, content:binary, http_code, …), decodes the payload, validates it, and
emits typed image columns. Decoding is per-row by nature (variable-size
compressed payloads) but each row is numpy-vectorized internally; batches
stay small because rows are wide (see SURVEY.md §7.5 "Wide binary rows").

Use as::

    ds.map_batches(DecodeValidate(), batch_format="pyarrow",
                   batch_size=256, concurrency=8)

(A plain function would also work — the class form exists because a real
libjpeg/libwebp build loads codec state once per actor in ``__init__``.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..http_headers import sniff_format
from ..imaging import ImageDecodeError, decode_image, phash64


class DecodeValidate:
    """content:binary → (fmt_sniffed, w, h, phash, decode_ok, decode_err)."""

    def __init__(self, content_col: str = "content"):
        self.content_col = content_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        contents = batch[self.content_col].to_pylist()
        n = len(contents)
        fmt = [""] * n
        w = np.zeros(n, dtype=np.int32)
        h = np.zeros(n, dtype=np.int32)
        ph = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        err = [""] * n
        for i, data in enumerate(contents):
            if not data:
                err[i] = "empty"
                continue
            fmt[i] = sniff_format(data)
            try:
                px, f = decode_image(data)
            except ImageDecodeError as e:
                err[i] = str(e)
                continue
            fmt[i] = f
            h[i], w[i] = px.shape[0], px.shape[1]
            ph[i] = phash64(px)
            ok[i] = True
        return (batch
                .append_column("fmt_sniffed", pa.array(fmt, pa.string()))
                .append_column("w", pa.array(w, pa.int32()))
                .append_column("h", pa.array(h, pa.int32()))
                .append_column("phash", pa.array(ph, pa.int64()))
                .append_column("decode_ok", pa.array(ok))
                .append_column("decode_err", pa.array(err, pa.string())))


def clean_caption_batch(batch: pa.Table, col: str = "caption") -> pa.Table:
    """Caption cleaning (M21 control-char strip + M24 entity unescape +
    trim; local_indexer.cc:74-82, dist/utils/sgml_stripper.py)."""
    import html
    caps = batch[col].to_pylist()
    out = []
    for c in caps:
        if c is None:
            out.append(None)
            continue
        c = html.unescape(c)
        c = "".join(ch for ch in c if ch >= " " or ch in "\t\n")
        out.append(c.strip())
    return batch.set_column(batch.schema.get_field_index(col), col,
                            pa.array(out, pa.string()))
