"""Versioned table store: the durability layer for frontier / url_seen /
fetched / metrics / lineage tables.

North-star storage is Lance. When the ``lance`` package is importable the
write path is ``lance.write_dataset(table, <vdir>/data.lance)`` per
version; this container ships no lance, so the default falls back to
**versioned Parquet datasets** with the same contract (append-only
versions, atomic publish, read-at-version). Reads AUTO-DETECT the format
per version directory, so a store written under one environment resumes
under the other. The lance branch is exercised in CI through a minimal
fake ``lance`` module (tests/test_state.py::test_lance_branch) so the
adapter stays honest without the real dependency.

Layout (one directory per logical table):

    root/<table>/v000001/part-000.parquet     # parquet version
    root/<table>/v000001/data.lance/…         # or a lance version
    root/<table>/v000001/_OK                  # publish marker
    root/<table>/_blobs/<name>                # binary blobs (filter states)

A version directory is written under a temp name and atomically renamed,
then the ``_OK`` marker is written — readers only trust marked versions, so
a killed writer can never expose partial state (the resume contract of
SURVEY.md §4 "checkpoint/resume").
"""

from __future__ import annotations

import os
import pickle
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - exercised only where lance is installed
    import lance  # noqa: F401
    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


class TableStore:
    def __init__(self, root: str, format: str = "auto"):
        """format: 'auto' (lance when importable, else parquet),
        'parquet', or 'lance' (requires the lance module)."""
        self.root = root
        if format == "auto":
            format = "lance" if HAVE_LANCE else "parquet"
        if format == "lance" and not HAVE_LANCE:
            raise RuntimeError("format='lance' but no lance module")
        self.format = format
        os.makedirs(root, exist_ok=True)

    # ---- paths ----
    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _vdir(self, name: str, version: int) -> str:
        return os.path.join(self._tdir(name), f"v{version:06d}")

    # ---- versions ----
    def versions(self, name: str) -> list[int]:
        tdir = self._tdir(name)
        if not os.path.isdir(tdir):
            return []
        out = []
        for d in os.listdir(tdir):
            if d.startswith("v") and os.path.exists(os.path.join(tdir, d, "_OK")):
                out.append(int(d[1:]))
        return sorted(out)

    def latest_version(self, name: str) -> int | None:
        vs = self.versions(name)
        return vs[-1] if vs else None

    # ---- tables ----
    def write(self, name: str, table: pa.Table, version: int) -> str:
        """Atomic publish of one version. Re-publishing an existing version
        is a no-op (idempotent resume)."""
        final = self._vdir(name, version)
        if os.path.exists(os.path.join(final, "_OK")):
            return final
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        if self.format == "lance":
            import lance as _lance
            _lance.write_dataset(table, os.path.join(tmp, "data.lance"),
                                 mode="create")
        else:
            pq.write_table(table, os.path.join(tmp, "part-000.parquet"))
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        with open(os.path.join(final, "_OK"), "w") as f:
            f.write("ok")
        return final

    def publish_dataset(self, name: str, ds, version: int) -> str:
        """Atomic publish of one version from a ``ray.data.Dataset`` —
        the distributed dual of ``write``: every task writes its own
        part file into the temp directory (row data never crosses the
        driver), then the driver does the same rename+_OK publish. On a
        multi-node cluster the version directory must live on shared
        storage (the same requirement every path in this store has).
        Parquet only (lance's fragment writer isn't in this container).
        Idempotent: re-publishing an existing version is a no-op."""
        final = self._vdir(name, version)
        if os.path.exists(os.path.join(final, "_OK")):
            return final
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        ds.write_parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        with open(os.path.join(final, "_OK"), "w") as f:
            f.write("ok")
        return final

    def version_files(self, name: str, version: int) -> list[str]:
        """Paths of a published parquet version's part files — for
        feeding ``ray.data.read_parquet`` directly (the _OK marker and
        any sidecars are excluded)."""
        vdir = self._vdir(name, version)
        if not os.path.exists(os.path.join(vdir, "_OK")):
            raise FileNotFoundError(f"{name} v{version} not published")
        return sorted(os.path.join(vdir, f) for f in os.listdir(vdir)
                      if f.endswith(".parquet"))

    def read(self, name: str, version: int | None = None) -> pa.Table:
        if version is None:
            version = self.latest_version(name)
            if version is None:
                raise FileNotFoundError(f"no published versions of {name}")
        vdir = self._vdir(name, version)
        if not os.path.exists(os.path.join(vdir, "_OK")):
            raise FileNotFoundError(f"{name} v{version} not published")
        # per-version format auto-detect: resume works across environments
        lance_path = os.path.join(vdir, "data.lance")
        if os.path.exists(lance_path):
            import lance as _lance
            return _lance.dataset(lance_path).to_table()
        parts = sorted(f for f in os.listdir(vdir) if f.endswith(".parquet"))
        return pa.concat_tables([pq.read_table(os.path.join(vdir, p)) for p in parts])

    def exists(self, name: str, version: int | None = None) -> bool:
        if version is None:
            return bool(self.versions(name))
        return os.path.exists(os.path.join(self._vdir(name, version), "_OK"))

    # ---- maintenance ----
    def vacuum(self, name: str, keep_last: int = 2) -> list[int]:
        """Delete all but the newest ``keep_last`` published versions of a
        table (and their filter-checkpoint blobs). Checkpoint stores grow
        one version per round — at 10^5 rounds over 100 TB that growth
        must be bounded; resume only ever reads the latest published
        version, so older snapshots are dead weight once a newer one has
        its ``_OK`` marker. Unpublished/tmp directories are never touched
        (a writer may be mid-publish). Returns the versions removed."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions(name)
        drop = vs[:-keep_last] if len(vs) > keep_last else []
        for v in drop:
            shutil.rmtree(self._vdir(name, v), ignore_errors=True)
            blob = os.path.join(self._tdir(name), "_blobs", f"v{v:06d}.pkl")
            if os.path.exists(blob):
                os.remove(blob)
        return drop

    def compact(self, name: str, version: int | None = None,
                target_bytes: int = 128 << 20) -> tuple[str, int]:
        """Merge a published version's small part files into
        ~``target_bytes`` parts, published as a NEW version. The
        small-files problem is the dominant failure mode of resumable
        per-shard output at 100 TB (10^5 shards x per-task parts); this
        is the Iceberg/Delta ``rewrite_data_files`` analog. The rewrite
        is distributed (ray.data streams the parts and each output task
        writes its own file — rows never cross the driver), the source
        version stays readable throughout (time-travel + concurrent
        readers), and ``vacuum`` reclaims it later. Idempotent under
        retry via the same tmp+rename+_OK publish every writer uses.
        Returns (new version dir, n output parts requested)."""
        import ray.data as _rd
        if version is None:
            version = self.latest_version(name)
            if version is None:
                raise FileNotFoundError(f"no published versions of {name}")
        files = self.version_files(name, version)
        total = sum(os.path.getsize(f) for f in files)
        n_out = max(1, min(len(files), -(-total // target_bytes)))
        ds = _rd.read_parquet(files).repartition(int(n_out))
        new_v = self.latest_version(name) + 1
        return self.publish_dataset(name, ds, new_v), int(n_out)

    def vacuum_blobs(self, name: str, keep_last: int = 2) -> list[int]:
        """Same growth bound for blob-only checkpoint streams (e.g. the
        crawl's ``crawl_ckpt`` snapshots, which have no table versions):
        resume always restores the newest blob, so older ones are dead
        weight. Keeps ≥1; returns the versions removed."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.blob_versions(name)
        drop = vs[:-keep_last] if len(vs) > keep_last else []
        bdir = os.path.join(self._tdir(name), "_blobs")
        for v in drop:
            path = os.path.join(bdir, f"v{v:06d}.pkl")
            if os.path.exists(path):
                os.remove(path)
        return drop

    # ---- binary blobs (filter checkpoints) ----
    def write_blob(self, name: str, version: int, obj) -> str:
        bdir = os.path.join(self._tdir(name), "_blobs")
        os.makedirs(bdir, exist_ok=True)
        final = os.path.join(bdir, f"v{version:06d}.pkl")
        if os.path.exists(final):
            return final
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(obj, f, protocol=4)
        os.replace(tmp, final)
        return final

    def read_blob(self, name: str, version: int):
        path = os.path.join(self._tdir(name), "_blobs", f"v{version:06d}.pkl")
        with open(path, "rb") as f:
            return pickle.load(f)

    def blob_versions(self, name: str) -> list[int]:
        bdir = os.path.join(self._tdir(name), "_blobs")
        if not os.path.isdir(bdir):
            return []
        return sorted(int(f[1:7]) for f in os.listdir(bdir)
                      if f.endswith(".pkl") and not f.endswith(".tmp"))
