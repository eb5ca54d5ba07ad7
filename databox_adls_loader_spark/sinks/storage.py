"""Storage seam for the versioned table layer (`sinks/versioned.py`):
the small set of metadata/file primitives a snapshot-manifest log needs
— list, read, exclusive-create, pointer-swap, delete — behind one
interface with two implementations:

- :class:`LocalStorage` — POSIX (`os`/`glob`/`open`), exclusive create
  via write-temp + hard-link.  The test/sandbox path.
- :class:`HadoopStorage` — the JVM `org.apache.hadoop.fs.FileSystem`
  reached through the active SparkSession's gateway (same gateway as
  `sources/hadoop_fs.py:60`), so the SAME versioned-table code runs
  against `file:`, `hdfs:`, `abfss:`, `s3a:` — the connector boundary
  the reference crosses with `hadoop fs` subprocess calls
  (/root/reference/copy-to-adls.py:63-91).  Exclusive create maps to
  `FileSystem.create(path, overwrite=false)`; on a real object store
  the same primitive is the conditional put (ADLS `If-None-Match: *`,
  S3 `If-None-Match`), which is exactly what the optimistic-concurrency
  manifest commit requires.

Data-file I/O stays with Spark either way (`df.write.parquet(uri)` /
`spark.read.parquet(uri)` speak every Hadoop scheme natively); this seam
carries only the MANIFEST plane plus driver-side parquet-footer reads
for the stats index.

Path canonicalization: manifests persist whatever `canon()` returns —
`os.path.abspath` locally, a decoded `scheme://authority/path` URI on
Hadoop — and every set-membership comparison (vacuum liveness, scoped
merge probe) runs both sides through the same `canon()`/`uri_canon()`,
so representation differences (relative dirs, `file:` vs `file://`,
percent-escapes from `input_file_name()`) can never cause a false
"unreferenced" delete or a missed touched-file match.
"""

from __future__ import annotations

import glob as _glob
import io
import os
import re
import uuid

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def _canon_uri(u: str) -> str:
    """Any URI/path spelling → one canonical, percent-decoded
    ``scheme://authority/path`` string (local bare paths → abspath).
    `Path.toString()` prints ``file:/x``, `input_file_name()` prints
    ``file:///x`` — both must compare equal."""
    from urllib.parse import unquote

    if "://" in u:
        scheme, rest = u.split("://", 1)
        slash = rest.find("/")
        auth, path = (rest[:slash], rest[slash:]) if slash >= 0 else (rest, "/")
    elif _SCHEME_RE.match(u):
        scheme, path = u.split(":", 1)
        auth = ""
    else:
        return os.path.abspath(u)
    while path.startswith("//"):          # collapse empty-authority slashes
        path = path[1:]
    return f"{scheme}://{auth}{unquote(path)}"


class LocalStorage:
    """POSIX-backed manifest plane — byte-identical behavior to the
    pre-seam `os`/`glob` code, so existing tables stay readable."""

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def basename(self, path: str) -> str:
        return os.path.basename(path.rstrip("/"))

    def canon(self, path: str) -> str:
        # A bare-path table can inherit `file:`-URI manifest keys (e.g.
        # a shallow clone FROM a file:// table) — collapse the scheme
        # before abspath, or the URI gets cwd-joined into garbage and
        # every set-membership against it silently misses (the round-7
        # row-lineage NULL bug).
        return self.uri_canon(path)

    def uri_canon(self, uri: str) -> str:
        """`input_file_name()` URI → the same canonical form `canon`
        gives the manifest entry for that file."""
        if uri.startswith("file:"):
            from urllib.parse import unquote, urlparse
            return os.path.abspath(unquote(urlparse(uri).path))
        return os.path.abspath(uri)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def read_text(self, path: str) -> str:
        with open(path, encoding="utf-8") as f:
            return f.read()

    def create_exclusive(self, path: str, text: str) -> None:
        """Atomic conditional put: the file appears fully written or not
        at all (no torn JSON after a crash), and creation fails with
        `FileExistsError` if the path exists — write-temp + hard-link."""
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
        try:
            os.link(tmp, path)
        finally:
            os.unlink(tmp)

    def replace_text(self, path: str, text: str) -> None:
        tmp = f"{path}.tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
        os.replace(tmp, path)

    def delete(self, path: str) -> bool:
        try:
            os.remove(path)
            return True
        except FileNotFoundError:
            return False

    def list_glob(self, pattern: str) -> list[str]:
        return _glob.glob(pattern)

    def file_size(self, path: str) -> int:
        return os.path.getsize(path)

    def parquet_source(self, path: str):
        """A source `pyarrow.parquet` accepts (a fresh one per call)."""
        return path


# Hadoop scheme spellings → the pyarrow.fs scheme reaching the same
# store (pyarrow registers file/s3/gs/abfs/hdfs; Spark jobs usually
# spell them s3a/abfss).  Unknown schemes pass through to from_uri.
_PAFS_ALIASES = {"s3a": "s3", "s3n": "s3", "abfss": "abfs",
                 "wasbs": "abfs", "wasb": "abfs"}


def path_key(u: str) -> str:
    """One comparison key across local spellings: `_metadata.file_path`
    / `input_file_name()` print ``file:/x`` URIs while bare-path tables
    canonicalize to abspaths — collapse the ``file`` scheme, keep
    remote schemes.  Use for any set-membership between executor-
    reported paths and manifest entries."""
    c = _canon_uri(u)
    return c[len("file://"):] if c.startswith("file://") else c


def _split_uri(u: str) -> tuple[str, str, str]:
    """canonical URI → (scheme, authority, path); bare paths get
    ('', '', abspath)."""
    c = _canon_uri(u)
    if "://" not in c:
        return "", "", c
    scheme, rest = c.split("://", 1)
    slash = rest.find("/")
    if slash < 0:
        return scheme, rest, "/"
    return scheme, rest[:slash], rest[slash:]


def arrow_fs_for(uri: str):
    """(pyarrow.fs.FileSystem, in-fs path) for any scheme spelling —
    the JVM-free resolver (usable from Python DSv2 workers and
    executors, where no Spark gateway exists)."""
    from pyarrow import fs as pafs

    scheme, auth, path = _split_uri(uri)
    if not scheme:
        return pafs.LocalFileSystem(), path
    if scheme == "file":
        return pafs.LocalFileSystem(), path
    mapped = _PAFS_ALIASES.get(scheme, scheme)
    return pafs.FileSystem.from_uri(f"{mapped}://{auth}{path}")


class ArrowStorage:
    """pyarrow.fs-backed manifest plane for SCHEME paths when no JVM
    gateway is reachable — Python DSv2 source workers (the vtable
    stream's planner runs in a subprocess with no active SparkSession)
    and executor-side helpers.  The READ surface is exact and is all
    those contexts use; `create_exclusive` is exists-then-write (NOT a
    conditional put — commits should run where `HadoopStorage` provides
    the real one; this impl exists so read paths never die for lack of
    a gateway)."""

    def join(self, *parts: str) -> str:
        out = parts[0].rstrip("/")
        for p in parts[1:]:
            out += "/" + p.strip("/")
        return out

    def basename(self, path: str) -> str:
        return path.rstrip("/").rsplit("/", 1)[-1]

    def canon(self, path: str) -> str:
        return _canon_uri(path)

    def uri_canon(self, uri: str) -> str:
        return _canon_uri(uri)

    def _info(self, path: str):
        fs, p = arrow_fs_for(path)
        return fs.get_file_info(p)

    def exists(self, path: str) -> bool:
        from pyarrow import fs as pafs
        return self._info(path).type != pafs.FileType.NotFound

    def mkdirs(self, path: str) -> None:
        fs, p = arrow_fs_for(path)
        fs.create_dir(p, recursive=True)

    def read_text(self, path: str) -> str:
        fs, p = arrow_fs_for(path)
        with fs.open_input_file(p) as f:
            return f.read().decode("utf-8")

    def create_exclusive(self, path: str, text: str) -> None:
        if self.exists(path):
            raise FileExistsError(path)
        self.replace_text(path, text)

    def replace_text(self, path: str, text: str) -> None:
        fs, p = arrow_fs_for(path)
        with fs.open_output_stream(p) as f:
            f.write(text.encode("utf-8"))

    def delete(self, path: str) -> bool:
        fs, p = arrow_fs_for(path)
        try:
            fs.delete_file(p)
            return True
        except FileNotFoundError:
            return False

    def list_glob(self, pattern: str) -> list[str]:
        import fnmatch

        from pyarrow import fs as pafs

        scheme, auth, path = _split_uri(pattern)
        # base = longest wildcard-free prefix; list it recursively and
        # fnmatch full paths (pyarrow has no native glob)
        segs = path.split("/")
        base_segs = []
        for s in segs:
            if any(ch in s for ch in "*?["):
                break
            base_segs.append(s)
        base = "/".join(base_segs) or "/"
        prefix = f"{scheme}://{auth}" if scheme else ""
        fs, base_p = arrow_fs_for(f"{prefix}{base}" if prefix else base)
        infos = fs.get_file_info(
            pafs.FileSelector(base_p, recursive=True,
                              allow_not_found=True))
        return sorted(
            f"{prefix}{i.path}" if prefix else i.path
            for i in infos
            if i.type == pafs.FileType.File
            and fnmatch.fnmatchcase(i.path, path))

    def file_size(self, path: str) -> int:
        return int(self._info(path).size)

    def parquet_source(self, path: str):
        fs, p = arrow_fs_for(path)
        return fs.open_input_file(p)


class HadoopStorage:
    """Hadoop `FileSystem` manifest plane via the Spark JVM gateway.

    Works for any scheme the session's Hadoop conf can reach.  Exclusive
    create uses `create(path, overwrite=false)` — race-free (the losing
    writer gets `FileAlreadyExistsException`), with a brief
    visible-while-writing window that a true object-store conditional
    put (ADLS/S3 `If-None-Match`) closes; manifests are small enough
    (KBs) that HDFS/ABFS writes them in one block flush."""

    def __init__(self, spark) -> None:
        self._jvm = spark._jvm
        self._conf = spark.sparkContext._jsc.hadoopConfiguration()

    # -- internals ---------------------------------------------------
    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self, p: str):
        return self._path(p).getFileSystem(self._conf)

    # -- interface ---------------------------------------------------
    def join(self, *parts: str) -> str:
        out = parts[0].rstrip("/")
        for p in parts[1:]:
            out += "/" + p.strip("/")
        return out

    def basename(self, path: str) -> str:
        return path.rstrip("/").rsplit("/", 1)[-1]

    def canon(self, path: str) -> str:
        p = self._path(path)
        fs = p.getFileSystem(self._conf)
        return _canon_uri(fs.makeQualified(p).toString())

    def uri_canon(self, uri: str) -> str:
        return _canon_uri(uri)

    def exists(self, path: str) -> bool:
        return bool(self._fs(path).exists(self._path(path)))

    def mkdirs(self, path: str) -> None:
        self._fs(path).mkdirs(self._path(path))

    def read_bytes(self, path: str) -> bytes:
        fs = self._fs(path)
        stream = fs.open(self._path(path))
        try:
            baos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, baos, 1 << 16, False)
            return bytes(baos.toByteArray())
        finally:
            stream.close()

    def read_text(self, path: str) -> str:
        return self.read_bytes(path).decode("utf-8")

    def _write(self, path: str, text: str, overwrite: bool) -> None:
        fs = self._fs(path)
        try:
            out = fs.create(self._path(path), overwrite)
        except Exception as e:          # Py4JJavaError wrapping the JVM exc
            if "exists" in str(e).lower():
                raise FileExistsError(path) from e
            raise
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def create_exclusive(self, path: str, text: str) -> None:
        self._write(path, text, overwrite=False)

    def replace_text(self, path: str, text: str) -> None:
        # advisory-pointer semantics only (the authoritative latest is
        # the max manifest version) — overwrite-in-place is fine
        self._write(path, text, overwrite=True)

    def delete(self, path: str) -> bool:
        return bool(self._fs(path).delete(self._path(path), False))

    def list_glob(self, pattern: str) -> list[str]:
        fs = self._fs(pattern)
        statuses = fs.globStatus(self._path(pattern))
        if statuses is None:
            return []
        return [st.getPath().toString() for st in statuses]

    def file_size(self, path: str) -> int:
        return int(self._fs(path).getFileStatus(self._path(path)).getLen())

    def parquet_source(self, path: str):
        # driver-side footer/stat reads pull the whole (newly written,
        # commit-sized) file through the gateway; at 100 TB the stats
        # collection runs distributed (see versioned._file_stats note)
        return io.BytesIO(self.read_bytes(path))


def storage_for(table_dir: str, spark=None):
    """Resolve the storage impl from the table path's scheme: any
    ``scheme:`` prefix → :class:`HadoopStorage` (needs a live
    SparkSession for the JVM gateway — pass one or have one active),
    bare paths → :class:`LocalStorage`."""
    if _SCHEME_RE.match(table_dir):
        if spark is None:
            from pyspark.sql import SparkSession
            spark = SparkSession.getActiveSession()
        if spark is None:
            # no JVM gateway in this process (Python DSv2 worker,
            # executor) — pyarrow.fs serves the read plane; commits
            # should run where HadoopStorage's conditional put exists
            return ArrowStorage()
        return HadoopStorage(spark)
    return LocalStorage()
