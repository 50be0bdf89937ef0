"""Filesystem seam for the table layer (object-store readiness).

The reference's writer uploads a finished parquet file to object
storage and only THEN references it in downstream state
(/root/reference/writers/parquet/parquet.go:245-272 — upload, verify,
reference). This engine already has the same ordering (data files are
fully written and stats-footed before any manifest mentions them;
unreferenced files are orphans reclaimed by expire), but round-3 code
called ``os.rename``/``open`` directly, so pointing the table at a
remote store meant a rewrite. This module is the one indirection:
every metadata / manifest / file-lifecycle operation goes through a
:class:`FileIO`, whose contract is restricted to primitives real object
stores offer:

- **get / list / delete** — plain object reads, prefix listing, deletes.
- **put (atomic whole-object publish)** — S3 PUT semantics: readers see
  the old object or the new one, never a partial write. Used for
  immutable metadata versions, manifests, and the VERSION pointer flip.
- **conditional create** (``create_json``) — S3 ``If-None-Match: *`` /
  GCS ``if-generation-match: 0``: exactly one writer can create a given
  key. This is the commit-conflict primitive.

Deliberately ABSENT from the contract: rename, directory rename,
append, partial update, multi-object atomicity. The table layer
compiles entirely to the five primitives above, which is what makes the
remote store a config change.

Two implementations:

- :class:`LocalFileIO` — POSIX: publish = tmp + rename (same
  atomicity), conditional create = hard-link claim.
- :class:`FakeRemoteFileIO` — emulated remote store: every publish
  stages the full object in a scratch "upload" area first (the
  upload-then-reference shape), conditional create is an O_EXCL object
  create, and an operation log records every primitive issued so tests
  can assert the discipline (zero renames requested by the table
  layer). The final single-object publish uses ``os.replace`` purely as
  the stand-in for the store's internally-atomic PUT.

Spark itself reads/writes parquet *data* through its Hadoop FileSystem
layer keyed by the path scheme — that side is Spark's seam, not ours;
this one governs the table's metadata and lifecycle I/O.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Any, Iterator


class FileIO:
    """Abstract store contract (see module docstring). All paths are
    plain strings in the table's namespace."""

    # ---- objects
    def get_text(self, path: str) -> str:
        raise NotImplementedError

    def get_json(self, path: str) -> Any:
        return json.loads(self.get_text(path))

    def put_text(self, path: str, text: str) -> None:
        """Atomic whole-object publish (replace allowed)."""
        raise NotImplementedError

    def put_json(self, path: str, obj: Any) -> None:
        self.put_text(path, json.dumps(obj, separators=(",", ":")))

    def create_json(self, path: str, obj: Any) -> None:
        """Conditional create: publish ``obj`` at ``path`` iff no object
        exists there; raise FileExistsError otherwise. Exactly one of N
        concurrent creators wins."""
        raise NotImplementedError

    # ---- namespace
    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def list(self, path: str) -> list[str]:
        """Names directly under a prefix ([] when absent)."""
        raise NotImplementedError

    def walk(self, root: str) -> Iterator[tuple[str, list[str]]]:
        """(dirpath, filenames) bottom-up under ``root``."""
        raise NotImplementedError

    def ensure_prefix(self, path: str) -> None:
        """mkdir -p locally; a no-op concept on key-value stores."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def delete_prefix(self, path: str) -> None:
        """Recursive delete of everything under a prefix."""
        raise NotImplementedError

    def delete_empty_prefix(self, path: str) -> None:
        """Remove a now-empty directory locally; no-op semantics on
        stores (prefixes don't exist independently of objects)."""
        raise NotImplementedError

    def mtime_ms(self, path: str) -> float:
        raise NotImplementedError

    def size(self, path: str) -> int:
        raise NotImplementedError


class LocalFileIO(FileIO):
    """POSIX implementation — publish via tmp+rename in the target
    directory, conditional create via hard-link (rename would silently
    overwrite and lose a concurrent commit)."""

    def get_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def put_text(self, path: str, text: str) -> None:
        tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    def create_json(self, path: str, obj: Any) -> None:
        tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(obj, f, separators=(",", ":"))
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        finally:
            os.unlink(tmp)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def list(self, path: str) -> list[str]:
        return sorted(os.listdir(path)) if os.path.isdir(path) else []

    def walk(self, root: str) -> Iterator[tuple[str, list[str]]]:
        for dirpath, _dirs, names in os.walk(root, topdown=False):
            yield dirpath, names

    def ensure_prefix(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def delete(self, path: str) -> None:
        os.remove(path)

    def delete_prefix(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def delete_empty_prefix(self, path: str) -> None:
        if os.path.isdir(path) and not os.listdir(path):
            os.rmdir(path)

    def mtime_ms(self, path: str) -> float:
        return os.path.getmtime(path) * 1000

    def size(self, path: str) -> int:
        return os.path.getsize(path)


class FakeRemoteFileIO(LocalFileIO):
    """Emulated object store for tests: upload-then-publish writes and a
    primitive-operation log.

    - ``put_*`` stages the COMPLETE object in a scratch upload area
      first (crash before publish leaves only scratch garbage — the
      upload-then-reference shape), then performs one single-object
      publish. ``os.replace`` stands in for the store's atomic PUT; the
      table layer cannot tell the difference, which is the point.
    - ``create_json`` is an O_EXCL conditional create (If-None-Match
      semantics) — a DIFFERENT mechanism from LocalFileIO's hard link,
      proving the commit protocol doesn't depend on link().
    - ``ops`` counts every primitive; the FileIO API exposes no rename,
      so a passing suite certifies the table layer needs none.

    Emulation caveat: between the O_EXCL create and the content write
    there is a visible-empty window a real store's content-atomic
    conditional PUT does not have — irrelevant single-process, and the
    cross-process commit hammer (tests/test_commit_hammer.py) runs on
    LocalFileIO, whose link-based claim has no such window.
    """

    #: every operation here maps 1:1 onto a real object-store call —
    #: the discipline a passing suite certifies. rename appears nowhere
    #: because the FileIO API does not expose one.
    STORE_PRIMITIVES = {
        "get",            # GET object
        "put",            # atomic whole-object PUT
        "create",         # conditional create (If-None-Match: *)
        "list",           # LIST prefix (one level)
        "walk",           # LIST prefix (recursive)
        "exists",         # HEAD object
        "mtime",          # HEAD object (Last-Modified)
        "size",           # HEAD object (Content-Length)
        "delete",         # DELETE object
        "delete_prefix",  # batched DELETE under a prefix
        "ensure_prefix",  # no-op (prefixes aren't objects)
        "delete_empty_prefix",  # no-op (prefixes aren't objects)
    }

    def __init__(self, staging_dir: str | None = None):
        import tempfile

        self.staging = staging_dir or tempfile.mkdtemp(prefix="olake_fakeremote_")
        os.makedirs(self.staging, exist_ok=True)
        self.ops: dict[str, int] = {}

    def _count(self, op: str) -> None:
        self.ops[op] = self.ops.get(op, 0) + 1

    def _stage(self, data: bytes) -> str:
        up = os.path.join(self.staging, f"upload-{uuid.uuid4().hex}")
        with open(up, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        return up

    def get_text(self, path: str) -> str:
        self._count("get")
        return super().get_text(path)

    def put_text(self, path: str, text: str) -> None:
        self._count("put")
        up = self._stage(text.encode())
        # single-object atomic publish (emulated PUT); the staged upload
        # is complete and fsynced before the store namespace changes
        os.replace(up, path)

    def create_json(self, path: str, obj: Any) -> None:
        self._count("create")
        data = json.dumps(obj, separators=(",", ":")).encode()
        up = self._stage(data)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            os.unlink(up)
            raise
        try:
            with os.fdopen(fd, "wb") as f:
                with open(up, "rb") as src:
                    f.write(src.read())
                f.flush()
                os.fsync(f.fileno())
        finally:
            os.unlink(up)

    def list(self, path: str) -> list[str]:
        self._count("list")
        return super().list(path)

    def walk(self, path: str):
        self._count("walk")
        return super().walk(path)

    def exists(self, path: str) -> bool:
        self._count("exists")
        return super().exists(path)

    def mtime_ms(self, path: str) -> float:
        self._count("mtime")
        return super().mtime_ms(path)

    def size(self, path: str) -> int:
        self._count("size")
        return super().size(path)

    def ensure_prefix(self, path: str) -> None:
        self._count("ensure_prefix")
        super().ensure_prefix(path)

    def delete(self, path: str) -> None:
        self._count("delete")
        super().delete(path)

    def delete_prefix(self, path: str) -> None:
        self._count("delete_prefix")
        super().delete_prefix(path)

    def delete_empty_prefix(self, path: str) -> None:
        self._count("delete_empty_prefix")
        super().delete_empty_prefix(path)
