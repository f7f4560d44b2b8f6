"""Storage targets and input caching.

Parity layer for reference ``pangeo_forge_recipes/storage.py:74-228``:
``FSSpecTarget`` becomes a thin path-rooted target over the engine's
:class:`~.zarrio.Store` interface (local paths today; an object-store Store
slots in identically on a cluster — keys are relative paths either way).
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import unicodedata
from dataclasses import dataclass, field, replace
from urllib.parse import urlparse

from .zarrio import LocalStore, Store


def _slugify(value: str) -> str:
    """Filesystem-safe slug of a url (reference ``storage.py:212-219``)."""
    value = str(value)
    value = unicodedata.normalize("NFKD", value).encode("ascii", "ignore").decode("ascii")
    value = re.sub(r"[^.\w\s-]+", "_", value.lower())
    return re.sub(r"[-\s]+", "-", value).strip("-_")


def _hash_path(path: str) -> str:
    """md5 slug for flat cache filenames (reference ``storage.py:74-75``)."""
    return hashlib.md5(path.encode()).hexdigest()


def _add_query_string_secrets(fname: str, secrets: dict) -> str:
    """Append secret query-string params at open time (reference
    ``storage.py:222-228``)."""
    parsed = urlparse(fname)
    query = parsed.query
    for k, v in secrets.items():
        piece = f"{k}={v}"
        query = f"{query}&{piece}" if query else piece
    return parsed._replace(query=query).geturl()


@dataclass
class FSSpecTarget:
    """A storage root + optional subpath (reference ``storage.py:78-164``).

    In this engine a target is always addressed by a root path string; the
    ``get_mapper``-style accessor returns a :class:`Store` for zarr IO.
    """

    root_path: str
    fsspec_kwargs: dict = field(default_factory=dict)

    @classmethod
    def from_url(cls, url: str) -> "FSSpecTarget":
        return cls(root_path=url)

    def __truediv__(self, suffix: str) -> "FSSpecTarget":
        return replace(self, root_path=os.path.join(self.root_path, suffix))

    def _full_path(self, path: str) -> str:
        return os.path.join(self.root_path, path)

    def get_mapper(self) -> Store:
        return LocalStore(self.root_path)

    def exists(self, path: str) -> bool:
        return os.path.exists(self._full_path(path))

    def rm(self, path: str, recursive: bool = False) -> None:
        full = self._full_path(path)
        if recursive and os.path.isdir(full):
            shutil.rmtree(full)
        elif os.path.exists(full):
            os.remove(full)

    def makedir(self, path: str) -> None:
        os.makedirs(self._full_path(path), exist_ok=True)

    def size(self, path: str) -> int:
        return os.path.getsize(self._full_path(path))

    def open(self, path: str, **kwargs):
        full = self._full_path(path)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        return open(full, **kwargs)

    def get_fsspec_remote_protocol(self) -> str:
        return "file"


class FlatFSSpecTarget(FSSpecTarget):
    """Target that stores every file at the root under an md5-slug name
    (reference ``storage.py:167-184``)."""

    def _full_path(self, path: str) -> str:
        prefix = _hash_path(str(path))
        slug = _slugify(str(path))
        new_path = "-".join([prefix, slug])
        return os.path.join(self.root_path, new_path)


class CacheFSSpecTarget(FlatFSSpecTarget):
    """Input byte cache with size-equality skip — idempotent re-runs
    (reference ``storage.py:187-209``)."""

    def cache_file(self, fname: str, secrets: dict | None, **open_kwargs) -> None:
        if self.exists(fname):
            cached_size = self.size(fname)
            remote_size = _remote_size(fname, secrets, **open_kwargs)
            if cached_size == remote_size:
                # cache hit — skip download (reference storage.py:198-205)
                return
        copy_to_target(fname, self, secrets, **open_kwargs)

    def cache_path(self, fname: str) -> str:
        return self._full_path(fname)


def _open_url_raw(fname: str, secrets: dict | None, **open_kwargs):
    """Open a source url for reading bytes. Local paths and file:// today;
    an fsspec-style adapter would slot in here for http/s3 on a cluster
    (reference ``openers.py:16-37``)."""
    if secrets:
        fname = _add_query_string_secrets(fname, secrets)
    parsed = urlparse(fname)
    if parsed.scheme in ("", "file"):
        return open(parsed.path or fname, "rb")
    raise NotImplementedError(
        f"url scheme {parsed.scheme!r} requires fsspec, which is not available "
        "in this environment; supported schemes: file://, plain paths"
    )


def _remote_size(fname: str, secrets: dict | None, **open_kwargs) -> int:
    parsed = urlparse(fname)
    if parsed.scheme in ("", "file"):
        return os.path.getsize(parsed.path or fname)
    raise NotImplementedError(f"size of {parsed.scheme!r} urls not supported")


def copy_to_target(
    fname: str, target: FlatFSSpecTarget, secrets: dict | None = None, **open_kwargs
) -> None:
    """Stream source bytes to the cache target in blocks (reference
    ``storage.py:20-71``)."""
    with _open_url_raw(fname, secrets, **open_kwargs) as src:
        with target.open(fname, mode="wb") as dst:
            shutil.copyfileobj(src, dst, length=16 * 1024 * 1024)
