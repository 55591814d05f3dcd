"""Corpus+version-keyed parquet caches for derived Dataset streams.

A pipeline family that composes on an expensive upstream (the flagship
extraction, the host quotient edge stream) runs it ONCE per
``(sf_dir, corpus version, engine version)`` and re-reads the parquet —
the second query in a bench sequence costs a pruned read, not a full
re-extraction.

Commit protocol (the manifest pattern, state/manifest.py): write into a
process-unique temp dir, then ONE atomic ``os.rename`` to the final
path.  A cache dir either exists complete or not at all; two concurrent
processes cannot interleave writes — the losing rename discards its tmp
and reads the winner's complete cache.  The tag hashes the ABSOLUTE
sf_dir (two corpora sharing a leaf name must not share an entry) and
carries corpus AND engine versions: caches store derived OUTPUT, which
changes when the kernel changes, not just when the corpus does.

At 100 TB the same protocol targets a distributed-filesystem prefix
instead of /tmp; the atomic-rename commit is the piece that makes a
crashed builder harmless (ADVICE r4: a non-atomic cache re-write
duplicates rows forever).
"""

from __future__ import annotations

import errno
import hashlib
import os
import shutil
from typing import Callable

import ray.data as rd

__all__ = ["cached_parquet", "cache_tag"]

_CACHE_ROOT = "/tmp/graft_dscache"


def cache_tag(sf_dir: str, name: str, *extra: object) -> str:
    """Cache key: leaf name + abs-path hash + corpus/engine versions."""
    from .. import __version__ as ENGINE_VERSION
    from ..corpus.synth import CORPUS_VERSION

    abs_sf = os.path.abspath(sf_dir).rstrip("/")
    dir_hash = hashlib.sha1(abs_sf.encode()).hexdigest()[:12]
    parts = "_".join(str(x) for x in extra)
    tag = f"{name}_{os.path.basename(abs_sf)}_{dir_hash}_v{CORPUS_VERSION}_e{ENGINE_VERSION}"
    return f"{tag}_{parts}" if parts else tag


def cached_parquet(
    tag: str,
    build: Callable[[], rd.Dataset],
    root: str = _CACHE_ROOT,
) -> str:
    """Path of the committed parquet dir for ``tag``, building it (once,
    atomically) via ``build()`` if absent.  Returns the path; callers
    ``rd.read_parquet`` it with whatever column pruning they need."""
    path = os.path.join(root, tag)
    if not os.path.exists(path):
        os.makedirs(root, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        build().write_parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError as exc:
            # another process committed first — its cache is complete
            if exc.errno not in (errno.ENOTEMPTY, errno.EEXIST):
                raise
            shutil.rmtree(tmp, ignore_errors=True)
    return path
