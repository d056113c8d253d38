"""Shared lifecycle helper for persisted-index builders.

Every ``build_*`` (dedup fingerprints, MinHash store, LSH/IVF/refined-IVF,
PQ, IVF-PQ, BM25 text index, quality model) writes its artifact tables
first and a ``params`` table LAST — ``_index_ready`` treats the params
``_SUCCESS`` marker as "build complete".  That contract only protects the
FIRST build: a rebuild into an already-complete path overwrites the
artifact tables while the PRIOR params/_SUCCESS is still on disk, so a
crash mid-rebuild leaves ``_index_ready`` true over a mix of new and
stale artifacts, and they get served silently.

``begin_build(path)`` closes that window: called at the top of every
builder, it deletes the params directory so the marker is ABSENT from the
first artifact overwrite until the new params land.  A crash anywhere in
the rebuild now reads as "not ready" and the serve path raises instead of
serving a torn index.
"""

from __future__ import annotations

import os
import shutil

__all__ = ["begin_build"]


def begin_build(path: str) -> None:
    """Invalidate a possibly-complete index at ``path`` before rebuilding.

    Removes ``{path}/params`` (the completeness marker directory) if
    present; a no-op for first builds.  Must be the first filesystem
    action of every ``build_*`` so ``_index_ready(path)`` is false for
    the whole rebuild window.
    """
    shutil.rmtree(os.path.join(path, "params"), ignore_errors=True)
