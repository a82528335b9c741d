"""Shared committed-view pointer resolution for the composed
incremental view stores (join view, star view — and any future view
kind that commits ``view/`` snapshots behind a ``_current`` pointer).

Layout contract (identical in join_view.py and star_view.py, hoisted
here before a third copy appears):

- ``<path>/view/_current`` — tiny pointer file ``"<vname>:<epoch>"``,
  atomically replaced at commit time; the SINGLE visibility point.
- ``<path>/view/_manifest.h-<vname>`` — the named bucket-manifest
  snapshot (bucket -> rel dir) the pointer refers to.

Readers race the writer: between the pointer swap and manifest
vacuum/retention, a pointer can momentarily name a manifest that a
concurrent compaction just rotated.  ``resolve_view_entries`` retries
with backoff (pointer re-read each attempt — the writer only ever
moves FORWARD, so a retry converges) and raises only when the named
snapshot genuinely no longer exists (vacuumed below retention).

Reference parity: the reference keeps no materialized views (its
relay forwards events — producing/change_event_handler.py:34-77);
this is engine extension surface (SURVEY.md §2.D), crash-safety
modeled on the epoch/pointer pattern of stream-store literature.
"""

from __future__ import annotations

import os
import time

from pymongo_change_stream_reader_spark.plans.pipeline import (
    PipelineError,
    _read_bucket_manifest,
)

__all__ = ["view_pointer_current", "resolve_view_entries"]


def view_pointer_current(path: str) -> tuple[str, int] | None:
    """(snapshot name, applied epoch) from ``<path>/view/_current``;
    None before the first commit."""
    ptr = os.path.join(path, "view", "_current")
    if not os.path.exists(ptr):
        return None
    vname, epoch = open(ptr).read().strip().rsplit(":", 1)
    return vname, int(epoch)


def resolve_view_entries(
    path: str, label: str = "view"
) -> tuple[dict, int] | None:
    """Committed view state via the ``_current`` pointer (bucket ->
    rel dir, applied epoch); None before the first commit.  ``label``
    names the view kind in the vacuumed-snapshot error."""
    vroot = os.path.join(path, "view")
    vname = None
    for attempt in range(10):
        cur = view_pointer_current(path)
        if cur is None:
            return None
        vname, ep = cur
        mf = _read_bucket_manifest(vroot, f"_manifest.h-{vname}")
        if mf is not None:
            return mf[1], ep
        time.sleep(0.05 * (attempt + 1))
    raise PipelineError(
        f"{label} at {path!r}: pointer names snapshot {vname!r} but "
        "no such manifest snapshot exists — vacuumed below retention"
    )
