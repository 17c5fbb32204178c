"""Resumable output layout: per-partition atomic commit + lineage records.

The reference's sinks are actively resume-unsafe (append-mode CSV opened per
row, eeg_datasets.py:98-102 — a re-run duplicates rows; SURVEY.md §4). This
module implements the layout the north rule requires instead:

    out_dir/
      part={pid}/part-*.parquet     (data, renamed into place atomically)
      _lineage/part-{pid}.json      (row counts, keep counts, per-lang stats,
                                     content hash; written via tmp+rename)

A partition is committed iff its lineage record exists; ``pending()`` filters
committed partitions out of the input plan, so a killed run resumes from the
last committed partition with no duplicated rows (tested in
tests/test_checkpoint.py).

At 100 TB scale a partition is a contiguous slice of input fragments
(hundreds of files); partitions commit independently, so failure granularity
is bounded by partition size, while blocks inside one partition stream with
full parallelism.
"""

from __future__ import annotations

import json
import os
import shutil


def partition_plan(files: list[str], n_partitions: int) -> dict[str, list[str]]:
    """Deterministic contiguous assignment of sorted input files → partitions.

    Partition ids are zero-padded so lexical order == numeric order (stable
    across listings; the reference's os.listdir-order dependence, SURVEY.md
    §2.8, is deliberately designed out).
    """
    files = sorted(files)
    n_partitions = max(1, min(n_partitions, len(files)))
    plan: dict[str, list[str]] = {}
    per = (len(files) + n_partitions - 1) // n_partitions
    for p in range(n_partitions):
        chunk = files[p * per : (p + 1) * per]
        if chunk:
            plan[f"{p:05d}"] = chunk
    return plan


def lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def lineage_path(out_dir: str, pid: str) -> str:
    return os.path.join(lineage_dir(out_dir), f"part-{pid}.json")


def data_dir(out_dir: str, pid: str) -> str:
    return os.path.join(out_dir, f"part={pid}")


def committed(out_dir: str) -> set[str]:
    d = lineage_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("part-") and name.endswith(".json"):
            out.add(name[len("part-") : -len(".json")])
    return out


def pending(plan: dict[str, list[str]], out_dir: str) -> dict[str, list[str]]:
    """Reconcile committed state against the CURRENT plan; return what's left.

    A committed partition counts only if its lineage record covers EXACTLY
    the files the current plan assigns to that id — a rerun with a different
    ``n_partitions`` (or a changed input listing) re-keys the plan, and
    trusting the bare partition id would silently skip unprocessed files.
    Mismatched partitions are recomputed, and committed partitions whose id
    no longer EXISTS in the plan are stale leftovers of the old plan: their
    data + lineage are removed (otherwise their rows would double-count
    next to the re-keyed output).
    """
    done = committed(out_dir)
    out: dict[str, list[str]] = {}
    for pid, files in plan.items():
        if pid in done:
            with open(lineage_path(out_dir, pid)) as f:
                rec = json.load(f)
            if rec.get("files") == [os.path.basename(p) for p in files]:
                continue  # genuinely committed under this plan
        out[pid] = files
    for pid in done - set(plan):
        d = data_dir(out_dir, pid)
        if os.path.exists(d):
            shutil.rmtree(d)
        os.remove(lineage_path(out_dir, pid))
    return out


def commit(out_dir: str, pid: str, tmp_data_dir: str, lineage: dict) -> None:
    """Atomically promote a partition: rename data dir, then lineage record.

    The lineage record is written LAST — its existence is the commit point.
    If the process dies between the two steps, the orphan data dir is
    overwritten by the rerun (rename over fresh tmp), never double-counted.
    """
    final = data_dir(out_dir, pid)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp_data_dir, final)
    os.makedirs(lineage_dir(out_dir), exist_ok=True)
    tmp = lineage_path(out_dir, pid) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(lineage, f, sort_keys=True)
    os.replace(tmp, lineage_path(out_dir, pid))


def read_lineage(out_dir: str) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for pid in sorted(committed(out_dir)):
        with open(lineage_path(out_dir, pid)) as f:
            out[pid] = json.load(f)
    return out
