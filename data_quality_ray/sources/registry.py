"""Format registry: read/write a logical table from/to any supported format.

``read_table(path, fmt=None, ...)`` infers the format from the path when not
given. Lance support is gated behind an import-try: this container does not
ship ``lance``/``pylance``, so the Lance branch raises a clear error locally
while remaining the first-class path on installations that have it (the
north rule names Lance tables as the input; parquet is the functional
stand-in with the identical Arrow schema).
"""

from __future__ import annotations

import os

import ray.data as rd

try:  # pragma: no cover - not installed in this sandbox
    import lance  # type: ignore

    _HAVE_LANCE = True
except ImportError:
    _HAVE_LANCE = False

SUPPORTED_FORMATS = ("parquet", "lance", "csv", "json")


def _infer_fmt(path: str) -> str:
    base = path.rstrip("/")
    if base.endswith(".lance"):
        return "lance"
    for fmt in ("parquet", "csv", "json"):
        if base.endswith(f".{fmt}"):
            return fmt
    return "parquet"


def read_table(
    path: str | list[str],
    fmt: str | None = None,
    *,
    columns: list[str] | None = None,
    **kwargs,
) -> "rd.Dataset":
    """Read a logical table as a Ray Dataset with column pruning."""
    first = path[0] if isinstance(path, list) else path
    fmt = fmt or _infer_fmt(first)
    if fmt == "parquet":
        return rd.read_parquet(path, columns=columns, **kwargs)
    if fmt == "lance":
        if not _HAVE_LANCE:
            raise NotImplementedError(
                "lance is not installed in this environment; the clip tables "
                "are materialized as parquet with the identical Arrow schema"
            )
        return rd.read_lance(first, columns=columns, **kwargs)
    if fmt == "csv":
        ds = rd.read_csv(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    if fmt == "json":
        ds = rd.read_json(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    raise ValueError(f"unknown format {fmt!r}; supported: {SUPPORTED_FORMATS}")


def write_table(ds: "rd.Dataset", path: str, fmt: str | None = None, **kwargs) -> None:
    """Write a Dataset as a directory of files in the given format."""
    fmt = fmt or _infer_fmt(path)
    if fmt == "parquet":
        ds.write_parquet(path, **kwargs)
    elif fmt == "csv":
        ds.write_csv(path, **kwargs)
    elif fmt == "json":
        ds.write_json(path, **kwargs)
    elif fmt == "lance":
        if not _HAVE_LANCE:
            raise NotImplementedError("lance is not installed in this environment")
        ds.write_lance(path, **kwargs)
    else:
        raise ValueError(f"unknown format {fmt!r}; supported: {SUPPORTED_FORMATS}")


def make_dir(path: str) -> str:
    """mkdir-if-absent (K5 role, eeg_datasets.py:24-26) — returns the path."""
    os.makedirs(path, exist_ok=True)
    return path
