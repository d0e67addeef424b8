"""Shared helpers for the format drivers."""

from __future__ import annotations


def local_path(path: str) -> str:
    """Strip a file:// URI scheme down to a plain filesystem path,
    handling the file:///abs, file://abs (legacy), and file:/abs forms."""
    if path.startswith("file://"):
        rest = path[7:]
        # file:///abs -> ///abs stripped to /abs; file://abs kept as-is
        return rest if rest.startswith("/") or not rest else rest
    if path.startswith("file:/"):
        return path[5:]
    return path
