"""Small shared helpers."""

from __future__ import annotations


def bucket(n: int, minimum: int = 64) -> int:
    """Round up to the next power of two >= minimum (recompile-bounded
    padding for jit-static shapes)."""
    b = minimum
    while b < n:
        b *= 2
    return b
