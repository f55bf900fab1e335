"""Streaming layer: webhook sink, pipeline control plane, windowed ops."""

from __future__ import annotations


def await_or_fail(query, timeout_s: int = 300) -> None:
    """Block on a bounded streaming run; on timeout, stop the query and
    raise (never read a partial sink or delete a workdir under a live
    query). The shared form of the guard every streaming-executed
    registered query needs."""
    if not query.awaitTermination(timeout_s):
        try:
            query.stop()
        finally:
            raise TimeoutError(f"streaming pass exceeded {timeout_s}s")
