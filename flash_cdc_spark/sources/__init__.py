"""Changelog sources + replay-mode resolution."""

from flash_cdc_spark.sources.changelog import (
    ReplayArgs,
    ReplayStart,
    read_changelog_stream,
    resolve_replay,
)

__all__ = ["ReplayArgs", "ReplayStart", "read_changelog_stream", "resolve_replay"]
