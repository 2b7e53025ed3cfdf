"""Scalar function helpers (JVM-side Catalyst expressions only)."""

from .formatting import format_session_result  # noqa: F401
