"""Permanent-vs-transient error classification (X2).

Reference parity: internal/iceberg/errors.go:43-115 — substring matching
on the error text; auth/permission/validation/duplicate errors are
permanent (log + swallow / dead-letter), everything else is transient
(propagate so the streaming engine retries the micro-batch).

In the Spark engine: transient => re-raise inside foreachBatch so
Structured Streaming retries from the checkpoint; permanent => log and
route the batch to the dead-letter location (at-least-once preserved,
poison batches don't wedge the stream).
"""

from __future__ import annotations

PERMANENT = "permanent"
TRANSIENT = "transient"

# errors.go:43-115 taxonomy, lower-cased substrings
_PERMANENT_MARKERS = (
    # authentication / authorization
    "access denied",
    "accessdenied",
    "unauthorized",
    "forbidden",
    "invalid credentials",
    "authentication failed",
    "signaturedoesnotmatch",
    "invalidaccesskeyid",
    # validation / schema
    "validation",
    "invalid schema",
    "schema mismatch",
    "invalid argument",
    "malformed",
    "bad request",
    # duplicates / conflicts that retrying cannot fix
    "already exists",
    "duplicate",
    # misconfiguration
    "no such bucket",
    "nosuchbucket",
    "not found: namespace",
    "table not found",
)

_TRANSIENT_MARKERS = (
    # explicitly transient even though they may contain permanent-looking
    # words (checked first)
    "timeout",
    "timed out",
    "connection reset",
    "connection refused",
    "too many requests",
    "slow down",
    "service unavailable",
    "internal server error",
    "commit failed: concurrent",
    "commitfailedexception",
)


def classify_error(err: BaseException | str) -> str:
    """Classify an error as PERMANENT or TRANSIENT by its text.

    Transient markers win over permanent ones (a timeout during an auth
    call is still retryable); unknown errors default to TRANSIENT so the
    collector/stream retries — the reference's posture (errors.go:43:
    "unknown errors are assumed transient").
    """
    text = str(err).lower()
    if any(m in text for m in _TRANSIENT_MARKERS):
        return TRANSIENT
    if any(m in text for m in _PERMANENT_MARKERS):
        return PERMANENT
    return TRANSIENT


def is_cross_partition_error(err: BaseException | str) -> bool:
    """X4 detector: the iceberg 'file spans multiple partitions' failure
    that triggers repartitioning in recovery (repartitioner.go:18-20)."""
    return "more than one value for partition field" in str(err).lower()
