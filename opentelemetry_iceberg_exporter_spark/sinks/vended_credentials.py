"""Vended storage credentials (Iceberg REST spec: `storage-credentials`
in LoadTableResult / LoadCredentialsResponse, plus per-table `config`
overrides).

A policy-enforcing REST catalog doesn't hand engines long-lived storage
keys: LoadTableResult carries short-lived, path-scoped credentials —
`storage-credentials: [{prefix, config}]` — and a `config` map of
table-specific client overrides. The engine's contract:

* pick the credential whose `prefix` is the LONGEST match for the path
  being accessed (the spec allows multiple vends per table — e.g. one
  for the table location, a broader read-only one for shared data);
* treat them as EXPIRING: credential configs carry an
  `*-expires-at-ms` key (`s3.session-token-expires-at-ms`,
  `gcs.oauth2.token-expires-at-ms`, `adls.sas-token-expires-at-ms`);
  at/after that instant the credential must be re-fetched, never
  reused;
* refresh via the spec's dedicated `GET .../credentials` endpoint
  (LoadCredentialsResponse) when the server implements it, else by
  re-loading the table (LoadTableResult vends too);
* apply as SCOPED filesystem config — per-bucket s3a keys
  (`fs.s3a.bucket.<bucket>.access.key` etc., the Hadoop-documented
  per-bucket override form), so two tables with different vends never
  clobber each other's session state. `file://`/bare local paths need
  no credentials and produce no config.

This module is the pure half (parse / select / expiry / conf mapping);
RestTable owns the fetch-and-refresh lifecycle. Reference parity: the
reference delegates credential handling to iceberg-go's REST client
(catalog_rest.go loadTable); this is the same spec surface expressed
for Spark.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from urllib.parse import urlparse

# credential-config keys that declare expiry, per the public client
# implementations of the spec (pyiceberg / iceberg-java FileIO props)
_EXPIRY_KEYS = (
    "s3.session-token-expires-at-ms",
    "gcs.oauth2.token-expires-at-ms",
    "adls.sas-token-expires-at-ms",
    "expires-at-ms",
)

# s3 credential keys -> Hadoop s3a per-bucket suffixes
_S3_TO_S3A = {
    "s3.access-key-id": "access.key",
    "s3.secret-access-key": "secret.key",
    "s3.session-token": "session.token",
    "s3.endpoint": "endpoint",
}


@dataclass(frozen=True)
class StorageCredential:
    """One spec StorageCredential: config scoped to a path prefix."""

    prefix: str
    config: dict[str, str] = field(default_factory=dict)

    def expires_at_ms(self) -> int | None:
        for key in _EXPIRY_KEYS:
            v = self.config.get(key)
            if v is not None:
                try:
                    return int(v)
                except ValueError:
                    return 0  # unparseable expiry: treat as expired
        return None

    def expired(self, now_ms: int | None = None) -> bool:
        exp = self.expires_at_ms()
        if exp is None:
            return False  # no declared expiry: non-expiring vend
        now = int(time.time() * 1000) if now_ms is None else now_ms
        return now >= exp


def parse_storage_credentials(result: dict) -> list[StorageCredential]:
    """The `storage-credentials` list of a LoadTableResult or
    LoadCredentialsResponse (absent/empty -> []); entries missing the
    required `prefix` are rejected (a prefixless credential would match
    every path — refuse rather than over-scope)."""
    out: list[StorageCredential] = []
    for entry in result.get("storage-credentials") or []:
        prefix = entry.get("prefix")
        if not prefix:
            raise ValueError(
                "storage-credentials entry without a prefix — the spec "
                "requires one; refusing a credential that would match "
                "every path"
            )
        out.append(StorageCredential(prefix, dict(entry.get("config") or {})))
    return out


def credential_for_path(
    creds: list[StorageCredential], path: str
) -> StorageCredential | None:
    """Longest-prefix-match selection (the spec's scoping rule); None
    when no vend covers the path (local fs, or server chose not to
    vend)."""
    best: StorageCredential | None = None
    for c in creds:
        if path.startswith(c.prefix) and (
            best is None or len(c.prefix) > len(best.prefix)
        ):
            best = c
    return best


def scoped_hadoop_conf(cred: StorageCredential) -> dict[str, str]:
    """Map a vended credential to Hadoop conf entries SCOPED to its
    storage container, so applying table A's vend never leaks into
    table B's reads:

    * s3/s3a prefixes -> the documented per-bucket override form
      `fs.s3a.bucket.<bucket>.<suffix>`;
    * gcs oauth token -> `fs.gs.auth.access.token.*` (GCS connector has
      no per-bucket form; the token itself is path-agnostic);
    * file/empty scheme -> {} (local fs needs nothing).

    Unknown config keys are passed through under
    `fs.<scheme>.bucket.<bucket>.` only for s3 (where the form exists);
    otherwise dropped — silently widening scope is worse than asking
    the user to configure a custom FileIO."""
    u = urlparse(cred.prefix)
    scheme = (u.scheme or "file").lower()
    if scheme in ("file", ""):
        return {}
    out: dict[str, str] = {}
    if scheme in ("s3", "s3a", "s3n"):
        bucket = u.netloc
        for k, v in cred.config.items():
            suffix = _S3_TO_S3A.get(k)
            if suffix:
                out[f"fs.s3a.bucket.{bucket}.{suffix}"] = v
        return out
    if scheme == "gs":
        tok = cred.config.get("gcs.oauth2.token")
        if tok:
            out["fs.gs.auth.type"] = "ACCESS_TOKEN_PROVIDER"
            out["fs.gs.auth.access.token"] = tok
        return out
    return out


class VendedCredentialSet:
    """The per-table credential state RestTable keeps: the latest vend,
    its table-config overrides, and the refresh bookkeeping."""

    def __init__(
        self,
        creds: list[StorageCredential],
        table_config: dict[str, str] | None = None,
    ):
        self.creds = creds
        self.table_config = dict(table_config or {})

    @classmethod
    def from_load_result(cls, result: dict) -> "VendedCredentialSet":
        return cls(
            parse_storage_credentials(result),
            result.get("config") or {},
        )

    def needs_refresh(self, path: str, now_ms: int | None = None) -> bool:
        """True when the credential that would serve `path` has
        expired. No-credential paths never need a refresh."""
        c = credential_for_path(self.creds, path)
        return c is not None and c.expired(now_ms)

    def conf_for_path(self, path: str) -> dict[str, str]:
        c = credential_for_path(self.creds, path)
        return scoped_hadoop_conf(c) if c else {}

    def any_expired(self, now_ms: int | None = None) -> bool:
        """True when ANY vend in the set has expired — the multi-vend
        refresh trigger (a table's write.data.path or shared-data
        prefix may expire before the table-location vend does)."""
        return any(c.expired(now_ms) for c in self.creds)

    def conf_for_all(self, now_ms: int | None = None) -> dict[str, str]:
        """Merged container-scoped conf for EVERY unexpired vend.
        Multi-vend tables (e.g. write.data.path or shared data under a
        second vended prefix) need all their buckets' credentials
        applied, not just the one covering the table location —
        per-bucket scoping makes the merge clobber-free across
        buckets, and ascending-prefix-length ordering keeps the spec's
        longest-prefix precedence when two vends scope the SAME
        bucket. Expired vends are skipped (callers refresh first).

        Caveat: GCS conf is GLOBAL (`fs.gs.auth.access.token` has no
        per-bucket form), so with two gs vends the longest prefix wins
        regardless of which path is being accessed — callers must
        overlay `conf_for_path(target)` LAST so the vend covering the
        actual target prevails (apply_storage_credentials does)."""
        out: dict[str, str] = {}
        for c in sorted(self.creds, key=lambda c: (len(c.prefix), c.prefix)):
            if not c.expired(now_ms):
                out.update(scoped_hadoop_conf(c))
        return out
