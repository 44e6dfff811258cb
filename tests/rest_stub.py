"""In-process Iceberg REST catalog stub server for exercising the
pure-Python REST client (sinks/iceberg_rest.py) without network or jars.

Implements the slice of the public Iceberg REST Catalog OpenAPI the
client speaks: /v1/config (with a non-empty prefix so prefix handling is
exercised), namespace CRUD, table create/load, and CommitTable with
requirement validation — `assert-ref-snapshot-id` mismatches return 409
CommitFailedException exactly like a real catalog, which is what drives
the client's optimistic retry loop. Metadata is authoritative in memory
(guarded by one lock = the server-side atomic commit) and each committed
version is also written to disk under the table location, so
metadata-location behaves like a real warehouse-backed catalog.

Test hooks: `inject(status, type, message, times)` fails the next N
requests (error-classification and retry tests); `token=` enforces
Bearer auth (401 NotAuthorizedException otherwise).
"""

from __future__ import annotations

import json
import os
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

PREFIX = "catalogs/demo"  # non-trivial prefix: clients must honor it


class StubCatalogState:
    def __init__(self, warehouse: str, token: str = ""):
        self.warehouse = warehouse.rstrip("/")
        self.token = token
        self.lock = threading.Lock()
        self.namespaces: dict[str, dict] = {}
        self.tables: dict[tuple[str, str], dict] = {}  # (ns, name) -> metadata
        self.versions: dict[tuple[str, str], int] = {}
        self.injected: list[tuple[int, str, str, str | None, str | None]] = []
        self.requests: list[tuple[str, str]] = []  # (method, path) log
        # commit-ambiguity fault: the next N commit requests are APPLIED
        # (state advances, metadata persisted) but the response is a 503
        # — the "server committed, response lost" case clients must
        # resolve without double-committing
        self.lose_commit_responses: int = 0
        # byzantine fault: the next N matching requests get a 200 with a
        # TRUNCATED JSON body instead of being processed (method/path_re
        # filters like inject); for commits, garbage_commit_responses
        # applies the commit first, then garbles the response
        self.garbage: list[tuple[str | None, str | None]] = []
        self.garbage_commit_responses: int = 0
        # deferred-commit fault: the next N TRANSACTION commits are
        # validated and STAGED but not applied, answered 503; the
        # staged changes apply only after `deferred_countdown` further
        # table-load GETs have been served — modeling a server that
        # finishes processing a timed-out request AFTER the client's
        # landed-check reloads ran (the double-append window)
        self.defer_commit_responses: int = 0
        self.staged_deferred: list[list[tuple[tuple[str, str], dict]]] = []
        self.deferred_countdown: int = 0
        # extra table-load GETs to serve BEFORE applying the deferred
        # transaction (beyond the landed-check's one-per-table): lets a
        # test land the application BETWEEN the retry's sequential
        # loop-top reloads — the mixed-view race
        self.deferred_extra_loads: int = 0

    def inject_garbage(
        self, times: int = 1, method: str | None = None, path_re: str | None = None
    ) -> None:
        self.garbage.extend([(method, path_re)] * times)

    def inject(
        self,
        status: int,
        error_type: str,
        message: str,
        times: int = 1,
        method: str | None = None,
        path_re: str | None = None,
    ) -> None:
        """Fail the next `times` requests; with method/path_re set, only
        matching requests consume an injection (others pass through)."""
        self.injected.extend([(status, error_type, message, method, path_re)] * times)


class _Handler(BaseHTTPRequestHandler):
    state: StubCatalogState  # set by make_server

    # -- plumbing ----------------------------------------------------------
    def log_message(self, *args):  # silence request logging
        pass

    def _send(self, status: int, body: dict | None = None) -> None:
        data = json.dumps(body or {}).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _error(self, status: int, error_type: str, message: str) -> None:
        self._send(status, {"error": {"message": message, "type": error_type, "code": status}})

    def _body(self) -> dict:
        length = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(length)) if length else {}

    def _send_garbage(self) -> None:
        """A 200 whose body is truncated JSON (proxy corruption /
        mid-write crash)."""
        data = b'{"metadata": {"trunca'
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _guard(self) -> bool:
        """Auth + injected-failure gate. Returns True if handled."""
        st = self.state
        st.requests.append((self.command, self.path))
        if st.garbage:
            method, path_re = st.garbage[0]
            if (method is None or method == self.command) and (
                path_re is None or re.search(path_re, self.path)
            ):
                st.garbage.pop(0)
                self._send_garbage()
                return True
        if st.injected:
            status, etype, msg, method, path_re = st.injected[0]
            matches = (method is None or method == self.command) and (
                path_re is None or re.search(path_re, self.path)
            )
            if matches:
                st.injected.pop(0)
                self._error(status, etype, msg)
                return True
        if st.token:
            auth = self.headers.get("Authorization", "")
            if auth != f"Bearer {st.token}":
                self._error(401, "NotAuthorizedException", "unauthorized: missing or bad token")
                return True
        return False

    # -- routing -----------------------------------------------------------
    def do_GET(self):  # noqa: N802 (http.server API)
        if self._guard():
            return
        parsed = urlparse(self.path)
        path = parsed.path
        if path == "/v1/config":
            q = parse_qs(parsed.query)
            wh = q.get("warehouse", [self.state.warehouse])[0]
            self._send(
                200,
                {"defaults": {"warehouse": wh}, "overrides": {"prefix": PREFIX}},
            )
            return
        m = re.fullmatch(f"/v1/{PREFIX}/namespaces", path)
        if m:
            self._send(200, {"namespaces": [[ns] for ns in sorted(self.state.namespaces)]})
            return
        m = re.fullmatch(f"/v1/{PREFIX}/namespaces/([^/]+)", path)
        if m:
            ns = m.group(1)
            if ns not in self.state.namespaces:
                self._error(404, "NoSuchNamespaceException", f"Namespace does not exist: {ns}")
                return
            self._send(200, {"namespace": [ns], "properties": self.state.namespaces[ns]})
            return
        m = re.fullmatch(f"/v1/{PREFIX}/namespaces/([^/]+)/tables/([^/]+)", path)
        if m:
            key = (m.group(1), m.group(2))
            md = self.state.tables.get(key)
            if md is None:
                self._error(
                    404, "NoSuchTableException", f"Table does not exist: {key[0]}.{key[1]}"
                )
                return
            # a deferred transaction lands AFTER the landed-check loads
            # were served absent — the late-application race. Capture the
            # PRE-apply view for this response, then apply BEFORE the
            # response leaves: the triggering GET still sees absent, and
            # every subsequent request deterministically sees the landed
            # state (sending first would let the client's next GET race
            # the apply in this handler thread).
            payload = {
                "metadata-location": self._metadata_location(key),
                "metadata": md,
            }
            st = self.state
            if st.staged_deferred and st.deferred_countdown > 0:
                st.deferred_countdown -= 1
                if st.deferred_countdown == 0:
                    with st.lock:
                        for staged in st.staged_deferred:
                            for k, new_md in staged:
                                st.tables[k] = new_md
                                st.versions[k] += 1
                                self._persist(k)
                        st.staged_deferred = []
            self._send(200, payload)
            return
        self._error(404, "NotFoundException", f"no route {path}")

    def do_POST(self):  # noqa: N802
        if self._guard():
            return
        path = urlparse(self.path).path
        m = re.fullmatch(f"/v1/{PREFIX}/namespaces", path)
        if m:
            body = self._body()
            ns = ".".join(body["namespace"])
            with self.state.lock:
                if ns in self.state.namespaces:
                    self._error(409, "AlreadyExistsException", f"Namespace already exists: {ns}")
                    return
                self.state.namespaces[ns] = body.get("properties", {})
            self._send(200, {"namespace": body["namespace"], "properties": {}})
            return
        m = re.fullmatch(f"/v1/{PREFIX}/namespaces/([^/]+)/tables", path)
        if m:
            self._create_table(m.group(1), self._body())
            return
        m = re.fullmatch(f"/v1/{PREFIX}/namespaces/([^/]+)/tables/([^/]+)", path)
        if m:
            self._commit_table((m.group(1), m.group(2)), self._body())
            return
        if re.fullmatch(f"/v1/{PREFIX}/transactions/commit", path):
            self._commit_transaction(self._body())
            return
        if re.fullmatch(f"/v1/{PREFIX}/tables/rename", path):
            self._rename_table(self._body())
            return
        self._error(404, "NotFoundException", f"no route {path}")

    def do_DELETE(self):  # noqa: N802
        if self._guard():
            return
        parsed = urlparse(self.path)
        m = re.fullmatch(
            f"/v1/{PREFIX}/namespaces/([^/]+)/tables/([^/]+)", parsed.path
        )
        if m:
            key = (m.group(1), m.group(2))
            purge = parse_qs(parsed.query).get("purgeRequested", ["false"])[
                0
            ].lower() == "true"
            with self.state.lock:
                md = self.state.tables.pop(key, None)
                self.state.versions.pop(key, None)
            if md is None:
                self._error(
                    404,
                    "NoSuchTableException",
                    f"Table does not exist: {key[0]}.{key[1]}",
                )
                return
            if purge:
                import shutil

                shutil.rmtree(md["location"], ignore_errors=True)
            self._send(200)
            return
        self._error(404, "NotFoundException", f"no route {parsed.path}")

    def _rename_table(self, body: dict) -> None:
        src = body.get("source", {})
        dst = body.get("destination", {})
        src_key = (".".join(src.get("namespace", [])), src.get("name", ""))
        dst_key = (".".join(dst.get("namespace", [])), dst.get("name", ""))
        with self.state.lock:
            if src_key not in self.state.tables:
                self._error(
                    404,
                    "NoSuchTableException",
                    f"Table does not exist: {src_key[0]}.{src_key[1]}",
                )
                return
            if dst_key[0] not in self.state.namespaces:
                self._error(
                    404,
                    "NoSuchNamespaceException",
                    f"Namespace does not exist: {dst_key[0]}",
                )
                return
            if dst_key in self.state.tables:
                self._error(
                    409,
                    "AlreadyExistsException",
                    f"Table already exists: {dst_key[0]}.{dst_key[1]}",
                )
                return
            # re-key the registry; the table LOCATION stays put (every
            # absolute path in its metadata remains valid)
            self.state.tables[dst_key] = self.state.tables.pop(src_key)
            self.state.versions[dst_key] = self.state.versions.pop(src_key)
        self._send(200)

    # -- handlers ----------------------------------------------------------
    def _metadata_location(self, key: tuple[str, str]) -> str:
        v = self.state.versions.get(key, 0)
        md = self.state.tables[key]
        return os.path.join(md["location"], "metadata", f"{v:05d}-rest.metadata.json")

    def _persist(self, key: tuple[str, str]) -> None:
        """Write the committed version to disk like a warehouse-backed
        catalog (readers of metadata-location see real bytes)."""
        loc = self._metadata_location(key)
        os.makedirs(os.path.dirname(loc), exist_ok=True)
        with open(loc, "w", encoding="utf-8") as f:
            json.dump(self.state.tables[key], f, indent=2)

    def _create_table(self, ns: str, body: dict) -> None:
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import new_table_metadata

        name = body["name"]
        key = (ns, name)
        with self.state.lock:
            if ns not in self.state.namespaces:
                self._error(404, "NoSuchNamespaceException", f"Namespace does not exist: {ns}")
                return
            if key in self.state.tables:
                self._error(
                    409, "AlreadyExistsException", f"Table already exists: {ns}.{name}"
                )
                return
            schema = body["schema"]
            location = body.get("location") or os.path.join(self.state.warehouse, ns, name)
            last_col = max(
                (f["id"] for f in schema.get("fields", [])), default=0
            )
            # Iceberg convention: the reserved `format-version` table
            # property at create selects the metadata version (v3 birth)
            props = dict(body.get("properties", {}))
            fv = int(props.pop("format-version", 2))
            md = new_table_metadata(
                location,
                schema,
                last_col,
                body.get("partition-spec", {}).get("fields", []),
                props,
                body.get("write-order", {}).get("fields") or None,
                format_version=fv,
            )
            self.state.tables[key] = md
            self.state.versions[key] = 1
            self._persist(key)
            self._send(200, {"metadata-location": self._metadata_location(key), "metadata": md})

    @staticmethod
    def _check_requirements(md: dict, reqs: list[dict]) -> tuple[int, str, str] | None:
        """Requirement validation — the server-side half of optimistic
        concurrency; a stale assert-ref-snapshot-id is THE commit
        conflict signal clients retry on. Returns an error triple or
        None when all requirements hold."""
        for req in reqs:
            rtype = req.get("type")
            if rtype == "assert-table-uuid":
                if req.get("uuid") != md["table-uuid"]:
                    return (
                        409, "CommitFailedException", "Requirement failed: table UUID changed"
                    )
            elif rtype == "assert-ref-snapshot-id":
                ref = md.get("refs", {}).get(req.get("ref", "main"))
                current = ref["snapshot-id"] if ref else None
                if current != req.get("snapshot-id"):
                    return (
                        409,
                        "CommitFailedException",
                        f"Requirement failed: branch {req.get('ref')} has changed: "
                        f"expected id {req.get('snapshot-id')} != {current}",
                    )
            elif rtype == "assert-create":
                return (409, "CommitFailedException", "Requirement failed: table exists")
        return None

    def _commit_table(self, key: tuple[str, str], body: dict) -> None:
        with self.state.lock:
            md = self.state.tables.get(key)
            if md is None:
                self._error(
                    404, "NoSuchTableException", f"Table does not exist: {key[0]}.{key[1]}"
                )
                return
            failed = self._check_requirements(md, body.get("requirements", []))
            if failed is not None:
                self._error(*failed)
                return
            new_md = dict(md)
            failed = self._apply_updates(new_md, body.get("updates", []))
            if failed is not None:
                self._error(*failed)
                return
            self.state.tables[key] = new_md
            self.state.versions[key] += 1
            self._persist(key)
            if self.state.lose_commit_responses > 0:
                self.state.lose_commit_responses -= 1
                self._error(
                    503,
                    "ServiceUnavailableException",
                    "response lost after the commit was applied",
                )
                return
            if self.state.garbage_commit_responses > 0:
                self.state.garbage_commit_responses -= 1
                self._send_garbage()
                return
            self._send(
                200, {"metadata-location": self._metadata_location(key), "metadata": new_md}
            )

    @staticmethod
    def _apply_updates(new_md: dict, updates: list[dict]) -> tuple[int, str, str] | None:
        """Apply CommitTable updates to `new_md` in place. Returns an
        error triple (the caller discards new_md) or None on success."""
        for upd in updates:
            action = upd.get("action")
            if action == "add-snapshot":
                snap = upd["snapshot"]
                new_md["snapshots"] = new_md["snapshots"] + [snap]
                new_md["last-sequence-number"] = max(
                    new_md["last-sequence-number"], snap["sequence-number"]
                )
                new_md["last-updated-ms"] = snap["timestamp-ms"]
                if snap.get("first-row-id") is not None:
                    # v3 row lineage: snapshots consume id space
                    new_md["next-row-id"] = max(
                        new_md.get("next-row-id", 0),
                        snap["first-row-id"] + snap.get("added-rows", 0),
                    )
            elif action == "set-snapshot-ref":
                sid = upd["snapshot-id"]
                if sid not in {s["snapshot-id"] for s in new_md["snapshots"]}:
                    return (400, "ValidationException", f"unknown snapshot {sid}")
                ref = {"snapshot-id": sid, "type": upd.get("type", "branch")}
                # optional SnapshotRef retention fields (spec)
                for k in (
                    "min-snapshots-to-keep",
                    "max-snapshot-age-ms",
                    "max-ref-age-ms",
                ):
                    if upd.get(k) is not None:
                        ref[k] = upd[k]
                new_md["refs"] = {**new_md.get("refs", {}), upd["ref-name"]: ref}
                # only main drives the table's current snapshot
                if upd["ref-name"] == "main":
                    new_md["current-snapshot-id"] = sid
                    new_md["snapshot-log"] = new_md.get("snapshot-log", []) + [
                        {"timestamp-ms": new_md["last-updated-ms"], "snapshot-id": sid}
                    ]
            elif action == "set-properties":
                new_md["properties"] = {**new_md["properties"], **upd["updates"]}
            elif action == "set-partition-statistics":
                entry = upd["partition-statistics"]
                new_md["partition-statistics"] = [
                    e
                    for e in new_md.get("partition-statistics", [])
                    if e["snapshot-id"] != entry["snapshot-id"]
                ] + [entry]
            elif action == "remove-partition-statistics":
                new_md["partition-statistics"] = [
                    e
                    for e in new_md.get("partition-statistics", [])
                    if e["snapshot-id"] != upd["snapshot-id"]
                ]
            elif action == "set-statistics":
                entry = upd["statistics"]
                new_md["statistics"] = [
                    e
                    for e in new_md.get("statistics", [])
                    if e["snapshot-id"] != entry["snapshot-id"]
                ] + [entry]
            elif action == "remove-statistics":
                new_md["statistics"] = [
                    e
                    for e in new_md.get("statistics", [])
                    if e["snapshot-id"] != upd["snapshot-id"]
                ]
            elif action == "add-schema":
                new_md["schemas"] = new_md["schemas"] + [upd["schema"]]
                if "last-column-id" in upd:
                    new_md["last-column-id"] = max(
                        new_md["last-column-id"], upd["last-column-id"]
                    )
            elif action == "upgrade-format-version":
                target = upd["format-version"]
                cur = int(new_md.get("format-version", 2))
                if target < cur:
                    return (
                        400,
                        "ValidationException",
                        f"cannot downgrade format-version {cur} -> {target}",
                    )
                if target > 3:
                    return (400, "ValidationException", f"unsupported format-version {target}")
                new_md["format-version"] = target
                if target >= 3 and "next-row-id" not in new_md:
                    new_md["next-row-id"] = 0  # v3 row-lineage id space
            elif action == "remove-snapshot-ref":
                rn = upd["ref-name"]
                if rn == "main":
                    return (400, "ValidationException", "cannot remove the main branch")
                refs_ = dict(new_md.get("refs", {}))
                refs_.pop(rn, None)  # removing an absent ref is a no-op
                new_md["refs"] = refs_
            elif action == "remove-snapshots":
                drop = set(upd["snapshot-ids"])
                if new_md.get("current-snapshot-id") in drop:
                    return (400, "ValidationException", "cannot remove the current snapshot")
                new_md["snapshots"] = [
                    s for s in new_md["snapshots"] if s["snapshot-id"] not in drop
                ]
                new_md["snapshot-log"] = [
                    e
                    for e in new_md.get("snapshot-log", [])
                    if e["snapshot-id"] not in drop
                ]
                new_md["partition-statistics"] = [
                    e
                    for e in new_md.get("partition-statistics", [])
                    if e["snapshot-id"] not in drop
                ]
                new_md["statistics"] = [
                    e
                    for e in new_md.get("statistics", [])
                    if e["snapshot-id"] not in drop
                ]
            elif action == "add-spec":
                new_md["partition-specs"] = new_md["partition-specs"] + [upd["spec"]]
                new_md["last-partition-id"] = max(
                    new_md.get("last-partition-id", 999),
                    max(
                        (f["field-id"] for f in upd["spec"]["fields"]),
                        default=0,
                    ),
                )
            elif action == "set-default-spec":
                spec_id = upd["spec-id"]
                if spec_id == -1:  # spec: -1 = the spec added in this commit
                    spec_id = new_md["partition-specs"][-1]["spec-id"]
                if spec_id not in {s["spec-id"] for s in new_md["partition-specs"]}:
                    return (400, "ValidationException", f"unknown spec-id {spec_id}")
                new_md["default-spec-id"] = spec_id
            elif action == "set-current-schema":
                sid_ = upd["schema-id"]
                if sid_ == -1:  # spec: -1 = the schema added in this commit
                    sid_ = new_md["schemas"][-1]["schema-id"]
                if sid_ not in {s["schema-id"] for s in new_md["schemas"]}:
                    return (400, "ValidationException", f"unknown schema-id {sid_}")
                new_md["current-schema-id"] = sid_
            else:
                return (400, "ValidationException", f"unsupported update {action}")
        return None

    def _commit_transaction(self, body: dict) -> None:
        """CommitTransaction (the REST spec's /v1/{prefix}/transactions/
        commit): N CommitTableRequests applied ALL-OR-NOTHING under one
        lock — every change's requirements are validated against the
        CURRENT state first, and only if all hold are all updates
        applied and persisted. Any failure leaves every table untouched."""
        changes = body.get("table-changes", [])
        with self.state.lock:
            staged: list[tuple[tuple[str, str], dict]] = []
            for ch in changes:
                ident = ch.get("identifier", {})
                key = (".".join(ident.get("namespace", [])), ident.get("name", ""))
                md = self.state.tables.get(key)
                if md is None:
                    self._error(
                        404,
                        "NoSuchTableException",
                        f"Table does not exist: {key[0]}.{key[1]}",
                    )
                    return
                failed = self._check_requirements(md, ch.get("requirements", []))
                if failed is not None:
                    self._error(*failed)
                    return
                new_md = dict(md)
                failed = self._apply_updates(new_md, ch.get("updates", []))
                if failed is not None:
                    self._error(*failed)
                    return
                staged.append((key, new_md))
            if self.state.defer_commit_responses > 0:
                self.state.defer_commit_responses -= 1
                self.state.staged_deferred.append(staged)
                self.state.deferred_countdown = (
                    len(staged) + self.state.deferred_extra_loads
                )
                self._error(
                    503,
                    "ServiceUnavailableException",
                    "response lost; the server is still processing the transaction",
                )
                return
            for key, new_md in staged:
                self.state.tables[key] = new_md
                self.state.versions[key] += 1
                self._persist(key)
            if self.state.lose_commit_responses > 0:
                self.state.lose_commit_responses -= 1
                self._error(
                    503,
                    "ServiceUnavailableException",
                    "response lost after the transaction was applied",
                )
                return
            self._send(200, {})


def make_server(warehouse: str, token: str = "") -> tuple[ThreadingHTTPServer, StubCatalogState, str]:
    """Start a stub catalog on an ephemeral localhost port. Returns
    (server, state, uri); caller must server.shutdown()."""
    state = StubCatalogState(warehouse, token)
    handler = type("BoundHandler", (_Handler,), {"state": state})
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    uri = f"http://127.0.0.1:{server.server_address[1]}"
    return server, state, uri
