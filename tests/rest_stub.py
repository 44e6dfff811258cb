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
        # -- server-side scan planning (spec PlanTableScan family) -----
        # advertise_endpoints: emit ConfigResponse `endpoints` at all
        # (False models a pre-capability server -> client sees None);
        # advertise_plan: include the plan routes in that list.
        self.advertise_endpoints: bool = True
        self.advertise_plan: bool = True
        # "sync" answers POST plan with the completed result; "async"
        # answers `submitted` + plan-id and requires async_polls_required
        # GETs before completing; plan_page_size > 0 splits scan tasks
        # into plan-task pages fetched via POST tasks
        self.plan_mode: str = "sync"
        self.async_polls_required: int = 1
        self.plan_page_size: int = 0
        self.plan_fail_next: bool = False  # next plan answers status=failed
        self.omit_dv_reference: bool = False  # drop referenced-data-file on DVs
        self.plans: dict[str, dict] = {}  # plan-id -> {polls, result, cancelled}
        self.plan_task_pages: dict[str, dict] = {}  # token -> result fragment
        self.plan_seq: int = 0
        # -- views (Iceberg view spec v1 over the /views routes) --------
        self.views: dict[tuple[str, str], dict] = {}  # (ns, name) -> metadata
        self.view_versions: dict[tuple[str, str], int] = {}
        # list-endpoint pagination: 0 = everything in one response (no
        # next-page-token); N = pages of N with opaque offset tokens
        self.list_page_size: int = 0
        # -- vended storage credentials (spec LoadTableResult `config` +
        # `storage-credentials`, and the optional GET .../credentials
        # route). Tests set per-table vends; credential_fetches counts
        # explicit credential-endpoint hits (table-load vends are
        # visible in `requests`).
        self.storage_credentials: dict[tuple[str, str], list] = {}
        self.table_config: dict[tuple[str, str], dict] = {}
        self.credentials_endpoint: bool = True
        self.credential_fetches: int = 0
        # when set for a table, the /credentials route serves THESE
        # instead of storage_credentials — models rotation where the
        # refresh endpoint vends newer tokens than table loads did
        self.endpoint_credentials: dict[tuple[str, str], list] = {}
        # -- OAuth2 client-credentials (spec /v1/oauth/tokens) ----------
        # {client_id: client_secret}; non-empty turns on bearer
        # enforcement with server-minted tokens. oauth_expires_in is the
        # advertised TTL (None = omit the field); revoke_oauth_tokens()
        # invalidates everything issued so far (forces the 401 path).
        self.oauth_credentials: dict[str, str] = {}
        self.oauth_expires_in: int | None = None
        self.oauth_issued: int = 0
        self.oauth_valid: set[str] = set()

    def revoke_oauth_tokens(self) -> None:
        self.oauth_valid.clear()

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

    def _send_page(self, items: list, key: str) -> None:
        """Spec list-endpoint pagination: slice at the opaque pageToken
        offset and emit `next-page-token` while items remain; page size
        0 sends everything token-less (a non-paginating server)."""
        size = self.state.list_page_size
        if size <= 0:
            self._send(200, {key: items})
            return
        q = parse_qs(urlparse(self.path).query)
        tok = q.get("pageToken", [None])[0]
        off = int(tok[4:]) if tok else 0
        body: dict = {key: items[off : off + size]}
        if off + size < len(items):
            body["next-page-token"] = f"off-{off + size}"
        self._send(200, body)

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
        if st.oauth_credentials and self.path != "/v1/oauth/tokens":
            auth = self.headers.get("Authorization", "")
            tok = auth[7:] if auth.startswith("Bearer ") else ""
            if tok not in st.oauth_valid:
                self._error(
                    401, "NotAuthorizedException",
                    "unauthorized: expired or unknown oauth token",
                )
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
            cfg: dict = {
                "defaults": {"warehouse": wh},
                "overrides": {"prefix": PREFIX},
            }
            if self.state.advertise_endpoints:
                eps = [
                    "GET /v1/{prefix}/namespaces",
                    "POST /v1/{prefix}/namespaces",
                    "GET /v1/{prefix}/namespaces/{namespace}",
                    "GET /v1/{prefix}/namespaces/{namespace}/tables",
                    "GET /v1/{prefix}/namespaces/{namespace}/tables/{table}",
                    "POST /v1/{prefix}/namespaces/{namespace}/tables",
                    "POST /v1/{prefix}/namespaces/{namespace}/tables/{table}",
                    "DELETE /v1/{prefix}/namespaces/{namespace}/tables/{table}",
                    "POST /v1/{prefix}/transactions/commit",
                    "POST /v1/{prefix}/tables/rename",
                    "GET /v1/{prefix}/namespaces/{namespace}/views",
                    "POST /v1/{prefix}/namespaces/{namespace}/views",
                    "GET /v1/{prefix}/namespaces/{namespace}/views/{view}",
                    "POST /v1/{prefix}/namespaces/{namespace}/views/{view}",
                    "DELETE /v1/{prefix}/namespaces/{namespace}/views/{view}",
                    "POST /v1/{prefix}/views/rename",
                ]
                if self.state.credentials_endpoint:
                    eps.append(
                        "GET /v1/{prefix}/namespaces/{namespace}/tables/{table}/credentials"
                    )
                if self.state.advertise_plan:
                    eps += [
                        "POST /v1/{prefix}/namespaces/{namespace}/tables/{table}/plan",
                        "GET /v1/{prefix}/namespaces/{namespace}/tables/{table}/plan/{plan-id}",
                        "DELETE /v1/{prefix}/namespaces/{namespace}/tables/{table}/plan/{plan-id}",
                        "POST /v1/{prefix}/namespaces/{namespace}/tables/{table}/tasks",
                    ]
                cfg["endpoints"] = eps
            self._send(200, cfg)
            return
        m = re.fullmatch(
            f"/v1/{PREFIX}/namespaces/([^/]+)/tables/([^/]+)/plan/([^/]+)", path
        )
        if m:
            self._fetch_plan_result(m.group(3))
            return
        m = re.fullmatch(f"/v1/{PREFIX}/namespaces", path)
        if m:
            self._send_page(
                [[ns] for ns in sorted(self.state.namespaces)], "namespaces"
            )
            return
        m = re.fullmatch(f"/v1/{PREFIX}/namespaces/([^/]+)", path)
        if m:
            ns = m.group(1)
            if ns not in self.state.namespaces:
                self._error(404, "NoSuchNamespaceException", f"Namespace does not exist: {ns}")
                return
            self._send(200, {"namespace": [ns], "properties": self.state.namespaces[ns]})
            return
        m = re.fullmatch(f"/v1/{PREFIX}/namespaces/([^/]+)/tables", path)
        if m:
            ns = m.group(1)
            self._send_page(
                [
                    {"namespace": [k[0]], "name": k[1]}
                    for k in sorted(self.state.tables)
                    if k[0] == ns
                ],
                "identifiers",
            )
            return
        m = re.fullmatch(f"/v1/{PREFIX}/namespaces/([^/]+)/views", path)
        if m:
            ns = m.group(1)
            self._send_page(
                [
                    {"namespace": [k[0]], "name": k[1]}
                    for k in sorted(self.state.views)
                    if k[0] == ns
                ],
                "identifiers",
            )
            return
        m = re.fullmatch(f"/v1/{PREFIX}/namespaces/([^/]+)/views/([^/]+)", path)
        if m:
            key = (m.group(1), m.group(2))
            md = self.state.views.get(key)
            if md is None:
                self._error(
                    404, "NoSuchViewException", f"View does not exist: {key[0]}.{key[1]}"
                )
                return
            self._send(200, self._load_view_result(key))
            return
        m = re.fullmatch(
            f"/v1/{PREFIX}/namespaces/([^/]+)/tables/([^/]+)/credentials", path
        )
        if m:
            key = (m.group(1), m.group(2))
            st = self.state
            if key not in st.tables:
                self._error(
                    404, "NoSuchTableException",
                    f"Table does not exist: {key[0]}.{key[1]}",
                )
                return
            if not st.credentials_endpoint:
                self._error(404, "NotFoundException", f"no route {path}")
                return
            st.credential_fetches += 1
            vend = st.endpoint_credentials.get(
                key, st.storage_credentials.get(key, [])
            )
            self._send(200, {"storage-credentials": vend})
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
            if key in st.storage_credentials:
                payload["storage-credentials"] = st.storage_credentials[key]
            if key in st.table_config:
                payload["config"] = st.table_config[key]
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

    def _oauth_token(self) -> None:
        """RFC 6749 client_credentials grant: form-encoded request,
        OAuthTokenResponse on success, the RFC error shape (flat
        `error` / `error_description`) on failure — deliberately NOT
        the catalog error envelope."""
        st = self.state
        length = int(self.headers.get("Content-Length", 0))
        form = parse_qs(self.rfile.read(length).decode())
        grant = form.get("grant_type", [""])[0]
        cid = form.get("client_id", [""])[0]
        secret = form.get("client_secret", [""])[0]
        if grant != "client_credentials":
            self._send(400, {"error": "unsupported_grant_type",
                             "error_description": f"got {grant!r}"})
            return
        if st.oauth_credentials.get(cid) != secret:
            self._send(401, {"error": "invalid_client",
                             "error_description": "bad client credentials"})
            return
        st.oauth_issued += 1
        tok = f"oauth-tok-{st.oauth_issued}"
        st.oauth_valid.add(tok)
        body = {"access_token": tok, "token_type": "bearer"}
        if st.oauth_expires_in is not None:
            body["expires_in"] = st.oauth_expires_in
        self._send(200, body)

    def do_POST(self):  # noqa: N802
        if self.path == "/v1/oauth/tokens" and self.state.oauth_credentials:
            self.state.requests.append((self.command, self.path))
            self._oauth_token()
            return
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
        m = re.fullmatch(f"/v1/{PREFIX}/namespaces/([^/]+)/views", path)
        if m:
            self._create_view(m.group(1), self._body())
            return
        m = re.fullmatch(f"/v1/{PREFIX}/namespaces/([^/]+)/views/([^/]+)", path)
        if m:
            self._commit_view((m.group(1), m.group(2)), self._body())
            return
        if re.fullmatch(f"/v1/{PREFIX}/views/rename", path):
            self._rename_view(self._body())
            return
        m = re.fullmatch(f"/v1/{PREFIX}/namespaces/([^/]+)/tables/([^/]+)/plan", path)
        if m:
            self._plan_table_scan((m.group(1), m.group(2)), self._body())
            return
        m = re.fullmatch(f"/v1/{PREFIX}/namespaces/([^/]+)/tables/([^/]+)/tasks", path)
        if m:
            self._fetch_scan_tasks(self._body())
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
            f"/v1/{PREFIX}/namespaces/([^/]+)/tables/([^/]+)/plan/([^/]+)",
            parsed.path,
        )
        if m:
            plan = self.state.plans.get(m.group(3))
            if plan is None:
                self._error(404, "NoSuchPlanIdException", f"no plan {m.group(3)}")
                return
            plan["cancelled"] = True
            # spec: 204 No Content on successful cancellation
            self.send_response(204)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        m = re.fullmatch(
            f"/v1/{PREFIX}/namespaces/([^/]+)/views/([^/]+)", parsed.path
        )
        if m:
            key = (m.group(1), m.group(2))
            with self.state.lock:
                md = self.state.views.pop(key, None)
                self.state.view_versions.pop(key, None)
            if md is None:
                self._error(
                    404,
                    "NoSuchViewException",
                    f"View does not exist: {key[0]}.{key[1]}",
                )
                return
            self._send(200)
            return
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
            if key in self.state.tables or key in self.state.views:
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

    # -- views (view spec v1, server side — independent of the client codec) --

    def _load_view_result(self, key: tuple[str, str]) -> dict:
        st = self.state
        ver = st.view_versions.get(key, 1)
        loc = st.views[key]["location"]
        return {
            "metadata-location": f"{loc}/metadata/v{ver}.metadata.json",
            "metadata": st.views[key],
        }

    def _create_view(self, ns: str, body: dict) -> None:
        import time as _time
        import uuid as _uuid

        st = self.state
        name = body.get("name", "")
        key = (ns, name)
        with st.lock:
            if ns not in st.namespaces:
                self._error(404, "NoSuchNamespaceException", f"Namespace does not exist: {ns}")
                return
            if key in st.views or key in st.tables:
                self._error(
                    409, "AlreadyExistsException", f"View or table already exists: {ns}.{name}"
                )
                return
            vv = dict(body.get("view-version") or {})
            vv["version-id"] = 1
            vv["schema-id"] = 0
            vv.setdefault("timestamp-ms", int(_time.time() * 1000))
            schema = dict(body.get("schema") or {})
            schema["schema-id"] = 0
            st.views[key] = {
                "view-uuid": str(_uuid.uuid4()),
                "format-version": 1,
                "location": f"{st.warehouse}/{ns}/{name}",
                "schemas": [schema],
                "current-version-id": 1,
                "versions": [vv],
                "version-log": [
                    {"timestamp-ms": vv["timestamp-ms"], "version-id": 1}
                ],
                "properties": dict(body.get("properties") or {}),
            }
            st.view_versions[key] = 1
        self._send(200, self._load_view_result(key))

    def _commit_view(self, key: tuple[str, str], body: dict) -> None:
        import time as _time

        st = self.state
        with st.lock:
            md = st.views.get(key)
            if md is None:
                self._error(
                    404, "NoSuchViewException", f"View does not exist: {key[0]}.{key[1]}"
                )
                return
            for req in body.get("requirements") or []:
                if req.get("type") == "assert-view-uuid" and req.get("uuid") != md["view-uuid"]:
                    self._error(
                        409,
                        "CommitFailedException",
                        f"view uuid mismatch: expected {req.get('uuid')}, found {md['view-uuid']}",
                    )
                    return
            new = json.loads(json.dumps(md))
            last_schema_id: int | None = None
            last_version_id: int | None = None
            for u in body.get("updates") or []:
                a = u.get("action")
                if a == "add-schema":
                    s = dict(u["schema"])
                    sid = s.get("schema-id", -1)
                    if sid is None or sid < 0 or any(
                        x["schema-id"] == sid for x in new["schemas"]
                    ):
                        sid = max(x["schema-id"] for x in new["schemas"]) + 1
                    s["schema-id"] = sid
                    new["schemas"].append(s)
                    last_schema_id = sid
                elif a == "add-view-version":
                    v = dict(u["view-version"])
                    vid = v.get("version-id", -1)
                    if vid is None or vid < 0 or any(
                        x["version-id"] == vid for x in new["versions"]
                    ):
                        vid = max(x["version-id"] for x in new["versions"]) + 1
                    v["version-id"] = vid
                    if v.get("schema-id", -1) == -1:
                        if last_schema_id is None:
                            self._error(
                                400,
                                "ValidationException",
                                "view-version schema-id -1 without a preceding add-schema",
                            )
                            return
                        v["schema-id"] = last_schema_id
                    v.setdefault("timestamp-ms", int(_time.time() * 1000))
                    new["versions"].append(v)
                    last_version_id = vid
                elif a == "set-current-view-version":
                    vid = u.get("view-version-id")
                    if vid == -1:
                        if last_version_id is None:
                            self._error(
                                400,
                                "ValidationException",
                                "set-current-view-version -1 without a preceding add-view-version",
                            )
                            return
                        vid = last_version_id
                    match = next(
                        (x for x in new["versions"] if x["version-id"] == vid), None
                    )
                    if match is None:
                        self._error(
                            400, "ValidationException", f"no view version {vid}"
                        )
                        return
                    if new["current-version-id"] != vid:
                        new["current-version-id"] = vid
                        new["version-log"].append(
                            {
                                "timestamp-ms": match.get(
                                    "timestamp-ms", int(_time.time() * 1000)
                                ),
                                "version-id": vid,
                            }
                        )
                elif a == "set-properties":
                    new["properties"].update(u.get("updates") or {})
                elif a == "remove-properties":
                    for k in u.get("removals") or []:
                        new["properties"].pop(k, None)
                elif a == "set-location":
                    new["location"] = u["location"]
                elif a == "assign-uuid":
                    new["view-uuid"] = u["uuid"]
                else:
                    self._error(
                        400, "ValidationException", f"unsupported view update {a!r}"
                    )
                    return
            st.views[key] = new
            st.view_versions[key] = st.view_versions.get(key, 1) + 1
        self._send(200, self._load_view_result(key))

    def _rename_view(self, body: dict) -> None:
        src = body.get("source", {})
        dst = body.get("destination", {})
        skey = (".".join(src.get("namespace", [])), src.get("name", ""))
        dkey = (".".join(dst.get("namespace", [])), dst.get("name", ""))
        st = self.state
        with st.lock:
            if skey not in st.views:
                self._error(
                    404, "NoSuchViewException", f"View does not exist: {skey[0]}.{skey[1]}"
                )
                return
            if dkey[0] not in st.namespaces:
                self._error(
                    404, "NoSuchNamespaceException", f"Namespace does not exist: {dkey[0]}"
                )
                return
            if dkey in st.views or dkey in st.tables:
                self._error(
                    409, "AlreadyExistsException", f"Already exists: {dkey[0]}.{dkey[1]}"
                )
                return
            st.views[dkey] = st.views.pop(skey)
            st.view_versions[dkey] = st.view_versions.pop(skey, 1)
        self._send(200)

    # -- server-side scan planning ------------------------------------------
    # The SERVER half of the spec's PlanTableScan family, implemented
    # independently of the client codec in sinks/rest_scan.py (own
    # expression parser, own ContentFile serializer) so the roundtrip
    # tests exercise the wire format itself, not a shared library.

    def _plan_table_scan(self, key: tuple[str, str], body: dict) -> None:
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
            plan_scan_metadata,
        )

        st = self.state
        if not st.advertise_plan:
            # a server that does not implement planning 404s the route
            self._error(404, "NotFoundException", "scan planning not supported")
            return
        md = st.tables.get(key)
        if md is None:
            self._error(
                404, "NoSuchTableException", f"Table does not exist: {key[0]}.{key[1]}"
            )
            return
        if st.plan_fail_next:
            st.plan_fail_next = False
            self._send(
                200,
                {
                    "status": "failed",
                    "error": {
                        "type": "ValidationException",
                        "message": "injected planning failure",
                        "code": 400,
                    },
                },
            )
            return
        sid = body.get("snapshot-id", md.get("current-snapshot-id"))
        kwargs = _expr_to_plan_kwargs(body.get("filter"), md)
        data, deletes, _ = plan_scan_metadata(md, sid, **kwargs)
        fragments = _plan_fragments(md, data, deletes, st.plan_page_size, st.omit_dv_reference)
        with st.lock:
            first = fragments[0] if fragments else {"file-scan-tasks": []}
            tokens = []
            for frag in fragments[1:]:
                st.plan_seq += 1
                tok = f"task-{st.plan_seq}"
                st.plan_task_pages[tok] = frag
                tokens.append(tok)
            if tokens:
                first = dict(first)
                first["plan-tasks"] = tokens
            result = {"status": "completed", **first}
            if st.plan_mode == "async":
                st.plan_seq += 1
                pid = f"plan-{st.plan_seq}"
                st.plans[pid] = {
                    "polls": st.async_polls_required,
                    "result": result,
                    "cancelled": False,
                }
                self._send(200, {"status": "submitted", "plan-id": pid})
                return
        self._send(200, result)

    def _fetch_plan_result(self, plan_id: str) -> None:
        plan = self.state.plans.get(plan_id)
        if plan is None:
            self._error(404, "NoSuchPlanIdException", f"no plan {plan_id}")
            return
        if plan.get("cancelled"):
            self._send(200, {"status": "cancelled"})
            return
        plan["polls"] -= 1
        if plan["polls"] > 0:
            self._send(200, {"status": "submitted", "plan-id": plan_id})
            return
        self._send(200, plan["result"])

    def _fetch_scan_tasks(self, body: dict) -> None:
        token = body.get("plan-task")
        frag = self.state.plan_task_pages.pop(token, None)
        if frag is None:
            self._error(404, "NoSuchPlanTaskException", f"no plan-task {token!r}")
            return
        self._send(200, frag)


# -- scan-planning helpers (module level, server-side codec) -----------------

_WIRE_CONTENT = {0: "data", 1: "position-deletes", 2: "equality-deletes"}


def _coerce_wire_literal(col_type: str, v):
    """JSON literal -> the python value local planning would have been
    handed for this column type (temporal literals ride as ISO strings
    on the wire). Zone-less timestamptz literals bind as UTC — the same
    convention the engine's transform arithmetic uses — and timestamp
    (zone-naive type) literals are normalized TO naive so they compare
    with decoded manifest bounds."""
    from datetime import date, datetime, timezone

    if isinstance(v, str):
        if col_type in ("timestamp", "timestamptz"):
            v = datetime.fromisoformat(v)
        elif col_type == "date":
            return date.fromisoformat(v)
        elif col_type in ("timestamp_ns", "timestamptz_ns"):
            from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
                parse_iso_ns,
            )

            return parse_iso_ns(v)
    if isinstance(v, datetime):
        if col_type == "timestamptz":
            return v if v.tzinfo else v.replace(tzinfo=timezone.utc)
        if col_type == "timestamp":
            return (
                v.astimezone(timezone.utc).replace(tzinfo=None) if v.tzinfo else v
            )
    return v


def _expr_to_plan_kwargs(expr, md: dict) -> dict:
    """Spec Expression JSON -> plan_scan_metadata kwargs, strictly
    conservative: any node the walk doesn't understand simply
    contributes no pruning (OR / NOT / unknown ops included — a real
    planner would evaluate them; this stub only needs the conjunctive
    pruning surface the client emits)."""
    fields = {
        f["name"]: f["type"]
        for f in _current_schema(md)["fields"]
        if isinstance(f["type"], str)
    }
    spec_fields = _default_spec(md)["fields"]
    src_of = {
        f["id"]: f["name"] for f in _current_schema(md)["fields"]
    }
    first_pf = spec_fields[0] if spec_fields else None
    bounds: dict[str, list] = {}
    eqs: list[tuple[str, object]] = []
    part_bounds: list = [None, None]

    def walk(e) -> None:
        if not isinstance(e, dict):
            return
        t = e.get("type")
        if t == "and":
            walk(e.get("left"))
            walk(e.get("right"))
            return
        if t not in ("eq", "lt", "lt-eq", "gt", "gt-eq"):
            return
        term, val = e.get("term"), e.get("value")
        if isinstance(term, dict):
            # transform-term predicate: honored when it names the FIRST
            # default spec field (what partition_range applies to)
            if (
                first_pf is not None
                and term.get("type") == "transform"
                and term.get("transform") == first_pf["transform"]
                and term.get("term") == src_of.get(first_pf["source-id"])
                and isinstance(val, int)
            ):
                if t in ("gt-eq", "gt"):
                    part_bounds[0] = val + (1 if t == "gt" else 0)
                elif t in ("lt-eq", "lt"):
                    part_bounds[1] = val - (1 if t == "lt" else 0)
                else:
                    part_bounds[0] = part_bounds[1] = val
            return
        if not isinstance(term, str) or term not in fields:
            return
        val = _coerce_wire_literal(fields[term], val)
        lo, hi = bounds.get(term, (None, None))
        # strict ops widen to inclusive: boundary files are KEPT
        # (conservative), the row filter stays with the engine
        if t in ("gt", "gt-eq"):
            lo = val if lo is None else max(lo, val)
        elif t in ("lt", "lt-eq"):
            hi = val if hi is None else min(hi, val)
        else:  # eq
            lo, hi = val, val
            eqs.append((term, val))
        bounds[term] = [lo, hi]

    walk(expr)
    source_names = {src_of.get(pf["source-id"]) for pf in spec_fields}
    out: dict[str, list] = {
        "column_range": [],
        "source_range": [],
        "source_predicate": [],
    }
    for col, (lo, hi) in bounds.items():
        out["column_range"].append((col, lo, hi))
        if col in source_names:
            out["source_range"].append((col, lo, hi))
    out["source_predicate"] = [(c, v) for c, v in eqs if c in source_names]
    kwargs = {k: v for k, v in out.items() if v}
    if part_bounds[0] is not None or part_bounds[1] is not None:
        lo = part_bounds[0] if part_bounds[0] is not None else -(2**62)
        hi = part_bounds[1] if part_bounds[1] is not None else 2**62
        kwargs["partition_range"] = (lo, hi)
    return kwargs


def _current_schema(md: dict) -> dict:
    sid = md["current-schema-id"]
    return next(s for s in md["schemas"] if s["schema-id"] == sid)


def _default_spec(md: dict) -> dict:
    sid = md.get("default-spec-id", 0)
    return next(
        (s for s in md.get("partition-specs", []) if s["spec-id"] == sid),
        {"fields": []},
    )


def _json_partition_value(v):
    from datetime import date, datetime
    from decimal import Decimal

    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v)
    return v


def _content_file_json(f, md: dict) -> dict:
    """DataFile -> spec ContentFile JSON (DataFile / PositionDeleteFile /
    EqualityDeleteFile): partition values as a list aligned with the
    file's spec, v3 extras (first-row-id, DV locator fields) included
    when present."""
    spec_id = f.spec_id if f.spec_id is not None else md.get("default-spec-id", 0)
    spec = next(
        (s for s in md.get("partition-specs", []) if s["spec-id"] == spec_id),
        {"fields": []},
    )
    j: dict = {
        "content": _WIRE_CONTENT[f.content],
        "file-path": f.file_path,
        "file-format": "parquet",
        "spec-id": spec_id,
        "partition": [
            _json_partition_value(f.partition.get(pf["name"]))
            for pf in spec["fields"]
        ],
        "file-size-in-bytes": f.file_size_in_bytes,
        "record-count": f.record_count,
    }
    if f.equality_ids:
        j["equality-ids"] = list(f.equality_ids)
    if f.content_offset is not None:
        j["content-offset"] = f.content_offset
        j["content-size-in-bytes"] = f.content_size_in_bytes
    if f.referenced_data_file is not None:
        j["referenced-data-file"] = f.referenced_data_file
    if f.first_row_id is not None:
        j["first-row-id"] = f.first_row_id
    return j


def _plan_fragments(
    md: dict, data, deletes, page_size: int, omit_dv_reference: bool
) -> list[dict]:
    """(data files, delete files) -> FetchScanTasksResult-shaped
    fragments, one per page (page_size 0 = everything in one message).
    Each fragment is self-contained: delete-file-references index into
    ITS OWN delete-files list, per the spec. Applicability:

    * DV / referenced position delete -> the referenced file's task;
    * plain position-delete files -> every task (their rows name exact
      file paths, so over-referencing is harmless and spec-legal);
    * equality delete -> tasks whose data sequence number is strictly
      below the delete's (the manifest application rule)."""

    def applicable(d, f) -> bool:
        if d.content == 1:
            return d.referenced_data_file in (None, f.file_path)
        return f.sequence_number < d.sequence_number

    pages = (
        [data]
        if page_size <= 0
        else [data[i : i + page_size] for i in range(0, len(data), page_size)]
    ) or [[]]
    fragments = []
    for page in pages:
        local: list = []
        # one Puffin file carries DV blobs for MANY data files — one
        # manifest entry each, same file-path: dedupe by the full
        # (path, referenced file, offset) locator, never path alone
        index: dict[tuple, int] = {}
        tasks = []
        for f in page:
            refs = []
            for d in deletes:
                if not applicable(d, f):
                    continue
                k = (d.file_path, d.referenced_data_file, d.content_offset)
                if k not in index:
                    dj = _content_file_json(d, md)
                    if omit_dv_reference:
                        dj.pop("referenced-data-file", None)
                    index[k] = len(local)
                    local.append(dj)
                refs.append(index[k])
            task = {"data-file": _content_file_json(f, md)}
            if refs:
                task["delete-file-references"] = refs
            tasks.append(task)
        frag: dict = {"file-scan-tasks": tasks}
        if local:
            frag["delete-files"] = local
        fragments.append(frag)
    return fragments


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
