"""Stdlib HTTP control-plane server.

Reference counterpart: server/libraries/td-apiserver (axum REST server) and
the URL surface in server/libraries/td-objects/src/rest_urls/mod.rs —
auth (49-54), collections (124-137), tables (219-237), functions
(155-175), transactions (260-271), status/runtime-info (240-241).

The reference runs a Rust axum server in front of its own execution
engine; here the same URL contract fronts the Spark-native store/pubsub
services.  Single-process `ThreadingHTTPServer` is deliberate: the control
plane is metadata-only (SQLite rows, no data rows), so one node suffices;
the data plane stays distributed inside Spark.  A `sample` request LIMITs
before collect, `download` never collects (store/services.py).
"""

from __future__ import annotations

import json
import threading
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any
from urllib.parse import parse_qs, urlparse

from .auth import PERMISSION_TYPES, AuthError, Authenticator, RoleStore

BASE = "/api/v1"

# Routes callable without a bearer token (reference: AUTH_LOGIN plus the
# liveness probe SERVER_STATUS and the API docs, rest_urls/mod.rs:32-33).
_PUBLIC = {("POST", "auth/login"), ("GET", "status"), ("GET", "docs")}

# Machine-readable route inventory served at GET /docs (reference serves
# openapi.json + docs UI, rest_urls/mod.rs:32-33; a full OpenAPI schema
# would add a dependency for no consumer — this is the same discovery
# contract in plain JSON).
_ROUTE_DOCS = [
    {"method": m, "path": p, "summary": s} for m, p, s in [
        ("POST", "/auth/login", "mint a bearer token"),
        ("POST", "/auth/refresh", "re-mint the current token"),
        ("POST", "/auth/logout", "revoke the current token"),
        ("GET", "/auth/info", "current user/role/expiry"),
        ("POST", "/auth/password_change", "rotate own password"),
        ("POST", "/auth/role_change", "assume a role you belong to"),
        ("GET", "/ssl-cert", "serving certificate (TLS deployments)"),
        ("GET", "/status", "liveness probe"),
        ("GET", "/docs", "this inventory"),
        ("GET", "/runtime-info", "engine/spark runtime details"),
        ("GET", "/users", "list users"),
        ("POST", "/users", "create user (sa/ss)"),
        ("GET", "/users/{name}", "user detail with memberships"),
        ("PUT", "/users/{name}", "update password/role (sa/ss)"),
        ("DELETE", "/users/{name}", "delete user (sa/ss)"),
        ("GET", "/roles", "list roles with grants"),
        ("POST", "/roles", "create role (sa/ss)"),
        ("GET", "/roles/{role}", "role detail"),
        ("PUT", "/roles/{role}", "replace grant set (sa/ss)"),
        ("DELETE", "/roles/{role}", "delete role (sa/ss)"),
        ("GET", "/roles/{role}/permissions", "list grants"),
        ("POST", "/roles/{role}/permissions", "grant permission (sa/ss)"),
        ("DELETE", "/roles/{role}/permissions", "revoke permission (sa/ss)"),
        ("GET", "/roles/{role}/users", "list members"),
        ("POST", "/roles/{role}/users", "add member (sa/ss)"),
        ("DELETE", "/roles/{role}/users/{user}", "remove member (sa/ss)"),
        ("GET", "/collections", "list collections"),
        ("POST", "/collections", "create collection"),
        ("GET", "/collections/{c}", "collection detail"),
        ("PUT", "/collections/{c}", "rename collection (sa/ss/ca)"),
        ("DELETE", "/collections/{c}", "delete empty collection (sa/ss/ca)"),
        ("GET", "/tables", "list tables across collections"),
        ("GET", "/collections/{c}/tables", "list tables"),
        ("GET", "/collections/{c}/tables/{t}/schema", "table schema (?at=)"),
        ("GET", "/collections/{c}/tables/{t}/sample",
         "rows/csv/json sample (?sql= ?at= ?offset= ?len=)"),
        ("GET", "/collections/{c}/tables/{t}/data-versions",
         "committed versions with stats"),
        ("GET", "/collections/{c}/tables/{t}/download",
         "export under the server export root (?dest= ?format= ?sql=)"),
        ("DELETE", "/collections/{c}/tables/{t}",
         "delete table + all versions (sa/ss/ca)"),
        ("POST", "/collections/{c}/tables/{t}/vacuum",
         "reclaim dead/old versions (?keep_last=) (sa/ss/ca)"),
        ("GET", "/collections/{c}/inter-collection-permissions",
         "list collections granted read access"),
        ("POST", "/collections/{c}/inter-collection-permissions",
         "grant read access to another collection (sa/ss/ca)"),
        ("DELETE", "/collections/{c}/inter-collection-permissions/{to}",
         "revoke (sa/ss/ca)"),
        ("GET", "/collections/{c}/functions", "list functions"),
        ("GET", "/collections/{c}/functions/{f}", "function detail"),
        ("PUT", "/collections/{c}/functions/{f}",
         "update spec: tables/trigger lists (sa/ss/ca)"),
        ("DELETE", "/collections/{c}/functions/{f}",
         "unregister function (sa/ss/ca)"),
        ("GET", "/collections/{c}/functions/{f}/history", "run history"),
        ("POST", "/collections/{c}/functions/{f}/execute",
         "trigger + cascade"),
        ("POST", "/collections/{c}/functions/{f}/bundle",
         "upload code bundle (base64)"),
        ("GET", "/collections/{c}/functions/{f}/bundle", "fetch bundle"),
        ("GET", "/functions", "list functions across collections"),
        ("GET", "/function_runs", "run rows (?collection= ?fn=)"),
        ("GET", "/transactions", "list transactions"),
        ("POST", "/transactions/{id}/cancel", "cancel non-committed (sa/ss)"),
        ("POST", "/transactions/{id}/recover", "re-open canceled (sa/ss)"),
        ("GET", "/executions", "trigger cascades grouped by execution"),
        ("POST", "/executions/{id}/cancel", "cancel unfinished runs (sa/ss)"),
        ("POST", "/executions/{id}/recover", "re-schedule runs (sa/ss)"),
        ("GET", "/workers", "function-run workers (?collection= ?fn=)"),
        ("GET", "/workers/{id}/logs", "worker log lines"),
    ]
]


class ApiError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


class _Body(dict):
    """Request body: a missing required field is the CALLER's mistake, so
    `body["x"]` raises a 400 at the parsing boundary instead of leaking a
    KeyError (which would otherwise be indistinguishable from a genuine
    server bug and must not be blanket-mapped to 400)."""

    def __getitem__(self, key):
        try:
            return super().__getitem__(key)
        except KeyError:
            raise ApiError(400, f"missing body field {key!r}") from None

    _REQUIRED = object()

    def str_field(self, key, default=_REQUIRED):
        """String-typed field, validated at the parsing boundary: a
        non-string value (a nested object for 'name', a numeric
        'password', ...) is the caller's mistake and must 400 — fed
        onward it turns into an unhashable-dict lookup or a failed
        .encode() and surfaces as a 500+trace."""
        if key not in self:
            if default is _Body._REQUIRED:
                raise ApiError(400, f"missing body field {key!r}")
            return default
        v = super().__getitem__(key)
        if not isinstance(v, str):
            raise ApiError(400, f"body field {key!r} must be a string")
        return v


def _int_param(query: dict, name: str, default: int) -> int:
    val = query.get(name)
    if val is None:
        return default
    try:
        return int(val)
    except (TypeError, ValueError):
        raise ApiError(
            400, f"query param {name!r} must be an integer, got {val!r}"
        ) from None


def _client_error_status(e: Exception) -> int | None:
    """Map domain exceptions raised by a request to the HTTP status class
    the client deserves: 404 when a table/version does not exist, 400 for
    malformed refs/params/SQL.  None -> genuine server fault (500)."""
    from ..errors import VersionResolutionError

    if isinstance(e, VersionResolutionError):
        msg = str(e)
        if ("no committed versions" in msg or "unknown version id" in msg
                or "out of range" in msg):
            return 404
        return 400  # bad ref / bad uri / descending range
    # NOTE: builtin ValueError/TypeError/KeyError are deliberately NOT
    # mapped here — an internal bug raising one must stay a 500 with a
    # trace.  Caller-input parsing raises ApiError at explicit boundaries
    # instead (_Body, _int_param, format allowlists in the routes).
    # Spark SQL analysis/parse errors from ?sql= are caller mistakes
    cls = type(e).__name__
    if cls in ("ParseException", "AnalysisException"):
        return 400
    return None


class ApiServer:
    """Routes the reference's REST URL surface onto store/pubsub services.

    Parameters
    ----------
    spark : SparkSession used for table reads (schema/sample/download).
    store : TableStore (versioned data + SQLite metadata).
    engine : optional PubSubEngine for POST .../functions/{f}/execute.
    auth : Authenticator (defaults to admin/tabsdata, as the reference's
        bootstrap user).
    """

    def __init__(self, spark, store, engine=None, auth: Authenticator | None = None,
                 host: str = "127.0.0.1", port: int = 0,
                 export_root: str | None = None,
                 ssl_cert: str | None = None, ssl_key: str | None = None):
        self.spark = spark
        self.store = store
        self.engine = engine
        self.auth = auth or Authenticator()
        self.roles = RoleStore()
        self._revoked: set[str] = set()
        # Server-side writes from GET .../download are confined here: a
        # client-chosen absolute path would let any authenticated user
        # overwrite whatever the server process can write (the reference
        # streams downloads to the client instead; this is the equivalent
        # containment for a path-based contract).
        import os as _os
        self.export_root = _os.path.realpath(
            export_root or _os.path.join(store.root, "exports"))
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # silence per-request stderr logging
            def log_message(self, *a):  # noqa: D102
                pass

            def _json_body(self) -> dict:
                try:
                    n = int(self.headers.get("Content-Length") or 0)
                except ValueError:
                    # a malformed header is the caller's mistake
                    raise ApiError(400, "invalid Content-Length") from None
                if not n:
                    return _Body()
                try:
                    parsed = json.loads(self.rfile.read(n))
                except json.JSONDecodeError:
                    raise ApiError(400, "invalid JSON body") from None
                if not isinstance(parsed, dict):
                    raise ApiError(400, "JSON body must be an object")
                return _Body(parsed)

            def _respond(self, status: int, payload: Any) -> None:
                body = json.dumps(payload, default=str).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _handle(self, method: str) -> None:
                parsed = urlparse(self.path)
                query = {k: v[0] for k, v in parse_qs(parsed.query).items()}
                path = parsed.path
                if not path.startswith(BASE):
                    self._respond(404, {"error": f"unknown path {path}"})
                    return
                rel = path[len(BASE):].strip("/")
                try:
                    user = None
                    if (method, rel) not in _PUBLIC:
                        user = outer._authenticate(self.headers.get("Authorization"))
                    # DELETE bodies are parsed too: revoke-style routes name
                    # the permission/entity in the body (without this the
                    # body read {} and revokes silently no-opped).
                    result = outer._route(method, rel.split("/"), query,
                                          self._json_body() if method in
                                          ("POST", "PUT", "PATCH", "DELETE")
                                          else _Body(), user)
                    self._respond(200, result)
                except ApiError as e:
                    self._respond(e.status, {"error": e.message})
                except AuthError as e:
                    self._respond(401, {"error": str(e)})
                except Exception as e:  # surface, don't kill the thread
                    # client errors map to 4xx without a server traceback
                    # (the reference apiserver's status discipline); only
                    # genuine server faults keep the 500 + trace
                    status = _client_error_status(e)
                    if status is not None:
                        self._respond(status, {"error": str(e)})
                    else:
                        self._respond(500, {"error": str(e),
                                            "trace": traceback.format_exc(limit=5)})

            def do_GET(self):
                self._handle("GET")

            def do_POST(self):
                self._handle("POST")

            def do_DELETE(self):
                self._handle("DELETE")

            def do_PUT(self):
                self._handle("PUT")

            def do_PATCH(self):
                # routed like the other mutating verbs (the body parser
                # already covers PATCH): an unmatched route 404s instead
                # of http.server's protocol-level 501
                self._handle("PATCH")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        # TLS (reference: the apiserver serves HTTPS with a provided cert,
        # rest_urls/mod.rs:56): wrap the listening socket; clients verify
        # against the cert (ApiClient cafile=...).
        self.tls = bool(ssl_cert)
        self._ssl_cert_path = ssl_cert
        if ssl_cert:
            import ssl as _ssl

            ctx = _ssl.SSLContext(_ssl.PROTOCOL_TLS_SERVER)
            ctx.load_cert_chain(ssl_cert, ssl_key)
            self._httpd.socket = ctx.wrap_socket(
                self._httpd.socket, server_side=True)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: threading.Thread | None = None

    # -- lifecycle -----------------------------------------------------
    @property
    def base_url(self) -> str:
        scheme = "https" if self.tls else "http"
        return f"{scheme}://{self.host}:{self.port}{BASE}"

    def start(self) -> "ApiServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- auth ----------------------------------------------------------
    def _authenticate(self, header: str | None) -> dict:
        if not header or not header.startswith("Bearer "):
            raise ApiError(401, "missing bearer token")
        token = header[len("Bearer "):]
        if token in self._revoked:
            raise AuthError("token revoked")
        payload = self.auth.verify(token)
        payload["token"] = token
        return payload

    # -- routing -------------------------------------------------------
    def _route(self, method: str, parts: list[str], query: dict,
               body: dict, user: dict | None) -> Any:
        head = parts[0] if parts and parts[0] else ""
        if head == "auth":
            return self._auth_routes(method, parts, body, user)
        if head == "status" and method == "GET":
            return {"status": "OK"}
        if head == "docs" and method == "GET":
            return _ROUTE_DOCS
        if head == "runtime-info" and method == "GET":
            return {
                "engine": "tabsdata-spark",
                "spark_version": self.spark.version,
                "master": self.spark.sparkContext.master,
                "default_parallelism": self.spark.sparkContext.defaultParallelism,
            }
        if head == "collections":
            return self._collection_routes(method, parts, query, body, user)
        if head == "transactions":
            return self._transaction_routes(method, parts, user)
        if head == "executions":
            return self._execution_routes(method, parts, user)
        if head == "workers":
            return self._worker_routes(method, parts, query)
        if head == "users":
            return self._user_routes(method, parts, body, user)
        if head == "roles":
            return self._role_routes(method, parts, body, user)
        if head == "functions" and method == "GET":
            return self._functions(None)
        if head == "tables" and method == "GET":
            # global table listing (reference LIST_TABLES, :231)
            return self.store.meta.list_all_tables()
        if head == "ssl-cert" and method == "GET":
            # reference CERT_DOWNLOAD (:56): clients fetch the serving
            # cert to pin it (ApiClient cafile=)
            if not self._ssl_cert_path:
                raise ApiError(404, "server is not serving TLS")
            with open(self._ssl_cert_path) as f:
                return {"pem": f.read()}
        if head == "function_runs" and method == "GET":
            return self.store.meta.list_runs(
                query.get("collection"), query.get("fn"))
        raise ApiError(404, f"unknown route {method} {'/'.join(parts)}")

    def _has_security(self, user: dict | None,
                      collection: str | None = None) -> bool:
        """sa or ss — the security surface (reference Authz<SysAdmin,
        SecAdmin>) — resolved over the token role UNION role memberships;
        with `collection`, collection-admin (ca) on it also qualifies."""
        if not user:
            return False
        check = self.roles.user_allows
        name, role = user["user"], user["role"]
        if check(name, role, "sa") or check(name, role, "ss"):
            return True
        return collection is not None and check(name, role, "ca", collection)

    def _require_security(self, user: dict | None,
                          collection: str | None = None) -> None:
        if not self._has_security(user, collection):
            raise ApiError(403, "needs sys_admin/sec_admin permission")

    def _auth_routes(self, method, parts, body, user):
        sub = parts[1] if len(parts) > 1 else ""
        if method == "POST" and sub == "login":
            try:
                return self.auth.login(body.str_field("name", ""),
                                       body.str_field("password", ""))
            except AuthError:
                raise ApiError(401, "invalid credentials") from None
        if method == "POST" and sub == "refresh":
            return self.auth.refresh(user["token"])
        if method == "POST" and sub == "logout":
            self._revoked.add(user["token"])
            return {"ok": True}
        if method == "GET" and sub == "info":
            return {"user": user["user"], "role": user["role"],
                    "exp": user["exp"]}
        if method == "POST" and sub == "password_change":
            if not self.auth.check_password(user["user"],
                                            body.str_field("old_password", "")):
                raise ApiError(403, "old password does not match")
            self.auth.add_user(user["user"], body.str_field("new_password"),
                               role=user["role"])
            return {"ok": True}
        if method == "POST" and sub == "role_change":
            # assume another role (AUTH_ROLE_CHANGE, :51): only the base
            # role or a role the user is a member of
            want = body.str_field("role", "")
            name = user["user"]
            if want != self.auth._roles.get(name) and \
                    name not in self.roles._members.get(want, set()):
                raise ApiError(403, f"user {name} cannot assume role {want}")
            self._revoked.add(user["token"])       # old token dies with it
            return self.auth.mint_as(name, want)
        raise ApiError(404, f"unknown auth route {method} {sub}")

    def _user_routes(self, method, parts, body, user):
        """USERS surface (reference rest_urls/mod.rs:63-72).  All mutations
        need the security surface — without the gate any authenticated
        'user'-role caller could mint themselves an admin account."""
        if method == "GET" and len(parts) == 1:
            return [{"name": n, "role": self.auth._roles.get(n, "user")}
                    for n in sorted(self.auth._users)]
        if method != "GET":
            self._require_security(user)
        if method == "POST" and len(parts) == 1:
            name = body.str_field("name")
            if name in self.auth._users:
                raise ApiError(409, f"user {name} exists")
            self.auth.add_user(name, body.str_field("password"),
                               role=body.str_field("role", "user"))
            return {"ok": True}
        if method == "GET" and len(parts) == 2:
            name = parts[1]
            if name not in self.auth._users:
                raise ApiError(404, f"unknown user {name}")
            return {"name": name, "role": self.auth._roles.get(name, "user"),
                    "member_of": sorted(self.roles.roles_of(name))}
        if len(parts) == 2:
            name = parts[1]
            if name not in self.auth._users:
                raise ApiError(404, f"unknown user {name}")
            if method == "PUT":
                # update password and/or role (reference USER_UPDATE)
                role = body.str_field("role", self.auth._roles.get(name, "user"))
                if "password" in body:
                    self.auth.add_user(name, body.str_field("password"), role=role)
                else:
                    self.auth._roles[name] = role
                return {"ok": True}
            if method == "DELETE":
                if name == user["user"]:
                    raise ApiError(409, "cannot delete the calling user")
                del self.auth._users[name]
                self.auth._roles.pop(name, None)
                for r in self.roles.roles_of(name):
                    self.roles.remove_user(r, name)
                return {"ok": True}
        raise ApiError(404, "unknown users route")

    def _role_routes(self, method, parts, body, user):
        """ROLES / PERMISSIONS / USER_ROLES surface (reference
        rest_urls/mod.rs:75-121).  Mutations need the security surface
        (sa or ss permission, authz.rs's Authz<SysAdmin, SecAdmin>)."""
        r = self.roles
        if method != "GET":
            self._require_security(user)
        if len(parts) == 1:
            if method == "GET":
                return r.list_roles()
            if method == "POST":
                r.create_role(body.str_field("name"))
                return {"ok": True, "name": body["name"]}
        name = parts[1]
        sub = parts[2] if len(parts) > 2 else ""
        try:
            if not sub:
                if method == "GET":
                    return {"name": name, "permissions": r.permissions(name)}
                if method == "PUT":
                    # replace the grant set atomically (UPDATE_ROLE, :87)
                    # — validate the NESTED structure at the parsing
                    # boundary too: a non-list, a non-object item, or an
                    # item without a known permission_type is the
                    # caller's mistake (400), not a server bug (500)
                    wanted = body.get("permissions", [])
                    if not isinstance(wanted, list):
                        raise ApiError(400, "permissions must be a list")
                    for p in wanted:            # validate before mutating
                        if not isinstance(p, dict):
                            raise ApiError(
                                400, "each permission must be an object")
                        if p.get("permission_type") not in PERMISSION_TYPES:
                            raise ApiError(
                                400, f"unknown permission type "
                                     f"{p.get('permission_type')}")
                    for p in list(r.permissions(name)):
                        r.revoke(name, p["permission_type"], p["entity"])
                    for p in wanted:
                        r.grant(name, p["permission_type"],
                                p.get("entity", "*"))
                    return {"ok": True, "permissions": r.permissions(name)}
                if method == "DELETE":
                    r.delete_role(name)
                    return {"ok": True}
            if sub == "permissions":
                if method == "GET":
                    return r.permissions(name)
                if method == "POST":
                    r.grant(name, body.str_field("permission_type"),
                            body.str_field("entity", "*"))
                    return {"ok": True}
                if method == "DELETE":
                    r.revoke(name, parts[3] if len(parts) > 3
                             else body.str_field("permission_type", ""),
                             body.str_field("entity", "*"))
                    return {"ok": True}
            if sub == "users":
                if method == "GET":
                    return r.users(name)
                if method == "POST":
                    r.add_user(name, body.str_field("user"))
                    return {"ok": True}
                if method == "DELETE" and len(parts) > 3:
                    r.remove_user(name, parts[3])
                    return {"ok": True}
        except AuthError as e:
            raise ApiError(404 if "unknown" in str(e) else 409, str(e)) \
                from None
        raise ApiError(404, f"unknown roles route {method} {sub}")

    # -- collections / tables / functions ------------------------------
    def _collection_routes(self, method, parts, query, body, user):
        meta = self.store.meta
        if len(parts) == 1:
            if method == "GET":
                return meta.list_collections()
            if method == "POST":
                # collection creation is an admin operation (reference
                # authz: CollAdmin/SysAdmin create collections)
                self._require_security(user)
                meta.ensure_collection(body.str_field("name"))
                return {"ok": True, "name": body["name"]}
        collection = parts[1]
        if len(parts) == 2:
            names = {c["name"]: c for c in meta.list_collections()}
            if collection not in names:
                raise ApiError(404, f"unknown collection {collection}")
            if method == "GET":
                return names[collection]
            from ..errors import VersionResolutionError

            if method == "PUT":
                # rename (UPDATE_COLLECTION, :136) — version paths are
                # absolute so data keeps reading under the new name
                self._require_security(user, collection)
                try:
                    meta.rename_collection(collection, body.str_field("name"))
                except VersionResolutionError as e:
                    raise ApiError(409, str(e)) from None
                # role grants scoped to the old name follow the rename —
                # otherwise every ca/cx/cr on the collection silently dies
                for perms in self.roles._perms.values():
                    for p in perms:
                        if p["entity"] == collection:
                            p["entity"] = body["name"]
                return {"ok": True, "name": body["name"]}
            if method == "DELETE":
                # refuse while tables exist (DELETE_COLLECTION, :137)
                self._require_security(user, collection)
                try:
                    meta.drop_collection(collection)
                except VersionResolutionError as e:
                    raise ApiError(409, str(e)) from None
                if self.engine is not None:
                    for key in [k for k in self.engine.graph.functions
                                if k.startswith(collection + "/")]:
                        self.engine.unregister(*key.split("/", 1))
                return {"ok": True}
        sub = parts[2] if len(parts) > 2 else ""
        if sub == "tables":
            return self._table_routes(method, collection, parts[3:], query,
                                      user)
        if sub == "functions":
            return self._function_routes(method, collection, parts[3:],
                                         query, body, user)
        if sub == "inter-collection-permissions":
            return self._inter_routes(method, collection, parts[3:], body,
                                      user)
        raise ApiError(404, f"unknown collection route {sub}")

    def _inter_routes(self, method, collection, rest, body, user):
        """Inter-collection permissions (reference rest_urls/mod.rs:147-152):
        `collection` grants `to_collection` read access to its tables,
        enforced by the engine at input-resolution time.  Mutations need
        the security surface or collection-admin on the granting side."""
        meta = self.store.meta
        if method == "GET" and not rest:
            return meta.list_inter(collection)
        self._require_security(user, collection)
        if method == "POST" and not rest:
            meta.grant_inter(collection, body.str_field("to_collection"))
            return {"ok": True}
        if method == "DELETE":
            to = rest[0] if rest else body.str_field("to_collection", "")
            if not to:
                raise ApiError(400, "to_collection required")
            meta.revoke_inter(collection, to)
            return {"ok": True}
        raise ApiError(404, "unknown inter-collection-permissions route")

    def _table_routes(self, method, collection, rest, query, user=None):
        from ..store import services

        meta = self.store.meta
        if not rest:
            return meta.list_tables(collection)
        table = rest[0]
        sub = rest[1] if len(rest) > 1 else ""
        uri = f"{collection}/{table}"
        if query.get("at"):
            uri += f"@{query['at']}"
        if method == "POST" and sub == "vacuum":
            # retention is destructive: security surface required
            self._require_security(user, collection)
            keep = (None if query.get("keep_last") is None
                    else _int_param(query, "keep_last", 0))
            return self.store.vacuum(collection, table, keep_last=keep)
        if method == "DELETE" and not sub:
            # TABLE_DELETE (:237): metadata rows + every version's files
            self._require_security(user, collection)
            if table not in meta.list_tables(collection):
                raise ApiError(404, f"unknown table {collection}/{table}")
            return self.store.drop_table(collection, table)
        if method != "GET":
            raise ApiError(405, "tables are read-only over the API")
        if sub == "schema":
            return services.table_schema(self.spark, self.store, uri)
        if sub == "sample":
            fmt = query.get("format", "rows")
            if fmt not in ("rows", "json", "csv"):
                raise ApiError(400, f"unknown sample format {fmt!r}")
            return services.sample_table(
                self.spark, self.store, uri,
                offset=_int_param(query, "offset", 0),
                length=_int_param(query, "len", 100),
                sql=query.get("sql"), fmt=fmt)
        if sub == "data-versions":
            return meta.version_rows(collection, table)
        if sub == "download":
            dest = query.get("dest")
            if not dest:
                raise ApiError(400, "download requires ?dest=<path>")
            fmt = query.get("format", "parquet")
            if fmt not in ("parquet", "csv", "json", "orc"):
                raise ApiError(400, f"unknown download format {fmt!r}")
            path = services.download_table(
                self.spark, self.store, uri, self._confine_dest(dest),
                fmt=fmt, sql=query.get("sql"))
            return {"path": path}
        raise ApiError(404, f"unknown table route {sub}")

    def _confine_dest(self, dest: str) -> str:
        """Confine a client-supplied download path to export_root.
        Relative paths are joined under it; absolute paths must already
        resolve inside it (symlink/.. tricks die at realpath)."""
        import os

        resolved = os.path.realpath(
            dest if os.path.isabs(dest)
            else os.path.join(self.export_root, dest))
        if resolved != self.export_root and \
                not resolved.startswith(self.export_root + os.sep):
            raise ApiError(
                403, f"download dest must be under export root "
                     f"{self.export_root}")
        os.makedirs(os.path.dirname(resolved), exist_ok=True)
        return resolved

    def _function_routes(self, method, collection, rest, query, body=None,
                         user=None):
        if not rest:
            return self._functions(collection)
        fn = rest[0]
        sub = rest[1] if len(rest) > 1 else ""
        meta = self.store.meta
        if method == "GET" and not sub:
            for row in self._functions(collection):
                if row["name"] == fn:
                    return row
            raise ApiError(404, f"unknown function {collection}/{fn}")
        if method in ("PUT", "DELETE") and not sub:
            self._require_security(user, collection)
            existing = {row["name"]: row for row in self._functions(collection)}
            if fn not in existing:
                raise ApiError(404, f"unknown function {collection}/{fn}")
            if method == "DELETE":
                # FUNCTION_DELETE (:168): registry row + trigger edges
                if self.engine is not None:
                    self.engine.unregister(collection, fn)
                else:
                    meta.drop_function(collection, fn)
                return {"ok": True}
            # FUNCTION_UPDATE (:171): metadata-level spec update (tables/
            # trigger lists); the callable itself changes via the bundle
            cur = existing[fn]
            meta.register_function(
                collection, fn, (body or {}).get("kind", cur["kind"]),
                json.dumps((body or {}).get("input_tables",
                                            cur["input_tables"])),
                json.dumps((body or {}).get("output_tables",
                                            cur["output_tables"])),
                json.dumps((body or {}).get("trigger_by", cur["trigger_by"]))
                if ((body or {}).get("trigger_by", cur["trigger_by"])
                    is not None) else None)
            for row in self._functions(collection):
                if row["name"] == fn:
                    return row
        if method == "GET" and sub == "history":
            return meta.list_runs(collection, fn)
        if sub == "bundle":
            # function code bundle upload/fetch (reference
            # rest_urls/mod.rs:172 FUNCTION_UPLOAD: the packaged code a
            # worker materializes into its venv; here stored verbatim in
            # the warehouse, keyed by (collection, fn)).
            import base64
            import os

            bdir = os.path.join(self.store.root, "bundles", collection)
            bpath = os.path.join(bdir, f"{fn}.bundle")
            if method == "POST":
                # bundles are CODE the isolation path will execute on the
                # server — upload is an admin/collection-admin operation
                # (reference gates function deploys on collection dev)
                self._require_security(user, collection)
                os.makedirs(bdir, exist_ok=True)
                try:
                    raw = base64.b64decode((body or {})["content"])
                except (KeyError, ValueError):
                    raise ApiError(400, "bundle needs base64 'content'") \
                        from None
                with open(bpath, "wb") as f:
                    f.write(raw)
                return {"ok": True, "size": len(raw)}
            if method == "GET":
                if not os.path.exists(bpath):
                    raise ApiError(404, f"no bundle for {collection}/{fn}")
                with open(bpath, "rb") as f:
                    raw = f.read()
                return {"content": base64.b64encode(raw).decode(),
                        "size": len(raw)}
        if method == "POST" and sub == "execute":
            if self.engine is None:
                raise ApiError(503, "no execution engine attached")
            # execution needs the exec permission on the collection
            # (reference authz CollectionExec 'cx'); security surface
            # qualifies implicitly
            if not (user and (self.roles.user_allows(
                    user["user"], user["role"], "cx", collection)
                    or self._has_security(user, collection))):
                raise ApiError(403, f"needs exec (cx) permission on "
                                    f"{collection}")
            reports = self.engine.trigger(collection, fn)
            return [{"function": r.function, "status": r.status,
                     "published": r.published, "error": r.error}
                    for r in reports]
        raise ApiError(404, f"unknown function route {sub}")

    def _functions(self, collection: str | None):
        rows = []
        for coll, name, kind, inp, outp, trig in self.store.meta.list_functions():
            if collection is not None and coll != collection:
                continue
            rows.append({
                "collection": coll, "name": name, "kind": kind,
                "input_tables": json.loads(inp) if inp else [],
                "output_tables": json.loads(outp) if outp else [],
                "trigger_by": json.loads(trig) if trig else None,
            })
        return rows

    def _transactions(self):
        with self.store.meta._conn() as c:
            cols = ["id", "status", "created_at", "committed_at"]
            return [dict(zip(cols, r)) for r in c.execute(
                "SELECT id, status, created_at, committed_at FROM transactions "
                "ORDER BY created_at DESC")]

    def _transaction_routes(self, method, parts, user):
        """TRANSACTIONS list/cancel/recover (reference
        rest_urls/mod.rs:260-271)."""
        from ..errors import VersionResolutionError

        if method == "GET" and len(parts) == 1:
            return self._transactions()
        if method == "POST" and len(parts) == 3:
            txn_id, action = parts[1], parts[2]
            self._require_security(user)
            try:
                if action == "cancel":
                    self.store.meta.cancel_transaction(txn_id)
                    return {"ok": True, "id": txn_id, "status": "canceled"}
                if action == "recover":
                    self.store.meta.recover_transaction(txn_id)
                    return {"ok": True, "id": txn_id, "status": "open"}
            except VersionResolutionError as e:
                raise ApiError(
                    404 if "unknown" in str(e) else 409, str(e)) from None
        raise ApiError(404, "unknown transactions route")

    def _execution_routes(self, method, parts, user):
        """EXECUTIONS surface (reference rest_urls/mod.rs:245-254): an
        execution groups the function runs of one trigger cascade;
        cancel/recover fan out to every non-committed run's transaction."""
        runs = self.store.meta.list_runs()
        by_exec: dict[str, list[dict]] = {}
        for r in runs:
            by_exec.setdefault(r["txn_id"], []).append(r)
        if method == "GET" and len(parts) == 1:
            out = []
            for eid, rs in by_exec.items():
                statuses = {r["status"] for r in rs}
                status = ("failed" if "failed" in statuses else
                          "canceled" if "canceled" in statuses else
                          "scheduled" if "scheduled" in statuses else
                          "committed")
                out.append({"id": eid, "runs": len(rs), "status": status,
                            "triggered_on": min(r["triggered_on"] for r in rs)})
            return sorted(out, key=lambda e: e["triggered_on"], reverse=True)
        if method == "POST" and len(parts) == 3:
            eid, action = parts[1], parts[2]
            if eid not in by_exec:
                raise ApiError(404, f"unknown execution {eid}")
            self._require_security(user)
            if action not in ("cancel", "recover"):
                raise ApiError(404, f"unknown executions action {action}")
            new_status = "canceled" if action == "cancel" else "scheduled"
            from_states = (("scheduled", "failed") if action == "cancel"
                           else ("canceled", "failed"))
            n = 0
            for r in by_exec[eid]:
                if r["status"] in from_states:
                    self.store.meta.set_run_status(r["id"], new_status)
                    n += 1
            return {"ok": True, "id": eid, "runs_updated": n}
        raise ApiError(404, "unknown executions route")

    def _worker_routes(self, method, parts, query):
        """WORKERS list + logs (reference rest_urls/mod.rs:277-287).  One
        in-process run == one worker; logs come from run_logs rows the
        engine appends at start/commit/fail."""
        if method != "GET":
            raise ApiError(405, "workers are read-only")
        if len(parts) == 1:
            runs = self.store.meta.list_runs(
                query.get("collection"), query.get("fn"))
            return [{"id": r["id"], "collection": r["collection"],
                     "function": r["function"], "status": r["status"],
                     "started_on": r["triggered_on"],
                     "finished_at": r["finished_at"],
                     "execution_id": r["txn_id"]} for r in runs]
        if len(parts) == 3 and parts[2] == "logs":
            lines = self.store.meta.logs(parts[1])
            if not lines:
                raise ApiError(404, f"no logs for worker {parts[1]}")
            return lines
        raise ApiError(404, "unknown workers route")


__all__ = ["ApiServer", "ApiError"]
