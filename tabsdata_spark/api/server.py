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

from .auth import AuthError, Authenticator, RoleStore

BASE = "/api/v1"

# Routes callable without a bearer token (reference: AUTH_LOGIN plus the
# liveness probe SERVER_STATUS).
_PUBLIC = {("POST", "auth/login"), ("GET", "status")}


class ApiError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


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
                 host: str = "127.0.0.1", port: int = 0):
        self.spark = spark
        self.store = store
        self.engine = engine
        self.auth = auth or Authenticator()
        self.roles = RoleStore()
        self._revoked: set[str] = set()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # silence per-request stderr logging
            def log_message(self, *a):  # noqa: D102
                pass

            def _json_body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                if not n:
                    return {}
                try:
                    return json.loads(self.rfile.read(n))
                except json.JSONDecodeError:
                    raise ApiError(400, "invalid JSON body") from None

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
                    result = outer._route(method, rel.split("/"), query,
                                          self._json_body() if method in
                                          ("POST", "PUT", "PATCH") else {}, user)
                    self._respond(200, result)
                except ApiError as e:
                    self._respond(e.status, {"error": e.message})
                except AuthError as e:
                    self._respond(401, {"error": str(e)})
                except Exception as e:  # surface, don't kill the thread
                    self._respond(500, {"error": str(e),
                                        "trace": traceback.format_exc(limit=5)})

            def do_GET(self):
                self._handle("GET")

            def do_POST(self):
                self._handle("POST")

            def do_DELETE(self):
                self._handle("DELETE")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: threading.Thread | None = None

    # -- lifecycle -----------------------------------------------------
    @property
    def base_url(self) -> str:
        return f"http://{self.host}:{self.port}{BASE}"

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
        if head == "runtime-info" and method == "GET":
            return {
                "engine": "tabsdata-spark",
                "spark_version": self.spark.version,
                "master": self.spark.sparkContext.master,
                "default_parallelism": self.spark.sparkContext.defaultParallelism,
            }
        if head == "collections":
            return self._collection_routes(method, parts, query, body)
        if head == "transactions" and method == "GET":
            return self._transactions()
        if head == "users":
            return self._user_routes(method, parts, body)
        if head == "roles":
            return self._role_routes(method, parts, body, user)
        if head == "functions" and method == "GET":
            return self._functions(None)
        if head == "function_runs" and method == "GET":
            return self.store.meta.list_runs(
                query.get("collection"), query.get("fn"))
        raise ApiError(404, f"unknown route {method} {'/'.join(parts)}")

    def _auth_routes(self, method, parts, body, user):
        sub = parts[1] if len(parts) > 1 else ""
        if method == "POST" and sub == "login":
            try:
                return self.auth.login(body.get("name", ""),
                                       body.get("password", ""))
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
                                            body.get("old_password", "")):
                raise ApiError(403, "old password does not match")
            self.auth.add_user(user["user"], body["new_password"],
                               role=user["role"])
            return {"ok": True}
        raise ApiError(404, f"unknown auth route {method} {sub}")

    def _user_routes(self, method, parts, body):
        if method == "GET" and len(parts) == 1:
            return [{"name": n, "role": self.auth._roles.get(n, "user")}
                    for n in sorted(self.auth._users)]
        if method == "POST" and len(parts) == 1:
            self.auth.add_user(body["name"], body["password"],
                               role=body.get("role", "user"))
            return {"ok": True}
        raise ApiError(404, "unknown users route")

    def _role_routes(self, method, parts, body, user):
        """ROLES / PERMISSIONS / USER_ROLES surface (reference
        rest_urls/mod.rs:75-121).  Mutations need the security surface
        (sa or ss permission, authz.rs's Authz<SysAdmin, SecAdmin>)."""
        r = self.roles
        if method != "GET":
            role = user["role"] if user else ""
            if not (r.allows(role, "sa") or r.allows(role, "ss")):
                raise ApiError(403, "needs sys_admin/sec_admin permission")
        if len(parts) == 1:
            if method == "GET":
                return r.list_roles()
            if method == "POST":
                r.create_role(body["name"])
                return {"ok": True, "name": body["name"]}
        name = parts[1]
        sub = parts[2] if len(parts) > 2 else ""
        try:
            if not sub:
                if method == "GET":
                    return {"name": name, "permissions": r.permissions(name)}
                if method == "DELETE":
                    r.delete_role(name)
                    return {"ok": True}
            if sub == "permissions":
                if method == "GET":
                    return r.permissions(name)
                if method == "POST":
                    r.grant(name, body["permission_type"],
                            body.get("entity", "*"))
                    return {"ok": True}
                if method == "DELETE":
                    r.revoke(name, parts[3] if len(parts) > 3
                             else body.get("permission_type", ""),
                             body.get("entity", "*"))
                    return {"ok": True}
            if sub == "users":
                if method == "GET":
                    return r.users(name)
                if method == "POST":
                    r.add_user(name, body["user"])
                    return {"ok": True}
                if method == "DELETE" and len(parts) > 3:
                    r.remove_user(name, parts[3])
                    return {"ok": True}
        except AuthError as e:
            raise ApiError(404 if "unknown" in str(e) else 409, str(e)) \
                from None
        raise ApiError(404, f"unknown roles route {method} {sub}")

    # -- collections / tables / functions ------------------------------
    def _collection_routes(self, method, parts, query, body):
        meta = self.store.meta
        if len(parts) == 1:
            if method == "GET":
                return meta.list_collections()
            if method == "POST":
                meta.ensure_collection(body["name"])
                return {"ok": True, "name": body["name"]}
        collection = parts[1]
        if len(parts) == 2 and method == "GET":
            names = {c["name"]: c for c in meta.list_collections()}
            if collection not in names:
                raise ApiError(404, f"unknown collection {collection}")
            return names[collection]
        sub = parts[2] if len(parts) > 2 else ""
        if sub == "tables":
            return self._table_routes(method, collection, parts[3:], query)
        if sub == "functions":
            return self._function_routes(method, collection, parts[3:], query)
        raise ApiError(404, f"unknown collection route {sub}")

    def _table_routes(self, method, collection, rest, query):
        from ..store import services

        meta = self.store.meta
        if not rest:
            return meta.list_tables(collection)
        table = rest[0]
        sub = rest[1] if len(rest) > 1 else ""
        uri = f"{collection}/{table}"
        if query.get("at"):
            uri += f"@{query['at']}"
        if method != "GET":
            raise ApiError(405, "tables are read-only over the API")
        if sub == "schema":
            return services.table_schema(self.spark, self.store, uri)
        if sub == "sample":
            return services.sample_table(
                self.spark, self.store, uri,
                offset=int(query.get("offset", 0)),
                length=int(query.get("len", 100)),
                sql=query.get("sql"),
                fmt=query.get("format", "rows"))
        if sub == "data-versions":
            return meta.version_rows(collection, table)
        if sub == "download":
            dest = query.get("dest")
            if not dest:
                raise ApiError(400, "download requires ?dest=<path>")
            path = services.download_table(
                self.spark, self.store, uri, dest,
                fmt=query.get("format", "parquet"), sql=query.get("sql"))
            return {"path": path}
        raise ApiError(404, f"unknown table route {sub}")

    def _function_routes(self, method, collection, rest, query):
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
        if method == "GET" and sub == "history":
            return meta.list_runs(collection, fn)
        if method == "POST" and sub == "execute":
            if self.engine is None:
                raise ApiError(503, "no execution engine attached")
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


__all__ = ["ApiServer", "ApiError"]
