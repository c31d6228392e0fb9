"""SDK-style HTTP client for the control-plane server.

Reference counterpart: the generated Python client under
client/td-sdk/tabsdata/api/apiserver.py (requests-based, bearer auth,
refresh-on-expiry).  Stdlib urllib here — no external dependency.
"""

from __future__ import annotations

import json
from typing import Any
from urllib.error import HTTPError
from urllib.parse import urlencode
from urllib.request import Request, urlopen

from .server import ApiError


class ApiClient:
    """Thin typed wrapper over the REST surface.

    >>> c = ApiClient(server.base_url)
    >>> c.login("admin", "tabsdata")
    >>> c.collections()
    """

    def __init__(self, base_url: str, timeout: float = 30.0,
                 cafile: str | None = None):
        """`cafile` — CA bundle (or the self-signed server cert itself)
        used to verify an https server; None uses system trust."""
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._token: str | None = None
        self._ssl_ctx = None
        if cafile is not None:
            import ssl

            self._ssl_ctx = ssl.create_default_context(cafile=cafile)

    # -- transport -----------------------------------------------------
    def _request(self, method: str, path: str, query: dict | None = None,
                 body: dict | None = None) -> Any:
        url = f"{self.base_url}/{path.lstrip('/')}"
        if query:
            url += "?" + urlencode({k: v for k, v in query.items()
                                    if v is not None})
        data = json.dumps(body).encode() if body is not None else None
        req = Request(url, data=data, method=method)
        req.add_header("Content-Type", "application/json")
        if self._token:
            req.add_header("Authorization", f"Bearer {self._token}")
        try:
            with urlopen(req, timeout=self.timeout,
                         context=self._ssl_ctx) as resp:
                return json.loads(resp.read())
        except HTTPError as e:
            try:
                message = json.loads(e.read()).get("error", str(e))
            except Exception:
                message = str(e)
            raise ApiError(e.code, message) from None

    def _get(self, path, **query):
        return self._request("GET", path, query=query or None)

    def _post(self, path, **body):
        return self._request("POST", path, body=body)

    def _put(self, path, **body):
        return self._request("PUT", path, body=body)

    def _delete(self, path, **body):
        return self._request("DELETE", path, body=body or None)

    # -- auth ----------------------------------------------------------
    def login(self, name: str, password: str) -> dict:
        out = self._post("auth/login", name=name, password=password)
        self._token = out["access_token"]
        return out

    def refresh(self) -> dict:
        out = self._post("auth/refresh")
        self._token = out["access_token"]
        return out

    def logout(self) -> None:
        self._post("auth/logout")
        self._token = None

    def user_info(self) -> dict:
        return self._get("auth/info")

    def change_password(self, old: str, new: str) -> dict:
        return self._post("auth/password_change",
                          old_password=old, new_password=new)

    def change_role(self, role: str) -> dict:
        out = self._post("auth/role_change", role=role)
        self._token = out["access_token"]
        return out

    def ssl_cert(self) -> str:
        return self._get("ssl-cert")["pem"]

    # -- status --------------------------------------------------------
    def status(self) -> dict:
        return self._get("status")

    def runtime_info(self) -> dict:
        return self._get("runtime-info")

    # -- users ---------------------------------------------------------
    def users(self) -> list[dict]:
        return self._get("users")

    def create_user(self, name: str, password: str, role: str = "user") -> dict:
        return self._post("users", name=name, password=password, role=role)

    def update_user(self, name: str, password: str | None = None,
                    role: str | None = None) -> dict:
        body = {}
        if password is not None:
            body["password"] = password
        if role is not None:
            body["role"] = role
        return self._put(f"users/{name}", **body)

    def delete_user(self, name: str) -> dict:
        return self._delete(f"users/{name}")

    def user(self, name: str) -> dict:
        return self._get(f"users/{name}")

    # -- collections / tables ------------------------------------------
    def collections(self) -> list[dict]:
        return self._get("collections")

    def create_collection(self, name: str) -> dict:
        return self._post("collections", name=name)

    def collection(self, name: str) -> dict:
        return self._get(f"collections/{name}")

    def rename_collection(self, name: str, new_name: str) -> dict:
        return self._put(f"collections/{name}", name=new_name)

    def delete_collection(self, name: str) -> dict:
        return self._delete(f"collections/{name}")

    def all_tables(self) -> list[dict]:
        return self._get("tables")

    def delete_table(self, collection: str, table: str) -> dict:
        return self._delete(f"collections/{collection}/tables/{table}")

    def tables(self, collection: str) -> list[str]:
        return self._get(f"collections/{collection}/tables")

    def table_schema(self, collection: str, table: str,
                     at: str | None = None) -> list[dict]:
        return self._get(f"collections/{collection}/tables/{table}/schema",
                         at=at)

    def sample(self, collection: str, table: str, offset: int = 0,
               length: int = 100, sql: str | None = None,
               fmt: str = "rows", at: str | None = None) -> Any:
        return self._get(f"collections/{collection}/tables/{table}/sample",
                         offset=offset, len=length, sql=sql, format=fmt, at=at)

    def data_versions(self, collection: str, table: str) -> list[dict]:
        return self._get(
            f"collections/{collection}/tables/{table}/data-versions")

    def vacuum(self, collection: str, table: str,
               keep_last: int | None = None) -> dict:
        return self._request("POST",
                             f"collections/{collection}/tables/{table}/vacuum",
                             query={"keep_last": keep_last})

    def download(self, collection: str, table: str, dest: str,
                 fmt: str = "parquet", sql: str | None = None) -> dict:
        return self._get(f"collections/{collection}/tables/{table}/download",
                         dest=dest, format=fmt, sql=sql)

    # -- functions / executions ----------------------------------------
    def functions(self, collection: str | None = None) -> list[dict]:
        path = (f"collections/{collection}/functions"
                if collection else "functions")
        return self._get(path)

    def function(self, collection: str, name: str) -> dict:
        return self._get(f"collections/{collection}/functions/{name}")

    def update_function(self, collection: str, name: str, **spec) -> dict:
        return self._put(f"collections/{collection}/functions/{name}", **spec)

    def delete_function(self, collection: str, name: str) -> dict:
        return self._delete(f"collections/{collection}/functions/{name}")

    def set_role_permissions(self, role: str,
                             permissions: list[dict]) -> dict:
        return self._put(f"roles/{role}", permissions=permissions)

    def history(self, collection: str, name: str) -> list[dict]:
        return self._get(f"collections/{collection}/functions/{name}/history")

    def execute(self, collection: str, name: str) -> list[dict]:
        return self._post(f"collections/{collection}/functions/{name}/execute")

    def transactions(self) -> list[dict]:
        return self._get("transactions")

    def cancel_transaction(self, txn_id: str) -> dict:
        return self._post(f"transactions/{txn_id}/cancel")

    def recover_transaction(self, txn_id: str) -> dict:
        return self._post(f"transactions/{txn_id}/recover")

    def executions(self) -> list[dict]:
        return self._get("executions")

    def cancel_execution(self, execution_id: str) -> dict:
        return self._post(f"executions/{execution_id}/cancel")

    def recover_execution(self, execution_id: str) -> dict:
        return self._post(f"executions/{execution_id}/recover")

    def workers(self, collection: str | None = None,
                fn: str | None = None) -> list[dict]:
        return self._get("workers", collection=collection, fn=fn)

    def worker_logs(self, worker_id: str) -> list[dict]:
        return self._get(f"workers/{worker_id}/logs")

    def upload_bundle(self, collection: str, fn: str, content: bytes) -> dict:
        import base64
        return self._post(f"collections/{collection}/functions/{fn}/bundle",
                          content=base64.b64encode(content).decode())

    def download_bundle(self, collection: str, fn: str) -> bytes:
        import base64
        out = self._get(f"collections/{collection}/functions/{fn}/bundle")
        return base64.b64decode(out["content"])

    # -- inter-collection permissions ----------------------------------
    def inter_permissions(self, collection: str) -> list[dict]:
        return self._get(
            f"collections/{collection}/inter-collection-permissions")

    def grant_inter(self, collection: str, to_collection: str) -> dict:
        return self._post(
            f"collections/{collection}/inter-collection-permissions",
            to_collection=to_collection)

    def revoke_inter(self, collection: str, to_collection: str) -> dict:
        return self._delete(
            f"collections/{collection}/inter-collection-permissions/"
            f"{to_collection}")

    def function_runs(self, collection: str | None = None,
                      fn: str | None = None) -> list[dict]:
        return self._get("function_runs", collection=collection, fn=fn)

    # -- roles / permissions -------------------------------------------
    def roles(self) -> list[dict]:
        return self._get("roles")

    def create_role(self, name: str) -> dict:
        return self._post("roles", name=name)

    def delete_role(self, name: str) -> dict:
        return self._delete(f"roles/{name}")

    def revoke(self, role: str, permission_type: str,
               entity: str = "*") -> dict:
        return self._delete(f"roles/{role}/permissions",
                            permission_type=permission_type, entity=entity)

    def grant(self, role: str, permission_type: str,
              entity: str = "*") -> dict:
        return self._post(f"roles/{role}/permissions",
                          permission_type=permission_type, entity=entity)

    def role_permissions(self, role: str) -> list[dict]:
        return self._get(f"roles/{role}/permissions")

    def role_users(self, role: str) -> list[str]:
        return self._get(f"roles/{role}/users")

    def assign_role(self, role: str, user: str) -> dict:
        return self._post(f"roles/{role}/users", user=user)


__all__ = ["ApiClient"]
