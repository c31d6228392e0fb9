"""REST control-plane tests: auth, collections/tables/functions routes,
execute-over-HTTP, end-to-end client<->server (reference test strategy:
apiserver integration tests, SURVEY §5)."""


import pytest

import tabsdata_spark as td
from tabsdata_spark.api import ApiClient, ApiServer
from tabsdata_spark.api.auth import AuthError, Authenticator
from tabsdata_spark.api.server import ApiError
from tabsdata_spark.pubsub import PubSubEngine
from tabsdata_spark.store import TableStore


# ---------------------------------------------------------------- auth unit
def test_auth_password_and_token_roundtrip():
    a = Authenticator({"alice": "pw1"})
    assert a.check_password("alice", "pw1")
    assert not a.check_password("alice", "nope")
    assert not a.check_password("ghost", "pw1")
    tok = a.login("alice", "pw1")
    payload = a.verify(tok["access_token"])
    assert payload["user"] == "alice"
    with pytest.raises(AuthError):
        a.verify(tok["access_token"] + "x")
    with pytest.raises(AuthError):
        a.login("alice", "wrong")


def test_auth_token_expiry():
    a = Authenticator({"u": "p"}, ttl_s=-1)
    tok = a.login("u", "p")["access_token"]
    with pytest.raises(AuthError):
        a.verify(tok)


# ---------------------------------------------------------------- server e2e
@pytest.fixture()
def served(spark, tmp_path):
    store = TableStore(str(tmp_path / "wh"))
    tf = td.TableFrame.from_dict(spark, {"k": [1, 2, 3], "v": ["a", "b", "c"]})
    store.write(tf, "sales", "orders")
    store.write(td.TableFrame.from_dict(spark, {"k": [1, 2, 3, 4]}),
                "sales", "orders")

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    (src_dir / "data.csv").write_text("n\n1\n2\n3\n")

    @td.publisher(td.LocalFileSource(str(src_dir / "*.csv"), format="csv"),
                  tables="raw")
    def pub(tf):
        return tf

    @td.transformer(input_tables=["raw"], output_tables=["doubled"])
    def double(raw):
        return raw.with_columns(n2=td.col("n").cast(int) * 2)

    engine = PubSubEngine(spark, store)
    engine.register("sales", pub)
    engine.register("sales", double)

    server = ApiServer(spark, store, engine=engine,
                       auth=Authenticator({"admin": "tabsdata"}))
    with server:
        client = ApiClient(server.base_url)
        client.login("admin", "tabsdata")
        yield server, client, store


def test_status_is_public(served):
    server, _, _ = served
    fresh = ApiClient(server.base_url)          # no login
    assert fresh.status() == {"status": "OK"}
    with pytest.raises(ApiError) as ei:
        fresh.collections()
    assert ei.value.status == 401


def test_login_and_info(served):
    _, client, _ = served
    info = client.user_info()
    assert info["user"] == "admin" and info["role"] == "admin"
    assert client.runtime_info()["engine"] == "tabsdata-spark"


def test_bad_login_rejected(served):
    server, _, _ = served
    c = ApiClient(server.base_url)
    with pytest.raises(ApiError) as ei:
        c.login("admin", "wrong")
    assert ei.value.status == 401


def test_logout_revokes_token(served):
    server, _, _ = served
    c = ApiClient(server.base_url)
    c.login("admin", "tabsdata")
    tok = c._token
    c.logout()
    c._token = tok                               # replay revoked token
    with pytest.raises(ApiError) as ei:
        c.collections()
    assert ei.value.status == 401


def test_collections_tables_schema_sample(served):
    _, client, _ = served
    names = [c["name"] for c in client.collections()]
    assert "sales" in names
    assert client.tables("sales") == ["orders"]
    schema = client.table_schema("sales", "orders")
    assert {f["name"] for f in schema} == {"k"}   # HEAD version has only k
    rows = client.sample("sales", "orders", length=10)
    assert sorted(r["k"] for r in rows) == [1, 2, 3, 4]
    # versioned read via ?at=
    old = client.sample("sales", "orders", at="HEAD~1")
    assert {f["name"] for f in
            client.table_schema("sales", "orders", at="HEAD~1")} == {"k", "v"}
    assert sorted(r["k"] for r in old) == [1, 2, 3]
    # SQL pushes through spark.sql
    agg = client.sample("sales", "orders",
                        sql="SELECT COUNT(*) AS n FROM orders")
    assert agg[0]["n"] == 4


def test_sample_csv_format(served):
    _, client, _ = served
    csv_text = client.sample("sales", "orders", fmt="csv")
    assert csv_text.splitlines()[0] == "k"


def test_data_versions_listing(served):
    _, client, _ = served
    versions = client.data_versions("sales", "orders")
    assert len(versions) == 2
    assert versions[0]["row_count"] == 3 and versions[1]["row_count"] == 4


def test_functions_and_execute(served):
    _, client, store = served
    fns = {f["name"]: f for f in client.functions("sales")}
    assert fns["pub"]["kind"] == "publisher"
    assert fns["double"]["input_tables"] == ["raw"]
    one = client.function("sales", "double")
    assert one["output_tables"] == ["doubled"]

    reports = client.execute("sales", "pub")
    assert [r["status"] for r in reports] == ["committed", "committed"]
    assert {r["function"] for r in reports} == {"sales/pub", "sales/double"}

    hist = client.history("sales", "pub")
    assert hist and hist[0]["status"] == "committed"
    assert len(client.transactions()) >= 2
    runs = client.function_runs()
    assert {r["function"] for r in runs} == {"pub", "double"}
    assert client.function_runs(fn="pub")[0]["status"] == "committed"


def test_unknown_routes_404(served):
    server, client, _ = served
    with pytest.raises(ApiError) as ei:
        client.collection("ghost")
    assert ei.value.status == 404
    with pytest.raises(ApiError) as ei:
        client.function("sales", "nope")
    assert ei.value.status == 404


def test_create_collection_and_user(served):
    server, client, _ = served
    client.create_collection("hr")
    assert "hr" in [c["name"] for c in client.collections()]
    client.create_user("bob", "pw", role="user")
    assert {"name": "bob", "role": "user"} in client.users()
    c2 = ApiClient(server.base_url)
    c2.login("bob", "pw")
    assert c2.user_info()["role"] == "user"


def test_password_change(served):
    server, _, _ = served
    c = ApiClient(server.base_url)
    c.login("admin", "tabsdata")
    with pytest.raises(ApiError) as ei:
        c.change_password("wrong-old", "x")
    assert ei.value.status == 403
    c.change_password("tabsdata", "newpw")
    c2 = ApiClient(server.base_url)
    c2.login("admin", "newpw")
    assert c2.user_info()["user"] == "admin"


def test_download_via_api(served, tmp_path):
    server, client, _ = served
    # relative dest lands under the server's export root
    out = client.download("sales", "orders", "dump")
    assert out["path"].startswith(server.export_root)
    import glob
    assert glob.glob(out["path"] + "/*.parquet")


def test_download_dest_confined_to_export_root(served, tmp_path):
    server, client, _ = served
    # absolute path outside the export root is rejected — a client must
    # not be able to make the server write to arbitrary filesystem paths
    with pytest.raises(ApiError) as ei:
        client.download("sales", "orders", str(tmp_path / "evil"))
    assert ei.value.status == 403
    with pytest.raises(ApiError) as ei:
        client.download("sales", "orders", "../../escape")
    assert ei.value.status == 403
    # absolute path INSIDE the export root is fine
    import os
    ok = os.path.join(server.export_root, "abs-dump")
    assert client.download("sales", "orders", ok)["path"] == ok


# ---------------------------------------------------------------- CLI
def _cli(served, tmp_path, *argv):
    import io
    from contextlib import redirect_stdout

    from tabsdata_spark.api import cli
    server, _, _ = served
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(["--server", server.base_url,
                       "--token-file", str(tmp_path / "tok.json"), *argv])
    return rc, buf.getvalue()


def test_cli_login_and_reads(served, tmp_path):
    rc, out = _cli(served, tmp_path, "login", "admin", "--password", "tabsdata")
    assert rc == 0 and "logged in" in out
    rc, out = _cli(served, tmp_path, "collection", "list")
    assert rc == 0 and '"sales"' in out
    rc, out = _cli(served, tmp_path, "table", "list", "sales")
    assert rc == 0 and "orders" in out
    rc, out = _cli(served, tmp_path, "table", "schema", "sales", "orders")
    assert rc == 0 and '"k"' in out
    rc, out = _cli(served, tmp_path, "table", "sample", "sales", "orders",
                   "--format", "csv")
    assert rc == 0 and out.splitlines()[0] == "k"
    rc, out = _cli(served, tmp_path, "table", "versions", "sales", "orders")
    assert rc == 0 and len(out.strip().splitlines()) == 2


def test_cli_fn_trigger_and_errors(served, tmp_path):
    _cli(served, tmp_path, "login", "admin", "--password", "tabsdata")
    rc, out = _cli(served, tmp_path, "fn", "list", "sales")
    assert rc == 0 and "publisher" in out
    rc, out = _cli(served, tmp_path, "fn", "trigger", "sales", "pub")
    assert rc == 0 and out.count('"committed"') == 2
    rc, out = _cli(served, tmp_path, "fn", "history", "sales", "pub")
    assert rc == 0 and "committed" in out
    rc, _ = _cli(served, tmp_path, "fn", "info", "sales", "ghost")
    assert rc == 1
    rc, out = _cli(served, tmp_path, "status")
    assert rc == 0 and "OK" in out


def test_cli_unauthenticated_fails(served, tmp_path):
    rc, _ = _cli(served, tmp_path, "collection", "list")   # no login
    assert rc == 1


def test_roles_and_permissions(served):
    server, client, _ = served
    names = {r["name"] for r in client.roles()}
    assert {"sys_admin", "sec_admin", "user", "admin"} <= names
    client.create_role("analyst")
    client.grant("analyst", "cr", entity="sales")
    client.grant("analyst", "cx", entity="sales")
    assert client.role_permissions("analyst") == [
        {"permission_type": "cr", "entity": "sales"},
        {"permission_type": "cx", "entity": "sales"}]
    client.assign_role("analyst", "bob")
    assert client.role_users("analyst") == ["bob"]
    client.delete_role("analyst")
    assert "analyst" not in {r["name"] for r in client.roles()}


def test_role_mutation_requires_admin_permission(served):
    server, client, _ = served
    client.create_user("eve", "pw", role="user")
    c2 = ApiClient(server.base_url)
    c2.login("eve", "pw")
    assert c2.roles()                          # reads allowed
    with pytest.raises(ApiError) as ei:
        c2.create_role("hax")
    assert ei.value.status == 403
    with pytest.raises(ApiError) as ei:
        c2.grant("user", "sa")
    assert ei.value.status == 403


def test_builtin_roles_protected(served):
    _, client, _ = served
    with pytest.raises(ApiError) as ei:
        client.delete_role("sys_admin")
    assert ei.value.status == 409
    with pytest.raises(ApiError) as ei:
        client.grant("ghost-role", "cr")
    assert ei.value.status == 404


def test_user_creation_requires_security(served):
    """Privilege-escalation gate: a 'user'-role caller must not be able to
    mint accounts (let alone admin ones)."""
    server, client, _ = served
    client.create_user("eve2", "pw", role="user")
    c2 = ApiClient(server.base_url)
    c2.login("eve2", "pw")
    assert c2.users()                              # reads allowed
    for kwargs in ({"role": "sys_admin"}, {"role": "user"}):
        with pytest.raises(ApiError) as ei:
            c2.create_user("sneaky", "pw", **kwargs)
        assert ei.value.status == 403


def test_role_membership_grants_authz(served):
    """Adding a user to sys_admin must actually grant the security surface
    (allows() unions memberships with the token role)."""
    server, client, _ = served
    client.create_user("carol", "pw", role="user")
    c2 = ApiClient(server.base_url)
    c2.login("carol", "pw")
    with pytest.raises(ApiError):
        c2.create_role("carols-role")              # plain user: denied
    client.assign_role("sys_admin", "carol")
    c2.create_role("carols-role")                  # membership now grants
    assert "carols-role" in {r["name"] for r in c2.roles()}
    client.delete_role("carols-role")


def test_admin_role_protected_from_delete(served):
    _, client, _ = served
    with pytest.raises(ApiError) as ei:
        client.delete_role("admin")
    assert ei.value.status == 409


def test_revoke_permission_via_delete_body(served):
    _, client, _ = served
    client.create_role("temp-role")
    client.grant("temp-role", "cr", entity="sales")
    assert client.role_permissions("temp-role")
    client.revoke("temp-role", "cr", entity="sales")
    assert client.role_permissions("temp-role") == []
    client.delete_role("temp-role")


def test_user_update_and_delete(served):
    server, client, _ = served
    client.create_user("dave", "old-pw", role="user")
    client.update_user("dave", password="new-pw", role="sys_admin")
    c2 = ApiClient(server.base_url)
    c2.login("dave", "new-pw")
    assert c2.user_info()["role"] == "sys_admin"
    with pytest.raises(ApiError) as ei:
        client.delete_user("admin")                # cannot delete self
    assert ei.value.status == 409
    client.delete_user("dave")
    with pytest.raises(ApiError):
        ApiClient(server.base_url).login("dave", "new-pw")
    with pytest.raises(ApiError) as ei:
        client.update_user("ghost", role="user")
    assert ei.value.status == 404


def test_inter_collection_permissions_enforced(served, spark):
    """Cross-collection reads need a grant from the source collection —
    the engine refuses input resolution without it."""
    server, client, store = served
    engine = server.engine
    client.create_collection("analytics")

    @td.transformer(input_tables=["sales/raw"], output_tables=["mirror"])
    def mirror_raw(raw):
        return raw

    engine.register("analytics", mirror_raw)
    client.execute("sales", "pub")                 # publishes sales/raw
    reports = client.execute("analytics", "mirror_raw")
    assert reports[0]["status"] == "failed"
    assert "inter-collection" in reports[0]["error"]

    client.grant_inter("sales", "analytics")
    assert client.inter_permissions("sales") == [
        {"to_collection": "analytics",
         "created_at": client.inter_permissions("sales")[0]["created_at"]}]
    reports = client.execute("analytics", "mirror_raw")
    assert reports[0]["status"] == "committed"

    client.revoke_inter("sales", "analytics")
    reports = client.execute("analytics", "mirror_raw")
    assert reports[0]["status"] == "failed"


def test_inter_collection_mutation_requires_security(served):
    server, client, _ = served
    client.create_user("mallory", "pw", role="user")
    c2 = ApiClient(server.base_url)
    c2.login("mallory", "pw")
    assert c2.inter_permissions("sales") == []     # reads allowed
    with pytest.raises(ApiError) as ei:
        c2.grant_inter("sales", "anywhere")
    assert ei.value.status == 403


def test_transaction_cancel_and_recover(served):
    _, client, store = served
    txn = store.meta.begin_transaction()
    client.cancel_transaction(txn)
    assert store.meta.transaction_status(txn) == "canceled"
    client.recover_transaction(txn)
    assert store.meta.transaction_status(txn) == "open"
    store.meta.commit_transaction(txn)
    with pytest.raises(ApiError) as ei:
        client.cancel_transaction(txn)             # committed is immutable
    assert ei.value.status == 409
    with pytest.raises(ApiError) as ei:
        client.cancel_transaction("no-such-txn")
    assert ei.value.status == 404


def test_executions_workers_and_logs(served):
    _, client, _ = served
    client.execute("sales", "pub")
    execs = client.executions()
    assert execs and execs[0]["status"] == "committed"
    assert execs[0]["runs"] == 2                   # pub + cascaded double
    workers = client.workers(collection="sales")
    assert {w["function"] for w in workers} == {"pub", "double"}
    logs = client.worker_logs(workers[0]["id"])
    text = " ".join(line["line"] for line in logs)
    assert "worker started" in text and "committed" in text
    with pytest.raises(ApiError) as ei:
        client.worker_logs("no-such-worker")
    assert ei.value.status == 404


def test_execution_cancel_recover(served):
    _, client, store = served
    # a failed run (unknown input table) leaves a recoverable execution
    @td.transformer(input_tables=["nope"], output_tables=["x"])
    def broken(nope):
        return nope

    _, client, store = served
    server = _
    server.engine.register("sales", broken)
    reports = client.execute("sales", "broken")
    assert reports[0]["status"] == "failed"
    eid = [e for e in client.executions() if e["status"] == "failed"][0]["id"]
    out = client.cancel_execution(eid)
    assert out["runs_updated"] == 1
    assert [e for e in client.executions() if e["id"] == eid][0]["status"] \
        == "canceled"
    client.recover_execution(eid)
    assert [e for e in client.executions() if e["id"] == eid][0]["status"] \
        == "scheduled"


def test_bundle_upload_roundtrip(served):
    _, client, _ = served
    payload = b"def pub(tf):\n    return tf\n" * 10
    out = client.upload_bundle("sales", "pub", payload)
    assert out["size"] == len(payload)
    assert client.download_bundle("sales", "pub") == payload
    with pytest.raises(ApiError) as ei:
        client.download_bundle("sales", "ghost")
    assert ei.value.status == 404


def test_cli_role_commands(served, tmp_path):
    _cli(served, tmp_path, "login", "admin", "--password", "tabsdata")
    rc, out = _cli(served, tmp_path, "role", "create", "ops")
    assert rc == 0
    rc, out = _cli(served, tmp_path, "role", "grant", "ops", "cx",
                   "--entity", "sales")
    assert rc == 0
    rc, out = _cli(served, tmp_path, "role", "add-user", "ops", "carol")
    assert rc == 0
    rc, out = _cli(served, tmp_path, "role", "users", "ops")
    assert rc == 0 and "carol" in out
    rc, out = _cli(served, tmp_path, "role", "list")
    assert rc == 0 and '"ops"' in out
    rc, out = _cli(served, tmp_path, "role", "delete", "ops")
    assert rc == 0


def test_docs_route_public_and_complete(served):
    server, _, _ = served
    fresh = ApiClient(server.base_url)            # no login needed
    docs = fresh._get("docs")
    listed = {(d["method"], d["path"]) for d in docs}
    assert ("POST", "/auth/login") in listed
    assert ("GET", "/workers/{id}/logs") in listed
    assert ("POST", "/collections/{c}/inter-collection-permissions") in listed
    assert len(listed) == len(docs)               # no duplicate rows


def test_cli_new_command_groups(served, tmp_path):
    _cli(served, tmp_path, "login", "admin", "--password", "tabsdata")
    rc, out = _cli(served, tmp_path, "docs")
    assert rc == 0 and "/workers/{id}/logs" in out
    rc, out = _cli(served, tmp_path, "fn", "trigger", "sales", "pub")
    assert rc == 0
    rc, out = _cli(served, tmp_path, "worker", "list", "--collection", "sales")
    assert rc == 0 and '"pub"' in out
    wid = __import__("json").loads(out.splitlines()[0])["id"]
    rc, out = _cli(served, tmp_path, "worker", "logs", wid)
    assert rc == 0 and "worker started" in out
    rc, out = _cli(served, tmp_path, "exec", "list")
    assert rc == 0 and "committed" in out
    rc, out = _cli(served, tmp_path, "perm", "grant", "sales", "analytics2")
    assert rc == 0
    rc, out = _cli(served, tmp_path, "perm", "list", "sales")
    assert rc == 0 and "analytics2" in out
    rc, out = _cli(served, tmp_path, "perm", "revoke", "sales", "analytics2")
    assert rc == 0
    bundle = tmp_path / "b.py"
    bundle.write_text("# bundle\n")
    rc, out = _cli(served, tmp_path, "fn", "bundle-upload", "sales", "pub",
                   str(bundle))
    assert rc == 0
    back = tmp_path / "b2.py"
    rc, out = _cli(served, tmp_path, "fn", "bundle-download", "sales", "pub",
                   str(back))
    assert rc == 0 and back.read_text() == "# bundle\n"
    rc, out = _cli(served, tmp_path, "user", "update", "admin",
                   "--role", "admin")
    assert rc == 0


def test_tls_server_and_verified_client(spark, tmp_path):
    """HTTPS end-to-end: server wraps its socket with a cert (reference
    serves TLS, rest_urls:56), the client verifies against it, and an
    unverified client is rejected by the handshake."""
    import ssl
    import subprocess

    cert = tmp_path / "cert.pem"
    key = tmp_path / "key.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "1",
         "-subj", "/CN=127.0.0.1", "-addext",
         "subjectAltName=IP:127.0.0.1"],
        check=True, capture_output=True)

    store = TableStore(str(tmp_path / "wh"))
    store.write(td.TableFrame.from_dict(spark, {"k": [1]}), "c", "t")
    server = ApiServer(spark, store,
                       auth=Authenticator({"admin": "pw"}),
                       ssl_cert=str(cert), ssl_key=str(key))
    with server:
        assert server.base_url.startswith("https://")
        c = ApiClient(server.base_url, cafile=str(cert))
        c.login("admin", "pw")
        assert c.tables("c") == ["t"]
        # a client that does NOT trust the cert fails the handshake
        strict = ApiClient(server.base_url)
        with pytest.raises((ssl.SSLError, OSError)):
            strict.status()


def test_rest_bundle_upload_enables_isolated_execution(spark, tmp_path):
    """Full loop: a function's code bundle uploaded over REST is the same
    artifact the engine's isolation path executes — POST .../bundle then
    POST .../execute runs the uploaded code in a venv subprocess worker,
    and the worker logs say so."""
    store = TableStore(str(tmp_path / "wh"))
    store.write(td.TableFrame.from_dict(spark, {"n": [5, 6]}), "c", "raw")

    @td.transformer(input_tables=["raw"], output_tables=["tripled"])
    def triple(raw):
        raise AssertionError("in-process body must not run")

    engine = PubSubEngine(spark, store, isolation=True)
    engine.register("c", triple)          # no bundle yet -> would run in-proc

    server = ApiServer(spark, store, engine=engine,
                       auth=Authenticator({"admin": "pw"}))
    with server:
        # venv-subprocess worker startup can exceed the default 30s
        # client socket timeout on a loaded box (observed flake) — the
        # call is synchronous on the server side, so wait longer
        client = ApiClient(server.base_url, timeout=180)
        client.login("admin", "pw")
        client.upload_bundle("c", "triple", b"""
import tabsdata_spark as td

@td.transformer(input_tables=["raw"], output_tables=["tripled"])
def triple(raw):
    return raw.with_columns(n3=td.col("n") * 3)
""")
        reports = client.execute("c", "triple")
        assert reports[0]["status"] == "committed", reports[0]["error"]
        out = store.read(spark, "c", "tripled").to_dict()
        assert sorted(out["n3"]) == [15, 18]
        worker = client.workers(collection="c")[0]
        logs = " ".join(line["line"] for line in
                        client.worker_logs(worker["id"]))
        assert "isolated worker started" in logs


def test_vacuum_over_api_requires_security_and_prunes(served):
    server, client, store = served
    client.create_user("viewer", "pw", role="user")
    c2 = ApiClient(server.base_url)
    c2.login("viewer", "pw")
    with pytest.raises(ApiError) as ei:
        c2.vacuum("sales", "orders", keep_last=1)
    assert ei.value.status == 403
    out = client.vacuum("sales", "orders", keep_last=1)
    assert out["versions_pruned"] == 1
    assert len(client.data_versions("sales", "orders")) == 1


def test_role_change_assume_and_revert(served):
    """role_change mints a token with an explicitly assumed role (only a
    role the user belongs to), revoking the old token."""
    server, client, _ = served
    client.create_user("flex", "pw", role="user")
    client.assign_role("sys_admin", "flex")
    c2 = ApiClient(server.base_url)
    c2.login("flex", "pw")
    old_token = c2._token
    assert c2.user_info()["role"] == "user"
    c2.change_role("sys_admin")
    assert c2.user_info()["role"] == "sys_admin"
    # a role the user does NOT belong to is refused
    with pytest.raises(ApiError) as ei:
        c2.change_role("sec_admin")
    assert ei.value.status == 403
    # the pre-change token was revoked
    c3 = ApiClient(server.base_url)
    c3._token = old_token
    with pytest.raises(ApiError) as ei:
        c3.user_info()
    assert ei.value.status == 401


def test_collection_rename_and_delete(served):
    _, client, store = served
    client.create_collection("tmp-coll")
    client.rename_collection("tmp-coll", "renamed-coll")
    names = [c["name"] for c in client.collections()]
    assert "renamed-coll" in names and "tmp-coll" not in names
    # rename keeps data readable: sales has data; rename + read back
    client.rename_collection("sales", "sales2")
    assert client.sample("sales2", "orders", length=5)
    with pytest.raises(ApiError) as ei:
        client.delete_collection("sales2")         # non-empty: refused
    assert ei.value.status == 409
    client.rename_collection("sales2", "sales")    # restore for fixtures
    client.delete_collection("renamed-coll")
    assert "renamed-coll" not in [c["name"] for c in client.collections()]


def test_table_delete_removes_versions_and_files(served):
    _, client, store = served
    import glob
    assert len(client.data_versions("sales", "orders")) == 2
    out = client.delete_table("sales", "orders")
    assert out["versions_removed"] == 2
    assert client.tables("sales") == []
    assert not glob.glob(f"{store.root}/c/sales/d/*")
    with pytest.raises(ApiError) as ei:
        client.delete_table("sales", "orders")
    assert ei.value.status == 404


def test_function_update_and_delete(served):
    _, client, _ = served
    updated = client.update_function("sales", "double",
                                     output_tables=["doubled", "audit"])
    assert updated["output_tables"] == ["doubled", "audit"]
    client.delete_function("sales", "double")
    with pytest.raises(ApiError) as ei:
        client.function("sales", "double")
    assert ei.value.status == 404
    # deleting removed it from the trigger graph too: pub no longer cascades
    reports = client.execute("sales", "pub")
    assert [r["function"] for r in reports] == ["sales/pub"]


def test_role_permission_replace(served):
    _, client, _ = served
    client.create_role("replaceable")
    client.grant("replaceable", "cr", entity="sales")
    out = client.set_role_permissions("replaceable", [
        {"permission_type": "cx", "entity": "sales"},
        {"permission_type": "cd", "entity": "*"}])
    assert out["permissions"] == [
        {"permission_type": "cx", "entity": "sales"},
        {"permission_type": "cd", "entity": "*"}]
    with pytest.raises(ApiError) as ei:
        client.set_role_permissions("replaceable",
                                    [{"permission_type": "zz"}])
    assert ei.value.status == 400
    client.delete_role("replaceable")


def test_global_tables_and_user_detail(served):
    _, client, _ = served
    allt = client.all_tables()
    assert {"collection": "sales", "name": "orders"} in allt
    client.create_user("detailed", "pw", role="user")
    client.assign_role("sys_admin", "detailed")
    d = client.user("detailed")
    assert d["role"] == "user" and "sys_admin" in d["member_of"]
    with pytest.raises(ApiError) as ei:
        client.user("ghost-user")
    assert ei.value.status == 404


def test_ssl_cert_route(spark, tmp_path):
    import subprocess

    cert, key = tmp_path / "c.pem", tmp_path / "k.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "1",
         "-subj", "/CN=127.0.0.1", "-addext", "subjectAltName=IP:127.0.0.1"],
        check=True, capture_output=True)
    store = TableStore(str(tmp_path / "wh"))
    with ApiServer(spark, store, auth=Authenticator({"a": "b"}),
                   ssl_cert=str(cert), ssl_key=str(key)) as srv:
        c = ApiClient(srv.base_url, cafile=str(cert))
        c.login("a", "b")
        assert c.ssl_cert() == cert.read_text()
    # plain-http server 404s the cert route
    with ApiServer(spark, store, auth=Authenticator({"a": "b"})) as srv2:
        c2 = ApiClient(srv2.base_url)
        c2.login("a", "b")
        with pytest.raises(ApiError) as ei:
            c2.ssl_cert()
        assert ei.value.status == 404


def test_cli_crud_verbs(served, tmp_path):
    _cli(served, tmp_path, "login", "admin", "--password", "tabsdata")
    rc, _ = _cli(served, tmp_path, "collection", "create", "cli-tmp")
    assert rc == 0
    rc, _ = _cli(served, tmp_path, "collection", "rename", "cli-tmp",
                 "cli-tmp2")
    assert rc == 0
    rc, _ = _cli(served, tmp_path, "collection", "delete", "cli-tmp2")
    assert rc == 0
    rc, out = _cli(served, tmp_path, "user", "info", "admin")
    assert rc == 0 and '"member_of"' in out
    rc, out = _cli(served, tmp_path, "table", "vacuum", "sales", "orders",
                   "--keep-last", "1")
    assert rc == 0 and '"versions_pruned": 1' in out
    rc, out = _cli(served, tmp_path, "table", "delete", "sales", "orders")
    assert rc == 0 and '"versions_removed": 1' in out


def test_execute_and_bundle_and_collection_create_are_gated(served):
    """A plain 'user'-role caller (cr only) cannot create collections,
    upload code bundles, or trigger executions; granting cx via a role
    unlocks execute (the reference's CollectionExec model)."""
    server, client, _ = served
    client.create_user("runner", "pw", role="user")
    c2 = ApiClient(server.base_url)
    c2.login("runner", "pw")
    with pytest.raises(ApiError) as ei:
        c2.create_collection("mine")
    assert ei.value.status == 403
    with pytest.raises(ApiError) as ei:
        c2.upload_bundle("sales", "pub", b"evil = True")
    assert ei.value.status == 403
    with pytest.raises(ApiError) as ei:
        c2.execute("sales", "pub")
    assert ei.value.status == 403
    # grant cx on sales through a role -> execute works
    client.create_role("sales-exec")
    client.grant("sales-exec", "cx", entity="sales")
    client.assign_role("sales-exec", "runner")
    reports = c2.execute("sales", "pub")
    assert reports[0]["status"] == "committed"
    # cx does not leak the admin surface
    with pytest.raises(ApiError):
        c2.upload_bundle("sales", "pub", b"still no")
    client.delete_role("sales-exec")


def test_collection_rename_migrates_role_grants(served):
    server, client, _ = served
    client.create_role("scoped")
    client.grant("scoped", "cr", entity="sales")
    client.rename_collection("sales", "sales-x")
    assert client.role_permissions("scoped") == [
        {"permission_type": "cr", "entity": "sales-x"}]
    client.rename_collection("sales-x", "sales")   # restore
    client.delete_role("scoped")


def test_client_errors_get_4xx_not_500(served):
    """Caller mistakes map to the proper status class with no server
    traceback (the reference apiserver's discipline): 400 for malformed
    refs/params/SQL, 404 for missing tables/versions."""
    import urllib.error
    import urllib.request

    server, client, _ = served

    def status_of(path):
        req = urllib.request.Request(
            server.base_url + path,
            headers={"Authorization": f"Bearer {client._token}"})
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, b""
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    for path, want in [
        ("/collections/sales/tables/orders/sample?at=NOPE", 400),
        ("/collections/sales/tables/orders/sample?at=HEAD..INITIAL", 400),
        ("/collections/sales/tables/ghost/sample", 404),
        ("/collections/sales/tables/orders/schema?at=HEAD~99", 404),
        ("/collections/sales/tables/orders/sample?len=abc", 400),
        ("/collections/sales/tables/orders/sample?sql=SELEKT+1", 400),
    ]:
        code, body = status_of(path)
        assert code == want, (path, code, body)
        assert b"trace" not in body, (path, body)


def test_builtin_exceptions_are_server_faults_not_400(served):
    """r8 ADVICE regression: the 400 mapping is narrowed to explicit
    request-parsing boundaries — an INTERNAL ValueError/TypeError/KeyError
    from handler code must surface as a 500 with a trace, while a missing
    required body field (a true caller mistake) is a 400 at the _Body
    boundary."""
    import json as _json
    import urllib.error
    import urllib.request

    from tabsdata_spark.api.server import _client_error_status

    # unit level: builtins no longer classify as client errors
    assert _client_error_status(KeyError("x")) is None
    assert _client_error_status(ValueError("x")) is None
    assert _client_error_status(TypeError("x")) is None

    server, client, _ = served

    def post(path, body):
        req = urllib.request.Request(
            server.base_url + path, method="POST",
            data=_json.dumps(body).encode(),
            headers={"Authorization": f"Bearer {client._token}",
                     "Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, b""
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    # missing required body field -> 400 with a named-field message
    code, body = post("/users", {"password": "pw"})
    assert code == 400, (code, body)
    assert b"missing body field 'name'" in body and b"trace" not in body

    # non-object JSON body -> 400 at the parsing boundary
    code, body = post("/users", ["not", "an", "object"])
    assert code == 400, (code, body)

    # an internal builtin exception keeps the 500 + trace: inject a
    # route that raises KeyError from handler code
    orig = type(server)._route

    def broken(self, method, parts, query, body, user):
        if parts and parts[0] == "boom":
            raise KeyError("internal-bug")
        return orig(self, method, parts, query, body, user)

    type(server)._route = broken
    try:
        req = urllib.request.Request(
            server.base_url + "/boom",
            headers={"Authorization": f"Bearer {client._token}"})
        try:
            with urllib.request.urlopen(req):
                code, body = 200, b""
        except urllib.error.HTTPError as e:
            code, body = e.code, e.read()
        assert code == 500, (code, body)
        assert b"trace" in body
    finally:
        type(server)._route = orig


def test_put_role_permissions_nested_validation(served):
    """r9 ADVICE regression: nested caller mistakes in PUT /roles/{name}
    must return 400 at the parsing boundary, not a 500+trace — a non-list
    `permissions`, a non-object item, and an unknown permission_type are
    all the caller's errors."""
    _, client, _ = served
    client.create_role("temp-perms")
    for bad in ({"permissions": "cr"},
                {"permissions": ["cr"]},
                {"permissions": [{}]},
                {"permissions": [{"permission_type": "nope"}]}):
        with pytest.raises(ApiError) as ei:
            client._put("roles/temp-perms", **bad)
        assert ei.value.status == 400, (bad, ei.value.status)
    # a valid replacement still works after the rejected attempts
    client._put("roles/temp-perms",
                permissions=[{"permission_type": "cr", "entity": "sales"}])
    assert client.role_permissions("temp-perms") == [
        {"permission_type": "cr", "entity": "sales"}]
    client.delete_role("temp-perms")


def test_malformed_content_length_is_400(served):
    """r9 ADVICE regression: a malformed Content-Length header surfaces as
    400 'invalid Content-Length', not a ValueError-driven 500+trace."""
    import http.client
    import json as _json

    from urllib.parse import urlsplit

    server, _, _ = served
    parts = urlsplit(server.base_url)
    conn = http.client.HTTPConnection(parts.netloc, timeout=10)
    try:
        conn.putrequest("POST", parts.path.rstrip("/") + "/auth/login")
        conn.putheader("Content-Length", "notanumber")
        conn.endheaders()
        resp = conn.getresponse()
        body = _json.loads(resp.read())
        assert resp.status == 400, (resp.status, body)
        assert "Content-Length" in body["error"]
    finally:
        conn.close()


# ------------------------------------------------ malformed-body robustness


def _raw_request(base_url, method, path, body: bytes, token=None,
                 content_length=None):
    """requests with arbitrary (possibly non-JSON) bodies and headers the
    typed ApiClient cannot produce; returns the HTTP status."""
    import http.client
    from urllib.parse import urlparse

    u = urlparse(base_url)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=30)
    try:
        headers = {"Content-Type": "application/json"}
        if token:
            headers["Authorization"] = f"Bearer {token}"
        if content_length is not None:
            headers["Content-Length"] = content_length
            conn.putrequest(method, path, skip_host=False,
                            skip_accept_encoding=True)
            for k, v in headers.items():
                conn.putheader(k, v)
            conn.endheaders()
            conn.send(body)
        else:
            conn.request(method, path, body=body, headers=headers)
        return conn.getresponse().status
    finally:
        conn.close()


def test_malformed_bodies_never_500(served):
    """Caller mistakes — unparseable JSON, non-object bodies, nested
    garbage where typed structures are expected, unknown routes — must
    map to 4xx at the parsing boundary, never to 500+trace (reference
    apiserver status discipline; r9 ADVICE findings 2-3)."""
    server, client, _ = served
    tok = client._token
    paths = [
        ("POST", "/api/v1/auth/login"),
        ("POST", "/api/v1/auth/password_change"),
        ("POST", "/api/v1/auth/role_change"),
        ("POST", "/api/v1/users"),
        ("PUT", "/api/v1/users/admin"),
        ("POST", "/api/v1/roles"),
        ("PUT", "/api/v1/roles/admin"),
        ("DELETE", "/api/v1/roles/admin"),
        ("POST", "/api/v1/collections"),
        ("PUT", "/api/v1/collections/sales"),
        ("POST", "/api/v1/collections/sales/functions"),
        ("PUT", "/api/v1/collections/sales/functions/pub"),
        ("POST", "/api/v1/collections/sales/functions/pub/execute"),
        ("POST", "/api/v1/transactions"),
        ("POST", "/api/v1/nosuch"),
        ("PATCH", "/api/v1/users"),
    ]
    bodies = [
        b"{not json",
        b"[]",
        b'"just a string"',
        b"null",
        b"123",
        b"{}",
        b'{"permissions": [{}]}',
        b'{"permissions": "sys_admin"}',
        b'{"permissions": [{"permission_type": "nope"}]}',
        b'{"name": null}',
        b'{"name": {"nested": ["garbage", {}]}}',
        b'{"password": 12345, "name": []}',
        '{"name": "üñí"}'.encode(),
        b'{"roles": [[]], "enabled": "maybe"}',
    ]
    for method, path in paths:
        for body in bodies:
            status = _raw_request(server.base_url, method, path, body, tok)
            assert 400 <= status < 500 or status == 200, \
                f"{method} {path} body={body!r} -> {status}"


def test_malformed_content_length_is_400(served):
    server, client, _ = served
    for cl in ("abc", "-", "12x", "ÿ"):
        status = _raw_request(server.base_url, "POST", "/api/v1/collections",
                              b"{}", client._token, content_length=cl)
        assert status == 400, f"Content-Length {cl!r} -> {status}"
