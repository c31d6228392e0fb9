"""`td`-style command-line client for the control-plane server.

Reference counterpart: the `td` CLI (client/td-sdk/tabsdata/cli/ —
login/collection/table/fn/exec command groups over the REST API).  Same
verb surface, argparse + stdlib only.  The bearer token persists in a
user-writable file between invocations (reference caches credentials the
same way), overridable with --token-file for tests/automation.

Usage (server URL from --server or $TD_SPARK_SERVER):
    td login admin --password tabsdata
    td collection list
    td collection create sales
    td table list sales
    td table schema sales orders
    td table sample sales orders --len 10 --sql "SELECT COUNT(*) n FROM orders"
    td table versions sales orders
    td table download sales orders /tmp/dump --format csv
    td fn list sales
    td fn info sales ingest
    td fn history sales ingest
    td fn trigger sales ingest
    td txn list
    td user list
    td status
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .client import ApiClient
from .server import ApiError

_DEFAULT_TOKEN_FILE = os.path.join(
    os.path.expanduser("~"), ".config", "tabsdata_spark", "token.json")


def _client(args) -> ApiClient:
    server = args.server or os.environ.get("TD_SPARK_SERVER")
    if not server:
        raise SystemExit("no server: pass --server or set TD_SPARK_SERVER")
    c = ApiClient(server)
    if os.path.exists(args.token_file):
        with open(args.token_file) as f:
            c._token = json.load(f).get("access_token")
    return c


def _save_token(args, tok: dict) -> None:
    os.makedirs(os.path.dirname(args.token_file), exist_ok=True)
    with open(args.token_file, "w") as f:
        json.dump(tok, f)
    os.chmod(args.token_file, 0o600)


def _emit(obj) -> None:
    if isinstance(obj, list):
        for row in obj:
            print(json.dumps(row, default=str))
    else:
        print(json.dumps(obj, default=str))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="td", description="tabsdata-spark control-plane CLI")
    p.add_argument("--server", default=None,
                   help="API base url (default: $TD_SPARK_SERVER)")
    p.add_argument("--token-file", default=_DEFAULT_TOKEN_FILE)
    sub = p.add_subparsers(dest="cmd", required=True)

    lg = sub.add_parser("login")
    lg.add_argument("name")
    lg.add_argument("--password", required=True)

    sub.add_parser("logout")
    sub.add_parser("status")
    sub.add_parser("runtime-info")

    coll = sub.add_parser("collection").add_subparsers(dest="sub", required=True)
    coll.add_parser("list")
    c_new = coll.add_parser("create")
    c_new.add_argument("name")
    c_info = coll.add_parser("info")
    c_info.add_argument("name")
    c_ren = coll.add_parser("rename")
    c_ren.add_argument("name")
    c_ren.add_argument("new_name")
    c_del = coll.add_parser("delete")
    c_del.add_argument("name")

    tbl = sub.add_parser("table").add_subparsers(dest="sub", required=True)
    t_ls = tbl.add_parser("list")
    t_ls.add_argument("collection")
    for verb in ("schema", "sample", "versions"):
        t = tbl.add_parser(verb)
        t.add_argument("collection")
        t.add_argument("table")
        if verb == "schema":
            t.add_argument("--at", default=None)
        if verb == "sample":
            t.add_argument("--at", default=None)
            t.add_argument("--offset", type=int, default=0)
            t.add_argument("--len", type=int, default=100, dest="length")
            t.add_argument("--sql", default=None)
            t.add_argument("--format", default="rows", dest="fmt",
                           choices=["rows", "csv", "json"])
    t_rm = tbl.add_parser("delete")
    t_rm.add_argument("collection")
    t_rm.add_argument("table")
    t_vac = tbl.add_parser("vacuum")
    t_vac.add_argument("collection")
    t_vac.add_argument("table")
    t_vac.add_argument("--keep-last", type=int, default=None)
    t_dl = tbl.add_parser("download")
    t_dl.add_argument("collection")
    t_dl.add_argument("table")
    t_dl.add_argument("dest")
    t_dl.add_argument("--format", default="parquet", dest="fmt")
    t_dl.add_argument("--sql", default=None)

    sub.add_parser("docs")

    fn = sub.add_parser("fn").add_subparsers(dest="sub", required=True)
    f_ls = fn.add_parser("list")
    f_ls.add_argument("collection", nargs="?", default=None)
    for verb in ("info", "history", "trigger"):
        f = fn.add_parser(verb)
        f.add_argument("collection")
        f.add_argument("function")
    f_bu = fn.add_parser("bundle-upload")
    f_bu.add_argument("collection")
    f_bu.add_argument("function")
    f_bu.add_argument("file")
    f_bd = fn.add_parser("bundle-download")
    f_bd.add_argument("collection")
    f_bd.add_argument("function")
    f_bd.add_argument("file")

    txn = sub.add_parser("txn").add_subparsers(dest="sub", required=True)
    txn.add_parser("list")
    for verb in ("cancel", "recover"):
        t = txn.add_parser(verb)
        t.add_argument("id")

    ex = sub.add_parser("exec").add_subparsers(dest="sub", required=True)
    ex.add_parser("list")
    for verb in ("cancel", "recover"):
        e = ex.add_parser(verb)
        e.add_argument("id")

    wk = sub.add_parser("worker").add_subparsers(dest="sub", required=True)
    w_ls = wk.add_parser("list")
    w_ls.add_argument("--collection", default=None)
    w_ls.add_argument("--fn", default=None)
    w_lg = wk.add_parser("logs")
    w_lg.add_argument("id")

    prm = sub.add_parser("perm").add_subparsers(dest="sub", required=True)
    p_ls = prm.add_parser("list")
    p_ls.add_argument("collection")
    for verb in ("grant", "revoke"):
        g = prm.add_parser(verb)
        g.add_argument("collection")
        g.add_argument("to_collection")

    usr = sub.add_parser("user").add_subparsers(dest="sub", required=True)
    usr.add_parser("list")
    u_new = usr.add_parser("create")
    u_new.add_argument("name")
    u_new.add_argument("--password", required=True)
    u_new.add_argument("--role", default="user")
    u_up = usr.add_parser("update")
    u_up.add_argument("name")
    u_up.add_argument("--password", default=None)
    u_up.add_argument("--role", default=None)
    u_del = usr.add_parser("delete")
    u_del.add_argument("name")
    u_info = usr.add_parser("info")
    u_info.add_argument("name")

    rol = sub.add_parser("role").add_subparsers(dest="sub", required=True)
    rol.add_parser("list")
    r_new = rol.add_parser("create")
    r_new.add_argument("name")
    r_del = rol.add_parser("delete")
    r_del.add_argument("name")
    r_grant = rol.add_parser("grant")
    r_grant.add_argument("name")
    r_grant.add_argument("permission_type",
                         choices=["sa", "ss", "ca", "cd", "cx", "cr"])
    r_grant.add_argument("--entity", default="*")
    r_add = rol.add_parser("add-user")
    r_add.add_argument("name")
    r_add.add_argument("user")
    r_users = rol.add_parser("users")
    r_users.add_argument("name")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        c = _client(args)
        if args.cmd == "login":
            tok = c.login(args.name, args.password)
            _save_token(args, tok)
            print(f"logged in as {args.name}")
        elif args.cmd == "logout":
            c.logout()
            if os.path.exists(args.token_file):
                os.remove(args.token_file)
            print("logged out")
        elif args.cmd == "status":
            _emit(c.status())
        elif args.cmd == "runtime-info":
            _emit(c.runtime_info())
        elif args.cmd == "collection":
            if args.sub == "list":
                _emit(c.collections())
            elif args.sub == "create":
                _emit(c.create_collection(args.name))
            elif args.sub == "rename":
                _emit(c.rename_collection(args.name, args.new_name))
            elif args.sub == "delete":
                _emit(c.delete_collection(args.name))
            else:
                _emit(c.collection(args.name))
        elif args.cmd == "table":
            if args.sub == "list":
                _emit(c.tables(args.collection))
            elif args.sub == "schema":
                _emit(c.table_schema(args.collection, args.table, at=args.at))
            elif args.sub == "sample":
                out = c.sample(args.collection, args.table,
                               offset=args.offset, length=args.length,
                               sql=args.sql, fmt=args.fmt, at=args.at)
                if args.fmt == "rows":
                    _emit(out)
                else:
                    print(out, end="")
            elif args.sub == "versions":
                _emit(c.data_versions(args.collection, args.table))
            elif args.sub == "vacuum":
                _emit(c.vacuum(args.collection, args.table,
                               keep_last=args.keep_last))
            elif args.sub == "delete":
                _emit(c.delete_table(args.collection, args.table))
            else:
                _emit(c.download(args.collection, args.table, args.dest,
                                 fmt=args.fmt, sql=args.sql))
        elif args.cmd == "docs":
            _emit(c._get("docs"))
        elif args.cmd == "fn":
            if args.sub == "list":
                _emit(c.functions(args.collection))
            elif args.sub == "info":
                _emit(c.function(args.collection, args.function))
            elif args.sub == "history":
                _emit(c.history(args.collection, args.function))
            elif args.sub == "bundle-upload":
                with open(args.file, "rb") as f:
                    _emit(c.upload_bundle(args.collection, args.function,
                                          f.read()))
            elif args.sub == "bundle-download":
                raw = c.download_bundle(args.collection, args.function)
                with open(args.file, "wb") as f:
                    f.write(raw)
                _emit({"ok": True, "file": args.file, "size": len(raw)})
            else:
                _emit(c.execute(args.collection, args.function))
        elif args.cmd == "txn":
            if args.sub == "list":
                _emit(c.transactions())
            elif args.sub == "cancel":
                _emit(c.cancel_transaction(args.id))
            else:
                _emit(c.recover_transaction(args.id))
        elif args.cmd == "exec":
            if args.sub == "list":
                _emit(c.executions())
            elif args.sub == "cancel":
                _emit(c.cancel_execution(args.id))
            else:
                _emit(c.recover_execution(args.id))
        elif args.cmd == "worker":
            if args.sub == "list":
                _emit(c.workers(collection=args.collection, fn=args.fn))
            else:
                _emit(c.worker_logs(args.id))
        elif args.cmd == "perm":
            if args.sub == "list":
                _emit(c.inter_permissions(args.collection))
            elif args.sub == "grant":
                _emit(c.grant_inter(args.collection, args.to_collection))
            else:
                _emit(c.revoke_inter(args.collection, args.to_collection))
        elif args.cmd == "user":
            if args.sub == "list":
                _emit(c.users())
            elif args.sub == "create":
                _emit(c.create_user(args.name, args.password, args.role))
            elif args.sub == "update":
                _emit(c.update_user(args.name, password=args.password,
                                    role=args.role))
            elif args.sub == "info":
                _emit(c.user(args.name))
            else:
                _emit(c.delete_user(args.name))
        elif args.cmd == "role":
            if args.sub == "list":
                _emit(c.roles())
            elif args.sub == "create":
                _emit(c.create_role(args.name))
            elif args.sub == "delete":
                _emit(c.delete_role(args.name))
            elif args.sub == "grant":
                _emit(c.grant(args.name, args.permission_type, args.entity))
            elif args.sub == "add-user":
                _emit(c.assign_role(args.name, args.user))
            else:
                _emit(c.role_users(args.name))
        return 0
    except ApiError as e:
        print(f"error ({e.status}): {e.message}", file=sys.stderr)
        return 1


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
