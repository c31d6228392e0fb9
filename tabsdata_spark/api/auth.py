"""Token auth for the REST front.

Reference counterpart: server/libraries/td-security (password hashing) and
the auth endpoints at rest_urls/mod.rs:47-54 (AUTH_LOGIN / AUTH_REFRESH /
AUTH_LOGOUT / AUTH_USER_INFO).  The reference issues JWTs; here tokens are
HMAC-SHA256-signed JSON payloads (same bearer-token contract, no external
jwt dependency).  Passwords are stored salted+hashed (PBKDF2), never plain.

This is a single-node control plane: the secret lives in process memory
(or is supplied by the deployer), not in a distributed keystore.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import os
import secrets
import time


def _b64e(raw: bytes) -> str:
    return base64.urlsafe_b64encode(raw).decode().rstrip("=")


def _b64d(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


class AuthError(Exception):
    pass


class Authenticator:
    """User registry + bearer-token mint/verify."""

    def __init__(self, users: dict[str, str] | None = None,
                 secret: bytes | None = None, ttl_s: int = 3600):
        self._secret = secret or secrets.token_bytes(32)
        self.ttl_s = ttl_s
        self._users: dict[str, tuple[bytes, bytes]] = {}
        self._roles: dict[str, str] = {}
        for name, pw in (users or {"admin": "tabsdata"}).items():
            self.add_user(name, pw)

    # -- users ---------------------------------------------------------
    def add_user(self, name: str, password: str, role: str = "admin") -> None:
        salt = secrets.token_bytes(16)
        self._users[name] = (salt, self._hash(password, salt))
        self._roles[name] = role

    def check_password(self, name: str, password: str) -> bool:
        rec = self._users.get(name)
        if rec is None:
            return False
        salt, want = rec
        return hmac.compare_digest(self._hash(password, salt), want)

    @staticmethod
    def _hash(password: str, salt: bytes) -> bytes:
        return hashlib.pbkdf2_hmac("sha256", password.encode(), salt, 100_000)

    # -- tokens --------------------------------------------------------
    def login(self, name: str, password: str) -> dict:
        if not self.check_password(name, password):
            raise AuthError("invalid credentials")
        return self._mint(name)

    def refresh(self, token: str) -> dict:
        return self._mint(self.verify(token)["user"])

    def mint_as(self, name: str, role: str) -> dict:
        """Token with an explicitly assumed role (AUTH_ROLE_CHANGE,
        rest_urls/mod.rs:51) — the caller must have checked the user may
        assume it (base role or RoleStore membership)."""
        return self._mint(name, role)

    def _mint(self, name: str, role: str | None = None) -> dict:
        payload = {"user": name,
                   "role": role or self._roles.get(name, "user"),
                   "exp": int(time.time()) + self.ttl_s}
        body = _b64e(json.dumps(payload).encode())
        sig = _b64e(hmac.new(self._secret, body.encode(), "sha256").digest())
        return {"access_token": f"{body}.{sig}", "token_type": "Bearer",
                "expires_in": self.ttl_s}

    def verify(self, token: str) -> dict:
        try:
            body, sig = token.split(".")
        except ValueError:
            raise AuthError("malformed token") from None
        want = _b64e(hmac.new(self._secret, body.encode(), "sha256").digest())
        if not hmac.compare_digest(sig, want):
            raise AuthError("bad signature")
        payload = json.loads(_b64d(body))
        if payload["exp"] < time.time():
            raise AuthError("token expired")
        return payload


__all__ = ["Authenticator", "AuthError"]


# ---------------------------------------------------------------------------
# roles / permissions (reference: rest_urls ROLES/PERMISSIONS/USER_ROLES,
# authz.rs permission kinds: sa=SysAdmin ss=SecAdmin ca=CollectionAdmin
# cd=CollectionDev cx=CollectionExec cr=CollectionRead; entity '*' = system
# scope, otherwise a collection name)
# ---------------------------------------------------------------------------
PERMISSION_TYPES = {"sa", "ss", "ca", "cd", "cx", "cr"}


class RoleStore:
    """Role -> permission grants; user -> roles.  In-memory, mirroring the
    reference's bootstrap roles (user/sys_admin/sec_admin)."""

    def __init__(self):
        self._perms: dict[str, list[dict]] = {
            "sys_admin": [{"permission_type": "sa", "entity": "*"}],
            "sec_admin": [{"permission_type": "ss", "entity": "*"}],
            "user": [{"permission_type": "cr", "entity": "*"}],
            # the Authenticator's bootstrap user carries role "admin"
            "admin": [{"permission_type": "sa", "entity": "*"}],
        }
        self._members: dict[str, set[str]] = {
            "sys_admin": set(), "sec_admin": set(), "user": set(),
            "admin": set()}

    # -- roles ---------------------------------------------------------
    def list_roles(self) -> list[dict]:
        return [{"name": r, "permissions": list(ps)}
                for r, ps in sorted(self._perms.items())]

    def create_role(self, name: str) -> None:
        if name in self._perms:
            raise AuthError(f"role {name} exists")
        self._perms[name] = []
        self._members[name] = set()

    def delete_role(self, name: str) -> None:
        # 'admin' is protected too: it's the bootstrap Authenticator user's
        # role — deleting it would lock the only administrator out of every
        # role/user mutation with no recovery path (allows() returns False
        # for an unknown role).
        if name in ("sys_admin", "sec_admin", "user", "admin"):
            raise AuthError(f"built-in role {name} cannot be deleted")
        self._perms.pop(name, None)
        self._members.pop(name, None)

    def _require(self, role: str) -> None:
        if role not in self._perms:
            raise AuthError(f"unknown role {role}")

    # -- permissions ---------------------------------------------------
    def grant(self, role: str, permission_type: str,
              entity: str = "*") -> None:
        self._require(role)
        if permission_type not in PERMISSION_TYPES:
            raise AuthError(f"unknown permission type {permission_type}")
        p = {"permission_type": permission_type, "entity": entity}
        if p not in self._perms[role]:
            self._perms[role].append(p)

    def revoke(self, role: str, permission_type: str,
               entity: str = "*") -> None:
        self._require(role)
        self._perms[role] = [
            p for p in self._perms[role]
            if not (p["permission_type"] == permission_type
                    and p["entity"] == entity)]

    def permissions(self, role: str) -> list[dict]:
        self._require(role)
        return list(self._perms[role])

    # -- membership ----------------------------------------------------
    def add_user(self, role: str, user: str) -> None:
        self._require(role)
        self._members[role].add(user)

    def remove_user(self, role: str, user: str) -> None:
        self._require(role)
        self._members[role].discard(user)

    def users(self, role: str) -> list[str]:
        self._require(role)
        return sorted(self._members[role])

    def allows(self, role: str, permission_type: str,
               collection: str | None = None) -> bool:
        """True when `role` carries `permission_type` for the collection
        (or system scope).  sa implies everything; ss implies the
        security surface."""
        for p in self._perms.get(role, []):
            if p["permission_type"] == "sa":
                return True
            if p["permission_type"] == permission_type and \
                    p["entity"] in ("*", collection):
                return True
        return False

    def roles_of(self, user: str) -> set[str]:
        """Every role whose membership contains `user`."""
        return {r for r, members in self._members.items() if user in members}

    def user_allows(self, user: str, base_role: str, permission_type: str,
                    collection: str | None = None) -> bool:
        """Effective permission check: union of the token's base role and
        every role the user has been added to via POST /roles/{r}/users.
        This is what makes role assignment authoritative (reference:
        user->role rows drive authz); consulting only the token-embedded
        role would render membership decorative."""
        for role in {base_role, *self.roles_of(user)}:
            if self.allows(role, permission_type, collection):
                return True
        return False
