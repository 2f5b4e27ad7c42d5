"""S-admin: the reference's user/credential/RBAC surface (SURVEY §2.5).

Driver-side metadata layer — NOT a Spark operator: the reference keeps this
state in Milvus RBAC plus a SQLite clients DB (app/modules/key_manager.py),
so the Spark-native equivalent is the catalog's atomic-rename JSON meta
store. Mirrored behaviors, with file:line parity citations:

- set_user / _create_user_for_tenant (base_milvus.py:620-679): create a
  tenant client if absent (existing_user short-circuit), or drop+recreate
  on reset_user; client_id = "{tenant}_" + random suffix padded to total
  length 32 (base_milvus.py:543-561, __CLIENT_ID_LENGTH:69), secret =
  urlsafe_b64(urandom(36)) (base_milvus.py:564-582,
  __CLIENT_SECRET_LENGTH:70).
- Secrets encrypted at rest with Fernet under a generated key file
  (key_manager.py:90-91,217-241,339) — gated behind an import-try;
  without the cryptography package secrets are stored with a PBKDF2-HMAC
  verifier only (validate works, secret is NOT recoverable — documented
  divergence, strictly safer).
- reset_admin_password (base_milvus.py:719-832): password policy (>=8
  chars, upper, lower, digit, special — :764-782), admin-only reset
  (:797-821: non-admin names are rejected with "Operation not permitted"),
  old-password check before update.
- Tenant privilege grant loop
  (_grant_tenant_privileges_to_collection_if_not_exists,
  base_milvus.py:1321-1365): grants the fixed 9-privilege list
  (base_milvus.py:71-81) on a collection to the role (default admin role),
  returns True after granting (the reference sets granted_any=True per
  iteration regardless of prior state — mirrored, and noted, because a
  caller porting over may rely on it).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import re
import secrets as pysecrets
import string

from flouds_vectordb_spark.catalog import Catalog, validate_tenant_code

CLIENT_ID_LENGTH = 32      # base_milvus.py:69
CLIENT_SECRET_BYTES = 36   # base_milvus.py:70
TENANT_ROLE_PRIVILEGES = [  # base_milvus.py:71-81
    "CreateIndex", "Search", "Insert", "Upsert", "Load", "Release",
    "Query", "Flush", "Compaction",
]
DEFAULT_ADMIN_ROLE = "flouds_admin_role"
DEFAULT_ADMIN_USER = "root"

try:  # optional dependency — environments without it fall back to verifiers
    from cryptography.fernet import Fernet, InvalidToken
except ImportError:  # pragma: no cover
    Fernet = None
    InvalidToken = Exception


def generate_client_id(tenant_code: str) -> str:
    """base_milvus.py:543-561: '{tenant}_' prefix + A-Z0-9 suffix padded to
    total length 32 (CSPRNG here; the reference uses random.choice)."""
    prefix = f"{tenant_code.lower()}_"
    letters = string.ascii_uppercase + string.digits
    suffix_len = max(0, CLIENT_ID_LENGTH - len(prefix))
    return prefix + "".join(pysecrets.choice(letters) for _ in range(suffix_len))


def generate_secret_key() -> str:
    """base_milvus.py:564-582: urlsafe base64 of 36 random bytes."""
    return base64.urlsafe_b64encode(os.urandom(CLIENT_SECRET_BYTES)).decode()


def validate_password_policy(password: str) -> str | None:
    """base_milvus.py:754-782, byte-for-byte requirement list; returns None
    if valid else the policy message."""
    requirements = [
        (len(password) >= 8, "at least 8 characters"),
        (bool(re.search(r"[A-Z]", password)), "one uppercase letter"),
        (bool(re.search(r"[a-z]", password)), "one lowercase letter"),
        (bool(re.search(r"[0-9]", password)), "one digit"),
        (bool(re.search(r'[!@#$%^&*(),.?":{}|<>]', password)),
         'one special character (!@#$%^&*(),.?":{}|<>)'),
    ]
    missing = [desc for ok, desc in requirements if not ok]
    if missing:
        return ("Password policy violation - Your password must include: "
                + ", ".join(missing) + ".")
    return None


class SecretStore:
    """Fernet key management (key_manager.py:217-241): a generated
    .encryption_key file under the warehouse; key reused across sessions.
    With cryptography unavailable, encrypt()/decrypt() are disabled and
    callers fall back to one-way verifiers."""

    def __init__(self, warehouse: str):
        self.key_path = os.path.join(warehouse, ".encryption_key")
        self._fernet = None
        if Fernet is not None:
            if os.path.exists(self.key_path):
                with open(self.key_path, "rb") as f:
                    key = f.read().strip()
            else:
                key = Fernet.generate_key()
                fd = os.open(self.key_path, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o600)
                try:
                    os.write(fd, key)
                finally:
                    os.close(fd)
            self._fernet = Fernet(key)

    @property
    def available(self) -> bool:
        return self._fernet is not None

    def encrypt(self, value: str) -> str:
        if not self.available:
            raise RuntimeError("encryption unavailable: cryptography not installed")
        return self._fernet.encrypt(value.encode()).decode()

    def decrypt(self, token: str) -> str | None:
        if not self.available:
            return None
        try:
            return self._fernet.decrypt(token.encode()).decode()
        except InvalidToken:
            return None


def _verifier(secret: str, salt: bytes | None = None) -> dict:
    salt = salt or os.urandom(16)
    dk = hashlib.pbkdf2_hmac("sha256", secret.encode(), salt, 200_000)
    return {"salt": salt.hex(), "hash": dk.hex()}


def _verify(secret: str, rec: dict) -> bool:
    dk = hashlib.pbkdf2_hmac("sha256", secret.encode(),
                             bytes.fromhex(rec["salt"]), 200_000)
    return hmac.compare_digest(dk.hex(), rec["hash"])


class KeyManager:
    """Client credential store (key_manager.py:63-460 + the set_user flow
    base_milvus.py:620-679). One catalog meta document `clients`:
    {tenant_code: {client_id, secret_enc | secret_verifier, client_type}}.
    Secrets are Fernet ciphertext when available (recoverable, like the
    reference's clients DB) plus always a PBKDF2 verifier for validate()."""

    def __init__(self, catalog: Catalog):
        self.catalog = catalog
        self.secrets = SecretStore(catalog.warehouse)

    def set_user(self, tenant_code: str, reset_user: bool = False) -> dict:
        """_create_user_for_tenant: returns the reference's summary shape
        {tenant_code, client_id, client_secret, existing_user, message}.
        The plaintext secret appears ONLY in the creation response (the
        reference returns it exactly once too)."""
        tenant = validate_tenant_code(tenant_code)
        summary = {"tenant_code": tenant, "client_id": None,
                   "client_secret": None, "existing_user": False, "message": ""}
        client_id = generate_client_id(tenant)
        secret = generate_secret_key()

        def mutate(data: dict) -> dict | None:
            row = data.get(tenant)
            if row and not reset_user:
                return row
            rec = {"client_id": client_id, "client_type": "tenant",
                   "secret_verifier": _verifier(secret)}
            if self.secrets.available:
                rec["secret_enc"] = self.secrets.encrypt(secret)
            data[tenant] = rec
            return None

        existing = self.catalog._mutate_meta("clients", mutate)
        if existing is not None:
            summary.update({
                "existing_user": True, "client_id": existing["client_id"],
                "message": f"User '{existing['client_id']}' already exists "
                           f"for tenant '{tenant}'.",
            })
            return summary
        summary.update({"client_id": client_id, "client_secret": secret,
                        "message": "User created successfully."})
        return summary

    def get_client_secret(self, tenant_code: str) -> str | None:
        """key_manager.py:418-424: decrypt the stored secret (None when no
        client, or when running verifier-only)."""
        row = self.catalog._read_meta("clients").get(validate_tenant_code(tenant_code))
        if not row or "secret_enc" not in row:
            return None
        return self.secrets.decrypt(row["secret_enc"])

    def validate_client(self, client_id: str, client_secret: str) -> bool:
        """The auth check the service layer runs per request: constant-time
        verifier compare (never decrypts just to compare)."""
        for row in self.catalog._read_meta("clients").values():
            if row["client_id"] == client_id:
                return _verify(client_secret, row["secret_verifier"])
        return False

    # ---- admin password (base_milvus.py:719-832) ---------------------------
    def _admin_meta(self) -> dict:
        return self.catalog._read_meta("admin")

    def set_admin_password(self, password: str) -> None:
        """__set_admin_password: initialize/update the stored admin
        credential (verifier at rest, never plaintext)."""
        def mutate(data: dict) -> None:
            data["admin"] = {"user_name": DEFAULT_ADMIN_USER,
                             "verifier": _verifier(password)}

        self.catalog._mutate_meta("admin", mutate)

    def reset_admin_user_password(self, user_name: str, old_password: str,
                                  new_password: str) -> dict:
        """_reset_admin_user_password: policy check first; only the admin
        user may be reset (:797-821); old password must verify."""
        resp = {"user_name": user_name, "root_user": False, "success": False,
                "message": "", "reset_flag": False}
        policy_error = validate_password_policy(new_password)
        if policy_error:
            resp["message"] = policy_error
            return resp
        admin = self._admin_meta().get("admin")
        if admin is None or user_name.lower() != admin["user_name"].lower():
            resp["message"] = (f"Operation not permitted: '{user_name}' is "
                               "not an admin user.")
            return resp
        resp["root_user"] = True
        if not _verify(old_password, admin["verifier"]):
            resp["message"] = (
                "Authentication failed: The provided password does not match "
                "the current admin password. Password reset requires correct "
                "authentication.")
            return resp
        self.set_admin_password(new_password)
        resp.update({"success": True, "reset_flag": True,
                     "message": "Password successfully reset for the admin user."})
        return resp


class Rbac:
    """Role grants (base_milvus.py:1321-1365). Meta document `rbac`:
    {role: {collection: [privileges]}}."""

    def __init__(self, catalog: Catalog):
        self.catalog = catalog

    def grant_tenant_privileges_to_collection(
            self, tenant_code: str, object_name: str,
            role_name: str | None = None) -> bool:
        """Grants the fixed privilege list to the role on the collection.
        Raises when the tenant database does not exist (:1334-1336).
        Returns True after the loop — mirroring the reference, which sets
        granted_any=True for every privilege whether or not it was already
        granted (the _if_not_exists in its name notwithstanding)."""
        tenant = validate_tenant_code(tenant_code)
        if tenant not in self.catalog._read_meta("tenants"):
            raise ValueError(
                f"Database for tenant '{tenant}' does not exist")
        role = role_name or DEFAULT_ADMIN_ROLE
        def mutate(data: dict) -> None:
            coll = data.setdefault(role, {}).setdefault(object_name, [])
            for privilege in TENANT_ROLE_PRIVILEGES:
                if privilege not in coll:
                    coll.append(privilege)

        self.catalog._mutate_meta("rbac", mutate)
        return True

    def has_privilege(self, role_name: str, object_name: str,
                      privilege: str) -> bool:
        return privilege in (
            self.catalog._read_meta("rbac").get(role_name, {}).get(object_name, []))

    def list_grants(self, role_name: str) -> dict:
        return self.catalog._read_meta("rbac").get(role_name, {})
