"""Admin/credential/RBAC metadata layer (SURVEY §2.5) + ConfigKV
encryption-at-rest. Parity targets: set_user flow base_milvus.py:620-679,
credential formats :543-582, password policy/reset :719-832, grant loop
:1321-1365, config encryption config_service.py:176-230,313-337 with the
key_manager.py:217-241 key-file scheme."""

from __future__ import annotations

import json
import os

import pytest

from flouds_vectordb_spark.catalog import Catalog, ConfigKV
from flouds_vectordb_spark.security import (
    CLIENT_ID_LENGTH,
    TENANT_ROLE_PRIVILEGES,
    KeyManager,
    Rbac,
    SecretStore,
    validate_password_policy,
)


@pytest.fixture()
def cat(spark, tmp_path_factory):
    c = Catalog(spark, str(tmp_path_factory.mktemp("sec_wh")))
    c.set_vector_store("acme1")
    return c


def test_set_user_create_existing_reset(cat):
    km = KeyManager(cat)
    created = km.set_user("acme1")
    assert created["existing_user"] is False
    assert created["client_id"].startswith("acme1_")
    assert len(created["client_id"]) == CLIENT_ID_LENGTH
    assert created["client_secret"] and created["message"] == "User created successfully."

    again = km.set_user("acme1")
    assert again["existing_user"] is True
    assert again["client_id"] == created["client_id"]
    assert again["client_secret"] is None  # plaintext only on creation

    reset = km.set_user("acme1", reset_user=True)
    assert reset["existing_user"] is False
    assert reset["client_id"] != created["client_id"]
    assert reset["client_secret"] != created["client_secret"]


def test_validate_client_and_secret_recovery(cat):
    km = KeyManager(cat)
    s = km.set_user("acme1")
    assert km.validate_client(s["client_id"], s["client_secret"])
    assert not km.validate_client(s["client_id"], "wrong")
    assert not km.validate_client("nosuch_client", s["client_secret"])
    # Fernet recovery path (cryptography is present in this environment)
    assert km.get_client_secret("acme1") == s["client_secret"]
    # secret is NOT plaintext at rest
    raw = json.dumps(cat._read_meta("clients"))
    assert s["client_secret"] not in raw


def test_password_policy_messages():
    assert validate_password_policy("Str0ng!pass") is None
    msg = validate_password_policy("weak")
    assert msg.startswith("Password policy violation")
    for part in ("at least 8 characters", "one uppercase letter",
                 "one digit", "one special character"):
        assert part in msg


def test_admin_password_reset_flow(cat):
    km = KeyManager(cat)
    km.set_admin_password("Old!Pass1")
    # policy rejection first (reference order: policy before auth)
    r = km.reset_admin_user_password("root", "Old!Pass1", "short")
    assert not r["success"] and "policy" in r["message"].lower()
    # non-admin user rejected
    r = km.reset_admin_user_password("alice", "Old!Pass1", "New!Pass1")
    assert not r["success"] and "not an admin user" in r["message"]
    # wrong old password rejected
    r = km.reset_admin_user_password("root", "nope", "New!Pass1")
    assert not r["success"] and r["root_user"] and "Authentication failed" in r["message"]
    # success
    r = km.reset_admin_user_password("root", "Old!Pass1", "New!Pass1")
    assert r["success"] and r["reset_flag"]
    r = km.reset_admin_user_password("root", "New!Pass1", "Roll!Pass2")
    assert r["success"]


def test_rbac_grant_loop(cat):
    rbac = Rbac(cat)
    with pytest.raises(ValueError, match="does not exist"):
        rbac.grant_tenant_privileges_to_collection("ghost9", "coll_x")
    assert rbac.grant_tenant_privileges_to_collection("acme1", "coll_x") is True
    for p in TENANT_ROLE_PRIVILEGES:
        assert rbac.has_privilege("flouds_admin_role", "coll_x", p)
    assert not rbac.has_privilege("flouds_admin_role", "coll_x", "DropCollection")
    # re-grant is idempotent in stored state and (like the reference) True
    assert rbac.grant_tenant_privileges_to_collection("acme1", "coll_x", "r2") is True
    assert sorted(rbac.list_grants("r2")["coll_x"]) == sorted(TENANT_ROLE_PRIVILEGES)


def test_configkv_fernet_roundtrip(cat):
    kv = ConfigKV(cat)
    kv.set_config("api_token", "s3cr3t-value", tenant_code="acme1", encrypted=True)
    # metadata read never exposes (reference get_config_meta contract)
    assert kv.get_config_meta("api_token", "acme1") == (None, True)
    # value read decrypts (reference _read_kv contract)
    assert kv.get_config("api_token", "acme1") == "s3cr3t-value"
    # ciphertext at rest
    raw = json.dumps(cat._read_meta("config_kv"))
    assert "s3cr3t-value" not in raw
    # plaintext rows unaffected
    kv.set_config("plain", "visible", tenant_code="acme1")
    assert kv.get_config("plain", "acme1") == "visible"
    assert kv.get_config_meta("plain", "acme1") == ("visible", False)


def test_secret_store_key_persistence(tmp_path):
    s1 = SecretStore(str(tmp_path))
    tok = s1.encrypt("hello")
    s2 = SecretStore(str(tmp_path))  # reopens the same key file
    assert s2.decrypt(tok) == "hello"
    assert oct(os.stat(s1.key_path).st_mode & 0o777) == "0o600"
    assert s2.decrypt("garbage") is None
