"""The reference's tenant_setup_workflow, Spark-native: multi-tenant
isolation — two tenants, collections under each, independent data.

Mirrors /root/reference/examples/tenant_setup_workflow.py. Run:

    python examples/tenant_setup.py [warehouse_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flouds_vectordb_spark.catalog import Catalog, CollectionSpec
from flouds_vectordb_spark.operators.dense_search import DenseSearchRequest
from flouds_vectordb_spark.operators.upsert import CollectionWriter
from flouds_vectordb_spark.session import get_spark


def main() -> int:
    wh = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="flouds_wh_")
    spark = get_spark("tenant-setup")
    cat = Catalog(spark, wh)

    # two isolated tenants, each with its own db dir + collections
    for tenant in ("acme_corp", "globex"):
        r = cat.set_vector_store(tenant)
        print(f"tenant {tenant}: db={r['db']} created={r['created']}")
        cat.generate_schema(CollectionSpec(tenant, "text-model", dimension=4))

    # replayed provisioning is idempotent, like the reference
    again = cat.generate_schema(CollectionSpec("acme_corp", "text-model", 4))
    print(f"replayed generate_schema: schema_exists={again['schema_exists']}")

    # per-tenant data: same ids, different content — searches must not leak
    for tenant, label in (("acme_corp", "acme"), ("globex", "globex")):
        w = CollectionWriter(cat, tenant, "text-model")
        batch = spark.createDataFrame(
            [(f"d{i}", f"{label} document {i}", [float(i == j) for j in range(4)])
             for i in range(4)],
            "id string, chunk string, vector array<float>")
        w.insert_data(batch, batch_ts=1, force_flush=True)

    for tenant in ("acme_corp", "globex"):
        w = CollectionWriter(cat, tenant, "text-model")
        hits = w.search(DenseSearchRequest(query_vector=[1.0, 0.0, 0.0, 0.0],
                                           limit=2), chunk_col="chunk").collect()
        print(f"{tenant} top hits:", [(h["id"], h["chunk"]) for h in hits])

    print("collections:", cat.list_collections())

    # the reference's set_vector_store also provisions a tenant client +
    # role grants (base_milvus.py:620-679, 1321-1365) — the metadata-layer
    # equivalents live in security.py
    from flouds_vectordb_spark.security import KeyManager, Rbac

    km, rbac = KeyManager(cat), Rbac(cat)
    creds = km.set_user("acme_corp")
    print(f"tenant client: {creds['client_id']} (secret returned once)")
    assert km.validate_client(creds["client_id"], creds["client_secret"])
    rbac.grant_tenant_privileges_to_collection("acme_corp",
                                               cat.list_collections("acme_corp")[0])
    assert rbac.has_privilege("flouds_admin_role",
                              cat.list_collections("acme_corp")[0], "Search")
    print("granted:", sorted(rbac.list_grants("flouds_admin_role")))

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
