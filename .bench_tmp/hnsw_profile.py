import shutil, time, numpy as np, sys
sys.path.insert(0, "/root/repo")
from flouds_vectordb_spark.session import get_spark
from flouds_vectordb_spark.plans.hnsw import build_hnsw
import pyspark.sql.functions as F

spark = get_spark("hnswprof")
n, dim = 600_000, 32
df = (spark.range(n).select(
        F.col("id"),
        F.transform(F.sequence(F.lit(1), F.lit(dim)),
                    lambda i: F.sin(F.col("id") * i * 0.7 + i * i * 0.13)).alias("vector"))
      ).persist()
df.count()
path = "/root/repo/.bench_tmp/hnsw600k"
shutil.rmtree(path, ignore_errors=True)
t0 = time.perf_counter()
idx = build_hnsw(df, path, m=8, metric="COSINE", cell_target=128)
t1 = time.perf_counter()
print(f"BUILD_TOTAL {t1-t0:.1f}s ncells={idx.meta['ncells']} n={idx.meta['n']}")

# microbench: one cell_topm worth of work at representative cell sizes
for g in (128, 192, 256):
    vecs = np.random.RandomState(1).standard_normal((g, dim))
    t0 = time.perf_counter()
    reps = 200
    for _ in range(reps):
        nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        s = np.clip(nv @ nv.T, -1.0, 1.0)
        np.fill_diagonal(s, -np.inf)
        ids = np.arange(g)
        ordid = np.argsort(ids, kind="stable")
        so = s[:, ordid]
        top = np.argsort(-so, axis=1, kind="stable")[:, :8]
    dt = (time.perf_counter() - t0) / reps
    print(f"CELL g={g}: {dt*1e3:.2f} ms/cell -> {dt/g*1e6:.1f} us/row")
shutil.rmtree(path, ignore_errors=True)
spark.stop()
