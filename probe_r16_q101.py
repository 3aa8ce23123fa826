"""r16 A/B probe: q101 triangle counting variants at sf0.1.

A) shipped shape: persisted edges, two pipelined broadcast-hash wedge
   joins, vertex/triangle counts overlapped via driver threads (r15).
B) same joins, the two counts SERIAL (measures the r15 overlap delta).
C) sorted-adjacency intersection: tri = sum over edges (a,b) of
   |N+(a) ∩ N+(b)| with N+ = out-neighbors under the a<b orientation
   (array_intersect per edge row instead of 49M hash probes).
"""
import time, sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from g_etl_spark.session import get_spark
from g_etl_spark.tables import load

spark = get_spark("probe_q101")
sf = "/root/testdata/sf0.1"
li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
li.count()

def edges_df():
    l1, l2 = li.alias("l1"), li.alias("l2")
    return (
        l1.join(l2, (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
                   & (F.col("l1.l_partkey") < F.col("l2.l_partkey")))
        .select(F.col("l1.l_partkey").alias("a"), F.col("l2.l_partkey").alias("b"))
        .distinct()
    )

def run_A():
    edges = edges_df().persist()
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    wedges = e1.join(e2, F.col("e1.b") == F.col("e2.a"))
    tris = wedges.join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
    verts = edges.select(F.col("a").alias("v")).unionAll(edges.select(F.col("b").alias("v")))
    n_edges = edges.count()
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_tri = pool.submit(tris.count)
        f_vert = pool.submit(lambda: verts.distinct().count())
        n_tri, n_vert = f_tri.result(), f_vert.result()
    edges.unpersist()
    return n_edges, n_vert, n_tri

def run_B():
    edges = edges_df().persist()
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    wedges = e1.join(e2, F.col("e1.b") == F.col("e2.a"))
    tris = wedges.join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
    verts = edges.select(F.col("a").alias("v")).unionAll(edges.select(F.col("b").alias("v")))
    n_edges = edges.count()
    n_tri = tris.count()
    n_vert = verts.distinct().count()
    edges.unpersist()
    return n_edges, n_vert, n_tri

def run_C():
    edges = edges_df().persist()
    adj = edges.groupBy("a").agg(F.sort_array(F.collect_list("b")).alias("nb"))
    ea = edges.join(adj.withColumnRenamed("a", "_k").withColumnRenamed("nb", "na"),
                    F.col("a") == F.col("_k")).drop("_k")
    eab = ea.join(adj.withColumnRenamed("a", "_k"), F.col("b") == F.col("_k")).drop("_k")
    tri = eab.select(F.size(F.array_intersect("na", "nb")).alias("t")).agg(F.sum("t")).collect()[0][0]
    verts = edges.select(F.col("a").alias("v")).unionAll(edges.select(F.col("b").alias("v")))
    n_edges = edges.count()
    n_vert = verts.distinct().count()
    edges.unpersist()
    return n_edges, n_vert, int(tri)

results = {}
for name, fn in [("A_overlap", run_A), ("B_serial", run_B), ("C_adjacency", run_C)]:
    per = []
    out = None
    for i in range(4):
        spark.catalog.clearCache()
        t0 = time.time()
        out = fn()
        per.append(round(time.time() - t0, 3))
    results[name] = (min(per), per, out)
    print(f"{name}: best={min(per)} {per} out={out}", flush=True)
outs = {v[2] for v in results.values()}
print("IDENTICAL" if len(outs) == 1 else f"MISMATCH {outs}")
