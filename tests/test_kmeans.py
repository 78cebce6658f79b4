from pyspark.sql import functions as F

from rag_content_spark.operators.kmeans import inertia, kmeans


def _vectors(spark):
    rows = []
    # two tight clusters around (0,0) and (10,10), plus seeds inside each
    for i in range(20):
        rows.append((i, [0.0 + (i % 5) * 0.1, 0.0 + (i % 3) * 0.1]))
    for i in range(20, 40):
        rows.append((i, [10.0 + (i % 5) * 0.1, 10.0 + (i % 3) * 0.1]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kmeans_separates_clusters(spark):
    df = _vectors(spark)
    seeds = [(0, [1.0, 1.0]), (1, [9.0, 9.0])]
    centroids, assigned = kmeans(df, seeds, iterations=3)
    got = {
        r["vec_id"]: r["centroid_id"] for r in assigned.collect()
    }
    assert all(got[i] == 0 for i in range(20))
    assert all(got[i] == 1 for i in range(20, 40))
    (c0, v0), (c1, v1) = centroids
    assert abs(v0[0] - 0.2) < 0.1 and abs(v1[0] - 10.2) < 0.1


def test_kmeans_inertia_decreases(spark):
    df = _vectors(spark)
    seeds = [(0, [1.0, 5.0]), (1, [9.0, 5.0])]
    c1, a1 = kmeans(df, seeds, iterations=1)
    c3, a3 = kmeans(df, seeds, iterations=3)
    assert inertia(a3, c3) <= inertia(a1, c1) + 1e-9
