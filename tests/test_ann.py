

def test_similarity_join_wrong_dim_raises(spark):
    """r14 (ADVICE): a wrong `dim` must raise loudly instead of silently
    collapsing every signature to bucket 0 (quadratic candidates)."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from flouds_vectordb_spark.operators.ann import (
        dedup_embedding_cosine,
        similarity_join,
    )

    rows = [(i, [float(i), float(i + 1), 0.5, -0.25]) for i in range(6)]
    df = spark.createDataFrame(rows, "id bigint, embedding array<double>")
    ok = similarity_join(df, df, tau=0.5, dim=4).collect()
    assert ok  # correct dim still works
    with pytest.raises(Exception, match="expected dim 5"):
        similarity_join(df, df, tau=0.5, dim=5).collect()
    with pytest.raises(Exception, match="expected dim 3"):
        dedup_embedding_cosine(df, tau=0.5, dim=3).collect()
