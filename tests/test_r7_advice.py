"""Round-7 advice regressions: the IVF distance kernel must degrade to an
empty result on an empty centroid frame (as the old aggregate-join
formulation did via an empty join side), not ZeroDivisionError in the
chunk sizing."""

from __future__ import annotations

from codegraphdb_spark.queries.similarity import _ivf_ranked


def test_ivf_ranked_empty_centroids(spark):
    expl = spark.createDataFrame(
        [(1, 1, 0.5), (1, 2, 0.25)], "vec_id BIGINT, pos INT, x DOUBLE"
    )
    cent = spark.createDataFrame([], "clabel INT, pos INT, c DOUBLE")
    out = _ivf_ranked(expl, cent)
    assert out.columns == ["vec_id", "clabel", "d", "rn"]
    assert out.count() == 0
    out_lbl = _ivf_ranked(
        expl.withColumn("label", expl.vec_id.cast("int")), cent, keep_label=True
    )
    assert out_lbl.columns == ["vec_id", "label", "clabel", "d", "rn"]
    assert out_lbl.count() == 0
