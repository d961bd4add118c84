"""r9 guard tests (VERDICT r8 item 7): the IVF exact-dgemm guard must
bind on the INPUT components, not just the output distance — two
near-equal out-of-domain vectors have tiny |d| (the old output-only
guard stays silent) while their dot-product intermediates already
exceed 2^53 and can silently lose bits."""

from __future__ import annotations

import pytest

from codegraphdb_spark.queries.similarity import DIM, _IVF_Q, _ivf_ranked


def _expl(spark, val: float):
    return spark.createDataFrame(
        [(1, p, val) for p in range(1, DIM + 1)],
        "vec_id BIGINT, pos INT, x DOUBLE",
    )


def _cent(spark, val: float):
    return spark.createDataFrame(
        [(0, p, val) for p in range(1, DIM + 1)],
        "clabel INT, pos INT, c DOUBLE",
    )


def test_out_of_domain_vector_fires_input_guard(spark):
    # component 12.0 quantizes to 1.2e7 > sqrt(2^53/64) ~= 1.186e7,
    # while the full distance to a 0.5 centroid is ~8.5e15 < 2^53 — the
    # output-only guard would stay silent, the input guard must not
    import numpy as np

    assert (12.0 * _IVF_Q) > np.sqrt(2.0**53 / DIM)
    d_alone = DIM * (12.0 * _IVF_Q - 0.5 * _IVF_Q) ** 2
    assert d_alone < 2.0**53, "test premise: output guard would pass"

    df = _ivf_ranked(_expl(spark, 12.0), _cent(spark, 0.5), max_rn=1)
    with pytest.raises(Exception, match="quantized vector component"):
        df.collect()


def test_out_of_domain_centroid_fires_driver_guard(spark):
    # identical out-of-domain vector and centroid: |d| = 0 exactly, so
    # only an input-side assert can catch it; the centroid matrix is
    # collected driver-side, so this one raises eagerly
    with pytest.raises(AssertionError, match="quantized centroid component"):
        _ivf_ranked(_expl(spark, 12.0), _cent(spark, 12.0), max_rn=1)


def test_in_domain_passes(spark):
    rows = _ivf_ranked(_expl(spark, 1.5), _cent(spark, 0.5), max_rn=1).collect()
    assert len(rows) == 1
    expected = DIM * int((1.5 - 0.5) * _IVF_Q) ** 2
    assert rows[0]["d"] == expected
