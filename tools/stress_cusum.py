"""Scale + detection stress for the CUSUM drift statistic
(queries/events.py::events_cusum_drift): a deterministic synthetic stream
orders of magnitude past the fixture, with a KNOWN mean shift planted
mid-stream in one event type, run through the registered query, then

  1. verified exactly: the distributed telescoped-window statistics equal
     the textbook recursion replayed in plain Python over the same scaled
     integers — for EVERY row of the shifted and one unshifted type;
  2. verified behaviorally: the shifted type's POSITIVE side fires only
     after the change point and stays in sustained alarm; stationary
     types flag only at a tail rate (<0.2% of rows — with bounded
     uniform noise and h=8*sigma, rare excursions are expected at 200k
     rows; zero-flag would be the wrong claim);
  3. timed: statistic pipeline wall time reported.

'Noise' is deterministic (md5-derived uniform in [-500, 500] around the
mean), so the run is reproducible and the pre-shift no-flag claim is a
hard assertion, not a probability. Usage:
python tools/stress_cusum.py [n_events] [n_types]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from codegraphdb_spark.session import get_spark  # noqa: E402

SHIFT_TYPE = "t0"  # the type with the planted change point
SHIFT_AT = 0.6  # fraction of the type's stream where the mean jumps
SHIFT_SIZE = 400.0  # jump ~0.7 sigma of the uniform noise below
BASE = 1000.0
NOISE = 500.0  # uniform +-NOISE


def synth_events(n_events: int, n_types: int):
    rows = []
    per_type = n_events // n_types
    for t in range(n_types):
        typ = f"t{t}"
        for i in range(per_type):
            h = int(hashlib.md5(f"{typ}:{i}".encode()).hexdigest()[:8], 16)
            noise = (h / 0xFFFFFFFF) * 2 * NOISE - NOISE
            mean = BASE + (
                SHIFT_SIZE if typ == SHIFT_TYPE and i >= per_type * SHIFT_AT else 0.0
            )
            rows.append(
                (
                    t * per_type + i,
                    # one event per second per type, deterministic order
                    f"2024-01-01 00:00:00.{0:06d}",
                    i,  # ts built below from this ordinal
                    typ,
                    mean + noise,
                )
            )
    return rows, per_type


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_types = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("stress-cusum")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from codegraphdb_spark import registry
    from codegraphdb_spark.queries.events import _CUSUM_SCALE

    registry.load_all()
    rows, per_type = synth_events(n_events, n_types)
    d = tempfile.mkdtemp(prefix="cusum_stress_")
    df = spark.createDataFrame(
        [(r[0], r[2], r[3], r[4]) for r in rows],
        "event_id BIGINT, ordinal BIGINT, event_type STRING, value DOUBLE",
    ).select(
        "event_id",
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(
            secs=F.col("ordinal").cast("double")
        )).alias("ts"),
        F.lit(7).cast("bigint").alias("user_id"),
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    )
    df.coalesce(16).write.mode("overwrite").parquet(f"{d}/events.parquet")

    t0 = time.time()
    got = {
        r.event_id: r
        for r in registry.QUERIES["events_cusum_drift"](spark, d).collect()
    }
    wall = time.time() - t0

    # exact replica for the shifted type + one stationary type
    import pandas as pd  # noqa: F401 — spark already pulled it in

    src = spark.read.parquet(f"{d}/events.parquet").collect()
    bytype: dict[str, list] = {}
    for r in src:
        bytype.setdefault(r.event_type, []).append(r)
    change_point = int(per_type * SHIFT_AT)
    for typ in (SHIFT_TYPE, f"t{int(sys.argv[2]) - 1 if len(sys.argv) > 2 else 4}"):
        evs = sorted(bytype[typ], key=lambda r: (r.ts, r.event_id))
        from decimal import ROUND_HALF_UP, Decimal

        def _hup(x: float) -> int:
            # match Spark F.round (HALF_UP); Python round() is HALF_EVEN
            return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

        vs = [_hup(r.value * _CUSUM_SCALE) for r in evs]
        n = len(vs)
        mu = _hup(sum(vs) / n)
        var = max(sum(v * v for v in vs) / n - (sum(vs) / n) ** 2, 0.0)
        sigma = _hup(math.sqrt(var))
        k = sigma // 2
        sp = sn = 0
        first_pos = None
        n_flags = 0
        post_flags = 0
        for idx, (r, v) in enumerate(zip(evs, vs)):
            dlt = v - mu
            sp = max(0, sp + dlt - k)
            sn = max(0, sn - dlt - k)
            g = got[r.event_id]
            assert g.cusum_pos == sp / _CUSUM_SCALE, (typ, r.event_id)
            assert g.cusum_neg == sn / _CUSUM_SCALE, (typ, r.event_id)
            flag = 1 if (sp > 8 * sigma or sn > 8 * sigma) else 0
            assert g.drift_flag == flag, (typ, r.event_id)
            n_flags += flag
            if flag and idx >= change_point:
                post_flags += 1
            if sp > 8 * sigma and first_pos is None:
                first_pos = idx
        if typ == SHIFT_TYPE:
            # mu/sigma are calibrated over the FULL stream, so the
            # pre-shift period genuinely sits BELOW the global reference:
            # the negative side legitimately fires there (true positive
            # against the reference). The planted upward jump must be
            # caught by the POSITIVE side, only after the change, and
            # the post-change regime must be a SUSTAINED alarm.
            assert first_pos is not None, "planted shift never detected"
            assert first_pos >= change_point, (
                f"positive-side alarm before the change point "
                f"({first_pos} < {change_point})"
            )
            detect_delay = first_pos - change_point
            post_n = n - change_point
            assert post_flags > 0.5 * post_n, (
                f"post-change alarm not sustained ({post_flags}/{post_n})"
            )
        else:
            # driftless noise: rare tail excursions only
            assert n_flags < 0.002 * n, (
                f"stationary type {typ} flag rate {n_flags}/{n}"
            )

    print(
        f"OK events={n_events} types={n_types} change_at={change_point} "
        f"detect_delay={detect_delay} rows spark={wall:.2f}s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
