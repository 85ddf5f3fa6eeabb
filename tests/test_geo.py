"""Geo operators: radius-join completeness vs brute force, haversine
vs textbook formula, boundary inclusivity, negative-coordinate cells."""

from __future__ import annotations


def test_radius_join_vs_bruteforce(spark):
    import random

    import pandas as pd

    from strava_etl_public_spark.operators.geo import radius_join_cells

    rng = random.Random(17)
    L = [(i, rng.uniform(-1, 1), rng.uniform(-1, 1)) for i in range(120)]
    R = [(j, rng.uniform(-1, 1), rng.uniform(-1, 1)) for j in range(90)]
    ldf = spark.createDataFrame(pd.DataFrame(L, columns=["lid", "la", "lo"]))
    rdf = spark.createDataFrame(pd.DataFrame(R, columns=["rid", "ra", "ro"]))
    radius = 150000  # 0.15 deg in micro-deg
    got = radius_join_cells(ldf, rdf, "la", "lo", "ra", "ro", radius).toPandas()
    pairs = set(zip(got.lid, got.rid))
    assert len(pairs) == len(got)  # exactly once per pair

    def q(v):
        import math

        return math.floor(abs(v) * 1e6 + 0.5) * (1 if v >= 0 else -1)

    want = set()
    for i, la, lo in L:
        for j, ra, ro in R:
            d2 = (q(la) - q(ra)) ** 2 + (q(lo) - q(ro)) ** 2
            if d2 <= radius * radius:
                want.add((i, j))
    assert pairs == want


def test_radius_join_boundary_inclusive_and_negative_cells(spark):
    import pandas as pd

    from strava_etl_public_spark.operators.geo import radius_join_cells

    # exactly at the radius → included; just beyond → excluded; points
    # straddling 0 exercise negative-coordinate floor cells
    L = [(1, 0.0, 0.0), (2, -0.49999, -0.49999)]
    R = [(10, 0.05, 0.0), (11, 0.050001, 0.0), (12, -0.5, -0.5)]
    ldf = spark.createDataFrame(pd.DataFrame(L, columns=["lid", "la", "lo"]))
    rdf = spark.createDataFrame(pd.DataFrame(R, columns=["rid", "ra", "ro"]))
    got = radius_join_cells(ldf, rdf, "la", "lo", "ra", "ro", 50000).toPandas()
    pairs = set(zip(got.lid, got.rid))
    assert (1, 10) in pairs      # dist == radius exactly
    assert (1, 11) not in pairs  # 1 micro-degree beyond
    assert (2, 12) in pairs      # negative-coordinate cells line up


def test_haversine_matches_textbook(spark):
    import math

    import pandas as pd

    from pyspark.sql import functions as F

    from strava_etl_public_spark.operators.geo import haversine_km

    cases = [
        (52.5200, 13.4050, 48.8566, 2.3522),   # Berlin–Paris ≈ 878 km
        (0.0, 0.0, 0.0, 1.0),                  # 1 deg on equator ≈ 111.19
        (10.0, 20.0, 10.0, 20.0),              # zero
    ]
    df = spark.createDataFrame(
        pd.DataFrame(cases, columns=["a", "b", "c", "d"])
    )
    got = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    ).toPandas()

    def ref(la1, lo1, la2, lo2):
        rad = math.pi / 180
        dla, dlo = (la2 - la1) * rad / 2, (lo2 - lo1) * rad / 2
        a = math.sin(dla) ** 2 + math.cos(la1 * rad) * math.cos(la2 * rad) * math.sin(dlo) ** 2
        return 2 * 6371 * math.asin(math.sqrt(a))

    for (la1, lo1, la2, lo2), km in zip(cases, got.km):
        assert abs(km - ref(la1, lo1, la2, lo2)) < 1e-9
    assert abs(got.km[0] - 878) < 2
