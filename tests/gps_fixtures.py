"""GPS-domain fixtures for pipeline tests.

The reference's sample (`/root/reference/Sample Data/gps.csv`, 4,713
pings / 20 vehicles / one day) carries real trajectories, but its
``linenumber`` column is a per-ping running counter (398 distinct values,
~1 ping each) — NOT a line id like the production `"00E42"` values. For
per-line semantics we remap it deterministically: vehicle ``id`` →
line ``L0…L4`` (4 vehicles per line), per FIXTURES.md §A1 ("each vehicle
on one line; ≥3 vehicles/line").

``bus_line`` is synthesized per FIXTURES.md §A2 (the upstream file is
missing): for each line, a direction-1 terminal on the first ping and a
direction-2 terminal on the last ping of the line's first vehicle, so
the 100 m retag radius fires.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GPS_CSV = "/root/reference/Sample Data/gps.csv"
PARAMS_CSV = "/root/reference/Sample Data/lines95_parameter.csv"
N_LINES = 5


def gps_fixture(spark: SparkSession) -> DataFrame:
    """Sample pings with a stable per-vehicle line assignment."""
    from gpssbzd_spark.sources.csv import read_gps

    gps = read_gps(spark, GPS_CSV)
    line = F.concat(F.lit("L"), (F.col("id").cast("int") % N_LINES).cast("string"))
    return gps.withColumn("linenumber", line)


def synthesize_bus_line(spark: SparkSession, tmpdir: str) -> str:
    """Write a semicolon-delimited bus_line.csv with terminals on the
    first/last ping of EVERY vehicle of each line (real lines have
    several terminal stops per direction; pattern extraction must
    tolerate that — and the round-trip filter can then qualify every
    vehicle instead of only the line's first one)."""
    gps = gps_fixture(spark)
    rows = (
        gps.orderBy("id", "ts")
        .select("linenumber", "id", "lng", "lat")
        .collect()
    )
    first_last: dict[tuple[str, str], list] = {}
    for r in rows:
        key = (r["linenumber"], r["id"])
        if key not in first_last:
            first_last[key] = [(r["lng"], r["lat"]), (r["lng"], r["lat"])]
        else:
            first_last[key][1] = (r["lng"], r["lat"])

    path = os.path.join(tmpdir, "bus_line.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f, delimiter=";")
        w.writerow(["existLine_id", "x", "y", "direction", "position"])
        for (line, _vid), (start, end) in sorted(first_last.items()):
            # x = lat, y = lng (FIXTURES.md §A2 / PPE:103 argument order)
            w.writerow([line, f"{start[1]:.9f}", f"{start[0]:.9f}", 1, 1])
            w.writerow([line, f"{end[1]:.9f}", f"{end[0]:.9f}", 2, 1])
    return path
