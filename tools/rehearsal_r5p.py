"""Scale rehearsal for the round-5p operator: planar proximity join
(operators/spatial.py).

Claimed shape: one equi-join on grid cells (9x expansion on one side)
— shuffle is 10x the points; the honest cost is the OUTPUT-VOLUME
bound (candidate pairs per cell ~ density^2), same contract as the 1D
interval_overlap rehearsal. Two axes, one JVM, warmup excluded:

  A (fixed density): 10x points on a 10x-area grid — output ~10x,
    wall-clock should track output;
  B (fixed grid): 10x points on the SAME grid — density 10x, output
    ~100x: the declared quadratic-in-density bound, measured honestly.

Writes tools/rehearsal_r5p.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from biocypher_metta_spark.session import get_spark  # noqa: E402


def run_prox(spark, n: int, grid: int, r: int = 60) -> dict:
    from biocypher_metta_spark.operators.spatial import proximity_join

    i = F.col("id")
    pts = spark.range(n).select(
        i.alias("id"),
        ((i * 2654435761) % grid).alias("x"),
        ((i * 40503 + 7) % grid).alias("y"))
    t0 = time.time()
    out = proximity_join(pts, r=r).count()
    return {"points": n, "grid": grid, "out": out,
            "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark("rehearsal-r5p")
    spark.sparkContext.setLogLevel("ERROR")
    run_prox(spark, 50_000, 20_000)  # warmup, excluded
    a1 = run_prox(spark, 1_000_000, 63_000)
    a2 = run_prox(spark, 10_000_000, 200_000)  # ~10x area: density ~=
    b2 = run_prox(spark, 10_000_000, 63_000)   # same grid: density 10x
    runs = {"fixed_density": {"n": a1, "10n": a2},
            "fixed_grid": {"n": a1, "10n": b2}}
    print(json.dumps(runs))
    ratios = {
        "fixed_density_10x": round(a2["sec"] / max(a1["sec"], 0.01), 2),
        "fixed_grid_10x": round(b2["sec"] / max(a1["sec"], 0.01), 2),
        "fixed_grid_out_ratio": round(b2["out"] / max(a1["out"], 1), 1),
    }
    out = {"runs": runs, "ratios": ratios}
    (Path(__file__).parent / "rehearsal_r5p.json").write_text(
        json.dumps(out) + "\n")
    print(json.dumps({"ratios": ratios}))


if __name__ == "__main__":
    main()
