"""10x scale rehearsal for the round-5m operators: per-group Gini,
PMI collocations, OLS trend, chi-square independence,
4-cycle census, collaboration-weight projection, RAKE keyphrases,
winsorize, decile lift, n-gram novelty.

Same contract as rehearsal_r5b..r5k: each op runs at N and 10N in one
JVM (warmup excluded); claimed shapes:

* gini — one key shuffle + per-group rank sort + mergeable moment
  groupBy: ~linear in rows while groups stay sortable (the hot-group
  histogram escape hatch is documented, not exercised here);
* pmi — tokenize map-side, two n-gram groupBys with map-side combine,
  vocab-sized window for N, min_count-pruned vocab joins, TakeOrdered
  top-k: ~linear in tokens at fixed vocabulary;
* linreg — ONE mergeable moment groupBy: ~linear, shuffle-constant
  bound at small group counts;
* chisq — one cell groupBy (map-side combine) + windows over the
  |A|x|B| aggregated cells: ~linear in rows at fixed grid;
* four_cycles — cooccurrence projection over the adjacency: pair
  volume sum(deg^2); on the fixed-degree grid here, ~linear in edges;
* collab — distinct + size join + doc-keyed self-join: ~linear when
  per-doc membership is bounded (5 priorities per customer here);
* rake — map-side phrase extraction + one word groupBy + vocab join
  + phrase groupBy: ~linear in tokens at fixed vocabulary;
* winsorize — rank+count windows on one key shuffle + bounds join:
  ~linear while groups stay sortable;
* decile_lift — per-value groupBy then value-cardinality-sized
  single-partition windows: ~linear in rows at fixed value domain;
* novelty — gram explode + distinct + gram groupBy + join back:
  ~linear in tokens (gram keys are 60-bit hashes).

Prints ONE JSON line per op and writes tools/rehearsal_r5m.json.
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


def run_gini(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.stats import gini

    df = spark.range(n).select(
        (F.col("id") % 64).alias("grp"),
        ((F.col("id") * 37 + 11) % 100000).alias("cents"))
    t0 = time.time()
    out = gini(df, ["grp"], "cents").count()
    return {"rows": n, "out": out, "sec": round(time.time() - t0, 2)}


def run_pmi(spark, n_docs: int) -> dict:
    from biocypher_metta_spark.operators.text import pmi_collocations

    # 50-token docs over a fixed 1000-word vocabulary with a planted
    # phrase pattern (deterministic, no Date/random)
    i = F.col("id")
    word = lambda e: F.concat(F.lit("w"), ((e) % 1000).cast("string"))  # noqa: E731
    docs = spark.range(n_docs).select(
        F.concat_ws(" ", *[word(i * 53 + j * 17 + (j % 2) * 500)
                           for j in range(50)]).alias("text"))
    t0 = time.time()
    out = pmi_collocations(docs, min_count=5, k=100).count()
    return {"docs": n_docs, "out": out, "sec": round(time.time() - t0, 2)}


def run_linreg(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.stats import linreg

    df = spark.range(n).select(
        (F.col("id") % 64).alias("grp"),
        (F.col("id") % 365).alias("x"),
        ((F.col("id") * 37 + 11) % 100000).alias("y"))
    t0 = time.time()
    out = linreg(df, ["grp"], "x", "y").count()
    return {"rows": n, "out": out, "sec": round(time.time() - t0, 2)}


def run_chisq(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.stats import chisq

    i = F.col("id")
    df = spark.range(n).select(
        (i % 16).alias("grp"),
        ((i * 7) % 12).alias("a"),
        ((i * 11 + (i / 13).cast("long")) % 9).alias("b"))
    t0 = time.time()
    out = chisq(df, ["grp"], "a", "b").count()
    return {"rows": n, "out": out, "sec": round(time.time() - t0, 2)}


def run_c4(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.graph import four_cycles

    # n/2560 disjoint COMPLETE 16x16 grid blocks (blk = i mod B,
    # pos = (i div B) mod 256 — decoupled strides, so every block
    # covers all 256 positions ~10x): fixed degree, 225 unit faces
    # per block, cycles scale linearly with n
    b_cnt = max(n // 2560, 1)
    i = F.col("id")
    pos = (i / b_cnt).cast("long") % 256
    base = (i % b_cnt) * 256 + pos
    right = (spark.range(n).select(base.alias("src"),
                                   (base + 1).alias("dst"))
             .filter(pos % 16 != 15))
    down = (spark.range(n).select(base.alias("src"),
                                  (base + 16).alias("dst"))
            .filter(pos < 240))
    t0 = time.time()
    out = four_cycles(right.unionAll(down)).count()
    return {"rows": n, "out": out, "sec": round(time.time() - t0, 2)}


def run_collab(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.graph import collab_weight_edges

    # 8 memberships per doc over a 50-item universe: d = i mod D,
    # k = i div D in 0..7, item = (3d + 13k) mod 50 — 13k mod 50 is
    # injective on 0..7, so every doc holds 8 DISTINCT items
    d_cnt = max(n // 8, 1)
    i = F.col("id")
    df = spark.range(n).select(
        (i % d_cnt).alias("d"),
        ((i % d_cnt) * 3 + (i / d_cnt).cast("long") * 13).alias("_x")
    ).select("d", (F.col("_x") % 50).alias("it"))
    t0 = time.time()
    out = collab_weight_edges(df, "d", "it", min_count=2).count()
    return {"rows": n, "out": out, "sec": round(time.time() - t0, 2)}


def run_rake(spark, n_docs: int) -> dict:
    from biocypher_metta_spark.operators.text import rake_keyphrases

    i = F.col("id")
    # 30-token docs with stopword boundaries
    # digits translate to letters so tokens match ^[a-z]+$ (a digit
    # anywhere makes the token a BOUNDARY and no phrase ever forms)
    word = lambda e: F.concat(F.lit("w"), F.translate(  # noqa: E731
        (e % 800).cast("string"), "0123456789", "abcdefghij"))
    # boundary every 4th token -> 3-word runs (a 5-word run would
    # exceed max_words=4 and be dropped, not truncated)
    parts = [F.lit("the") if j % 4 == 3
             else word(i * 31 + j * 13) for j in range(30)]
    docs = spark.range(n_docs).select(
        F.concat_ws(" ", *parts).alias("text"))
    t0 = time.time()
    out = rake_keyphrases(docs, k=100).count()
    return {"docs": n_docs, "out": out, "sec": round(time.time() - t0, 2)}


def run_winsorize(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.stats import winsorize

    df = spark.range(n).select(
        (F.col("id") % 64).alias("grp"),
        ((F.col("id") * 37 + 11) % 100000).alias("v"))
    t0 = time.time()
    # count CLAMPED rows — a bare count() lets the optimizer prune
    # the clamp projection; filtering on is_clamped forces the rank
    # window and bounds join to actually run
    out = winsorize(df, ["grp"], "v", 25).filter("is_clamped").count()
    return {"rows": n, "out": out, "sec": round(time.time() - t0, 2)}


def run_decile(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.stats import decile_lift

    i = F.col("id")
    df = spark.range(n).select(
        ((i * 37 + 11) % 10007).alias("s"),
        ((i * 13) % 7 == 0).cast("long").alias("y"))
    t0 = time.time()
    out = decile_lift(df, "s", "y").count()
    return {"rows": n, "out": out, "sec": round(time.time() - t0, 2)}


def run_novelty(spark, n_docs: int) -> dict:
    from biocypher_metta_spark.operators.text import ngram_novelty

    i = F.col("id")
    word = lambda e: F.concat(F.lit("w"), F.translate(  # noqa: E731
        (e % 3000).cast("string"), "0123456789", "abcdefghij"))
    docs = spark.range(n_docs).select(
        i.cast("string").alias("doc_id"),
        F.concat_ws(" ", *[word(i * 29 + j * 11)
                           for j in range(25)]).alias("text"))
    t0 = time.time()
    out = ngram_novelty(docs).count()
    return {"docs": n_docs, "out": out, "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark("rehearsal-r5m")
    spark.sparkContext.setLogLevel("ERROR")
    runs = {}
    for name, fn, n in [("gini", run_gini, 5_000_000),
                        ("pmi", run_pmi, 200_000),
                        ("linreg", run_linreg, 5_000_000),
                        ("chisq", run_chisq, 5_000_000),
                        ("four_cycles", run_c4, 2_000_000),
                        ("collab", run_collab, 2_000_000),
                        ("rake", run_rake, 200_000),
                        ("winsorize", run_winsorize, 5_000_000),
                        ("decile", run_decile, 5_000_000),
                        ("novelty", run_novelty, 200_000)]:
        fn(spark, max(n // 50, 1000))  # warmup, excluded
        a = fn(spark, n)
        b = fn(spark, n * 10)
        runs[name] = {"n": a, "10n": b}
        print(json.dumps({name: runs[name]}))
    ratios = {k: round(v["10n"]["sec"] / max(v["n"]["sec"], 0.01), 2)
              for k, v in runs.items()}
    out = {"runs": runs, "ratios": ratios}
    (Path(__file__).parent / "rehearsal_r5m.json").write_text(
        json.dumps(out) + "\n")
    print(json.dumps({"ratios": ratios}))


if __name__ == "__main__":
    main()
