"""10x scale rehearsal for the round-5c operators: label propagation
and gapfill (in rehearsal_r5b.py), plus co-occurrence projection,
weighted sampling, markup stripping, link extraction, interval
coalescing, snapshot diff, neighborhood Jaccard, and char-bigram LM
training here.

Same contract as rehearsal_r5b.py: each op runs at N and 10N in one
JVM (warmup excluded); a plan survives the scale-up iff time grows
~linearly for row-bound ops with no driver collects or state
blow-ups. Op-specific notes:

* cooccurrence: the corpus plants ONE mega-doc with `n // 100`
  memberships among uniform 20-item docs — uncapped it alone would
  emit ~C(n/100, 2) pairs (5*10^9 at 10N), so the leg runs with
  max_items_per_doc=50 and the measured time proves the cap holds
  the mega-doc to C(50,2) like everyone else. THE trap this operator
  exists to guard.
* weighted_sample: stratified draw with a planted mega-stratum
  (20% of rows on one stratum) — the per-stratum top-n window under
  the same skew the domain-cap leg exercises.
* strip_markup / extract_links: map-only regexp chains — expect
  ratio ~10 or less (fixed JVM/stage overhead amortizing).
* interval_merge: one key shuffle + two same-partitioning windows.
* snapshot_diff: full outer join on the key; output sized by the
  planted ~27% churn, not the table.

Prints ONE JSON line and writes tools/rehearsal_r5c.json
(incremental-merge on partial reruns, same as r5b).
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


def run_cooccurrence(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.graph import cooccurrence_edges

    # vocab size is PRIME (4999): with a round vocab like 5000 and
    # n_docs a multiple of it, (id * C) % vocab is CONSTANT across a
    # doc's member ids (id = d + j*n_docs, n_docs*C === 0 mod vocab)
    # -> every doc collapses to ONE item and zero pairs. Measured in
    # the first draft of this leg; primality breaks the congruence.
    n_docs = max(n // 20, 100)
    uniform = spark.range(n).select(
        (F.col("id") % n_docs).alias("doc"),
        F.concat(F.lit("t"), ((F.col("id") * 2654435761) % 4999)
                 .cast("string")).alias("it"))
    mega = spark.range(n // 100).select(
        F.lit(-1).cast("long").alias("doc"),
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("it"))
    t0 = time.time()
    out = cooccurrence_edges(uniform.unionAll(mega), "doc", "it",
                             min_count=2, max_items_per_doc=50)
    edges = out.count()
    return {"memberships_in": n, "mega_doc_items": n // 100,
            "edges_out": edges, "sec": round(time.time() - t0, 2)}


def run_weighted_sample(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.sampling import weighted_sample

    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when((F.col("id") * 2654435761) % 10 < 2, "mega")
        .otherwise(F.concat(F.lit("s"), (F.col("id") % 50).cast("string")))
        .alias("g"),
        (F.col("id") % 997 + 1).alias("wt"))
    t0 = time.time()
    out = weighted_sample(d, 100, "wt", strata_cols=["g"],
                          id_col="doc_id").count()
    return {"rows_in": n, "rows_out": out,
            "sec": round(time.time() - t0, 2)}


def run_strip_markup(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.text import strip_markup

    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit('<p a="b">word'), (F.col("id") % 100).cast("string"),
                 F.lit(' <script>x<y</script> &amp; tail</p>'))
        .alias("text"))
    t0 = time.time()
    out = strip_markup(d)
    total = out.agg(F.sum(F.length("clean_text"))).first()[0]
    return {"rows_in": n, "chars_out": int(total),
            "sec": round(time.time() - t0, 2)}


def run_extract_links(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.web import extract_links

    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit('<a href="https://h'), (F.col("id") % 1000).cast("string"),
            F.lit('.com/p?x=1">a</a> <a href="/rel">r</a> '
                  '<a href="https://h'),
            ((F.col("id") / 7).cast("long") % 1000).cast("string"),
            F.lit('.com/q">b</a>')).alias("text"))
    t0 = time.time()
    out = extract_links(d).count()
    return {"pages_in": n, "edges_out": out,
            "sec": round(time.time() - t0, 2)}


def run_interval_merge(spark, n: int) -> dict:
    from biocypher_metta_spark.functions.genomic import merge_intervals

    k = max(n // 2000, 10)
    d = spark.range(n).select(
        (F.col("id") % k).alias("grp"),
        ((F.col("id") * 2654435761) % 100_000).alias("start"))
    d = d.withColumn("end", F.col("start") + (F.col("grp") % 40))
    t0 = time.time()
    out = merge_intervals(d, ["grp"], slack=5).count()
    return {"intervals_in": n, "blocks_out": out,
            "sec": round(time.time() - t0, 2)}


def run_snapshot_diff(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.cdc import snapshot_diff

    # the full outer join shuffles BOTH 200M-row sides; at the fixed
    # 32 partitions the 10N leg spills (measured 43.9s vs 34.9s at
    # 128) — size the shuffle with the data, the BENCH.md partition
    # discipline, instead of reading spill as an operator defect
    parts = max(32, n // 3_000_000)
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    base = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 1009).alias("v"))
    old = base.filter(F.col("k") % 7 != 0)
    new = (base.filter(F.col("k") % 5 != 0)
           .withColumn("v", F.col("v")
                       + F.when(F.col("k") % 11 == 0, 1).otherwise(0)))
    t0 = time.time()
    out = snapshot_diff(old, new, ["k"], ["v"]).count()
    sec = round(time.time() - t0, 2)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    return {"keys_in": n, "diff_rows": out, "shuffle_parts": parts,
            "sec": sec}


def run_jaccard(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.graph import neighborhood_jaccard

    # ~10 edges/node of hash-varied chords INSIDE 50-node blocks (the
    # LPA leg's corpus): block locality manufactures genuinely shared
    # neighborhoods so min_common=3 has real pairs to emit. The first
    # draft used dst = (id*7+13) % v — constant per src because
    # 7*j*v === 0 mod v across a node's member ids (the same
    # congruence footgun as the cooccurrence corpus above), degree
    # collapsed to ~2 and pairs_out was 0.
    v = max(n // 10, 1000)
    d = spark.range(n).select(
        (F.col("id") % v).alias("node"),
        (F.col("id") * 2654435761).alias("h"))
    d = d.select(
        F.col("node").alias("src"),
        ((F.col("node") / 50).cast("long") * 50
         + (F.col("node") + F.col("h") % 49 + 1) % 50).alias("dst"))
    t0 = time.time()
    out = neighborhood_jaccard(d, min_common=3).count()
    return {"edges_in": n, "pairs_out": out,
            "sec": round(time.time() - t0, 2)}


def run_lm_train(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.text import train_char_bigram_lm

    d = spark.range(n).select(
        F.concat(F.lit("the quick brown fox number "),
                 (F.col("id") % 9973).cast("string"),
                 F.lit(" jumps over it")).alias("text"))
    t0 = time.time()
    out = train_char_bigram_lm(d)
    total = out.agg(F.sum("n")).first()[0]
    rows = out.count()
    return {"docs_in": n, "bigram_rows": rows, "bigrams_total": int(total),
            "sec": round(time.time() - t0, 2)}


def main():
    spark = get_spark("rehearsal-r5c")
    spark.sparkContext.setLogLevel("ERROR")
    ops = {
        "cooccurrence": (run_cooccurrence, 5_000_000),
        "weighted_sample": (run_weighted_sample, 20_000_000),
        "strip_markup": (run_strip_markup, 5_000_000),
        "extract_links": (run_extract_links, 5_000_000),
        "interval_merge": (run_interval_merge, 10_000_000),
        "snapshot_diff": (run_snapshot_diff, 20_000_000),
        "jaccard": (run_jaccard, 2_000_000),
        "lm_train": (run_lm_train, 2_000_000),
    }
    only = set(sys.argv[1:])
    art = REPO / "tools" / "rehearsal_r5c.json"
    prev = json.loads(art.read_text()) if art.exists() else {}
    runs = prev.get("runs", {})
    ratios = prev.get("ratios", {})
    for name, (fn, n) in ops.items():
        if only and name not in only:
            continue
        fn(spark, max(n // 100, 1000))          # warmup, excluded
        small = fn(spark, n)
        big = fn(spark, n * 10)
        runs[name] = {"n": small, "10n": big}
        ratios[name] = round(big["sec"] / max(small["sec"], 1e-9), 2)
        print(json.dumps({name: runs[name], "ratio": ratios[name]}),
              flush=True)
    out = {"runs": runs, "ratios": ratios}
    art.write_text(json.dumps(out))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
