"""Round-5e operators: entity-resolution capstone (er.py)."""

import random

import duckdb
import pytest

from biocypher_metta_spark.er import resolve_entities, resolve_entities_sql

_ER_SCHEMA = ("rid: long, mname: string, src_rank: int, "
              "name: string, cents: long")


def _duck(rows):
    vals = ", ".join(
        "(" + ", ".join("NULL" if v is None
                        else (f"'{v}'" if isinstance(v, str) else str(v))
                        for v in r) + ")" for r in rows)
    src = (f"SELECT * FROM (VALUES {vals}) "
           f"t(rid, mname, src_rank, name, cents)")
    con = duckdb.connect()
    return sorted(tuple(r) for r in con.execute(
        resolve_entities_sql(src, "rid", "mname", ["src_rank", "rid"],
                             ["name", "cents"],
                             tau_permille=600)).fetchall())


def _run(spark, rows):
    df = spark.createDataFrame(rows, _ER_SCHEMA)
    return sorted(tuple(r) for r in resolve_entities(
        df, "rid", "mname", ["src_rank", "rid"], ["name", "cents"],
        tau_permille=600).collect())


def test_er_transitive_merge_and_singleton(spark):
    # A~B (J=3/5=600) and B~C (J=3/5=600) but A~C only 2/6: one
    # cluster of 3 via transitivity; D matches nothing -> singleton.
    rows = [(1, "a b c d", 0, None, 100),
            (2, "a b c e", 1, "two", None),
            (3, "a b e f", 0, "three", 300),
            (9, "x y z w", 2, "solo", 900)]
    got = _run(spark, rows)
    assert got == [(1, 3, "three", 100), (9, 1, "solo", 900)]
    # per-field: name from the best-rank record that HAS one (rid 3,
    # rank 0); cents from rid 1 (rank 0, rid beats rid 3's tie).


def test_er_matches_duckdb_twin_randomized(spark):
    rng = random.Random(31)
    rows = []
    for rid in range(120):
        e = rid // 4
        toks = [f"ent{e}", f"id{e}"]
        if rng.random() < 0.8:
            toks.append(f"grp{e % 5}")
        toks.append(f"v{e}_{rid % 3}")
        rows.append((rid, " ".join(toks), rng.randrange(3),
                     None if rng.random() < 0.3 else f"n{rid}",
                     None if rng.random() < 0.3 else rng.randrange(10**4)))
    assert _run(spark, rows) == _duck(rows)


def test_er_null_and_empty_names_are_singletons(spark):
    rows = [(1, None, 0, "a", 1), (2, "   ", 0, "b", 2),
            (3, "q r s t", 0, "c", 3), (4, "q r s t", 1, None, 4)]
    got = _run(spark, rows)
    assert got == [(1, 1, "a", 1), (2, 1, "b", 2), (3, 2, "c", 3)]


def test_er_validation(spark):
    df = spark.createDataFrame([(1, "a", 0, "x", 1)], _ER_SCHEMA)
    with pytest.raises(ValueError, match="not in records"):
        resolve_entities(df, "nope", "mname", ["src_rank"], ["name"])
    with pytest.raises(ValueError, match="match-only"):
        resolve_entities(df, "rid", "mname", ["src_rank"], ["mname"])
    with pytest.raises(ValueError, match="entity_id"):
        resolve_entities(df.withColumnRenamed("name", "entity_id"),
                         "rid", "mname", ["src_rank"], ["cents"])
