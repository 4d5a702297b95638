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


# ---------------------------------------------------------------------------
# funnel_stages (operators/temporal.py)
# ---------------------------------------------------------------------------

from datetime import datetime, timedelta

from biocypher_metta_spark.operators.temporal import (  # noqa: E402
    funnel_stages,
    funnel_stages_sql,
)

_FN_SCHEMA = "u: long, t: timestamp, s: string"
_T0 = datetime(2024, 1, 1)


def _ts(m):
    return _T0 + timedelta(minutes=m)


def _fn_run(spark, rows, steps):
    df = spark.createDataFrame(rows, _FN_SCHEMA)
    return sorted(tuple(r) for r in funnel_stages(
        df, "u", "t", "s", steps).collect())


def _fn_duck(rows, steps):
    vals = ", ".join(
        f"({u}, TIMESTAMP '{t}', " + ("NULL" if s is None else f"'{s}'") + ")"
        for u, t, s in rows)
    src = f"SELECT * FROM (VALUES {vals}) t(u, t, s)"
    con = duckdb.connect()
    return sorted(tuple(r) for r in con.execute(
        funnel_stages_sql(src, "u", "t", "s", steps)).fetchall())


def test_funnel_order_matters(spark):
    steps = ["a", "b", "c"]
    rows = [
        # u1 completes in order -> 3
        (1, _ts(0), "a"), (1, _ts(1), "b"), (1, _ts(2), "c"),
        # u2 has c BEFORE b -> stops at 2 (a then b; c never re-fires)
        (2, _ts(0), "a"), (2, _ts(1), "c"), (2, _ts(2), "b"),
        # u3 never enters (no 'a') -> no row
        (3, _ts(0), "b"), (3, _ts(1), "c"),
        # u4 only 'a' -> 1; noise steps ignored
        (4, _ts(0), "x"), (4, _ts(1), "a"), (4, _ts(2), "x"),
    ]
    got = _fn_run(spark, rows, steps)
    assert got == [(1, 3), (2, 2), (4, 1)]
    assert got == _fn_duck(rows, steps)


def test_funnel_same_timestamp_advances(spark):
    steps = ["a", "b"]
    rows = [(1, _ts(5), "b"), (1, _ts(5), "a"),   # b at SAME ts as a -> 2
            (2, _ts(5), "b"), (2, _ts(6), "a")]   # b strictly before a -> 1
    got = _fn_run(spark, rows, steps)
    assert got == [(1, 2), (2, 1)]
    assert got == _fn_duck(rows, steps)


def test_funnel_greedy_earliest_is_exact(spark):
    # a@0, a@2, b@1: the EARLIEST a (t=0) still allows b@1 -> stage 2.
    # A non-greedy "latest a" reading would miss it.
    steps = ["a", "b"]
    rows = [(1, _ts(0), "a"), (1, _ts(2), "a"), (1, _ts(1), "b")]
    got = _fn_run(spark, rows, steps)
    assert got == [(1, 2)]
    assert got == _fn_duck(rows, steps)


def test_funnel_matches_duckdb_twin_randomized(spark):
    rng = random.Random(47)
    steps = ["s0", "s1", "s2", "s3"]
    pool = steps + ["zz", "yy"]
    rows = []
    for u in range(40):
        for _ in range(rng.randrange(0, 12)):
            rows.append((u, _ts(rng.randrange(500)),
                         pool[rng.randrange(len(pool))]))
    rows.append((999, _ts(0), "s0"))  # guarantee non-empty output
    got = _fn_run(spark, rows, steps)
    assert got == _fn_duck(rows, steps)
    assert all(1 <= st <= 4 for _, st in got)


def test_funnel_validation(spark):
    df = spark.createDataFrame([(1, _ts(0), "a")], _FN_SCHEMA)
    with pytest.raises(ValueError, match="distinct"):
        funnel_stages(df, "u", "t", "s", ["a", "a"])
    with pytest.raises(ValueError, match="distinct"):
        funnel_stages(df, "u", "t", "s", [])
    with pytest.raises(ValueError, match="alphanumeric"):
        funnel_stages_sql("SELECT 1", "u", "t", "s", ["a'b"])


# ---------------------------------------------------------------------------
# profile_columns / fk_violations (operators/profiling.py)
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.profiling import (  # noqa: E402
    fk_violations,
    fk_violations_sql,
    profile_columns,
    profile_columns_sql,
)


def test_profile_metrics_by_hand(spark):
    df = spark.createDataFrame(
        [("a", 1), ("", 2), ("  ", 2), (None, None), ("bb", 7)],
        "s: string, k: long")
    got = {r["col_name"]: tuple(r) for r in
           profile_columns(df, ["s", "k"]).collect()}
    # s: 5 rows, 1 null, distinct {a,'','  ',bb}=4, empty(trim)=2,
    # total_len 0+1+2+2=5, min ''(empty sorts first), max 'bb'
    assert got["s"] == ("s", 5, 1, 4, 2, 5, "", "bb")
    assert got["k"] == ("k", 5, 1, 3, None, None, "1", "7")


def test_profile_matches_duckdb_twin_randomized(spark):
    rng = random.Random(53)
    rows = [(None if rng.random() < 0.2
             else ("" if rng.random() < 0.2 else f"v{rng.randrange(9)}"),
             None if rng.random() < 0.2 else rng.randrange(50))
            for _ in range(300)]
    df = spark.createDataFrame(rows, "s: string, k: long")
    got = sorted(tuple(r) for r in
                 profile_columns(df, ["s", "k"]).collect())
    vals = ", ".join(
        "(" + ("NULL" if s is None else f"'{s}'") + ", " +
        ("NULL" if k is None else str(k)) + ")" for s, k in rows)
    src = f"SELECT * FROM (VALUES {vals}) t(s, k)"
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(profile_columns_sql(
        src, [("s", "string"), ("k", "int")])).fetchall())
    assert got == want


def test_profile_validation(spark):
    df = spark.createDataFrame([(1.5,)], "d: double")
    with pytest.raises(ValueError, match="non-empty"):
        profile_columns(df, [])
    with pytest.raises(ValueError, match="not in DataFrame"):
        profile_columns(df, ["nope"])
    with pytest.raises(ValueError, match="quantize"):
        profile_columns(df, ["d"])
    with pytest.raises(ValueError, match="'string' or 'int'"):
        profile_columns_sql("SELECT 1", [("d", "double")])


def test_fk_violations_null_fk_is_not_orphan(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None), (4, 10)], "id: long, fk: long")
    parent = spark.createDataFrame([(10,), (20,)], "pk: long")
    got = sorted(tuple(r) for r in
                 fk_violations(child, "fk", parent, "pk")
                 .select("id", "fk").collect())
    assert got == [(2, 99)]
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(fk_violations_sql(
        "SELECT * FROM (VALUES (1, 10), (2, 99), (3, NULL), (4, 10)) "
        "t(id, fk)", "fk",
        "SELECT * FROM (VALUES (10), (20)) t(pk)", "pk",
        ["id", "fk"])).fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# retention_cohorts (operators/temporal.py)
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.temporal import (  # noqa: E402
    retention_cohorts,
    retention_cohorts_sql,
)


def test_retention_by_hand(spark):
    # period_days=7, epoch day 0 = 1970-01-01 (a Thursday; periods are
    # plain 7-day buckets from epoch, not ISO weeks)
    rows = [
        (1, datetime(1970, 1, 1)),   # u1 cohort 0
        (1, datetime(1970, 1, 2)),   # same period, dedup
        (1, datetime(1970, 1, 9)),   # offset 1
        (2, datetime(1970, 1, 3)),   # u2 cohort 0
        (2, datetime(1970, 1, 20)),  # offset 2
        (3, datetime(1970, 1, 10)),  # u3 cohort 1 only
    ]
    df = spark.createDataFrame(rows, "u: long, t: timestamp")
    got = sorted(tuple(r) for r in
                 retention_cohorts(df, "u", "t", 7).collect())
    assert got == [(0, 0, 2), (0, 1, 1), (0, 2, 1), (1, 0, 1)]


def test_retention_matches_duckdb_twin_randomized(spark):
    rng = random.Random(61)
    rows = [(rng.randrange(25), _ts(rng.randrange(100000)))
            for _ in range(400)]
    df = spark.createDataFrame(rows, "u: long, t: timestamp")
    got = sorted(tuple(r) for r in
                 retention_cohorts(df, "u", "t", 7).collect())
    vals = ", ".join(f"({u}, TIMESTAMP '{t}')" for u, t in rows)
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(retention_cohorts_sql(
        f"SELECT * FROM (VALUES {vals}) t(u, t)", "u", "t", 7)).fetchall())
    assert got == want
    # cohort sizes are offset-0 rows and must cover all 25 users
    assert sum(n for _, o, n in got if o == 0) == 25


def test_retention_validation(spark):
    df = spark.createDataFrame([(1, _ts(0))], "u: long, t: timestamp")
    with pytest.raises(ValueError, match="period_days"):
        retention_cohorts(df, "u", "t", 0)
    with pytest.raises(ValueError, match="period_days"):
        retention_cohorts_sql("SELECT 1", "u", "t", -1)


# ---------------------------------------------------------------------------
# train_bpe (operators/bpe.py)
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.bpe import (  # noqa: E402
    train_bpe,
    train_bpe_sql,
)


def _bpe_run(spark, docs, k):
    df = spark.createDataFrame([(d,) for d in docs], "text: string")
    return sorted(tuple(r) for r in train_bpe(df, "text", k).collect())


def _bpe_duck(docs, k):
    vals = ", ".join("('" + d.replace("'", "''") + "')" for d in docs)
    sql = train_bpe_sql(f"SELECT * FROM (VALUES {vals}) t(text)",
                        "text", k)
    con = duckdb.connect()
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_bpe_classic_corpus(spark):
    docs = ["low lower lowest low low", "new newer newest new",
            "low new lower"]
    got = _bpe_run(spark, docs, 6)
    # textbook: l+o, lo+w dominate (7 'low*' words), then e+w / n+ew
    assert got[0] == (1, "l", "o", 7)
    assert got[1] == (2, "lo", "w", 7)
    assert got == _bpe_duck(docs, 6)


def test_bpe_repeated_symbol_runs_merge_greedily(spark):
    # 'aaaa' -> merge (a,a) applies left-to-right non-overlapping:
    # round 1 count = 2 per 'aaaa' word (NOT 3 — overlaps don't count
    # twice after application; but the COUNT phase counts raw adjacent
    # pairs: 3 per 'aaaa'). The twin must agree on both phases.
    docs = ["aaaa aaaa aa", "aaa b aaa"]
    got = _bpe_run(spark, docs, 3)
    assert got == _bpe_duck(docs, 3)
    assert got[0][1] == "a" and got[0][2] == "a"


def test_bpe_matches_duckdb_twin_randomized(spark):
    rng = random.Random(71)
    words = ["the", "then", "than", "that", "this", "these", "band",
             "bend", "bond", "and", "end", "rnd", "zz", "zzz", "zzzz"]
    docs = [" ".join(rng.choice(words)
                     for _ in range(rng.randrange(3, 30)))
            for _ in range(60)]
    assert _bpe_run(spark, docs, 8) == _bpe_duck(docs, 8)


def test_bpe_early_stop_and_validation(spark):
    # single 1-char word + EOW: one pair exists, then none
    got = _bpe_run(spark, ["a a a"], 5)
    assert got == [(1, "a", "_", 3)]
    assert got == _bpe_duck(["a a a"], 5)
    df = spark.createDataFrame([("x",)], "text: string")
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe(df, "text", 0)
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe_sql("SELECT 1", "text", 0)


def test_bpe_encode_tokens_roundtrip(spark):
    from biocypher_metta_spark.operators.bpe import (
        bpe_encode_tokens,
        bpe_encode_tokens_sql,
    )
    docs = ["low lower low", "new lower newest"]
    df = spark.createDataFrame([(d,) for d in docs], "text: string")
    merges = [(r["sym_a"], r["sym_b"])
              for r in train_bpe(df, "text", 4).collect()]
    got = sorted(tuple(r) for r in
                 bpe_encode_tokens(df, "text", merges).collect())
    vals = ", ".join(f"('{d}')" for d in docs)
    sql = bpe_encode_tokens_sql(
        f"SELECT * FROM (VALUES {vals}) t(text)", "text", 4)
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want
    # token mass is conserved: sum(token n) = total symbols after
    # merging = chars + words - merged occurrences; at minimum the
    # corpus word count survives as EOW-bearing tokens
    assert sum(n for _, n in got) > 0
    with pytest.raises(ValueError, match="non-empty"):
        bpe_encode_tokens(df, "text", [])


# ---------------------------------------------------------------------------
# outlier_flags (operators/stats.py)
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.stats import (  # noqa: E402
    outlier_flags,
    outlier_flags_sql,
)


def test_outlier_planted_spike_flags(spark):
    rows = ([(1, i, 100 + (i % 3)) for i in range(30)]
            + [(1, 99, 50_000)]          # the spike
            + [(2, 0, 7)]                # singleton: never flags
            + [(3, 0, 5), (3, 1, 5)]     # constant: never flags
            + [(4, 0, None), (4, 1, 9)])  # null never flags/enters
    df = spark.createDataFrame(rows, "g: long, rid: long, v: long")
    got = sorted(tuple(r) for r in
                 outlier_flags(df, ["g"], "v", 3000).collect())
    assert got == [(1, 99, 50_000, 31)]


def test_outlier_matches_duckdb_twin_randomized(spark):
    rng = random.Random(83)
    rows = []
    for g in range(12):
        for i in range(rng.randrange(1, 60)):
            v = (None if rng.random() < 0.1
                 else rng.randrange(-500, 500)
                 * (100 if rng.random() < 0.03 else 1))
            rows.append((g, g * 1000 + i, v))
    df = spark.createDataFrame(rows, "g: long, rid: long, v: long")
    got = sorted(tuple(r) for r in
                 outlier_flags(df, ["g"], "v", 2500).collect())
    vals = ", ".join(
        "(" + ", ".join("NULL" if x is None else str(x) for x in r) + ")"
        for r in rows)
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(outlier_flags_sql(
        f"SELECT * FROM (VALUES {vals}) t(g, rid, v)",
        ["g"], "v", ["g", "rid", "v"], 2500)).fetchall())
    assert got == want


def test_outlier_validation(spark):
    df = spark.createDataFrame([(1, 2)], "g: long, v: long")
    with pytest.raises(ValueError, match="key_cols"):
        outlier_flags(df, [], "v")
    with pytest.raises(ValueError, match="z_permille"):
        outlier_flags(df, ["g"], "v", 0)
    with pytest.raises(ValueError, match="n_grp"):
        outlier_flags(df.withColumnRenamed("v", "n_grp"), ["g"], "n_grp")


# ---------------------------------------------------------------------------
# edit_distance_join (operators/dedup.py)
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.dedup import (  # noqa: E402
    edit_distance_join,
    edit_distance_join_sql,
)


def _edj_run(spark, rows, d):
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    return sorted(tuple(r) for r in edit_distance_join(df, d).collect())


def _edj_duck(rows, d):
    vals = ", ".join(f"({i}, '{s}')" for i, s in rows)
    con = duckdb.connect()
    return sorted(tuple(r) for r in con.execute(edit_distance_join_sql(
        f"SELECT * FROM (VALUES {vals}) t(doc_id, text)", d)).fetchall())


def test_edj_exact_vs_brute_force_adversarial(spark):
    # tiny alphabet + short strings: the hardest case for the prefix
    # lemma (short path carries much of the result set)
    rng = random.Random(13)
    rows = [(i, "".join(rng.choice("abcde")
                        for _ in range(rng.randrange(1, 12))))
            for i in range(120)]
    rows += [(1000 + i, rows[i][1] + "x") for i in range(0, 40, 3)]
    rows += [(2000, "a"), (2001, "b"), (2002, "")]
    for d in (1, 2):
        assert _edj_run(spark, rows, d) == _edj_duck(rows, d)


def test_edj_identical_and_short_values_pair(spark):
    rows = [(1, "ab"), (2, "ab"), (3, "ba"), (4, "xyzw"), (5, "xyzv")]
    got = _edj_run(spark, rows, 1)
    # (1,2) identical dist 0; (1,3)/(2,3) NOT within 1 (dist 2);
    # (4,5) substitution dist 1
    assert got == [(1, 2, 0), (4, 5, 1)]
    got2 = _edj_run(spark, rows, 2)
    assert (1, 3, 2) in got2 and (2, 3, 2) in got2
    assert got2 == _edj_duck(rows, 2)


def test_edj_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_join(df, 0)
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_join_sql("SELECT 1", 0)


# ---------------------------------------------------------------------------
# event_transitions / time_weighted_avg (operators/temporal.py)
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.temporal import (  # noqa: E402
    event_transitions,
    event_transitions_sql,
    time_weighted_avg,
    time_weighted_avg_sql,
)


def test_transitions_by_hand_and_twin(spark):
    rows = [(1, _ts(0), "a"), (1, _ts(1), "b"), (1, _ts(2), "a"),
            (2, _ts(0), "b"), (2, _ts(1), "b"),
            (3, _ts(0), "a"),                      # single event: none
            (4, _ts(0), None), (4, _ts(1), "a")]   # null step dropped
    df = spark.createDataFrame(rows, "u: long, t: timestamp, s: string")
    got = sorted(tuple(r) for r in
                 event_transitions(df, "u", "t", "s").collect())
    assert got == [("a", "b", 1), ("b", "a", 1), ("b", "b", 1)]
    vals = ", ".join(
        f"({u}, TIMESTAMP '{t}', " +
        ("NULL" if s is None else f"'{s}'") + ")" for u, t, s in rows)
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(event_transitions_sql(
        f"SELECT * FROM (VALUES {vals}) t(u, t, s)",
        "u", "t", "s")).fetchall())
    assert got == want


def test_twap_by_hand(spark):
    rows = [(1, datetime(2024, 1, 1, 0), 100),
            (1, datetime(2024, 1, 1, 1), 400)]
    df = spark.createDataFrame(rows, "k: long, t: timestamp, v: long")
    # 1h at 100, 1h at 400 until the 02:00 horizon -> 250 over 7200s
    got = [tuple(r) for r in time_weighted_avg(
        df, ["k"], "t", "v", "2024-01-01 02:00:00").collect()]
    assert got == [(1, 250, 7200)]


def test_twap_ties_negatives_and_twin_randomized(spark):
    rng = random.Random(97)
    rows = []
    for k in range(8):
        for _ in range(rng.randrange(0, 25)):
            rows.append((k, _ts(rng.randrange(0, 2000)),
                         None if rng.random() < 0.15
                         else rng.randrange(-500, 500)))
    rows += [(9, _ts(5), 10), (9, _ts(5), 20)]   # exact tie
    df = spark.createDataFrame(rows, "k: long, t: timestamp, v: long")
    end = "2024-01-03 00:00:00"
    got = sorted(tuple(r) for r in time_weighted_avg(
        df, ["k"], "t", "v", end).collect())
    vals = ", ".join(
        f"({k}, TIMESTAMP '{t}', " +
        ("NULL" if v is None else str(v)) + ")" for k, t, v in rows)
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(time_weighted_avg_sql(
        f"SELECT * FROM (VALUES {vals}) t(k, t, v)",
        ["k"], "t", "v", end)).fetchall())
    assert got == want


def test_twap_validation(spark):
    df = spark.createDataFrame([(1, _ts(0), 1)],
                               "k: long, t: timestamp, v: long")
    with pytest.raises(ValueError, match="key_cols"):
        time_weighted_avg(df, [], "t", "v", "2024-01-01 00:00:00")
    with pytest.raises(ValueError, match="key_cols"):
        time_weighted_avg_sql("SELECT 1", [], "t", "v", "2024-01-01")


# ---------------------------------------------------------------------------
# funnel_stages_windowed (operators/temporal.py)
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.temporal import (  # noqa: E402
    funnel_stages_windowed,
    funnel_stages_windowed_sql,
)


def _wf_run(spark, rows, steps, w):
    df = spark.createDataFrame(rows, "u: long, t: timestamp, s: string")
    return sorted(tuple(r) for r in funnel_stages_windowed(
        df, "u", "t", "s", steps, w).collect())


def _wf_duck(rows, steps, w):
    vals = ", ".join(f"({u}, TIMESTAMP '{t}', '{s}')" for u, t, s in rows)
    con = duckdb.connect()
    return sorted(tuple(r) for r in con.execute(funnel_stages_windowed_sql(
        f"SELECT * FROM (VALUES {vals}) t(u, t, s)",
        "u", "t", "s", steps, w)).fetchall())


def test_wfunnel_greedy_trap_needs_later_start(spark):
    steps = ["a", "b", "c"]
    rows = [(1, _ts(0), "a"), (1, _ts(100), "a"),
            (1, _ts(101), "b"), (1, _ts(102), "c"),
            # u2: full chain but c outside the 3-min window of a
            (2, _ts(0), "a"), (2, _ts(1), "b"), (2, _ts(10), "c")]
    got = _wf_run(spark, rows, steps, 3 * 60)
    assert got == [(1, 3), (2, 2)]
    assert got == _wf_duck(rows, steps, 3 * 60)


def test_wfunnel_same_ts_and_zero_window(spark):
    steps = ["a", "b"]
    rows = [(1, _ts(5), "a"), (1, _ts(5), "b"),   # same instant -> 2
            (2, _ts(5), "a"), (2, _ts(6), "b")]   # 60s apart, window 0
    got = _wf_run(spark, rows, steps, 0)
    assert got == [(1, 2), (2, 1)]
    assert got == _wf_duck(rows, steps, 0)


def test_wfunnel_matches_duckdb_twin_randomized(spark):
    rng = random.Random(101)
    steps = ["s0", "s1", "s2", "s3"]
    pool = steps + ["zz"]
    rows = []
    for u in range(40):
        for _ in range(rng.randrange(0, 14)):
            rows.append((u, _ts(rng.randrange(0, 500)),
                         pool[rng.randrange(len(pool))]))
    rows.append((999, _ts(0), "s0"))
    for w in (0, 600, 6000):
        assert _wf_run(spark, rows, steps, w) == _wf_duck(rows, steps, w)


def test_wfunnel_validation(spark):
    df = spark.createDataFrame([(1, _ts(0), "a")],
                               "u: long, t: timestamp, s: string")
    with pytest.raises(ValueError, match="distinct"):
        funnel_stages_windowed(df, "u", "t", "s", ["a", "a"], 10)
    with pytest.raises(ValueError, match="within_seconds"):
        funnel_stages_windowed(df, "u", "t", "s", ["a"], -1)
    with pytest.raises(ValueError, match="alphanumeric"):
        funnel_stages_windowed_sql("SELECT 1", "u", "t", "s", ["a'b"], 1)
