"""Round-5k operators: lag-k autocorrelation (operators/stats.py)."""

import random

import duckdb
import pytest

from biocypher_metta_spark.operators.stats import autocorr, autocorr_sql


def _ac(spark, rows, lags=(1, 2, 3)):
    df = spark.createDataFrame(rows, "g long, t long, v long")
    out = autocorr(df, ["g"], "t", "v", lags=lags)
    return sorted(tuple(r) for r in out.collect())


def test_autocorr_alternating_series(spark):
    # x_t alternates 0/1 on a dense tick grid: lag-1 pairs are exact
    # anti-correlation (-1000), lag-2 pairs exact correlation (+1000).
    # Clamped at the -1000 bound; +1 correlation may quantize to 999
    # when the float sqrt pair undershoots (sqrt(d)*sqrt(d) < d).
    rows = [(7, t, t % 2) for t in range(40)]
    got = dict(((g, lag), (m, ac)) for g, lag, m, ac in _ac(spark, rows))
    assert got[(7, 1)] == (39, -1000)
    assert got[(7, 2)][0] == 38 and got[(7, 2)][1] in (999, 1000)


def test_autocorr_calendar_gaps_drop_pairs(spark):
    # Ticks 0,1,3,4: lag-1 pairs (0,1) and (3,4) only — the 1->3 jump
    # is NOT bridged; lag-2 has the single pair (1,3); lag-3 has (0,3)
    # and (1,4). Single-pair and constant groups yield NULL ac (zero
    # variance on a 1-point cloud).
    rows = [(1, 0, 10), (1, 1, 30), (1, 3, 20), (1, 4, 50)]
    got = {(g, lag): (m, ac) for g, lag, m, ac in _ac(spark, rows)}
    assert got[(1, 1)][0] == 2
    assert got[(1, 2)] == (1, None)
    assert got[(1, 3)][0] == 2


def test_autocorr_constant_series_null(spark):
    rows = [(2, t, 5) for t in range(10)]
    got = _ac(spark, rows, lags=(1,))
    assert got == [(2, 1, 9, None)]


def test_autocorr_matches_duckdb_twin_randomized(spark):
    rng = random.Random(5051)
    rows = []
    for g in range(6):
        t = 0
        for _ in range(120):
            t += rng.choice([1, 1, 1, 2, 3])  # gappy calendar
            rows.append((g, t, rng.randrange(-500, 5000)))
    got = _ac(spark, rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE base_t (g BIGINT, t BIGINT, v BIGINT)")
    con.executemany("INSERT INTO base_t VALUES (?,?,?)", rows)
    sql = autocorr_sql("SELECT * FROM base_t", ["g"], "t", "v")
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_autocorr_validation(spark):
    df = spark.createDataFrame([(1, 1, 1)], "g long, t long, v long")
    with pytest.raises(ValueError):
        autocorr(df, ["g"], "t", "v", lags=())
    with pytest.raises(ValueError):
        autocorr(df, ["g"], "t", "v", lags=(0,))


# ---------------------------------------------------------------------------
# attribution_credits (operators/attribution.py)
# ---------------------------------------------------------------------------
from biocypher_metta_spark.operators.attribution import (  # noqa: E402
    attribution_credits,
    attribution_sql,
)


def _att(spark, touches, convs, **kw):
    t = spark.createDataFrame(touches, "u long, ts long, ch string")
    c = spark.createDataFrame(convs, "u long, cid long, cts long")
    out = attribution_credits(t, c, "u", "ts", "ch", "cid", "cts", **kw)
    return sorted(tuple(r) for r in out.collect())


_TOUCHES = [(1, 10, "ad"), (1, 20, "email"), (1, 30, "search"),
            (1, 95, "social"),  # outside the lookback of conv at 40
            (2, 5, "ad")]
_CONVS = [(1, 100, 40), (2, 200, 6)]


def test_attribution_first_last_linear(spark):
    kw = dict(lookback_s=35, scale=1000)
    assert _att(spark, _TOUCHES, _CONVS, model="first", **kw) == [
        ("ad", 2, 2000), ("email", 1, 0), ("search", 1, 0)]
    assert _att(spark, _TOUCHES, _CONVS, model="last", **kw) == [
        ("ad", 2, 1000), ("email", 1, 0), ("search", 1, 1000)]
    # linear over 3 touches: 333 each, remainder 1 to the last
    assert _att(spark, _TOUCHES, _CONVS, model="linear", **kw) == [
        ("ad", 2, 1333), ("email", 1, 333), ("search", 1, 334)]


def test_attribution_position_shapes(spark):
    # n=4: ends 400 each, two middles 100 each (pool 200, no remainder)
    touches = [(1, t, f"c{t}") for t in (1, 2, 3, 4)]
    got = _att(spark, touches, [(1, 9, 4)], model="position",
               lookback_s=100)
    assert got == [("c1", 1, 400), ("c2", 1, 100), ("c3", 1, 100),
                   ("c4", 1, 400)]
    # n=1 takes all; n=2 splits ceil/floor
    assert _att(spark, [(1, 1, "a")], [(1, 9, 4)], model="position",
                lookback_s=100) == [("a", 1, 1000)]
    assert _att(spark, [(1, 1, "a"), (1, 2, "b")], [(1, 9, 4)],
                model="position", lookback_s=100) == [
        ("a", 1, 500), ("b", 1, 500)]


def test_attribution_budget_conserved(spark):
    # whatever the model, total credit = scale * attributable convs
    import random
    rng = random.Random(77)
    touches = [(rng.randrange(5), rng.randrange(100),
                rng.choice("abc")) for _ in range(200)]
    convs = [(u, 1000 + i, rng.randrange(100))
             for i, u in enumerate(rng.choices(range(5), k=20))]
    for model in ("first", "last", "linear", "position"):
        got = _att(spark, touches, convs, model=model, lookback_s=30)
        total = sum(c for _, _, c in got)
        assert total % 1000 == 0 and total > 0


def test_attribution_matches_duckdb_twin_randomized(spark):
    import duckdb
    import random
    rng = random.Random(4242)
    touches = [(rng.randrange(8), rng.randrange(500),
                rng.choice(["ad", "email", "search", "social"]))
               for _ in range(400)]
    convs = [(rng.randrange(8), i, rng.randrange(500))
             for i in range(40)]
    con = duckdb.connect()
    con.execute("CREATE TABLE att_tt (u BIGINT, ts BIGINT, ch VARCHAR)")
    con.execute("CREATE TABLE att_cc (u BIGINT, cid BIGINT, cts BIGINT)")
    con.executemany("INSERT INTO att_tt VALUES (?,?,?)", touches)
    con.executemany("INSERT INTO att_cc VALUES (?,?,?)", convs)
    for model in ("first", "last", "linear", "position"):
        got = _att(spark, touches, convs, model=model, lookback_s=60,
                   scale=1000)
        sql = attribution_sql(
            "SELECT * FROM att_tt", "SELECT * FROM att_cc",
            "u", "ts", "ch", "cid", "cts", model=model, lookback_s=60,
            scale=1000)
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want, model


def test_attribution_validation(spark):
    t = spark.createDataFrame([(1, 1, "a")], "u long, ts long, ch string")
    c = spark.createDataFrame([(1, 1, 5)], "u long, cid long, cts long")
    for bad in (dict(model="mystery"), dict(lookback_s=0),
                dict(scale=0)):
        with pytest.raises(ValueError):
            attribution_credits(t, c, "u", "ts", "ch", "cid", "cts",
                                **bad)


# ---------------------------------------------------------------------------
# degree_assortativity (operators/graph.py)
# ---------------------------------------------------------------------------
from biocypher_metta_spark.operators.graph import (  # noqa: E402
    degree_assortativity,
    degree_assortativity_sql,
)


def _assort(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return [tuple(r) for r in degree_assortativity(df).collect()]


def test_assortativity_star_is_minus_one(spark):
    # K1,5: every stub pairs a degree-5 end with a degree-1 end;
    # y = 6 - x exactly, so r = -1 with no quantization loss.
    edges = [(0, i) for i in range(1, 6)]
    assert _assort(spark, edges) == [(10, -1000)]


def test_assortativity_regular_graph_null(spark):
    # 6-cycle: all degrees 2 -> zero variance -> NULL r.
    edges = [(i, (i + 1) % 6) for i in range(6)]
    assert _assort(spark, edges) == [(12, None)]


def test_assortativity_dedup_selfloop_null(spark):
    # duplicate edges, reversed duplicates, self-loops and nulls must
    # not change the simple undirected graph K1,3.
    edges = [(0, 1), (1, 0), (0, 1), (0, 2), (0, 3), (2, 2),
             (None, 1), (3, None)]
    assert _assort(spark, edges) == [(6, -1000)]


def test_assortativity_matches_float_pearson(spark):
    import math
    import random
    rng = random.Random(99)
    edges = list({(rng.randrange(30), rng.randrange(30))
                  for _ in range(120)})
    [(n_stubs, r_milli)] = _assort(spark, edges)
    # reference: float Pearson over the explicit stub multiset
    simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    deg = {}
    for a, b in simple:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    stubs = [(deg[a], deg[b]) for a, b in simple]
    stubs += [(y, x) for x, y in stubs]
    m = len(stubs)
    sx = sum(x for x, _ in stubs)
    sxx = sum(x * x for x, _ in stubs)
    sxy = sum(x * y for x, y in stubs)
    r = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    assert n_stubs == m
    assert r_milli == math.floor(1000 * r)


def test_assortativity_matches_duckdb_twin_randomized(spark):
    import duckdb
    import random
    rng = random.Random(123)
    for trial in range(3):
        edges = [(rng.randrange(25), rng.randrange(25))
                 for _ in range(150)]
        got = _assort(spark, edges)
        con = duckdb.connect()
        con.execute("CREATE TABLE ae (src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO ae VALUES (?,?)", edges)
        want = [tuple(r) for r in con.execute(
            degree_assortativity_sql("SELECT * FROM ae")).fetchall()]
        assert got == want, trial


# ---------------------------------------------------------------------------
# crosscorr (operators/stats.py via stats_corr shared core)
# ---------------------------------------------------------------------------
from biocypher_metta_spark.operators.stats import (  # noqa: E402
    crosscorr,
    crosscorr_sql,
)


def test_crosscorr_shifted_copy_peaks_at_lag(spark):
    # y is x shifted later by 2 ticks: (x_t, y_{t+2}) = (x_t, x_t)
    # -> exact +1 at lag 2 (quantizes to 999/1000), weak elsewhere.
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4]
    rows = [(1, t, x, xs[t - 2] if t >= 2 else None)
            for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g long, t long, x long, y long")
    got = {r["lag"]: r["xc_milli"]
           for r in crosscorr(df, ["g"], "t", "x", "y").collect()}
    assert got[2] in (999, 1000)
    assert all(v is None or v < 900 for k, v in got.items() if k != 2)


def test_crosscorr_negative_lag_mirror(spark):
    # xcorr(x, y) at lag -k pairs (x_t, y_{t-k}); swapping the roles
    # and the lag sign must give the same coefficient.
    import random
    rng = random.Random(31)
    rows = [(1, t, rng.randrange(100), rng.randrange(100))
            for t in range(60)]
    df = spark.createDataFrame(rows, "g long, t long, x long, y long")
    fwd = {r["lag"]: (r["m"], r["xc_milli"])
           for r in crosscorr(df, ["g"], "t", "x", "y",
                              lags=(-3, 3)).collect()}
    swp = {r["lag"]: (r["m"], r["xc_milli"])
           for r in crosscorr(df, ["g"], "t", "y", "x",
                              lags=(-3, 3)).collect()}
    assert fwd[-3] == swp[3] and fwd[3] == swp[-3]


def test_crosscorr_null_either_side_drops_pair(spark):
    rows = [(1, 0, 1, 10), (1, 1, None, 20), (1, 2, 3, None),
            (1, 3, 4, 40)]
    df = spark.createDataFrame(rows, "g long, t long, x long, y long")
    got = {r["lag"]: r["m"]
           for r in crosscorr(df, ["g"], "t", "x", "y",
                              lags=(0, 1)).collect()}
    # lag 0: ticks 0 and 3 have both sides (1 and 2 have a null)
    assert got[0] == 2
    # lag 1: (0,1)->y[1]=20 ok with x[0]=1; (2,3)->x[2]=3,y[3]=40 ok;
    # (1,2) drops on x null. m = 2
    assert got[1] == 2


def test_crosscorr_matches_duckdb_twin_randomized(spark):
    import duckdb
    import random
    rng = random.Random(2718)
    rows = []
    for g in range(4):
        t = 0
        for _ in range(80):
            t += rng.choice([1, 1, 2])
            rows.append((g, t, rng.randrange(-50, 400),
                         rng.randrange(-50, 400)))
    df = spark.createDataFrame(rows, "g long, t long, x long, y long")
    got = sorted(tuple(r) for r in
                 crosscorr(df, ["g"], "t", "x", "y").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE xc (g BIGINT, t BIGINT, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO xc VALUES (?,?,?,?)", rows)
    want = sorted(tuple(r) for r in con.execute(
        crosscorr_sql("SELECT * FROM xc", ["g"], "t", "x", "y"))
        .fetchall())
    assert got == want


def test_crosscorr_validation(spark):
    df = spark.createDataFrame([(1, 1, 1, 1)],
                               "g long, t long, x long, y long")
    with pytest.raises(ValueError):
        crosscorr(df, ["g"], "t", "x", "y", lags=())


# ---------------------------------------------------------------------------
# ktruss (operators/graph.py)
# ---------------------------------------------------------------------------
from biocypher_metta_spark.operators.graph import (  # noqa: E402
    ktruss,
    ktruss_sql,
)


def _truss(spark, edges, k, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return sorted(tuple(r) for r in ktruss(df, k, **kw).collect())


def test_ktruss_k4_strips_pendant_triangle(spark):
    # K4 on {0,1,2,3} (every edge in 2 triangles) plus a pendant
    # triangle {3,4,5} (each edge in 1). k=4 needs support >= 2:
    # round 1 drops the pendant edges, K4 survives intact.
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = k4 + [(3, 4), (4, 5), (3, 5)]
    got = _truss(spark, edges, 4)
    assert got == [(a, b, 2) for a, b in k4]


def test_ktruss_cascade_peeling(spark):
    # A triangle strip 0-1-2, 1-2-3, 2-3-4: edge (0,1) has support 1,
    # dropping it lowers (0,2)... strip fully unravels at k=4 only
    # after several rounds; at k=3 (support >= 1) everything stays.
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    assert len(_truss(spark, edges, 3)) == 7
    assert _truss(spark, edges, 4) == []


def test_ktruss_k3_drops_triangle_free_edges(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    assert _truss(spark, edges, 3) == [(0, 1, 1), (0, 2, 1), (1, 2, 1)]


def test_ktruss_matches_duckdb_twin_randomized(spark):
    import duckdb
    import random
    rng = random.Random(555)
    for trial, k in ((0, 3), (1, 4), (2, 5)):
        edges = [(rng.randrange(18), rng.randrange(18))
                 for _ in range(90)]
        got = _truss(spark, edges, k)
        con = duckdb.connect()
        con.execute("CREATE TABLE te (src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO te VALUES (?,?)", edges)
        want = sorted(tuple(r) for r in con.execute(
            ktruss_sql("SELECT * FROM te", k, rounds=8)).fetchall())
        assert got == want, (trial, k)


def test_ktruss_validation(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        ktruss(df, 2)
    with pytest.raises(RuntimeError):
        # cascade needs >1 round; max_rounds=1 must raise, not return
        # a partial truss
        edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
        e = spark.createDataFrame(edges, "src long, dst long")
        ktruss(e, 4, max_rounds=1)


# ---------------------------------------------------------------------------
# benford_mad (operators/stats.py)
# ---------------------------------------------------------------------------
from biocypher_metta_spark.operators.stats import (  # noqa: E402
    BENFORD_PPM,
    benford_mad,
    benford_mad_sql,
)


def _benford(spark, rows):
    df = spark.createDataFrame(rows, "g long, v long")
    return sorted(tuple(r) for r in
                  benford_mad(df, ["g"], "v").collect())


def test_benford_perfect_and_terrible(spark):
    # group 0: counts proportional to the Benford ppm themselves in
    # a 1e6-row-equivalent miniature -> small MAD; group 1: all 9s ->
    # MAD dominated by |1e6 - 45757| and the eight expectations.
    rows = []
    mini = [301, 176, 125, 97, 79, 67, 58, 51, 46]  # ~ppm/1000
    for d, c in enumerate(mini, start=1):
        rows += [(0, d * 10)] * c
    rows += [(1, 9000 + i) for i in range(50)]
    got = dict((g, (n, mad)) for g, n, mad in _benford(spark, rows))
    assert got[0][0] == sum(mini) and got[0][1] < 1000
    exp_bad = (1_000_000 - BENFORD_PPM[8]
               + sum(BENFORD_PPM[:8])) // 9
    assert got[1] == (50, exp_bad)


def test_benford_zero_null_negative_handling(spark):
    rows = [(0, 0), (0, None), (0, -123), (0, 123)]
    got = _benford(spark, rows)
    # zeros and nulls excluded; -123 and 123 both have first digit 1
    assert got[0][1] == 2  # n_obs


def test_benford_matches_duckdb_twin_randomized(spark):
    import duckdb
    import random
    rng = random.Random(314)
    rows = [(rng.randrange(4),
             rng.choice([0, None,
                         rng.randrange(-10**6, 10**9)]))
            for _ in range(500)]
    got = _benford(spark, rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE bf (g BIGINT, v BIGINT)")
    con.executemany("INSERT INTO bf VALUES (?,?)", rows)
    want = sorted(tuple(r) for r in con.execute(
        benford_mad_sql("SELECT * FROM bf", ["g"], "v")).fetchall())
    assert got == want


def test_benford_validation(spark):
    df = spark.createDataFrame([(1, 1)], "g long, v long")
    with pytest.raises(ValueError):
        benford_mad(df, [], "v")


# ---------------------------------------------------------------------------
# readability (operators/text.py)
# ---------------------------------------------------------------------------
from biocypher_metta_spark.operators.text import (  # noqa: E402
    readability,
    readability_sql,
)


def test_readability_hand_case(spark):
    # "the cat sat." -> w=3, s=1, vowel groups: e/a/a = 3 -> syl=3
    # 1000*FK = (390*9 + 11800*3*1 - 15590*3) / 3 = (3510 + 35400
    #           - 46770) / 3 = -7860/3 = -2620
    df = spark.createDataFrame([(1, "the cat sat.")],
                               "doc_id long, text string")
    [(d, w, s, syl, fk)] = [tuple(r) for r in readability(df).collect()]
    assert (d, w, s, syl, fk) == (1, 3, 1, 3, -2620)


def test_readability_floor_of_negative_is_floor(spark):
    # one word, one vowel group, no sentence punct: num = 390 +
    # 11800 - 15590 = -3400, den 1 -> -3400 exactly (not trunc 0)
    df = spark.createDataFrame([(1, "hi")], "doc_id long, text string")
    assert readability(df).collect()[0]["fk_grade_milli"] == -3400


def test_readability_matches_duckdb_twin(spark):
    import duckdb
    import random
    rng = random.Random(808)
    words = ["the", "difficulty", "of", "extraordinary",
             "comprehension", "a", "syllable", "rhythm", "xyz", "9"]
    rows = []
    for i in range(120):
        n = rng.randrange(1, 30)
        txt = " ".join(rng.choice(words) for _ in range(n))
        if rng.random() < 0.7:
            txt += rng.choice([".", "!?", "...", "? !"])
        rows.append((i, txt))
    rows.append((999, ""))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in readability(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE rd (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO rd VALUES (?,?)", rows)
    want = sorted(tuple(r) for r in
                  con.execute(readability_sql("rd")).fetchall())
    assert got == want
