"""Round-5q operators: exact rank statistics (operators/stats.py —
two-sample Kolmogorov-Smirnov and Mann-Whitney U with integral
tie-averaged ranks)."""


import duckdb
import pytest

from biocypher_metta_spark.operators.stats import (
    ks_test,
    ks_test_sql,
    mannwhitney,
    mannwhitney_sql,
)

SCHEMA = "grp long, s string, v long"


def _ks(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["grp"]: (r["n_a"], r["n_b"], r["d_scaled"], r["d_ppm"])
            for r in ks_test(df, ["grp"], "s", "v", "a", "b").collect()}


def _mw(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["grp"]: (r["n_a"], r["n_b"], r["u_a_x2"], r["auc_ppm"])
            for r in mannwhitney(df, ["grp"], "s", "v", "a", "b")
            .collect()}


def _brute_ks(pairs):
    a = sorted(v for s, v in pairs if s == "a")
    b = sorted(v for s, v in pairs if s == "b")
    na, nb = len(a), len(b)
    d = 0
    for v in sorted(set(a + b)):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        d = max(d, abs(ca * nb - cb * na))
    ppm = 0 if na == 0 or nb == 0 else d * 1_000_000 // (na * nb)
    return na, nb, d, ppm


def _brute_mw(pairs):
    a = [v for s, v in pairs if s == "a"]
    b = [v for s, v in pairs if s == "b"]
    na, nb = len(a), len(b)
    if na == 0 or nb == 0:
        return na, nb, 0, 0
    # 2*U_a = 2 * sum over (x in a, y in b) of [x>y] + [x==y]*0.5 * 2
    u2 = sum(2 if x > y else (1 if x == y else 0) for x in a for y in b)
    return na, nb, u2, u2 * 1_000_000 // (2 * na * nb)


def test_ks_identical_and_disjoint(spark):
    rows = ([(1, "a", v) for v in (1, 2, 3)]
            + [(1, "b", v) for v in (1, 2, 3)]     # identical -> D=0
            + [(2, "a", v) for v in (1, 2)]
            + [(2, "b", v) for v in (10, 11)])     # disjoint -> D=1
    got = _ks(spark, rows)
    assert got[1] == (3, 3, 0, 0)
    assert got[2] == (2, 2, 4, 1_000_000)


def test_ks_ties_match_brute_force(spark):
    pairs = [("a", v) for v in (1, 1, 2, 5, 5, 5, 9)] + \
            [("b", v) for v in (1, 2, 2, 5, 7, 9, 9, 9)]
    rows = [(1, s, v) for s, v in pairs]
    assert _ks(spark, rows)[1] == _brute_ks(pairs)


def test_ks_missing_sample_and_label_filter(spark):
    rows = [(1, "a", 5), (1, "a", 7),           # no b sample
            (2, "a", 1), (2, "b", 2), (2, "c", 99),  # c dropped
            (2, "a", None)]                     # null dropped
    got = _ks(spark, rows)
    assert got[1] == (2, 0, 0, 0)
    assert got[2] == (1, 1, 1, 1_000_000)


def test_mw_dominance_and_symmetry(spark):
    rows = ([(1, "a", v) for v in (10, 11, 12)]
            + [(1, "b", v) for v in (1, 2, 3)])  # a fully above b
    got = _mw(spark, rows)
    assert got[1] == (3, 3, 18, 1_000_000)      # AUC = 1


def test_mw_ties_match_brute_force(spark):
    pairs = [("a", v) for v in (1, 3, 3, 3, 8)] + \
            [("b", v) for v in (1, 1, 3, 5, 8, 8)]
    rows = [(1, s, v) for s, v in pairs]
    assert _mw(spark, rows)[1] == _brute_mw(pairs)


def test_mw_tie_order_invariance(spark):
    # shuffling the input (hence tie order) never changes the result
    pairs = [("a", 2), ("b", 2), ("a", 2), ("b", 5), ("a", 5)]
    rows = [(1, s, v) for s, v in pairs]
    assert (_mw(spark, rows)[1] == _mw(spark, rows[::-1])[1]
            == _brute_mw(pairs))


def test_rankstats_duckdb_twins_agree(spark):
    import random
    rng = random.Random(7)
    rows = [(i % 4, rng.choice("ab"), rng.randrange(0, 12))
            for i in range(400)]
    df = spark.createDataFrame(rows, SCHEMA)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp BIGINT, s VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    base = "SELECT grp, s, v FROM t"
    for fn, sql_fn, cols in [
        (ks_test, ks_test_sql, ["n_a", "n_b", "d_scaled", "d_ppm"]),
        (mannwhitney, mannwhitney_sql,
         ["n_a", "n_b", "u_a_x2", "auc_ppm"]),
    ]:
        spark_rows = {tuple(r[c] for c in ["grp"] + cols)
                      for r in fn(df, ["grp"], "s", "v", "a", "b")
                      .collect()}
        duck_rows = set(map(tuple, con.execute(
            sql_fn(base, ["grp"], "s", "v", "a", "b")).fetchall()))
        assert spark_rows == duck_rows


def test_rankstats_column_clash_raises(spark):
    df = spark.createDataFrame([(1, "a", 2, 3)],
                               "grp long, s string, v long, n_a long")
    with pytest.raises(ValueError):
        ks_test(df, ["grp"], "s", "v", "a", "b")
    with pytest.raises(ValueError):
        mannwhitney(df, ["grp"], "s", "v", "a", "b")
    with pytest.raises(ValueError):
        ks_test(df.drop("n_a"), [], "s", "v", "a", "b")


# ---------------------------------------------------------------------------
# modularity (operators/graph.py)
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.graph import (  # noqa: E402
    modularity,
    modularity_sql,
)

EDGE_SCHEMA = "src long, dst long"
LAB_SCHEMA = "id long, label long"


def _mod(spark, edges, labels):
    e = spark.createDataFrame(edges, EDGE_SCHEMA)
    l = spark.createDataFrame(labels, LAB_SCHEMA)
    return {r["label"]: (r["n_nodes"], r["e_in"], r["d_sum"],
                         r["contrib_ppm"])
            for r in modularity(e, l).collect()}


def test_modularity_two_triangles_bridge(spark):
    # two triangles joined by one bridge: m=7, each community has
    # e_in=3, d_sum=7 -> Q_c = 3/7 - (7/14)^2 = 0.1785714...
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    labels = [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)]
    got = _mod(spark, edges, labels)
    assert got == {1: (3, 3, 7, 178571), 4: (3, 3, 7, 178571)}


def test_modularity_negative_contribution_floors_down(spark):
    # a singleton community inside one triangle: Q_c = -(2/6)^2 =
    # -0.111111... -> ppm floor is -111112, NOT truncation to -111111
    edges = [(1, 2), (2, 3), (1, 3)]
    labels = [(1, 1), (2, 2), (3, 2)]
    got = _mod(spark, edges, labels)
    assert got[1] == (1, 0, 2, -111112)
    # {2,3}: e_in=1, d=4, m=3: 1/3 - (4/6)^2 = -0.11111.. -> -111112
    assert got[2] == (2, 1, 4, -111112)


def test_modularity_unlabeled_nodes_keep_m(spark):
    # node 3 unlabeled: the 2-3 edge still counts in m and in node
    # 2's degree, but can never be intra
    edges = [(1, 2), (2, 3)]
    labels = [(1, 1), (2, 1)]
    got = _mod(spark, edges, labels)
    # m=2, e_in=1, d_sum=1+2=3: 1/2 - (3/4)^2 = -0.0625
    assert got == {1: (2, 1, 3, -62500)}


def test_modularity_self_loops_dup_edges_dropped(spark):
    edges = [(1, 2), (2, 1), (1, 1), (1, 2)]
    labels = [(1, 7), (2, 7)]
    # m=1, e_in=1, d=2: Q = 1/1 - (2/2)^2 = 0
    assert _mod(spark, edges, labels) == {7: (2, 1, 2, 0)}


def test_modularity_duckdb_twin_agrees(spark):
    import random
    rng = random.Random(11)
    edges = [(rng.randrange(0, 30), rng.randrange(0, 30))
             for _ in range(120)]
    labels = [(i, i % 4) for i in range(30)]
    e = spark.createDataFrame(edges, EDGE_SCHEMA)
    l = spark.createDataFrame(labels, LAB_SCHEMA)
    spark_rows = set(map(tuple, modularity(e, l).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    con.execute("CREATE TABLE lab (id BIGINT, label BIGINT)")
    con.executemany("INSERT INTO lab VALUES (?, ?)", labels)
    duck_rows = set(map(tuple, con.execute(
        modularity_sql("SELECT src, dst FROM e",
                       "SELECT id, label FROM lab")).fetchall()))
    assert spark_rows == duck_rows


# ---------------------------------------------------------------------------
# tar shards (operators/shards.py)
# ---------------------------------------------------------------------------

import io  # noqa: E402
import tarfile  # noqa: E402

from biocypher_metta_spark.operators.shards import (  # noqa: E402
    parse_ustar,
    split_sample_key,
    tar_members,
    tar_pack,
)


def test_tar_pack_readable_by_stdlib_tarfile():
    members = [("017.txt", b"hello"), ("017.json", b"{}"),
               ("018.txt", b"\x00" * 600)]
    blob = tar_pack(members)
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf]
    assert got == members


def test_parse_ustar_reads_stdlib_tarfile_output():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        tf.addfile(tarfile.TarInfo("a/017.seg.png"), io.BytesIO())
        ti = tarfile.TarInfo("b.bin")
        ti.size = 513
        tf.addfile(ti, io.BytesIO(b"x" * 513))
        d = tarfile.TarInfo("somedir")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
    got = parse_ustar(buf.getvalue())
    assert got == [("a/017.seg.png", 0, b""), ("b.bin", 513, b"x" * 513)]


def test_parse_ustar_rejects_corruption():
    blob = bytearray(tar_pack([("a.txt", b"abc")]))
    blob[0] ^= 0xFF                      # name byte -> checksum breaks
    with pytest.raises(ValueError, match="checksum"):
        parse_ustar(bytes(blob))
    trunc = tar_pack([("a.txt", b"x" * 100)])[:512 + 50]
    with pytest.raises(ValueError, match="truncated"):
        parse_ustar(trunc)
    with pytest.raises(ValueError, match="100 bytes"):
        tar_pack([("x" * 101, b"")])


def test_split_sample_key_convention():
    assert split_sample_key("a/017.seg.png") == ("017", "seg.png")
    assert split_sample_key("017.txt") == ("017", "txt")
    assert split_sample_key("noext") == ("noext", None)


def test_tar_members_explode_and_error_row(spark):
    good = tar_pack([("017.txt", b"ab"), ("017.bin", b"\xff\xff")])
    bad = b"\x01" * 600
    df = spark.createDataFrame(
        [("s1", bytearray(good)), ("s2", bytearray(bad)), ("s3", None)],
        "media_ref string, content binary")
    rows = {(r["media_ref"], r["member_name"], r["size"], r["byte_sum"],
             r["sample_key"], r["ext"])
            for r in tar_members(df).collect()}
    assert rows == {
        ("s1", "017.txt", 2, ord("a") + ord("b"), "017", "txt"),
        ("s1", "017.bin", 2, 510, "017", "bin"),
        ("s2", None, None, None, None, None),
        # s3: None content -> empty archive -> no member rows
    }


def test_sample_assembly_manifest_and_error_rows(spark):
    from biocypher_metta_spark.operators.shards import sample_assembly

    members = spark.createDataFrame(
        [("s1", "017.txt", 2, 10, "017", "txt"),
         ("s1", "017.json", 3, 20, "017", "json"),
         ("s1", "018.txt", 5, 30, "018", "txt"),
         ("s1", "noext", 1, 7, "noext", None),    # null ext kept, not listed
         ("s2", None, None, None, None, None)],   # error row excluded
        "media_ref string, member_name string, size long, "
        "byte_sum long, sample_key string, ext string")
    got = {(r["media_ref"], r["sample_key"]):
           (r["n_members"], r["exts"], r["total_bytes"], r["content_sum"])
           for r in sample_assembly(members).collect()}
    assert got == {
        ("s1", "017"): (2, "json,txt", 5, 30),
        ("s1", "018"): (1, "txt", 5, 30),
        ("s1", "noext"): (1, "", 1, 7),
    }


# ---------------------------------------------------------------------------
# ANF neighborhood function (operators/graph.py)
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.graph import (  # noqa: E402
    neighborhood_function,
    neighborhood_function_sql,
)


def _anf(spark, edges, max_hops, k):
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    return {(r["node"], r["hop"]): (r["n_sketch"], r["est"])
            for r in neighborhood_function(df, max_hops, k=k)
            .collect()}


def test_anf_path_graph_exact(spark):
    got = _anf(spark, [(1, 2), (2, 3)], 2, 64)
    assert got == {
        (1, 1): (2, 2), (2, 1): (2, 2), (3, 1): (1, 1),
        (1, 2): (3, 3), (2, 2): (2, 2), (3, 2): (1, 1),
    }


def test_anf_estimate_mode_matches_kmv_formula(spark):
    # a star 0 -> 1..40 with k=4: hop-1 sketch of node 0 holds the 4
    # smallest of 41 member hashes; est must follow the kmv formula
    import hashlib

    k = 4
    edges = [(0, i) for i in range(1, 41)]
    got = _anf(spark, edges, 1, k)
    hashes = sorted(int(hashlib.md5(str(v).encode()).hexdigest()[:15],
                        16) for v in range(0, 41))
    expect = int((k - 1) * (float(1 << 60) / hashes[k - 1]))
    assert got[(0, 1)] == (k, expect)
    # leaves have no out-edges: singleton sketch, exact
    assert got[(5, 1)] == (1, 1)


def test_anf_validation(spark):
    df = spark.createDataFrame([(1, 2)], EDGE_SCHEMA)
    with pytest.raises(ValueError):
        neighborhood_function(df, 0)
    with pytest.raises(ValueError):
        neighborhood_function(df, 1, k=1)


def test_anf_duckdb_exact_twin_agrees(spark):
    import random
    rng = random.Random(13)
    edges = [(rng.randrange(0, 40), rng.randrange(0, 40))
             for _ in range(60)]
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    spark_rows = set(map(tuple,
                         neighborhood_function(df, 3, k=64).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    duck_rows = set(map(tuple, con.execute(
        neighborhood_function_sql("SELECT src, dst FROM e",
                                  3)).fetchall()))
    assert spark_rows == duck_rows


# ---------------------------------------------------------------------------
# robots.txt (operators/web.py)
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.web import (  # noqa: E402
    robots_filter,
    robots_filter_sql,
    robots_rules,
)

_RB = ("User-agent: *\nDisallow: /private\nAllow: /private/ok\n\n"
       "User-agent: evilbot\nDisallow: /")


def _verdicts(spark, robots_rows, urls, agent="*"):
    r = spark.createDataFrame(robots_rows,
                              "host string, robots_txt string")
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    return {row["url"]: (row["allowed"], row["rule_path"])
            for row in robots_filter(u, robots_rules(r, agent=agent))
            .collect()}


def test_robots_longest_match_and_default_allow(spark):
    got = _verdicts(spark, [("h.com", _RB)], [
        "https://h.com/private/ok/x",     # Allow len 11 beats len 8
        "https://h.com/private/no",       # Disallow /private
        "https://www.h.com/other",        # no match -> allowed, www strip
        "https://unknown.com/x",          # host absent -> allowed
        "https://h.com",                  # empty path -> '/'
    ])
    assert got == {
        "https://h.com/private/ok/x": (1, "/private/ok"),
        "https://h.com/private/no": (0, "/private"),
        "https://www.h.com/other": (1, None),
        "https://unknown.com/x": (1, None),
        "https://h.com": (1, None),
    }


def test_robots_agent_group_binding(spark):
    # evilbot binds its own group (Disallow /), not the '*' group
    got = _verdicts(spark, [("h.com", _RB)],
                    ["https://h.com/private/ok/x"], agent="EvilBot")
    assert got == {"https://h.com/private/ok/x": (0, "/")}


def test_robots_allow_wins_ties_and_empty_disallow(spark):
    rb = ("User-agent: a\nUser-agent: *\nAllow: /a\nDisallow: /a\n"
          "Disallow:\n# note")
    got = _verdicts(spark, [("h.com", rb)],
                    ["https://h.com/ab", "https://h.com/b"])
    assert got == {"https://h.com/ab": (1, "/a"),
                   "https://h.com/b": (1, None)}


def _brute_robots(robots_txt, path, agent="*"):
    # independent reference: RFC 9309 core (plain prefixes)
    groups, cur_agents, cur_rules, in_ua = [], [], [], False
    for raw in robots_txt.split("\n"):
        line = raw.split("#", 1)[0].strip()
        m = line.split(":", 1)
        d = m[0].strip().lower() if len(m) == 2 else ""
        v = m[1].strip().split()[0] if len(m) == 2 and m[1].strip() else ""
        if d == "user-agent":
            if not in_ua:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(v.lower())
            in_ua = True
        elif d in ("allow", "disallow"):
            if v:
                cur_rules.append((v, d == "allow"))
            in_ua = False
        else:
            in_ua = False
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    exact = [g for g in groups if agent.lower() in g[0]]
    bind = exact or [g for g in groups if "*" in g[0]]
    rules = [r for g in bind for r in g[1]]
    best = max((r for r in rules if path.startswith(r[0])),
               key=lambda r: (len(r[0]), r[1], r[0]), default=None)
    return (1, None) if best is None else (int(best[1]), best[0])


def test_robots_randomized_vs_brute_and_twin(spark):
    import random
    rng = random.Random(23)
    segs = ["/a", "/ab", "/a/b", "/b", "/c/d", "/"]
    hosts, robots_rows = [], []
    for h in range(6):
        lines, host = [], f"h{h}.com"
        for _ in range(rng.randrange(1, 4)):
            lines.append("User-agent: " +
                         rng.choice(["*", "botx", "boty"]))
            for _ in range(rng.randrange(0, 4)):
                lines.append(rng.choice(["Allow: ", "Disallow: "])
                             + rng.choice(segs + [""]))
        txt = "\n".join(lines)
        robots_rows.append((host, txt))
        hosts.append((host, txt))
    urls = [f"https://h{rng.randrange(0, 7)}.com{rng.choice(segs)}x"
            for _ in range(60)]
    got = _verdicts(spark, robots_rows, sorted(set(urls)))
    for u in sorted(set(urls)):
        host = u.split("//")[1].split("/")[0]
        path = "/" + u.split(".com", 1)[1].lstrip("/")
        txt = dict(hosts).get(host)
        expect = (1, None) if txt is None else _brute_robots(txt, path)
        assert got[u] == expect, (u, got[u], expect)
    # and the DuckDB twin agrees row-for-row
    import duckdb as _dd
    con = _dd.connect()
    robots_sql = ("SELECT * FROM (VALUES " + ", ".join(
        "('%s', '%s')" % (h, t.replace("'", "''").replace("\n", "' || chr(10) || '"))
        for h, t in robots_rows) + ") AS rb(host, robots_txt)")
    urls_sql = ("SELECT * FROM (VALUES " + ", ".join(
        f"('{u}')" for u in sorted(set(urls))) + ") AS uu(url)")
    duck = {r[0]: (r[3], r[4]) for r in con.execute(
        robots_filter_sql(urls_sql, robots_sql)).fetchall()}
    assert duck == got
