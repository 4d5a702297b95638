"""Round-5af operators: IPv4 parsing and CIDR containment join
(operators/web) against Python's ipaddress module as the independent
oracle, plus the DuckDB expression twins."""

import ipaddress
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from biocypher_metta_spark.operators.web import (
    cidr_bounds,
    cidr_bounds_sql,
    ip_in_cidr_join,
    ipv4_to_long,
    ipv4_to_long_sql,
)


def _parse(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "ip string")
    return [r["n"] for r in
            df.select(ipv4_to_long(F.col("ip")).alias("n")).collect()]


def test_ipv4_parse_against_ipaddress(spark):
    vals = ["0.0.0.0", "255.255.255.255", "10.1.2.3", "192.168.0.1",
            "8.8.8.8", "01.2.3.4"]
    got = _parse(spark, vals)
    want = [int(ipaddress.IPv4Address(v.replace("01.", "1.")))
            if v != "01.2.3.4" else int(ipaddress.IPv4Address("1.2.3.4"))
            for v in vals]
    assert got == want


def test_ipv4_malformed_null(spark):
    bad = ["256.1.1.1", "1.2.3", "1.2.3.4.5", "a.b.c.d", "",
           "1..2.3", "1.2.3.999"]
    assert _parse(spark, bad) == [None] * len(bad)


def test_cidr_bounds_against_ipaddress(spark):
    vals = ["10.0.0.0/8", "192.168.1.128/25", "8.8.8.8/32",
            "0.0.0.0/0", "10.1.2.3/24", "1.2.3.4/33", "junk"]
    df = spark.createDataFrame([(v,) for v in vals], "cidr string")
    lo, hi = cidr_bounds(F.col("cidr"))
    got = [(r["lo"], r["hi"]) for r in
           df.select(lo.alias("lo"), hi.alias("hi")).collect()]
    for v, (glo, ghi) in zip(vals, got):
        try:
            net = ipaddress.IPv4Network(v, strict=False)
            assert glo == int(net.network_address)
            assert ghi == int(net.broadcast_address)
        except ValueError:
            assert glo is None and ghi is None


def test_cidr_join_matches_ipaddress_and_twin(spark):
    rng = random.Random(3)
    ips = [f"{rng.randrange(256)}.{rng.randrange(256)}."
           f"{rng.randrange(256)}.{rng.randrange(256)}"
           for _ in range(200)] + ["999.1.1.1"]
    cidrs = [f"{rng.randrange(256)}.{rng.randrange(256)}.0.0/"
             f"{rng.choice([8, 12, 16, 20, 24, 28, 32])}"
             for _ in range(60)] + ["0.0.0.0/0", "bad/99"]
    ipdf = spark.createDataFrame([(i, v) for i, v in enumerate(ips)],
                                 "ip_id long, ip string")
    cdf = spark.createDataFrame([(i, v) for i, v in enumerate(cidrs)],
                                "cidr_id long, cidr string")
    out = ip_in_cidr_join(ipdf, cdf)
    got = {(r["ip_id"], r["cidr_id"]) for r in out.collect()}
    want = set()
    for i, ip in enumerate(ips):
        try:
            a = ipaddress.IPv4Address(ip)
        except ValueError:
            continue
        for j, c in enumerate(cidrs):
            try:
                if a in ipaddress.IPv4Network(c, strict=False):
                    want.add((i, j))
            except ValueError:
                pass
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE ips (ip_id BIGINT, ip VARCHAR)")
    con.executemany("INSERT INTO ips VALUES (?, ?)",
                    list(enumerate(ips)))
    con.execute("CREATE TABLE cid (cidr_id BIGINT, cidr VARCHAR)")
    con.executemany("INSERT INTO cid VALUES (?, ?)",
                    list(enumerate(cidrs)))
    lo, hi = cidr_bounds_sql("cidr")
    duck = set(map(tuple, con.execute(f"""
        SELECT ip_id, cidr_id FROM
          (SELECT ip_id, {ipv4_to_long_sql('ip')} AS n FROM ips)
          JOIN (SELECT cidr_id, {lo} AS lo, {hi} AS hi FROM cid)
          ON n IS NOT NULL AND lo IS NOT NULL
             AND n BETWEEN lo AND hi""").fetchall()))
    assert duck == got
