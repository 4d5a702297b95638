"""SuSiE fine-mapping twin (reference notebooks/finemapping_susie.ipynb)."""

import math
import sys
from pathlib import Path

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from biocypher_metta_spark.operators import finemap as fm


def _z_df(spark, z, locus="loc1"):
    rows = [(locus, i, float(v)) for i, v in enumerate(z)]
    return spark.createDataFrame(rows, "locus string, snp long, z double")


def _ld_df(spark, R, locus="loc1"):
    p = R.shape[0]
    rows = [(locus, i, j, float(R[i, j]))
            for i in range(p) for j in range(i + 1, p)
            if R[i, j] != 0.0]
    return spark.createDataFrame(rows, "locus string, i long, j long, r double")


def test_ser_abf_softmax_and_credible_set(spark):
    z = [5.0, 4.8, 0.3, -0.1, 0.0]
    out = {r.snp: r for r in fm.ser_abf(_z_df(spark, z)).collect()}
    # alpha is a softmax of lbf: positive, sums to 1, ordered like z^2
    s = sum(r.alpha for r in out.values())
    assert abs(s - 1.0) < 1e-12
    assert out[0].alpha > out[1].alpha > out[2].alpha
    assert out[3].alpha > out[4].alpha  # |z|=0.1 beats z=0
    # closed form for one snp
    w = fm.PRIOR_W
    expect0 = 0.5 * math.log(1 / (1 + w)) + z[0] ** 2 / 2 * (w / (1 + w))
    assert abs(out[0].lbf - expect0) < 1e-12
    # the two strong snps carry ~all mass -> 95% set = {0, 1}
    in_cs = {snp for snp, r in out.items() if r.in_cs}
    assert in_cs == {0, 1}
    assert out[0].cs_rank == 1 and out[1].cs_rank == 2


def test_susie_rss_L1_identity_R_matches_ser(spark):
    """With L=1 and R=I the IBSS fixed point IS the closed-form SER:
    pips must equal ser_abf's alphas."""
    rng = np.random.RandomState(7)
    z = rng.normal(0, 2, 40)
    zdf = _z_df(spark, z)
    ld = spark.createDataFrame([], "locus string, i long, j long, r double")
    pips = {r.snp: r.pip for r in fm.susie_rss(zdf, ld, L=1).collect()}
    alphas = {r.snp: r.alpha for r in fm.ser_abf(zdf).collect()}
    assert set(pips) == set(alphas)
    for snp in pips:
        assert abs(pips[snp] - alphas[snp]) < 1e-9, snp


def test_susie_rss_recovers_planted_causals(spark):
    """Two causal SNPs in different LD blocks: each must land in its
    own surviving credible set with its block-mates, pip concentrated;
    null SNPs outside blocks must have cs=0 and tiny pip."""
    p, block = 30, 5
    R = np.eye(p)
    for b0 in range(0, p, block):  # block-diagonal LD, r=0.9 in-block
        for i in range(b0, b0 + block):
            for j in range(b0, b0 + block):
                if i != j:
                    R[i, j] = 0.9
    causal = [2, 17]
    lam = np.zeros(p)
    # distinct strengths: exactly symmetric signals make every IBSS
    # effect split 50/50 across both blocks (the same degenerate
    # fixed point susieR reaches on perfectly tied data)
    lam[causal[0]], lam[causal[1]] = 6.0, 5.0
    z = R @ lam  # expected z under the planted signal, noise-free
    out = {r.snp: r for r in
           fm.susie_rss(_z_df(spark, z), _ld_df(spark, R), L=5).collect()}
    cs_of = {c: {s for s, r in out.items() if r.cs == c}
             for c in {r.cs for r in out.values()} - {0}}
    assert len(cs_of) == 2
    blocks = [set(range(0, 5)), set(range(15, 20))]
    for c, members in cs_of.items():
        assert any(members <= blk for blk in blocks), members
    # each causal's block hosts one credible set containing the causal
    for snp in causal:
        assert out[snp].cs != 0, (snp, out[snp])
    # nulls outside blocks: no set, negligible pip
    for snp in (7, 11, 23, 28):
        assert out[snp].cs == 0
        assert out[snp].pip < 0.05
    # pip mass within each causal block ~1 (signal present)
    for blk in blocks:
        assert sum(out[s].pip for s in blk) > 0.9


def test_susie_rss_purity_filter_drops_disjoint_set(spark):
    """A diffuse effect spread over UNCORRELATED snps cannot form a
    pure credible set (min |corr| = 0 < 0.5) -> susie_get_cs drops it;
    with equal weak z everywhere and R=I, no set should survive."""
    p = 20
    z = np.full(p, 1.2)
    ld = spark.createDataFrame([], "locus string, i long, j long, r double")
    out = fm.susie_rss(_z_df(spark, z), ld, L=3).collect()
    assert all(r.cs == 0 for r in out)


def test_susie_rss_multiple_loci_independent(spark):
    """Loci must not leak into each other (groupBy isolation)."""
    za = _z_df(spark, [6.0, 0.1, 0.0], locus="A")
    zb = _z_df(spark, [0.0, 0.2, 7.0], locus="B")
    ld = spark.createDataFrame([], "locus string, i long, j long, r double")
    out = fm.susie_rss(za.unionByName(zb), ld, L=2).collect()
    top = {r.locus: max((rr for rr in out if rr.locus == r.locus),
                        key=lambda x: x.pip).snp for r in out}
    assert top == {"A": 0, "B": 2}
