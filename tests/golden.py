"""Golden generation + atom-set comparison utilities.

Goldens = reference adapter generators (imported via reference_shim) fed
through the REAL reference serializer (metta_writer.MeTTaWriter.write_node
/ write_edge, instantiated without BioCypher via __new__ + our compiled
edge registry). Comparison is set-based over rendered MeTTa expressions
(the north rule's P/R is set-based, SURVEY.md §3.4), with set-derived
list properties (synonyms) canonicalized on both sides since the reference
materializes them from unordered Python sets.
"""

from __future__ import annotations

import re

from biocypher_metta_spark.schema import load_default_registry
from tests.reference_shim import load_ref

_REGISTRY = load_default_registry()

UNORDERED_LIST_PROPS = {"synonyms"}
# def_out is non-greedy (it never contains escaped parens — ids/labels are
# unescaped); the item list is everything up to the closing '))'. Escaped
# items never contain spaces (spaces were replaced with '_'), so a split
# on ' ' recovers the elements.
_LIST_ATOM = re.compile(r"^\((\w+) (\(.*?\)) \((.*)\)\)$")


_UNORDERED_PREFIXES = tuple(f"({p} " for p in UNORDERED_LIST_PROPS)


def canonicalize(atom: str) -> str:
    """Sort elements of unordered list-valued property atoms."""
    if not atom.startswith(_UNORDERED_PREFIXES):
        return atom
    m = _LIST_ATOM.match(atom)
    if m and m.group(1) in UNORDERED_LIST_PROPS:
        items = " ".join(sorted(m.group(3).split(" ")))
        return f"({m.group(1)} {m.group(2)} ({items}))"
    return atom


def make_ref_writer():
    mw = load_ref("biocypher_metta.metta_writer")
    w = mw.MeTTaWriter.__new__(mw.MeTTaWriter)
    w.excluded_properties = []
    w.edge_node_types = {
        label: {"source": info.source, "target": info.target,
                "output_label": info.output_label}
        for label, info in _REGISTRY.edge_node_types.items()
    }
    return w


def golden_node_atoms(nodes_iter) -> set[str]:
    w = make_ref_writer()
    out: set[str] = set()
    for node in nodes_iter:
        out.update(canonicalize(a) for a in w.write_node(node))
    return out


def golden_edge_atoms(edges_iter) -> set[str]:
    w = make_ref_writer()
    out: set[str] = set()
    for edge in edges_iter:
        out.update(canonicalize(a) for a in w.write_edge(edge))
    return out


def spark_atoms(atoms_df) -> set[str]:
    """Arrow-batched fetch: Row-object collect() dominated the large
    parity tests (705k atoms for peregrine nodes); toPandas with Arrow
    moves the same strings in columnar batches."""
    return {canonicalize(a) for a in atoms_df.toPandas()["atom"]}


def precision_recall(ours: set[str], golden: set[str]) -> tuple[float, float]:
    if not ours and not golden:
        return 1.0, 1.0
    tp = len(ours & golden)
    precision = tp / len(ours) if ours else 0.0
    recall = tp / len(golden) if golden else 0.0
    return precision, recall


def assert_pr(ours: set[str], golden: set[str], min_pr: float = 0.95,
              label: str = "") -> None:
    p, r = precision_recall(ours, golden)
    if p < min_pr or r < min_pr:
        only_ours = sorted(ours - golden)[:8]
        only_gold = sorted(golden - ours)[:8]
        raise AssertionError(
            f"{label}: precision={p:.4f} recall={r:.4f} "
            f"(|ours|={len(ours)} |golden|={len(golden)})\n"
            f"ours-only: {only_ours}\ngolden-only: {only_gold}"
        )
