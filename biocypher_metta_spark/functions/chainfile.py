"""Pure-stdlib UCSC chain-file liftover kernel (P11, the real thing).

The reference lifts hg19->hg38 through the `liftover` package
(helpers.py:145-175 `convert_genome_reference`, used by
dbsuper_adapter.py:48-49), which reads the public UCSC ``.over.chain``
format. That library is absent from this container, so this module
implements the chain format directly from the public spec
(https://genome.ucsc.edu/goldenPath/help/chain.html) with nothing but
the stdlib:

    chain score tName tSize tStrand tStart tEnd qName qSize qStrand qStart qEnd [id]
    size dt dq
    ...
    size                      <- final block has no gap fields

* header coordinates are 0-based half-open;
* when a strand is '-', that sequence's start/end count from the far
  end (reverse-strand coordinates); UCSC liftOver chains always have
  tStrand '+', which this parser asserts;
* each block line aligns `size` bases, then skips `dt` on the target
  (source build) and `dq` on the query (destination build).

`ChainLifter.query(chrom, pos)` mirrors the `liftover` package protocol
the reference relies on: 0-based source position in, a list of
``(dst_chrom, dst_pos, dst_strand)`` out, best chain score first — so
`make_liftover_udf(ChainLifter.from_path(p).query)` drops straight into
the existing pluggable seam in functions/liftover.py.

Scale notes: the full hg19ToHg38 chain expands to ~10^6 aligned blocks
— a few tens of MB as the flat per-chromosome arrays built here. The
lifter object pickles into the pandas-UDF closure once per executor
(broadcast-sized, like the reference's process-global `_lifters` cache);
each row lookup is one bisect + a bounded left scan, no per-row parsing.
"""

from __future__ import annotations

import gzip
from bisect import bisect_right, insort


def _norm_chrom(name: str) -> str:
    """Index/query chromosome key: 'chr1'/'ch1'/'1' -> '1' (the
    reference strips these prefixes before querying, helpers.py:168)."""
    if name.startswith("chr"):
        return name[3:]
    if name.startswith("ch"):
        return name[2:]
    return name


def parse_chain_blocks(text: str):
    """Parse chain text into flat aligned-block tuples.

    Yields ``(src_chrom, src_start, src_end, dst_chrom, dst_anchor,
    sign, strand, score, ord)`` where the forward-strand destination of
    source position ``p`` inside the block is
    ``dst_anchor + sign * (p - src_start)``; ``ord`` is the chain's
    file order (stable tiebreak for equal scores).
    """
    chain_ord = -1
    header = None
    lines = iter(text.splitlines())
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("chain"):
            if header is not None:
                raise ValueError("chain header before previous chain's final block")
            f = line.split()
            if len(f) not in (12, 13):
                raise ValueError(f"malformed chain header: {line!r}")
            (score, t_name, t_size, t_strand, t_start, t_end,
             q_name, q_size, q_strand, q_start, q_end) = (
                int(f[1]), f[2], int(f[3]), f[4], int(f[5]), int(f[6]),
                f[7], int(f[8]), f[9], int(f[10]), int(f[11]))
            if t_strand != "+":
                raise ValueError("tStrand '-' not in UCSC liftOver chains")
            chain_ord += 1
            header = [score, t_name, t_strand, q_name, q_size, q_strand,
                      t_start, q_start, t_end, q_end]
            continue
        if header is None:
            raise ValueError(f"alignment line outside a chain: {line!r}")
        parts = line.split()
        size = int(parts[0])
        (score, t_name, _ts, q_name, q_size, q_strand,
         t_cur, q_cur, t_end, q_end) = header
        if size > 0:
            if q_strand == "+":
                dst_anchor, sign = q_cur, 1
            else:
                # q_cur is a reverse-strand coordinate; forward position
                # of offset k in the block is q_size - 1 - (q_cur + k).
                dst_anchor, sign = q_size - 1 - q_cur, -1
            yield (_norm_chrom(t_name), t_cur, t_cur + size,
                   _norm_chrom(q_name), dst_anchor, sign, q_strand,
                   score, chain_ord)
        if len(parts) == 3:
            header[6] = t_cur + size + int(parts[1])
            header[7] = q_cur + size + int(parts[2])
        elif len(parts) == 1:
            if t_cur + size != t_end or q_cur + size != q_end:
                raise ValueError(
                    f"chain #{chain_ord} blocks do not sum to header span")
            header = None
        else:
            raise ValueError(f"malformed alignment line: {line!r}")
    if header is not None:
        raise ValueError("chain file truncated inside a chain")


class ChainLifter:
    """Interval-stabbing index over chain blocks.

    Per source chromosome: block starts sorted ascending, plus a running
    max of block ends, so a point query is ``bisect_right`` + a left
    scan bounded by the running max (classic stabbing on sorted starts —
    overlapping chains are handled, not just the best one).
    """

    def __init__(self, blocks):
        by_chrom: dict[str, list] = {}
        for b in blocks:
            by_chrom.setdefault(b[0], []).append(b)
        self._idx = {}
        self._np = None  # lazy numpy mirror for the vectorized batch path
        for chrom, bl in by_chrom.items():
            bl.sort(key=lambda b: (b[1], b[8]))
            starts = [b[1] for b in bl]
            ends = [b[2] for b in bl]
            prefmax = []
            m = 0
            for e in ends:
                m = e if e > m else m
                prefmax.append(m)
            rest = [(b[3], b[4], b[5], b[6], b[7], b[8]) for b in bl]
            self._idx[chrom] = (starts, ends, prefmax, rest)

    @classmethod
    def from_text(cls, text: str) -> "ChainLifter":
        return cls(parse_chain_blocks(text))

    @classmethod
    def from_path(cls, path: str) -> "ChainLifter":
        opener = gzip.open if str(path).endswith(".gz") else open
        with opener(path, "rt") as fh:
            return cls.from_text(fh.read())

    def query(self, chrom: str, pos: int):
        """All mappings of 0-based `pos`, best chain score first:
        list of (dst_chrom, dst_pos, dst_strand)."""
        entry = self._idx.get(_norm_chrom(str(chrom)))
        if entry is None:
            return []
        starts, ends, prefmax, rest = entry
        j = bisect_right(starts, pos) - 1
        hits = []
        while j >= 0 and prefmax[j] > pos:
            if starts[j] <= pos < ends[j]:
                dst_chrom, anchor, sign, strand, score, order = rest[j]
                insort(hits, (-score, order,
                              dst_chrom, anchor + sign * (pos - starts[j]),
                              strand))
            j -= 1
        return [(c, p, s) for _, _, c, p, s in hits]

    def _np_index(self):
        """Lazy numpy mirror of the per-chrom index (the parser stays
        pure-stdlib; only the batch path needs numpy). Built once per
        lifter object — i.e. once per executor after unpickling."""
        import numpy as np
        if self._np is None:
            idx = {}
            for chrom, (starts, ends, prefmax, rest) in self._idx.items():
                idx[chrom] = {
                    "starts": np.asarray(starts, dtype=np.int64),
                    "ends": np.asarray(ends, dtype=np.int64),
                    "prefmax": np.asarray(prefmax, dtype=np.int64),
                    "chrom": np.asarray([r[0] for r in rest], dtype=object),
                    "anchor": np.asarray([r[1] for r in rest], dtype=np.int64),
                    "sign": np.asarray([r[2] for r in rest], dtype=np.int64),
                    "strand": np.asarray([r[3] for r in rest], dtype=object),
                    "score": np.asarray([r[4] for r in rest], dtype=np.int64),
                    "order": np.asarray([r[5] for r in rest], dtype=np.int64),
                }
            self._np = idx
        return self._np

    def _best_blocks(self, entry, pos):
        """Vectorized stabbing scan over one chrom's block arrays:
        np.searchsorted, then the left-scan runs as whole-vector rounds
        (round count = max overlap depth at the queried positions, 1-3
        on real UCSC chains). Returns the best-(score, order) block
        index per position, -1 where unmapped."""
        import numpy as np
        j = np.searchsorted(entry["starts"], pos, side="right") - 1
        best_score = np.full(len(pos), np.iinfo(np.int64).min,
                             dtype=np.int64)
        best_order = np.full(len(pos), np.iinfo(np.int64).max,
                             dtype=np.int64)
        best_block = np.full(len(pos), -1, dtype=np.int64)
        active = np.nonzero(j >= 0)[0]
        while active.size:
            ja, pa = j[active], pos[active]
            cont = entry["prefmax"][ja] > pa
            hit = cont & (entry["starts"][ja] <= pa) \
                & (pa < entry["ends"][ja])
            if hit.any():
                hi = active[hit]
                sc, od = entry["score"][ja[hit]], entry["order"][ja[hit]]
                better = (sc > best_score[hi]) | (
                    (sc == best_score[hi]) & (od < best_order[hi]))
                upd = hi[better]
                best_score[upd] = sc[better]
                best_order[upd] = od[better]
                best_block[upd] = ja[hit][better]
            rem = active[cont]
            j[rem] -= 1
            active = rem[j[rem] >= 0]
        return best_block

    def query_best_many(self, chroms, poss):
        """Batch twin of ``query(...)[0]``: for each (chrom, pos) the
        best-scoring mapping as (dst_chrom, dst_pos, dst_strand), or
        None if unmapped. Vectorized per chrom group via _best_blocks."""
        import numpy as np
        out = [None] * len(poss)
        groups: dict[str, list[int]] = {}
        for i, c in enumerate(chroms):
            if c is None or poss[i] is None:
                continue
            groups.setdefault(_norm_chrom(str(c)), []).append(i)
        np_idx = self._np_index()
        for chrom, rows in groups.items():
            entry = np_idx.get(chrom)
            if entry is None:
                continue
            pos = np.asarray([poss[i] for i in rows], dtype=np.int64)
            best_block = self._best_blocks(entry, pos)
            for k in np.nonzero(best_block >= 0)[0]:
                b = best_block[k]
                dpos = int(entry["anchor"][b]
                           + entry["sign"][b] * (pos[k] - entry["starts"][b]))
                out[rows[k]] = (entry["chrom"][b], dpos, entry["strand"][b])
        return out

    def query_best_pos_many(self, chroms, poss):
        """Fully vectorized dst-position batch (the pandas-UDF hot
        path): chrom normalization + grouping via pandas C kernels,
        output assembled whole-vector. Returns a nullable Int64 pandas
        Series (NA = unmapped / null input); positions stay exact in
        float64 (< 2^53)."""
        import numpy as np
        import pandas as pd
        s = pd.Series(chroms, dtype=object).astype("string")
        pos = pd.to_numeric(pd.Series(poss), errors="coerce")
        norm = s.str.replace(r"^(?:chr|ch)", "", regex=True)
        norm = norm.where(s.notna() & pos.notna())
        out = np.full(len(s), np.nan)
        np_idx = self._np_index()
        posv = pos.to_numpy(dtype="float64", na_value=np.nan)
        for chrom, idx in norm.groupby(norm).indices.items():
            entry = np_idx.get(chrom)
            if entry is None:
                continue
            p = posv[idx].astype(np.int64)
            bb = self._best_blocks(entry, p)
            found = bb >= 0
            bf = bb[found]
            out[idx[found]] = (entry["anchor"][bf] + entry["sign"][bf]
                               * (p[found] - entry["starts"][bf]))
        return pd.Series(out).astype("Int64")

    def blocks_table(self):
        """Flat block rows for SQL-oracle generation / diagnostics:
        (src_chrom, src_start, src_end, dst_chrom, dst_anchor, sign,
        strand, score, ord)."""
        out = []
        for chrom, (starts, ends, _pm, rest) in sorted(self._idx.items()):
            for s, e, r in zip(starts, ends, rest):
                out.append((chrom, s, e) + r)
        return out


def compose_chain(score, t_name, t_size, t_start, q_name, q_size,
                  q_strand, q_start, blocks, chain_id=1) -> str:
    """Emit one well-formed chain record (fixture/test utility).

    `blocks` is ``[(size, dt, dq), ..., (last_size,)]``; tEnd/qEnd are
    derived so the record satisfies the spec's sum invariant.
    """
    t_end, q_end = t_start, q_start
    for b in blocks:
        t_end += b[0] + (b[1] if len(b) == 3 else 0)
        q_end += b[0] + (b[2] if len(b) == 3 else 0)
    lines = [f"chain {score} {t_name} {t_size} + {t_start} {t_end} "
             f"{q_name} {q_size} {q_strand} {q_start} {q_end} {chain_id}"]
    for b in blocks:
        lines.append(" ".join(str(x) for x in b))
    return "\n".join(lines) + "\n"


