"""WebDataset-style tar shard handling.

Training corpora at the 100 TB scale ship as tar shards (the
WebDataset layout: one ~1 GB tar per row-group of samples, members
grouped by a shared sample key — `000017.jpg`, `000017.txt`,
`000017.json`). The engine treats one shard as one opaque binary row
(the multimodal column model, operators/multimodal.py) and EXPLODES it
into member rows with mapInPandas, so downstream decode/filter/dedup
stay columnar and the shard never round-trips through the driver.

The parser walks the POSIX ustar layout directly over the in-memory
bytes — 512-byte header blocks, octal size fields, header checksum
verification, data padded to block boundaries. A direct block walk
(rather than stdlib tarfile) keeps the Arrow batch path allocation-lean
and makes the subset explicit: regular-file members are emitted;
directory/link/pax-extension members are skipped over by size (their
payloads are metadata, not samples); a bad checksum or truncated
member raises ValueError, which the operator converts to one
null-member error row per shard (the decode_images error contract —
a corrupt shard must never fail the stage).

tar_pack() is the matching writer (zero mtime/uid/gid so output is
byte-deterministic) — used by re-sharding sinks and by the gate
fixtures; tests cross-check it against stdlib tarfile as an
independent second implementation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_BLOCK = 512

TAR_MEMBER_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("member_name", StringType()),
    StructField("size", LongType()),
    StructField("byte_sum", LongType()),
    StructField("sample_key", StringType()),
    StructField("ext", StringType()),
])


def parse_ustar(buf: bytes) -> list[tuple[str, int, bytes]]:
    """(name, size, payload) for every regular-file member. Raises
    ValueError on a bad header checksum, a non-octal size field, or a
    member whose payload runs past the end of the buffer."""
    out: list[tuple[str, int, bytes]] = []
    off, n = 0, len(buf)
    while off + _BLOCK <= n:
        hdr = buf[off:off + _BLOCK]
        if hdr.count(0) == _BLOCK:        # end-of-archive zero block
            break
        raw_size = hdr[124:136].split(b"\0")[0].strip()
        raw_chk = hdr[148:156].split(b"\0")[0].strip()
        try:
            size = int(raw_size or b"0", 8)
            chksum = int(raw_chk, 8)
        except ValueError:
            raise ValueError(f"non-octal tar header field at {off}")
        # checksum is computed with the checksum field read as spaces
        calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if calc != chksum:
            raise ValueError(f"tar header checksum mismatch at {off}")
        data_end = off + _BLOCK + size
        if data_end > n:
            raise ValueError(f"truncated tar member at {off}")
        typeflag = hdr[156:157]
        if typeflag in (b"0", b"\0"):
            name = hdr[:100].split(b"\0", 1)[0].decode("utf-8")
            out.append((name, size, buf[off + _BLOCK:data_end]))
        off += _BLOCK + -(-size // _BLOCK) * _BLOCK
    return out


def tar_pack(members: list[tuple[str, bytes]]) -> bytes:
    """Byte-deterministic ustar archive (mtime/uid/gid zeroed, mode
    0644). Names must fit the classic 100-byte field."""
    blocks: list[bytes] = []
    for name, data in members:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise ValueError(f"member name exceeds 100 bytes: {name!r}")
        hdr = bytearray(_BLOCK)
        hdr[0:len(nb)] = nb
        hdr[100:108] = b"0000644\0"               # mode
        hdr[108:116] = b"0000000\0"               # uid
        hdr[116:124] = b"0000000\0"               # gid
        hdr[124:136] = b"%011o\0" % len(data)     # size
        hdr[136:148] = b"00000000000\0"           # mtime
        hdr[148:156] = b" " * 8                   # checksum placeholder
        hdr[156:157] = b"0"                       # regular file
        hdr[257:263] = b"ustar\0"
        hdr[263:265] = b"00"
        hdr[148:156] = b"%06o\0 " % sum(hdr)
        blocks.append(bytes(hdr))
        blocks.append(data)
        blocks.append(b"\0" * (-len(data) % _BLOCK))
    blocks.append(b"\0" * (2 * _BLOCK))
    return b"".join(blocks)


def split_sample_key(name: str) -> tuple[str, str | None]:
    """WebDataset key convention: basename up to the FIRST dot is the
    sample key, everything after it the (possibly dotted) extension —
    `a/017.seg.png` -> ('017', 'seg.png')."""
    base = name.rsplit("/", 1)[-1]
    key, dot, ext = base.partition(".")
    return key, (ext if dot else None)


def tar_members(shards: DataFrame, ref_col: str = "media_ref",
                content_col: str = "content") -> DataFrame:
    """Explode binary tar shards into one row per regular-file member:
    (media_ref, member_name, size, byte_sum, sample_key, ext).
    byte_sum is the payload byte total — the cheap content witness the
    gate hashes; real pipelines route the payload bytes onward instead
    (same explode shape, BinaryType column).

    A malformed shard yields ONE row with null member fields under its
    media_ref, never a stage failure. Scale shape: map-only explode
    inside mapInPandas (one Arrow batch of shards in, member rows
    out); shards should be size-bucketed on write so one 4 GB
    straggler doesn't skew task runtimes (multimodal.py note)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in TAR_MEMBER_SCHEMA.fields]
        for pdf in it:
            rows = []
            for ref, content in zip(pdf[ref_col], pdf[content_col]):
                try:
                    members = parse_ustar(
                        bytes(content) if content is not None else b"")
                    for name, size, data in members:
                        key, ext = split_sample_key(name)
                        rows.append((ref, name, size, sum(data),
                                     key, ext))
                except Exception:
                    rows.append((ref, None, None, None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    return shards.mapInPandas(batches, TAR_MEMBER_SCHEMA)


def sample_assembly(members: DataFrame, shard_col: str = "media_ref",
                    key_col: str = "sample_key") -> DataFrame:
    """Assemble exploded member rows back into WebDataset SAMPLES —
    one row per (shard, sample_key) with the extension manifest:
    (shard, sample_key, n_members, exts, total_bytes, content_sum),
    where exts is the comma-joined SORTED extension list ('bin,txt')
    so a downstream completeness filter is one string equality
    (exts = 'jpg,json,txt' keeps exactly the fully-populated
    samples). Error rows (null member_name, the tar_members corrupt-
    shard contract) are excluded — a corrupt shard contributes no
    phantom sample.

    Scale shape: one mergeable groupBy on (shard, key); the
    collect_list is bounded by members-per-sample (single digits in
    every WebDataset layout), so no skew concern even on a hub
    shard."""
    from pyspark.sql import functions as F

    ok = members.filter(F.col("member_name").isNotNull())
    return (ok.groupBy(shard_col, key_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_members"),
                 F.concat_ws(",", F.array_sort(F.collect_list("ext")))
                 .alias("exts"),
                 F.sum("size").cast("long").alias("total_bytes"),
                 F.sum("byte_sum").cast("long").alias("content_sum")))
