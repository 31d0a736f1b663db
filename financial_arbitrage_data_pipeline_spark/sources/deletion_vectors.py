"""Delta deletion vectors: descriptor resolution + the on-disk bitmap
format, implemented from the openly published Delta PROTOCOL.md
("Deletion Vectors" + "Deletion Vector Format" sections) and the public
RoaringFormatSpec.

A deletion vector (DV) marks rows of ONE data file as deleted without
rewriting the file — the merge-on-read path modern Delta writers use by
default for DELETE/UPDATE/MERGE. The `add` action carries a descriptor:

    {"storageType": "u"|"i"|"p",
     "pathOrInlineDv": <see below>,
     "offset": <byte offset of the DV within its file, "u"/"p" only>,
     "sizeInBytes": <length of the serialized bitmap>,
     "cardinality": <number of deleted rows>}

- "u": pathOrInlineDv = [<random fs prefix>]<20-char z85 of a 16-byte
  UUID>; the DV lives in `<prefix>/deletion_vector_<uuid>.bin` under
  the table root.
- "p": pathOrInlineDv is an absolute path to the DV file.
- "i": pathOrInlineDv IS the z85-encoded serialized bitmap (no file).

DV file layout: a 1-byte format version (1), then each stored DV as
`<dataSize: int32 BE><bitmapData: dataSize bytes><crc32(bitmapData):
int32 BE>` with the descriptor's `offset` pointing at the size prefix.

bitmapData is a "RoaringBitmapArray" in portable form: `<magic
1681511377: int32 LE><numberOfBitmaps: int64 LE>` followed by that many
standard 32-bit RoaringBitmap serializations (RoaringFormatSpec,
little-endian) in key order — bitmap i holds the low-32 bits of row
indexes whose high-32 bits equal i.

Everything here is bounded metadata work: descriptors are O(#files) on
the driver; bitmap PARSING happens on executors (see
`delta_log._deleted_rows_df`), one task per DV, so a 100 TB table with
thousands of DV'd files decodes its bitmaps in parallel and the deleted
row indexes never pass through the driver.

Reference capability anchor: the reference persists row-level
updates/corrections to its Postgres trade tables in place
(`/root/reference/database/postgres/writer.py:351-407`); DV reads are
what lets this engine consume the modern Delta equivalent of that
workload (merge-on-read deletes) written by third-party engines.
"""

from __future__ import annotations

import os
import struct
import uuid as uuid_mod
import zlib

DV_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4
_DV_FILE_VERSION = 1

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    """ZeroMQ base-85: 4 bytes -> 5 chars, big-endian base 85."""
    if len(data) % 4:
        raise ValueError(f"z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_ALPHABET[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 text length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_DECODE[c]
            except KeyError:
                raise ValueError(f"invalid z85 character {c!r}") from None
        out += v.to_bytes(4, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# 32-bit RoaringBitmap (RoaringFormatSpec) — read all three container
# kinds; write array/bitmap containers (a legal subset).
# ---------------------------------------------------------------------------


def _serialize_bitmap32(values: list[int]) -> bytes:
    """Standard serialization of one 32-bit bitmap from SORTED unique
    values. Always the no-run cookie (array/bitmap containers only) —
    readers must accept it; run encoding is a pure size optimization."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offsets: byte position of each container from the stream start
    pos = 8 + 4 * len(keys) + 4 * len(keys)
    offsets = []
    for k in keys:
        offsets.append(pos)
        card = len(containers[k])
        pos += 8192 if card > 4096 else 2 * card
    for off in offsets:
        out += struct.pack("<i", off)
    for k in keys:
        vals = containers[k]
        if len(vals) > 4096:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            out += bits
        else:
            out += struct.pack(f"<{len(vals)}H", *vals)
    return bytes(out)


def _deserialize_bitmap32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one standard 32-bit bitmap at `pos`; returns (sorted
    values, next position). Handles array, bitmap, AND run containers."""
    (cookie,) = struct.unpack_from("<i", buf, pos)
    run_flags = b""
    if cookie & 0xFFFF == _SERIAL_COOKIE_RUN:
        n = ((cookie & 0xFFFFFFFF) >> 16) + 1
        pos += 4
        nb = (n + 7) // 8
        run_flags = buf[pos : pos + nb]
        pos += nb
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        has_offsets = True
    else:
        raise ValueError(f"invalid RoaringBitmap cookie {cookie}")
    keys, cards = [], []
    for _ in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        keys.append(k)
        cards.append(c + 1)
        pos += 4
    if has_offsets:
        pos += 4 * n  # offsets are a seek aid; sequential parse skips them
    values: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        is_run = bool(run_flags) and bool(run_flags[i >> 3] & (1 << (i & 7)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base | v for v in range(start, start + length + 1))
        elif cards[i] > 4096:
            bits = buf[pos : pos + 8192]
            pos += 8192
            for byte_i, b in enumerate(bits):
                while b:
                    low = b & -b
                    values.append(base | (byte_i << 3) | low.bit_length() - 1)
                    b ^= low
        else:
            vals = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            values.extend(base | v for v in vals)
    return values, pos


def roaring_array_serialize(row_indexes: list[int]) -> bytes:
    """Serialize row indexes (any order, deduped here) into the portable
    RoaringBitmapArray form. All high-32 keys 0..max must be present per
    the spec — empty intermediate bitmaps are serialized empty."""
    idx = sorted(set(row_indexes))
    if idx and idx[0] < 0:
        raise ValueError("negative row index")
    by_high: dict[int, list[int]] = {}
    for v in idx:
        by_high.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n_maps = (max(by_high) + 1) if by_high else 0
    out = bytearray(struct.pack("<iq", DV_MAGIC, n_maps))
    for i in range(n_maps):
        out += _serialize_bitmap32(by_high.get(i, []))
    return bytes(out)


def roaring_array_deserialize(data: bytes) -> list[int]:
    """Sorted row indexes from a portable RoaringBitmapArray blob."""
    if len(data) < 12:
        raise ValueError("deletion vector blob too short")
    magic, n_maps = struct.unpack_from("<iq", data, 0)
    if magic != DV_MAGIC:
        raise ValueError(f"bad deletion-vector magic {magic}")
    pos = 12
    out: list[int] = []
    for i in range(n_maps):
        vals, pos = _deserialize_bitmap32(data, pos)
        out.extend((i << 32) | v for v in vals)
    return out


# ---------------------------------------------------------------------------
# DV file + descriptor resolution
# ---------------------------------------------------------------------------


def dv_absolute_path(table_dir: str, descriptor: dict) -> str | None:
    """Filesystem path of the DV file ('u'/'p'), None for inline."""
    st = descriptor["storageType"]
    if st == "i":
        return None
    if st == "p":
        return descriptor["pathOrInlineDv"]
    if st == "u":
        enc = descriptor["pathOrInlineDv"]
        prefix, uuid_z85 = enc[:-20], enc[-20:]
        u = uuid_mod.UUID(bytes=z85_decode(uuid_z85))
        return os.path.join(table_dir, prefix, f"deletion_vector_{u}.bin")
    raise ValueError(f"unknown deletionVector storageType {st!r}")


def read_dv_blob(table_dir: str, descriptor: dict) -> bytes:
    """The serialized bitmap bytes for one descriptor, with the size and
    CRC-32 the format stores verified — a torn or mis-offset read fails
    loudly, never returns a wrong deleted-set."""
    if descriptor["storageType"] == "i":
        data = z85_decode(descriptor["pathOrInlineDv"])
        data = data[: descriptor["sizeInBytes"]]  # z85 pads to 4 bytes
        if len(data) != descriptor["sizeInBytes"]:
            raise ValueError("inline DV shorter than sizeInBytes")
        return data
    path = dv_absolute_path(table_dir, descriptor)
    with open(path, "rb") as fh:
        fh.seek(descriptor["offset"])
        (size,) = struct.unpack(">i", fh.read(4))
        if size != descriptor["sizeInBytes"]:
            raise ValueError(
                f"DV size mismatch at {path}:{descriptor['offset']}: "
                f"stored {size}, descriptor {descriptor['sizeInBytes']}"
            )
        data = fh.read(size)
        if len(data) != size:
            raise ValueError(f"short DV read at {path}")
        (crc,) = struct.unpack(">I", fh.read(4))
        if crc != (zlib.crc32(data) & 0xFFFFFFFF):
            raise ValueError(f"DV checksum mismatch at {path}")
        return data


def dv_row_indexes(table_dir: str, descriptor: dict) -> list[int]:
    """Sorted deleted row indexes for one descriptor, cardinality
    cross-checked against the descriptor (the protocol requires them to
    agree; silence here could resurrect or over-delete rows)."""
    idx = roaring_array_deserialize(read_dv_blob(table_dir, descriptor))
    if len(idx) != descriptor["cardinality"]:
        raise ValueError(
            f"DV cardinality mismatch: bitmap {len(idx)} vs descriptor "
            f"{descriptor['cardinality']}"
        )
    return idx


def write_dv_file(table_dir: str, blobs: list[bytes]) -> list[dict]:
    """Write one on-disk DV file holding `blobs` (one serialized bitmap
    per target data file, a multi-DV file like real writers emit) and
    return a 'u'-storage descriptor per blob (cardinality left to the
    caller). Layout per the protocol: version byte then
    <size BE><data><crc BE> per blob."""
    u = uuid_mod.uuid4()
    path = os.path.join(table_dir, f"deletion_vector_{u}.bin")
    descriptors = []
    with open(path, "wb") as fh:
        fh.write(bytes([_DV_FILE_VERSION]))
        for data in blobs:
            off = fh.tell()
            fh.write(struct.pack(">i", len(data)))
            fh.write(data)
            fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            descriptors.append(
                {
                    "storageType": "u",
                    "pathOrInlineDv": z85_encode(u.bytes),
                    "offset": off,
                    "sizeInBytes": len(data),
                }
            )
    return descriptors
