#!/usr/bin/env python3
"""Independent-writer archive fixtures (round-17 verdict #5).

ArchiveSource's zip/gz members were already proven against wild bytes;
its bz2 and 7z paths were proven mostly on commons-compress-adjacent
fixtures (the same JVM stack that reads them). This script produces:

  wild_multi.csv.bz2 — TWO back-to-back bz2 streams written by the
      SYSTEM `bzip2` binary (the reference C libbz2 implementation),
      i.e. the pbzip2/multi-stream shape from a writer that shares no
      code with commons-compress's Java port.

  wild_store.7z — a 7z container assembled BY HAND with struct/zlib
      from the public 7zFormat.txt layout (signature header, PackInfo/
      UnPackInfo with one Copy-coder folder per member, folder CRCs,
      FilesInfo with UTF-16LE names). No 7z library involved, so every
      header byte comes from this file's own arithmetic.

  wild_members.zip — a CPython-zipfile archive with a UTF-8-flagged
      non-ASCII member name, deflate compression and a directory
      entry — shapes the java.util.zip writer fixtures never emit.

  wild_archive_golden.json — expected member names and line contents,
      pinned by ArchiveSpec.

Run from the repo root:  python3 scripts/make_archive_fixtures.py
"""
import json
import pathlib
import struct
import subprocess
import zlib

OUT = pathlib.Path(__file__).resolve().parent.parent / \
    "src" / "test" / "resources" / "graft"


# ---------------------------------------------------------------- bz2

BZ2_STREAMS = [
    "id,load\n1,17.5\n2,21.0\n",
    "id,load\n3,9.25\n",
]


def make_bz2(path):
    blob = b""
    for chunk in BZ2_STREAMS:
        p = subprocess.run(["bzip2", "-c"], input=chunk.encode(),
                           capture_output=True, check=True)
        blob += p.stdout
    path.write_bytes(blob)
    # sanity: the reference binary reads its own concatenation back
    p = subprocess.run(["bzip2", "-dc"], input=blob,
                       capture_output=True, check=True)
    assert p.stdout.decode() == "".join(BZ2_STREAMS)


# ----------------------------------------------------------------- 7z
# 7zFormat.txt property ids
K_END = 0x00
K_HEADER = 0x01
K_MAIN_STREAMS_INFO = 0x04
K_FILES_INFO = 0x05
K_PACK_INFO = 0x06
K_UNPACK_INFO = 0x07
K_SUBSTREAMS_INFO = 0x08
K_SIZE = 0x09
K_CRC = 0x0A
K_FOLDER = 0x0B
K_CODERS_UNPACK_SIZE = 0x0C
K_NAME = 0x11
COPY_CODER_ID = 0x00


def enc_num(value):
    """7z variable-length NUMBER (7zFormat.txt REAL_UINT64 sibling)."""
    first = 0
    mask = 0x80
    for i in range(8):
        if value < (1 << (7 * (i + 1))):
            first |= value >> (8 * i)
            break
        first |= mask
        mask >>= 1
    else:
        i = 8
        first = 0xFF
    # only the LOW i bytes follow; the remaining high bits live in
    # the first byte's free positions
    return bytes([first]) + (value & ((1 << (8 * i)) - 1)).to_bytes(
        i, "little")


def make_7z(path, members):
    """Store-only 7z: one Copy-coder folder per member."""
    payloads = [data for _, data in members]
    packed = b"".join(payloads)

    # --- header (built back to front conceptually, emitted forward)
    h = bytearray()
    h.append(K_HEADER)

    h.append(K_MAIN_STREAMS_INFO)
    # PackInfo: pack position 0, one pack stream per member
    h.append(K_PACK_INFO)
    h += enc_num(0)
    h += enc_num(len(payloads))
    h.append(K_SIZE)
    for p in payloads:
        h += enc_num(len(p))
    h.append(K_END)
    # UnPackInfo: one single-coder (Copy) folder per pack stream
    h.append(K_UNPACK_INFO)
    h.append(K_FOLDER)
    h += enc_num(len(payloads))
    h.append(0)  # not external
    for _ in payloads:
        h += enc_num(1)        # one coder
        h.append(0x01)         # flags: id size 1, simple, no attrs
        h.append(COPY_CODER_ID)
    h.append(K_CODERS_UNPACK_SIZE)
    for p in payloads:
        h += enc_num(len(p))   # Copy: unpack size == pack size
    h.append(K_CRC)
    h.append(1)  # all defined
    for p in payloads:
        h += struct.pack("<I", zlib.crc32(p) & 0xFFFFFFFF)
    h.append(K_END)  # end UnPackInfo
    # explicit-but-empty SubStreamsInfo: the defaults (one substream
    # per folder, folder sizes and CRCs) apply, but readers want the
    # section present to populate them
    h.append(K_SUBSTREAMS_INFO)
    h.append(K_END)
    h.append(K_END)  # end MainStreamsInfo

    h.append(K_FILES_INFO)
    h += enc_num(len(members))
    names = bytearray()
    names.append(0)  # not external
    for name, _ in members:
        names += name.encode("utf-16-le") + b"\x00\x00"
    h.append(K_NAME)
    h += enc_num(len(names))
    h += names
    h.append(K_END)  # end FilesInfo

    h.append(K_END)  # end Header
    header = bytes(h)

    sig = b"7z\xBC\xAF\x27\x1C" + bytes([0, 4])
    start = struct.pack("<QQI", len(packed), len(header),
                        zlib.crc32(header) & 0xFFFFFFFF)
    sig += struct.pack("<I", zlib.crc32(start) & 0xFFFFFFFF) + start
    assert len(sig) == 32
    path.write_bytes(sig + packed + header)


SEVENZ_MEMBERS = [
    ("meters_a.csv", b"id,kwh\n10,3.5\n11,4.25\n"),
    ("meters_b.csv", b"id,kwh\n12,1.75\n"),
]


# ------------------------------------------------------------------ gz

GZ_STREAMS = [
    "id,x\n1,5.5\n2,7.0\n",
    "id,x\n3,2.25\n",
]


def make_gz(path):
    """Multi-member gz from the system gzip binary: member 1 carries
    an FNAME header field (gzip -N on a named file), member 2 is
    plain — the cat/pigz concatenation shape. java.util.zip's
    GZIPInputStream must skip the FNAME bytes and continue past the
    first member's trailer."""
    import tempfile
    blob = b""
    with tempfile.TemporaryDirectory() as d:
        for i, chunk in enumerate(GZ_STREAMS):
            tmp = pathlib.Path(d) / f"member{i}.csv"
            tmp.write_bytes(chunk.encode())
            args = ["gzip", "-c"] + (["-N"] if i == 0 else []) + [str(tmp)]
            p = subprocess.run(args, capture_output=True, check=True)
            blob += p.stdout
    path.write_bytes(blob)
    p = subprocess.run(["gzip", "-dc"], input=blob,
                       capture_output=True, check=True)
    assert p.stdout.decode() == "".join(GZ_STREAMS)


# ----------------------------------------------------------------- zip

ZIP_MEMBERS = [
    # UTF-8-flagged non-ASCII name, deflate — shapes the JVM writer
    # fixtures never produce
    ("straße_1.csv", "id,v\n1,1.5\n2,2.5\n"),
    ("plain.csv", "id,v\n3,9.0\n"),
]


def make_zip(path):
    import zipfile
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("data/", "")  # directory entry
        for name, text in ZIP_MEMBERS:
            z.writestr(name, text)


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    make_bz2(OUT / "wild_multi.csv.bz2")
    make_gz(OUT / "wild_multi.csv.gz")
    make_7z(OUT / "wild_store.7z", SEVENZ_MEMBERS)
    make_zip(OUT / "wild_members.zip")
    golden = {
        "bz2_lines": [l for s in BZ2_STREAMS for l in s.splitlines()],
        "gz_lines": [l for s in GZ_STREAMS for l in s.splitlines()],
        "sevenz_members": {
            name: data.decode().splitlines()
            for name, data in SEVENZ_MEMBERS
        },
        "zip_members": {
            name: text.splitlines() for name, text in ZIP_MEMBERS
        },
    }
    (OUT / "wild_archive_golden.json").write_text(
        json.dumps(golden, indent=1, sort_keys=True) + "\n")
    print("wrote", OUT / "wild_multi.csv.bz2")
    print("wrote", OUT / "wild_multi.csv.gz")
    print("wrote", OUT / "wild_store.7z")
    print("wrote", OUT / "wild_members.zip")
    print("wrote", OUT / "wild_archive_golden.json")


if __name__ == "__main__":
    main()
