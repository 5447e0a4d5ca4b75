#!/usr/bin/env python3
"""Hand-assemble a minimal classic-format HDF5 file (superblock v0,
v1 object headers, symbol-table root group, local heap, contiguous
layout, v1 attribute messages) — the OTHER half of the HDF5 feature
matrix from the netCDF-4 fixture (v2 superblock / OHDR / dense storage).
No HDF5 library exists in this container, so building the bytes by hand
is both the only option and an independent check of the layout
Hdf5Mini.scala parses.

Writes src/test/resources/golden/classic_hdf5.nc:
  TIME  float64[4]  units="days since 2021-01-01" (v1 attr)
  TEMP  int32[4]    scale_factor=0.5 (v1 attr), contiguous little-endian
"""
import struct

UNDEF = 0xFFFFFFFFFFFFFFFF


def pad(b, k=8):
    return b + b"\x00" * ((k - len(b) % k) % k)


def v1_msg(mtype, body):
    body = pad(body, 8)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def dataspace_v1(dims):
    return struct.pack("<BBB5x", 1, len(dims), 0) + b"".join(
        struct.pack("<Q", d) for d in dims)


def dtype_f64():
    # class 1 (float), little-endian; IEEE f64 property fields
    return struct.pack("<BBBBI", 0x11, 0x20, 0x3F, 0x00, 8) + struct.pack(
        "<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)


def dtype_i32():
    # class 0 (fixed), little-endian, signed (bit3 of bits0)
    return struct.pack("<BBBBI", 0x10, 0x08, 0x00, 0x00, 4) + struct.pack(
        "<HH", 0, 32)


def dtype_string(n):
    return struct.pack("<BBBBI", 0x13, 0x00, 0x00, 0x00, n)


def attr_v1(name, dt, ds, value):
    nb = name.encode() + b"\x00"
    return struct.pack("<BxHHH", 1, len(nb), len(dt), len(ds)) + \
        pad(nb) + pad(dt) + pad(ds) + value


def layout_contiguous(addr, size):
    return struct.pack("<BBQQ", 3, 1, addr, size)


def object_header_v1(messages):
    body = b"".join(messages)
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(body)) + body


def sym_entry(name_off, hdr_addr):
    return struct.pack("<QQII16x", name_off, hdr_addr, 0, 0)


def build():
    n = 4
    time_vals = struct.pack("<4d", 0.0, 1.0, 2.0, 3.0)
    temp_vals = struct.pack("<4i", 30, 31, -4, 33)

    # ---- plan the file layout back-to-front with fixed offsets
    # superblock v0 (96 B incl. root symbol-table entry)
    SUPER = 96
    # local heap: names "TIME\0TEMP\0" at data segment
    heap_data = pad(b"\x00TIME\x00TEMP\x00", 8)  # offset 0 reserved/empty name
    HEAP = SUPER                       # HEAP header (32) + data
    HEAP_DATA = HEAP + 32
    BTREE = HEAP_DATA + len(heap_data)
    btree = pad(b"TREE" + struct.pack("<BBH", 0, 0, 1) +
                struct.pack("<QQ", UNDEF, UNDEF) +
                struct.pack("<Q", 0) +      # key 0 (heap offset of "")
                struct.pack("<Q", 0) +      # child 0 → SNOD (patched below)
                struct.pack("<Q", 6), 8)    # key 1
    SNOD = BTREE + len(btree)
    snod = pad(b"SNOD" + struct.pack("<BxH", 1, 2) +
               sym_entry(1, 0) + sym_entry(6, 0), 8)  # hdr addrs patched
    TIME_HDR = SNOD + len(snod)

    time_hdr = object_header_v1([
        v1_msg(0x01, dataspace_v1([n])),
        v1_msg(0x03, dtype_f64()),
        v1_msg(0x0C, attr_v1("units", dtype_string(22), dataspace_v1([]),
                             b"days since 2021-01-01\x00")),
        v1_msg(0x08, layout_contiguous(0, n * 8)),  # addr patched
    ])
    TEMP_HDR = TIME_HDR + len(time_hdr)
    temp_hdr = object_header_v1([
        v1_msg(0x01, dataspace_v1([n])),
        v1_msg(0x03, dtype_i32()),
        v1_msg(0x0C, attr_v1("scale_factor", dtype_f64(), dataspace_v1([]),
                             struct.pack("<d", 0.5))),
        v1_msg(0x08, layout_contiguous(0, n * 4)),  # addr patched
    ])
    TIME_DATA = TEMP_HDR + len(temp_hdr)
    TEMP_DATA = TIME_DATA + len(time_vals)
    EOF = TEMP_DATA + len(temp_vals)

    # ---- patch addresses
    btree = btree[:32] + struct.pack("<Q", SNOD) + btree[40:]
    snod = (snod[:8] + sym_entry(1, TIME_HDR) + sym_entry(6, TEMP_HDR) +
            snod[8 + 80:])
    def patch_layout(hdr, data_addr, size):
        # layout message body: ver(1) class(1) addr(8) size(8)
        needle = struct.pack("<BBQQ", 3, 1, 0, size)
        i = hdr.index(needle)
        return hdr[:i] + struct.pack("<BBQQ", 3, 1, data_addr, size) + \
            hdr[i + len(needle):]
    time_hdr = patch_layout(time_hdr, TIME_DATA, n * 8)
    temp_hdr = patch_layout(temp_hdr, TEMP_DATA, n * 4)

    # root group object header sits nowhere separate: v0 superblock's
    # root entry points at a header holding the SymbolTable message —
    # place it inside the heap gap? Simpler: append root header at EOF.
    root_hdr = object_header_v1([
        v1_msg(0x11, struct.pack("<QQ", BTREE, HEAP))])
    ROOT_HDR = EOF
    EOF2 = ROOT_HDR + len(root_hdr)

    super0 = (b"\x89HDF\r\n\x1a\n" +
              struct.pack("<BBBBBBBxHHI", 0, 0, 0, 0, 0, 8, 8, 4, 16, 0) +
              struct.pack("<QQQQ", 0, UNDEF, EOF2, UNDEF) +
              sym_entry(0, ROOT_HDR))
    assert len(super0) == SUPER, len(super0)

    heap_hdr = (b"HEAP" + struct.pack("<B3x", 0) +
                struct.pack("<QQQ", len(heap_data), len(heap_data), HEAP_DATA))
    assert len(heap_hdr) == 32

    out = (super0 + heap_hdr + heap_data + btree + snod +
           time_hdr + temp_hdr + time_vals + temp_vals + root_hdr)
    assert len(out) == EOF2, (len(out), EOF2)
    return out


if __name__ == "__main__":
    path = "src/test/resources/golden/classic_hdf5.nc"
    with open(path, "wb") as f:
        f.write(build())
    print(f"wrote {path} ({len(build())} bytes)")
