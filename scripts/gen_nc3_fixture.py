#!/usr/bin/env python3
"""Generate a tiny netCDF-3 classic (CDF-1) fixture by writing the format
by hand — no netCDF library exists in this container, and hand-assembly
doubles as an independent check of the byte layout the Scala reader
parses. Layout exercised: unlimited record dimension, record variables
(incl. a sub-4-byte one needing record padding), typed attributes
(string / double / int), scale_factor + _FillValue CF decoding.

Writes src/test/resources/golden/classic_fixture.nc:
  dims:  TIME (unlimited, 5 records), DEPTH (2)
  vars:  TIME(double)[TIME]  units="hours since 2020-01-01"
         TEMP(int)[TIME,DEPTH]  scale_factor=0.001 add_offset=0.0
                                _FillValue=-999999
         TEMP_QC(byte)[TIME,DEPTH]
"""
import struct

NRECS = 5


def pad4(b):
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


def name(s):
    return struct.pack(">i", len(s)) + pad4(s.encode())


def attr(nm, nc_type, raw_values):
    if nc_type == 2:  # char
        payload = raw_values.encode()
        cnt = len(payload)
    elif nc_type == 4:
        payload = b"".join(struct.pack(">i", v) for v in raw_values)
        cnt = len(raw_values)
    elif nc_type == 6:
        payload = b"".join(struct.pack(">d", v) for v in raw_values)
        cnt = len(raw_values)
    else:
        raise ValueError(nc_type)
    return name(nm) + struct.pack(">ii", nc_type, cnt) + pad4(payload)


def att_list(attrs):
    if not attrs:
        return struct.pack(">ii", 0, 0)
    return struct.pack(">ii", 0x0C, len(attrs)) + b"".join(attrs)


def var(nm, dimids, attrs, nc_type, vsize, begin):
    return (name(nm) + struct.pack(">i", len(dimids)) +
            b"".join(struct.pack(">i", d) for d in dimids) +
            att_list(attrs) + struct.pack(">iii", nc_type, vsize, begin))


def build():
    header = struct.pack(">4si", b"CDF\x01", NRECS)
    # dim list: TIME (unlimited → 0), DEPTH (2)
    header += struct.pack(">ii", 0x0A, 2)
    header += name("TIME") + struct.pack(">i", 0)
    header += name("DEPTH") + struct.pack(">i", 2)
    header += att_list([attr("title", 2, "classic fixture")])

    # sizes: TIME 8 B/rec; TEMP 2 ints = 8 B/rec; TEMP_QC 2 bytes → padded 4
    rec_size = 8 + 8 + 4

    def vars_block(begin0):
        b = struct.pack(">ii", 0x0B, 3)
        b += var("TIME", [0],
                 [attr("units", 2, "hours since 2020-01-01")], 6, 8, begin0)
        b += var("TEMP", [0, 1],
                 [attr("scale_factor", 6, [0.001]),
                  attr("add_offset", 6, [0.0]),
                  attr("_FillValue", 4, [-999999])], 4, 8, begin0 + 8)
        b += var("TEMP_QC", [0, 1], [], 1, 4, begin0 + 16)
        return b

    hdr_len = len(header) + len(vars_block(0))
    out = header + vars_block(hdr_len)
    assert len(out) == hdr_len

    temps = [[15500, 16250], [-999999, 16300], [15600, -999999],
             [15700, 16400], [15800, 16500]]
    qcs = [[1, 1], [9, 1], [1, 4], [1, 1], [1, 1]]
    for r in range(NRECS):
        out += struct.pack(">d", float(r))                  # TIME: hours 0..4
        out += struct.pack(">2i", *temps[r])
        out += pad4(struct.pack(">2b", *qcs[r]))
    assert len(out) == hdr_len + NRECS * rec_size
    return out


if __name__ == "__main__":
    path = "src/test/resources/golden/classic_fixture.nc"
    with open(path, "wb") as f:
        f.write(build())
    print(f"wrote {path} ({len(build())} bytes)")
