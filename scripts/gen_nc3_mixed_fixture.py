#!/usr/bin/env python3
"""Generate a netCDF-3 fixture with HETEROGENEOUS level counts, written
by hand like gen_nc3_fixture.py (no netCDF library in this container).
Exercises the decodePruned shape rules:
  - TEMP[TIME,DEPTH3] (3 levels) sets the file's level count to 3
  - PSAL[TIME,DEPTH2] (2 levels) must be NULL at level 2, never a
    repeat of its deepest value (the round-3 advice's "fabricated data"
    case), and so must PSAL_QC
  - AIRT[TIME] (1-D) repeats across all 3 levels (documented behavior)

Writes src/test/resources/golden/mixed_levels.nc:
  dims:  TIME (unlimited, 4 records), DEPTH3 (3), DEPTH2 (2)
  vars:  TIME(double)[TIME]        units="hours since 2021-01-01"
         AIRT(double)[TIME]
         PSAL(int)[TIME,DEPTH2]    scale_factor=0.01 _FillValue=-99999
         PSAL_QC(byte)[TIME,DEPTH2]
         TEMP(int)[TIME,DEPTH3]    scale_factor=0.01 _FillValue=-99999
"""
import struct

NRECS = 4


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
    # dim list: TIME (unlimited -> 0), DEPTH3 (3), DEPTH2 (2)
    header += struct.pack(">ii", 0x0A, 3)
    header += name("TIME") + struct.pack(">i", 0)
    header += name("DEPTH3") + struct.pack(">i", 3)
    header += name("DEPTH2") + struct.pack(">i", 2)
    header += att_list([attr("title", 2, "mixed-level fixture")])

    # per-record sizes: TIME 8; AIRT 8; PSAL 2 ints = 8;
    # PSAL_QC 2 bytes -> padded 4; TEMP 3 ints = 12
    rec_size = 8 + 8 + 8 + 4 + 12

    def vars_block(begin0):
        b = struct.pack(">ii", 0x0B, 5)
        b += var("TIME", [0],
                 [attr("units", 2, "hours since 2021-01-01")], 6, 8, begin0)
        b += var("AIRT", [0], [], 6, 8, begin0 + 8)
        b += var("PSAL", [0, 2],
                 [attr("scale_factor", 6, [0.01]),
                  attr("_FillValue", 4, [-99999])], 4, 8, begin0 + 16)
        b += var("PSAL_QC", [0, 2], [], 1, 4, begin0 + 24)
        b += var("TEMP", [0, 1],
                 [attr("scale_factor", 6, [0.01]),
                  attr("_FillValue", 4, [-99999])], 4, 12, begin0 + 28)
        return b

    hdr_len = len(header) + len(vars_block(0))
    out = header + vars_block(hdr_len)
    assert len(out) == hdr_len

    airts = [10.0, 10.5, 11.0, 11.5]
    psals = [[3500, 3510], [3501, 3511], [-99999, 3512], [3503, 3513]]
    qcs = [[1, 1], [1, 2], [9, 1], [1, 1]]
    temps = [[1550, 1450, 1350], [1551, 1451, 1351],
             [1552, 1452, 1352], [1553, 1453, -99999]]
    for r in range(NRECS):
        out += struct.pack(">d", float(r))  # TIME: hours 0..3
        out += struct.pack(">d", airts[r])
        out += struct.pack(">2i", *psals[r])
        out += pad4(struct.pack(">2b", *qcs[r]))
        out += struct.pack(">3i", *temps[r])
    assert len(out) == hdr_len + NRECS * rec_size
    return out


if __name__ == "__main__":
    path = "src/test/resources/golden/mixed_levels.nc"
    with open(path, "wb") as f:
        f.write(build())
    print(f"wrote {path} ({len(build())} bytes)")
