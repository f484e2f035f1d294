#!/usr/bin/env python
"""Dev-time generator for melody_join_spark/operators/_qm_table.py — the
ITU-T T.81 Table D.3 probability-estimation state machine used by the
QM arithmetic coder (SOF9 JPEG entropy decoding).

The table is STANDARD-SPECIFIED DATA (113 adaptive states + the fixed
equiprobable state), published in ITU-T Rec. T.81 (1992), Table D.3.  The
system libjpeg exports the same table as `jpeg_aritab` (one packed INT32
per state); reading it through ctypes and unpacking to (Qe, NMPS, NLPS,
SWITCH) 4-tuples is the least error-prone way to transcribe 113 rows of
hex constants — a hand-typed copy of a standards table is where silent
decode corruption comes from.  Run once, commit the output, never import
libjpeg at runtime.

Usage: python scripts/extract_qm_table.py > melody_join_spark/operators/_qm_table.py
"""

import ctypes
import ctypes.util


def main() -> None:
    path = ctypes.util.find_library("jpeg")
    if not path:
        raise SystemExit("no system libjpeg — transcribe T.81 Table D.3 by hand")
    lib = ctypes.CDLL(path)
    # classic IJG libjpeg types INT32 as `long` (8 bytes on LP64); the
    # packed value itself fits 32 bits: (Qe << 16) | (NMPS << 8) |
    # (SWITCH << 7) | NLPS
    raw = (ctypes.c_int64 * 114).in_dll(lib, "jpeg_aritab")
    rows = []
    for v in raw:
        v &= 0xFFFFFFFF
        lo = v & 0xFF
        rows.append(((v >> 16) & 0xFFFF, (v >> 8) & 0xFF, lo & 0x7F, lo >> 7))
    assert rows[0] == (0x5A1D, 1, 1, 1), rows[0]       # T.81 D.3 state 0
    assert rows[13] == (0x0001, 13, 12, 0), rows[13]   # smallest Qe state
    assert rows[14][0] == 0x5A7F and rows[14][3] == 1  # fast-attack restart
    assert rows[113] == (0x5A1D, 113, 113, 0)          # fixed (sign) state
    print('"""ITU-T T.81 Table D.3: the QM-coder probability-estimation')
    print("state machine — (Qe, NMPS, NLPS, SWITCH) per state; state 113 is")
    print("the non-adapting equiprobable state used for AC coefficient signs.")
    print("Standard-specified constants, transcribed from the published")
    print('standard via scripts/extract_qm_table.py (do not hand-edit)."""')
    print()
    print("QM_TABLE = (")
    for qe, nm, nl, sw in rows:
        print(f"    (0x{qe:04X}, {nm}, {nl}, {sw}),")
    print(")")


if __name__ == "__main__":
    main()
