"""Dev-time extractor for the RFC 6386 §13 static tables.

The build container has no network and no RFC 6386 text, but it ships
the system ``libwebp.so.7`` (BSD-licensed reference implementation of
the public spec), whose data segment carries the spec tables verbatim:

* ``kDcTable``/``kAcTable`` (uint16[128], dec/quant_dec.c) — the
  §14.1 quantizer lookups,
* ``ModesProba``/``kf_b_mode_prob`` (uint8[10][10][9], dec/tree_dec.c)
  — the §11.3 keyframe subblock-mode probabilities,
* ``CoeffsProba0``/``default_coeff_probs`` (uint8[4][8][3][11]) — the
  §13.5 default token probabilities,
* ``CoeffsUpdateProba``/``coeff_update_probs`` (uint8[4][8][3][11]) —
  the §13.4 token-prob-update gating probabilities.

Anchor rows that ARE safely memorable (first table rows, the monotone
quantizer ramps) locate each table in the binary; the full extent is
then read from the .so and printed as Python literals for
``polars_trading_spark/functions/vp8_tables.py``.  The extracted
values are subsequently validated end-to-end by
tests/test_vp8_interop.py: our pure-Python decoder must reproduce
libwebp's own decode EXACTLY on libwebp-encoded streams — any
mis-extracted (or misremembered) table diverges there immediately.

Run: python scripts/vp8_table_extract.py [path-to-libwebp.so]
"""

import struct
import sys

SO = sys.argv[1] if len(sys.argv) > 1 else "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
blob = open(SO, "rb").read()


def find_all(needle: bytes) -> list[int]:
    hits, i = [], blob.find(needle)
    while i != -1:
        hits.append(i)
        i = blob.find(needle, i + 1)
    return hits


def u16_seq(vals):
    return b"".join(struct.pack("<H", v) for v in vals)


def fmt(name, vals, per_line=12):
    out = [f"{name} = ["]
    for i in range(0, len(vals), per_line):
        out.append("    " + ", ".join(str(v) for v in vals[i : i + per_line]) + ",")
    out.append("]")
    return "\n".join(out)


# ---- quantizer ramps ---------------------------------------------------
# kAcTable is uint16[128] (tail ...279, 284); kDcTable is uint8[128]
# and sits immediately after it in libwebp's data segment.
ac_tail = [249, 254, 259, 264, 269, 274, 279, 284]
hits = find_all(u16_seq(ac_tail))
assert hits, "AC_QLOOKUP tail not found"
ac_start = hits[0] - (128 - len(ac_tail)) * 2
ac = list(struct.unpack("<128H", blob[ac_start : ac_start + 256]))
assert ac[0] == 4 and all(ac[i] <= ac[i + 1] for i in range(127)), ac[:8]
print(fmt("AC_QLOOKUP", ac))
print()
dc = list(blob[ac_start + 256 : ac_start + 256 + 128])
assert dc[0] == 4 and all(dc[i] <= dc[i + 1] for i in range(127)), dc[:8]
print(fmt("DC_QLOOKUP", dc))
print()

# ---- kf_b_mode_prob: anchor on [0][0] ---------------------------------
anchor = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
hits = find_all(anchor)
assert hits, "kf_b_mode_prob anchor not found"
# decoder + encoder each carry a copy; they must agree byte-for-byte
regions = {blob[h : h + 900] for h in hits}
assert len(regions) == 1, f"kf_b_mode_prob copies disagree at {hits}"
kb = list(regions.pop())
print(fmt("KF_B_MODE_PROB_FLAT", kb))
print()

# ---- default_coeff_probs: anchor on [0][1][0] -------------------------
# (band 0 of type 0 is never coded, so the table OPENS with three
# all-128 filler rows; the first distinctive row is [0][1][0])
anchor = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
hits = find_all(anchor)
assert hits, "default_coeff_probs anchor not found"
regions = {blob[h - 33 : h - 33 + 1056] for h in hits}
assert len(regions) == 1, f"default_coeff_probs copies disagree at {hits}"
cp = list(regions.pop())
assert cp[:33] == [128] * 33, "band-0 filler rows missing — misaligned"
print(fmt("DEFAULT_COEFF_PROBS_FLAT", cp))
print()

# ---- coeff_update_probs: anchor on [0][1][0] --------------------------
# (same band-0 filler idea, with 255 = "never update"; [0][1][0] opens
# 176, 246, 255...)
anchor = bytes([176, 246])
hits = [h for h in find_all(anchor)
        if blob[h - 33 : h] == b"\xff" * 33
        and min(blob[h - 33 : h - 33 + 1056]) >= 128]
assert hits, "coeff_update_probs anchor not found"
regions = {blob[h - 33 : h - 33 + 1056] for h in hits}
assert len(regions) == 1, f"coeff_update_probs copies disagree at {hits}"
up = list(regions.pop())
print(fmt("COEFF_UPDATE_PROBS_FLAT", up))
