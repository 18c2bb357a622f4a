#!/usr/bin/env python3
"""Extract GNSS ICD constant tables into gnss_sdr_tpu/data/icd_tables.json.

The extracted values are *specification data* — spreading-code seed tables and
memory-code hex dumps published in the public signal ICDs:

  * IS-GPS-200  Table 3-Ib  (L2 CM/CL initial register states)
  * IS-GPS-705  Table 3-I   (L5 XB code advances)
  * Galileo OS SIS ICD Annex C (E1-B/E1-C/E5a primary + secondary memory codes)
  * BeiDou B1I/B3I ICD      (G2 phase assignments / shift register states)

They are read out of the reference receiver's constants headers
(/root/reference/src/core/system_parameters/*.h and
/root/reference/src/algorithms/libs/beidou_*_signal_processing.cc), which embed
the same ICD tables. Only numeric/hex constants are extracted — no code.

Run: python tools/extract_icd_tables.py
"""

import json
import pathlib
import re

REF = pathlib.Path("/root/reference/src")
OUT = pathlib.Path(__file__).resolve().parent.parent / "gnss_sdr_tpu" / "data" / "icd_tables.json"


def read(p):
    return (REF / p).read_text(errors="replace")


def extract_int_array(text, name):
    m = re.search(re.escape(name) + r"(?:\s*\[\s*\d*\s*\])?\s*=\s*\{(.*?)\};", text, re.S)
    body = re.sub(r"//.*?$|/\*.*?\*/", "", m.group(1), flags=re.M | re.S)
    vals = []
    for tok in body.replace("\n", " ").split(","):
        tok = tok.strip()
        if not tok:
            continue
        # C octal literals start with 0
        vals.append(int(tok, 8) if re.fullmatch(r"0[0-7]+", tok) else int(tok))
    return vals


def extract_string_array(text, name):
    m = re.search(re.escape(name) + r"\s*\[[^\]]*\]\s*=\s*\{(.*?)\};", text, re.S)
    body = m.group(1)
    entries = re.findall(r'"((?:[^"\\]|\\.)*)"', body)
    # adjacent string literals are concatenated per C++ rules; entries are
    # separated by commas in the source — rebuild by splitting on commas
    parts = []
    cur = []
    depth = 0
    buf = ""
    in_str = False
    for ch in body:
        if ch == '"':
            in_str = not in_str
            continue
        if in_str:
            buf += ch
            continue
        if ch == ",":
            parts.append(buf)
            buf = ""
    if buf.strip("\n ") or buf:
        parts.append(buf)
    parts = [p.replace("\n", "").replace(" ", "").replace("\\", "") for p in parts]
    return [p for p in parts if p]


def extract_bitset_array(text, name):
    m = re.search(re.escape(name) + r"\s*=\s*\{(.*?)\};", text, re.S)
    return re.findall(r'std::bitset<\d+>\(std::string\("([01]+)"\)\)', m.group(1))


def main():
    tables = {}

    l2c = read("core/system_parameters/GPS_L2C.h")
    tables["gps_l2cm_init_reg"] = extract_int_array(l2c, "GPS_L2C_M_INIT_REG")

    l5 = read("core/system_parameters/GPS_L5.h")
    tables["gps_l5i_xb_advance"] = extract_int_array(l5, "GPS_L5I_INIT_REG")
    tables["gps_l5q_xb_advance"] = extract_int_array(l5, "GPS_L5Q_INIT_REG")

    e1 = read("core/system_parameters/Galileo_E1.h")
    tables["galileo_e1b_primary_hex"] = extract_string_array(e1, "GALILEO_E1_B_PRIMARY_CODE")
    tables["galileo_e1c_primary_hex"] = extract_string_array(e1, "GALILEO_E1_C_PRIMARY_CODE")
    m = re.search(r'GALILEO_E1_C_SECONDARY_CODE\s*=\s*\n?\s*"([01]+)"', e1)
    if m:
        tables["galileo_e1c_secondary"] = m.group(1)

    e5a = read("core/system_parameters/Galileo_E5a.h")
    tables["galileo_e5a_i_primary_hex"] = extract_string_array(e5a, "GALILEO_E5A_I_PRIMARY_CODE")
    tables["galileo_e5a_q_primary_hex"] = extract_string_array(e5a, "GALILEO_E5A_Q_PRIMARY_CODE")
    try:
        tables["galileo_e5a_q_secondary"] = extract_string_array(e5a, "GALILEO_E5A_Q_SECONDARY_CODE")
    except AttributeError:
        pass

    b1i = read("algorithms/libs/beidou_b1i_signal_processing.cc")
    tables["beidou_b1i_phase1"] = extract_int_array(b1i, "phase1")
    tables["beidou_b1i_phase2"] = extract_int_array(b1i, "phase2")

    b3i = read("algorithms/libs/beidou_b3i_signal_processing.cc")
    tables["beidou_b3i_g2_init"] = extract_bitset_array(b3i, "G2_register_shifted")

    # GLONASS GNAV Hamming-code data-bit index sets (GLONASS ICD Table 4.4)
    glo = read("core/system_parameters/GLONASS_L1_L2_CA.h")
    for name in "IJKLMNPQ":
        key = f"GLONASS_GNAV_CRC_{name}_INDEX"
        m = re.search(re.escape(key) + r"\{(.*?)\};", glo, re.S)
        tables[f"glonass_gnav_crc_{name.lower()}"] = [
            int(t) for t in m.group(1).replace("\n", "").split(",") if t.strip()]

    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(tables))
    for k, v in tables.items():
        n = len(v) if isinstance(v, list) else 1
        print(f"{k}: {n} entries")


if __name__ == "__main__":
    main()
