#!/usr/bin/env python3
"""Differential check of graft's StrCode against the REFERENCE'S OWN
str_to_code, extracted verbatim from /root/reference/src/transform.py and
executed as a test oracle (the module itself imports dateparser, absent
here, so only the self-contained function block is exec'd).

Reads `base64(input)<TAB>base64(output)` lines (from
`runMain graft.StrCodeFuzz`) on stdin; exit 0 iff zero mismatches.
"""
import base64
import re
import sys

src = open("/root/reference/src/transform.py", encoding="utf-8").read()
m = re.search(r"^def str_to_code\(.*?(?=^def |\Z)", src, re.S | re.M)
if not m:
    print("could not locate str_to_code in the reference")
    sys.exit(2)
ns = {"Optional": None, "Text": str}
# The function's annotations reference typing names; provide them.
import typing
ns.update({"Optional": typing.Optional, "Text": typing.Text})
exec(m.group(0), ns)  # noqa: S102 - dev-time oracle extraction
str_to_code = ns["str_to_code"]

ok = mism = 0
examples = []
for lineno, line in enumerate(sys.stdin, 1):
    line = line.rstrip("\n")
    if not line:
        continue
    inp_b64, out_b64 = line.split("\t")
    inp = base64.b64decode(inp_b64).decode("utf-8")
    graft = base64.b64decode(out_b64).decode("utf-8")
    ref = str_to_code(inp)
    if ref == graft:
        ok += 1
    else:
        mism += 1
        if len(examples) < 10:
            examples.append((lineno, inp, graft, ref))

print(f"ok={ok} mismatches={mism}")
for lineno, inp, graft, ref in examples:
    print(f"--- line {lineno}\n  input: {inp!r}\n  graft: {graft!r}\n  ref:   {ref!r}")
sys.exit(0 if mism == 0 else 1)
