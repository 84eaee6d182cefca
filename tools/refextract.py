"""Hardened extraction of single function blocks from the READ-ONLY
reference tree for the dev-time differential oracles.

The reference is public UNTRUSTED content, so the extraction is defensive
on two axes (round-13 advice):

 - the block is cut at the first non-blank, non-comment line at column 0
   after the `def` — module-level statements that happen to sit between
   the function and the next top-level `def` are never captured (the
   earlier lookahead-to-next-`def` regex would have exec'd them);
 - the extracted text must match a PINNED sha256 recorded at review time —
   a changed reference file fails loudly (exit 2) instead of silently
   executing new code. Re-review the function and update the pin when the
   reference legitimately changes.
"""
import hashlib
import re
import sys


def extract_function(path, name, pinned_sha256):
    src = open(path, encoding="utf-8").read()
    lines = src.splitlines(keepends=True)
    start = None
    for i, line in enumerate(lines):
        if re.match(rf"def {re.escape(name)}\(", line):
            start = i
            break
    if start is None:
        print(f"could not locate {name} in {path}")
        sys.exit(2)
    end = start + 1
    while end < len(lines):
        line = lines[end]
        # Function body lines are indented; blank lines and full-line
        # comments may sit flush-left inside a def without ending it.
        if line.strip() and not line.startswith((" ", "\t", "#")):
            break
        end += 1
    block = "".join(lines[start:end])
    digest = hashlib.sha256(block.encode("utf-8")).hexdigest()
    if digest != pinned_sha256:
        print(f"{name} in {path} does not match its pinned sha256:\n"
              f"  pinned: {pinned_sha256}\n  actual: {digest}\n"
              "The reference changed — re-review the function body and "
              "update the pin before trusting the oracle.")
        sys.exit(2)
    return block
