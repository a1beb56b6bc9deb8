#!/bin/bash
# Build the reference renderer out-of-tree (the mount is read-only and its
# glm submodule is empty) using the from-scratch shim headers in shims/.
# One source patch is applied to a /tmp copy: scene.h:280 binds an rvalue to
# a non-const reference (an MSVC extension gcc rejects); the patch hoists
# the temporary into a local without changing behavior.
# Produces /tmp/refbuild/plutracer — the correctness oracle binary.
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF=/root/reference
OUT=${1:-/tmp/refbuild}
mkdir -p "$OUT"
rm -rf "$OUT/src_copy"
cp -r "$REF/inc" "$OUT/src_copy_inc"
cp -r "$REF/src" "$OUT/src_copy"
python3 - "$OUT/src_copy_inc/scene.h" <<'PY'
import sys
p = sys.argv[1]
src = open(p).read()
old = "auto ss = make_basic_surface(cx, cx.eval1(objvs[i + 1]).get<vector<urn::value>>(), j);"
new = ("auto ss_tmp = cx.eval1(objvs[i + 1]).get<vector<urn::value>>();\n"
       "\t\t\t\t\t\tauto ss = make_basic_surface(cx, ss_tmp, j);")
assert old in src, "patch target not found"
open(p, "w").write(src.replace(old, new))
PY
g++ -O2 -std=c++14 -w -fpermissive \
    -I "$HERE/shims" -I "$OUT/src_copy_inc" \
    "$OUT"/src_copy/*.cpp "$OUT"/src_copy/surfaces/*.cpp \
    -o "$OUT/plutracer" -lpthread
rm -rf "$OUT/src_copy" "$OUT/src_copy_inc"
echo "built $OUT/plutracer"
