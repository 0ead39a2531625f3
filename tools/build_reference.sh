#!/bin/sh
# Build the reference SVT-HEVC encoder (from the read-only tree at
# /root/reference) without a NASM assembler: copies the tree to /tmp,
# replaces the five yasm kernels with portable C stubs that delegate to
# the C_DEFAULT implementations (bit-identical per the reference's own
# asm_test guarantee), and builds SvtHevcEncApp for BD-rate / speed
# baselines (tools/compare_reference.py).
set -e
SRC=${1:-/root/reference}
WORK=${2:-/tmp/svt_src}
BUILD=${3:-/tmp/svt_build}
HERE=$(dirname "$0")

if [ ! -x "$WORK/Bin/Release/SvtHevcEncApp" ]; then
    rm -rf "$WORK"
    cp -r "$SRC" "$WORK"
    cp "$HERE/ref_asm_stubs.c" "$WORK/Source/Lib/ASM_SSE2/asm_stubs.c"
    python3 - "$WORK" <<'PY'
import re, sys
work = sys.argv[1]
p = f"{work}/CMakeLists.txt"
s = open(p).read().replace("project(${project_name} C ASM_NASM)",
                           "project(${project_name} C)")
open(p, "w").write(s)
p = f"{work}/Source/Lib/ASM_SSE2/CMakeLists.txt"
s = open(p).read()
for f in ("EbGatherSaoStatistics16bit_SSE2.asm", "EbPictureOperators_SSE2.asm",
          "x64inc.asm", "x64Macro.asm", "x64RegisterUtil.asm"):
    s = s.replace("    " + f + "\n", "").replace("    " + f + ")", ")")
if "asm_stubs.c" not in s:
    s = re.sub(r"(EbTransforms_Intrinsic_SSE2\.c)", r"\1\n    asm_stubs.c",
               s, count=1)
open(p, "w").write(s)
PY
    cmake -S "$WORK" -B "$BUILD" -DCMAKE_BUILD_TYPE=Release -G Ninja
    ninja -C "$BUILD"
fi
echo "$WORK/Bin/Release/SvtHevcEncApp"
