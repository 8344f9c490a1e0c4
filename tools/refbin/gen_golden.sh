#!/bin/bash
# Regenerate the golden anchor images in tests/golden/ from the ACTUAL
# reference binary (tools/refbin/build.sh compiles the unmodified sources at
# /root/reference/MTPC).
#
# Two details make this reproducible on Linux:
# - Scene files ship with CRLF endings; Windows text-mode reads stripped the
#   \r, so we strip it in a scratch copy (otherwise the texture filename
#   keeps a trailing \r and the parse-by-prefix material names mismatch).
# - The cornell-box Table material references cherry-wood-texture.jpg, which
#   the reference repo does NOT ship.  tests/golden/cherry-wood-texture.jpg
#   is a deterministic synthetic stand-in (see gen_texture.py) used by BOTH
#   the reference binary and this framework's loader, so golden comparisons
#   are apples-to-apples.  (Consequence: the reference repo's own shipped
#   result/*.png, rendered with the real texture, differ in Table-lit
#   regions.)
set -e
cd "$(dirname "$0")"
./build.sh
SCRATCH=$(mktemp -d)
cp /root/reference/scene/cornell-box.* /root/reference/scene/veach-mis.* "$SCRATCH/"
sed -i 's/\r$//' "$SCRATCH"/*.obj "$SCRATCH"/*.mtl "$SCRATCH"/*.camera
python gen_texture.py "$SCRATCH/cherry-wood-texture.jpg"
cp "$SCRATCH/cherry-wood-texture.jpg" ../../tests/golden/
cd "$SCRATCH"
OMP_NUM_THREADS=8 "$OLDPWD/refbin" ./ cornell-box 64 "$OLDPWD/../../tests/golden/ref-cornell-box-SPP64.png"
OMP_NUM_THREADS=8 "$OLDPWD/refbin" ./ veach-mis 64 "$OLDPWD/../../tests/golden/ref-veach-mis-SPP64.png"
rm -rf "$SCRATCH"
