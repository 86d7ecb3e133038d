#!/bin/bash
# Generate golden bitstreams + reconstructions from the C++ reference.
#
# Builds the reference (encoder via CMake; decoder by hand, since
# CMakeLists.txt:18-23 lists encoder sources only), synthesizes test
# content, and runs encode/decode for the configs in BASELINE.json:
# QP {16,8,1}, periods {1 (canonical all-intra), 10}.
#
# Outputs land in tests/golden/:
#   <seq>_compCIF_<qpdc>_<qpac>_<period>.bin     reference bitstream
#   <seq>_<qpdc>_<qpac>_<period>.encrecon.yuv    encoder reconstruction
#   <seq>_<qpdc>_<qpac>_<period>.decrecon.yuv    decoder output
#   MANIFEST.sha256                              hashes of everything
set -euo pipefail
REPO=/root/repo
REF=/root/reference
WORK=$(mktemp -d)
GOLD=$REPO/tests/golden
mkdir -p "$GOLD"

# --- build reference ---
mkdir -p "$WORK/build" && cd "$WORK/build"
cmake "$REF" -DCMAKE_BUILD_TYPE=Release >/dev/null && make -j8 >/dev/null
ENC=$WORK/build/ICSPCodec
g++ -O2 -include cmath -include cstring -include cstdio -include cstdlib \
    "$REF/source/decoder/decode.cpp" \
    "$REF/source/decoder/ICSP_Codec_Decoder_source.cpp" -o "$WORK/decoder"
DEC=$WORK/decoder

# --- content ---
NFRAMES=${NFRAMES:-32}
SEQS="synthA synthB synthStatic"
cd "$WORK"
for s in $SEQS; do
  python3 "$REPO/tools/make_content.py" "$s" "$NFRAMES" "$WORK/${s}_cif.yuv"
done

run_cfg() {
  local seq=$1 qpdc=$2 qpac=$3 period=$4
  local dir="$WORK/run_${seq}_${qpdc}_${qpac}_${period}"
  mkdir -p "$dir" && cd "$dir"
  cp "$WORK/${seq}_cif.yuv" .
  "$ENC" -i "${seq}_cif.yuv" -n "$NFRAMES" --qpdc "$qpdc" --qpac "$qpac" \
         --intraPeriod "$period" >/dev/null
  local bin="${seq}_compCIF_${qpdc}_${qpac}_${period}.bin"
  cp "$bin" "$GOLD/"
  cp test_yuv.yuv "$GOLD/${seq}_${qpdc}_${qpac}_${period}.encrecon.yuv"
  if [ "$period" != "0" ]; then
    # decoder expects literal 'output\<bin>' and 'data\<yuv>' paths
    cp "$bin" "output\\${bin}"
    cp "${seq}_cif.yuv" "data\\${seq}_cif.yuv"
    "$DEC" "$NFRAMES" "$bin" "$qpdc" "$qpac" "$period" "${seq}_cif.yuv" >/dev/null
    cp check_test_*_yuv.yuv "$GOLD/${seq}_${qpdc}_${qpac}_${period}.decrecon.yuv"
  fi
}

for s in $SEQS; do
  for qp in 16 8 1; do
    run_cfg "$s" "$qp" "$qp" 1
    run_cfg "$s" "$qp" "$qp" 10
  done
done
# mixed QP + period-0 (header-only all-intra mode) extras on synthA
run_cfg synthA 16 8 1
run_cfg synthA 8 16 10
run_cfg synthA 16 16 0

cd "$GOLD" && sha256sum * | grep -v MANIFEST > MANIFEST.sha256
echo "golden artifacts in $GOLD"
rm -rf "$WORK"
